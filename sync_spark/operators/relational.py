"""Core relational operators (SURVEY.md §2.1–§2.7) as query builders.

Each function takes ``(spark, sf_dir)`` and returns a lazy DataFrame;
the matching ANSI-SQL oracle lives in :mod:`sync_spark.registry`.

Numeric discipline for oracle comparability: money/quantity sums are
computed in DECIMAL (exact, order-independent) and only cast to DOUBLE
at the end, so Spark and DuckDB produce bit-identical values regardless
of partitioning / aggregation order. Plain double sums over thousands
of rows would differ in the last bits between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sync_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from sync_spark.sources.readers import read_table

    return read_table(spark, sf_dir, name)


def dec(c, p: int = 18, s: int = 2):
    """Cast to exact decimal for order-independent aggregation."""
    return F.col(c).cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — exercises scan S1/S3,
# filter pushdown P4, partial aggregation A1/A6, sort O1.
# Reference analog: the per-table counter rollups (pkg/utils/monitor.go
# 96-110, 747-836) generalized to multi-measure groupBy.
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


__all__ = ["q1_pricing_summary", "Q1_SQL", "load_tables", "dec"]
