"""Date-partitioned table layout (SURVEY.md §4: the reference's
date-suffixed sibling tables, modeled properly).

The reference fakes partitioning with table names (`t_202401`) and
prunes by parsing names (executor.go:562-700). The engine-native
model is one table partitioned by a date column — Catalyst then does
partition pruning natively (`PartitionFilters` in the scan), which is
the difference between listing 3 directories and scanning 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_day(
    df: DataFrame, path: str, ts_col: str, mode: str = "overwrite"
) -> None:
    """Materialize with a derived dt=YYYY-MM-DD partition column.

    The dt rendering is pinned to UTC via the session conf —
    date_format renders in spark.sql.session.timeZone, so an unpinned
    session would assign rows near midnight to a timezone-dependent
    partition and day-range readers on a UTC cluster would miss them."""
    from sync_spark.sources.readers import ensure_session_conf

    ensure_session_conf(df.sparkSession)
    (
        df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode(mode)
        .partitionBy("dt")
        .parquet(path)
    )


def read_day_range(
    spark: SparkSession, path: str, start_day: str, end_day: str
) -> DataFrame:
    """Range read with a dt predicate Catalyst turns into partition
    pruning (directories outside the range are never listed/opened)."""
    return spark.read.parquet(path).filter(
        (F.col("dt") >= start_day) & (F.col("dt") < end_day)
    )
