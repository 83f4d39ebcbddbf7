"""JDBC partitioning logic (pure — no database in this container)."""

from __future__ import annotations

import pytest

from sync_spark.sources.jdbc import predicate_partitions, range_partition_options


def test_range_options():
    opts = range_partition_options("id", 0, 1_000_000, 16)
    assert opts == {
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "1000000",
        "numPartitions": "16",
    }
    with pytest.raises(ValueError):
        range_partition_options("id", 10, 5, 4)
    with pytest.raises(ValueError):
        range_partition_options("id", 0, 10, 0)


def test_predicate_partitions_cover_exactly_once():
    preds = predicate_partitions("created_at", ["2024-01-01", "2024-02-01"], quote=True)
    assert preds == [
        "created_at < '2024-01-01' OR created_at IS NULL",
        "created_at >= '2024-01-01' AND created_at < '2024-02-01'",
        "created_at >= '2024-02-01'",
    ]
    # simulate coverage over sample values
    import datetime

    def matches(pred: str, v) -> bool:
        if v is None:
            return "IS NULL" in pred
        clauses = [c for c in pred.split(" OR ") if "IS NULL" not in c]
        ok = True
        for c in clauses[0].split(" AND "):
            op = ">=" if ">=" in c else "<"
            bound = c.split("'")[1]
            ok &= (v >= bound) if op == ">=" else (v < bound)
        return ok

    for v in [None, "2023-12-31", "2024-01-01", "2024-01-15", "2024-02-01", "2024-03-01"]:
        hits = [p for p in preds if matches(p, v)]
        assert len(hits) == 1, f"{v!r} covered {len(hits)} times"


def test_predicate_partitions_requires_boundary():
    with pytest.raises(ValueError):
        predicate_partitions("id", [])


# ---------------------------------------------------------------------------
# live embedded-Derby round trip (S3/S5/S11): Spark bundles the Derby
# jars, so the partitioned read/write path is exercised against a real
# JDBC database with zero new dependencies. Derby is single-JVM — fine
# in local mode where executors share the driver JVM.
# ---------------------------------------------------------------------------

_DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url():
    return "jdbc:derby:memory:syncspark_test;create=true"


def test_derby_write_read_roundtrip(spark, derby_url):
    from pyspark.sql import functions as F

    from sync_spark.sources.jdbc import read_jdbc, write_jdbc

    src = spark.range(0, 1000).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % 7).cast("long").alias("grp"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    write_jdbc(src, derby_url, "people", mode="overwrite", properties=_DERBY_PROPS)
    back = read_jdbc(spark, derby_url, "people", properties=_DERBY_PROPS)
    assert back.count() == 1000
    assert {f.name.lower() for f in back.schema.fields} == {"id", "grp", "name"}
    assert back.agg(F.sum("id")).collect()[0][0] == 499500


def test_derby_range_partitioned_read(spark, derby_url):
    from pyspark.sql import functions as F

    from sync_spark.sources.jdbc import read_jdbc, write_jdbc

    src = spark.range(0, 1000).select(F.col("id").cast("long").alias("id"))
    write_jdbc(src, derby_url, "ranged", mode="overwrite", properties=_DERBY_PROPS)
    got = read_jdbc(
        spark,
        derby_url,
        "ranged",
        properties=_DERBY_PROPS,
        partition_column="id",
        lower=0,
        upper=1000,
        num_partitions=4,
    )
    # really partitioned: 4 parallel range scans, no lost/dup rows
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    assert got.select("id").distinct().count() == 1000


def test_derby_predicate_partitioned_read(spark, derby_url):
    from pyspark.sql import functions as F

    from sync_spark.sources.jdbc import predicate_partitions, read_jdbc, write_jdbc

    src = spark.range(0, 300).select(
        F.col("id").cast("long").alias("id"),
        F.concat(F.lit("k"), F.lpad(F.col("id") % 10, 2, "0")).alias("bucket"),
    )
    # VARCHAR instead of Derby's default CLOB mapping: CLOB columns
    # cannot be compared in WHERE predicates
    write_jdbc(
        src, derby_url, "preds", mode="overwrite", properties=_DERBY_PROPS,
        column_types="bucket VARCHAR(10)",
    )
    # Spark's JDBC writer creates delimited (case-exact) identifiers;
    # Derby folds bare names to uppercase, so the predicate must name
    # the column in its delimited form — dialect quoting belongs to
    # the caller, not predicate_partitions
    preds = predicate_partitions('"bucket"', ["k03", "k06"], quote=True)
    got = read_jdbc(spark, derby_url, "preds", properties=_DERBY_PROPS, predicates=preds)
    # each row lands in exactly one predicate partition
    assert got.rdd.getNumPartitions() == 3
    assert got.count() == 300
    assert got.select("id").distinct().count() == 300
