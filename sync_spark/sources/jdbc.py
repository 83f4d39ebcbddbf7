"""JDBC source/sink scaffolding (SURVEY.md §2.1 S3/S5/S11).

On a real cluster the relational snapshot paths read via
``spark.read.jdbc`` — the scale-critical part is PARTITIONED reads:
one executor per key range instead of one giant serial cursor (the
reference reads serially in 100-row batches, mysql.go:154-267; Spark
replaces that with N parallel range scans).

The partitioning math — numeric ranges and explicit predicate lists
(for string/date keys) — is pure logic and is what actually matters
at 100 TB. The live read/write path is exercised for real against
embedded Derby (bundled with Spark, ``jdbc:derby:memory:``) in
tests/test_jdbc_partitioning.py: write → partitioned read with both
range and predicate partitioning. No MySQL/Postgres server exists in
this container; swapping the URL + driver is configuration.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def range_partition_options(
    partition_column: str, lower: int, upper: int, num_partitions: int
) -> dict[str, str]:
    """Options for Spark's built-in numeric range partitioning:
    numPartitions ranges of ~(upper-lower)/n each. Spark generates
    WHERE clauses server-side; rows outside [lower, upper] still land
    in the first/last partition (no data loss)."""
    if upper < lower:
        raise ValueError(f"upper {upper} < lower {lower}")
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    return {
        "partitionColumn": partition_column,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(num_partitions),
    }


def predicate_partitions(
    column: str, boundaries: Sequence[Any], quote: bool = False
) -> list[str]:
    """Explicit per-partition WHERE predicates for non-numeric keys
    (dates, uuids): boundaries [b0, b1, ..., bn] → n+1 half-open
    predicates covering (-inf, b0), [b0, b1), ..., [bn, +inf).
    Together they cover every row exactly once (incl. NULLs in the
    first partition)."""
    if not boundaries:
        raise ValueError("need at least one boundary")
    bl = list(boundaries)
    if any(not (a < b) for a, b in zip(bl, bl[1:])):
        # unsorted/duplicate boundaries would create OVERLAPPING
        # predicates → silent row duplication on read
        raise ValueError(f"boundaries must be strictly increasing: {bl!r}")

    def lit(v: Any) -> str:
        if quote:
            return "'" + str(v).replace("'", "''") + "'"  # escape embedded quotes
        return str(v)

    preds = [f"{column} < {lit(boundaries[0])} OR {column} IS NULL"]
    for lo, hi in zip(boundaries, boundaries[1:]):
        preds.append(f"{column} >= {lit(lo)} AND {column} < {lit(hi)}")
    preds.append(f"{column} >= {lit(boundaries[-1])}")
    return preds


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: Optional[dict[str, str]] = None,
    partition_column: Optional[str] = None,
    lower: Optional[int] = None,
    upper: Optional[int] = None,
    num_partitions: int = 8,
    predicates: Optional[list[str]] = None,
) -> DataFrame:
    """Partitioned JDBC read. Pick ONE of (partition_column + bounds)
    or explicit predicates; neither → single-partition read (only for
    tiny tables)."""
    from sync_spark.sources.jdbc_dialects import connection_properties

    # dialect-correct defaults from the URL (zero-date handling, UTC
    # session pin, cursor fetch, driver class); caller props win
    props = connection_properties(url, **(properties or {}))
    if predicates is not None and partition_column is not None:
        raise ValueError("pass either predicates or partition_column, not both")
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    if partition_column is not None:
        if lower is None or upper is None:
            raise ValueError("partition_column needs lower/upper bounds")
        range_partition_options(partition_column, lower, upper, num_partitions)  # validate early
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower,
            upperBound=upper,
            numPartitions=num_partitions,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: Optional[dict[str, str]] = None,
    batch_size: int = 1000,
    column_types: Optional[str] = None,
) -> None:
    """S11 batch-insert sink: Spark batches inserts per partition
    (batchsize option replaces the reference's hand-built multi-row
    VALUES, mysql.go:338-393). ``column_types`` maps to Spark's
    createTableColumnTypes — needed when the dialect's default string
    mapping is non-comparable (e.g. Derby maps StringType to CLOB,
    which cannot appear in WHERE predicates)."""
    from sync_spark.sources.jdbc_dialects import connection_properties

    props = connection_properties(url, **(properties or {}))
    props.setdefault("batchsize", str(batch_size))
    w = df.write
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.jdbc(url, table, mode=mode, properties=props)
