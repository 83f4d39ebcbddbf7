"""Bounded local relations without the Python boundary (r11, guide §4).

``SparkSession.createDataFrame(list_of_rows)`` parallelizes a PICKLED
RDD: every downstream action — including the build side of a broadcast
join — schedules Python-worker tasks just to deserialize a few dozen
literal rows. For the bounded query-batch frames the serving paths
plan per call (LSH query rows, qmaps), that worker dispatch is pure
floor. The pandas/Arrow path instead ships driver-serialized Arrow
batches that executors decode JVM-side: same rows, same schema, no
Python workers at action time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import _parse_datatype_string


def arrow_local_frame(spark: SparkSession, rows: list, ddl: str) -> DataFrame:
    """Plan ``rows`` (list of tuples, bounded by construction) as an
    Arrow-backed local frame with the ``ddl`` schema. Falls back to
    the classic pickled path automatically when Arrow conversion is
    unavailable (pyspark handles the fallback internally) — semantics
    are identical either way, only the decode venue differs."""
    import pandas as pd

    schema = _parse_datatype_string(ddl)
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    return spark.createDataFrame(pdf, schema=schema)
