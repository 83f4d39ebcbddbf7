"""Skew-handling operators for hot keys (SURVEY.md §4 scale notes;
the brief's "skewed keys hurt → salting" bullet).

AQE's skew-join handles moderate shuffle-partition skew at runtime;
these operators are for the pathological single-hot-key cases AQE
can't fix:

- ``salted_agg``: two-phase aggregation — pre-aggregate on
  (key, salt) so one hot key spreads across ``salts`` reducers, then
  merge partials. Correct for any commutative-associative aggregate
  expressed as (partial, merge) column pairs.
- ``skew_broadcast_join``: split-and-union join — rows with hot keys
  (explicit list, or discovered via approximate frequency) join
  against a broadcast slice of the build side; the long tail takes
  the normal shuffle join. Result ≡ plain inner join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs``: output_name → aggregate Column over raw rows.
    ``merge_aggs``: output_name → aggregate Column over the partial
    columns (referencing the partial output names).

    Example (count + sum):
        salted_agg(df, "k",
                   {"cnt": F.count(F.lit(1)), "s": F.sum("v")},
                   {"cnt": F.sum("cnt"), "s": F.sum("s")})
    """
    # the salt must be DETERMINISTIC per row content: a positional id
    # (monotonically_increasing_id) changes on task retry after a
    # shuffle recompute, double-counting/dropping rows in the partial
    # stage (the SPARK-23207 failure class). Content-hash salting is
    # stable across retries; rows with identical full content share a
    # salt, which only matters if a hot key is also all-duplicate rows.
    # Map columns are not hashable (AnalysisException) and are skipped.
    from pyspark.sql.types import MapType

    hash_cols = [f.name for f in df.schema.fields if not isinstance(f.dataType, MapType)]
    if not hash_cols:
        hash_cols = [key]
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*hash_cols), F.lit(salts)))
    partial = salted.groupBy(key, "__salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(key).agg(*[c.alias(name) for name, c in merge_aggs.items()])


def hot_keys(df: DataFrame, key: str, min_count: int) -> list:
    """Discover hot keys by exact frequency (run on a sample at real
    scale)."""
    return [
        r[0]
        for r in df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= min_count).select(key).collect()
    ]


def skew_broadcast_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot: Sequence,
    how: str = "inner",
) -> DataFrame:
    """Split-and-union skew join: hot-key rows take a broadcast join
    (no shuffle of the skewed partition), the tail takes the regular
    join. Requires the hot slice of ``right`` to fit in a broadcast.
    """
    if not hot:
        return left.join(right, key, how)
    hot_lit = list(hot)
    # NULL keys: isin → NULL routes them out of BOTH branches under
    # plain negation (3VL), silently dropping rows an outer join must
    # keep — they belong to the tail (never hot, never matching)
    left_hot = left.filter(F.col(key).isin(hot_lit))
    left_tail = left.filter(~F.col(key).isin(hot_lit) | F.col(key).isNull())
    right_hot = right.filter(F.col(key).isin(hot_lit))
    right_tail = right.filter(~F.col(key).isin(hot_lit) | F.col(key).isNull())
    joined_hot = left_hot.join(F.broadcast(right_hot), key, how)
    joined_tail = left_tail.join(right_tail, key, how)
    return joined_hot.unionByName(joined_tail)
