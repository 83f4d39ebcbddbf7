"""Temporal operators Spark lacks natively: as-of join and
sessionization (SURVEY.md §2.9 extension surface; pyspark guide's
"common OLAP patterns").

As-of join, Spark-first: instead of a range join (which Catalyst
would plan as a broadcast-nested-loop), we UNION the two sides tagged,
sort once per key, and propagate the last-seen right row with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
One shuffle on the key, O(n log n) per key, no cartesian anywhere —
this is the plan you want at 100 TB (merge_asof via applyInPandas
would ship every row through Arrow; this stays JVM-side).

Sessionization: classic lag + gap-flag + running-sum session ids —
two window passes over one key-shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` within the same ``key``.

    ``right`` must be unique per (key, right_ts) — pre-compact it if
    not (ties would be ambiguous in any engine).
    """
    lcols = left.columns
    # right columns travel as ONE struct: per-column last(ignorenulls)
    # would skip a genuinely-NULL value in the matched right row and
    # backfill it from an OLDER right row — a mixed-row result no ASOF
    # engine produces. The single struct is non-null exactly on right
    # rows, so ignorenulls only skips left-tagged rows.
    right_struct = F.struct(*[F.col(c) for c in right_cols])
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        F.lit(None)
        .cast(right.select(right_struct.alias("__r")).schema["__r"].dataType)
        .alias("__r"),
    )
    tagged_right = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            tagged_left.schema["__l"].dataType
        ).alias("__l"),
        right_struct.alias("__r"),
    )
    # right sorts before left at equal ts → ties match (ASOF >= semantics)
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "__is_left",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__rf"),
    ).filter(F.col("__is_left") == 1)
    return filled.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__rf.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``. Adds
    ``session_id`` (1-based per key)."""
    order = [F.col(ts).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts)), 1).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def range_join_binned(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
) -> DataFrame:
    """Range (interval-containment) join without an equi key:
    ``left.ts ∈ [start, end)`` — half-open, so touching intervals
    never double-match a boundary timestamp.

    Spark's planner turns a bare range predicate into
    BroadcastNestedLoopJoin (O(|left|·|intervals|) — the 100 TB
    killer). This rewrites it as an equi join on a time BIN: each
    left row carries floor(ts / bin), each interval explodes into
    the bins it touches, and bin equality becomes the join key with
    the exact range predicate as a post-filter. A (row, interval)
    match lands in exactly ONE bin — the row's own — so no dedup is
    needed. Work is |left| + Σ interval_bins candidate rows through
    one shuffle; choose ``bin_seconds`` ≈ the typical interval length
    (each interval then explodes into ~2 bins).

    Binning uses second-truncated timestamps on BOTH sides —
    truncation is monotonic, so candidate bins only ever widen and
    the exact predicate keeps correctness to the microsecond.
    """
    lb = left.withColumn("__bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    return (
        lb.join(iv, "__bin")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bin")
    )
