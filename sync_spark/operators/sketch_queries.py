"""Mergeable-sketch rollups (Apache DataSketches via Spark builtins:
``hll_sketch_agg`` / ``hll_union_agg`` / ``theta_sketch_agg`` /
``theta_intersection`` / ``theta_difference``).

The 100 TB pattern these encode: COUNT(DISTINCT) does not decompose —
a global distinct over 100 TB is one giant shuffle of every key, and
re-running it per dashboard query is unpayable. Sketches decompose:
aggregate a fixed-size sketch per partition grain (day, table, shard)
ONCE, then answer any rollup by merging sketches — bytes, not keys —
in milliseconds. Theta sketches additionally support set algebra
(intersection / difference) that HLL fundamentally cannot express,
e.g. "users who clicked AND purchased" across pre-aggregated segments
without re-scanning events.

Both queries are SELF-CHECKING in the ``chk_*`` style (exact
companions computed Spark-side force the real work; bound booleans
are constants the DuckDB oracle states) so the driver hash-gates the
sketch path even though sketch estimates are engine-specific:
estimates ride inside booleans, never raw in the output.

Reference parity: the reference has no sketches (its only
approximation is Mongo's EstimatedDocumentCount, SURVEY §2.4 A3);
this is the LLM-pipeline/analytics extension surface.

Scale posture: per-grain sketch state is KBs regardless of input
size; the rollup is a standard two-level partial aggregation (map-side
sketch build, reduce-side merge); the merge query moves only sketch
bytes. No collect, no Python, all JVM aggregate buffers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_spark.sources.readers import read_table

# estimates must land within 5% of exact (or ±3 absolute for tiny
# sets, where relative bounds are meaningless). Measured: exact
# agreement at sf0.001-0.01 (sketches in exact/sparse mode below
# their promotion thresholds), well under 2% at sf0.1.
REL_ERR = 0.05
ABS_ERR = 3


def _within(est: F.Column, exact: F.Column) -> F.Column:
    tol = F.greatest(F.lit(ABS_ERR).cast("double"), exact * F.lit(REL_ERR))
    return F.abs(est.cast("double") - exact) <= tol


def a_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day HLL sketches of distinct users, merged to the global
    distinct — the pre-aggregate-once / merge-anywhere rollup."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_day"),
    )
    per_day_viol = F.sum(
        F.when(~_within(F.hll_sketch_estimate("sk"), F.col("exact_day")), 1).otherwise(0)
    )
    merged = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        per_day_viol.cast("long").alias("daily_violations"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
        F.max("exact_day").alias("max_day_exact"),
    )
    exact_total = ev.agg(F.countDistinct("user_id").alias("exact_total"))
    return merged.crossJoin(exact_total).select(
        "n_days",
        "exact_total",
        (F.col("daily_violations") == 0).alias("daily_bound_ok"),
        _within(F.col("est_total"), F.col("exact_total")).alias("merged_bound_ok"),
        # union monotonicity: the merged estimate can't undercut the
        # biggest single day beyond tolerance
        (
            F.col("est_total").cast("double")
            >= F.col("max_day_exact") * F.lit(1 - REL_ERR) - F.lit(ABS_ERR)
        ).alias("merged_ge_max_day"),
    )


A_HLL_ROLLUP_SQL = """
SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_total,
       TRUE AS daily_bound_ok,
       TRUE AS merged_bound_ok,
       TRUE AS merged_ge_max_day
FROM events
"""


def a_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over pre-aggregated per-event-type
    sketches: distinct users who clicked AND purchased (intersection)
    and who clicked but never purchased (difference) — answered from
    two sketches, without re-scanning events."""
    ev = read_table(spark, sf_dir, "events")
    sks = ev.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    a = sks.filter(F.col("event_type") == "click").select(F.col("sk").alias("sk_a"))
    b = sks.filter(F.col("event_type") == "purchase").select(F.col("sk").alias("sk_b"))
    ests = a.crossJoin(b).select(
        F.theta_sketch_estimate("sk_a").alias("est_a"),
        F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b")).alias("est_inter"),
        F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b")).alias("est_diff"),
    )
    exact = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
        )
        .agg(
            F.sum("c").cast("long").alias("exact_click"),
            F.sum(F.col("c") * F.col("p")).cast("long").alias("exact_inter"),
            F.sum(F.col("c") * (1 - F.col("p"))).cast("long").alias("exact_diff"),
        )
    )
    return exact.crossJoin(ests).select(
        "exact_click",
        "exact_inter",
        "exact_diff",
        _within(F.col("est_a"), F.col("exact_click")).alias("a_bound_ok"),
        _within(F.col("est_inter"), F.col("exact_inter")).alias("inter_bound_ok"),
        _within(F.col("est_diff"), F.col("exact_diff")).alias("diff_bound_ok"),
    )


A_THETA_SET_SQL = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY user_id
)
SELECT CAST(SUM(c) AS BIGINT) AS exact_click,
       CAST(SUM(c * p) AS BIGINT) AS exact_inter,
       CAST(SUM(c * (1 - p)) AS BIGINT) AS exact_diff,
       TRUE AS a_bound_ok,
       TRUE AS inter_bound_ok,
       TRUE AS diff_bound_ok
FROM per_user
"""


def a_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-rollup pattern ANSWERING a real dashboard query:
    7-day ROLLING distinct users per window start, computed by
    merging the 7 overlapping days' pre-built HLL sketches — the
    metric a sum of daily distincts cannot give (users repeat across
    days) and a per-window COUNT(DISTINCT) re-shuffles the events ×7
    to get. Here events are sketched ONCE per day; each window is a
    7-sketch merge (KBs). Self-checking: the exact per-window
    distinct (computed the expensive way) rides along with a bound
    boolean the oracle states as TRUE."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # day d belongs to the 7 windows starting d-6 .. d
    wins = daily.select(
        F.explode(
            F.array(*[F.date_sub(F.col("day"), o) for o in range(7)])
        ).alias("ws"),
        "sk",
    )
    rolled = wins.groupBy("ws").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = (
        ev.select(
            F.explode(
                F.array(*[F.date_sub(F.to_date("ts"), o) for o in range(7)])
            ).alias("ws"),
            "user_id",
        )
        .groupBy("ws")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        rolled.join(exact, "ws")
        .select(
            F.date_format("ws", "yyyy-MM-dd").alias("window_start"),
            "exact_users",
            _within(F.col("est"), F.col("exact_users")).alias("bound_ok"),
        )
        .orderBy("window_start")
    )


A_ROLLING_DISTINCT_SQL = """
WITH exploded AS (
  SELECT CAST(ts AS DATE) - CAST(o AS INT) AS ws, user_id
  FROM events, (SELECT unnest(range(7)) AS o)
)
SELECT strftime(ws, '%Y-%m-%d') AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS bound_ok
FROM exploded GROUP BY ws ORDER BY window_start
"""
