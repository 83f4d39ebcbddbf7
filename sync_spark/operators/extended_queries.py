"""Extended coverage queries: as-of join, sessionization, SQL
passthrough, pivot, rollup, approximate distinct (SURVEY.md §2.1 S21,
§2.4 A3/A7, §2.9 extensions)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sync_spark.operators.relational import _t, dec
from sync_spark.operators.temporal import asof_join, sessionize
from sync_spark.session import load_tables

# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent click
# ---------------------------------------------------------------------------


def x_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    # unique per (user, ts): keep max event_id (tie discipline shared
    # with the oracle)
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = clicks.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts", right_cols=["event_id"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "value",
        F.col("event_id_right").alias("click_event_id"),
    )


X_ASOF_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       p.value, c.click_event_id
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# Sessionization: 30-minute-gap sessions per user
# ---------------------------------------------------------------------------


def x_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions via the reusable ``sessionize`` operator.
    No final ORDER BY (round 5): the driver's compare sorts rows
    before hashing, so the global range-sort (a sampling pass + an
    extra exchange) bought nothing — same reasoning as
    a_session_window_agg; oracle updated to match (set semantics on
    both sides)."""
    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
    )


X_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
  -- same (ts, event_id) tiebreak as the flag window: an untied ORDER
  -- BY ts would assign ambiguous session ids to same-timestamp events
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# S21: ad-hoc SQL passthrough — the SAME ANSI string runs on Spark and
# DuckDB (strictly more general than the reference's pattern-matched
# passthrough, auth_handler.go:1267-1883)
# ---------------------------------------------------------------------------

_PASSTHROUGH_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_big_spenders,
       CAST(MIN(total_spent) AS BIGINT) AS min_spent
FROM (
  SELECT c.c_custkey, c.c_mktsegment,
         -- FLOOR before the BIGINT cast: decimal->int casts truncate
         -- in Spark but round in DuckDB; FLOOR agrees everywhere
         CAST(FLOOR(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))) AS BIGINT) AS total_spent
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
  HAVING SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) > 1000000
) t
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the corpus as temp views and run arbitrary SQL."""
    load_tables(spark, sf_dir)
    return spark.sql(query)


def s21_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _PASSTHROUGH_SQL)


S21_SQL = _PASSTHROUGH_SQL


# ---------------------------------------------------------------------------
# Pivot + rollup (Catalyst-native operators the reference lacks;
# exposed per SURVEY §2.4 A7 note)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def a_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    return (
        ev.groupBy(day)
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
        .orderBy("day")
    )


A_PIVOT_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'view') AS view,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'error') AS error
FROM events GROUP BY 1 ORDER BY 1
"""


def a_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


A_ROLLUP_SQL = """
SELECT n_name, c_mktsegment,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
ORDER BY n_name, c_mktsegment
"""


def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per event type —
    Spark `percentile` vs DuckDB `quantile_cont`, rounded to 6dp to
    absorb last-bit interpolation differences."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


A_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def f_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface (SURVEY §2.8 note): tokenize → explode → top-20
    token frequencies. The explode is the generic nested-array
    flattening path (Mongo array fields)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


F_ARRAY_EXPLODE_SQL = r"""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
"""


def a_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations
    (§2.4 note: full cube exposed via builtin)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


A_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""


def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the same ANSI string runs on both engines
    (partial-cube shapes the reference's rollups never had)."""
    return run_sql(spark, sf_dir, _GROUPING_SETS_SQL)


A_GROUPING_SETS_SQL = _GROUPING_SETS_SQL


def f_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface (§2.8 note): per-user map of
    event_type → count built with map_from_entries, then key lookups
    and size. The oracle checks the extracted VALUES (map literals
    stringify engine-specifically)."""
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return as_map.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("purchases"),
        F.size("m").alias("n_types"),
    ).orderBy("user_id")


F_MAP_SQL = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS clicks,
       COUNT(*) FILTER (event_type = 'purchase') AS purchases,
       CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types
FROM events GROUP BY user_id ORDER BY user_id
"""


def f_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack): wide per-day event counts back to long form —
    round-trips the pivot surface (§2.4 note)."""
    wide = a_pivot_daily_types(spark, sf_dir)
    return wide.select(
        "day",
        F.expr(
            "stack(5, 'click', click, 'view', view, 'purchase', purchase, "
            "'signup', signup, 'error', error) AS (event_type, n)"
        ),
    ).orderBy("day", "event_type")


F_UNPIVOT_SQL = """
WITH wide AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         COUNT(*) FILTER (event_type = 'click') AS click,
         COUNT(*) FILTER (event_type = 'view') AS view,
         COUNT(*) FILTER (event_type = 'purchase') AS purchase,
         COUNT(*) FILTER (event_type = 'signup') AS signup,
         COUNT(*) FILTER (event_type = 'error') AS error
  FROM events GROUP BY 1
)
SELECT day, event_type, CAST(n AS BIGINT) AS n
FROM (UNPIVOT wide ON click, view, purchase, signup, error INTO NAME event_type VALUE n)
ORDER BY day, event_type
"""


def a_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: approximate distinct (HLL++). Deterministic for fixed data
    but engine-specific → rows-only check; the exact companion column
    bounds the relative error in tests."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def a_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch via
    percentile_approx) next to their exact companions — the
    mergeable-sketch path for 100 TB where exact percentiles would
    need a full sort. Engine-specific sketch → rows-only; the error
    bound is asserted in tests."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 1000).alias("p50_approx"),
            F.expr("percentile(value, 0.5)").alias("p50_exact"),
            F.percentile_approx("value", 0.99, 1000).alias("p99_approx"),
            F.expr("percentile(value, 0.99)").alias("p99_exact"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Range join: events inside derived "campaign windows" (no equi key)
# ---------------------------------------------------------------------------


def x_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join with NO equi key: campaign windows =
    [first event of each (type, day), +2h); count/sum every event —
    any type, any user — falling inside each window. Binned equi-join
    rewrite (see temporal.range_join_binned); the oracle does the
    naive BETWEEN join."""
    from sync_spark.operators.temporal import range_join_binned

    ev = _t(spark, sf_dir, "events")
    windows = (
        ev.groupBy(F.col("event_type").alias("w_type"), F.to_date("ts").alias("w_day"))
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 2 HOURS"))
    )
    joined = range_join_binned(
        ev.select("event_id", "ts", "value"),
        windows,
        ts_col="ts",
        start_col="w_start",
        end_col="w_end",
        bin_seconds=7200,
    )
    return (
        joined.groupBy("w_type", "w_day")
        .agg(
            F.count(F.lit(1)).alias("n_in_window"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "w_type",
            F.date_format("w_day", "yyyy-MM-dd").alias("w_day_str"),
            "n_in_window",
            "sum_value",
        )
    )


X_RANGE_SQL = """
WITH windows AS (
  SELECT event_type AS w_type, CAST(ts AS DATE) AS w_day, MIN(ts) AS w_start,
         MIN(ts) + INTERVAL 2 HOUR AS w_end
  FROM events GROUP BY 1, 2
)
SELECT w.w_type, strftime(w.w_day, '%Y-%m-%d') AS w_day_str,
       COUNT(*) AS n_in_window,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e JOIN windows w
  ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY 1, 2
"""


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def s_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling — per-column null count, distinct count, and
    lexicographic min/max (stringified) over orders, in ONE pass.

    Shape: MELT first (explode one array of (col_name, stringified
    value) structs — a single Generate), then one grouped aggregation
    by col_name with ONE distinct. The tempting alternative — a wide
    agg with COUNT(DISTINCT c) per column — plans an Expand with
    n_cols+1 projections and a composite distinct keyed on every
    column at once; measured 2.8-3.7s vs 0.4-1.5s for this shape at
    sf0.1. Stringification is injective for these column types, so
    distinct-on-string equals distinct-on-value (the oracle counts
    typed values).

    Scale note: the melt replicates the table ×n_cols through one
    shuffle. At 100 TB profile with approx_count_distinct per column
    instead (constant HLL buffers, no melt); exact distinct is used
    here because the DuckDB oracle must hash-match."""
    o = _t(spark, sf_dir, "orders")
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"), F.col(c).cast("string").alias("val")
                )
                for c in _PROFILE_COLS
            ]
        )
    ).alias("p")
    m = o.select(pairs).select("p.col_name", "p.val")
    return (
        m.groupBy("col_name")
        .agg(
            F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulls"),
            F.countDistinct("val").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("col_name")
    )


def _profile_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS col_name,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_val,
       MAX(CAST({c} AS VARCHAR)) AS max_val
FROM orders"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


S_PROFILE_SQL = _profile_sql()


def a_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 extension: HOPPING (sliding) event-time windows via the
    builtin ``window(ts, '7 days', '1 day')`` — each event lands in 7
    overlapping windows; the same expression drives a streaming
    aggregation unchanged. Oracle replays the semantics by joining
    each event to its 7 epoch-aligned window starts."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("window_start"),
            F.date_format("w.end", "yyyy-MM-dd").alias("window_end"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


A_HOPPING_SQL = """
WITH exploded AS (
  SELECT date_trunc('day', ts) - (CAST(o AS INT) * INTERVAL 1 DAY) AS ws,
         value
  FROM events, (SELECT unnest(range(7)) AS o)
)
SELECT strftime(ws, '%Y-%m-%d') AS window_start,
       strftime(ws + INTERVAL 7 DAY, '%Y-%m-%d') AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM exploded
GROUP BY ws ORDER BY window_start
"""


def a_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 extension: per-user SESSION windows (start = first event,
    end = last event + gap; events merge while each arrives strictly
    within the gap — a gap of exactly 30:00 starts a new session,
    the builtin ``session_window``'s STRICT rule).

    Round-5 form: the lag/cumsum construction (the same kernel the
    oracle runs) instead of the batch ``session_window`` builtin —
    verified result-identical at sf0.1. Both plans pay exactly one
    hash(user_id) exchange, but the builtin stacks a struct-keyed
    partial HashAggregate + MergingSessions + final HashAggregate on
    top of the sort, where this form is two same-spec window passes
    (lag, running sum — second pass reuses the first's sort) feeding
    a final aggregate whose user_id-prefixed grouping needs NO new
    exchange. Built as one spark.sql analysis pass. The builtin
    session_window stays the STREAMING path (state-store merges,
    streaming/windows.py) where its incremental merge semantics are
    the point; in batch it is pure overhead. No final ORDER BY on
    either side: the result is a session SET (the driver's compare
    sorts before hashing), and the global range-sort was measured at
    half the query's runtime."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__sess_events")
    return spark.sql("""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR unix_micros(ts) - lag(unix_micros(ts)) OVER w >= 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM __sess_events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       date_format(MIN(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS session_start,
       date_format(MAX(ts) + INTERVAL 30 MINUTES, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, sid
""")


A_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
  -- same (ts, event_id) tiebreak as the flag window (the x_sessionize
  -- oracle's established discipline): an untied cumsum could assign
  -- ambiguous session ids to same-timestamp boundary events
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, sid
"""


def a_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple the
    monitoring surface grows into: users cohorted by first-active
    week, then distinct active users per (cohort_week, week_offset).
    Shape (r11, guide §2.4): the r5 form consumed the distinct
    activity table twice (cohort aggregate + join), so the events
    scan and the (user_id, week) dedup both ran twice and the cohort
    attach was a user-grain join. cohort_week is just
    MIN(week) OVER (PARTITION BY user_id) on the SAME activity rows —
    one scan, the distinct keeps its map-side partial dedup, and the
    join is gone. The user-grain window partitioning is the key the
    join would have shuffled on anyway; no broadcast hints (cohort
    data is user-grain, never broadcastable at 100 TB)."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("__ret_events")
    return spark.sql("""
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM __ret_events
), c AS (
  SELECT user_id, week,
         MIN(week) OVER (PARTITION BY user_id) AS cohort_week
  FROM act
)
SELECT date_format(cohort_week, 'yyyy-MM-dd') AS cohort_week,
       CAST(datediff(week, cohort_week) / 7 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM c
GROUP BY c.cohort_week, CAST(datediff(week, cohort_week) / 7 AS BIGINT)
ORDER BY cohort_week, week_offset
""")


A_RETENTION_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
), cohorts AS (
  SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
)
SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST((week - a.cohort_week) / 7 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT activity.user_id) AS BIGINT) AS n_users
FROM activity JOIN cohorts a USING (user_id)
GROUP BY a.cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def a_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase, each step
    strictly AFTER the previous step's first completion): distinct
    users completing each prefix.

    Shape (r11, guide §2.4): three LAYERED unbounded windows over ONE
    user_id partitioning — t1 = min view ts, t2 = min click ts > t1,
    t3 = min purchase ts > t2 — then a same-partitioning per-user
    collapse and one global count. The r4 chained join-aggregate form
    inlined each step's subtree into every later step (v evaluated
    4×, c 2×: 7 event scans, 6 exchanges, 10 broadcasts at bench
    scale); this is one scan and one real exchange, identical counts
    (a user with no view has NULL t1, so the t2 CASE never fires —
    exactly the inner join's drop). At 100 TB the window ships the
    same (user_id, type, ts) rows the step joins already shuffled,
    on the same key."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("__funnel_events")
    return spark.sql("""
WITH w AS (
  SELECT user_id, event_type, ts FROM __funnel_events
  WHERE event_type IN ('view', 'click', 'purchase')
), a AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM w
), b AS (
  SELECT user_id, event_type, ts, t1,
         MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2
  FROM a
), c AS (
  SELECT user_id, t1, t2,
         MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM b
), u AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM c GROUP BY user_id
)
SELECT COUNT(t1) AS step1_users, COUNT(t2) AS step2_users, COUNT(t3) AS step3_users
FROM u
""")


A_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS step1_users,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS step2_users,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS step3_users
"""
