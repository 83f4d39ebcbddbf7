"""Batch operator queries (SURVEY.md §2.1–§2.7) with DuckDB oracles.

Naming: prefix = SURVEY section (s=scan, p=predicate, a=aggregate,
w=window, o=sort/limit, u=set-op, j=join/merge). Every computed column
is aliased identically in the Spark plan and the oracle SQL.

Scale notes per query are inline — the driver tests at sf0.01 but the
plans are written for the 100 TB case: literal range predicates push
to the scan, dimension joins broadcast, aggregations are partial
(map-side) by construction, and the one intentionally-shuffling op
(latest-per-key) shuffles exactly once on the key.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sync_spark import tz
from sync_spark.operators.merge import apply_changes
from sync_spark.operators.relational import _t, dec

# ---------------------------------------------------------------------------
# Scans / projections / filters (S1/S3, P1-P4)
# ---------------------------------------------------------------------------


def s_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 projection + P3/P4 comparison predicates; both reach the
    parquet scan (PushedFilters + 3-column ReadSchema)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000.0))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


S_SCAN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
"""


def p_isin_opfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P10 op-type / table-mapping style isin filter over the event
    stream shape, aggregated per type."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


P_ISIN_SQL = """
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
GROUP BY event_type ORDER BY event_type
"""


def _jst_bounds_pred(colname: str, start, end):
    return (F.col(colname) >= F.lit(tz.fmt(start)).cast("timestamp")) & (
        F.col(colname) < F.lit(tz.fmt(end)).cast("timestamp")
    )


def p_daterange_daily_jst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: one JST calendar day (2024-01-15 JST) as a UTC literal range
    — boundary math in tz.py, predicate pushed to the scan."""
    start, end = tz.jst_day_range(date(2024, 1, 15))
    return (
        _t(spark, sf_dir, "events")
        .filter(_jst_bounds_pred("ts", start, end))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


P_DAILY_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-14 15:00:00' AND ts < TIMESTAMP '2024-01-15 15:00:00'
GROUP BY event_type ORDER BY event_type
"""


def p_daterange_offset_jst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: {type: daily, startOffset: -7, endOffset: 0} anchored at
    2024-01-20 JST (anchor fixed for determinism; the reference anchors
    at "now", external_simple.go:528-596)."""
    start, end = tz.jst_offset_day_range(date(2024, 1, 20), -7, 0)
    return (
        _t(spark, sf_dir, "events")
        .filter(_jst_bounds_pred("ts", start, end))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


P_OFFSET_SQL = """
SELECT COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE ts >= TIMESTAMP '2024-01-12 15:00:00' AND ts < TIMESTAMP '2024-01-19 15:00:00'
"""


def p_daterange_month_jst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: monthly window (Jan 2024 JST)."""
    start, end = tz.jst_month_range(date(2024, 1, 15))
    return (
        _t(spark, sf_dir, "events")
        .filter(_jst_bounds_pred("ts", start, end))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


P_MONTH_SQL = """
SELECT COUNT(*) AS n_events FROM events
WHERE ts >= TIMESTAMP '2023-12-31 15:00:00' AND ts < TIMESTAMP '2024-01-31 15:00:00'
"""


# ---------------------------------------------------------------------------
# Aggregations (A1-A8)
# ---------------------------------------------------------------------------


def a_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: countQuery-style filtered count (single row)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000.0))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


A_FILTERED_COUNT_SQL = """
SELECT COUNT(*) AS cnt FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice < 50000.0
"""


def a_group_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-group daily-delta shape — MAX(x)-MIN(x), MAX(x), latest
    timestamp (sync_handler.go:446-495 over monitoring_log, expressed
    over the events table)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            (F.max("value") - F.min("value")).alias("value_delta"),
            F.max("value").alias("value_max"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("latest_ts"),
        )
        .orderBy("event_type")
    )


A_GROUP_DELTA_SQL = """
SELECT event_type,
       MAX(value) - MIN(value) AS value_delta,
       MAX(value) AS value_max,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS latest_ts
FROM events GROUP BY event_type ORDER BY event_type
"""


def a_grand_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: grand-total rollup — sums + distinct counts across the
    whole stream (monitor_handler.go:399-484)."""
    return _t(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.countDistinct("event_type").alias("distinct_types"),
    )


A_GRAND_TOTAL_SQL = """
SELECT COUNT(*) AS total_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(DISTINCT event_type) AS distinct_types
FROM events
"""


def a_daily_window_jst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/T9: per-JST-day tumbling aggregation — the windowed
    re-expression of the reference's reset-in-place daily counters
    (monitor.go:839-933)."""
    ev = _t(spark, sf_dir, "events")
    jst_day = F.date_format(F.from_utc_timestamp(F.col("ts"), "Asia/Tokyo"), "yyyy-MM-dd")
    return (
        ev.groupBy(jst_day.alias("jst_day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("jst_day")
    )


A_DAILY_WINDOW_SQL = """
SELECT strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d') AS jst_day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1 ORDER BY 1
"""


def a_counter_daily_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 parity, the upsert-with-daily-reset fold ITSELF (the
    reference's changestream_statistics maintenance,
    monitor.go:839-933): every event upserts its stream's running
    counters, and the first update of a new JST day resets them to
    zero before applying — so the counter value right after any
    update equals the within-JST-day running totals at that event.
    This query returns each day's END-OF-DAY readout of that counter:
    the running totals at the day's last update, per stream
    (event_type plays the reference's (task_id, collection) key;
    received/executed/pending mirror the reset column set, with
    executed = value-above-threshold events, a non-degenerate split
    of the fixture).

    Scale (r8): the readout at the day's last event IS the day's
    total — the per-event running trace the r7 version materialized
    (two window passes sorting every day's events inside one reducer,
    then keeping only rn == 1) was discarded work. One hash aggregate
    computes it: count/sum partial-combine map-side and
    ``max_by(event_id, (ts, event_id))`` carries the last event id —
    no Window, no sort, one shuffle of at most |stream×day| partial
    rows per task."""
    ev = _t(spark, sf_dir, "events")
    jst_day = F.date_format(F.from_utc_timestamp(F.col("ts"), "Asia/Tokyo"), "yyyy-MM-dd")
    base = ev.select(
        F.col("event_type").alias("stream"),
        jst_day.alias("jst_day"),
        "ts",
        "event_id",
        F.when(F.col("value") >= 50, 1).otherwise(0).alias("ok"),
    )
    return (
        base.groupBy("stream", "jst_day")
        .agg(
            F.count(F.lit(1)).alias("received"),
            F.sum("ok").cast("long").alias("executed"),
            # (ts, event_id) is the same total order the reset fold
            # applies updates in; event_id uniqueness makes the argmax
            # deterministic
            F.max_by("event_id", F.struct("ts", "event_id")).alias("last_event_id"),
        )
        .select(
            "stream",
            "jst_day",
            "received",
            "executed",
            (F.col("received") - F.col("executed")).alias("pending"),
            "last_event_id",
        )
        .orderBy("stream", "jst_day")
    )


A_COUNTER_RESET_SQL = """
WITH trace AS (
  SELECT event_type AS stream,
         strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d') AS jst_day,
         event_id,
         COUNT(*) OVER w AS received,
         SUM(CASE WHEN value >= 50 THEN 1 ELSE 0 END) OVER w AS executed,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d')
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WINDOW w AS (
    PARTITION BY event_type, strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d')
    ORDER BY ts, event_id)
)
SELECT stream, jst_day,
       CAST(received AS BIGINT) AS received,
       CAST(executed AS BIGINT) AS executed,
       CAST(received - executed AS BIGINT) AS pending,
       event_id AS last_event_id
FROM trace WHERE rn = 1 ORDER BY stream, jst_day
"""


# ---------------------------------------------------------------------------
# Windows (W1-W3) — one shuffle on the partition key each
# ---------------------------------------------------------------------------


def w_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: latest event per user — the CDC compaction primitive.
    Tiebreak on event_id makes it deterministic under any shuffle."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


W_LATEST_SQL = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 generalized: top-3 orders by price per priority class."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
    )


W_TOPK_SQL = """
SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def w_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag per user over event time (§2.5 analytic
    surface). Running sum in DECIMAL so the prefix sums are exact."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_value"),
        F.lag("event_id", 1).over(w).alias("prev_event_id"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)).alias("us_since_prev"),
    )


W_RUNNING_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
       lag(event_id, 1) OVER w AS prev_event_id,
       epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS us_since_prev
FROM events WHERE user_id < 10
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1-O5)
# ---------------------------------------------------------------------------


def o_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 shape: global top-100 (Spark plans TakeOrderedAndProject —
    per-partition heap, no full sort). Tiebreak keeps it deterministic."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


O_TOPK_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def o_time_ordered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: metrics-scan shape — since-filter + ORDER BY ts LIMIT 1000
    (monitor_handler.go:92-139)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(1000)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
            "event_type",
            "value",
        )
    )


O_TIME_SCAN_SQL = """
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, event_type, value
FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
ORDER BY ts ASC, event_id ASC LIMIT 1000
"""


# ---------------------------------------------------------------------------
# Set operations (U1-U3)
# ---------------------------------------------------------------------------


def u_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: multi-table merge — two disjoint slices unioned then
    re-aggregated (the date-suffixed sibling-table export,
    external_simple.go:250-388)."""
    o = _t(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    late = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    return (
        early.unionByName(late)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )


U_UNION_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders FROM (
  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  UNION ALL
  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
) GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def u_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT over nation keys (consistency-diff primitive,
    SURVEY §2.7)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("side", F.lit("both"))
    cust_only = c.subtract(s).withColumn("side", F.lit("customer_only"))
    return both.unionByName(cust_only).orderBy("side", "nationkey")


U_INTERSECT_SQL = """
SELECT nationkey, 'both' AS side FROM
  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS side FROM
  (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
ORDER BY side, nationkey
"""


# ---------------------------------------------------------------------------
# Joins (J1-J3)
# ---------------------------------------------------------------------------


def j_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact × 3 dims → grouped revenue. nation/region are
    fixed-cardinality (25/5 rows) and hint-broadcast; customer scales
    150k×SF so its pick is left to AQE (it broadcasts at every tested
    sf and can demote at 100 TB — a hard hint can't). At 100 TB the
    only guaranteed shuffle is the final (25-group) aggregation
    (checked via explain in tests)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


J_REVENUE_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


def j_anti_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins: customers with vs without orders, per segment
    (U3 existing-index-difference generalized)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    with_orders = (
        c.join(o, "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("kind", F.lit("with_orders"))
    )
    without = (
        c.join(o, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("kind", F.lit("without_orders"))
    )
    return with_orders.unionByName(without).orderBy("kind", "c_mktsegment")


J_ANTI_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n, 'with_orders' AS kind FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY c_mktsegment
UNION ALL
SELECT c_mktsegment, COUNT(*) AS n, 'without_orders' AS kind FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY c_mktsegment
ORDER BY kind, c_mktsegment
"""


def j_src_tgt_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: source-vs-target count comparison — full outer join of two
    per-key aggregates + abs diff (monitor.go:281-304, 1117-1155)."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("src_count"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("tgt_count"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("src_count", F.lit(0)).alias("src_count"),
            F.coalesce("tgt_count", F.lit(0)).alias("tgt_count"),
            F.abs(F.coalesce("src_count", F.lit(0)) - F.coalesce("tgt_count", F.lit(0))).alias(
                "diff"
            ),
        )
        .orderBy("nationkey")
    )


J_DIFF_SQL = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(src_count, 0) AS src_count,
       COALESCE(tgt_count, 0) AS tgt_count,
       ABS(COALESCE(src_count, 0) - COALESCE(tgt_count, 0)) AS diff
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS src_count FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS tgt_count FROM supplier GROUP BY 1) s
USING (nationkey)
ORDER BY nationkey
"""


def j_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 + W2: the CDC apply contract as a batch query. A synthetic
    change feed (derived deterministically from orders) is compacted to
    latest-per-key and MERGEd into customer: deletes drop, matches
    update, new keys insert."""
    target = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    changes = o.select(
        (F.col("o_custkey") + F.when(F.col("o_orderkey") % 3 == 0, 1000000).otherwise(0)).alias(
            "c_custkey"
        ),
        F.concat(F.lit("CDC#"), F.col("o_custkey").cast("string")).alias("c_name"),
        (F.col("o_custkey") % 25).cast("int").alias("c_nationkey"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderpriority").alias("c_mktsegment"),
        F.when(F.col("o_orderstatus") == "F", F.lit("delete")).otherwise(F.lit("upsert")).alias(
            "op"
        ),
        F.col("o_orderkey").alias("seq"),
    )
    return apply_changes(target, changes, keys=["c_custkey"], seq_col="seq")


J_MERGE_SQL = """
WITH changes AS (
  SELECT o_custkey + CASE WHEN o_orderkey % 3 = 0 THEN 1000000 ELSE 0 END AS c_custkey,
         'CDC#' || CAST(o_custkey AS VARCHAR) AS c_name,
         CAST(o_custkey % 25 AS INTEGER) AS c_nationkey,
         o_totalprice AS c_acctbal,
         o_orderpriority AS c_mktsegment,
         CASE WHEN o_orderstatus = 'F' THEN 'delete' ELSE 'upsert' END AS op,
         o_orderkey AS seq
  FROM orders WHERE o_orderkey % 7 = 0
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC, op ASC) AS rn
    FROM changes
  ) WHERE rn = 1
), ups AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM latest WHERE op <> 'delete'
), touched AS (
  SELECT c_custkey FROM latest
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT c_custkey FROM touched)
UNION ALL
SELECT * FROM ups
"""


def w_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking window surface (§2.5 breadth): ntile
    quartiles, percent_rank, cume_dist, and dense_rank over order
    totals per market segment — the analytic functions the latest-N /
    top-k queries don't touch. Deterministic ordering via the
    (o_totalprice, o_orderkey) tiebreak; percent_rank rounded to 6dp
    to absorb last-bit division differences."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    # scaled-INTEGER percent_rank/cume_dist, not ROUND(double, 6): the
    # true values are exact binary fractions (41/640 = 0.0640625) and
    # Spark's HALF_UP vs DuckDB's half-even disagree on such ties. The
    # tiebreak makes the ordering unique, so row_number stands in for
    # the rank/cume counts exactly; integer floor division agrees
    # across engines bit for bit.
    rn = F.row_number().over(w).cast("long")
    cnt = F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).cast("long")
    return (
        j.select(
            "o_orderkey",
            "c_mktsegment",
            F.ntile(4).over(w).alias("quartile"),
            rn.alias("rn"),
            cnt.alias("cnt"),
            F.dense_rank().over(w).alias("drank"),
        )
        .select(
            "o_orderkey",
            "c_mktsegment",
            "quartile",
            F.expr("((rn - 1) * 1000000) DIV (cnt - 1)").alias("pct_rank_e6"),
            F.expr("(rn * 1000000) DIV cnt").alias("cume_e6"),
            "drank",
        )
    )


W_RANK_DIST_SQL = """
SELECT o_orderkey, c_mktsegment,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       ((row_number() OVER w - 1) * 1000000)
         // (COUNT(*) OVER (PARTITION BY c_mktsegment) - 1) AS pct_rank_e6,
       (row_number() OVER w * 1000000)
         // COUNT(*) OVER (PARTITION BY c_mktsegment) AS cume_e6,
       CAST(dense_rank() OVER w AS INT) AS drank
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey < 3000
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice ASC, o_orderkey ASC)
"""
