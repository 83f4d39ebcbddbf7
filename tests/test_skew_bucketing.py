"""Skew operators (salted agg ≡ plain agg, split join ≡ plain join,
hot path broadcasts) and bucketed co-located joins (no shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sync_spark.operators.skew import hot_keys, salted_agg, skew_broadcast_join


def _skewed_df(spark):
    # key 0 is pathologically hot
    rows = [Row(k=0, v=i) for i in range(500)] + [Row(k=i % 7 + 1, v=i) for i in range(100)]
    return spark.createDataFrame(rows)


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r.k): (r.cnt, r.s)
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r.k): (r.cnt, r.s)
        for r in salted_agg(
            df,
            "k",
            {"cnt": F.count(F.lit(1)), "s": F.sum("v")},
            {"cnt": F.sum("cnt"), "s": F.sum("s")},
            salts=8,
        ).collect()
    }
    assert salted == plain


def test_skew_join_matches_plain_and_broadcasts(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(8)])
    hot = hot_keys(left, "k", min_count=400)
    assert hot == [0]
    split = skew_broadcast_join(left, right, "k", hot)
    plain = left.join(right, "k")
    assert split.count() == plain.count() == 600
    assert (
        split.agg(F.sum("v")).collect()[0][0] == plain.agg(F.sum("v")).collect()[0][0]
    )
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy co-location: joining two tables bucketed on the same
    key plans a SortMergeJoin with NO Exchange on either side."""
    import uuid

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    a, b = f"ba_{uuid.uuid4().hex[:6]}", f"bb_{uuid.uuid4().hex[:6]}"
    dfa = spark.createDataFrame([Row(k=i, va=i * 2) for i in range(1000)])
    dfb = spark.createDataFrame([Row(k=i, vb=i * 3) for i in range(1000)])
    dfa.write.bucketBy(8, "k").sortBy("k").saveAsTable(a)
    dfb.write.bucketBy(8, "k").sortBy("k").saveAsTable(b)
    try:
        # disable broadcast so the co-location is what saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(a).join(spark.table(b), "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # no shuffle: buckets align
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {a}")
        spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_skew_outer_join_keeps_null_keys(spark):
    left = spark.createDataFrame(
        [Row(k="hot", v=1), Row(k="cold", v=2), Row(k=None, v=3)]
    )
    right = spark.createDataFrame([Row(k="hot", w=10), Row(k="cold", w=20)])
    out = skew_broadcast_join(left, right, "k", hot=["hot"], how="left").collect()
    plain = left.join(right, "k", "left").collect()
    key = lambda t: (str(t[0]), t[1], str(t[2]))  # None-safe ordering
    assert sorted(((r.k, r.v, r.w) for r in out), key=key) == sorted(
        ((r.k, r.v, r.w) for r in plain), key=key
    )
    assert any(r.k is None for r in out)  # the NULL-key row survived


def test_salted_agg_tolerates_map_columns(spark):
    df = spark.createDataFrame(
        [Row(k="a", v=1, m={"x": "1"}), Row(k="a", v=2, m={"y": "2"})]
    )
    out = salted_agg(
        df, "k", {"s": F.sum("v")}, {"s": F.sum("s")}
    ).collect()
    assert out[0].s == 3
