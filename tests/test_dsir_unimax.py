"""Semantic invariants for the DSIR importance-selection and UniMax
budget-allocation operators (their bit-exact oracle check lives in
test_registry_oracle.py with every other registry entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sync_spark.operators import text_queries as tq


def test_dsir_prefers_target_slice(spark, sf_small):
    """The importance weight exists to up-rank documents that look like
    the target (lang='en') slice: the en share of the top-100 must
    exceed the en share of the corpus."""
    top = tq.t_dsir_select(spark, sf_small)
    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    joined = top.join(d.select("doc_id", "lang"), "doc_id")
    n_top = joined.count()
    n_top_en = joined.filter(F.col("lang") == "en").count()
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
    ).first()
    assert n_top > 0
    assert n_top_en / n_top > stats["n_en"] / stats["n"]


def test_dsir_sorted_and_deterministic(spark, sf_small):
    rows1 = tq.t_dsir_select(spark, sf_small).collect()
    rows2 = tq.t_dsir_select(spark, sf_small).collect()
    assert rows1 == rows2
    weights = [r["weight_e6"] for r in rows1]
    assert weights == sorted(weights, reverse=True)


def test_unimax_respects_caps_and_takes_small_langs_whole(spark, sf_small):
    sel = tq.t_unimax_alloc(spark, sf_small)
    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    docs = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    )
    avail = {r["lang"]: r["a"] for r in docs.groupBy("lang").agg(F.sum("n_tok").alias("a")).collect()}
    lang_docs = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    total = sum(avail.values())
    budget = (total * tq._UNIMAX_PCT) // 100

    per_lang = {
        r["lang"]: r
        for r in sel.groupBy("lang").agg(
            F.sum("n_tok").alias("tok"),
            F.count(F.lit(1)).alias("n_docs"),
            F.first("alloc").alias("alloc"),
        ).collect()
    }
    tot_selected = 0
    for lang, r in per_lang.items():
        # selection never exceeds the language's allocation, and the
        # allocation never exceeds what the language has
        assert r["tok"] <= r["alloc"] <= avail[lang]
        tot_selected += r["tok"]
        if r["alloc"] == avail[lang]:
            # waterfilled-whole language: every doc selected
            assert r["n_docs"] == lang_docs[lang]
    assert tot_selected <= budget
    # at least one language must be truncated at this budget (60% of
    # corpus with an en-heavy mix), or the waterfilling did nothing
    assert any(r["alloc"] < avail[lang] for lang, r in per_lang.items())


def test_unimax_cache_bounded_to_one_live_entry(spark, sf_small):
    """r12: the persisted token frame follows the _live_shingle_cache
    discipline — repeated calls must evict the previous call's cache,
    leaving exactly one live handle (bounded leak in long-lived
    sessions)."""
    tq.t_unimax_alloc(spark, sf_small).count()
    tq.t_unimax_alloc(spark, sf_small).count()
    assert len(tq._live_unimax_cache) == 1
