"""Incremental dedup against the persisted fingerprint index
(operators/incremental.py): the persisted path must equal the direct
two-frame computation (an optimization, never a semantics change),
extending must touch only the slice's buckets, and the whole loop
must be idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sync_spark.operators.dedup import winnow_fingerprint_rows
from sync_spark.operators.incremental import (
    build_fp_index,
    extend_fp_index,
    probe_fp_index,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )


def _split(spark):
    d = _docs(spark)
    return d.filter(F.col("doc_id") % 7 != 0), d.filter(F.col("doc_id") % 7 == 0)


def test_probe_equals_direct_two_frame_computation(spark, tmp_path):
    corpus, incoming = _split(spark)
    idx = str(tmp_path / "fpidx")
    n_fps = build_fp_index(corpus, idx)
    assert n_fps > 0

    flagged = probe_fp_index(spark, incoming, idx, min_shared=2)
    got = {
        r.doc_id: (r.n_shared_fps, r.is_dup)
        for r in flagged.select("doc_id", "n_shared_fps", "is_dup").collect()
    }
    # direct oracle: recompute both sides, count distinct shared fps
    cfp = winnow_fingerprint_rows(corpus, "text", "doc_id").select("fp").distinct()
    ifp = winnow_fingerprint_rows(incoming, "text", "doc_id")
    direct = {
        r.doc_id: r.n
        for r in ifp.join(cfp, "fp", "left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("fp").alias("n"))
        .collect()
    }
    assert set(got) == {r.doc_id for r in incoming.select("doc_id").collect()}
    for doc_id, (n, dup) in got.items():
        assert n == direct.get(doc_id, 0)
        assert dup == (n >= 2)
    # the synthetic corpus contains near-dups across the split — the
    # probe must actually fire, and must not flag everything
    dups = [d for d, (_, f) in got.items() if f]
    assert 0 < len(dups) < len(got)


def test_extend_touches_only_slice_buckets_and_is_idempotent(spark, tmp_path):
    from sync_spark.sources.bucketed import BUCKET_COL, read_target

    corpus, incoming = _split(spark)
    idx = str(tmp_path / "fpidx")
    build_fp_index(corpus, idx)
    before = read_target(spark, idx).count()

    one_doc = incoming.orderBy("doc_id").limit(1)
    n_touched = extend_fp_index(one_doc, idx)
    n_fp_rows = winnow_fingerprint_rows(one_doc, "text", "doc_id").count()
    assert 0 < n_touched <= n_fp_rows  # bounded by the slice, not the corpus
    after = read_target(spark, idx).count()
    assert after >= before  # distinct-merge only adds

    # idempotent: same slice again changes nothing
    extend_fp_index(one_doc, idx)
    assert read_target(spark, idx).count() == after

    # a doc probes as a full dup of itself once indexed
    probed = probe_fp_index(spark, one_doc, idx, min_shared=1).collect()
    assert len(probed) == 1 and probed[0].is_dup


def test_extend_makes_new_near_dups_visible(spark, tmp_path):
    corpus, incoming = _split(spark)
    idx = str(tmp_path / "fpidx")
    build_fp_index(corpus, idx)
    # docs NOT yet flagged against the corpus...
    first = probe_fp_index(spark, incoming, idx, min_shared=1)
    # materialize BEFORE extending: a lazy frame derived from a probe
    # holds file references into the pre-extend index (the documented
    # extend_fp_index staleness hazard)
    fresh_rows = first.filter(~F.col("is_dup")).select("doc_id", "text").collect()
    if not fresh_rows:  # corpus too dense at this sf — nothing to show
        return
    fresh = spark.createDataFrame(fresh_rows, "doc_id long, text string")
    # ...get indexed, and a re-probe of the same slice flags them all
    extend_fp_index(fresh, idx)
    again = probe_fp_index(spark, fresh, idx, min_shared=1)
    # docs with zero fingerprints (shorter than k+window-1 tokens) can
    # never self-match; every fingerprint-bearing doc must
    has_fp = {
        r.doc_id
        for r in winnow_fingerprint_rows(fresh, "text", "doc_id")
        .select("doc_id")
        .distinct()
        .collect()
    }
    flags = {r.doc_id: r.is_dup for r in again.collect()}
    for doc_id in has_fp:
        assert flags[doc_id] is True


def test_probe_opens_only_touched_buckets(spark, tmp_path):
    """The round-5 review fix pinned: probing a tiny slice must read
    only the index buckets its fingerprints hash into — visible in
    the scan's file index — never the whole store."""
    corpus, incoming = _split(spark)
    idx = str(tmp_path / "fpidx")
    build_fp_index(corpus, idx)
    n_bucket_dirs = len([e for e in os.listdir(idx) if e.startswith("__bucket=")])
    one_doc = incoming.orderBy("doc_id").limit(1)
    from sync_spark.operators.dedup import winnow_fingerprint_rows as wfr
    from sync_spark.sources.bucketed import bucket_expr

    expected_buckets = sorted(
        int(r.b)
        for r in wfr(one_doc, "text", "doc_id")
        .select(bucket_expr(["fp"], 32).alias("b"))
        .distinct()
        .collect()
    )
    assert 0 < len(expected_buckets) < n_bucket_dirs, "fixture: one doc must not touch all"
    out = probe_fp_index(spark, one_doc, idx, min_shared=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # the pruning is planning-time partition pruning: the index scan
    # must carry a PartitionFilters IN-list over __bucket whose members
    # are EXACTLY the buckets the probe's fingerprints hash into. (The
    # location path in toString() is truncated at 100 chars, so the
    # filter — not the path list — is the reliable signal; a regressed
    # full-store scan has no __bucket filter at all and fails the
    # `assert filters`.)
    filters = re.findall(r"PartitionFilters: \[__bucket#\d+ IN \(([-\d,]+)\)\]", plan)
    assert filters, plan[:500]
    for grp in filters:
        assert sorted(int(x) for x in grp.split(",")) == expected_buckets, (
            grp,
            expected_buckets,
        )


def test_remove_from_fp_index_update_cycle(spark, tmp_path):
    """remove(old) + extend(new) == fresh build of the mutated corpus;
    removing an absent doc is a no-op."""
    from sync_spark.operators.incremental import (
        build_fp_index,
        extend_fp_index,
        probe_fp_index,
        remove_from_fp_index,
    )

    rows = [
        (i, " ".join(f"tok{(i * 13 + j) % 7}" for j in range(20)))
        for i in range(10)
    ]
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    corpus = mk(rows)
    idx = str(tmp_path / "fp_rm")
    build_fp_index(corpus, idx)
    old0, new0 = mk(rows[:1]), mk([(0, "completely different words here now")])
    assert remove_from_fp_index(old0, idx) > 0
    extend_fp_index(new0, idx)
    ref = str(tmp_path / "fp_rm_ref")
    build_fp_index(mk([(0, "completely different words here now")] + rows[1:]), ref)
    probe = mk([(99, rows[1][1]), (98, "completely different words here now")])
    got = sorted(tuple(r) for r in probe_fp_index(spark, probe, idx).collect())
    want = sorted(tuple(r) for r in probe_fp_index(spark, probe, ref).collect())
    assert got == want
    before = spark.read.parquet(idx).count()
    remove_from_fp_index(mk([(500, "never indexed text")]), idx)
    assert spark.read.parquet(idx).count() == before


def test_params_sidecar_overrides_caller_geometry(spark, tmp_path):
    """Build with non-default winnowing geometry; probe/extend/remove
    called with DEFAULT args must still use the persisted (k, window)
    — a geometry mismatch would silently leave stale rows behind."""
    from sync_spark.operators.incremental import (
        build_fp_index,
        probe_fp_index,
        remove_from_fp_index,
    )

    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(25)))  # disjoint vocab
        for i in range(6)
    ]
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    idx = str(tmp_path / "fp_geo")
    build_fp_index(mk(rows), idx, k=7, window=6)
    # probe with defaults: sidecar geometry applies, self-text matches
    probe = mk([(99, rows[0][1])])
    assert probe_fp_index(spark, probe, idx).first().is_dup
    # remove with defaults: sidecar geometry locates ALL the doc's
    # buckets — nothing stale survives
    remove_from_fp_index(mk(rows[:1]), idx)
    assert not probe_fp_index(spark, probe, idx).first().is_dup
    assert (
        spark.read.parquet(idx).where("doc_id = 0").count() == 0
    )
