"""Persisted ANN (LSH) index tests: the index path must be
BIT-IDENTICAL to the scan-form ann_lsh_topk (shared lsh_rows prep +
shared _scored_topk tail), extend must equal rebuild, and the query
read must partition-prune to only the colliding hash buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sync_spark.operators import ann_index as ai
from sync_spark.operators import similarity as sim

PARAMS = dict(n_planes=4, n_tables=8, dim=8, seed=42)


def make_emb(spark, n, dim=8, start=0):
    """Deterministic synthetic embeddings (no testdata dependency so
    the geometry is small and the bucket math is inspectable)."""
    rows = [
        (
            start + i,
            [
                float(((start + i) * 31 + j * 17) % 13) - 6.0
                for j in range(dim)
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


class TestIndexAgreesWithScan:
    def test_bit_identical_to_scan_form(self, spark, tmp_path):
        corpus = make_emb(spark, 60)
        queries = corpus.filter(F.col("vec_id") < 5)
        idx = str(tmp_path / "ann_idx")
        n = ai.build_ann_index(corpus, idx, n_buckets=8, **PARAMS)
        assert n == 60 * PARAMS["n_tables"]
        got = rows_of(ai.ann_index_topk(spark, idx, queries, k=5))
        want = rows_of(sim.ann_lsh_topk(queries, corpus, k=5, **PARAMS))
        assert got == want
        assert len(got) > 0

    def test_real_embeddings_agree(self, spark, sf_small):
        emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 8)
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            idx = f"{d}/ann_idx"
            ai.build_ann_index(emb, idx, n_planes=4, n_tables=16, dim=64)
            got = rows_of(ai.ann_index_topk(spark, idx, queries, k=5))
            want = rows_of(
                sim.ann_lsh_topk(queries, emb, k=5, n_planes=4, n_tables=16, dim=64)
            )
            assert got == want
            assert len(got) > 0

    def test_params_sidecar_drives_query_path(self, spark, tmp_path):
        """The query path must re-derive geometry from the sidecar,
        not from defaults: build with a non-default seed and check the
        index path still matches the scan form at that seed."""
        corpus = make_emb(spark, 40)
        queries = corpus.filter(F.col("vec_id") < 3)
        idx = str(tmp_path / "ann_seeded")
        params = dict(PARAMS, seed=777)
        ai.build_ann_index(corpus, idx, n_buckets=8, **params)
        got = rows_of(ai.ann_index_topk(spark, idx, queries, k=4))
        want = rows_of(sim.ann_lsh_topk(queries, corpus, k=4, **params))
        assert got == want

    def test_missing_index_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="no ANN index"):
            ai.ann_index_topk(spark, str(tmp_path / "nope"), make_emb(spark, 1))
        with pytest.raises(ValueError, match="no ANN index"):
            ai.extend_ann_index(make_emb(spark, 1), str(tmp_path / "nope2"))

    def test_null_vector_queries_drop(self, spark, tmp_path):
        corpus = make_emb(spark, 30)
        idx = str(tmp_path / "ann_null")
        ai.build_ann_index(corpus, idx, n_buckets=8, **PARAMS)
        nullq = spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<float>"
        )
        assert ai.ann_index_topk(spark, idx, nullq, k=3).count() == 0


class TestExtend:
    def test_extend_equals_rebuild(self, spark, tmp_path):
        a = make_emb(spark, 40)
        b = make_emb(spark, 20, start=40)
        queries = a.filter(F.col("vec_id") < 5)
        idx = str(tmp_path / "ann_ext")
        ai.build_ann_index(a, idx, n_buckets=8, **PARAMS)
        touched = ai.extend_ann_index(b, idx)
        assert touched > 0
        got = rows_of(ai.ann_index_topk(spark, idx, queries, k=5))
        full = str(tmp_path / "ann_full")
        ai.build_ann_index(a.unionByName(b), full, n_buckets=8, **PARAMS)
        want = rows_of(ai.ann_index_topk(spark, full, queries, k=5))
        assert got == want
        # and both equal the scan form over the full corpus
        scan = rows_of(sim.ann_lsh_topk(queries, a.unionByName(b), k=5, **PARAMS))
        assert got == scan

    def test_extend_idempotent(self, spark, tmp_path):
        a = make_emb(spark, 30)
        b = make_emb(spark, 10, start=30)
        idx = str(tmp_path / "ann_idem")
        ai.build_ann_index(a, idx, n_buckets=8, **PARAMS)
        ai.extend_ann_index(b, idx)
        before = spark.read.parquet(idx).count()
        ai.extend_ann_index(b, idx)  # re-send the same slice
        assert spark.read.parquet(idx).count() == before

    def test_empty_slice_noop(self, spark, tmp_path):
        a = make_emb(spark, 20)
        idx = str(tmp_path / "ann_empty")
        ai.build_ann_index(a, idx, n_buckets=8, **PARAMS)
        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert ai.extend_ann_index(empty, idx) == 0


class TestPruning:
    def test_query_reads_only_colliding_buckets(self, spark, tmp_path):
        """Planning-time partition pruning (same signal as the
        fingerprint-index test): the index scan must carry a
        PartitionFilters IN-list over __bucket whose members are
        EXACTLY the store buckets the query's (tbl, bucket) keys hash
        into — a regressed full-store scan has no __bucket filter."""
        import re

        from sync_spark.sources.bucketed import bucket_expr

        corpus = make_emb(spark, 60)
        queries = corpus.filter(F.col("vec_id") == 0)
        idx = str(tmp_path / "ann_prune")
        ai.build_ann_index(corpus, idx, n_buckets=16, **PARAMS)
        qkeys = sim.lsh_rows(
            queries, "query_id", "qv", "qn",
            n_planes=PARAMS["n_planes"], n_tables=PARAMS["n_tables"],
            dim=PARAMS["dim"], seed=PARAMS["seed"],
        ).select("tbl", "bucket").distinct()
        expected = sorted(
            r.b for r in qkeys.select(bucket_expr(["tbl", "bucket"], 16).alias("b"))
            .distinct().collect()
        )
        assert 0 < len(expected) < 16, "fixture: one query must not touch all"
        out = ai.ann_index_topk(spark, idx, queries, k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        filters = re.findall(
            r"PartitionFilters: \[__bucket#\d+ IN \(([-\d,]+)\)\]", plan
        )
        assert filters, plan[:500]
        for grp in filters:
            assert sorted(int(x) for x in grp.split(",")) == expected


class TestRemove:
    def test_remove_equals_rebuild_without(self, spark, tmp_path):
        a = make_emb(spark, 40)
        gone = a.filter(F.col("vec_id") < 8)
        kept = a.filter(F.col("vec_id") >= 8)
        queries = make_emb(spark, 3, start=100)
        idx = str(tmp_path / "ann_rm")
        ai.build_ann_index(a, idx, n_buckets=8, **PARAMS)
        assert ai.remove_from_ann_index(gone, idx) > 0
        got = rows_of(ai.ann_index_topk(spark, idx, queries, k=5))
        ref = str(tmp_path / "ann_rm_ref")
        ai.build_ann_index(kept, ref, n_buckets=8, **PARAMS)
        want = rows_of(ai.ann_index_topk(spark, ref, queries, k=5))
        assert got == want

    def test_update_cycle(self, spark, tmp_path):
        """update = remove(old) + extend(new): mutate vec 0's embedding
        and check the index equals a fresh build of the mutated corpus."""
        a = make_emb(spark, 30)
        old0 = a.filter(F.col("vec_id") == 0)
        new0 = spark.createDataFrame(
            [(0, [9.0] * PARAMS["dim"])], "vec_id long, embedding array<float>"
        )
        queries = make_emb(spark, 3, start=100)
        idx = str(tmp_path / "ann_upd")
        ai.build_ann_index(a, idx, n_buckets=8, **PARAMS)
        ai.remove_from_ann_index(old0, idx)
        ai.extend_ann_index(new0, idx)
        got = rows_of(ai.ann_index_topk(spark, idx, queries, k=5))
        mutated = a.filter(F.col("vec_id") != 0).unionByName(new0)
        ref = str(tmp_path / "ann_upd_ref")
        ai.build_ann_index(mutated, ref, n_buckets=8, **PARAMS)
        want = rows_of(ai.ann_index_topk(spark, ref, queries, k=5))
        assert got == want

    def test_remove_absent_and_empty(self, spark, tmp_path):
        a = make_emb(spark, 20)
        idx = str(tmp_path / "ann_rm_n")
        ai.build_ann_index(a, idx, n_buckets=8, **PARAMS)
        before = spark.read.parquet(idx).count()
        ai.remove_from_ann_index(make_emb(spark, 3, start=500), idx)
        assert spark.read.parquet(idx).count() == before
        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert ai.remove_from_ann_index(empty, idx) == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# random small-dim vectors with repeated values so LSH buckets collide
# in every mix (including identical vectors and near-zero norms)
vec_strategy = st.lists(
    st.lists(
        st.sampled_from([-2.0, -1.0, -0.5, 0.5, 1.0, 2.0, 3.0]),
        min_size=4, max_size=4,
    ),
    min_size=2,
    max_size=10,
)


class TestAnnIndexProperties:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(vecs=vec_strategy, split=st.integers(0, 9), gone=st.integers(0, 3))
    def test_index_lifecycle_equals_scan(
        self, spark, tmp_path_factory, vecs, split, gone
    ):
        """On arbitrary corpora: build(prefix) + extend(rest) +
        remove(random slice) queried through the index == the scan
        form over exactly the surviving vectors."""
        tmp_path = tmp_path_factory.mktemp("annprop")
        params = dict(n_planes=2, n_tables=4, dim=4, seed=7)
        rows = [(i, v) for i, v in enumerate(vecs)]
        mk = lambda rs: spark.createDataFrame(
            rs, "vec_id long, embedding array<float>"
        )
        split = min(split, len(rows))
        gone = min(gone, len(rows))
        idx = str(tmp_path_factory.mktemp("s") / "idx")
        ai.build_ann_index(mk(rows[:split]), idx, n_buckets=4, **params)
        if rows[split:]:
            ai.extend_ann_index(mk(rows[split:]), idx)
        if rows[:gone]:
            ai.remove_from_ann_index(mk(rows[:gone]), idx)
        survivors = rows[gone:]
        queries = mk([(100, [1.0, 1.0, -1.0, 0.5])])
        got = rows_of(ai.ann_index_topk(spark, idx, queries, k=3))
        want = rows_of(
            sim.ann_lsh_topk(queries, mk(survivors), k=3, **params)
        ) if survivors else []
        assert got == want
