"""The unified construction-time-snapshot path (r9 verdict #4):
operators.materialized.materialized_input is the ONE code path that
owns build-once / rebuild-on-changed-input for every snapshot
operator. These tests pin the contract the old seven bespoke sites
only documented: a repeat call with unchanged sources reuses the
snapshot, a call after the source changed re-derives it."""

from __future__ import annotations

import os
import shutil

import pytest

from sync_spark.operators import materialized as mz


class TestMaterializedInput:
    def test_build_once_then_reuse(self, spark, tmp_path):
        src = tmp_path / "t.parquet"
        src.write_bytes(b"v1-bytes")
        calls = []

        def build():
            calls.append(1)
            return {"n": len(calls)}

        v1 = mz.materialized_input(spark, "k1", str(tmp_path), ["t"], build)
        v2 = mz.materialized_input(spark, "k1", str(tmp_path), ["t"], build)
        assert v1 is v2 and len(calls) == 1

    def test_rederives_on_changed_input(self, spark, tmp_path):
        src = tmp_path / "t.parquet"
        src.write_bytes(b"v1-bytes")
        calls = []
        build = lambda: calls.append(1) or len(calls)
        mz.materialized_input(spark, "k2", str(tmp_path), ["t"], build)
        # change the source: different size → different fingerprint
        src.write_bytes(b"v2-bytes-now-longer")
        v = mz.materialized_input(spark, "k2", str(tmp_path), ["t"], build)
        assert len(calls) == 2 and v == 2

    def test_kinds_are_independent(self, spark, tmp_path):
        (tmp_path / "t.parquet").write_bytes(b"x")
        a = mz.materialized_input(spark, "ka", str(tmp_path), ["t"], lambda: "A")
        b = mz.materialized_input(spark, "kb", str(tmp_path), ["t"], lambda: "B")
        assert (a, b) == ("A", "B")

    def test_dir_layout_member_rewrite_invalidates(self, tmp_path):
        """In-place rewrite of a member part file must flip the
        fingerprint even though the directory's own stat is unchanged
        (r9 ADVICE: the old directory-stat key silently reused stale
        persisted indexes)."""
        d = tmp_path / "corpus.parquet"
        d.mkdir()
        part = d / "part-0.parquet"
        part.write_bytes(b"aaaa")
        fp1 = mz.file_fingerprint("corpus", str(d))
        part.write_bytes(b"bbbbbbbb")  # same name, same dir, new size
        fp2 = mz.file_fingerprint("corpus", str(d))
        assert fp1 != fp2

    def test_missing_source_stamps_absent(self, tmp_path):
        fp = mz.source_fingerprint(str(tmp_path), ["nope"])
        assert "absent" in fp


class TestSnapshotOperatorsRederive:
    """End-to-end: a registry snapshot operator re-derives its
    embedded constants when the source table changes between two
    REGISTRY-FUNCTION calls (the contract __spark_entry__.py states)."""

    @pytest.fixture()
    def mutable_sf(self, tmp_path):
        sf = tmp_path / "sf"
        sf.mkdir()
        shutil.copy(
            "/root/testdata/sf0.001/documents.parquet",
            sf / "documents.parquet",
        )
        return str(sf)

    def test_token_budget_rederives_after_change(self, spark, mutable_sf):
        import duckdb

        from sync_spark.operators.text_queries import t_token_budget_sample

        n1 = t_token_budget_sample(spark, mutable_sf).count()
        # shrink the corpus in place: keep ~half the docs — the
        # histogram, total and cutoff all change
        p = os.path.join(mutable_sf, "documents.parquet")
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{p}') WHERE doc_id % 2 = 0) "
            f"TO '{p}.new' (FORMAT PARQUET)"
        )
        os.replace(p + ".new", p)
        n2 = t_token_budget_sample(spark, mutable_sf).count()
        assert n2 < n1  # re-derived over the smaller corpus

    def test_q11_survives_external_unpersist_all(self, spark):
        """bench_sf1_full's drop_leftover_blocks unpersists EVERY
        persistent RDD between queries — a memoized eager checkpoint
        served after that must be detected (validator probe) and
        rebuilt, not fail later inside the consumer's action with
        CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (the r10 sf1 bench crash)."""
        from sync_spark.operators.tpch_queries import q11_important_parts

        sf = "/root/testdata/sf0.001"
        first = q11_important_parts(spark, sf)
        n1 = first.count()
        # the harness's between-queries sweep
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist()
        again = q11_important_parts(spark, sf)
        assert again.count() == n1
