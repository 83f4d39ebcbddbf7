

class TestWinnowSqlKernel:
    def test_sql_kernel_agrees_with_column_kernel(self, spark):
        """winnow_sql_kernel must stay in lockstep with
        winnow_fps_columns: same (id, fp) row set on a corpus with
        short docs, empty docs, and repeated runs."""
        from sync_spark.operators.dedup import (
            winnow_fingerprint_rows,
            winnow_sql_kernel,
        )

        rows = [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "short doc"),
            (4, ""),
            (5, "a b c d e f g h i j k l m n o p a b c d e f g h"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        df.createOrReplaceTempView("__wk_test_docs")
        got = spark.sql(
            "WITH __src AS (SELECT doc_id, text FROM __wk_test_docs), "
            + winnow_sql_kernel("doc_id", "text", "__src", k=5, window=4)
            + " SELECT doc_id, fp FROM __wfp"
        )
        want = winnow_fingerprint_rows(df, "text", "doc_id", k=5, window=4)
        assert {(r.doc_id, r.fp) for r in got.collect()} == {
            (r.doc_id, r.fp) for r in want.collect()
        }

    def test_prefixed_kernels_compose_in_one_statement(self, spark):
        """Two winnow_sql_kernel instantiations (distinct prefixes)
        must coexist in one WITH clause — the shape the r7 bloom
        pipeline uses for its corpus + benchmark sides."""
        from sync_spark.operators.dedup import winnow_sql_kernel

        rows = [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"), (3, "")]
        spark.createDataFrame(rows, ["doc_id", "text"]).createOrReplaceTempView(
            "__pk_docs"
        )
        ka = winnow_sql_kernel("doc_id", "text", "__pk_a", k=5, window=4, prefix="__pa")
        kb = winnow_sql_kernel("doc_id", "text", "__pk_b", k=5, window=4, prefix="__pb")
        got = spark.sql(
            "WITH __pk_a AS (SELECT * FROM __pk_docs WHERE doc_id = 1), "
            "__pk_b AS (SELECT * FROM __pk_docs WHERE doc_id = 2), "
            + ka + ", " + kb
            + " SELECT a.fp FROM __pafp a JOIN __pbfp b ON a.fp = b.fp"
        )
        assert got.count() > 0  # identical docs share every fingerprint

    def test_bloom_sql_pipeline_agrees_with_dataframe_form(self, spark, sf_small):
        """The one-analysis-pass d_bloom_decontaminate SQL pipeline
        (winnow kernels + bloom_bitmap_sql + bloom_probe_nmaybe_sql)
        must produce exactly the DataFrame form's rows — same bitmap,
        same false positives."""
        from pyspark.sql import functions as F

        from sync_spark.operators.dedup import bloom_decontaminate
        from sync_spark.operators.relational import _t
        from sync_spark.operators.text_queries import d_bloom_decontaminate

        d = _t(spark, sf_small, "documents")
        want = bloom_decontaminate(
            d.filter(F.col("source") != "src0"),
            d.filter(F.col("source") == "src0"),
            "text", "doc_id", k=5, window=4, min_shared=1,
        )
        got = d_bloom_decontaminate(spark, sf_small)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_simhash_pairs_sql_agrees_with_operator(self, spark, sf_small):
        """simhash_pairs_sql (one-analysis-pass twin) must produce
        exactly simhash_near_pairs' rows — same lane-packed votes,
        same signature bits, same pigeonhole candidates."""
        from sync_spark.operators.dedup import simhash_near_pairs, simhash_pairs_sql
        from sync_spark.operators.relational import _t

        d = _t(spark, sf_small, "documents")
        want = sorted(
            map(tuple, simhash_near_pairs(d, "text", "doc_id", max_hamming=3).collect())
        )
        d.createOrReplaceTempView("__sh_agree_docs")
        got = sorted(
            map(tuple, spark.sql(simhash_pairs_sql("__sh_agree_docs")).collect())
        )
        assert got == want and len(got) > 0

    def test_simhash_pairs_cached_agrees_with_twin(self, spark, sf_small):
        """simhash_pairs_cached (one-signature-pass benched form) must
        produce exactly the single-statement twin's rows — the persist
        changes evaluation count, never values."""
        from sync_spark.operators.dedup import simhash_pairs_cached, simhash_pairs_sql
        from sync_spark.operators.relational import _t

        d = _t(spark, sf_small, "documents")
        d.createOrReplaceTempView("__sh_agree_docs")
        want = sorted(
            map(tuple, spark.sql(simhash_pairs_sql("__sh_agree_docs")).collect())
        )
        got = sorted(
            map(
                tuple,
                simhash_pairs_cached(spark, "__sh_agree_docs").collect(),
            )
        )
        assert got == want and len(got) > 0

    def test_pair_kernel_sql_twins_agree_with_frames(self, spark, sf_small):
        """ngram_jaccard_pairs / minhash_lsh_pairs (one-analysis-pass
        SQL twins) must produce exactly the reference DataFrame
        chains' rows — same prefix/suffix pruning, same seeded
        signatures and banding, same jaccard doubles."""
        from sync_spark.operators import dedup
        from sync_spark.operators.relational import _t

        d = _t(spark, sf_small, "documents")
        for sql_fn, frames_fn in [
            (dedup.ngram_jaccard_pairs, dedup.ngram_jaccard_pairs_frames),
            (dedup.minhash_lsh_pairs, dedup.minhash_lsh_pairs_frames),
        ]:
            got = sorted(map(tuple, sql_fn(d, "text", "doc_id", n=3).collect()))
            want = sorted(map(tuple, frames_fn(d, "text", "doc_id", n=3).collect()))
            assert got == want and len(got) > 0

    def test_decontaminate_hits_sql_agrees_with_operator(self, spark, sf_small):
        """decontaminate_hits_sql (one-analysis-pass twin) must
        reproduce decontaminate_hits' (doc_id, n_hits) rows exactly —
        same kernels, same join multiplicities."""
        from pyspark.sql import functions as F

        from sync_spark.operators import dedup
        from sync_spark.operators.relational import _t

        d = _t(spark, sf_small, "documents")
        want = dedup.decontaminate_hits(
            d.filter(F.col("source") != "src0"),
            d.filter(F.col("source") == "src0"),
            "text", "doc_id", k=5, window=4,
        )
        d.createOrReplaceTempView("__dh_agree_docs")
        got = spark.sql(
            "WITH __dh_c AS (SELECT doc_id, text FROM __dh_agree_docs"
            " WHERE source <> 'src0'), "
            "__dh_b AS (SELECT doc_id, text FROM __dh_agree_docs"
            " WHERE source = 'src0'), "
            + dedup.decontaminate_hits_sql("__dh_c", "__dh_b", k=5, window=4)
            + " SELECT doc_id, n_hits FROM __dhhits"
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ) and got.count() > 0

    def test_incremental_probe_sql_agrees_with_shared_fp_counts(self, spark, sf_small):
        """The d_incremental_probe one-pass SQL must reproduce the
        shared_fp_counts composition it replaced (r11)."""
        from pyspark.sql import functions as F

        from sync_spark.operators import dedup
        from sync_spark.operators.incremental import shared_fp_counts
        from sync_spark.operators.relational import _t
        from sync_spark.operators.text_queries import (
            _WINNOW_K,
            _WINNOW_W,
            d_incremental_probe,
        )

        d = _t(spark, sf_small, "documents")
        corpus_fps = dedup.winnow_fingerprint_rows(
            d.filter(F.col("doc_id") % 7 != 0), "text", "doc_id",
            k=_WINNOW_K, window=_WINNOW_W,
        ).select("fp").distinct()
        want = shared_fp_counts(
            d.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text"),
            corpus_fps, "text", "doc_id",
            k=_WINNOW_K, window=_WINNOW_W, min_shared=2,
        ).select(
            "doc_id",
            F.col("n_shared_fps").cast("long").alias("n_shared_fps"),
            "is_dup",
        )
        got = d_incremental_probe(spark, sf_small)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ) and got.count() > 0

    def test_winnow_pairs_sql_agrees_with_operator(self, spark):
        from sync_spark.operators.dedup import winnow_pairs, winnow_pairs_sql

        rows = [
            (i, "the quick brown fox jumps over the lazy dog near the river bank " + tail)
            for i, tail in [
                (1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta"),
                (4, "totally different words entirely here now indeed"),
            ]
        ] + [(5, "short"), (6, "")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        df.createOrReplaceTempView("__wp_test_docs")
        got = spark.sql(winnow_pairs_sql("__wp_test_docs", k=5, window=4,
                                         min_shared=2, max_posting=100))
        want = winnow_pairs(df, "text", "doc_id", k=5, window=4,
                            min_shared=2, max_posting=100)
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
