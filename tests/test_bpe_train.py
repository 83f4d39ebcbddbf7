"""BPE tokenizer training (operators/bpe.py): hand-checked merges on
a tiny corpus, the classic 'low/lower/newest/widest' example shape,
encode/train agreement, and the registry contract row."""

from __future__ import annotations

import pyspark.sql.functions as F

from sync_spark.operators import bpe


def _merges_only(ms):
    return [(l, r) for _, l, r, _ in ms]


class TestTrain:
    def test_hand_computed_example(self, spark):
        # corpus: 'aaab' x3, 'aab' x2  → pretokens are the words
        # themselves (letters-only). Initial pairs:
        #   (a,a): 3*2 + 2*1 = 8   (a,b): 3+2 = 5
        # merge 1 = (a,a) count 8. After: aaab→[aa,a,b], aab→[aa,b]
        #   (aa,a)=3 (a,b)=3 (aa,b)=2 → tie 3, lexicographic:
        #   ('a','b') < ('aa','a')  → merge 2 = (a,b) count 3
        df = spark.createDataFrame(
            [(1, "aaab aaab aaab aab aab")], ["doc_id", "text"]
        )
        ms = bpe.bpe_train(df, "text", n_merges=2)
        # NOTE the leading-space pretokens: ' aaab' for non-initial
        # words. Build expectations from the actual pretoken stream:
        # 'aaab', ' aaab' x2, ' aab' x2 → chars include ' '.
        assert ms[0][3] >= ms[1][3]
        assert _merges_only(ms)[0] == ("a", "a"), ms

    def test_greedy_left_to_right_within_word(self, spark):
        # 'aaa': greedy (a,a) merge gives [aa, a], NOT [a, aa]
        df = spark.createDataFrame([(1, "aaa")], ["doc_id", "text"])
        ms = bpe.bpe_train(df, "text", n_merges=1)
        assert _merges_only(ms) == [("a", "a")]
        enc = bpe.bpe_encode_words(
            spark.createDataFrame([("aaa",)], ["word"]), ms
        ).collect()[0]["syms"]
        assert enc == ["aa", "a"]

    def test_counts_nonincreasing_and_ranks(self, spark, sf_small):
        d = spark.read.parquet(f"{sf_small}/documents.parquet")
        ms = bpe.bpe_train(d, "text", n_merges=12)
        ranks = [r for r, *_ in ms]
        assert ranks == list(range(1, len(ms) + 1))
        counts = [c for *_, c in ms]
        assert all(a >= b for a, b in zip(counts, counts[1:]))

    def test_deterministic(self, spark, sf_small):
        d = spark.read.parquet(f"{sf_small}/documents.parquet")
        assert bpe.bpe_train(d, "text", 8) == bpe.bpe_train(d, "text", 8)

    def test_min_count_prunes_tail(self, spark):
        df = spark.createDataFrame(
            [(1, "zzzz qqqq qqqq")], ["doc_id", "text"]
        )
        # min_count=2 drops the singleton word 'zzzz' entirely
        wc = {r["word"]: r["cnt"] for r in bpe.bpe_word_counts(df, "text", 2).collect()}
        assert "zzzz" not in wc


class TestEncode:
    def test_roundtrip_concat_reconstructs_word(self, spark, sf_small):
        """Fold safety: whatever the merges, concatenating the symbol
        array must reproduce the word exactly for every corpus word."""
        d = spark.read.parquet(f"{sf_small}/documents.parquet")
        ms = bpe.bpe_train(d, "text", n_merges=10)
        words = bpe.bpe_word_counts(d, "text")
        enc = bpe.bpe_encode_words(words, ms)
        bad = enc.filter(F.expr("array_join(syms, '') <> word"))
        assert bad.count() == 0

    def test_encode_compresses(self, spark, sf_small):
        """After 10 merges the average symbol count per word must drop
        below the character count (the merges actually apply)."""
        d = spark.read.parquet(f"{sf_small}/documents.parquet")
        ms = bpe.bpe_train(d, "text", n_merges=10)
        words = bpe.bpe_word_counts(d, "text")
        enc = bpe.bpe_encode_words(words, ms).select(
            F.sum(F.expr("size(syms) * cnt")).alias("syms"),
            F.sum(F.expr("length(word) * cnt")).alias("chars"),
        ).collect()[0]
        assert enc["syms"] < enc["chars"]

    def test_encode_matches_training_word_states(self, spark, sf_small):
        """Applying the merge list via the distributed fold must land
        every word in exactly the symbol state the trainer's own
        (python) replay produces — two independent implementations."""
        d = spark.read.parquet(f"{sf_small}/documents.parquet")
        ms = bpe.bpe_train(d, "text", n_merges=8)
        words = bpe.bpe_word_counts(d, "text")
        enc = {r["word"]: tuple(r["syms"]) for r in bpe.bpe_encode_words(words, ms).collect()}
        for w in list(enc)[:300]:
            state = tuple(w)
            for _, l, r, _ in ms:
                state = bpe._apply_merge(state, l, r)
            assert enc[w] == state, w


class TestRegistry:
    def test_t_bpe_train_schema(self, spark, sf_small):
        out = bpe.t_bpe_train(spark, sf_small)
        assert out.columns == ["rank", "left", "right", "pair_count"]
        assert out.count() == bpe.BPE_N_MERGES

    def test_chk_row_all_green(self, spark, sf_small):
        row = bpe.chk_bpe_train(spark, sf_small).collect()[0]
        assert row["ranks_ok"] and row["counts_nonincreasing"]
        assert row["n_merges"] == bpe.BPE_N_MERGES


def test_fertility_totals_and_bounds(spark, sf_small):
    """t_bpe_fertility: per-lang totals must equal a direct pretoken
    fold, and tokens must sit in [words, chars] (merges shrink, never
    grow; no empty symbols)."""
    from pyspark.sql import functions as F

    from sync_spark.functions.text import bpe_pretokens
    from sync_spark.operators import bpe
    from sync_spark.operators.relational import _t

    out = {r["lang"]: r for r in bpe.t_bpe_fertility(spark, sf_small).collect()}
    direct = {
        r["lang"]: r
        for r in (
            _t(spark, sf_small, "documents")
            .select("lang", F.explode(bpe_pretokens(F.col("text"))).alias("w"))
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum(F.length("w")).alias("n_chars"),
            )
            .collect()
        )
    }
    assert set(out) == set(direct)
    for lang, r in out.items():
        assert r["n_words"] == direct[lang]["n_words"]
        assert r["n_chars"] == direct[lang]["n_chars"]
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]
        assert r["fertility_e6"] >= 1_000_000


def test_chk_contract_empty_corpus(spark, tmp_path):
    """ADVICE r5 (low): an empty/trivial corpus (no adjacent symbol
    pairs) returns zero contract rows — mirroring the oracle's LIMIT 1
    over an empty aggregate — instead of raising IndexError."""
    d = str(tmp_path / "sf_empty")
    spark.createDataFrame([], "doc_id long, text string, lang string") \
        .write.parquet(f"{d}/documents.parquet")
    out = bpe.chk_bpe_train(spark, d)
    assert out.count() == 0
    assert "first_left" in out.columns
    # single-char words only: still no adjacent pair → zero rows
    d2 = str(tmp_path / "sf_single")
    spark.createDataFrame([(1, "a", "en")], "doc_id long, text string, lang string") \
        .write.parquet(f"{d2}/documents.parquet")
    assert bpe.chk_bpe_train(spark, d2).count() == 0


class TestIncrementalTrainer:
    """Round-6 incremental merge loop (bpe_merge_loop): bit-identical
    to the naive full-rescan trainer, and fast enough for production
    merge counts."""

    @staticmethod
    def _naive(word_counts, n_merges):
        # the r5 reference loop: full pair-count rescan per merge
        words = [[syms, cnt] for syms, cnt in word_counts]
        merges = []
        for rank in range(1, n_merges + 1):
            counts = {}
            for syms, cnt in words:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + cnt
            if not counts:
                break
            (left, right), best = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, left, right, best))
            for w in words:
                if left in w[0] and right in w[0]:
                    w[0] = bpe._apply_merge(w[0], left, right)
        return merges

    def test_matches_naive_on_fixture_corpus(self, spark, sf_small):
        d = spark.read.parquet(f"{sf_small}/documents.parquet")
        from sync_spark.operators.bpe import bpe_word_counts

        wc = [
            (tuple(r["word"]), int(r["cnt"]))
            for r in bpe_word_counts(d, "text").collect()
        ]
        assert bpe.bpe_merge_loop(wc, 48) == self._naive(wc, 48)

    def test_matches_naive_overlapping_and_ties(self, spark):
        # overlapping merges ('aaa'), exact ties (lex tie-break), and
        # pairs that vanish and reappear through intermediate merges
        df = spark.createDataFrame(
            [(1, "aaa aaab abab baba bb aa ab ba aaab abab")],
            ["doc_id", "text"],
        )
        from sync_spark.operators.bpe import bpe_word_counts

        wc = [
            (tuple(r["word"]), int(r["cnt"]))
            for r in bpe_word_counts(df, "text").collect()
        ]
        assert bpe.bpe_merge_loop(wc, 32) == self._naive(wc, 32)

    def test_property_matches_naive_random_corpora(self):
        """r6 verdict stretch: the heap/delta-maintenance invariants
        pinned as a PROPERTY over random corpora — any future tuning
        of the lazy-invalidation heap or the adjacent-pair delta
        bookkeeping must stay bit-identical to the full-rescan
        trainer on arbitrary inputs (overlaps, ties, vanishing and
        reappearing pairs all arise at this sample count)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        word = st.lists(st.sampled_from("abcd"), min_size=1, max_size=8).map(tuple)

        @settings(max_examples=80, deadline=None)
        @given(
            wc=st.dictionaries(word, st.integers(1, 5), min_size=1, max_size=30).map(
                lambda d: sorted(d.items())
            ),
            n_merges=st.integers(0, 24),
        )
        def check(wc, n_merges):
            assert bpe.bpe_merge_loop(list(wc), n_merges) == self._naive(
                [list(t) for t in ((w, c) for w, c in wc)], n_merges
            )

        check()

    def test_1024_merges_subsecond(self):
        """The driver loop must sustain production merge counts: a
        synthetic 20k-word vocabulary with enough pair diversity for
        1024 distinct merges, loop time bounded."""
        import time

        words = []
        for i in range(20000):
            # deterministic pseudo-words over a 40-symbol alphabet
            w = tuple(chr(97 + (i * 7 + j * j) % 26) + chr(48 + (i + j) % 10)
                      for j in range(4 + i % 9))
            words.append((w, 1 + i % 17))
        # CPU time, not wall: the full suite runs Spark executors on
        # every core and a wall bound flakes under that contention.
        # The incremental loop costs ~0.6s CPU here; the r5 full-rescan
        # form costs well over a minute, so 2s still pins the rewrite.
        t0 = time.process_time()
        merges = bpe.bpe_merge_loop(words, 1024)
        dt = time.process_time() - t0
        assert len(merges) == 1024, len(merges)
        ranks = [r for r, *_ in merges]
        assert ranks == list(range(1, 1025))
        counts = [c for *_, c in merges]
        assert all(a >= b for a, b in zip(counts, counts[1:]))
        assert dt < 2.0, f"merge loop took {dt:.2f}s CPU"


class TestEncodeScaling:
    def test_encode_plan_constant_in_merge_count(self, spark):
        """One projection regardless of merge count: a 512-merge table
        must build and run without 512 chained projections (the r5
        form's analysis alone took minutes there)."""
        import time

        words = spark.createDataFrame(
            [("lowering",), ("newest",), ("aaa",), ("",)], ["word"]
        )
        # synthetic but well-formed merge list
        merges = [(i + 1, f"x{i}", f"y{i}", 1) for i in range(510)]
        merges = [(1, "l", "o", 9), (2, "lo", "w", 8)] + merges
        t0 = time.monotonic()
        out = bpe.bpe_encode_words(words, merges)
        rows = {r["word"]: r["syms"] for r in out.collect()}
        dt = time.monotonic() - t0
        assert rows["lowering"][:2] == ["low", "e"]
        assert rows["aaa"] == ["a", "a", "a"]
        assert rows[""] == []
        assert dt < 30, f"512-merge encode took {dt:.1f}s"

    def test_encode_fold_equals_iterative(self, spark):
        """The single-fold encode must equal rank-ordered iterative
        greedy application (the training loop's own _apply_merge)."""
        corpus = spark.createDataFrame(
            [(1, "aaab aaab aab banana bandana low lower lowest")],
            ["doc_id", "text"],
        )
        ms = bpe.bpe_train(corpus, "text", n_merges=10)
        words = ["aaab", "banana", "low", "lowest", "zzz", ""]
        got = {
            r["word"]: tuple(r["syms"])
            for r in bpe.bpe_encode_words(
                spark.createDataFrame([(w,) for w in words], ["word"]), ms
            ).collect()
        }
        for w in words:
            syms = tuple(c for c in w)
            for _, l, rgt, _ in ms:
                syms = bpe._apply_merge(syms, l, rgt)
            assert got[w] == syms, (w, got[w], syms)
