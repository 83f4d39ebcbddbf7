"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm; the GPT-2 byte-level variant differs only in alphabet).

Architecture — the Spark-first split every production tokenizer
trainer uses (HuggingFace `tokenizers` included):

1. CORPUS-scale (distributed, the 100 TB part): pre-tokenize every
   document with the GPT-2-style regex and aggregate to the
   (word, count) frequency table — one explode + one map-side-partial
   groupBy shuffle over the corpus, identical shape to t_top_ngrams.
   Everything downstream touches only this table.
2. VOCAB-scale (driver, bounded): the merge loop itself. Pair counts
   and the argmax merge are sequential by definition (merge k+1's
   counts depend on merge k having been applied), and the frequency
   table is bounded — natural-language pre-token vocabularies are
   millions of entries where corpora are billions of documents, and
   ``min_count`` prunes the long tail the way every real trainer does.
   The collect is therefore vocab-bounded and documented, not
   data-sized (the repo's bounded-collect discipline).

Merge semantics: greedy left-to-right within a word, highest pair
count first, ties broken lexicographically (left asc, right asc) so
training is deterministic across engines, runs, and partitionings.

Invariant (used by chk_bpe_train): merge counts are non-increasing in
rank — a pair involving a new symbol occurs at most as often as the
merge that created the symbol, and existing pairs only lose
occurrences.

Reference parity: the reference has no tokenizer trainer; this is the
LLM-pipeline extension surface (SURVEY.md §2 extensions) alongside
t_bpe_token_stats' fixed pre-tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_spark.functions.text import bpe_pretokens
from sync_spark.operators.relational import _t


def bpe_word_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, cnt) pre-token frequency table — the one corpus-scale
    step. Explode + map-side-partial count; hot pre-tokens ('the',
    single spaces) are exactly the keys partial aggregation absorbs
    before the shuffle."""
    wc = (
        df.select(F.explode(bpe_pretokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("cnt") >= min_count)
    return wc


def _apply_merge(syms: tuple, left: str, right: str) -> tuple:
    """Greedy left-to-right single-merge application."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_merge_loop(
    word_counts: list[tuple[tuple, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The vocab-scale merge loop with INCREMENTAL pair-count
    maintenance (round 6 — the classic heap trainer split HF
    tokenizers uses): a lazy-invalidation max-heap holds (count, pair)
    candidates, and each merge updates only the pairs ADJACENT to its
    occurrences (per affected word: Counter(new pairs) −
    Counter(old pairs), found via a pair→words inverted index). Cost
    per merge is Σ|affected word| instead of the r5 form's O(total
    vocab symbols) full rescan — 1024 merges on a 100k-entry table is
    milliseconds, not minutes (test_bpe_train pins sub-second at
    n_merges=1024 and bit-identical merges vs the naive loop).

    Argmax identical to the rescan form: the heap orders
    (-count, left, right), so the top is the highest count with
    lexicographic (left asc, right asc) tie-break."""
    import heapq

    words: list[list] = [[syms, cnt] for syms, cnt in word_counts]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, cnt) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = None
        while heap:
            negc, lft, rgt = heap[0]
            cur = pair_counts.get((lft, rgt), 0)
            if cur == -negc and cur > 0:
                heapq.heappop(heap)
                best = (lft, rgt, cur)
                break
            # stale entry: drop it, re-enqueue the corrected count
            heapq.heappop(heap)
            if cur > 0:
                heapq.heappush(heap, (-cur, lft, rgt))
        if best is None:
            break
        left, right, bcount = best
        merges.append((rank, left, right, bcount))
        changed: set[tuple[str, str]] = set()
        for wi in sorted(pair_words.get((left, right), ())):
            syms, cnt = words[wi]
            new = _apply_merge(syms, left, right)
            if new == syms:
                continue
            delta: dict[tuple[str, str], int] = {}
            for p in zip(syms, syms[1:]):
                delta[p] = delta.get(p, 0) - 1
            npairs = set(zip(new, new[1:]))
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                delta[p] = delta.get(p, 0) + 1
            for p, dv in delta.items():
                if dv:
                    nc = pair_counts.get(p, 0) + dv * cnt
                    if nc > 0:
                        pair_counts[p] = nc
                    else:
                        pair_counts.pop(p, None)
                    changed.add(p)
                if p in npairs:
                    pair_words.setdefault(p, set()).add(wi)
                elif dv:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(wi)
            words[wi][0] = new
        pair_counts.pop((left, right), None)
        pair_words.pop((left, right), None)
        # one heap entry per changed pair per MERGE (not per word):
        # hot early merges touch thousands of words and would flood
        # the heap with duplicates otherwise
        changed.discard((left, right))
        for p in changed:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


BPE_MAX_VOCAB = 1_000_000


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_count: int = 1,
    max_vocab: int = BPE_MAX_VOCAB,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(rank, left, right, pair_count), ...] in learned order; stops
    early if the corpus runs out of pairs.

    The collected frequency table is capped at ``max_vocab`` entries
    (count desc, word asc — a deterministic TakeOrdered, not a full
    sort), the top-V discipline every production trainer applies
    before the driver-side loop: at web scale the raw pre-token
    vocabulary has a long hapax tail that contributes nothing to
    early merges, and an uncapped collect would be data-sized instead
    of vocab-bounded. Raise ``min_count`` as the complementary knob
    when the tail should be cut corpus-side (bpe_word_counts prunes
    BEFORE the shuffle's final aggregate lands in the collect)."""
    wc = bpe_word_counts(df, text_col, min_count)
    rows = (
        wc.orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(max_vocab)
        .collect()
    )
    return bpe_merge_loop([(tuple(r["word"]), int(r["cnt"])) for r in rows], n_merges)


def bpe_merges_df(spark: SparkSession, merges: list[tuple]) -> DataFrame:
    # Arrow-backed local frame (r11 opt round, guide §4): the pickled
    # createDataFrame(list) form scheduled 32 Python-worker tasks on
    # every action of t_bpe_train just to deserialize ≤ n_merges rows
    from sync_spark.operators.localrel import arrow_local_frame

    # coalesce(1): consumed as an RDD (count/collect), where the local
    # relation would otherwise plan core-count near-empty tasks
    return arrow_local_frame(
        spark,
        [(int(r), l, rt, int(c)) for r, l, rt, c in merges],
        "rank int, left string, right string, pair_count long",
    ).coalesce(1)


def bpe_encode_words(
    words: DataFrame, merges: list[tuple], word_col: str = "word"
) -> DataFrame:
    """Apply a learned merge list to a word column, fully in-row (the
    ENCODE side is corpus-scale, so it stays distributed): split to
    characters, then fold the MERGE TABLE ITSELF over the symbol
    array — one outer aggregate over a constant-folded
    array<struct<l,r>> literal in rank order, whose lambda body is
    the greedy left-to-right pass as an inner aggregate. Nested
    lambdas read only their own and the enclosing lambda's ARGUMENTS
    (never a projected attribute), so the CollapseProject
    re-evaluation hazard cannot apply. Adds a ``syms: array<string>``
    column. ONE narrow projection regardless of merge count — the r5
    form emitted one chained projection per merge, which is fine at
    n_merges=16 and a plan explosion at a production 32k (the encode
    twin of the r6 trainer hardening); no shuffle, no UDF — a
    tokenizer that runs at scan speed on 100 TB."""

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    if merges:
        pairs = ", ".join(
            f"named_struct('l', {q(l)}, 'r', {q(r)})" for _, l, r, _ in merges
        )
        fold = f"""aggregate(
  array({pairs}),
  filter(split({word_col}, ''), x -> x <> ''),
  (cur, m) -> aggregate(cur, CAST(array() AS ARRAY<STRING>),
    (acc, s) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = m.l AND s = m.r
                     THEN concat(slice(acc, 1, size(acc) - 1), array(concat(m.l, m.r)))
                     ELSE concat(acc, array(s)) END))"""
    else:
        fold = f"filter(split({word_col}, ''), x -> x <> '')"
    return words.withColumn("syms", F.expr(fold))


BPE_N_MERGES = 16


def t_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface: the first 16 learned merges over the
    documents corpus. Rows-only for the driver (the merge loop is
    sequential by definition — no single SQL statement expresses it);
    chk_bpe_train gates the contract."""
    d = _t(spark, sf_dir, "documents")
    return bpe_merges_df(spark, bpe_train(d, "text", n_merges=BPE_N_MERGES))


def chk_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training contract as a deterministic row: the FIRST merge
    must equal the argmax character pair of the initial corpus (the
    oracle recomputes that ground truth independently in DuckDB,
    including the count); ranks must be exactly 1..N; merge counts
    must be non-increasing (see module invariant); every merged symbol
    must concatenate its parts."""
    d = _t(spark, sf_dir, "documents")
    merges = bpe_train(d, "text", n_merges=BPE_N_MERGES)
    schema = (
        "n_merges long, ranks_ok boolean, counts_nonincreasing boolean, "
        "first_left string, first_right string, first_count long"
    )
    if not merges:
        # empty/trivial corpus (no adjacent symbol pairs): the oracle's
        # LIMIT 1 over an empty aggregate returns zero rows — mirror it
        # (ADVICE r5: previously an IndexError)
        return spark.createDataFrame([], schema)
    ranks_ok = [r for r, *_ in merges] == list(range(1, len(merges) + 1))
    counts = [c for *_, c in merges]
    noninc = all(a >= b for a, b in zip(counts, counts[1:]))
    first = merges[0]
    return spark.createDataFrame(
        [
            (
                len(merges),
                bool(ranks_ok),
                bool(noninc),
                first[1],
                first[2],
                int(first[3]),
            )
        ],
        schema,
    )


CHK_BPE_TRAIN_SQL = rf"""
WITH pt AS (
  SELECT unnest(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS w
  FROM documents
), wc AS (
  SELECT w, COUNT(*) AS cnt FROM pt GROUP BY w
), ch AS (
  SELECT string_split(w, '') AS cs, cnt FROM wc
), pairs AS (
  SELECT u.l AS l, u.r AS r, cnt
  FROM (SELECT unnest([{{'l': cs[i], 'r': cs[i+1]}} for i in range(1, len(cs))]) AS u, cnt
        FROM ch)
), agg AS (
  SELECT l, r, SUM(cnt) AS c FROM pairs GROUP BY l, r
)
SELECT CAST({BPE_N_MERGES} AS BIGINT) AS n_merges,
       TRUE AS ranks_ok,
       TRUE AS counts_nonincreasing,
       l AS first_left, r AS first_right, CAST(c AS BIGINT) AS first_count
FROM agg ORDER BY c DESC, l ASC, r ASC LIMIT 1
"""


def t_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility report under the CORPUS-TRAINED tokenizer
    — the number every tokenizer evaluation leads with (tokens/word,
    chars/token): a language whose fertility explodes is under-served
    by the merge table and will eat a multiple of its fair token
    budget at training time.

    Shape: training is the documented driver-bounded merge loop
    (bpe_train); ENCODING runs at VOCAB grain, not corpus grain — the
    corpus explodes to (lang, word) pretokens (one map-side-partial
    aggregation to (lang, word, n) so repeated words encode once per
    DISTINCT spelling), the distinct-word frame runs the in-row merge
    fold (N merges = N narrow projections, no UDF), and the corpus
    side picks the symbol count back up through an AQE-sized join on
    word. At 100 TB the encode cost is ∝ pretoken vocabulary
    (millions), corpus cost is the one (lang, word) aggregation.

    Scaled-integer outputs: fertility_e6 = (Σsyms·10⁶) DIV Σwords,
    chars_per_token_e6 = (Σchars·10⁶) DIV Σsyms — deterministic
    integer math (same discipline as the rest of the registry).
    Rows-only for the driver (the merge list is sequential-by-
    definition training state); chk_bpe_fertility gates the contract
    against DuckDB ground truth."""
    d = _t(spark, sf_dir, "documents")
    merges = bpe_train(d, "text", n_merges=BPE_N_MERGES)
    lw = (
        d.select("lang", F.explode(bpe_pretokens(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    enc = bpe_encode_words(lw.select("word").distinct(), merges).select(
        "word", F.size("syms").alias("n_syms"), F.length("word").alias("n_chars")
    )
    return (
        lw.join(enc, "word")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("n_syms")).cast("long").alias("n_tokens"),
            F.sum(F.col("n") * F.col("n_chars")).cast("long").alias("n_chars"),
            F.expr("(SUM(n * n_syms) * 1000000) DIV SUM(n)").alias("fertility_e6"),
            F.expr("(SUM(n * n_chars) * 1000000) DIV SUM(n * n_syms)").alias(
                "chars_per_token_e6"
            ),
        )
        .orderBy("lang")
    )


def chk_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility contract row, hash-gated against DuckDB ground truth:
    per-language word and char totals must equal an independent DuckDB
    fold of the same pre-tokenizer regex (the encode step cannot
    invent or lose words/chars — symbols always concatenate back to
    the word), and 1 ≤ tokens ≤ chars must hold per language (merges
    only ever shrink the symbol count; no symbol is ever empty)."""
    f = t_bpe_fertility(spark, sf_dir)
    return f.select(
        "lang",
        "n_words",
        F.col("n_chars").alias("total_chars"),
        (F.col("n_tokens") >= F.col("n_words")).alias("tokens_ge_words"),
        (F.col("n_tokens") <= F.col("n_chars")).alias("tokens_le_chars"),
    ).orderBy("lang")


CHK_BPE_FERTILITY_SQL = r"""
WITH pt AS (
  SELECT lang,
         unnest(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS w
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(w)) AS BIGINT) AS total_chars,
       TRUE AS tokens_ge_words,
       TRUE AS tokens_le_chars
FROM pt GROUP BY lang ORDER BY lang
"""
