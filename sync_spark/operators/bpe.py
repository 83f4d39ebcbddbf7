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


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_count: int = 1,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(rank, left, right, pair_count), ...] in learned order; stops
    early if the corpus runs out of pairs."""
    rows = bpe_word_counts(df, text_col, min_count).collect()
    words: list[list] = [[tuple(r["word"]), int(r["cnt"])] for r in rows]

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
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
                w[0] = _apply_merge(w[0], left, right)
    return merges


def bpe_merges_df(spark: SparkSession, merges: list[tuple]) -> DataFrame:
    return spark.createDataFrame(
        [(int(r), l, rt, int(c)) for r, l, rt, c in merges],
        "rank int, left string, right string, pair_count long",
    )


def bpe_encode_words(
    words: DataFrame, merges: list[tuple], word_col: str = "word"
) -> DataFrame:
    """Apply a learned merge list to a word column, fully in-row (the
    ENCODE side is corpus-scale, so it stays distributed): split to
    characters, then one staged fold per merge in rank order — each
    fold is the greedy left-to-right pass expressed as aggregate()
    whose lambda reads only its own arguments plus per-merge literals.
    Adds a ``syms: array<string>`` column. N merges = N narrow
    projections; no shuffle, no UDF — a tokenizer that runs at scan
    speed on 100 TB."""
    out = words.withColumn(
        "syms", F.expr(f"filter(split({word_col}, ''), x -> x <> '')")
    )
    for _, left, right, _ in merges:
        l_lit = left.replace("\\", "\\\\").replace("'", "\\'")
        r_lit = right.replace("\\", "\\\\").replace("'", "\\'")
        out = out.withColumn(
            "syms",
            F.expr(
                "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
                f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l_lit}' "
                f"AND s = '{r_lit}' "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array('{l_lit}{r_lit}')) "
                "ELSE concat(acc, array(s)) END)"
            ),
        )
    return out


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
        "n_merges long, ranks_ok boolean, counts_nonincreasing boolean, "
        "first_left string, first_right string, first_count long",
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
