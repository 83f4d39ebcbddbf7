"""Registry queries for text analysis, dedup, and similarity search
(the training-data extension surface), with DuckDB oracles where the
semantics are SQL-expressible; MinHash-LSH / SimHash / ANN-LSH are
rows-only (approximate candidate generation has no SQL oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_spark.functions import text as T
from sync_spark.operators import dedup, similarity
from sync_spark.operators.relational import _t

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def t_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.avg_token_len(F.col("text")).alias("avg_token_len"),
        T.punct_ratio(F.col("text")).alias("punct_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    )


_SW_EN = "'the','a','of','and','to','is'"

T_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks, text FROM documents
)
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS n_tokens,
       CASE WHEN length(trim(text)) = 0 OR len(toks) = 0 THEN 0.0
            ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END AS avg_token_len,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
       round(
         0.4 * least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
         + 0.3 * (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g')) AS DOUBLE) / length(text) END * 5, 1.0))
         + 0.3 * least(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> lower(x) IN ({_SW_EN}))) AS DOUBLE) / len(toks) END * 5, 1.0),
         6) AS quality
FROM t
"""


def t_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        T.langid(F.col("text")).alias("lang_pred"),
    )


def _langid_oracle_sql() -> str:
    langs = sorted(T.STOPWORDS)
    hits = {
        lang: f"len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> lower(x) IN ({', '.join(repr(w) for w in T.STOPWORDS[lang])})))"
        for lang in langs
    }
    # same fold as the Spark side: alphabetically-first language wins ties
    score_cols = ",\n       ".join(f"{hits[lang]} AS h_{lang}" for lang in langs)
    best = "CASE"
    for lang in langs:
        others = [f"h_{lang} >= h_{o}" for o in langs if o != lang]
        best += f"\n  WHEN h_{lang} > 0 AND {' AND '.join(others)} THEN '{lang}'"
    best += "\n  ELSE 'und' END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_label,
       {score_cols}
  FROM documents
)
SELECT doc_id, lang_label, {best} AS lang_pred FROM scored
"""


T_LANGID_SQL = _langid_oracle_sql()


def t_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.token_count(F.col("text"))).alias("total_tokens"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .orderBy("lang")
    )


T_TOKEN_STATS_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fp"),
    )


T_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
FROM documents
"""


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


def d_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "text", "doc_id")


D_EXACT_SQL = """
SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
       MIN(doc_id) AS survivor_id,
       COUNT(*) AS n_dups
FROM documents GROUP BY 1
"""


def d_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard ≥ 0.8 pairs via inverted index — oracle
    does the O(n²) cross join, Spark does the scalable plan; results
    must agree exactly."""
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.8)


D_JACCARD_SQL = """
WITH d AS (
  SELECT doc_id,
         list_distinct([ regexp_split_to_array(trim(text), '\s+')[i] || ' ' || regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' || regexp_split_to_array(trim(text), '\s+')[i+2]
                         for i in range(1, len(regexp_split_to_array(trim(text), '\s+')) - 1) ]) AS sh
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
FROM d a, d b
WHERE a.doc_id < b.doc_id
  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
"""


def d_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: Jaccard≥0.8 pairs → connected
    components → survivor per cluster. Oracle: recursive-CTE
    transitive closure over the same pair set."""
    from sync_spark.operators.cluster import dedup_clusters

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.8).select(
        "id_a", "id_b"
    )
    return dedup_clusters(d, pairs).orderBy("doc_id")


D_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  WITH d AS (
    SELECT doc_id,
           list_distinct([ regexp_split_to_array(trim(text), '\s+')[i] || ' ' || regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' || regexp_split_to_array(trim(text), '\s+')[i+2]
                           for i in range(1, len(regexp_split_to_array(trim(text), '\s+')) - 1) ]) AS sh
    FROM documents
  )
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a, d b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(root, node) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
)
SELECT root AS doc_id,
       MIN(node) AS cluster_id,
       root = MIN(node) AS is_survivor
FROM reach GROUP BY root ORDER BY doc_id
"""


def d_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (rows-only: banding is approximate).
    Deterministic given fixed seeds; candidates are verified with
    exact Jaccard so every returned pair truly clears the threshold."""
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, "text", "doc_id", n=3, num_hashes=32, bands=8, threshold=0.8)


def d_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, hamming ≤ 3 (rows-only)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(d, "text", "doc_id", max_hamming=3)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def e_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 10 vectors.
    Quantized-int dot products make Spark and DuckDB bit-identical."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


E_COSINE_SQL = """
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS cv
  FROM embeddings
), scored AS (
  SELECT q.query_id, c.neighbor_id,
         CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE))) AS cosine
  FROM q, c WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def e_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate NN (rows-only: recall < 1 by design)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_planes=4, n_tables=16
    )


def e_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (KMeans codebook) approximate NN — the trained-codebook
    scale path (rows-only: recall < 1 by design, deterministic seed)."""
    emb = _t(spark, sf_dir, "embeddings")
    # Lloyd iterations are driver-side numpy over the bounded sample,
    # so converging the codebook properly costs microseconds — only
    # the ONE cell-assignment pass over the corpus is a Spark job
    return similarity.ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_lists=16, n_probe=6, max_iter=25
    )


def t_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus selection under a token budget: keep the
    highest-quality documents whose cumulative token count fits in
    half the corpus' tokens.

    Scale shape (the reason this is NOT a global quality sort): per-doc
    scoring is embarrassingly parallel; the budget cutoff is found on a
    ≤1000-row score-bucket histogram (tiny single-partition window);
    the final selection is a broadcast semi-join of kept buckets
    against the scored scan. A documents-wide ORDER BY + running sum
    would funnel 100 TB through one partition for the same answer
    (granularity: one bucket).
    """
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.least(
            F.floor(T.quality_score(F.col("text")) * 1000).cast("int"), F.lit(999)
        ).alias("qbucket"),
    )
    hist = scored.groupBy("qbucket").agg(F.sum("n_tokens").alias("btok"))
    w = Window.orderBy(F.col("qbucket").desc()).rowsBetween(Window.unboundedPreceding, 0)
    run = hist.crossJoin(hist.agg(F.sum("btok").alias("total"))).withColumn(
        "cum", F.sum("btok").over(w)
    )
    keep = run.filter(F.col("cum") <= 0.5 * F.col("total")).select("qbucket")
    return scored.join(F.broadcast(keep), "qbucket").select("doc_id", "n_tokens", "qbucket")


T_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks, text FROM documents
), scored AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS n_tokens,
         least(CAST(floor(round(
           0.4 * least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
           + 0.3 * (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g')) AS DOUBLE) / length(text) END * 5, 1.0))
           + 0.3 * least(CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE CAST(len(list_filter(toks, x -> lower(x) IN ({_SW_EN}))) AS DOUBLE) / len(toks) END * 5, 1.0),
           6) * 1000) AS INT), 999) AS qbucket
  FROM t
), hist AS (
  SELECT qbucket, SUM(n_tokens) AS btok FROM scored GROUP BY qbucket
), run AS (
  SELECT qbucket,
         SUM(btok) OVER (ORDER BY qbucket DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
), keep AS (
  SELECT qbucket FROM run WHERE cum <= 0.5 * (SELECT SUM(n_tokens) FROM scored)
)
SELECT s.doc_id, s.n_tokens, s.qbucket FROM scored s JOIN keep k USING (qbucket)
"""
