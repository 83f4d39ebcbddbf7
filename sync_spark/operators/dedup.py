"""Deduplication family for training-data pipelines (SURVEY.md §7
Phase 4): exact, n-gram Jaccard (exact, inverted-index), MinHash+LSH
(approximate, band-bucketed), SimHash.

Scale design (the whole point of these operators):
- exact: hash-groupBy on a fingerprint — one shuffle keyed by digest,
  no skew (md5 is uniform).
- n-gram Jaccard: NEVER a cross join. Explode shingles → self-join on
  the shingle (inverted index) → per-pair intersection counts → exact
  Jaccard. Work is proportional to Σ posting-list², not n²; hot
  shingles (stopword trigrams) are the skew risk — AQE skew-join
  handles moderate cases, and `max_posting` hard-caps pathological
  shingles the way real pipelines drop ubiquitous shingles.
- MinHash LSH: k seeded hash-mins per doc → b bands of r rows →
  band-hash join produces candidates only (collision ⇒ likely
  similar), then exact Jaccard verification on candidates. Tunable
  (k, b) so the band join stays selective at 100 TB.
- SimHash: 64-bit signature via per-bit weighted votes; near-dup
  candidates by pigeonhole on 4×16-bit chunks (hamming ≤3 ⇒ at least
  one chunk equal), verified by exact hamming distance.

All JVM-side Column expressions; no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from sync_spark.functions.text import fingerprint, shingles, tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Survivor per exact-content group = min id (deterministic)."""
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias("survivor_id"), F.count(F.lit(1)).alias("n_dups"))
    )




_KERNEL_CHUNK_BYTES = 32 * 1024


def spread_for_kernel(
    df: DataFrame, min_partitions: int = 0, width: int | None = None
) -> DataFrame:
    """Fan a narrow input out before a CPU-bound per-row kernel
    (winnowing, LM scoring, shingling). A small parquet file arrives
    as ONE input split (under files.maxPartitionBytes), which
    serializes the kernel on one core; at 100 TB the scan already has
    thousands of splits and this is a no-op — the repartition is
    strictly conditional because an unconditional one would shuffle
    the full corpus for nothing.

    The width is sized from the optimizer's byte estimate (~one task
    per 32 KB of input, capped at defaultParallelism): at toy scale
    full CPU width costs more in task-launch waves than the kernel
    itself (measured 0.71s at 32-way vs 0.51s at 8-way for the sf0.1
    winnow kernel), while at real scale the cap takes over."""
    if width is not None:
        # caller already sized the spread from file bytes
        # (kernel_spread_width_from_files): 0 = scan is wide enough,
        # skip BOTH the optimizer-stats probe and the .rdd partition
        # probe (~0.2s of query construction each call)
        return df.repartition(width) if width > 0 else df
    target = kernel_spread_width(df, min_partitions)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def kernel_spread_width(df: DataFrame, min_partitions: int = 0) -> int:
    """The task-width calculation behind ``spread_for_kernel``,
    exposed for SQL-string kernels that need the number for a
    ``REPARTITION(n)`` hint (a DataFrame-side repartition can't be
    injected into a ``spark.sql`` pipeline without splitting it into
    two analysis passes). Sized from the optimizer's byte estimate —
    ~one task per 32 KB at toy scale, capped at defaultParallelism at
    real scale — so a hinted SQL kernel scales exactly like the
    DataFrame form."""
    sc = df.sparkSession.sparkContext
    cap = sc.defaultParallelism
    if min_partitions:
        return min(min_partitions, cap)
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # stats unavailable → assume big
        size = 1 << 40
    return max(2, min(cap, size // _KERNEL_CHUNK_BYTES + 1))


def gram_array(toks: Column, k: int) -> Column:
    """Word k-gram array from a MATERIALIZED token-array Column — the
    ONE copy of the clamped+filtered index construction shared by the
    shingle and winnowing paths. The clamp+filter guards the
    descending-sequence hazard: for a doc shorter than k tokens a
    bare sequence(1, size-k+1) would generate DESCENDING indices and
    element_at(toks, 0) throws; a guarding CASE branch is not
    reliably skipped under codegen."""
    last = F.size(toks) - k + 1
    idx = F.filter(F.sequence(F.lit(1), F.greatest(last, F.lit(1))), lambda i: i <= last)
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def _doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int,
    spread_width: int | None = None,
) -> DataFrame:
    """Two-step shingling: materialize the token array as a column
    FIRST, then build n-grams with element_at (gram_array). Higher-
    order lambdas run interpreted (no codegen), so an un-materialized
    split() child would be re-evaluated per element — measured 13×
    slower. ``spread_width`` (r11): callers over testdata-layout
    tables pass kernel_spread_width_from_files so construction skips
    the optimizer-stats + .rdd plan probes (~0.2s/call)."""
    from sync_spark.functions.text import staged_expr, tokens_named

    toks = spread_for_kernel(
        df.select(F.col(id_col).alias("doc_id"), tokens_named(text_col).alias("toks")),
        width=spread_width,
    )
    # memoized (r11 opt round): the gram HOF is a fixed expression over
    # the staged "toks" attribute — one build per (n, k) per context
    gram = staged_expr(f"dedup.gram_array(toks,{n})", lambda: gram_array(F.col("toks"), n))
    # the ONE persisted shingle column is stored SORTED: the jaccard
    # prefix index explodes a slice of the sorted set (a Generate over
    # a computed array_sort(...) re-evaluates the sort per generated
    # row), and every other consumer (posting explode, array_intersect,
    # size) is order-insensitive — one column serves all callers with
    # no duplicate cache footprint
    return toks.select("doc_id", F.array_sort(F.array_distinct(gram)).alias("sh"))


# most-recent persisted shingle table; bounded-leak discipline for
# long-lived sessions (see _doc_shingles_cached)
_live_shingle_cache: list[DataFrame] = []


def _doc_shingles_cached(
    df: DataFrame, text_col: str, id_col: str, n: int,
    spread_width: int | None = None,
) -> DataFrame:
    """Persisted shingle table with derived size column.

    ORDER MATTERS: persist BEFORE attaching size(sh)/filters. Catalyst
    pushes projections and predicates through the shingle projection,
    substituting the full transform expression into each consumer —
    measured 3× the shingling cost when n_sh and the >0 filter sat
    below the cache barrier.

    Cache lifetime: results are lazy, so the operator can't know when
    the caller is done — instead each new shingle cache evicts the
    previous one (bounded to ONE live cache per session). A still-lazy
    older result simply recomputes; long-lived sessions never
    accumulate stale shingle tables."""
    # evict BEFORE persisting the replacement: Spark's cache manager
    # keys on the LOGICAL PLAN, so unpersisting an old handle whose
    # plan equals the new one would evict the fresh cache too
    while _live_shingle_cache:
        try:
            _live_shingle_cache.pop().unpersist()
        except Exception:
            pass  # session already stopped
    base = _doc_shingles(df, text_col, id_col, n, spread_width).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _live_shingle_cache.append(base)
    return base.withColumn("n_sh", F.size("sh")).filter(F.col("n_sh") > 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    spread_width: int | None = None,
) -> DataFrame:
    """PPJoin pairs through ONE spark.sql analysis pass (r11, guide
    §4/§1.4 — query-construction latency is pure Python/py4j
    overhead): the persisted shingle table registers as a temp view
    and the whole downstream (prefix index, candidate aggregate,
    two-tier verification) runs as one SQL statement
    (``ngram_jaccard_pairs_sql``), replacing the ~40-call Column
    chain that cost ~0.3s of construction per call at bench scale.
    Algorithm documentation and the agreement-pinned reference chain
    live in ``ngram_jaccard_pairs_frames``. ``spread_width``: see
    _doc_shingles — pass the file-stat width so the shingle build
    skips its plan probes; callers sharing one bench session should
    pass the SAME value so the shingle cache stays plan-equal."""
    docs = _doc_shingles_cached(df, text_col, id_col, n, spread_width)
    docs.createOrReplaceTempView("__njp_docs")
    return df.sparkSession.sql(ngram_jaccard_pairs_sql("__njp_docs", threshold))


def ngram_jaccard_pairs_sql(docs_view: str, threshold: float = 0.8) -> str:
    """SQL-text twin of ``ngram_jaccard_pairs_frames``' downstream
    over a (doc_id, sh SORTED, n_sh) shingle view — identical prefix
    slice, size-ratio + positional-suffix pruning, and two-tier
    (hashed-long, then exact-string) verification; agreement is
    pytest-pinned and must stay in lockstep with the frames form."""
    t = f"{threshold!r}D"
    t1 = f"{(1.0 + threshold)!r}D"
    return f"""
WITH __nj_prefix AS (
  SELECT doc_id, n_sh, pos, xxhash64(shingle) AS shingle_h
  FROM {docs_view}
  LATERAL VIEW posexplode(slice(sh, 1,
      greatest(CAST(n_sh - ceil({t} * n_sh) + 1 AS INT), 1))) __njx AS pos, shingle
), __nj_cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM __nj_prefix a JOIN __nj_prefix b
    ON a.shingle_h = b.shingle_h AND a.doc_id < b.doc_id
   AND CAST(a.n_sh AS DOUBLE) >= {t} * b.n_sh
   AND CAST(b.n_sh AS DOUBLE) >= {t} * a.n_sh
  GROUP BY a.doc_id, a.n_sh, b.doc_id, b.n_sh
  HAVING CAST(COUNT(*) + least(a.n_sh - MAX(a.pos) - 1,
                               b.n_sh - MAX(b.pos) - 1) AS DOUBLE)
         >= {t} * CAST(a.n_sh + b.n_sh AS DOUBLE) / {t1} - 1e-9
), __nj_va AS (
  SELECT doc_id AS id_a, sh AS sh_a, n_sh AS n_a,
         transform(sh, x -> xxhash64(x)) AS shh_a
  FROM {docs_view}
), __nj_vb AS (
  SELECT doc_id AS id_b, sh AS sh_b, n_sh AS n_b,
         transform(sh, x -> xxhash64(x)) AS shh_b
  FROM {docs_view}
), __nj_t1 AS (
  SELECT id_a, id_b, n_a, n_b, sh_a, sh_b,
         size(array_intersect(shh_a, shh_b)) AS ih
  FROM __nj_cand JOIN __nj_va USING (id_a) JOIN __nj_vb USING (id_b)
), __nj_t2 AS (
  SELECT id_a, id_b, n_a, n_b, size(array_intersect(sh_a, sh_b)) AS inter
  FROM __nj_t1
  WHERE CAST(ih AS DOUBLE) / CAST(n_a + n_b - ih AS DOUBLE) >= {t}
)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) AS jaccard
  FROM __nj_t2
) WHERE jaccard >= {t}
"""


def ngram_jaccard_pairs_frames(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT Jaccard ≥ threshold pairs — prefix-filtered inverted
    index (PPJoin-style; Xiao et al., "Efficient Similarity Joins for
    Near Duplicate Detection", WWW'08 — public algorithm). Reference
    DataFrame form of ``ngram_jaccard_pairs`` (the hot path runs the
    SQL twin); kept for the lockstep agreement test.

    Exactness argument: sort every shingle set in one global
    (lexicographic) order and index only its first
    ``|s| - ceil(t·|s|) + 1`` shingles. Two sets with Jaccard ≥ t
    overlap in ≥ ceil(t·max(|A|,|B|)) elements, so their sorted
    prefixes must share at least one — every qualifying pair survives
    candidate generation. A size-ratio filter (|A| ≥ t·|B|) prunes
    further, also implied by J ≥ t. Exact Jaccard is then computed
    only on candidates via array_intersect.

    At scale this turns Σ|posting|² on ubiquitous shingles into
    Σ|prefix-posting|² on rare ones — the candidate join stays
    band-partitioned and never approaches n²."""
    # cached shingle table: feeds the prefix index AND both sides of
    # the verification join (see _doc_shingles_cached for why the
    # cache barrier must come first)
    docs = _doc_shingles_cached(df, text_col, id_col, n)
    prefix_len = (F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1).cast("int")
    prefix = docs.select(
        "doc_id",
        "n_sh",
        # sh is persisted pre-sorted (see _doc_shingles); pos is
        # 0-based within the full sorted array (a prefix slice starts
        # at element 1)
        F.posexplode(F.slice("sh", 1, F.greatest(prefix_len, F.lit(1)))).alias(
            "pos", "shingle"
        ),
        # r12 (guide §2.3 — shuffle fewer bytes): the candidate join
        # keys on xxhash64(shingle), not the 3-word string, so the
        # prefix-index exchange carries 8-byte longs. String equality
        # implies hash equality, so every true pair still collides; a
        # cross-shingle collision can only ADD a candidate (and only
        # loosen the COUNT/MAX(pos) HAVING bound), and the unchanged
        # two-tier EXACT verification decides membership — emitted
        # pairs are identical (sf1 A/B: 250,600 pairs bit-equal,
        # ~5.1s → ~4.5s; the byte win grows with corpus scale).
    ).select("doc_id", "n_sh", "pos", F.xxhash64("shingle").alias("shingle_h"))
    a, b = prefix.alias("a"), prefix.alias("b")
    # r11 (guide §3 — reduce the join input before the expensive
    # stage): complete the PPJoin pruning with the positional suffix
    # bound. The candidate aggregate (same shuffle the old .distinct()
    # paid) counts the matched prefix shingles per pair and keeps the
    # positions of the LARGEST matched shingle (sorted arrays: the max
    # shingle attains max pos on both sides simultaneously). With all
    # sets sorted in one global order, every common element ≤ that
    # shingle must itself be a prefix∩prefix match (it sorts before a
    # prefix member on both sides, hence sits in both prefixes), so
    #   |A∩B| ≤ cnt + min(n_a − Pa − 1, n_b − Pb − 1).
    # J ≥ t needs |A∩B| ≥ t·(n_a+n_b)/(1+t); pairs whose bound can't
    # reach that are dropped EXACTLY — the epsilon keeps borderline
    # pairs, which tier-1/tier-2 verification then decides. sf0.1:
    # 80381 candidate pairs → ~1.3k enter verification; verification
    # cost ∝ candidates.
    candidates = (
        a.join(
            b,
            (F.col("a.shingle_h") == F.col("b.shingle_h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-ratio pruning: J ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t
            & (F.col("a.n_sh").cast("double") >= F.lit(threshold) * F.col("b.n_sh"))
            & (F.col("b.n_sh").cast("double") >= F.lit(threshold) * F.col("a.n_sh")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("a.n_sh").alias("bn_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("b.n_sh").alias("bn_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max(F.col("a.pos")).alias("pa"),
            F.max(F.col("b.pos")).alias("pb"),
        )
        .filter(
            (
                F.col("cnt")
                + F.least(
                    F.col("bn_a") - F.col("pa") - 1, F.col("bn_b") - F.col("pb") - 1
                )
            ).cast("double")
            >= F.lit(threshold)
            * (F.col("bn_a") + F.col("bn_b")).cast("double")
            / F.lit(1.0 + threshold)
            - F.lit(1e-9)
        )
        .select("id_a", "id_b")
    )
    # verification in two tiers (r7): string array_intersect runs
    # interpreted with per-call set building and string boxing — at
    # sf0.1 it was ~2.5s of the query's 3.2s on 80k candidates that
    # reduce to 256 pairs. Tier 1 intersects xxhash64'd LONG arrays
    # (primitive sets, no boxing) — a cross-set collision makes the
    # hashed intersection OVER-count, so thresholding it keeps a
    # superset of the true pairs modulo one exception: a collision
    # BETWEEN two shingles already inside the true intersection
    # UNDER-counts it by one (probability ~n²/2⁶⁴ per pair —
    # negligible, but the superset property is not strict).
    # Tier 2 then computes the EXACT
    # string intersection on the survivors only; the emitted jaccard
    # never involves hashes, so oracle bit-exactness is untouched.
    hh = F.transform(F.col("sh"), lambda x: F.xxhash64(x))
    da = docs.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"), hh.alias("shh_a"),
    )
    db = docs.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"), hh.alias("shh_b"),
    )
    return (
        candidates.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("ih", F.size(F.array_intersect("shh_a", "shh_b")))
        .filter(
            F.col("ih").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("ih")).cast("double")
            >= threshold
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """k seeded xxhash64-min signatures per doc (deterministic).
    Explode + groupBy form — see minhash_lsh_pairs_sql for the sf1
    A/B that picked the codegen'd aggregate over the interpreted
    per-row transform() form (identical values either way)."""
    docs = _doc_shingles_cached(df, text_col, id_col, n)
    ex = docs.select("doc_id", F.explode("sh").alias("shingle"))
    return ex.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    ).select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    spread_width: int | None = None,
) -> DataFrame:
    """MinHash-LSH pairs through ONE spark.sql analysis pass (r11,
    guide §4/§1.4): the persisted shingle table registers as a temp
    view and the signature aggregate, banding join and exact-Jaccard
    verification run as one SQL statement (the 32 per-seed min-agg
    Columns plus 8 band structs cost ~0.55s of py4j construction per
    call at bench scale). Algorithm documentation and the
    agreement-pinned reference chain live in
    ``minhash_lsh_pairs_frames``. ``spread_width``: see
    ngram_jaccard_pairs."""
    assert num_hashes % bands == 0
    docs = _doc_shingles_cached(df, text_col, id_col, n, spread_width)
    docs.createOrReplaceTempView("__mhp_docs")
    return df.sparkSession.sql(
        minhash_lsh_pairs_sql("__mhp_docs", num_hashes, bands, threshold)
    )


def minhash_lsh_pairs_sql(
    docs_view: str,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> str:
    """SQL-text twin of ``minhash_lsh_pairs_frames``' downstream over
    a (doc_id, sh, n_sh) shingle view — identical seeded-min
    signatures, band hashing (xxhash64 over the r signature longs,
    seed-order preserved), candidate distinct and exact-Jaccard
    verification; agreement is pytest-pinned and must stay in
    lockstep with the frames form."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    t = f"{threshold!r}D"
    # explode + GROUP BY signatures — REVERTED to this form in the
    # r12 opt round after an sf1 interleaved A/B. The r11 per-row
    # rewrite (array_min(transform(sh, s -> xxhash64(i, s))) × 32, no
    # exchange) computes identical minima, but every transform() is an
    # INTERPRETED higher-order function allocating a fresh array per
    # row: at sf1 (50k docs) the 32 interpreted passes measured
    # 7.0-7.9s against 3.6-4.4s for this codegen'd explode + hash-agg
    # in the same session (rows verified identical, 250,600 pairs);
    # at sf0.1 the two forms are within the per-stage floor of each
    # other (1.0-1.6 vs 1.3-1.5s interleaved) and at sf0.001 a wash.
    # The shuffle this form pays carries doc-grain PARTIAL minima
    # (map-side hash aggregation folds the exploded shingles before
    # the exchange — num_docs × 32 longs, not the shingle grain), so
    # it is also the right 100 TB shape: codegen'd per-element work,
    # bounded shuffle bytes, no interpreted lambda on the hot path.
    mins_agg = ",\n         ".join(
        f"MIN(xxhash64({i}, shingle)) AS h{i}" for i in range(num_hashes)
    )
    band_structs = ",\n      ".join(
        "struct({i} AS band, xxhash64({cols}) AS band_hash)".format(
            i=i, cols=", ".join(f"h{i * r + j}" for j in range(r))
        )
        for i in range(bands)
    )
    return f"""
WITH __mh_ex AS (
  SELECT doc_id, shingle FROM {docs_view} LATERAL VIEW explode(sh) __mhx AS shingle
), __mh_sig AS (
  SELECT doc_id,
         {mins_agg}
  FROM __mh_ex GROUP BY doc_id
), __mh_band AS (
  SELECT doc_id, b.band AS band, b.band_hash AS band_hash
  FROM __mh_sig
  LATERAL VIEW explode(array(
      {band_structs})) __mhb AS b
), __mh_cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM __mh_band a JOIN __mh_band b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
), __mh_va AS (
  SELECT doc_id AS id_a, sh AS sh_a, n_sh AS n_a FROM {docs_view}
), __mh_vb AS (
  SELECT doc_id AS id_b, sh AS sh_b, n_sh AS n_b FROM {docs_view}
)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE) AS jaccard
  FROM (
    SELECT id_a, id_b, n_a, n_b, size(array_intersect(sh_a, sh_b)) AS inter
    FROM __mh_cand JOIN __mh_va USING (id_a) JOIN __mh_vb USING (id_b)
  )
) WHERE jaccard >= {t}
"""


def minhash_lsh_pairs_frames(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash→LSH candidate generation + exact-Jaccard verification.
    Reference DataFrame form of ``minhash_lsh_pairs`` (the hot path
    runs the SQL twin); kept for the lockstep agreement test.

    Bands of r = num_hashes/bands rows; docs colliding in ≥1 band are
    candidates (P[collision] = 1-(1-s^r)^b). Verification recomputes
    EXACT Jaccard on candidates only, so false positives are filtered
    and the output contains no similarity estimates.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    docs_cached = _doc_shingles_cached(df, text_col, id_col, n)
    # explode + groupBy signatures — lockstep twin of the SQL form's
    # r12 codegen'd shape (see minhash_lsh_pairs_sql for the sf1 A/B
    # that reverted the r11 per-row transform() form): identical hash
    # values and minima
    ex = docs_cached.select("doc_id", F.explode("sh").alias("shingle"))
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    ).select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(*[F.col("signature")[i * r + j] for j in range(r)]).alias(
                            "band_hash"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    a, b = band_rows.alias("a"), band_rows.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # NO hashed pre-filter here, deliberately (unlike
    # ngram_jaccard_pairs): banding already filters to a near-precise
    # candidate set (256 candidates at sf0.1 where the prefix index
    # passes 80k), so the extra tier would be pure overhead
    da = docs_cached.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("n_a")
    )
    db = docs_cached.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("n_b")
    )
    verified = (
        candidates.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash over the token bag: bit_i = sign of Σ ±1 votes
    from xxhash64(token) bit i. Returned as a signed long.

    The hash is materialized ONCE per token before the aggregation
    (an expression inside 64 agg functions is evaluated 64×/row), the
    ±1 vote sums are rewritten as plain bit sums (sign(Σ±1) > 0 ⇔
    2·ones > n), and each SUM lane-packs TWO bit counters into one
    long (32-bit lanes): 33 aggregate buffers instead of 65 halves
    both the agg state and the generated-code size — measured 4.3s →
    2.6s at sf0.1, bit-identical signatures (parity-tested). Lane
    overflow needs 2³² same-bit tokens in one document — not a real
    bound."""
    assert bits % 2 == 0
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("h"))

    def packed(j: int):
        lanes = None
        for m in range(2):
            bit = F.shiftright(F.col("h"), j * 2 + m).bitwiseAND(F.lit(1))
            t = F.shiftleft(bit, m * 32)
            lanes = t if lanes is None else lanes + t
        return F.sum(lanes).alias(f"p{j}")

    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"), *[packed(j) for j in range(bits // 2)]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        j, m = i // 2, i % 2
        ones = F.shiftright(F.col(f"p{j}"), m * 32).bitwiseAND(F.lit(0xFFFFFFFF))
        sig = sig.bitwiseOR(
            F.when(ones * 2 > F.col("n_tok"), F.shiftleft(F.lit(1).cast("long"), i))
            .otherwise(F.lit(0).cast("long"))
        )
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole on 4×16-bit chunks (any
    pair with hamming ≤ 3 must share a chunk), verified by exact
    popcount of XOR."""
    sig = simhash(df, text_col, id_col)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _simhash_chunk_ctes(src: str, id_col: str, text_col: str, bits: int) -> str:
    """The shared CTE text producing the pigeonhole chunk relation
    ``__shc`` (doc_id, simhash, chunk, chunk_val) — ONE definition of
    the lane-packed signature SQL so the full twin and the cached form
    below cannot drift."""
    assert bits % 2 == 0
    lanes = ",\n         ".join(
        f"SUM((shiftright(h, {j * 2}) & 1) + shiftleft(shiftright(h, {j * 2 + 1}) & 1, 32)) AS p{j}"
        for j in range(bits // 2)
    )
    sig_terms = " |\n         ".join(
        f"(CASE WHEN (shiftright(p{i // 2}, {(i % 2) * 32}) & 4294967295) * 2 > n_tok"
        f" THEN shiftleft(CAST(1 AS BIGINT), {i}) ELSE 0L END)"
        for i in range(bits)
    )
    n_chunks = bits // 16
    return f"""__sht AS (
  SELECT {id_col} AS doc_id, xxhash64(tok) AS h
  FROM {src}
  LATERAL VIEW explode(CASE WHEN length(trim({text_col})) = 0
                            THEN CAST(array() AS ARRAY<STRING>)
                            ELSE split(trim({text_col}), '\\\\s+') END) __shx AS tok
), __sha AS (
  SELECT doc_id, COUNT(*) AS n_tok,
         {lanes}
  FROM __sht GROUP BY doc_id
), __shs AS (
  SELECT doc_id,
         {sig_terms} AS simhash
  FROM __sha
), __shc AS (
  SELECT doc_id, simhash, chunk,
         shiftrightunsigned(simhash, chunk * 16) & 65535 AS chunk_val
  FROM __shs
  LATERAL VIEW explode(sequence(0, {n_chunks - 1})) __shk AS chunk
)"""


def simhash_pairs_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
) -> str:
    """SQL-text twin of ``simhash`` + ``simhash_near_pairs`` for
    one-analysis-pass consumers (the DataFrame chain builds the
    64-term signature expression through ~400 py4j Column calls —
    measured 1.5s of construction per call at bench scale, the same
    analysis-cost trap winnow_sql_kernel exists for). Identical
    lane-packed aggregation, signature reassembly, pigeonhole chunk
    join, and exact popcount verify; agreement is pytest-pinned.

    NOTE: Catalyst INLINES the ``__shc`` CTE into both sides of the
    pair self-join, so this single statement computes the signature
    aggregation twice per action — ``simhash_pairs_cached`` below is
    the benched form that materializes the chunk relation once."""
    return f"""
WITH {_simhash_chunk_ctes(src, id_col, text_col, bits)}, __shp AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM __shc a JOIN __shc b
    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(sh_a ^ sh_b) AS hamming
FROM __shp WHERE bit_count(sh_a ^ sh_b) <= {max_hamming}
"""


# most-recent persisted simhash chunk relation; same bounded-leak
# discipline as _live_shingle_cache above
_live_chunk_cache: list[DataFrame] = []


def simhash_pairs_cached(
    spark,
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """One-signature-pass form of ``simhash_pairs_sql`` (r11 opt
    round): the single-statement twin's chunk CTE is inlined by
    Catalyst into BOTH sides of the pigeonhole self-join, so each
    action ran the token explode + 33-lane aggregation + signature
    reassembly twice. Here the chunk relation (4 rows/doc of four
    longs — the signature index, tiny next to the corpus text) is
    built by ONE spark.sql statement (same analysis-cost rationale as
    the twin) and persisted, so the self-join's two sides read the
    cache; the join/verify tail is a handful of py4j calls. persist
    (not localCheckpoint) keeps the lineage for the lost-executor
    posture. Row equality with the twin is pytest-pinned.

    Cache lifetime mirrors _doc_shingles_cached: each call evicts the
    previous chunk cache (bounded to ONE live entry), so a long-lived
    session serving varying sources doesn't accumulate persisted chunk
    relations and driver-side plan references."""
    while _live_chunk_cache:
        try:
            _live_chunk_cache.pop().unpersist()
        except Exception:
            pass  # session already stopped
    chunks = spark.sql(
        f"WITH {_simhash_chunk_ctes(src, id_col, text_col, bits)} "
        "SELECT doc_id, simhash, chunk, chunk_val FROM __shc"
    ).persist()
    _live_chunk_cache.append(chunks)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def winnow_fingerprint_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken MOSS
    scheme, public algorithm) as (doc_id, fp) rows: hash every token
    k-gram, keep the MINIMUM hash of each ``window`` consecutive
    k-grams, emit the distinct selected hashes.

    Guarantee: any shared token run of length ≥ k + window - 1 between
    two documents yields at least one shared fingerprint — the basis
    for local (substring-level) near-dup detection, which
    whole-document md5 (``fingerprint``) cannot see.

    Shape: the staged-projection per-row kernel
    (``winnow_fps_columns`` — NOT the single-expression
    ``winnow_fps_array``, whose cost warning applies) + explode —
    winnowing is a PER-DOCUMENT computation, so the shuffle-free form
    is the right one: no doc_id shuffle, no window sort,
    embarrassingly parallel at any scale. (An earlier posexplode +
    lead() + sliding-window-min form paid a full shuffle+sort of
    every token row for work that never crosses document boundaries;
    measured 1.6s vs 0.7s at sf0.1.) The only caveat is input
    parallelism — a small parquet file arrives as one split and would
    serialize the CPU-bound kernel on one core, hence
    ``spread_for_kernel``. Hash is the 56-bit md5 prefix (see
    functions.text.winnow_hash) for DuckDB oracle parity.
    """
    src = spread_for_kernel(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__wtext"))
    )
    staged = winnow_fps_columns(src, "__wtext", k=k, window=window, out="__fps")
    # explode_outer + post-filter, NOT a plain explode of the bare
    # attribute: InferFiltersFromGenerate turns explode(attr) into a
    # pushed-down `size(attr) > 0` filter, and predicate pushdown
    # substitutes the alias chain — the whole tokenize→hash pipeline
    # re-evaluated in a Filter with per-element token splits (measured
    # quadratic hang). The rule does not apply to outer generate, and
    # the null-filter on the OUTPUT attribute cannot push below the
    # Generate. fps are non-null longs by construction, so dropping
    # null fp rows is exactly "skip empty-fingerprint docs".
    return staged.select("doc_id", F.explode_outer("__fps").alias("fp")).filter(
        F.col("fp").isNotNull()
    )


def kernel_spread_hint(spark, sf_dir: str, table: str = "documents") -> str:
    """The conditional ``/*+ REPARTITION(n) */`` hint for SQL-string
    kernels, sized WITHOUT touching Spark plans: table bytes come from
    os.stat (readers.table_size_bytes), the scan's expected split
    count from ``spark.sql.files.maxPartitionBytes``, and the kernel
    width from the same ~32 KB/task rule as kernel_spread_width. The
    plan-based probe (optimizer stats + .rdd partition count) costs a
    measured ~0.2s per query CONSTRUCTION at bench scale; this is
    O(#files) stat calls. Empty string when the scan is already at
    least as wide as the kernel wants — at 100 TB the scan has
    thousands of splits and the hint (a full-corpus shuffle) must not
    fire."""
    width = kernel_spread_width_from_files(spark, sf_dir, table)
    return f"/*+ REPARTITION({width}) */" if width else ""


def kernel_spread_width_from_files(spark, sf_dir: str, table: str = "documents") -> int:
    """File-bytes form of the kernel-spread width calculation shared
    by kernel_spread_hint (SQL kernels) and DataFrame kernels over
    testdata-layout tables. Returns 0 when the scan is expected to be
    at least as wide as the kernel wants (no repartition — at 100 TB
    the scan has thousands of splits and this is always 0)."""
    from sync_spark.sources.readers import table_size_bytes

    sc = spark.sparkContext
    cap = sc.defaultParallelism
    size = table_size_bytes(sf_dir, table)
    if size is None:
        # Unknown layout (remote storage, non-.parquet names): NO hint.
        # Assuming "narrow" here would emit an unconditional
        # REPARTITION(cap) that at scale forces a full-corpus shuffle
        # and can even SHRINK a thousands-split scan down to
        # defaultParallelism — the exact hazard the conditional exists
        # to prevent. A missed spread on a genuinely-narrow toy input
        # costs one slow kernel; a forced shuffle at 100 TB costs the
        # job.
        return 0
    width = max(2, min(cap, size // _KERNEL_CHUNK_BYTES + 1))
    max_split = _parse_byte_size(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    est_splits = max(1, (size + max_split - 1) // max_split)
    return width if est_splits < width else 0


def _parse_byte_size(value: str, default: int = 134217728) -> int:
    """Spark byte-size conf parser: bare number = bytes, with the
    standard case-insensitive k/m/g/t (optionally + 'b') suffixes
    ('128m', '128MB', '134217728b'). Falls back to ``default`` on
    anything unparseable rather than raising at query-construction
    time."""
    try:
        s = str(value).strip().lower()
        if s.endswith("b"):
            s = s[:-1]
        mult = 1
        if s and s[-1] in "kmgt":
            mult = 1024 ** ("kmgt".index(s[-1]) + 1)
            s = s[:-1]
        return int(s) * mult
    except (ValueError, AttributeError):
        return default


def winnow_sql_kernel(
    id_col: str, text_col: str, src: str, k: int = 5, window: int = 4,
    prefix: str = "__w",
) -> str:
    """Spark-SQL text form of ``winnow_fps_columns`` + the
    explode_outer row expansion — the IDENTICAL staged projections
    (same CollapseProject discipline, same short-doc guards, same
    56-bit md5 prefix hash), emitted as CTE text so a hot consumer can
    run its WHOLE pipeline through one ``spark.sql`` analysis pass.
    Rationale: each DataFrame transformation re-analyzes the
    accumulated tree, and the ~10-call winnow chain costs ~0.4s of
    Python/analysis per query construction at bench scale (measured
    on d_source_overlap r6) — pure constant-factor, but it is half
    the gap to the DuckDB oracle on sub-second queries.

    Returns CTEs ``{prefix}k1..{prefix}k4, {prefix}fp`` (default
    ``__wk1..__wfp``); the caller composes ``WITH <its own src CTE>,
    {this}, ...`` and reads (``id_col``, fp) rows from
    ``{prefix}fp``, or per-doc fps ARRAYS from ``{prefix}k4``. Pass a
    distinct ``prefix`` to instantiate the kernel twice in one
    statement (corpus + benchmark sides of a decontamination). Keep in
    lockstep with winnow_fps_columns (test_plan_quality pins
    agreement)."""
    grams = ", ".join(f"element_at(wtoks, i + {j})" for j in range(k))
    zips = "hs"
    for lvl in range(1, window):
        zips = (
            f"zip_with({zips}, slice(hs, {lvl + 1}, "
            f"greatest(size(hs) - {lvl}, 1)), (x, y) -> least(x, y))"
        )
    return f"""{prefix}k1 AS (
  SELECT {id_col},
         CASE WHEN length(trim({text_col})) = 0 THEN CAST(array() AS ARRAY<STRING>)
              ELSE split(trim({text_col}), '\\\\s+') END AS wtoks
  FROM {src}
), {prefix}k2 AS (
  SELECT {id_col}, wtoks, size(wtoks) - {k - 1} AS ng FROM {prefix}k1
), {prefix}k3 AS (
  SELECT {id_col},
         CASE WHEN ng < 1 THEN CAST(array() AS ARRAY<BIGINT>)
              ELSE transform(sequence(1, greatest(ng, 1)),
                   i -> CAST(conv(substring(md5(CAST(concat_ws(' ', {grams}) AS BINARY)), 1, 14), 16, 10) AS BIGINT)) END AS hs
  FROM {prefix}k2
), {prefix}k4 AS (
  SELECT {id_col},
         CASE WHEN size(hs) < 1 THEN CAST(array() AS ARRAY<BIGINT>)
              ELSE array_distinct(slice({zips}, 1, greatest(size(hs) - {window - 1}, 1))) END AS fps
  FROM {prefix}k3
), {prefix}fp AS (
  SELECT {id_col}, fp
  FROM {prefix}k4 LATERAL VIEW OUTER explode(fps) {prefix}x AS fp
  WHERE fp IS NOT NULL
)"""


def winnow_fps_columns(
    df: DataFrame,
    text_col: str,
    k: int = 5,
    window: int = 4,
    out: str = "fps",
) -> DataFrame:
    """Per-row winnowing fingerprint set as an ``out`` array column,
    built through MATERIALIZED projection stages. This is the one
    linear-cost form: a lambda body re-evaluates its non-argument
    subexpressions PER ELEMENT, so the one-big-expression variant
    (``winnow_fps_array``) recomputes the full md5 gram array once per
    window position — quadratic per document, measured as a hang at
    sf0.1. Bound attribute references keep it linear, and every op is
    a narrow projection, so the SAME builder serves batch frames and
    STREAMING frames (the curation pipeline's decontamination probe).

    Rows with zero grams (docs shorter than k tokens) keep an EMPTY
    ``out`` array — no row loss, callers filter or explode as they
    need."""
    from sync_spark.functions.text import staged_expr, tokens_named, winnow_hash

    helper_ng, helper_hs = f"__{out}_ng", f"__{out}_hs"
    t = df.withColumn("__wtoks", tokens_named(text_col)).withColumn(
        helper_ng, F.size("__wtoks") - F.lit(k - 1)
    )

    # fused gram→hash transform: one array materialization, not two.
    # sequence() is guarded by when(): a bare sequence(1, ng) with
    # ng <= 0 generates a DESCENDING sequence (the short-doc hazard)
    def _hs_expr() -> Column:
        return F.when(F.col(helper_ng) < 1, F.array().cast("array<bigint>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.col(helper_ng), F.lit(1))),
                lambda i: winnow_hash(
                    F.concat_ws(
                        " ", *[F.element_at(F.col("__wtoks"), i + j) for j in range(k)]
                    )
                ),
            )
        )

    # both heavy expressions read only the fixed helper attributes, so
    # they memoize per (out, k, window) — see staged_expr (r11 opt)
    t = t.withColumn(helper_hs, staged_expr(f"winnow.hs({out},{k})", _hs_expr))

    # Sliding window-min WITHOUT referencing the hash column inside a
    # lambda body: wins[p] = least(hs[p], ..., hs[p+window-1]) built as
    # a zip_with chain against shifted slices. Every lambda here reads
    # ONLY its own arguments, so even if the optimizer collapses the
    # projections and inlines the hash transform into each top-level
    # reference, the worst case is `window` whole-array evaluations
    # per ROW — linear. (The transform(sequence, p -> array_min(
    # slice(hs, p, w))) form looks equivalent but references hs inside
    # the lambda; CollapseProject inlines the single-use transform into
    # the body, and an inlined subexpression re-evaluates PER ELEMENT —
    # measured as an 80s-at-sf0.001 quadratic blow-up.)
    def _out_expr() -> Column:
        hs = F.col(helper_hs)
        acc = hs
        for j in range(1, window):
            # start beyond the array end yields an empty slice; zip_with
            # null-pads the shorter side and least() skips nulls, which IS
            # the truncated-tail-window rule (short docs keep their
            # global min at position 1)
            shifted = F.slice(hs, j + 1, F.greatest(F.size(hs) - j, F.lit(1)))
            acc = F.zip_with(acc, shifted, lambda a, b: F.least(a, b))
        nw = F.greatest(F.size(hs) - F.lit(window - 1), F.lit(1))
        # array_distinct in-row — no dedupe shuffle
        return F.when(F.size(hs) < 1, F.array().cast("array<bigint>")).otherwise(
            F.array_distinct(F.slice(acc, 1, nw))
        )

    t = t.withColumn(out, staged_expr(f"winnow.out({out},{k},{window})", _out_expr))
    return t.drop("__wtoks", helper_ng, helper_hs)


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_posting: int = 100,
) -> DataFrame:
    """Local near-dup candidate pairs: documents sharing ≥
    ``min_shared`` winnowing fingerprints, with the shared count.
    The MOSS shape: inverted index on fingerprint (boilerplate prints
    appearing in > ``max_posting`` docs dropped — same hot-shingle
    discipline as ngram_jaccard), pairs generated IN-ROW from each
    posting list (bounded ≤ max_posting, so the per-row expansion is
    ≤ max_posting²/2 structs) — one shuffle to build postings, one to
    count pairs, no fingerprint self-join. Σ posting² work, never n²;
    detects SHARED RUNS (≥ k + window - 1 tokens) rather than
    whole-document similarity."""
    fps = winnow_fingerprint_rows(df, text_col, id_col, k=k, window=window)
    postings = fps.groupBy("fp").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    bounded = postings.filter(
        (F.size("ids") >= 2) & (F.size("ids") <= max_posting)
    )
    # ids is a bound column, so the nested lambda's slice reads the
    # materialized array — O(posting²) struct builds, nothing more
    pairs_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, max_posting),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        bounded.select(F.explode(pairs_arr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def winnow_pairs_sql(
    view: str,
    spread_hint: str = "",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_posting: int = 100,
) -> str:
    """SQL-text twin of ``winnow_pairs`` over a registered (doc_id,
    text) view — identical MOSS shape (winnow_sql_kernel + posting
    lists + in-row i<j pair expansion), emitted as one statement so a
    hot consumer pays one analysis pass (test_dedup pins agreement
    with the DataFrame form). Keep in lockstep with winnow_pairs."""
    kernel = winnow_sql_kernel("doc_id", "text", "__wp_src", k=k, window=window)
    return f"""
WITH __wp_src AS (
  SELECT {spread_hint} doc_id, text FROM {view}
), {kernel}, __wp_postings AS (
  SELECT sort_array(collect_list(doc_id)) AS ids FROM __wfp GROUP BY fp
), __wp_bounded AS (
  SELECT ids FROM __wp_postings WHERE size(ids) BETWEEN 2 AND {max_posting}
), __wp_pairs AS (
  SELECT p.id_a AS id_a, p.id_b AS id_b
  FROM __wp_bounded LATERAL VIEW OUTER explode(
    flatten(transform(ids, (x, i) ->
      transform(slice(ids, i + 2, {max_posting}),
                y -> struct(x AS id_a, y AS id_b))))) __e AS p
  WHERE p IS NOT NULL
)
SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM __wp_pairs GROUP BY id_a, id_b HAVING COUNT(*) >= {min_shared}
"""


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share
    ≥ ``min_shared`` winnowing fingerprints with ANY benchmark
    document — i.e. contain a verbatim token run of ≥ k + window - 1
    tokens from the eval set (the standard n-gram-overlap
    decontamination criterion for training corpora).

    Returns (doc_id, n_hits, contaminated): every corpus doc, with the
    count of distinct (fingerprint, benchmark-doc) collisions.

    Scale: both sides reduce to fingerprint rows (winnowing keeps
    ~1/window of the k-grams); the probe is a broadcast-size join when
    the benchmark is small (the usual case — eval sets are MBs against
    a 100 TB corpus), falling back to a shuffle join on fp otherwise —
    Spark picks via size estimate, no operator change needed."""
    hits = decontaminate_hits(corpus, benchmark, text_col, id_col, k=k, window=window)
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )


def decontaminate_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """The collision aggregate behind ``decontaminate``: (doc_id,
    n_hits) for corpus docs with ≥1 (fingerprint, benchmark-doc)
    collision ONLY — no join back to the full corpus doc list. A
    composite that already carries every corpus doc (t_curate_corpus's
    flags frame) left-joins THIS instead of decontaminate's full
    output, saving one corpus scan."""
    cfp = winnow_fingerprint_rows(corpus, text_col, id_col, k=k, window=window)
    bfp = winnow_fingerprint_rows(benchmark, text_col, id_col, k=k, window=window).select(
        F.col("fp"), F.col("doc_id").alias("bench_id")
    )
    return (
        cfp.join(bfp, "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def decontaminate_hits_sql(
    corpus_src: str,
    bench_src: str,
    k: int = 5,
    window: int = 4,
    prefix: str = "__dh",
) -> str:
    """CTE-text twin of ``decontaminate_hits`` (r11, guide §4 — the
    two winnow Column chains plus their optimizer-stats/.rdd spread
    probes cost ~0.6s of per-call construction at bench scale; the
    SQL form is one analysis pass and the caller supplies a file-stat
    REPARTITION hint instead). Emits ``winnow_sql_kernel`` CTEs for
    both sides plus ``{prefix}hits`` (doc_id, n_hits BIGINT) counting
    (fingerprint, benchmark-doc) collisions per corpus doc — join
    multiplicities identical to the DataFrame form (per-doc fps are
    already distinct from the kernel). Keep in lockstep with
    decontaminate_hits (agreement-tested)."""
    ck = winnow_sql_kernel("doc_id", "text", corpus_src, k=k, window=window,
                           prefix=f"{prefix}c")
    bk = winnow_sql_kernel("doc_id", "text", bench_src, k=k, window=window,
                           prefix=f"{prefix}b")
    return f"""{ck}, {bk}, {prefix}hits AS (
  SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM {prefix}cfp c JOIN {prefix}bfp b ON c.fp = b.fp
  GROUP BY c.doc_id
)"""


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-SPAN removal (the RefinedWeb /
    exact-substring dedup criterion, approximated at token-k-gram
    granularity — public technique): a k-gram appearing in ≥
    ``min_docs`` distinct documents is a duplicated span; every doc
    EXCEPT the gram's canonical owner (min doc_id) drops the tokens
    covered by its occurrences. Unlike whole-doc dedup this rescues
    documents that merely EMBED boilerplate (license headers, nav
    text, quoted passages) — the unique remainder survives.

    Returns (doc_id, clean_text, n_kept, n_removed) for EVERY input
    document, clean_text preserving original token order.

    Shape (all Column-native, one pass, no UDFs):
    - posexplode tokens once; k-grams via k-1 lead() calls on the
      (doc_id, pos) window — linear, the winnowing discipline;
    - gram ownership: distinct (gram, doc) pairs → groupBy(gram) for
      (min owner, doc count) — the dominant shuffle, partial-agg
      combinable; boilerplate grams are exactly the hot keys AQE's
      skew join splits;
    - coverage: dup-start flags joined back at (doc, pos), then ONE
      sliding window max over [pos-k+1, pos] marks covered tokens
      (positions are dense, so the row frame IS the position frame);
    - reassembly: groupBy(doc) with order-restoring
      array_sort(collect_list(struct(pos, tok))) — per-doc data, the
      partition key is the doc id, skew-free.
    """
    from pyspark.sql.window import Window

    toks = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    tokp = toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w_ord) for j in range(1, k)]
    # materialize the gram BEFORE the completeness filter: window
    # expressions placed after the filter would be re-evaluated over
    # the FILTERED rows, where the trailing leads go null and
    # concat_ws silently emits short grams (the same trap
    # winnow_fingerprint_rows documents)
    grams = (
        tokp.withColumn("g", F.concat_ws(" ", *parts))
        .withColumn("last_part", parts[-1])
        .filter(F.col("last_part").isNotNull())
        .select("doc_id", "pos", "g")
    )
    owners = (
        grams.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.min("doc_id").alias("owner"), F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
    )
    dup_starts = (
        grams.join(owners, "g")
        .filter(F.col("doc_id") > F.col("owner"))
        .select("doc_id", "pos", F.lit(1).alias("dup"))
    )
    cover = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(k - 1), 0)
    kept = (
        tokp.join(dup_starts, ["doc_id", "pos"], "left")
        .withColumn("cov", F.max("dup").over(cover))
        .filter(F.col("cov").isNull())
    )
    clean = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    base = toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return base.join(clean, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
    )


def winnow_fps_array(text: F.Column, k: int = 5, window: int = 4) -> F.Column:
    """Per-ROW winnowing fingerprint set as ONE Column expression —
    the single-expression twin of ``winnow_fps_columns`` (same
    k-grams, same 56-bit hash, same short-doc rule; agreement asserted
    in tests).

    COST WARNING — use ``winnow_fps_columns`` on anything bigger than
    toy rows: because ``hs`` here is a subexpression and not a bound
    attribute, the outer transform's lambda re-evaluates the full
    gram-hash array once PER WINDOW POSITION — quadratic per document
    (measured as a multi-minute hang on the sf0.1 corpus). This form
    survives only as the agreement-test reference and for expression
    positions where a projection stage is impossible."""
    from sync_spark.functions.text import tokens as _tokens
    from sync_spark.functions.text import winnow_hash

    toks = _tokens(text)
    n_grams = F.size(toks) - k + 1
    hs = F.transform(gram_array(toks, k), winnow_hash)
    # n_picked is clamped >= 1 already, so a bare sequence is safe
    # here (no descending-sequence hazard at this site)
    n_picked = F.greatest(F.size(hs) - window + 1, F.lit(1))
    picks = F.sequence(F.lit(1), n_picked)
    wins = F.transform(picks, lambda p: F.array_min(F.slice(hs, p, window)))
    # empty doc: no grams → empty fingerprint set
    return F.when(n_grams < 1, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(wins)
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination: broadcast-bitmap probe
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 20  # 1 Mi bits = 128 KB bitmap; 2^20 = one 5-hex-digit slice
BLOOM_K_HASH = 4


def _bloom_hash_sql(h_expr: str, j_expr: str) -> str:
    """SQL text for one Bloom bit position from a PRECOMPUTED md5 hex
    digest: position j = hex digits [5j, 5j+5) parsed base-16 — four
    disjoint 20-bit slices of one digest, and 2^20 = m exactly, so no
    modulo is even needed. One md5 per fingerprint instead of k
    (partitioned hashing — the standard Bloom practice of splitting a
    single wide digest into k index fields; Kirsch & Mitzenmacher 2006
    analyze why derived positions lose nothing). The slices are plain
    substrings, so a DuckDB oracle reproduces every position — and
    therefore every false positive — exactly.

    SQL text, not Column composition, deliberately: the kernels below
    sit inside higher-order lambdas, and SQL ``shiftleft`` accepts an
    EXPRESSION shift amount where the Python wrapper takes only a
    literal; building the same tree from Python Columns needs a
    64-element power-of-two literal array plus hundreds of py4j round
    trips — measured ~1.4s of per-call plan-construction latency,
    3× the query's actual execution. One F.expr call is one round
    trip, and bench timings include construction."""
    return (
        f"CAST(conv(substring({h_expr}, 1 + 5 * {j_expr}, 5), 16, 10) AS BIGINT)"
    )


def bloom_bitmap(
    fps: DataFrame,
    fp_col: str = "fp",
    m_bits: int = BLOOM_M_BITS,
    k_hash: int = BLOOM_K_HASH,
) -> DataFrame:
    """Fold a fingerprint column into a ONE-ROW Bloom bitmap
    (``bloom: map<long,long>`` of word-index → 64-bit word, words with
    no set bits omitted), fully distributed: bit positions explode
    from the fp rows, per-word masks combine with the map-side-partial
    ``bit_or`` aggregate (the word id is the shuffle key — ≤ m/64
    distinct keys, uniform), and the final map assembles via
    map_from_entries(collect_list) in a single-group agg —
    constant-size (≤ m/64 entries, 128 KB at the default sizing),
    never data-sized. The sparse-map form skips the dense
    range-densify join an array bitmap would need (an absent word IS
    zero, via coalesce at probe time). No driver collect anywhere; the
    result row is made for ``F.broadcast(...).crossJoin`` probing."""
    pos = fps.select(F.md5(F.col(fp_col).cast("string")).alias("h")).select(
        F.expr(
            f"explode(transform(sequence(0, {k_hash - 1}), "
            f"j -> {_bloom_hash_sql('h', 'j')}))"
        ).alias("pos")
    )
    word_bits = (
        pos.select(
            F.expr("pos DIV 64").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    return word_bits.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bloom")
    )


def bloom_bitmap_sql(
    fp_src: str, fp_col: str = "fp", k_hash: int = BLOOM_K_HASH, prefix: str = "__bm"
) -> str:
    """SQL-text twin of ``bloom_bitmap`` for one-analysis-pass
    pipelines: CTEs ``{prefix}pos, {prefix}words, {prefix}bitmap``
    folding (``fp_col``) rows from ``fp_src`` into the same one-row
    sparse-map bitmap (word → 64-bit mask). Keep in lockstep with
    bloom_bitmap (agreement-tested)."""
    return f"""{prefix}pos AS (
  SELECT explode(transform(sequence(0, {k_hash - 1}), j -> {_bloom_hash_sql('h', 'j')})) AS pos
  FROM (SELECT md5(CAST({fp_col} AS STRING)) AS h FROM {fp_src})
), {prefix}words AS (
  SELECT pos DIV 64 AS word, bit_or(shiftleft(1L, CAST(pos % 64 AS INT))) AS mask
  FROM {prefix}pos GROUP BY pos DIV 64
), {prefix}bitmap AS (
  SELECT map_from_entries(collect_list(struct(word, mask))) AS bloom FROM {prefix}words
)"""


def bloom_probe_nmaybe_sql(fps_col: str, k_hash: int = BLOOM_K_HASH) -> str:
    """SQL text counting how many DISTINCT fingerprints in the
    ``fps_col`` array have every Bloom bit set in the in-scope
    ``bloom`` map attribute — the probe expression shared by
    bloom_decontaminate (DataFrame form) and the SQL pipeline twin.
    One F.expr = one analysis pass (see _bloom_hash_sql); md5 runs
    exactly ONCE PER FINGERPRINT (the inner forall only slices the
    already-computed digest `h`)."""
    return (
        f"CAST(size(filter("
        f"transform(array_distinct({fps_col}), fp -> md5(CAST(fp AS STRING))), "
        f"h -> forall(transform(sequence(0, {k_hash - 1}), j -> {_bloom_hash_sql('h', 'j')}), "
        f"p -> (coalesce(element_at(bloom, p DIV 64), 0L) & shiftleft(1L, CAST(p % 64 AS INT))) != 0"
        f"))) AS BIGINT)"
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
    m_bits: int = BLOOM_M_BITS,
    k_hash: int = BLOOM_K_HASH,
    spread_width: int | None = None,
) -> DataFrame:
    """Benchmark decontamination through a broadcast Bloom filter —
    the 100 TB form of ``decontaminate``: instead of JOINING corpus
    fingerprints against benchmark fingerprints (a shuffle, or a
    broadcast of the full eval fp SET), the benchmark folds into a
    fixed 128 KB bitmap and every corpus document probes it IN-ROW —
    the corpus side is a pure map over the scan, no shuffle, no
    per-executor hash set, and the bitmap cost is independent of how
    large the eval suite grows. One-sided error only: a shared
    fingerprint ALWAYS hits (no false negatives — the guarantee
    decontamination must not lose); hash collisions can flag extra
    docs at the documented rate (1−e^{−kn/m})^k, ~1e-5 at the default
    sizing for 60k benchmark fps — the standard Bloom trade
    (conservative: never leaks contamination, occasionally
    over-quarantines).

    Returns (doc_id, n_maybe, flagged): per corpus doc, the count of
    its distinct fingerprints whose k positions are all set, and the
    ≥ ``min_shared`` flag.

    The probe is deterministic (md5-derived positions), so the exact
    bit pattern — including the false positives — is reproducible in
    the DuckDB oracle via position-set membership (bit b set ≡ b ∈
    distinct benchmark positions): the registry query hash-matches
    end to end, no approximation gate needed."""
    # benchmark-side kernel WITHOUT spread_for_kernel, and WITHOUT a
    # .distinct() on the fps: eval sets are small by definition (MBs
    # against the corpus), so the repartition wave costs more than the
    # single-split kernel it would parallelize, and bit_or is
    # idempotent — duplicate fingerprints re-set the same bits for
    # free. The PROBE side below keeps the spread: that's the corpus.
    bsrc = benchmark.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__wtext")
    )
    bstaged = winnow_fps_columns(bsrc, "__wtext", k=k, window=window, out="__fps")
    bfp = bstaged.select(F.explode_outer("__fps").alias("fp")).filter(
        F.col("fp").isNotNull()
    )
    bitmap = bloom_bitmap(bfp, "fp", m_bits=m_bits, k_hash=k_hash)

    src = spread_for_kernel(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__btext")),
        width=spread_width,
    )
    staged = winnow_fps_columns(src, "__btext", k=k, window=window, out="__fps")
    probed = staged.crossJoin(F.broadcast(bitmap))

    # shared probe text (bloom_probe_nmaybe_sql): map each distinct fp
    # to its k-position array, keep those with every bit set. Lambda
    # bodies read only their own args plus the broadcast `bloom`
    # attribute — nothing re-evaluates per element.
    return probed.select(
        "doc_id", F.expr(bloom_probe_nmaybe_sql("__fps", k_hash)).alias("n_maybe")
    ).withColumn("flagged", F.col("n_maybe") >= min_shared)
