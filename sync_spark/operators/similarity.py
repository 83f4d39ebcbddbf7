"""Similarity search over embedding columns (SURVEY.md §7 Phase 4):
brute-force cosine top-k (exact baseline) and an LSH-bucketed ANN
variant (the scale path).

Numeric discipline: embeddings are float32; a double dot product's
value depends on summation order, which differs between engines and
even between Spark partitionings. For the oracle-checked exact
operator we quantize each component to int64 (×10^6) so dot products
and norms are EXACT integers (order-free), then do one deterministic
double division+sqrt at the end. The quantization error (~1e-6
relative) is far below any ranking that matters. The exact and LSH
plans stay fully JVM-side; the IVF variant deliberately uses ONE
Arrow-batched numpy kernel for cell assignment (a dense distance
matrix is the case where vectorized Python beats Column expressions).

Scale notes: brute-force is a broadcast of the (small) query set
against the corpus — no shuffle on the corpus at all; the LSH variant
buckets the corpus by random-hyperplane sign bits so each query only
scans its bucket (candidates shrink ~2^planes), trading recall for a
~100× smaller scan at 100 TB.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd  # module scope: pandas_udf resolves string type
# hints (from __future__ annotations) against the defining module
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 1_000_000


def _quantize(col: Column) -> Column:
    # cast float→double BEFORE the multiply: float×int arithmetic
    # differs between engines, double×int does not
    return F.transform(col, lambda x: F.round(x.cast("double") * SCALE).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


# memoized named forms (r11 opt round): every call site passes a plain
# named column, and each HOF build costs ~36 py4j commands — see
# functions.text.staged_expr (same tree, same math, built once per
# context)
def _quantize_named(name: str) -> Column:
    from sync_spark.functions.text import staged_expr

    return staged_expr(f"sim.quantize({name})", lambda: _quantize(F.col(name)))


def _norm2_named(name: str) -> Column:
    from sync_spark.functions.text import staged_expr

    return staged_expr(f"sim.norm2({name})", lambda: _norm2(F.col(name)))


def _dot_named(a: str, b: str) -> Column:
    from sync_spark.functions.text import staged_expr

    return staged_expr(f"sim.dot({a},{b})", lambda: _dot(F.col(a), F.col(b)))


def _scored_topk(c, q, k: int, on=None, dedup=False):
    """Shared scoring tail: join corpus(c: neighbor_id, cv, cn) with
    broadcast queries(q: query_id, qv, qn), exact quantized cosine,
    per-query top-k with id tiebreak. One definition so the rounding/
    tiebreak/quantization discipline can't drift between the exact,
    LSH, and IVF variants. ``dedup`` collapses candidate pairs that
    collide in more than one hash table (multi-table LSH) so the rank
    window never sees duplicates."""
    joined = c.crossJoin(F.broadcast(q)) if on is None else c.join(F.broadcast(q), on)
    scored = joined.filter(F.col("neighbor_id") != F.col("query_id")).withColumn(
        "cosine",
        _dot_named("qv", "cv").cast("double")
        / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double"))),
    )
    if dedup:
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast queries × corpus scan,
    per-query window top-k. Ties broken by corpus id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantize_named(vec_col).alias("qv")
    ).withColumn("qn", _norm2_named("qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _quantize_named(vec_col).alias("cv")
    ).withColumn("cn", _norm2_named("cv"))
    return _scored_topk(c, q, k)


def cosine_topk_kernel(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k through the dense int64 matmul kernel — the
    throughput form of ``cosine_topk`` for a BOUNDED query set (the
    queries collect driver-side and ride into the kernel as a numpy
    closure; the baseline broadcasts them to an interpreted per-pair
    HOF dot, ~40M interpreted ops for 200 queries × 1k vectors).
    Values are bit-identical to the baseline: the kernel emits exact
    integer (dot, qn, cn) and the ONE double sqrt/divide/round happens
    JVM-side (_emit discipline); per-batch partial top-k inside the
    kernel orders by the same IEEE double cosine with the same
    neighbor-id tiebreak, so only ≤ k·|queries| rows per batch cross
    Arrow — at 10⁹ corpus vectors the output is k·|queries| per
    partition, never corpus-sized. Zero-norm vectors are excluded on
    BOTH sides by the kernel's finite-cosine filter (the baseline
    ranks a zero-norm corpus vector's NaN cosine
    nondeterministically, and emits NULL-cosine rows ranked last for
    a zero-norm QUERY or when fewer than k finite candidates exist —
    junk either way, but outputs diverge there; fixture corpora and
    queries have no zero-norm vectors)."""
    import pandas as pd
    from pyspark.sql.window import Window as _W

    # quantize JVM-SIDE on both sides (the shared _quantize Column —
    # Spark round is HALF_UP where np.round is HALF_EVEN; re-rounding
    # in numpy could flip an exact-.5 component)
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), _quantize_named(vec_col).alias("qv"))
        .collect()
    )
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, cosine double"
        )
    Q = np.asarray([list(r["qv"]) for r in qrows], dtype=np.int64)
    qids = np.asarray([int(r[0]) for r in qrows], dtype=np.int64)
    qn = (Q.astype(np.float64) ** 2).sum(axis=1)  # exact: entries ≤ 1e12 ≪ 2^53
    kk_req = k

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf["vid"].to_numpy(dtype=np.int64)
            X = np.asarray(list(pdf["qv"]), dtype=np.int64)
            cn = (X.astype(np.float64) ** 2).sum(axis=1)
            D = _exact_dot_matrix(X, Q)  # exact int64 dots
            with np.errstate(divide="ignore", invalid="ignore"):
                C = D / (np.sqrt(cn)[:, None] * np.sqrt(qn)[None, :])
            C[cn == 0, :] = -np.inf
            C[cids[:, None] == qids[None, :]] = -np.inf  # self-pairs
            kk = min(kk_req, len(cids))
            out_q, out_n, out_d, out_cn = [], [], [], []
            for j in range(len(qids)):
                sel = np.lexsort((cids, -C[:, j]))[:kk]
                sel = sel[np.isfinite(C[sel, j])]
                out_q.append(np.full(len(sel), qids[j]))
                out_n.append(cids[sel])
                out_d.append(D[sel, j])
                out_cn.append(cn[sel].astype(np.int64))
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "dot": np.concatenate(out_d),
                    "qn": np.concatenate(
                        [np.full(len(out_n[j]), int(qn[j])) for j in range(len(qids))]
                    ),
                    "cn": np.concatenate(out_cn),
                }
            )

    src = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vid"), _quantize_named(vec_col).alias("qv")
    )
    emitted = src.mapInPandas(
        gen, "query_id long, neighbor_id long, dot long, qn long, cn long"
    )
    scored = emitted.withColumn(
        "cosine",
        F.col("dot").cast("double")
        / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double"))),
    )
    w = _W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def margin_mine(
    queries: DataFrame,
    side_b: DataFrame,
    side_a: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based retrieval mining (Artetxe & Schwenk 2019,
    "Margin-based Parallel Corpus Mining with Multilingual Sentence
    Embeddings" — the CCMatrix/LASER bitext-mining criterion; public
    algorithm): for each query vector x from side A, score its
    forward k-NN candidates y in side B by the RATIO margin

        margin(x, y) = cos(x, y) / ((avgNN_B(x) + avgNN_A(y)) / 2)

    where avgNN_B(x) is the mean cosine of x to its k nearest B-side
    vectors and avgNN_A(y) the mean cosine of y to its k nearest
    A-side vectors — the normalization that suppresses hub vectors
    (globally-close-to-everything points that plain cosine mining
    pairs with everyone). Emits each query's best candidate by margin
    with the standard margin ≥ 1.0 acceptance flag.

    Cross-engine exactness: pair cosines ride the shared
    ``cosine_topk`` discipline (quantized-int dot, one double
    sqrt/divide, round to 6dp), then re-quantize to e6 BIGINTs; both
    k-NN means are integer floor divisions and the margin is
    ``(cos_e6 · 2·10⁶) DIV (avgF + avgB)`` — every cross-row step is
    integer, so DuckDB reproduces it bit-for-bit. Denominator ≤ 0
    (possible on near-orthogonal synthetic data) yields NULL margin,
    ordered last and never accepted.

    Scale shape: two corpus scans through ``cosine_topk_kernel`` —
    forward (query matrix × B scan) and backward (candidate matrix,
    ≤ |queries|·k vectors, × A scan) — plus KB-grain joins; nothing
    corpus-sized ever shuffles and only ≤ k·|queries| rows per
    partition cross Arrow. CONSTRUCTION-TIME SNAPSHOT: both kernel
    passes collect their bounded query matrices eagerly (fit-then-
    score shape, same contract note as t_dsir_select). At 10⁹ vectors
    swap the kernel calls for ``ann_ivf_topk``/``ann_lsh_topk`` (same
    emitted-cosine contract) and the margin math is unchanged."""
    fwd = cosine_topk_kernel(queries, side_b, k=k, id_col=id_col, vec_col=vec_col)
    e6 = F.round(F.col("cosine") * 1000000).cast("long")
    # materialize the (expensive) pair lineage exactly ONCE, fully in
    # parallel: the candidate set, the forward means, and the final
    # join all read it, and without the cut each consumer re-derives
    # the full kernel scan. KB-sized by construction — the
    # bounded-materialization discipline, not a corpus persist.
    # (r11 A/B: a collected Arrow local relation + isin-literal
    # candidate pushdown measured ~1s SLOWER at sf0.1 — the 800-term
    # In literal costs more to plan/evaluate than the broadcast
    # semi-join it replaced; rejected, checkpoint form kept.)
    # LAZY checkpoint (r11 opt round, guide §1.2): the backward
    # kernel's bounded query collect (bq, below) is the first action
    # over this frame, so it materializes the checkpoint en route —
    # the eager form paid a separate forward-kernel job at
    # construction, then the collect ran again over the blocks.
    fwd_e = fwd.select("query_id", "neighbor_id", e6.alias("cos_e6")).localCheckpoint(
        eager=False
    )
    avgf = fwd_e.groupBy("query_id").agg(
        F.expr("SUM(cos_e6) DIV COUNT(1)").alias("avg_fwd_e6")
    )
    cand = fwd_e.select(F.col("neighbor_id").alias(id_col)).distinct()
    bq = side_b.join(cand, id_col, "left_semi")
    bwd = cosine_topk_kernel(bq, side_a, k=k, id_col=id_col, vec_col=vec_col)
    avgb = (
        bwd.select("query_id", e6.alias("ce6"))
        .groupBy("query_id")
        .agg(F.expr("SUM(ce6) DIV COUNT(1)").alias("avg_bwd_e6"))
        .withColumnRenamed("query_id", "neighbor_id")
    )
    scored = (
        fwd_e.join(F.broadcast(avgf), "query_id")
        .join(F.broadcast(avgb), "neighbor_id")
        .withColumn(
            "margin_e6",
            F.when(
                F.col("avg_fwd_e6") + F.col("avg_bwd_e6") > 0,
                F.expr("(cos_e6 * 2000000) DIV (avg_fwd_e6 + avg_bwd_e6)"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("margin_e6").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("query_id").alias("src_id"),
            F.col("neighbor_id").alias("tgt_id"),
            "cos_e6",
            "margin_e6",
            F.coalesce(F.col("margin_e6") >= 1000000, F.lit(False)).alias("accepted"),
        )
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random Gaussian hyperplanes (driver-side,
    embedded as literals — no state on executors)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _sample_matrix(corpus: DataFrame, id_col: str, vec_col: str, sample_n: int):
    """Bounded deterministic training sample (orderBy-limit; at 100 TB
    swap for a hash-bucket predicate sample — training math unchanged).

    DECIDED r12 opt round (the r11 verdict asked for an explicit call
    on the footer-rowcount fast path): KEEP the orderBy-limit. The
    fast path would only skip the per-partition top-k heap of a
    ≤2000-row sample at bench scale (sub-ms); the ~0.2s the bench sees
    is the collect JOB's scheduling floor, which any driver-side
    training sample pays. Skipping the sort buys nothing measurable
    and forks the documented sampling contract into a bench-only
    branch — exactly the local-only special case the round rules bar."""
    rows = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    return np.asarray([list(r[1]) for r in rows], dtype=np.float64)


def _kmeans_fit(X, n_centers: int, rng, max_iter: int):
    """Driver-side seeded Lloyd with k-means++ (D² sampling) init:
    spread initial centers so cells don't collapse — cell balance is
    what IVF/PQ recall depends on. Shared by the IVF coarse codebook
    and each PQ subspace codebook."""
    n_centers = min(n_centers, len(X))
    first = rng.randint(len(X))
    centers = X[[first]]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, n_centers):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(X), 1.0 / len(X))
        nxt = rng.choice(len(X), p=probs)
        centers = np.vstack([centers, X[nxt]])
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    for _ in range(max_iter):
        d = (centers * centers).sum(axis=1)[None, :] - 2.0 * (X @ centers.T)
        assign = np.argmin(d, axis=1)
        new_centers = centers.copy()
        for j in range(len(centers)):
            members = X[assign == j]
            if len(members):
                new_centers[j] = members.mean(axis=0)
        if np.allclose(new_centers, centers):
            break
        centers = new_centers
    return centers


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    sample_n: int = 16384,
) -> DataFrame:
    """IVF (inverted-file) ANN: cluster the corpus into ``n_lists``
    cells with a seeded-KMeans codebook, assign each vector to its
    nearest centroid, and answer queries by scanning only the
    ``n_probe`` nearest cells — the production-style scale path (a
    trained codebook version of the same bucketed-join shape as LSH).

    Scale: the corpus shuffles once on cell id; each query touches
    n_probe/n_lists of the data. The codebook is trained DRIVER-SIDE
    with numpy Lloyd iterations on a bounded deterministic sample
    (IVF codebooks are always sample-trained — FAISS does the same;
    a distributed KMeans here bought k-means|| init jobs plus one
    Spark job per iteration just to cluster a few thousand sample
    rows, ~4s of pure scheduling at sf0.1). At 100 TB swap the
    orderBy-limit sample for a hash-bucket predicate sample; the
    training math is unchanged. Deterministic given the seed.
    Recall < 1 by design → rows-only + chk_ floor.
    """
    X = _sample_matrix(corpus, id_col, vec_col, sample_n)
    centers = _kmeans_fit(X, n_lists, np.random.RandomState(seed), max_iter)
    centroids = [list(c) for c in centers]

    # cell assignment is a dense numeric kernel (corpus × centroids
    # distance matrix): interpreted Column HOFs measured ~10× slower
    # than one Arrow-batched numpy matmul per partition — this is the
    # legitimate pandas_udf case (vectorized, no per-row Python)
    from pyspark.sql.functions import pandas_udf

    cent = np.asarray(centroids, dtype=np.float64)  # (n_lists, dim)
    cent_sq = (cent * cent).sum(axis=1)  # ‖c‖² per centroid

    def _cells_np(x: "np.ndarray", n: int) -> "np.ndarray":
        """ONE definition of the cell ranking for both venues (the
        corpus pandas_udf and the driver-side query prep) so the
        argpartition/argsort tie behavior cannot drift."""
        # rank by ‖x-c‖² = ‖x‖² - 2x·c + ‖c‖² (‖x‖² constant per row)
        d = cent_sq[None, :] - 2.0 * (x @ cent.T)
        if n == 1:
            return np.argmin(d, axis=1).astype(np.int32)[:, None]
        # partial selection, then order the selected n (cheaper
        # than a full sort when n_lists is large)
        top = np.argpartition(d, n - 1, axis=1)[:, :n]
        row_d = np.take_along_axis(d, top, axis=1)
        return np.take_along_axis(top, np.argsort(row_d, axis=1), axis=1).astype(np.int32)

    @pandas_udf("int")
    def nearest_cell_udf(embs: pd.Series) -> pd.Series:
        x = np.asarray(list(embs), dtype=np.float64)
        return pd.Series(_cells_np(x, 1)[:, 0])

    # deterministic kernel; the flag stops CollapseProject from
    # substituting the udf into the explode projection and running
    # the distance matmul twice per row (see bucket_ids_udf)
    nearest_cell_udf = nearest_cell_udf.asNondeterministic()

    # NULL embeddings are dropped up front (the numpy kernel would
    # crash on a None element; the old Column path silently dropped
    # them from the equi-join — the filter keeps that behavior)
    c = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("craw"))
        .withColumn("cell", nearest_cell_udf(F.col("craw")))
        .withColumn("cv", _quantize_named("craw"))
        .withColumn("cn", _norm2_named("cv"))
        .drop("craw")
    )
    # r11 (guide §4): the query batch is bounded — quantize it inside
    # ONE JVM-only collect (same _quantize/_norm2 Columns), rank its
    # probe cells with the shared numpy kernel driver-side, and plan
    # the exploded rows as an Arrow-backed local relation. The old
    # chain paid a Python-worker dispatch (probe_cells_udf) per call
    # for a handful of rows; the corpus side keeps the distributed
    # kernel — that is the side that scales.
    from sync_spark.operators.localrel import arrow_local_frame

    rows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("raw"))
        .withColumn("qv", _quantize_named("raw"))
        .withColumn("qn", _norm2_named("qv"))
        .collect()
    )
    q_rows = []
    if rows:
        x = np.asarray([list(r["raw"]) for r in rows], dtype=np.float64)
        cells = _cells_np(x, n_probe)
        q_rows = [
            (int(r["qid"]), int(cell), list(r["qv"]), int(r["qn"]))
            for r, row_cells in zip(rows, cells)
            for cell in row_cells
        ]
    q = arrow_local_frame(
        corpus.sparkSession, q_rows,
        "query_id long, cell int, qv array<bigint>, qn bigint",
    )
    return _scored_topk(c, q, k, on="cell")


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    m: int = 4,
    n_codes: int = 16,
    refine: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    sample_n: int = 16384,
) -> DataFrame:
    """IVF-PQ ANN: the memory-bandwidth scale path. The corpus is
    coarse-partitioned into ``n_lists`` IVF cells AND product-quantized
    into ``m`` sub-codes of ``n_codes`` centroids each — the ADC scan
    inside probed cells touches m small ints + one float per vector
    instead of the full embedding (m·log2(n_codes) bits vs 32·dim; at
    100 TB of vectors that is the difference between a memory-bound
    scan and a compute-bound one). Selection is the standard ADC form:
    approx_dot(q, x) = Σ_j table_q[j][code_j(x)] with table_q the
    query's per-subspace dot products against the PQ codebooks
    (computed once per query, joined as a literal array column, summed
    JVM-side by zip_with/aggregate). The approximate top ``refine·k``
    per query are then RE-SCORED with the exact quantized cosine (a
    broadcast semi-join back to the corpus — one extra scan here; a
    deployment points it at the key-bucketed store for point reads),
    so every returned pair carries the IDENTICAL cosine the exact
    operator would emit (the chk_ann gate's contract); only recall is
    approximate. Codebooks are trained driver-side on a bounded
    deterministic sample exactly like ``ivf_topk`` (FAISS-style;
    PQ on raw vectors, not residuals — residual PQ needs a per
    (query, cell) lookup table, a join-shape cost this recall target
    does not justify). Deterministic given the seed.
    Recall < 1 by design → rows-only + chk_ floor.
    """
    from pyspark.sql.functions import pandas_udf

    X = _sample_matrix(corpus, id_col, vec_col, sample_n)
    rng = np.random.RandomState(seed)
    coarse = _kmeans_fit(X, n_lists, rng, max_iter)  # (n_lists, dim)
    dim = X.shape[1]
    # contiguous sub-spaces; np.array_split handles dim % m != 0
    bounds = np.cumsum([0] + [len(b) for b in np.array_split(np.arange(dim), m)])
    books = [
        _kmeans_fit(X[:, bounds[j] : bounds[j + 1]], n_codes, rng, max_iter)
        for j in range(m)
    ]
    coarse_sq = (coarse * coarse).sum(axis=1)

    def _encode(x):
        """(batch, dim) -> cells, codes (batch, m), reconstructed norms."""
        cells = np.argmin(coarse_sq[None, :] - 2.0 * (x @ coarse.T), axis=1)
        codes = np.empty((len(x), m), dtype=np.int32)
        recon = np.empty((len(x), dim), dtype=np.float64)
        for j in range(m):
            sub = x[:, bounds[j] : bounds[j + 1]]
            bj = books[j]
            cj = np.argmin(
                (bj * bj).sum(axis=1)[None, :] - 2.0 * (sub @ bj.T), axis=1
            )
            codes[:, j] = cj
            recon[:, bounds[j] : bounds[j + 1]] = bj[cj]
        return cells, codes, np.sqrt((recon * recon).sum(axis=1))

    @pandas_udf("struct<cell:int, codes:array<int>, rnorm:double>")
    def encode_udf(embs: pd.Series) -> pd.DataFrame:
        x = np.asarray(list(embs), dtype=np.float64)
        cells, codes, rnorm = _encode(x)
        return pd.DataFrame(
            {"cell": cells.astype("int32"), "codes": list(codes), "rnorm": rnorm}
        )

    # deterministic kernel; the flag stops CollapseProject from
    # inlining the udf into downstream projections and running the
    # matmul once per consuming expression (see nearest_cell_udf)
    encode_udf = encode_udf.asNondeterministic()

    c = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("craw"))
        .withColumn("enc", encode_udf(F.col("craw")))
        .select(
            "neighbor_id",
            F.col("enc.cell").alias("cell"),
            F.col("enc.codes").alias("codes"),
            F.col("enc.rnorm").alias("rnorm"),
        )
    )
    # r11 (guide §4): ADC tables and probe cells for the bounded query
    # batch are driver-side numpy over ONE plain collect (identical
    # float64 matmuls the former adc_udf/probe_cells_udf ran in a
    # Python worker), planned as an Arrow-backed local relation — two
    # Python-worker dispatches gone from every serving call; the
    # corpus-side encode keeps the distributed kernel.
    from sync_spark.operators.localrel import arrow_local_frame

    rows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("raw"))
        .collect()
    )
    q_rows = []
    if rows:
        x = np.asarray([list(r["raw"]) for r in rows], dtype=np.float64)
        tables = [x[:, bounds[j] : bounds[j + 1]] @ books[j].T for j in range(m)]
        d = coarse_sq[None, :] - 2.0 * (x @ coarse.T)
        n = min(n_probe, len(coarse))
        top = np.argpartition(d, n - 1, axis=1)[:, :n]
        q_rows = [
            (int(r["qid"]), [list(tables[j][i]) for j in range(m)], int(cell))
            for i, r in enumerate(rows)
            for cell in top[i]
        ]
    q = arrow_local_frame(
        corpus.sparkSession, q_rows,
        "query_id long, adc array<array<double>>, cell int",
    )
    approx = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "adc_cos",
            F.aggregate(
                F.zip_with(
                    F.col("adc"),
                    F.col("codes"),
                    lambda t, cd: F.element_at(t, cd + F.lit(1)),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.greatest(F.col("rnorm"), F.lit(1e-12)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        approx.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= refine * k)
        .select("query_id", "neighbor_id")
        # the shortlist feeds BOTH the rescore pairs and the corpus
        # semi-join below — persist so the encode+ADC pipeline
        # executes once per action: the BlockManager's per-block
        # compute lock already serializes concurrent first readers of
        # a cached partition, so the former eager count() here bought
        # no extra single-evaluation guarantee — it only spent one
        # whole pipeline job at CONSTRUCTION time (r11 opt round,
        # guide §1.2). persist (not localCheckpoint) keeps the
        # LINEAGE: on a cluster a lost executor recomputes the
        # partition instead of permanently failing the job, the
        # posture the 100 TB path needs
        .persist()
    )
    # exact rescore of the shortlisted pairs: identical quantization /
    # rounding / tiebreak discipline as every other variant. The
    # semi-join FIRST so the quantize/norm HOFs run on the ~refine·k·
    # |queries| shortlisted vectors, not the whole corpus (projection
    # sits above the scan, so without the prune Catalyst evaluates it
    # for every corpus row before the broadcast probe)
    qv = queries.select(
        F.col(id_col).alias("query_id"), _quantize_named(vec_col).alias("qv")
    ).withColumn("qn", _norm2_named("qv"))
    slim = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("craw")
    ).join(F.broadcast(cand.select("neighbor_id")), "neighbor_id", "left_semi")
    cv = slim.select(
        "neighbor_id", _quantize_named("craw").alias("cv")
    ).withColumn("cn", _norm2_named("cv"))
    return _scored_topk(cv, cand.join(qv, "query_id"), k, on="neighbor_id")


_EMPTY_PAIR_FRAME = pd.DataFrame({k: [] for k in ("id1", "id2", "dot", "n1", "n2")})


def _exact_dot_matrix(Xa, Xb):
    """Exact int64 dot matrix ``Xa @ Xb.T`` (r12, guide §4.2 — do the
    heavy lifting in native code): numpy integer matmul never
    dispatches to BLAS (it is a strided C loop), while float64 dgemm
    is exact for integer inputs whenever every dot provably fits the
    53-bit mantissa — integer-valued float64 sums below 2**53 are
    exact in ANY accumulation order, so blocked/vectorized BLAS
    summation returns the same integer. Guard: d·max|a|·max|b| < 2^53
    (quantized embeddings: 64·(5.8e5)² ≈ 2.2e13). Measured 0.30s →
    0.03s per 2500×2500×64 tile; e_embed_neardup sf1 interleaved A/B
    ~2× with bit-equal output (503,700 pairs). Falls back to the
    int64 loop when the bound cannot be proven."""
    d = Xa.shape[1] if Xa.ndim == 2 else 0
    if d:
        ma = float(np.abs(Xa).max(initial=0))
        mb = float(np.abs(Xb).max(initial=0))
        if ma * mb * d < 2.0**53:
            return (Xa.astype(np.float64) @ Xb.astype(np.float64).T).astype(np.int64)
    return Xa @ Xb.T


def _neardup_kernel_pairs(ids_a, Xa, na, ids_b, Xb, nb, loose: float, same_side: bool):
    """Shared verify kernel for BOTH near-dup paths (exact tiles and
    LSH buckets): dense int64 dot matrix, loose-bound prefilter, and
    id1 < id2 normalization. One definition so the quantization /
    bound / orientation discipline can't drift between the two
    operators (chk_embed_neardup cross-checks them against each
    other)."""
    D = _exact_dot_matrix(Xa, Xb)  # exact int64 dots (|q|≤1e6 ⇒ no overflow)
    bound = loose * np.sqrt(na.astype(np.float64))[:, None] * np.sqrt(
        nb.astype(np.float64)
    )[None, :]
    mask = D >= bound
    if same_side:
        # both orientations of a pair are present — keep one
        mask &= ids_a[:, None] < ids_b[None, :]
    ii, jj = np.nonzero(mask)
    if same_side:
        lo, hi, n_lo, n_hi = ids_a[ii], ids_b[jj], na[ii], nb[jj]
    else:
        # off-diagonal tiles hold each unordered pair exactly once but
        # in arbitrary id order — normalize to id1 < id2 (norms follow
        # their ids; the dot is symmetric)
        lo = np.minimum(ids_a[ii], ids_b[jj])
        hi = np.maximum(ids_a[ii], ids_b[jj])
        n_lo = np.where(ids_a[ii] <= ids_b[jj], na[ii], nb[jj])
        n_hi = np.where(ids_a[ii] <= ids_b[jj], nb[jj], na[ii])
    return pd.DataFrame({"id1": lo, "id2": hi, "dot": D[ii, jj], "n1": n_lo, "n2": n_hi})


def _emit_cosine(emitted: DataFrame, threshold: float) -> DataFrame:
    """Shared scoring tail: the ONE double division/sqrt/round over
    the kernel's exact-integer (dot, n1, n2) — bit-identical to the
    DuckDB oracle's arithmetic."""
    return (
        emitted.withColumn(
            "cosine",
            F.round(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("n1").cast("double")) * F.sqrt(F.col("n2").cast("double"))),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def embed_neardup_exact(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every unordered
    pair (id1 < id2) with round(cosine, 6) ≥ ``threshold``.

    Exact all-pairs is inherently O(n²) work; what matters at scale is
    HOW that work is laid out. This uses the classic block-tile theta
    join (Okcan & Riedewald's 1-bucket-theta shape): each vector hashes
    to one of ``n_blocks`` blocks, every unordered block pair (bi ≤ bj)
    becomes ONE task, and each task computes a dense int64 matrix
    product over its two tiles with numpy (the justified Arrow-batched
    kernel — same rationale as the IVF cell kernel: a dense numeric
    matmul is where vectorized Python beats Column HOFs ~100×; 4M
    zip_with/aggregate pairs measured minutes where the tiled kernel
    takes <1s). No collect, no driver broadcast of the corpus:
    replication is ×n_blocks rows through one shuffle (a block-b
    vector joins tiles (b, b..B-1) as side a and (0..b-1, b) as
    side b — B copies total), work is
    Σ|bi|·|bj| spread over B(B+1)/2 independent tasks. At 100 TB you
    raise n_blocks so a tile fits executor memory (tasks grow as B²,
    per-task memory shrinks as 1/B) — or switch to the LSH variant
    (embed_neardup_lsh) when approximate recall is acceptable.

    Numeric discipline matches cosine_topk: components quantized to
    int64 (×10⁶) so dot products and norms are EXACT integers in both
    engines; the kernel emits (dot, n1, n2) longs and the single
    double division/sqrt/round happens in Column expressions —
    bit-identical to the DuckDB oracle's.
    """
    v = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("vid"), _quantize_named(vec_col).alias("qv"))
        .withColumn("nrm", _norm2_named("qv"))
        # zero-norm vectors (all-zero/empty embeddings) can never reach
        # a positive threshold, but they collapse the kernel's loose
        # bound to 0 and would push O(z·n/B) junk candidate rows
        # through the shuffle — drop them up front (the oracle's 0/0
        # cosine is NULL and fails >= τ, so results are identical)
        .filter(F.col("nrm") > 0)
        .withColumn("blk", F.pmod(F.xxhash64(F.col("vid")), F.lit(n_blocks)).cast("int"))
    )
    spark = corpus.sparkSession
    pairs = [(bi * n_blocks + bj, bi, bj) for bi in range(n_blocks) for bj in range(bi, n_blocks)]
    # VALUES literal, not createDataFrame(list): the pickled-RDD local
    # relation scheduled Python-worker tasks for the broadcast build
    # on every action, just to deserialize integer triples (r11 opt
    # round, guide §4 — same move as the union-find mapping in
    # cluster.py). ONE tile-membership row per (pair, side): 'a'
    # matches a vector whose block equals bi, 'b' matches bj —
    # diagonal tiles take their rows once (side a; a side-b copy would
    # double every row in the group for no information). Tagging the
    # side in the BROADCAST rows lets one equi join build both tile
    # sides: the old side_a/side_b join pair evaluated v — a full
    # corpus scan + quantize HOF pass — TWICE per action and unioned
    # the copies (guide §2.4: remove the second scan outright; the
    # replication stays ×B rows through the same single shuffle).
    rows = []
    for p, bi, bj in pairs:
        rows.append((p, bi, bj, "a", bi))
        if bi != bj:
            rows.append((p, bi, bj, "b", bj))
    vals = ", ".join(f"({p},{bi},{bj},'{s}',{mb})" for p, bi, bj, s, mb in rows)
    bp = spark.sql(
        "SELECT CAST(col1 AS int) AS pair, CAST(col2 AS int) AS bi, "
        "CAST(col3 AS int) AS bj, col4 AS side, CAST(col5 AS int) AS mblk "
        f"FROM VALUES {vals}"
    )
    tiles = v.join(F.broadcast(bp), v.blk == bp.mblk).select(
        "pair", "bi", "bj", "side", "vid", "qv", "nrm"
    )

    # kernel prefilter: keep dot ≥ (τ - 1e-6)·‖a‖‖b‖ so the shuffle
    # output is ~the matching pairs, not the full n² — the exact
    # boundary decision stays Column-side on the rounded cosine
    loose = threshold - 1e-6

    def _tile_pairs(key, pdf):
        a = pdf[pdf["side"] == "a"]
        if not len(a):
            return _EMPTY_PAIR_FRAME
        ids_a = a["vid"].to_numpy()
        Xa = np.asarray(list(a["qv"]), dtype=np.int64)
        na = a["nrm"].to_numpy()
        if key[1] == key[2]:  # diagonal: combinations within the tile
            return _neardup_kernel_pairs(ids_a, Xa, na, ids_a, Xa, na, loose, same_side=True)
        b = pdf[pdf["side"] == "b"]
        if not len(b):
            return _EMPTY_PAIR_FRAME
        ids_b = b["vid"].to_numpy()
        Xb = np.asarray(list(b["qv"]), dtype=np.int64)
        nb = b["nrm"].to_numpy()
        return _neardup_kernel_pairs(ids_a, Xa, na, ids_b, Xb, nb, loose, same_side=False)

    emitted = tiles.groupBy("pair", "bi", "bj").applyInPandas(
        _tile_pairs, "id1 long, id2 long, dot long, n1 long, n2 long"
    )
    return _emit_cosine(emitted, threshold)


def embed_neardup_lsh(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate embedding near-dup pairs: random-hyperplane LSH
    candidate generation (same multi-table bucketer as ann_lsh_topk),
    then EXACT quantized-cosine verification ≥ ``threshold`` — so every
    emitted pair is a true near-dup (precision 1 by construction);
    recall < 1 by design → rows-only + chk_embed_neardup floor.

    Scale: candidates are same-(tbl, bucket) collisions — Σ bucket²
    work instead of n², the same banded shape as MinHash-LSH. This is
    the 100 TB default; embed_neardup_exact is the oracle-parity
    baseline and the small-n fallback."""
    v = lsh_rows(
        corpus, "vid", "qv", "nrm",
        n_planes=n_planes, n_tables=n_tables, id_col=id_col,
        vec_col=vec_col, dim=dim, seed=seed,
        # same zero-norm guard as embed_neardup_exact (the loose bound
        # degenerates to 0 for them — junk candidates, never matches)
    ).filter(F.col("nrm") > 0)
    # verify INSIDE each (tbl, bucket) group with the SHARED dense
    # int64 kernel (_neardup_kernel_pairs — one definition with the
    # exact path): candidate pairs are scored where they collide and
    # only ≥-threshold pairs ever leave the kernel — a same-key
    # equi-self-join here materialized ~n²/2^planes candidate rows per
    # table through the shuffle just to drop almost all of them
    # (measured 31s vs 4s at sf0.1 for the same recall)
    loose = threshold - 1e-6

    def _bucket_pairs(key, pdf):
        if len(pdf) < 2:
            return _EMPTY_PAIR_FRAME
        ids = pdf["vid"].to_numpy()
        X = np.asarray(list(pdf["qv"]), dtype=np.int64)
        nn = pdf["nrm"].to_numpy()
        return _neardup_kernel_pairs(ids, X, nn, ids, X, nn, loose, same_side=True)

    emitted = v.groupBy("tbl", "bucket").applyInPandas(
        _bucket_pairs, "id1 long, id2 long, dot long, n1 long, n2 long"
    )
    # a true pair collides in several tables — the score is identical
    # in each, so keep one copy
    return _emit_cosine(emitted, threshold).dropDuplicates(["id1", "id2"])


def lsh_rows(
    df: DataFrame,
    out_id: str,
    vec: str,
    norm: str,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """The shared LSH row representation: one row per (vector, table)
    with columns (out_id, vec, norm, tbl, bucket) — quantized int64
    vector, integer norm², and the table's ``n_planes``-bit sign
    bucket. ONE definition feeds both the scan-form ``ann_lsh_topk``
    and the persisted index (ann_index.py) so the plane seeds /
    quantization / bucket math can't drift between them.

    All n_tables × n_planes plane dot products per vector are ONE
    Arrow-batched numpy matmul (same justified-pandas_udf case as the
    IVF cell kernel: a dense vectors × planes matrix; the Column-HOF
    version measured ~10× slower). Quantized vectors and norms are
    computed once per vector BEFORE the ×n_tables explode."""
    from pyspark.sql.functions import pandas_udf

    plane_sets = [hyperplanes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)]
    planes_np = np.asarray(
        [p for table in plane_sets for p in table], dtype=np.float64
    )  # (n_tables*n_planes, dim)
    weights = 1 << np.arange(n_planes)

    @pandas_udf("array<int>")
    def bucket_ids_udf(embs: pd.Series) -> pd.Series:
        x = np.asarray(list(embs), dtype=np.float64)  # (batch, dim)
        bits = (x @ planes_np.T) > 0  # (batch, n_tables*n_planes)
        ids = bits.reshape(len(x), n_tables, n_planes) @ weights  # (batch, n_tables)
        return pd.Series(list(ids.astype(np.int32)))

    # the kernel IS deterministic; the flag is an optimizer barrier —
    # CollapseProject otherwise substitutes the udf expression into
    # the posexplode projection and evaluates the matmul twice per row
    bucket_ids_udf = bucket_ids_udf.asNondeterministic()

    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias(out_id), F.col(vec_col).alias("raw"))
        .withColumn(vec, _quantize_named("raw"))
        .withColumn(norm, _norm2_named(vec))
        .withColumn("bids", bucket_ids_udf(F.col("raw")))
        .select(
            out_id,
            vec,
            norm,
            F.posexplode("bids").alias("tbl", "bucket"),
        )
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN: multi-table random-hyperplane LSH. Each of the
    ``n_tables`` independent tables hashes a vector to a
    ``n_planes``-bit sign bucket; candidates are the UNION of same-
    bucket collisions across tables (classic LSH amplification: a
    near pair with per-plane collision prob p is found with
    1-(1-p^n_planes)^n_tables), then scored with the exact quantized
    cosine (JVM-side) and deduped before ranking. Row prep is the
    shared ``lsh_rows`` kernel.

    Scale: the corpus is exploded ×n_tables — the standard L-index-
    copies LSH trade; at 100 TB you persist this representation once,
    bucketed by (tbl, bucket) (ann_index.build_ann_index — contract:
    same results as this scan form), instead of rebuilding per query
    batch; each query then scans ~n_tables/2^n_planes of the corpus
    instead of all of it. Recall < 1 by design → rows-only +
    chk_ floor."""
    opts = dict(
        n_planes=n_planes, n_tables=n_tables, id_col=id_col,
        vec_col=vec_col, dim=dim, seed=seed,
    )
    # r11 (guide §4): the QUERY side is a bounded batch — hash it
    # driver-side (ann_index.ann_query_rows: one JVM-only collect +
    # driver numpy, bit-identical to the lsh_rows kernel) and plan it
    # as an Arrow-backed local relation; the old per-call
    # lsh_rows(queries) pandas_udf pass paid a Python-worker dispatch
    # for a few dozen rows. The corpus side keeps the distributed
    # kernel — that is the side that scales.
    from sync_spark.operators.ann_index import ann_query_rows
    from sync_spark.operators.localrel import arrow_local_frame

    q_rows = ann_query_rows(queries, dict(opts))
    q = arrow_local_frame(
        queries.sparkSession, q_rows,
        "query_id long, qv array<bigint>, qn bigint, tbl int, bucket int",
    )
    c = lsh_rows(corpus, "neighbor_id", "cv", "cn", **opts)
    return _scored_topk(c, q, k, on=["tbl", "bucket"], dedup=True)


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    max_cell: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    sample_n: int = 16384,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    public paper; the reference has no embedding-space dedup — this is
    a training-pipeline extension): k-means the corpus into cells,
    then WITHIN each cell greedily drop any document whose cosine to
    an already-kept lower-id document reaches ``threshold``. Returns
    (id, cell, keep, pruned_by) — ``pruned_by`` is the kept survivor
    that dominated a dropped row (NULL for survivors), making the
    decision auditable.

    Determinism: seeded driver-side codebook (same discipline as
    ``ivf_topk``), min-id greedy survivor (the repo-wide convention),
    quantized int64 dot products (order-free across partitionings).

    Scale: the quadratic work is per-cell; cells over ``max_cell``
    rows are salted into sub-shards (xxhash64 of the id) so a tile
    always fits one task — the standard sharded-SemDeDup trade
    (cross-shard near-dups within one oversized cell survive; raise
    n_cells or max_cell to shrink the miss window). The VECTORS
    shuffle exactly once (groupBy cell,salt); cell sizes for the salt
    ride a tiny aggregated count table broadcast-joined back (a
    count(*) window would have shuffled the vectors a second time).
    The codebook rides as literals.
    """
    from pyspark.sql.functions import pandas_udf

    X = _sample_matrix(corpus, id_col, vec_col, sample_n)
    centers = _kmeans_fit(X, n_cells, np.random.RandomState(seed), max_iter)
    cent_sq = (centers * centers).sum(axis=1)

    @pandas_udf("int")
    def cell_udf(embs: pd.Series) -> pd.Series:
        x = np.asarray(list(embs), dtype=np.float64)
        return pd.Series(
            np.argmin(cent_sq[None, :] - 2.0 * (x @ centers.T), axis=1).astype("int32")
        )

    cell_udf = cell_udf.asNondeterministic()  # single-evaluation pin

    assigned = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            _quantize_named(vec_col).alias("qv"),
            cell_udf(F.col(vec_col)).alias("cell"),
        )
        .withColumn("qn", _norm2_named("qv"))
        # this frame feeds BOTH the broadcast cell-size aggregate and
        # the stream side of the salt join below — without a persist
        # each action scans the corpus and pays the cell_udf Python
        # dispatch TWICE (the broadcast build is its own query stage
        # and cannot ReuseExchange with the stream side). persist (not
        # localCheckpoint — lineage kept for the lost-executor
        # posture, same trade as ivfpq_topk's shortlist) makes the
        # assignment pass run once per action; the BlockManager's
        # per-block compute lock serializes the two consumers. The
        # cached projection is the quantized corpus (id, qv, cell, qn)
        # — at 100 TB MEMORY_AND_DISK spills rather than OOMs, and the
        # saved second full-corpus scan + Python pass is strictly
        # larger than the cache write
        .persist()
    )
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("__cell_n"))
    assigned = assigned.join(F.broadcast(sizes), "cell").withColumn(
        "salt",
        F.pmod(
            F.xxhash64(F.col("id")),
            F.ceil(F.col("__cell_n") / F.lit(max_cell)).cast("long"),
        ).cast("int"),
    ).drop("__cell_n")

    out_schema = "id long, cell int, keep boolean, pruned_by long"

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        # int64 throughout: dot products stay EXACT (the module's
        # order-free discipline) and agree bit-for-bit with the JVM
        # _dot the chk gate recomputes; only the final divide is float
        Q = np.asarray(list(pdf["qv"]), dtype=np.int64)
        norms = np.sqrt(pdf["qn"].to_numpy(dtype=np.float64))
        n = len(pdf)
        keep = np.ones(n, dtype=bool)
        pruned_by = np.full(n, -1, dtype=np.int64)
        # greedy min-id dominance: O(n·kept) dot products, vectorized
        # per candidate row against the kept prefix
        for i in range(1, n):
            kept_idx = np.nonzero(keep[:i])[0]
            if not len(kept_idx):
                continue
            denom = norms[kept_idx] * norms[i]
            denom[denom == 0.0] = np.inf  # zero vectors never match
            cos = (Q[kept_idx] @ Q[i]) / denom
            hit = np.nonzero(cos >= threshold)[0]
            if len(hit):
                keep[i] = False
                pruned_by[i] = int(pdf["id"].iloc[int(kept_idx[hit[0]])])
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cell": pdf["cell"],
                "keep": keep,
                "pruned_by": [None if k else int(p) for k, p in zip(keep, pruned_by)],
            }
        )

    return assigned.groupBy("cell", "salt").applyInPandas(dedup_cell, out_schema)
