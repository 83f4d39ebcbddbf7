"""SemDeDup-style semantic dedup (similarity.semantic_dedup):
survivor invariants, determinism, auditability of pruned_by, and the
salt-sharding guard."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sync_spark.operators import similarity
from sync_spark.operators.text_queries import _t

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.35  # the synthetic embeddings' near-dup tail


def _cosine_map(emb):
    rows = emb.filter(F.col("embedding").isNotNull()).collect()
    ids = [r.vec_id for r in rows]
    X = np.asarray([list(r.embedding) for r in rows], dtype=np.float64)
    # same quantized math as the operator
    Q = np.round(X * 1_000_000)
    n = np.sqrt((Q * Q).sum(axis=1))
    C = (Q @ Q.T) / np.outer(n, n)
    return ids, {(ids[i], ids[j]): C[i, j] for i in range(len(ids)) for j in range(len(ids))}


def test_semantic_dedup_invariants_and_determinism(spark):
    emb = _t(spark, SF, "embeddings")
    out = similarity.semantic_dedup(emb, threshold=THRESHOLD, n_cells=8).collect()
    assert len(out) == emb.filter(F.col("embedding").isNotNull()).count()
    by_id = {r.id: r for r in out}
    ids, cos = _cosine_map(emb)
    cells = {r.id: r.cell for r in out}
    pruned = [r for r in out if not r.keep]
    kept = [r for r in out if r.keep]
    assert pruned, "fixture must actually prune at the tail threshold"
    assert kept
    for r in pruned:
        # auditable: dominated by a KEPT, LOWER-id, SAME-cell doc at
        # the threshold, under the operator's own quantized cosine
        s = by_id[r.pruned_by]
        assert s.keep and s.id < r.id and cells[s.id] == cells[r.id]
        assert cos[(s.id, r.id)] >= THRESHOLD
    # no two survivors in one cell reach the threshold
    for a in kept:
        for b in kept:
            if a.id < b.id and cells[a.id] == cells[b.id]:
                assert cos[(a.id, b.id)] < THRESHOLD
    out2 = similarity.semantic_dedup(emb, threshold=THRESHOLD, n_cells=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_semantic_dedup_salted_cells_stay_bounded(spark):
    """max_cell forces sub-shards: the kernel still runs (bounded
    tiles) and survivors remain deterministic; cross-shard misses are
    the documented trade, so only the per-shard invariant holds."""
    emb = _t(spark, SF, "embeddings")
    out = similarity.semantic_dedup(
        emb, threshold=THRESHOLD, n_cells=2, max_cell=10
    ).collect()
    assert len(out) == emb.filter(F.col("embedding").isNotNull()).count()
    # every pruned row still names a kept lower-id same-cell dominator
    by_id = {r.id: r for r in out}
    for r in out:
        if not r.keep:
            s = by_id[r.pruned_by]
            assert s.keep and s.id < r.id and s.cell == r.cell


def test_semantic_dedup_identical_vectors_keep_min_id(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]), (4, [1.0, 0.0001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.id: r for r in similarity.semantic_dedup(df, threshold=0.99, n_cells=1).collect()}
    assert out[1].keep and not out[2].keep and out[2].pruned_by == 1
    assert out[3].keep
    assert not out[4].keep and out[4].pruned_by == 1  # 0.9999.. >= 0.99
