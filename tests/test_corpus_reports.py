"""Independent cross-implementation checks for the corpus-report
operators (t_ppl_buckets, e_label_centroids, d_source_overlap): the
DuckDB oracles mirror the same algebra, so a shared logic slip would
pass the hash gate — these re-derive the expected outputs from the
DEFINITION (per-doc strictly-better counts; numpy centroid math)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sync_spark.registry import all_queries


def test_ppl_bucket_matches_per_doc_definition(spark, sf_small):
    """bucket(doc) must equal floor(3 · #strictly-better-scored docs
    in the same lang / n_lang) computed directly per doc — the
    definition, with none of the histogram/cutoff machinery."""
    out = all_queries()["t_ppl_buckets"].spark_fn(spark, sf_small).toPandas()
    sc = out["score_e6"].fillna(-1).astype("int64")
    names = {0: "head", 1: "middle", 2: "tail"}
    for lang, grp in out.assign(sc=sc).groupby("lang"):
        n = len(grp)
        for _, row in grp.iterrows():
            better = int((grp["sc"] > row["sc"]).sum())
            assert row["ppl_bucket"] == names[(3 * better) // n], (
                lang, row["doc_id"], better, n, row["ppl_bucket"])


def test_ppl_buckets_tercile_sizes(spark, sf_small):
    """Band sizes differ by at most one doc per language, up to tie
    groups (equal scores may not split): with the fixture's all-
    distinct scores the bands are exact terciles."""
    out = all_queries()["t_ppl_buckets"].spark_fn(spark, sf_small).toPandas()
    for lang, grp in out.groupby("lang"):
        sizes = grp["ppl_bucket"].value_counts()
        if grp["score_e6"].nunique() == len(grp):  # no ties
            assert sizes.max() - sizes.min() <= 1, (lang, dict(sizes))


def test_label_centroids_match_numpy(spark, sf_small):
    """Independent numpy re-derivation of the r7 one-pass discipline:
    centroid_e6 = trunc-div of per-component quantized sums; cohesion_e6
    = round(dot(ubar, centroid)/sqrt(nc)) where ubar is the trunc-div
    mean of e6-quantized UNIT vectors (norm = left-to-right double
    accumulation, matching Spark's fold order bit-exactly)."""
    out = all_queries()["e_label_centroids"].spark_fn(spark, sf_small).toPandas()
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")

    def tdiv(a, b):  # Spark DIV truncates toward zero; numpy // floors
        return np.sign(a).astype(np.int64) * (np.abs(a) // b)

    for _, row in out.iterrows():
        sub = emb[emb["label"] == row["label"]]
        vecs = [np.asarray(v, dtype=np.float64) for v in sub["embedding"]]
        qv = np.array([np.round(v * 1_000_000).astype(np.int64) for v in vecs])
        n = len(sub)
        assert row["n_vectors"] == n
        cent = tdiv(qv.sum(axis=0), n)
        assert list(row["centroid_e6"]) == cent.tolist()
        nc = int((cent * cent).sum())
        uqs, n_unit = [], 0
        for v in vecs:
            acc = 0.0
            for x in v:  # left-to-right, like Spark's aggregate() fold
                acc += float(x) * float(x)
            nrm = np.sqrt(acc)
            if nrm > 0:
                n_unit += 1
                uqs.append(np.round(v / nrm * 1_000_000).astype(np.int64))
            else:
                uqs.append(np.zeros(len(v), dtype=np.int64))
        ubar = tdiv(np.array(uqs).sum(axis=0), n_unit)
        expect = int(np.round(float(int((ubar * cent).sum())) / np.sqrt(nc)))
        assert row["cohesion_e6"] == expect, (row["label"], row["cohesion_e6"], expect)


def test_source_overlap_containment_bounds(spark, sf_small):
    out = all_queries()["d_source_overlap"].spark_fn(spark, sf_small).toPandas()
    assert (out["source_a"] < out["source_b"]).all()
    assert (out["shared_fps"] >= 1).all()
    assert out["containment_e6"].between(0, 1_000_000).all()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# score pools with heavy tie probability: ties are exactly where a
# cutoff rule can drift from the per-doc definition (the fixture's
# scores are all-distinct, so the oracle gate never sees a tie group
# straddling a tercile boundary)
_scores = st.lists(st.integers(-1, 6), min_size=1, max_size=40)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_scores, b=_scores)
def test_cutoff_algebra_equals_definition_under_ties(spark, a, b):
    """The histogram → cutoff-table pipeline (the exact SQL fragment
    t_ppl_buckets uses) must assign every row the definitional bucket
    floor(3 · #strictly-better / n), for arbitrary tie structure."""
    import pandas as pd

    rows = [("la", s) for s in a] + [("lb", s) for s in b]
    pdf = pd.DataFrame(rows, columns=["lang", "sc"])
    spark.createDataFrame(pdf).createOrReplaceTempView("__ppl_prop_d")
    out = spark.sql("""
WITH hist AS (
  SELECT lang, sc, COUNT(*) AS cnt FROM __ppl_prop_d GROUP BY lang, sc
), cum AS (
  SELECT lang, sc,
         COALESCE(SUM(cnt) OVER (PARTITION BY lang ORDER BY sc DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         SUM(cnt) OVER (PARTITION BY lang) AS n_lang
  FROM hist
), cutoffs AS (
  SELECT lang,
         MIN(CASE WHEN (3 * cum_before) DIV n_lang = 0 THEN sc END) AS head_floor,
         MIN(CASE WHEN (3 * cum_before) DIV n_lang = 1 THEN sc END) AS mid_floor
  FROM cum GROUP BY lang
)
SELECT d.lang, d.sc,
       CASE WHEN d.sc >= c.head_floor THEN 'head'
            WHEN d.sc >= c.mid_floor THEN 'middle' ELSE 'tail' END AS b
FROM __ppl_prop_d d JOIN cutoffs c USING (lang)
""").toPandas()
    assert len(out) == len(pdf)
    names = {0: "head", 1: "middle", 2: "tail"}
    for lang, grp in out.groupby("lang"):
        n = len(grp)
        for _, row in grp.iterrows():
            better = int((grp["sc"] > row["sc"]).sum())
            assert row["b"] == names[(3 * better) // n], (lang, row["sc"], better, n)


def test_label_centroids_null_embedding_semantics(spark, tmp_path):
    """The r6 wide-agg centroid must keep the oracle's null semantics:
    null-embedding rows count toward n_vectors but NOT the centroid
    denominator, and a label whose embeddings are all null disappears
    (the oracle's unnest→inner-join path). Runs the REAL oracle
    compare on a purpose-built table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sync_spark.registry import all_queries
    from sync_spark.testing import run_compare

    sf = tmp_path / "sf_null"
    sf.mkdir()
    rows = {
        "vec_id": [1, 2, 3, 4, 5],
        "embedding": [
            [1.0, 0.0, 0.5], [0.5, 0.5, 0.0], None,   # label 0: one null
            None, None,                                 # label 1: ALL null
        ],
        "label": [0, 0, 0, 1, 1],
    }
    tbl = pa.table(
        {
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "embedding": pa.array(rows["embedding"], pa.list_(pa.float32())),
            "label": pa.array(rows["label"], pa.int32()),
        }
    )
    pq.write_table(tbl, str(sf / "embeddings.parquet"))
    spec = all_queries()["e_label_centroids"]
    assert run_compare(spark, spec, str(sf)) is None
    out = {r.label: r for r in spec.spark_fn(spark, str(sf)).collect()}
    assert set(out) == {0}          # all-null label vanished
    assert out[0].n_vectors == 3    # null row still counted
