"""Persisted ANN (LSH) index — build once, query many, extend by slice.

    build_ann_index   corpus hashed ONCE into the multi-table LSH row
                      representation and persisted in the engine's own
                      bucketed store keyed on (tbl, bucket)
    ann_index_topk    top-k against the index: query bucket ids are
                      computed driver-side, the scan partition-prunes
                      to only the colliding (tbl, bucket) keys
    extend_ann_index  a new vector slice merged in, ONLY the touched
                      hash buckets rewritten

This closes the SCALE.md promise in ann_lsh_topk's docstring ("at
100 TB you persist this index once, bucketed by (tbl, bucket), instead
of rebuilding per query batch"): the ×n_tables exploded representation
is the expensive part of the scan form — quantize + norm + the plane
matmul over the WHOLE corpus per query batch — and it is exactly what
the index stores. A query batch then costs: one tiny plane matmul over
the queries, a partition-pruned read of ≤ |queries|×n_tables bucket
keys, and the shared JVM-side scoring tail. Maintenance is the CDC
store's touched-bucket discipline (sources/bucketed.py: hash-bucket
dirs, key-sorted files, stage-then-swap crash discipline) — O(slice),
not O(corpus), same as incremental.py's fingerprint index and
retrieval.py's BM25 postings index.

Semantics contract (pytest-pinned, test_ann_index.py): ann_index_topk
against an index built from corpus C is BIT-IDENTICAL to
similarity.ann_lsh_topk(queries, C) with the same parameters — the
index is an optimization, never a semantics change. Both paths share
one row-prep kernel (similarity.lsh_rows) and one scoring tail
(similarity._scored_topk), so plane seeds / quantization / tiebreaks
cannot drift.

Reference parity: the reference has no ANN surface; this is part of
the LLM-pipeline extension family (SURVEY.md §2 addendum), using the
same persisted-store machinery as its CDC targets.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
import pyspark.sql.types as T

from sync_spark.operators.similarity import _scored_topk, lsh_rows
from sync_spark.sources.bucketed import (
    read_buckets,
    read_meta,
    update_touched_buckets,
    write_bucketed,
)

_DEFAULT_BUCKETS = 32

# the persisted row grain: one row per (vector, LSH table)
_INDEX_SCHEMA = (
    "tbl int, bucket int, neighbor_id long, cv array<bigint>, cn bigint"
)

_PARAMS_FILE = ".ann_params.json"


def _params_path(path: str) -> str:
    return os.path.join(path, _PARAMS_FILE)


def read_params(path: str) -> dict:
    """The index's LSH geometry (n_planes, n_tables, dim, seed,
    id/vec column names) — persisted beside the buckets so the query
    and extend paths re-derive the IDENTICAL hyperplanes without the
    caller re-supplying (and possibly mis-supplying) them."""
    p = _params_path(path)
    if not os.path.exists(p):
        raise ValueError(f"no ANN index at {path!r} (missing {_PARAMS_FILE})")
    with open(p) as f:
        return json.load(f)


def _index_rows(df: DataFrame, params: dict) -> DataFrame:
    rows = lsh_rows(
        df, "neighbor_id", "cv", "cn",
        n_planes=params["n_planes"], n_tables=params["n_tables"],
        id_col=params["id_col"], vec_col=params["vec_col"],
        dim=params["dim"], seed=params["seed"],
    )
    return rows.select("tbl", "bucket", "neighbor_id", "cv", "cn")


def build_ann_index(
    corpus: DataFrame,
    path: str,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    n_buckets: int = _DEFAULT_BUCKETS,
) -> int:
    """Hash the corpus ONCE (shared lsh_rows kernel: quantize + norm +
    one Arrow-batched plane matmul, then the ×n_tables posexplode) and
    persist the (tbl, bucket, neighbor_id, cv, cn) rows into the
    bucketed store keyed on (tbl, bucket), plus a params sidecar. The
    ONLY shuffle is the bucketed write's partitionBy — key-sorted
    files make the per-key lookup rowgroup-prunable. Returns the
    number of index rows written."""
    from pyspark.sql import Observation

    params = dict(
        n_planes=n_planes, n_tables=n_tables, id_col=id_col,
        vec_col=vec_col, dim=dim, seed=seed,
    )
    # the row count rides the write job as an Observation metric —
    # a post-write read.parquet().count() would re-list and re-scan
    # the whole index just to return a number (O(index) at 10⁹
    # vectors; the same wart the MERGE guard removed in r8)
    obs = Observation("ann_build")
    rows = _index_rows(corpus, params).observe(obs, F.count(F.lit(1)).alias("n"))
    # params ride the staged swap with the data — a post-swap sidecar
    # write would leave a data-bearing but unreadable index if the
    # process died in the window (r8 review finding)
    write_bucketed(
        rows, path, ["tbl", "bucket"], n_buckets,
        extra_files={_PARAMS_FILE: json.dumps(params)},
    )
    return int(obs.get["n"])


def ann_query_rows(queries: DataFrame, params: dict) -> list[tuple]:
    """Hash a (small) query batch into the LSH row representation
    entirely without a Python-worker job: ONE JVM-only collect of
    (id, raw, qv, qn) — quantization and norm run as the shared
    ``_quantize``/``_norm2`` Column expressions INSIDE the collect job,
    so the int64 values are bit-identical to ``lsh_rows``'s — then the
    per-table bucket bits via the same numpy matmul the lsh_rows
    kernel runs (identical hyperplanes, identical float64 ops ⇒
    identical sign bits; float32→float64 widening is exact on both
    paths). Returns [(id, qv, qn, tbl, bucket), ...] — one row per
    (vector, table), the ``lsh_rows`` grain.

    Motivation (r11, guide §4): the previous per-call
    ``lsh_rows(queries).collect()`` spun a pandas_udf worker batch +
    posexplode for ≤ a few dozen rows — the Python boundary cost more
    than the matmul. Serving calls are per-query-batch, so this is on
    the latency path."""
    import numpy as np

    from sync_spark.operators.similarity import _norm2_named, _quantize_named, hyperplanes

    n_planes, n_tables = params["n_planes"], params["n_tables"]
    rows = (
        queries.filter(F.col(params["vec_col"]).isNotNull())
        .select(
            F.col(params["id_col"]).alias("qid"),
            F.col(params["vec_col"]).alias("raw"),
        )
        .withColumn("qv", _quantize_named("raw"))
        .withColumn("qn", _norm2_named("qv"))
        .collect()
    )
    if not rows:
        return []
    plane_sets = [
        hyperplanes(params["dim"], n_planes, params["seed"] + 7919 * t)
        for t in range(n_tables)
    ]
    planes = np.asarray(
        [p for table in plane_sets for p in table], dtype=np.float64
    )
    weights = 1 << np.arange(n_planes)
    x = np.asarray([list(r["raw"]) for r in rows], dtype=np.float64)
    bits = (x @ planes.T) > 0
    ids = bits.reshape(len(x), n_tables, n_planes) @ weights
    return [
        (int(r["qid"]), list(r["qv"]), int(r["qn"]), t, int(ids[i, t]))
        for i, r in enumerate(rows)
        for t in range(n_tables)
    ]


def ann_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Top-k against the PERSISTED index — semantics contract
    (pytest-pinned, test_ann_index.py): bit-identical to the scan-form
    ``ann_lsh_topk`` on the same corpus and parameters.

    Cost shape: the query batch (the SMALL side by assumption — it is
    broadcast in the scoring tail anyway) is hashed with the shared
    kernel, its distinct (tbl, bucket) keys are collected driver-side
    (≤ |queries| × n_tables tuples), their STORE bucket ids are
    computed from the same literal keys, and the index read is a
    partition-pruned ``read_buckets`` over only those hash buckets —
    the exact (tbl, bucket) filtering happens in the broadcast scoring
    join itself. (A lookup_keys OR-chain of per-key equality
    conjunctions is redundant with that join and measured 2× slower at
    ~160 keys: a 160-term predicate per row buys nothing the hash join
    doesn't already do.) A query workload touches colliding buckets,
    never the corpus: ~n_tables/2^n_planes of the index per query, and
    none of the quantize/matmul prep the scan form repays per batch."""
    from sync_spark.operators.localrel import arrow_local_frame
    from sync_spark.sources.bucketed import _literal_bucket_ids

    params = read_params(path)
    meta = read_meta(path)
    # hash the query batch ONCE, driver-side (r11: ann_query_rows —
    # one JVM-only collect + driver numpy, no Python-worker job): the
    # batch is the small side by assumption (the scoring tail
    # broadcasts it regardless), and the literal rows both (a) yield
    # the driver-side store-bucket ids for partition pruning and
    # (b) become an Arrow-backed local relation in the join — no
    # second matmul job, no pickled-RDD Python tasks, no
    # cache-lifetime management
    q_rows = ann_query_rows(queries, params)
    q = arrow_local_frame(
        spark, q_rows, "query_id long, qv array<bigint>, qn bigint, tbl int, bucket int"
    )
    if not q_rows:
        kv_empty = spark.createDataFrame([], _INDEX_SCHEMA)
        return _scored_topk(
            kv_empty.select("neighbor_id", "cv", "cn", "tbl", "bucket"),
            q, k, on=["tbl", "bucket"], dedup=True,
        )
    keys = sorted({(r[3], r[4]) for r in q_rows})
    buckets = _literal_bucket_ids(
        spark, ["tbl", "bucket"], meta["n_buckets"],
        {"tbl": "int", "bucket": "int"}, keys,
    )
    cand = read_buckets(
        spark, path, buckets,
        schema=T._parse_datatype_string(_INDEX_SCHEMA),
    ).select("neighbor_id", "cv", "cn", "tbl", "bucket")
    return _scored_topk(cand, q, k, on=["tbl", "bucket"], dedup=True)


def extend_ann_index(df: DataFrame, path: str) -> int:
    """Merge a new vector slice into the persisted index, rewriting
    ONLY the (tbl, bucket)-hash buckets its rows land in (the CDC
    store's touched-bucket discipline — maintenance is O(slice), not
    O(corpus)). Idempotent: index rows distinct-merge, so re-extending
    the same slice is a no-op. Contract (shared with extend_fp_index /
    extend_bm25_index): slice ids must be NEW or byte-identical
    re-sends — re-indexing a MUTATED vector id needs a delete first.
    Same staleness hazard: materialize pre-extend query results before
    swapping. Returns the number of touched store buckets."""
    if read_meta(path) is None:
        raise ValueError(f"no ANN index at {path!r}; build_ann_index first")
    rows = _index_rows(df, read_params(path))
    return update_touched_buckets(
        rows, path, mode="extend",
        schema=T._parse_datatype_string(_INDEX_SCHEMA),
    )

def remove_from_ann_index(df: DataFrame, path: str) -> int:
    """Delete vectors from the persisted ANN index, rewriting ONLY the
    (tbl, bucket)-hash buckets their LSH rows land in. With
    extend_ann_index this closes the mutation cycle:
    update = remove(old) + extend(new).

    Contract (the inverse of extend's): the caller presents the
    ORIGINAL vectors — the index is keyed by content-derived LSH
    buckets, so the byte-identical embedding is what locates the
    touched buckets in O(slice); within them, every row of the given
    ids is dropped. Idempotent. Returns touched store buckets."""
    if read_meta(path) is None:
        raise ValueError(f"no ANN index at {path!r}; build_ann_index first")
    rows = _index_rows(df, read_params(path))
    return update_touched_buckets(
        rows, path, mode="remove", anti_on="neighbor_id",
        schema=T._parse_datatype_string(_INDEX_SCHEMA),
    )
