"""Native Delta-protocol MERGE ingest (sources/delta_store.py): CDC
batches applied DIRECTLY to a Delta table — merge correctness vs the
flat apply_changes oracle, O(touched-bucket) commits, protocol txn
idempotence (crash-replayed batches skip), schema evolution via
metaData re-emission, independent jar-free log-fold readback, and the
CdcPipeline delta target end-to-end vs the bucketed target."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.operators.merge import apply_changes
from sync_spark.sources.delta_export import (
    log_versions,
    replay_log,
    replay_with_checkpoint,
    vacuum_export,
    write_checkpoint,
)
from sync_spark.sources.delta_store import (
    create_delta_table,
    delta_merge,
    delta_snapshot_if_empty,
    read_delta_store,
    table_config,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)
N_BUCKETS = 8


def _rows(spark, pairs):
    return spark.createDataFrame([(i, v) for i, v in pairs], SCHEMA)


def _changes(spark, rows):
    return spark.createDataFrame(
        [(i, v, op, s) for s, (i, v, op) in enumerate(rows, 1)],
        "id long, v string, op string, seq long",
    )


def _state(spark, dl, version=None):
    return {(r.id, r.v) for r in read_delta_store(spark, dl, version).collect()}


def test_create_and_read(spark, tmp_path):
    dl = str(tmp_path / "dstore")
    v = create_delta_table(
        spark, _rows(spark, [(i, f"v{i}") for i in range(20)]), dl, ["id"], N_BUCKETS
    )
    assert v == 0
    assert _state(spark, dl) == {(i, f"v{i}") for i in range(20)}
    meta = replay_log(dl)["metaData"]
    assert table_config(meta) == (["id"], N_BUCKETS)
    # version 0 carries protocol + metaData in the commit itself
    first = [
        json.loads(line)
        for line in open(os.path.join(dl, "_delta_log", f"{0:020d}.json"))
    ]
    assert any("protocol" in a for a in first)
    assert any("metaData" in a for a in first)


def test_merge_matches_flat_oracle(spark, tmp_path):
    dl = str(tmp_path / "dstore")
    base = [(i, f"v{i}") for i in range(30)]
    create_delta_table(spark, _rows(spark, base), dl, ["id"], N_BUCKETS)
    ch = [(3, "CHANGED", "upsert"), (7, None, "delete"), (99, "NEW", "upsert")]
    delta_merge(spark, dl, _changes(spark, ch))
    oracle = apply_changes(_rows(spark, base), _changes(spark, ch), keys=["id"])
    assert _state(spark, dl) == {(r.id, r.v) for r in oracle.collect()}


def test_merge_touches_only_changed_buckets(spark, tmp_path):
    """O(touched) contract: the MERGE commit removes/adds files only
    in the buckets the change keys hash into; every other bucket's
    files survive untouched (same assertion the export-side test
    makes, now on the ingest path)."""
    dl = str(tmp_path / "dstore")
    create_delta_table(
        spark, _rows(spark, [(i, f"v{i}") for i in range(64)]), dl, ["id"], N_BUCKETS
    )
    before = replay_log(dl)["files"]
    delta_merge(spark, dl, _changes(spark, [(3, "CHANGED", "upsert")]))
    after = replay_log(dl)["files"]

    from sync_spark.sources.bucketed import bucket_expr

    touched = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(3).cast("long")), F.lit(N_BUCKETS)).cast("int")
    ).collect()[0][0]
    _ = bucket_expr  # bucket id computed with the same xxhash64 layout
    changed_paths = set(before) ^ set(after)
    assert changed_paths, "merge committed no file changes"
    assert all(p.startswith(f"__bucket={touched}/") for p in changed_paths)
    # untouched buckets: identical add entries (same path, same size)
    for p in set(before) & set(after):
        assert before[p]["size"] == after[p]["size"]


def test_txn_idempotent_replay(spark, tmp_path):
    """T4 in protocol terms: re-applying a batch under the same
    (appId, version) is a NO-OP — no new log version, same data."""
    dl = str(tmp_path / "dstore")
    create_delta_table(
        spark, _rows(spark, [(i, f"v{i}") for i in range(10)]), dl, ["id"], N_BUCKETS
    )
    ch = _changes(spark, [(1, "X", "upsert"), (2, None, "delete")])
    v1 = delta_merge(spark, dl, ch, app_id="app", txn_version=7)
    assert v1 == 1
    state1 = _state(spark, dl)
    # crash-replay of the same batch id
    assert delta_merge(spark, dl, ch, app_id="app", txn_version=7) is None
    # and of an OLDER batch id
    assert delta_merge(spark, dl, ch, app_id="app", txn_version=3) is None
    assert log_versions(dl) == [0, 1]
    assert _state(spark, dl) == state1
    # the next batch id applies normally
    v2 = delta_merge(
        spark, dl, _changes(spark, [(5, "Y", "upsert")]), app_id="app", txn_version=8
    )
    assert v2 == 2
    assert replay_log(dl)["txns"] == {"app": 8}


def test_txn_survives_checkpoint_and_vacuum(spark, tmp_path):
    """The idempotence watermark must outlive log compaction: a
    checkpoint with clean_log and a vacuum base-commit collapse both
    re-emit txn state (a dropped watermark would double-apply a
    crash-replayed batch)."""
    dl = str(tmp_path / "dstore")
    create_delta_table(
        spark, _rows(spark, [(i, f"v{i}") for i in range(10)]), dl, ["id"], N_BUCKETS
    )
    delta_merge(
        spark,
        dl,
        _changes(spark, [(1, "X", "upsert")]),
        app_id="app",
        txn_version=5,
    )
    write_checkpoint(dl, clean_log=True)
    assert replay_with_checkpoint(dl)["txns"] == {"app": 5}
    assert (
        delta_merge(
            spark,
            dl,
            _changes(spark, [(1, "X", "upsert")]),
            app_id="app",
            txn_version=5,
        )
        is None
    )
    # vacuum collapse: more merges, then truncate below the window
    for bid in (6, 7, 8):
        delta_merge(
            spark,
            dl,
            _changes(spark, [(bid, f"b{bid}", "upsert")]),
            app_id="app",
            txn_version=bid,
        )
    vacuum_export(dl, keep_versions=2)
    assert replay_with_checkpoint(dl)["txns"]["app"] == 8
    assert (
        delta_merge(
            spark,
            dl,
            _changes(spark, [(8, "b8", "upsert")]),
            app_id="app",
            txn_version=8,
        )
        is None
    )


def test_time_travel_across_merges(spark, tmp_path):
    dl = str(tmp_path / "dstore")
    create_delta_table(
        spark, _rows(spark, [(1, "a"), (2, "b")]), dl, ["id"], N_BUCKETS
    )
    s0 = _state(spark, dl)
    delta_merge(spark, dl, _changes(spark, [(1, "a2", "upsert")]))
    delta_merge(spark, dl, _changes(spark, [(2, None, "delete")]))
    assert _state(spark, dl, version=0) == s0
    assert _state(spark, dl, version=1) == {(1, "a2"), (2, "b")}
    assert _state(spark, dl) == {(1, "a2")}


def test_schema_evolution_widens_metadata(spark, tmp_path):
    dl = str(tmp_path / "dstore")
    create_delta_table(
        spark, _rows(spark, [(1, "a"), (2, "b")]), dl, ["id"], N_BUCKETS
    )
    wide = T.StructType(
        list(SCHEMA.fields) + [T.StructField("extra", T.LongType())]
    )
    ch = spark.createDataFrame(
        [(3, "c", 30, "upsert", 1)], "id long, v string, extra long, op string, seq long"
    )
    delta_merge(spark, dl, ch, row_schema=wide)
    got = {
        (r.id, r.v, r.extra) for r in read_delta_store(spark, dl).collect()
    }
    # untouched buckets' rows read extra as NULL by name
    assert (3, "c", 30) in got
    assert {(i, v) for i, v, _ in got} == {(1, "a"), (2, "b"), (3, "c")}
    meta = replay_log(dl)["metaData"]
    assert "extra" in meta["schemaString"]

    # narrowing refuses loudly
    with pytest.raises(ValueError, match="lacks columns"):
        delta_merge(
            spark,
            dl,
            spark.createDataFrame([(4, "d", "upsert", 1)], "id long, v string, op string, seq long"),
            row_schema=SCHEMA,
        )
    # same-name re-type refuses loudly
    retyped = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("extra", T.StringType()),
        ]
    )
    with pytest.raises(ValueError, match="re-types"):
        delta_merge(
            spark,
            dl,
            spark.createDataFrame(
                [(4, "d", "x", "upsert", 1)],
                "id long, v string, extra string, op string, seq long",
            ),
            row_schema=retyped,
        )


def test_uncommitted_files_invisible(spark, tmp_path):
    """Crash window: a data file on disk but absent from the log is
    never read (the log IS the listing)."""
    dl = str(tmp_path / "dstore")
    create_delta_table(
        spark, _rows(spark, [(1, "a")]), dl, ["id"], N_BUCKETS
    )
    # simulate a crash after data staging, before the commit
    stray_dir = os.path.join(dl, "__bucket=0")
    os.makedirs(stray_dir, exist_ok=True)
    _rows(spark, [(999, "GHOST")]).write.mode("overwrite").parquet(
        str(tmp_path / "ghost")
    )
    ghost = next(
        f
        for f in os.listdir(str(tmp_path / "ghost"))
        if f.endswith(".parquet")
    )
    os.link(
        str(tmp_path / "ghost" / ghost),
        os.path.join(stray_dir, "part-deadbeef.snappy.parquet"),
    )
    assert (999, "GHOST") not in _state(spark, dl)


def test_empty_bootstrap_then_first_merge(spark, tmp_path):
    dl = str(tmp_path / "dstore")
    assert delta_snapshot_if_empty(
        spark, spark.createDataFrame([], SCHEMA), dl, ["id"], N_BUCKETS
    )
    assert not delta_snapshot_if_empty(
        spark, _rows(spark, [(1, "NO")]), dl, ["id"], N_BUCKETS
    )
    assert _state(spark, dl) == set()
    delta_merge(spark, dl, _changes(spark, [(1, "a", "upsert")]))
    assert _state(spark, dl) == {(1, "a")}


def test_jarfree_independent_readback(spark, tmp_path):
    """Same independent protocol fold as the export-side conformance
    test (test_delta_export._fold_log_jarfree), now over a MERGE-built
    log with a checkpoint in the middle: resolve the active file list
    with a test-local replay and scan it with plain DuckDB."""
    import duckdb

    from tests.test_delta_export import _fold_log_jarfree

    dl = str(tmp_path / "dstore")
    create_delta_table(
        spark, _rows(spark, [(i, f"v{i}") for i in range(20)]), dl, ["id"], N_BUCKETS
    )
    delta_merge(spark, dl, _changes(spark, [(3, "CHANGED", "upsert"), (7, None, "delete")]))
    write_checkpoint(dl)
    delta_merge(spark, dl, _changes(spark, [(99, "NEW", "upsert")]))

    files = _fold_log_jarfree(dl)
    assert files and set(files) == set(replay_log(dl)["files"])
    con = duckdb.connect()
    try:
        got = {
            (r[0], r[1])
            for r in con.execute(
                "SELECT id, v FROM read_parquet(?)",
                [[os.path.join(dl, p) for p in files]],
            ).fetchall()
        }
    finally:
        con.close()
    assert got == _state(spark, dl)


def _event(op, seq, key, after=None):
    return {
        "op": op,
        "seq": seq,
        "ts": "2024-01-01T00:00:00Z",
        "source_table": "users",
        "key_json": json.dumps(key),
        "after_json": json.dumps(after) if after is not None else None,
    }


def _mk_pipeline(spark, tmp_path, fmt, tgt, ckpt, n_buckets=N_BUCKETS):
    from sync_spark.spec import SyncSpec
    from sync_spark.streaming.pipeline import CdcPipeline, TableTarget

    return CdcPipeline(
        spark,
        SyncSpec(task_id=1, type="parquet"),
        [
            TableTarget(
                source_table="users",
                target_path=tgt,
                row_schema=SCHEMA,
                key_cols=["id"],
                table_format=fmt,
            )
        ],
        event_log_dir=str(tmp_path / "events"),
        checkpoint_dir=ckpt,
        n_buckets=n_buckets,
    )


def test_pipeline_delta_target_matches_bucketed(spark, tmp_path):
    """CdcPipeline end-to-end with table_format='delta': same event
    log applied to a bucketed target and a delta target converges to
    the same state, the delta log carries the per-batch txn watermark,
    and a pipeline restart over the same events double-applies
    nothing."""
    from sync_spark.sources.cdc import write_event_batch

    events = [
        _event("insert", i + 1, {"id": i}, {"id": i, "v": f"v{i}"})
        for i in range(10)
    ] + [
        _event("update", 11, {"id": 3}, {"id": 3, "v": "CHANGED"}),
        _event("delete", 12, {"id": 7}),
    ]
    write_event_batch(str(tmp_path / "events"), events, 1)

    bpath, dpath = str(tmp_path / "bucketed_users"), str(tmp_path / "delta_users")
    _mk_pipeline(spark, tmp_path, "bucketed", bpath, str(tmp_path / "ck_b")).run_available()
    _mk_pipeline(spark, tmp_path, "delta", dpath, str(tmp_path / "ck_d")).run_available()

    from sync_spark.sources.bucketed import read_target

    want = {(r.id, r.v) for r in read_target(spark, bpath).collect()}
    assert want  # sanity: events actually applied
    assert _state(spark, dpath) == want
    assert list(replay_log(dpath)["txns"]) == ["sync_spark.cdc.users"]

    versions_before = log_versions(dpath)
    # restart with a FRESH checkpoint over the same event log: the
    # streaming layer replays every batch, the txn watermark makes
    # each one a no-op commit-wise
    _mk_pipeline(
        spark, tmp_path, "delta", dpath, str(tmp_path / "ck_replay")
    ).run_available()
    assert _state(spark, dpath) == want
    assert log_versions(dpath) == versions_before


def test_pipeline_delta_contract_mismatch_refuses(spark, tmp_path):
    from sync_spark.sources.cdc import write_event_batch

    dpath = str(tmp_path / "delta_users")
    create_delta_table(spark, _rows(spark, [(1, "a")]), dpath, ["id"], 4)
    write_event_batch(
        str(tmp_path / "events"),
        [_event("insert", 1, {"id": 2}, {"id": 2, "v": "b"})],
        1,
    )
    pipe = _mk_pipeline(
        spark, tmp_path, "delta", dpath, str(tmp_path / "ck"), n_buckets=N_BUCKETS
    )  # table was created with 4 buckets
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (ValueError, StreamingQueryException), match="recreate or reconfigure"
    ):
        pipe.run_available()
