"""Snapshot / time-travel layer over the bucketed CDC store
(sources/snapshots.py): hard-link snapshots survive later bucket
swaps, as-of reads reproduce the frozen state exactly, rollback is
itself undoable, untouched buckets share inodes across versions, and
retention only drops unreferenced versions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.operators.merge import apply_changes
from sync_spark.sources.bucketed import (
    BUCKET_COL,
    bucket_expr,
    overwrite_buckets,
    read_target,
    write_bucketed,
)
from sync_spark.sources.snapshots import (
    expire_snapshots,
    latest_version,
    read_snapshot,
    snapshot_create,
    snapshot_rollback,
    snapshot_versions,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)
N_BUCKETS = 8


def _rows(spark, pairs):
    return spark.createDataFrame([(i, v) for i, v in pairs], SCHEMA)


def _state(spark, path):
    return {(r.id, r.v) for r in read_target(spark, path).collect()}


def _merge(spark, path, changes_rows):
    """Latest-per-key merge of (id, v, op) rows into the live store,
    swapping only touched buckets — the pipeline's apply path."""
    ch = spark.createDataFrame(
        [(i, v, op, s) for s, (i, v, op) in enumerate(changes_rows, 1)],
        "id long, v string, op string, seq long",
    )
    target = read_target(spark, path)
    merged = apply_changes(target, ch, keys=["id"])
    touched = [
        r[0]
        for r in ch.select(bucket_expr(["id"], N_BUCKETS).alias("b")).distinct().collect()
    ]
    # restrict the swap to touched-bucket rows (pipeline contract)
    merged_touched = merged.filter(
        bucket_expr(["id"], N_BUCKETS).isin([int(b) for b in touched])
    )
    overwrite_buckets(merged_touched, path, ["id"], N_BUCKETS, touched)


def test_snapshot_read_survives_later_merges(spark, tmp_path):
    tgt = str(tmp_path / "t")
    base = [(i, f"v{i}") for i in range(20)]
    write_bucketed(_rows(spark, base), tgt, ["id"], N_BUCKETS)
    v1 = snapshot_create(tgt, note="initial")
    assert v1 == 1 and latest_version(tgt) == 1

    _merge(spark, tgt, [(3, "CHANGED", "upsert"), (7, None, "delete"), (99, "NEW", "upsert")])
    v2 = snapshot_create(tgt)
    assert v2 == 2

    # live reflects the merge
    live = _state(spark, tgt)
    assert (3, "CHANGED") in live and (99, "NEW") in live
    assert all(i != 7 for i, _ in live)
    # v1 is the PRE-merge world, byte-for-byte, even though the
    # touched buckets' live dirs were deleted by the swap
    asof1 = {(r.id, r.v) for r in read_snapshot(spark, tgt, 1).collect()}
    assert asof1 == set(base)
    asof2 = {(r.id, r.v) for r in read_snapshot(spark, tgt, 2).collect()}
    assert asof2 == live


def test_untouched_buckets_share_inodes(spark, tmp_path):
    """A snapshot is metadata-only: files of buckets untouched between
    versions are the SAME inode in v1, v2, and the live tree."""
    tgt = str(tmp_path / "t")
    write_bucketed(_rows(spark, [(i, f"v{i}") for i in range(20)]), tgt, ["id"], N_BUCKETS)
    snapshot_create(tgt)
    # find the bucket id 3 hashes to, pick a DIFFERENT live bucket
    b3 = spark.createDataFrame([(3,)], "id long").select(
        bucket_expr(["id"], N_BUCKETS).alias("b")
    ).collect()[0].b
    _merge(spark, tgt, [(3, "CHANGED", "upsert")])
    snapshot_create(tgt)

    def inodes(d):
        return {f: os.stat(os.path.join(d, f)).st_ino for f in os.listdir(d) if f.endswith(".parquet")}

    snap = os.path.join(tgt, ".snapshots")
    shared = checked = 0
    for entry in os.listdir(tgt):
        if not entry.startswith(f"{BUCKET_COL}="):
            continue
        b = int(entry.split("=", 1)[1])
        v1d = os.path.join(snap, "v1", entry)
        v2d = os.path.join(snap, "v2", entry)
        if b == b3:
            # touched bucket: v1 must NOT share with live
            assert set(inodes(v1d).values()).isdisjoint(
                set(inodes(os.path.join(tgt, entry)).values())
            )
            continue
        if os.path.isdir(v1d) and os.path.isdir(v2d):
            checked += 1
            if set(inodes(v1d).values()) == set(inodes(v2d).values()):
                shared += 1
    assert checked > 0 and shared == checked  # all untouched buckets shared


def test_rollback_restores_and_is_undoable(spark, tmp_path):
    tgt = str(tmp_path / "t")
    base = [(i, f"v{i}") for i in range(12)]
    write_bucketed(_rows(spark, base), tgt, ["id"], N_BUCKETS)
    snapshot_create(tgt)
    _merge(spark, tgt, [(1, "BROKEN", "upsert"), (50, "OOPS", "upsert")])
    broken = _state(spark, tgt)
    assert (1, "BROKEN") in broken

    safety = snapshot_rollback(spark, tgt, 1)
    assert _state(spark, tgt) == set(base)
    # rollback is undoable: the safety version holds the broken state
    assert {(r.id, r.v) for r in read_snapshot(spark, tgt, safety).collect()} == broken
    # store stays mergeable after rollback
    _merge(spark, tgt, [(2, "AGAIN", "upsert")])
    assert (2, "AGAIN") in _state(spark, tgt)


def test_expire_keeps_recent_versions(spark, tmp_path):
    tgt = str(tmp_path / "t")
    write_bucketed(_rows(spark, [(i, "x") for i in range(8)]), tgt, ["id"], N_BUCKETS)
    for k in range(4):
        _merge(spark, tgt, [(k, f"gen{k}", "upsert")])
        snapshot_create(tgt)
    expired = expire_snapshots(tgt, keep_last=2)
    assert expired == [1, 2]
    assert [v["version"] for v in snapshot_versions(tgt)] == [3, 4]
    # remaining versions still readable; expired ones are gone
    assert read_snapshot(spark, tgt, 3).count() == 8
    import pytest

    with pytest.raises(ValueError, match="unknown snapshot version"):
        read_snapshot(spark, tgt, 1)


def test_unknown_version_errors(spark, tmp_path):
    import pytest

    tgt = str(tmp_path / "t")
    write_bucketed(_rows(spark, [(1, "a")]), tgt, ["id"], N_BUCKETS)
    with pytest.raises(ValueError, match="unknown snapshot version"):
        read_snapshot(spark, tgt, 1)
    with pytest.raises(ValueError, match="unknown snapshot version"):
        snapshot_rollback(spark, tgt, 1)


def test_pipeline_snapshot_after_batch(spark, tmp_path):
    """Opt-in streaming integration: each applied micro-batch freezes
    a version tagged with its batch id; as-of reads reproduce the
    state between batches."""
    import json as _json

    from pyspark.sql import Row
    from sync_spark.sources.cdc import write_event_batch
    from sync_spark.spec import SyncSpec
    from sync_spark.streaming.pipeline import CdcPipeline, TableTarget, snapshot_if_empty

    ROW_SCHEMA = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )

    def ev(op, seq, key, after=None):
        return {
            "op": op, "seq": seq, "ts": "2024-01-01T00:00:00Z",
            "source_table": "users", "key_json": _json.dumps(key),
            "after_json": _json.dumps(after) if after is not None else None,
        }

    dirs = {k: str(tmp_path / k) for k in ("events", "target", "ckpt")}
    src = spark.createDataFrame([Row(id=1, name="a"), Row(id=2, name="b")], ROW_SCHEMA)
    assert snapshot_if_empty(spark, src, dirs["target"])
    pipe = CdcPipeline(
        spark,
        SyncSpec(task_id=1, type="parquet"),
        [TableTarget("users", dirs["target"], ROW_SCHEMA, ["id"])],
        event_log_dir=dirs["events"],
        checkpoint_dir=dirs["ckpt"],
        max_files_per_trigger=1,
        snapshot_after_batch=True,
    )
    write_event_batch(dirs["events"], [ev("update", 1, {"id": 1}, {"id": 1, "name": "a2"})], 1)
    pipe.run_available()
    write_event_batch(dirs["events"], [ev("delete", 2, {"id": 2})], 2)
    pipe.run_available()

    vs = snapshot_versions(dirs["target"])
    assert len(vs) == 2
    assert all(v["note"].startswith("batch=") for v in vs)
    v1 = {(r.id, r.name) for r in read_snapshot(spark, dirs["target"], vs[0]["version"]).collect()}
    v2 = {(r.id, r.name) for r in read_snapshot(spark, dirs["target"], vs[1]["version"]).collect()}
    assert v1 == {(1, "a2"), (2, "b")}
    assert v2 == {(1, "a2")}
    live = {(r.id, r.name) for r in read_target(spark, dirs["target"]).collect()}
    assert live == v2


def test_snapshot_diff(spark, tmp_path):
    from sync_spark.sources.snapshots import snapshot_diff

    tgt = str(tmp_path / "t")
    write_bucketed(
        _rows(spark, [(i, f"v{i}") for i in range(6)]), tgt, ["id"], N_BUCKETS
    )
    snapshot_create(tgt)
    _merge(spark, tgt, [
        (2, "CHANGED", "upsert"),   # changed
        (5, None, "delete"),        # removed
        (9, "NEW", "upsert"),       # added
    ])
    snapshot_create(tgt)
    diff = {
        (r.id, r.change)
        for r in snapshot_diff(spark, tgt, 1, 2, ["id"]).collect()
    }
    assert diff == {(2, "changed"), (5, "removed"), (9, "added")}
    # reverse direction flips added/removed
    rev = {
        (r.id, r.change)
        for r in snapshot_diff(spark, tgt, 2, 1, ["id"]).collect()
    }
    assert rev == {(2, "changed"), (5, "added"), (9, "removed")}


def test_snapshot_create_survives_orphan_version_dir(spark, tmp_path):
    """Crash window between the vN rename and the manifest append
    leaves an unreferenced vN dir; the next snapshot must skip past
    it instead of wedging on ENOTEMPTY forever."""
    import os as _os

    tgt = str(tmp_path / "t")
    write_bucketed(_rows(spark, [(1, "a"), (2, "b")]), tgt, ["id"], N_BUCKETS)
    v1 = snapshot_create(tgt)
    assert v1 == 1
    # simulate the crash: an on-disk v2 that the manifest never saw
    orphan = _os.path.join(tgt, ".snapshots", "v2")
    _os.makedirs(orphan)
    with open(_os.path.join(orphan, "junk"), "w") as fh:
        fh.write("x")
    v3 = snapshot_create(tgt)
    assert v3 == 3  # numbered past the orphan, no collision
    assert read_snapshot(spark, tgt, 3).count() == 2
