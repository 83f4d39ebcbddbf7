"""Regression tests for the round-4 ADVICE findings.

1. Corrupt-IDAT PNG (zlib.error, not ValueError) must yield a NULL
   row, never kill the Arrow batch (multimodal.py).
2. snapshot_rollback removes extra live buckets park-then-delete, and
   a leaked parked dir is healed at the next snapshot entry.
3. bad_n must exclude delete-op rows under ignore_deletes so counts
   match the frame actually quarantined (no short/empty DLQ batch).
4. replay_dlq re-stamps replayed events above the log's current max
   seq (replay-wins), so same-micro-batch compaction cannot let a
   stale live event beat the operator's repair.
"""

from __future__ import annotations

import glob
import json
import os
import struct
import zlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.sources.cdc import write_event_batch

from test_cdc_pipeline import (  # noqa: F401  (fixture reuse)
    ROW_SCHEMA,
    _event,
    _mk_pipeline,
    _read_target,
    _snapshot,
    pipeline_dirs,
)


def _png_with_corrupt_idat() -> bytes:
    """CRC-valid IHDR + CRC-valid IDAT chunk whose data is NOT a
    deflate stream: zlib.decompress raises zlib.error, which is not a
    ValueError/IndexError."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    ihdr_chunk = (
        struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    junk = b"\x00not-deflate\xff"
    idat_chunk = (
        struct.pack(">I", len(junk))
        + b"IDAT"
        + junk
        + struct.pack(">I", zlib.crc32(b"IDAT" + junk) & 0xFFFFFFFF)
    )
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    return sig + ihdr_chunk + idat_chunk + iend


def test_corrupt_idat_yields_null_row_not_batch_death(spark):
    from sync_spark.functions.multimodal import image_stats, resize_image

    payload = _png_with_corrupt_idat()
    df = spark.createDataFrame(
        [Row(media_id=1, payload=bytearray(payload)),
         Row(media_id=2, payload=bytearray(b"P6\n1 1\n255\n\x10\x20\x30"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in image_stats(df).collect()}
    # bad payload → NULL row; the good PPM row in the SAME batch lives
    assert rows[1].width is None and rows[1].mean_r is None
    assert rows[2].width == 1 and rows[2].mean_r == pytest.approx(16.0)
    resized = {r.media_id: r for r in resize_image(df, 8).collect()}
    assert resized[1].payload is None
    assert resized[2].payload is not None


def test_rollback_parks_extra_buckets_and_heals_leaks(spark, tmp_path):
    from sync_spark.sources.bucketed import (
        BUCKET_COL,
        bucket_expr,
        overwrite_buckets,
        read_target,
        write_bucketed,
    )
    from sync_spark.sources.snapshots import snapshot_create, snapshot_rollback

    n = 8
    path = str(tmp_path / "store")
    base = spark.createDataFrame([Row(id=1, v="v1")], "id long, v string")
    write_bucketed(base, path, ["id"], n)
    v1 = snapshot_create(path, note="base")
    before = {e for e in os.listdir(path) if e.startswith(f"{BUCKET_COL}=")}
    # grow the keyspace: live gains bucket dirs the snapshot lacks
    grown = spark.createDataFrame(
        [Row(id=i, v="new") for i in range(2, 40)], "id long, v string"
    )
    touched = [
        r[0]
        for r in grown.select(bucket_expr(["id"], n).alias("b")).distinct().collect()
    ]
    overwrite_buckets(grown, path, ["id"], n, touched)
    after = {e for e in os.listdir(path) if e.startswith(f"{BUCKET_COL}=")}
    assert after - before, "fixture must create buckets absent from the snapshot"
    # plant a leaked parked dir from a simulated crash mid-delete
    leaked = os.path.join(path, ".rbstage_doomed_deadbeef")
    os.makedirs(leaked)
    snapshot_rollback(spark, path, v1)
    # rollback restored v1 exactly; no half-deleted bucket visible
    got = {(r.id, r.v) for r in read_target(spark, path).collect()}
    assert got == {(1, "v1")}
    # neither the planted leak nor any new parking dir survives entry
    assert not [e for e in os.listdir(path) if e.startswith(".rbstage_")]


def test_ignored_delete_with_null_key_not_counted_bad(spark, pipeline_dirs):
    _snapshot(spark, pipeline_dirs, [Row(id=1, name="a", balance=1.0)])
    events = [
        # null-key DELETE under ignore_deletes: dropped at the
        # envelope level, so it must NOT trip the DLQ write path
        _event("delete", 1, "users", {"id": None}),
        _event("update", 2, "users", {"id": 1},
               {"id": 1, "name": "ok", "balance": 2.0}),
    ]
    write_event_batch(pipeline_dirs["events"], events, 1)
    _mk_pipeline(spark, pipeline_dirs, ignore_deletes=True).run_available()
    assert _read_target(spark, pipeline_dirs["target"])[1]["name"] == "ok"
    # no DLQ batch dir at all — previously an EMPTY batch was written
    # (bad_n=1 but the quarantine frame had already dropped the event)
    assert not glob.glob(os.path.join(pipeline_dirs["dlq"], "table=*", "batch_id=*"))
    # a null-key INSERT must still quarantine under ignore_deletes
    write_event_batch(
        pipeline_dirs["events"],
        [_event("insert", 3, "users", {"id": None},
                {"id": None, "name": "bad", "balance": 0.0})],
        2,
    )
    _mk_pipeline(spark, pipeline_dirs, ignore_deletes=True).run_available()
    dlq = spark.read.parquet(pipeline_dirs["dlq"] + "/table=users").collect()
    assert len(dlq) == 1 and dlq[0].reason == "null_key"


def test_replay_restamps_seq_above_log_max_replay_wins(spark, pipeline_dirs):
    from sync_spark.streaming.pipeline import replay_dlq

    _snapshot(spark, pipeline_dirs, [Row(id=1, name="a", balance=1.0)])
    write_event_batch(
        pipeline_dirs["events"],
        [_event("insert", 5, "users", {"id": None},
                {"id": None, "name": "repaired", "balance": 42.0})],
        1,
    )
    pipe = _mk_pipeline(spark, pipeline_dirs)
    pipe.run_available()

    # a NEWER live update for the same key the repair will assign,
    # still unconsumed when the replay lands → both files drain in ONE
    # availableNow micro-batch, so per-key compaction (max seq) is the
    # tiebreak. Without re-stamping, seq=100 beats the replayed seq=5
    # and the operator's repair silently loses.
    write_event_batch(
        pipeline_dirs["events"],
        [_event("update", 100, "users", {"id": 1},
                {"id": 1, "name": "stale-live", "balance": 0.0})],
        2,
    )

    def fix(df):
        return df.withColumn("id", F.coalesce(F.col("id"), F.lit(1)))

    replayed, remaining = replay_dlq(
        spark, pipeline_dirs["dlq"], pipeline_dirs["events"],
        "users", ROW_SCHEMA, ["id"], fix=fix,
    )
    assert (replayed, remaining) == (1, 0)
    # the appended replay file carries a fresh seq above the log max
    replay_files = glob.glob(os.path.join(pipeline_dirs["events"], "events-9*.jsonl"))
    assert replay_files
    seqs = [json.loads(line)["seq"]
            for p in replay_files for line in open(p) if line.strip()]
    assert min(seqs) > 100
    pipe.run_available()
    tgt = _read_target(spark, pipeline_dirs["target"])
    assert tgt[1]["name"] == "repaired" and tgt[1]["balance"] == 42.0
