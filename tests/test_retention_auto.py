"""Checkpoint-aware event-log retention (round-5 task 3): the safe
cut-off is derived from the streaming checkpoint's own WAL
(commits + offsets + file-source metadata log), prunes ONLY committed
files, survives a resume, and is path-precise — a committed
DLQ-replay batch (reserved 9e9 id range) must never cause newer
normal-id batches to be deleted (the failure mode of any id-threshold
cut-off)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from sync_spark.sources.cdc import (
    auto_prune_event_log,
    committed_event_files,
    write_event_batch,
)

from test_cdc_pipeline import (  # noqa: F401  (fixture reuse)
    ROW_SCHEMA,
    _event,
    _mk_pipeline,
    _read_target,
    _snapshot,
    pipeline_dirs,
)


def _log_files(d):
    return sorted(os.path.basename(p) for p in glob.glob(os.path.join(d, "events-*.jsonl")))


def test_prunes_only_committed_and_survives_resume(spark, pipeline_dirs):
    _snapshot(spark, pipeline_dirs, [Row(id=1, name="a", balance=1.0)])
    write_event_batch(
        pipeline_dirs["events"],
        [_event("update", 1, "users", {"id": 1}, {"id": 1, "name": "x", "balance": 2.0})],
        1,
    )
    # nothing committed yet → nothing prunable
    assert committed_event_files(pipeline_dirs["ckpt"]) == set()
    assert auto_prune_event_log(pipeline_dirs["events"], pipeline_dirs["ckpt"]) == []

    _mk_pipeline(spark, pipeline_dirs).run_available()
    # a NEW batch written after the drain must survive retention
    write_event_batch(
        pipeline_dirs["events"],
        [_event("insert", 2, "users", {"id": 9}, {"id": 9, "name": "n", "balance": 9.0})],
        2,
    )
    deleted = auto_prune_event_log(pipeline_dirs["events"], pipeline_dirs["ckpt"])
    assert deleted == ["events-0000000001.jsonl"]
    assert _log_files(pipeline_dirs["events"]) == ["events-0000000002.jsonl"]

    # resume from the same checkpoint: batch 2 processes normally
    _mk_pipeline(spark, pipeline_dirs).run_available()
    state = _read_target(spark, pipeline_dirs["target"])
    assert state[1]["name"] == "x" and state[9]["balance"] == 9.0
    # and the second drain's commit makes batch 2 prunable in turn
    assert auto_prune_event_log(pipeline_dirs["events"], pipeline_dirs["ckpt"]) == [
        "events-0000000002.jsonl"
    ]
    assert _log_files(pipeline_dirs["events"]) == []


def test_replay_range_ids_do_not_leapfrog_newer_batches(spark, pipeline_dirs):
    """A committed 9e9-range replay file + an UNPROCESSED normal-id
    file: path-precise retention keeps the normal file (an id
    threshold of max-committed+1 would delete it)."""
    from sync_spark.streaming.pipeline import replay_dlq

    _snapshot(spark, pipeline_dirs, [Row(id=1, name="a", balance=1.0)])
    write_event_batch(
        pipeline_dirs["events"],
        [_event("insert", 5, "users", {"id": None},
                {"id": None, "name": "fixme", "balance": 7.0})],
        1,
    )
    pipe = _mk_pipeline(spark, pipeline_dirs)
    pipe.run_available()

    replayed, remaining = replay_dlq(
        spark, pipeline_dirs["dlq"], pipeline_dirs["events"],
        "users", ROW_SCHEMA, ["id"],
        fix=lambda df: df.withColumn("id", F.coalesce(F.col("id"), F.lit(42))),
    )
    assert (replayed, remaining) == (1, 0)
    pipe.run_available()  # consumes + commits the replay file

    # a normal-id batch arrives AFTER the replay was committed
    write_event_batch(
        pipeline_dirs["events"],
        [_event("insert", 6, "users", {"id": 2}, {"id": 2, "name": "new", "balance": 1.0})],
        2,
    )
    before = _log_files(pipeline_dirs["events"])
    assert any(f.startswith("events-9") for f in before)
    deleted = auto_prune_event_log(pipeline_dirs["events"], pipeline_dirs["ckpt"])
    # the original bad batch was committed and goes; the unprocessed
    # normal batch 2 survives; the REPLAY file survives even though
    # committed — replay_dlq derives its never-reused batch id from
    # the replay files still on disk, so pruning one would make the
    # next replay recreate a seen filename (silent event loss)
    assert deleted == ["events-0000000001.jsonl"]
    assert _log_files(pipeline_dirs["events"]) == [
        "events-0000000002.jsonl",
        "events-9000000000.jsonl",
    ]
    _mk_pipeline(spark, pipeline_dirs).run_available()
    assert _read_target(spark, pipeline_dirs["target"])[2]["name"] == "new"

    # and a SECOND replay cycle derives a fresh id above the survivor
    write_event_batch(
        pipeline_dirs["events"],
        [_event("insert", 7, "users", {"id": None},
                {"id": None, "name": "bad2", "balance": 0.0})],
        3,
    )
    _mk_pipeline(spark, pipeline_dirs).run_available()
    replayed, remaining = replay_dlq(
        spark, pipeline_dirs["dlq"], pipeline_dirs["events"],
        "users", ROW_SCHEMA, ["id"],
        fix=lambda df: df.withColumn("id", F.coalesce(F.col("id"), F.lit(43))),
    )
    assert (replayed, remaining) == (1, 0)
    assert "events-9000000001.jsonl" in _log_files(pipeline_dirs["events"])
    _mk_pipeline(spark, pipeline_dirs).run_available()
    assert _read_target(spark, pipeline_dirs["target"])[43]["name"] == "bad2"


def test_cli_watch_retain_committed(spark, pipeline_dirs, tmp_path):
    """End-to-end through the CLI loop body: run --watch
    --retain-committed prunes the drained batch inside the loop."""
    import subprocess
    import sys as _sys

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        [Row(id=1, name="a", balance=1.0)], ROW_SCHEMA
    ).coalesce(1).write.parquet(str(src_dir / "users.parquet"))
    spec = {
        "taskId": 7,
        "type": "parquet",
        "mappings": [{"tables": [{"sourceTable": "users", "targetTable": "users"}]}],
        "pkColumns": {"users": ["id"]},
    }
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))
    write_event_batch(
        pipeline_dirs["events"],
        [_event("update", 1, "users", {"id": 1}, {"id": 1, "name": "z", "balance": 3.0})],
        1,
    )
    out = subprocess.run(
        [
            _sys.executable, "-m", "sync_spark", "run",
            "--spec", str(spec_path),
            "--source-dir", str(src_dir),
            "--target-root", str(tmp_path / "tgt"),
            "--event-log", pipeline_dirs["events"],
            "--checkpoint", str(tmp_path / "ckpt"),
            "--watch", "--max-cycles", "1", "--retain-committed",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["pruned_files"] == 1
    assert _log_files(pipeline_dirs["events"]) == []


def test_retention_survives_source_log_compaction(spark, pipeline_dirs):
    """FileStreamSource compacts its metadata log every 10 batches
    (sources/0/9.compact holds ALL entries); committed_event_files
    must read the compact file, not just delta files — 12 batches
    drained one-per-trigger crosses the compaction boundary."""
    import glob as _glob

    from sync_spark.spec import SyncSpec
    from sync_spark.streaming.pipeline import CdcPipeline, TableTarget

    _snapshot(spark, pipeline_dirs, [Row(id=1, name="a", balance=1.0)])
    for b in range(1, 13):
        write_event_batch(
            pipeline_dirs["events"],
            [_event("update", b, "users", {"id": 1},
                    {"id": 1, "name": f"v{b}", "balance": float(b)})],
            b,
        )
    pipe = CdcPipeline(
        spark,
        SyncSpec(task_id=1, type="parquet"),
        [TableTarget("users", pipeline_dirs["target"], ROW_SCHEMA, ["id"])],
        event_log_dir=pipeline_dirs["events"],
        checkpoint_dir=pipeline_dirs["ckpt"],
        dlq_path=pipeline_dirs["dlq"],
        max_files_per_trigger=1,
    )
    pipe.run_available()
    compacts = _glob.glob(
        os.path.join(pipeline_dirs["ckpt"], "sources", "0", "*.compact")
    )
    assert compacts, "fixture must cross the compaction boundary"
    committed = committed_event_files(pipeline_dirs["ckpt"])
    assert len(committed) == 12
    deleted = auto_prune_event_log(pipeline_dirs["events"], pipeline_dirs["ckpt"])
    assert len(deleted) == 12
    assert _log_files(pipeline_dirs["events"]) == []
    assert _read_target(spark, pipeline_dirs["target"])[1]["name"] == "v12"
