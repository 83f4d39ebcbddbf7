#!/usr/bin/env python
"""Streaming throughput benchmark: a fixed deterministic event mix
driven through the FULL CdcPipeline (snapshot → micro-batched CDC
MERGE → DLQ quarantine), reported as ONE JSON line —
BENCH_streaming.json's producer.

The §2.9 baseline is the reference's sustained envelope: disk-buffer
micro-batches of 100 events / 2 s (BASELINE.md, mongodb.go:697-699) =
50 events/s steady-state. This harness measures what the Spark
pipeline actually sustains on the same event-mix SHAPE the reference
processes (inserts / updates / deletes / PK-changing updates / bad
rows), with one event file per micro-batch (maxFilesPerTrigger=1) so
per-batch latency is a real distribution, not one availableNow gulp.

Determinism: the mix is seeded (event counts, key walk, value
arithmetic are pure functions of the seed), so two runs build
byte-identical logs; timings are the only varying output.

Usage:
    python bench_streaming.py [--batches 20] [--events-per-batch 500]
                              [--out BENCH_streaming.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

MIX = {"insert": 0.60, "update": 0.25, "delete": 0.10, "pk_change": 0.04, "bad": 0.01}


def build_log(event_dir: str, n_batches: int, per_batch: int, seed: int = 7) -> dict:
    """Seeded event mix over one table. Keys walk a bounded space so
    updates/deletes hit EXISTING rows (real merge work, not
    insert-only), PK-changes carry before-images, and 1% null-key
    rows exercise the DLQ write path every few batches."""
    from sync_spark.sources.cdc import write_event_batch

    counts = {k: 0 for k in MIX}
    seq = 0
    next_key = 1_000_000  # above the snapshot key range
    live: list[int] = []
    rnd_state = seed

    def rnd() -> float:  # deterministic LCG — no random module, no clock
        nonlocal rnd_state
        rnd_state = (rnd_state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return rnd_state / float(1 << 64)

    for b in range(1, n_batches + 1):
        events = []
        for _ in range(per_batch):
            seq += 1
            r = rnd()
            if r < MIX["insert"] or not live:
                op = "insert"
            elif r < MIX["insert"] + MIX["update"]:
                op = "update"
            elif r < MIX["insert"] + MIX["update"] + MIX["delete"]:
                op = "delete"
            elif r < 1 - MIX["bad"]:
                op = "pk_change"
            else:
                op = "bad"
            if op == "insert":
                next_key += 1
                live.append(next_key)
                k = next_key
                ev = {
                    "op": "insert",
                    "key_json": json.dumps({"id": k}),
                    "after_json": json.dumps(
                        {"id": k, "name": f"n{k}", "balance": float(seq % 1000)}
                    ),
                }
            elif op == "update":
                k = live[int(rnd() * len(live)) % len(live)]
                ev = {
                    "op": "update",
                    "key_json": json.dumps({"id": k}),
                    "after_json": json.dumps(
                        {"id": k, "name": f"u{seq}", "balance": float(seq % 997)}
                    ),
                }
            elif op == "delete":
                k = live.pop(int(rnd() * len(live)) % len(live))
                ev = {"op": "delete", "key_json": json.dumps({"id": k}), "after_json": None}
            elif op == "pk_change":
                old = live.pop(int(rnd() * len(live)) % len(live))
                next_key += 1
                live.append(next_key)
                ev = {
                    "op": "update",
                    "key_json": json.dumps({"id": next_key}),
                    "before_key_json": json.dumps({"id": old}),
                    "after_json": json.dumps(
                        {"id": next_key, "name": f"pk{seq}", "balance": 1.0}
                    ),
                }
            else:  # bad: null key → DLQ
                ev = {
                    "op": "insert",
                    "key_json": json.dumps({"id": None}),
                    "after_json": json.dumps(
                        {"id": None, "name": "bad", "balance": 0.0}
                    ),
                }
            counts[op] += 1
            ev.update({"seq": seq, "ts": None, "source_table": "accounts"})
            events.append(ev)
        write_event_batch(event_dir, events, b)
    return counts


def run(n_batches: int, per_batch: int, workdir: str, max_files_per_trigger: int = 1) -> dict:
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from sync_spark.session import get_spark
    from sync_spark.spec import SyncSpec
    from sync_spark.streaming.pipeline import CdcPipeline, TableTarget, snapshot_if_empty

    spark = get_spark("sync_spark_streaming_bench")
    # the progress ring buffer defaults to 100 entries — a --batches
    # beyond that would silently drop batches from the latency sums
    # and inflate the sustained rate (no-silent-caps rule)
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(n_batches + 10)
    )
    dirs = {k: os.path.join(workdir, k) for k in ["events", "target", "ckpt", "dlq"]}
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("balance", T.DoubleType()),
        ]
    )
    # snapshot: 1000 pre-existing rows (the initial-sync leg)
    src = spark.createDataFrame(
        [Row(id=i, name=f"s{i}", balance=float(i)) for i in range(1000)], schema
    )
    t0 = time.perf_counter()
    snapshot_if_empty(spark, src, dirs["target"], key_cols=["id"])
    snap_sec = time.perf_counter() - t0

    counts = build_log(dirs["events"], n_batches, per_batch)
    total_events = n_batches * per_batch

    pipe = CdcPipeline(
        spark,
        SyncSpec(task_id=1, type="parquet"),
        [TableTarget("accounts", dirs["target"], schema, ["id"])],
        event_log_dir=dirs["events"],
        checkpoint_dir=dirs["ckpt"],
        dlq_path=dirs["dlq"],
        max_files_per_trigger=max_files_per_trigger,
    )
    t0 = time.perf_counter()
    q = pipe.start(trigger_once=True)
    q.awaitTermination()
    wall = time.perf_counter() - t0
    # per-batch latency from the engine's own progress log
    progress = [
        p if isinstance(p, dict) else json.loads(str(p.json) if hasattr(p, "json") else str(p))
        for p in q.recentProgress
    ]
    lat = sorted(
        p["durationMs"]["triggerExecution"]
        for p in progress
        if p.get("numInputRows", 0) > 0
    )
    dlq_rows = 0
    if os.path.isdir(dirs["dlq"]):
        dlq_rows = spark.read.parquet(dirs["dlq"]).count()
    target_rows = spark.read.parquet(dirs["target"]).count()
    # sustained = steady state, first processed batch excluded (it
    # carries one-time session/codegen warmup — the reference's 50/s
    # envelope is likewise a steady-state number, not a cold start)
    by_time = [
        (p["durationMs"]["triggerExecution"], p["numInputRows"])
        for p in progress
        if p.get("numInputRows", 0) > 0
    ]
    sustained = None
    expect_triggers = -(-n_batches // max_files_per_trigger)
    if len(by_time) > 1:
        if len(by_time) < expect_triggers:
            print(
                f"# WARNING: only {len(by_time)}/{expect_triggers} batch progress "
                "entries retained; sustained rate computed over those only",
                file=sys.stderr,
            )
        sustained = round(
            sum(n for _, n in by_time[1:]) / (sum(d for d, _ in by_time[1:]) / 1000.0), 1
        )
    return {
        "metric": "sync_spark_streaming_pipeline",
        "value": sustained if sustained is not None else round(total_events / wall, 1),
        "unit": "events/sec",
        "events_per_sec_sustained": sustained,
        "events_per_sec_incl_warmup": round(total_events / wall, 1),
        "events_total": total_events,
        "wall_sec": round(wall, 2),
        "batches": len(lat),
        "max_files_per_trigger": max_files_per_trigger,
        "batch_latency_ms": {
            "p50": lat[len(lat) // 2] if lat else None,
            "max": lat[-1] if lat else None,
        },
        "snapshot_sec": round(snap_sec, 2),
        "snapshot_rows": 1000,
        "target_rows": target_rows,
        "dlq_rows": dlq_rows,
        "mix": counts,
        "reference_envelope_events_per_sec": 50,  # 100 events / 2 s
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--events-per-batch", type=int, default=500)
    ap.add_argument("--out", default=None, help="also write the JSON to this path")
    args = ap.parse_args()
    # run 1: one event file per trigger — a real per-batch latency
    # distribution. run 2: maxFilesPerTrigger x4 — the reference's
    # 256 MB smart-batch analog (BASELINE.md), showing the apply path
    # scales with batch size instead of paying per-trigger overhead
    # four times (r5 verdict item 6: the x1 run is trigger-bound, not
    # throughput-bound).
    workdir = tempfile.mkdtemp(prefix="sync_spark_sbench_")
    try:
        result = run(args.batches, args.events_per_batch, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    workdir = tempfile.mkdtemp(prefix="sync_spark_sbench4_")
    try:
        result["smart_batch_x4"] = run(
            args.batches, args.events_per_batch, workdir, max_files_per_trigger=4
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
