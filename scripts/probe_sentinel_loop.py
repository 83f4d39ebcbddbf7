#!/usr/bin/env python
"""Decisive decay experiment (round 11): a FRESH session that runs
ONLY the two sentinel queries in a loop for --minutes, recording
hypervisor steal%, GC delta and wall time per run. Zero session aging
— if the 10-40s episodes still appear and line up with steal spikes,
the 'aged-session decay' is host CPU contention, not engine state."""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.probe_decay import cpu_times, jvm_sample, steal_frac  # noqa: E402

SENTINELS = ["q10_returned_items", "d_embed_neardup_lsh"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--minutes", type=float, default=15.0)
    ap.add_argument("--out", default="/tmp/sentinel_loop.json")
    args = ap.parse_args()

    from sync_spark.registry import all_queries
    from sync_spark.session import get_spark

    spark = get_spark("sentinel_loop")
    specs = all_queries()

    def clean() -> None:
        gc.collect()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()

    # warm both plans once
    for s in SENTINELS:
        specs[s].spark_fn(spark, args.dir).count()
    clean()

    out = {"runs": []}
    t_end = time.time() + args.minutes * 60
    i = 0
    prev_gc = sum(
        g["time_ms"] for g in jvm_sample(spark)["gc"].values()
    )
    while time.time() < t_end:
        for s in SENTINELS:
            c0 = cpu_times()
            t0 = time.perf_counter()
            specs[s].spark_fn(spark, args.dir).count()
            dt = round(time.perf_counter() - t0, 3)
            cpu = steal_frac(c0, cpu_times())
            clean()
            gct = sum(g["time_ms"] for g in jvm_sample(spark)["gc"].values())
            rec = {"i": i, "q": s, "sec": dt, "steal": cpu["steal"],
                   "user": cpu["user"], "gc_delta_s": round((gct - prev_gc) / 1000, 2)}
            prev_gc = gct
            out["runs"].append(rec)
            print(f"[{i}] {s}: {dt}s steal={cpu['steal']:.0%} "
                  f"gc+={rec['gc_delta_s']}s", file=sys.stderr, flush=True)
        i += 1

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"out": args.out, "n": len(out["runs"])}))


if __name__ == "__main__":
    main()
