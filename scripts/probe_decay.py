#!/usr/bin/env python
"""Aged-session decay probe (round-11 directive #1).

Runs the whole registry once through at sf1 (same order + same
between-query hygiene as bench_sf1_full.py), re-timing a small set of
decay-sensitive sentinel queries at intervals, and sampling JVM-side
session state each step:

- heap used / max (Runtime)
- per-collector GC count + cumulative time (GarbageCollectorMXBeans)
- metaspace + old-gen pool usage (MemoryPoolMXBeans)
- live SQL-UI execution count (SQLAppStatusStore — retained even with
  spark.ui.enabled=false)
- JVM thread count
- on-disk litter: blockmgr-* / spark-* local dirs, checkpoint dir

The r10 sf1 artifact recorded q10_returned_items at 8.5s in-suite vs
1.37s solo (d_embed_neardup_lsh 22.6 vs 3.9, d_dedup_clusters 32.8 vs
14.2): something the session accumulates per query inflates later
memory-hungry rows.  This probe is the instrument; the fix lands in
sync_spark/session.py, and --configs lets the candidate fix be A/B'd
without touching the engine defaults first.

Usage:
    python scripts/probe_decay.py --out /tmp/decay_baseline.json
    python scripts/probe_decay.py --configs spark.sql.ui.retainedExecutions=8 \
        --out /tmp/decay_fixed.json
"""

from __future__ import annotations

import argparse
import gc
import glob
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SENTINELS = ["q10_returned_items", "d_embed_neardup_lsh"]
SAMPLE_EVERY = 10


from sync_spark.hostmeter import cpu_times, frac_window as steal_frac  # noqa: E402


def dir_mb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path, onerror=lambda e: None):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return round(total / 1e6, 1)


def jvm_sample(spark) -> dict:
    jvm = spark._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    mf = jvm.java.lang.management.ManagementFactory
    gcs = {}
    for b in mf.getGarbageCollectorMXBeans():
        gcs[b.getName()] = {
            "count": b.getCollectionCount(),
            "time_ms": b.getCollectionTime(),
        }
    pools = {}
    for p in mf.getMemoryPoolMXBeans():
        name = p.getName()
        if "Metaspace" in name or "Old" in name or "Tenured" in name:
            pools[name] = round(p.getUsage().getUsed() / 1e6, 1)
    try:
        sql_execs = spark._jsparkSession.sharedState().statusStore().executionsCount()
    except Exception:
        sql_execs = None
    litter = sum(
        dir_mb(d)
        for pat in ("/tmp/blockmgr-*", "/tmp/spark-*")
        for d in glob.glob(pat)
    )
    return {
        "heap_used_mb": round((rt.totalMemory() - rt.freeMemory()) / 1e6, 1),
        "heap_max_mb": round(rt.maxMemory() / 1e6, 1),
        "gc": gcs,
        "pools_mb": pools,
        "sql_executions_retained": sql_execs,
        "threads": mf.getThreadMXBean().getThreadCount(),
        "local_dir_litter_mb": round(litter, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--out", default="/tmp/decay_probe.json")
    ap.add_argument("--configs", default="", help="k=v,k=v extra session configs")
    ap.add_argument("--limit", type=int, default=0, help="stop after N registry queries")
    args = ap.parse_args()

    extra = {}
    for kv in args.configs.split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v

    # Build the session HERE (mirroring session.get_spark) so static
    # confs in --configs actually take effect before getOrCreate.
    import sync_spark.session as sess
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("decay_probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.path.join("/tmp", "sync_spark_warehouse"),
        )
    )
    for k, v in extra.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from sync_spark.registry import all_queries

    specs = {
        n: s for n, s in sorted(all_queries().items()) if not n.startswith("chk_")
    }

    def drop_leftover_blocks() -> None:
        gc.collect()
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()

    def timed(name: str) -> tuple[float, dict]:
        c0 = cpu_times()
        t0 = time.perf_counter()
        specs[name].spark_fn(spark, args.dir).count()
        dt = time.perf_counter() - t0
        cpu = steal_frac(c0, cpu_times())
        drop_leftover_blocks()
        return round(dt, 3), cpu

    # warm-up: JVM, footers, python worker pool
    specs["q1_pricing_summary"].spark_fn(spark, args.dir).count()
    drop_leftover_blocks()

    out = {"configs": extra, "sentinel_series": {s: [] for s in SENTINELS},
           "samples": [], "queries": {}}

    def sentinel_pass(pos: int) -> None:
        for s in SENTINELS:
            dt, cpu = timed(s)
            out["sentinel_series"][s].append(
                {"after_n_queries": pos, "sec": dt, "cpu": cpu}
            )
            print(
                f"## sentinel {s} @ {pos}: {dt}s steal={cpu['steal']:.0%}",
                file=sys.stderr,
                flush=True,
            )

    sentinel_pass(0)
    out["samples"].append({"n": 0, **jvm_sample(spark)})

    names = [n for n in specs if n not in SENTINELS]
    if args.limit:
        names = names[: args.limit]
    for i, name in enumerate(names, 1):
        dt, cpu = timed(name)
        out["queries"][name] = {"sec": dt, "cpu": cpu}
        print(
            f"# [{i}/{len(names)}] {name}: {dt}s steal={cpu['steal']:.0%}",
            file=sys.stderr,
            flush=True,
        )
        if i % SAMPLE_EVERY == 0:
            out["samples"].append({"n": i, **jvm_sample(spark)})
        if i % 35 == 0:
            sentinel_pass(i)

    sentinel_pass(len(names))
    out["samples"].append({"n": len(names), **jvm_sample(spark)})

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"out": args.out,
                      "sentinels": out["sentinel_series"]}), flush=True)


if __name__ == "__main__":
    main()
