#!/usr/bin/env python
"""Calm-window probe: time registry queries, keeping only runs drawn
at steal < 3%, until each query has >= N calm runs (or the round cap
hits). Prints per-query calm medians. Usage:

    python scripts/probe_calm.py q1_pricing_summary t_hybrid_indexed ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1 python scripts/probe_calm.py -n 5 ...
"""
import argparse
import gc
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sync_spark.hostmeter import cpu_times, frac_window
from sync_spark.registry import all_queries
from sync_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3, help="calm runs per query")
    ap.add_argument("--cap", type=int, default=12, help="max rounds")
    ap.add_argument("--steal", type=float, default=0.03)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_calm")
    specs = all_queries()
    for nm in args.names:
        if nm not in specs:
            sys.exit(f"unknown query {nm!r}")
    # warm: JVM, python workers, per-query codegen + index builds
    spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()
    for nm in args.names:
        specs[nm].spark_fn(spark, sf_dir).count()
    calm: dict[str, list[float]] = {nm: [] for nm in args.names}
    allruns: dict[str, list[tuple[float, float]]] = {nm: [] for nm in args.names}
    for rnd in range(args.cap):
        if all(len(v) >= args.n for v in calm.values()):
            break
        for nm in args.names:
            if len(calm[nm]) >= args.n:
                continue
            c0 = cpu_times()
            t0 = time.perf_counter()
            specs[nm].spark_fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            st = frac_window(c0, cpu_times())["steal"]
            allruns[nm].append((dt, st))
            if st < args.steal:
                calm[nm].append(dt)
            spark.catalog.clearCache()
            gc.collect()
        # if the box is hot, idle a bit before the next round
        w = frac_window(cpu_times(), (time.sleep(2), cpu_times())[1])
        if w["steal"] >= args.steal:
            print(f"# round {rnd}: ambient steal {w['steal']:.0%}, pausing 30s",
                  file=sys.stderr, flush=True)
            time.sleep(30)
    for nm in args.names:
        runs = allruns[nm]
        det = " ".join(f"{t:.2f}@{s:.0%}" for t, s in runs)
        med = statistics.median(calm[nm]) if calm[nm] else None
        tag = f"{med:.3f}s calm_n={len(calm[nm])}" if med else "NO-CALM-RUNS"
        print(f"{nm}: {tag} runs=[{det}]", flush=True)


if __name__ == "__main__":
    main()
