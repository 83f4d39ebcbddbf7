#!/usr/bin/env python
"""Split a query's per-run floor into CONSTRUCTION (spark_fn returns
the lazy DataFrame: py4j round-trips, eager analysis passes, any jobs
spawned at construction) vs ACTION (count() on the built frame).
Medians over -n warm repeats at the probe SF. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
        python scripts/probe_construct.py e_embed_neardup d_minhash_lsh ...
"""
import argparse
import gc
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sync_spark.registry import all_queries
from sync_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=5)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("probe_construct")
    specs = all_queries()
    spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()
    for nm in args.names:
        specs[nm].spark_fn(spark, sf_dir).count()  # warm codegen/index
    for nm in args.names:
        cons, act = [], []
        for _ in range(args.n):
            gc.collect()
            t0 = time.perf_counter()
            df = specs[nm].spark_fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            act.append(t2 - t1)
        print(
            f"{nm}: construct={statistics.median(cons):.3f}s "
            f"action={statistics.median(act):.3f}s "
            f"(cons runs {['%.2f' % c for c in cons]})"
        )


if __name__ == "__main__":
    main()
