#!/usr/bin/env python
"""Weather-proof optimization evidence: count the Spark JOBS spawned
by a query's construction and by its action, via job groups. Job
counts are deterministic per code version — wall-clock on this
multi-tenant box is not (see box-weather notes in SCALE.md). Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
        python scripts/probe_jobs.py e_margin_mine d_dedup_clusters ...
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sync_spark.registry import all_queries
from sync_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("probe_jobs")
    sc = spark.sparkContext
    specs = all_queries()
    spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()
    for nm in names:
        specs[nm].spark_fn(spark, sf_dir).count()  # warm
    tracker = sc.statusTracker()
    for nm in names:
        sc.setJobGroup(f"cons_{nm}", nm)
        df = specs[nm].spark_fn(spark, sf_dir)
        sc.setJobGroup(f"act_{nm}", nm)
        df.count()
        sc.setJobGroup("idle", "idle")
        cons = tracker.getJobIdsForGroup(f"cons_{nm}")
        act = tracker.getJobIdsForGroup(f"act_{nm}")

        def tasks(ids):
            n = 0
            for j in ids:
                ji = tracker.getJobInfo(j)
                for s in ji.stageIds if ji else []:
                    si = tracker.getStageInfo(s)
                    n += si.numTasks if si else 0
            return n

        print(
            f"{nm}: construct_jobs={len(cons)} (tasks={tasks(cons)}) "
            f"action_jobs={len(act)} (tasks={tasks(act)})"
        )


if __name__ == "__main__":
    main()
