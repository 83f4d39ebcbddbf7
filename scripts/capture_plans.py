#!/usr/bin/env python
"""Capture .explain("formatted") for every benched registry query.

Usage: python scripts/capture_plans.py <suffix> [sf_dir]
Writes plans/r11/<name>_<suffix>.txt (suffix = before|after).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sync_spark.registry import all_queries
from sync_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan_capture")
    for name, spec in sorted(all_queries().items()):
        if name.startswith("chk_"):
            continue
        try:
            df = spec.spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # capture the failure, keep going
            plan = f"ERROR: {ex}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()
