#!/usr/bin/env python
"""Background weather logger: every ~3 min, time DuckDB q1 (3 runs)
and append a JSON line to --out. DuckDB-only so it adds negligible
load and needs no Spark session. Calm reference for this box:
duck q1 ~0.05-0.065s; >=0.09s means the invisible-contention mode."""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sync_spark.registry import all_queries
from sync_spark.testing import duckdb_conn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/weather_log.jsonl")
    ap.add_argument("--interval", type=float, default=180.0)
    ap.add_argument("--hours", type=float, default=6.0)
    args = ap.parse_args()
    con = duckdb_conn("/root/testdata/sf0.1")
    sql = all_queries()["q1_pricing_summary"].oracle
    con.execute(sql).fetchall()  # warm
    t_end = time.time() + args.hours * 3600
    while time.time() < t_end:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(round(time.perf_counter() - t0, 4))
        rec = {"t": round(time.time(), 1), "duck_q1": sorted(runs)[1], "runs": runs}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
