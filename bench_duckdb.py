#!/usr/bin/env python
"""DuckDB twin of bench.py: runs every ORACLED registry query's DuckDB
SQL at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints
ONE JSON line {"metric": "duckdb_oracle_suite", "value": total_sec,
"queries": {name: sec}, "sf": ...} — the denominator of the
≤2×-vs-DuckDB bar (BASELINE.md), 3-run medians like the Spark side.

Queries whose naive oracle exceeds the per-query cap are reported with
the cap value and listed under "capped" (the indexed/banded Spark
plans have no efficient single-statement SQL twin — d_ngram_jaccard
and friends run minutes in DuckDB where Spark runs seconds; capping
keeps the artifact honest without a 30-minute run).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

PER_QUERY_CAP_S = 30.0


def main() -> None:
    import duckdb

    from sync_spark.registry import all_queries
    from sync_spark.testing import duckdb_conn

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb_conn(sf_dir)
    timings: dict[str, float] = {}
    capped: list[str] = []
    for name, spec in sorted(all_queries().items()):
        if spec.oracle is None or name.startswith("chk_"):
            continue
        runs: list[float] = []
        for _ in range(3):
            # cap via a timer-thread interrupt (this DuckDB build has
            # no statement_timeout setting)
            import threading

            timer = threading.Timer(PER_QUERY_CAP_S, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(spec.oracle).fetchall()
                runs.append(time.perf_counter() - t0)
            except duckdb.Error as exc:
                if "interrupt" in str(exc).lower():
                    runs = [PER_QUERY_CAP_S]
                    capped.append(name)
                    break
                raise
            finally:
                timer.cancel()
        timings[name] = round(sorted(runs)[len(runs) // 2], 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr, flush=True)
    con.close()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_suite",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "capped": sorted(set(capped)),
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
