#!/usr/bin/env python
"""BENCH_sf1.json producer: the scheduler-floor watchlist measured at
10× scale (r5 verdict item 2). Generates /tmp/sf1 as a key-shifted
10× replication of sf0.1 (uniform entity scaling — 10× users/docs/
vectors with per-entity structure preserved), then runs the four
watchlist queries through BOTH engines (3-run medians, same box/
session) and prints ONE JSON line.

Usage:
    python bench_sf1.py [--out BENCH_sf1.json] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

WATCH = ["a_session_window_agg", "x_sessionize", "t_unimax_alloc", "e_label_centroids"]
# the dedup/ANN family at 10× (r6 verdict item 6): the sf0.1 story for
# these is "DuckDB's naive oracle caps out" — the sf1 rows show the
# indexed/banded plans' scaling curve, with the oracle capped at
# DUCKDB_CAP_S (interrupted; recorded as null + capped=true).
# Approximate-by-design queries (simhash/minhash/ann) have no oracle
# and record spark-only rows.
FAMILY = [
    "d_dedup_clusters",
    "d_ngram_jaccard",
    "d_simhash_pairs",
    "d_minhash_lsh",
    "e_ann_lsh",
    "e_ann_ivf",
    "e_ann_pq",
    "e_margin_mine",
]
DUCKDB_CAP_S = 120.0
SHIFT = 10_000_000


def generate(src: str, out_dir: str, factor: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    specs = {
        "events": (
            "CAST(event_id + k.k * {s} AS BIGINT) AS event_id, ts, "
            "CAST(user_id + k.k * {s} AS BIGINT) AS user_id, event_type, value, props"
        ),
        "documents": (
            "CAST(doc_id + k.k * {s} AS BIGINT) AS doc_id, text, lang, source, n_chars"
        ),
        "embeddings": (
            "CAST(vec_id + k.k * {s} AS BIGINT) AS vec_id, embedding, label"
        ),
    }
    for table, cols in specs.items():
        con.execute(
            f"COPY (SELECT {cols.format(s=SHIFT)} "
            f"FROM read_parquet('{src}/{table}.parquet'), "
            f"(SELECT unnest(range({factor})) AS k) k) "
            f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import duckdb

    from sync_spark.registry import all_queries
    from sync_spark.session import get_spark

    if not os.path.exists(os.path.join(args.dir, "events.parquet")):
        print(f"# generating {args.dir} ({args.factor}x of {args.src})", file=sys.stderr)
        generate(args.src, args.dir, args.factor)

    spark = get_spark("sync_spark_bench_sf1")
    qs = all_queries()
    spark.range(32).repartition(32).count()  # warm
    con = duckdb.connect()
    for t in ["events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.dir}/{t}.parquet')"
        )

    out = {
        "metric": "sync_spark_watchlist_sf1",
        "sf": 0.1 * args.factor,
        "note": f"{args.factor}x key-shifted replication of sf0.1 (uniform entity "
        "scaling); 3-run medians, same box/session for both engines",
        "queries": {},
    }
    def duckdb_capped(sql: str) -> float | None:
        """One capped oracle run: interrupt DuckDB after DUCKDB_CAP_S
        (the naive dedup oracles blow up quadratically at sf1 — that
        blowup IS the datapoint). Only an exception arriving once the
        cap has nearly elapsed counts as capped (ADVICE r7: a binder
        error failing in milliseconds must re-raise, never be
        recorded as a scaling win)."""
        import threading

        timer = threading.Timer(DUCKDB_CAP_S, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
            return round(time.perf_counter() - t0, 3)
        except Exception:
            if time.perf_counter() - t0 >= DUCKDB_CAP_S * 0.9:
                return None  # genuine cap interrupt
            raise  # broken oracle — fail loudly
        finally:
            timer.cancel()

    for name in WATCH + FAMILY:
        spec = qs[name]
        spec.spark_fn(spark, args.dir).count()  # warm codegen
        sruns, druns, rows = [], [], None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = spec.spark_fn(spark, args.dir).count()
            sruns.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        s = sorted(sruns)[1]
        entry: dict = {"spark_sec": s, "rows": rows, "spark_runs": sruns}
        if spec.oracle is not None:
            first = duckdb_capped(spec.oracle)
            if first is None:
                entry.update({"duckdb_sec": None, "capped": True,
                              "duckdb_cap_s": DUCKDB_CAP_S})
                print(f"# {name}: spark {s}s duckdb >cap({DUCKDB_CAP_S}s)",
                      file=sys.stderr)
            else:
                druns = [first]
                for _ in range(2):
                    t0 = time.perf_counter()
                    con.execute(spec.oracle).fetchall()
                    druns.append(round(time.perf_counter() - t0, 3))
                d = sorted(druns)[1]
                entry.update({"duckdb_sec": d, "ratio": round(s / d, 2),
                              "duckdb_runs": druns})
                print(f"# {name}: spark {s}s duckdb {d}s ratio {round(s/d, 2)}",
                      file=sys.stderr)
        else:
            entry["duckdb_sec"] = None  # approximate-by-design: no oracle
            print(f"# {name}: spark {s}s (no oracle)", file=sys.stderr)
        out["queries"][name] = entry
    out["value"] = round(sum(v["spark_sec"] for v in out["queries"].values()), 3)
    out["unit"] = "sec"
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
