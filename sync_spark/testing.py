"""Oracle-comparison harness mirroring the driver's correctness gate:
run the Spark query and the DuckDB SQL on the same parquet tables,
sort columns by name, canonicalize row order, compare values.

Used by tests/ so every registry entry is validated locally before the
driver ever sees it.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import duckdb
import pandas as pd

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), key=lambda s: s.astype(str)).reset_index(
            drop=True
        )
    return out


def _values_equal(a, b) -> bool:
    """Strict, driver-style: the driver hashes stringified values, so
    int vs float representation differences (2996 vs 2996.0) are REAL
    mismatches — do not paper over them here."""
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    try:
        import numpy as np

        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            a = list(a) if isinstance(a, np.ndarray) else a
            b = list(b) if isinstance(b, np.ndarray) else b
            return _values_equal(a, b)
    except ImportError:
        pass
    # None==None and NaN==NaN, but NOT None==NaN: the driver compares
    # stringified values ('None' != 'nan'), so conflating them here
    # would pass locally a query the driver's gate fails
    if a is None and b is None:
        return True
    if a is not None and b is not None and a != a and b != b:  # both NaN
        return True
    return str(a) == str(b)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> Optional[str]:
    """Return None if equal (driver-style), else a diff description."""
    s, o = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return f"schema mismatch: spark={list(s.columns)} oracle={list(o.columns)}"
    if len(s) != len(o):
        return f"row count mismatch: spark={len(s)} oracle={len(o)}"
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b):
                return f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}"
    return None


def run_compare(spark, spec, sf_dir: str) -> Optional[str]:
    """Run one QuerySpec both ways; None = match."""
    sdf = spec.spark_fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return None  # rows-only check: just ensure it ran
    con = duckdb_conn(sf_dir)
    try:
        odf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    return compare_frames(sdf, odf)


def run_full(sf_dir: str, out_path: str = "CORRECTNESS_full.json") -> dict:
    """Driver-sim over the ENTIRE registry (the driver's own row set
    is pinned to ~50 queries; this produces the full artifact every
    round so the judge doesn't have to re-derive the rest). Record
    format mirrors CORRECTNESS_r{N}.json; ``err="no_oracle"`` marks
    rows-only entries. Returns the result dict; writes it as JSON."""
    import json
    import sys
    import time

    from sync_spark.registry import all_queries
    from sync_spark.session import get_spark

    spark = get_spark("correctness_full")
    con = duckdb_conn(sf_dir)
    results: dict = {}
    fails = 0
    try:
        for name, spec in sorted(all_queries().items()):
            rec = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": None,
                "oracle_rows": None,
                "err": None,
                "secs": None,
            }
            t0 = time.time()
            try:
                sdf = spec.spark_fn(spark, sf_dir).toPandas()
                rec["spark_rows"] = len(sdf)
                if spec.oracle is None:
                    rec["err"] = "no_oracle"
                else:
                    odf = con.execute(spec.oracle).fetchdf()
                    rec["oracle_rows"] = len(odf)
                    diff = compare_frames(sdf, odf)
                    rec["rows_match"] = len(sdf) == len(odf)
                    rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                    rec["hash_match"] = diff is None
                    if diff is not None:
                        rec["err"] = diff[:300]
                        fails += 1
            except Exception as exc:  # a crashed query is a fail, not a skip
                rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
                fails += 1
            rec["secs"] = round(time.time() - t0, 3)
            results[name] = rec
            status = "ok" if rec["hash_match"] else (rec["err"] or "rows-only")
            print(f"{name}: {status}", file=sys.stderr, flush=True)
    finally:
        con.close()
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "fails": fails, "queries": results}, fh, indent=1)
    print(f"wrote {out_path}: {len(results)} queries, {fails} fails", file=sys.stderr)
    return results


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="full driver-sim correctness artifact")
    ap.add_argument("--full", action="store_true", help="run every registry query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_full.json")
    args = ap.parse_args()
    if args.full:
        res = run_full(args.sf_dir, args.out)
        bad = sum(
            1
            for r in res.values()
            if r["err"] is not None and r["err"] != "no_oracle"
        )
        raise SystemExit(1 if bad else 0)
    ap.print_help()
