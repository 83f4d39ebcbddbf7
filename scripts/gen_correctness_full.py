#!/usr/bin/env python
"""Regenerate CORRECTNESS_full.json: the full registry vs the DuckDB
oracle at sf0.01 with the driver's hash methodology (sorted columns,
stringified sorted rows). Usage:
    python scripts/gen_correctness_full.py [--out CORRECTNESS_full.json]
"""
import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from sync_spark.registry import all_queries
from sync_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return hashlib.sha256(
        str(sorted(tuple(str(x) for x in r) for r in pdf.itertuples(index=False))).encode()
    ).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "CORRECTNESS_full.json"))
    args = ap.parse_args()
    spark = get_spark("correctness_full")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = {"sf_dir": SF_DIR, "fails": 0, "queries": {}}
    for name, spec in sorted(all_queries().items()):
        t0 = time.time()
        row = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            spdf = spec.spark_fn(spark, SF_DIR).toPandas()
            row["spark_rows"] = len(spdf)
            if spec.oracle is not None:
                odf = con.execute(spec.oracle).fetchdf()
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(spdf) == len(odf)
                row["schema_match"] = sorted(map(str.lower, spdf.columns)) == sorted(
                    map(str.lower, odf.columns)
                )
                row["hash_match"] = vhash(spdf) == vhash(odf)
                if not row["hash_match"]:
                    out["fails"] += 1
            else:
                row["err"] = "no_oracle"
        except Exception as ex:
            row["err"] = str(ex)[:200]
            out["fails"] += 1
        row["secs"] = round(time.time() - t0, 3)
        out["queries"][name] = row
        print(name, row["hash_match"], row["err"], flush=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print("fails:", out["fails"])


if __name__ == "__main__":
    main()
