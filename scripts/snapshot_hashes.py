#!/usr/bin/env python
"""Snapshot result hashes (driver methodology: sorted columns,
stringified sorted rows) for named queries at one or more SFs, to
prove a rewrite is result-identical. Usage:

    python scripts/snapshot_hashes.py --out /tmp/before.json \
        --sfs sf0.001,sf0.01,sf0.1 d_ngram_jaccard d_minhash_lsh ...
    # ...edit code...
    python scripts/snapshot_hashes.py --out /tmp/after.json ... && diff
"""
import argparse
import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sync_spark.registry import all_queries
from sync_spark.session import get_spark


def vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return hashlib.sha256(
        str(sorted(tuple(str(x) for x in r) for r in pdf.itertuples(index=False))).encode()
    ).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sfs", default="sf0.001,sf0.01")
    args = ap.parse_args()
    spark = get_spark("snapshot_hashes")
    specs = all_queries()
    out = {}
    for sf in args.sfs.split(","):
        sf_dir = f"/root/testdata/{sf}"
        for nm in args.names:
            pdf = specs[nm].spark_fn(spark, sf_dir).toPandas()
            out[f"{sf}:{nm}"] = {"hash": vhash(pdf), "rows": len(pdf)}
            print(f"{sf}:{nm} -> {out[f'{sf}:{nm}']}")
    Path(args.out).write_text(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
