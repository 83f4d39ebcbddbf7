#!/usr/bin/env python
"""Bisect the round-11 decay trigger: run named query families in
order, re-timing the sentinels after each family (plus a JVM sample),
to localize which family leaves the session in the degraded state the
full probe saw at its @70 sentinel pass (q10 34.7s vs 2.3s)."""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.probe_decay import jvm_sample  # noqa: E402

SENTINELS = ["q10_returned_items", "d_embed_neardup_lsh"]

FAMILIES = {
    "e": ["e_ann_ivf", "e_ann_lsh", "e_ann_pq", "e_cosine_topk",
          "e_embed_neardup", "e_label_centroids", "e_margin_mine"],
    "fj": ["f_array_explode", "f_encrypt_roundtrip", "f_fuzzy_match",
           "f_json_extract", "f_map_funcs", "f_mask_fields",
           "f_misc_scalar", "f_nested_mask", "f_string_funcs",
           "f_timestamp_parse", "f_unpivot", "j_anti_semi",
           "j_merge_upsert", "j_revenue_per_nation", "j_src_tgt_diff"],
    "m": ["m_frame_sample", "m_media_resample", "m_media_resize",
          "m_media_roundtrip"],
    "opt": ["o_time_ordered_scan", "o_topk_orders", "p_daterange_daily_jst",
            "p_daterange_month_jst", "p_daterange_offset_jst",
            "p_isin_opfilter", "pt_merge_into", "pt_mongo_aggregate",
            "pt_mongo_delete", "pt_mongo_find", "pt_mongo_update"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--out", default="/tmp/decay_bisect.json")
    ap.add_argument("--families", default="e,fj,m,opt")
    ap.add_argument("--queries", default="", help="explicit comma list overrides families")
    args = ap.parse_args()

    from sync_spark.registry import all_queries
    from sync_spark.session import get_spark

    spark = get_spark("decay_bisect")
    specs = all_queries()

    def clean() -> None:
        gc.collect()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].spark_fn(spark, args.dir).count()
        dt = time.perf_counter() - t0
        clean()
        return round(dt, 3)

    # warm-up
    specs["q1_pricing_summary"].spark_fn(spark, args.dir).count()
    clean()

    out = {"steps": []}

    def sentinel_pass(tag: str) -> None:
        rec = {"after": tag, "sentinels": {}, "jvm": jvm_sample(spark)}
        for s in SENTINELS:
            rec["sentinels"][s] = timed(s)
            print(f"## {tag}: {s} = {rec['sentinels'][s]}s", file=sys.stderr, flush=True)
        out["steps"].append(rec)

    sentinel_pass("warmup")
    if args.queries:
        groups = [("explicit", args.queries.split(","))]
    else:
        groups = [(f, FAMILIES[f]) for f in args.families.split(",")]
    for fam, names in groups:
        times = {}
        for n in names:
            times[n] = timed(n)
            print(f"# {fam}: {n} {times[n]}s", file=sys.stderr, flush=True)
        out.setdefault("queries", {}).update(times)
        sentinel_pass(fam)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "out": args.out,
        "series": [
            {"after": s["after"], **s["sentinels"]} for s in out["steps"]
        ],
    }), flush=True)


if __name__ == "__main__":
    main()
