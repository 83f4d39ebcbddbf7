"""Central query registry: every implemented operator from SURVEY.md §2
has one entry here, pairing the Spark implementation with its DuckDB
oracle SQL (None for non-SQL-expressible ops → driver does a weaker
rows-only check).

``__spark_entry__.py`` exposes this registry to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB, or None


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, spark_fn, oracle: Optional[str]) -> None:
    _REGISTRY[name] = QuerySpec(name, spark_fn, oracle)


def all_queries() -> dict[str, QuerySpec]:
    _populate()
    return dict(_REGISTRY)


_populated = False


def _populate() -> None:
    global _populated
    if _populated:
        return

    from sync_spark.operators import batch_queries as bq
    from sync_spark.operators import relational

    register("q1_pricing_summary", relational.q1_pricing_summary, relational.Q1_SQL)
    register("s_scan_project_filter", bq.s_scan_project_filter, bq.S_SCAN_SQL)
    register("p_isin_opfilter", bq.p_isin_opfilter, bq.P_ISIN_SQL)
    register("p_daterange_daily_jst", bq.p_daterange_daily_jst, bq.P_DAILY_SQL)
    register("p_daterange_offset_jst", bq.p_daterange_offset_jst, bq.P_OFFSET_SQL)
    register("p_daterange_month_jst", bq.p_daterange_month_jst, bq.P_MONTH_SQL)
    register("a_filtered_count", bq.a_filtered_count, bq.A_FILTERED_COUNT_SQL)
    register("a_group_delta", bq.a_group_delta, bq.A_GROUP_DELTA_SQL)
    register("a_grand_total", bq.a_grand_total, bq.A_GRAND_TOTAL_SQL)
    register("a_daily_window_jst", bq.a_daily_window_jst, bq.A_DAILY_WINDOW_SQL)
    register("a_counter_daily_reset", bq.a_counter_daily_reset, bq.A_COUNTER_RESET_SQL)
    # hopping/session builtins live in extended_queries (registered
    # below with the other xq entries)
    register("w_latest_per_key", bq.w_latest_per_key, bq.W_LATEST_SQL)
    register("w_topk_per_group", bq.w_topk_per_group, bq.W_TOPK_SQL)
    register("w_running_lag", bq.w_running_lag, bq.W_RUNNING_SQL)
    register("w_rank_distribution", bq.w_rank_distribution, bq.W_RANK_DIST_SQL)
    register("o_topk_orders", bq.o_topk_orders, bq.O_TOPK_SQL)
    register("o_time_ordered_scan", bq.o_time_ordered_scan, bq.O_TIME_SCAN_SQL)
    register("u_union_merge", bq.u_union_merge, bq.U_UNION_SQL)
    register("u_intersect_except", bq.u_intersect_except, bq.U_INTERSECT_SQL)
    register("j_revenue_per_nation", bq.j_revenue_per_nation, bq.J_REVENUE_SQL)
    register("j_anti_semi", bq.j_anti_semi, bq.J_ANTI_SEMI_SQL)
    register("j_src_tgt_diff", bq.j_src_tgt_diff, bq.J_DIFF_SQL)
    register("j_merge_upsert", bq.j_merge_upsert, bq.J_MERGE_SQL)

    from sync_spark.operators import function_queries as fq

    register("f_mask_fields", fq.f_mask_fields, fq.F_MASK_SQL)
    register("f_encrypt_roundtrip", fq.f_encrypt_roundtrip, fq.F_ENCRYPT_SQL)
    register("f_nested_mask", fq.f_nested_mask, fq.F_NESTED_MASK_SQL)
    register("f_json_extract", fq.f_json_extract, fq.F_JSON_SQL)
    register("f_string_funcs", fq.f_string_funcs, fq.F_STRING_SQL)
    register("f_timestamp_parse", fq.f_timestamp_parse, fq.F_TS_PARSE_SQL)
    register("f_misc_scalar", fq.f_misc_scalar, fq.F_MISC_SQL)
    register("f_fuzzy_match", fq.f_fuzzy_match, fq.F_FUZZY_SQL)
    register("cq_conditions", fq.cq_conditions, fq.CQ_CONDITIONS_SQL)
    register("cq_daterange_weekly", fq.cq_daterange_weekly, fq.CQ_WEEKLY_SQL)

    from sync_spark.operators import text_queries as tq

    register("t_text_quality", tq.t_text_quality, tq.T_QUALITY_SQL)
    register("t_langid", tq.t_langid, tq.T_LANGID_SQL)
    register("t_token_stats_by_lang", tq.t_token_stats_by_lang, tq.T_TOKEN_STATS_SQL)
    register("t_fingerprint", tq.t_fingerprint, tq.T_FINGERPRINT_SQL)
    register("t_token_budget_sample", tq.t_token_budget_sample, tq.T_BUDGET_SQL)
    register("d_dedup_exact", tq.d_dedup_exact, tq.D_EXACT_SQL)
    register("d_dedup_clusters", tq.d_dedup_clusters, tq.D_CLUSTERS_SQL)
    register("d_ngram_jaccard", tq.d_ngram_jaccard, tq.D_JACCARD_SQL)
    register("d_minhash_lsh", tq.d_minhash_lsh, None)
    register("d_dedup_clusters_lsh", tq.d_dedup_clusters_lsh, None)
    register("d_simhash_pairs", tq.d_simhash_pairs, None)
    register("e_cosine_topk", tq.e_cosine_topk, tq.E_COSINE_SQL)
    register("e_margin_mine", tq.e_margin_mine, tq.E_MARGIN_SQL)
    register("e_ann_lsh", tq.e_ann_lsh, None)
    register("e_ann_ivf", tq.e_ann_ivf, None)
    register("e_ann_pq", tq.e_ann_pq, None)
    register("d_semantic_dedup", tq.d_semantic_dedup, None)
    register("e_embed_neardup", tq.e_embed_neardup, tq.E_NEARDUP_SQL)
    register("d_embed_neardup_lsh", tq.d_embed_neardup_lsh, None)
    register("t_repetition", tq.t_repetition, tq.T_REPETITION_SQL)
    register("t_pii_redact", tq.t_pii_redact, tq.T_PII_SQL)
    register("t_bpe_token_stats", tq.t_bpe_token_stats, tq.T_BPE_SQL)
    register("t_winnow_fingerprints", tq.t_winnow_fingerprints, tq.T_WINNOW_SQL)
    register("d_winnow_pairs", tq.d_winnow_pairs, tq.D_WINNOW_PAIRS_SQL)
    register("d_incremental_probe", tq.d_incremental_probe, tq.D_INCREMENTAL_PROBE_SQL)
    register("d_survivor_by_quality", tq.d_survivor_by_quality, tq.D_SURVIVOR_SQL)
    register("d_decontaminate", tq.d_decontaminate, tq.D_DECONTAM_SQL)
    register("d_span_dedup", tq.d_span_dedup, tq.D_SPAN_SQL)
    register("t_stratified_sample", tq.t_stratified_sample, tq.T_STRATIFIED_SQL)
    register("t_top_ngrams", tq.t_top_ngrams, tq.T_TOP_NGRAMS_SQL)
    register("t_quality_filter", tq.t_quality_filter, tq.T_QUALITY_FILTER_SQL)
    register("t_curate_corpus", tq.t_curate_corpus, tq.T_CURATE_SQL)
    register("t_pack_offsets", tq.t_pack_offsets, tq.T_PACK_SQL)
    register("t_mixture_sample", tq.t_mixture_sample, tq.T_MIXTURE_SQL)
    register("t_topk_per_stratum_sample", tq.t_topk_per_stratum_sample, tq.T_TOPK_STRATUM_SQL)
    register("t_lm_score", tq.t_lm_score, tq.T_LM_SCORE_SQL)
    register("t_keyword_topk", tq.t_keyword_topk, tq.T_KEYWORD_SQL)

    from sync_spark.operators import retrieval as rt

    register("t_bm25_topk", rt.t_bm25_topk, rt.T_BM25_SQL)
    register("t_chunk_docs", rt.t_chunk_docs, rt.T_CHUNK_SQL)
    register("t_rrf_fuse", rt.t_rrf_fuse, rt.T_RRF_SQL)
    register("t_hybrid_fuse", rt.t_hybrid_fuse, rt.T_HYBRID_SQL)
    # index-SERVING twins (r9): same semantics from the persisted
    # stores — t_rrf_indexed is bit-exact to the t_rrf_fuse oracle;
    # t_hybrid_indexed's dense leg is the LSH approximation (no SQL
    # oracle; pytest-pinned == its legs' scan forms)
    register("t_rrf_indexed", rt.t_rrf_indexed, rt.T_RRF_SQL)
    register("t_hybrid_indexed", rt.t_hybrid_indexed, None)
    register("t_retrieval_eval", rt.t_retrieval_eval, rt.T_RETRIEVAL_EVAL_SQL)

    from sync_spark.operators import extended_queries as xq

    register("x_asof_join", xq.x_asof_join, xq.X_ASOF_SQL)
    register("x_range_join", xq.x_range_join, xq.X_RANGE_SQL)
    register("x_sessionize", xq.x_sessionize, xq.X_SESSION_SQL)
    register("s21_sql_passthrough", xq.s21_sql_passthrough, xq.S21_SQL)
    register("s_profile_table", xq.s_profile_table, xq.S_PROFILE_SQL)
    register("a_pivot_daily_types", xq.a_pivot_daily_types, xq.A_PIVOT_SQL)
    register("a_rollup_revenue", xq.a_rollup_revenue, xq.A_ROLLUP_SQL)
    register("a_approx_distinct", xq.a_approx_distinct, None)
    register("a_quantile_sketch", xq.a_quantile_sketch, None)
    register("a_percentiles", xq.a_percentiles, xq.A_PERCENTILES_SQL)
    register("a_hopping_window", xq.a_hopping_window, xq.A_HOPPING_SQL)
    register("a_session_window_agg", xq.a_session_window_agg, xq.A_SESSION_WINDOW_SQL)
    register("a_retention_cohorts", xq.a_retention_cohorts, xq.A_RETENTION_SQL)
    register("a_funnel_steps", xq.a_funnel_steps, xq.A_FUNNEL_SQL)
    register("f_array_explode", xq.f_array_explode, xq.F_ARRAY_EXPLODE_SQL)
    register("a_cube_revenue", xq.a_cube_revenue, xq.A_CUBE_SQL)
    register("f_unpivot", xq.f_unpivot, xq.F_UNPIVOT_SQL)
    register("a_grouping_sets", xq.a_grouping_sets, xq.A_GROUPING_SETS_SQL)
    register("f_map_funcs", xq.f_map_funcs, xq.F_MAP_SQL)

    from sync_spark.operators import check_queries as ck

    register("chk_minhash_lsh", ck.chk_minhash_lsh, ck.CHK_MINHASH_SQL)
    register("chk_minhash_clusters", ck.chk_minhash_clusters, ck.CHK_MINHASH_CLUSTERS_SQL)
    register("chk_simhash", ck.chk_simhash, ck.CHK_SIMHASH_SQL)
    register("chk_ann_lsh", ck.chk_ann_lsh, ck.CHK_ANN_LSH_SQL)
    register("chk_ann_ivf", ck.chk_ann_ivf, ck.CHK_ANN_IVF_SQL)
    register("chk_ann_pq", ck.chk_ann_pq, ck.CHK_ANN_PQ_SQL)
    register("chk_semantic_dedup", ck.chk_semantic_dedup, ck.CHK_SEMANTIC_SQL)
    register("chk_semdedup_sweep", ck.chk_semdedup_sweep, ck.CHK_SEMDEDUP_SWEEP_SQL)
    register("chk_approx_distinct", ck.chk_approx_distinct, ck.CHK_APPROX_DISTINCT_SQL)
    register("chk_quantile_sketch", ck.chk_quantile_sketch, ck.CHK_QUANTILE_SQL)
    register("chk_embed_neardup", ck.chk_embed_neardup, ck.CHK_EMBED_NEARDUP_SQL)

    from sync_spark.operators import passthrough as pt

    register("pt_mongo_find", pt.pt_mongo_find, pt.PT_MONGO_SQL)
    register("pt_redis_keys", pt.pt_redis_keys, pt.PT_REDIS_SQL)
    register("pt_mongo_update", pt.pt_mongo_update, pt.PT_MONGO_UPDATE_SQL)
    register("pt_mongo_delete", pt.pt_mongo_delete, pt.PT_MONGO_DELETE_SQL)
    register("pt_merge_into", pt.pt_merge_into, pt.PT_MERGE_SQL)
    register("pt_mongo_aggregate", pt.pt_mongo_aggregate, pt.PT_MONGO_AGG_SQL)

    from sync_spark.operators import tpch_queries as th

    register("q3_shipping_priority", th.q3_shipping_priority, th.Q3_SQL)
    register("q10_returned_items", th.q10_returned_items, th.Q10_SQL)
    register("q18_large_orders", th.q18_large_orders, th.Q18_SQL)
    register("q12_priority_shipping", th.q12_priority_shipping, th.Q12_SQL)
    register("q5_local_supplier_volume", th.q5_local_supplier_volume, th.Q5_SQL)
    register("q4_priority_late_ship", th.q4_priority_late_ship, th.Q4_SQL)
    register("q6_forecast_revenue", th.q6_forecast_revenue, th.Q6_SQL)
    register("q7_volume_shipping", th.q7_volume_shipping, th.Q7_SQL)
    register("q9_product_profit", th.q9_product_profit, th.Q9_SQL)
    register("q13_customer_distribution", th.q13_customer_distribution, th.Q13_SQL)
    register("q15_top_supplier", th.q15_top_supplier, th.Q15_SQL)
    register("q16_supplier_part_counts", th.q16_supplier_part_counts, th.Q16_SQL)
    register("q17_small_quantity_revenue", th.q17_small_quantity_revenue, th.Q17_SQL)
    register("q19_discounted_revenue", th.q19_discounted_revenue, th.Q19_SQL)
    register("q22_global_sales_opportunity", th.q22_global_sales_opportunity, th.Q22_SQL)
    register("q8_market_share", th.q8_market_share, th.Q8_SQL)
    register("q11_important_parts", th.q11_important_parts, th.Q11_SQL)
    register("q21_waiting_suppliers", th.q21_waiting_suppliers, th.Q21_SQL)
    register("q2_min_cost_supplier", th.q2_min_cost_supplier, th.Q2_SQL)
    register("q20_excess_suppliers", th.q20_excess_suppliers, th.Q20_SQL)

    from sync_spark.operators import media_queries as mq

    register("m_media_roundtrip", mq.m_media_roundtrip, mq.M_MEDIA_SQL)
    register("m_media_resize", mq.m_media_resize, mq.M_RESIZE_SQL)
    register("m_media_resample", mq.m_media_resample, mq.M_RESAMPLE_SQL)
    register("m_frame_sample", mq.m_frame_sample, mq.M_FRAME_SAMPLE_SQL)
    register("m_media_mp3", mq.m_media_mp3, mq.M_MP3_SQL)
    register("m_media_h264", mq.m_media_h264, mq.M_H264_SQL)
    register("q14_promo_revenue", th.q14_promo_revenue, th.Q14_SQL)

    from sync_spark.operators import sketch_queries as sk

    register("a_hll_merge_rollup", sk.a_hll_merge_rollup, sk.A_HLL_ROLLUP_SQL)
    register("a_theta_set_ops", sk.a_theta_set_ops, sk.A_THETA_SET_SQL)
    register("a_rolling_distinct_users", sk.a_rolling_distinct_users, sk.A_ROLLING_DISTINCT_SQL)

    register("t_dsir_select", tq.t_dsir_select, tq.T_DSIR_SQL)
    register("t_unimax_alloc", tq.t_unimax_alloc, tq.T_UNIMAX_SQL)
    register(
        "t_quality_classifier",
        tq.t_quality_classifier,
        tq.T_QUALITY_CLASSIFIER_SQL,
    )
    register(
        "d_bloom_decontaminate",
        tq.d_bloom_decontaminate,
        tq.D_BLOOM_DECONTAM_SQL,
    )

    register("d_source_overlap", tq.d_source_overlap, tq.D_SOURCE_OVERLAP_SQL)
    register("t_ppl_buckets", tq.t_ppl_buckets, tq.T_PPL_BUCKETS_SQL)
    register("e_label_centroids", tq.e_label_centroids, tq.E_LABEL_CENTROIDS_SQL)

    from sync_spark.operators import bpe

    register("t_bpe_train", bpe.t_bpe_train, None)
    register("chk_bpe_train", bpe.chk_bpe_train, bpe.CHK_BPE_TRAIN_SQL)
    register("t_bpe_fertility", bpe.t_bpe_fertility, None)
    register("chk_bpe_fertility", bpe.chk_bpe_fertility, bpe.CHK_BPE_FERTILITY_SQL)

    # flag flips only AFTER every registration succeeded — setting it
    # first would make a mid-populate exception leave a silently
    # partial registry for every later call (the driver's gate would
    # then skip dozens of queries with no error)
    _populated = True
