"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship slice at sf0.001; ``queries()`` /
``oracle_sql()`` — the declared operator inventory (SURVEY.md §2) with
DuckDB oracles. Implementations live in ``etlutils_spark.entry_queries``
(and the extension modules it imports); this file is the thin, stable
driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from etlutils_spark.entry_queries import REGISTRY  # noqa: E402
import etlutils_spark.relational_queries  # noqa: E402,F401  (registers into REGISTRY)
import etlutils_spark.extension_queries  # noqa: E402,F401  (registers into REGISTRY)
import etlutils_spark.event_queries  # noqa: E402,F401  (registers into REGISTRY)
import etlutils_spark.udf_queries  # noqa: E402,F401  (registers into REGISTRY)
import etlutils_spark.pipeline_queries  # noqa: E402,F401  (registers into REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: chunked ingest -> broadcast lookup join (matchmerge) ->
    decimal-exact revenue rollup per brand. Mirrors the reference's
    flagship read.dbi.ffdf + matchmerge flow (R/ffsql.R:53-65,
    R/matchmerge.R:81-94) on the sf0.001 star."""
    from pyspark.sql import functions as F

    from etlutils_spark.operators.matchmerge import matchmerge
    from etlutils_spark.sources.files import read_table

    sf_dir = "/root/testdata/sf0.001"
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    joined = matchmerge(li, part, by_x="l_partkey", by_y="p_partkey",
                        add_columns=["p_brand"])
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return (
        joined.groupBy("p_brand")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


# Queries already driver-verified in CORRECTNESS_r01..r04. The driver
# checks a fixed-size prefix of the registry in order; rotating the
# never-yet-checked (or changed-this-round) queries to the front
# maximizes cumulative verified coverage across rounds (VERDICT.md r2
# "Next round" #1). Within each tier the original registration order is
# preserved. All 50 CORRECTNESS_r04 rows were fully green
# (rows/schema/hash) and are folded in below, so the only unchecked
# tier left is the 9 never-driver-checked queries — they now sort
# first, giving 162/162 cumulative driver verification after r5
# (VERDICT.md r4 "Next round" #1).
_DRIVER_VERIFIED_PRIOR_ROUNDS = frozenset({
    # --- r4 green rows (CORRECTNESS_r04.json, 50/50) ---
    "ann_arrow_topk", "ann_ivf_topk", "ann_lsh_topk",
    "ann_pq_recall_contract", "approx_distinct_contract",
    "approx_quantiles_contract", "asof_next_purchase",
    # bigram_lm_quality + streaming_funnel deliberately absent despite
    # green r4 rows: their r5 registrations changed (AQE-chosen join
    # strategy for the bigram model tables; tie-safe micro-batch
    # slicing) and must re-check in the new form.
    "bm25_topk_search", "cohort_retention",
    "constraint_audit", "curation_pipeline_batch",
    "curation_pipeline_tokens", "decontaminate_semantic_embeddings",
    "dedup_containment", "dedup_simhash", "dedup_window_rewrite",
    "dedup_window_spans", "dedup_window_spans_shifted",
    "embedding_cluster_assign", "format_roundtrip_orc",
    "full_outer_reconcile", "funnel_stages_user",
    "heavy_hitters_contract", "hilbert_curve_order2",
    "incremental_lsh_pairs", "incremental_span_dedup",
    "knn_label_consistency",
    # leakage_safe_split re-fronted: its r5 form labels components with
    # the star algorithm (value-identical, different plan) — re-check.
    "multimodal_features", "multimodal_probe", "pack_ids_export",
    "profile_embeddings", "quality_percentile_prune",
    "quality_rank_blend", "salted_agg_event_types",
    "salted_join_hotkey", "scd2_history", "semantic_dedup_survivors",
    "streaming_interval_join",
    "token_budget_sample", "tokenize_to_ids", "train_val_test_split",
    "unpivot_order_metrics", "vocab_oov_rate", "vocab_top_tokens",
    "winnow_fingerprints", "winnow_overlap_pairs",
    "zorder_pruning_stats",
    # --- r1..r3 green rows ---
    "agg_cube", "agg_rollup", "ann_cosine_topk",
    "anti_join_customers", "append_union",
    "asof_last_purchase", "chunk_documents_windows",
    "cogroup_asof_enrich", "collect_sorted_sizes", "corpus_rarity",
    "correlated_subquery", "decontaminate_overlap",
    "dedup_cluster_survivors", "dedup_embedding_cosine", "dedup_exact",
    "dedup_exact_survivors", "dedup_minhash_clusters",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "delegated_sql",
    "distinct_agg_segments", "explode_token_freq",
    "factor_levels_brand", "format_roundtrip_csv",
    "format_roundtrip_json", "fuzzy_matchmerge_segments",
    "grouped_apply_rank", "grouping_sets_sql", "having_filter",
    "histogram_price_buckets", "ingest_limit", "json_extract_props",
    "json_map_explode", "lateral_topk_per_nation", "locf_events",
    "matchmerge_composite_key", "matchmerge_expr_key",
    "matchmerge_inner", "matchmerge_left", "matchmerge_vector_y",
    "mixture_resample_lang", "multimodal_audio_chunks",
    "multimodal_meta", "outlier_flags_events",
    "pack_sequences_source", "pandas_udf_normalize",
    "percentile_quantity", "pivot_status_counts", "profile_documents",
    "q10_returned_items", "q11_important_stock",
    "q12_late_shipment_priority", "q13_customer_order_distribution",
    "q14_promo_share", "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_disjunctive_filter", "q1_pricing_summary",
    "q20_excess_stock_suppliers", "q21_waiting_supplier",
    "q22_idle_rich_customers", "q2_min_cost_supplier",
    "q3_top_revenue_orders", "q4_priority_returns",
    "q5_nation_revenue", "q6_revenue_forecast", "q7_volume_shipping",
    "q8_market_share", "q9_product_type_profit", "quality_filter_flags",
    "range_join_purchase_window", "recode_mktsegment",
    "rename_project", "sample_hash_10pct", "sample_stratified_lang",
    "scalar_funcs_projection", "semi_join_customers", "sessionize_events",
    "sessionize_native_window", "sessionize_stateful_evicted",
    "set_except", "set_intersect", "shard_manifest", "stats_moments",
    "streaming_curation_pipeline", "streaming_window_counts",
    "text_fingerprint", "text_lang_id", "text_redact_pii",
    "text_repetition", "text_stats", "text_token_counts",
    "time_rollup_multigrain", "transfun_derived_date",
    "union_distinct_nations", "upsert_scd1", "window_rank_functions",
    "window_rolling_7d", "window_running_spend",
    "window_topk_per_customer", "write_roundtrip",
})


# After folding r4's 50 green rows into the verified set, the
# unchecked tier is exactly the 9 never-driver-checked queries
# (multimodal_frame_sample, multimodal_resize, mixture_temperature_lang,
# profile_drift_documents, text_token_gini, window_multi_horizon,
# user_cadence_stats, hard_negative_mining,
# dedup_cluster_size_histogram). They sort first so the r5 window
# lands a driver row on each; all 9 pass the local oracle sweep at
# sf0.001/0.01.


def _ordered_names() -> list[str]:
    names = list(REGISTRY)
    unchecked = [n for n in names if n not in _DRIVER_VERIFIED_PRIOR_ROUNDS]
    checked = [n for n in names if n in _DRIVER_VERIFIED_PRIOR_ROUNDS]
    return unchecked + checked


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name][1]
        for name in _ordered_names()
        if REGISTRY[name][1] is not None
    }
