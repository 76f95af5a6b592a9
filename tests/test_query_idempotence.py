"""Driver-contract hygiene: queries are re-runnable within one session
(the harness and driver may call them repeatedly; persisted
intermediates must not corrupt results)."""

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(str, df.collect()))


def test_queries_rerun_identical(spark):
    qs = em.queries()
    for name in ["dedup_minhash_lsh", "dedup_ngram_jaccard", "streaming_window_counts",
                 "matchmerge_composite_key", "mixture_resample_lang",
                 "dedup_cluster_survivors", "streaming_curation_pipeline",
                 # r4: tracked-persist (scd2), memory-sink counter
                 # (interval join), multi-stage chain (curation)
                 "scd2_history", "streaming_interval_join",
                 "curation_pipeline_batch",
                 # late r4: tracked-persist span/fingerprint/cluster tiers
                 "dedup_window_spans", "winnow_overlap_pairs",
                 "semantic_dedup_survivors", "token_budget_sample",
                 "curation_pipeline_tokens",
                 # continuation: driver-collected state (PQ codebooks /
                 # ADC LUTs), data-dependent rates, corpus-stat joins
                 "ann_pq_recall_contract", "bm25_topk_search",
                 "bigram_lm_quality", "mixture_temperature_lang",
                 "quality_rank_blend", "funnel_stages_user",
                 "streaming_funnel", "knn_label_consistency",
                 "profile_drift_documents"]:
        a = _rows(qs[name](spark, SF))
        b = _rows(qs[name](spark, SF))
        assert a == b, name


def test_registry_names_are_unique_and_nonempty(spark):
    qs = em.queries()
    assert len(qs) >= 50
    for name, fn in list(qs.items())[:3]:
        assert callable(fn)
