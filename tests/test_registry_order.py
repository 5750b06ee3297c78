"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-8's queue: the twenty-nine round-4-generation rows whose newest
# driver row was still r4 after round 8's 50-slot prefix was spent — round 9
# MUST front them (VERDICT r8 ask #1).
ROUND9_QUEUE: set[str] = {
    "ann_pq_adc_topk",
    "corpus_ngram_novelty",
    "corpus_pack_windows",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_blocked",
    "dedup_substring_span",
    "emb_covariance",
    "emb_dim_stats",
    "emb_matryoshka_agreement",
    "emb_outlier_zscore",
    "events_funnel_time",
    "events_hopping_agg",
    "events_props_extract",
    "events_props_json",
    "events_session_window",
    "events_tumbling_agg",
    "multimodal_features",
    "multimodal_resize",
    "rel_important_stock",
    "rel_local_supplier_volume",
    "rel_min_cost_supplier",
    "rel_pareto_revenue",
    "rel_parts_supplier_count",
    "rel_product_profit",
    "rel_promotion_suppliers",
    "rel_revenue_trend",
    "rel_shipmode_priority",
    "stream_interval_join_outer",
    "text_vocab_coverage",
}

# The eight ROUND4_FILL rows that fell past round 8's 50-entry boundary
# (new code outranked refresh) — still r4-generation, fronted with the queue.
ROUND4_FILL_CARRYOVER: set[str] = {
    "dedup_ngram_jaccard",
    "dedup_segment_exact",
    "emb_pca_project",
    "multimodal_real_decode",
    "rel_join_key_skew",
    "rel_shipping_priority",
    "stream_window_topk",
    "text_dsir_weight",
}

# New in round 9, or implementation changed in round 9 (prior driver rows, if
# any, describe code that no longer exists). Grown as round-9 waves land.
ROUND9_MUST_FRONT: set[str] = ROUND9_QUEUE | ROUND4_FILL_CARRYOVER | {
    "corpus_unimax_mix",        # zero-token-source guard (ADVICE r8)
    "corpus_ppl_quality_corr",  # exact-integer Pearson closed form (ADVICE r8)
    # float-hazard hardening sweep (VERDICT r9 ask #2): grid-valued
    # round(avg(...)) and integer-ratio round() sites rewritten to exact
    # integer-unit sums / floor-quantized ratios. Four more sweep rows
    # (corpus_ngram_novelty, text_vocab_coverage, rel_pareto_revenue,
    # events_funnel_time) are already in ROUND9_QUEUE above.
    "corpus_doremi_weights",
    "rel_pricing_summary",
    "q2_ranking_metrics",
    "dedup_lsh_scurve",
    "text_c4_filters",
    "rel_part_brand_stats",
    "rel_cube_flag_status",
    # new in round 9
    "multimodal_phash_dedup",   # dHash image near-dup (VERDICT ask #3)
    "text_bpe_train",           # distributed BPE merge training (ask #4)
    # implementation changed in round 9 (restore_manifest amortization)
    "stream_bm25_append",
}

# Registered AFTER round 9's 50-slot prefix (locally verified at
# sf0.001/0.01/0.1) — round 10 must front these alongside the queue
# below and the 7 deferred hazard-hardening rows (ROUND9_NOTES section 1).
ROUND10_NEW: set[str] = {
    "multimodal_phash_clusters",  # phash pairs -> CC -> keep decisions
}

# Round-5-generation rows left WITHOUT a fresh row after round 9's 50-slot
# prefix — round 10 must front these (minus any that round 9's fill slots
# reach) before anything merely stale from r6. Two r5 rows
# (rel_part_brand_stats, rel_cube_flag_status) are hardened+fronted in
# round 9 and are deliberately absent here.
ROUND10_QUEUE: set[str] = {
    "agg_salted_user_totals",
    "corpus_ccnet_buckets",
    "corpus_epoch_schedule",
    "corpus_gopher_funnel",
    "corpus_mix_weights",
    "corpus_temperature_mix",
    "dedup_drop_exact",
    "dedup_lsh_recall_audit",
    "e_hash_embed",
    "emb_pq_distortion",
    "multimodal_png_decode",
    "multimodal_wav_resample",
    "pipeline_full",
    "rel_approx_quantile_bounded",
    "rel_customers_without_orders",
    "rel_moving_30d_revenue",
    "rel_orders_with_big_lineitems",
    "rel_percentiles",
    "rel_pivot_status_priority",
    "rel_region_customer_rollup",
    "rel_rollup_lineitem",
    "rel_set_ops",
    "rel_suppliers_above_avg",
    "s1_parse_epub",
    "sample_stratified",
    "shard_token_budget",
    "sink_partition_skew_audit",
    "text_bigram_logprob",
    "text_fingerprint",
    "text_gopher_quality",
    "text_lang_confusion",
    "text_lang_id",
    "text_quality",
    "text_repetition_ratios",
    "text_tfidf_topterms",
    "text_zipf_fit",
}


def test_round9_queue_is_registered():
    for name in (
        ROUND9_QUEUE | ROUND4_FILL_CARRYOVER | ROUND10_QUEUE | ROUND10_NEW
    ):
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_round9_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = ROUND9_MUST_FRONT - prefix
    assert not missing, f"outside the 50-entry driver prefix: {missing}"


def test_round9_front_queries_registered_and_oracled():
    for name in ROUND9_MUST_FRONT:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_driver_order_is_valid():
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicates"
    stale = [n for n in DRIVER_ORDER if n not in REGISTRY]
    assert not stale, f"DRIVER_ORDER names not in REGISTRY: {stale}"
    # the driver validates exactly the FIRST 50 queries() entries; listing
    # extra fill rows past that is fine (they fall outside the prefix), but
    # DRIVER_ORDER must at least cover the whole prefix
    assert len(DRIVER_ORDER) >= 50, "DRIVER_ORDER shorter than the prefix"


def test_register_rejects_duplicate_names():
    from yaml_pipe_spark.entrypoints import register

    with pytest.raises(ValueError, match="duplicate query registration"):

        @register("flagship", None)
        def _dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_every_registry_entry_is_emitted():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    # oracle dict is a subset in the same order
    keys = list(oracle_sql())
    assert keys == [n for n in names if REGISTRY[n].oracle is not None]
