"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-7's queue: the thirty-five round-3-generation rows whose newest driver
# row was still r3 after round 7's 50-slot prefix was spent — round 8 MUST
# front them so the oldest attestation anywhere in the registry is >= r4
# (VERDICT r7 ask #1).
ROUND8_QUEUE: set[str] = {
    "ann_ivf_topk",
    "ann_recall_measured",
    "ann_signlsh_topk",
    "c2_markdown_chunk",
    "c3_adaptive_chunk",
    "corpus_curation_funnel",
    "corpus_holdout_split",
    "corpus_source_cap",
    "dedup_exact",
    "dedup_simhash",
    "emb_int8_quant",
    "events_approx_distinct_bounded",
    "events_forget_users",
    "events_incremental_agg",
    "events_transition_matrix",
    "multimodal_frame_sample",
    "q1_topk_cosine",
    "q2_hitrate",
    "rel_customer_distribution",
    "rel_disjunctive_revenue",
    "rel_forecast_revenue",
    "rel_late_ship_orders",
    "rel_nation_revenue",
    "rel_order_gaps",
    "rel_pricing_summary",
    "rel_promo_revenue_pct",
    "rel_returned_item_revenue",
    "rel_top3_orders_per_priority",
    "rel_top_supplier",
    "rel_volume_shipping",
    "sim_knn_join",
    "stream_hopping_agg",
    "stream_watermark_dedup",
    "text_repetition",
    "text_token_bpe",
}

# New in round 8, or implementation changed in round 8 (prior driver rows, if
# any, describe code that no longer exists). Grown as round-8 waves land.
ROUND8_MUST_FRONT: set[str] = ROUND8_QUEUE | {
    "c1_recursive_chunk",  # oracle added (VERDICT r7 ask #3)
    "s2_multi_fetch",      # executor-side multi-URL crawl fan-out (ask #6)
    "dedup_soft_reweight",     # SoftDeDup commonness reweighting (new)
    "text_winnow_fingerprint", # MOSS winnowing fingerprints (new)
    "corpus_unimax_mix",       # UniMax epoch-capped waterfill mixing (new)
    "quality_rho_excess",      # fused LM arms over one statistic (changed)
    "corpus_ppl_quality_corr", # exact-integer floor-quantized means (changed)
    "dedup_winnow_pairs",      # winnowing as a dedup path (new)
}

# Round-4-generation refresh rows LISTED in DRIVER_ORDER's fill section:
# best-effort — whichever fall outside the final 50-entry prefix (new code
# outranks refresh) stay r4-generation and must front in round 9 before
# anything merely stale from r5.
ROUND4_FILL: set[str] = {
    "s1_parse_pdf",
    "s1_parse_docx",
    "s1_parse_eml",
    "s1_parse_pptx",
    "events_asof_join",
    "events_sessionize",
    "dedup_ngram_jaccard",
    "dedup_segment_exact",
    "emb_pca_project",
    "rel_shipping_priority",
    "multimodal_real_decode",
    "stream_window_topk",
    "rel_join_key_skew",
    "text_dsir_weight",
}

# Round-4-generation rows left WITHOUT a fresh row after round 8's 50-slot
# prefix — round 9 must front these (plus whatever ROUND4_FILL rows fell
# outside the final prefix) before anything merely stale from r5.
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


def test_round8_queue_is_registered():
    for name in ROUND8_QUEUE | ROUND9_QUEUE:
        assert name in REGISTRY, name


def test_round8_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = ROUND8_MUST_FRONT - prefix
    assert not missing, f"outside the 50-entry driver prefix: {missing}"


def test_round8_front_queries_registered_and_oracled():
    for name in ROUND8_MUST_FRONT:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_round4_fill_is_registered():
    for name in ROUND4_FILL:
        assert name in REGISTRY, name


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
