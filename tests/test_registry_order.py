"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-8-generation rows left WITHOUT a fresh row after round 12's
# 50-slot prefix — round 13 fronts these (VERDICT r12 ask #1; the set was
# machine-cross-checked against the CORRECTNESS_r01..r12 union: exactly
# the 39 queries whose newest green driver row is r8).
ROUND13_QUEUE: set[str] = {
    "events_sessionize",
    "ann_recall_measured",
    "ann_signlsh_topk",
    "c1_recursive_chunk",
    "c3_adaptive_chunk",
    "corpus_curation_funnel",
    "corpus_holdout_split",
    "corpus_source_cap",
    "dedup_simhash",
    "dedup_soft_reweight",
    "dedup_winnow_pairs",
    "emb_int8_quant",
    "events_approx_distinct_bounded",
    "events_asof_join",
    "events_forget_users",
    "events_incremental_agg",
    "events_transition_matrix",
    "multimodal_frame_sample",
    "quality_rho_excess",
    "rel_customer_distribution",
    "rel_disjunctive_revenue",
    "rel_forecast_revenue",
    "rel_late_ship_orders",
    "rel_nation_revenue",
    "rel_order_gaps",
    "rel_promo_revenue_pct",
    "rel_returned_item_revenue",
    "rel_top3_orders_per_priority",
    "rel_top_supplier",
    "rel_volume_shipping",
    "s1_parse_docx",
    "s1_parse_eml",
    "s1_parse_pptx",
    "s2_multi_fetch",
    "sim_knn_join",
    "stream_hopping_agg",
    "stream_watermark_dedup",
    "text_repetition",
    "text_winnow_fingerprint",
}


# Registered AFTER round 12's 50-slot prefix was spent (judge-verified
# MATCH in the round-12 sweep, but no driver row yet) — round 13 fronts
# these alongside ROUND13_QUEUE.
ROUND13_NEW: set[str] = {
    "ann_recall_trained_vs_seeded",  # trained-vs-seeded quantizer recall
    "multimodal_phash_jpeg_prog",  # progressive (SOF2) perceptual dedup
    "multimodal_phash_jpeg_rst",  # restart-interval (DRI/RSTn) dedup
}


# New in round 13, or implementation changed in round 13 (prior driver
# rows, if any, describe code that no longer exists). Grown as round-13
# waves land.
ROUND13_CHANGED: set[str] = {
    "quality_logreg_distill",  # exact integral div in _tz_div (ADVICE r12)
    "ann_index_retrain_lloyd",  # stamps + serves the tuned nprobe (ask #2)
    "pipeline_forget_e2e",  # single-slice meta writes + phase trim (ask #5)
}

# Queries NEW in round 13 (no prior driver row by definition).
ROUND13_R13NEW: set[str] = {
    "ann_ivf_nprobe_select",  # measured nprobe auto-tune (ask #2)
    "multimodal_phash_jpeg_sa",  # successive-approximation JPEG (ask #3)
    "multimodal_png_interlaced",  # Adam7 interlaced PNG (ask #6)
}

ROUND13_MUST_FRONT: set[str] = (
    ROUND13_QUEUE | ROUND13_NEW | ROUND13_CHANGED | ROUND13_R13NEW
)

# Registered AFTER round 13's 50-slot prefix was spent (verified locally
# at all three SFs, no driver row yet) — round 14 fronts these alongside
# ROUND14_QUEUE.
ROUND14_NEW: set[str] = {
    "multimodal_phash_jpeg422",  # 4:2:2 (video-derived) chroma layout
    "multimodal_phash_jpeg_pc",  # progressive COLOR (4:4:4 SOF2)
    "multimodal_gif_interlaced",  # four-pass GIF89a de-interlace
}

# Round-9-generation rows left WITHOUT a fresh row after round 13's
# 50-slot prefix is spent — round 14 must front these before anything
# merely stale from r10. (The r9 fill rows that DO make this round's
# prefix are deliberately absent; finalized when the round is sealed.)
ROUND14_QUEUE: set[str] = {
    "corpus_doremi_weights",
    "corpus_ngram_novelty",
    "corpus_pack_windows",
    "corpus_ppl_quality_corr",
    "corpus_unimax_mix",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_blocked",
    "dedup_lsh_scurve",
    "dedup_ngram_jaccard",
    "dedup_segment_exact",
    "dedup_substring_span",
    "emb_covariance",
    "emb_dim_stats",
    "emb_matryoshka_agreement",
    "emb_outlier_zscore",
    "emb_pca_project",
    "events_funnel_time",
    "events_hopping_agg",
    "events_props_extract",
    "events_props_json",
    "events_session_window",
    "events_tumbling_agg",
    "multimodal_features",
    "multimodal_phash_dedup",
    "multimodal_real_decode",
    "multimodal_resize",
    "q2_ranking_metrics",
    "rel_cube_flag_status",
    "rel_important_stock",
    "rel_join_key_skew",
    "rel_local_supplier_volume",
    "rel_min_cost_supplier",
    "rel_pareto_revenue",
    "rel_part_brand_stats",
    "rel_parts_supplier_count",
    "rel_product_profit",
    "rel_promotion_suppliers",
    "rel_revenue_trend",
    "rel_shipmode_priority",
    "rel_shipping_priority",
    "stream_bm25_append",
    "text_bpe_train",
    "stream_interval_join_outer",
    "stream_window_topk",
    "text_c4_filters",
    "text_dsir_weight",
    "text_vocab_coverage",
}


def test_round13_sets_are_registered_and_oracled():
    for name in ROUND13_MUST_FRONT | ROUND14_QUEUE | ROUND14_NEW:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_round13_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = ROUND13_MUST_FRONT - prefix
    assert not missing, f"outside the 50-entry driver prefix: {missing}"


def test_round14_queue_not_double_counted():
    # a row can't both get a fresh r13 driver row and queue for r14
    prefix = set(list(queries())[:50])
    overlap = ROUND14_QUEUE & prefix
    assert not overlap, f"in both the r13 prefix and ROUND14_QUEUE: {overlap}"


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
