"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-7-generation rows left WITHOUT a fresh row after round 11's
# 50-slot prefix — round 12 fronts these (VERDICT r11 ask #1; the set was
# machine-cross-checked against the CORRECTNESS_r01..r11 union).
ROUND12_QUEUE: set[str] = {
    "corpus_dedup_funnel",
    "corpus_dup_rate_by_source",
    "corpus_snapshot_churn",
    "corpus_snapshot_psi",
    "corpus_split_leakage_audit",
    "corpus_url_canonical_dedup",
    "dedup_canonical_quality",
    "dedup_cluster_resolution",
    "dedup_containment",
    "dedup_fuzzy_decontaminate",
    "dedup_levenshtein_verify",
    "dedup_semantic_cluster",
    "dedup_simhash_pairs",
    "graph_pagerank_centrality",
    "graph_store_persisted",
    "layout_zorder_locality",
    "q3_bm25_index_persisted",
    "q3_hybrid_lexical_vector",
    "q3_hybrid_rrf",
    "quality_nb_distill",
    "rel_sales_opportunity",
    "rel_small_qty_revenue",
    "rel_waiting_suppliers",
    "s2_normalize_lines",
    "s4_events_content",
    "sample_kcenter_coreset",
    "stream_dedup_first_arrival",
    "stream_stateful_counter",
    "stream_interval_join",
    "stream_session_window",
    "stream_static_enrich",
    "stream_tumbling_agg",
    "t3_state_merge",
    "text_blocklist_filter",
    "text_bloom_decontaminate",
    "text_pii_redact",
    "text_unigram_logprob",
}

# New in round 12, or implementation changed in round 12 (prior driver
# rows, if any, describe code that no longer exists). Grown as round-12
# waves land.
ROUND12_CHANGED: set[str] = {
    "pipeline_forget_e2e",  # batched-action trim (VERDICT r11 ask #4)
    "emb_kmeans_lloyd",  # Lloyd-trained coarse quantizer (ask #2)
    "ann_index_retrain_lloyd",  # retrain consuming trained centroids (#2)
    "quality_logreg_distill",  # GD-trained linear quality classifier (#6)
    "multimodal_phash_jpeg_color",  # YCbCr 4:4:4 color JPEG dedup (ask #5)
    "multimodal_phash_jpeg420",  # 4:2:0 subsampled — beyond the asks
}

ROUND12_MUST_FRONT: set[str] = ROUND12_QUEUE | ROUND12_CHANGED

# Round-8-generation rows left WITHOUT a fresh row after round 12's
# 50-slot prefix is spent (the 6 r8 fill rows that make the prefix —
# q1_topk_cosine, q2_hitrate, dedup_exact, ann_ivf_topk, c2_markdown_chunk,
# s1_parse_pdf — are deliberately absent; events_sessionize was pushed
# past the boundary by the sixth round-12 row and stays queued) —
# round 13 must front these before anything merely stale from r9.
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


# Registered AFTER round 12's 50-slot prefix was spent (no driver row
# yet) — round 13 fronts these alongside ROUND13_QUEUE.
ROUND13_NEW: set[str] = {
    "ann_recall_trained_vs_seeded",  # trained-vs-seeded quantizer recall
    "multimodal_phash_jpeg_prog",  # progressive (SOF2) perceptual dedup
    "multimodal_phash_jpeg_rst",  # restart-interval (DRI/RSTn) dedup
}


def test_round12_sets_are_registered_and_oracled():
    for name in ROUND12_MUST_FRONT | ROUND13_QUEUE | ROUND13_NEW:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_round12_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = ROUND12_MUST_FRONT - prefix
    assert not missing, f"outside the 50-entry driver prefix: {missing}"


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
