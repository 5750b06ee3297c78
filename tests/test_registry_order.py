"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# New in round 4 or implementation/oracle changed in round 4: their prior
# driver rows (r3's red emb_covariance included) describe code that no longer
# exists, so round 4 MUST front them. Grow this set alongside the registry.
ROUND4_MUST_FRONT: set[str] = {
    "emb_covariance",
    "emb_pca_project",
    "multimodal_features",
    "multimodal_real_decode",
    "corpus_pack_windows",
    "dedup_substring_span",
    "stream_interval_join_outer",
    "dedup_containment",
    "corpus_ngram_novelty",
    "ann_ivf_nprobe_curve",
    "text_vocab_coverage",
    "rel_join_key_skew",
    "events_funnel_time",
    "rel_pareto_revenue",
    "corpus_dedup_funnel",
    "multimodal_resize",
    "emb_outlier_zscore",
    "s1_parse_eml",
    "s1_parse_pptx",
    "s1_parse_docx",
    "s1_parse_pdf",
    "rel_revenue_trend",
    "rel_min_cost_supplier",
    "rel_shipping_priority",
    "rel_product_profit",
    "rel_important_stock",
    "rel_shipmode_priority",
    "rel_parts_supplier_count",
    "rel_promotion_suppliers",
    "s1_parse_epub",
    "dedup_segment_exact",
    "corpus_temperature_mix",
    "emb_matryoshka_agreement",
    "ann_pq_adc_topk",
    "text_dsir_weight",
    "emb_dim_stats",
    "stream_window_topk",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_blocked",
    "rel_local_supplier_volume",
}

# The family most exposed to a driver-side testdata regeneration (it happened
# mid-round-3): their green rows are tied to the current data generation, so
# round 4 re-validates them while fresh.
EVENTS_STREAM_REVALIDATE: set[str] = {
    n for n in REGISTRY if n.startswith(("events_", "stream_"))
} - {"stream_hopping_agg", "stream_watermark_dedup", "events_forget_users",
     "events_transition_matrix", "events_incremental_agg",
     "events_approx_distinct_bounded",  # r3-prefix rows, already current-gen
     "stream_tumbling_agg", "stream_static_enrich",
     "events_grouping_sets",
     # displaced by the 4b TPC-H completion sweep (new code outranks
     # maybe-regen; their union-green r2/r3 rows remain on record):
     "events_retention_cohorts", "events_time_weighted_window",
     "events_interval_join", "events_decayed_score", "events_rfm_segments",
     "events_anomaly_zscore", "stream_stateful_counter",
     # displaced by the 4c wave (segment dedup / temperature mix / PQ /
     # matryoshka / epub):
     "events_funnel", "events_time_weighted_avg", "stream_session_window",
     "stream_dedup_first_arrival", "stream_interval_join"}


# Registered AFTER the round-4 prefix filled its 50 slots: locally verified
# at sf0.01+sf0.1 (see ROUND4_NOTES session 2), to be FRONTED in round 5's
# DRIVER_ORDER so the union-coverage discipline stays intact.
ROUND5_QUEUE: set[str] = {
    "multimodal_wav_resample",
    "dedup_minhash_band_curve",
    "emb_pq_distortion",
    "text_lang_confusion",
    "dedup_lsh_recall_audit",
    "text_bigram_logprob",
}


def test_round5_queue_registered_and_oracled():
    for name in ROUND5_QUEUE:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name
    # they must NOT displace round-4 rows from the 50-slot prefix
    prefix = set(list(queries())[:50])
    assert not (ROUND5_QUEUE & prefix)


def test_driver_order_is_valid():
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicates"
    stale = [n for n in DRIVER_ORDER if n not in REGISTRY]
    assert not stale, f"DRIVER_ORDER names not in REGISTRY: {stale}"


def test_round4_queries_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = (ROUND4_MUST_FRONT | EVENTS_STREAM_REVALIDATE) - prefix
    assert not missing, f"still outside the 50-entry driver prefix: {missing}"


def test_every_registry_entry_is_emitted():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    # oracle dict is a subset in the same order
    keys = list(oracle_sql())
    assert keys == [n for n in names if REGISTRY[n].oracle is not None]
