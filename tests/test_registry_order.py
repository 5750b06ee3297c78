"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-4's queue: registered after r4's 50-slot prefix was spent, locally
# verified but never driver-sampled — round 5 MUST front them so the union
# of driver rows covers every registered query again.
ROUND5_QUEUE: set[str] = {
    "multimodal_wav_resample",
    "dedup_minhash_band_curve",
    "emb_pq_distortion",
    "text_lang_confusion",
    "dedup_lsh_recall_audit",
    "text_bigram_logprob",
}

# New in round 5, or implementation/oracle changed in round 5: prior driver
# rows (if any) describe code that no longer exists.
ROUND5_MUST_FRONT: set[str] = ROUND5_QUEUE | {
    # new operators
    "dedup_incremental_minhash",
    "multimodal_png_decode",
    "text_bpe_encode",
    "ann_ivfpq_topk",
    "text_gopher_quality",
    "text_repetition_ratios",
    "corpus_gopher_funnel",
    "corpus_ccnet_buckets",
    "corpus_split_leakage_audit",
    "multimodal_gif_decode",
    "text_zipf_fit",
    "corpus_epoch_schedule",
    "sink_partition_skew_audit",
    # changed code/oracle (ADVICE r4 fixes + lsh_band_table refactor)
    "s1_parse_epub",
    "corpus_temperature_mix",
    "dedup_minhash_lsh",
    "dedup_containment",
}

# Oldest rotation debt: every query whose latest driver row is from ROUND 1
# (three data-generations old). Verified against CORRECTNESS_r01..r04 when
# this rotation was built.
ROUND1_GENERATION: set[str] = {
    "dedup_cluster_resolution",
    "dedup_drop_exact",
    "dedup_levenshtein_verify",
    "dedup_simhash_pairs",
    "rel_cube_flag_status",
    "rel_customers_without_orders",
    "rel_moving_30d_revenue",
    "rel_orders_with_big_lineitems",
    "rel_part_brand_stats",
    "rel_pivot_status_priority",
    "rel_region_customer_rollup",
    "rel_rollup_lineitem",
    "rel_set_ops",
    "rel_suppliers_above_avg",
    "sample_stratified",
    "shard_token_budget",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_tfidf_topterms",
}

# Round-2-generation rows that fit the remaining slots this round. The rest
# of the r2 cohort (25 queries — events/stream family and the remaining
# rel_/text_ rows) is the ROUND6 queue below.
ROUND2_REFRESH_NOW: set[str] = {
    "rel_percentiles",
    "pipeline_full",
    "e_hash_embed",
    "agg_salted_user_totals",
    "corpus_mix_weights",
    "rel_approx_quantile_bounded",
}

# Still r2-generation after round 5 — front these in ROUND 6 (oldest debt
# first), before anything merely stale from r3.
ROUND6_QUEUE: set[str] = {
    # registered after the round-5 prefix was spent (5e wave), locally
    # verified at sf0.01+sf0.1 but never driver-sampled — these outrank
    # everything else in round 6:
    "events_cms_heavy_hitters",
    "text_quality_thresholds",
    "corpus_dup_rate_by_source",
    "emb_ivf_cell_balance",
    "s1_parse_warc",
    "s1_parse_tar",
    "sample_bottom_k_sketch",
    "rel_equidepth_histogram",
    "text_bigram_holdout_ppl",
    "ann_ivfpq_residual_topk",
    "events_top_paths",
    # displaced from the r5 prefix by the round-5b/5c waves (new code
    # outranks refresh):
    "rel_market_share",
    "rel_large_volume_customers",
    "rel_salted_join",
    "rel_scd2_history",
    "s1_parse_dispatch",
    "t4_timestamp_cursor",
    "sample_weighted",
    "text_entropy",
    "text_decontaminate",
    "c1_recursive_chunk",
    "events_anomaly_zscore",
    "events_decayed_score",
    "events_funnel",
    "events_grouping_sets",
    "events_interval_join",
    "events_retention_cohorts",
    "events_rfm_segments",
    "events_time_weighted_avg",
    "events_time_weighted_window",
    "multimodal_decode_check",
    "rel_nation_balance_fulljoin",
    "rel_pivot_status_priority",  # refreshed r5; keep only if regressed
    "rel_price_histogram",
    "rel_sales_opportunity",
    "rel_small_qty_revenue",
    "rel_waiting_suppliers",
    "stream_dedup_first_arrival",
    "stream_interval_join",
    "stream_session_window",
    "stream_stateful_counter",
    "stream_static_enrich",
    "stream_tumbling_agg",
    "text_blocklist_filter",
    "text_pii_redact",
    "text_shared_ngrams",
    "text_unigram_logprob",
}


def test_round5_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = (
        ROUND5_MUST_FRONT | ROUND1_GENERATION | ROUND2_REFRESH_NOW
    ) - prefix
    assert not missing, f"outside the 50-entry driver prefix: {missing}"


def test_round5_new_queries_registered_and_oracled():
    for name in ROUND5_MUST_FRONT:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_driver_order_is_valid():
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicates"
    stale = [n for n in DRIVER_ORDER if n not in REGISTRY]
    assert not stale, f"DRIVER_ORDER names not in REGISTRY: {stale}"
    assert len(DRIVER_ORDER) == 50, "the driver validates exactly 50"


def test_every_registry_entry_is_emitted():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    # oracle dict is a subset in the same order
    keys = list(oracle_sql())
    assert keys == [n for n in names if REGISTRY[n].oracle is not None]
