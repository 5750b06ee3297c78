"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-9's queue: the thirty-six round-5-generation rows whose newest
# driver row was still r5 after round 9's 50-slot prefix was spent — round
# 10 MUST front them (VERDICT r9 ask #1).
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

# The 7 deferred grid-class float-hazard sites (ROUND9_NOTES section 1
# deferred list, VERDICT r9 ask #2) — hardened this round, so they are
# changed queries AND refreshes at once.
ROUND10_HARDENED: set[str] = {
    "text_token_bpe",
    "rel_market_share",
    "text_decontaminate",
    "text_shared_ngrams",
    "events_time_weighted_avg",
    "events_time_weighted_window",
    "quality_score_calibration",
}

# New in round 10, or implementation changed in round 10 (prior driver
# rows, if any, describe code that no longer exists). Grown as round-10
# waves land.
ROUND10_MUST_FRONT: set[str] = ROUND10_QUEUE | ROUND10_HARDENED | {
    "multimodal_phash_clusters",  # first driver row + skew-safe digest
    "ann_index_forget",           # RTBF purge on the persisted IVF-PQ store
    "q3_bm25_forget",             # RTBF delete+compact on the BM25 store
    "multimodal_phash_png",       # perceptual dedup over PNG payloads
    "rel_pricing_summary",        # split-long exact sums (VERDICT ask #5)
}

# Round-6-generation rows left WITHOUT a fresh row after round 10's
# 50-slot prefix — round 11 must front these before anything merely stale
# from r7. (The five r6 rows hardened or fill-refreshed in round 10 —
# ROUND10_HARDENED ∩ r6 plus the fill row that makes the prefix — are
# deliberately absent.)
ROUND11_QUEUE: set[str] = {
    "ann_index_persisted",
    "ann_ivf_nprobe_curve",
    "ann_ivfpq_residual_topk",
    "ann_ivfpq_topk",
    "dedup_minhash_band_curve",
    "emb_ivf_cell_balance",
    "events_anomaly_zscore",
    "events_cms_heavy_hitters",
    "events_decayed_score",
    "events_funnel",
    "events_grouping_sets",
    "events_interval_join",
    "events_retention_cohorts",
    "events_rfm_segments",
    "events_top_paths",
    "multimodal_decode_check",
    "multimodal_gif_decode",
    "rel_equidepth_histogram",
    "rel_large_volume_customers",
    "rel_nation_balance_fulljoin",
    "rel_price_histogram",
    "rel_salted_join",
    "rel_scd2_history",
    "s1_parse_dispatch",
    "s1_parse_tar",
    "s1_parse_warc",
    "sample_bottom_k_sketch",
    "sample_weighted",
    "sql_udtf_chunk",
    "stream_ann_serve",
    "stream_incremental_dedup",
    "t4_timestamp_cursor",
    "text_bigram_holdout_ppl",
    "text_bpe_encode",
    "text_encoding_scrub",
    "text_entropy",
    "text_quality_thresholds",
}


# Registered AFTER round 10's 50-slot prefix was spent (no driver row
# yet) — round 11 must front these alongside ROUND11_QUEUE: 1 + 37 new/
# refresh slots still leave headroom in the 50-entry prefix.
ROUND11_NEW: set[str] = {
    "ann_index_compact",  # small-file compaction on the IVF-PQ store
    "q3_bm25_compact",    # the unpartitioned BM25 defragmentation twin
}


def test_round10_queue_is_registered():
    for name in ROUND10_QUEUE | ROUND10_HARDENED | ROUND11_QUEUE | ROUND11_NEW:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_round10_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = ROUND10_MUST_FRONT - prefix
    assert not missing, f"outside the 50-entry driver prefix: {missing}"


def test_round10_front_queries_registered_and_oracled():
    for name in ROUND10_MUST_FRONT:
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
