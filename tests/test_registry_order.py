"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-6-generation rows left WITHOUT a fresh row after round 10's
# 50-slot prefix — round 11 fronts these (VERDICT r10 ask #1).
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
# yet) — round 11 fronts these alongside ROUND11_QUEUE.
ROUND11_NEW: set[str] = {
    "ann_index_compact",  # small-file compaction on the IVF-PQ store
    "q3_bm25_compact",    # the unpartitioned BM25 defragmentation twin
}

# New in round 11, or implementation changed in round 11 (prior driver
# rows, if any, describe code that no longer exists). Grown as round-11
# waves land.
ROUND11_CHANGED: set[str] = {
    "multimodal_phash_jpeg",  # baseline-JPEG perceptual dedup (r10 ask #3)
    "pipeline_forget_e2e",  # forget CLI composition e2e (r10 ask #7)
    "emb_ivf_centroid_drift",  # quantizer drift audit (r10 ask #8)
    "ann_index_retrain",  # the retrain action the drift audit recommends
}

ROUND11_MUST_FRONT: set[str] = ROUND11_QUEUE | ROUND11_NEW | ROUND11_CHANGED

# Round-7-generation rows left WITHOUT a fresh row after round 11's
# 50-slot prefix is spent (the 6 r7 fill rows that made the prefix are
# deliberately absent; the 4 listed fills pushed out by the round-11 new
# rows are IN the queue) — round 12 must front these before anything
# merely stale from r8.
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


def test_round11_sets_are_registered_and_oracled():
    for name in ROUND11_MUST_FRONT | ROUND12_QUEUE:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_round11_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = ROUND11_MUST_FRONT - prefix
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
