"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-5's queue: registered after r5's 50-slot prefix was spent (5e/5g/5h
# waves), locally verified + judge-parity green but never driver-sampled —
# round 6 MUST front them so the union of driver rows covers every
# registered query again (VERDICT r5 ask #1).
ROUND6_QUEUE: set[str] = {
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
}

# New in round 6, or implementation/oracle changed in round 6: prior driver
# rows (if any) describe code that no longer exists.
ROUND6_MUST_FRONT: set[str] = ROUND6_QUEUE | {
    # new operators
    "ann_index_persisted",        # persisted IVF-PQ lifecycle
    "stream_incremental_dedup",   # streaming band-state dedup
    "corpus_url_canonical_dedup",  # URL canonicalization + dedup
    "text_encoding_scrub",         # encoding-anomaly repair
    "sql_udtf_chunk",              # registered Python UDTF surface
    "stream_ann_serve",            # streamed persisted-index serve
    "quality_score_calibration",   # rule->score distillation curve
    "q2_ranking_metrics",          # MRR / NDCG@10 / P@10 eval metrics
    "dedup_lsh_scurve",            # banding S-curve theory-vs-measured
    "ann_index_incremental",       # append-only ANN index maintenance
    # changed code/oracle (ADVICE r5 fixes + audit-drift rewrites)
    "dedup_incremental_minhash",
    "text_bpe_encode",
    "multimodal_gif_decode",
    "ann_ivf_nprobe_curve",
    "dedup_minhash_band_curve",
    "ann_ivfpq_topk",
}

# Round-2-generation rows refreshed this round (displaced from the r5
# prefix; VERDICT r5 ask #2 — after these, no green row is older than r4).
ROUND2_REFRESH_NOW: set[str] = {
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
    "rel_price_histogram",
}

# Still r2-generation after round 6 (did not fit the 50 slots) — front these
# in ROUND 7 before anything merely stale from r3.
ROUND7_QUEUE: set[str] = {
    # registered after round 6's 50-slot prefix was spent (6e wave) —
    # locally oracle-parity green, need driver rows in round 7
    "text_bloom_decontaminate",
    "corpus_snapshot_psi",
    "layout_zorder_locality",
    "dedup_canonical_quality",
    # 6f wave: lexical retrieval + snapshot ops
    "q3_bm25_topk",
    "q3_hybrid_rrf",
    "corpus_snapshot_churn",
    # 6g wave: graph centrality + persisted lexical index
    "graph_pagerank_centrality",
    "q3_bm25_index_persisted",
    "q3_hybrid_lexical_vector",
    # 6h wave: curation algorithms from the published-pipeline canon
    "dedup_semantic_cluster",
    "quality_nb_distill",
    "corpus_doremi_weights",
    "corpus_ppl_quality_corr",
    "sample_kcenter_coreset",
    # displaced round-2-generation refresh rows
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


def test_round6_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = (ROUND6_MUST_FRONT | ROUND2_REFRESH_NOW) - prefix
    assert not missing, f"outside the 50-entry driver prefix: {missing}"


def test_round6_new_queries_registered_and_oracled():
    for name in ROUND6_MUST_FRONT:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_round7_queue_is_registered():
    for name in ROUND7_QUEUE:
        assert name in REGISTRY, name


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
