"""The round driver validates a prefix of queries() (each round records
exactly the first 50 entries) — DRIVER_ORDER must keep every query that needs
a fresh driver row this round inside that prefix."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# Round-6's queue: registered after r6's 50-slot prefix was spent (6e/6f/6g/6h
# waves), locally verified + judge-parity green but never driver-sampled —
# round 7 MUST front them so the union of driver rows covers every registered
# query again (VERDICT r6 ask #1).
ROUND7_QUEUE: set[str] = {
    # 6e wave
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
}

# New in round 7, or implementation changed in round 7 (prior driver rows, if
# any, describe code that no longer exists). Grown as round-7 waves land.
ROUND7_MUST_FRONT: set[str] = ROUND7_QUEUE | {
    # new operators
    "graph_store_persisted",       # persisted pair-graph store audit
    "dedup_fuzzy_decontaminate",   # MinHash fuzzy benchmark decontamination
    "stream_bm25_append",          # streaming BM25 index maintenance
    "text_c4_filters",             # C4 line-level cleaning rules
    "quality_rho_excess",          # RHO-style learnability scoring
    # code changed (ADVICE r6 fixes)
    "corpus_url_canonical_dedup",  # malformed-URL passthrough
    "ann_index_incremental",       # append version-mode guard
    # code changed (pair-graph store rebase)
    "dedup_simhash_pairs",
    "dedup_cluster_resolution",
    "dedup_levenshtein_verify",
    "corpus_split_leakage_audit",
    # code changed (MinHash overlap store rebase)
    "dedup_minhash_lsh",
    "dedup_containment",
    "corpus_dup_rate_by_source",
    "corpus_dedup_funnel",
}

# Round-2-generation rows displaced from the r6 prefix (VERDICT r6 ask #1:
# after these, no green row is older than round 3).
ROUND2_REFRESH_NOW: set[str] = {
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

# The round-3-generation refresh rows LISTED in DRIVER_ORDER's fill section:
# best-effort — whichever fall outside the final 50-entry prefix (new code
# outranks refresh) stay r3-generation and must front in round 8 before
# anything merely stale from r4.
ROUND3_FILL: set[str] = {
    "s1_scan_nonempty",
    "s2_normalize_lines",
    "s4_events_content",
    "t2_changed_anti_join",
    "t3_state_merge",
    "c1_fixed_chunk",
    "c2_markdown_chunk",
    "c3_adaptive_chunk",
    "dedup_exact",
    "dedup_simhash",
    "q1_topk_cosine",
    "q2_hitrate",
    "ann_signlsh_topk",
    "ann_ivf_topk",
    "sim_knn_join",
    "text_repetition",
    "rel_pricing_summary",
    "rel_top_supplier",
    "stream_watermark_dedup",
    "multimodal_frame_sample",
}


# Round-3-generation rows left WITHOUT a fresh row after round 7's 50-slot
# prefix (every other registered query has a row from r4+ or sits in the
# prefix) — round 8 must front these before anything merely stale from r4.
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


def test_round8_queue_is_registered():
    for name in ROUND8_QUEUE:
        assert name in REGISTRY, name


def test_round7_front_sets_inside_driver_prefix():
    prefix = set(list(queries())[:50])
    missing = (ROUND7_MUST_FRONT | ROUND2_REFRESH_NOW) - prefix
    assert not missing, f"outside the 50-entry driver prefix: {missing}"


def test_round7_new_queries_registered_and_oracled():
    for name in ROUND7_MUST_FRONT:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name


def test_round3_fill_is_registered():
    for name in ROUND3_FILL:
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
