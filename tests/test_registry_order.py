"""The round driver validates a prefix of queries() (round 1 recorded exactly
the first 50 entries) — DRIVER_ORDER must keep every not-yet-driver-green
query family inside that prefix."""

from __future__ import annotations

from yaml_pipe_spark.entrypoints import DRIVER_ORDER, REGISTRY, queries, oracle_sql

# every query that had no CORRECTNESS_r01 row (registry entries 51-85 in
# round-1 registration order) plus this round's additions
ROUND1_UNVALIDATED = {
    "agg_salted_user_totals", "rel_salted_join", "rel_percentiles",
    "rel_order_gaps", "events_props_json", "pipeline_full",
    "c1_recursive_chunk", "events_session_window", "stream_session_window",
    "stream_dedup_first_arrival", "events_funnel", "events_retention_cohorts",
    "events_time_weighted_avg", "events_interval_join", "stream_interval_join",
    "stream_stateful_counter", "stream_tumbling_agg", "multimodal_features",
    "rel_small_qty_revenue", "rel_large_volume_customers",
    "rel_waiting_suppliers", "rel_sales_opportunity", "rel_market_share",
    "events_decayed_score", "events_rfm_segments", "text_entropy",
    "events_grouping_sets", "emb_dim_stats", "rel_nation_balance_fulljoin",
    "stream_static_enrich", "text_repetition", "text_decontaminate",
    "corpus_mix_weights", "rel_price_histogram", "sample_weighted",
}


def test_driver_order_is_valid():
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicates"
    stale = [n for n in DRIVER_ORDER if n not in REGISTRY]
    assert not stale, f"DRIVER_ORDER names not in REGISTRY: {stale}"


def test_unvalidated_queries_inside_driver_prefix():
    prefix = list(queries())[:50]
    missing = ROUND1_UNVALIDATED - set(prefix)
    assert not missing, f"still outside the 50-entry driver prefix: {missing}"


def test_every_registry_entry_is_emitted():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    # oracle dict is a subset in the same order
    keys = list(oracle_sql())
    assert keys == [n for n in names if REGISTRY[n].oracle is not None]
