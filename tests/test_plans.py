"""Plan-quality regression tests: the scale claims in README/operator
docstrings, asserted against the actual physical plans. A correct result
computed through the wrong plan (no pushdown, needless shuffle, Python in
the hot path) is a bug at 100 TB even if small-SF values match."""

from __future__ import annotations

import contextlib
import io

from tests.conftest import SF_SMALL
from yaml_pipe_spark.entrypoints import REGISTRY


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _q(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL)


def test_filter_and_projection_pushed_to_scan(spark):
    plan = _plan(_q("rel_pricing_summary", spark))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan
    # column pruning: the scan must not read all 16 lineitem columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read and "l_partkey" not in read


def test_small_dims_broadcast(spark):
    plan = _plan(_q("rel_nation_revenue", spark))
    assert "BroadcastHashJoin" in plan
    # the 25-row nation table must never be the shuffle side
    assert "Exchange hashpartitioning(n_nationkey" not in plan


def test_stratified_sample_is_narrow(spark):
    # deterministic hash sampling is a pure filter: no Exchange anywhere
    plan = _plan(_q("sample_stratified", spark))
    assert "Exchange" not in plan


def test_topk_is_take_ordered(spark):
    # exact top-k must compile to TakeOrderedAndProject (per-partition heap,
    # k rows to the driver), not a global sort
    plan = _plan(_q("q1_topk_cosine", spark))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan or "global=true" not in plan


def test_codegen_covers_expression_pipeline(spark):
    # the flagship chunk+hash+agg chain stays inside whole-stage codegen —
    # no Python evaluation nodes. (AQE's pre-execution plan hides codegen
    # spans, so disable it for the explain only.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(_q("flagship", spark), "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # codegen stages print as "*(n)" prefixes in simple mode
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_aggregation_has_map_side_combine(spark):
    # partial + final HashAggregate pairs around the shuffle
    plan = _plan(_q("rel_pricing_summary", spark), "simple")
    assert plan.count("HashAggregate") >= 2


def test_python_only_where_declared(spark):
    # the recursive-parity chunker is the ONE sanctioned Python row path in
    # the chunker family; the oracle-checked chunkers must stay JVM-side
    for name in ("c1_fixed_chunk", "c2_markdown_chunk", "c3_adaptive_chunk"):
        plan = _plan(_q(name, spark), "simple")
        assert "EvalPython" not in plan, name


def test_market_share_star_join_all_broadcast(spark):
    # supplier/nation/region are broadcast dims: the lineitem fact must
    # never shuffle on the join key — revenue is one partial+final agg
    plan = _plan(_q("rel_market_share", spark))
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning(l_suppkey" not in plan


def test_grouping_sets_single_pass(spark):
    # three resolutions (day / day+type / grand total) in ONE scan: an
    # Expand node feeding one partial+final agg pair, not three scans
    plan = _plan(_q("events_grouping_sets", spark), "simple")
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1
    assert plan.count("HashAggregate") >= 2


def test_emb_dim_stats_partial_agg_before_shuffle(spark):
    # the x64 posexplode blowup must be compressed map-side: exactly one
    # exchange, with a partial HashAggregate below it
    plan = _plan(_q("emb_dim_stats", spark), "simple")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2


def test_decorrelated_subqueries_stay_jvm_side(spark):
    # the TPC-H-analog family: correlated subqueries decorrelate into
    # joins/aggs with zero Python evaluation nodes
    for name in (
        "rel_small_qty_revenue",
        "rel_large_volume_customers",
        "rel_waiting_suppliers",
        "rel_sales_opportunity",
        "events_decayed_score",
        "events_rfm_segments",
        "text_entropy",
    ):
        plan = _plan(_q(name, spark), "simple")
        assert "EvalPython" not in plan, name


def test_weighted_sample_corpus_stays_narrow(spark):
    # the corpus side is a pure filter + broadcast scalar: the documents
    # scan must never hash-shuffle
    plan = _plan(_q("sample_weighted", spark))
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning(doc_id" not in plan


def test_order_gaps_has_no_global_window(spark):
    # quartiles come from broadcast percentile thresholds, not
    # ntile() OVER (ORDER BY ...): no window or sort may be global
    # (single-partition) anywhere in the plan
    plan = _plan(_q("rel_order_gaps", spark))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    for line in plan.splitlines():
        if "Sort [" in line and "global=true" in line:
            raise AssertionError(f"global sort in plan: {line}")
    import re

    # no ntile window call ("percentile(" ends with "ntile(" — word-bound it)
    assert not re.search(r"\bntile\(", plan)
    # the lag window runs per-customer over a hash-partitioned exchange
    # (the only SinglePartition exchange allowed is the 3-scalar threshold
    # aggregate feeding the broadcast)
    assert "hashpartitioning(o_custkey" in plan


def test_twa_window_variant_is_jvm_only(spark):
    # the production TWA is pure Catalyst (lead window + agg); the
    # applyInPandas twin is the sanctioned grouped-map demo
    plan = _plan(_q("events_time_weighted_window", spark), "simple")
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan
    demo = _plan(_q("events_time_weighted_avg", spark), "simple")
    assert "FlatMapGroupsInPandas" in demo


def test_curation_and_parse_queries_stay_jvm_side(spark):
    # parse dispatch + curation are pure Catalyst: no Python nodes anywhere,
    # and the boilerplate measure is bounded at 3 exchanges (token window,
    # gram groupBy, final agg)
    for name in (
        "s1_parse_dispatch",
        "text_blocklist_filter",
        "text_pii_redact",
        "text_shared_ngrams",
    ):
        plan = _plan(_q(name, spark), "simple")
        assert "EvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
    shared = _plan(_q("text_shared_ngrams", spark), "simple")
    assert shared.count("Exchange") <= 3


def test_round2_queries_stay_jvm_side(spark):
    # the new text/event/sketch queries are pure Catalyst end to end
    for name in (
        "text_token_bpe",
        "text_unigram_logprob",
        "events_anomaly_zscore",
        "events_approx_distinct_bounded",
        "rel_approx_quantile_bounded",
        "rel_scd2_history",
    ):
        plan = _plan(_q(name, spark), "simple")
        assert "EvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_anomaly_zscore_stats_join_broadcasts(spark):
    # the per-type mean/std join back onto the bucket counts must broadcast
    # (the bucket-count table is tiny: types x hours); the only raw-event
    # shuffle is the (type, hour) count with map-side partial aggregation
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(_q("events_anomaly_zscore", spark), "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the bucket-count exchange is REUSED for the stats side: one scan
    assert plan.count("FileScan") == 1
    assert "ReusedExchange" in plan


def test_unigram_logprob_single_corpus_scan(spark):
    # the LM derives from the (doc, token) counts — the corpus parquet is
    # scanned once, not re-scanned per aggregation level
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(_q("text_unigram_logprob", spark), "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # every diamond branch (lm, corpus totals) hangs off the reused
    # (doc,token) exchange — the corpus text is scanned and tokenized once
    assert plan.count("FileScan") == 1
    assert plan.count("ReusedExchange") == 2


def test_scd2_windows_are_key_partitioned(spark):
    # every window/sort runs over a hashpartitioning(o_custkey) exchange;
    # SCD2 must never serialize the fact through one reducer
    plan = _plan(_q("rel_scd2_history", spark))
    assert "hashpartitioning(o_custkey" in plan
    for line in plan.splitlines():
        if "Sort [" in line and "global=true" in line:
            raise AssertionError(f"global sort in plan: {line}")


def test_recall_measurement_reuses_exchange(spark):
    # both rankings partition by qid: the two window passes must not add
    # python nodes, and the query side is broadcast into the scoring joins
    plan = _plan(_q("ann_recall_measured", spark), "simple")
    assert "EvalPython" not in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_fact_fact_join(spark):
    # at 100 TB a selective dim-filtered fact-fact join should inject a
    # runtime bloom filter on the probe side (row-group level skipping).
    # Local data is far below the default thresholds, so force them down and
    # assert Spark injects bloom_filter_agg + might_contain when the shape
    # calls for it — the production conf keeps the defaults.
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        od = spark.read.parquet(f"{SF_SMALL}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j, "simple")
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_disjunctive_predicates_pushed_to_both_scans(spark):
    # TPC-H Q19 shape: from the OR-of-ANDs join filter, Catalyst must derive
    # the single-side disjunctions and push them into BOTH parquet scans
    # (CNF extraction) — neither side may scan unfiltered
    plan = _plan(_q("rel_disjunctive_revenue", spark))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    li = [l for l in pushed if "l_quantity" in l]
    pt = [l for l in pushed if "p_brand" in l]
    assert li and "Or(" in li[0]
    assert pt and "Or(" in pt[0]


def test_volume_shipping_supplier_broadcast_before_shuffle(spark):
    # Q7 analog: the nation-pruned supplier side must broadcast into the
    # lineitem scan; the only big-big exchange is on the orderkey; both
    # scan-level filters (ship-date window, nation names) are pushed
    plan = _plan(_q("rel_volume_shipping", spark))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual" in plan
    assert any("n_name" in l and "In(" in l for l in plan.splitlines()
               if "PushedFilters" in l)


def test_returned_items_topk_and_pushdown(spark):
    # Q10 analog: returnflag + date-window filters reach the scans; the
    # top-20 compiles to TakeOrderedAndProject, never a global sort
    plan = _plan(_q("rel_returned_item_revenue", spark))
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_top_supplier_single_lineitem_scan(spark):
    # Q15 analog: the per-supplier revenue agg is built once and its
    # exchange reused for the scalar max (diamond), not recomputed.
    # (ReuseExchange unifies subtrees statically only with AQE off; with
    # AQE on the same dedup happens at runtime.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(_q("rel_top_supplier", spark), "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    scans = [l for l in plan.splitlines()
             if "FileScan" in l and "lineitem" in l]
    assert len(scans) == 1, f"lineitem scanned {len(scans)}x"
    assert "ReusedExchange" in plan


def test_int8_quant_no_shuffle_before_label_rollup(spark):
    # quantize/error math is a narrow per-row map: exactly ONE exchange
    # (the final label rollup) and no Python nodes
    plan = _plan(_q("emb_int8_quant", spark), "simple")
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial+final agg pair at most


def test_dsir_single_token_shuffle(spark):
    # DSIR: every LM branch re-aggregates from the (doc,bucket) counts —
    # the token-level exchange must be REUSED, not recomputed per branch
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(_q("text_dsir_weight", spark), "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    scans = [l for l in plan.splitlines()
             if "FileScan" in l and "documents" in l]
    assert len(scans) == 1, f"documents scanned {len(scans)}x"
    assert "ReusedExchange" in plan
    assert "EvalPython" not in plan


def test_transition_matrix_user_partitioned_window(spark):
    # the lead() window partitions by user_id (no global sort); the
    # normalization window runs post-aggregation on the tiny matrix
    plan = _plan(_q("events_transition_matrix", spark))
    assert "partitionBy=[user_id]" in plan.replace(" ", "") or \
        "hashpartitioning(user_id" in plan
    assert "EvalPython" not in plan


def test_covariance_shuffles_partials_not_rows(spark):
    # single-scan contract: the mean/cell branches consume the tiny
    # localCheckpointed aggregate, so the FINAL plan reads no parquet at
    # all — the corpus crossed the fold exactly once, upstream
    plan = _plan(_q("emb_covariance", spark), "simple")
    assert "Scan parquet" not in plan and "FileScan" not in plan
    assert "ExistingRDD" in plan
    # and the fold stage itself: pruned scan, no exchange below the fold
    from yaml_pipe_spark.operators.emb_stats import covariance_partials
    from yaml_pipe_spark.tables import load_table

    parts = covariance_partials(load_table(spark, SF_SMALL, "embeddings"))
    pplan = _plan(parts)
    read = [l for l in pplan.splitlines() if "ReadSchema" in l][0]
    assert "embedding" in read and "label" not in read and "vec_id" not in read
    assert "MapInPandas" in pplan and "Exchange" not in pplan


def test_forecast_revenue_all_predicates_pushed(spark):
    # Q6 analog: date window, discount band, and quantity cap ALL reach the
    # scan; 2-column read; no exchange beyond the scalar agg pair
    plan = _plan(_q("rel_forecast_revenue", spark))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, frag
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_forget_users_anti_join_broadcasts(spark):
    # the deletion list must broadcast into the events scan (anti-join) —
    # the fact table never shuffles on user_id for the scrub itself
    plan = _plan(_q("events_forget_users", spark))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_pca_project_is_narrow_jvm_map(spark):
    # projection onto literal components: no Python, no shuffle — the whole
    # query is a codegen'd map over the embeddings scan
    plan = _plan(_q("emb_pca_project", spark))
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_round4_queries_stay_jvm_side(spark):
    # round-4 queries that claim pure Catalyst must have no Python nodes
    for name in (
        "corpus_pack_windows",
        "dedup_substring_span",
        "dedup_containment",
        "corpus_ngram_novelty",
        "text_vocab_coverage",
        "rel_join_key_skew",
        "events_funnel_time",
        "rel_pareto_revenue",
        "emb_pca_project",
        "emb_outlier_zscore",
    ):
        plan = _plan(_q(name, spark), "simple")
        assert "EvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_round3_queries_stay_jvm_side(spark):
    # everything round-3 that claims pure-Catalyst must have no Python nodes
    for name in (
        "rel_volume_shipping",
        "rel_local_supplier_volume",
        "rel_forecast_revenue",
        "rel_customer_distribution",
        "rel_returned_item_revenue",
        "rel_top_supplier",
        "emb_int8_quant",
        "text_dsir_weight",
        "events_transition_matrix",
        "corpus_source_cap",
        "corpus_holdout_split",
        "events_forget_users",
    ):
        plan = _plan(_q(name, spark), "simple")
        assert "EvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_tpch_completion_queries_stay_jvm_side(spark):
    # the round-4b TPC-H completion sweep is pure Catalyst end to end
    for name in (
        "rel_min_cost_supplier",
        "rel_shipping_priority",
        "rel_product_profit",
        "rel_important_stock",
        "rel_shipmode_priority",
        "rel_parts_supplier_count",
        "rel_promotion_suppliers",
    ):
        plan = _plan(_q(name, spark), "simple")
        assert "EvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_min_cost_supplier_part_filter_below_window(spark):
    # Q2 analog: the 56-part dim must prune the pair aggregate BEFORE the
    # per-part min window — at 100 TB windowing the unfiltered pair
    # relation would be the dominant shuffle. Both part filters reach the
    # scan; the window exchange partitions on l_partkey.
    plan = _plan(_q("rel_min_cost_supplier", spark))
    assert "EqualTo(p_type,LARGE)" in plan
    assert "GreaterThanOrEqual(p_size,10)" in plan
    assert "BroadcastHashJoin" in plan
    # window runs after the pair agg: its exchange is on partkey only
    assert "hashpartitioning(l_partkey" in plan


def test_shipping_priority_topk_and_pushdown(spark):
    # Q3 analog: date filters reach both scans; top-10 compiles to
    # TakeOrderedAndProject, never a global sort
    plan = _plan(_q("rel_shipping_priority", spark))
    assert "TakeOrderedAndProject" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_product_profit_part_pushdown_and_broadcast_dims(spark):
    # Q9 analog: the %bolt% filter is pushed to the part scan as a
    # substring predicate and every dim joins as broadcast
    plan = _plan(_q("rel_product_profit", spark))
    assert "StringContains(p_name,bolt)" in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_important_stock_single_scan_diamond(spark):
    # Q11 analog: the per-part value frame is built once; the scalar
    # sum/count total must REUSE its exchange, not rescan lineitem
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(_q("rel_important_stock", spark), "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    scans = [l for l in plan.splitlines()
             if "FileScan" in l and "lineitem" in l]
    assert len(scans) == 1, f"lineitem scanned {len(scans)}x"
    assert "ReusedExchange" in plan


def test_parts_supplier_count_anti_and_semi_joins(spark):
    # Q16 analog: the negative-balance exclusion is a broadcast ANTI join;
    # Q20 analog: the qualifying-supplier set joins as broadcast SEMI
    plan16 = _plan(_q("rel_parts_supplier_count", spark), "simple")
    assert "LeftAnti" in plan16
    plan20 = _plan(_q("rel_promotion_suppliers", spark), "simple")
    assert "LeftSemi" in plan20


def test_round4c_queries_stay_jvm_side(spark):
    # segment dedup / temperature mix / matryoshka / PQ-ADC are pure
    # Catalyst — no Python nodes anywhere
    for name in (
        "dedup_segment_exact",
        "corpus_temperature_mix",
        "emb_matryoshka_agreement",
        "ann_pq_adc_topk",
    ):
        plan = _plan(_q(name, spark), "simple")
        assert "EvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_pq_and_matryoshka_single_qid_shuffle(spark):
    # both rankings (ADC + exact / full + truncated) must ride ONE window
    # exchange on qid — two sort orders over the same partitioning, never
    # two shuffles of the pair relation
    for name in ("ann_pq_adc_topk", "emb_matryoshka_agreement"):
        plan = _plan(_q(name, spark), "simple")
        assert plan.count("Exchange hashpartitioning(qid") == 1, name


def test_bigram_logprob_stays_jvm_and_single_token_shuffle(spark):
    # bigram LM: no Python nodes; the LM and prev-marginal derive from the
    # (doc, bigram) counts — with AQE off the dt exchange must be REUSED,
    # not recomputed from a second corpus scan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(_q("text_bigram_logprob", spark), "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "EvalPython" not in plan
    scans = [l for l in plan.splitlines()
             if "FileScan" in l and "documents" in l]
    assert len(scans) == 1, f"documents scanned {len(scans)}x"
    assert "ReusedExchange" in plan


def test_pq_distortion_is_narrow_jvm_map(spark):
    # codes + reconstruction + MSE + drift are one narrow Catalyst pass;
    # the only exchange pair is the tiny label rollup
    plan = _plan(_q("emb_pq_distortion", spark), "simple")
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial+final agg pair at most


def test_analyze_column_stats_flip_filtered_dim_to_broadcast(spark):
    """The table-statistics workflow at 100 TB: without stats, a SELECTIVE
    filter on a physically-large dim is costed at full file size and the
    join plans as SortMergeJoin; after ANALYZE ... FOR COLUMNS, CBO
    estimates the filter's output and flips the same query to a broadcast
    join. This is the operational reason a production deployment runs
    ANALYZE after large loads — AQE can only rescue at runtime, the
    static plan is stats-driven."""
    import contextlib
    import io

    from pyspark.sql import functions as F2

    import shutil

    prev_cbo = spark.conf.get("spark.sql.cbo.enabled")
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories persist — clear both forms
    spark.sql("DROP TABLE IF EXISTS __cbo_dim")
    spark.sql("DROP TABLE IF EXISTS __cbo_fact")
    shutil.rmtree("spark-warehouse/__cbo_dim", ignore_errors=True)
    shutil.rmtree("spark-warehouse/__cbo_fact", ignore_errors=True)
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "262144")
        spark.range(0, 300_000).selectExpr(
            "id AS k",
            "id % 1000 AS grp",
            "concat(md5(cast(id as string)), md5(cast(id+1 as string)))"
            " AS name",
        ).write.mode("overwrite").saveAsTable("__cbo_dim")
        spark.range(0, 400_000).selectExpr(
            "id", "id % 300000 AS k"
        ).write.mode("overwrite").saveAsTable("__cbo_fact")

        def shape():
            dim = spark.table("__cbo_dim").filter("grp = 7")
            q = (
                spark.table("__cbo_fact")
                .join(dim, "k")
                .groupBy()
                .agg(F2.count("*"))
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                q.explain("simple")
            return buf.getvalue()

        before = shape()
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before
        spark.sql(
            "ANALYZE TABLE __cbo_dim COMPUTE STATISTICS FOR COLUMNS "
            "grp, k, name"
        )
        spark.sql("ANALYZE TABLE __cbo_fact COMPUTE STATISTICS")
        after = shape()
        assert "BroadcastHashJoin" in after
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.sql("DROP TABLE IF EXISTS __cbo_dim")
        spark.sql("DROP TABLE IF EXISTS __cbo_fact")


def test_bm25_serve_plan_reads_checkpointed_index_once(spark):
    """The BM25 scoring plan must consume the localCheckpoint-materialized
    tf/dl tables, never re-explode the corpus per consumer: zero parquet
    re-scans of documents inside the serve plan, and the bounded aggregate
    count (5 exchanges, was 17 before the cut)."""
    plan = _plan(_q("q3_bm25_topk", spark), "simple")
    assert "Scan parquet" not in plan  # everything derives from the index
    assert plan.count("Exchange hashpartitioning") <= 6


def test_bloom_probe_is_broadcast(spark):
    """The bloom bit set (<= m rows by construction) must broadcast; the
    probe side may never shuffle against the train corpus."""
    plan = _plan(_q("text_bloom_decontaminate", spark), "simple")
    assert "BroadcastHashJoin [pos" in plan.replace("L]", "]").replace(
        "#", " #"
    ) or "BroadcastHashJoin" in plan
    # the bits->probe join must not be a sort-merge join on pos
    assert "SortMergeJoin [pos" not in plan


def test_hybrid_vector_arm_broadcasts_queries(spark):
    """The vector arm is queries x corpus with the QUERY side broadcast —
    a BroadcastNestedLoopJoin over the tiny side, never a shuffled
    cartesian."""
    plan = _plan(_q("q3_hybrid_lexical_vector", spark), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_pagerank_iterations_cut_lineage(spark):
    """Each PageRank round localCheckpoints, so the final plan depends on
    materialized RDDs, not a 3-round join tower over the raw pair plan."""
    plan = _plan(_q("graph_pagerank_centrality", spark), "simple")
    assert "Scan ExistingRDD" in plan
    # the simhash pair generation (posexplode of documents) must NOT
    # appear in the final iteration's plan — it was cut rounds ago
    assert "posexplode" not in plan


def test_semdedup_pairs_are_blocked_not_cartesian(spark):
    """SemDeDup's centroid assignment is a literal argmax projection (no
    join of ANY kind against the corpus) and the pair stage is a cid
    equi-join — never a cartesian or row-multiplying nested loop."""
    plan = _plan(_q("dedup_semantic_cluster", spark), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nb_distill_model_broadcasts_to_scoring(spark):
    """The fitted NB weight table (vocab-sized) must broadcast into the
    test-split scoring join; the corpus token stream may never shuffle
    against the model."""
    plan = _plan(_q("quality_nb_distill", spark), "simple")
    assert "CartesianProduct" not in plan
    # the test-split scoring join consumes the model via broadcast hash
    # (the vocab-grid BUILD join may legitimately sort-merge: it is
    # model-sized on both sides and runs once at train time)
    assert "BroadcastHashJoin [tok" in plan


def test_doremi_normalization_has_no_global_window(spark):
    """DoReMi's share/weight normalizations are broadcast scalar
    aggregates; a partitionBy()-less window over the source frame would
    be the single-partition trap."""
    plan = _plan(_q("corpus_doremi_weights", spark), "simple")
    assert "Window [" not in plan


def test_winnow_fingerprints_zero_shuffle_zero_python(spark):
    """Winnowing is per-doc expression work: the plan must carry no KEYED
    shuffle (the only allowed Exchange is spread_for_expansion's
    round-robin rescue of an under-split scan) and no Python eval — at
    100 TB the scan absorbs it entirely. The md5 gram transform must
    appear exactly ONCE in the optimized plan: the let-binding shape is
    what keeps filter pushdown / project collapse from re-materializing
    the hash array per consumer (11.1s -> 0.44s at sf0.1, PERF.md)."""
    df = _q("text_winnow_fingerprint", spark)
    plan = _plan(df)
    assert "Exchange hashpartitioning" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "mapInPandas"):
        assert marker not in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("md5") == 1


def test_multi_fetch_is_executor_side_python(spark):
    """The crawl fan-out's fetch must run as an Arrow-batched pandas UDF on
    executors (the declared Python surface), never a driver loop."""
    plan = _plan(_q("s2_multi_fetch", spark))
    assert "ArrowEvalPython" in plan


def test_soft_reweight_gram_agg_has_map_side_combine(spark):
    """The df aggregate must partial-aggregate before its shuffle (the gram
    stream is corpus-scale; the shuffle must carry vocabulary-scale partial
    counts, not raw grams)."""
    plan = _plan(_q("dedup_soft_reweight", spark))
    assert "partial_count" in plan or "HashAggregate" in plan
    # and the final join back to docs is an equi-join, not a cross product
    assert "CartesianProduct" not in plan


def test_unimax_window_is_bounded_to_source_frame(spark):
    """The single-partition window is deliberate and must sit ABOVE the
    per-source aggregate (source-cardinality rows), never over the raw
    corpus: exactly one corpus-scale aggregate feeds it."""
    plan = _plan(_q("corpus_unimax_mix", spark))
    # the waterfill scalars join back via broadcast, never a shuffle join
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_phash_pairing_is_band_equijoin_not_cartesian(spark):
    """Perceptual-hash near-dup pairing (all three container formats share
    phash_near_dup_pairs) must pair via the (band, word) equi-join — never
    a cartesian/nested-loop over images — and verify via bit_count(xor) in
    Catalyst, not Python."""
    for name in ("multimodal_phash_dedup", "multimodal_phash_jpeg"):
        plan = _plan(_q(name, spark), "simple")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        # the only Python stage is the Arrow decode+hash map; the verify
        # predicate stays JVM-side
        assert "bit_count" in plan, name


def test_centroid_drift_broadcasts_centroids_both_snapshots(spark):
    """emb_ivf_centroid_drift assigns BOTH snapshots via broadcast of the
    8-row centroid frame; the corpus must never shuffle against it, and no
    global (partitionBy-less) window may appear."""
    plan = _plan(_q("emb_ivf_centroid_drift", spark), "simple")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "Window [" not in plan


def test_lloyd_rounds_broadcast_centroids_no_python(spark):
    """emb_kmeans_lloyd's scale claims: the k*dim centroid frame rides
    along BROADCAST into every assignment (never the shuffle side of a
    sort-merge join), the argmin is an aggregate (no per-vector window
    sort), and the whole trainer is Catalyst-only — no Python eval
    nodes anywhere in a 'trained' operator."""
    plan = _plan(_q("emb_kmeans_lloyd", spark), "simple")
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the integer argmin compiles to min_by partial/final aggregates,
    # not a window sort over candidates
    assert "min_by" in plan


def test_retrain_lloyd_serve_stays_probe_pruned(spark):
    """The trained-quantizer retrain serves through the SAME pruned path
    as every persisted-index row: broadcast probe join, no Python."""
    plan = _plan(_q("ann_index_retrain_lloyd", spark), "simple")
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_logreg_rounds_literal_weights_no_python(spark):
    """quality_logreg_distill: the model is a driver-held literal weight
    map (round-13 trim — no weight broadcast, no join-back; since r14 the
    margins fold per-row over the packed per-doc feature vector), so the
    scoring plan must be Catalyst-only with NO join at all: the map
    lookup is an expression over the checkpointed doc vectors."""
    plan = _plan(_q("quality_logreg_distill", spark), "simple")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "keys:" in plan or "map(" in plan  # the literal model map


def test_phash_color_pairing_is_band_equijoin_not_cartesian(spark):
    """The color-JPEG dedup pairs through the same capped band equi-join
    as the BMP/PNG/gray rows — never an all-pairs product."""
    plan = _plan(_q("multimodal_phash_jpeg_color", spark), "simple")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_phash_420_pairing_is_band_equijoin_not_cartesian(spark):
    plan = _plan(_q("multimodal_phash_jpeg420", spark), "simple")
    assert "CartesianProduct" not in plan


def test_phash_prog_pairing_is_band_equijoin_not_cartesian(spark):
    plan = _plan(_q("multimodal_phash_jpeg_prog", spark), "simple")
    assert "CartesianProduct" not in plan
