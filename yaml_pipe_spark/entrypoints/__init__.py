"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame with
a DuckDB-oracle SQL twin where SQL-expressible.

This is the correctness contract of SURVEY.md §2: the driver runs each
`queries()` entry side-by-side with `oracle_sql()` at sf0.01 and compares
row-count + schema + order-insensitive value-hash. Conventions that make the
comparison deterministic across engines:

- cross-engine hash primitive = md5/sha256 hex strings (identical output);
- integers cast to BIGINT, floats to DOUBLE, and every float rounded
  (`F.round` / `round`) before returning;
- array indexing via 1-based `element_at` (Spark) / `l[i]` (DuckDB);
- every top-k has a deterministic tiebreak on a key column, ordering by the
  *rounded* score so boundary decisions agree bit-for-bit;
- session timezone pinned to UTC (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from yaml_pipe_spark.entrypoints._shared import (
    ANN_INDEX_PERSISTED_ORACLE,
    INCREMENTAL_MINHASH_ORACLE,
    INTERVAL_JOIN_ORACLE,
    MINHASH_ORACLE,
    QueryDef,
    REGISTRY,
    SESSION_WINDOW_ORACLE,
    SIMHASH_FP_CTE,
    _ANN_IVFPQ_CORE,
    _BM25_TOPK_ORACLE,
    _DK_BIGRAM_DOC,
    _DK_BIT,
    _DK_BUCKETS,
    _DK_DF_CUT,
    _DK_GOPHER,
    _DK_NTOK,
    _DK_PUNCT,
    _DK_REP,
    _DK_RETRIEVAL_CORE,
    _DK_SHINGLES,
    _DK_SIGS,
    _SIMHASH_PAIR_CTES,
    _dk_byte0,
    _dk_cos,
    _dk_dot,
    _dk_occ,
    _dk_retrieval_core,
    _dk_stop_hits,
    _minhash_overlap_store,
    _pair_graph_store,
    fq_unit_mean,
    register,
)
from yaml_pipe_spark.entrypoints.ann import (
    ANN_INDEX_FORGET_ORACLE,
    ANN_IVFPQ_ORACLE,
    ANN_IVFPQ_RESIDUAL_ORACLE,
    ANN_IVF_ORACLE,
    Q1_ORACLE,
    Q2_ORACLE,
    _DK_BUCKET,
    _DK_QERR,
    _FORGET_ANCHOR,
    _PCA_COMPONENTS,
    _PCA_D,
    _PCA_K,
    _PCA_MEAN,
    _pca_oracle,
    q_ann_index_compact,
    q_ann_index_forget,
    q_ann_index_incremental,
    q_ann_index_persisted,
    q_ann_index_retrain_lloyd,
    q_ann_ivf,
    q_ann_ivf_nprobe_curve,
    q_ann_ivfpq_residual_topk,
    q_ann_ivfpq_topk,
    q_ann_pq_adc_topk,
    q_ann_recall_measured,
    q_ann_recall_trained_vs_seeded,
    q_ann_signlsh,
    q_emb_covariance,
    q_emb_dim_stats,
    q_emb_int8_quant,
    q_emb_ivf_cell_balance,
    q_emb_kmeans_lloyd,
    q_emb_matryoshka_agreement,
    q_emb_outlier_zscore,
    q_emb_pca_project,
    q_emb_pq_distortion,
    q_hash_embed,
    q_q1,
    q_q2,
    q_q2_ranking_metrics,
    q_sim_knn_join,
)
from yaml_pipe_spark.entrypoints.corpus import (
    DOREMI_ORACLE,
    KCENTER_ORACLE,
    UNIMAX_ORACLE,
    _DK_URL_EXPR,
    _SAMPLE_RATES,
    _URL_EXPR,
    _dk_hex4,
    _dk_hex4_at,
    _dk_kcenter_step,
    q_corpus_ccnet_buckets,
    q_corpus_curation_funnel,
    q_corpus_dedup_funnel,
    q_corpus_doremi_weights,
    q_corpus_dup_rate_by_source,
    q_corpus_epoch_schedule,
    q_corpus_gopher_funnel,
    q_corpus_holdout_split,
    q_corpus_mix_weights,
    q_corpus_ngram_novelty,
    q_corpus_pack_windows,
    q_corpus_ppl_quality_corr,
    q_corpus_snapshot_churn,
    q_corpus_snapshot_psi,
    q_corpus_source_cap,
    q_corpus_split_leakage_audit,
    q_corpus_temperature_mix,
    q_corpus_unimax_mix,
    q_corpus_url_canonical_dedup,
    q_sample_bottom_k_sketch,
    q_sample_kcenter_coreset,
    q_sample_stratified,
    q_sample_weighted,
    q_shard_token_budget,
)
from yaml_pipe_spark.entrypoints.dedup import (
    SEMDEDUP_ORACLE,
    SOFT_REWEIGHT_ORACLE,
    SUBSTRING_SPAN_ORACLE,
    WINNOW_PAIRS_ORACLE,
    _DK_GRAM8,
    _DK_SIGN_BUCKET,
    _dk_band_buckets,
    _dk_band_curve_oracle,
    q_dedup_canonical_quality,
    q_dedup_clusters,
    q_dedup_containment,
    q_dedup_drop_exact,
    q_dedup_emb_blocked,
    q_dedup_embedding,
    q_dedup_exact,
    q_dedup_fuzzy_decontaminate,
    q_dedup_incremental_minhash,
    q_dedup_levenshtein,
    q_dedup_lsh_recall_audit,
    q_dedup_lsh_scurve,
    q_dedup_minhash,
    q_dedup_minhash_band_curve,
    q_dedup_ngram,
    q_dedup_segment_exact,
    q_dedup_semantic_cluster,
    q_dedup_simhash,
    q_dedup_simhash_pairs,
    q_dedup_soft_reweight,
    q_dedup_substring_span,
    q_dedup_winnow_pairs,
)
from yaml_pipe_spark.entrypoints.events import (
    TWA_ORACLE,
    q_events_anomaly,
    q_events_approx_distinct,
    q_events_asof,
    q_events_cms_heavy_hitters,
    q_events_decayed,
    q_events_forget_users,
    q_events_funnel,
    q_events_funnel_time,
    q_events_grouping_sets,
    q_events_hopping,
    q_events_incremental_agg,
    q_events_interval_join,
    q_events_props,
    q_events_props_json,
    q_events_retention,
    q_events_rfm,
    q_events_session_window,
    q_events_sessionize,
    q_events_top_paths,
    q_events_transition_matrix,
    q_events_twa,
    q_events_twa_window,
    q_events_window,
)
from yaml_pipe_spark.entrypoints.graph import (
    _Z_BITS,
    _dk_zorder,
    q_graph_pagerank_centrality,
    q_graph_store_persisted,
    q_layout_zorder_locality,
)
from yaml_pipe_spark.entrypoints.multimodal import (
    PHASH_CLUSTERS_ORACLE,
    PHASH_DEDUP_ORACLE,
    PHASH_PNG_ORACLE,
    _DK_MEDIA,
    _DK_MEDIA_DECODED,
    _dk_sha_byte,
    q_multimodal,
    q_multimodal_decode_check,
    q_multimodal_frame_sample,
    q_multimodal_gif_decode,
    q_multimodal_phash_clusters,
    q_multimodal_phash_dedup,
    q_multimodal_phash_jpeg420,
    q_multimodal_phash_jpeg_prog,
    q_multimodal_phash_jpeg_rst,
    q_multimodal_phash_jpeg_color,
    q_multimodal_phash_png,
    q_multimodal_png_decode,
    q_multimodal_real_decode,
    q_multimodal_resize,
    q_multimodal_wav_resample,
)
from yaml_pipe_spark.entrypoints.pipeline import (
    C1_RECURSIVE_ORACLE,
    C2_ORACLE,
    S2_MULTI_FETCH_ORACLE,
    _DK_ELS,
    _DK_ELS_HTML,
    _DK_ELS_TXT,
    _DK_EMB_DIM,
    _DK_HTML_SRC,
    _PARSE_DISPATCH_ORACLE,
    _PARSE_ROUNDTRIP_ORACLE,
    _parse_rollup,
    q_c1,
    q_c1_recursive,
    q_c2,
    q_c3_adaptive,
    q_pipeline_full,
    q_s1,
    q_s1_parse_dispatch,
    q_s1_parse_docx,
    q_s1_parse_eml,
    q_s1_parse_epub,
    q_s1_parse_pdf,
    q_s1_parse_pptx,
    q_s1_parse_tar,
    q_s1_parse_warc,
    q_s2,
    q_s2_multi_fetch,
    q_s4,
    q_sink_partition_skew_audit,
    q_sql_udtf_chunk,
    q_t2,
    q_t3_merge,
    q_t4_cursor,
)
from yaml_pipe_spark.entrypoints.rel import (
    FLAGSHIP_ORACLE,
    _PRIORITIES,
    entry,
    q_agg_salted,
    q_flagship,
    q_rel_anti,
    q_rel_approx_quantile,
    q_rel_cube,
    q_rel_customer_distribution,
    q_rel_disjunctive,
    q_rel_equidepth_histogram,
    q_rel_forecast_revenue,
    q_rel_fulljoin,
    q_rel_important_stock,
    q_rel_join,
    q_rel_join_key_skew,
    q_rel_large_volume,
    q_rel_late_ship,
    q_rel_local_supplier_volume,
    q_rel_market_share,
    q_rel_min_cost_supplier,
    q_rel_moving_revenue,
    q_rel_order_gaps,
    q_rel_pareto_revenue,
    q_rel_part_stats,
    q_rel_parts_supplier_count,
    q_rel_percentiles,
    q_rel_pivot,
    q_rel_price_histogram,
    q_rel_pricing,
    q_rel_product_profit,
    q_rel_promo_revenue,
    q_rel_promotion_suppliers,
    q_rel_region_rollup,
    q_rel_returned_items,
    q_rel_revenue_trend,
    q_rel_rollup,
    q_rel_sales_opportunity,
    q_rel_salted_join,
    q_rel_scalar_sub,
    q_rel_scd2,
    q_rel_semi,
    q_rel_set_ops,
    q_rel_shipmode_priority,
    q_rel_shipping_priority,
    q_rel_small_qty,
    q_rel_top_supplier,
    q_rel_topk,
    q_rel_volume_shipping,
    q_rel_waiting_suppliers,
)
from yaml_pipe_spark.entrypoints.retrieval import (
    _BM25_FORGET_ORACLE,
    _DK_EMB_DOCS,
    q_q3_bm25_compact,
    q_q3_bm25_forget,
    q_q3_bm25_index_persisted,
    q_q3_bm25_topk,
    q_q3_hybrid_lexical_vector,
    q_q3_hybrid_rrf,
)
from yaml_pipe_spark.entrypoints.streaming import (
    _STREAM_COUNTER,
    _drain_to_memory,
    q_stream_ann_serve,
    q_stream_bm25_append,
    q_stream_dedup,
    q_stream_hopping,
    q_stream_incremental_dedup,
    q_stream_interval_join,
    q_stream_interval_join_outer,
    q_stream_session_window,
    q_stream_stateful,
    q_stream_static_enrich,
    q_stream_tumbling,
    q_stream_window_topk,
    q_stream_wm_dedup,
)
from yaml_pipe_spark.entrypoints.text import (
    BPE_ENCODE_ORACLE,
    BPE_TRAIN_ORACLE,
    NB_DISTILL_ORACLE,
    WINNOW_ORACLE,
    _BLOOM_K,
    _BLOOM_M,
    _BPE_PAT,
    _BPE_WS,
    _C4_PAGE_EXPR,
    _DK_BLOOM_GRAMS,
    _DK_BPE,
    _DK_DIGIT,
    _DK_MD5_BYTE,
    _ENC_SUFFIXES,
    _bpe_merges_values,
    _dk_hex_int,
    _dk_lang_scores,
    _enc_concat,
    _lang_case_sql,
    q_quality_logreg_distill,
    q_quality_nb_distill,
    q_quality_rho_excess,
    q_quality_score_calibration,
    q_text_bigram_holdout_ppl,
    q_text_bigram_logprob,
    q_text_blocklist,
    q_text_bloom_decontaminate,
    q_text_bpe_encode,
    q_text_bpe_train,
    q_text_c4_filters,
    q_text_decontaminate,
    q_text_dsir_weight,
    q_text_encoding_scrub,
    q_text_entropy,
    q_text_fingerprint,
    q_text_gopher_quality,
    q_text_lang,
    q_text_lang_confusion,
    q_text_pii_redact,
    q_text_quality,
    q_text_quality_thresholds,
    q_text_repetition,
    q_text_repetition_ratios,
    q_text_shared_ngrams,
    q_text_tfidf,
    q_text_token_bpe,
    q_text_unigram_logprob,
    q_text_vocab_coverage,
    q_text_winnow_fingerprint,
    q_text_zipf_fit,
)

from yaml_pipe_spark.entrypoints._order import CANONICAL_ORDER

# restore the monolith's registration order exactly: family modules import
# in alphabetical order, which interleaves differently than the original file
_reordered = {n: REGISTRY[n] for n in CANONICAL_ORDER if n in REGISTRY}
for _n in list(REGISTRY):
    if _n not in _reordered:
        _reordered[_n] = REGISTRY[_n]
REGISTRY.clear()
REGISTRY.update(_reordered)
del _reordered, _n


# The round driver validates a *prefix* of the queries() dict (each round
# records exactly the first 50 entries in insertion order). Round 14
# rotation (the convention VERDICT r12 ask #1 established; r13 precedent),
# in priority order:
#   1. flagship (the smoke-checked canary),
#   2. queries whose implementation CHANGED in round 14 (the r14
#      optimization restructures — their prior driver rows describe code
#      that no longer exists; pinned in tests/test_registry_order.py
#      ROUND14_CHANGED),
#   3. ROUND14_NEW — the three rows registered after round 13's prefix
#      was spent (locally verified at all three SFs, no driver row yet),
#   4. ROUND14_QUEUE — the round-9-generation refresh debt staged by the
#      r13 rotation; 6 of the 47 do not fit the 50-slot prefix and queue
#      for round 15 (ROUND15_QUEUE in tests/test_registry_order.py).
# Registry entries not listed here follow in registration order (still covered
# by bench.py and the local sf0.001/sf0.01/sf0.1 oracle-parity runs every
# round). Keep the sets in tests/test_registry_order.py in sync so the prefix
# invariant stays pinned.
DRIVER_ORDER: list[str] = [
    "flagship",  # canary: the smoke-checked query stays first
    # -- (2) CHANGED in round 14 (restructured implementations) --
    "quality_logreg_distill",
    "quality_nb_distill",
    "corpus_ppl_quality_corr",
    "corpus_gopher_funnel",
    "text_quality_thresholds",
    "text_c4_filters",
    "pipeline_forget_e2e",
    # -- (3) ROUND14_NEW: registered after round 13's prefix was spent --
    "multimodal_gif_interlaced",
    "multimodal_phash_jpeg422",
    "multimodal_phash_jpeg_pc",
    # -- (4) ROUND14_QUEUE: round-9-generation refresh (6 spill to r15) --
    "corpus_doremi_weights",
    "corpus_ngram_novelty",
    "corpus_pack_windows",
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
    "stream_bm25_append",
    "stream_interval_join_outer",
    "stream_window_topk",
    "text_bpe_train",
    "text_dsir_weight",
    "text_vocab_coverage",
]


def _ordered_names() -> list[str]:
    """DRIVER_ORDER entries that exist, then the rest in registration order."""
    head = [n for n in DRIVER_ORDER if n in REGISTRY]
    tail = [n for n in REGISTRY if n not in set(head)]
    return head + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
