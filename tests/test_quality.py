"""Unit + plan tests for the round-5 quality-curation operators
(operators/quality.py and their entrypoints queries)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Row

from tests.conftest import SF_SMALL
from yaml_pipe_spark.entrypoints import REGISTRY


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_gopher_signals_crafted(spark):
    from yaml_pipe_spark.operators.quality import gopher_quality_signals

    texts = [
        "the quick brown fox jumps over the lazy dog " * 10,  # 90 words
        "a b",  # too short, words too short
        "",  # empty
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_signals(_docs(spark, texts)).collect()
    }
    assert out[0]["n_words"] == 90
    assert out[0]["pass_words"] == 1
    assert out[0]["pass_stop"] == 1  # contains "the"
    assert out[0]["alpha_word_ratio"] == 1.0
    assert out[0]["gopher_pass"] == 1
    assert out[1]["n_words"] == 2
    assert out[1]["pass_words"] == 0
    assert out[1]["pass_mean_word_len"] == 0  # mean word len 1.0 < 3
    assert out[1]["gopher_pass"] == 0
    assert out[2]["n_words"] == 0
    assert out[2]["mean_word_len"] == 0.0
    assert out[2]["gopher_pass"] == 0


def test_repetition_signals_crafted(spark):
    from yaml_pipe_spark.operators.quality import repetition_signals

    # "x y x y x y": len 11; 2-grams: "x y"x3, "y x"x2 -> top2 = 3*3/11;
    # all five 2-grams are duplicated -> dup2 = (3*3 + 2*3)/11
    out = {
        r["doc_id"]: r
        for r in repetition_signals(
            _docs(spark, ["x y x y x y", "all unique words here", "a"])
        ).collect()
    }
    assert out[0]["top2_frac"] == round(9 / 11, 4)
    assert out[0]["dup2_frac"] == round(15 / 11, 4)
    assert out[1]["dup2_frac"] == 0.0
    assert out[2]["top2_frac"] == 0.0  # shorter than any gram -> coalesced 0


def test_repetition_tiebreak_is_lexicographically_largest(spark):
    from yaml_pipe_spark.operators.quality import repetition_signals

    # "b a b" -> 2-grams "b a", "a b", each once; tie broken toward "b a"
    # (count, gram) struct-max — length is equal here, so just assert the
    # fraction uses one gram's chars
    row = repetition_signals(_docs(spark, ["b a b"])).collect()[0]
    assert row["top2_frac"] == round(3 / 5, 4)


def test_funnel_monotone_and_matches_flags(spark):
    from yaml_pipe_spark.operators.quality import gopher_funnel

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rows = sorted(
        gopher_funnel(docs).collect(), key=lambda r: r["stage_idx"]
    )
    assert [r["stage"] for r in rows] == [
        "raw", "word_count", "mean_word_len", "alpha_ratio",
        "stopwords", "repetition",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # attrition is monotone
    assert rows[0]["retention"] == 1.0
    assert rows[-1]["n_docs"] > 0  # the cut thresholds must not empty it


def test_ccnet_buckets_partition_language(spark):
    docs = REGISTRY["corpus_ccnet_buckets"].fn(spark, SF_SMALL)
    rows = docs.collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert {r["bucket"] for r in rs} <= {"head", "middle", "tail"}
        # head has the highest (least negative) average logprob
        b = {r["bucket"]: r["avg_lp"] for r in rs}
        if len(b) == 3:
            assert b["head"] >= b["middle"] >= b["tail"]


def test_split_leakage_cluster_strategy_is_leak_free(spark):
    out = {
        r["strategy"]: r
        for r in REGISTRY["corpus_split_leakage_audit"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert out["by_cluster_hash"]["leaked_pairs"] == 0  # by construction
    total = out["by_doc_hash"]["n_train"] + out["by_doc_hash"]["n_valid"]
    assert total == out["by_cluster_hash"]["n_train"] + out[
        "by_cluster_hash"
    ]["n_valid"]


def test_gopher_signals_plan_is_narrow(spark):
    # quality signals are a stateless projection: no Exchange in the plan
    from yaml_pipe_spark.operators.quality import gopher_quality_signals

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(gopher_quality_signals(docs))
    assert "Exchange" not in plan


def test_repetition_plan_single_gram_shuffle(spark):
    # one explode feeds one (doc,n,gram) count shuffle + per-doc rollup +
    # the coalescing self-join — no Python nodes anywhere
    plan = _plan(REGISTRY["text_repetition_ratios"].fn(spark, SF_SMALL))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "mapInPandas"):
        assert marker not in plan
    assert plan.count("Generate (") == 1  # exactly one explode


def test_funnel_is_single_pass(spark):
    # the funnel fans ONE aggregate row out with stack(): exactly one scan
    # of documents per signal branch (gopher + repetition), no per-stage
    # rescans
    plan = _plan(REGISTRY["corpus_gopher_funnel"].fn(spark, SF_SMALL), "simple")
    # gopher flags branch + repetition gram branch + the narrow doc_id-only
    # coalescing branch — never a per-stage rescan (6 stages, 3 scans)
    assert plan.count("Scan parquet") <= 3


def test_zipf_fit_slopes_negative(spark):
    rows = REGISTRY["text_zipf_fit"].fn(spark, SF_SMALL).collect()
    assert rows and all(r["zipf_slope"] < 0 for r in rows)
    assert all(r["n_types"] > 1 for r in rows)


def test_epoch_schedule_invariants(spark):
    rows = REGISTRY["corpus_epoch_schedule"].fn(spark, SF_SMALL).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["epochs_capped"] <= 4.0
        assert r["epochs_capped"] <= r["epochs"]
        # temperature flattening: every lang's target is positive
        assert r["target_tokens"] > 0


def test_partition_skew_audit_shares(spark):
    rows = REGISTRY["sink_partition_skew_audit"].fn(spark, SF_SMALL).collect()
    assert abs(sum(r["pct_of_total"] for r in rows) - 1.0) < 1e-3
    mean = sum(r["est_bytes"] for r in rows) / len(rows)
    for r in rows:
        assert r["small_flag"] == int(r["est_bytes"] < 0.5 * mean)


def test_cms_overestimates_and_bounds(spark):
    rows = REGISTRY["events_cms_heavy_hitters"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["overestimate"] >= 0  # CMS never underestimates
        assert r["cms_est"] >= r["exact_n"]
        assert r["bound_ok"] == 1


def test_quality_thresholds_ordered(spark):
    rows = REGISTRY["text_quality_thresholds"].fn(spark, SF_SMALL).collect()
    for r in rows:
        assert r["p50_dup2"] <= r["p90_dup2"]
        assert r["p50_words"] <= r["p90_words"]


def test_ivf_cell_balance_sums(spark):
    rows = REGISTRY["emb_ivf_cell_balance"].fn(spark, SF_SMALL).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    mean = sum(r["n_vectors"] for r in rows) / len(rows)
    for r in rows:
        assert r["skewed"] == int(r["n_vectors"] > 2 * mean)


def test_dup_rate_by_source_normalized(spark):
    rows = (
        REGISTRY["corpus_dup_rate_by_source"].fn(spark, SF_SMALL).collect()
    )
    assert rows
    for r in rows:
        assert r["src_a"] <= r["src_b"]  # ordered pair normalization
        assert r["n_pairs"] > 0


def test_bottom_k_sketch_take_ordered_not_global_window(spark):
    df = REGISTRY["sample_bottom_k_sketch"].fn(spark, SF_SMALL)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan  # never a global row_number
    row = df.collect()[0]
    assert row["est_distinct"] > 0 and row["bound_ok"] == 1


def test_equidepth_histogram_depths(spark):
    rows = sorted(
        REGISTRY["rel_equidepth_histogram"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(8))
    assert abs(sum(r["depth_share"] for r in rows) - 1.0) < 1e-3
    # equi-depth: every bucket within 3x of the 1/8 ideal even at sf0.001
    for r in rows:
        assert 0.02 < r["depth_share"] < 0.40
    # ranges are ordered and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] <= b["lo_cents"]


def test_holdout_ppl_worse_than_self_trained(spark):
    held = {
        r["lang"]: r["avg_logprob"]
        for r in REGISTRY["text_bigram_holdout_ppl"].fn(spark, SF_SMALL).collect()
    }
    self_tr = {
        r["lang"]: r["avg_logprob"]
        for r in REGISTRY["text_bigram_logprob"].fn(spark, SF_SMALL).collect()
    }
    # held-out scoring with smoothing must be no better (lower logprob)
    # than scoring docs with an LM trained on themselves
    for lang in held:
        assert held[lang] <= self_tr[lang] + 1e-9


def test_ivfpq_residual_shares_shape_with_plain(spark):
    plain = REGISTRY["ann_ivfpq_topk"].fn(spark, SF_SMALL)
    resid = REGISTRY["ann_ivfpq_residual_topk"].fn(spark, SF_SMALL)
    assert plain.columns == resid.columns
    rows = resid.collect()
    assert rows and all(1 <= r["rank"] <= 5 for r in rows)
    # ranks are dense per query
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_top_paths_take_ordered(spark):
    df = REGISTRY["events_top_paths"].fn(spark, SF_SMALL)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 10
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(1 <= len(r["path"].split(">")) <= 3 for r in rows)
