"""Invariant tests for the round-3 additions: TPC-H Q7/Q10/Q15 analogs,
int8 quantization, DSIR weights, transition matrix, source cap, holdout
split. (Oracle hash-parity is covered by tests/test_oracle_parity.py —
these pin the semantics the hashes can't explain.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from yaml_pipe_spark.entrypoints import REGISTRY


def _q(name, spark, sf=SF_SMALL):
    return REGISTRY[name].fn(spark, sf)


# ------------------------------------------------------ int8 quantization


def test_int8_quant_error_bounded_by_half_quantum(spark):
    # symmetric round-to-nearest: reconstruction error <= scale/2
    # = max|x| / 254 per vector; the query's worst_err per label must obey
    # the bound computed from the raw vectors
    emb = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select(
            F.col("label").cast("long").alias("label"),
            F.array_max(
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda v: F.abs(v),
                )
            ).alias("mx"),
        )
        .groupBy("label")
        .agg(F.max(F.col("mx") / 254.0).alias("bound"))
    )
    bounds = {r.label: r.bound for r in emb.collect()}
    out = _q("emb_int8_quant", spark).collect()
    assert out
    for r in out:
        assert r.worst_err <= bounds[r.label] + 1e-6, r
        assert r.min_cos > 0.999  # 8-bit keeps direction essentially intact


# ------------------------------------------------------ DSIR weights


def test_dsir_target_lang_scores_higher(spark):
    rows = _q("text_dsir_weight", spark).collect()
    by_lang: dict[str, list[float]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.dsir_logweight)
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    # the importance weight is log p_en - log p_corpus: English documents
    # must average strictly higher than every other language
    assert all(means["en"] > m for k, m in means.items() if k != "en"), means


# ------------------------------------------------------ transition matrix


def test_transition_matrix_rows_normalize(spark):
    rows = _q("events_transition_matrix", spark).collect()
    assert rows
    by_prev: dict[str, float] = {}
    n_by_prev: dict[str, int] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
        n_by_prev[r.prev_type] = n_by_prev.get(r.prev_type, 0) + r.n
    # probabilities per source state sum to 1 (up to rounding x #targets)
    for k, s in by_prev.items():
        assert abs(s - 1.0) <= 5e-4 * len(rows), (k, s)
    # total transitions = total events - one per user (last has no next)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(n_by_prev.values()) == n_events - n_users


# ------------------------------------------------------ holdout split


def test_holdout_split_deterministic_and_complete(spark):
    a = {(r.lang, r.split): (r.n_docs, r.n_chars_total)
         for r in _q("corpus_holdout_split", spark).collect()}
    b = {(r.lang, r.split): (r.n_docs, r.n_chars_total)
         for r in _q("corpus_holdout_split", spark).collect()}
    assert a == b  # hash split: identical across runs
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    assert sum(n for n, _ in a.values()) == docs.count()
    total = sum(n for n, _ in a.values())
    train = sum(n for (l, s), (n, _) in a.items() if s == "train")
    assert 0.8 < train / total < 0.98  # ~232/256 expected


# ------------------------------------------------------ source cap


def test_source_cap_keeps_best_and_caps(spark):
    rows = _q("corpus_source_cap", spark).collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    for src, kept in per_src.items():
        assert len(kept) <= 15, src
        scores = [r.quality_score for r in sorted(kept, key=lambda r: r.rn)]
        assert scores == sorted(scores, reverse=True), src


# ------------------------------------------------------ TPC-H analogs


def test_volume_shipping_symmetric_pair_only(spark):
    rows = _q("rel_volume_shipping", spark).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_3", "NATION_7"), ("NATION_7", "NATION_3")}
    assert all(r.l_year in (1996, 1997) for r in rows)


def test_returned_items_is_top20_by_revenue(spark):
    rows = _q("rel_returned_item_revenue", spark).collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_top_supplier_hits_the_max(spark):
    rows = _q("rel_top_supplier", spark).collect()
    assert rows
    # recompute the per-supplier revenue independently and compare the max
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    best = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev")
        )
        .agg(F.max("rev"))
        .first()[0]
    )
    assert all(math.isclose(r.total_rev, best) for r in rows)
