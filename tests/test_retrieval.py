"""Lexical retrieval (operators/retrieval.py): ranking shape, the
known-item self-retrieval signal, and RRF fusion sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yaml_pipe_spark.entrypoints import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bm25(spark):
    return REGISTRY["q3_bm25_topk"].fn(spark, SF).toPandas()


@pytest.fixture(scope="module")
def rrf(spark):
    return REGISTRY["q3_hybrid_rrf"].fn(spark, SF).toPandas()


def test_bm25_ranking_shape(bm25):
    """Dense 1..k ranks per query, scores non-increasing within a query."""
    assert len(bm25) > 0
    for qid, g in bm25.groupby("qid"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["score"].diff().dropna() <= 1e-12).all()


def test_bm25_self_retrieval_signal(bm25):
    """Known-item queries (top tf-idf terms of the doc itself) must pull
    the source doc to rank 1 for at least half the queries — the built-in
    relevance sanity check; synthetic boilerplate may defeat a few."""
    n_queries = bm25["qid"].nunique()
    rank1_self = ((bm25["rank"] == 1) & (bm25["is_self"] == 1)).sum()
    assert rank1_self * 2 >= n_queries


def test_rrf_fusion_sanity(rrf, bm25):
    """The fused winner is strong in at least one arm, fused scores match
    1/(60+r_bm25)+1/(60+r_ql) exactly, and ranks are dense."""
    assert len(rrf) > 0
    for _, row in rrf.iterrows():
        expect = round(
            1.0 / (60 + row.r_bm25) + 1.0 / (60 + row.r_ql), 6
        )
        assert abs(row.rrf - expect) < 1e-9
    top1 = rrf[rrf["rank"] == 1]
    assert (top1[["r_bm25", "r_ql"]].min(axis=1) <= 20).all()
    for qid, g in rrf.groupby("qid"):
        assert list(g.sort_values("rank")["rank"]) == list(
            range(1, len(g) + 1)
        )


def test_bm25_tf0_rows_do_not_score(spark):
    """A candidate matching only 1 of 3 query terms gets zero BM25 mass
    from the absent terms (the grid's tf=0 rows) but a real
    query-likelihood smoothing contribution — i.e. ql is defined and
    finite for every candidate."""
    from yaml_pipe_spark.operators.retrieval import bm25_ql_scores

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha beta gamma delta"),
            (97, "epsilon zeta etaa epsilon zeta etaa"),  # no overlap w/ 0
            (5, "epsilon only here"),
        ],
        ["doc_id", "text"],
    )
    sc = bm25_ql_scores(docs).toPandas()
    # queries: doc 0 and doc 97 (doc_id % 97 == 0)
    assert set(sc["qid"]) == {0, 97}
    assert sc["bm25"].notna().all() and sc["ql"].notna().all()
    # doc 5 shares only 'epsilon' with query 97's terms -> candidate with
    # positive bm25 (one matched term) and finite negative ql
    row = sc[(sc.qid == 97) & (sc.doc_id == 5)]
    assert len(row) == 1 and float(row.bm25.iloc[0]) > 0
    assert float(row.ql.iloc[0]) < 0
