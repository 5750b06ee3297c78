"""Persisted pair-graph store: build-once/serve-many parity with the direct
SimHash pipeline, staleness semantics, and the no-re-shingle serve plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.pair_graph import PairGraphStore


def _docs(spark, n=60):
    # deterministic near-dup families: every 10th doc repeats the same
    # base sentence with a 1-token perturbation -> SimHash pairs exist
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the quiet green forest before the morning light"
    )
    rows = []
    for i in range(n):
        fam = i % 6
        jitter = f" variant{i}" if i >= 30 else ""
        rows.append((i, f"family {fam} " + base + jitter))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow  # driver fast lane (r14)
def test_store_matches_direct_computation(spark, tmp_path):
    from yaml_pipe_spark.operators.dedup import (
        connected_components,
        simhash_fingerprints,
        simhash_near_duplicates,
    )

    docs = _docs(spark)
    store = PairGraphStore(str(tmp_path / "pg"))
    assert store.build_if_stale(docs) is True

    fps = simhash_fingerprints(docs, "text", "doc_id")
    want_pairs = sorted(
        tuple(r)
        for r in simhash_near_duplicates(
            fps, "doc_id", bits=64, bands=4, max_hamming=3
        ).collect()
    )
    got_pairs = sorted(tuple(r) for r in store.pairs(spark).collect())
    assert got_pairs == want_pairs and len(got_pairs) > 0

    want_labels = sorted(
        tuple(r)
        for r in connected_components(
            simhash_near_duplicates(
                fps, "doc_id", bits=64, bands=4, max_hamming=3
            )
        ).collect()
    )
    got_labels = sorted(tuple(r) for r in store.labels(spark).collect())
    assert got_labels == want_labels and len(got_labels) > 0


@pytest.mark.slow  # driver fast lane (r14)
def test_staleness_and_rebuild_semantics(spark, tmp_path):
    docs = _docs(spark)
    store = PairGraphStore(str(tmp_path / "pg"))
    store.build(docs)
    # fresh: same corpus -> no rebuild
    assert store.is_stale(docs) is False
    assert store.build_if_stale(docs) is False
    # corpus moved on -> stale
    grown = docs.union(
        spark.createDataFrame([(999, "completely new text")],
                              "doc_id long, text string")
    )
    assert store.is_stale(grown) is True
    # param change -> stale even with the same corpus
    other = PairGraphStore(str(tmp_path / "pg"), bands=8)
    assert other.is_stale(docs) is True
    # version pin skips the fingerprint scan
    vstore = PairGraphStore(str(tmp_path / "pgv"))
    vstore.build(docs, version="snap-1")
    assert vstore.is_stale(docs, version="snap-1") is False
    assert vstore.is_stale(docs, version="snap-2") is True


def test_serve_plan_has_no_reshingle(spark, tmp_path):
    """The whole point of the store: a downstream audit's plan must be a
    parquet scan of pairs/labels — no tokenize/explode, no banding stack,
    no fingerprint aggregation."""
    docs = _docs(spark)
    store = PairGraphStore(str(tmp_path / "pg"))
    store.build_if_stale(docs)

    sizes = (
        store.labels(spark)
        .groupBy("cluster_rep")
        .agg(F.count("*").alias("n_members"))
    )
    plan = sizes._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan  # no explode/stack re-shingle
    assert "md5" not in plan.lower(), plan  # no fingerprint recompute
    scans = plan.count("Scan parquet")
    assert scans >= 1


def test_no_append_surface(spark):
    """Pairs do not compose over disjoint row sets — the store must not
    grow a misleading append() (incremental near-dup goes through the
    minhash band-state path)."""
    assert not hasattr(PairGraphStore, "append")


def test_minhash_overlap_store_matches_direct(spark, tmp_path):
    from yaml_pipe_spark.operators.dedup import (
        DEFAULT_DF_MAX_FRAC,
        DEFAULT_DF_MIN_CUT,
        _pair_overlap,
        lsh_candidate_pairs,
        minhash_near_duplicates,
        minhash_signatures,
        token_shingles,
    )
    from yaml_pipe_spark.operators.pair_graph import MinHashOverlapStore

    docs = _docs(spark)
    store = MinHashOverlapStore(str(tmp_path / "mh"))
    assert store.build_if_stale(docs) is True
    assert store.build_if_stale(docs) is False  # fingerprint fresh

    sh = token_shingles(docs, "text", "doc_id", 3)
    cands = lsh_candidate_pairs(minhash_signatures(sh))
    want = sorted(
        tuple(r)
        for r in _pair_overlap(
            sh, cands, "doc_id", None, DEFAULT_DF_MAX_FRAC, DEFAULT_DF_MIN_CUT
        ).collect()
    )
    got = sorted(tuple(r) for r in store.overlap(spark).collect())
    assert got == want and len(got) > 0

    # jaccard projection equals the full direct pipeline
    want_j = sorted(
        tuple(r)
        for r in minhash_near_duplicates(
            docs, "text", "doc_id", k=3, n_hashes=16, bands=4, threshold=0.8
        ).collect()
    )
    got_j = sorted(
        tuple(r) for r in store.jaccard_pairs(spark, 0.8).collect()
    )
    assert got_j == want_j and len(got_j) > 0

    # param change -> stale
    assert MinHashOverlapStore(str(tmp_path / "mh"), bands=8).is_stale(
        docs
    ) is True

    # serve plan: a parquet scan + projection, no re-shingle
    plan = (
        store.jaccard_pairs(spark, 0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan, plan
    assert "md5" not in plan.lower(), plan
