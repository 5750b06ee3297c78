"""ANN quality gate: approximate top-k operators must publish a measured
recall against the exact result, with floors.

Two corpora, two kinds of floor:
- a deterministic *clustered* corpus (10 Gaussian clusters, sigma=0.08) where
  a well-tuned ANN must reach recall@5 >= 0.8 — the regime vector search is
  actually used in (real embeddings cluster);
- the driver's synthetic embeddings table, which is isotropic random (mean
  same-label cosine == mean diff-label cosine == ~0, measured) — in that
  regime no sublinear method can reach 0.8, so the gate is *lift*: recall
  must beat the fraction of the corpus scanned (random pruning scores
  recall == scan fraction in expectation).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from yaml_pipe_spark.operators.similarity import (
    ivf_knn_join,
    knn_join,
    lsh_planes,
    recall_at_k,
    signlsh_knn_join,
)

DIM, NBITS, K = 32, 4, 5


def _clustered(spark, n=400, n_clusters=10, sigma=0.08, seed=11):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, n)
    vecs = centers[labels] + sigma * rng.standard_normal((n, DIM))
    rows = [
        (int(i), [float(x) for x in np.round(v, 6)]) for i, v in enumerate(vecs)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(int(c), [float(x) for x in np.round(v, 6)]) for c, v in enumerate(centers)],
        "cid long, cv array<double>",
    )
    return df.cache(), cents


def _queries(corpus, nq=50):
    return (
        corpus.filter(F.col("vec_id") < nq)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    )


@pytest.fixture(scope="module")
def clustered(spark):
    corpus, cents = _clustered(spark)
    q = _queries(corpus)
    exact = knn_join(q, corpus, k=K, id_col="vec_id").cache()
    yield corpus, cents, q, exact
    corpus.unpersist()
    exact.unpersist()


def test_signlsh_recall_floor_clustered(spark, clustered):
    corpus, _, q, exact = clustered
    planes = lsh_planes(DIM, NBITS)
    approx = signlsh_knn_join(q, corpus, planes, k=K, multiprobe=True)
    r = recall_at_k(approx, exact).collect()[0]
    assert r.n_queries == 50
    assert r.recall >= 0.8, f"signlsh recall@{K}={r.recall}"


def test_ivf_recall_floor_clustered(spark, clustered):
    corpus, cents, q, exact = clustered
    approx = ivf_knn_join(q, corpus, cents, k=K, nprobe=3)
    r = recall_at_k(approx, exact).collect()[0]
    assert r.recall >= 0.8, f"ivf recall@{K}={r.recall}"


def test_ann_beats_random_pruning_on_driver_table(spark):
    # the driver's embeddings are isotropic random; the honest gate there is
    # recall lift over the scanned fraction (random pruning: recall == frac)
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()
    n = emb.count()
    q = _queries(emb, nq=40)
    exact = knn_join(q, emb, k=K).cache()
    planes = lsh_planes(64, 4)
    approx = signlsh_knn_join(q, emb, planes, k=K, multiprobe=True)
    r = recall_at_k(approx, exact).collect()[0]
    # scanned fraction for nbits=4 multiprobe: (nbits+1)/2^nbits = 5/16
    frac = 5 / 16
    assert r.recall >= 1.2 * frac, f"lift too low: recall={r.recall} frac={frac}"
    emb.unpersist()
    exact.unpersist()


def test_lsh_join_is_equi_join_not_crossjoin(spark, clustered):
    corpus, _, q, _ = clustered
    import contextlib
    import io

    planes = lsh_planes(DIM, NBITS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        signlsh_knn_join(q, corpus, planes, k=K).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


@pytest.mark.slow  # driver fast lane (r14)
def test_kmeans_ivf_beats_arbitrary_centroids(spark, clustered):
    from yaml_pipe_spark.operators.similarity import kmeans_fit

    corpus, true_cents, q, exact = clustered
    fitted = kmeans_fit(corpus, n_clusters=10, max_iterations=8)
    cents = fitted.collect()
    assert len(cents) == 10
    # fitted centroids must be unit-norm (spherical k-means)
    import math

    for r in cents:
        assert abs(math.sqrt(sum(x * x for x in r.cv)) - 1.0) < 1e-6
    approx = ivf_knn_join(q, corpus, fitted, k=K, nprobe=2)
    r = recall_at_k(approx, exact).collect()[0]
    assert r.recall >= 0.85, f"kmeans-ivf recall@{K}={r.recall}"


@pytest.mark.slow  # driver fast lane (r14)
def test_kmeans_is_deterministic(spark, clustered):
    from yaml_pipe_spark.operators.similarity import kmeans_fit

    corpus, _, _, _ = clustered
    a = kmeans_fit(corpus, n_clusters=4, max_iterations=3).collect()
    b = kmeans_fit(corpus, n_clusters=4, max_iterations=3).collect()
    assert sorted(map(tuple, ((r.cid, tuple(r.cv)) for r in a))) == sorted(
        map(tuple, ((r.cid, tuple(r.cv)) for r in b))
    )


@pytest.mark.slow  # driver fast lane (r14)
def test_ivf_assignment_partition_pruned_probe(spark, tmp_path):
    """The docstring claim made executable: writing the IVF assignment
    partitioned by cid turns a probe into a partition-pruned scan — the
    cid filter must appear in PartitionFilters, not as a post-scan filter
    over every cell."""
    import contextlib
    import io

    from yaml_pipe_spark.operators.similarity import ivf_assign, kmeans_fit
    from yaml_pipe_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_fit(emb, n_clusters=4, max_iterations=3)
    assignment = ivf_assign(emb, cents)
    # independent expectation, computed before the partitioned write
    expected = assignment.filter(F.col("cid") == 1).count()
    path = str(tmp_path / "ivf")
    assignment.write.partitionBy("cid").parquet(path)

    probe = spark.read.parquet(path).filter(F.col("cid") == 1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(cid" in plan
    # pruning is real, not just planned: cell 1 survives the rewrite intact
    assert probe.count() == expected > 0


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's OptimizeSkewedJoin is the runtime backstop for key skew the
    salting operators handle explicitly: with one hot key dominating a
    sort-merge join, the final adaptive plan must mark the join skew=true
    (the hot partition was split instead of serializing on one task)."""
    from pyspark.sql import functions as F2

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.shuffle.partitions": "8",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F2.when(F2.col("id") % 100 < 98, F2.lit(7))
            .otherwise(F2.col("id"))
            .alias("k"),
            F2.col("id").alias("v"),
        )
        right = spark.range(0, 5_000).select(
            F2.when(F2.col("id") % 100 < 98, F2.lit(7))
            .otherwise(F2.col("id"))
            .alias("k"),
            F2.col("id").alias("w"),
        )
        j = left.join(right, "k").groupBy().count()
        j.collect()
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_knn_join_arrow_bit_identical_to_expression_path(spark, clustered):
    """The Arrow scorer must reproduce the interpreted-fold results EXACTLY
    (same rounded score, same rank, same tiebreaks) — that is the contract
    that lets oracled queries switch to it without touching their SQL twins.
    np.cumsum is a sequential prefix sum, so every dot is the same IEEE-754
    op sequence as zip_with/aggregate; a matmul would not be."""
    from yaml_pipe_spark.operators.similarity import knn_join_arrow

    corpus, _, q, exact = clustered
    got = sorted(
        map(
            tuple,
            knn_join_arrow(q, corpus, k=K)
            .select("qid", "vec_id", "rank", "score")
            .collect(),
        )
    )
    want = sorted(
        map(tuple, exact.select("qid", "vec_id", "rank", "score").collect())
    )
    assert got == want


def test_knn_join_arrow_guards_large_query_side(spark, clustered):
    corpus, _, q, _ = clustered
    with pytest.raises(ValueError, match="collects the query side"):
        from yaml_pipe_spark.operators.similarity import knn_join_arrow

        knn_join_arrow(q, corpus, k=K, max_query_rows=10)
