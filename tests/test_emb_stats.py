"""Embedding covariance / PCA operator tests (operators/emb_stats.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.emb_stats import (
    emb_covariance,
    pca_fit,
    pca_project,
)


def _toy_vectors():
    # deterministic, anisotropic: dim 0 dominates, dims correlated
    rows = []
    for i in range(40):
        a = ((i * 37) % 19) / 19.0 - 0.5
        b = ((i * 11) % 7) / 7.0 - 0.5
        rows.append((i, [4.0 * a, 2.0 * a + b, 0.5 * b, 0.1 * (a - b)]))
    return rows


def test_covariance_matches_numpy(spark):
    rows = _toy_vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(5)
    got = {
        (r.i, r.j): r.cov for r in emb_covariance(df).collect()
    }
    m = np.array([v for _, v in rows])
    want = np.cov(m, rowvar=False, bias=True)
    d = m.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert abs(got[(i, j)] - want[i, j]) < 1e-6, (i, j)


def test_pca_fit_is_deterministic_and_ordered(spark):
    df = spark.createDataFrame(_toy_vectors(), ["vec_id", "embedding"])
    comps, ratios, mean = pca_fit(df, k=3)
    assert len(comps) == 3 and len(comps[0]) == 4
    # explained variance descending, ratios in (0, 1], sum <= 1
    assert ratios == sorted(ratios, reverse=True)
    assert 0 < ratios[0] <= 1 and sum(ratios) <= 1 + 1e-9
    # sign convention: the largest-|coord| entry of each component positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0
    # second call identical (no hidden randomness)
    comps2, ratios2, mean2 = pca_fit(df, k=3)
    assert comps == comps2 and ratios == ratios2 and mean == mean2


def test_pca_project_variance_matches_eigenvalues(spark):
    rows = _toy_vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    comps, ratios, mean = pca_fit(df, k=2)
    out = pca_project(df, comps, mean).select("pca").collect()
    p = np.array([r.pca for r in out])
    # projected dims are centered and their variances are the top
    # eigenvalues (= ratio * total variance)
    m = np.array([v for _, v in rows])
    total = np.cov(m, rowvar=False, bias=True).trace()
    assert np.allclose(p.mean(axis=0), 0, atol=1e-9)
    assert np.allclose(
        p.var(axis=0), [r * total for r in ratios], rtol=1e-6
    )
    # projection is a pure Catalyst map: no Python nodes in its plan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pca_project(df, comps, mean).explain("simple")
    assert "EvalPython" not in buf.getvalue()


def test_covariance_partials_bounded_state(spark):
    # every task emits exactly one partial row regardless of its row count
    from yaml_pipe_spark.operators.emb_stats import covariance_partials

    df = spark.createDataFrame(_toy_vectors(), ["vec_id", "embedding"])
    parts = covariance_partials(df.repartition(3)).collect()
    assert 1 <= len(parts) <= 3
    assert sum(r.n for r in parts) == 40
    assert all(len(r.ss) == 16 for r in parts)
