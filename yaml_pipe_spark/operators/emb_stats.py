"""Embedding-corpus statistics: distributed covariance + PCA.

The reference has no linear-algebra surface (its vectors go straight into
LanceDB/Chroma, core/evaluation.py); these operators are the "north-star"
embedding analytics the brief's training-data pipeline needs — dimension
decorrelation checks, PCA whitening / dim reduction ahead of ANN indexing.

Design for 100 TB: covariance is the classic treeAggregate shape — each
task folds its rows into ONE (n, sum, outer-product-sum) partial in numpy
(d and d^2 floats of state, regardless of row count), the partials (one row
per task) take a single tiny shuffle, and the d^2-cell assembly never
touches row-scale data again. The eigendecomposition runs on the driver
over the d x d matrix — k x d state, same contract as kmeans_fit — and the
projection is a narrow per-row map (broadcast components).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame, functions as F

from yaml_pipe_spark.functions.vectors import dot


def covariance_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One row PER TASK: (n, s = sum of vectors, ss = flattened sum of
    outer products), accumulated in numpy across the task's Arrow batches.

    This is the map side of treeAggregate expressed as mapInPandas: state
    is d + d^2 doubles however many rows the task holds.
    """
    import numpy as np
    import pandas as pd

    def fold(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        n = 0
        s = None
        ss = None
        for b in batches:
            if not len(b):
                continue
            m = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            bs = m.sum(axis=0)
            bss = m.T @ m
            if s is None:
                s, ss = bs, bss
            else:
                s = s + bs
                ss = ss + bss
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    return df.select(vec_col).mapInPandas(
        fold, "n long, s array<double>, ss array<double>"
    )


def emb_covariance(
    df: DataFrame, vec_col: str = "embedding", decimals: int = 6
) -> DataFrame:
    """Upper-triangle covariance cells (i, j, cov), i <= j, 0-based.

    cov[i,j] = E[x_i x_j] - E[x_i] E[x_j] over the corpus. The corpus is
    read EXACTLY ONCE: each task's (s, ss) partial is exploded as one
    combined d + d^2 array, summed across tasks in a single position-keyed
    exchange, and the resulting d + d^2 aggregate rows are materialized
    with localCheckpoint — the mean and cell branches then split the tiny
    materialized frame instead of re-running the fold (a naive diamond
    here triple-scans the corpus: branch-specific filters make the
    subtrees differ, so even ReuseExchange can't unify them). Rounded to
    `decimals` so cross-partition float summation order can't flip a hash
    (noise ~1e-13 vs the 5e-7 quantum).
    """
    parts = covariance_partials(df, vec_col)
    combined = parts.select(
        "n",
        F.size("s").alias("d"),
        F.posexplode(F.concat("s", "ss")).alias("pos", "v"),
    )
    agg = (
        combined.groupBy("pos", "d")
        .agg(F.sum("v").alias("total"), F.sum("n").alias("n"))
        .localCheckpoint()
    )
    means = agg.filter(F.col("pos") < F.col("d")).select(
        F.col("pos").alias("p"), F.col("total").alias("s_sum")
    )
    cells = (
        agg.filter(F.col("pos") >= F.col("d"))
        .select(
            F.expr("(pos - d) div d").cast("long").alias("i"),
            ((F.col("pos") - F.col("d")) % F.col("d")).alias("j"),
            F.col("total").alias("ss_sum"),
            "n",
        )
        .filter(F.col("i") <= F.col("j"))
    )
    mi = means.select(F.col("p").alias("i"), F.col("s_sum").alias("si"))
    mj = means.select(F.col("p").alias("j"), F.col("s_sum").alias("sj"))
    return (
        cells.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            (
                F.round(
                    F.col("ss_sum") / F.col("n")
                    - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n")),
                    decimals,
                )
                # IEEE -0.0 + 0.0 = +0.0: a cell whose true value is a tiny
                # negative rounds to -0.0 in one engine and 0.0 in the other
                # (round() preserves sign); normalizing here makes the
                # formatted hash engine-independent.
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def pca_fit(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> tuple[list[list[float]], list[float], list[float]]:
    """Top-k principal components from the distributed covariance partials.

    Returns (components [k x d], explained_variance_ratio [k], mean [d]).
    Driver state is d x d — the same "fits by construction" contract as
    kmeans_fit (similarity.py); the corpus is only read through
    covariance_partials. Component sign is fixed (largest-|coord| entry
    made positive) so results are deterministic across LAPACK builds.
    """
    import numpy as np

    rows = covariance_partials(df, vec_col).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r.n for r in rows)
    d = len(rows[0].s)
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r.s)
        ss += np.asarray(r.ss).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    ratios = []
    total = float(np.clip(evals.sum(), 1e-30, None))
    for idx in order:
        v = evecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append([float(x) for x in v])
        ratios.append(float(evals[idx] / total))
    return comps, ratios, [float(x) for x in mean]


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the components: out[c] = (x - mean) . comp_c.

    Components/mean are expression literals (broadcast with the plan) and
    the projection is a pure Catalyst map — narrow, codegen'd, no Python.
    """
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    cols: list[Column] = []
    for comp in components:
        cvec = F.array(*[F.lit(float(c)) for c in comp])
        cols.append(dot(centered, cvec))
    return df.withColumn(out_col, F.array(*cols))
