"""Small-file compaction on the persisted IVF-PQ store (round 10):
compact() must coalesce every fragmented partition to one data file,
touch nothing else (serve value-identical, meta bytes unread/unwritten,
staleness unchanged), and cost file surgery proportional to the
fragmentation — a second compact() is a 0-partition no-op."""

from __future__ import annotations

import pytest

# driver fast lane (r14): compaction depth; exercised by the slow forget matrix too
pytestmark = pytest.mark.slow

import numpy as np
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.ann_index import (
    _VB,
    IvfPqIndexStore,
    _partition_file_counts,
)


def _frames(spark, n=60, dim=8, seed=5):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype("float64") * 0.1
    corpus = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, vecs[c * 7].tolist()) for c in range(4)],
        "cid long, cv array<double>",
    )
    qs = spark.createDataFrame(
        [(100 + j, (vecs[j * 11] + 0.01).tolist()) for j in range(3)],
        "qid long, qv array<double>",
    )
    return corpus, cents, qs


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: (t[0], t[1]))


def test_compact_coalesces_and_serves_identically(spark, tmp_path):
    corpus, cents, qs = _frames(spark)
    standing = corpus.filter(F.col("vec_id") < 40)
    inc1 = corpus.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 50))
    inc2 = corpus.filter(F.col("vec_id") >= 50)

    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(standing, cents)
    store.append(inc1)
    store.append(inc2)

    codes_before = _partition_file_counts(
        spark, store.codes_path, store.cid_col
    )
    vecs_before = _partition_file_counts(spark, store.vectors_path, _VB)
    # the append chain (and the multi-task build itself) fragments
    assert any(n > 1 for n in codes_before.values()) or any(
        n > 1 for n in vecs_before.values()
    )

    want = _rows(store.serve(qs, k=5, nprobe=2, rerank_m=20))
    meta_before = store._read_meta(spark)

    n_rewritten = store.compact()
    assert n_rewritten > 0

    codes_after = _partition_file_counts(
        spark, store.codes_path, store.cid_col
    )
    vecs_after = _partition_file_counts(spark, store.vectors_path, _VB)
    assert all(n <= 1 for n in codes_after.values())
    assert all(n <= 1 for n in vecs_after.values())
    # no partition vanished or appeared
    assert set(codes_after) == set(codes_before)
    assert set(vecs_after) == set(vecs_before)

    assert _rows(store.serve(qs, k=5, nprobe=2, rerank_m=20)) == want
    assert store._read_meta(spark) == meta_before
    assert store.is_stale(corpus, centroids=cents) is False

    # second compact: nothing fragmented, nothing rewritten
    assert store.compact() == 0


def test_compact_preserves_forget(spark, tmp_path):
    corpus, cents, qs = _frames(spark)
    keep = corpus.filter(F.col("vec_id") % 5 != 2)

    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)
    store.forget(
        corpus.filter(F.col("vec_id") % 5 == 2).select("vec_id")
    )
    want = _rows(store.serve(qs, k=5, nprobe=2, rerank_m=20))

    store.compact()
    assert _rows(store.serve(qs, k=5, nprobe=2, rerank_m=20)) == want
    assert store.is_stale(keep, centroids=cents) is False
    # the purge stayed physical through the rewrite
    vectors = spark.read.parquet(store.vectors_path)
    assert vectors.filter(F.col("vec_id") % 5 == 2).count() == 0
