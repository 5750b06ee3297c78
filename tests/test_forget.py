"""Right-to-be-forgotten deletes on the persisted index stores (round 10):
serve-after-forget must be value-identical to a rebuild without the rows,
the XOR fingerprint must compose back out (is_stale(remaining) is False),
deletes must be idempotent, and the physical layout must actually purge
(emptied partitions dropped; compact() clears tombstones)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.ann_index import _VB, IvfPqIndexStore
from yaml_pipe_spark.operators.retrieval import Bm25IndexStore


# --------------------------------------------------------------------------
# ANN store
# --------------------------------------------------------------------------


def _ann_frames(spark, n=60, dim=8, seed=3):
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
    return sorted(
        [tuple(r) for r in df.collect()], key=lambda t: (t[0], t[1])
    )


def test_ann_forget_matches_rebuild_without_rows(spark, tmp_path):
    corpus, cents, qs = _ann_frames(spark)
    gone = corpus.filter(F.col("vec_id") % 5 == 2)
    keep = corpus.filter(F.col("vec_id") % 5 != 2)

    full = IvfPqIndexStore(str(tmp_path / "full"))
    full.build(corpus, cents)
    n = full.forget(gone.select("vec_id"))
    assert n == gone.count()

    fresh = IvfPqIndexStore(str(tmp_path / "fresh"))
    fresh.build(keep, cents)

    got = _rows(full.serve(qs, k=5, nprobe=2, rerank_m=20))
    want = _rows(fresh.serve(qs, k=5, nprobe=2, rerank_m=20))
    assert got == want

    # fingerprint composed out: the store now equals the remaining corpus
    assert full.is_stale(keep, centroids=cents) is False
    assert full.is_stale(corpus, centroids=cents) is True


def test_ann_forget_is_idempotent_and_physical(spark, tmp_path):
    corpus, cents, qs = _ann_frames(spark)
    gone_ids = corpus.filter(F.col("vec_id") < 10).select("vec_id")
    keep = corpus.filter(F.col("vec_id") >= 10)

    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)
    assert store.forget(gone_ids) == 10
    # double-forget: the semi-join drops absent ids; nothing changes
    assert store.forget(gone_ids) == 0
    assert store.is_stale(keep, centroids=cents) is False

    # physical purge: the deleted ids exist nowhere in codes or vectors
    codes = spark.read.parquet(store.codes_path)
    vecs = spark.read.parquet(store.vectors_path)
    assert codes.filter(F.col("vec_id") < 10).count() == 0
    assert vecs.filter(F.col("vec_id") < 10).count() == 0


def test_ann_forget_drops_emptied_partitions(spark, tmp_path):
    corpus, cents, _ = _ann_frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)
    # forget EVERYTHING: every cell and bucket empties and must vanish
    store.forget(corpus.select("vec_id"))
    cid_dirs = [
        d for d in os.listdir(store.codes_path) if d.startswith("cid=")
    ]
    vb_dirs = [
        d
        for d in os.listdir(store.vectors_path)
        if d.startswith(f"{_VB}=")
    ]
    assert cid_dirs == [] and vb_dirs == []


def test_ann_forget_requires_matching_mode(spark, tmp_path):
    corpus, cents, _ = _ann_frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents, version="v1")
    with pytest.raises(ValueError, match="staleness mode"):
        store.forget(corpus.select("vec_id").limit(1))


def test_ann_old_layout_meta_is_stale(spark, tmp_path):
    corpus, cents, _ = _ann_frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)
    # simulate a pre-v2 meta: rewrite it without the layout column
    meta = spark.read.parquet(store.meta_path).drop("layout")
    meta.localCheckpoint().coalesce(1).write.mode("overwrite").parquet(
        store.meta_path
    )
    assert store.is_stale(corpus, centroids=cents) is True


# --------------------------------------------------------------------------
# BM25 store
# --------------------------------------------------------------------------

def _uniq_tok(i: int) -> str:
    # letter-only (the tokenizer is \p{L}+; digits would not survive)
    return "uniq" + "".join(chr(97 + int(d)) for d in str(i))


_DOCS = [
    (i, f"alpha beta gamma {_uniq_tok(i)} " + ("zeta " * (i % 4)))
    for i in range(40)
]


def _docs_df(spark, rows=None):
    return spark.createDataFrame(
        rows if rows is not None else _DOCS, "doc_id long, text string"
    )


def test_bm25_forget_matches_rebuild_without_rows(spark, tmp_path):
    docs = _docs_df(spark)
    gone = docs.filter(F.col("doc_id") % 4 == 1)
    keep = docs.filter(F.col("doc_id") % 4 != 1)

    store = Bm25IndexStore(str(tmp_path / "full"))
    store.build(docs)
    assert store.forget(gone) == gone.count()

    fresh = Bm25IndexStore(str(tmp_path / "fresh"))
    fresh.build(keep)

    got = _rows(store.serve(k=10))
    want = _rows(fresh.serve(k=10))
    assert got == want
    assert store.is_stale(keep) is False
    assert store.is_stale(docs) is True

    # idempotent: a second forget of the same rows subtracts nothing
    assert store.forget(gone) == 0
    assert _rows(store.serve(k=10)) == want

    # compact: physical purge, identical serve, tombstones cleared
    n = store.compact()
    assert n == gone.count()
    assert not os.path.isdir(store.tombstones_path)
    assert _rows(store.serve(k=10)) == want
    tf = spark.read.parquet(store.tf_path)
    assert tf.filter(F.col("doc_id") % 4 == 1).count() == 0
    # compacting with no tombstones is a no-op
    assert store.compact() == 0


def test_bm25_forget_vocabulary_shrinks(spark, tmp_path):
    from yaml_pipe_spark.streaming.stream import read_band_state

    docs = _docs_df(spark)
    store = Bm25IndexStore(str(tmp_path / "idx"))
    store.build(docs)
    cf0 = {
        r["tok"]: (r["df"], r["cf"])
        for r in read_band_state(spark, store.base_path, name="cf").collect()
    }
    # every doc's _uniq_tok is unique to it, so forgetting doc 7 must
    # drop that token from the vocabulary (df reaches 0)
    store.forget(docs.filter(F.col("doc_id") == 7))
    cf1 = {
        r["tok"]: (r["df"], r["cf"])
        for r in read_band_state(spark, store.base_path, name="cf").collect()
    }
    tok7 = _uniq_tok(7)
    assert tok7 in cf0 and tok7 not in cf1
    assert cf1["alpha"] == (cf0["alpha"][0] - 1, cf0["alpha"][1] - 1)


def test_bm25_forget_requires_matching_mode(spark, tmp_path):
    docs = _docs_df(spark)
    store = Bm25IndexStore(str(tmp_path / "idx"))
    store.build(docs, version="v1")
    with pytest.raises(ValueError, match="staleness mode"):
        store.forget(docs.limit(1))


def test_bm25_restore_manifest_rewinds_forget(spark, tmp_path):
    docs = _docs_df(spark)
    store = Bm25IndexStore(str(tmp_path / "idx"))
    store.build(docs)
    want = _rows(store.serve(k=10))
    store.snapshot_manifest()

    store.forget(docs.filter(F.col("doc_id") % 4 == 1))
    assert _rows(store.serve(k=10)) != want

    assert store.restore_manifest() is True
    assert not os.path.isdir(store.tombstones_path)
    assert _rows(store.serve(k=10)) == want
    assert store.is_stale(docs) is False


def test_bm25_compact_drops_standing_snapshot(spark, tmp_path):
    docs = _docs_df(spark)
    store = Bm25IndexStore(str(tmp_path / "idx"))
    store.build(docs)
    store.snapshot_manifest()
    store.forget(docs.filter(F.col("doc_id") % 4 == 1))
    store.compact()
    # the rewrite renamed every tf/dl part-file; a restore against the old
    # manifest would delete them all — compact() must drop the snapshot
    assert store.restore_manifest() is False
