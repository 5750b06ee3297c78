"""Right-to-be-forgotten deletes on the persisted index stores (round 10):
serve-after-forget must be value-identical to a rebuild without the rows,
the XOR fingerprint must compose back out (is_stale(remaining) is False),
deletes must be idempotent, and the physical layout must actually purge
(emptied partitions dropped; compact() clears tombstones)."""

from __future__ import annotations

import os

import numpy as np
import pytest

# driver fast lane (r14): exhaustive store-forget matrix (~4 min); the lane keeps cmd_forget end-to-end + cap tests
pytestmark = pytest.mark.slow
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
    # forget EVERYTHING: every data-bearing cell and bucket empties and
    # must vanish; what remains is at most the 0-row schema anchor that
    # keeps the table readable (review-wave fix: a fileless directory
    # crashed serve()/forget() with UNABLE_TO_INFER_SCHEMA while the
    # fingerprint reported fresh)
    store.forget(corpus.select("vec_id"))
    cid_dirs = [
        d for d in os.listdir(store.codes_path) if d.startswith("cid=")
    ]
    vb_dirs = [
        d
        for d in os.listdir(store.vectors_path)
        if d.startswith(f"{_VB}=")
    ]
    assert cid_dirs in ([], ["cid=0"]) and vb_dirs in ([], [f"{_VB}=0"])
    assert spark.read.parquet(store.codes_path).count() == 0
    assert spark.read.parquet(store.vectors_path).count() == 0


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


# --------------------------------------------------------------------------
# Round-10 review-wave regressions
# --------------------------------------------------------------------------


def test_ann_forget_everything_then_serve_and_reappend(spark, tmp_path):
    """A purge that empties EVERY partition must leave a readable (0-row)
    store: serve returns empty top-k, a second forget is a no-op, the
    fingerprint reports the empty corpus as fresh, and a later append
    composes on top of the anchored layout."""
    corpus, cents, qs = _ann_frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)
    n_all = corpus.count()
    assert store.forget(corpus.select("vec_id")) == n_all

    empty = corpus.limit(0)
    assert store.is_stale(empty, centroids=cents) is False
    assert store.serve(qs, k=5, nprobe=2, rerank_m=20).count() == 0
    # idempotent even against the emptied store
    assert store.forget(corpus.select("vec_id")) == 0

    # appends compose on the anchored layout
    back = corpus.filter(F.col("vec_id") < 20)
    store.append(back)
    fresh = IvfPqIndexStore(str(tmp_path / "fresh"))
    fresh.build(back, cents)
    got = _rows(store.serve(qs, k=5, nprobe=2, rerank_m=20))
    want = _rows(fresh.serve(qs, k=5, nprobe=2, rerank_m=20))
    assert got == want
    assert store.is_stale(back, centroids=cents) is False


def test_bm25_reappend_forgotten_doc_serves_again(spark, tmp_path):
    """A doc forgotten and later legitimately re-appended (it is no longer
    indexed, so its id is NEW) must serve again: its re-appended rows are
    stamped with a generation the tombstone does not cover, so serve
    hash-equals a rebuild of the final corpus while the old physical rows
    stay masked until compact()."""
    docs = _docs_df(spark)
    gone = docs.filter(F.col("doc_id").isin(7, 11))
    keep = docs.filter(~F.col("doc_id").isin(7, 11))

    store = Bm25IndexStore(str(tmp_path / "idx"))
    store.build(docs)
    assert store.forget(gone) == 2

    # doc 7 re-enters with NEW text; doc 11 stays forgotten
    new7 = _docs_df(spark, rows=[(7, "alpha omega rewritten body")])
    store.append(new7)

    final = keep.unionByName(new7)
    fresh = Bm25IndexStore(str(tmp_path / "fresh"))
    fresh.build(final)
    assert _rows(store.serve(k=10)) == _rows(fresh.serve(k=10))
    assert store.is_stale(final) is False
    assert store.is_stale(docs) is True

    # the tombstones REMAIN (they mask doc 7's old-generation rows and
    # all of doc 11); compact() purges physically and keeps serving the
    # re-appended rows
    ts = {r[0] for r in spark.read.parquet(store.tombstones_path).collect()}
    assert ts == {7, 11}
    assert store.compact() == 2
    assert not os.path.isdir(store.tombstones_path)
    assert _rows(store.serve(k=10)) == _rows(fresh.serve(k=10))
    tf = spark.read.parquet(store.tf_path)
    # doc 7's surviving rows are exactly its NEW generation
    assert tf.filter(F.col("doc_id") == 7).select(
        "__gen"
    ).distinct().collect() == [(1,)]
    assert tf.filter(F.col("doc_id") == 11).count() == 0


def test_bm25_forget_reappend_forget_again(spark, tmp_path):
    """Liveness (not bare tombstone membership) drives the subtraction:
    forgetting a doc that was forgotten and then re-appended must subtract
    its NEW rows and hide them."""
    docs = _docs_df(spark)
    store = Bm25IndexStore(str(tmp_path / "idx"))
    store.build(docs)
    gone3 = docs.filter(F.col("doc_id") == 3)
    store.forget(gone3)
    new3 = _docs_df(spark, rows=[(3, "totally new text three")])
    store.append(new3)
    assert store.forget(new3) == 1

    keep = docs.filter(F.col("doc_id") != 3)
    fresh = Bm25IndexStore(str(tmp_path / "fresh"))
    fresh.build(keep)
    assert _rows(store.serve(k=10)) == _rows(fresh.serve(k=10))
    assert store.is_stale(keep) is False


def test_bm25_forget_crash_retry_cannot_double_subtract(spark, tmp_path):
    """Write order inside forget(): tombstones commit BEFORE the
    subtractive cf swap, so retrying a forget that crashed between the two
    no-ops instead of subtracting df/cf twice — and the un-recomposed meta
    reports stale (rebuild), never a clean fingerprint over corrupt
    stats."""
    from yaml_pipe_spark.streaming.stream import read_band_state

    docs = _docs_df(spark)
    store = Bm25IndexStore(str(tmp_path / "idx"))
    store.build(docs)
    cf0 = {
        r["tok"]: (r["df"], r["cf"])
        for r in read_band_state(spark, store.base_path, name="cf").collect()
    }
    gone = docs.filter(F.col("doc_id") == 7)

    # simulate the crash window: tombstones written, cf swap + meta not
    gen = int(store._read_meta(spark)["gen"])
    (
        gone.select("doc_id")
        .withColumn("__ts_gen", F.lit(gen))
        .write.mode("append")
        .parquet(store.tombstones_path)
    )

    # the retry no-ops: the rows are already masked -> nothing subtracted
    assert store.forget(gone) == 0
    cf1 = {
        r["tok"]: (r["df"], r["cf"])
        for r in read_band_state(spark, store.base_path, name="cf").collect()
    }
    assert cf1 == cf0
    # meta was never recomposed, so staleness REPORTS the inconsistency
    assert store.is_stale(docs.filter(F.col("doc_id") != 7)) is True


def test_bm25_retriever_read_path_masks_tombstones(spark, tmp_path):
    """The CLI retriever's free-text topk() reads tf/dl straight off the
    store and must apply the same deletion vectors as serve()."""
    from yaml_pipe_spark.retrievers import Bm25Retriever

    docs = _docs_df(spark).withColumnRenamed("doc_id", "__id")
    r = Bm25Retriever(str(tmp_path / "idx"))
    r.store.build(docs)
    gone = docs.filter(F.col("__id") == 7)
    r.store.forget(gone)

    qs = spark.createDataFrame(
        [(0, f"alpha {_uniq_tok(7)}")], "qid long, qtext string"
    )
    got = r.topk(docs, qs, k=40).collect()
    assert all(row["__id"] != 7 for row in got)
    # the unique token of doc 7 left the vocabulary; alpha still matches
    assert len(got) > 0


def test_twa_pandas_twin_matches_window_on_half_ties(spark):
    """unit derivation ties: 0.125 * 100 == 12.5 exactly — banker's
    rounding (pandas Series.round) would give 12 where F.round and DuckDB
    give 13. The grouped-map twin must round half-away-from-zero."""
    import datetime as dt

    from yaml_pipe_spark.operators.events import (
        time_weighted_avg,
        time_weighted_avg_window,
    )

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (1, 1, t0, 0.125),
        (1, 2, t0 + dt.timedelta(seconds=1), 0.115),
        (1, 3, t0 + dt.timedelta(seconds=2), 0.105),
        (2, 4, t0, -0.125),
        (2, 5, t0 + dt.timedelta(seconds=1), -0.125),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r["user_id"]: r["twa_value"]
        for r in time_weighted_avg(ev, unit_dp=2, out_dp=4).collect()
    }
    want = {
        r["user_id"]: r["twa_value"]
        for r in time_weighted_avg_window(ev, unit_dp=2, out_dp=4).collect()
    }
    assert got == want
    # user 1: units 13, 12 (half-away), dt 1s each -> (13+12)/2 = 12.5
    # units -> 0.125; banker's (12, 12) would have produced 0.12
    assert got[1] == pytest.approx(0.125)
    # user 2 single interval: unit -13 held 1s -> -0.13
    assert got[2] == pytest.approx(-0.13)


def test_spread_for_expansion_probes_materialized_frames(spark):
    from yaml_pipe_spark.session import spread_for_expansion

    one = (
        spark.range(0, 1000)
        .coalesce(1)
        .localCheckpoint()
    )
    assert one.rdd.getNumPartitions() == 1
    # default: materialized frames are left alone (pinned behavior)
    assert spread_for_expansion(one) is one
    # opt-in probe: the stranded 1-partition frame is rescued
    spread = spread_for_expansion(one, probe_materialized=True)
    assert spread is not one
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # a well-split materialized frame stays shuffle-free
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000).repartition(par).localCheckpoint()
    assert spread_for_expansion(wide, probe_materialized=True) is wide


def test_bm25_compact_defragments_append_growth(spark, tmp_path):
    """compact() with NO tombstones must still coalesce the small-file
    growth of a long append chain (each append lands one more tf/dl
    part-file pair) — and stay value-identical."""
    docs = _docs_df(spark)
    store = Bm25IndexStore(str(tmp_path / "idx"))
    store.build(docs.filter(F.col("doc_id") < 20))
    extra = [
        (100 + i, f"appended doc {_uniq_tok(100 + i)} gamma zeta")
        for i in range(20)
    ]
    for lo in range(0, 20, 2):
        store.append(_docs_df(spark, rows=extra[lo : lo + 2]))

    def n_files(d):
        return sum(
            1 for fn in os.listdir(d) if not fn.startswith(("_", "."))
        )

    par = spark.sparkContext.defaultParallelism
    assert n_files(store.tf_path) > par  # the chain fragmented
    want = _rows(store.serve(k=10))

    assert store.compact() == 0  # nothing tombstoned — purge count is 0
    assert n_files(store.tf_path) <= par
    assert n_files(store.dl_path) <= par
    assert _rows(store.serve(k=10)) == want

    # un-fragmented, un-tombstoned: a cheap no-op that rewrites nothing
    before = sorted(os.listdir(store.tf_path))
    assert store.compact() == 0
    assert sorted(os.listdir(store.tf_path)) == before


def test_bm25_compact_on_never_built_store_is_noop(spark, tmp_path):
    assert Bm25IndexStore(str(tmp_path / "nothing")).compact() == 0


def test_twa_pandas_twin_boundary_just_below_half(spark):
    """|d| + 0.5 can round UP across the integer boundary for doubles just
    below .5 (0.5 - 2^-54): both engines round on the exact double value
    and give 0 — the grouped-map twin must too."""
    import datetime as dt

    from yaml_pipe_spark.operators.events import (
        time_weighted_avg,
        time_weighted_avg_window,
    )

    just_below = 0.49999999999999994  # largest double < 0.5
    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (1, 1, t0, just_below),
        (1, 2, t0 + dt.timedelta(seconds=1), just_below),
        (2, 3, t0, -just_below),
        (2, 4, t0 + dt.timedelta(seconds=1), -just_below),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r["user_id"]: r["twa_value"]
        for r in time_weighted_avg(ev, unit_dp=0, out_dp=4).collect()
    }
    want = {
        r["user_id"]: r["twa_value"]
        for r in time_weighted_avg_window(ev, unit_dp=0, out_dp=4).collect()
    }
    assert got == want
    assert got[1] == 0.0  # naive floor(|d|+0.5) would have produced 1.0
