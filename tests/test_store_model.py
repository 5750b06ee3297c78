"""Model-based check of the persisted-store lifecycle: drive a RANDOM but
seeded sequence of build/append/forget/compact operations against each
index store and, after every step, assert the store serves exactly what a
fresh rebuild of the live corpus serves and that the staleness gate
tracks the live corpus. This is the strongest statement of the stores'
core invariant — serve is a pure function of the live corpus, whatever
maintenance history produced the physical layout."""

from __future__ import annotations

import pytest

# driver fast lane (r14): randomized lifecycle model checks (~2.5 min);
# the lane keeps per-operation store contracts elsewhere
pytestmark = pytest.mark.slow

import random

import numpy as np
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.ann_index import IvfPqIndexStore
from yaml_pipe_spark.operators.retrieval import Bm25IndexStore


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


class _InjectedCrash(RuntimeError):
    pass


def _crash_op(store, op):
    """Run `op` with the store's meta write replaced by a crash. Meta is
    written LAST by contract, so the op dies with data possibly partially
    applied and meta describing the PRE-op state; the corpus (source of
    truth) has already moved, so recovery is the staleness gate: is_stale
    of the new live corpus must be True and build_if_stale must restore
    serve == rebuild. The monkeypatch is instance-scoped."""

    def _boom(*a, **k):
        raise _InjectedCrash("injected crash before meta write")

    store._write_meta = _boom
    try:
        import pytest

        with pytest.raises(_InjectedCrash):
            op()
    finally:
        del store._write_meta  # restore the class method


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _tok(i: int) -> str:
    return "w" + "".join(chr(97 + int(d)) for d in str(i))


def _doc_text(i: int, version: int) -> str:
    # version enters the text so a re-appended doc is observably NEW
    return (
        f"alpha beta {_tok(i)} {_tok(version * 1000 + i)} "
        + "zeta " * (i % 3)
    )


def test_bm25_store_random_lifecycle_matches_rebuild(spark, tmp_path):
    rng = random.Random(20250816)
    store = Bm25IndexStore(str(tmp_path / "idx"))

    # live model: id -> version currently indexed
    live: dict[int, int] = {i: 0 for i in range(12)}
    next_id = 12
    version = 0

    def df_of(pairs):
        return spark.createDataFrame(
            [(i, _doc_text(i, v)) for i, v in pairs],
            "doc_id long, text string",
        )

    store.build(df_of(sorted(live.items())))

    for step in range(10):
        op = rng.choice(
            ["append", "forget", "forget", "compact", "crash", "crash"]
        )
        if op == "append":
            version += 1
            fresh = [(next_id + j, version) for j in range(rng.randint(1, 3))]
            next_id += len(fresh)
            # occasionally re-append a previously forgotten id
            forgotten = [i for i in range(next_id) if i not in live]
            if forgotten and rng.random() < 0.7:
                fresh.append((rng.choice(forgotten), version))
            store.append(df_of(fresh))
            live.update(dict(fresh))
        elif op == "forget":
            if not live:
                continue
            gone = rng.sample(sorted(live), k=min(len(live), rng.randint(1, 3)))
            n = store.forget(df_of([(i, live[i]) for i in gone]))
            assert n == len(gone), (step, op)
            for i in gone:
                del live[i]
        elif op == "crash":
            # the corpus (source of truth) moves BEFORE the index op — a
            # crashed append/forget leaves the store behind the corpus and
            # the staleness gate must close the gap with a rebuild
            if rng.random() < 0.5 or not live:
                version += 1
                fresh = [(next_id, version)]
                next_id += 1
                _crash_op(store, lambda: store.append(df_of(fresh)))
                live.update(dict(fresh))
            else:
                gone = rng.sample(sorted(live), k=1)
                _crash_op(
                    store,
                    lambda: store.forget(
                        df_of([(i, live[i]) for i in gone])
                    ),
                )
                for i in gone:
                    del live[i]
            corpus = df_of(sorted(live.items()))
            assert store.is_stale(corpus) is True, (step, "post-crash")
            store.build_if_stale(corpus)
        else:
            store.compact()

        corpus = df_of(sorted(live.items()))
        rebuilt = Bm25IndexStore(str(tmp_path / f"rb{step}"))
        rebuilt.build(corpus)
        assert _rows(store.serve(k=5)) == _rows(rebuilt.serve(k=5)), (
            step,
            op,
            sorted(live),
        )
        assert store.is_stale(corpus) is False, (step, op)
        # and the gate detects any drift: drop one live doc from the model
        if live:
            probe = corpus.filter(
                F.col("doc_id") != sorted(live)[0]
            )
            assert store.is_stale(probe) is True, (step, op)


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------


def test_ann_store_random_lifecycle_matches_rebuild(spark, tmp_path):
    rng = random.Random(816)
    npr = np.random.RandomState(7)
    dim = 6

    def vec(i: int) -> list[float]:
        r = np.random.RandomState(i * 31 + 5)
        return (r.randn(dim) * 0.1).tolist()

    cents = spark.createDataFrame(
        [(c, (npr.randn(dim) * 0.1).tolist()) for c in range(3)],
        "cid long, cv array<double>",
    )
    qs = spark.createDataFrame(
        [(900 + j, vec(j * 13 + 1)) for j in range(3)],
        "qid long, qv array<double>",
    )

    def df_of(ids):
        return spark.createDataFrame(
            [(i, vec(i)) for i in sorted(ids)],
            "vec_id long, embedding array<double>",
        )

    live = set(range(20))
    next_id = 20
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(df_of(live), cents)

    for step in range(10):
        op = rng.choice(
            ["append", "forget", "forget", "compact", "crash", "crash"]
        )
        if op == "append":
            fresh = set(range(next_id, next_id + rng.randint(1, 4)))
            next_id += len(fresh)
            store.append(df_of(fresh))
            live |= fresh
        elif op == "forget":
            if not live:
                continue
            gone = set(
                rng.sample(sorted(live), k=min(len(live), rng.randint(1, 5)))
            )
            n = store.forget(df_of(gone).select("vec_id"))
            assert n == len(gone), (step, op)
            live -= gone
        elif op == "crash":
            if rng.random() < 0.5 or not live:
                fresh = {next_id}
                next_id += 1
                _crash_op(store, lambda: store.append(df_of(fresh)))
                live |= fresh
            else:
                gone = set(rng.sample(sorted(live), k=1))
                _crash_op(
                    store, lambda: store.forget(df_of(gone).select("vec_id"))
                )
                live -= gone
            assert store.is_stale(df_of(live), centroids=cents) is True, (
                step,
                "post-crash",
            )
            store.build_if_stale(df_of(live), cents)
        else:
            store.compact()

        rebuilt = IvfPqIndexStore(str(tmp_path / f"rb{step}"))
        rebuilt.build(df_of(live), cents)
        got = _rows(store.serve(qs, k=4, nprobe=2, rerank_m=10))
        want = _rows(rebuilt.serve(qs, k=4, nprobe=2, rerank_m=10))
        assert got == want, (step, op, sorted(live))
        assert store.is_stale(df_of(live), centroids=cents) is False, (
            step,
            op,
        )


def test_stores_build_over_empty_corpus(spark, tmp_path):
    """Building over an EMPTY corpus is legal (a filtered-out snapshot):
    serve returns empty, forget no-ops, and appends compose on top."""
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    bs = Bm25IndexStore(str(tmp_path / "b"))
    bs.build(empty_docs)
    assert bs.is_stale(empty_docs) is False
    assert bs.serve(k=5).count() == 0
    assert bs.forget(empty_docs) == 0
    # ids divisible by QUERY_EVERY so the pseudo-query set is non-empty
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (97, "alpha zeta")],
        "doc_id long, text string",
    )
    bs.append(docs)
    assert bs.is_stale(docs) is False
    assert bs.serve(k=5).count() > 0

    dim = 6
    empty_vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(c, [0.01 * (c + 1)] * dim) for c in range(2)],
        "cid long, cv array<double>",
    )
    qs = spark.createDataFrame(
        [(9, [0.01] * dim)], "qid long, qv array<double>"
    )
    vs = IvfPqIndexStore(str(tmp_path / "v"))
    vs.build(empty_vecs, cents)
    assert vs.is_stale(empty_vecs, centroids=cents) is False
    assert vs.serve(qs, k=3, nprobe=1, rerank_m=5).count() == 0
    assert vs.forget(empty_vecs.select("vec_id")) == 0
    vecs = spark.createDataFrame(
        [(1, [0.02] * dim), (2, [0.03] * dim)],
        "vec_id long, embedding array<double>",
    )
    vs.append(vecs)
    assert vs.is_stale(vecs, centroids=cents) is False
    assert vs.serve(qs, k=3, nprobe=1, rerank_m=5).count() > 0
