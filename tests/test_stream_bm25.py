"""Streaming BM25 index maintenance: a drained append stream must serve
value-identically to a full rebuild on the union (every persisted statistic
is additive), and replays of an applied batch must be skipped, not
double-appended."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from yaml_pipe_spark.operators.retrieval import Bm25IndexStore
from yaml_pipe_spark.streaming.stream import run_bm25_append_stream

WORDS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten eleven",
    "red orange yellow green blue indigo violet crimson amber teal",
    "north south east west upward downward inward outward forward backward",
]


def _docs(spark, ids):
    rows = [
        (i, f"{WORDS[i % 4]} filler{i % 7} tail{i % 3} extra{i % 5}")
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _serve_rows(store):
    return sorted(tuple(r) for r in store.serve(k=10).collect())


@pytest.mark.slow  # driver fast lane (r14)
def test_drained_stream_equals_full_rebuild(spark, tmp_path):
    standing = _docs(spark, range(0, 200))
    inc1 = _docs(spark, range(200, 250))
    inc2 = _docs(spark, range(250, 291))

    st = Bm25IndexStore(str(tmp_path / "stream" / "index"))
    st.build(standing)
    inp = str(tmp_path / "stream" / "input")
    inc1.coalesce(1).write.mode("append").parquet(inp)
    inc2.coalesce(1).write.mode("append").parquet(inp)
    run_bm25_append_stream(
        spark, inp, st, str(tmp_path / "stream" / "ckpt"),
        max_files_per_trigger=1,  # force >= 2 micro-batches
    )

    full = Bm25IndexStore(str(tmp_path / "full"))
    full.build(_docs(spark, range(0, 291)))
    got, want = _serve_rows(st), _serve_rows(full)
    assert got == want and len(got) > 0
    # the composed fingerprint equals the union corpus: not stale
    assert st.is_stale(_docs(spark, range(0, 291))) is False


def test_replay_of_applied_batch_is_skipped(spark, tmp_path):
    standing = _docs(spark, range(0, 150))
    inc = _docs(spark, range(150, 200))
    st = Bm25IndexStore(str(tmp_path / "s" / "index"))
    st.build(standing)
    inp = str(tmp_path / "s" / "input")
    inc.coalesce(1).write.parquet(inp)
    ckpt = str(tmp_path / "s" / "ckpt")
    run_bm25_append_stream(spark, inp, st, ckpt)
    before = _serve_rows(st)
    markers = os.listdir(os.path.join(st.base_path, "applied"))
    assert markers, "applied marker written"

    # simulate a checkpoint reset (the at-least-once replay case): the
    # same files drain again as the same epoch ids; markers must skip them
    import shutil

    shutil.rmtree(ckpt)
    run_bm25_append_stream(spark, inp, st, ckpt)
    assert _serve_rows(st) == before
    assert st.is_stale(_docs(spark, range(0, 200))) is False
