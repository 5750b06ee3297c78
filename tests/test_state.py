"""State-table lifecycle: change detection, commit, watermark (SURVEY §2.4)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from yaml_pipe_spark.operators.state import (
    changed_rows,
    commit_state,
    last_run_timestamp,
    read_state,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "item_id string, content_hash string")


def test_changed_rows_semantics(spark):
    current = _df(spark, [("a", "h1"), ("b", "h2-new"), ("c", "h3")])
    state = _df(spark, [("a", "h1"), ("b", "h2-old")])
    out = {r.item_id for r in changed_rows(current, state).collect()}
    # a unchanged -> pruned; b changed -> kept; c new -> kept
    assert out == {"b", "c"}


def test_null_hash_reprocessed(spark):
    # Deliberate fix vs reference (state_manager.py:167-170): a row whose hash
    # could not be computed must be re-processed, not silently skipped.
    current = _df(spark, [("a", None)])
    state = _df(spark, [("a", "h1")])
    assert changed_rows(current, state).count() == 1


def test_state_roundtrip(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/state"
        st0 = read_state(spark, path)
        assert st0.count() == 0  # missing ledger -> fresh start
        assert last_run_timestamp(st0) is None

        batch1 = _df(spark, [("a", "h1"), ("b", "h2")])
        commit_state(batch1, st0, path)
        st1 = read_state(spark, path)
        assert st1.count() == 2
        ts1 = last_run_timestamp(st1)
        assert ts1 is not None

        # second run: only the changed row lands, prior rows survive
        batch2 = _df(spark, [("b", "h2-new")])
        commit_state(batch2, st1, path)
        st2 = read_state(spark, path)
        got = {r.item_id: r.content_hash for r in st2.collect()}
        assert got == {"a": "h1", "b": "h2-new"}

        # incremental loop closes: nothing changed -> nothing to process
        current = _df(spark, [("a", "h1"), ("b", "h2-new")])
        assert changed_rows(current, st2).count() == 0


def test_knn_join_and_hit_rate(spark):
    from yaml_pipe_spark.operators.similarity import hit_rate, knn_join

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], "x"), (2, [0.9, 0.1], "x"), (3, [0.0, 1.0], "y")],
        "vec_id long, embedding array<double>, label string",
    )
    q = spark.createDataFrame(
        [(1, "x", [1.0, 0.0])], "qid long, expected string, qv array<double>"
    )
    nn = knn_join(q, corpus, k=1)
    rows = nn.collect()
    assert len(rows) == 1 and rows[0].vec_id == 2  # self excluded, nearest is 2
    hr = hit_rate(nn).collect()[0]
    assert hr.hit_rate == 100.0 and hr.hits == 1 and hr.total_questions == 1
