"""Streaming incremental dedup: micro-batch-by-micro-batch equivalence with
the sequential batch computation, and rerun/crash-replay idempotency."""

from __future__ import annotations

import pytest

import os
import shutil
import time

from pyspark.sql import functions as F

from yaml_pipe_spark.operators.dedup import (
    incremental_minhash_dedup,
    lsh_band_table,
    merge_band_state,
    minhash_band_state,
    minhash_signatures,
    token_shingles,
)
from yaml_pipe_spark.streaming.stream import run_incremental_dedup_stream

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
S1 = [(1, BASE + " lambda mu"),
      (2, "one two three four five six seven eight nine ten")]
S2 = [(10, BASE + " lambda nu"),          # near-dup of 1 -> dup_old
      (11, "completely different words with no overlap at all here"),
      (12, "completely different words with no overlap at all there")]
S3 = [(20, BASE + " lambda mu xi"),        # near-dup of 1 -> dup_old
      (21, "completely different words with no overlap at all here too"),
      (22, "fresh novel content that matches nothing previously ingested")]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect_verdicts(spark, state_dir):
    return {
        r["doc_id"]: (r["reason"], r["dup_of"], r["jaccard"])
        for r in spark.read.parquet(os.path.join(state_dir, "verdicts"))
        .select("doc_id", "dup_of", "jaccard", "reason")
        .collect()
    }


def _stage(spark, tmp_path, snapshots, preload):
    """Write each snapshot as one file with increasing mtimes (the file
    source orders batches by modification time)."""
    base = str(tmp_path / "run")
    shutil.rmtree(base, ignore_errors=True)
    inp = os.path.join(base, "input")
    os.makedirs(inp)
    for i, snap in enumerate(snapshots):
        part = os.path.join(base, f"__stage{i}")
        _df(spark, snap).coalesce(1).write.parquet(part)
        src = next(
            f for f in os.listdir(part) if f.endswith(".parquet")
        )
        dst = os.path.join(inp, f"snap{i}.parquet")
        shutil.copy(os.path.join(part, src), dst)
        os.utime(dst, (time.time() + i, time.time() + i))
    state = os.path.join(base, "state")
    from yaml_pipe_spark.streaming.stream import commit_band_state

    commit_band_state(minhash_band_state(_df(spark, preload)), state)
    (
        _df(spark, preload).withColumn("__snap", F.lit(-1))
        .write.partitionBy("__snap")
        .parquet(os.path.join(state, "corpus"))
    )
    return base, inp, state


@pytest.mark.slow  # driver fast lane (r14)
def test_multi_batch_drain_equals_sequential_batch(spark, tmp_path):
    base, inp, state = _stage(spark, tmp_path, [S2, S3], preload=S1)
    run_incremental_dedup_stream(
        spark, inp, state, os.path.join(base, "ckpt"),
        threshold=0.7, max_files_per_trigger=1,
    )
    got = _collect_verdicts(spark, state)

    # sequential batch application of the SAME increments
    old = _df(spark, S1)
    st = minhash_band_state(old)
    want = {}
    for snap in (S2, S3):
        new = _df(spark, snap)
        for r in incremental_minhash_dedup(
            new, st, old, threshold=0.7
        ).collect():
            want[r["doc_id"]] = (r["reason"], r["dup_of"], r["jaccard"])
        nb = lsh_band_table(
            minhash_signatures(token_shingles(new, "text", "doc_id"))
        )
        st = merge_band_state(st, nb, new_ids=new).localCheckpoint()
        old = old.unionByName(new).localCheckpoint()
    assert got == want
    # sanity on the semantics themselves
    assert got[10][0] == "dup_old" and got[10][1] == 1
    assert got[20][0] == "dup_old" and got[20][1] == 1
    assert got[22][0] == "kept"


def test_rerun_after_state_merge_is_idempotent(spark, tmp_path):
    """Crash-replay contract: replaying the drain AFTER the state writes
    landed (fresh checkpoint, same input) must converge to identical
    verdicts — including jaccard values — and an unchanged band state."""
    base, inp, state = _stage(spark, tmp_path, [S2], preload=S1)
    ck1 = os.path.join(base, "ckpt1")
    run_incremental_dedup_stream(spark, inp, state, ck1, threshold=0.7)
    first = _collect_verdicts(spark, state)
    from yaml_pipe_spark.streaming.stream import read_band_state

    bands_first = sorted(
        tuple(r) for r in read_band_state(spark, state).collect()
    )
    # replay with a fresh checkpoint: the batch reprocesses against a state
    # that ALREADY contains the increment
    run_incremental_dedup_stream(
        spark, inp, state, os.path.join(base, "ckpt2"), threshold=0.7
    )
    second = _collect_verdicts(spark, state)
    bands_second = sorted(
        tuple(r) for r in read_band_state(spark, state).collect()
    )
    assert second == first
    assert bands_second == bands_first


def test_checkpoint_skips_processed_files(spark, tmp_path):
    """Re-invoking the drain with the SAME checkpoint processes nothing new
    (the checkpoint's file log is the exactly-once ledger)."""
    base, inp, state = _stage(spark, tmp_path, [S2], preload=S1)
    ck = os.path.join(base, "ckpt")
    run_incremental_dedup_stream(spark, inp, state, ck, threshold=0.7)
    mtime = max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(os.path.join(state, "verdicts"))
        for f in fs
    )
    run_incremental_dedup_stream(spark, inp, state, ck, threshold=0.7)
    mtime2 = max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(os.path.join(state, "verdicts"))
        for f in fs
    )
    assert mtime2 == mtime


def test_commit_band_state_crash_leaves_prior_generation_current(
    spark, tmp_path
):
    """The pointer-swap commit: a failed generation write must leave the
    previous generation current and intact (a plain directory overwrite
    would have deleted it before crashing)."""
    import pytest

    from yaml_pipe_spark.streaming.stream import (
        commit_band_state,
        read_band_state,
    )

    state = str(tmp_path / "st")
    df1 = spark.createDataFrame(
        [(1, 0, "k")], "doc_id long, band_id int, band_key string"
    )
    commit_band_state(df1, state)
    # a generation whose evaluation raises mid-write
    bad = spark.createDataFrame([(0,)], "band_id int").selectExpr(
        "CAST(1 AS LONG) AS doc_id",
        "band_id",
        "CAST(assert_true(band_id > 0) AS STRING) AS band_key",
    )
    with pytest.raises(Exception):
        commit_band_state(bad, state)
    cur = read_band_state(spark, state)
    assert [tuple(r) for r in cur.collect()] == [(1, 0, "k")]
    # further commits succeed and GC bounds the generation count
    commit_band_state(df1, state)
    commit_band_state(df1, state)
    vs = [d for d in os.listdir(state) if d.startswith("bands_v")]
    assert len(vs) <= 3  # current + predecessor (+ one failed leftover max)
    assert [tuple(r) for r in read_band_state(spark, state).collect()] == [
        (1, 0, "k")
    ]
