"""Persisted IVF-PQ index lifecycle: build-once/serve-many parity with the
in-query path, serve-plan shape (no re-encode, no index-side shuffle,
pruned scans), and staleness/rebuild semantics."""

from __future__ import annotations

import numpy as np
import pytest

# driver fast lane (r14): IVF-PQ lifecycle depth (~2 min); the lane keeps serve/recall contracts in test_ann_recall
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from yaml_pipe_spark.operators.ann_index import IvfPqIndexStore
from yaml_pipe_spark.operators.similarity import ivfpq_topk


def _frames(spark, n=60, dim=8, seed=3):
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


def test_persisted_serve_matches_in_query_build(spark, tmp_path):
    corpus, cents, qs = _frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    assert store.build_if_stale(corpus, cents) is True
    got = sorted(
        store.serve(qs, k=5, nprobe=2, rerank_m=20).collect(),
        key=lambda r: (r["qid"], r["rank"]),
    )
    want = sorted(
        ivfpq_topk(qs, corpus, cents, k=5, nprobe=2, rerank_m=20).collect(),
        key=lambda r: (r["qid"], r["rank"]),
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_serve_plan_reads_index_without_reencode_or_index_shuffle(
    spark, tmp_path
):
    import contextlib
    import io
    import re

    corpus, cents, qs = _frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        store.serve(qs, k=5, nprobe=2, rerank_m=20).explain("simple")
    plan = buf.getvalue()
    # codes come off disk: the closed-form assignment/encode expression
    # (floor(v * 8)) must appear nowhere in the serve plan
    assert "floor(" not in plan.lower()
    # the three persisted tables are scanned, plus one extra scan of the
    # TINY centroids table inside the dynamic-pruning subquery
    assert plan.count("FileScan parquet") == 4
    # identify scans by ReadSchema (Location paths get truncated): one
    # codes scan, one vectors scan, two (tiny) centroids scans
    codes_lines = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "code:array" in ln
    ]
    vec_lines = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "embedding:array" in ln
    ]
    assert len(codes_lines) == 1 and len(vec_lines) == 1
    # the probed-cells join partition-prunes the codes scan at runtime:
    # only nprobe/n_cells of the 2-bit index is ever read
    assert "dynamicpruningexpression" in codes_lines[0]
    # the ADC join streams the codes scan against the BROADCAST probe set
    assert "BroadcastHashJoin" in plan
    # index (codes) side never shuffles: the only way it could is an
    # Exchange hash-partitioned on the cid join key
    assert not re.search(r"Exchange hashpartitioning\(cid", plan)
    # the re-rank broadcasts the top-m candidate set (BuildLeft), never
    # the full-precision vectors table: the vectors scan's parent join
    # must build its LEFT side
    rerank_joins = [
        ln for ln in plan.splitlines()
        if "BroadcastHashJoin [vec_id" in ln
    ]
    assert rerank_joins and all("BuildLeft" in ln for ln in rerank_joins)


def test_rebuild_only_when_stale(spark, tmp_path):
    corpus, cents, qs = _frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    assert store.is_stale(corpus) is True  # no index yet
    assert store.build_if_stale(corpus, cents) is True
    assert store.is_stale(corpus) is False
    assert store.build_if_stale(corpus, cents) is False  # no rebuild

    # corpus moved on -> stale; rebuild; serve sees the new vector
    extra = spark.createDataFrame(
        [(999, [0.09] * 8)], "vec_id long, embedding array<double>"
    )
    corpus2 = corpus.unionByName(extra)
    assert store.is_stale(corpus2) is True
    assert store.build_if_stale(corpus2, cents) is True
    ids = {
        r["vec_id"]
        for r in store.serve(qs, k=60, nprobe=4, rerank_m=100).collect()
    }
    assert 999 in ids

    # params change -> stale even with an identical corpus
    store8 = IvfPqIndexStore(str(tmp_path / "idx"), scale=4)
    assert store8.is_stale(corpus2) is True


def test_version_pin_skips_fingerprint(spark, tmp_path):
    """With a snapshot version the staleness check is metadata-only —
    the production mode where the metastore names the corpus snapshot."""
    corpus, cents, _ = _frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents, version="snap-1")
    assert store.is_stale(corpus, version="snap-1") is False
    assert store.is_stale(corpus, version="snap-2") is True


def test_stream_serve_matches_batch_and_replays_idempotently(
    spark, tmp_path
):
    """serve_query_stream: a multi-batch drain produces exactly the batch
    serve results for every query; replaying a drained batch (fresh
    checkpoint) overwrites its own partition with identical rows."""
    import os
    import shutil
    import time

    from yaml_pipe_spark.operators.ann_index import serve_query_stream

    corpus, cents, qs = _frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)

    # stage the 3 queries as TWO files with ordered mtimes -> two batches
    qrows = qs.collect()
    inp = str(tmp_path / "queries")
    os.makedirs(inp)
    for i, chunk in enumerate((qrows[:2], qrows[2:])):
        part = str(tmp_path / f"__q{i}")
        spark.createDataFrame(
            chunk, "qid long, qv array<double>"
        ).coalesce(1).write.parquet(part)
        src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        dst = os.path.join(inp, f"q{i}.parquet")
        shutil.copy(os.path.join(part, src), dst)
        os.utime(dst, (time.time() + i, time.time() + i))

    res = str(tmp_path / "results")
    serve_query_stream(
        spark, store, inp, res, str(tmp_path / "ck1"),
        max_files_per_trigger=1,
    )
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(res)
        .select("qid", "rank", "vec_id", "score")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in store.serve(qs, k=5, nprobe=2, rerank_m=20)
        .select("qid", "rank", "vec_id", "score")
        .collect()
    )
    assert got == want and len(got) > 0

    # replay with a fresh checkpoint and the SAME batch split (crash
    # replay re-reads the same offsets): partitions overwrite themselves,
    # same rows, no duplicates
    serve_query_stream(
        spark, store, inp, res, str(tmp_path / "ck2"),
        max_files_per_trigger=1,
    )
    again = sorted(
        tuple(r)
        for r in spark.read.parquet(res)
        .select("qid", "rank", "vec_id", "score")
        .collect()
    )
    assert again == got


def test_rebuild_clears_emptied_cell_partitions(spark, tmp_path):
    """The codes write pins partitionOverwriteMode=static per-write: under
    the session's dynamic default, a rebuild whose corpus empties an IVF
    cell would keep that cell's old codes directory and serve deleted
    vectors."""
    import os

    corpus, cents, qs = _frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)
    cells = {
        d for d in os.listdir(store.codes_path) if d.startswith("cid=")
    }
    assert len(cells) >= 2
    # keep only the vectors of ONE cell -> every other cell empties
    # (materialize the kept ids BEFORE rebuilding over the same path)
    from pyspark.sql import functions as F2

    probe = spark.read.parquet(store.codes_path)
    one_cell = probe.select("cid").distinct().orderBy("cid").first()["cid"]
    keep_ids = [
        r["vec_id"]
        for r in probe.filter(F2.col("cid") == one_cell)
        .select("vec_id")
        .collect()
    ]
    corpus2 = corpus.filter(F2.col("vec_id").isin(keep_ids))
    assert store.build_if_stale(corpus2, cents) is True
    cells2 = {
        d for d in os.listdir(store.codes_path) if d.startswith("cid=")
    }
    assert cells2 == {f"cid={one_cell}"}, cells2
    # serve never returns a deleted vector
    kept_ids = {r["vec_id"] for r in corpus2.select("vec_id").collect()}
    served = {
        r["vec_id"]
        for r in store.serve(qs, k=60, nprobe=4, rerank_m=100).collect()
    }
    assert served <= kept_ids and served


def test_centroid_change_marks_index_stale(spark, tmp_path):
    """A refit coarse quantizer invalidates every code: is_stale must see
    a centroid change even when the corpus fingerprint is unchanged."""
    from pyspark.sql import functions as F2

    corpus, cents, _ = _frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents)
    assert store.is_stale(corpus, centroids=cents) is False
    new_cents = cents.withColumn(
        "cv", F2.transform("cv", lambda v: v * 2.0)
    )
    assert store.is_stale(corpus, centroids=new_cents) is True
    # and without the centroids argument the check is corpus-only
    assert store.is_stale(corpus) is False


def test_append_equals_full_rebuild_and_fingerprint_composes(
    spark, tmp_path
):
    """Incremental maintenance: build on 40 vectors + append 20 must serve
    IDENTICALLY to a full build on all 60, and the XOR fingerprint must
    compose so is_stale(full corpus) is False after the append chain."""
    corpus, cents, qs = _frames(spark)
    head = corpus.filter(F.col("vec_id") < 40)
    tail1 = corpus.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 50))
    tail2 = corpus.filter(F.col("vec_id") >= 50)

    inc_store = IvfPqIndexStore(str(tmp_path / "inc"))
    inc_store.build(head, cents)
    inc_store.append(tail1)
    inc_store.append(tail2)
    full_store = IvfPqIndexStore(str(tmp_path / "full"))
    full_store.build(corpus, cents)

    got = sorted(
        tuple(r)
        for r in inc_store.serve(qs, k=5, nprobe=2, rerank_m=20)
        .select("qid", "rank", "vec_id", "score")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in full_store.serve(qs, k=5, nprobe=2, rerank_m=20)
        .select("qid", "rank", "vec_id", "score")
        .collect()
    )
    assert got == want and len(got) > 0
    # fingerprint composition: the appended index IS the full corpus
    assert inc_store.is_stale(corpus) is False
    assert inc_store.is_stale(corpus, centroids=cents) is False
    # and a genuinely different corpus still reads stale
    assert inc_store.is_stale(head) is True

    # append before build is an error, not a silent partial index
    empty_store = IvfPqIndexStore(str(tmp_path / "none"))
    with pytest.raises(ValueError):
        empty_store.append(tail1)


def test_ivfpq_append_version_mode_mismatch_raises(spark, tmp_path):
    """Mixing fingerprint-mode appends into a version-built IVF-PQ index
    (or vice versa) must fail loudly — otherwise the old version stamp
    survives while the indexed rows move on, and a later
    is_stale(corpus, version=old) reports fresh for a drifted index.
    (ADVICE r6: mirror Bm25IndexStore.append's guard.)"""
    corpus, cents, _ = _frames(spark)
    head = corpus.filter(F.col("vec_id") < 40)
    tail = corpus.filter(F.col("vec_id") >= 40)

    st = IvfPqIndexStore(str(tmp_path / "v"))
    st.build(head, cents, version="snap-1")
    with pytest.raises(ValueError, match="staleness mode"):
        st.append(tail)  # no version into a version-built index
    st2 = IvfPqIndexStore(str(tmp_path / "fp"))
    st2.build(head, cents)
    with pytest.raises(ValueError, match="staleness mode"):
        st2.append(tail, version="snap-2")


def test_serve_nprobe_stamp_roundtrip_and_survives_maintenance(
    spark, tmp_path
):
    corpus, cents, qs = _frames(spark)
    store = IvfPqIndexStore(str(tmp_path / "idx"))
    store.build(corpus, cents, serve_nprobe=3)
    # nprobe=None serves with the stamped budget
    got = sorted(
        store.serve(qs, k=5, nprobe=None, rerank_m=20).collect(),
        key=lambda r: (r["qid"], r["rank"]),
    )
    want = sorted(
        store.serve(qs, k=5, nprobe=3, rerank_m=20).collect(),
        key=lambda r: (r["qid"], r["rank"]),
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # append and forget rewrite the meta row — the stamp must ride along
    inc = corpus.limit(0)
    extra = spark.createDataFrame(
        [(1000, [0.05] * 8)], "vec_id long, embedding array<double>"
    )
    store.append(extra)
    assert store._read_meta(spark)["serve_nprobe"] == 3
    store.forget(extra.select("vec_id"))
    assert store._read_meta(spark)["serve_nprobe"] == 3
    # an unstamped index serves with the pre-stamp default (2)
    store2 = IvfPqIndexStore(str(tmp_path / "idx2"))
    store2.build(corpus, cents)
    got2 = sorted(
        store2.serve(qs, k=5, nprobe=None, rerank_m=20).collect(),
        key=lambda r: (r["qid"], r["rank"]),
    )
    want2 = sorted(
        store2.serve(qs, k=5, nprobe=2, rerank_m=20).collect(),
        key=lambda r: (r["qid"], r["rank"]),
    )
    assert [tuple(r) for r in got2] == [tuple(r) for r in want2]


def test_select_nprobe_smallest_meeting_floor_and_fallback(spark):
    from yaml_pipe_spark.operators.similarity import select_nprobe

    # recall = n_hit/n_exact; floor 0.7 -> 84/120 is an EXACT boundary row
    curve = spark.createDataFrame(
        [(1, 0.5, 24, 120, 60), (2, 0.7, 24, 120, 84), (4, 0.9, 24, 120, 108)],
        "nprobe long, recall double, n_queries long, n_exact long, n_hit long",
    )
    rows = {
        r["nprobe"]: r for r in select_nprobe(curve, 7, 10).collect()
    }
    assert rows[2]["meets_floor"] == 1  # integer test: 84*10 >= 120*7
    assert all(r["chosen_nprobe"] == 2 for r in rows.values())
    assert [n for n, r in rows.items() if r["is_chosen"] == 1] == [2]
    # nothing meets the floor -> fall back to the largest measured budget
    low = spark.createDataFrame(
        [(1, 0.1, 24, 120, 12), (2, 0.2, 24, 120, 24)],
        "nprobe long, recall double, n_queries long, n_exact long, n_hit long",
    )
    rows_low = select_nprobe(low, 7, 10).collect()
    assert all(r["chosen_nprobe"] == 2 for r in rows_low)
    assert all(r["meets_floor"] == 0 for r in rows_low)
