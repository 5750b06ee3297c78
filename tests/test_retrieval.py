"""Lexical retrieval (operators/retrieval.py): ranking shape, the
known-item self-retrieval signal, and RRF fusion sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yaml_pipe_spark.entrypoints import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bm25(spark):
    return REGISTRY["q3_bm25_topk"].fn(spark, SF).toPandas()


@pytest.fixture(scope="module")
def rrf(spark):
    return REGISTRY["q3_hybrid_rrf"].fn(spark, SF).toPandas()


def test_bm25_ranking_shape(bm25):
    """Dense 1..k ranks per query, scores non-increasing within a query."""
    assert len(bm25) > 0
    for qid, g in bm25.groupby("qid"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["score"].diff().dropna() <= 1e-12).all()


def test_bm25_self_retrieval_signal(bm25):
    """Known-item queries (top tf-idf terms of the doc itself) must pull
    the source doc to rank 1 for at least half the queries — the built-in
    relevance sanity check; synthetic boilerplate may defeat a few."""
    n_queries = bm25["qid"].nunique()
    rank1_self = ((bm25["rank"] == 1) & (bm25["is_self"] == 1)).sum()
    assert rank1_self * 2 >= n_queries


def test_rrf_fusion_sanity(rrf, bm25):
    """The fused winner is strong in at least one arm, fused scores match
    1/(60+r_bm25)+1/(60+r_ql) exactly, and ranks are dense."""
    assert len(rrf) > 0
    for _, row in rrf.iterrows():
        expect = round(
            1.0 / (60 + row.r_bm25) + 1.0 / (60 + row.r_ql), 6
        )
        assert abs(row.rrf - expect) < 1e-9
    top1 = rrf[rrf["rank"] == 1]
    assert (top1[["r_bm25", "r_ql"]].min(axis=1) <= 20).all()
    for qid, g in rrf.groupby("qid"):
        assert list(g.sort_values("rank")["rank"]) == list(
            range(1, len(g) + 1)
        )


def test_bm25_tf0_rows_do_not_score(spark):
    """A candidate matching only 1 of 3 query terms gets zero BM25 mass
    from the absent terms (the grid's tf=0 rows) but a real
    query-likelihood smoothing contribution — i.e. ql is defined and
    finite for every candidate."""
    from yaml_pipe_spark.operators.retrieval import bm25_ql_scores

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha beta gamma delta"),
            (97, "epsilon zeta etaa epsilon zeta etaa"),  # no overlap w/ 0
            (5, "epsilon only here"),
        ],
        ["doc_id", "text"],
    )
    sc = bm25_ql_scores(docs).toPandas()
    # queries: doc 0 and doc 97 (doc_id % 97 == 0)
    assert set(sc["qid"]) == {0, 97}
    assert sc["bm25"].notna().all() and sc["ql"].notna().all()
    # doc 5 shares only 'epsilon' with query 97's terms -> candidate with
    # positive bm25 (one matched term) and finite negative ql
    row = sc[(sc.qid == 97) & (sc.doc_id == 5)]
    assert len(row) == 1 and float(row.bm25.iloc[0]) > 0
    assert float(row.ql.iloc[0]) < 0


class TestBm25IndexStore:
    def _docs(self, spark, n=30):
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        rows = [
            (i, " ".join(words[(i + j) % len(words)] for j in range(8)))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    @pytest.mark.slow  # driver fast lane (r14)
    def test_append_serve_equals_full_rebuild(self, spark, tmp_path):
        """Every persisted statistic is additive, so build(80)+append(20)
        must serve byte-identical rankings to build(100)."""
        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        docs = self._docs(spark)
        full = Bm25IndexStore(str(tmp_path / "full"))
        full.build(docs)
        inc = Bm25IndexStore(str(tmp_path / "inc"))
        inc.build(docs.filter("doc_id < 24"))
        inc.append(docs.filter("doc_id >= 24"))
        a = sorted(map(tuple, full.serve(k=10).collect()))
        b = sorted(map(tuple, inc.serve(k=10).collect()))
        assert a == b and len(a) > 0
        assert inc.is_stale(docs) is False

    def test_staleness_and_amortization(self, spark, tmp_path):
        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        docs = self._docs(spark)
        st = Bm25IndexStore(str(tmp_path / "ix"))
        assert st.is_stale(docs) is True  # no index yet
        assert st.build_if_stale(docs) is True
        assert st.build_if_stale(docs) is False  # fingerprint fresh
        changed = docs.withColumn(
            "text", F.concat_ws(" ", "text", "text")
        )
        assert st.is_stale(changed) is True

    def test_half_appended_crash_reads_stale(self, spark, tmp_path):
        """If append dies between the tf write and the meta stamp, the
        fingerprint no longer matches the full corpus -> is_stale is True
        and the caller's clean-rebuild path fires (never double-appends)."""
        from yaml_pipe_spark.operators.retrieval import (
            Bm25IndexStore,
            _index_frames,
        )

        docs = self._docs(spark)
        st = Bm25IndexStore(str(tmp_path / "ix"))
        st.build(docs.filter("doc_id < 24"))
        # simulate the crash: tf rows of the increment land, meta does not
        tf_i, _ = _index_frames(docs.filter("doc_id >= 24"))
        tf_i.write.mode("append").parquet(st.tf_path)
        assert st.is_stale(docs) is True

    def test_version_skips_fingerprint_scan(self, spark, tmp_path):
        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        docs = self._docs(spark)
        st = Bm25IndexStore(str(tmp_path / "ix"))
        st.build(docs, version="snap-1")
        assert st.is_stale(docs, version="snap-1") is False
        assert st.is_stale(docs, version="snap-2") is True

    def test_serve_on_empty_corpus_returns_empty(self, spark, tmp_path):
        """n_docs == 0 meta serves an empty ranking, not ZeroDivisionError."""
        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        docs = spark.createDataFrame(
            [(1, "12345 67890")], ["doc_id", "text"]
        )  # digits only: zero \p{L} tokens -> empty index
        st = Bm25IndexStore(str(tmp_path / "ix"))
        st.build(docs)
        out = st.serve(k=10)
        assert out.count() == 0
        assert out.columns == ["qid", "rank", "doc_id", "score", "is_self"]

    def test_append_version_mode_mismatch_raises(self, spark, tmp_path):
        """Mixing fingerprint-mode appends into a version-built index (or
        vice versa) must fail loudly, not stamp a garbage fingerprint."""
        import pytest as _pytest

        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        docs = self._docs(spark)
        st = Bm25IndexStore(str(tmp_path / "ix"))
        st.build(docs.filter("doc_id < 24"), version="snap-1")
        with _pytest.raises(ValueError, match="staleness mode"):
            st.append(docs.filter("doc_id >= 24"))  # no version
        st2 = Bm25IndexStore(str(tmp_path / "ix2"))
        st2.build(docs.filter("doc_id < 24"))
        with _pytest.raises(ValueError, match="staleness mode"):
            st2.append(docs.filter("doc_id >= 24"), version="snap-2")

    @pytest.mark.slow  # driver fast lane (r14)
    def test_snapshot_restore_rewinds_appends(self, spark, tmp_path):
        """restore_manifest() rewinds an appended index to the exact
        standing state (file surgery, no recopy): fingerprint fresh vs
        the standing docs, serve value-identical to a pristine build,
        and a second append cycle after the rewind reproduces the first
        cycle's results — the stream_bm25_append amortization contract."""
        import os

        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        docs = self._docs(spark)
        standing = docs.filter("doc_id < 24")
        increment = docs.filter("doc_id >= 24")
        st = Bm25IndexStore(str(tmp_path / "ix"))
        st.build(standing)
        st.snapshot_manifest()
        tf_before = sorted(os.listdir(st.tf_path))
        standing_rows = sorted(
            map(tuple, st.serve(k=5).collect())
        )

        st.append(increment)
        appended_rows = sorted(map(tuple, st.serve(k=5).collect()))
        assert sorted(os.listdir(st.tf_path)) != tf_before

        assert st.restore_manifest() is True
        assert sorted(os.listdir(st.tf_path)) == tf_before
        assert st.is_stale(standing) is False
        assert sorted(map(tuple, st.serve(k=5).collect())) == standing_rows

        # second cycle after the rewind behaves exactly like the first
        st.append(increment)
        assert st.is_stale(docs) is False
        assert sorted(map(tuple, st.serve(k=5).collect())) == appended_rows

    def test_restore_manifest_without_snapshot_is_false(self, spark, tmp_path):
        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        st = Bm25IndexStore(str(tmp_path / "ix"))
        st.build(self._docs(spark).filter("doc_id < 24"))
        assert st.restore_manifest() is False  # no snapshot taken

    @pytest.mark.slow  # driver fast lane (r14)
    def test_rewind_refuses_when_manifest_components_missing(
        self, spark, tmp_path
    ):
        """The deterministic fallback contract: if the snapshotted cf
        generation (or a whole table directory) is gone, restore_manifest
        returns False and the q_stream_bm25_append gate rebuilds from
        scratch. (External deletion of an individual data FILE after a
        completed rewind is outside the fingerprint's sight — same
        exposure as any parquet store — and is documented as such in the
        restore_manifest docstring, not claimed.)"""
        import json
        import os
        import shutil

        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        docs = self._docs(spark)
        standing = docs.filter("doc_id < 24")
        st = Bm25IndexStore(str(tmp_path / "ix"))
        st.build(standing)
        st.snapshot_manifest()
        st.append(docs.filter("doc_id >= 24"))
        # sabotage 1: the snapshotted cf generation disappears
        man = json.load(
            open(os.path.join(st.base_path, "standing_manifest.json"))
        )
        shutil.rmtree(os.path.join(st.base_path, man["cf"]))
        assert st.restore_manifest() is False
        # sabotage 2: a whole table directory disappears
        st2 = Bm25IndexStore(str(tmp_path / "ix2"))
        st2.build(standing)
        st2.snapshot_manifest()
        shutil.rmtree(st2.dl_path)
        assert st2.restore_manifest() is False

    def test_partial_rewind_crash_reads_stale_and_markers_never_linger(
        self, spark, tmp_path, monkeypatch
    ):
        """Crash-ordering contract: a rewind that dies mid-file-surgery
        leaves the APPENDED meta in place, so is_stale(standing) is True
        and the caller rebuilds — and the applied-markers are already
        gone (they clear FIRST), so no stale epoch marker can make a
        later drain silently skip its batch."""
        import os

        from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

        docs = self._docs(spark)
        standing = docs.filter("doc_id < 24")
        st = Bm25IndexStore(str(tmp_path / "ix"))
        st.build(standing)
        st.snapshot_manifest()
        st.append(docs.filter("doc_id >= 24"))
        os.makedirs(os.path.join(st.base_path, "applied", "batch_0"))

        real_remove = os.remove
        calls = {"n": 0}

        def dying_remove(path):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise OSError("injected crash mid-rewind")
            real_remove(path)

        monkeypatch.setattr(os, "remove", dying_remove)
        with pytest.raises(OSError, match="injected"):
            st.restore_manifest()
        monkeypatch.undo()
        # markers cleared BEFORE the crash point...
        assert not os.path.isdir(os.path.join(st.base_path, "applied"))
        # ...and meta never restored -> the standing gate reads stale
        assert st.is_stale(standing) is True
