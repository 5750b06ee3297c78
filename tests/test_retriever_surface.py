"""CLI/YAML reachability of the persisted index stores (VERDICT r6 ask #2):
a `retriever:` key in the pipeline spec selects the serving strategy,
run_pipeline builds the index, and search/eval serve from it — the
round-trip the reference implements as core/pipeline.py build +
core/evaluation.py / app.py query."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from yaml_pipe_spark.plans.config import parse_config
from yaml_pipe_spark.plans.factory import build_component, list_components
from yaml_pipe_spark.plans.pipeline import run_pipeline
from yaml_pipe_spark.retrievers import (
    Bm25Retriever,
    ExactRetriever,
    HybridRrfRetriever,
    IvfPqRetriever,
    with_stable_id,
)
from yaml_pipe_spark.search import search_corpus

CONFIG_TMPL = """
source:
  type: local_files
  config:
    path: "{data}"
    glob_pattern: "**/*.txt"
chunker:
  type: fixed_window
  config: {{chunk_size: 400, chunk_overlap: 0}}
embedder:
  type: hash
  config: {{dim: 8}}
sink:
  type: parquet
  config: {{path: "{sink}"}}
{retriever_yaml}
"""

IVFPQ_YAML = """
retriever:
  type: ivfpq
  config: {{path: "{index}", n_cells: 3, nprobe: 3, rerank_m: 10}}
"""

BM25_YAML = """
retriever:
  type: bm25
  config: {{path: "{index}"}}
"""

HYBRID_YAML = """
retriever:
  type: hybrid_rrf
  config:
    vector: {{path: "{index}/vec", n_cells: 3, nprobe: 3, rerank_m: 10}}
    lexical: {{path: "{index}/lex"}}
"""


@pytest.fixture()
def workdir():
    with tempfile.TemporaryDirectory() as tmp:
        data = os.path.join(tmp, "data")
        os.makedirs(data)
        docs = {
            "zebra.txt": "zebra savanna stripes gallop herd " * 8,
            "ocean.txt": "ocean coral reef current tide wave " * 8,
            "forest.txt": "forest canopy moss fern shade trail " * 8,
            "desert.txt": "desert dune cactus mirage oasis sand " * 8,
        }
        for name, text in docs.items():
            with open(os.path.join(data, name), "w", encoding="utf-8") as f:
                f.write(text)
        yield {
            "data": data,
            "sink": os.path.join(tmp, "out"),
            "index": os.path.join(tmp, "index"),
        }


def _spec(workdir, retriever_yaml=""):
    ry = retriever_yaml.format(**workdir) if retriever_yaml else ""
    return parse_config(CONFIG_TMPL.format(retriever_yaml=ry, **workdir))


def test_list_components_shows_retrievers():
    comps = list_components()
    assert comps["retriever"] == ["bm25", "exact", "hybrid_rrf", "ivfpq"]


def test_pipeline_builds_ivfpq_index_and_search_serves_it(spark, workdir):
    spec = _spec(workdir, IVFPQ_YAML)
    run_pipeline(spark, spec)
    # the run left a persisted, non-stale index behind
    for sub in ("centroids", "codes", "vectors", "meta"):
        assert os.path.isdir(os.path.join(workdir["index"], sub)), sub
    sink = build_component("sink", spec.sink)
    corpus = with_stable_id(sink.read(spark))
    r = build_component("retriever", spec.retriever)
    vecs, cents = r._frames(corpus)
    assert r.store.is_stale(vecs, centroids=cents) is False

    rows = search_corpus(spark, spec, "desert dune cactus sand", k=2).collect()
    assert [row.rank for row in rows] == [1, 2]
    # the serve must equal the store's own serve joined back to the corpus
    embedder = build_component("embedder", spec.embedder)
    qdf = spark.createDataFrame(
        [(0, "desert dune cactus sand")], "qid long, qtext string"
    )
    qv = embedder.apply(qdf, "qtext").select(
        "qid", F.col("embedding").alias("qv")
    )
    want = (
        r.store.serve(qv, k=2, nprobe=3, rerank_m=10)
        .join(corpus.select("__id", "source", "text"), "__id")
        .select("rank", "source", "text", "score")
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))


def test_bm25_search_round_trip(spark, workdir):
    spec = _spec(workdir, BM25_YAML)
    run_pipeline(spark, spec)
    rows = search_corpus(spark, spec, "coral reef tide", k=2).collect()
    assert rows and rows[0].source.endswith("ocean.txt")
    assert rows[0].rank == 1 and rows[0].score > 0
    # a query with no indexed terms returns empty, not an error
    assert (
        search_corpus(spark, spec, "xylophone quixotic", k=2).count() == 0
    )


@pytest.mark.slow  # driver fast lane (r14)
def test_hybrid_search_fuses_both_persisted_arms(spark, workdir):
    spec = _spec(workdir, HYBRID_YAML)
    run_pipeline(spark, spec)
    for sub in ("vec/codes", "lex/tf"):
        assert os.path.isdir(os.path.join(workdir["index"], sub)), sub
    rows = search_corpus(spark, spec, "forest canopy moss", k=3).collect()
    assert rows[0].source.endswith("forest.txt")
    # fused score must be exactly sum over arms of 1/(60 + arm rank)
    r = build_component("retriever", spec.retriever)
    sink = build_component("sink", spec.sink)
    embedder = build_component("embedder", spec.embedder)
    corpus = with_stable_id(sink.read(spark))
    qdf = spark.createDataFrame(
        [(0, "forest canopy moss")], "qid long, qtext string"
    )
    queries = embedder.apply(qdf, "qtext").select(
        "qid", "qtext", F.col("embedding").alias("qv")
    )
    top_id = (
        corpus.filter(F.col("source").endswith("forest.txt"))
        .select("__id")
        .collect()[0][0]
    )
    ranks = []
    for arm in (r.vector, r.lexical):
        got = {
            row["__id"]: row["rank"]
            for row in arm.topk(corpus, queries, 3).collect()
        }
        ranks.append(got.get(top_id))
    want = sum(1 / (60 + rk) for rk in ranks if rk is not None)
    assert rows[0].score == pytest.approx(want, abs=1e-6)


def test_no_retriever_key_is_the_exact_path(spark, workdir):
    """Specs without `retriever:` must serve exactly as before."""
    from yaml_pipe_spark.operators.similarity import topk_cosine

    spec = _spec(workdir)
    assert spec.retriever is None
    run_pipeline(spark, spec)
    rows = search_corpus(spark, spec, "zebra stripes herd", k=2).collect()

    embedder = build_component("embedder", spec.embedder)
    sink = build_component("sink", spec.sink)
    qdf = spark.createDataFrame([("zebra stripes herd",)], "q string")
    qv = embedder.apply(qdf, "q").select(F.col("embedding").alias("qv"))
    corpus = with_stable_id(sink.read(spark))
    want = sorted(
        (r.source, r.text, r.score)
        for r in topk_cosine(corpus, qv, k=2, id_col="__id").collect()
    )
    assert sorted((r.source, r.text, r.score) for r in rows) == want


def test_second_run_does_not_rebuild_fresh_index(spark, workdir):
    spec = _spec(workdir, IVFPQ_YAML)
    run_pipeline(spark, spec)
    meta = os.path.join(workdir["index"], "meta")
    stamp = max(
        os.path.getmtime(os.path.join(meta, f)) for f in os.listdir(meta)
    )
    run_pipeline(spark, spec)  # same corpus -> fingerprint match -> no-op
    stamp2 = max(
        os.path.getmtime(os.path.join(meta, f)) for f in os.listdir(meta)
    )
    assert stamp2 == stamp


def test_cmd_eval_serves_from_retriever(spark, workdir, tmp_path, capsys):
    from yaml_pipe_spark import cli

    spec_yaml = CONFIG_TMPL.format(
        retriever_yaml=BM25_YAML.format(**workdir), **workdir
    )
    cfg = tmp_path / "pipe.yaml"
    cfg.write_text(spec_yaml)
    run_pipeline(spark, parse_config(spec_yaml))

    dataset = tmp_path / "eval.jsonl"
    lines = [
        {"question": "zebra savanna stripes", "expected_source": "zebra"},
        {"question": "coral reef tide", "expected_source": "ocean"},
        # no indexed terms -> zero candidates -> counted as a MISS
        {"question": "xylophone quixotic", "expected_source": "desert"},
    ]
    # expected_source must equal the stored source path
    sink = build_component("sink", parse_config(spec_yaml).sink)
    srcs = {
        os.path.basename(r.source): r.source
        for r in sink.read(spark).select("source").distinct().collect()
    }
    lines[0]["expected_source"] = srcs["zebra.txt"]
    lines[1]["expected_source"] = srcs["ocean.txt"]
    lines[2]["expected_source"] = srcs["desert.txt"]
    dataset.write_text("\n".join(json.dumps(l) for l in lines) + "\n")

    class A:
        config = str(cfg)
        k = 2

    A.dataset = str(dataset)
    assert cli.cmd_eval(A) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total_questions"] == 3
    assert out["hits"] == 2
    assert out["hit_rate"] == pytest.approx(100 * 2 / 3, abs=0.01)


@pytest.mark.slow  # driver fast lane (r14)
def test_duplicate_chunks_index_once_and_serve_once(spark, tmp_path):
    """Identical (source, text) rows share __id; indexing both would skew
    BM25 tf/dl, duplicate vector-serve ranks, and let the XOR fingerprint
    cancel duplicate pairs (round-7 review finding) — every retriever
    build/serve path dedups to one row per id."""
    from yaml_pipe_spark.retrievers import Bm25Retriever, IvfPqRetriever

    rows = [
        ("a.txt", "zebra savanna stripes gallop", [0.1, 0.9, 0.2, 0.1]),
        ("a.txt", "zebra savanna stripes gallop", [0.1, 0.9, 0.2, 0.1]),
        ("b.txt", "ocean coral reef tide", [0.9, 0.1, 0.1, 0.2]),
    ]
    corpus = spark.createDataFrame(
        rows, "source string, text string, embedding array<double>"
    )
    q = spark.createDataFrame(
        [(0, "zebra savanna stripes", [0.1, 0.9, 0.2, 0.1])],
        "qid long, qtext string, qv array<double>",
    )
    bm = Bm25Retriever(str(tmp_path / "lex"))
    bm.build(corpus)
    got = bm.topk(corpus, q, k=5).collect()
    assert len({r["__id"] for r in got}) == len(got)  # no duplicate ids
    # tf/dl counted the duplicate pair once: n_docs == 2 distinct ids
    assert int(bm.store._read_meta(spark)["n_docs"]) == 2

    iv = IvfPqRetriever(str(tmp_path / "vec"), n_cells=2, nprobe=2)
    iv.build(corpus)
    got = iv.topk(corpus, q, k=5).collect()
    assert len({r["__id"] for r in got}) == len(got)
    # a corpus differing only in duplicate multiplicity is the SAME set:
    # the index must still read fresh (set semantics, not row semantics)
    tripled = corpus.union(corpus.limit(1))
    vecs, cents = iv._frames(tripled)
    assert iv.store.is_stale(vecs, centroids=cents) is False


def test_bm25_empty_index_preserves_qid_type(spark, tmp_path):
    """The zero-token-corpus early return must carry the CALLER's qid
    dtype (cmd_eval passes string qids) — a hardcoded bigint frame would
    break the eval left-join under ANSI (round-7 review finding)."""
    from yaml_pipe_spark.retrievers import Bm25Retriever

    corpus = spark.createDataFrame(
        [("n.txt", "12345 67890 11 22", [0.1, 0.2])],
        "source string, text string, embedding array<double>",
    )
    bm = Bm25Retriever(str(tmp_path / "lex0"))
    bm.build(corpus)  # \\p{L}+ finds no tokens -> n_docs == 0
    q = spark.createDataFrame(
        [("what is it", "what is it", [0.1, 0.2])],
        "qid string, qtext string, qv array<double>",
    )
    out = bm.topk(corpus, q, k=3)
    assert out.count() == 0
    assert dict(out.dtypes)["qid"] == "string"


@pytest.mark.slow  # driver fast lane (r14)
def test_incremental_run_refreshes_index_and_serves_new_doc(
    spark, workdir
):
    """The full lifecycle: run builds the index; a NEW source file makes
    the corpus fingerprint stale, so the next run rebuilds; search then
    retrieves the new document from the persisted index."""
    spec = _spec(workdir, BM25_YAML)
    run_pipeline(spark, spec)
    assert (
        search_corpus(spark, spec, "glacier crevasse moraine", k=2).count()
        == 0
    )
    with open(
        os.path.join(workdir["data"], "glacier.txt"), "w", encoding="utf-8"
    ) as f:
        f.write("glacier crevasse moraine icefall serac " * 8)
    run_pipeline(spark, spec)  # stale fingerprint -> rebuild
    rows = search_corpus(spark, spec, "glacier crevasse moraine", k=2).collect()
    assert rows and rows[0].source.endswith("glacier.txt")


def test_cmd_clean_targets_retriever_indexes(spark, workdir, tmp_path, capsys):
    from yaml_pipe_spark import cli

    spec_yaml = CONFIG_TMPL.format(
        retriever_yaml=HYBRID_YAML.format(**workdir), **workdir
    )
    cfg = tmp_path / "pipe.yaml"
    cfg.write_text(spec_yaml)
    run_pipeline(spark, parse_config(spec_yaml))
    vec = os.path.join(workdir["index"], "vec")
    lex = os.path.join(workdir["index"], "lex")
    assert os.path.isdir(vec) and os.path.isdir(lex)

    class A:
        config = str(cfg)
        yes = True

    assert cli.cmd_clean(A) == 0
    capsys.readouterr()
    assert not os.path.exists(vec) and not os.path.exists(lex)
    assert not os.path.exists(workdir["sink"])


def test_search_raises_on_stale_index(spark, workdir):
    """Serve-time staleness gate (ADVICE r7): a sink that moved on after
    the index build (crash window, or `retriever:` added post-run) must
    error loudly instead of quietly serving short/stale result lists."""
    spec = _spec(workdir, BM25_YAML)
    run_pipeline(spark, spec)
    # grow the sink behind the index's back: write one more chunk row
    # directly through the sink (no index refresh)
    sink = build_component("sink", spec.sink)
    extra = spark.createDataFrame(
        [("late.txt", "glacier icefield crevasse " * 8, [0.0] * 8)],
        "source string, text string, embedding array<double>",
    )
    sink.write(extra)
    with pytest.raises(ValueError, match="stale or missing"):
        search_corpus(spark, spec, "coral reef tide", k=2)


def test_eval_raises_on_missing_index(spark, workdir, tmp_path):
    """eval with a retriever key but no index on disk must fail with the
    actionable message, not report a quietly-wrong hit rate."""
    import argparse

    from yaml_pipe_spark.cli import cmd_eval
    from yaml_pipe_spark.plans.pipeline import run_pipeline as _run

    spec = _spec(workdir)  # no retriever: builds only the sink
    _run(spark, spec)
    cfg = tmp_path / "cfg.yaml"
    ry = BM25_YAML.format(**workdir)
    cfg.write_text(CONFIG_TMPL.format(retriever_yaml=ry, **workdir))
    ds = tmp_path / "qs.jsonl"
    ds.write_text(json.dumps({"question": "coral", "expected_source": "x"}) + "\n")
    with pytest.raises(ValueError, match="stale or missing"):
        cmd_eval(argparse.Namespace(config=str(cfg), dataset=str(ds), k=2))


def test_hybrid_rrf_missing_arm_config_is_a_config_error():
    """ADVICE r7: omitting an arm's config must raise a descriptive
    ValueError at build time, not a bare TypeError from the constructor."""
    with pytest.raises(ValueError, match="'lexical' mapping with a 'path'"):
        HybridRrfRetriever(vector={"path": "/tmp/v"})
    with pytest.raises(ValueError, match="'vector' mapping with a 'path'"):
        HybridRrfRetriever(lexical={"path": "/tmp/l"})
    with pytest.raises(ValueError, match="hybrid_rrf"):
        HybridRrfRetriever()
