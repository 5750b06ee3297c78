"""Regression pins for the round-11 ADVICE fixes on the deletion surfaces:

- ParquetSink partition surgery must never delete the TABLE ROOT when a
  matched row lives outside a `source=` partition directory (a legacy
  unpartitioned layout) — it falls back to the rewrite branch.
- DuckDBSink.read must survive a 0-row table (a forget that emptied it):
  the Spark schema comes from the arrow schema, not pandas inference.
- HybridRrfRetriever.forget purges each arm independently: one built arm
  still purges when the other raises IndexNotBuiltError; neither built
  re-raises so cmd_forget's not-built path stays reachable.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from yaml_pipe_spark.errors import IndexNotBuiltError
from yaml_pipe_spark.operators.sinks import DuckDBSink, ParquetSink


def _corpus(spark):
    return spark.createDataFrame(
        [
            ("a.txt", "alpha alpha unique topic one"),
            ("b.txt", "bravo bravo different subject two"),
            ("c.txt", "charlie charlie third matter three"),
        ],
        "source string, text string",
    )


def test_parquet_delete_legacy_unpartitioned_layout(spark, tmp_path):
    """A table written WITHOUT partitioning (legacy layout) still reads
    through ParquetSink; delete_sources on it must rewrite, not treat the
    files' parent — the table root — as a partition directory to drop."""
    path = str(tmp_path / "corpus")
    _corpus(spark).write.parquet(path)  # unpartitioned: files at the root

    sink = ParquetSink(path)  # partition_by="source" (default)
    assert sink.delete_sources(spark, ["b.txt"]) == 1

    # the root survived and the remaining rows are intact
    left = spark.read.parquet(path)
    assert sorted(r["source"] for r in left.select("source").collect()) == [
        "a.txt",
        "c.txt",
    ]


def test_parquet_delete_partitioned_layout_still_does_surgery(spark, tmp_path):
    """The guard must not regress the fast path: a properly partitioned
    table still deletes by dropping the partition directory."""
    path = str(tmp_path / "corpus")
    sink = ParquetSink(path)
    sink.write(_corpus(spark))
    doomed = [
        d for d in os.listdir(path) if d.startswith("source=") and "b.txt" in d
    ]
    assert len(doomed) == 1
    assert sink.delete_sources(spark, ["b.txt"]) == 1
    assert not os.path.exists(os.path.join(path, doomed[0]))
    assert sink.read(spark).count() == 2


def test_duckdb_read_empty_table(spark, tmp_path):
    """Reading back a DuckDB table a forget just emptied must return an
    explicitly-schemed 0-row frame, not crash on pandas inference."""
    sink = DuckDBSink(str(tmp_path / "c.duckdb"))
    sink.write(_corpus(spark))
    assert sink.delete_sources(spark, ["a.txt", "b.txt", "c.txt"]) == 3
    out = sink.read(spark)
    assert out.count() == 0
    assert set(out.columns) == {"source", "text"}
    # downstream relies on filtering the empty frame — must stay plannable
    assert out.filter(F.col("source") == "a.txt").count() == 0


@pytest.mark.slow  # driver fast lane (r14)
def test_hybrid_forget_one_arm_built(spark, tmp_path):
    from yaml_pipe_spark.retrievers import HybridRrfRetriever, unique_by_id

    corpus = _corpus(spark).withColumn(
        "embedding",
        F.array(
            (F.length("text") % 7).cast("double"),
            (F.length("text") % 5).cast("double"),
        ),
    )
    r = HybridRrfRetriever(
        vector={
            "path": str(tmp_path / "vec"),
            "n_cells": 2,
            "nprobe": 2,
            "rerank_m": 5,
        },
        lexical={"path": str(tmp_path / "lex")},
    )

    gone = unique_by_id(corpus).filter(F.col("source") == "a.txt").select(
        "__id", "source", "text"
    )

    # neither arm built: the typed error propagates (cmd_forget handles it)
    with pytest.raises(IndexNotBuiltError):
        r.forget(gone)

    # only the vector arm built: forget still purges it and reports 1
    r.vector.build(corpus)
    assert r.forget(gone) == 1
    # physically purged: a retry finds nothing left to remove (is_stale may
    # legitimately be True here — the forgotten row can have seeded a
    # deterministic coarse centroid, the documented rebuild case)
    assert r.forget(gone) == 0


def test_forget_cli_duckdb_all_sources(spark, capsys, tmp_path):
    """The ADVICE r10 medium: forgetting EVERY source from a DuckDB sink
    must leave the reconciliation read working on the now-empty table."""
    import json

    from yaml_pipe_spark import cli

    data = tmp_path / "data"
    data.mkdir()
    docs = {
        "a.txt": "alpha alpha unique topic one",
        "b.txt": "bravo bravo different subject two",
    }
    for name, text in docs.items():
        (data / name).write_text(text)
    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        f"""
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
  type: duckdb
  config: {{db_path: "{tmp_path}/corpus.duckdb"}}
"""
    )
    assert cli.main(["run", "-c", str(cfg)]) == 0
    capsys.readouterr()
    sources = [f"file:{data}/{n}" for n in docs]
    assert cli.main(["forget", *sources, "-c", str(cfg)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["sink_rows"] == 2
    # retry converges on the empty table (the reconciliation read works)
    assert cli.main(["forget", *sources, "-c", str(cfg)]) == 0
    assert json.loads(capsys.readouterr().out)["sink_rows"] == 0
