"""Round-13 optimization internals.

Each test pins an equivalence an optimization relies on:
- the load_table schema cache must never serve a stale schema after the
  underlying parquet changes (metadata cache, stat-keyed);
- exact_jaccard_pairs(shingles_materialized=True) must be value-identical
  to the defensive-copy path it skips.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_load_table_schema_cache_invalidates_on_rewrite(spark, tmp_path):
    from yaml_pipe_spark import tables

    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "documents.parquet")
    spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("text")
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df1 = tables.load_table(spark, sf_dir, "documents")
    assert set(df1.columns) == {"doc_id", "text"}
    assert df1.count() == 3
    # same stat key -> cached schema serves (and still scans the data)
    assert tables.load_table(spark, sf_dir, "documents").count() == 3

    # rewrite with a DIFFERENT schema: the stat-based key must miss and
    # re-infer; a path-only cache would return the stale two-column schema
    spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.lit("b").alias("text"),
        F.lit("s").alias("source"),
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df2 = tables.load_table(spark, sf_dir, "documents")
    assert set(df2.columns) == {"doc_id", "text", "source"}
    assert df2.count() == 5


def test_exact_jaccard_pairs_materialized_flag_is_value_identical(spark):
    from yaml_pipe_spark.operators.dedup import (
        exact_jaccard_pairs,
        token_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with other words entirely"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    sh = token_shingles(docs, "text", "doc_id", 3).localCheckpoint()
    base = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(sh).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(sh, shingles_materialized=True).collect()
    }
    assert base == fast and base  # identical and non-empty
    assert base[(1, 4)] == pytest.approx(1.0)
