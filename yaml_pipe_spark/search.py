"""Interactive search over a pipeline's sink (reference Searcher,
app.py:35-61: embed query -> top-k against the vector store).

One function shared by the `search` CLI command and the dashboard
(yaml_pipe_spark.app): build the configured embedder + sink, embed the
query text the same way the pipeline embedded the chunks, exact cosine
top-k. The corpus side streams through TakeOrderedAndProject — only k rows
reach the driver, so the same call works against a corpus of any size."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from yaml_pipe_spark.plans.config import PipelineSpec
from yaml_pipe_spark.plans.factory import build_component


def search_corpus(
    spark: SparkSession, spec: PipelineSpec, query: str, k: int = 3
) -> DataFrame:
    """Top-k (rank, source, text, score) for a free-text query."""
    from yaml_pipe_spark.operators.similarity import topk_cosine

    embedder = build_component("embedder", spec.embedder)
    sink = build_component("sink", spec.sink)

    qdf = spark.createDataFrame([(query,)], "question string")
    qv = embedder.apply(qdf, "question").select(
        F.col("embedding").alias("qv")
    )
    corpus = sink.read(spark).withColumn(
        # stable rank tiebreak (same convention as cmd_eval)
        "__id",
        F.sha2(F.concat_ws("\x1f", F.col("source"), F.col("text")), 256),
    )
    top = topk_cosine(corpus, qv, k=k, id_col="__id")
    # ranking the k returned rows is driver-cheap; the heavy lifting was the
    # TakeOrderedAndProject above
    rank = F.row_number().over(
        W.orderBy(F.col("score").desc(), F.col("__id"))
    )
    return top.select(
        rank.cast("long").alias("rank"), "source", "text", "score"
    )
