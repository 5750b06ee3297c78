"""Iterative graph centrality over the near-dup pair graph.

connected_components (operators/dedup.py) answers "which docs are the same
cluster"; PageRank answers "which docs sit at the CENTER of the duplication
web" — the canonical-template detector: a boilerplate page cloned across
many hosts accumulates centrality mass that a degree count alone
under-ranks when the copies also link each other sparsely. The operational
use is triage: sort near-dup clusters by their most-central member to find
the template worth blocklisting at the source.

Spark shape (the standard iterative-algorithm loop, same discipline as
connected_components): the edge list is materialized ONCE (eager
localCheckpoint), each iteration is one join + one aggregate shuffle, and
lineage is cut per round so the plan stays flat. The driver never holds
data — only the loop counter. A fixed iteration count (default 3) keeps
the operator oracle-checkable: the DuckDB twin unrolls the same three
rounds as chained CTEs (entrypoints.graph_pagerank_centrality).

Every node of the undirected pair graph has out-degree >= 1, so there is
no dangling-mass correction to apply; the teleport term uses the exact
same double literal in both engines (repr of 1-damping) so the final
round-to-6 is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iterations: int = 3,
    damping: float = 0.85,
    decimals: int = 6,
) -> DataFrame:
    """(node, degree, pagerank) after `iterations` rounds of
    PR(v) = (1-d)/n + d * sum_{u~v} PR(u)/deg(u) on the undirected graph."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    nn = nodes.agg(F.count("*").alias("n"))
    pr = (
        nodes.crossJoin(F.broadcast(nn))
        .select("node", "deg", "n", (F.lit(1.0) / F.col("n")).alias("pr"))
        .localCheckpoint()
    )
    teleport = 1.0 - damping  # same double both engines via repr()
    for _ in range(iterations):
        contrib = (
            edges.join(
                pr.select(
                    F.col("node").alias("src"),
                    (F.col("pr") / F.col("deg")).alias("w"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("w").alias("s"))
        )
        pr = (
            pr.select("node", "deg", "n")
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                "deg",
                "n",
                (
                    F.lit(teleport) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return pr.select(
        "node",
        F.col("deg").cast("long").alias("degree"),
        F.round("pr", decimals).alias("pagerank"),
    )
