"""Similarity search — the reference's query side (SURVEY §2.7), generalized.

Reference behavior: embed query -> ANN top-k against the sink (LanceDB
`table.search(vec).limit(k)`, core/evaluation.py:44-64; Chroma query,
app.py:53-61); hit-rate evaluation over a question set (evaluation.py:66-109).

Spark design:
- `topk_cosine` — exact top-k: score expression + orderBy + limit. Catalyst
  turns this into TakeOrderedAndProject (per-partition heap + driver merge of
  k rows), which scales linearly and shuffles only k rows per partition.
- `knn_join` — many queries at once: broadcast the (small) query side, score,
  rank with one window partitioned by query id. One shuffle on query id.
- `hit_rate` — the reference's eval metric as a single aggregation.

Scores are computed in double and rounded before ranking so results are
bit-reproducible against the DuckDB oracle; ties broken by id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from yaml_pipe_spark.functions.vectors import cosine


def topk_cosine(
    corpus: DataFrame,
    query_vec: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    score_decimals: int = 6,
) -> DataFrame:
    """Exact top-k by cosine against a single query vector.

    `query_vec` is a 1-row DataFrame with column `qv` (array<float|double>).
    Broadcast to every task — no shuffle; sort+limit is TakeOrderedAndProject.
    """
    scored = corpus.crossJoin(F.broadcast(query_vec)).withColumn(
        "score", F.round(cosine(F.col(vec_col), F.col("qv")), score_decimals)
    )
    return (
        scored.drop("qv")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    query_vec: str = "qv",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    score_decimals: int = 6,
) -> DataFrame:
    """Top-k neighbors in `corpus` for every row of `queries`.

    Query side is broadcast (it is the small side by construction); ranking is
    one window shuffle on the query id. At 100 TB corpus x large query set,
    swap the broadcast for an LSH pre-bucketing (see dedup.minhash_lsh) — the
    ranking shape stays identical.
    """
    pairs = corpus.join(F.broadcast(queries), how="cross")
    if exclude_self:
        pairs = pairs.filter(F.col(id_col) != F.col(query_id))
    scored = pairs.withColumn(
        "score", F.round(cosine(F.col(vec_col), F.col(query_vec)), score_decimals)
    )
    w = W.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop(query_vec, vec_col)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cid_col: str = "cid",
    cvec_col: str = "cv",
    score_decimals: int = 6,
) -> DataFrame:
    """IVF coarse quantization: assign every corpus vector to its nearest
    centroid (max cosine, ties to the lowest centroid id).

    Centroids are broadcast (they are small by construction — hundreds to a
    few thousand); the argmax is a single groupBy on the vector id with
    max_by over a (score, -cid) struct, so the only shuffle is on id_col and
    the partial aggregation collapses the candidate rows map-side. At 100 TB
    the assignment is embarrassingly parallel and the output can be written
    partitioned by cid to make probes partition-pruned scans."""
    scored = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "__s", F.round(cosine(F.col(vec_col), F.col(cvec_col)), score_decimals)
    )
    best = (
        scored.groupBy(id_col)
        .agg(
            F.max_by(
                F.col(cid_col), F.struct(F.col("__s"), -F.col(cid_col))
            ).alias(cid_col)
        )
    )
    return corpus.join(best, id_col)


def ivf_topk(
    corpus: DataFrame,
    query_vec: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cid_col: str = "cid",
    cvec_col: str = "cv",
    score_decimals: int = 6,
) -> DataFrame:
    """IVF-style approximate top-k: probe the query's `nprobe` nearest
    centroid cells, exact-rerank only the vectors assigned there.

    `query_vec` is a 1-row DataFrame with column `qv`. The probe list is tiny
    and broadcast, so the candidate filter is a broadcast semi-join (a
    partition-pruned scan when the assignment table is partitioned by cid);
    the rerank is TakeOrderedAndProject over the probed cells only — the
    classic IVF recall/cost trade, with scan cost ~ nprobe/n_centroids of
    brute force."""
    assigned = ivf_assign(
        corpus, centroids, vec_col, id_col, cid_col, cvec_col, score_decimals
    )
    probes = (
        centroids.crossJoin(F.broadcast(query_vec))
        .withColumn(
            "__s", F.round(cosine(F.col(cvec_col), F.col("qv")), score_decimals)
        )
        .orderBy(F.col("__s").desc(), F.col(cid_col))
        .limit(nprobe)
        .select(cid_col)
    )
    cands = assigned.join(F.broadcast(probes), cid_col, "left_semi")
    scored = cands.crossJoin(F.broadcast(query_vec)).withColumn(
        "score", F.round(cosine(F.col(vec_col), F.col("qv")), score_decimals)
    )
    return (
        scored.drop("qv")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def hit_rate(
    neighbors: DataFrame,
    query_id: str = "qid",
    expected_col: str = "expected",
    actual_col: str = "label",
) -> DataFrame:
    """Reference eval metric (core/evaluation.py:83-109): a question is a hit
    iff ANY of its top-k neighbors matches the expectation;
    hit_rate = 100 * hits / total. Returns one row:
    (hit_rate DOUBLE, total_questions BIGINT, hits BIGINT)."""
    per_q = neighbors.groupBy(query_id).agg(
        F.max((F.col(actual_col) == F.col(expected_col)).cast("long")).alias("hit")
    )
    return per_q.agg(
        F.round(F.avg("hit") * 100, 4).alias("hit_rate"),
        F.count("*").alias("total_questions"),
        F.sum("hit").alias("hits"),
    )
