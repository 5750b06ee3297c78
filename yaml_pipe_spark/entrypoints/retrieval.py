"""Lexical BM25 and hybrid retrieval (q3_*)."""

# Split from the original entrypoints.py monolith (round 11);
# blocks keep their original relative order.

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from yaml_pipe_spark.tables import load_table

from yaml_pipe_spark.entrypoints._shared import (
    _BM25_TOPK_ORACLE,
    _DK_RETRIEVAL_CORE,
    _dk_cos,
    _dk_retrieval_core,
    register,
)


@register(
    "q3_bm25_topk",
    _BM25_TOPK_ORACLE,
    "BM25 top-10 lexical retrieval (Robertson/Sparck Jones; the Lucene "
    "ln(1+(N-df+0.5)/(df+0.5)) idf and k1=1.2/b=0.75 length-normalized "
    "tf) — the lexical side every RAG stack runs next to its vector "
    "index. Pseudo-queries are each 97th doc's top-3 tf-idf terms, so "
    "posting lists stay short by construction and the source doc's "
    "self-retrieval flag is a built-in relevance sanity check. Plan: "
    "ONE token shuffle feeds tf/dl/df/cf as an exchange-reuse diamond; "
    "scoring touches only the inverted-index candidates (docs sharing "
    "a query term), never the corpus; scores round before ranking so "
    "rank membership is engine-exact. At 100 TB this is the "
    "impact-ordered posting join: candidates ~ sum of 3 short posting "
    "lists per query, top-k per query is a bounded window.",
)
def q_q3_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yaml_pipe_spark.operators.retrieval import (
        bm25_ql_scores,
        rank_bm25_topk,
    )

    return rank_bm25_topk(
        bm25_ql_scores(load_table(spark, sf_dir, "documents")), k=10
    )


@register(
    "q3_hybrid_rrf",
    f"""
WITH {_DK_RETRIEVAL_CORE},
rb AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(bm25, 4) DESC, doc_id) AS r_bm25
  FROM sc
),
rq AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(ql, 4) DESC, doc_id) AS r_ql
  FROM sc
),
fused AS (
  SELECT rb.qid, rb.doc_id, rb.r_bm25, rq.r_ql,
         round(1.0 / (60 + rb.r_bm25) + 1.0 / (60 + rq.r_ql), 6) AS rrf
  FROM rb JOIN rq ON rb.qid = rq.qid AND rb.doc_id = rq.doc_id
),
rk AS (
  SELECT qid, doc_id, r_bm25, r_ql, rrf,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(r_bm25 AS BIGINT) AS r_bm25, CAST(r_ql AS BIGINT) AS r_ql, rrf
FROM rk WHERE rank <= 10
""",
    "Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009, "
    "k=60) of two lexical systems over one candidate pool: BM25 and a "
    "Dirichlet-smoothed query-likelihood LM (mu=300; absent query terms "
    "contribute their smoothing-only mass, which is why the candidate "
    "grid keeps tf=0 rows). RRF fuses RANKS, not scores, so the two "
    "incomparable score scales need no calibration — the same fusion "
    "production stacks use for lexical+vector hybrid (swap either arm "
    "for ann_index_persisted's serve to get that). Both rankings come "
    "off ONE shared scoring aggregate (exchange reuse), ranks are "
    "integer-exact, and the fused top-10 is a bounded per-query window.",
)
def q_q3_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.retrieval import bm25_ql_scores

    sc = bm25_ql_scores(load_table(spark, sf_dir, "documents"))
    rb = sc.withColumn(
        "r_bm25",
        F.row_number().over(
            W.partitionBy("qid").orderBy(
                F.desc(F.round("bm25", 4)), F.col("doc_id")
            )
        ),
    )
    both = rb.withColumn(
        "r_ql",
        F.row_number().over(
            W.partitionBy("qid").orderBy(
                F.desc(F.round("ql", 4)), F.col("doc_id")
            )
        ),
    )
    fused = both.select(
        "qid",
        "doc_id",
        "r_bm25",
        "r_ql",
        F.round(
            1.0 / (60 + F.col("r_bm25")) + 1.0 / (60 + F.col("r_ql")), 6
        ).alias("rrf"),
    )
    rk = fused.withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.desc("rrf"), "doc_id"))
        .cast("long"),
    )
    return rk.filter(F.col("rank") <= 10).select(
        "qid",
        "rank",
        "doc_id",
        F.col("r_bm25").cast("long").alias("r_bm25"),
        F.col("r_ql").cast("long").alias("r_ql"),
        "rrf",
    )


@register(
    "q3_bm25_index_persisted",
    _BM25_TOPK_ORACLE,
    "Build-once/serve-many persisted BM25 index with append-only "
    "maintenance (operators/retrieval.py::Bm25IndexStore) — the lexical "
    "twin of ann_index_persisted/ann_index_incremental, closing the "
    "build/serve split on the retrieval arm: the index is built on the "
    "standing 80% of docs, the last 20% arrive as an increment that is "
    "tokenized ALONE — its tf/dl rows append, the vocabulary df/cf "
    "stats merge additively (one vocab-sized full-outer join, no corpus "
    "rescan; committed as a pointer-swapped generation), and "
    "n_docs/total_tokens/the bit_xor fingerprint compose exactly over "
    "disjoint doc sets. Because every persisted statistic is additive, "
    "serving the appended index is value-identical to a full-corpus "
    "recompute — the oracle IS q3_bm25_topk's oracle unchanged. Serve "
    "reads ONLY the persisted tables (qterms from stored tf/cf, global "
    "stats from the meta scalars). The chain runs only when the "
    "full-corpus fingerprint is stale (the production amortization); "
    "the fresh chain is exercised by fresh sf0.01 driver runs and "
    "tests/test_retrieval.py.",
)
def q_q3_bm25_index_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.agg(
        F.floor(0.8 * F.max("doc_id")).cast("long").alias("__s")
    )
    staged = docs.crossJoin(F.broadcast(split))
    standing = staged.filter(F.col("doc_id") < F.col("__s")).select(
        "doc_id", "text"
    )
    increment = staged.filter(F.col("doc_id") >= F.col("__s")).select(
        "doc_id", "text"
    )
    base = os.path.join(
        "spark-warehouse",
        f"bm25_index_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    store = Bm25IndexStore(base)
    if store.is_stale(docs):
        # a half-appended crash leaves the composed fingerprint stale —
        # restart from a clean directory, never double-append
        shutil.rmtree(base, ignore_errors=True)
        store.build(standing)
        store.append(increment)
        # verify additive composition only on the rebuild path; repeating
        # the fingerprint scan on every warm serve doubles its cost
        assert store.is_stale(docs) is False
    return store.serve(k=10)


@register(
    "q3_bm25_compact",
    _BM25_TOPK_ORACLE,
    "Small-file compaction on the persisted BM25 store "
    "(operators/retrieval.py::compact without tombstones — the "
    "unpartitioned twin of ann_index_compact, round 10): every "
    "append/streamed micro-batch lands one more tf/dl part-file pair, "
    "so a long-running maintenance chain grows the file count without "
    "bound and every serve pays the per-file open cost. The chain here "
    "is build(standing 80%) -> two appends -> compact(min_files=2, the "
    "maintenance schedule's trigger knob), which rewrites tf/dl into "
    "balanced round-robin partitions — value-neutral by construction "
    "(statistics, fingerprint and meta untouched), so the oracle is "
    "q3_bm25_topk's full-corpus oracle UNCHANGED and the post-compact "
    "serve must hash-equal it. Unit twin: "
    "tests/test_forget.py::test_bm25_compact_defragments_append_growth.",
)
def q_q3_bm25_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.agg(
        F.floor(0.8 * F.max("doc_id")).cast("long").alias("__s1"),
        F.floor(0.9 * F.max("doc_id")).cast("long").alias("__s2"),
    )
    staged = docs.crossJoin(F.broadcast(split))
    standing = staged.filter(F.col("doc_id") < F.col("__s1")).select(
        "doc_id", "text"
    )
    inc1 = staged.filter(
        (F.col("doc_id") >= F.col("__s1")) & (F.col("doc_id") < F.col("__s2"))
    ).select("doc_id", "text")
    inc2 = staged.filter(F.col("doc_id") >= F.col("__s2")).select(
        "doc_id", "text"
    )
    base = os.path.join(
        "spark-warehouse",
        f"bm25_compact_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    store = Bm25IndexStore(base)
    if store.is_stale(docs):
        shutil.rmtree(base, ignore_errors=True)
        store.build(standing)
        store.append(inc1)
        store.append(inc2)
        # no tombstones: this exercises the pure defragmentation path
        assert store.compact(min_files=2) == 0
        # compaction is physical only — the fingerprint still composes
        assert store.is_stale(docs) is False
    return store.serve(k=10)


# Rebuild-without-the-rows oracle for the BM25 delete: the SAME retrieval
# core, corpus restricted to the docs that survive the deletion request
# (doc_id % 11 <> 7) — every statistic (tf, dl, df, cf, n_docs, avgdl,
# collection total) recomputes from the remaining docs, including the
# pseudo-query set (a forgotten doc stops being a query too).
_BM25_FORGET_ORACLE = f"""
WITH {_dk_retrieval_core(
    "(SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 7)"
)},
r AS (SELECT qid, doc_id, round(bm25, 4) AS score FROM sc),
rk AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rank
  FROM r
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score,
       CAST(CASE WHEN doc_id = qid THEN 1 ELSE 0 END AS BIGINT) AS is_self
FROM rk WHERE rank <= 10
"""


@register(
    "q3_bm25_forget",
    _BM25_FORGET_ORACLE,
    "Right-to-be-forgotten on the persisted BM25 store "
    "(operators/retrieval.py::forget + compact, VERDICT r9 ask #4): the "
    "deletion request (doc_id % 11 = 7, passed as id+text rows so the "
    "XOR fingerprint composes back out without the store persisting raw "
    "text) drives a SUBTRACTIVE df/cf merge — the same one "
    "vocabulary-sized join as append's additive merge, committed as a "
    "pointer-swapped cf generation, tokens at df=0 leaving the "
    "vocabulary — plus a tombstone table that serve() anti-joins "
    "(broadcast; the deletion-vector pattern, O(deletes) per request), "
    "n_docs/total_tokens subtracting exactly. compact() then makes the "
    "purge PHYSICAL (tf/dl rewritten minus tombstones, tombstones "
    "cleared) without changing a single served value, because BM25 is a "
    "pure function of the already-exact statistics. The staleness gate "
    "is the warm path: is_stale(corpus-without-the-rows) False proves "
    "the composed fingerprint equals a rebuild-without scan. Oracle = "
    "the full retrieval core recomputed on the remaining docs. Unit "
    "twin: tests/test_forget.py.",
)
def q_q3_bm25_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from yaml_pipe_spark.operators.retrieval import Bm25IndexStore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    keep = docs.filter(F.col("doc_id") % 11 != 7)
    gone = docs.filter(F.col("doc_id") % 11 == 7)
    base = os.path.join(
        "spark-warehouse",
        f"bm25_forget_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    store = Bm25IndexStore(base)
    if store.is_stale(keep):
        # a half-forgotten crash leaves the composed fingerprint stale —
        # restart from a clean directory, same policy as the append chain
        shutil.rmtree(base, ignore_errors=True)
        store.build(docs)
        store.forget(gone)
        assert store.is_stale(keep) is False
        store.compact()
        # compaction is physical only: statistics and fingerprint untouched
        assert store.is_stale(keep) is False
    return store.serve(k=10)


_DK_EMB_DOCS = (
    "(SELECT d.doc_id, d.text FROM documents d "
    "JOIN embeddings x ON d.doc_id = x.vec_id) __d"
)


@register(
    "q3_hybrid_lexical_vector",
    f"""
WITH {_dk_retrieval_core(_DK_EMB_DOCS)},
rb AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(bm25, 4) DESC, doc_id) AS r_lex
  FROM sc
),
rbc AS (SELECT qid, doc_id, r_lex FROM rb WHERE r_lex <= 100),
qv AS (
  SELECT DISTINCT q.qid, e.embedding AS qe
  FROM (SELECT DISTINCT qid FROM qterms) q
  JOIN embeddings e ON e.vec_id = q.qid
),
vs AS (
  SELECT qv.qid, e.vec_id AS doc_id,
         round({_dk_cos('e.embedding', 'qv.qe')}, 6) AS cos
  FROM qv JOIN embeddings e ON TRUE
),
rv AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, doc_id) AS r_vec
  FROM vs
),
rvc AS (SELECT qid, doc_id, r_vec FROM rv WHERE r_vec <= 100),
fused AS (
  SELECT coalesce(rbc.qid, rvc.qid) AS qid,
         coalesce(rbc.doc_id, rvc.doc_id) AS doc_id,
         coalesce(rbc.r_lex, 0) AS r_lex,
         coalesce(rvc.r_vec, 0) AS r_vec,
         round(
           (CASE WHEN rbc.r_lex IS NULL
                 THEN 0.0 ELSE 1.0 / (60 + rbc.r_lex) END)
           + (CASE WHEN rvc.r_vec IS NULL
                   THEN 0.0 ELSE 1.0 / (60 + rvc.r_vec) END), 6) AS rrf
  FROM rbc FULL OUTER JOIN rvc
    ON rbc.qid = rvc.qid AND rbc.doc_id = rvc.doc_id
),
rk AS (
  SELECT qid, doc_id, r_lex, r_vec, rrf,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec, rrf
FROM rk WHERE rank <= 10
""",
    "TRUE lexical+vector hybrid retrieval — the production RAG serving "
    "pattern end to end: over the embedded subset of the corpus (both "
    "arms must rank the same universe), arm 1 is BM25 and arm 2 is exact "
    "embedding cosine from the query doc's own vector; each arm keeps "
    "its top-100, reciprocal-rank fusion (k=60) merges the UNION of "
    "candidate lists — a doc missing from one arm contributes zero from "
    "it, the standard convention — and the fused top-10 ships. Ranks "
    "are integer-exact, per-arm scores round before ranking. Plan: the "
    "lexical arm is the checkpointed inverted-index pipeline; the "
    "vector arm broadcasts the ~queries-sized vector set against the "
    "embedding table (swap in ann_index_persisted.serve for the 100 TB "
    "corpus — the fusion is rank-based, so the arm is pluggable).",
)
def q_q3_hybrid_lexical_vector(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from yaml_pipe_spark.functions.vectors import cosine
    from yaml_pipe_spark.operators.retrieval import bm25_ql_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    docs_e = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id"
    )
    sc = bm25_ql_scores(docs_e)
    rb = sc.withColumn(
        "r_lex",
        F.row_number().over(
            W.partitionBy("qid").orderBy(
                F.desc(F.round("bm25", 4)), F.col("doc_id")
            )
        ),
    ).filter(F.col("r_lex") <= 100).select("qid", "doc_id", "r_lex")
    qv = (
        sc.select("qid")
        .distinct()
        .join(emb, F.col("qid") == F.col("vec_id"))
        .select("qid", F.col("embedding").alias("qe"))
    )
    vs = F.broadcast(qv).crossJoin(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    ).select(
        "qid",
        "doc_id",
        F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("cos"),
    )
    rv = vs.withColumn(
        "r_vec",
        F.row_number().over(
            W.partitionBy("qid").orderBy(F.desc("cos"), F.col("doc_id"))
        ),
    ).filter(F.col("r_vec") <= 100).select("qid", "doc_id", "r_vec")
    fused = rb.join(rv, ["qid", "doc_id"], "full_outer").select(
        "qid",
        "doc_id",
        F.coalesce("r_lex", F.lit(0)).alias("r_lex"),
        F.coalesce("r_vec", F.lit(0)).alias("r_vec"),
        F.round(
            F.when(
                F.col("r_lex").isNull(), F.lit(0.0)
            ).otherwise(1.0 / (60 + F.col("r_lex")))
            + F.when(
                F.col("r_vec").isNull(), F.lit(0.0)
            ).otherwise(1.0 / (60 + F.col("r_vec"))),
            6,
        ).alias("rrf"),
    )
    rk = fused.withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.desc("rrf"), "doc_id"))
        .cast("long"),
    )
    return rk.filter(F.col("rank") <= 10).select(
        "qid",
        "rank",
        "doc_id",
        F.col("r_lex").cast("long").alias("r_lex"),
        F.col("r_vec").cast("long").alias("r_vec"),
        "rrf",
    )
