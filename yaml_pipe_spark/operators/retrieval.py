"""Lexical retrieval: BM25 and Dirichlet query-likelihood over an inverted
index built with plain DataFrame aggregates.

The reference's retrieval surface is vector-only (`core/evaluation.py`
searches the LanceDB table); production RAG stacks pair that with a lexical
arm and fuse ranks (hybrid search). This module is that arm, Spark-first:

  - ONE token explode feeds four aggregates — per-(doc,term) tf, per-doc
    length, per-term df/cf, collection totals — as an exchange-reuse
    diamond (Catalyst reuses the token shuffle, the same pattern as
    text_dsir_weight).
  - Pseudo-queries: every 97th doc's top-3 terms by tf*ln(N/df). Choosing
    by tf-idf (not raw tf) keeps query terms discriminative, which keeps
    posting lists — and therefore the candidate grid — short.
  - Scoring touches only candidates (docs sharing >=1 query term, the
    inverted-index join); the tf=0 grid rows exist because the
    query-likelihood smoothing term must still contribute for absent
    terms. BM25's tf=0 contribution is exactly 0, so one shared grid
    serves both scorers in a single aggregate.

Everything is whole-stage-codegen expressions over exact integer counts —
no UDFs — so DuckDB recomputes the identical scores in the oracle
(_DK_RETRIEVAL_CORE in entrypoints.py; change them together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
MU = 300.0
QUERY_EVERY = 97
TERMS_PER_QUERY = 3
MIN_TERM_LEN = 4


def bm25_ql_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(qid, doc_id, bm25, ql) — unrounded scores for every candidate doc
    of every pseudo-query; callers round before ranking so rank membership
    is engine-exact."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"\p{L}+"), F.lit(0)
            )
        ).alias("tok"),
    )
    # tf IS the inverted index and dl the doc-length table: materialize each
    # ONCE (localCheckpoint, the staged-materialization pattern of
    # operators/dedup.py) — five consumers derive from them below, and
    # without the cut Catalyst re-explodes the whole corpus per consumer.
    # In production these two are persisted tables built per snapshot.
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dl = (
        toks.groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
        .localCheckpoint()
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    cf = tf.groupBy("tok").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    ctot = dl.agg(F.sum("dl").alias("c"))

    qtf = (
        tf.filter(
            (F.col("doc_id") % QUERY_EVERY == 0)
            & (F.length("tok") >= MIN_TERM_LEN)
        )
        .join(cf.select("tok", "df"), "tok")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(
                    F.desc(
                        F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
                    ),
                    F.col("tok"),
                )
            ),
        )
    )
    qterms = qtf.filter(F.col("rn") <= TERMS_PER_QUERY).select(
        F.col("doc_id").alias("qid"), "tok"
    )

    cand = (
        qterms.join(tf.select("tok", "doc_id"), "tok")
        .select("qid", "doc_id")
        .distinct()
    )
    grid = cand.join(qterms, "qid")  # (qid, doc_id, tok), tf=0 rows kept
    g = grid.join(tf, ["doc_id", "tok"], "left").select(
        "qid", "doc_id", "tok", F.coalesce("tf", F.lit(0)).alias("tf")
    )

    scored = (
        g.join(dl, "doc_id")
        .join(cf, "tok")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(ctot))
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (
        F.col("tf")
        * (K1 + 1)
        / (
            F.col("tf")
            + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
        )
    )
    ql_term = F.log(
        (F.col("tf") + MU * F.col("cf") / F.col("c"))
        / (F.col("dl") + MU)
    )
    return scored.groupBy("qid", "doc_id").agg(
        F.sum(idf * tf_norm).alias("bm25"),
        F.sum(ql_term).alias("ql"),
    )
