"""Deterministic synthetic corpora at ARBITRARY size — the generator seam
behind the scale-growth measurement (VERDICT r6 ask #5).

The sf* test tables are fixed-size; measuring how an operator's wall-clock
GROWS needs the same corpus shape at 1x and 10x. Like
operators/skew.py::skewed_documents, everything here is pure Catalyst with
md5-derived pseudo-randomness: any engine, any session, any partitioning
recomputes the identical corpus, and generation itself is embarrassingly
parallel (spark.range -> narrow projections), so generator cost never
pollutes the measured operator cost shape.

Design constraints that make the scaling exponent MEANINGFUL:
- near-dup structure has constant DENSITY: doc_ids {5k, 5k+1} form a
  2-member near-dup family (same family token seed, one token
  doc-specific -> shingle Jaccard ~0.9), so true-pair mass grows O(n) —
  a superlinear wall-clock is then the OPERATOR's fault, not the data's;
- vocabulary is fixed (5000 types): token df grows linearly like a real
  corpus under a Zipf-ish draw, exercising the df-cut guards;
- embeddings carry fixed cluster structure (32 md5-derived centers,
  80/20 center/noise mix), so IVF cell balance is size-invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _md5_unit(*cols: Column) -> Column:
    """Deterministic double in [0, 1) from the md5 of the joined inputs."""
    h = F.md5(F.concat_ws("_", *cols))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )


def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    vocab: int = 5000,
    tokens_per_doc: int = 100,
    n_sources: int = 20,
) -> DataFrame:
    """(doc_id, text, source) with constant near-dup density.

    Family seed: ids {5k, 5k+1} share seed 5k (40%% of docs in 2-member
    near-dup families); one token position is doc-specific so family
    members are NEAR- not exact duplicates."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    fam = F.when(
        F.col("doc_id") % 5 < 2, F.col("doc_id") - (F.col("doc_id") % 5)
    ).otherwise(F.col("doc_id"))
    # exactly ONE doc-specific token per member: with k=3 shingles that
    # perturbs <= 3 of ~n-2 shingles -> family Jaccard ~0.9, above every
    # configured near-dup threshold, and pair mass stays exactly linear
    is_doc_tok = lambda i: i == F.lit(7)  # noqa: E731
    tok_seed = lambda i: F.when(  # noqa: E731
        is_doc_tok(i), F.concat_ws("_", F.col("doc_id"), i)
    ).otherwise(F.concat_ws("_", fam, i))
    # words are LETTERS ONLY ('w' + digits mapped a-j): the BM25/text
    # tokenizer is \p{L}+, under which digit-bearing tokens would all
    # collapse to the single type 'w' and degenerate the whole corpus
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.translate(
            (
                F.conv(
                    F.substring(F.md5(tok_seed(i)), 1, 6), 16, 10
                ).cast("long")
                % vocab
            ).cast("string"),
            "0123456789",
            "abcdefghij",
        ),
    )
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda i: word(i),
    )
    return base.select(
        "doc_id",
        F.array_join(toks, " ").alias("text"),
        F.concat(F.lit("src_"), (F.col("doc_id") % n_sources)).alias(
            "source"
        ),
    )


def synthetic_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    n_centers: int = 32,
) -> DataFrame:
    """(vec_id, embedding array<double>) — 80/20 center/noise mix around
    md5-derived centers, rounded so values are engine-portable."""
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    center = F.col("vec_id") % n_centers
    comp = lambda j: F.round(  # noqa: E731
        (_md5_unit(F.lit("c"), center, j) - 0.5) * 0.8
        + (_md5_unit(F.lit("n"), F.col("vec_id"), j) - 0.5) * 0.2,
        6,
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda j: comp(j)
    )
    return base.select("vec_id", vec.alias("embedding"))
