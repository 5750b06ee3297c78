"""Token-level quality-classifier distillation.

North-star extension (absent in the reference, which stops at chunk/embed —
SURVEY §2.9): the CCNet/fastText pattern (Wenzek et al. 2020; Joulin et al.
2017) of distilling an expensive or rule-based quality label into a cheap
linear text classifier that can score the whole crawl. The teacher here is
the Gopher rule conjunction (operators/quality.py); the student is a
multinomial Naive Bayes over whitespace tokens — which IS a linear
classifier over token counts (per-token weight = the class log-likelihood
ratio), i.e. exactly fastText's model shape with NB's closed-form training
instead of SGD, so both training and inference are plain DataFrame
aggregates with a DuckDB oracle.

Design decisions (shared verbatim by the oracle — change both together):
- Train/test split by hash: byte0(md5(doc_id)) < 0.8*256 trains, the rest
  tests (the engine's standard holdout, operators/sampling.py:33).
- Laplace alpha=1 on token likelihoods AND class priors, so an absent
  class can never produce log10(0).
- Tokens unseen in the train vocabulary are DROPPED at scoring time (the
  classic NB convention); an all-OOV test doc falls back to the prior
  margin.
- Per-token weight w(t) = round(loglik(t|pass) - loglik(t|fail), 6) and
  the prior margin are rounded BEFORE the per-doc sum, and the summed
  margin is rounded to 6dp before the sign test, so the pass/fail verdict
  never hinges on float summation order across engines (same contract as
  corpus_ccnet_buckets' tercile rounding).

Scale shape (100 TB): training is the token-count diamond the corpus
already pays for tf-idf — one (doc, token) shuffle, then vocabulary-sized
aggregates; the fitted model is a V x 1 weight table (+3 scalars) that
BROADCASTS to the scoring join, so inference is one narrow pass + one
per-doc rollup. No iteration, no driver-side math beyond the scalar
constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yaml_pipe_spark.functions.text import tokens


def nb_quality_distill(
    docs: DataFrame,
    labels: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "gopher_pass",
    train_rate: float = 0.8,
    weight_decimals: int = 6,
) -> DataFrame:
    """Train multinomial NB on the hash-train split, score the held-out
    split, return the test confusion matrix.

    `labels` is (id, label in {0,1}) — e.g. gopher_quality_signals output.
    Returns one row per (label, pred) cell:
    (gopher_label BIGINT, pred BIGINT, n_docs BIGINT, share DOUBLE) where
    share is the cell's fraction of its true-label row (the per-class
    recall diagonal) — the same report shape as text_lang_confusion.
    """
    from yaml_pipe_spark.operators.sampling import hash_sample_flag

    lab = labels.select(
        F.col(id_col), F.col(label_col).cast("int").alias("__y")
    )
    base = (
        docs.select(id_col, text_col)
        .join(lab, id_col)
        .withColumn(
            "__train",
            hash_sample_flag(F.col(id_col), F.lit(train_rate)).cast("int"),
        )
    )
    tf = base.select(
        id_col, "__y", "__train", F.explode(tokens(F.col(text_col))).alias("tok")
    ).groupBy(id_col, "__y", "__train", "tok").agg(
        F.count("*").alias("tf")
    )
    # the (doc, token, tf) feature frame feeds four consumers (train
    # counts, train doc counts, test scoring, test doc roster) and every
    # model-constant subtree below re-references it multiplicatively —
    # materialize it once (it is the tokenized feature table a production
    # pipeline persists anyway) so the corpus is scanned exactly once
    tf = tf.localCheckpoint()
    train = tf.filter(F.col("__train") == 1)

    # class-conditional token counts over the FULL train vocab grid
    # (missing (tok, class) cells count 0 via the left join + coalesce)
    # — vocab-sized; checkpointed so the scalar/grid math re-aggregates a
    # model-sized frame, not the feature frame
    ct = train.groupBy("tok", "__y").agg(F.sum("tf").alias("c"))
    ct = ct.localCheckpoint()
    vocab = ct.select("tok").distinct()
    classes = docs.sparkSession.createDataFrame(
        [(0,), (1,)], "__y int"
    )
    grid = vocab.crossJoin(F.broadcast(classes)).join(
        ct, ["tok", "__y"], "left"
    ).select("tok", "__y", F.coalesce("c", F.lit(0)).alias("c"))

    # scalars: per-class token totals, vocab size, per-class doc counts —
    # tiny frames, combined into a single broadcastable constants row
    tot = grid.groupBy("__y").agg(F.sum("c").alias("tot"))
    v = vocab.agg(F.count("*").alias("v"))
    nd = train.select(id_col, "__y").distinct().groupBy("__y").agg(
        F.count("*").alias("nd")
    )
    consts = (
        tot.join(nd, "__y")
        .groupBy()
        .agg(
            # coalesce(0): a class absent from the train split must reach
            # the Laplace +1 terms as zero, not null out the whole model
            F.coalesce(
                F.sum(F.when(F.col("__y") == 1, F.col("tot"))), F.lit(0)
            ).alias("tot1"),
            F.coalesce(
                F.sum(F.when(F.col("__y") == 0, F.col("tot"))), F.lit(0)
            ).alias("tot0"),
            F.coalesce(
                F.sum(F.when(F.col("__y") == 1, F.col("nd"))), F.lit(0)
            ).alias("nd1"),
            F.coalesce(
                F.sum(F.when(F.col("__y") == 0, F.col("nd"))), F.lit(0)
            ).alias("nd0"),
        )
        .crossJoin(v)
    )

    # per-token linear weight: loglik ratio with Laplace alpha=1, rounded
    # before the scoring sum (cross-engine determinism contract)
    wts = (
        grid.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("__y") == 1, F.col("c"))).alias("c1"),
            F.sum(F.when(F.col("__y") == 0, F.col("c"))).alias("c0"),
        )
        .crossJoin(F.broadcast(consts))
        .select(
            "tok",
            F.round(
                F.log10((F.col("c1") + 1) / (F.col("tot1") + F.col("v")))
                - F.log10((F.col("c0") + 1) / (F.col("tot0") + F.col("v"))),
                weight_decimals,
            ).alias("w"),
        )
    )
    prior = consts.select(
        F.round(
            F.log10((F.col("nd1") + 1).cast("double"))
            - F.log10((F.col("nd0") + 1).cast("double")),
            weight_decimals,
        ).alias("pw")
    )

    test = tf.filter(F.col("__train") == 0)
    scored = (
        test.join(F.broadcast(wts), "tok")
        .groupBy(id_col, "__y")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("s"))
    )
    # left join keeps all-OOV test docs (score 0 -> prior decides)
    margins = (
        test.select(id_col, "__y")
        .distinct()
        .join(scored, [id_col, "__y"], "left")
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "__y",
            F.round(
                F.coalesce(F.col("s"), F.lit(0.0)) + F.col("pw"),
                weight_decimals,
            ).alias("margin"),
        )
    )
    pred = margins.select(
        F.col("__y").cast("long").alias("gopher_label"),
        (F.col("margin") >= 0).cast("long").alias("pred"),
    )
    agg = pred.groupBy("gopher_label", "pred").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("gopher_label")
    return agg.select(
        "gopher_label",
        "pred",
        "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(w).cast("double"), 4
        ).alias("share"),
    )
