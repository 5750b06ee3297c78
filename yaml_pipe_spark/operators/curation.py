"""Corpus-curation operators a large-scale training-data pipeline needs
beyond per-doc stats: vocabulary blocklists (C4-style), cross-document
shared-span measurement (RefinedWeb-style), and PII detection/redaction.

All pure Catalyst expressions — split/array/regexp functions only, no UDFs —
so each has an exact DuckDB oracle twin in entrypoints.py and scales as a
narrow map plus at most one aggregation shuffle. Regexes stay inside the
syntax subset Java regex and DuckDB's RE2 interpret identically (explicit
classes, no lookaround, no \\s).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared with the oracle SQL strings in entrypoints.py — keep in sync.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def blocklist_flags(
    df: DataFrame,
    text_col: str = "text",
    blocklist: tuple[str, ...] = (),
    min_words: int = 1,
    max_word_len: int = 1000,
) -> DataFrame:
    """C4-style document filters as independent boolean flags (narrow map):

    - has_blocked: any token appears in the blocklist (C4's bad-word rule);
    - too_short: fewer than min_words whitespace tokens (quality floor);
    - has_long_word: any token longer than max_word_len (C4 drops docs with
      words > 1000 chars — a code/garbage signal);
    - keep: none of the above fired.
    """
    toks = F.split(F.col(text_col), " ")
    has_blocked = (
        F.arrays_overlap(toks, F.array(*[F.lit(w) for w in blocklist]))
        if blocklist
        else F.lit(False)
    )
    too_short = F.size(toks) < min_words
    has_long = F.array_max(F.transform(toks, F.length)) > max_word_len
    return (
        df.withColumn("has_blocked", has_blocked)
        .withColumn("too_short", too_short)
        .withColumn("has_long_word", has_long)
        .withColumn(
            "keep",
            ~(F.col("has_blocked") | F.col("too_short") | F.col("has_long_word")),
        )
    )


def shared_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    k: int = 5,
) -> DataFrame:
    """Per (group, gram) document-frequency of word k-grams — the input to
    cross-document shared-span measurement (how much of the corpus is
    boilerplate repeated across documents).

    Grams come from k-1 lead() calls over position-exploded tokens — one
    window pass per doc, never a per-doc gram-array materialization (the
    same no-blowup shape as the Gopher repetition filter). Output: one row
    per distinct gram hash with its occurrence and document counts; one
    token shuffle (window) + one gram shuffle (groupBy).
    """
    from pyspark.sql import Window as W

    toks = df.select(
        group_col,
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    w = W.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, k)]
    grams = toks.select(
        group_col,
        id_col,
        F.when(
            parts[-1].isNotNull(), F.md5(F.concat_ws(" ", *parts))
        ).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    return grams.groupBy(group_col, "gram").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct(id_col).alias("n_docs"),
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact emails and IPv4 addresses (narrow map, zero
    shuffle): adds n_emails / n_ips counts and a `redacted` text column
    with matches replaced by <EMAIL> / <IP> placeholders. The redaction
    regexes are the contract — at corpus scale this runs inside the same
    whole-stage-codegen pass as any other projection."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    redacted = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(redacted, F.lit(IPV4_RE), F.lit(0)))
    redacted = F.regexp_replace(redacted, IPV4_RE, "<IP>")
    return (
        df.withColumn("n_emails", n_emails.cast("long"))
        .withColumn("n_ips", n_ips.cast("long"))
        .withColumn("redacted", redacted)
    )


def curation_funnel(
    docs: DataFrame,
    text_col: str = "text",
    min_chars: int = 100,
    max_chars: int = 20000,
    min_alpha_pct: int = 70,
    min_stop_hits: int = 1,
    max_rep_inv: int = 8,
) -> DataFrame:
    """End-to-end keep/drop funnel: per-lang attrition through the standard
    curation gates, applied cumulatively —

      total -> length band -> alphabetic ratio -> stopword evidence ->
      top-unigram repetition -> exact dedup (keep lowest doc_id)

    This is the decision layer the individual signal queries feed; counts
    per stage are what a corpus team actually reviews before a train run.

    Thresholds are integer-arithmetic comparisons (n_letters*100 >=
    min_alpha_pct*n_chars, max_rep_inv*max_tok <= n_tok) so engines agree
    exactly — no float boundary drift. Plan: one (doc,token) shuffle for
    the repetition stats, one hash-window for the dedup rank over
    survivors, final per-lang agg. The corpus is read twice (char-level
    signals on one branch, the token explode on the other) — unlike the
    all-token-level unigram LM, the two branches cannot share one subtree.
    """
    from pyspark.sql import Window as W

    from yaml_pipe_spark.operators.text_stats import regex_count, stop_hits

    t = F.col(text_col)
    base = docs.select("lang", "doc_id", text_col)
    toks = base.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(t), F.lit(r"\p{L}+"), F.lit(0))
        ).alias("tok"),
    )
    rep = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_tok"), F.sum("c").alias("n_tok"))
    )
    sig = base.join(rep, "doc_id", "left").select(
        "lang",
        "doc_id",
        text_col,
        F.length(t).cast("long").alias("n_chars"),
        regex_count(t, r"\p{L}").alias("n_letters"),
        stop_hits(t).alias("stop_hits"),
        "max_tok",
        "n_tok",
    )
    c_len = F.col("n_chars").between(min_chars, max_chars)
    c_alpha = c_len & (
        F.col("n_letters") * 100 >= min_alpha_pct * F.col("n_chars")
    )
    c_stop = c_alpha & (F.col("stop_hits") >= min_stop_hits)
    c_rep = c_stop & (
        F.col("n_tok").isNotNull()
        & (max_rep_inv * F.col("max_tok") <= F.col("n_tok"))
    )
    flags = sig.select(
        "lang",
        "doc_id",
        text_col,
        c_len.alias("c_len"),
        c_alpha.alias("c_alpha"),
        c_stop.alias("c_stop"),
        c_rep.alias("c_rep"),
    )
    surv = flags.filter(F.col("c_rep"))
    w = W.partitionBy(F.sha2(t, 256)).orderBy("doc_id")
    final = (
        surv.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_final"))
    )
    stages = flags.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_total"),
        F.count(F.when(F.col("c_len"), 1)).cast("long").alias("n_len"),
        F.count(F.when(F.col("c_alpha"), 1)).cast("long").alias("n_alpha"),
        F.count(F.when(F.col("c_stop"), 1)).cast("long").alias("n_stop"),
        F.count(F.when(F.col("c_rep"), 1)).cast("long").alias("n_rep"),
    )
    return stages.join(final, "lang", "left").select(
        "lang",
        "n_total",
        "n_len",
        "n_alpha",
        "n_stop",
        "n_rep",
        F.coalesce("n_final", F.lit(0)).cast("long").alias("n_final"),
    )
