"""Heuristic document-quality filters for training-data curation.

North-star extension (absent in the reference, which stops at chunk/embed —
SURVEY §2.9): the rule families every large-scale LLM corpus pipeline runs
before dedup/tokenization, re-expressed as pure Catalyst plans:

- Gopher quality rules (Rae et al. 2021, "Scaling Language Models: Methods,
  Analysis & Insights from Training Gopher", Appendix A1; also used by
  RedPajama/Dolma): word-count bounds, mean-word-length bounds, fraction of
  words containing an alphabetic character, required-stopword presence.
- Gopher repetition rules: fraction of characters contained in the most
  frequent word n-gram, and in word n-grams occurring more than once.

Parameter defaults are tuned so every rule bites on the synthetic testdata
(documents are short word-soup: ~10-100 words, no newlines or punctuation):
the stopword rule uses the engine's `en` marker set with min_distinct=1
(the Gopher paper requires >=2 of an 8-word list, but only "the" exists as a
standalone token in this corpus), and the duplicated-n-gram rule uses n=2
(Gopher uses n in 5..10, which never repeats within these short documents).
Occurrence counting deviation, documented: Gopher counts each character once
even when overlapping n-gram occurrences cover it multiple times; here every
occurrence contributes length(gram) characters — simpler, still monotone in
repetitiveness, and exactly SQL-oracle-expressible.

Scale shape: the quality signals are a stateless narrow projection (no
shuffle, codegen'd, fully pushdown-friendly). The repetition signals are one
explode + one (doc_id, n, gram) count shuffle + one (doc_id) rollup — the
same diamond as the bigram LM in text_stats, keyed by high-cardinality
(doc, gram) so no hot reducer at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yaml_pipe_spark.functions.text import tokens

# Engine-canonical English stopword tokens (text_stats.LANG_MARKERS["en"],
# unpadded). The Gopher rule is parameterized — swap in the paper's 8-word
# list ("the be to of and that have with", min_distinct=2) for real corpora.
GOPHER_STOP_TOKENS: list[str] = ["the", "and", "of", "is"]


def gopher_quality_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    stop_tokens: list[str] | None = None,
    min_stop_distinct: int = 1,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document Gopher quality signals + per-rule pass flags (int 0/1).

    Columns: id, n_words, mean_word_len, alpha_word_ratio (both rounded to
    4 for display; the flags compare the unrounded doubles), stop_distinct,
    pass_words/pass_mean_word_len/pass_alpha/pass_stop, gopher_pass.

    `keep_cols` rides extra input columns through unchanged, so a consumer
    that needs the text AND the label (the distillation trainers) can get
    both from ONE corpus pass instead of joining the signals back against
    the corpus — at scale that join is a second full scan plus a
    corpus-sized exchange (guide §2.4).
    """
    stop_tokens = GOPHER_STOP_TOKENS if stop_tokens is None else stop_tokens
    t = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], t.alias("t")
    )
    counts = base.select(
        id_col,
        *keep_cols,
        F.size("t").cast("long").alias("n_words"),
        F.aggregate(
            "t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("word_chars"),
        F.size(F.filter("t", lambda x: x.rlike(r"\p{L}")))
        .cast("long")
        .alias("alpha_words"),
        sum(
            (F.array_contains("t", w).cast("int") for w in stop_tokens),
            F.lit(0),
        ).alias("stop_distinct"),
    )
    nw = F.col("n_words").cast("double")
    mwl = F.when(F.col("n_words") > 0, F.col("word_chars") / nw).otherwise(
        F.lit(0.0)
    )
    alpha = F.when(F.col("n_words") > 0, F.col("alpha_words") / nw).otherwise(
        F.lit(0.0)
    )
    flags = counts.select(
        id_col,
        *keep_cols,
        "n_words",
        F.round(mwl, 4).alias("mean_word_len"),
        F.round(alpha, 4).alias("alpha_word_ratio"),
        "stop_distinct",
        (
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        )
        .cast("int")
        .alias("pass_words"),
        ((mwl >= min_mean_word_len) & (mwl <= max_mean_word_len))
        .cast("int")
        .alias("pass_mean_word_len"),
        (alpha >= min_alpha_ratio).cast("int").alias("pass_alpha"),
        (F.col("stop_distinct") >= min_stop_distinct)
        .cast("int")
        .alias("pass_stop"),
    )
    return flags.withColumn(
        "gopher_pass",
        (
            F.col("pass_words")
            * F.col("pass_mean_word_len")
            * F.col("pass_alpha")
            * F.col("pass_stop")
        ).cast("int"),
    )


def c4_line_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_kept_lines: int = 3,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document C4 cleaning signals (Raffel et al. 2020, section 2.2)
    — the line-level rule bundle the Gopher document-level rules are
    usually stacked on:

    - a line is KEPT iff it ends in terminal punctuation (. ! ? \")
      AND has >= `min_line_words` whitespace words AND does not mention
      'javascript' (case-insensitive);
    - the page fails outright if it contains 'lorem ipsum' or a curly
      brace '{' anywhere (template/boilerplate tells);
    - c4_pass = >= `min_kept_lines` kept lines and no page-level tell.

    Columns: id, n_lines (non-blank), n_kept, kept_ratio (4dp),
    has_lorem/has_brace (int), c4_pass (int), cleaned_sha (sha256 of the
    kept lines joined by newline — pins the TRANSFORMATION, not just the
    counts, so the oracle must reproduce the cleaned text byte-exactly).

    Pure Catalyst: one split + two array filters per row, zero shuffles
    until the caller aggregates — at 100 TB this is a narrow map on the
    scan, exactly where a line-level filter must run. `keep_cols` rides
    extra input columns through (the gopher/repetition keep_cols seam),
    so consumers never join a second corpus scan back on the doc key.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), F.trim),
        lambda l: l != F.lit(""),
    )
    word_ok = lambda l: (  # noqa: E731
        F.size(F.filter(F.split(l, " "), lambda w: w != F.lit("")))
        >= min_line_words
    )
    keep = lambda l: (  # noqa: E731
        l.rlike('[.!?"]$')
        & word_ok(l)
        & ~F.lower(l).contains("javascript")
    )
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        lines.alias("__lines"),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("__lorem"),
        F.col(text_col).contains("{").alias("__brace"),
    )
    kept = F.filter(F.col("__lines"), keep)
    out = base.select(
        id_col,
        *keep_cols,
        F.size("__lines").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.round(
            F.when(
                F.size("__lines") > 0,
                F.size(kept) / F.size("__lines").cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("kept_ratio"),
        F.col("__lorem").cast("int").alias("has_lorem"),
        F.col("__brace").cast("int").alias("has_brace"),
        (
            (F.size(kept) >= min_kept_lines)
            & ~F.col("__lorem")
            & ~F.col("__brace")
        )
        .cast("int")
        .alias("c4_pass"),
        F.sha2(F.array_join(kept, "\n"), 256).alias("cleaned_sha"),
    )
    return out


def _gram_structs(n: int) -> Column:
    """Array of (n, gram) structs: all word n-grams joined with ' '."""
    return F.when(
        F.size("t") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (n - 1)),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.array_join(F.slice("t", i, n), " ").alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3),
    dup_n: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document Gopher repetition signals over word n-grams.

    top{n}_frac = chars of the most frequent n-gram (count * length, ties
    broken toward the lexicographically largest gram — both engines order
    by (count, gram)) / length(text); dup{n}_frac = chars of all n-grams
    occurring >= 2 times / length(text). Documents shorter than n words
    score 0.0. One explode over all requested n, one (id, n, gram) count
    shuffle, one per-id rollup.

    `keep_cols` rides extra per-doc input columns through on the output
    spine (the every-doc left-join side), so a consumer that needs the
    repetition fractions AND other per-row signals (gopher_funnel) gets
    both without joining a second corpus scan back on the doc key
    (guide §2.4 — same seam as gopher_quality_signals.keep_cols).
    """
    all_ns = sorted(set(top_ns) | {dup_n})
    base = df.select(
        F.col(id_col),
        F.length(text_col).cast("double").alias("n_chars"),
        tokens(F.col(text_col)).alias("t"),
    )
    exploded = base.select(
        id_col,
        "n_chars",
        F.explode(F.concat(*[_gram_structs(n) for n in all_ns])).alias("g"),
    ).select(
        id_col, "n_chars", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    )
    counted = exploded.groupBy(id_col, "n", "gram").agg(
        F.count("*").alias("c"), F.max("n_chars").alias("n_chars")
    )
    per_n = counted.groupBy(id_col, "n").agg(
        F.max("c").alias("top_c"),
        F.max_by("gram", F.struct(F.col("c"), F.col("gram"))).alias(
            "top_gram"
        ),
        F.sum(
            F.when(
                F.col("c") >= 2, F.col("c") * F.length("gram")
            ).otherwise(F.lit(0))
        ).alias("dup_chars"),
        F.max("n_chars").alias("n_chars"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("n") == n,
                F.round(
                    F.col("top_c") * F.length("top_gram") / F.col("n_chars"),
                    4,
                ),
            )
        ).alias(f"top{n}_frac")
        for n in top_ns
    ] + [
        F.max(
            F.when(
                F.col("n") == dup_n,
                F.round(F.col("dup_chars") / F.col("n_chars"), 4),
            )
        ).alias(f"dup{dup_n}_frac")
    ]
    doc = per_n.groupBy(id_col).agg(*aggs)
    out_cols = [f"top{n}_frac" for n in top_ns] + [f"dup{dup_n}_frac"]
    return (
        df.select(id_col, *keep_cols)
        .join(doc, id_col, "left")
        .select(
            id_col,
            *keep_cols,
            *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in out_cols],
        )
    )


def gopher_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup2_max: float = 0.30,
    **gopher_kwargs,
) -> DataFrame:
    """Staged quality-attrition report: how many documents survive each
    Gopher rule applied cumulatively, ending with the repetition cut.

    Columns: stage_idx, stage, n_docs, retention (share of raw, 4dp).
    One pass over the joined signal frames (a single agg row fanned out
    with stack — no per-stage rescans).
    """
    # ONE corpus pass carries the per-row gopher flags into the
    # repetition rollup's every-doc spine (both operators' keep_cols
    # seams) — the r13 shape computed the flags in a separate scan and
    # joined it back on the doc key (guide §2.4)
    sig = gopher_quality_signals(
        df, text_col, id_col, keep_cols=(text_col,), **gopher_kwargs
    ).select(
        id_col, text_col,
        "pass_words", "pass_mean_word_len", "pass_alpha", "pass_stop",
    )
    j = repetition_signals(
        sig, text_col, id_col,
        keep_cols=(
            "pass_words", "pass_mean_word_len", "pass_alpha", "pass_stop",
        ),
    ).select(
        id_col, "pass_words", "pass_mean_word_len", "pass_alpha",
        "pass_stop", "dup2_frac",
    )
    stages = [
        ("raw", F.lit(True)),
        ("word_count", F.col("pass_words") == 1),
        ("mean_word_len", F.col("pass_mean_word_len") == 1),
        ("alpha_ratio", F.col("pass_alpha") == 1),
        ("stopwords", F.col("pass_stop") == 1),
        ("repetition", F.col("dup2_frac") <= dup2_max),
    ]
    cum = F.lit(True)
    sums = []
    for name, cond in stages:
        cum = cum & cond
        sums.append(
            F.sum(cum.cast("long")).alias(f"s_{name}")
        )
    agg = j.agg(*sums)
    stack_args = []
    for i, (name, _) in enumerate(stages):
        stack_args.append(
            f"{i}, '{name}', s_{name}, "
            f"round(s_{name} / CAST(s_raw AS DOUBLE), 4)"
        )
    return agg.select(
        F.expr(
            f"stack({len(stages)}, {', '.join(stack_args)}) "
            "AS (stage_idx, stage, n_docs, retention)"
        )
    ).select(
        F.col("stage_idx").cast("int"),
        "stage",
        F.col("n_docs").cast("long"),
        "retention",
    )


# ---------------------------------------------------------------------------
# Encoding-anomaly scrub (mojibake repair)
# ---------------------------------------------------------------------------

# Pinned double-encoding repair map — the ftfy core trick for the classic
# UTF-8-bytes-read-as-Latin-1/cp1252 confusion, reduced to an explicit
# auditable table (a production scrub extends this list; the MECHANISM —
# fixed-string multi-replace inside codegen — is the 100 TB-relevant part).
MOJIBAKE_MAP: tuple[tuple[str, str], ...] = (
    ("Ã©", "é"),        # 'Ã©'  -> é
    ("Ã¤", "ä"),        # 'Ã¤'  -> ä
    ("â€™", "’"),  # 'â€™' -> ’
)

# C0/C1 controls except \t \n \r — never legitimate in corpus text
CONTROL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

REPLACEMENT_CHAR = "�"
NBSP = " "


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a fixed string, via length arithmetic (both engines
    count CHARACTERS, so the twin is exact and no regex escaping is
    needed for arbitrary unicode needles)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def encoding_anomaly_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_text: bool = False,
) -> DataFrame:
    """Detect and repair encoding damage: mojibake (double-encoded UTF-8,
    repaired via the pinned MOJIBAKE_MAP), U+FFFD replacement characters
    (dropped — the bytes are already lost), NBSP (normalized to space),
    and C0/C1 control characters (dropped). Returns ONE ROW PER FLAGGED
    DOCUMENT: (id, n_mojibake, n_replacement, n_nbsp, n_control,
    cleaned_hash) where cleaned_hash = sha256 of the repaired text under
    the pinned fix order map -> NBSP -> U+FFFD -> controls.

    Every anomaly class is a real ingest failure mode at crawl scale
    (mixed-charset origins, lossy transcodes, binary spill into text).
    Pure Catalyst: fixed-string replaces + one character-class regexp in
    whole-stage codegen, then a narrow filter — no UDF, no shuffle.
    """
    t = F.col(text_col)
    n_moji = None
    for bad, _ in MOJIBAKE_MAP:
        c = _count_occurrences(t, bad)
        n_moji = c if n_moji is None else n_moji + c
    n_repl = _count_occurrences(t, REPLACEMENT_CHAR)
    n_nbsp = _count_occurrences(t, NBSP)
    n_ctrl = F.coalesce(
        F.length(F.regexp_replace(t, f"[^{CONTROL_RE[1:-1]}]", "")),
        F.lit(0),
    ).cast("long")
    cleaned = t
    for bad, good in MOJIBAKE_MAP:
        cleaned = F.replace(cleaned, F.lit(bad), F.lit(good))
    cleaned = F.replace(cleaned, F.lit(NBSP), F.lit(" "))
    cleaned = F.replace(cleaned, F.lit(REPLACEMENT_CHAR), F.lit(""))
    cleaned = F.regexp_replace(cleaned, CONTROL_RE, "")
    extra = [cleaned.alias("cleaned_text")] if include_text else []
    out = df.select(
        F.col(id_col),
        n_moji.alias("n_mojibake"),
        n_repl.alias("n_replacement"),
        n_nbsp.alias("n_nbsp"),
        n_ctrl.alias("n_control"),
        F.sha2(cleaned, 256).alias("cleaned_hash"),
        *extra,
    )
    return out.filter(
        (F.col("n_mojibake") > 0)
        | (F.col("n_replacement") > 0)
        | (F.col("n_nbsp") > 0)
        | (F.col("n_control") > 0)
    )
