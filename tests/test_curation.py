"""Curation operators: blocklist flags, shared n-grams, PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from yaml_pipe_spark.operators.curation import (
    blocklist_flags,
    pii_redact,
    shared_ngrams,
)


def test_blocklist_flags(spark):
    df = spark.createDataFrame(
        [
            (0, "good clean text with plenty of words here ok"),
            (1, "contains badword among other fine words right here ok"),
            (2, "too short"),
            (3, "has a veryveryverylongwordthatkeepsgoing in the middle here"),
        ],
        "id long, text string",
    )
    out = blocklist_flags(
        df, "text", blocklist=("badword",), min_words=5, max_word_len=20
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[0].keep and not rows[0].has_blocked
    assert rows[1].has_blocked and not rows[1].keep
    assert rows[2].too_short and not rows[2].keep
    assert rows[3].has_long_word and not rows[3].keep


def test_blocklist_filter_component(spark):
    from yaml_pipe_spark.plans.factory import build_component
    from yaml_pipe_spark.plans.config import ComponentSpec

    f = build_component(
        "filter",
        ComponentSpec(
            type="blocklist",
            config={"blocklist": ["badword"], "min_words": 3},
        ),
    )
    df = spark.createDataFrame(
        [("a", "one two three four"), ("b", "has badword in it"), ("c", "hi")],
        "item_id string, content string",
    )
    kept = [r.item_id for r in f.apply(df).collect()]
    assert kept == ["a"]


def test_shared_ngrams_counts(spark):
    # "a b c d e" appears in docs 1 and 2 -> that 5-gram has n_docs=2
    df = spark.createDataFrame(
        [
            (1, "en", "a b c d e f"),
            (2, "en", "x a b c d e"),
            (3, "en", "p q r s t"),
        ],
        "doc_id long, lang string, text string",
    )
    per = shared_ngrams(df, "text", "doc_id", "lang", k=5).collect()
    by_docs = sorted((r.n_docs, r.n_occ) for r in per)
    # doc1 has 2 grams (abcde, bcdef), doc2 has 2 (xabcd, abcde), doc3 has 1
    assert len(per) == 4  # abcde shared, bcdef, xabcd, pqrst
    assert by_docs == [(1, 1), (1, 1), (1, 1), (2, 2)]


def test_pii_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.smith@example.org or 192.168.0.1 today"),
            (2, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in pii_redact(df, "text").collect()}
    assert rows[1].n_emails == 1 and rows[1].n_ips == 1
    assert rows[1].redacted == "write to <EMAIL> or <IP> today"
    assert rows[2].n_emails == 0 and rows[2].n_ips == 0
    assert rows[2].redacted == "nothing sensitive here"


def test_curation_funnel_monotone_and_dedups_survivors(spark):
    from yaml_pipe_spark.operators.curation import curation_funnel

    good = (
        "a quick brown fox jumped over one lazy dog and then it rested "
        "near this river while that dog watched some quiet water slowly "
        "drifting past an old wooden bridge during the warm evening sun "
        "as birds sang their gentle songs above distant green hills"
    )
    rows = [
        ("en", 1, good),              # survives everything
        ("en", 2, good),              # exact duplicate -> dropped at dedup
        ("en", 3, "too short"),       # fails length band
        ("en", 4, "spam and " * 20),  # repetition: top token at 50% share
        ("en", 5, "0123456789 " * 30),  # fails alpha ratio
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    r = {row.lang: row for row in curation_funnel(df).collect()}["en"]
    assert (
        r.n_total >= r.n_len >= r.n_alpha >= r.n_stop >= r.n_rep >= r.n_final
    )
    assert r.n_total == 5
    assert r.n_len == 4        # doc 3 out
    assert r.n_alpha == 3      # doc 5 out
    assert r.n_stop == 3       # doc 4 still has " and " evidence
    assert r.n_rep == 2        # doc 4 out (docs 1,2 remain)
    assert r.n_final == 1      # exact-dup collapse keeps doc 1


def test_curation_funnel_registered_monotone(spark):
    from yaml_pipe_spark.entrypoints import REGISTRY

    for r in REGISTRY["corpus_curation_funnel"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect():
        assert (
            r.n_total >= r.n_len >= r.n_alpha >= r.n_stop >= r.n_rep
            >= r.n_final
        )


def test_segment_dedup_filter_component(spark):
    """YAML `segment_dedup` rule: the shared 2-token block is cut from
    both docs' content, a fully-boilerplate doc is dropped, unique
    content is untouched."""
    from yaml_pipe_spark.plans.config import ComponentSpec
    from yaml_pipe_spark.plans.factory import build_component

    f = build_component(
        "filter", ComponentSpec(type="segment_dedup", config={"seg_words": 2})
    )
    df = spark.createDataFrame(
        [
            ("a", "spam spam x y", "s1"),
            ("b", "spam spam p q r", "s2"),
            ("c", "spam spam", "s3"),      # nothing survives -> dropped
            ("d", "all mine here", "s4"),  # untouched
        ],
        "item_id string, content string, source string",
    )
    out = {r.item_id: (r.content, r.source) for r in f.apply(df).collect()}
    assert out == {
        "a": ("x y", "s1"),
        "b": ("p q r", "s2"),
        "d": ("all mine here", "s4"),
    }


def test_temperature_mix_filter_component(spark):
    """YAML `temperature_mix` rule: deterministic (same keys kept on
    re-run), budget-shaped (keeps roughly budget_frac overall), and the
    low-resource stratum keeps a larger share of itself."""
    from yaml_pipe_spark.plans.config import ComponentSpec
    from yaml_pipe_spark.plans.factory import build_component

    f = build_component(
        "filter",
        ComponentSpec(
            type="temperature_mix",
            config={"stratum_col": "lang", "budget_frac": 0.5},
        ),
    )
    rows = [(str(i), "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "item_id string, lang string")
    kept1 = sorted(r.item_id for r in f.apply(df).collect())
    kept2 = sorted(r.item_id for r in f.apply(df).collect())
    assert kept1 == kept2 and 0 < len(kept1) < 1000
    share = {
        lang: sum(1 for i in kept1 if (int(i) < 900) == (lang == "big"))
        / (900 if lang == "big" else 100)
        for lang in ("big", "small")
    }
    assert share["small"] >= share["big"]
