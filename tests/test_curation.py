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
