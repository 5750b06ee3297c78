"""Chunker unit tests, carrying over the reference's golden values
(FIXTURES.md §6, reference tests/components/test_chunkers.py:19-47)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yaml_pipe_spark.operators.chunkers import (
    adaptive_chunks,
    fixed_window_chunks,
    is_markdownish,
    markdown_chunks,
    recursive_character_chunks,
    recursive_split,
)

GOLDEN_TEXT = "This is a test sentence for our amazing chunker. It is a long sentence."
MD_TEXT = "# Header 1\n\nSome text under header 1.\n\n## Header 2\n\n- item one\n- item two"


def test_recursive_split_golden():
    # Reference golden chunks: test_chunkers.py:19-26 (size=30, overlap=5)
    chunks = recursive_split(GOLDEN_TEXT, chunk_size=30, chunk_overlap=5)
    assert chunks[0] == "This is a test sentence for"
    assert chunks[1] == "for our amazing chunker. It"
    assert all(len(c) <= 30 for c in chunks)


def test_recursive_split_empty():
    assert recursive_split("", 30, 5) == []
    assert recursive_split("   ", 30, 5) == []


def test_recursive_split_paragraphs():
    text = "para one here.\n\npara two is a bit longer than one.\n\nshort."
    chunks = recursive_split(text, chunk_size=40, chunk_overlap=0)
    assert len(chunks) >= 2
    assert chunks[0].startswith("para one")


def test_recursive_chunks_df(spark):
    df = spark.createDataFrame(
        [(1, GOLDEN_TEXT), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    out = recursive_character_chunks(df, chunk_size=30, chunk_overlap=5).collect()
    assert all(r.doc_id == 1 for r in out)  # empty docs dropped
    by_idx = {r.chunk_index: r.chunk for r in out}
    assert by_idx[1] == "This is a test sentence for"
    assert by_idx[2] == "for our amazing chunker. It"


def test_fixed_window_chunks(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    out = (
        fixed_window_chunks(df, chunk_size=4, chunk_overlap=1)
        .orderBy("chunk_index")
        .collect()
    )
    assert [r.chunk for r in out] == ["abcd", "defg", "ghij", "j"]
    assert [r.chunk_index for r in out] == [1, 2, 3, 4]


def test_markdown_chunks(spark):
    # Reference: markdown chunks start with their headers (test_chunkers.py:29-39)
    df = spark.createDataFrame([(1, MD_TEXT)], ["doc_id", "text"])
    out = markdown_chunks(df, id_cols=["doc_id"]).orderBy("chunk_index").collect()
    assert len(out) == 2
    assert out[0].chunk.startswith("# Header 1")
    assert out[1].chunk.startswith("## Header 2")
    assert out[0].header1 == "Header 1"
    assert out[1].header1 == "Header 1"  # inherited
    assert out[1].header2 == "Header 2"


def test_markdown_header_reset(spark):
    text = "# A\n\nx\n\n## B\n\ny\n\n# C\n\nz"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = markdown_chunks(df, id_cols=["doc_id"]).orderBy("chunk_index").collect()
    assert out[2].header1 == "C"
    assert out[2].header2 is None  # '# C' resets the level-2 scope


def test_adaptive_dispatch(spark):
    # Reference dispatch (chunkers.py:161-171): markdown iff >=2 headers of
    # the SAME level — count("\n# ")>=2 OR count("\n## ")>=2 OR
    # count("\n### ")>=2. Doc 1 has two "\n## " occurrences -> markdown;
    # doc 3 mixes one "# " and one "## " (plus a position-0 header with no
    # leading newline) -> NOT markdown, the exact case the old any-level
    # rule got wrong.
    df = spark.createDataFrame(
        [
            (1, "intro\n" + MD_TEXT + "\n\n## Header 3\n\nclosing notes"),
            (2, "plain prose with no headers at all"),
            (3, "intro\n" + MD_TEXT),
        ],
        ["doc_id", "text"],
    )
    flags = df.select("doc_id", is_markdownish(F.col("text")).alias("md")).collect()
    assert {r.doc_id: r.md for r in flags} == {1: True, 2: False, 3: False}
    out = adaptive_chunks(df, chunk_size=20, chunk_overlap=5, id_cols=["doc_id"])
    rows = out.collect()
    md_rows = [r for r in rows if r.doc_id == 1]
    fixed_rows = [r for r in rows if r.doc_id == 2]
    assert any(r.header1 == "Header 1" for r in md_rows)
    assert all(r.header1 is None for r in fixed_rows)
    assert len(fixed_rows) >= 2


def test_recursive_split_fixed_token_closed_form():
    """The c1_recursive_chunk driver oracle's closed form: over the
    deterministic fixed-token corpus (7-char md5 tokens, n = d%23+7 per
    paragraph, p = d%3+1 paragraphs, size=50/overlap=10) the recursive
    splitter emits, per paragraph, chunk k = tokens [5(k-1)+1, min(5k+1, n)].
    Exhaustive over 500 doc_ids so the entrypoints oracle can reconstruct
    the output in SQL."""
    import hashlib
    import math

    def tok(d, j, i):
        return hashlib.md5(f"{d}:{j}:{i}".encode()).hexdigest()[:7]

    for d in range(500):
        n = d % 23 + 7
        p = d % 3 + 1
        text = "\n\n".join(
            " ".join(tok(d, j, i) for i in range(1, n + 1))
            for j in range(1, p + 1)
        )
        m = 1 + math.ceil((n - 6) / 5)
        want = [
            " ".join(tok(d, j, i) for i in range(5 * (k - 1) + 1, min(5 * k + 1, n) + 1))
            for j in range(1, p + 1)
            for k in range(1, m + 1)
        ]
        assert recursive_split(text, 50, 10) == want, f"doc_id={d}"
