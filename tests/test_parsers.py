"""Format-dispatch parse seam: reference `unstructured.partition` +
"\n\n"-join semantics (sources.py:92-93) over a mixed-extension corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yaml_pipe_spark.sources.files import LocalFileSource
from yaml_pipe_spark.sources.parsers import (
    PARSERS,
    file_extension,
    parse_by_extension,
    register_parser,
)


@pytest.fixture()
def corpus(tmp_path):
    (tmp_path / "a.txt").write_text("Para one.\n\n\n   Para two.   \n")
    (tmp_path / "b.md").write_text("# Title\n\nBody text line.\nSecond line.")
    (tmp_path / "c.html").write_text("<p>Hello <b>world</b></p>\n\n<p>Bye</p>")
    (tmp_path / "d.xyz").write_text("unparseable format")
    (tmp_path / "e.txt").write_text("   \n\n  ")  # whitespace-only -> skipped
    return str(tmp_path)


def test_mixed_extension_parse(spark, corpus):
    src = LocalFileSource(corpus, glob_pattern="**/*", parse=True)
    rows = {
        r.source.rsplit("/", 1)[-1]: r.content
        for r in src.load(spark).collect()
    }
    # join-with-blank-line: elements trimmed, empties dropped, "\n\n" join
    assert rows["a.txt"] == "Para one.\n\nPara two."
    # markdown Title element loses the '#' markup; intra-element newlines stay
    assert rows["b.md"] == "Title\n\nBody text line.\nSecond line."
    # html: tags stripped, element structure preserved
    assert rows["c.html"] == "Hello world\n\nBye"
    # unknown extension -> skipped (reference log-and-skip, sources.py:98-100)
    assert "d.xyz" not in rows
    # whitespace-only file parses to empty -> skipped (sources.py:94-96)
    assert "e.txt" not in rows


def test_parse_is_jvm_side(spark, corpus):
    # the dispatch is a CASE-WHEN of Catalyst expressions: no Python workers
    import contextlib
    import io

    src = LocalFileSource(corpus, glob_pattern="**/*", parse=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        src.load(spark).explain("simple")
    assert "EvalPython" not in buf.getvalue()


def test_import_gated_formats_raise(spark):
    with pytest.raises(NotImplementedError, match="pypdf"):
        parse_by_extension(
            F.lit("x"), F.lit("pdf"), extensions=["txt", "pdf"]
        )


def test_register_parser_extends_dispatch(spark):
    register_parser("csvish", lambda c: F.upper(c))
    try:
        df = spark.createDataFrame([("a,b", "csvish")], "t string, e string")
        out = df.select(
            parse_by_extension(F.col("t"), F.col("e"), ["csvish"]).alias("p")
        )
        assert out.collect()[0].p == "A,B"
    finally:
        PARSERS.pop("csvish", None)


def test_file_extension_extraction(spark):
    df = spark.createDataFrame(
        [("/x/y/report.final.PDF",), ("/x/noext",), ("a.tar.gz",)], "p string"
    )
    vals = [r.e for r in df.select(file_extension(F.col("p")).alias("e")).collect()]
    assert vals == ["pdf", "", "gz"]
