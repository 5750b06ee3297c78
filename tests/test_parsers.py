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


def test_binary_format_requires_raw_column(spark):
    # pdf/docx parse the raw bytes — dispatching them without the binary
    # column is a caller bug, not a silent NULL
    with pytest.raises(ValueError, match="raw"):
        parse_by_extension(
            F.lit("x"), F.lit("pdf"), extensions=["txt", "pdf"]
        )


# ---------------------------------------------------------------------------
# Real binary formats: self-contained PDF / DOCX extraction goldens
# ---------------------------------------------------------------------------


def _mini_pdf() -> bytes:
    """Two content streams — one FlateDecode, one raw — exercising Tj, TJ
    kerning gaps, nested/escaped literal strings, octal escapes, hex
    strings, and T* line moves."""
    import zlib

    s1 = b"BT 72 720 Td (Para one.) Tj T* (Line two \\(escaped\\)) Tj ET"
    z1 = zlib.compress(s1)
    s2 = (
        b"BT 72 660 Td [(Sp) -250 (lit (nested) words)] TJ T* "
        b"(caf\\351) Tj T* <48 49> Tj ET"
    )
    parts = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>"
        b"\nendobj\n",
        b"4 0 obj\n<< /Length "
        + str(len(z1)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + z1
        + b"\nendstream\nendobj\n",
        b"5 0 obj\n<< /Length "
        + str(len(s2)).encode()
        + b" >>\nstream\n"
        + s2
        + b"\nendstream\nendobj\n",
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n",
    ]
    return b"".join(parts)


def _mini_docx() -> bytes:
    import io
    import zipfile

    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>Heading here</w:t></w:r></w:p>"
        "<w:p/>"
        "<w:p><w:r><w:t>Body with</w:t></w:r><w:r><w:t xml:space=\"preserve\">"
        " two runs</w:t></w:r><w:r><w:tab/><w:t>tabbed</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def _mini_eml() -> bytes:
    """Multipart MIME with an RFC-2047 subject, a quoted-printable plain
    part, a base64 html alternative, and a skipped attachment."""
    import base64

    html_b64 = base64.b64encode(
        b"<html><body><p>HTML  body</p></body></html>"
    ).decode()
    return (
        "Subject: =?utf-8?q?Caf=C3=A9_report?=\r\n"
        "From: a@example.com\r\n"
        "MIME-Version: 1.0\r\n"
        'Content-Type: multipart/mixed; boundary="B1"\r\n'
        "\r\n"
        "--B1\r\n"
        "Content-Type: text/plain; charset=utf-8\r\n"
        "Content-Transfer-Encoding: quoted-printable\r\n"
        "\r\n"
        "Plain caf=C3=A9 body.\r\n"
        "--B1\r\n"
        "Content-Type: text/html; charset=utf-8\r\n"
        "Content-Transfer-Encoding: base64\r\n"
        "\r\n" + html_b64 + "\r\n"
        "--B1\r\n"
        "Content-Type: application/octet-stream\r\n"
        'Content-Disposition: attachment; filename="x.bin"\r\n'
        "\r\n"
        "ignored\r\n"
        "--B1--\r\n"
    ).encode()


def _mini_pptx() -> bytes:
    """Two slides (zip order reversed vs slide order) + a notes part that
    must be ignored."""
    import io
    import zipfile

    def slide(paras: list[str]) -> str:
        a = "http://schemas.openxmlformats.org/drawingml/2006/main"
        body = "".join(
            f'<a:p><a:r><a:t>{p}</a:t></a:r></a:p>' for p in paras
        )
        return (
            f'<?xml version="1.0"?><p:sld xmlns:p="http://schemas.'
            f'openxmlformats.org/presentationml/2006/main" xmlns:a="{a}">'
            f"<p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>"
        )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/slides/slide2.xml", slide(["Second slide"]))
        zf.writestr("ppt/slides/slide1.xml", slide(["Title one", "Bullet"]))
        zf.writestr(
            "ppt/notesSlides/notesSlide1.xml", slide(["speaker notes"])
        )
    return buf.getvalue()


def test_eml_extractor_golden():
    from yaml_pipe_spark.sources.eml import extract_eml_text

    assert extract_eml_text(_mini_eml()) == (
        "Café report\n\nPlain café body.\n\nHTML body"
    )


def test_pptx_extractor_golden():
    from yaml_pipe_spark.sources.pptx import extract_pptx_text

    # slides come out in slide-number order regardless of zip order; the
    # notes part is out of scope
    assert extract_pptx_text(_mini_pptx()) == (
        "Title one\nBullet\n\nSecond slide"
    )


def test_eml_pptx_end_to_end(spark, tmp_path):
    (tmp_path / "m.eml").write_bytes(_mini_eml())
    (tmp_path / "d.pptx").write_bytes(_mini_pptx())
    src = LocalFileSource(
        str(tmp_path),
        glob_pattern="**/*",
        parse=True,
        parse_extensions=["eml", "pptx"],
    )
    rows = {
        r.source.rsplit("/", 1)[-1]: r.content
        for r in src.load(spark).collect()
    }
    assert rows["m.eml"] == "Café report\n\nPlain café body.\n\nHTML body"
    assert rows["d.pptx"] == "Title one\nBullet\n\nSecond slide"


def test_pdf_extractor_golden():
    from yaml_pipe_spark.sources.pdf import extract_pdf_text

    text = extract_pdf_text(_mini_pdf())
    assert text == (
        "Para one.\nLine two (escaped)\n"
        "Sp lit (nested) words\ncafé\nHI"
    )


def test_docx_extractor_golden():
    from yaml_pipe_spark.sources.docx import extract_docx_text

    assert extract_docx_text(_mini_docx()) == (
        "Heading here\n\nBody with two runs\ttabbed"
    )


def test_binary_formats_end_to_end(spark, tmp_path):
    """pdf + docx through the full LocalFileSource parse path: binaryFile
    scan -> extension dispatch -> pandas-UDF extract -> the same
    blank-line element normalization text formats get."""
    (tmp_path / "r.pdf").write_bytes(_mini_pdf())
    (tmp_path / "w.docx").write_bytes(_mini_docx())
    (tmp_path / "a.txt").write_text("Plain text.")
    src = LocalFileSource(
        str(tmp_path),
        glob_pattern="**/*",
        parse=True,
        parse_extensions=["txt", "pdf", "docx"],
    )
    rows = {
        r.source.rsplit("/", 1)[-1]: r.content
        for r in src.load(spark).collect()
    }
    assert rows["a.txt"] == "Plain text."
    assert rows["r.pdf"] == (
        "Para one.\nLine two (escaped)\n"
        "Sp lit (nested) words\ncafé\nHI"
    )
    # the empty w:p paragraph becomes a blank-line element boundary
    assert rows["w.docx"] == "Heading here\n\nBody with two runs\ttabbed"


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


def _mini_epub() -> bytes:
    """Two spine chapters whose SPINE order reverses the zip/manifest
    order, a nested OPF directory, a non-spine part that must be ignored,
    and a chapter with no block markup (body-text fallback)."""
    import io
    import zipfile

    container = (
        '<?xml version="1.0"?>'
        '<container version="1.0" xmlns="urn:oasis:names:tc:'
        'opendocument:xmlns:container"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        "<manifest>"
        '<item id="c2" href="text/ch2.xhtml" '
        'media-type="application/xhtml+xml"/>'
        '<item id="c1" href="text/ch1.xhtml" '
        'media-type="application/xhtml+xml"/>'
        '<item id="cover" href="cover.xhtml" '
        'media-type="application/xhtml+xml"/>'
        "</manifest>"
        '<spine><itemref idref="c1"/><itemref idref="c2"/></spine>'
        "</package>"
    )
    ch1 = (
        '<?xml version="1.0"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        "<h1>Chapter One</h1><p>First <em>para</em>.</p>"
        "<ul><li>item a</li></ul>"
        "</body></html>"
    )
    ch2 = (  # no block elements: whole-body fallback
        '<?xml version="1.0"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        "Bare body text</body></html>"
    )
    cover = (
        '<?xml version="1.0"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        "<p>NOT IN SPINE</p></body></html>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        zf.writestr("OEBPS/text/ch2.xhtml", ch2)
        zf.writestr("OEBPS/text/ch1.xhtml", ch1)
        zf.writestr("OEBPS/cover.xhtml", cover)
    return buf.getvalue()


def test_epub_extractor_golden():
    from yaml_pipe_spark.sources.epub import extract_epub_text

    # chapters come out in SPINE order (c1 before c2 despite manifest/zip
    # order); nested hrefs resolve against the OPF directory; the
    # non-spine cover is skipped; ch2 falls back to bare body text
    assert extract_epub_text(_mini_epub()) == (
        "Chapter One\nFirst para.\nitem a\n\nBare body text"
    )


def test_epub_end_to_end(spark, tmp_path):
    (tmp_path / "b.epub").write_bytes(_mini_epub())
    src = LocalFileSource(
        str(tmp_path),
        glob_pattern="**/*",
        parse=True,
        parse_extensions=["epub"],
    )
    rows = {
        r.source.rsplit("/", 1)[-1]: r.content
        for r in src.load(spark).collect()
    }
    assert rows["b.epub"] == (
        "Chapter One\nFirst para.\nitem a\n\nBare body text"
    )


def _mini_odt() -> bytes:
    """A heading, a paragraph with nested span + tab + multi-space + a
    line break, and a footnote whose body must be skipped (its tail
    kept)."""
    import io
    import zipfile

    t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    content = (
        '<?xml version="1.0"?>'
        f'<office:document-content xmlns:office="urn:oasis:names:tc:'
        f'opendocument:xmlns:office:1.0" xmlns:text="{t}">'
        "<office:body><office:text>"
        '<text:h text:outline-level="1">Title <text:span>here</text:span>'
        "</text:h>"
        "<text:p>col1<text:tab/>col2<text:line-break/>"
        'a<text:s text:c="3"/>b'
        "<text:note><text:note-body><text:p>skip me</text:p>"
        "</text:note-body></text:note> tail</text:p>"
        "<text:p/>"
        "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", content)
    return buf.getvalue()


def test_odt_extractor_golden():
    from yaml_pipe_spark.sources.odt import extract_odt_text

    assert extract_odt_text(_mini_odt()) == (
        "Title here\ncol1\tcol2\na   b tail"
    )


_MINI_RTF = (
    rb"{\rtf1\ansi\deff0"
    rb"{\fonttbl{\f0 Times New Roman;}}"
    rb"{\colortbl;\red0\green0\blue0;}"
    rb"{\info{\title secret title}}"
    rb"{\*\generator SomeTool 1.0;}"
    rb"\f0\fs24 Caf\'e9 body\par"
    rb"Second\tab line\line with \u8212 ?dash\par"
    rb"Braces \{x\} done}"
)


def test_rtf_extractor_golden():
    from yaml_pipe_spark.sources.rtf import extract_rtf_text

    # header destinations and \* groups vanish; \'e9 -> e-acute; 舒
    # -> em dash with the "?" fallback consumed; escaped braces survive
    assert extract_rtf_text(_MINI_RTF) == (
        "Café body\nSecond\tline\nwith —dash\nBraces {x} done"
    )


def test_odt_rtf_end_to_end(spark, tmp_path):
    (tmp_path / "a.odt").write_bytes(_mini_odt())
    (tmp_path / "b.rtf").write_bytes(_MINI_RTF)
    src = LocalFileSource(
        str(tmp_path),
        glob_pattern="**/*",
        parse=True,
        parse_extensions=["odt", "rtf"],
    )
    rows = {
        r.source.rsplit("/", 1)[-1]: r.content
        for r in src.load(spark).collect()
    }
    assert rows["a.odt"] == "Title here\ncol1\tcol2\na   b tail"
    assert rows["b.rtf"] == "Café body\nSecond\tline\nwith —dash\nBraces {x} done"


def _mini_xlsx() -> bytes:
    """Two sheets whose WORKBOOK order reverses the zip order; shared
    plain + rich-run strings, an inline string, a formula string result,
    raw numbers, and an empty row that must vanish."""
    import io
    import zipfile

    m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pr = "http://schemas.openxmlformats.org/package/2006/relationships"
    workbook = (
        f'<?xml version="1.0"?><workbook xmlns="{m}" xmlns:r="{r}">'
        '<sheets><sheet name="Data" sheetId="1" r:id="rId2"/>'
        '<sheet name="Notes" sheetId="2" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        f'<?xml version="1.0"?><Relationships xmlns="{pr}">'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="x" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    sst = (
        f'<?xml version="1.0"?><sst xmlns="{m}" count="2" uniqueCount="2">'
        "<si><t>name</t></si>"
        "<si><r><t>rich </t></r><r><t>runs</t></r></si></sst>"
    )
    sheet_notes = (
        f'<?xml version="1.0"?><worksheet xmlns="{m}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>just a note</t></is>'
        "</c></row></sheetData></worksheet>"
    )
    sheet_data = (
        f'<?xml version="1.0"?><worksheet xmlns="{m}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"/>'
        '<row r="3"><c r="A3"><v>42</v></c>'
        '<c r="B3" t="str"><v>=sum</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet_notes)
        zf.writestr("xl/worksheets/sheet2.xml", sheet_data)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
    return buf.getvalue()


def test_xlsx_extractor_golden():
    from yaml_pipe_spark.sources.xlsx import extract_xlsx_text

    # "Data" (rId2 -> sheet2) comes first per WORKBOOK order despite zip
    # order; empty row dropped; shared + rich + formula + number cells
    assert extract_xlsx_text(_mini_xlsx()) == (
        "name\trich runs\n42\t=sum\n\njust a note"
    )


def test_xlsx_end_to_end(spark, tmp_path):
    (tmp_path / "t.xlsx").write_bytes(_mini_xlsx())
    src = LocalFileSource(
        str(tmp_path),
        glob_pattern="**/*",
        parse=True,
        parse_extensions=["xlsx"],
    )
    rows = {
        r.source.rsplit("/", 1)[-1]: r.content
        for r in src.load(spark).collect()
    }
    assert rows["t.xlsx"] == "name\trich runs\n42\t=sum\n\njust a note"


def test_jsonl_parser_and_end_to_end(spark, tmp_path):
    """JSONL: text field preferred, content fallback, malformed and
    textless lines drop — all Catalyst, no UDF."""
    raw = (
        '{"text": "first doc", "meta": 1}\n'
        '{"content": "fallback doc"}\n'
        "not json at all\n"
        '{"meta": "no text here"}\n'
        "\n"
        '{"text": "  third  "}\n'
    )
    (tmp_path / "d.jsonl").write_text(raw)
    src = LocalFileSource(
        str(tmp_path),
        glob_pattern="**/*",
        parse=True,
        parse_extensions=["jsonl"],
    )
    rows = [r.content for r in src.load(spark).collect()]
    assert rows == ["first doc\n\nfallback doc\n\nthird"]


def test_epub_nested_blocks_emit_once():
    """<ul><li><p>item</p></li></ul> must extract the passage ONCE (the
    outermost block wins), not once per nested block level."""
    import io
    import zipfile

    from yaml_pipe_spark.sources.epub import extract_epub_text

    container = (
        '<?xml version="1.0"?>'
        '<container version="1.0" xmlns="urn:oasis:names:tc:'
        'opendocument:xmlns:container"><rootfiles>'
        '<rootfile full-path="c.opf" media-type="x"/>'
        "</rootfiles></container>"
    )
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        '<manifest><item id="a" href="a.xhtml" media-type="x"/></manifest>'
        '<spine><itemref idref="a"/></spine></package>'
    )
    xhtml = (
        '<?xml version="1.0"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        "<ul><li><p>item one</p></li><li>item two</li></ul>"
        "</body></html>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("c.opf", opf)
        zf.writestr("a.xhtml", xhtml)
    assert extract_epub_text(buf.getvalue()) == "item one\nitem two"


def test_rtf_unicode_fallback_control_word_consumed():
    """\\uN followed by a control-word fallback (\\u8212\\emdash, the
    standard writer-emitted pair) must emit the character ONCE."""
    from yaml_pipe_spark.sources.rtf import extract_rtf_text

    assert extract_rtf_text(
        rb"{\rtf1 a\u8212\emdash  b}"
    ) == "a— b"


def test_xlsx_negative_shared_index_is_empty():
    """A corrupt negative shared-string index must not wrap around to
    the END of the table."""
    from yaml_pipe_spark.sources.xlsx import extract_xlsx_text

    import io
    import zipfile

    m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pr = "http://schemas.openxmlformats.org/package/2006/relationships"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{m}" xmlns:r="{r}"><sheets>'
            f'<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{pr}"><Relationship Id="rId1" '
            f'Type="x" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{m}"><si><t>only</t></si></sst>',
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{m}"><sheetData>'
            f'<row r="1"><c r="A1" t="s"><v>-1</v></c>'
            f'<c r="B1" t="s"><v>0</v></c></row>'
            f"</sheetData></worksheet>",
        )
    # A1's -1 renders empty (not the table's last string); B1 keeps "only"
    assert extract_xlsx_text(buf.getvalue()) == "\tonly"


def test_warc_extractor_golden():
    import gzip

    from yaml_pipe_spark.sources.warc import extract_warc_text

    def rec(rtype, payload, extra=b""):
        return (
            b"WARC/1.0\r\nWARC-Type: " + rtype + b"\r\n" + extra
            + b"Content-Length: " + str(len(payload)).encode()
            + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )

    body = "hello wörld 中文".encode("utf-8")
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
    raw = (
        rec(b"warcinfo", b"software: t\r\n")
        + rec(b"request", b"GET / HTTP/1.1\r\n\r\n")
        + rec(b"response", http, b"WARC-Target-URI: http://x/1\r\n")
        + rec(b"response", http)
    )
    expected = "hello wörld 中文\n\nhello wörld 中文"
    assert extract_warc_text(raw) == expected
    # gzip wrapper sniffed transparently (the .warc.gz shape)
    assert extract_warc_text(gzip.compress(raw, mtime=0)) == expected
    # payload bytes that LOOK like a header must not desync the framing:
    # Content-Length accounting, not scanning, delimits records
    tricky = rec(b"response", http + b"\r\n\r\nWARC/1.0\r\nfake: x")
    assert extract_warc_text(tricky).startswith("hello")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="Content-Length"):
        extract_warc_text(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nx")
    chunked = rec(
        b"response",
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n",
    )
    with _pytest.raises(NotImplementedError, match="chunked"):
        extract_warc_text(chunked)


def test_tar_extractor_golden():
    from yaml_pipe_spark.sources.tar import build_tar, extract_tar_text

    t = build_tar(
        {
            "b.txt": "second".encode(),
            "a.txt": "first".encode(),
            "img.png": b"\x89PNG....",
            "meta.json": b"{}",
        }
    )
    # text members only, name order regardless of insertion order
    assert extract_tar_text(t) == "first\n\nsecond"
    # deterministic builder: identical inputs -> identical bytes
    assert t == build_tar(
        {
            "b.txt": "second".encode(),
            "a.txt": "first".encode(),
            "img.png": b"\x89PNG....",
            "meta.json": b"{}",
        }
    )
    # gzip variant transparently handled by tarfile r:*
    assert extract_tar_text(build_tar({"a.txt": b"hi"}, gz=True)) == "hi"
