"""Format-dispatch document parsing (reference S1 parse step, SURVEY §2.1).

The reference parses every file with `unstructured.partition(filename)` and
joins the elements with "\\n\\n" (components/sources.py:92-93) — format
detection and element extraction happen per file inside a Python loop. Here
the same seam is a per-extension PARSER registry of *Column expressions*:
the scan is one distributed `binaryFile` read, the extension comes from the
path, and a CASE-WHEN dispatch applies the right parser inside whole-stage
codegen — no Python in the hot path for text formats.

Element semantics for text formats mirror what unstructured does to .txt/.md:
split on blank-line groups, trim each element, drop empties, re-join with
"\\n\\n". Markdown title elements carry their text without the '#' markup.
Binary formats (pdf/docx) are REAL here too: self-contained pure-stdlib
extractors (sources/pdf.py, sources/docx.py) run as Arrow pandas UDFs over
the raw bytes, then share the text formats' element normalization. The
registry stays the extension point — `register_parser(ext, fn, binary=True)`
swaps in a library-backed parser for formats these extractors don't cover.

Regex classes are spelled explicitly ([ \\t\\r\\n]) rather than \\s because
Java regex and DuckDB's RE2 disagree on \\s (\\x0B), and the oracle SQL in
entrypoints.py must split identically.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# blank-line group = newline, optional horizontal whitespace, newline(s)
_ELEMENT_SPLIT = "\\n[ \\t\\r]*\\n[ \\t\\r\\n]*"
_EDGE_WS = ("^[ \\t\\r\\n]+", "[ \\t\\r\\n]+$")
_MD_HEADER = "^#{1,6}[ \\t]+"


def _trim_element(e: Column) -> Column:
    e = F.regexp_replace(e, _EDGE_WS[0], "")
    return F.regexp_replace(e, _EDGE_WS[1], "")


def elements_array(text: Column) -> Column:
    """Blank-line-separated elements of a text document, trimmed, non-empty."""
    parts = F.split(text, _ELEMENT_SPLIT)
    trimmed = F.transform(parts, _trim_element)
    return F.filter(trimmed, lambda e: F.length(e) > 0)


def parse_text(text: Column) -> Column:
    """unstructured-on-.txt semantics: elements re-joined with blank lines."""
    return F.array_join(elements_array(text), "\n\n")


def parse_markdown(text: Column) -> Column:
    """unstructured-on-.md semantics: Title elements drop the '#' markup."""
    els = F.transform(
        elements_array(text), lambda e: F.regexp_replace(e, _MD_HEADER, "")
    )
    return F.array_join(els, "\n\n")


def parse_html(text: Column) -> Column:
    """Tag-stripped text (runs of horizontal whitespace collapsed), then the
    same element normalization."""
    stripped = F.regexp_replace(text, "<[^>]*>", " ")
    collapsed = F.regexp_replace(stripped, "[ \\t]+", " ")
    return parse_text(collapsed)


def parse_jsonl(text: Column) -> Column:
    """JSON-lines corpora (the lingua franca of training data): one JSON
    object per line; each line contributes its `text` field (falling back
    to `content`), and the extracted texts become the document's
    elements. Lines whose object has neither field (including malformed
    JSON) drop; a non-string `text` value is kept STRINGIFIED
    (get_json_object returns the raw JSON text — `{"text": 42}` yields
    element "42"), matching how lenient jsonl loaders coerce scalar
    fields. Pure Catalyst — get_json_object per line inside a
    higher-order transform, no UDF."""
    lines = F.filter(
        F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0
    )
    texts = F.transform(
        lines,
        lambda l: F.coalesce(
            F.get_json_object(l, "$.text"), F.get_json_object(l, "$.content")
        ),
    )
    kept = F.filter(
        texts, lambda t: t.isNotNull() & (F.length(F.trim(t)) > 0)
    )
    return parse_text(F.array_join(kept, "\n\n"))


def parse_pdf(raw: Column) -> Column:
    """Real .pdf parsing over the raw binary column: the pure-stdlib
    extractor (sources/pdf.py — BT/ET text operators, FlateDecode) runs as
    an Arrow-batched pandas UDF, then the extracted text flows through the
    SAME element normalization as .txt, so pdf output obeys the
    reference's elements-joined-with-"\\n\\n" contract
    (sources.py:92-93)."""

    @F.pandas_udf("string", F.PandasUDFType.SCALAR)
    def _extract(s):
        from yaml_pipe_spark.sources.pdf import extract_pdf_text

        def one(b):
            if b is None:
                return None
            try:
                return extract_pdf_text(bytes(b))
            except Exception:
                return None  # log-and-skip contract: unparseable -> NULL

        return s.map(one)

    return parse_text(_extract(raw))


def parse_docx(raw: Column) -> Column:
    """Real .docx parsing over the raw binary column (sources/docx.py:
    zipfile + document.xml), then the standard element normalization."""

    @F.pandas_udf("string", F.PandasUDFType.SCALAR)
    def _extract(s):
        from yaml_pipe_spark.sources.docx import extract_docx_text

        def one(b):
            if b is None:
                return None
            try:
                return extract_docx_text(bytes(b))
            except Exception:
                return None

        return s.map(one)

    return parse_text(_extract(raw))


def _binary_extractor_parser(load_extractor: Callable[[], Callable[[bytes], str]]):
    """Shared shape of every stdlib binary extractor: raw bytes -> text via
    an Arrow-batched pandas UDF (log-and-skip on parse failure, mirroring
    the reference's sources.py:98-100), then the common text-format element
    normalization. `load_extractor` runs lazily on the executor so the
    extractor module imports inside the worker."""

    @F.pandas_udf("string", F.PandasUDFType.SCALAR)
    def _extract(s):
        fn = load_extractor()

        def one(b):
            if b is None:
                return None
            try:
                return fn(bytes(b))
            except Exception:
                return None

        return s.map(one)

    def parser(raw: Column) -> Column:
        return parse_text(_extract(raw))

    return parser


def parse_eml(raw: Column) -> Column:
    """Real .eml parsing (sources/eml.py: stdlib email package — MIME walk,
    RFC-2047 headers, quoted-printable/base64 bodies), then the standard
    element normalization."""

    def _load():
        from yaml_pipe_spark.sources.eml import extract_eml_text

        return extract_eml_text

    return _binary_extractor_parser(_load)(raw)


def parse_pptx(raw: Column) -> Column:
    """Real .pptx parsing (sources/pptx.py: zipfile + slide XML `a:t`
    runs), then the standard element normalization."""

    def _load():
        from yaml_pipe_spark.sources.pptx import extract_pptx_text

        return extract_pptx_text

    return _binary_extractor_parser(_load)(raw)


def parse_epub(raw: Column) -> Column:
    """Real .epub parsing (sources/epub.py: zip container.xml -> OPF
    manifest/spine -> XHTML block elements), then the standard element
    normalization."""

    def _load():
        from yaml_pipe_spark.sources.epub import extract_epub_text

        return extract_epub_text

    return _binary_extractor_parser(_load)(raw)


def parse_odt(raw: Column) -> Column:
    """Real .odt parsing (sources/odt.py: zip content.xml -> text:p/text:h
    paragraphs with tab/line-break/spaces expansion), then the standard
    element normalization."""

    def _load():
        from yaml_pipe_spark.sources.odt import extract_odt_text

        return extract_odt_text

    return _binary_extractor_parser(_load)(raw)


def parse_xlsx(raw: Column) -> Column:
    """Real .xlsx parsing (sources/xlsx.py: workbook rels -> sheets in
    order, shared/inline strings, tab-joined rows), then the standard
    element normalization."""

    def _load():
        from yaml_pipe_spark.sources.xlsx import extract_xlsx_text

        return extract_xlsx_text

    return _binary_extractor_parser(_load)(raw)


def parse_rtf(raw: Column) -> Column:
    """Real .rtf parsing (sources/rtf.py: brace-group control-word stream
    with destination skipping and cp1252/unicode escape decoding), then
    the standard element normalization."""

    def _load():
        from yaml_pipe_spark.sources.rtf import extract_rtf_text

        return extract_rtf_text

    return _binary_extractor_parser(_load)(raw)


def parse_warc(raw: Column) -> Column:
    """Real .warc / .warc.gz parsing (sources/warc.py: record walk,
    response-record HTTP body extraction, gzip sniff), then the standard
    element normalization."""

    def _load():
        from yaml_pipe_spark.sources.warc import extract_warc_text

        return extract_warc_text

    return _binary_extractor_parser(_load)(raw)


def parse_tar(raw: Column) -> Column:
    """Real .tar / .tar.gz parsing (sources/tar.py: text members in name
    order, WebDataset-style sidecar skipping), then the standard element
    normalization."""

    def _load():
        from yaml_pipe_spark.sources.tar import extract_tar_text

        return extract_tar_text

    return _binary_extractor_parser(_load)(raw)



# extension -> Column-expression parser over the UTF-8-decoded content.
PARSERS: dict[str, Callable[[Column], Column]] = {
    "txt": parse_text,
    "text": parse_text,
    "log": parse_text,
    "md": parse_markdown,
    "markdown": parse_markdown,
    "html": parse_html,
    "htm": parse_html,
    "jsonl": parse_jsonl,
    "ndjson": parse_jsonl,
}

# extension -> parser over the RAW BINARY content column (pandas UDF path —
# binary formats cannot run as codegen expressions). Both entries are real,
# self-contained implementations; swap in a library-backed UDF with
# register_parser(ext, fn, binary=True) for exotic documents.
BINARY_PARSERS: dict[str, Callable[[Column], Column]] = {
    "pdf": parse_pdf,
    "docx": parse_docx,
    "eml": parse_eml,
    "pptx": parse_pptx,
    "epub": parse_epub,
    "odt": parse_odt,
    "rtf": parse_rtf,
    "xlsx": parse_xlsx,
    "warc": parse_warc,
    "tar": parse_tar,
}


def register_parser(
    ext: str, parser: Callable[[Column], Column], binary: bool = False
) -> None:
    """Register a parser. Text parsers receive the UTF-8-decoded content
    column; binary parsers (binary=True) receive the raw bytes column."""
    e = ext.lower()
    if binary:
        BINARY_PARSERS[e] = parser
        PARSERS.pop(e, None)
    else:
        PARSERS[e] = parser
        BINARY_PARSERS.pop(e, None)


def file_extension(path: Column) -> Column:
    return F.lower(F.regexp_extract(path, r"\.([^./\\]+)$", 1))


def parse_by_extension(
    text: Column,
    ext: Column,
    extensions: list[str] | None = None,
    raw: Column | None = None,
) -> Column:
    """CASE-WHEN dispatch over the registry; unknown extensions yield NULL
    (callers filter them out — the reference logs-and-skips parse failures,
    sources.py:98-100). `extensions` restricts the dispatch to formats the
    caller expects, so the pandas-UDF binary parsers only enter the plan
    when actually requested. Binary formats need `raw` (the undecoded
    content column); asking for one without it is an error.
    """
    exts = extensions if extensions is not None else ["txt", "md", "html"]
    expr = F.lit(None).cast("string")
    for e in reversed(exts):
        if e in BINARY_PARSERS:
            if raw is None:
                raise ValueError(
                    f"extension {e!r} parses raw bytes; pass raw= (the "
                    f"binary content column) to parse_by_extension"
                )
            expr = F.when(ext == e, BINARY_PARSERS[e](raw)).otherwise(expr)
        elif e in PARSERS:
            expr = F.when(ext == e, PARSERS[e](text)).otherwise(expr)
        else:
            raise KeyError(f"no parser registered for extension {e!r}")
    return expr
