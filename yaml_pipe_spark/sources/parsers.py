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
Binary formats (pdf/docx) are registered but import-gated: the registry is
the extension point — plugging in a real parser is one `register_parser`
call with a pandas-UDF column (the libraries are not in this container).

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


def _import_gated(ext: str, module: str) -> Callable[[Column], Column]:
    def parser(text: Column) -> Column:  # pragma: no cover - extension point
        raise NotImplementedError(
            f".{ext} parsing needs the '{module}' library (not in this "
            f"container); register a pandas-UDF parser via register_parser()"
        )

    return parser


# extension -> Column-expression parser over the UTF-8-decoded content.
# Binary formats would parse the raw `content` bytes instead; their stub
# entries mark the seam without claiming an implementation.
PARSERS: dict[str, Callable[[Column], Column]] = {
    "txt": parse_text,
    "text": parse_text,
    "log": parse_text,
    "md": parse_markdown,
    "markdown": parse_markdown,
    "html": parse_html,
    "htm": parse_html,
    "pdf": _import_gated("pdf", "pypdf"),
    "docx": _import_gated("docx", "python-docx"),
}


def register_parser(ext: str, parser: Callable[[Column], Column]) -> None:
    PARSERS[ext.lower()] = parser


def file_extension(path: Column) -> Column:
    return F.lower(F.regexp_extract(path, r"\.([^./\\]+)$", 1))


def parse_by_extension(
    text: Column, ext: Column, extensions: list[str] | None = None
) -> Column:
    """CASE-WHEN dispatch over the registry; unknown extensions yield NULL
    (callers filter them out — the reference logs-and-skips parse failures,
    sources.py:98-100). `extensions` restricts the dispatch to formats the
    caller expects, so import-gated stubs only fire when actually requested.
    """
    exts = extensions if extensions is not None else ["txt", "md", "html"]
    expr = F.lit(None).cast("string")
    for e in reversed(exts):
        if e not in PARSERS:
            raise KeyError(f"no parser registered for extension {e!r}")
        expr = F.when(ext == e, PARSERS[e](text)).otherwise(expr)
    return expr
