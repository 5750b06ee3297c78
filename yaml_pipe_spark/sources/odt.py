"""Minimal pure-Python ODT text extraction (stdlib only: zipfile +
ElementTree).

An OpenDocument text file is a zip archive whose content.xml holds the
body; text lives in `text:p` paragraphs and `text:h` headings (spans and
other inline markup nest inside and contribute their text). The reference
parses office formats through `unstructured.partition`
(/root/reference/yamlpipe/components/sources.py:92-93); this extractor
makes `.odt` a real registry format without the dependency. Scope: body
paragraphs/headings in document order with `text:tab` / `text:line-break` /
`text:s` expanded; no tables-as-grids (their paragraphs still appear), no
annotations, no change tracking.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_P = f"{{{_TEXT}}}p"
_H = f"{{{_TEXT}}}h"
_TAB = f"{{{_TEXT}}}tab"
_BREAK = f"{{{_TEXT}}}line-break"
_SPACES = f"{{{_TEXT}}}s"
_NOTE = f"{{{_TEXT}}}note"  # foot/endnotes: out of scope


def _para_text(el: ET.Element) -> str:
    parts: list[str] = []

    def walk(node: ET.Element) -> None:
        # tails are always appended by the CALLER's loop, so each branch
        # here only contributes the node's own content
        if node.tag == _TAB:
            parts.append("\t")
        elif node.tag == _BREAK:
            parts.append("\n")
        elif node.tag == _SPACES:
            parts.append(" " * int(node.get(f"{{{_TEXT}}}c") or 1))
        elif node.tag == _NOTE:
            return
        if node.text:
            parts.append(node.text)
        for child in node:
            walk(child)
            if child.tail:
                parts.append(child.tail)

    if el.text:
        parts.append(el.text)
    for child in el:
        walk(child)
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def extract_odt_text(data: bytes) -> str:
    """Paragraph/heading texts in document order, joined with newlines."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    paras: list[str] = []

    def collect(node: ET.Element) -> None:
        if node.tag == _NOTE:
            return  # a note's inner paragraphs are not body paragraphs
        if node.tag in (_P, _H):
            text = _para_text(node)
            if text.strip():
                paras.append(text)
            return
        for child in node:
            collect(child)

    collect(root)
    return "\n".join(paras)
