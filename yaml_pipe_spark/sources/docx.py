"""Minimal pure-Python DOCX text extraction (stdlib only: zipfile + ElementTree).

OOXML wordprocessing documents are a zip archive whose main part
(word/document.xml) carries the text: paragraphs are `w:p` elements, runs
hold `w:t` text nodes, `w:tab` is a tab and `w:br`/`w:cr` are line breaks.
The reference parses .docx through `unstructured.partition`
(/root/reference/yamlpipe/components/sources.py:92-93); this extractor makes
`.docx` a real registry format without the dependency. Scope: body text in
document order, one paragraph per line (tables' cell paragraphs included —
they are `w:p` too); no headers/footers/footnotes parts, no numbering or
style expansion.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def extract_docx_text(data: bytes) -> str:
    """Paragraph texts of word/document.xml joined with newlines."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        xml_bytes = zf.read("word/document.xml")
    root = ET.fromstring(xml_bytes)
    paras: list[str] = []
    for p in root.iter(f"{_W}p"):
        # skip paragraphs nested in another paragraph's collected text
        chunks: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W}t":
                chunks.append(node.text or "")
            elif node.tag == f"{_W}tab":
                chunks.append("\t")
            elif node.tag in (f"{_W}br", f"{_W}cr"):
                chunks.append("\n")
        paras.append("".join(chunks))
    text = "\n".join(paras)
    # collapse runs of 3+ newlines left by empty paragraphs
    return re.sub(r"\n{3,}", "\n\n", text).strip("\n")
