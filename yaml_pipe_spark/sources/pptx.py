"""Minimal pure-Python PPTX text extraction (stdlib only: zipfile +
ElementTree).

OOXML presentations are a zip archive with one XML part per slide
(ppt/slides/slide<N>.xml); text lives in DrawingML `a:t` nodes grouped into
paragraphs by `a:p`. The reference parses .pptx through
`unstructured.partition` (/root/reference/yamlpipe/components/sources.py:92-93);
this extractor makes `.pptx` a real registry format without the dependency.
Scope: slide body text in slide-number order, one paragraph per `a:p`,
slides separated by blank lines; no notes/masters/layouts, no tables beyond
their contained paragraphs (`a:p` inside table cells is included).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def extract_pptx_text(data: bytes) -> str:
    """Per-slide paragraph texts; paragraphs joined with newlines inside a
    slide, slides joined with blank lines."""
    slides: list[tuple[int, str]] = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for name in zf.namelist():
            m = _SLIDE_RE.match(name)
            if not m:
                continue
            root = ET.fromstring(zf.read(name))
            paras: list[str] = []
            for p in root.iter(f"{_A}p"):
                runs = [t.text or "" for t in p.iter(f"{_A}t")]
                text = "".join(runs)
                if text.strip():
                    paras.append(text)
            if paras:
                slides.append((int(m.group(1)), "\n".join(paras)))
    slides.sort()
    return "\n\n".join(text for _, text in slides)
