"""Minimal pure-Python EPUB text extraction (stdlib only: zipfile +
ElementTree).

An EPUB is a zip archive whose META-INF/container.xml names an OPF package
document; the OPF's <manifest> maps item ids to hrefs and its <spine> lists
the reading order as idrefs. Body text lives in the spine's XHTML content
documents. The reference parses e-book formats through
`unstructured.partition` (/root/reference/yamlpipe/components/sources.py:92-93);
this extractor makes `.epub` a real registry format without the dependency.
Scope: spine-ordered content documents, one paragraph per block element
(p / h1-h6 / li), documents separated by blank lines; no NCX/nav tables of
contents, no CSS, no embedded media.
"""

from __future__ import annotations

import io
import posixpath
import zipfile
import xml.etree.ElementTree as ET

_CONTAINER = "META-INF/container.xml"
_CN = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"
_BLOCK_TAGS = frozenset(
    ["p", "h1", "h2", "h3", "h4", "h5", "h6", "li"]
)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def _xhtml_paragraphs(data: bytes) -> list[str]:
    root = ET.fromstring(data)
    body = None
    for el in root.iter():
        if _localname(el.tag) == "body":
            body = el
            break
    if body is None:
        body = root
    paras: list[str] = []

    def collect(node) -> None:
        # an OUTERMOST block element emits its whole subtree's text and is
        # not descended into — nested blocks (<li><p>..</p></li>) would
        # otherwise double-emit the same passage. Bare text mixed into a
        # non-block container (<body>intro<p>x</p></body>) is content too:
        # node.text and each child's tail become their own paragraphs.
        if node.text and node.text.strip():
            paras.append(node.text)
        for child in node:
            if _localname(child.tag) in _BLOCK_TAGS:
                text = "".join(child.itertext())
                if text.strip():
                    paras.append(text)
            else:
                collect(child)
            if child.tail and child.tail.strip():
                paras.append(child.tail)

    collect(body)
    if not paras:  # no block markup: fall back to the whole body text
        text = "".join(body.itertext())
        if text.strip():
            paras.append(text)
    return paras


def extract_epub_text(data: bytes) -> str:
    """Spine-ordered content-document paragraphs; paragraphs joined with
    newlines inside a document, documents joined with blank lines."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        container = ET.fromstring(zf.read(_CONTAINER))
        rootfile = container.find(f"{_CN}rootfiles/{_CN}rootfile")
        if rootfile is None:
            raise ValueError("epub: container.xml has no rootfile")
        opf_path = rootfile.get("full-path")
        if not opf_path:
            raise ValueError("epub: rootfile has no full-path")
        opf = ET.fromstring(zf.read(opf_path))
        opf_dir = posixpath.dirname(opf_path)
        hrefs: dict[str, str] = {}
        for item in opf.iter(f"{_OPF}item"):
            iid, href = item.get("id"), item.get("href")
            if iid and href:
                hrefs[iid] = href
        docs: list[str] = []
        for itemref in opf.iter(f"{_OPF}itemref"):
            href = hrefs.get(itemref.get("idref") or "")
            if not href:
                continue
            path = posixpath.join(opf_dir, href) if opf_dir else href
            try:
                paras = _xhtml_paragraphs(zf.read(path))
            except KeyError:
                continue  # spine names a missing part: skip, keep the rest
            if paras:
                docs.append("\n".join(paras))
    return "\n\n".join(docs)
