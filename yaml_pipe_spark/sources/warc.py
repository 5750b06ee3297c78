"""WARC (Web ARChive) text extraction — pure stdlib.

The ingest format of web-crawl corpora (Common Crawl ships .warc.gz):
a WARC file is a sequence of records, each a header block (``WARC/1.0``
version line + ``Name: value`` headers, CRLF-terminated, blank line ends
the block) followed by exactly ``Content-Length`` payload bytes and a
``\\r\\n\\r\\n`` record separator (ISO 28500). ``response`` records embed a
full HTTP response — status line + headers + body — so the document text
is the HTTP body, not the raw record payload.

Scope (same contract as the other stdlib extractors in this package —
sources/pdf.py, docx.py, ...): gzip-wrapped or plain files; ``response``
record bodies decoded as UTF-8 and joined with ``"\\n\\n"``; every other
record type (warcinfo, request, metadata, revisit) is skipped. Chunked
transfer encoding and non-UTF-8 charsets raise — the cluster-side
extension point, mirroring how the reference funnels exotic formats to
`unstructured` (reference components/sources.py:92-93).
"""

from __future__ import annotations

import gzip


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def extract_warc_text(raw: bytes) -> str:
    """Concatenated UTF-8 bodies of all ``response`` records, in file
    order, joined with ``"\\n\\n"``. Raises ValueError on structural
    corruption (bad version line, missing/short Content-Length)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    texts: list[str] = []
    i = 0
    n = len(raw)
    while i < n:
        # tolerate inter-record CRLF padding
        while i < n and raw[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        end = raw.find(b"\r\n\r\n", i)
        if end < 0:
            raise ValueError("WARC header block is not terminated")
        block = raw[i:end]
        if not block.startswith(b"WARC/"):
            raise ValueError("record does not start with a WARC version line")
        headers = _parse_headers(block)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing a valid Content-Length")
        payload = raw[end + 4 : end + 4 + length]
        if len(payload) != length:
            raise ValueError("WARC payload shorter than Content-Length")
        i = end + 4 + length
        if headers.get("warc-type", "").lower() != "response":
            continue
        # response payload = HTTP message; body starts after its headers
        sep = payload.find(b"\r\n\r\n")
        body = payload[sep + 4 :] if sep >= 0 else payload
        if sep >= 0:
            http_headers = _parse_headers(payload[:sep])
            if "chunked" in http_headers.get("transfer-encoding", ""):
                raise NotImplementedError(
                    "chunked transfer encoding is not stdlib-scope here"
                )
        texts.append(body.decode("utf-8"))
    return "\n\n".join(texts)
