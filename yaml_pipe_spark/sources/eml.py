"""Minimal pure-Python EML text extraction (stdlib only: email package).

RFC-822/MIME mail messages: the `email` parser handles header decoding
(RFC 2047 encoded-words), multipart traversal, and body transfer decodings
(quoted-printable, base64). The reference parses .eml through
`unstructured.partition` (/root/reference/yamlpipe/components/sources.py:92-93),
which emits the subject as a title element followed by the body text; this
extractor mirrors that shape without the dependency. Scope: Subject line +
every text/* leaf part in document order (text/html parts are tag-stripped);
attachments and non-text parts are skipped.
"""

from __future__ import annotations

import re
from email import message_from_bytes, policy


def _strip_html(text: str) -> str:
    text = re.sub(r"<[^>]*>", " ", text)
    return re.sub(r"[ \t]+", " ", text)


def extract_eml_text(data: bytes) -> str:
    """Subject + text bodies, elements separated by blank lines."""
    msg = message_from_bytes(data, policy=policy.default)
    parts: list[str] = []
    subject = msg.get("Subject", "")
    if subject:
        parts.append(str(subject))
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        if not ctype.startswith("text/"):
            continue
        if part.get_content_disposition() == "attachment":
            continue
        try:
            body = part.get_content()
        except Exception:
            continue  # undecodable charset/transfer encoding -> skip part
        if ctype == "text/html":
            body = _strip_html(body)
        body = body.strip()
        if body:
            parts.append(body)
    return "\n\n".join(parts)
