"""Minimal pure-Python PDF text extraction (stdlib only: re + zlib).

The reference parses PDFs through `unstructured.partition`
(/root/reference/yamlpipe/components/sources.py:92-93), which is not in this
container — this module is the self-contained fallback that makes `.pdf` a
REAL format in the parser registry instead of an import-gated stub. Scope
(documented, deliberate):

- streams: FlateDecode (zlib) and uncompressed; other filters are skipped.
- text: every BT..ET block in every content stream; operators Tj, ', ", TJ
  (arrays, with a space inserted for kerning gaps <= -180 milli-units, the
  usual word-gap heuristic), and line moves Td/TD/T*/Tm emitted as newlines.
- strings: literal `(..)` with the full escape set (\\n \\r \\t \\b \\f,
  octal, line continuations, nested parens) and hex `<..>`; UTF-16BE BOM
  strings decoded as such, everything else as latin-1 (identity byte map).
- NOT handled: font CMaps / ToUnicode (subset-embedded fonts come out as
  garbage codes — same failure mode as any cmap-less extractor), encrypted
  documents, object streams (/ObjStm), cross-reference repair.

For production corpora with arbitrary PDFs, register a pandas-UDF parser
backed by a real library via `register_parser("pdf", ..., binary=True)`;
this extractor is correct for the linear text-only PDFs that dominate
document dumps and is exercised end-to-end in tests/test_parsers.py.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)

# TJ numbers at or below this (milli-text-space units of leftward kerning)
# are treated as word gaps
_TJ_SPACE_GAP = -180.0


def _decode_streams(data: bytes):
    """Yield decoded stream bodies (FlateDecode or raw)."""
    for m in _STREAM_RE.finditer(data):
        d, body = m.group(1), m.group(2)
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                continue
        yield body


def _decode_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return raw.decode("latin-1")


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _scan_literal(body: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting at body[i] == '('; returns (bytes,
    index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(body)
    while i < n and depth:
        c = body[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = body[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray([e])
                i += 1
                while (
                    i < n and len(oct_digits) < 3 and 0x30 <= body[i] <= 0x37
                ):
                    oct_digits.append(body[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and body[i] == 0x0A:
                    i += 1
            else:  # unknown escape: keep the char
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _block_text(block: bytes) -> str:
    """Text of one BT..ET block: tokenize, interpret the text-showing and
    line-moving operators."""
    parts: list[str] = []
    stack: list[object] = []  # operand stack: str (shown text) | float | list
    i, n = 0, len(block)
    in_array: list | None = None

    def push(v):
        (in_array if in_array is not None else stack).append(v)

    while i < n:
        c = block[i]
        if c == 0x28:  # literal string
            raw, i = _scan_literal(block, i)
            push(_decode_string(raw))
            continue
        if c == 0x3C and i + 1 < n and block[i + 1] != 0x3C:  # <hex>
            j = block.find(b">", i)
            if j < 0:  # unterminated: consume to end, best-effort
                j = n
            # spec ignores whitespace; be lenient and drop any other
            # non-hex byte too (a crawl corpus WILL contain them)
            hx = bytes(
                b for b in block[i + 1 : j] if b in b"0123456789abcdefABCDEF"
            )
            if len(hx) % 2:
                hx += b"0"
            push(_decode_string(bytes.fromhex(hx.decode())))
            i = j + 1
            continue
        if c == 0x5B:  # [
            in_array = []
            i += 1
            continue
        if c == 0x5D:  # ]
            stack.append(in_array if in_array is not None else [])
            in_array = None
            i += 1
            continue
        m = _NUM_RE.match(block, i)
        if m:
            push(float(m.group()))
            i = m.end()
            continue
        m = _OP_RE.match(block, i)
        if m:
            op = m.group()
            if op in (b"Tj", b"'", b'"'):
                strs = [v for v in stack if isinstance(v, str)]
                if strs:
                    if op != b"Tj":
                        parts.append("\n")
                    parts.append(strs[-1])
            elif op == b"TJ":
                arrays = [v for v in stack if isinstance(v, list)]
                if arrays:
                    for v in arrays[-1]:
                        if isinstance(v, str):
                            parts.append(v)
                        elif v <= _TJ_SPACE_GAP:
                            parts.append(" ")
            elif op in (b"Td", b"TD", b"T*", b"Tm"):
                if parts and parts[-1] != "\n":
                    parts.append("\n")
            stack = []
            i = m.end()
            continue
        i += 1
    return "".join(parts)


def extract_pdf_text(data: bytes) -> str:
    """All text in the document's content streams, BT blocks joined by
    newlines, streams in file order."""
    blocks: list[str] = []
    for body in _decode_streams(data):
        for bt in _BT_RE.finditer(body):
            t = _block_text(bt.group(1))
            if t.strip():
                blocks.append(t)
    return "\n".join(blocks)
