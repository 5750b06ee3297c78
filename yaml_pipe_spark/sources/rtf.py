"""Minimal pure-Python RTF text extraction (stdlib only).

RTF is a brace-grouped control-word stream. The reference parses rich-text
documents through `unstructured.partition`
(/root/reference/yamlpipe/components/sources.py:92-93); this extractor
makes `.rtf` a real registry format without the dependency. Scope: body
text with \\par / \\line / \\tab expanded, \\'hh byte escapes (cp1252) and
\\uN unicode escapes (with \\ucN fallback-skip handling) decoded; the
header destination groups (fonttbl, colortbl, stylesheet, info, pict, ...)
and any \\* -marked unknown destinations are skipped, mirroring how every
RTF reader treats unrecognized destinations.
"""

from __future__ import annotations

import re

_CTRL = re.compile(rb"([a-z]+)(-?\d+)? ?")
_SKIP_DESTINATIONS = frozenset(
    [
        b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
        b"header", b"footer", b"headerl", b"headerr", b"headerf",
        b"footerl", b"footerr", b"footerf", b"footnote", b"annotation",
        b"object", b"datafield", b"themedata", b"colorschememapping",
        b"listtable", b"listoverridetable", b"revtbl", b"generator",
        b"xmlnstbl", b"filetbl",
    ]
)
_SPECIAL = {
    b"par": "\n", b"line": "\n", b"sect": "\n", b"page": "\n",
    b"tab": "\t", b"emdash": "—", b"endash": "–",
    b"lquote": "‘", b"rquote": "’",
    b"ldblquote": "“", b"rdblquote": "”",
    b"bullet": "•", b"emspace": " ", b"enspace": " ",
    b"qmspace": " ",
}


def extract_rtf_text(data: bytes) -> str:
    """Decode the visible text of an RTF byte stream."""
    out: list[str] = []
    # group state: (skipping, uc_skip_count)
    stack: list[tuple[bool, int]] = []
    skipping, uc = False, 1
    pending_uc_skip = 0
    i, n = 0, len(data)
    while i < n:
        ch = data[i : i + 1]
        if ch == b"{":
            stack.append((skipping, uc))
            i += 1
        elif ch == b"}":
            if stack:
                skipping, uc = stack.pop()
            i += 1
        elif ch == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt == b"'":
                byte = int(data[i + 2 : i + 4], 16)
                if pending_uc_skip > 0:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(bytes([byte]).decode("cp1252", "replace"))
                i += 4
            elif nxt == b"*":
                # \* marks the group as a destination: skip unless the
                # next control word is one we render anyway (none are)
                skipping = True
                i += 2
            elif nxt in (b"\\", b"{", b"}"):
                if pending_uc_skip > 0:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(nxt.decode("ascii"))
                i += 2
            elif nxt == b"~":
                if not skipping:
                    out.append(" ")
                i += 2
            elif nxt == b"\n" or nxt == b"\r":
                if not skipping:
                    out.append("\n")
                i += 2
            else:
                m = _CTRL.match(data, i + 1)
                if not m:
                    i += 1
                    continue
                word, param = m.group(1), m.group(2)
                if word == b"u" and param is not None:
                    cp = int(param)
                    if cp < 0:
                        cp += 65536
                    if not skipping:
                        out.append(chr(cp))
                    pending_uc_skip = uc
                elif word == b"uc" and param is not None:
                    uc = int(param)
                elif word == b"bin" and param is not None:
                    # \binN: N RAW bytes follow the delimiter — they are
                    # not RTF text, and a { } \ byte inside the run would
                    # corrupt group state if scanned. Skip unconditionally.
                    i = m.end() + max(0, int(param))
                    continue
                elif word in _SKIP_DESTINATIONS:
                    skipping = True
                elif word in _SPECIAL:
                    # a text-producing control word counts as ONE \uN
                    # fallback item: \u8212\emdash is the standard
                    # writer-emitted pair, and emitting both would
                    # duplicate the character
                    if pending_uc_skip > 0:
                        pending_uc_skip -= 1
                    elif not skipping:
                        out.append(_SPECIAL[word])
                # any other control word: formatting, ignore
                i = m.end()
        else:
            if pending_uc_skip > 0:
                pending_uc_skip -= 1
            elif not skipping and ch not in (b"\r", b"\n"):
                out.append(ch.decode("cp1252", "replace"))
            i += 1
    return "".join(out).strip()
