"""Tar archive text extraction — pure stdlib.

Corpora and checkpoint shards commonly travel as (optionally gzipped)
tar archives of small text files (the WebDataset layout). The extractor
reads every regular member whose name ends in a text extension, in
member-name order (deterministic regardless of archive insertion
order), and joins the UTF-8 contents with ``"\\n\\n"`` — the same
elements-joined contract as the reference's `unstructured` parse
(reference components/sources.py:92-93). Non-text members (images,
json sidecars, directories) are skipped, mirroring how a WebDataset
pipeline selects the `.txt` stream from each sample.
"""

from __future__ import annotations

import io
import tarfile

TEXT_MEMBER_EXTENSIONS = (".txt", ".md", ".text")


def extract_tar_text(raw: bytes) -> str:
    """Text members of the archive (gzip handled transparently by
    tarfile), sorted by member name, UTF-8-decoded and joined with
    ``"\\n\\n"``."""
    with tarfile.open(fileobj=io.BytesIO(raw), mode="r:*") as tf:
        texts: list[tuple[str, str]] = []
        for member in tf.getmembers():
            if not member.isfile():
                continue
            if not member.name.lower().endswith(TEXT_MEMBER_EXTENSIONS):
                continue
            f = tf.extractfile(member)
            if f is None:
                continue
            texts.append((member.name, f.read().decode("utf-8")))
    return "\n\n".join(t for _, t in sorted(texts))


def build_tar(members: dict[str, bytes], gz: bool = False) -> bytes:
    """Deterministic tar builder for tests/oracles: pinned mtime/uid/gid
    so identical inputs produce identical bytes (gzip mtime pinned too)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name in sorted(members):
            data = members[name]
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    out = buf.getvalue()
    if gz:
        import gzip as _gzip

        out = _gzip.compress(out, mtime=0)
    return out
