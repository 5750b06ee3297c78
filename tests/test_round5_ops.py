"""Round-5 additions: ADVICE fixes (wav passthrough, RTF \\bin, EPUB
mixed content) and the round-5 operator wave."""

from __future__ import annotations

import io
import wave

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- ADVICE fixes


def _wav(sampwidth: int, channels: int, rate: int, frames: bytes) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_resample_media_passes_through_out_of_scope_wav(spark):
    """A 16-bit or stereo WAV (outside resample_wav's stdlib scope) must
    pass through resample_media UNCHANGED, not crash the Spark stage
    (ADVICE r4: the RIFF sniff dispatched payloads resample_wav then
    raised NotImplementedError on)."""
    from yaml_pipe_spark.multimodal.binary import resample_media

    w8 = _wav(1, 1, 8000, bytes(range(16)))
    w16 = _wav(2, 1, 8000, bytes(32))  # 16-bit: out of stdlib scope
    wst = _wav(1, 2, 8000, bytes(32))  # stereo: out of stdlib scope
    trunc = w8[:20]  # RIFF/WAVE magic intact, body truncated
    rows = [
        (1, "audio", w8, {}),
        (2, "audio", w16, {}),
        (3, "audio", wst, {}),
        (4, "audio", trunc, {}),
        (5, "image", b"BM\x00", {}),
        (6, "audio", None, {}),
    ]
    df = spark.createDataFrame(
        rows, "item_id long, modality string, payload binary, meta map<string,string>"
    )
    out = {
        r["item_id"]: r["payload"]
        for r in resample_media(df, target_rate=4000).collect()
    }
    # in-scope: really resampled (different bytes, valid WAV at 4000 Hz)
    with wave.open(io.BytesIO(bytes(out[1])), "rb") as w:
        assert w.getframerate() == 4000 and w.getnframes() == 8
    # out-of-scope / truncated / non-WAV / null: byte-identical passthrough
    assert bytes(out[2]) == w16
    assert bytes(out[3]) == wst
    assert bytes(out[4]) == trunc
    assert bytes(out[5]) == b"BM\x00"
    assert out[6] is None


def test_rtf_bin_control_word_skips_raw_bytes():
    """\\binN is followed by N RAW bytes that may contain { } \\ — they
    must be skipped, not scanned as RTF (ADVICE r4)."""
    from yaml_pipe_spark.sources.rtf import extract_rtf_text

    # 4 raw bytes including '}' and '\' — scanning them would close the
    # group early and corrupt state
    assert extract_rtf_text(b"{\\rtf1 a\\bin4 }\\{xb}") == "ab"
    # \bin0 consumes nothing
    assert extract_rtf_text(b"{\\rtf1 a\\bin0 b}") == "ab"


def test_epub_bare_body_text_kept_with_blocks():
    """Mixed content: bare text that is a direct child of body (or the
    tail of a block) must survive even when block elements exist
    (ADVICE r4: it was dropped unless NO blocks were found)."""
    from yaml_pipe_spark.sources.epub import _xhtml_paragraphs

    xhtml = (
        b"<html xmlns='http://www.w3.org/1999/xhtml'><body>"
        b"intro<p>x</p>tail"
        b"<div>wrapped<p>y</p></div>"
        b"</body></html>"
    )
    assert _xhtml_paragraphs(xhtml) == ["intro", "x", "tail", "wrapped", "y"]
