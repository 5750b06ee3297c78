"""PNG-payload perceptual hashing (round 10): the compressed-format twin
of the BMP phash path must round-trip through a REAL inflate + unfilter
decode, keep the corpus's banding contract, and stay a distinct corpus
from the BMP one (different md5 salt)."""

from __future__ import annotations

import zlib

import pytest

from yaml_pipe_spark.multimodal.binary import decode_png
from yaml_pipe_spark.multimodal.phash import (
    H,
    PERT_ROWS,
    W,
    _pixel_bytes,
    build_phash_bmp,
    build_phash_png,
    dhash_bands,
    dhash_bands_png,
)


def test_png_decodes_to_the_generating_formula():
    """decode_png must recover exactly the md5-noise pixels the builder
    encoded through the five filter types — the same pixels the DuckDB
    oracle recomputes from formulas."""
    for doc_id in (0, 1, 2, 3, 17, 40, 121):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_png(build_phash_png(doc_id))
        assert (w, h) == (W, H)
        for y in range(H):
            r = H - 1 - y
            for x in range(W):
                p = r * W + x
                pert = 128 if (r < PERT_ROWS and p % 4 < v) else 0
                want = [
                    (b + pert) % 256
                    for b in reversed(_pixel_bytes(base, p, salt="png"))
                ]
                got = list(pix[3 * (y * W + x) : 3 * (y * W + x) + 3])
                assert got == want, (doc_id, x, y)


def test_png_exercises_all_five_filters():
    raw = zlib.decompress(
        build_phash_png(7)[8 + 8 + 13 + 4 + 8 :].rsplit(
            b"IEND", 1
        )[0][:-4]
    )
    stride = 3 * W
    fts = [raw[y * (1 + stride)] for y in range(H)]
    assert sorted(set(fts)) == [0, 1, 2, 3, 4]


def test_png_banding_contract_matches_bmp_structure():
    """Variants of a base perturb only the bottom two image rows, so bands
    0-2 are bit-identical within a group — the property the band join's
    recall argument rests on, for BOTH container formats."""
    for base in range(25):
        b0 = dhash_bands_png(build_phash_png(4 * base))
        for v in range(1, 4):
            bv = dhash_bands_png(build_phash_png(4 * base + v))
            assert b0[:3] == bv[:3]


def test_png_corpus_is_distinct_from_bmp_corpus():
    diff = sum(
        dhash_bands(build_phash_bmp(i))
        != dhash_bands_png(build_phash_png(i))
        for i in range(40)
    )
    assert diff == 40


def test_same_pixels_hash_identically_across_formats():
    """The format-independence property a perceptual hash exists for: a
    BMP and a PNG holding the SAME image must produce identical bands.
    Build a PNG whose pixels equal the BMP corpus's (empty salt)."""
    import yaml_pipe_spark.multimodal.phash as ph

    def png_with_bmp_pixels(doc_id: int) -> bytes:
        orig = ph._pixel_bytes
        try:
            ph._pixel_bytes = lambda b, p, salt="": orig(b, p, salt="")
            return build_phash_png(doc_id)
        finally:
            ph._pixel_bytes = orig

    for doc_id in (0, 3, 9, 30):
        assert dhash_bands_png(
            png_with_bmp_pixels(doc_id)
        ) == dhash_bands(build_phash_bmp(doc_id))


def test_dhash_png_rejects_non_png():
    with pytest.raises(ValueError):
        dhash_bands_png(build_phash_bmp(5))


def test_interlaced_png_decodes_to_the_generating_formula():
    """Every pixel of the Adam7 decode must equal the salted md5 formula
    — a wrong pass sub-width, a filter chain run across pass boundaries,
    or a mis-scattered pass grid corrupts pixels and fails here."""
    from yaml_pipe_spark.multimodal.binary import decode_png
    from yaml_pipe_spark.multimodal.phash import (
        H,
        PERT_ROWS,
        W,
        _pixel_bytes,
        build_phash_png_i7,
    )

    for doc_id in (0, 1, 2, 3, 21, 40):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_png(build_phash_png_i7(doc_id))
        assert (w, h) == (W, H)
        for y in range(H):
            r = H - 1 - y
            for x in range(W):
                p = r * W + x
                pert = 128 if (r < PERT_ROWS and p % 4 < v) else 0
                bgr = _pixel_bytes(base, p, salt="pn7")
                want = tuple((b + pert) % 256 for b in reversed(bgr))
                got = tuple(pix[3 * (y * w + x) : 3 * (y * w + x) + 3])
                assert got == want, (doc_id, x, y, got, want)


def test_interlaced_png_exercises_all_filters_and_passes():
    """At 16x8 the seven passes have heights (1,1,1,2,2,4,4) and filter
    type (pass + row) % 5 — every filter type must appear, and each pass
    must restart its previous-row predictor (the decode above already
    fails otherwise; here pin the raw scanline structure)."""
    import zlib

    from yaml_pipe_spark.multimodal.binary import _ADAM7
    from yaml_pipe_spark.multimodal.phash import H, W, build_phash_png_i7

    payload = build_phash_png_i7(0)
    idat_off = payload.find(b"IDAT") + 4
    idat_len = int.from_bytes(payload[idat_off - 8 : idat_off - 4], "big")
    raw = zlib.decompress(payload[idat_off : idat_off + idat_len])
    fts = []
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (W - x0 + dx - 1) // dx
        ph = (H - y0 + dy - 1) // dy
        for _ in range(ph):
            fts.append(raw[pos])
            pos += 1 + 3 * pw
    assert pos == len(raw)
    assert set(fts) == {0, 1, 2, 3, 4}


def test_interlaced_png_banding_and_distinctness():
    from yaml_pipe_spark.multimodal.phash import (
        build_phash_png,
        build_phash_png_i7,
        dhash_bands_png,
    )

    for base in range(10):
        b0 = dhash_bands_png(build_phash_png_i7(4 * base))
        for v in range(1, 4):
            bv = dhash_bands_png(build_phash_png_i7(4 * base + v))
            assert b0[:3] == bv[:3]
    diff = sum(
        dhash_bands_png(build_phash_png_i7(i))
        != dhash_bands_png(build_phash_png(i))
        for i in range(20)
    )
    assert diff == 20


def test_interlaced_truncation_and_bad_interlace_are_typed():
    import zlib

    from yaml_pipe_spark.multimodal.binary import decode_png
    from yaml_pipe_spark.multimodal.phash import build_phash_png_i7

    payload = build_phash_png_i7(0)
    # interlace methods beyond 0/1 stay a typed boundary
    mut = bytearray(payload)
    ihdr_off = mut.find(b"IHDR") + 4
    assert mut[ihdr_off + 12] == 1
    mut[ihdr_off + 12] = 2
    # fix the CRC so the chunk walk accepts the corrupted header
    body = bytes(mut[ihdr_off - 4 : ihdr_off + 13])
    mut[ihdr_off + 13 : ihdr_off + 17] = zlib.crc32(body).to_bytes(4, "big")
    with pytest.raises(NotImplementedError):
        decode_png(bytes(mut))
    # a truncated pass stream fails typed, not silently short
    idat_off = payload.find(b"IDAT") + 4
    idat_len = int.from_bytes(payload[idat_off - 8 : idat_off - 4], "big")
    raw = zlib.decompress(payload[idat_off : idat_off + idat_len])
    short = zlib.compress(raw[:-5])
    trunc = (
        payload[: idat_off - 8]
        + len(short).to_bytes(4, "big")
        + b"IDAT"
        + short
        + zlib.crc32(b"IDAT" + short).to_bytes(4, "big")
        + payload[idat_off + idat_len + 4 :]
    )
    with pytest.raises(ValueError, match="wrong length"):
        decode_png(trunc)
