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
