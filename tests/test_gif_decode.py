"""GIF codec tests: the LZW decoder is validated against a published
real-world GIF stream (not just this repo's own encoder), the builder
round-trips, and the Spark report query matches its generating formulas."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.multimodal.binary import (
    _lzw_decode,
    _lzw_encode,
    build_gif,
    decode_gif,
    decode_payload,
)

# The documented 10x10 sample from the widely-cited GIF-format walkthrough
# ("What's in a GIF"): LZW minimum code size 2, compressed bytes and the
# pixel-index matrix exactly as published. A decoder that mis-times the
# variable-width growth or mishandles clear/EOI cannot reproduce it.
_PUBLISHED_LZW = bytes([
    0x8C, 0x2D, 0x99, 0x87, 0x2A, 0x1C, 0xDC, 0x33, 0xA0, 0x02, 0x75,
    0xEC, 0x95, 0xFA, 0xA8, 0xDE, 0x60, 0x8C, 0x04, 0x91, 0x4C, 0x01,
    0x00,
])
_PUBLISHED_PIXELS = [
    1, 1, 1, 1, 1, 2, 2, 2, 2, 2,
    1, 1, 1, 1, 1, 2, 2, 2, 2, 2,
    1, 1, 1, 1, 1, 2, 2, 2, 2, 2,
    1, 1, 1, 0, 0, 0, 0, 2, 2, 2,
    1, 1, 1, 0, 0, 0, 0, 2, 2, 2,
    2, 2, 2, 0, 0, 0, 0, 1, 1, 1,
    2, 2, 2, 0, 0, 0, 0, 1, 1, 1,
    2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
]


def test_lzw_decoder_matches_published_gif_stream():
    assert _lzw_decode(_PUBLISHED_LZW, 2, 100) == _PUBLISHED_PIXELS


def test_lzw_roundtrip_crosses_width_boundaries():
    # long repetitive streams grow the dictionary through several width
    # increases (8 -> 16 -> 32 -> ... codes); any encoder/decoder timing
    # off-by-one desyncs and corrupts the tail
    for mcs, seq in [
        (2, ([0, 1] * 3000)[:6000]),
        (2, [(i * i) % 4 for i in range(5000)]),
        (4, [(i * 7) % 16 for i in range(2000)]),
        (8, [(i * 13) % 256 for i in range(1500)]),
    ]:
        assert _lzw_decode(_lzw_encode(seq, mcs), mcs, len(seq)) == seq


def test_lzw_dictionary_caps_at_4096_codes():
    """A stream with far more than ~4070 novel substrings must roundtrip:
    encoder and decoder both freeze the dictionary at GIF's 12-bit cap
    (4096 codes) instead of assigning codes that width 12 cannot carry."""
    from yaml_pipe_spark.multimodal.binary import _LZW_MAX_CODES

    assert _LZW_MAX_CODES == 4096
    # pseudo-random bytes keep LZW match lengths short, so ~20k symbols
    # generate well over 4096 dictionary entries without the cap
    seq = [(i * 197 + (i * i) % 251 + (i // 7) * 31) % 256 for i in range(20000)]
    # confirm the stream really would overflow an uncapped dictionary
    d, w, novel = set(bytes([i]) for i in range(256)), b"", 0
    for px in seq:
        wk = w + bytes([px])
        if wk in d:
            w = wk
        else:
            d.add(wk)
            novel += 1
            w = bytes([px])
    assert 256 + 2 + novel > 4096
    assert _lzw_decode(_lzw_encode(seq, 8), 8, len(seq)) == seq


def test_build_gif_roundtrip_formulas():
    for doc_id in (0, 1, 7, 13, 55, 91, 255, 1000):
        w, h, idx, pal = decode_gif(build_gif(doc_id))
        assert (w, h) == (3 + doc_id % 13, 2 + doc_id % 7)
        assert idx == [
            (doc_id + r * 5 + c * 3) % 4
            for r in range(h)
            for c in range(w)
        ]
        for i in range(4):
            assert pal[3 * i : 3 * i + 3] == bytes(
                (
                    (doc_id + i * 17) % 256,
                    (doc_id * 2 + i * 29) % 256,
                    (doc_id * 3 + i * 41) % 256,
                )
            )


def test_decode_payload_dispatches_gif():
    w, h, nf, feat = decode_payload(build_gif(5), "image", real_decode=True)
    assert (w, h, nf) == (3 + 5 % 13, 2 + 5 % 7, 1)
    assert len(feat) == 8 and all(0.0 <= v <= 1.0 for v in feat)


def test_decode_gif_rejects_out_of_scope():
    # interlacing decodes for real since round 13 — flipping the flag on
    # a SEQUENTIAL stream now decodes (to a row-permuted raster); local
    # color tables stay the typed boundary
    g = bytearray(build_gif(3))
    idx = g.index(0x2C, 13)
    g[idx + 9] |= 0x80
    with pytest.raises(NotImplementedError, match="local color"):
        decode_gif(bytes(g))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF")


def test_gif_report_query_is_arrow_batched(spark):
    from yaml_pipe_spark.entrypoints import REGISTRY
    from tests.conftest import SF_SMALL

    df = REGISTRY["multimodal_gif_decode"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 0
    r = {x["item_id"]: x for x in rows}
    for item_id, row in list(r.items())[:5]:
        w, h = 3 + item_id % 13, 2 + item_id % 7
        assert (row["width"], row["height"]) == (w, h)
        assert row["n_pixels"] == w * h


def test_decode_gif_skips_extension_blocks():
    # splice a GIF89a graphic-control extension between the color table
    # and the image descriptor: the parser must skip it and decode the
    # same pixels
    g = build_gif(9)
    idx = g.index(0x2C, 13)  # image descriptor offset
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = b"GIF89a" + g[6:idx] + gce + g[idx:]
    assert decode_gif(spliced) == decode_gif(g)


def test_interlaced_gif_decodes_to_raster_order():
    """The interlaced corpus transmits rows in the four-pass order; the
    decode must scatter them back so indices equal the raster formula —
    and equal the NON-interlaced corpus's decode bit-for-bit."""
    from yaml_pipe_spark.multimodal.binary import (
        build_gif,
        build_gif_i,
        decode_gif,
    )

    for doc_id in (0, 1, 5, 12, 40, 91):
        w, h, idx, pal = decode_gif(build_gif_i(doc_id))
        assert idx == [
            (doc_id + r * 5 + c * 3) % 4
            for r in range(h)
            for c in range(w)
        ]
        assert (w, h, idx, pal) == decode_gif(build_gif(doc_id))


def test_interlace_flag_is_load_bearing():
    """Clearing the flag on an interlaced stream must change the decoded
    raster (same pixels, wrong rows) whenever the permutation is not the
    identity — the failure mode of a decoder that ignores the flag."""
    from yaml_pipe_spark.multimodal.binary import build_gif_i, decode_gif

    moved = 0
    for doc_id in (2, 3, 4, 5, 6):  # heights 4..8: non-trivial permutations
        payload = bytearray(build_gif_i(doc_id))
        # image descriptor: 0x2C at a fixed offset after the 12-byte GCT
        desc = payload.index(0x2C, 13 + 12)
        assert payload[desc + 9] == 0x40
        payload[desc + 9] = 0x00
        _, _, idx_flat, _ = decode_gif(bytes(payload))
        _, _, idx_ok, _ = decode_gif(build_gif_i(doc_id))
        moved += idx_flat != idx_ok
    assert moved == 5
