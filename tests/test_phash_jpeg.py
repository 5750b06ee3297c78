"""JPEG-payload perceptual hashing (round 11): the majority-crawl-format
twin of the BMP/PNG phash paths must round-trip through a REAL baseline
JPEG decode (Huffman, dequantize, zigzag, IDCT), reproduce the salted md5
gray formula exactly at every dHash sample, keep the corpus's banding
contract, and stay a distinct corpus from the BMP and PNG ones."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.multimodal.binary import decode_jpeg_gray
from yaml_pipe_spark.multimodal.phash import (
    JH,
    JW,
    _jpeg_target_gray,
    build_phash_bmp,
    build_phash_jpeg,
    build_phash_png,
    dhash_bands,
    dhash_bands_jpeg,
    dhash_bands_png,
)


def test_jpeg_decodes_to_the_generating_formula_at_every_sample():
    """decode_jpeg_gray must recover exactly the salted md5 gray at all 72
    dHash sample positions — the values the DuckDB oracle recomputes. The
    blocks' other 63 pixels carry md5-noise AC texture, so a decoder that
    shortcuts the AC path (or the IDCT, or DC prediction) shifts samples
    and fails here."""
    for doc_id in (0, 1, 2, 3, 17, 40, 121, 4000):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_jpeg_gray(build_phash_jpeg(doc_id))
        assert (w, h) == (JW, JH)
        for gy in range(8):
            for gx in range(9):
                want = _jpeg_target_gray(base, v, gx, gy)
                got = pix[(8 * gy) * w + 8 * gx]
                assert got == want, (doc_id, gx, gy, got, want)


def test_jpeg_blocks_are_not_flat():
    """The AC texture is live: within a block the decoded pixels vary, so
    the decode cannot pass by treating blocks as DC-only."""
    _, _, pix = decode_jpeg_gray(build_phash_jpeg(12))
    block = {pix[y * JW + x] for y in range(8) for x in range(8)}
    assert len(block) > 1


def test_jpeg_banding_contract_matches_bmp_structure():
    for base in range(25):
        b0 = dhash_bands_jpeg(build_phash_jpeg(4 * base))
        for v in range(1, 4):
            bv = dhash_bands_jpeg(build_phash_jpeg(4 * base + v))
            assert b0[:3] == bv[:3]


def test_jpeg_corpus_is_distinct_from_bmp_and_png_corpora():
    diff_bmp = sum(
        dhash_bands(build_phash_bmp(i))
        != dhash_bands_jpeg(build_phash_jpeg(i))
        for i in range(40)
    )
    diff_png = sum(
        dhash_bands_png(build_phash_png(i))
        != dhash_bands_jpeg(build_phash_jpeg(i))
        for i in range(40)
    )
    assert diff_bmp == 40 and diff_png == 40


def test_same_sampled_grays_hash_identically_across_formats():
    """Format independence at the hash layer: a JPEG whose sampled grays
    equal the BMP corpus's (empty salt) must band identically to the BMP —
    dHash sees only the 72 grid samples, and JPEG controls those exactly."""
    import yaml_pipe_spark.multimodal.phash as ph

    def jpeg_with_bmp_grays(doc_id: int) -> bytes:
        orig = ph._pixel_bytes
        try:
            ph._pixel_bytes = lambda b, p, salt="": orig(b, p, salt="")
            return build_phash_jpeg(doc_id)
        finally:
            ph._pixel_bytes = orig

    for doc_id in (0, 3, 9, 30):
        assert dhash_bands_jpeg(
            jpeg_with_bmp_grays(doc_id)
        ) == dhash_bands(build_phash_bmp(doc_id))


def test_decode_jpeg_scope_boundaries():
    with pytest.raises(ValueError):
        dhash_bands_jpeg(build_phash_bmp(5))
    # progressive (SOF2) decodes for real since round 12 — a BASELINE
    # stream merely relabeled SOF2 is malformed (its interleaved scan
    # claims Ss=0, Se=63, which no progressive scan may), not a scope gap
    payload = bytearray(build_phash_jpeg(0))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan must have Se = 0"):
        decode_jpeg_gray(bytes(payload))
    # successive approximation (Ah/Al) decodes for real since round 13 —
    # relabeling the third scan's point transform to Al=1 is now a LEGAL
    # first scan whose values land doubled: the stream still decodes, but
    # the pixels move (the refinement bits it now implies were never
    # sent). The remaining typed boundary is an approximation step wider
    # than one bit (Ah != Al + 1).
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_prog

    prog = bytearray(build_phash_jpeg_prog(0))
    last_sos = prog.rfind(b"\xff\xda")
    # SOS layout: FF DA, 2 length bytes, body [ns, cs, tsel, Ss, Se, AhAl]
    prog[last_sos + 9] = 0x01  # Al = 1
    _, _, pix_al1 = decode_jpeg_gray(bytes(prog))
    assert pix_al1 != decode_jpeg_gray(build_phash_jpeg_prog(0))[2]
    prog[last_sos + 9] = 0x30  # Ah=3, Al=0: a two-bit refinement step
    with pytest.raises(ValueError, match="refine exactly one bit"):
        decode_jpeg_gray(bytes(prog))
    # progressive COLOR decodes for real since round 13 (4:4:4 only) — a
    # BASELINE 4:4:4 stream relabeled SOF2 is malformed (its interleaved
    # scan claims Se=63, which no progressive scan may), not a scope gap
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_color

    color = bytearray(build_phash_jpeg_color(0))
    sofc = color.find(b"\xff\xc0")
    color[sofc + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan must have Se = 0"):
        decode_jpeg_gray(bytes(color))
    # SUBSAMPLED progressive stays the typed boundary (non-interleaved
    # data-unit geometry differs under subsampling)
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg420

    sub = bytearray(build_phash_jpeg420(0))
    sof420 = sub.find(b"\xff\xc0")
    sub[sof420 + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="1x1 sampling"):
        decode_jpeg_gray(bytes(sub))
    # a SAMPLED single-component frame (gray at 2x2) is not a supported
    # layout — only gray 1x1, YCbCr 4:4:4, and YCbCr 4:2:0 are in scope;
    # a 3-component claim with a 1-component table is malformed, not
    # out-of-scope
    payload = bytearray(build_phash_jpeg(0))
    payload[sof + 11] = 0x22  # component 0 sampling h=2,v=2
    with pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg_gray(bytes(payload))
    payload = bytearray(build_phash_jpeg(0))
    payload[sof + 9] = 3  # ncomp=3 but only one component's bytes follow
    with pytest.raises(ValueError, match="truncated SOF0"):
        decode_jpeg_gray(bytes(payload))


def test_decode_payload_sniffs_jpeg():
    from yaml_pipe_spark.multimodal.binary import decode_payload

    w, h, n_frames, feat = decode_payload(
        build_phash_jpeg(7), "image", real_decode=True
    )
    assert (w, h, n_frames) == (JW, JH, 1) and len(feat) == 8


def test_decode_jpeg_error_contract_is_valueerror():
    """Review-wave pins (round 11): corrupt streams surface as the module's
    ValueError parse contract, never raw KeyError/IndexError that no
    mapInPandas caller classifies."""
    # SOS referencing a Huffman table no DHT defined
    payload = bytearray(build_phash_jpeg(0))
    dht = payload.find(b"\xff\xc4")
    seg_len = int.from_bytes(payload[dht + 2 : dht + 4], "big")
    stripped = bytes(payload[:dht]) + bytes(payload[dht + 2 + seg_len :])
    with pytest.raises(ValueError, match="undefined Huffman table"):
        decode_jpeg_gray(stripped)
    # entropy segment cut off mid-scan
    truncated = bytes(payload[: len(payload) // 2])
    with pytest.raises(ValueError, match="truncated or corrupt"):
        decode_jpeg_gray(truncated)


def test_marker_walk_skips_fill_bytes_and_types_standalone_markers():
    """ADVICE r11: 0xFF fill padding before a marker is legal (T.81
    B.1.1.2) and must not desync the walk; standalone TEM/RSTn markers
    carry no length field and must surface as the typed scope boundary,
    not a garbage-length ValueError."""
    base = build_phash_jpeg(0)
    # inject two fill bytes before the first DQT marker — decode must
    # still round-trip to the exact same pixels
    dqt = base.find(b"\xff\xdb")
    padded = base[:dqt] + b"\xff\xff" + base[dqt:]
    assert decode_jpeg_gray(padded) == decode_jpeg_gray(base)
    # a standalone TEM marker in the header stream: typed boundary
    tem = base[:dqt] + b"\xff\x01" + base[dqt:]
    with pytest.raises(NotImplementedError, match="TEM/RSTn"):
        decode_jpeg_gray(tem)
    # RST0 likewise
    rst = base[:dqt] + b"\xff\xd0" + base[dqt:]
    with pytest.raises(NotImplementedError, match="TEM/RSTn"):
        decode_jpeg_gray(rst)


def test_color_jpeg_decodes_to_the_generating_formula():
    from yaml_pipe_spark.multimodal.phash import (
        _jpeg_target_gray,
        build_phash_jpeg_color,
    )

    for doc_id in (0, 2, 7, 21):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_jpeg_gray(build_phash_jpeg_color(doc_id))
        assert (w, h) == (JW, JH)
        for by in range(8):
            for bx in range(9):
                got = pix[(by * 8) * w + bx * 8]
                assert got == _jpeg_target_gray(base, v, bx, by, salt="jgc")


def test_color_chroma_blocks_are_load_bearing():
    """A decoder that skips (or mis-reads) chroma symbols must not survive:
    flipping one bit inside the entropy stream AFTER the first luma block
    (i.e. inside chroma territory) desyncs the interleave and corrupts or
    errors later samples."""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_color

    base = build_phash_jpeg_color(0)
    _, _, pix_ref = decode_jpeg_gray(base)
    sos = base.find(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(base[sos + 2 : sos + 4], "big")
    # sweep bit flips through the bytes right after luma block 0 (chroma
    # territory): a flip inside a chroma magnitude field keeps alignment
    # (and luma) intact — fine — but flips landing in chroma Huffman
    # CODES change the consumed bit count; at least one of them must
    # desync the interleave and corrupt (or error) the later luma
    affected = 0
    for off in range(3, 14):
        tgt = scan_start + off
        if base[tgt] == 0xFF or base[tgt + 1] == 0x00:
            continue  # don't un-stuff or fabricate markers
        for bit in (0x80, 0x10):
            mut = bytearray(base)
            mut[tgt] ^= bit
            if mut[tgt] == 0xFF:
                continue
            try:
                _, _, pix_mut = decode_jpeg_gray(bytes(mut))
                affected += pix_mut != pix_ref
            except (ValueError, NotImplementedError):
                affected += 1
    assert affected > 0


def test_color_jpeg_same_grays_hash_identically_to_bmp():
    """Cross-format property: a color JPEG whose luma formula matches the
    unsalted BMP grays must produce the IDENTICAL band words."""
    from yaml_pipe_spark.multimodal import phash as ph
    from yaml_pipe_spark.multimodal.phash import (
        build_phash_bmp,
        build_phash_jpeg_color,
        dhash_bands,
    )

    orig = ph._pixel_bytes
    try:
        ph._pixel_bytes = lambda b, p, salt="": orig(b, p, salt="")
        for doc_id in (0, 3, 9):
            assert dhash_bands_jpeg(
                build_phash_jpeg_color(doc_id, salt="")
            ) == dhash_bands(build_phash_bmp(doc_id))
    finally:
        ph._pixel_bytes = orig


def test_color_corpus_is_distinct_from_gray_jpeg_corpus():
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_color

    for doc_id in (0, 5, 11):
        a = dhash_bands_jpeg(build_phash_jpeg(doc_id))
        b = dhash_bands_jpeg(build_phash_jpeg_color(doc_id))
        assert a != b


def test_jpeg420_decodes_to_the_generating_formula():
    from yaml_pipe_spark.multimodal.phash import (
        JH4,
        JW4,
        _jpeg_target_gray,
        build_phash_jpeg420,
    )

    for doc_id in (0, 2, 7, 21):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_jpeg_gray(build_phash_jpeg420(doc_id))
        assert (w, h) == (JW4, JH4)
        for gy in range(8):
            for gx in range(9):
                got = pix[(16 * gy) * w + 16 * gx]
                assert got == _jpeg_target_gray(
                    base, v, gx, gy, salt="j42"
                ), (doc_id, gx, gy)


def test_jpeg420_luma_raster_order_is_load_bearing():
    """The four luma blocks share one DC prediction chain in 2x2 raster
    order: the filler DCs sit BETWEEN consecutive sample blocks, so a
    decoder that skipped fillers (or walked them out of order) would
    compute wrong sample DCs — pinned by the formula test above plus
    fillers being genuinely non-trivial here: flat filler values differ
    per block and per doc."""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg420

    _, _, pix = decode_jpeg_gray(build_phash_jpeg420(0))
    # filler block (0,1) of MCU (0,0) is flat at its md5 target
    block = {pix[y * 144 + x] for y in range(8) for x in range(8, 16)}
    assert len(block) == 1
    other = {pix[y * 144 + x] for y in range(8) for x in range(24, 32)}
    assert block != other  # different MCU's filler, different value


def test_jpeg420_banding_and_distinctness():
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg420

    for base in range(10):
        b0 = dhash_bands_jpeg(build_phash_jpeg420(4 * base))
        for v in range(1, 4):
            bv = dhash_bands_jpeg(build_phash_jpeg420(4 * base + v))
            assert b0[:3] == bv[:3]
    diff = sum(
        dhash_bands_jpeg(build_phash_jpeg420(i))
        != dhash_bands_jpeg(build_phash_jpeg(i))
        for i in range(20)
    )
    assert diff == 20


def test_jpeg_sampling_boundaries_are_typed():
    """4:2:2 decodes for real since round 13 — the remaining sampling
    boundaries (4:1:1, 4:4:0, ...) stay typed errors."""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg420

    for bad in (0x41, 0x12):  # 4:1:1 luma h=4,v=1; 4:4:0 luma h=1,v=2
        payload = bytearray(build_phash_jpeg420(0))
        sof = payload.find(b"\xff\xc0")
        payload[sof + 11] = bad
        with pytest.raises(NotImplementedError, match="subsampling"):
            decode_jpeg_gray(bytes(payload))


def test_jpeg422_decodes_to_the_generating_formula():
    from yaml_pipe_spark.multimodal.phash import (
        JH2,
        JW2,
        _jpeg_target_gray,
        build_phash_jpeg422,
    )

    for doc_id in (0, 2, 7, 21, 40):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_jpeg_gray(build_phash_jpeg422(doc_id))
        assert (w, h) == (JW2, JH2)
        for gy in range(8):
            for gx in range(9):
                got = pix[(8 * gy) * w + 16 * gx]
                assert got == _jpeg_target_gray(
                    base, v, gx, gy, salt="j22"
                ), (doc_id, gx, gy)


def test_jpeg422_luma_pair_and_chroma_are_load_bearing():
    """The right-hand (noise) luma block shares the DC prediction chain
    and the chroma blocks keep the bitstream aligned — truncating or
    corrupting entropy bytes mid-stream must change decoded samples or
    error, never silently decode the same image."""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg422

    base = build_phash_jpeg422(0)
    _, _, pix_ref = decode_jpeg_gray(base)
    sos = base.find(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(base[sos + 2 : sos + 4], "big")
    affected = 0
    for off in range(0, 16):
        tgt = scan_start + off
        if base[tgt] == 0xFF or base[tgt + 1] == 0x00:
            continue
        for bit in (0x80, 0x08):
            mut = bytearray(base)
            mut[tgt] ^= bit
            if mut[tgt] == 0xFF:
                continue
            try:
                _, _, pix_mut = decode_jpeg_gray(bytes(mut))
                affected += pix_mut != pix_ref
            except (ValueError, NotImplementedError):
                affected += 1
    assert affected > 0


def test_jpeg422_banding_and_distinctness():
    from yaml_pipe_spark.multimodal.phash import (
        build_phash_jpeg420,
        build_phash_jpeg422,
    )

    for base in range(10):
        b0 = dhash_bands_jpeg(build_phash_jpeg422(4 * base))
        for v in range(1, 4):
            bv = dhash_bands_jpeg(build_phash_jpeg422(4 * base + v))
            assert b0[:3] == bv[:3]
    diff = sum(
        dhash_bands_jpeg(build_phash_jpeg422(i))
        != dhash_bands_jpeg(build_phash_jpeg420(i))
        for i in range(20)
    )
    assert diff == 20


def test_progressive_decodes_to_the_generating_formula():
    from yaml_pipe_spark.multimodal.phash import (
        _jpeg_target_gray,
        build_phash_jpeg_prog,
    )

    for doc_id in (0, 2, 7, 21, 40):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_jpeg_gray(build_phash_jpeg_prog(doc_id))
        assert (w, h) == (JW, JH)
        for gy in range(8):
            for gx in range(9):
                got = pix[(8 * gy) * w + 8 * gx]
                assert got == _jpeg_target_gray(
                    base, v, gx, gy, salt="jpr"
                ), (doc_id, gx, gy)


def test_progressive_eob_runs_are_load_bearing():
    """The third scan is dominated by multi-block EOB runs; corrupting
    ONE extra bit of an EOBn symbol shifts the run length by a block,
    desyncing every later block in the band — decoded samples change or
    the stream errors. Sweep flips through the third scan's bytes until
    one lands in an EOBn extra-bit field."""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_prog

    base = build_phash_jpeg_prog(0)
    _, _, pix_ref = decode_jpeg_gray(base)
    third_sos = base.rfind(b"\xff\xda")
    scan_start = third_sos + 2 + int.from_bytes(
        base[third_sos + 2 : third_sos + 4], "big"
    )
    affected = 0
    for off in range(0, 12):
        tgt = scan_start + off
        if base[tgt] == 0xFF or base[tgt + 1] == 0x00:
            continue
        for bit in (0x80, 0x08):
            mut = bytearray(base)
            mut[tgt] ^= bit
            if mut[tgt] == 0xFF:
                continue
            try:
                _, _, pix_mut = decode_jpeg_gray(bytes(mut))
                affected += pix_mut != pix_ref
            except (ValueError, NotImplementedError):
                affected += 1
    assert affected > 0


def test_progressive_banding_and_distinctness():
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_prog

    for base in range(10):
        b0 = dhash_bands_jpeg(build_phash_jpeg_prog(4 * base))
        for v in range(1, 4):
            bv = dhash_bands_jpeg(build_phash_jpeg_prog(4 * base + v))
            assert b0[:3] == bv[:3]
    diff = sum(
        dhash_bands_jpeg(build_phash_jpeg_prog(i))
        != dhash_bands_jpeg(build_phash_jpeg(i))
        for i in range(20)
    )
    assert diff == 20


def test_restart_interval_decodes_to_the_generating_formula():
    from yaml_pipe_spark.multimodal.phash import (
        _jpeg_target_gray,
        build_phash_jpeg_rst,
    )

    for doc_id in (0, 2, 7, 21, 40):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_jpeg_gray(build_phash_jpeg_rst(doc_id))
        assert (w, h) == (JW, JH)
        for gy in range(8):
            for gx in range(9):
                got = pix[(8 * gy) * w + 8 * gx]
                assert got == _jpeg_target_gray(
                    base, v, gx, gy, salt="jrt"
                ), (doc_id, gx, gy)


def test_restart_markers_are_sequence_checked_and_reset_dc():
    """An out-of-sequence RST marker fails typed (lost entropy data must
    not decode as garbage), and the per-interval DC reset is load-bearing
    (the exact formula test above would fail without it — additionally
    pin that dropping a marker entirely errors rather than desyncs)."""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_rst

    base = build_phash_jpeg_rst(0)
    # find the first restart marker and bump its cyclic number
    sos = base.find(b"\xff\xda")
    idx = base.find(b"\xff\xd0", sos)
    assert idx > 0
    mut = bytearray(base)
    mut[idx + 1] = 0xD1  # RST1 where RST0 is due
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg_gray(bytes(mut))
    # excising the marker pair entirely: the next interval's bits arrive
    # where the marker was expected -> typed error
    cut = base[:idx] + base[idx + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg_gray(cut)


def test_restart_corpus_banding_and_distinctness():
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_rst

    for b in range(8):
        b0 = dhash_bands_jpeg(build_phash_jpeg_rst(4 * b))
        for v in range(1, 4):
            bv = dhash_bands_jpeg(build_phash_jpeg_rst(4 * b + v))
            assert b0[:3] == bv[:3]
    diff = sum(
        dhash_bands_jpeg(build_phash_jpeg_rst(i))
        != dhash_bands_jpeg(build_phash_jpeg(i))
        for i in range(20)
    )
    assert diff == 20


def test_sa_progressive_decodes_to_the_generating_formula():
    from yaml_pipe_spark.multimodal.phash import (
        _jpeg_target_gray,
        build_phash_jpeg_sa,
    )

    for doc_id in (0, 2, 7, 21, 40):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_jpeg_gray(build_phash_jpeg_sa(doc_id))
        assert (w, h) == (JW, JH)
        for gy in range(8):
            for gx in range(9):
                got = pix[(8 * gy) * w + 8 * gx]
                assert got == _jpeg_target_gray(
                    base, v, gx, gy, salt="jsa"
                ), (doc_id, gx, gy)


def test_sa_refinement_scans_are_load_bearing():
    """The last two scans only carry one bit per coefficient — but
    dropping them (truncating after the AC first scan) must change the
    decoded samples, i.e. the refinement bits are live data, not
    padding. Also sweep single-bit flips through the refinement scan: a
    flipped correction/run bit desyncs every later symbol, so decoded
    pixels change or the stream errors."""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_sa

    base = build_phash_jpeg_sa(0)
    _, _, pix_ref = decode_jpeg_gray(base)
    # truncate: keep scans 1-3, then EOI — decode must differ
    fourth_sos = base.rfind(b"\xff\xda")
    trunc = base[:fourth_sos] + b"\xff\xd9"
    _, _, pix_trunc = decode_jpeg_gray(trunc)
    assert pix_trunc != pix_ref
    # bit-flip sweep through the refinement scan's entropy bytes
    scan_start = fourth_sos + 2 + int.from_bytes(
        base[fourth_sos + 2 : fourth_sos + 4], "big"
    )
    affected = 0
    for off in range(0, 12):
        tgt = scan_start + off
        if base[tgt] == 0xFF or base[tgt + 1] == 0x00:
            continue
        for bit in (0x80, 0x08):
            mut = bytearray(base)
            mut[tgt] ^= bit
            if mut[tgt] == 0xFF:
                continue
            try:
                _, _, pix_mut = decode_jpeg_gray(bytes(mut))
                affected += pix_mut != pix_ref
            except (ValueError, NotImplementedError):
                affected += 1
    assert affected > 0


def test_sa_banding_and_distinctness():
    from yaml_pipe_spark.multimodal.phash import (
        build_phash_jpeg_prog,
        build_phash_jpeg_sa,
    )

    for base in range(10):
        b0 = dhash_bands_jpeg(build_phash_jpeg_sa(4 * base))
        for v in range(1, 4):
            bv = dhash_bands_jpeg(build_phash_jpeg_sa(4 * base + v))
            assert b0[:3] == bv[:3]
    diff = sum(
        dhash_bands_jpeg(build_phash_jpeg_sa(i))
        != dhash_bands_jpeg(build_phash_jpeg_prog(i))
        for i in range(20)
    )
    assert diff == 20


def test_sa_scan_structure_is_exercised():
    """The corpus must actually contain the constructs the decoder
    claims to handle: |v|==1 sites (newly-nonzero in refinement, absent
    from the Al=1 first scan), |v|>=2 sites (correction bits), and a
    mix of blocks with/without zz39 (EOB runs in BOTH AC scans)."""
    from yaml_pipe_spark.multimodal.phash import _jpeg_ac

    n_new = n_hist = 0
    for base in range(10):
        for bx in range(9):
            for by in range(8):
                a10, a14, _ = _jpeg_ac(base, bx, by, prefix="jsaac")
                for a in (a10, a14):
                    if abs(a) == 1:
                        n_new += 1
                    else:
                        n_hist += 1
    assert n_new > 50 and n_hist > 500


def test_sa_malformed_ahal_is_typed():
    """Ah must equal Al+1 in a refinement scan — anything else is a
    corrupt stream and must fail typed, not decode garbage."""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_sa

    base = build_phash_jpeg_sa(0)
    # second SOS is the DC refinement (Ah=1, Al=0): corrupt Ah to 2
    first_sos = base.find(b"\xff\xda")
    second_sos = base.find(b"\xff\xda", first_sos + 2)
    # FF DA (2) + length (2) + ns(1) + comp(2) + Ss(1) + Se(1) -> AhAl
    ahal_off = second_sos + 9
    assert base[ahal_off] == 0x10
    mut = bytearray(base)
    mut[ahal_off] = 0x20
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(mut))


def test_progressive_color_decodes_to_the_generating_formula():
    from yaml_pipe_spark.multimodal.phash import (
        _jpeg_target_gray,
        build_phash_jpeg_pc,
    )

    for doc_id in (0, 2, 7, 21, 40):
        base, v = doc_id // 4, doc_id % 4
        w, h, pix = decode_jpeg_gray(build_phash_jpeg_pc(doc_id))
        assert (w, h) == (JW, JH)
        for gy in range(8):
            for gx in range(9):
                got = pix[(8 * gy) * w + 8 * gx]
                assert got == _jpeg_target_gray(
                    base, v, gx, gy, salt="jp3"
                ), (doc_id, gx, gy)


def test_progressive_color_dc_interleave_is_load_bearing():
    """The interleaved DC scan couples the chroma prediction chains to
    the luma bitstream: a flipped bit in the FIRST scan's entropy bytes
    (which lands in a Y or chroma diff with ~equal odds) must change
    decoded luma or error — a decoder that skipped chroma data units
    would desync immediately. (Per-component AC scans are self-contained
    between markers by design — that part of progressive is inherently
    skippable, the DC interleave is not.)"""
    from yaml_pipe_spark.multimodal.phash import build_phash_jpeg_pc

    base = build_phash_jpeg_pc(0)
    _, _, pix_ref = decode_jpeg_gray(base)
    first_sos = base.find(b"\xff\xda")
    scan_start = first_sos + 2 + int.from_bytes(
        base[first_sos + 2 : first_sos + 4], "big"
    )
    affected = 0
    for off in range(0, 12):
        tgt = scan_start + off
        if base[tgt] == 0xFF or base[tgt + 1] == 0x00:
            continue
        for bit in (0x80, 0x08):
            mut = bytearray(base)
            mut[tgt] ^= bit
            if mut[tgt] == 0xFF:
                continue
            try:
                _, _, pix_mut = decode_jpeg_gray(bytes(mut))
                affected += pix_mut != pix_ref
            except (ValueError, NotImplementedError):
                affected += 1
    assert affected > 0
    # interleaved AC scans are rejected typed: claim ns=3 on an AC band
    mut = bytearray(base)
    second_sos = base.find(b"\xff\xda", first_sos + 2)
    # splice a 3-component AC SOS header in place of the 1-component one
    body = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 1, 63, 0x00])
    mut2 = (
        bytes(mut[:second_sos])
        + b"\xff\xda" + (len(body) + 2).to_bytes(2, "big") + body
        + bytes(mut[second_sos + 12 :])
    )
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg_gray(mut2)


def test_progressive_color_banding_and_distinctness():
    from yaml_pipe_spark.multimodal.phash import (
        build_phash_jpeg_pc,
        build_phash_jpeg_prog,
    )

    for base in range(10):
        b0 = dhash_bands_jpeg(build_phash_jpeg_pc(4 * base))
        for v in range(1, 4):
            bv = dhash_bands_jpeg(build_phash_jpeg_pc(4 * base + v))
            assert b0[:3] == bv[:3]
    diff = sum(
        dhash_bands_jpeg(build_phash_jpeg_pc(i))
        != dhash_bands_jpeg(build_phash_jpeg_prog(i))
        for i in range(20)
    )
    assert diff == 20
