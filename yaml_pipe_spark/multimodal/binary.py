"""Multimodal column plumbing: binary payloads + typed metadata, processed
through Arrow-batched mapInPandas.

North-star requirement: treat image/audio/video as opaque `binary` columns
with typed metadata, and make the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) real and tested while the actual codec work is
stubbed — the decode libraries (PIL/torchaudio/ffmpeg) are not in this
container. `decode_payload(real_decode=True)` is the marked extension point;
the default is a deterministic fake derived from the payload bytes so tests
and oracles are stable.

Scale notes: payloads travel as Arrow binary batches (zero-copy into
pandas); per-batch vectorized feature extraction; partition by modality so
per-modality pipelines prune at the scan.
"""

from __future__ import annotations

import hashlib
from bisect import bisect_left as _bisect_left
from typing import Iterator

import numpy as _np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "item_id long, modality string, n_bytes long, payload_sha string, "
    "width int, height int, n_frames int, feat array<float>"
)


def synthetic_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake corpus: payload bytes derived from item_id."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"]
            rows = {
                "item_id": ids,
                "modality": [
                    ["image", "audio", "video"][int(i) % 3] for i in ids
                ],
                "payload": [
                    hashlib.sha256(str(i).encode()).digest()
                    * (1 + int(i) % 7)
                    for i in ids
                ],
                "meta": [{"origin": f"synthetic/{int(i)}"} for i in ids],
            }
            yield pd.DataFrame(rows)

    # bound the partition count for small synthetic corpora: spark.range
    # defaults to defaultParallelism partitions, and each partition costs a
    # Python-worker round trip in mapInPandas — 32 workers for 300 rows is
    # all overhead (real corpora size partitions by payload bytes instead)
    n_parts = max(1, min(8, n // 64))
    return spark.range(n, numPartitions=n_parts).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_bmp(payload: bytes):
    """Real uncompressed-BMP decode, stdlib only: header fields per the
    BITMAPINFOHEADER layout (Windows BMP spec), pixel data at the declared
    offset. Returns (width, height, 1, first-8-pixel-byte features)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise NotImplementedError("compressed BMP not supported")
    pixels = payload[data_off:]
    feat = [b / 255.0 for b in pixels[:8]]
    return abs(width), abs(height), 1, feat


def _decode_ppm(payload: bytes):
    """Real binary-PPM (P6) decode: ASCII header 'P6\\n<w> <h>\\n<maxval>\\n'
    then raw RGB bytes."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts: list[int] = []
    i = 2
    while len(parts) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    width, height, _maxval = parts
    pixels = payload[i + 1 :]
    feat = [b / 255.0 for b in pixels[:8]]
    return width, height, 1, feat


def _decode_wav(payload: bytes):
    """Real WAV decode via the stdlib `wave` module: returns
    (framerate, n_channels, n_frames, first-8-PCM-byte features). Width and
    height carry the audio analogue dims (sample rate / channel count) so
    the one FEATURE_SCHEMA fits every modality."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_frames = w.getnframes()
        pcm = w.readframes(min(8, n_frames))
        return (
            w.getframerate(),
            w.getnchannels(),
            n_frames,
            [b / 255.0 for b in pcm[:8]],
        )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk; lengths/CRC per the PNG spec
    layout (4-byte big-endian length, 4-byte type, data, 4-byte CRC)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = 8
    while i + 8 <= len(payload):
        ln = int.from_bytes(payload[i : i + 4], "big")
        typ = payload[i + 4 : i + 8]
        yield typ, payload[i + 8 : i + 8 + ln]
        i += 12 + ln


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 interlace pass grid (PNG spec 8.2): (x_start, y_start, x_step,
# y_step) per pass; each pass is an independently filtered sub-image and
# passes whose sub-image is empty contribute no scanlines at all.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter_lines(raw, pos, width, height, bpp):
    """Unfilter `height` scanlines of a (sub-)image `width` pixels wide
    starting at byte `pos` of the inflated stream: all five PNG filter
    types, with the previous-row predictor starting at zero (each Adam7
    pass restarts its own filter chain). Returns (rows, next_pos)."""
    stride = bpp * width
    rows = []
    prev = bytearray(stride)
    for _r in range(height):
        if pos >= len(raw) or pos + 1 + stride > len(raw):
            raise ValueError("PNG scanline data has wrong length")
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for c in range(bpp, stride):
                line[c] = (line[c] + line[c - bpp]) & 0xFF
        elif ft == 2:  # Up
            for c in range(stride):
                line[c] = (line[c] + prev[c]) & 0xFF
        elif ft == 3:  # Average
            for c in range(stride):
                a = line[c - bpp] if c >= bpp else 0
                line[c] = (line[c] + ((a + prev[c]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for c in range(stride):
                a = line[c - bpp] if c >= bpp else 0
                cc = prev[c - bpp] if c >= bpp else 0
                line[c] = (line[c] + _paeth(a, prev[c], cc)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        rows.append(line)
        prev = line
    return rows, pos


def decode_png(payload: bytes):
    """REAL stdlib PNG decode for 8-bit RGB (color type 2), sequential OR
    Adam7 interlaced: chunk walk -> concat IDAT -> zlib inflate -> per-
    scanline unfiltering with all five PNG filter types (None/Sub/Up/
    Average/Paeth, bpp=3). Interlaced streams carry seven independently
    filtered sub-images (empty passes omitted entirely) whose pixels
    scatter back onto the (x_start + i*x_step, y_start + j*y_step) grid.
    Returns (width, height, decoded_pixel_bytes) where the pixel stream
    is row-major RGB. Anything else (palette, alpha, 16-bit) raises —
    that is the cluster-side codec extension point."""
    import zlib

    ihdr = None
    idat = b""
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if bit_depth != 8 or color_type != 2 or interlace not in (0, 1):
        raise NotImplementedError(
            "only 8-bit RGB PNG (sequential or Adam7) is stdlib-scope"
        )
    raw = zlib.decompress(idat)
    if interlace == 0:
        if len(raw) != h * (1 + 3 * w):
            raise ValueError("PNG scanline data has wrong length")
        rows, _pos = _png_unfilter_lines(raw, 0, w, h, 3)
        out = bytearray()
        for line in rows:
            out += line
        return w, h, bytes(out)
    out = bytearray(3 * w * h)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rows, pos = _png_unfilter_lines(raw, pos, pw, ph, 3)
        for ri, line in enumerate(rows):
            y = y0 + ri * dy
            for ci in range(pw):
                o = 3 * (y * w + x0 + ci * dx)
                out[o : o + 3] = line[3 * ci : 3 * ci + 3]
    if pos != len(raw):
        raise ValueError("PNG scanline data has wrong length")
    return w, h, bytes(out)


# ---------------------------------------------------------------------------
# Baseline JPEG (the majority format of a real image crawl). Stdlib scope:
# sequential DCT, 8-bit, single (grayscale) component, no subsampling, no
# restart intervals. Progressive (SOF2), arithmetic coding, multi-component
# YCbCr and chroma subsampling are the cluster-side codec extension point —
# the same boundary decode_png draws at interlacing (reference analog: the
# unstructured-parse dispatch surface, yamlpipe/components/sources.py:92-93).
# ---------------------------------------------------------------------------

# zigzag scan order: stream index -> (row, col) in the 8x8 coefficient grid
_JPEG_ZIGZAG: list[tuple[int, int]] = []
_r, _c = 0, 0
for _i in range(64):
    _JPEG_ZIGZAG.append((_r, _c))
    if (_r + _c) % 2 == 0:  # moving up-right
        if _c == 7:
            _r += 1
        elif _r == 0:
            _c += 1
        else:
            _r -= 1
            _c += 1
    else:  # moving down-left
        if _r == 7:
            _c += 1
        elif _c == 0:
            _r += 1
        else:
            _r += 1
            _c -= 1
del _r, _c, _i

# IDCT basis: _JPEG_COS[u][x] = cos((2x+1) * u * pi / 16)
import math as _math

_JPEG_COS = [
    [_math.cos((2 * x + 1) * u * _math.pi / 16) for x in range(8)]
    for u in range(8)
]
_JPEG_C = [1.0 / _math.sqrt(2.0)] + [1.0] * 7

_JPEG_BASIS_CACHE: dict[tuple[int, int], list[float]] = {}


def _jpeg_basis(u: int, v: int) -> list[float]:
    """64-sample (y-major) IDCT basis plane for coefficient (u, v),
    normalization (C(u)C(v)/4) folded in; cached — 64 planes total."""
    plane = _JPEG_BASIS_CACHE.get((u, v))
    if plane is None:
        cu, cv = _JPEG_C[u], _JPEG_C[v]
        plane = [
            cu * cv * _JPEG_COS[u][x] * _JPEG_COS[v][y] / 4.0
            for y in range(8)
            for x in range(8)
        ]
        _JPEG_BASIS_CACHE[(u, v)] = plane
    return plane


# the same 64 planes as float64 ndarrays, indexed row-major (8*v + u):
# `acc += f * plane` is then ONE vectorized multiply-add per nonzero
# coefficient with bit-identical IEEE-754 results (elementwise double
# multiply then add, no FMA — numpy does not fuse), instead of a 64-term
# Python list comprehension
_JPEG_BASIS_NP: list = [None] * 64


def _jpeg_basis_np(u: int, v: int):
    plane = _JPEG_BASIS_NP[8 * v + u]
    if plane is None:
        plane = _np.asarray(_jpeg_basis(u, v), dtype=_np.float64)
        _JPEG_BASIS_NP[8 * v + u] = plane
    return plane


# row-major (8*v + u) list of all 64 planes, filled eagerly (4096 cos
# products — negligible at import, saves a None-check per block)
_JPEG_BASIS_ROW = [_jpeg_basis_np(i & 7, i >> 3) for i in range(64)]


def _jpeg_block_out(acc, ox: int, oy: int, w: int, h: int, out2d) -> None:
    """Level-shift, round (half-even, same as Python round()), clamp and
    scatter one IDCT'd 8x8 block into the output plane, cropping at the
    image boundary exactly like the per-pixel walk did."""
    ch = min(8, h - oy)
    cw = min(8, w - ox)
    if ch <= 0 or cw <= 0:
        return
    # in-place ufunc calls (rint/+=/maximum/minimum) skip the np.clip
    # dispatch stack — worth ~35% of this function on 8x8 blocks; the
    # values are exact small integers in float64 throughout, so the final
    # uint8 cast is exact and the rounding is still rint's half-even
    # (identical to Python round())
    _np.rint(acc, out=acc)
    acc += 128.0
    _np.maximum(acc, 0.0, out=acc)
    _np.minimum(acc, 255.0, out=acc)
    block = acc.astype(_np.uint8).reshape(8, 8)
    out2d[oy : oy + ch, ox : ox + cw] = block[:ch, :cw]


class _HuffTable(dict):
    """(length, code) -> symbol dict plus a 16-bit-prefix lookup table.

    `lut[prefix16]` = (symbol << 5) | code_length, 0 = no code is a
    prefix of these 16 bits. Shorter codes are written LAST in the build
    so that, on a corrupt DHT whose code ranges overlap, the shortest
    match wins — exactly the order the one-bit-at-a-time probe resolves
    them."""

    __slots__ = ("lut",)


_JPEG_HUFF_CACHE: dict[bytes, "_HuffTable"] = {}


def _jpeg_huff_table(bits: bytes, vals: bytes) -> "_HuffTable":
    """Canonical Huffman per ITU T.81 C.2: `bits[l-1]` codes of length l,
    codes assigned in increasing order, left-shifted at each length step.
    Keyed by (length, code); a prefix LUT rides along so the bit-reader
    resolves a whole symbol per probe instead of one bit at a time.
    Cached by table content — a corpus reuses a handful of DHT bodies
    across millions of files, so the 64 Ki LUT is built once per shape."""
    key = bytes(bits) + b"\x00" + bytes(vals)
    cached = _JPEG_HUFF_CACHE.get(key)
    if cached is not None:
        return cached
    table = _HuffTable()
    code, k = 0, 0
    entries: list[tuple[int, int, int]] = []
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            entries.append((length, code, vals[k]))
            k += 1
            code += 1
        code <<= 1
    lut = _np.zeros(1 << 16, dtype=_np.int32)
    # longest first: later (shorter) writes win overlapping ranges, the
    # same precedence as probing lengths 1..16 in increasing order
    for length, c, sym in sorted(entries, key=lambda e: -e[0]):
        if c >= (1 << length):
            continue  # overflowed canonical code: unreachable by a real probe
        start = c << (16 - length)
        lut[start : start + (1 << (16 - length))] = (sym << 5) | length
    table.lut = lut
    if len(_JPEG_HUFF_CACHE) < 256:
        _JPEG_HUFF_CACHE[key] = table
    return table


class _JpegBitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at a real marker.

    The segment is pre-scanned once (fast `bytes.find` hops between 0xFF
    sites) into an unstuffed buffer; bits are then served from a rolling
    integer accumulator and whole Huffman symbols resolve through the
    table's 16-bit-prefix LUT — one probe per symbol instead of one dict
    probe per bit. Observable semantics are UNCHANGED from the one-bit
    walk: all data bits before a marker are readable, the first bit that
    would come from a marker byte raises the same ValueError, running off
    the end of the payload (or into a truncated trailing 0xFF, whose bits
    the one-bit walk never served either) raises IndexError for the
    caller's truncated-stream contract, and `pos`/`bit`/`resume_pos`
    report the identical original-stream positions."""

    __slots__ = (
        "data", "_start", "_u", "_nu", "_stuffed", "_stop_marker",
        "_acc", "_an", "_bi",
    )

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self._seek(pos, 0)

    def _seek(self, pos: int, bit: int) -> None:
        """(Re)prescan from original position `pos`: unstuff 0xFF00 up to
        the first real marker / end of data, then consume `bit` bits."""
        data = self.data
        n = len(data)
        chunks: list[bytes] = []
        stuffed: list[int] = []  # unstuffed indices that were stuffed 0xFFs
        count = 0
        p = pos
        stop_marker = False
        while True:
            q = data.find(b"\xff", p)
            if q == -1:
                chunks.append(data[p:])
                break
            chunks.append(data[p:q])
            count += q - p
            if q + 1 < n and data[q + 1] == 0x00:
                chunks.append(b"\xff")
                stuffed.append(count)
                count += 1
                p = q + 2
                continue
            # real marker — or a trailing 0xFF whose companion byte the
            # one-bit walk would IndexError on before serving its bits
            stop_marker = q + 1 < n
            break
        self._start = pos
        self._u = b"".join(chunks)
        self._nu = len(self._u)
        self._stuffed = stuffed
        self._stop_marker = stop_marker
        self._acc = 0
        self._an = 0
        self._bi = 0
        for _ in range(bit):
            self.read_bit()

    def _stop_error(self) -> Exception:
        if self._stop_marker:
            return ValueError("hit a marker inside entropy data")
        return IndexError("JPEG entropy segment exhausted")

    def _orig(self, i: int) -> int:
        """Original-stream position of unstuffed byte i (i == len is the
        stop position): start + i data bytes + one extra per stuffed 0xFF
        among the first i unstuffed bytes."""
        return self._start + i + _bisect_left(self._stuffed, i)

    @property
    def pos(self) -> int:
        consumed = 8 * self._bi - self._an
        return self._orig(consumed >> 3)

    @pos.setter
    def pos(self, value: int) -> None:
        self._seek(value, 0)

    @property
    def bit(self) -> int:
        return (8 * self._bi - self._an) & 7

    @bit.setter
    def bit(self, value: int) -> None:
        if value != self.bit:
            self._seek(self.pos, value)

    def read_bit(self) -> int:
        an = self._an
        if an == 0:
            bi = self._bi
            if bi >= self._nu:
                raise self._stop_error()
            self._acc = self._u[bi]
            self._bi = bi + 1
            an = 8
        an -= 1
        self._an = an
        b = (self._acc >> an) & 1
        self._acc &= (1 << an) - 1
        return b

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        lut = getattr(table, "lut", None)
        if lut is None:  # plain dict (hand-built): probe a bit at a time
            length, code = 0, 0
            while length < 16:
                code = (code << 1) | self.read_bit()
                length += 1
                sym = table.get((length, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code in JPEG stream")
        acc, an, bi = self._acc, self._an, self._bi
        u, nu = self._u, self._nu
        while an < 16 and bi < nu:
            acc = (acc << 8) | u[bi]
            bi += 1
            an += 8
        key = (acc >> (an - 16)) if an >= 16 else (acc << (16 - an))
        e = int(lut[key & 0xFFFF])
        length = e & 31
        if length and length <= an:
            an -= length
            self._acc = acc & ((1 << an) - 1)
            self._an = an
            self._bi = bi
            return e >> 5
        if an >= 16:
            raise ValueError("invalid Huffman code in JPEG stream")
        raise self._stop_error()

    def receive(self, t: int) -> int:
        """t raw magnitude bits, no sign extension (EOB-run lengths)."""
        if t == 0:
            return 0
        acc, an, bi = self._acc, self._an, self._bi
        u, nu = self._u, self._nu
        while an < t:
            if bi >= nu:
                raise self._stop_error()
            acc = (acc << 8) | u[bi]
            bi += 1
            an += 8
        an -= t
        self._acc = acc & ((1 << an) - 1)
        self._an = an
        self._bi = bi
        return acc >> an

    def receive_extend(self, t: int) -> int:
        """T.81 F.2.2.1: read t magnitude bits, sign-extend (EXTEND)."""
        if t == 0:
            return 0
        v = self.receive(t)
        return v if v >= (1 << (t - 1)) else v - (1 << t) + 1

    def resume_pos(self) -> int:
        """First byte position after the current (partially consumed)
        byte — hands control back to the marker walk between the scans
        of a progressive stream (remaining bits are 1-padding)."""
        consumed = 8 * self._bi - self._an
        i, b = consumed >> 3, consumed & 7
        return self._orig(i if b == 0 else i + 1)


def decode_jpeg_gray(payload: bytes):
    """REAL baseline-JPEG decode -> (w, h, row-major gray bytes): marker
    walk (SOI/APP/DQT/SOF0/DHT/SOS), canonical Huffman tables from the
    file's own DHT segments, per-block DC prediction + (run,size) AC
    run-length decode with 0xFF00 unstuffing, dequantization, dezigzag,
    full 64-term float IDCT, +128 level shift, clamp. Scope: sequential
    8-bit single-component (grayscale), three-component YCbCr 4:4:4, or
    three-component YCbCr 4:2:0 (luma 2x2 / chroma 1x1 — the dominant
    crawl layout) interleaved scans, no restart markers — anything else
    (4:2:2, progressive, ...) raises NotImplementedError (the codec
    extension point). Color output is the BT.601 gray conversion, which
    for YCbCr input IS the Y plane: chroma blocks are fully
    entropy-decoded (per-component DC prediction and Huffman tables —
    required to advance the bitstream) and their pixel planes, which
    gray output never reads, are not materialized."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    w = h = None
    frame_comps: list[tuple[int, int]] | None = None  # (component id, tq)
    scan_sel: dict[int, tuple[int, int]] = {}  # id -> (dc table, ac table)
    progressive = False
    prog_coefs: list[list[int]] | None = None  # per block, by zigzag index
    prog_scans = 0
    restart_interval = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them so a legally-padded file doesn't desync
        # the walk into a garbage segment length (ADVICE r11)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG marker segment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone markers with NO length field
            # (T.81 B.1.1.3); parsing a segment length from their payload
            # would desync. RSTn is legal only INSIDE an entropy segment
            # (the MCU loop consumes it there); in the header stream both
            # are out of scope.
            raise NotImplementedError(
                "standalone TEM/RSTn marker in header stream is not "
                "supported (RSTn belongs inside entropy data)"
            )
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                qt[tq] = list(seg[o + 1 : o + 65])
                o += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            if seg[5] not in (1, 3):
                raise NotImplementedError(
                    "only 1-component (gray) or 3-component (YCbCr) "
                    "frames are stdlib-scope"
                )
            if len(seg) < 6 + 3 * seg[5]:
                raise ValueError("truncated SOF0 component table")
            samplings = tuple(seg[7 + 3 * ci] for ci in range(seg[5]))
            # supported layouts: grayscale, YCbCr 4:4:4 (all 1x1), YCbCr
            # 4:2:0 (luma 2x2, chroma 1x1 — the dominant crawl layout),
            # and YCbCr 4:2:2 (luma 2x1 — the video-derived layout);
            # anything else (4:1:1, 4:4:0, ...) stays the typed codec
            # boundary
            if samplings not in (
                (0x11,),
                (0x11,) * 3,
                (0x22, 0x11, 0x11),
                (0x21, 0x11, 0x11),
            ):
                raise NotImplementedError(
                    "chroma subsampling layout not supported "
                    "(4:4:4, 4:2:0 and 4:2:2 only)"
                )
            if progressive and samplings != (0x11,) * seg[5]:
                raise NotImplementedError(
                    "progressive decode requires 1x1 sampling (grayscale "
                    "or 4:4:4 color); subsampled progressive needs the "
                    "cluster-side codec (non-interleaved data-unit "
                    "geometry differs under subsampling)"
                )
            frame_comps = []
            for ci in range(seg[5]):
                frame_comps.append(
                    (
                        seg[6 + 3 * ci],
                        seg[8 + 3 * ci],
                        seg[7 + 3 * ci] >> 4,
                        seg[7 + 3 * ci] & 15,
                    )
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline (SOF0) or spectral-selection progressive "
                "(SOF2) JPEG is stdlib-scope"
            )
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = seg[o + 1 : o + 17]
                n = sum(bits)
                vals = seg[o + 17 : o + 17 + n]
                huff[(tc, th)] = _jpeg_huff_table(bits, vals)
                o += 17 + n
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if progressive:
                if restart_interval:
                    raise NotImplementedError(
                        "restart intervals inside progressive scans are "
                        "not supported"
                    )
                if frame_comps is None or w is None:
                    raise ValueError("JPEG missing SOF0/SOS/DQT")
                if prog_coefs is None:
                    nb = ((w + 7) // 8) * ((h + 7) // 8)
                    prog_coefs = {
                        ci: [[0] * 64 for _ in range(nb)]
                        for ci in range(len(frame_comps))
                    }
                comp_of = {
                    fc[0]: idx for idx, fc in enumerate(frame_comps)
                }
                try:
                    pos = _decode_prog_scan(
                        payload, pos + 2 + seg_len, seg, huff,
                        prog_coefs, comp_of,
                    )
                except IndexError as e:
                    raise ValueError(
                        "truncated or corrupt JPEG entropy stream"
                    ) from e
                prog_scans += 1
                continue
            if frame_comps is None or seg[0] != len(frame_comps):
                raise NotImplementedError(
                    "scan component count must match the frame "
                    "(single-scan interleaved baseline only)"
                )
            for si in range(seg[0]):
                cs = seg[1 + 2 * si]
                scan_sel[cs] = (seg[2 + 2 * si] >> 4, seg[2 + 2 * si] & 15)
            pos = pos + 2 + seg_len
            break
        pos = pos + 2 + seg_len
    if progressive:
        if prog_coefs is None or prog_scans == 0 or frame_comps is None:
            raise ValueError("progressive JPEG carries no scan")
        tq = frame_comps[0][1]
        if tq not in qt:
            raise ValueError("JPEG missing SOF0/SOS/DQT")
        q = qt[tq]
        nbx = (w + 7) // 8
        out = bytearray(w * h)
        out2d = _np.frombuffer(out, dtype=_np.uint8).reshape(h, w)
        # gray output = the BT.601 luma = component 0 (Y); chroma
        # components were fully entropy-decoded (their scans are
        # self-contained, but the interleaved DC scan required their
        # prediction chains to advance the bitstream) and their pixel
        # planes, which gray output never reads, are not materialized
        for bi, vals in enumerate(prog_coefs[0]):
            _idct_block_to_out(
                vals, q, bi % nbx, bi // nbx, w, h, out2d
            )
        return w, h, bytes(out)
    if w is None or not scan_sel or frame_comps is None:
        raise ValueError("JPEG missing SOF0/SOS/DQT")
    comps = []
    for order, (cid, tq, hs, vs) in enumerate(frame_comps):
        if cid not in scan_sel:
            raise ValueError("JPEG SOS is missing a frame component")
        if tq not in qt:
            raise ValueError("JPEG missing SOF0/SOS/DQT")
        dc_sel, ac_sel = scan_sel[cid]
        if (0, dc_sel) not in huff or (1, ac_sel) not in huff:
            raise ValueError("JPEG SOS references an undefined Huffman table")
        comps.append(
            {
                "q": qt[tq],
                "dc": huff[(0, dc_sel)],
                "ac": huff[(1, ac_sel)],
                "pred": 0,
                "h": hs,
                "v": vs,
                # gray output = the BT.601 luma, which IS component 0 (Y)
                "emit": order == 0,
            }
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    rd = _JpegBitReader(payload, pos)
    nmx = (w + 8 * hmax - 1) // (8 * hmax)
    nmy = (h + 8 * vmax - 1) // (8 * vmax)
    out = bytearray(w * h)
    out2d = _np.frombuffer(out, dtype=_np.uint8).reshape(h, w)
    try:
        _decode_jpeg_mcus(
            rd, nmx, nmy, w, h, hmax, vmax, comps, out2d, restart_interval
        )
    except IndexError as e:
        # a truncated entropy segment (read past the buffer) or a corrupt
        # (run,size) stream (zigzag index past 63) must surface as the
        # module's parse-error contract, not a raw IndexError that no
        # caller classifies
        raise ValueError("truncated or corrupt JPEG entropy stream") from e
    return w, h, bytes(out)


def _decode_prog_scan(payload, pos, seg, huff, coefs_by_comp, comp_of):
    """One progressive scan (T.81 G.2): spectral selection AND successive
    approximation, grayscale or 4:4:4 color. DC scans (Ss=Se=0) may be
    INTERLEAVED over up to all frame components — at 1x1 sampling an MCU
    is one data unit per scan component, each with its own Huffman
    selector and prediction chain, so a dropped chroma symbol desyncs
    every later luma DC. AC scans are NON-INTERLEAVED by the standard
    (ns must be 1; the scan's component selector picks whose blocks, in
    raster order). The FIRST DC scan (Ah=0) is baseline DC coding of the
    point-transformed values (stored << Al); a DC REFINEMENT scan
    (Ah = Al+1) reads one raw bit per data unit and ORs it in at bit Al.
    A FIRST AC scan decodes a zigzag band [Ss..Se] with END-OF-BAND RUNS
    — symbol (r<<4)|0, r<15 means 2^r + receive(r) consecutive blocks
    have no more coefficients in this band — values stored << Al. An AC
    REFINEMENT scan (Ah = Al+1) interleaves three bit kinds (T.81
    G.1.2.3 / figure G.7): (run,1) symbols placing newly-nonzero +-1<<Al
    coefficients (run counts ZERO-HISTORY positions only), one
    CORRECTION bit per already-nonzero coefficient passed (increase
    magnitude by 1<<Al iff set), and EOB runs whose covered blocks still
    consume correction bits for their nonzero band positions.
    Coefficients accumulate into `coefs_by_comp` (per component, per
    block, by zigzag index, still quantized, at full precision once
    every scan has run); the caller IDCTs the emit component once at
    EOI. Returns the position of the next marker after the entropy
    segment."""
    ns = seg[0]
    if ns < 1 or len(seg) < 4 + 2 * ns:
        raise ValueError("truncated progressive SOS segment")
    sels = []
    for si in range(ns):
        cs = seg[1 + 2 * si]
        if cs not in comp_of:
            raise ValueError(
                "progressive scan references an unknown frame component"
            )
        sels.append(
            (comp_of[cs], seg[2 + 2 * si] >> 4, seg[2 + 2 * si] & 15)
        )
    off = 1 + 2 * ns
    ss, se = seg[off], seg[off + 1]
    ah, al = seg[off + 2] >> 4, seg[off + 2] & 15
    if ah != 0 and ah != al + 1:
        raise ValueError(
            "successive-approximation scan must refine exactly one bit "
            "(Ah = Al + 1)"
        )
    rd = _JpegBitReader(payload, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        n_units = len(coefs_by_comp[sels[0][0]])
        if ah == 0:
            tabs = []
            for ci, dc_sel, _ac in sels:
                if (0, dc_sel) not in huff:
                    raise ValueError(
                        "JPEG SOS references an undefined Huffman table"
                    )
                tabs.append((ci, huff[(0, dc_sel)]))
            preds = {ci: 0 for ci, _dc, _ac in sels}
            for bi in range(n_units):
                for ci, dc_tab in tabs:
                    t = rd.decode_symbol(dc_tab)
                    preds[ci] += rd.receive_extend(t)
                    coefs_by_comp[ci][bi][0] = preds[ci] << al
        else:
            # DC refinement: one raw bit per data unit, no Huffman table
            # — |= works on negatives because Python ints are two's
            # complement with infinite sign extension, same as the
            # fixed-width arithmetic the spec assumes
            p1 = 1 << al
            for bi in range(n_units):
                for ci, _dc, _ac in sels:
                    if rd.read_bit():
                        coefs_by_comp[ci][bi][0] |= p1
    elif ah == 0:
        if ns != 1:
            raise ValueError(
                "progressive AC scans must be non-interleaved (T.81 G.1)"
            )
        _ci, _dc_sel, ac_sel = sels[0]
        coefs = coefs_by_comp[_ci]
        if not (1 <= ss <= se <= 63):
            raise ValueError("progressive AC scan band out of range")
        if (1, ac_sel) not in huff:
            raise ValueError("JPEG SOS references an undefined Huffman table")
        ac_tab = huff[(1, ac_sel)]
        eobrun = 0
        for vals in coefs:
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = rd.decode_symbol(ac_tab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:  # ZRL: sixteen zeros
                        k += 16
                        continue
                    # EOBn: this block plus 2^r - 1 + receive(r) more
                    eobrun = (1 << r) - 1 + rd.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError(
                        "truncated or corrupt JPEG entropy stream"
                    )
                vals[k] = rd.receive_extend(s) << al
                k += 1
    else:
        if ns != 1:
            raise ValueError(
                "progressive AC scans must be non-interleaved (T.81 G.1)"
            )
        _ci, _dc_sel, ac_sel = sels[0]
        if not (1 <= ss <= se <= 63):
            raise ValueError("progressive AC scan band out of range")
        if (1, ac_sel) not in huff:
            raise ValueError("JPEG SOS references an undefined Huffman table")
        _refine_ac_scan(
            rd, coefs_by_comp[_ci], ss, se, al, huff[(1, ac_sel)]
        )
    # hand back to the marker walk: skip the padding bits, then any 0xFF
    # fill bytes before the next marker (T.81 B.1.1.2)
    p = rd.resume_pos()
    while p + 1 < len(payload) and not (
        payload[p] == 0xFF and payload[p + 1] not in (0x00, 0xFF)
    ):
        p += 1
    return p


def _refine_ac_scan(rd, coefs, ss, se, al, ac_tab):
    """AC successive-approximation refinement (T.81 figure G.7): per
    block, symbols (r<<4)|1 place newly-nonzero coefficients (value
    +-1<<Al, sign from the next raw bit; r counts only positions whose
    coefficient HISTORY is still zero), ZRL skips sixteen zero-history
    positions, and EOBn covers this block's remainder plus whole
    following blocks. Every already-nonzero coefficient the walk passes
    — including inside ZRL stretches and EOB-run blocks — consumes one
    CORRECTION bit: if set and bit Al of the magnitude is still clear,
    the magnitude grows by 1<<Al (away from zero). A decoder that skips
    one correction bit desyncs every later symbol."""
    p1 = 1 << al
    m1 = -p1
    eobrun = 0
    for vals in coefs:
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = rd.decode_symbol(ac_tab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) + rd.receive(r)
                        break
                    newval = 0  # ZRL: sixteen zero-history positions
                elif s == 1:
                    newval = p1 if rd.read_bit() else m1
                else:
                    raise ValueError(
                        "corrupt successive-approximation AC scan"
                    )
                while k <= se:
                    if vals[k] != 0:
                        if rd.read_bit() and (vals[k] & p1) == 0:
                            vals[k] += p1 if vals[k] >= 0 else m1
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if newval and k <= se:
                    vals[k] = newval
                k += 1
        if eobrun > 0:
            # remainder of this block (and, on later iterations, whole
            # blocks inside the run): correction bits only
            while k <= se:
                if vals[k] != 0:
                    if rd.read_bit() and (vals[k] & p1) == 0:
                        vals[k] += p1 if vals[k] >= 0 else m1
                k += 1
            eobrun -= 1


def _idct_block_to_out(vals, q, bx, by, w, h, out2d):
    """Dequantize one block's zigzag-indexed coefficient values and IDCT
    them into the output plane — the same sparse basis-plane accumulation
    (and accumulation ORDER: ascending zigzag index) the one-term-per-
    list-comprehension walk used, now one vectorized multiply-add per
    nonzero coefficient."""
    acc = _np.zeros(64, dtype=_np.float64)
    for zz, v in enumerate(vals):
        if v:
            zr, zc = _JPEG_ZIGZAG[zz]
            acc += (v * q[zz]) * _jpeg_basis_np(zc, zr)
    _jpeg_block_out(acc, bx * 8, by * 8, w, h, out2d)


def _consume_restart(rd, expected: int) -> None:
    """Byte-align and consume the RSTm marker that ends a restart
    interval (T.81 E.1.2): markers are cyclic D0..D7 and arriving out of
    sequence means entropy data was lost — fail typed rather than
    decoding garbage."""
    p = rd.resume_pos()
    data = rd.data
    while p + 1 < len(data) and data[p] == 0xFF and data[p + 1] == 0xFF:
        p += 1  # fill bytes before the marker are legal
    if (
        p + 1 >= len(data)
        or data[p] != 0xFF
        or not (0xD0 <= data[p + 1] <= 0xD7)
    ):
        raise ValueError("expected a restart marker at interval boundary")
    if data[p + 1] - 0xD0 != expected:
        raise ValueError("restart marker out of sequence")
    rd.pos = p + 2
    rd.bit = 0


def _decode_jpeg_mcus(
    rd, nmx, nmy, w, h, hmax, vmax, comps, out2d, restart_interval=0
):
    """Interleaved MCU loop (T.81 A.2.3): per MCU each component decodes
    its h x v sampling-factor blocks in raster order — one block each at
    4:4:4 / grayscale, four luma + one Cb + one Cr at 4:2:0 — each
    component with its own quant table, Huffman pair, and DC predictor.
    Only the emit component (Y, full resolution by construction since
    its sampling equals hmax x vmax in every supported layout)
    materializes pixels; the others are entropy-decoded to keep the
    bitstream aligned. With a DRI interval, every `restart_interval`
    MCUs the loop consumes the cyclic RSTm marker and resets every DC
    prediction chain (what makes corrupted segments locally recoverable
    on a real crawl)."""
    mcu_idx = 0
    rst_n = 0
    for my in range(nmy):
        for mx in range(nmx):
            if (
                restart_interval
                and mcu_idx
                and mcu_idx % restart_interval == 0
            ):
                _consume_restart(rd, rst_n)
                rst_n = (rst_n + 1) & 7
                for comp in comps:
                    comp["pred"] = 0
            mcu_idx += 1
            for comp in comps:
                q, dc_tab, ac_tab = comp["q"], comp["dc"], comp["ac"]
                emit = comp["emit"]
                for bv in range(comp["v"]):
                    for bu in range(comp["h"]):
                        # nonzero (row-major index, dequantized value)
                        # sites, collected in zigzag decode order and
                        # sorted to the row-major ORDER the original
                        # coefficient-grid walk accumulated in
                        nz = [] if emit else None
                        t = rd.decode_symbol(dc_tab)
                        comp["pred"] += rd.receive_extend(t)
                        if emit and comp["pred"]:
                            nz.append((0, comp["pred"] * q[0]))
                        k = 1
                        while k < 64:
                            rs = rd.decode_symbol(ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            val = rd.receive_extend(s)
                            if emit:
                                zr, zc = _JPEG_ZIGZAG[k]
                                nz.append((8 * zr + zc, val * q[k]))
                            k += 1
                        if not emit:
                            continue
                        # accumulate per NON-ZERO coefficient over a
                        # precomputed 64-sample basis plane (y-major),
                        # one vectorized multiply-add per plane in
                        # ascending row-major order — the identical
                        # IEEE-754 operation sequence as the original
                        # per-element walk
                        acc = _np.zeros(64, dtype=_np.float64)
                        nz.sort()
                        for idx, f in nz:
                            acc += f * _JPEG_BASIS_ROW[idx]
                        oy = my * 8 * vmax + bv * 8
                        ox = mx * 8 * hmax + bu * 8
                        _jpeg_block_out(acc, ox, oy, w, h, out2d)


def _decode_jpeg_features(payload: bytes):
    """decode_payload-shaped adapter: (width, height, 1, first-8-decoded-
    gray-byte features)."""
    w, h, pix = decode_jpeg_gray(payload)
    return w, h, 1, [b / 255.0 for b in pix[:8]]


def _decode_png_features(payload: bytes):
    """decode_payload-shaped adapter: (width, height, 1, first-8-decoded-
    pixel-byte features)."""
    w, h, pix = decode_png(payload)
    return w, h, 1, [b / 255.0 for b in pix[:8]]


def decode_payload(payload: bytes, modality: str, real_decode: bool = False):
    """Payload decode. The real path handles the stdlib-decodable container
    formats — uncompressed BMP, binary PPM, non-interlaced 8-bit RGB PNG,
    single-frame GIF, PCM WAV, baseline grayscale / YCbCr-4:4:4 /
    YCbCr-4:2:0 JPEG — by magic-byte sniffing; everything else
    (progressive or 4:2:2 JPEG, MP3, MP4...) still
    raises: that is where PIL/torchaudio/ffmpeg plug in on a real cluster. The fake path derives stable
    pseudo-dimensions and features from the bytes themselves
    (deterministic, oracle-friendly)."""
    if real_decode:
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:8] == _PNG_SIG:
            return _decode_png_features(payload)
        if payload[:6] in _GIF_SIGS:
            return _decode_gif_features(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav(payload)
        if payload[:2] == b"\xff\xd8":
            return _decode_jpeg_features(payload)
        raise NotImplementedError(
            "real decode for this format requires codec libraries "
            "(PIL/torchaudio/ffmpeg) not present in this container; install "
            "them on the cluster and extend the sniffer here"
        )
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    n_frames = 1 if modality != "video" else 1 + digest[2] % 120
    feat = [b / 255.0 for b in digest[:8]]
    return width, height, n_frames, feat


def extract_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.
    The UDF signature and batch shape are the production contract; only the
    decode body is stubbed."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "item_id": pdf["item_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len),
                "payload_sha": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
            decoded = [
                decode_payload(p, m, real_decode)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["n_frames"] = [d[2] for d in decoded]
            out["feat"] = [d[3] for d in decoded]
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: explode frame indices 0, n, 2n, ...
    (from the decoded frame count). Pure DataFrame op over the feature
    output — the explode pattern is what a real frame extractor feeds."""
    vids = df.filter(F.col("modality") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return vids.select(
        "item_id", F.explode(idx).alias("frame_idx"), "n_frames"
    )


def resize_stub(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: records target dims; the byte transform is the
    cluster-side extension point (same mapInPandas shape as
    extract_features)."""
    return df.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of an uncompressed 24-bit BMP, stdlib
    only — a complete valid BMP comes back out. Sampling runs in IMAGE
    space (BMP rows are stored bottom-up, so stored row r is image row
    h-1-r on both sides); a resize that ignored the flip would sample the
    wrong rows, which the oracle's first-pixel check catches."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w0 = int.from_bytes(payload[18:22], "little", signed=True)
    h0 = int.from_bytes(payload[22:26], "little", signed=True)
    if int.from_bytes(payload[30:34], "little") != 0:
        raise NotImplementedError("compressed BMP not supported")
    w0, h0 = abs(w0), abs(h0)
    src_stride = ((3 * w0 + 3) // 4) * 4
    dst_stride = ((3 * width + 3) // 4) * 4
    src = payload[data_off:]
    out = bytearray(dst_stride * height)
    for y_t in range(height):
        y_s = y_t * h0 // height
        srow = (h0 - 1 - y_s) * src_stride
        drow = (height - 1 - y_t) * dst_stride
        for x_t in range(width):
            x_s = x_t * w0 // width
            s = srow + 3 * x_s
            d = drow + 3 * x_t
            out[d : d + 3] = src[s : s + 3]
    npix = len(out)
    header = (
        b"BM"
        + (54 + npix).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + npix.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + bytes(out)


def resize_media(
    df: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Resize every decodable image payload in place (same Arrow
    mapInPandas shape as extract_features): BMP payloads go through the
    real resize_bmp; other formats pass through untouched (their resize is
    the cluster-side codec extension point)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = [
                resize_bmp(p, width, height)
                if p is not None and p[:2] == b"BM"
                else p
                for p in pdf["payload"]
            ]
            yield pdf

    return df.mapInPandas(run, MEDIA_SCHEMA)


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """REAL nearest-neighbor resample of an 8-bit mono PCM WAV, stdlib
    only — a complete valid WAV at `target_rate` comes back out. Output
    length m = max(1, n * target_rate // source_rate); output sample k
    copies source sample k * source_rate // target_rate (the same floor
    mapping the image resizer uses in time instead of space)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 1 or w.getnchannels() != 1:
            raise NotImplementedError("only 8-bit mono PCM is stdlib-scope")
        r0 = w.getframerate()
        n = w.getnframes()
        data = w.readframes(n)
    if n == 0:  # a valid zero-frame WAV resamples to zero frames
        out = b""
    else:
        m = max(1, (n * target_rate) // r0)
        out = bytes(data[(k * r0) // target_rate] for k in range(m))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(target_rate)
        w.writeframes(out)
    return buf.getvalue()


def resample_media(df: DataFrame, target_rate: int = 4000) -> DataFrame:
    """Resample every decodable audio payload in place (same Arrow
    mapInPandas shape as extract_features): RIFF/WAVE payloads go through
    the real resample_wav; other formats pass through untouched (their
    resample is the cluster-side codec extension point). A WAV outside
    resample_wav's stdlib scope (16-bit, stereo, truncated, …) also
    passes through unchanged — one odd payload must not fail the whole
    Spark task."""
    import wave as _wave

    def _maybe_resample(p):
        if p is None or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return p
        try:
            return resample_wav(p, target_rate)
        except (
            NotImplementedError,  # documented non-stdlib scope
            _wave.Error,          # malformed header
            EOFError,             # header truncated mid-field
            IndexError,           # data chunk shorter than its declared size
            ZeroDivisionError,    # crafted fmt chunk with framerate 0
            ValueError,           # other stdlib-parse rejections
        ):
            return p

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = [_maybe_resample(p) for p in pdf["payload"]]
            yield pdf

    return df.mapInPandas(run, MEDIA_SCHEMA)


def build_bmp(doc_id: int) -> bytes:
    """A complete, valid 24-bit uncompressed BMP built byte-by-byte:
    width = 2 + doc_id % 14, height = 1 + doc_id % 9, pixel-array byte k
    (padding included) = (doc_id + k) % 256. Every derived quantity is a
    pure integer formula, so an external SQL engine can recompute the
    decoder's outputs (size/width/height/first-pixel-byte) exactly."""
    w = 2 + doc_id % 14
    h = 1 + doc_id % 9
    row = ((3 * w + 3) // 4) * 4  # 4-byte aligned rows, BMP spec
    npix = row * h
    size = 54 + npix
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # pixel data offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + npix.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI x/y
        + (0).to_bytes(4, "little") * 2  # palette
    )
    pixels = bytes((doc_id + k) % 256 for k in range(npix))
    return header + pixels


def build_wav(doc_id: int) -> bytes:
    """A valid 8-bit mono PCM WAV via the stdlib `wave` writer:
    framerate = 8000 + (doc_id % 8) * 1000, n_frames = 16 + doc_id % 50,
    sample byte k = (doc_id * 3 + k) % 256. File size is the standard
    44-byte PCM header + n_frames bytes."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000 + (doc_id % 8) * 1000)
        n = 16 + doc_id % 50
        w.writeframes(bytes((doc_id * 3 + k) % 256 for k in range(n)))
    return buf.getvalue()


def build_png(doc_id: int) -> bytes:
    """A complete, valid non-interlaced 8-bit RGB PNG built from integer
    formulas: width = 2 + doc_id % 14, height = 1 + doc_id % 9, DECODED
    pixel byte at row r, byte-column c is (doc_id + r*31 + c*7) % 256.
    Scanline r is encoded with filter type r % 5, so a corpus of these
    exercises ALL five PNG filters (None/Sub/Up/Average/Paeth) and any
    unfiltering bug corrupts the recomputable pixel formulas."""
    import zlib

    w = 2 + doc_id % 14
    h = 1 + doc_id % 9
    stride, bpp = 3 * w, 3
    raw = bytearray()
    prev = bytes(stride)
    for r in range(h):
        line = bytes((doc_id + r * 31 + c * 7) % 256 for c in range(stride))
        ft = r % 5
        filtered = bytearray(stride)
        for c in range(stride):
            a = line[c - bpp] if c >= bpp else 0
            b = prev[c]
            cc = prev[c - bpp] if c >= bpp else 0
            if ft == 0:
                v = line[c]
            elif ft == 1:
                v = line[c] - a
            elif ft == 2:
                v = line[c] - b
            elif ft == 3:
                v = line[c] - ((a + b) >> 1)
            else:
                v = line[c] - _paeth(a, b, cc)
            filtered[c] = v & 0xFF
        raw.append(ft)
        raw += filtered
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_media_from_documents(docs: DataFrame) -> DataFrame:
    """One build_png payload per document row, through the same Arrow
    mapInPandas ingest shape as real_media_from_documents."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "item_id": ids,
                    "modality": ["image"] * len(ids),
                    "payload": [build_png(int(i)) for i in ids],
                    "meta": [{"origin": f"documents/{int(i)}"} for i in ids],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


PNG_REPORT_SCHEMA = (
    "item_id long, width int, height int, n_bytes_decoded long, "
    "sum_pixels long, feat_byte0 long, sum_first8 long"
)


def png_decode_report(df: DataFrame) -> DataFrame:
    """Executor-side real PNG decode audit: every payload goes through the
    full inflate+unfilter path and the report carries whole-image decoded
    quantities (sum over EVERY pixel byte, not just a prefix), so a
    single wrong byte anywhere in any scanline changes the output. Same
    Arrow mapInPandas batch contract as extract_features."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                w, h, pix = decode_png(payload)
                rows.append(
                    {
                        "item_id": int(item_id),
                        "width": w,
                        "height": h,
                        "n_bytes_decoded": len(pix),
                        "sum_pixels": sum(pix),
                        "feat_byte0": pix[0],
                        "sum_first8": sum(pix[:8]),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, PNG_REPORT_SCHEMA)


def real_media_from_documents(docs: DataFrame) -> DataFrame:
    """Real container files keyed to `documents`: even doc_id -> BMP image,
    odd doc_id -> WAV audio, both built byte-by-byte from integer formulas
    (build_bmp/build_wav) so the REAL decoders' outputs are recomputable by
    an external SQL engine. Construction runs in the same Arrow mapInPandas
    shape as any source-side media ingest."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "item_id": ids,
                    "modality": [
                        "image" if i % 2 == 0 else "audio" for i in ids
                    ],
                    "payload": [
                        build_bmp(int(i)) if i % 2 == 0 else build_wav(int(i))
                        for i in ids
                    ],
                    "meta": [{"origin": f"documents/{int(i)}"} for i in ids],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media corpus keyed to the `documents` table: payload is
    the UTF-8 bytes of `repeat(str(doc_id), 1 + doc_id % 7)`.

    The payload happens to be ASCII so an external SQL engine can recompute
    `sha256(payload)` (DuckDB's sha256 only accepts VARCHAR) — which makes
    the *whole decode path* oracle-checkable end-to-end, not just rows>0.
    The Spark side still treats it as an opaque `binary` column through the
    same Arrow mapInPandas contract as any real image/audio/video payload.

    Scale: payload construction is a narrow Catalyst projection on the
    documents scan — no Python until the decode UDF itself.
    """
    return docs.select(
        F.col("doc_id").cast("long").alias("item_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(
            F.repeat(F.col("doc_id").cast("string"), (F.col("doc_id") % 7 + 1).cast("int")),
            "UTF-8",
        ).alias("payload"),
        F.create_map(
            F.lit("origin"), F.concat(F.lit("documents/"), F.col("doc_id"))
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# REAL stdlib GIF decode: a from-scratch GIF-variant LZW codec (variable
# code width, clear/EOI, giflib's width-growth arithmetic — the decoder is
# validated against a published real-world GIF LZW stream in
# tests/test_gif_decode.py), plus minimal GIF87a container parsing.
# Animated / interlaced / local-color-table GIFs stay behind the documented
# codec extension point, like the other real decoders here.
# ---------------------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# GIF codes are at most 12 bits wide: once the dictionary holds 4096 entries
# no further codes are assignable (giflib's LZ_MAX_CODE). Encoder and decoder
# both freeze the dictionary at this size (giflib's deferred-clear behavior);
# without the cap a stream with >~4070 novel substrings would be assigned
# codes >= 4096 that cannot be represented at width 12.
_LZW_MAX_CODES = 4096


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """GIF-variant LZW compress of palette indices, LSB-first bit packing.
    Width grows after the emit where the next-assignable code reaches the
    current width capacity (giflib EGifCompressOutput arithmetic)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out_bits: list[tuple[int, int]] = []
    width = mcs + 1
    max1 = 1 << width
    avail = eoi + 1
    d: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}

    def emit(code: int) -> None:
        nonlocal width, max1
        out_bits.append((code, width))
        if avail >= max1 and width < 12:
            width += 1
            max1 <<= 1

    emit(clear)
    w = bytes([indices[0]])
    for px in indices[1:]:
        wk = w + bytes([px])
        if wk in d:
            w = wk
        else:
            emit(d[w])
            if avail < _LZW_MAX_CODES:  # dictionary frozen at the 12-bit cap
                d[wk] = avail
                avail += 1
            w = bytes([px])
    emit(d[w])
    emit(eoi)
    buf, acc, nb = bytearray(), 0, 0
    for code, wd in out_bits:
        acc |= code << nb
        nb += wd
        while nb >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> list[int]:
    """GIF-variant LZW decompress. The read-tick counter and `> max1`
    widen rule mirror giflib's DGifDecompressInput (the one-code lag
    between encoder dictionary adds and decoder reads is what the strict
    inequality absorbs)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = 0
    width = mcs + 1
    max1 = 1 << width
    a = eoi + 1

    def read() -> int:
        nonlocal pos, a, width, max1
        v, got = 0, 0
        p = pos
        while got < width:
            byte = data[p >> 3]
            take = min(8 - (p & 7), width - got)
            v |= ((byte >> (p & 7)) & ((1 << take) - 1)) << got
            got += take
            p += take
        pos = p
        a += 1
        if a > max1 and width < 12:
            max1 <<= 1
            width += 1
        return v

    table: list[bytes | None] = [
        bytes([i]) for i in range(1 << mcs)
    ] + [None, None]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_expected:
        code = read()
        if code == clear:
            width = mcs + 1
            max1 = 1 << width
            a = eoi + 1
            table = [bytes([i]) for i in range(1 << mcs)] + [None, None]
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code} (table size {len(table)})")
        out += entry
        if prev is not None and len(table) < _LZW_MAX_CODES:
            table.append(prev + entry[:1])  # mirror the encoder's 12-bit cap
        prev = entry
    return list(out)


def build_gif(doc_id: int) -> bytes:
    """A complete, valid single-frame GIF87a built from integer formulas:
    width = 3 + doc_id % 13, height = 2 + doc_id % 7, 4-color global
    palette where color i = ((doc_id + i*17) % 256, (doc_id*2 + i*29) % 256,
    (doc_id*3 + i*41) % 256), pixel index at (row r, col c) =
    (doc_id + r*5 + c*3) % 4 — every decoded quantity is recomputable by
    an external SQL engine. The index stream goes through the real LZW
    compressor, so decoding exercises the full variable-width codec."""
    w = 3 + doc_id % 13
    h = 2 + doc_id % 7
    palette = b"".join(
        bytes(
            (
                (doc_id + i * 17) % 256,
                (doc_id * 2 + i * 29) % 256,
                (doc_id * 3 + i * 41) % 256,
            )
        )
        for i in range(4)
    )
    indices = [
        (doc_id + r * 5 + c * 3) % 4 for r in range(h) for c in range(w)
    ]
    lzw = _lzw_encode(indices, 2)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks.append(len(part))
        blocks += part
    blocks.append(0)  # block terminator
    return (
        b"GIF87a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x81, 0, 0])  # GCT present, 2-bit, bg 0, no aspect
        + palette
        + b"\x2c"  # image descriptor
        + (0).to_bytes(2, "little") * 2
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + b"\x00"  # no local color table, not interlaced
        + bytes([2])  # LZW minimum code size
        + bytes(blocks)
        + b"\x3b"  # trailer
    )


def _gif_interlace_order(h: int) -> list[int]:
    """GIF89a appendix E row-transmission order: four passes — every 8th
    row from 0, every 8th from 4, every 4th from 2, every 2nd from 1."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def decode_gif(payload: bytes):
    """REAL stdlib GIF decode for single-frame GIF87a/89a with a global
    color table, sequential OR interlaced: parses the logical screen
    descriptor and image descriptor, concatenates the data sub-blocks,
    runs the real variable-width LZW decompressor, and — when the image
    descriptor's interlace flag is set — re-orders the transmitted rows
    through the four-pass GIF89a grid back to raster order. Returns
    (width, height, indices, palette_rgb_bytes) with indices in RASTER
    order. Extensions (0x21 blocks) are skipped; animation and local
    color tables raise — that is the cluster-side codec extension
    point."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_size = 2 << (packed & 0x07)
    i = 13
    palette = payload[i : i + 3 * gct_size]
    i += 3 * gct_size
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:
            break
        elif b == 0x3B:
            raise ValueError("GIF trailer before any image")
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    iw = int.from_bytes(payload[i + 5 : i + 7], "little")
    ih = int.from_bytes(payload[i + 7 : i + 9], "little")
    ipacked = payload[i + 9]
    if ipacked & 0x80:
        raise NotImplementedError("local color tables are not stdlib-scope")
    interlaced = bool(ipacked & 0x40)
    i += 10
    mcs = payload[i]
    i += 1
    data = bytearray()
    while payload[i] != 0:
        n = payload[i]
        data += payload[i + 1 : i + 1 + n]
        i += 1 + n
    indices = _lzw_decode(bytes(data), mcs, iw * ih)
    if len(indices) != iw * ih:
        raise ValueError("GIF pixel data has wrong length")
    if interlaced:
        # transmitted row ti carries raster row order[ti] — scatter back
        out: list[list[int] | None] = [None] * ih
        for ti, r in enumerate(_gif_interlace_order(ih)):
            out[r] = indices[ti * iw : (ti + 1) * iw]
        indices = [v for row in out for v in row]
    return iw, ih, indices, palette


def _decode_gif_features(payload: bytes):
    """decode_payload contract: (width, height, n_frames, feat) where feat
    is the first 8 palette-expanded RGB bytes scaled to [0, 1]."""
    w, h, idx, pal = decode_gif(payload)
    rgb = []
    for k in idx[:3]:
        rgb.extend(pal[3 * k : 3 * k + 3])
    return w, h, 1, [b / 255.0 for b in rgb[:8]]


def gif_media_from_documents(docs: DataFrame) -> DataFrame:
    """One build_gif payload per document row, through the same Arrow
    mapInPandas ingest shape as png_media_from_documents."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "item_id": ids,
                    "modality": ["image"] * len(ids),
                    "payload": [build_gif(int(i)) for i in ids],
                    "meta": [{"origin": f"documents/{int(i)}"} for i in ids],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


GIF_REPORT_SCHEMA = (
    "item_id long, width int, height int, n_pixels long, "
    "sum_indices long, sum_rgb long, first_index long"
)


def gif_decode_report(df: DataFrame) -> DataFrame:
    """Executor-side real GIF decode audit: every payload goes through the
    container parser + the full variable-width LZW path, and the report
    sums EVERY decoded palette index and palette-expanded RGB byte — one
    wrong index anywhere in the stream changes the output. Same Arrow
    mapInPandas batch contract as png_decode_report."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                w, h, idx, pal = decode_gif(payload)
                rows.append(
                    {
                        "item_id": int(item_id),
                        "width": w,
                        "height": h,
                        "n_pixels": len(idx),
                        "sum_indices": sum(idx),
                        "sum_rgb": sum(
                            pal[3 * k] + pal[3 * k + 1] + pal[3 * k + 2]
                            for k in idx
                        ),
                        "first_index": idx[0],
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, GIF_REPORT_SCHEMA)


def build_gif_i(doc_id: int) -> bytes:
    """The INTERLACED twin of build_gif (round 13): identical pixel
    formulas, but the rows are TRANSMITTED in the four-pass GIF89a
    interlace order (every 8th from 0, every 8th from 4, every 4th from
    2, every 2nd from 1) with the image descriptor's interlace flag set
    — a decoder that ignores the flag (or scatters a pass onto the wrong
    rows) produces the right multiset of pixels in the wrong places,
    which only a position-sensitive checksum catches."""
    w = 3 + doc_id % 13
    h = 2 + doc_id % 7
    palette = b"".join(
        bytes(
            (
                (doc_id + i * 17) % 256,
                (doc_id * 2 + i * 29) % 256,
                (doc_id * 3 + i * 41) % 256,
            )
        )
        for i in range(4)
    )
    rows = [
        [(doc_id + r * 5 + c * 3) % 4 for c in range(w)] for r in range(h)
    ]
    indices = [
        v for r in _gif_interlace_order(h) for v in rows[r]
    ]
    lzw = _lzw_encode(indices, 2)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks.append(len(part))
        blocks += part
    blocks.append(0)
    return (
        b"GIF89a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x81, 0, 0])
        + palette
        + b"\x2c"
        + (0).to_bytes(2, "little") * 2
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + b"\x40"  # no local color table, INTERLACED
        + bytes([2])
        + bytes(blocks)
        + b"\x3b"
    )


def gif_i_media_from_documents(docs: DataFrame) -> DataFrame:
    """One build_gif_i payload per document row, same Arrow ingest shape
    as gif_media_from_documents."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "item_id": ids,
                    "modality": ["image"] * len(ids),
                    "payload": [build_gif_i(int(i)) for i in ids],
                    "meta": [{"origin": f"documents/{int(i)}"} for i in ids],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


GIF_I_REPORT_SCHEMA = GIF_REPORT_SCHEMA + ", pos_weighted long"


def gif_interlaced_report(df: DataFrame) -> DataFrame:
    """gif_decode_report plus a POSITION-WEIGHTED index checksum
    (sum over raster position k of (k+1) * index_k): the plain sums are
    order-insensitive, so a decode that ignored the interlace flag would
    still match them — the weighted sum is what pins the de-interlace
    scatter to the exact raster order the oracle recomputes."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                w, h, idx, pal = decode_gif(payload)
                rows.append(
                    {
                        "item_id": int(item_id),
                        "width": w,
                        "height": h,
                        "n_pixels": len(idx),
                        "sum_indices": sum(idx),
                        "sum_rgb": sum(
                            pal[3 * k] + pal[3 * k + 1] + pal[3 * k + 2]
                            for k in idx
                        ),
                        "first_index": idx[0],
                        "pos_weighted": sum(
                            (k + 1) * v for k, v in enumerate(idx)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, GIF_I_REPORT_SCHEMA)
