"""Deterministic hashing expressions shared with the DuckDB oracle.

The cross-engine hash primitive is the md5/sha256 **hex string**: Spark's
`md5`/`sha2(col, 256)` and DuckDB's `md5`/`sha256` produce identical lowercase
hex, so MIN() over hex strings, hex-digit arithmetic, and hex prefixes are all
bit-identical across engines. We never rely on engine-native integer hashes
(xxhash64 etc.) for oracle-checked results.

The deterministic hash-embedder (SURVEY §2.3) turns text into a
pseudo-embedding: dim i of embed(t) = byte(md5(t || ':' || i)) scaled to
[-1, 1]. Not a semantic embedding — it exists so the vector path (top-k,
hit-rate, similarity join) is exactly reproducible in SQL, mirroring the
reference's practice of mocking embedders in tests (tests/test_sinks.py:20-24).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def sha256_text(col: Column) -> Column:
    """sha256 hex of the text — the content hash of the state ledger.

    Reference: utils/state_manager.py:141-147 (file sha256).
    DuckDB twin: sha256(t).
    """
    return F.sha2(col, 256)


def md5_seeded(col: Column, seed: Column | int | str) -> Column:
    """md5 hex of `seed || ':' || text` — one member of a seeded hash family.

    DuckDB twin: md5(concat(CAST(seed AS VARCHAR), ':', t)).
    """
    seed_col = seed if isinstance(seed, Column) else F.lit(str(seed))
    return F.md5(F.concat(seed_col.cast("string"), F.lit(":"), col))


def hex_nibble_expr(hex_col: Column, pos: Column) -> Column:
    """Integer value 0..15 of the 1-based `pos`-th hex digit of a hex string.

    Spark `instr` / DuckDB `strpos` agree: 1-based, 0 when absent.
    DuckDB twin: strpos('0123456789abcdef', substr(h, pos, 1)) - 1.
    """
    return F.instr(F.lit(HEX_DIGITS), F.substring(hex_col, pos, F.lit(1))) - 1


def hex_pair_to_int(hex_col: Column, pos: Column | int = 1) -> Column:
    """Integer 0..255 from two hex digits starting at 1-based `pos`."""
    pos_col = pos if isinstance(pos, Column) else F.lit(pos)
    hi = hex_nibble_expr(hex_col, pos_col)
    lo = hex_nibble_expr(hex_col, pos_col + 1)
    return (hi * 16 + lo).cast("long")


def hash_embedding(col: Column, dim: int = 16, decimals: int = 6) -> Column:
    """Deterministic pseudo-embedding: array<double> of length `dim`.

    dim i (1-based) = round(byte_0(md5(i || ':' || t)) / 255 * 2 - 1, decimals).
    """
    return F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.round(
            hex_pair_to_int(md5_seeded(col, i), 1) / F.lit(255.0) * 2 - 1, decimals
        ),
    )
