"""Bloom-filter membership gate for corpus-scale decontamination.

The exact benchmark-leakage check (text_decontaminate) joins every held-out
n-gram against the DISTINCT train-side n-gram set — correct, but at 100 TB
the train side of that join is itself corpus-sized. The standard production
gate (GPT-3 appendix C, The Pile, Dolma all describe variants) is a Bloom
filter: fold the train n-grams into an m-bit array once, broadcast the bits
(m/8 bytes — KBs, not TBs) to every executor, and probe locally. The price
is a measurable false-positive rate and zero false negatives; docs that hit
the filter can be re-checked exactly (two-tier gate) or dropped outright.

Spark-native construction, no UDFs anywhere:

  build — k = K probe positions per n-gram via Kirsch-Mitzenmacher double
          hashing, pos_j = (h1 + j*(2*h2+1)) mod m, with h1/h2 the first
          two 16-bit words of md5(gram) (md5 is the repo's cross-engine
          deterministic hash — see operators/dedup.py). The "filter" is
          the DISTINCT set of set-bit positions: at most m rows, i.e. the
          exact information content of the bit array in relational form,
          which lets the verdict stay a pure Catalyst expression AND gives
          DuckDB an exact oracle twin. (Packing those positions into
          m/64 longs is a presentation detail; the membership semantics —
          and therefore the FP behavior — are identical.)
  probe — explode the K positions per DISTINCT probe-side gram, LEFT join
          the broadcast bit set, and a gram is flagged iff ALL K positions
          hit (min over the K hit indicators). One narrow broadcast join +
          one gram-keyed partial-agg — the corpus never shuffles against
          the train side.

Sizing: with n distinct grams inserted and fill fraction f = set_bits/m,
the observed-fill FP estimate is f**K (each of K independent probes lands
on a set bit); callers size m ~ 1.44 * K * n bits for a target rate. The
registered query (entrypoints.py::text_bloom_decontaminate) measures the
real FP rate against the exact join side-by-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_words(gram_col: str | Column) -> tuple[Column, Column]:
    """(h1, h2): the first two 16-bit words of md5(gram), as longs.

    Identical in DuckDB via strpos('0123456789abcdef', ...) arithmetic over
    the same hex substrings (no conv() there) — see _DK_HEX_INT in
    entrypoints.py.
    """
    h = F.md5(gram_col)
    h1 = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 5, 4), 16, 10).cast("long")
    return h1, h2


def _positions(h1: Column, h2: Column, m: int, k: int) -> Column:
    """array of the K Kirsch-Mitzenmacher probe positions in [0, m)."""
    step = h2 * 2 + 1  # odd stride spreads probes even when h2 is small
    return F.array(*[(h1 + F.lit(j) * step) % m for j in range(k)])


def bloom_bits(
    grams: DataFrame, gram_col: str = "gram", m: int = 16384, k: int = 3
) -> DataFrame:
    """(pos) — the DISTINCT set-bit positions of the filter (<= m rows).

    One shuffle: the distinct over positions (map-side combine collapses
    each partition to <= m rows first, so the exchange is bounded by
    partitions * m regardless of corpus size).
    """
    h1, h2 = _hash_words(F.col(gram_col))
    return (
        grams.select(F.explode(_positions(h1, h2, m, k)).alias("pos"))
        .distinct()
    )


def bloom_flag(
    probes: DataFrame,
    bits: DataFrame,
    gram_col: str = "gram",
    m: int = 16384,
    k: int = 3,
) -> DataFrame:
    """(gram, flagged) — flagged=1 iff ALL K probe positions are set.

    `bits` is broadcast (<= m rows by construction); the probe side only
    partial-aggregates on its own gram key, so the plan is a narrow map +
    broadcast join + one bounded agg — nothing corpus-sized moves.
    """
    h1, h2 = _hash_words(F.col(gram_col))
    probe = probes.select(
        gram_col, F.explode(_positions(h1, h2, m, k)).alias("pos")
    )
    hit = probe.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "pos", "left"
    )
    return hit.groupBy(gram_col).agg(
        F.min(F.coalesce(F.col("__set"), F.lit(0))).alias("flagged")
    )
