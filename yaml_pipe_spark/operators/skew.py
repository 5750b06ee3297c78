"""Skew mitigation: salted two-phase aggregation and salted replicate joins.

The reference runs single-node and has no notion of data skew (SURVEY §4);
these operators are part of the 100 TB story: when one key holds a
disproportionate share of rows, a plain groupBy/join sends that key's entire
volume to one reducer and the stage runs at the speed of its hottest task.

Both operators are *plan rewrites with identical results* — each has a plain
SQL twin, so they are oracle-checkable like any relational operator:

- `salted_aggregate`: groupBy(key) -> groupBy(key, salt) partial + groupBy
  (key) final. The hot key's rows spread over `n_salts` reducers in phase 1;
  phase 2 combines `n_salts` partial rows per key. For algebraic aggregates
  (count/sum/min/max) the rewrite is exact.
- `salted_join`: big ⋈ small on key -> big tagged with a deterministic salt,
  small replicated once per salt value, equi-join on (key, salt). The hot
  key's probe rows land on `n_salts` different reducers. Replication factor
  is bounded by n_salts * |small| — the knob trades dim duplication for
  fact-side spread. (AQE's skewedJoin does this adaptively for sort-merge
  joins; the explicit form works for any join and documents the intent.)

Salts are derived deterministically from a high-cardinality column
(crc32 % n_salts), never rand(): deterministic plans re-run identically,
which both the correctness harness and any retry-based scheduler rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(col: Column, n_salts: int) -> Column:
    """Stable salt in [0, n_salts) from any column (crc32 of the string
    form — cheap, uniform enough for load-spreading)."""
    return (F.crc32(col.cast("string")) % n_salts).cast("int")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    salt_col: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `aggs` maps output name -> (partial, merge): `partial` is the aggregate
    Column over the input rows, `merge` a callable taking the partial column
    name and returning the phase-2 aggregate (count merges with F.sum, sum
    with F.sum, min with F.min, max with F.max — algebraic aggregates only;
    avg must be decomposed into sum+count by the caller). Phase 1 groups by
    (key, salt); phase 2 merges partials per key. Result identical to
    df.groupBy(key).agg(...).
    """
    salted = df.withColumn("__salt", deterministic_salt(salt_col, n_salts))
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[partial.alias(f"__p_{name}") for name, (partial, _) in aggs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[merge(f"__p_{name}").alias(name) for name, (_, merge) in aggs.items()]
    )


def skewed_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_sources: int = 50,
    boilerplate_frac_mod: int = 10,
    boilerplate_hits: int = 3,
    boilerplate: str = (
        "subscribe to our newsletter today for updates offers and news "
        "from our team delivered directly to your inbox every week"
    ),
) -> DataFrame:
    """A deliberately SKEWED derivative of a documents frame, for measuring
    the dedup/LSH guard rails on adversarial—but realistic—corpora. Pure
    deterministic Catalyst (md5-derived randomness), so every engine
    recomputes the identical corpus:

    - Zipf-like `source`: u = (first md5 word of the id)/2^32 in (0,1],
      k = least(ceil(1/u) - 1 clamped to >= 1, n_sources) ->
      P(k) = 1/(k(k+1)) ~ 1/k^2: source 'src_1' holds ~half the corpus
      (the hot-partition / hot-join-key case).
    - Hot boilerplate: docs with id % boilerplate_frac_mod <
      boilerplate_hits get a shared boilerplate suffix appended — its
      shingles then appear in ~1/3 of ALL documents, the exact hot-shingle
      blowup the document-frequency cut in exact_jaccard_pairs guards
      against (one such shingle in f*n docs creates (f*n)^2/2 candidate
      pairs if unguarded).

    Used by tests/test_skew_robustness.py and the PERF.md skew table;
    production corpora hit the same shapes via CDN boilerplate, cookie
    banners, and crawler source imbalance.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    k = F.least(
        F.greatest(F.ceil(1.0 / u) - 1, F.lit(1)), F.lit(n_sources)
    ).cast("int")
    hot = (F.col(id_col) % boilerplate_frac_mod) < boilerplate_hits
    return docs.select(
        F.col(id_col),
        F.concat(F.lit("src_"), k).alias("source"),
        F.when(
            hot, F.concat(F.col(text_col), F.lit(" " + boilerplate))
        )
        .otherwise(F.col(text_col))
        .alias(text_col),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_source: Column | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    `salt_source` must be a deterministic high-cardinality column of `big`
    (defaults to the join key itself — fine for spreading *many* keys, but
    to spread ONE hot key pass e.g. the fact table's row id). Result row set
    is identical to big.join(small, on).
    """
    src = salt_source if salt_source is not None else F.col(on)
    b = big.withColumn("__salt", deterministic_salt(src, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, [on, "__salt"]).drop("__salt")
