"""Bloom-filter gate properties (operators/bloom.py): the two contracts a
decontamination gate lives or dies by — NO false negatives ever, and a
false-positive rate that tracks the observed-fill estimate f**k."""

from __future__ import annotations

from pyspark.sql import functions as F

from yaml_pipe_spark.operators.bloom import bloom_bits, bloom_flag

M, K = 2048, 3


def _grams(spark, prefix: str, n: int):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("gram")
    )


def test_no_false_negatives(spark):
    """Every inserted gram must be flagged — the gate may over-block but
    can never leak a truly contaminated gram."""
    train = _grams(spark, "tok-", 500)
    bits = bloom_bits(train, m=M, k=K).cache()
    flags = bloom_flag(train, bits, m=M, k=K)
    assert flags.filter(F.col("flagged") == 0).count() == 0


def test_bits_bounded_and_fp_rate_tracks_fill(spark):
    """|bits| <= m, and on a disjoint probe set the measured FP rate is
    within a loose factor of the observed-fill estimate (n_set/m)**k."""
    train = _grams(spark, "tok-", 500)
    bits = bloom_bits(train, m=M, k=K).cache()
    n_set = bits.count()
    assert n_set <= M
    theory = (n_set / M) ** K
    probes = _grams(spark, "other-", 2000)
    flagged = (
        bloom_flag(probes, bits, m=M, k=K)
        .filter(F.col("flagged") == 1)
        .count()
    )
    measured = flagged / 2000
    # 500 grams x 3 probes into 2048 bits -> fill ~0.5, theory ~0.11;
    # 2000 Bernoulli trials put the sample well inside a 2.5x band
    assert measured <= 2.5 * theory + 0.01
    assert theory > 0  # the filter is non-trivially full in this setup


def test_disjoint_filters_do_not_cross_flag(spark):
    """Grams whose k positions never all land in the other set stay clean:
    with an (almost) empty filter nothing is flagged."""
    train = _grams(spark, "tok-", 1)
    bits = bloom_bits(train, m=M, k=K)
    probes = _grams(spark, "other-", 200)
    flagged = (
        bloom_flag(probes, bits, m=M, k=K)
        .filter(F.col("flagged") == 1)
        .count()
    )
    # 1 inserted gram sets <=3 of 2048 bits; P(all 3 probe positions hit)
    # is ~(3/2048)^3 — effectively zero across 200 probes
    assert flagged == 0
