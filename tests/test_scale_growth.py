"""Scale-growth guard (VERDICT r6 ask #5): every guarded heavy family must
grow NEAR-LINEARLY in corpus size. The empirical exponent
alpha = ln(t_big/t_small) / ln(n_big/n_small) is pinned at <= 1.3 on a
CI-sized 4x pair; scripts/scale_growth.py records the 10x (5k -> 50k)
table for PERF.md on the same harness.

The synthetic corpus (operators/scalegen.py) holds near-dup DENSITY and
vocabulary constant across sizes, so a superlinear wall-clock here is an
operator regression (an unguarded pair blowup, a lost pushdown), not a
data artifact. Timings are min-of-2; the bound is generous (4x data may
cost up to 4^1.3 ~ 6.1x time) precisely so scheduling jitter cannot flake
it while O(n^2) (16x) still fails loudly."""

from __future__ import annotations

import pytest

# driver fast lane (r14): scale-measurement harness (minutes of data generation), not an operator contract
pytestmark = pytest.mark.slow

from yaml_pipe_spark.scalebench import FAMILIES, run_scale_growth


@pytest.fixture(scope="module")
def growth(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("scale"))
    return run_scale_growth(spark, tmp, sizes=(1000, 4000), reps=2)


def test_all_heavy_families_measured(growth):
    assert set(growth) == set(FAMILIES)
    for name, r in growth.items():
        assert r["rows_small"] > 0, name
        assert r["rows_big"] > 0, name


def test_pair_mass_grows_linearly_not_quadratically(growth):
    """The generator contract: constant near-dup density means found pair
    mass itself must scale ~4x, not 16x — this is what makes the
    wall-clock exponent attributable to the OPERATOR."""
    for name in ("minhash_lsh_pairs", "simhash_cc"):
        r = growth[name]
        ratio = r["rows_big"] / r["rows_small"]
        assert 2.0 <= ratio <= 8.0, (name, r)


def test_wallclock_growth_is_near_linear(growth):
    for name, r in growth.items():
        assert r["alpha"] <= 1.3, (name, r)


def test_generator_is_deterministic_across_sessions(spark):
    """The scaling exponents are only comparable across runs/machines if
    the corpus is BIT-IDENTICAL every time — pin the generator output
    with golden content hashes (order-insensitive bit_xor of per-row
    xxhash64), not just self-consistency within one session."""
    from pyspark.sql import functions as F

    from yaml_pipe_spark.operators.scalegen import (
        synthetic_documents,
        synthetic_embeddings,
    )

    d = synthetic_documents(spark, 200)
    h = d.agg(F.bit_xor(F.xxhash64("doc_id", "text", "source"))).collect()[
        0
    ][0]
    assert h == -4782318295758910632
    e = synthetic_embeddings(spark, 100)
    he = e.agg(
        F.bit_xor(F.xxhash64("vec_id", F.col("embedding").cast("string")))
    ).collect()[0][0]
    assert he == 5558232363433561237
