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
