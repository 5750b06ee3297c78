"""Unit pins for the exact-integer Lloyd trainer (VERDICT r11 ask #2):
the cross-engine guarantees live in the arithmetic (half-up quantization,
integer argmin with lowest-cid ties, shifted half-up integer means, empty
cells keep their centroid) — each is pinned against a pure-Python replay."""

from __future__ import annotations

import pytest

from yaml_pipe_spark.operators.similarity import (
    _LLOYD_SHIFT,
    kmeans_lloyd_u6,
    lloyd_assign_u6,
    lloyd_centroid_arrays,
    lloyd_update_u6,
    vec_u6_long,
)


def _u6(x: float) -> int:
    import math

    return int(math.floor(x * 1000000 + 0.5))


def test_vec_u6_long_is_half_up_and_sign_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0000005, -0.0000005, 0.25, -0.58])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.pos: r.xu for r in vec_u6_long(df).collect()}
    # floor(x*1e6 + 0.5): exact half at +0.5 rounds up; at -0.5 rounds to 0
    assert rows == {1: 1, 2: 0, 3: 250000, 4: -580000}
    assert all(_u6(v) == rows[i + 1]
               for i, v in enumerate([0.0000005, -0.0000005, 0.25, -0.58]))


def test_assign_breaks_ties_to_lowest_cid(spark):
    xs = spark.createDataFrame(
        [(7, 1, 0)], "vec_id long, pos long, xu long"
    )
    # two centroids equidistant from xu=0
    cents = spark.createDataFrame(
        [(3, 1, 5), (1, 1, -5)], "cid long, pos long, cu long"
    )
    got = lloyd_assign_u6(xs, cents).collect()
    assert len(got) == 1 and got[0].cid == 1 and got[0].d2 == 25


def test_update_is_half_up_integer_mean_and_keeps_empty_cells(spark):
    xs = spark.createDataFrame(
        [(1, 1, 1), (2, 1, 2)], "vec_id long, pos long, xu long"
    )
    asg = spark.createDataFrame([(1, 0), (2, 0)], "vec_id long, cid long")
    prev = spark.createDataFrame(
        [(0, 1, 99), (5, 1, -77)], "cid long, pos long, cu long"
    )
    got = {r.cid: r.cu for r in lloyd_update_u6(asg, xs, prev).collect()}
    # mean(1, 2) = 1.5 -> half-up 2 (via the shifted (2*su+n) DIV (2*n))
    assert got[0] == 2
    # cid 5 got no members: keeps its previous centroid
    assert got[5] == -77


def test_lloyd_matches_pure_python_replay(spark):
    import random

    rng = random.Random(7)
    dim, k, n = 6, 3, 40
    vecs = {
        i: [round(rng.uniform(-0.6, 0.6), 4) for _ in range(dim)]
        for i in range(n)
    }
    corpus = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    seeds = spark.createDataFrame(
        [(i, vecs[i]) for i in range(k)], "cid long, cv array<double>"
    )
    cents_df, asg_df = kmeans_lloyd_u6(corpus, seeds, rounds=3)
    got_c = {(r.cid, r.pos): r.cu for r in cents_df.collect()}
    got_a = {r.vec_id: (r.cid, r.d2) for r in asg_df.collect()}

    # pure-Python replay of the same integer recipe
    xu = {i: [_u6(x) for x in v] for i, v in vecs.items()}
    cents = {c: list(xu[c]) for c in range(k)}

    def assign():
        out = {}
        for i, v in xu.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cents[c])), c)
                for c in cents
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(3):
        asg = assign()
        for c in range(k):
            members = [i for i, (ci, _) in asg.items() if ci == c]
            if not members:
                continue
            for p in range(dim):
                su = sum(xu[i][p] + _LLOYD_SHIFT for i in members)
                n_m = len(members)
                cents[c][p] = (2 * su + n_m) // (2 * n_m) - _LLOYD_SHIFT
    asg = assign()

    assert got_a == asg
    assert got_c == {
        (c, p + 1): cents[c][p] for c in range(k) for p in range(dim)
    }


def test_lloyd_centroid_arrays_orders_by_pos(spark):
    cents = spark.createDataFrame(
        [(0, 2, 2000000), (0, 1, -500000)], "cid long, pos long, cu long"
    )
    got = lloyd_centroid_arrays(cents).collect()
    assert len(got) == 1
    assert got[0].cv == pytest.approx([-0.5, 2.0])


def test_normalize_substrate_spherical_semantics(spark):
    """normalize=True trains on x/||x|| (spherical k-means): on a
    NON-normalized corpus the quantized substrate differs from the raw
    one; on an already-unit-norm corpus it is bit-identical (why the
    recall row needs no separate spherical variant — its corpus is
    unit-norm)."""

    raw = [(1, [3.0, 4.0]), (2, [0.6, 0.8])]
    df = spark.createDataFrame(raw, "vec_id long, embedding array<double>")
    plain = {(r.vec_id, r.pos): r.xu for r in vec_u6_long(df).collect()}
    sph = {
        (r.vec_id, r.pos): r.xu
        for r in vec_u6_long(df, normalize=True).collect()
    }
    # row 1 has norm 5: spherical rescales it; row 2 is already unit-norm
    assert plain[(1, 1)] == 3000000 and sph[(1, 1)] == 600000
    assert plain[(2, 1)] == sph[(2, 1)] == 600000
    # and the spherical substrate of both rows is identical (same
    # direction), which is the point of the cosine-metric variant
    assert sph[(1, 1)] == sph[(2, 1)] and sph[(1, 2)] == sph[(2, 2)]
