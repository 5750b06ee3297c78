"""Vector math over array columns — pure Catalyst expressions.

Used by the query side (SURVEY §2.7 Q1/Q2): the reference delegates top-k
scoring to LanceDB/Chroma ANN (core/evaluation.py:57-64); here scoring is an
expression so Catalyst keeps it inside whole-stage codegen and the sort+limit
becomes TakeOrderedAndProject — no Python in the hot path.

Determinism notes for the DuckDB oracle: both engines fold the array
left-to-right in double precision when written as an explicit indexed sum, so
dot/cosine are bit-reproducible; results are still rounded before compare.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sum_i a[i]*b[i] as double, left-to-right fold.

    DuckDB twin:
    list_sum(list_transform(generate_series(1, len(a)),
                            i -> CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)))
    """
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sq(a: Column) -> Column:
    """Sum of squares, double."""
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision (no rounding — caller rounds)."""
    return dot(a, b) / F.sqrt(l2_norm_sq(a) * l2_norm_sq(b))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine from a pre-computed squared norm per side.

    Bit-identical to `cosine` — the expression tree is still
    dot(a,b) / sqrt(na * nb) with na/nb the same left-to-right sum-of-squares
    folds, just evaluated once per ROW instead of once per PAIR. Matters
    because higher-order array functions (zip_with/aggregate) are
    interpreted, not codegen'd: in an n x m scoring join the naive form
    pays 3 interpreted folds per pair; this pays 1 per pair + 1 per row
    (~3x on wide joins like batch knn / recall measurement).
    """
    return dot(a, b) / F.sqrt(na * nb)
