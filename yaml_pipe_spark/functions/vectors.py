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
