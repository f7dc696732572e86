"""Vector (embedding) column kit — higher-order functions, no UDFs.

Dot products / norms / cosine over ``array<float>`` embedding columns,
accumulated **in index order as doubles** so results are bit-identical to
any engine that folds left-to-right (DuckDB's ``list_sum`` over
``list_transform`` does) — which makes similarity-search results
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, left-to-right double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Euclidean norm ‖a‖₂."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe 0 when either norm is 0."""
    d = dot(a, b)
    denom = norm2(a) * norm2(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))
