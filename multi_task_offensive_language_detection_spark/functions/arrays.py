"""Array math as native Column expressions (SURVEY.md F17).

Dot products / norms / cosine over ``array<float>`` embedding columns via
``aggregate``/``zip_with`` — JVM-side, no Python. Accumulation is
left-to-right in double, which makes results bit-reproducible across
engines that fold the same way (the DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    """Σ aᵢ² (squared L2 norm)."""
    return dot(a, a)


def norm(a: Column) -> Column:
    return F.sqrt(norm2(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
