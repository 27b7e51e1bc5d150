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


# --- unrolled kernels for a LITERAL query vector (r7, guide §4.1) --------------
#
# ``aggregate``/``zip_with`` higher-order functions run INTERPRETED — no
# whole-stage codegen — and the planner neither constant-folds the
# query-side norm (it re-aggregates the literal array per row) nor
# dedupes the doubled ``denom`` in ``cosine``'s when/otherwise. Against
# a literal vector the dimension is known at plan time, so the fold
# unrolls into a compiled chain of multiply-adds with BIT-IDENTICAL
# results: ``aggregate(.., 0.0, acc + x)`` evaluates
# ((0.0 + p₀) + p₁) + … in element order, exactly the chain built here,
# and the per-element products carry the same float→double casts. The
# query norm is folded ONCE in Python (IEEE binary64, the same op
# sequence), not once per row.


def _dlit(x: float) -> str:
    """Shortest-round-trip double literal for Spark SQL: Python's repr
    emits the shortest decimal that parses back to the same binary64, and
    Java's Double.parseDouble applies the same correctly-rounded parse,
    so the JVM sees bit-identical values."""
    return repr(float(x)) + "D"


def _sql_name(a: Column | str) -> str:
    if isinstance(a, str):
        return f"`{a}`"
    raise TypeError(
        "the unrolled literal kernels need the vector COLUMN NAME (the "
        "chain is assembled as one SQL string — building ~400 Column "
        "nodes through py4j costs ~0.8 s of driver time per plan)"
    )


def _dot_lit_sql(name: str, q: list[float]) -> str:
    terms = " + ".join(
        f"(CAST(get({name}, {i}) AS DOUBLE) * {_dlit(x)})" for i, x in enumerate(q)
    )
    return f"(0.0D + {terms})"


def _norm2_sql(name: str, dim: int) -> str:
    terms = " + ".join(
        f"(CAST(get({name}, {i}) AS DOUBLE) * CAST(get({name}, {i}) AS DOUBLE))"
        for i in range(dim)
    )
    return f"(0.0D + {terms})"


def dot_lit(a: Column | str, q: list[float]) -> Column:
    """``dot(col, lit(q))``, codegen-unrolled when len(col) == len(q),
    falling back to the HOF fold otherwise (a shorter/longer array padded
    with nulls by zip_with must keep yielding NULL, not a partial sum).
    Bit-identical to ``dot``: SQL ``+`` is left-associative, so the chain
    evaluates ((0.0 + p₀) + p₁) + … — the exact fold order of
    ``aggregate(.., 0.0, acc + v)`` — with the same float→double casts."""
    name = _sql_name(a)
    lit_q = F.array(*[F.lit(float(x)) for x in q])
    return F.when(
        F.size(F.col(a) if isinstance(a, str) else a) == len(q),
        F.expr(_dot_lit_sql(name, q)),
    ).otherwise(dot(F.col(a) if isinstance(a, str) else a, lit_q))


def cosine_lit(a: Column | str, q: list[float]) -> Column:
    """``cosine(col, lit(q))`` with the same guard/fallback as dot_lit.
    The query-side norm is folded ONCE here in Python (IEEE binary64,
    identical op sequence) instead of once per row by the interpreted
    aggregate the planner does not constant-fold."""
    import math

    qn = 0.0
    for x in q:
        qn = qn + float(x) * float(x)
    qn = math.sqrt(qn)
    name = _sql_name(a)
    col = F.col(a) if isinstance(a, str) else a
    denom_sql = f"(SQRT({_norm2_sql(name, len(q))}) * {_dlit(qn)})"
    fast = F.expr(
        f"CASE WHEN {denom_sql} = 0.0D THEN 0.0D "
        f"ELSE ({_dot_lit_sql(name, q)} / {denom_sql}) END"
    )
    lit_q = F.array(*[F.lit(float(x)) for x in q])
    return F.when(F.size(col) == len(q), fast).otherwise(cosine(col, lit_q))
