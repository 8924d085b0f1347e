"""Vector (array<float|double>) column helpers.

Two tiers, bit-identical results (tests/test_vector_unroll.py locks
bit equality on randomized vectors):

- ``dot``/``norm``/``cosine``: ``aggregate`` + ``zip_with``
  higher-order functions. HOFs evaluate interpreted (CodegenFallback)
  but the fold loop body is Scala-level — the r15 measurements showed
  this BEATS a fully unrolled ``element_at`` sum at dim 64 in almost
  every shape (the unrolled form generates a method past HotSpot's
  JIT bytecode limit and drops to the bytecode interpreter: 2.5-8x
  slower on centroid-argmax and plain-dot micro-benches). These are
  the default.
- the ``_fixed``/``_sql`` unrolled forms — the same left fold
  ``((0.0 + t1) + t2) + ...`` spelled as a flat ``element_at`` sum.
  Kept ONLY for the near-dup cosine-threshold shape
  (`similarity.embedding_near_dup[_lsh]`), where the optimizer
  duplicates the cosine into the pushed-down Filter below the
  Project; there the unrolled form measured ~2x faster end-to-end.
  Do not reach for these elsewhere without a measurement.

Expression strings are built in Python and shipped as ONE ``F.expr``
per dot/norm (the `_lit_vec_sql` py4j lesson: per-element Column calls
cost a driver round trip each).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------- dim-aware unrolled forms (codegen-friendly) ----------
def dot_sql(a_sql: str, b_sql: str, dim: int) -> str:
    """SQL snippet for dot(a, b) over fixed-``dim`` arrays, unrolled.

    Left-associative ``0.0D + t1 + t2 + ...`` reproduces the HOF
    aggregate's fold ``((0 + t1) + t2) + ...`` exactly (including the
    leading ``0.0 +``, which matters only for the sign of an all-zero
    result — kept anyway so equality is structural, not probabilistic).
    ``element_at`` is 1-based; inputs must really have ``dim``
    elements (embedding columns are fixed-width by contract). See the
    module docstring for when this form wins (rarely — measure).
    """
    terms = "".join(
        f"+(element_at({a_sql},{i})*element_at({b_sql},{i}))"
        for i in range(1, dim + 1)
    )
    return f"(0.0D{terms})"


def norm_sql(a_sql: str, dim: int) -> str:
    """SQL snippet for the L2 norm over a fixed-``dim`` array —
    unrolled twin of :func:`norm` (same fold order, see
    :func:`dot_sql`)."""
    terms = "".join(
        f"+(element_at({a_sql},{i})*element_at({a_sql},{i}))"
        for i in range(1, dim + 1)
    )
    return f"sqrt((0.0D{terms}))"


def dot_fixed(a_sql: str, b_sql: str, dim: int) -> Column:
    return F.expr(dot_sql(a_sql, b_sql, dim))


def norm_fixed(a_sql: str, dim: int) -> Column:
    return F.expr(norm_sql(a_sql, dim))


def cosine_fixed(a_sql: str, b_sql: str, dim: int) -> Column:
    return F.expr(
        f"({dot_sql(a_sql, b_sql, dim)}"
        f"/({norm_sql(a_sql, dim)}*{norm_sql(b_sql, dim)}))"
    )
