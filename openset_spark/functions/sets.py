"""Set-property predicates — OSL's multi-value (`is_set`) matchers
(docs/rest/README.md batch example: `product_group.ever(any
['basement', 'garage'])`, `product_tags.is(contains 'red')`).

A set property is an ``array<T>`` column; every matcher is a JVM
array built-in, so these predicates push into the same codegen stage
as the rest of the row filter."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def contains(set_col: Column, value) -> Column:
    """OSL ``.is(contains v)``: the set holds the value."""
    return F.array_contains(set_col, value)


def contains_any(set_col: Column, values: Sequence) -> Column:
    """OSL ``any [v, ...]``: at least one listed value is in the set."""
    return F.arrays_overlap(set_col, F.array(*[F.lit(v) for v in values]))


def contains_all(set_col: Column, values: Sequence) -> Column:
    """OSL ``all [v, ...]``: every listed value is in the set."""
    lits = F.array(*[F.lit(v) for v in values])
    return F.size(F.array_except(lits, set_col)) == 0


def set_eq(set_col: Column, values: Sequence) -> Column:
    """Exact set equality, order/duplicate-insensitive."""
    lits = F.array(*[F.lit(v) for v in values])
    return (F.size(F.array_except(set_col, lits)) == 0) & (
        F.size(F.array_except(lits, set_col)) == 0
    )
