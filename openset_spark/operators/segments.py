"""Segments — maintained per-customer boolean membership.

Reference: ``/v1/query/{table}/segment`` runs an OSL script per
customer returning true/false; memberships are stored as index
bitmaps, composable by z-ordered set algebra, and refreshable
(src/oloop_segment.cpp, src/oloop_seg_refresh.cpp, README example 8).

Spark-first: a segment is a per-user boolean aggregate over the
events table. Computing ALL segments together is one shuffle: each
segment contributes one ``max(when(pred, 1))``-style conditional
aggregate to a single groupBy(user). Membership frames are small
(one row per user) and cacheable; algebra is boolean column math —
the analog of the reference's bitmap AND/OR/NOT at a fraction of the
code.

Predicate helpers mirror OSL property modifiers
(docs/osl/language_reference.md:82-100):
  ever(pred)        -> user had any matching row
  never(pred)       -> user had no matching row
  within(pred, span,
         anchor)    -> matching row within time span of anchor
Sequence segments (A then B) reuse funnel min-ts chaining.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.time import epoch_us


@dataclass(frozen=True)
class Segment:
    """A named per-user membership rule over the events table."""

    name: str
    # row-level predicate aggregated with `ever` semantics by default
    predicate: Column
    mode: str = "ever"  # "ever" | "never"

    def agg_expr(self) -> Column:
        ever = F.max(F.when(self.predicate, F.lit(1)).otherwise(F.lit(0))) == 1
        expr = ever if self.mode == "ever" else ~ever
        return expr.alias(self.name)


def membership(
    df: DataFrame, segments: list[Segment], user_col: str = "user_id"
) -> DataFrame:
    """One row per user, one boolean column per segment — all segments
    in a single groupBy (one shuffle, partial-aggregated)."""
    return df.groupBy(user_col).agg(*[s.agg_expr() for s in segments])


def segment_counts(
    df: DataFrame,
    segments: list[Segment],
    user_col: str = "user_id",
    membership_df: DataFrame | None = None,
) -> DataFrame:
    """(segment, people) — the reference's segment query response.
    Pass ``membership_df`` to reuse an already-computed (cached)
    membership frame, e.g. inside a batch query."""
    m = membership_df if membership_df is not None else membership(
        df, segments, user_col
    )
    counts = m.agg(
        *[F.sum(F.col(s.name).cast("long")).alias(s.name) for s in segments]
    )
    n = len(segments)
    stack_args = ", ".join(f"'{s.name}', {s.name}" for s in segments)
    return counts.selectExpr(f"stack({n}, {stack_args}) as (segment, people)")


# ---- segment algebra (reference: union/intersection/difference/
#      complement layered by z_index) ----
def union(a: Column, b: Column) -> Column:
    return a | b


def intersection(a: Column, b: Column) -> Column:
    return a & b


def difference(a: Column, b: Column) -> Column:
    return a & ~b


def complement(a: Column) -> Column:
    return ~a


def refresh_membership(
    old: DataFrame,
    new_events: DataFrame,
    segments: list[Segment],
    user_col: str = "user_id",
) -> DataFrame:
    """Incremental segment refresh (src/oloop_seg_refresh.cpp): update
    a stored membership frame from a DELTA of new events — only the
    delta is scanned, never the 100 TB history.

    Sound because predicate segments are monotone over appended rows:
    `ever` can only turn true (old OR delta), `never` only false
    (old AND delta). Sequence segments are not refreshable this way —
    recompute those (or use streaming/funnel.py for live progression).
    """
    delta = membership(new_events, segments, user_col)
    o, d = old.alias("o"), delta.alias("d")
    joined = o.join(d, user_col, "outer")
    cols = [F.col(user_col)]
    for s in segments:
        ov = F.coalesce(F.col(f"o.{s.name}"), F.lit(s.mode == "never"))
        dv = F.coalesce(F.col(f"d.{s.name}"), F.lit(s.mode == "never"))
        cols.append((ov | dv if s.mode == "ever" else ov & dv).alias(s.name))
    return joined.select(*cols)


def sequence_membership(
    df: DataFrame,
    sequences: dict[str, list[Column]],
    user_col: str = "user_id",
    within_ms: int | None = None,
) -> DataFrame:
    """Per-user membership frame for ORDERED-sequence segments (the
    reference's `A then B` segment scripts): user is in segment iff
    they completed all steps in order. Reuses funnel min-ts chaining —
    each sequence is one windowed pass over the same user partitioning,
    memberships joined on user (co-partitioned, no extra shuffle of
    the events table)."""
    from openset_spark.operators.funnel import funnel_user_steps

    out: DataFrame | None = None
    for name, steps in sequences.items():
        per_user = funnel_user_steps(df, steps, user_col, within_ms=within_ms)
        m = per_user.select(
            user_col,
            F.col(f"step_{len(steps)}").isNotNull().alias(name),
        )
        out = m if out is None else out.join(m, user_col, "outer")
    assert out is not None, "no sequences given"
    return out.na.fill(False)


def within_pred(
    pred: Column,
    ts_col: Column,
    span_ms: int,
    anchor: Column,
) -> Column:
    """OSL ``prop.within(span, anchor)``: pred AND |ts - anchor| <= span."""
    delta = F.abs(epoch_us(ts_col) - epoch_us(anchor)) / 1000
    return pred & (delta <= span_ms)
