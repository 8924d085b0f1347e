"""Funnel / ordered-sequence analysis.

The reference expresses funnels as nested
``each_row.continue().next()`` iterators (README.md:518-594,
test/test_osl_language.h) — find step 1, then scan forward for step 2,
etc. Declaratively that is min-timestamp chaining per customer:

    t1 = min ts where step1
    t2 = min ts where step2 and ts > t1
    ...

Implemented in ONE pass: a window partitioned by user computes, at
every row, the earliest completion time of each previous step among
preceding rows; a row "hits" step k if it matches step k's predicate
strictly after the step k-1 completion. A final groupBy(user) (same
partitioning — no extra shuffle) takes the min hit time per step.
No self-joins, no exploding sequences, bounded per-row state: this is
a single shuffle of the events table and survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openset_spark.functions.time import epoch_us


def funnel_user_steps(
    df: DataFrame,
    steps: Sequence[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
    within_ms: int | None = None,
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """One row per user: ``step_1 .. step_N`` timestamps of the earliest
    in-order completion (null where the user never reached that step).

    ``within_ms`` additionally requires step k to occur within that many
    ms of step k-1's completion.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), *[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts = F.col(ts_col)
    # Materialize hit columns stage by stage (a window function cannot
    # nest inside another); every window shares the same partitioning
    # and ordering, so Catalyst plans ONE exchange + sort for all N.
    cur = df.select(
        user_col,
        ts_col,
        *order_cols,
        *[s.alias(f"_m_{i + 1}") for i, s in enumerate(steps)],
    ).withColumn("_hit_1", F.when(F.col("_m_1"), ts))
    for i in range(2, len(steps) + 1):
        prev_done = F.min(f"_hit_{i - 1}").over(w)
        cond = F.col(f"_m_{i}") & prev_done.isNotNull() & (ts > prev_done)
        if within_ms is not None:
            cond = cond & (
                (epoch_us(ts) - epoch_us(prev_done)) / 1000 <= within_ms
            )
        cur = cur.withColumn(f"_hit_{i}", F.when(cond, ts))
    return cur.groupBy(user_col).agg(
        *[F.min(f"_hit_{i}").alias(f"step_{i}") for i in range(1, len(steps) + 1)]
    )


def funnel(
    df: DataFrame,
    steps: Sequence[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
    within_ms: int | None = None,
    cull: bool = False,
) -> DataFrame:
    """Funnel summary: one row per step index with the count of users
    who reached that step in order (classic drop-off table).

    ``cull=True`` pre-drops users who never did step 1 (the
    reference's index-compiler pre-pass, src/queryindexing.h) BEFORE
    the per-user window: identical counts — a user without step 1
    can reach no step — but the window sorts only candidate
    timelines. The win scales with step-1 rarity; with a common
    first step the extra semi-join just adds a scan, hence opt-in."""
    if cull:
        from openset_spark.operators.events import cull_users

        df = cull_users(df, steps[0], user_col)
    per_user = funnel_user_steps(df, steps, user_col, ts_col, within_ms)
    counts = per_user.agg(
        *[
            F.count(F.col(f"step_{i}")).alias(f"step_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    n = len(steps)
    stack_expr = ", ".join(f"{i}, step_{i}" for i in range(1, n + 1))
    return counts.selectExpr(f"stack({n}, {stack_expr}) as (step, users)")
