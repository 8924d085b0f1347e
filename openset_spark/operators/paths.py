"""Path / next-action analysis.

The reference's "what did customers do next" queries (README.md
example 14: products purchased in the subsequent cart) walk forward
from each matched row with nested ``each_row.continue().next()``.
Declaratively: ``lead()`` over the per-user event window, then a
grouped count of (from, to) transitions — one shuffle for the window,
one partial-aggregated shuffle for the transition matrix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def next_event(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_cols: tuple[str, ...] = ("event_id",),
    where: Column | None = None,
) -> DataFrame:
    """Add ``next_event_type`` / ``next_ts`` columns (null at timeline end).

    ``where`` optionally restricts the timeline BEFORE computing
    successors (i.e. "next matching event"), matching the reference's
    iterator-over-matches semantics.
    """
    if where is not None:
        df = df.filter(where)
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    return df.withColumn("next_event_type", F.lead(event_col).over(w)).withColumn(
        "next_ts", F.lead(ts_col).over(w)
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    where: Column | None = None,
) -> DataFrame:
    """(from_event, to_event) -> transitions + distinct users — the
    next-action report."""
    stepped = next_event(df, user_col, ts_col, event_col, where=where)
    return (
        stepped.filter(F.col("next_event_type").isNotNull())
        .groupBy(
            F.col(event_col).alias("from_event"),
            F.col("next_event_type").alias("to_event"),
        )
        .agg(
            F.count(F.lit(1)).alias("transitions"),
            F.countDistinct(user_col).alias("people"),
        )
    )
