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


def user_paths(
    df: DataFrame,
    max_steps: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_cols: tuple[str, ...] = ("event_id",),
    sep: str = ">",
) -> DataFrame:
    """(user_id, path) — the first ``max_steps`` events joined into a
    path string (the reference's chains-of-events view). One window
    rank + one groupBy on the same user partitioning: a single
    shuffle; per-user state is bounded by ``max_steps`` (collect_list
    is capped by the rank filter, never the whole timeline)."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    ranked = (
        df.select(user_col, ts_col, *order_cols, event_col)
        .withColumn("_n", F.row_number().over(w))
        .filter(F.col("_n") <= max_steps)
    )
    # sort the collected (idx, event) pairs — collect_list order is
    # nondeterministic across tasks, the struct sort restores it.
    steps = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("_n"), F.col(event_col)))),
        lambda s: s[event_col],
    )
    return ranked.groupBy(user_col).agg(
        F.array_join(steps, sep).alias("path")
    )


def top_paths(
    df: DataFrame,
    max_steps: int = 3,
    n: int = 10,
    user_col: str = "user_id",
    **kwargs,
) -> DataFrame:
    """(path, people) most common opening paths, deterministic order."""
    paths = user_paths(df, max_steps, user_col=user_col, **kwargs)
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("people"))
        .orderBy(F.desc("people"), F.asc("path"))
        .limit(n)
    )


def next_session_transitions(
    df: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    user_col: str = "user_id",
    event_col: str = "event_type",
) -> DataFrame:
    """Next-basket analysis (README.md example 14: products purchased
    in the subsequent cart): (from, to) pairs where `from` appears in
    one session and `to` in the customer's NEXT session, with distinct
    customers and pair counts; same-value pairs dropped (the
    reference's repurchase filter).

    The reference nests four each_row cursors per customer; here it's
    sessionize -> per-session distinct sets (one user shuffle) ->
    lead() over the tiny per-session frame -> explode both sets.
    The exploded fan-out is |types|^2 per session pair — bounded by
    the event-type vocabulary, not the timeline."""
    from openset_spark.operators.sessionize import with_session

    s = with_session(df, gap_ms, user_col)
    per_session = s.groupBy(user_col, "session").agg(
        F.collect_set(event_col).alias("_types")
    )
    w = Window.partitionBy(user_col).orderBy("session")
    paired = per_session.withColumn("_next", F.lead("_types").over(w)).filter(
        F.col("_next").isNotNull()
    )
    exploded = paired.select(
        user_col, F.explode("_types").alias("from_type"), "_next"
    ).select(user_col, "from_type", F.explode("_next").alias("to_type"))
    return (
        exploded.filter(F.col("from_type") != F.col("to_type"))
        .groupBy("from_type", "to_type")
        .agg(
            F.countDistinct(user_col).alias("people"),
            F.count(F.lit(1)).alias("pairs"),
        )
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
