"""Sessionization — the reference's synthetic ``session`` property.

Reference semantics (docs/osl/language_reference.md:41,608-634,
test/test_sessions.h): sessions are enumerated from 1 per customer; a
gap of inactivity strictly greater than the timeout (default 30
minutes) starts a new session.

Spark-first: lag + cumulative sum over a window partitioned by user.
This is ONE hash shuffle on ``user_id``; any downstream per-user
window or groupBy reuses that partitioning, so a full behavioral query
(sessionize -> per-session agg -> per-user agg) is still one shuffle
of the events table. At 100 TB the only tunables are
shuffle.partitions and AQE skew handling — no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openset_spark.functions.time import epoch_us

DEFAULT_SESSION_GAP_MS = 30 * 60 * 1000


def zorder_key(event_col: Column, event_order: list[str] | None) -> Column:
    """Reference z-order (test/test_zorder.h): same-stamp events sort by
    their position in the table's declared ``event_order`` list; events
    not listed sort after, alphabetically (we use name as tiebreak)."""
    if not event_order:
        return F.lit(0)
    branch = F.when(event_col == event_order[0], 0)
    for i, name in enumerate(event_order[1:], start=1):
        branch = branch.when(event_col == name, i)
    return branch.otherwise(len(event_order))


def user_window(
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_order: list[str] | None = None,
    event_col: str = "event_type",
    id_col: str = "event_id",
):
    """The canonical per-user event ordering used by every sequence op."""
    keys = [F.col(ts_col)]
    if event_order:
        keys.append(zorder_key(F.col(event_col), event_order))
    keys.append(F.col(id_col))
    return Window.partitionBy(user_col).orderBy(*keys)


def with_session(
    df: DataFrame,
    gap_ms: int = DEFAULT_SESSION_GAP_MS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    session_col: str = "session",
    event_order: list[str] | None = None,
) -> DataFrame:
    """Add an enumerated-from-1 ``session`` column per user."""
    w = user_window(user_col, ts_col, event_order)
    prev_ts = F.lag(ts_col).over(w)
    gap = (epoch_us(F.col(ts_col)) - epoch_us(prev_ts)) / 1000
    new_session = F.when(prev_ts.isNull() | (gap > gap_ms), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    gap_ms: int = DEFAULT_SESSION_GAP_MS,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (user, session): event count, span, start/end — groupBy reuses
    the sessionize shuffle partitioning (user_id prefix)."""
    s = with_session(df, gap_ms, user_col, ts_col)
    return s.groupBy(user_col, "session").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (epoch_us(F.max(ts_col)) - epoch_us(F.min(ts_col))) / 1_000_000
        ).alias("span_sec"),
    )
