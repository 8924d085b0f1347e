"""Streaming windowed event aggregation — the live analog of the
batch event-query engine: per-window event counts and people counts
maintained incrementally as inserts arrive (the reference recomputes
queries over its in-memory grid on demand; a Spark deployment keeps
the rolling aggregates as a stream).

Watermarked tumbling windows in append mode: a window emits once the
watermark passes its end, so late events inside the allowed lateness
still count and state is bounded (closed windows are dropped).
Distinct people per window uses ``approx_count_distinct`` — an exact
streaming distinct would hold every user id in state forever; HLL
sketches keep state O(windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_property_counts(
    events: DataFrame,
    prop: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Live property counts — the streaming analog of
    ``GET /v1/query/{t}/property/{p}``: (value, people~, events)
    maintained incrementally. Run with ``outputMode("complete")`` (the
    result IS the running total per value); people uses HLL for the
    same bounded-state reason as the windowed aggregate. State is
    O(distinct property values)."""
    return (
        events.filter(F.col(prop).isNotNull())
        .groupBy(F.col(prop).alias("value"))
        .agg(
            F.approx_count_distinct(user_col).alias("people"),
            F.count(F.lit(1)).alias("events"),
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = None,
    by_event_type: bool = False,
) -> DataFrame:
    """(window_start, window_end[, event_type], events, people~) per
    tumbling window, append-mode-safe.

    ``watermark=None`` keeps the upstream watermark (ingest.py sets a
    1-hour one; redefining a watermark is disallowed in Spark)."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    keys = [F.window("ts", window_duration).alias("w")]
    if by_event_type:
        keys.append(F.col("event_type"))
    out = (
        events.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.approx_count_distinct("user_id").alias("people"),
        )
    )
    cols = [
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
    ]
    if by_event_type:
        cols.append(F.col("event_type"))
    return out.select(*cols, "events", "people")
