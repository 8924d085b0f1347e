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


# time_rollup's incremental-refresh twin (22nd parity surface): the
# stream maintains ONLY the finest granularity — a closed finest
# bucket carries decomposable partials (count -> sum, sum -> sum,
# min/max -> min/max), so every coarser level is a pure batch fold of
# the emitted rows, never a second pass over raw events. That is the
# hypertable posture at scale: the streaming job's state is O(open
# finest windows x dims); dashboards read the folded levels.
_WINDOW_DURATION = {
    "second": "1 second",
    "minute": "1 minute",
    "hour": "1 hour",
    "day": "1 day",
}

_FOLD_FNS = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def stream_time_rollup_finest(
    events: DataFrame,
    granularities: tuple[str, ...] = ("day", "hour"),
    ts_col: str = "ts",
    group_by: tuple[str, ...] = ("event_type",),
    aggs: tuple[tuple[str, str, str], ...] = (),
    watermark: str | None = None,
    count_alias: str = "n",
) -> DataFrame:
    """Append-mode tumbling aggregate at the FINEST granularity of a
    time_rollup hierarchy: (bucket_<finest>, group_by..., n, aggs...)
    per closed window. Tumbling ``window()`` alignment equals
    ``date_trunc`` for second/minute/hour/day (both are epoch-aligned
    and epoch is midnight), which is what makes :func:`fold_rollup`
    land on time_rollup's exact bucket values."""
    from openset_spark.operators.events import (
        _AGG_FNS,
        validate_granularities,
    )

    validate_granularities(granularities)
    finest = granularities[-1]
    if finest not in _WINDOW_DURATION:
        raise ValueError(
            f"finest granularity must be one of {sorted(_WINDOW_DURATION)}"
            f" for streaming (week+ buckets are not epoch-aligned):"
            f" {finest}"
        )
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        # window() aligns tumbling windows to the UTC epoch while
        # date_trunc truncates in the session timezone — fold_rollup
        # only lands on time_rollup's buckets when they agree (the
        # repo-wide UTC invariant load_table pins)
        raise ValueError(
            "stream_time_rollup_finest requires a UTC session timezone"
            f" (window()/date_trunc alignment); got {tz!r}"
        )
    for fn, _c, _a in aggs:
        if fn not in _FOLD_FNS:
            raise ValueError(
                f"agg {fn!r} is not fold-decomposable (count/sum/min/max"
                " are); dcount/avg need their own sketch/partial pair"
            )
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    out = events.groupBy(
        F.window(ts_col, _WINDOW_DURATION[finest]).alias("_w"),
        *[F.col(c) for c in group_by],
    ).agg(
        F.count(F.lit(1)).alias(count_alias),
        *[_AGG_FNS[fn](col).alias(alias) for fn, col, alias in aggs],
    )
    return out.select(
        F.col("_w.start").alias(f"bucket_{finest}"),
        *group_by,
        count_alias,
        *[alias for _fn, _c, alias in aggs],
    )


def fold_rollup(
    finest: DataFrame,
    granularities: tuple[str, ...] = ("day", "hour"),
    group_by: tuple[str, ...] = ("event_type",),
    aggs: tuple[tuple[str, str, str], ...] = (),
    count_alias: str = "n",
) -> DataFrame:
    """Batch fold of :func:`stream_time_rollup_finest` output to the
    FULL time_rollup shape (granularity label, bucket hierarchy with
    finer levels NULL, dims, count, aggs) — same GROUPING SETS core,
    same single Expand+Exchange, but over the tiny pre-aggregated
    frame instead of raw events. ``aggs`` is the ORIGINAL spec; each
    aggregate folds with its decomposition (count sums the partial
    counts)."""
    from openset_spark.operators.events import (
        _AGG_FNS,
        grouping_sets_rollup,
        validate_granularities,
    )

    validate_granularities(granularities)
    for fn, _c, _a in aggs:
        if fn not in _FOLD_FNS:
            raise ValueError(
                f"agg {fn!r} is not fold-decomposable (count/sum/min/max"
                " are); dcount/avg need their own sketch/partial pair"
            )
    fcol = f"bucket_{granularities[-1]}"
    pre = finest.withColumns(
        {
            f"bucket_{g}": F.date_trunc(g, F.col(fcol))
            for g in granularities[:-1]
        }
    )
    exprs = [F.sum(count_alias).alias(count_alias)]
    exprs += [
        _AGG_FNS[_FOLD_FNS[fn]](alias).alias(alias)
        for fn, _c, alias in aggs
    ]
    return grouping_sets_rollup(
        pre, granularities, group_by, exprs,
        out_cols=[count_alias] + [alias for _fn, _c, alias in aggs],
    )
