"""Batch queries — ``POST /v1/query/{table}/batch``
(docs/rest/README.md:379-418): many segment, property and histogram
queries submitted together, producing one combined result.

The reference runs the batch as one pass over each customer. The
Spark-first equivalent: every sub-query is a small aggregate over the
SAME cached events scan, and segment membership is computed ONCE and
shared — ``@use``-listed segments become conditional distinct counts
inside the property aggregates (no per-segment re-scan), histograms
reuse the per-user scalars. Catalyst reuses the cached scan across
all sub-plans, so the whole batch costs one read plus k tiny
shuffles.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openset_spark.operators.histogram import histogram, histogram_by
from openset_spark.operators.property_counts import (
    property_counts,
    property_counts_by_segment,
)
from openset_spark.operators.segments import Segment, membership, segment_counts


@dataclass(frozen=True)
class PropertySpec:
    """``@property name [bucket=]`` line of a batch script."""

    prop: str
    bucket: float | None = None
    value_filter: Column | None = None


@dataclass(frozen=True)
class HistogramSpec:
    """``@histogram name [bucket=] [min=] [max=] [foreach=]``: the
    per-user scalar is a callable events -> (user_id, value) frame —
    the analog of the script's ``return(...)`` body."""

    name: str
    scalar: Callable[[DataFrame], DataFrame]
    bucket: float = 1.0
    min_value: float | None = None
    max_value: float | None = None
    foreach: str | None = None  # group column present in the scalar frame


@dataclass(frozen=True)
class BatchQuery:
    segments: tuple[Segment, ...] = ()
    use: tuple[str, ...] = ()  # @use: segments applied to property counts
    properties: tuple[PropertySpec, ...] = ()
    histograms: tuple[HistogramSpec, ...] = ()


def run_batch(events: DataFrame, batch: BatchQuery) -> dict[str, DataFrame]:
    """Execute a batch: {'segments': df, 'property:<p>': df,
    'histogram:<name>': df, '_cached': [handles]}. The events scan
    (and shared membership, if any) are cached for the span of the
    batch; the '_cached' entry holds them so the caller can
    ``unpersist()`` after collecting — otherwise repeated batches
    accumulate cached frames for the session lifetime."""
    out: dict[str, DataFrame] = {}
    events = events.cache()
    cached = [events]
    out["_cached"] = cached

    m: DataFrame | None = None
    if batch.segments:
        m = membership(events, list(batch.segments)).cache()
        cached.append(m)
        out["segments"] = segment_counts(
            events, list(batch.segments), membership_df=m
        )

    for spec in batch.properties:
        if batch.use and m is not None:
            df = property_counts_by_segment(
                events, spec.prop, m, list(batch.use), bucket=spec.bucket
            )
        else:
            df = property_counts(
                events, spec.prop, bucket=spec.bucket, value_filter=spec.value_filter
            )
        out[f"property:{spec.prop}"] = df

    for h in batch.histograms:
        per_user = h.scalar(events)
        if h.foreach is not None:
            out[f"histogram:{h.name}"] = histogram_by(
                per_user,
                value_col=[c for c in per_user.columns if c not in ("user_id", h.foreach)][0],
                group_col=h.foreach,
                bucket=h.bucket,
                max_value=h.max_value,
                name=h.name,
            )
        else:
            value_col = [c for c in per_user.columns if c != "user_id"][0]
            out[f"histogram:{h.name}"] = histogram(
                per_user,
                value_col,
                bucket=h.bucket,
                min_value=h.min_value,
                max_value=h.max_value,
                name=h.name,
            )
    return out
