"""Shared plumbing for the sliding-sketch family (hll / hdrhist /
cms / kmv and engine.sliding_counts): parameter validation and the
dense min..max slide spine. One definition — the r12 stream-parity
fix showed what an inline copy of this block costs when one copy
drifts (the 32nd surface silently diverged when the batch spine
densified)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SLIDE_SECONDS = {"hour": 3600, "day": 86400}


def check_slide(slide: str, window: int) -> int:
    """Validate (slide, window) BEFORE any data is touched — a bad
    parameter must never cost a scan — and return the slide width in
    seconds (the range-frame unit)."""
    if slide not in _SLIDE_SECONDS:
        raise ValueError(f"slide must be hour|day: {slide}")
    if window < 1:
        raise ValueError(f"window must be >= 1 slide points: {window}")
    return _SLIDE_SECONDS[slide]


def dense_spine(parts: DataFrame, tb_col: str, slide: str) -> DataFrame:
    """The FULL min..max bucket sequence of ``parts`` (one 1-row
    bounds aggregate + sequence explode) — dense, so a slide point
    with zero events still reports its non-empty trailing window;
    empty input yields an empty spine."""
    return parts.agg(
        F.min(tb_col).alias("_lo"), F.max(tb_col).alias("_hi")
    ).select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"interval 1 {slide}"))
        ).alias(tb_col)
    )
