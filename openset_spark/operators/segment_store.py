"""Named segment store with the reference's refresh policy surface.

The reference's ``/v1/query/{table}/counts`` endpoint creates NAMED,
CACHED segments with per-segment policy params
(docs/rest/README.md:260-270):

    ttl=         seconds a cached membership may exist at all
    refresh=     seconds before a cached membership goes stale
    use_cached=  serve the cached value while inside the refresh window
    on_insert=   re-evaluate the moment data is inserted (subscribers)
    z_index=     evaluation order, so derived segments (union /
                 intersection of earlier ones) see their inputs

and segments are then usable BY NAME in the ``segments=`` parameter of
every other query type.

Spark-first mapping: a membership frame is one boolean column per
segment keyed by user — the analog of the reference's index bitmaps
(src/oloop_segment.cpp). Policy is metadata around when that frame is
(re)computed:

- full compute: one conditional-aggregate shuffle over events
  (``operators/segments.py::membership``) — never per-segment scans.
- stale + monotone (ever/never): INCREMENTAL refresh — scan only the
  DELTA of events appended since the last compute watermark and fold
  it into the cached frame (``refresh_membership``,
  src/oloop_seg_refresh.cpp). At 100 TB this is the difference between
  re-reading history and reading one day's partition.
- stale sequence segments: recompute (ordered steps are not monotone
  over appends); the streaming analog (`streaming/funnel.py`) is the
  live path.
- ``on_insert=true``: handled by Structured Streaming —
  ``stream_transitions`` wires the same named segments into
  ``streaming/segments_stream.py`` so memberships re-evaluate per
  micro-batch and emit enter/exit transitions (the reference's
  subscriber notifications, src/message_broker.cpp).

The store takes time as an argument (``now_ms``) rather than reading a
wall clock: the driver/tests control the clock, and the delta filter
``ts > watermark`` stays deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.time import epoch_us

from openset_spark.operators.segments import (
    Segment,
    membership,
    refresh_membership,
    sequence_membership,
)


@dataclass
class SegmentPolicy:
    """docs/rest/README.md:262-270 ``@segment`` params."""

    ttl_s: float | None = None
    refresh_s: float | None = None
    use_cached: bool = True
    on_insert: bool = False
    z_index: int = 100


@dataclass
class _Entry:
    policy: SegmentPolicy
    segment: Segment | None = None  # ever/never predicate segment
    steps: list[Column] | None = None  # ordered-sequence segment
    derive: Callable[[DataFrame], Column] | None = None  # algebra
    # arbitrary membership compute (events -> [user, name bool]);
    # refresh == recompute (e.g. compiled @segment compound exprs)
    compute: Callable[[DataFrame], DataFrame] | None = None
    within_ms: int | None = None
    # pandas predicate for the on_insert streaming path (Column
    # predicates drive the batch path; streams are pandas-batched)
    stream_predicate: Callable | None = None
    # cache state
    cached: DataFrame | None = field(default=None, repr=False)
    computed_at_ms: int | None = None
    watermark_ms: int | None = None  # delta boundary for refresh


class SegmentStore:
    """Named segments + policy over one events table.

    ``events_fn()`` must return the CURRENT events frame (so appends
    between calls are visible, as they are to the reference's insert
    path). Memberships are cached Spark DataFrames (`.cache()`), one
    boolean column per segment — the bitmap analog.
    """

    def __init__(
        self,
        events_fn: Callable[[], DataFrame],
        user_col: str = "user_id",
        ts_col: str = "ts",
        ingest_col: str | None = None,
    ) -> None:
        self._events_fn = events_fn
        self.user_col = user_col
        self.ts_col = ts_col
        # Delta boundary column for incremental refresh. The watermark
        # is the max value ACTUALLY FOLDED on the last compute — never
        # the policy clock: a row appended with an event stamp at or
        # before the previous compute's `now` (ingestion lag, late
        # arrival) must still be folded by the next refresh.
        # With the default event-time column that leaves one documented
        # assumption: appends carry stamps >= the max stamp already
        # folded (true for ordinary ingestion; NOT for historical
        # backfills). Passing ``ingest_col`` naming a monotonically
        # increasing append id (the analog of the reference's insert
        # log position) removes the assumption entirely.
        self.ingest_col = ingest_col
        self._entries: dict[str, _Entry] = {}

    # -- definition ---------------------------------------------------
    def define(
        self, segment: Segment, stream_predicate: Callable | None = None,
        **policy,
    ) -> None:
        """``@segment name <params>`` with an ever/never predicate.

        ``stream_predicate`` (pd.DataFrame -> pd.Series[bool]) is the
        same rule for the ``on_insert`` streaming path — required only
        if ``on_insert=True`` and the segment should stream."""
        self._entries[segment.name] = _Entry(
            policy=SegmentPolicy(**policy),
            segment=segment,
            stream_predicate=stream_predicate,
        )

    def define_sequence(
        self,
        name: str,
        steps: list[Column],
        within_ms: int | None = None,
        **policy,
    ) -> None:
        """Ordered-sequence segment (``A then B`` scripts)."""
        self._entries[name] = _Entry(
            policy=SegmentPolicy(**policy), steps=steps, within_ms=within_ms
        )

    def define_custom(
        self,
        name: str,
        compute: Callable[[DataFrame], DataFrame],
        **policy,
    ) -> None:
        """Segment backed by an arbitrary membership computation
        ``events -> DataFrame[user_col, name: boolean]`` (e.g. a
        compiled ``@segment`` expression). Not monotone-refreshable:
        stale -> recompute (one scan)."""
        self._entries[name] = _Entry(
            policy=SegmentPolicy(**policy), compute=compute
        )

    def define_derived(
        self,
        name: str,
        derive: Callable[[DataFrame], Column],
        **policy,
    ) -> None:
        """Segment algebra over other segments' columns; give it a
        ``z_index`` above its inputs (docs/rest/README.md:270)."""
        policy.setdefault("z_index", 200)
        self._entries[name] = _Entry(
            policy=SegmentPolicy(**policy), derive=derive
        )

    def names(self) -> list[str]:
        return list(self._entries)

    # -- evaluation ---------------------------------------------------
    def _stale(self, e: _Entry, now_ms: int) -> str:
        """'fresh' | 'refresh' | 'expired' per ttl/refresh/use_cached."""
        if e.cached is None or e.computed_at_ms is None:
            return "expired"
        age_s = (now_ms - e.computed_at_ms) / 1000.0
        if e.policy.ttl_s is not None and age_s >= e.policy.ttl_s:
            return "expired"
        if e.policy.refresh_s is not None and age_s >= e.policy.refresh_s:
            return "refresh"
        if not e.policy.use_cached:
            return "refresh"
        return "fresh"

    def _boundary(self) -> Column:
        if self.ingest_col is not None:
            return F.col(self.ingest_col)
        return (epoch_us(F.col(self.ts_col)) / 1000).cast("long")

    def _max_boundary(self, df: DataFrame) -> int | None:
        """Max boundary value in ``df`` — one tiny aggregate; over a
        parquet layout this reads row-group stats, not data, once
        aggregate pushdown applies, and on the refresh path it scans
        only the delta anyway."""
        return df.agg(F.max(self._boundary())).first()[0]

    def _compute(self, e: _Entry, name: str, now_ms: int) -> DataFrame:
        events = self._events_fn()
        state = self._stale(e, now_ms)
        if state == "fresh":
            return e.cached  # type: ignore[return-value]
        wm: int | None = None
        if (
            e.segment is not None
            and state == "refresh"
            and e.watermark_ms is not None
        ):
            # monotone ever/never: fold ONLY the delta appended since
            # the last fold. ``>=`` (not ``>``): rows can share the
            # boundary value with rows already folded, and ever/never
            # folds are idempotent, so re-folding the boundary is
            # harmless while ``>`` would silently skip same-stamp
            # appends forever.
            delta = events.filter(self._boundary() >= F.lit(e.watermark_ms))
            new = refresh_membership(
                e.cached, delta, [e.segment], self.user_col
            )
            dmax = self._max_boundary(delta)
            wm = e.watermark_ms if dmax is None else max(e.watermark_ms, dmax)
        elif e.segment is not None:
            new = membership(events, [e.segment], self.user_col)
        elif e.steps is not None:
            # sequences are not monotone-refreshable: recompute
            new = sequence_membership(
                events, {name: e.steps}, self.user_col, within_ms=e.within_ms
            )
        elif e.compute is not None:
            new = self._call_compute(e.compute, events, now_ms)
        else:  # pragma: no cover - derived handled in membership()
            raise ValueError(f"derived segment {name} needs its inputs")
        if wm is None and e.segment is not None:
            # full compute folded everything currently present: the
            # watermark is the max boundary actually observed, NOT the
            # policy clock (which may run ahead of or behind the data)
            wm = self._max_boundary(events)
        new = new.cache()
        if e.cached is not None:
            e.cached.unpersist()
        e.cached = new
        e.computed_at_ms = now_ms
        e.watermark_ms = wm
        return new

    @staticmethod
    def _call_compute(
        fn: Callable, events: DataFrame, now_ms: int
    ) -> DataFrame:
        """Custom computes may declare a ``now_ms`` parameter to pin
        now-anchored windows (stamp.within(.., now)) to the caller's
        clock; computes without one stay supported."""
        import inspect

        try:
            takes_now = "now_ms" in inspect.signature(fn).parameters
        except (TypeError, ValueError):  # builtins / C callables
            takes_now = False
        return fn(events, now_ms=now_ms) if takes_now else fn(events)

    def membership(
        self, names: list[str] | None = None, now_ms: int = 0
    ) -> DataFrame:
        """Per-user membership frame for the named segments,
        (re)computing each per its policy. Derived segments evaluate
        after their inputs in ``z_index`` order, as one column
        projection over the joined frame (bitmap algebra analog)."""
        names = names or self.names()
        order = sorted(
            names, key=lambda n: (self._entries[n].policy.z_index, n)
        )
        out: DataFrame | None = None
        pending_fills: dict[str, bool] = {}
        for n in order:
            e = self._entries[n]
            if e.derive is not None:
                assert out is not None, f"derived {n} listed before inputs"
                if pending_fills:  # outer-join nulls resolve BEFORE algebra
                    out = out.na.fill(pending_fills)
                    pending_fills = {}
                out = out.withColumn(n, e.derive(out))
                continue
            m = self._compute(e, n, now_ms)
            out = m if out is None else out.join(m, self.user_col, "outer")
            pending_fills[n] = (
                e.segment is not None and e.segment.mode == "never"
            )
        assert out is not None, "no segments requested"
        return out.na.fill(pending_fills) if pending_fills else out

    def counts(
        self, names: list[str] | None = None, now_ms: int = 0
    ) -> DataFrame:
        """``/counts`` response: people per named segment."""
        m = self.membership(names, now_ms)
        segs = [c for c in m.columns if c != self.user_col]
        agg = m.agg(
            *[
                F.sum(F.col(n).cast("long")).cast("long").alias(n)
                for n in segs
            ]
        )
        return agg.selectExpr(
            f"stack({len(segs)}, "
            + ", ".join(f"'{n}', {n}" for n in segs)
            + ") as (segment, people)"
        )

    def users(self, name: str, now_ms: int = 0) -> DataFrame:
        """Members of one segment — the frame behind ``segments=``
        scoping in other queries (small per-user frame; broadcast- or
        semi-join-friendly)."""
        m = self.membership(None, now_ms) if self._entries[
            name
        ].derive is not None else self.membership([name], now_ms)
        return m.filter(F.col(name)).select(self.user_col)

    # -- on_insert: streaming transitions ----------------------------
    def stream_transitions(self, stream_df: DataFrame, **kw) -> DataFrame:
        """Wire every ``on_insert=true`` ever/never segment into the
        streaming evaluator: per-micro-batch re-evaluation emitting
        enter/exit rows (the reference's subscriber path)."""
        from openset_spark.streaming.segments_stream import (
            StreamSegment,
            stream_segment_transitions,
        )

        live = [
            (n, e)
            for n, e in self._entries.items()
            if e.policy.on_insert and e.segment is not None
        ]
        if not live:
            raise ValueError("no on_insert=true predicate segments defined")
        missing = [n for n, e in live if e.stream_predicate is None]
        if missing:
            raise ValueError(
                f"on_insert segments need stream_predicate: {missing}"
            )
        segs = [
            StreamSegment(n, e.stream_predicate, e.segment.mode)
            for n, e in live
        ]
        return stream_segment_transitions(stream_df, segs, **kw)
