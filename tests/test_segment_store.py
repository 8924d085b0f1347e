"""Segment refresh policy surface (docs/rest/README.md:260-270):
named cached segments with ttl/refresh/use_cached/on_insert/z_index,
incremental refresh over the event delta, and ``segments=`` scoping on
the other engine endpoints."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from openset_spark.operators import segment_store as store_mod
from openset_spark.operators.segment_store import SegmentStore
from openset_spark.operators.segments import Segment, membership

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
MS = 1000


def _events(spark, rows):
    # rows: (user_id, event_type, offset_seconds)
    return spark.createDataFrame(
        [
            (uid, int(off), et, T0.replace(second=0).fromtimestamp(
                T0.timestamp() + off, tz=timezone.utc
            ))
            for uid, et, off in rows
        ],
        "user_id long, event_id long, event_type string, ts timestamp",
    )


@pytest.fixture
def mutable_source(spark):
    """events_fn closure whose contents grow between calls, like the
    reference's insert path."""
    state = {"rows": [(1, "view", 0), (2, "purchase", 1)]}

    def events_fn():
        return _events(spark, state["rows"])

    return state, events_fn


def _memb(store, now_s):
    return {
        (r["user_id"]): {c: r[c] for c in r.asDict() if c != "user_id"}
        for r in store.membership(now_ms=now_s * MS).collect()
    }


def test_refresh_scans_only_delta_and_matches_recompute(
    spark, mutable_source, monkeypatch
):
    state, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define(
        Segment("buyers", F.col("event_type") == "purchase"), refresh_s=60
    )

    assert _memb(store, 0) == {1: {"buyers": False}, 2: {"buyers": True}}

    # append a delta: user 1 buys at t=100s
    state["rows"] = state["rows"] + [(1, "purchase", 100)]

    calls = {"refresh": 0, "full": 0}
    real_refresh, real_full = store_mod.refresh_membership, store_mod.membership

    def spy_refresh(*a, **k):
        calls["refresh"] += 1
        return real_refresh(*a, **k)

    def spy_full(*a, **k):
        calls["full"] += 1
        return real_full(*a, **k)

    monkeypatch.setattr(store_mod, "refresh_membership", spy_refresh)
    monkeypatch.setattr(store_mod, "membership", spy_full)

    # 61s later: past the refresh window -> INCREMENTAL path
    got = _memb(store, 61)
    assert calls == {"refresh": 1, "full": 0}
    full = {
        r["user_id"]: {"buyers": r["buyers"]}
        for r in membership(
            events_fn(), [Segment("buyers", F.col("event_type") == "purchase")]
        ).collect()
    }
    assert got == full == {1: {"buyers": True}, 2: {"buyers": True}}


def test_refresh_folds_late_arriving_rows(spark, mutable_source):
    """The watermark is the max FOLDED event stamp, not the policy
    clock: an append stamped before the previous compute's ``now``
    (ingestion lag, late arrival) must still fold into the next
    incremental refresh or refresh diverges from a recompute forever."""
    state, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define(
        Segment("buyers", F.col("event_type") == "purchase"), refresh_s=60
    )
    # the policy clock runs WAY ahead of event time (wall clock vs a
    # dataset whose newest stamp is T0+1s)
    now0 = int(T0.timestamp()) + 10_000
    assert _memb(store, now0) == {1: {"buyers": False}, 2: {"buyers": True}}
    # late append: stamped +50s — far BEFORE the previous now, just
    # after the max folded stamp
    state["rows"] = state["rows"] + [(1, "purchase", 50)]
    assert _memb(store, now0 + 61) == {
        1: {"buyers": True},
        2: {"buyers": True},
    }


def test_refresh_folds_same_stamp_appends(spark, mutable_source):
    """Appends sharing the boundary stamp with already-folded rows must
    not be skipped (the delta filter is >=, safe because ever/never
    folds are idempotent)."""
    state, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define(
        Segment("buyers", F.col("event_type") == "purchase"), refresh_s=60
    )
    _memb(store, 0)
    # user 3 buys with ts EXACTLY equal to the max already-folded stamp
    state["rows"] = state["rows"] + [(3, "purchase", 1)]
    assert _memb(store, 61)[3] == {"buyers": True}


def test_refresh_with_ingest_col_folds_historical_backfill(spark):
    """An explicit monotone ingest id (the reference's insert-log
    position analog) makes incremental refresh exact even for
    backfills stamped arbitrarily far in the past."""
    state = {"rows": [(1, "view", 0, 1), (2, "purchase", 1, 2)]}

    def events_fn():
        return spark.createDataFrame(
            [
                (uid, int(off), et, T0.fromtimestamp(
                    T0.timestamp() + off, tz=timezone.utc
                ), ing)
                for uid, et, off, ing in state["rows"]
            ],
            "user_id long, event_id long, event_type string, ts timestamp,"
            " ingest_id long",
        )

    store = SegmentStore(events_fn, ingest_col="ingest_id")
    store.define(
        Segment("buyers", F.col("event_type") == "purchase"), refresh_s=60
    )
    assert _memb(store, 0) == {1: {"buyers": False}, 2: {"buyers": True}}
    # backfill: user 1's purchase stamped 1000s BEFORE every folded row,
    # but with a later ingest id
    state["rows"] = state["rows"] + [(1, "purchase", -1000, 3)]
    assert _memb(store, 61)[1] == {"buyers": True}


def test_use_cached_serves_stale_inside_window(spark, mutable_source):
    state, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define(
        Segment("buyers", F.col("event_type") == "purchase"),
        refresh_s=60,
        use_cached=True,
    )
    assert _memb(store, 0)[1] == {"buyers": False}
    state["rows"] = state["rows"] + [(1, "purchase", 5)]
    # 10s later: inside the refresh window -> cached (stale) value
    assert _memb(store, 10)[1] == {"buyers": False}
    # use_cached=False forces re-evaluation even inside the window
    store2 = SegmentStore(events_fn)
    store2.define(
        Segment("buyers", F.col("event_type") == "purchase"),
        refresh_s=60,
        use_cached=False,
    )
    assert _memb(store2, 0)[1] == {"buyers": True}


def test_ttl_expiry_forces_full_recompute(spark, mutable_source, monkeypatch):
    state, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define(
        Segment("buyers", F.col("event_type") == "purchase"),
        refresh_s=60,
        ttl_s=300,
    )
    _memb(store, 0)

    calls = {"refresh": 0, "full": 0}
    real_refresh, real_full = store_mod.refresh_membership, store_mod.membership
    monkeypatch.setattr(
        store_mod,
        "refresh_membership",
        lambda *a, **k: (calls.__setitem__("refresh", calls["refresh"] + 1),
                         real_refresh(*a, **k))[1],
    )
    monkeypatch.setattr(
        store_mod,
        "membership",
        lambda *a, **k: (calls.__setitem__("full", calls["full"] + 1),
                         real_full(*a, **k))[1],
    )
    _memb(store, 301)  # past ttl -> expired -> full compute
    assert calls == {"refresh": 0, "full": 1}


def test_never_segment_refresh(spark, mutable_source):
    state, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define(
        Segment("non_buyers", F.col("event_type") == "purchase", mode="never"),
        refresh_s=60,
    )
    assert _memb(store, 0) == {
        1: {"non_buyers": True},
        2: {"non_buyers": False},
    }
    state["rows"] = state["rows"] + [(1, "purchase", 100), (3, "view", 101)]
    got = _memb(store, 61)
    # never can only turn false on new data; new user 3 joins true
    assert got == {
        1: {"non_buyers": False},
        2: {"non_buyers": False},
        3: {"non_buyers": True},
    }


def test_derived_z_index_algebra(spark, mutable_source):
    _, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define(Segment("buyers", F.col("event_type") == "purchase"))
    store.define(Segment("viewers", F.col("event_type") == "view"))
    store.define_derived(
        "engaged", lambda m: m["buyers"] | m["viewers"], z_index=200
    )
    got = _memb(store, 0)
    assert got[1] == {"buyers": False, "viewers": True, "engaged": True}
    assert got[2] == {"buyers": True, "viewers": False, "engaged": True}

    counts = {
        r["segment"]: r["people"] for r in store.counts().collect()
    }
    assert counts == {"buyers": 1, "viewers": 1, "engaged": 2}


def test_sequence_segment_recomputes(spark, mutable_source):
    state, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define_sequence(
        "view_then_buy",
        [F.col("event_type") == "view", F.col("event_type") == "purchase"],
        refresh_s=60,
    )
    assert _memb(store, 0)[1] == {"view_then_buy": False}
    state["rows"] = state["rows"] + [(1, "purchase", 100)]
    assert _memb(store, 61)[1] == {"view_then_buy": True}


def test_on_insert_requires_stream_predicate(spark, mutable_source):
    _, events_fn = mutable_source
    store = SegmentStore(events_fn)
    store.define(
        Segment("buyers", F.col("event_type") == "purchase"), on_insert=True
    )
    with pytest.raises(ValueError, match="stream_predicate"):
        store.stream_transitions(None)


def test_engine_segments_param_scopes_queries(spark):
    from openset_spark.engine import OpenSetEngine

    eng = OpenSetEngine(spark, "/root/testdata/sf0.001")
    eng.segment_store.define(
        Segment("buyers", F.col("event_type") == "purchase")
    )
    scoped = eng.event_query(
        ["event_type"], [("count", "*", "events")], segments=["buyers"]
    )
    buyers = set(
        r["user_id"]
        for r in membership(
            eng.events, [Segment("buyers", F.col("event_type") == "purchase")]
        )
        .filter("buyers")
        .collect()
    )
    manual = eng.events.join(
        spark.createDataFrame([(u,) for u in buyers], "user_id long"),
        "user_id",
        "semi",
    )
    want = {
        (r["event_type"], r["events"])
        for r in manual.groupBy("event_type")
        .agg(F.count("*").alias("events"))
        .collect()
    }
    got = {(r["event_type"], r["events"]) for r in scoped.collect()}
    assert got == want
