"""@segment /counts scripts (docs/rest/README.md:258-300) compiled to
one-shuffle membership plans and registered into the SegmentStore with
their policy params."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from openset_spark.osl import (
    OslUnsupported,
    compile_osl,
    compile_osl_segments,
    parse_segments,
)

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

# the reference docs' own example, verbatim (docs/rest/README.md:275-290)
DOCS_SCRIPT = """
@segment products_home use_cached=false refresh=5_minutes on_insert=true

# match one of these
if product_group.ever(any ['basement', 'garage', 'kitchen', 'bedroom', 'bathroom'])
  return(true)
end

@segment products_yard use_cached=True refresh=5_minutes on_insert=true

# match one of these
if product_group.ever(contains 'basement') || product_group.ever(contains 'garage')
  return(true)
end
"""


@pytest.fixture(scope="module")
def shop_events(spark):
    rows = [
        # user, event_id, event_type, product_group (set property)
        (1, 0, "purchase", ["kitchen", "cutlery"]),
        (1, 1, "view", ["lawn"]),
        (2, 2, "purchase", ["garage", "tools"]),
        (3, 3, "view", ["office"]),
        (4, 4, "purchase", []),
    ]
    return spark.createDataFrame(
        [(u, e, t, T0, g) for u, e, t, g in rows],
        "user_id long, event_id long, event_type string, ts timestamp,"
        " product_group array<string>",
    )


def test_docs_script_parses_with_policies():
    defs = parse_segments(DOCS_SCRIPT)
    assert [d.name for d in defs] == ["products_home", "products_yard"]
    assert defs[0].params == {
        "use_cached": False, "refresh_s": 300.0, "on_insert": True,
    }
    assert defs[1].params["use_cached"] is True


def test_docs_script_membership_and_counts(shop_events):
    segs = compile_osl_segments(DOCS_SCRIPT)
    m = {
        r["user_id"]: (r["products_home"], r["products_yard"])
        for r in segs.membership(shop_events).collect()
    }
    # kitchen -> home only; garage -> home (any) and yard (contains)
    assert m == {
        1: (True, False),
        2: (True, True),
        3: (False, False),
        4: (False, False),
    }
    counts = {
        r["segment"]: r["people"]
        for r in segs.counts(shop_events).collect()
    }
    assert counts == {"products_home": 2, "products_yard": 1}


def test_membership_is_single_aggregation(shop_events):
    # all segments evaluate in ONE shuffle: exactly one HashAggregate
    # keyed by user_id feeding the projection (bitmap-composition
    # analog; never N scans for N segments)
    segs = compile_osl_segments(DOCS_SCRIPT)
    plan = segs.membership(shop_events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_word_cmps_in_each_row(spark):
    # scalar in [list] (test_osl_language.h:236 shape) + substring
    # contains (test_db.h:585 referral_search)
    df = spark.createDataFrame(
        [
            (1, 0, "purchase", T0, "red dogs"),
            (1, 1, "view", T0, "blue cats"),
            (2, 2, "purchase", T0, "green birds"),
        ],
        "user_id long, event_id long, event_type string, ts timestamp,"
        " referral_search string",
    )
    q = compile_osl(
        'each_row where event in ["purchase", "signup"]\n'
        "  debug(true)\nend"
    )
    assert q.matched(df).count() == 2
    q2 = compile_osl(
        'each_row where referral_search.ever(contains "red")\n'
        "  debug(true)\nend"
    )
    # user 1 ever-matched the substring -> all of user 1's rows
    assert q2.matched(df).count() == 2


def test_register_simple_keeps_incremental_refresh(spark, monkeypatch):
    from openset_spark.operators import segment_store as store_mod
    from openset_spark.operators.segment_store import SegmentStore

    state = {
        "rows": [(1, 0, "view"), (2, 1, "purchase")]
    }

    def events_fn():
        return spark.createDataFrame(
            [(u, e, t, T0) for u, e, t in state["rows"]],
            "user_id long, event_id long, event_type string, ts timestamp",
        )

    store = SegmentStore(events_fn)
    segs = compile_osl_segments(
        "@segment buyers refresh=60\n"
        'if event.ever(== "purchase")\n  return(true)\nend\n'
        "@segment active refresh=60\n"
        'if event.ever(any ["view", "purchase"]) && event.never(== "error")\n'
        "  return(true)\nend"
    )
    segs.register(store)

    m0 = {r["user_id"]: r["buyers"] for r in store.membership(["buyers"]).collect()}
    assert m0 == {1: False, 2: True}

    state["rows"] = state["rows"] + [(1, 2, "purchase")]
    calls = {"refresh": 0}
    real = store_mod.refresh_membership
    monkeypatch.setattr(
        store_mod,
        "refresh_membership",
        lambda *a, **k: (calls.__setitem__("refresh", calls["refresh"] + 1),
                         real(*a, **k))[1],
    )
    m1 = {
        r["user_id"]: r["buyers"]
        for r in store.membership(["buyers"], now_ms=61_000).collect()
    }
    assert calls["refresh"] == 1  # simple pred kept the delta-only path
    assert m1 == {1: True, 2: True}

    # compound (word-op + never) segment registered as custom compute;
    # refresh recomputes and matches a from-scratch compile
    m2 = {
        r["user_id"]: r["active"]
        for r in store.membership(["active"], now_ms=61_000).collect()
    }
    full = {
        r["user_id"]: r["active"]
        for r in segs.membership(
            events_fn(), defs=[d for d in segs.defs if d.name == "active"]
        ).collect()
    }
    assert m2 == full == {1: True, 2: True}


def test_registered_window_segment_pins_callers_now(spark):
    """A now-anchored window inside a registered @segment must evaluate
    against the now_ms the store's caller pins — not the wall clock —
    so counts_query(now_ms=X) is deterministic (matches the batch
    path's shared-now behavior)."""
    from openset_spark.operators.segment_store import SegmentStore

    df = spark.createDataFrame(
        [(1, 0, "purchase", T0), (2, 1, "view", T0)],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    store = SegmentStore(lambda: df)
    segs = compile_osl_segments(
        "@segment recent use_cached=false\n"
        'if event.within(3600000, now).ever(== "purchase")\n'
        "  return(true)\nend"
    )
    segs.register(store)
    t0_ms = int(T0.timestamp() * 1000)

    def memb(now_ms):
        return {
            r["user_id"]: r["recent"]
            for r in store.membership(["recent"], now_ms=now_ms).collect()
        }

    # now pinned inside the window -> member; pinned 10 days out -> not.
    # Wall-clock evaluation would return False for both (T0 is 2024).
    assert memb(t0_ms + 60_000) == {1: True, 2: False}
    assert memb(t0_ms + 10 * 86_400_000) == {1: False, 2: False}


def test_engine_counts_query(spark):
    from openset_spark.engine import OpenSetEngine

    eng = OpenSetEngine(spark, "/root/testdata/sf0.001")
    out = eng.counts_query(
        "@segment purchasers use_cached=True refresh=5_minutes\n"
        'if event.ever(== "purchase")\n  return(true)\nend'
    )
    got = {r["segment"]: r["people"] for r in out.collect()}
    want = (
        eng.events.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct().count()
    )
    assert got == {"purchasers": want}
    # and the named segment now scopes other endpoints
    scoped = eng.event_query(["event_type"], segments=["purchasers"])
    assert scoped.count() > 0


def test_segment_script_rejected_by_query_parser():
    with pytest.raises(OslUnsupported, match="counts"):
        compile_osl(DOCS_SCRIPT)


# ------------------------------------------- histogram return(expr)
def test_histogram_script_weeks_since(spark):
    from openset_spark.osl import compile_osl_histogram

    WEEK = 7 * 24 * 3600 * 1000
    df = spark.createDataFrame(
        [
            (1, 0, "view", datetime(2024, 1, 1, tzinfo=timezone.utc)),
            (1, 1, "view", datetime(2024, 1, 15, tzinfo=timezone.utc)),
            (2, 2, "view", datetime(2024, 1, 1, tzinfo=timezone.utc)),
        ],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    now_ms = int(datetime(2024, 1, 29, tzinfo=timezone.utc).timestamp() * 1000)
    h = compile_osl_histogram(
        "# return number of weeks since last event\n"
        "return( to_weeks(now - last_stamp) )"
    )
    per_user = {
        r["user_id"]: r["value"]
        for r in h.per_user(df, now_ms=now_ms).collect()
    }
    assert per_user == {1: 2, 2: 4}  # 14 and 28 days back
    hist = {
        r["value"]: r["people"]
        for r in h.histogram(df, bucket=1.0, now_ms=now_ms).collect()
    }
    # interior gap zero-fills (reference jsonResultHistogramFill)
    assert hist == {2.0: 1, 3.0: 0, 4.0: 1}


def test_histogram_script_arithmetic_and_rowcount(spark):
    from openset_spark.osl import compile_osl_histogram

    df = spark.createDataFrame(
        [(1, i, "view", T0) for i in range(5)]
        + [(2, 9, "view", T0)],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    h = compile_osl_histogram("return( row_count * 10 + 1 )")
    got = {
        r["user_id"]: r["value"]
        for r in h.per_user(df, now_ms=0).collect()
    }
    assert got == {1: 51, 2: 11}


def test_histogram_script_rejects_unknown_names(spark):
    from openset_spark.osl import compile_osl_histogram

    df = spark.createDataFrame(
        [(1, 0, "view", T0)],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    h = compile_osl_histogram("return( price * 2 )")
    with pytest.raises(OslUnsupported, match="price"):
        h.per_user(df, now_ms=0)


def test_engine_histogram_query(spark):
    from openset_spark.engine import OpenSetEngine

    eng = OpenSetEngine(spark, "/root/testdata/sf0.001")
    out = eng.histogram_query(
        "return( to_weeks(now - last_stamp) )",
        bucket=1.0,
        now_ms=int(datetime(2024, 3, 1, tzinfo=timezone.utc).timestamp() * 1000),
        name="weeks_since",
    )
    rows = out.collect()
    assert rows and {f.name for f in out.schema.fields} == {
        "weeks_since", "people",
    }


def test_on_insert_segments_stream_transitions(spark, tmp_path):
    """@segment on_insert=true end-to-end: script -> store ->
    Structured Streaming enter events (the reference's subscriber
    notifications for on-insert segment evaluation)."""
    import json
    import uuid

    from openset_spark.operators.segment_store import SegmentStore
    from openset_spark.streaming.ingest import read_event_stream

    d = str(tmp_path)
    with open(f"{d}/batch-{uuid.uuid4().hex}.json", "w") as f:
        for eid, (uid, et) in enumerate(
            [(1, "purchase"), (2, "view"), (3, "purchase")]
        ):
            f.write(json.dumps({
                "event_id": eid, "ts": "2024-01-01T00:00:00",
                "user_id": uid, "event_type": et, "value": 1.0,
                "props": "{}",
            }) + "\n")

    store = SegmentStore(lambda: None)
    segs = compile_osl_segments(
        "@segment purchasers on_insert=true\n"
        'if event.ever(== "purchase")\n  return(true)\nend'
    )
    segs.register(
        store,
        stream_predicates={
            "purchasers": lambda pdf: pdf["event_type"] == "purchase"
        },
    )
    out = store.stream_transitions(read_event_stream(spark, d))
    name = f"osl_seg_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {
        (r.user_id, r.segment, r.transition)
        for r in spark.sql(f"select * from {name}").collect()
    }
    assert (1, "purchasers", "enter") in rows
    assert (3, "purchasers", "enter") in rows
    assert not any(u == 2 for u, _, _ in rows)


# --------------------------------------------------- batch documents
BATCH_DOC = """
@segment products_home use_cached=false refresh=5_minutes on_insert=true

# match one of these
if product_group.ever(any ['basement', 'garage', 'kitchen', 'bedroom', 'bathroom'])
  return(true)
end

@segment products_yard use_cached=True refresh=5_minutes on_insert=true

# match one of these
if product_group.ever(contains 'basement') || product_group.ever(contains 'garage')
  return(true)
end

@use products_home products_yard

@property product_name

@property total bucket=50

@histogram customer_value bucket=50
  return(sum(total) where event.is(== "purchase"))

@histogram days_since
  return( to_day(now - last_event) )

@histogram total_by_shipper foreach=shipper bucket=100 min=0 max=1000
  return( sum(total) where shipper.is(== each_value) )
"""


@pytest.fixture(scope="module")
def highstreet_events(spark):
    D = datetime(2024, 1, 10, tzinfo=timezone.utc)
    rows = [
        # user, eid, type, days_ago, product_name, group, total, shipper
        (1, 0, "purchase", 2, "hammer", ["garage", "tools"], 120.0, "ups"),
        (1, 1, "purchase", 2, "kettle", ["kitchen"], 60.0, "fedex"),
        (1, 2, "view", 1, "kettle", ["kitchen"], 0.0, "ups"),
        (2, 3, "purchase", 9, "sofa", ["livingroom"], 700.0, "ups"),
        (3, 4, "view", 0, "plant", ["lawn"], 0.0, "fedex"),
    ]
    return spark.createDataFrame(
        [
            (u, e, t, D.fromtimestamp(
                D.timestamp() - days * 86400, tz=timezone.utc
            ), pn, pg, tot, sh)
            for u, e, t, days, pn, pg, tot, sh in rows
        ],
        "user_id long, event_id long, event_type string, ts timestamp,"
        " product_name string, product_group array<string>,"
        " total double, shipper string",
    )


def test_batch_document_runs_verbatim(highstreet_events):
    from openset_spark.osl import compile_osl_batch

    now_ms = int(datetime(2024, 1, 10, tzinfo=timezone.utc).timestamp() * 1000)
    out = compile_osl_batch(BATCH_DOC).run(highstreet_events, now_ms=now_ms)

    segs = {r["segment"]: r["people"] for r in out["segments"].collect()}
    # home: garage/kitchen buyers = user 1(+garage), 2 has livingroom
    assert segs == {"products_home": 1, "products_yard": 1}

    # @use scoping: counts per segment for product_name
    pn = out["property:product_name"]
    assert set(pn.columns) >= {
        "value", "people", "products_home_people", "products_yard_people",
    }
    vals = {r["value"]: r["products_home_people"] for r in pn.collect()}
    assert vals["hammer"] == 1 and vals["sofa"] == 0

    cv = {r["customer_value"]: r["people"]
          for r in out["histogram:customer_value"].collect()}
    # user1: 180 -> bucket 150; user2: 700 -> 700; user3: no purchase;
    # interior buckets zero-fill (reference jsonResultHistogramFill)
    want = {float(b): 0 for b in range(150, 701, 50)}
    want[150.0] = want[700.0] = 1
    assert cv == want

    ds = {r["days_since"]: r["people"]
          for r in out["histogram:days_since"].collect()}
    # last events: u1 1d, u2 9d, u3 0d ago; gaps 2..8 zero-fill
    want_ds = {float(d): 0 for d in range(0, 10)}
    want_ds[0.0] = want_ds[1.0] = want_ds[9.0] = 1
    assert ds == want_ds

    tbs = out["histogram:total_by_shipper"].collect()
    by = {(r["shipper"], r["total_by_shipper"]): r["people"] for r in tbs}
    # u1 ups 120 -> bucket 100 ; u1 fedex 60 -> 0 ; u2 ups 700 -> 700
    assert by[("ups", 100.0)] == 1
    assert by[("fedex", 0.0)] >= 1
    assert by[("ups", 700.0)] == 1

    for c in out["_cached"]:
        c.unpersist()


def test_engine_batch_osl(spark):
    from openset_spark.engine import OpenSetEngine

    eng = OpenSetEngine(spark, "/root/testdata/sf0.001")
    out = eng.batch_osl(
        "@segment purchasers\n"
        'if event.ever(== "purchase")\n  return(true)\nend\n'
        "@use purchasers\n"
        "@property event_type\n"
        "@histogram spend bucket=100\n"
        '  return(sum(value) where event.is(== "purchase"))\n',
        now_ms=0,
    )
    assert {r["segment"] for r in out["segments"].collect()} == {"purchasers"}
    assert out["property:event_type"].count() > 0
    assert out["histogram:spend"].count() > 0
    for c in out["_cached"]:
        c.unpersist()


def test_batch_now_defaults_to_wall_clock(highstreet_events):
    # regression: with now_ms=None a now-anchored @segment window used
    # epoch 0, so look_back(span, now) matched nothing
    from openset_spark.osl import compile_osl_batch

    doc = (
        "@segment recent_buyers\n"
        'if event.look_back(9000_days, now).ever(== "purchase")\n'
        "  return(true)\nend\n"
        "@use recent_buyers\n"
        "@property shipper\n"
    )
    out = compile_osl_batch(doc).run(highstreet_events)  # now_ms=None
    segs = {r["segment"]: r["people"] for r in out["segments"].collect()}
    # fixture events sit in Jan 2024: within a 9000-day look-back from
    # wall clock, unreachable from the buggy anchor (epoch 0)
    assert segs == {"recent_buyers": 2}
    for c in out["_cached"]:
        c.unpersist()
