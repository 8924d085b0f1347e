"""Semantics unit tests on tiny hand-built frames — the analog of the
reference's scripted-insert tests (test/test_sessions.h,
test_zorder.h, test_count_methods.h, test_osl_language.h)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from openset_spark.operators.events import event_aggregate
from openset_spark.operators.funnel import funnel, funnel_user_steps
from openset_spark.operators.paths import transition_matrix
from openset_spark.operators.retention import retention
from openset_spark.operators.segments import Segment, membership, segment_counts
from openset_spark.operators.sessionize import with_session

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, minutes_offset, user_id, event_type, value)"""
    data = [
        (eid, T0 + dt.timedelta(minutes=m), uid, et, float(v))
        for eid, m, uid, et, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


# ---- sessions: gap > 30min starts a new session, enumerated from 1
#      (ref test/test_sessions.h: 3 sessions from 2 gaps) ----
def test_session_boundaries(spark):
    df = _ev(
        spark,
        [
            (1, 0, 1, "a", 0),
            (2, 10, 1, "a", 0),   # same session (10m gap)
            (3, 45, 1, "a", 0),   # 35m gap -> session 2
            (4, 50, 1, "a", 0),
            (5, 200, 1, "a", 0),  # session 3
            (6, 0, 2, "a", 0),    # user 2: one session
        ],
    )
    out = {
        (r.user_id, r.event_id): r.session
        for r in with_session(df).collect()
    }
    assert out[(1, 1)] == 1 and out[(1, 2)] == 1
    assert out[(1, 3)] == 2 and out[(1, 4)] == 2
    assert out[(1, 5)] == 3
    assert out[(2, 6)] == 1


def test_session_gap_boundary_is_strict(spark):
    # exactly 30m gap does NOT start a new session (> not >=)
    df = _ev(spark, [(1, 0, 1, "a", 0), (2, 30, 1, "a", 0)])
    assert {r.session for r in with_session(df).collect()} == {1}


# ---- funnel: ordered, strictly-after matching ----
def test_funnel_requires_order(spark):
    df = _ev(
        spark,
        [
            # user 1: A then B -> completes
            (1, 0, 1, "A", 0),
            (2, 10, 1, "B", 0),
            # user 2: B then A -> does NOT complete step 2
            (3, 0, 2, "B", 0),
            (4, 10, 2, "A", 0),
            # user 3: only A
            (5, 0, 3, "A", 0),
        ],
    )
    steps = [F.col("event_type") == "A", F.col("event_type") == "B"]
    out = {r.step: r.users for r in funnel(df, steps).collect()}
    assert out == {1: 3, 2: 1}


def test_funnel_same_timestamp_not_counted(spark):
    # B at the same instant as A is not "after" A
    df = _ev(spark, [(1, 0, 1, "A", 0), (2, 0, 1, "B", 0)])
    steps = [F.col("event_type") == "A", F.col("event_type") == "B"]
    out = {r.step: r.users for r in funnel(df, steps).collect()}
    assert out == {1: 1, 2: 0}


def test_funnel_within_ms(spark):
    df = _ev(
        spark,
        [
            (1, 0, 1, "A", 0),
            (2, 120, 1, "B", 0),  # 2h later
            (3, 0, 2, "A", 0),
            (4, 10, 2, "B", 0),   # 10m later
        ],
    )
    steps = [F.col("event_type") == "A", F.col("event_type") == "B"]
    out = {r.step: r.users for r in funnel(df, steps, within_ms=30 * 60 * 1000).collect()}
    assert out == {1: 2, 2: 1}


def test_funnel_earliest_chain_not_greedy(spark):
    # first A at t=0; B exists only before the SECOND A. Min-ts chaining
    # must still find B after the first A.
    df = _ev(
        spark,
        [
            (1, 0, 1, "A", 0),
            (2, 5, 1, "B", 0),
            (3, 10, 1, "A", 0),
        ],
    )
    steps = [F.col("event_type") == "A", F.col("event_type") == "B"]
    per_user = funnel_user_steps(df, steps).collect()[0]
    assert per_user.step_1 == T0
    assert per_user.step_2 == T0 + dt.timedelta(minutes=5)


# ---- event aggregation: count id = distinct people per group
#      (ref test_count_methods.h) ----
def test_event_aggregate_people_vs_events(spark):
    df = _ev(
        spark,
        [
            (1, 0, 1, "p", 10),
            (2, 1, 1, "p", 20),
            (3, 2, 2, "p", 30),
            (4, 3, 2, "q", 5),
        ],
    )
    out = {
        r.event_type: (r.people, r.events)
        for r in event_aggregate(
            df, ["event_type"], [("count", "event_id", "events")]
        ).collect()
    }
    assert out == {"p": (2, 3), "q": (1, 1)}


# ---- segments: truth table + algebra ----
def test_segment_membership_and_counts(spark):
    df = _ev(
        spark,
        [
            (1, 0, 1, "buy", 100),
            (2, 0, 2, "buy", 5),
            (3, 0, 3, "view", 0),
        ],
    )
    segs = [
        Segment("buyers", F.col("event_type") == "buy"),
        Segment("whales", (F.col("event_type") == "buy") & (F.col("value") > 50)),
        Segment("non_buyers", F.col("event_type") == "buy", mode="never"),
    ]
    m = {r.user_id: r for r in membership(df, segs).collect()}
    assert m[1].buyers and m[1].whales and not m[1].non_buyers
    assert m[2].buyers and not m[2].whales
    assert not m[3].buyers and m[3].non_buyers
    counts = {r.segment: r.people for r in segment_counts(df, segs).collect()}
    assert counts == {"buyers": 2, "whales": 1, "non_buyers": 1}


# ---- paths ----
def test_transition_matrix(spark):
    df = _ev(
        spark,
        [
            (1, 0, 1, "a", 0),
            (2, 1, 1, "b", 0),
            (3, 2, 1, "a", 0),
            (4, 0, 2, "a", 0),
            (5, 1, 2, "b", 0),
        ],
    )
    out = {
        (r.from_event, r.to_event): (r.transitions, r.people)
        for r in transition_matrix(df).collect()
    }
    assert out == {("a", "b"): (2, 2), ("b", "a"): (1, 1)}


# ---- retention ----
def test_retention_day(spark):
    df = _ev(
        spark,
        [
            (1, 0, 1, "a", 0),             # day 0
            (2, 24 * 60, 1, "a", 0),       # day 1
            (3, 0, 2, "a", 0),             # day 0 only
        ],
    )
    out = {
        (str(r.cohort), r.period_n): r.people
        for r in retention(df, "day").collect()
    }
    assert out == {("2024-01-01 00:00:00", 0): 2, ("2024-01-01 00:00:00", 1): 1}


# ---- zorder: same-stamp ordering respects declared event priority
#      (ref test/test_zorder.h) ----
def test_zorder_tiebreak(spark):
    df = _ev(
        spark,
        [
            # same timestamp; event_ids deliberately inverted vs priority
            (10, 0, 1, "cart_item", 0),
            (11, 0, 1, "purchase", 0),
            (12, 40, 1, "cart_item", 0),
        ],
    )
    s = with_session(df, event_order=["purchase", "cart_item"])
    rows = sorted(s.collect(), key=lambda r: (r.session, r.event_id))
    # both same-stamp events land in session 1 regardless of order;
    # ordering itself is observable via lead():
    from openset_spark.operators.paths import next_event

    stepped = next_event(df.withColumn("_zo", F.lit(0)), order_cols=("event_id",))
    # with zorder, purchase sorts before cart_item at equal stamps
    from openset_spark.operators.sessionize import user_window

    w = user_window(event_order=["purchase", "cart_item"])
    ordered = df.withColumn("rn", F.row_number().over(w)).collect()
    pos = {r.event_id: r.rn for r in ordered}
    assert pos[11] == 1 and pos[10] == 2 and pos[12] == 3


# ---- each_row.limit / .reverse().limit (language_reference.md:276) ----
def test_matching_rows_limit_and_reverse(spark):
    from openset_spark.operators.events import matching_rows

    df = _ev(
        spark,
        [
            (1, 0, 1, "p", 10),
            (2, 5, 1, "p", 20),
            (3, 9, 1, "v", 0),
            (4, 10, 1, "p", 30),
            (5, 0, 2, "p", 40),
        ],
    )
    first2 = matching_rows(df, F.col("event_type") == "p", limit=2)
    got = {(r.user_id, r.event_id, r.match_n) for r in first2.collect()}
    assert got == {(1, 1, 1), (1, 2, 2), (2, 5, 1)}

    last1 = matching_rows(df, F.col("event_type") == "p", limit=1, reverse=True)
    got = {(r.user_id, r.event_id) for r in last1.collect()}
    assert got == {(1, 4), (2, 5)}


def test_matching_rows_tiebreak_on_event_id(spark):
    from openset_spark.operators.events import matching_rows

    # same stamp: z-order tiebreak is the event id
    df = _ev(spark, [(2, 0, 1, "p", 0), (1, 0, 1, "p", 0)])
    first = matching_rows(df, limit=1)
    assert [r.event_id for r in first.collect()] == [1]


# ---- stamped-row count method (test/test_count_methods.h) ----
def test_event_aggregate_dcount_stamps(spark):
    # two rows share a stamp -> distinct-stamp count treats them as one
    df = _ev(spark, [(1, 0, 1, "p", 0), (2, 0, 1, "p", 0), (3, 5, 1, "p", 0)])
    out = event_aggregate(
        df, group_by=["event_type"], aggs=[("dcount", "ts", "stamps"),
                                           ("count", "event_id", "rows")]
    ).collect()[0]
    assert out.stamps == 2 and out.rows == 3


# ---- histogram min/max fill + clip, foreach mode ----
def test_histogram_fill_and_clip(spark):
    from openset_spark.operators.histogram import histogram

    per_user = spark.createDataFrame(
        [(1, 0.5), (2, 2.5), (3, 9.0)], "user_id long, v double"
    )
    # max=3 clips 9.0 into the 3-bucket; min=0 zero-fills bucket 1
    out = histogram(per_user, "v", bucket=1.0, min_value=0.0, max_value=3.0)
    got = {(r.value, r.people) for r in out.collect()}
    assert got == {(0.0, 1), (1.0, 0), (2.0, 1), (3.0, 1)}


def test_histogram_interior_fill_is_unconditional(spark):
    # reference jsonResultHistogramFill zero-fills observed-min..max
    # even with no min=/max= forced (result.cpp:911-927)
    from openset_spark.operators.histogram import histogram

    per_user = spark.createDataFrame(
        [(1, 2.0), (2, 6.0)], "user_id long, v double"
    )
    got = {(r.value, r.people) for r in
           histogram(per_user, "v", bucket=2.0).collect()}
    assert got == {(2.0, 1), (4.0, 0), (6.0, 1)}


def test_histogram_keeps_observed_below_forced_min(spark):
    # the reference voids only values >= max; buckets below a forced
    # min stay in the result (result.cpp:891-908), fill runs min..max
    from openset_spark.operators.histogram import histogram

    per_user = spark.createDataFrame(
        [(1, -3.0), (2, 5.0)], "user_id long, v double"
    )
    got = {(r.value, r.people) for r in
           histogram(per_user, "v", bucket=1.0, min_value=3.0).collect()}
    assert got == {(-3.0, 1), (3.0, 0), (4.0, 0), (5.0, 1)}


def test_histogram_negative_values_truncate_toward_zero(spark):
    # int64 (value/bucket)*bucket truncates: -50 at bucket=100 -> 0,
    # not -100 (F.floor semantics would give -100)
    from openset_spark.operators.histogram import histogram

    per_user = spark.createDataFrame(
        [(1, -50.0), (2, -150.0)], "user_id long, v double"
    )
    got = {(r.value, r.people) for r in
           histogram(per_user, "v", bucket=100.0).collect()}
    assert got == {(-100.0, 1), (-0.0, 1)} or got == {(-100.0, 1), (0.0, 1)}


def test_histogram_by_groups(spark):
    from openset_spark.operators.histogram import histogram_by

    per_user = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 1.5), (1, "b", 4.0)],
        "user_id long, grp string, v double",
    )
    out = histogram_by(per_user, "v", "grp", bucket=1.0)
    got = {(r.grp, r.value, r.people) for r in out.collect()}
    assert got == {("a", 1.0, 2), ("b", 4.0, 1)}


# ---- OSL built-in scalar functions (language_reference.md:641-766) ----
def test_osl_scalar_functions(spark):
    from openset_spark.functions.osl import (
        fix,
        iso8601_to_stamp,
        osl_round,
        trunc,
        url_decode,
    )

    df = spark.createDataFrame(
        [("http://somehost.com/this/is/the/path?param1=one&param2=two&param3",)],
        "url string",
    ).select(
        osl_round(F.lit(0.5)).alias("r1"),
        trunc(F.lit(5.5)).alias("t1"),
        fix(F.lit(24.9499), 2).alias("f1"),
        iso8601_to_stamp(F.lit("2016-03-24T12:00:30.000Z")).alias("stamp"),
        url_decode(F.col("url")).alias("u"),
    )
    row = df.collect()[0]
    assert row.r1 == 1 and row.t1 == 5
    assert row.f1 == "24.95"
    assert row.stamp == 1458820830000
    assert row.u.host == "somehost.com"
    assert row.u.path == "/this/is/the/path"
    assert row.u.params == {"param1": "one", "param2": "two", "param3": "true"}


def test_osl_user_variables(spark):
    from openset_spark.functions.osl import cursor, first_stamp, last_stamp, row_count

    df = _ev(spark, [(1, 0, 1, "a", 0), (2, 10, 1, "b", 0), (3, 0, 2, "a", 0)])
    out = df.select(
        "user_id", "event_id", "ts",
        first_stamp().alias("fs"), last_stamp().alias("ls"),
        row_count().alias("rc"), cursor().alias("cur"),
    ).collect()
    by_eid = {r.event_id: r for r in out}
    assert by_eid[1].rc == 2 and by_eid[1].cur == 0
    assert by_eid[2].cur == 1
    assert by_eid[1].fs == by_eid[1].ts  # user 1's first event IS event 1
    assert by_eid[1].ls == by_eid[2].ts  # ...and its last is event 2
    assert by_eid[3].rc == 1 and by_eid[3].cur == 0
    assert by_eid[2].ls > by_eid[2].fs


# ---- paths: opening-path extraction ----
def test_user_paths_ordering_and_cap(spark):
    from openset_spark.operators.paths import top_paths, user_paths

    df = _ev(
        spark,
        [
            (1, 0, 1, "a", 0), (2, 1, 1, "b", 0), (3, 2, 1, "c", 0),
            (4, 3, 1, "d", 0),  # beyond max_steps
            (5, 0, 2, "a", 0), (6, 1, 2, "b", 0), (7, 2, 2, "c", 0),
            (8, 0, 3, "x", 0),
        ],
    )
    got = {r.user_id: r.path for r in user_paths(df, max_steps=3).collect()}
    assert got == {1: "a>b>c", 2: "a>b>c", 3: "x"}
    top = top_paths(df, max_steps=3, n=1).collect()
    assert (top[0].path, top[0].people) == ("a>b>c", 2)


# ---- sequence segments (A then B) ----
def test_sequence_membership(spark):
    from openset_spark.operators.segments import sequence_membership

    df = _ev(
        spark,
        [
            (1, 0, 1, "signup", 0), (2, 5, 1, "purchase", 0),   # in order
            (3, 0, 2, "purchase", 0), (4, 5, 2, "signup", 0),   # wrong order
            (5, 0, 3, "view", 0),                                # neither
        ],
    )
    m = sequence_membership(
        df,
        {"sp": [F.col("event_type") == "signup", F.col("event_type") == "purchase"]},
    )
    got = {r.user_id: r.sp for r in m.collect()}
    assert got == {1: True, 2: False, 3: False}


# ---- salted skew-safe user aggregates ----
def test_user_scalar_salted_matches_unsalted(spark):
    from openset_spark.operators.events import user_scalar, user_scalar_salted

    df = _ev(
        spark,
        [(i, i, 1 if i < 8 else 2, "p", i * 10) for i in range(10)],
    )
    aggs = [("count", "event_id", "n"), ("sum", "value", "total"),
            ("min", "value", "lo"), ("max", "value", "hi")]
    plain = {r.user_id: (r.n, r.total, r.lo, r.hi)
             for r in user_scalar(df, aggs).collect()}
    salted = {r.user_id: (r.n, r.total, r.lo, r.hi)
              for r in user_scalar_salted(df, aggs, salt_buckets=4).collect()}
    assert plain == salted

    with pytest.raises(ValueError):
        user_scalar_salted(df, [("avg", "value", "a")])


# ---- incremental segment refresh (src/oloop_seg_refresh.cpp) ----
def test_refresh_membership_matches_full_recompute(spark):
    from openset_spark.operators.segments import refresh_membership

    segs = [
        Segment("buyer", F.col("event_type") == "p"),
        Segment("never_err", F.col("event_type") == "e", mode="never"),
    ]
    old_events = _ev(
        spark,
        [(1, 0, 1, "p", 0), (2, 0, 2, "v", 0), (3, 0, 3, "e", 0)],
    )
    new_events = _ev(
        spark,
        [(4, 10, 2, "p", 0),   # user 2 becomes a buyer
         (5, 10, 1, "e", 0),   # user 1 loses never_err
         (6, 10, 4, "v", 0)],  # brand-new user
    )
    old_m = membership(old_events, segs)
    refreshed = {
        r.user_id: (r.buyer, r.never_err)
        for r in refresh_membership(old_m, new_events, segs).collect()
    }
    full = {
        r.user_id: (r.buyer, r.never_err)
        for r in membership(old_events.unionByName(new_events), segs).collect()
    }
    assert refreshed == full == {
        1: (True, False), 2: (True, True), 3: (False, False), 4: (False, True),
    }


def test_matching_rows_from_modifier(spark):
    from openset_spark.operators.events import matching_rows

    df = _ev(
        spark,
        [(1, 0, 1, "p", 0), (2, 5, 1, "p", 0), (3, 9, 1, "p", 0)],
    )
    # .from(1): skip the first timeline row, then match
    out = matching_rows(df, F.col("event_type") == "p", limit=5, from_row=1)
    assert [r.event_id for r in sorted(out.collect(), key=lambda r: r.match_n)] == [2, 3]


def test_first_match_row_and_test(spark):
    from openset_spark.operators.events import first_match_row

    df = _ev(
        spark,
        [(1, 0, 1, "v", 0), (2, 5, 1, "p", 0),
         (3, 0, 2, "v", 0)],
    )
    got = {
        r.user_id: (r.row, r.test)
        for r in first_match_row(df, F.col("event_type") == "p").collect()
    }
    assert got == {1: (1, True), 2: (None, False)}


# ---- next-basket (README example 14 analog) ----
def test_next_session_transitions(spark):
    from openset_spark.operators.paths import next_session_transitions

    df = _ev(
        spark,
        [
            # user 1: session 1 = {a, b}; session 2 = {b, c} (90min later)
            (1, 0, 1, "a", 0), (2, 5, 1, "b", 0),
            (3, 95, 1, "b", 0), (4, 99, 1, "c", 0),
            # user 2: one session only -> contributes nothing
            (5, 0, 2, "a", 0),
        ],
    )
    got = {
        (r.from_type, r.to_type): (r.people, r.pairs)
        for r in next_session_transitions(df, 30 * 60 * 1000).collect()
    }
    # pairs across consecutive sessions, same-value pairs dropped
    assert got == {
        ("a", "b"): (1, 1), ("a", "c"): (1, 1), ("b", "c"): (1, 1),
    }


def test_histogram_fractional_bucket_keeps_top_bucket(spark):
    # regression: FP step-count drift dropped the top observed bucket
    # when (hi-min)/bucket landed a ulp below an integer.
    from openset_spark.operators.histogram import histogram

    per_user = spark.createDataFrame(
        [(1, 4.35), (2, 0.05)], "user_id long, v double"
    )
    out = histogram(per_user, "v", bucket=0.1, min_value=0.0)
    rows = {round(r.value, 1): r.people for r in out.collect()}
    assert rows[4.3] == 1 and rows[0.0] == 1
    assert sum(rows.values()) == 2  # nobody lost
    assert len(rows) == 44  # 0.0 .. 4.3 fill


def test_histogram_null_scalar_not_clipped_into_max_bucket(spark):
    # regression: least(NULL, max) resurrected nulls into the clip bucket
    from openset_spark.operators.histogram import histogram, histogram_by

    per_user = spark.createDataFrame(
        [(1, None), (2, 2.5)], "user_id long, v double"
    )
    # forced max always re-injects the 3-bucket (people=0, no nulls in it)
    got = {(r.value, r.people) for r in
           histogram(per_user, "v", bucket=1.0, max_value=3.0).collect()}
    assert got == {(2.0, 1), (3.0, 0)}

    grouped = spark.createDataFrame(
        [(1, "a", None), (2, "a", 2.5)], "user_id long, grp string, v double"
    )
    got = {(r.grp, r.value, r.people) for r in
           histogram_by(grouped, "v", "grp", bucket=1.0, max_value=3.0).collect()}
    assert got == {("a", 2.0, 1), ("a", 3.0, 0)}


def test_user_first_row_salted_matches_window_form(spark, sf_dir):
    """The algebraic min-struct first-row equals matching_rows(limit=1)
    on the real events table (same (ts, event_id) ordering)."""
    from openset_spark.operators.events import matching_rows, user_first_row_salted
    from openset_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value)
        for r in matching_rows(ev, limit=1).collect()
    }
    s = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value)
        for r in user_first_row_salted(ev, salt_buckets=8).collect()
    }
    assert w == s and len(w) >= 10


def test_zorder_grid_iteration_order(spark):
    """The reference's z-order scenario (test/test_zorder.h user1
    inserts, declared order alpha>beta>cappa>delta>echo): same-stamp
    rows inserted OUT of order iterate in declared priority, then
    insertion id; distinct stamps keep time order. The reference test
    body itself is a TODO — the expected order below follows the
    documented zOrder table property."""
    from openset_spark.operators.events import matching_rows

    order = ["alpha", "beta", "cappa", "delta", "echo"]
    # (event_id = insertion order, stamp_s, event, some_val) — verbatim
    raw = [
        (0, 1458820830, "delta", 4),
        (1, 1458820830, "cappa", 3),
        (2, 1458820830, "beta", 2),
        (3, 1458820830, "alpha", 1),
        (4, 1458820830, "beta", 2222),
        (5, 1458820840, "delta", 4),
        (6, 1458820840, "cappa", 3),
        (7, 1458820840, "beta", 2),
        (8, 1458820820, "alpha", 1),
        (9, 1458820820, "delta", 4),
        (10, 1458820820, "cappa", 3),
        (11, 1458820820, "beta", 2),
        (12, 1458820820, "alpha", 2),
        (13, 1458820820, "echo", 5),
    ]
    df = spark.createDataFrame(
        [(1, eid, dt.datetime.fromtimestamp(s, tz=dt.timezone.utc), ev, v)
         for eid, s, ev, v in raw],
        "user_id long, event_id long, ts timestamp, event_type string,"
        " some_val long",
    )
    got = [
        (r.event_type, r.some_val)
        for r in matching_rows(df, limit=99, event_order=order)
        .orderBy("match_n")
        .collect()
    ]
    expected = [
        # stamp ...820: declared priority, insertion id breaks alpha tie
        ("alpha", 1), ("alpha", 2), ("beta", 2), ("cappa", 3),
        ("delta", 4), ("echo", 5),
        # stamp ...830: the two betas keep insertion order
        ("alpha", 1), ("beta", 2), ("beta", 2222), ("cappa", 3),
        ("delta", 4),
        # stamp ...840
        ("beta", 2), ("cappa", 3), ("delta", 4),
    ]
    assert got == expected

    # reverse iteration walks the same grid backwards
    rev = [
        (r.event_type, r.some_val)
        for r in matching_rows(df, limit=99, reverse=True, event_order=order)
        .orderBy("match_n")
        .collect()
    ]
    assert rev == expected[::-1]

    # without the declared order, same-stamp rows fall back to
    # insertion id — the grid is still deterministic, just unprioritized
    plain = [
        r.event_type
        for r in matching_rows(df, limit=3).orderBy("match_n").collect()
    ]
    assert plain == ["alpha", "delta", "cappa"]


def test_operators_tolerate_empty_input(spark):
    """Zero-row inputs (fresh table, filtered-out partition) must flow
    through every core operator without error — the reference returns
    empty result trees, not faults."""
    from openset_spark.operators.events import (
        first_match_row,
        matching_rows,
        user_first_row_salted,
        user_scalar,
    )
    from openset_spark.operators.histogram import histogram
    from openset_spark.operators.paths import transition_matrix
    from openset_spark.operators.property_counts import property_counts
    from openset_spark.operators.sessionize import session_stats, with_session

    empty = _ev(spark, [])
    assert with_session(empty).count() == 0
    assert session_stats(empty).count() == 0
    # funnel emits its per-step drop-off rows with zero users
    assert {r.users for r in funnel(empty, [F.col("event_type") == "a"]).collect()} <= {0}
    assert retention(empty, "day").count() == 0
    assert transition_matrix(empty).count() == 0
    assert property_counts(empty, "event_type").count() == 0
    assert matching_rows(empty, limit=3).count() == 0
    assert first_match_row(empty, F.col("event_type") == "a").count() == 0
    assert user_first_row_salted(empty).count() == 0
    assert user_scalar(empty, [("sum", "value", "v")]).count() == 0
    per_user = user_scalar(empty, [("sum", "value", "v")])
    assert histogram(per_user, "v", bucket=10.0).count() == 0


def test_cull_users_preserves_funnel_counts(spark, sf_dir):
    """The index-compiler pre-pass (ref test/test_db.h "index
    compiler row, ever, never"; src/queryindexing.h): culling users
    who never did step 1 must not change any funnel count, and must
    actually drop non-candidate users' rows from the scanned frame."""
    from openset_spark.operators.events import cull_users
    from openset_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    steps = [F.col("event_type") == s for s in ("signup", "purchase")]
    plain = {r.step: r.users for r in funnel(ev, steps).collect()}
    culled = {r.step: r.users for r in funnel(ev, steps, cull=True).collect()}
    assert plain == culled and plain[1] > 0

    kept = cull_users(ev, steps[0])
    n_candidates = kept.select("user_id").distinct().count()
    assert kept.count() < ev.count() or n_candidates == ev.select(
        "user_id"
    ).distinct().count()
    # every kept user really has a step-1 row
    assert (
        kept.join(
            ev.filter(steps[0]).select("user_id").distinct(),
            "user_id",
            "left_anti",
        ).count()
        == 0
    )


def test_asof_join_backward_semantics(spark):
    from openset_spark.operators.asof import asof_join

    import datetime as dt

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, 10, t(5)), (2, 10, t(2)), (3, 10, t(1)), (4, 20, t(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, t(2), 100.0), (10, t(4), 200.0), (20, t(30), 999.0)],
        "user_id long, ts timestamp, price double",
    )
    out = {r.event_id: r for r in
           asof_join(left, right, by=("user_id",)).collect()}
    # event 1 (t5): latest price at-or-before is t4 -> 200
    assert out[1].price_asof == 200.0 and out[1].ts_asof == t(4)
    # event 2 (t2): EQUALITY matches -> t2/100
    assert out[2].price_asof == 100.0
    # event 3 (t1): nothing before -> NULL, left row survives
    assert out[3].price_asof is None and out[3].ts_asof is None
    # event 4 (user 20, t9): its only quote is in the future -> NULL
    assert out[4].price_asof is None
    # all left columns intact
    assert set(out[1].asDict()) == {
        "event_id", "user_id", "ts", "ts_asof", "price_asof"
    }


def test_asof_join_forward_tolerance_and_dup_snapshots(spark):
    from openset_spark.operators.asof import asof_join

    import datetime as dt

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, 7, t(0)), (2, 7, t(25))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        # duplicate snapshot at the same (key, ts): max-of-struct wins
        [(7, t(10), 5.0), (7, t(10), 8.0), (7, t(50), 1.0)],
        "user_id long, ts timestamp, price double",
    )
    fwd = {r.event_id: r for r in
           asof_join(left, right, direction="forward").collect()}
    assert fwd[1].price_asof == 8.0 and fwd[1].ts_asof == t(10)
    assert fwd[2].price_asof == 1.0
    # tolerance: 10s reaches t(10) from t(0); 20s does NOT reach
    # t(50) from t(25)
    tol = {r.event_id: r for r in
           asof_join(left, right, direction="forward",
                     tolerance_ms=20_000).collect()}
    assert tol[1].price_asof == 8.0
    assert tol[2].price_asof is None and tol[2].ts_asof is None


def test_interval_join_containment_and_overlaps(spark):
    from openset_spark.operators.asof import interval_join

    import datetime as dt

    def t(m):
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 5, t(10)), (2, 5, t(30)), (3, 5, t(61)), (4, 6, t(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (5, t(0), t(20), "a"),     # catches event 1
            (5, t(5), t(40), "b"),     # overlaps: catches 1 AND 2
            (5, t(61), t(61), "bad"),  # empty interval: matches nothing
            (5, t(61), t(62), "c"),    # [61, 62): catches 3 (inclusive
                                       # start), crosses an hour bucket
            (6, t(20), t(30), "d"),    # wrong window for event 4
        ],
        "user_id long, valid_from timestamp, valid_to timestamp, tag string",
    )
    out = sorted(
        (r.event_id, r.tag)
        for r in interval_join(
            left, right, bucket_ms=600_000
        ).collect()
    )
    assert out == [(1, "a"), (1, "b"), (2, "b"), (3, "c")]
    # exclusive end: an event AT valid_to does not match
    edge = spark.createDataFrame(
        [(9, 5, t(20))], "event_id long, user_id long, ts timestamp"
    )
    assert interval_join(
        edge, right.filter("tag = 'a'"), bucket_ms=600_000
    ).count() == 0
    # left semantics keep unmatched rows with NULL interval columns
    lo = {r.event_id: r for r in interval_join(
        left, right, bucket_ms=600_000, how="left"
    ).collect() if r.event_id == 4}
    assert lo[4].tag is None and lo[4].valid_from is None


def test_time_rollup_hierarchy_levels(spark):
    from openset_spark.operators.events import time_rollup

    import datetime as dt

    def t(h, m):
        return dt.datetime(2024, 3, 1, h, m, 0)

    ev = spark.createDataFrame(
        [
            (1, "click", t(10, 5), 1.0),
            (2, "click", t(10, 5), 2.0),
            (3, "click", t(10, 30), 4.0),
            (4, "click", t(11, 0), 8.0),
            (5, "buy", t(10, 5), 16.0),
        ],
        "event_id long, event_type string, ts timestamp, value double",
    )
    out = time_rollup(
        ev, aggs=[("sum", "value", "sum_value")]
    ).collect()
    rows = {
        (r.granularity, r.event_type, r.bucket_day, r.bucket_hour,
         r.bucket_minute): (r.n, r.sum_value)
        for r in out
    }
    d = dt.datetime(2024, 3, 1)
    # day level: finer buckets NULL, totals across the whole day
    assert rows[("day", "click", d, None, None)] == (4, 15.0)
    assert rows[("day", "buy", d, None, None)] == (1, 16.0)
    # hour level
    h10 = dt.datetime(2024, 3, 1, 10)
    assert rows[("hour", "click", d, h10, None)] == (3, 7.0)
    assert rows[("hour", "click", d, dt.datetime(2024, 3, 1, 11), None)][0] == 1
    # minute level
    assert rows[("minute", "click", d, h10, t(10, 5))] == (2, 3.0)
    # NO grand-total or type-rolled rows leak through
    assert all(k[1] is not None for k in rows)
    assert all(k[0] is not None for k in rows)
    # level counts are consistent: sum of minute n == day n per type
    mins = sum(v[0] for k, v in rows.items()
               if k[0] == "minute" and k[1] == "click")
    assert mins == rows[("day", "click", d, None, None)][0]


def test_asof_join_fuzz_vs_pandas_merge_asof(spark):
    """Independent model: pandas merge_asof implements the same
    operator from a different codebase — 8 fuzzed corpora (random
    keys/timestamps incl. equal-ts collisions) must agree row for
    row in both directions and under tolerance. (key, ts) is kept
    unique on the right so both resolutions coincide."""
    import random

    import pandas as pd

    from openset_spark.operators.asof import asof_join

    rnd = random.Random(77)
    for trial in range(8):
        n_l, n_r = rnd.randrange(5, 60), rnd.randrange(3, 40)
        lrows = [
            (i, rnd.randrange(3),
             (pd.Timestamp(2024, 1, 1)
              + pd.Timedelta(seconds=rnd.randrange(0, 500)))
             .to_pydatetime())
            for i in range(n_l)
        ]
        seen = set()
        rrows = []
        for j in range(n_r):
            k = rnd.randrange(3)
            ts = (
                pd.Timestamp(2024, 1, 1)
                + pd.Timedelta(seconds=rnd.randrange(0, 500))
            ).to_pydatetime()
            if (k, ts) in seen:
                continue
            seen.add((k, ts))
            rrows.append((k, ts, float(j)))
        left = spark.createDataFrame(
            lrows, "event_id long, user_id long, ts timestamp"
        )
        right = spark.createDataFrame(
            rrows, "user_id long, ts timestamp, price double"
        )
        direction = rnd.choice(["backward", "forward", "nearest"])
        tol = rnd.choice([None, 60_000])
        got = {
            r.event_id: (r.ts_asof, r.price_asof)
            for r in asof_join(
                left, right, direction=direction, tolerance_ms=tol
            ).collect()
        }
        lp = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"])
        rp = pd.DataFrame(rrows, columns=["user_id", "ts", "price"])
        ref = pd.merge_asof(
            lp.sort_values("ts"),
            rp.sort_values("ts").rename(columns={"ts": "rts"}),
            left_on="ts",
            right_on="rts",
            by="user_id",
            direction=direction,
            tolerance=None if tol is None else pd.Timedelta(milliseconds=tol),
        )
        for _, r in ref.iterrows():
            want_ts = None if pd.isna(r["rts"]) else r["rts"].to_pydatetime()
            want_p = None if pd.isna(r["price"]) else float(r["price"])
            assert got[int(r["event_id"])] == (want_ts, want_p), (
                trial, int(r["event_id"]), direction, tol
            )


def test_asof_nearest_tie_goes_backward(spark):
    """merge_asof's nearest rule, pinned explicitly: equal absolute
    gaps pick the BACKWARD match; one-sided availability picks the
    available side; tolerance nulls both sides independently."""
    import datetime as dt

    from openset_spark.operators.asof import asof_join

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, 0, t(10)), (2, 0, t(1)), (3, 0, t(58)), (4, 1, t(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(0, t(5), 5.0), (0, t(15), 15.0), (0, t(40), 40.0)],
        "user_id long, ts timestamp, price double",
    )
    got = {
        r.event_id: r.price_asof
        for r in asof_join(left, right, direction="nearest").collect()
    }
    # event 1 at t10: gaps 5 both ways -> backward (5.0)
    # event 2 at t1: only forward exists -> 5.0
    # event 3 at t58: nearest is t40
    # event 4: no key-0 rows for user 1 -> NULL
    assert got == {1: 5.0, 2: 5.0, 3: 40.0, 4: None}
    tol = {
        r.event_id: r.price_asof
        for r in asof_join(
            left, right, direction="nearest", tolerance_ms=4_000
        ).collect()
    }
    # event 2's forward gap is exactly 4s -> kept; event 3 (18s) nulls
    assert tol == {1: None, 2: 5.0, 3: None, 4: None}


def test_interval_join_fuzz_vs_naive_predicate_join(spark):
    """Independent model: the bucketized join must equal the naive
    (quadratic) range-predicate join on fuzzed intervals — including
    intervals shorter, longer, and much longer than the bucket."""
    import random

    from openset_spark.operators.asof import interval_join

    import datetime as dt

    rnd = random.Random(31)
    base = dt.datetime(2024, 5, 1)
    for trial in range(6):
        left = spark.createDataFrame(
            [
                (i, rnd.randrange(2),
                 base + dt.timedelta(seconds=rnd.randrange(0, 2000)))
                for i in range(40)
            ],
            "event_id long, user_id long, ts timestamp",
        )
        rrows = []
        for j in range(15):
            a = rnd.randrange(0, 2000)
            b = a + rnd.randrange(-50, 900)  # some empty/negative
            rrows.append(
                (rnd.randrange(2), base + dt.timedelta(seconds=a),
                 base + dt.timedelta(seconds=b), j)
            )
        right = spark.createDataFrame(
            rrows,
            "user_id long, valid_from timestamp, valid_to timestamp,"
            " iv_id long",
        )
        got = sorted(
            (r.event_id, r.iv_id)
            for r in interval_join(left, right, bucket_ms=120_000).collect()
        )
        naive = sorted(
            (r.event_id, r.iv_id)
            for r in left.join(
                right,
                (left.user_id == right.user_id)
                & (right.valid_from <= left.ts)
                & (left.ts < right.valid_to),
            ).collect()
        )
        assert got == naive, trial


def test_interval_join_left_handles_dup_rows_and_null_payloads(spark):
    """The r11 anti-join rewrite of how="left": fully duplicated left
    rows each survive independently (the old all-columns join-back
    cross-multiplied them) and NULL left payload columns don't turn
    matched rows into unmatched ones (null-unsafe equality dropped
    them). Fuzzed against the naive left range-predicate join."""
    import datetime as dt
    import random

    from openset_spark.operators.asof import interval_join

    rnd = random.Random(47)
    base = dt.datetime(2024, 5, 1)
    for trial in range(4):
        lrows = []
        for i in range(30):
            row = (
                i % 10,  # NON-unique event_id: duplicates guaranteed
                rnd.randrange(2),
                base + dt.timedelta(seconds=rnd.randrange(0, 2000)),
                None if rnd.random() < 0.4 else f"p{i % 3}",
            )
            lrows.append(row)
            if rnd.random() < 0.3:
                lrows.append(row)  # exact full-row duplicate
        left = spark.createDataFrame(
            lrows,
            "event_id long, user_id long, ts timestamp, payload string",
        )
        rrows = [
            (rnd.randrange(2),
             base + dt.timedelta(seconds=(a := rnd.randrange(0, 2000))),
             base + dt.timedelta(seconds=a + rnd.randrange(-50, 900)),
             j)
            for j in range(12)
        ]
        right = spark.createDataFrame(
            rrows,
            "user_id long, valid_from timestamp, valid_to timestamp,"
            " iv_id long",
        )
        got = sorted(
            (r.event_id, r.user_id, r.ts, r.payload, r.iv_id)
            for r in interval_join(
                left, right, bucket_ms=120_000, how="left"
            ).collect()
        )
        naive = sorted(
            (r.event_id, r.user_id, r.ts, r.payload, r.iv_id)
            for r in left.join(
                right,
                (left.user_id == right.user_id)
                & (right.valid_from <= left.ts)
                & (left.ts < right.valid_to),
                "left",
            ).drop(right.user_id).collect()
        )
        assert got == naive, trial


def test_time_rollup_fuzz_vs_independent_per_level_groupby(spark):
    """Independent model: the single-shuffle rollup must equal three
    separately-computed per-granularity groupBy aggregates on fuzzed
    events (random types/timestamps across days)."""
    import random

    import datetime as dt

    from pyspark.sql import functions as F

    from openset_spark.operators.events import time_rollup

    rnd = random.Random(55)
    rows = [
        (i,
         rnd.choice(["a", "b", "c"]),
         dt.datetime(2024, 6, 1 + rnd.randrange(3), rnd.randrange(24),
                     rnd.randrange(60), rnd.randrange(60)),
         float(rnd.randrange(100)))
        for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    got = {
        (r.granularity, r.event_type, r.bucket_day, r.bucket_hour,
         r.bucket_minute): (r.n, r.sum_value)
        for r in time_rollup(ev, aggs=[("sum", "value", "sum_value")])
        .collect()
    }
    grans = ("day", "hour", "minute")
    want = {}
    for gi, g in enumerate(grans):
        bucket_cols = [
            F.date_trunc(gg, "ts").alias(f"b_{gg}") for gg in grans[: gi + 1]
        ]
        agg = ev.groupBy("event_type", *bucket_cols).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
        )
        for r in agg.collect():
            key = (
                g,
                r.event_type,
                r.b_day,
                r.b_hour if gi >= 1 else None,
                r.b_minute if gi >= 2 else None,
            )
            want[key] = (r.n, r.sv)
    assert set(got) == set(want)
    for k, (n, sv) in want.items():
        gn, gsv = got[k]
        assert gn == n and abs(gsv - sv) < 1e-9, k


def test_interval_overlap_join_fuzz_vs_naive(spark):
    """interval_overlap_join (r11): the max-start-anchor-bucket trick
    must emit every overlapping pair EXACTLY once — fuzzed against
    the naive quadratic overlap-predicate join, with intervals far
    longer than the bucket (pairs sharing many buckets would
    duplicate without the anchor) and touching/empty edge cases."""
    import datetime as dt
    import random

    from openset_spark.operators.asof import interval_overlap_join

    rnd = random.Random(59)
    base = dt.datetime(2024, 6, 1)

    def mk(n, id_name):
        rows = []
        for i in range(n):
            a = rnd.randrange(0, 4000)
            b = a + rnd.randrange(-100, 2400)  # up to 20 buckets long
            rows.append(
                (i, rnd.randrange(2),
                 base + dt.timedelta(seconds=a),
                 base + dt.timedelta(seconds=b))
            )
        return rows

    for trial in range(5):
        lrows = mk(25, "l")
        rrows = mk(18, "r")
        left = spark.createDataFrame(
            lrows,
            "l_id long, user_id long, start timestamp, end timestamp",
        )
        right = spark.createDataFrame(
            rrows,
            "r_id long, user_id long, valid_from timestamp,"
            " valid_to timestamp",
        )
        got = sorted(
            (r.l_id, r.r_id)
            for r in interval_overlap_join(
                left, right, bucket_ms=120_000
            ).collect()
        )
        # empty intervals overlap nothing (the operator's contract);
        # the bare predicate is vacuously true for some of them
        nl = left.filter("end > start")
        nr = right.filter("valid_to > valid_from")
        naive = sorted(
            (r.l_id, r.r_id)
            for r in nl.join(
                nr,
                (nl.user_id == nr.user_id)
                & (nl.start < nr.valid_to)
                & (nr.valid_from < nl.end),
            ).collect()
        )
        assert got == naive, trial
        assert len(got) == len(set(got)), "duplicated pairs"
