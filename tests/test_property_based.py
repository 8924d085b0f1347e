"""Property-based semantics tests (hypothesis): random small
timelines, Spark operator vs a pure-Python oracle. These pin the
boundary behavior (gap strictness, ordering ties, funnel chaining)
far beyond the hand-picked cases in test_operators.py."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openset_spark.operators.events import matching_rows
from openset_spark.operators.funnel import funnel_user_steps
from openset_spark.operators.sessionize import with_session

T0 = dt.datetime(2024, 1, 1)
GAP_MIN = 30  # minutes

# (user, minute-offset, event-kind) — offsets collide on purpose so
# ties exercise the event_id ordering.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=300),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=14,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # stable CI: same examples every run
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frame(spark, rows):
    data = [
        (eid, T0 + dt.timedelta(minutes=m), uid, kind, 0.0)
        for eid, (uid, m, kind) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def _ordered(rows):
    """Python-side canonical per-user ordering: (ts, event_id)."""
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for eid, (uid, m, kind) in enumerate(rows):
        by_user.setdefault(uid, []).append((m, eid, kind))
    for tl in by_user.values():
        tl.sort()
    return by_user


@given(events_strategy)
@SETTINGS
def test_session_numbering_matches_oracle(spark, rows):
    got = {
        (r.user_id, r.event_id): r.session
        for r in with_session(_frame(spark, rows), GAP_MIN * 60 * 1000).collect()
    }
    for uid, tl in _ordered(rows).items():
        session, prev_m = 0, None
        for m, eid, _ in tl:
            if prev_m is None or (m - prev_m) > GAP_MIN:
                session += 1
            prev_m = m
            assert got[(uid, eid)] == session, (uid, eid, rows)


@given(events_strategy)
@SETTINGS
def test_funnel_steps_match_greedy_oracle(spark, rows):
    steps = ["a", "b", "c"]
    out = funnel_user_steps(
        _frame(spark, rows), [F.col("event_type") == s for s in steps]
    ).collect()
    got = {
        r.user_id: tuple(
            r[f"step_{i}"] and int(r[f"step_{i}"].timestamp() // 60)
            for i in range(1, 4)
        )
        for r in out
    }
    base = int(T0.timestamp() // 60)
    for uid, tl in _ordered(rows).items():
        want, last_m, k = [], None, 0
        for m, _eid, kind in tl:
            if k < 3 and kind == steps[k] and (last_m is None or m > last_m):
                want.append(base + m)
                last_m = m
                k += 1
        want += [None] * (3 - len(want))
        assert got[uid] == tuple(want), (uid, rows)


@given(events_strategy, st.integers(min_value=1, max_value=3))
@SETTINGS
def test_matching_rows_limit_matches_oracle(spark, rows, limit):
    out = matching_rows(
        _frame(spark, rows), F.col("event_type") == "a", limit=limit
    ).collect()
    got = {(r.user_id, r.match_n): r.event_id for r in out}
    for uid, tl in _ordered(rows).items():
        matches = [eid for _m, eid, kind in tl if kind == "a"][:limit]
        for i, eid in enumerate(matches, start=1):
            assert got.get((uid, i)) == eid, (uid, rows)
        assert not any(
            u == uid and n > len(matches) for (u, n) in got
        )


scalar_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),  # user
        st.one_of(
            st.none(),
            st.floats(min_value=-5, max_value=25, allow_nan=False),
        ),
    ),
    min_size=1,
    max_size=10,
)


@given(
    scalar_strategy,
    st.sampled_from([0.1, 0.5, 1.0, 2.5]),   # bucket
    st.sampled_from([None, 0.0]),             # min_value
    st.sampled_from([None, 10.0]),            # max_value
)
@SETTINGS
def test_histogram_matches_oracle(spark, rows, bucket, min_value, max_value):
    import math

    from openset_spark.operators.histogram import histogram

    # one row per user: last value wins (dict)
    per_user = {u: v for u, v in rows}
    df = spark.createDataFrame(
        list(per_user.items()), "user_id long, v double"
    )
    got = {
        round(r.value, 6): r.people
        for r in histogram(df, "v", bucket, min_value, max_value).collect()
    }

    # python oracle on bucket INDICES — reference semantics
    # (jsonResultHistogramFill): trunc-toward-zero bucketing, interior
    # zero-fill ALWAYS, observed buckets below a forced min KEPT, the
    # hi bucket always present.
    idx_people: dict[int, set] = {}
    for u, v in per_user.items():
        if v is None:
            continue
        if max_value is not None:
            v = min(v, max_value)
        idx_people.setdefault(int(v / bucket), set()).add(u)
    want = {idx: len(us) for idx, us in idx_people.items()}
    if want:
        lo = int(min_value / bucket) if min_value is not None else min(want)
        hi = int(max_value / bucket) if max_value is not None else max(want)
        if lo <= hi:
            for i in range(lo, hi + 1):
                want.setdefault(i, 0)
        else:
            want.setdefault(hi, 0)
    want_vals = {round(i * bucket, 6): n for i, n in want.items()}
    assert got == want_vals, (rows, bucket, min_value, max_value)


@given(events_strategy)
@SETTINGS
def test_script_counter_and_searches_match_python(spark, rows):
    # ScriptRunner lowering vs a direct Python replay of the same
    # semantics: counter over matching rows, first/last matching row
    # index, boolean test — on random timelines with ties.
    from openset_spark.osl.lang import ScriptRunner

    df = _frame(spark, rows)
    out = ScriptRunner(
        """
        counter = 0
        each_row where event == "a"
          counter = counter + 1
        end
        first_a = row where event.is(== "a")
        last_a = row.reverse() where event.is(== "a")
        has_b = test where event.is(== "b")
        debug(counter)
        debug(first_a)
        debug(last_a)
        debug(has_b)
        """,
        column_map={"event": "event_type"},
    ).frame(df, names=["counter", "first_a", "last_a", "has_b"])
    got = {
        r.user_id: (r.counter, r.first_a, r.last_a, r.has_b)
        for r in out.collect()
    }
    for uid, tl in _ordered(rows).items():
        kinds = [k for _m, _e, k in tl]
        n_a = kinds.count("a")
        first_a = kinds.index("a") if "a" in kinds else None
        last_a = (
            len(kinds) - 1 - kinds[::-1].index("a") if "a" in kinds else None
        )
        want = (n_a, first_a, last_a, "b" in kinds)
        assert got[uid] == want, (uid, got[uid], want)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # doc id seed
            st.integers(min_value=0, max_value=60),      # n_tokens
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    partitions=st.sampled_from([1, 3, 8]),
    groups=st.sampled_from([0, 2, 3]),
)
@SETTINGS
def test_distributed_cumsum_matches_sequential_oracle(
    spark, rows, partitions, groups
):
    """The range-partition + local-window + broadcast-offset prefix
    sum must equal the sequential running total for ANY row set,
    partition count, and grouping — including zero-token rows, ties,
    and single-row groups."""
    from openset_spark.pipeline.sampling import distributed_cumsum

    data = [
        (i, "g%d" % (i % groups) if groups else "all", n)
        for (i, n) in rows
    ]
    df = spark.createDataFrame(data, "doc_id long, dom string, n long")
    group_cols = ("dom",) if groups else ()
    got = {
        (r.doc_id, r._cum)
        for r in distributed_cumsum(
            df, [F.col("doc_id").asc()], "n", partitions, group_cols
        ).collect()
    }
    expected = set()
    totals: dict = {}
    for i, dom, n in sorted(data):
        key = dom if groups else "_"
        totals[key] = totals.get(key, 0) + n
        expected.add((i, totals[key]))
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    seq_len=st.sampled_from([1, 7, 32]),
    partitions=st.sampled_from([1, 4]),
)
@SETTINGS
def test_pack_sequences_matches_sequential_oracle(
    spark, rows, seq_len, partitions
):
    """Packing pieces equal the sequential replay for any doc sizes
    (including > seq_len and zero), any L, any partitioning."""
    from openset_spark.pipeline.packing import pack_sequences

    df = spark.createDataFrame(list(rows), "doc_id long, n_tokens long")
    got = {
        (r.seq_id, r.doc_id, r.seq_offset, r.doc_offset, r.piece_tokens)
        for r in pack_sequences(
            df, seq_len, partitions=partitions
        ).collect()
    }
    expected = set()
    pos = 0
    for i, n in sorted(rows):
        if n <= 0:
            continue
        off = 0
        while off < n:
            sid = pos // seq_len
            take = min(n - off, (sid + 1) * seq_len - pos)
            expected.add((sid, i, pos - sid * seq_len, off, take))
            pos += take
            off += take
    assert got == expected


@given(
    vals=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                  max_size=300),
    n_parts=st.integers(min_value=1, max_value=7),
    seed=st.integers(min_value=0, max_value=2**16),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hll_fold_invariant_under_any_split(spark, vals, n_parts, seed):
    """Register-exact composability as a law: split the multiset into
    ANY k parts, sketch each, fold — registers and estimate equal the
    direct single build exactly. (The property Spark's DataSketches
    HIP estimator does not have.)"""
    import random

    from openset_spark.pipeline.hll import (
        hll_estimate,
        hll_fold,
        hll_partials,
    )

    rnd = random.Random(seed)
    parts = [[] for _ in range(n_parts)]
    for v in vals:
        parts[rnd.randrange(n_parts)].append(v)
    sketches = [
        hll_partials(
            spark.createDataFrame([(v,) for v in part], "u long"), "u"
        )
        for part in parts
        if part
    ]
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    folded = hll_fold(merged)
    direct = hll_partials(
        spark.createDataFrame([(v,) for v in vals], "u long"), "u"
    )
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert (
        hll_estimate(folded).first().approx_distinct
        == hll_estimate(direct).first().approx_distinct
    )
