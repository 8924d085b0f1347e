"""OpenSetEngine facade — the endpoint-per-method API surface a
reference user would switch to. Exercised against sf0.001 testdata;
results cross-checked against the underlying operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openset_spark.engine import OpenSetEngine
from openset_spark.operators.segments import Segment
from openset_spark.plans.batch import BatchQuery, PropertySpec


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return OpenSetEngine(spark, sf_dir)


def test_event_query_and_rollup(eng):
    flat = eng.event_query(["event_type"], [("count", "event_id", "n")])
    assert {"event_type", "people", "n"} == set(flat.columns)
    roll = eng.event_query(["event_type"], rollup=True)
    # rollup adds the grand-total row
    assert roll.count() == flat.count() + 1


def test_property_counts_filters(eng):
    base = eng.property_counts("event_type")
    rx = eng.property_counts("event_type", rx="^p")
    sub = eng.property_counts("event_type", sub="u")
    vals_rx = {r.value for r in rx.collect()}
    assert vals_rx and all(v.startswith("p") for v in vals_rx)
    vals_sub = {r.value for r in sub.collect()}
    assert vals_sub and all("u" in v for v in vals_sub)
    assert base.count() >= rx.count()


def test_property_counts_numeric_filters(eng):
    # gte/lte include the boundary, gt/lt exclude it, eq pins one
    # value, between is half-open [lo, hi) — per the endpoint docs.
    lo = eng.events.agg(F.min("value")).first()[0]
    gte = eng.property_counts("value", gte=lo)
    gt = eng.property_counts("value", gt=lo)
    assert gte.count() == gt.count() + 1
    some = eng.events.filter(F.col("value").isNotNull()).first().value
    eq = eng.property_counts("value", eq=some)
    assert eq.count() == 1 and eq.first().value == some
    bt = eng.property_counts("value", between=(some, some + 1e-9))
    assert {r.value for r in bt.collect()} == {some}
    lte = eng.property_counts("value", lte=some)
    lt = eng.property_counts("value", lt=some)
    assert lte.count() == lt.count() + 1


def test_property_counts_order_trim(eng):
    top2 = eng.property_counts("event_type", trim=2).collect()
    bot2 = eng.property_counts("event_type", order="asc", trim=2).collect()
    assert len(top2) == 2 and len(bot2) == 2
    assert top2[0].people >= top2[1].people >= bot2[1].people >= bot2[0].people


def test_property_counts_segment_compare(eng):
    out = eng.property_counts(
        "event_type",
        segments=[Segment("buyers", F.col("event_type") == "purchase")],
    )
    rows = {r.value: (r.people, r.buyers_people) for r in out.collect()}
    assert all(b <= p for p, b in rows.values())
    assert rows["purchase"][0] == rows["purchase"][1]  # buyers tautology


def test_histogram_and_foreach(eng):
    def spend(ev):
        return (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.sum("value").alias("spend"))
        )

    h = eng.histogram(spend, bucket=200.0, name="spend")
    assert {"spend", "people"} == set(h.columns)

    def by_type(ev):
        return ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )

    hf = eng.histogram(by_type, bucket=5.0, foreach="event_type", name="n_b")
    assert {"event_type", "n_b", "people"} == set(hf.columns)


def test_customer_with_sessions(eng):
    tl = eng.customer(7, with_sessions=True)
    rows = tl.collect()
    assert rows and all(r.user_id == 7 for r in rows)
    assert "session" in tl.columns
    sessions = [r.session for r in rows]
    assert sessions[0] == 1 and sessions == sorted(sessions)


def test_funnel_and_paths_and_batch(eng):
    fun = eng.funnel([F.col("event_type") == s for s in ("signup", "purchase")])
    steps = {r.step: r.users for r in fun.collect()}
    assert steps[2] <= steps[1]
    assert eng.paths(max_steps=2, n=5).count() <= 5
    out = eng.batch(
        BatchQuery(
            segments=(Segment("buyers", F.col("event_type") == "purchase"),),
            properties=(PropertySpec("event_type"),),
        )
    )
    assert set(out) == {"segments", "property:event_type", "_cached"}
    for df in out["_cached"]:
        df.unpersist()


def test_first_matching_reverse(eng):
    last = eng.first_matching(
        F.col("event_type") == "purchase", limit=1, reverse=True
    )
    per_user = last.groupBy("user_id").count().collect()
    assert per_user and all(r["count"] == 1 for r in per_user)


def test_next_baskets_quantiles_result_tree(eng):
    nb = eng.next_baskets()
    assert {"from_type", "to_type", "people", "pairs"} == set(nb.columns)

    def spend(ev):
        return (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.sum("value").alias("spend"))
        )

    q = eng.quantiles(spend, probs=[0.5, 0.9]).collect()[0]
    assert q.q50 <= q.q90

    tree = eng.result_tree(
        ["event_type"], [("count", "event_id", "events")]
    )
    assert "c" in tree and tree["c"][0] > 0  # root people total
    kids = {n["g"] for n in tree["_"]}
    assert "purchase" in kids


def test_osl_debug_returns_plan(eng):
    out = eng.osl(
        'each_row where event_type == "purchase"\n    << event_type\nend',
        debug=True,
    )
    assert isinstance(out, str) and "HashAggregate" in out


def test_engine_script_surfaces(eng, spark):
    # imperative surface reachable from the facade
    log = eng.script_debug(
        """
        counter = 0
        each_row where event == "purchase"
          counter = counter + 1
        end
        debug(counter > 0)
        """,
        column_map={"event": "event_type"},
    )
    assert set(log) == {True}
    customers = spark.createDataFrame([(1, 0.0)], "id long, total double")
    out = eng.on_insert(
        'total = sum(value) where event.is(== "purchase")',
        customers,
        column_map={"event": "event_type"},
    )
    row = out.collect()[0]
    assert row.total > 0  # user 1 has purchases in sf0.001


def test_engine_threads_declared_zorder(spark, sf_dir):
    """An engine constructed with the table's declared event_order
    applies it through sessionized() and first_matching() — the
    reference sets zOrder once per table, not per query."""
    import datetime as dt

    from openset_spark.engine import OpenSetEngine

    eng = OpenSetEngine(
        spark, sf_dir, event_order=["purchase", "signup", "error", "click", "view"]
    )
    # same-stamp synthetic rows through the engine's own grid surface
    rows = [
        (1, dt.datetime(2024, 1, 1, 12, 0), 999, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 12, 0), 999, "purchase", 2.0, "{}"),
    ]
    eng._events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    first = eng.first_matching(limit=1).collect()
    assert [r.event_type for r in first] == ["purchase"]
    # without the declared order, insertion id would pick "view"
    eng2 = OpenSetEngine(spark, sf_dir)
    eng2._events = eng._events
    assert [r.event_type for r in eng2.first_matching(limit=1).collect()] == ["view"]


def test_ping_and_status(spark, sf_dir):
    """GET /ping and GET /status analogs (docs/rest/README.md:464,
    src/rpc_status.cpp): liveness, cluster flags with Spark standing
    in for the sentinel, and the table inventory of the source dir."""
    from openset_spark.engine import OpenSetEngine

    eng = OpenSetEngine(spark, sf_dir)
    assert eng.ping() == {"pong": True}
    st = eng.status()
    assert st["status"]["init"] is True
    assert st["status"]["tables"] == len(st["tables"])
    assert {"events", "documents", "lineitem"} <= set(st["tables"])
    assert st["partitions"]["count"] >= 1
    assert st["partitions"]["parallelism"] >= 1


def test_engine_sketch_surface(eng):
    """The r11 bounded-state approximate analytics facade: HLL
    people counts, KMV overlap, HDR quantiles, CMS heavy hitters."""
    from pyspark.sql import functions as F

    people = {
        r.event_type: r.approx_distinct
        for r in eng.approx_people(["event_type"]).collect()
    }
    exact = {
        r.event_type: r.n
        for r in eng.events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(people) == set(exact)
    for t, n in exact.items():
        assert abs(people[t] - n) <= max(3, 0.15 * n), (t, people[t], n)

    ov = eng.segment_overlap(
        F.col("event_type") == "view", F.col("event_type") == "purchase"
    ).first()
    assert 0.0 <= ov.jaccard <= 1.0 and ov.approx_intersection >= 0

    q = eng.approx_quantiles("user_id", (0.5,)).first()
    assert q.est >= 0

    hh = eng.heavy_hitters("event_type", threshold=1)
    assert hh.count() >= 3


def test_engine_segment_overlap_matrix(eng):
    from pyspark.sql import functions as F

    m = eng.segment_overlap_matrix(
        {
            "viewers": F.col("event_type") == "view",
            "buyers": F.col("event_type") == "purchase",
            "clickers": F.col("event_type") == "click",
        }
    ).collect()
    assert len(m) == 3  # all unordered pairs
    for r in m:
        assert 0.0 <= r.jaccard <= 1.0 and r.approx_intersection >= 0


def test_engine_overlap_matrix_empty_segment_and_validation(eng):
    """A predicate matching nothing still appears in every pair
    (jaccard 0.0) instead of silently vanishing; empty dict raises."""
    from pyspark.sql import functions as F
    import pytest as _pt

    m = {
        (r.key_a, r.key_b): r.jaccard
        for r in eng.segment_overlap_matrix(
            {
                "viewers": F.col("event_type") == "view",
                "nobody": F.col("event_type") == "no-such-type-xyz",
            }
        ).collect()
    }
    assert len(m) == 1
    assert m[("nobody", "viewers")] == 0.0
    with _pt.raises(ValueError, match="non-empty"):
        eng.segment_overlap_matrix({})


def test_engine_sliding_surface(eng):
    """r12: the trailing-window family on the facade — live actives
    and live percentile series from bounded per-hour partials,
    cross-checked against direct window builds."""
    from pyspark.sql import functions as F

    from openset_spark.pipeline.hdrhist import approx_quantiles
    from openset_spark.pipeline.hll import approx_distinct

    act = eng.sliding_actives(window=6)
    rows = act.orderBy("bucket").collect()
    assert len(rows) >= 5
    # dense spine: consecutive hour buckets, no holes
    hours = [r.bucket for r in rows]
    assert all(
        (b - a).total_seconds() == 3600 for a, b in zip(hours, hours[1:])
    )
    last = rows[-1]
    lo = last.bucket - __import__("datetime").timedelta(hours=5)
    direct = approx_distinct(
        eng.events.filter(F.col("ts") >= lo), "user_id"
    ).first()
    assert last.approx_distinct == direct.approx_distinct

    q = eng.sliding_quantiles("user_id", window=6, qs=(0.5,))
    qrows = q.orderBy("bucket").collect()
    assert len(qrows) == len(rows)  # same dense spine
    direct_q = approx_quantiles(
        eng.events.filter(F.col("ts") >= lo), "user_id", (0.5,)
    ).first()
    assert qrows[-1].est == direct_q.est

    probes = eng.events.select("user_id").filter(
        F.col("user_id") % 5 == 0
    ).distinct()
    rates = eng.sliding_rates("user_id", probes, window=6)
    rrows = rates.filter(F.col("bucket") == last.bucket).collect()
    assert len(rrows) == probes.count()  # every probe emits
    exact = {
        r.user_id: r.n
        for r in eng.events.filter(F.col("ts") >= lo)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rrows:  # one-sided CMS law per slide point
        assert r.est >= exact.get(r.user_id, 0)

    counts = {r.bucket: r.n for r in eng.sliding_counts(window=6).collect()}
    assert len(counts) == len(rows)  # same dense spine as the sketches
    assert counts[last.bucket] == eng.events.filter(F.col("ts") >= lo).count()


def test_engine_rollup_rates(eng):
    """r12: CMS rollup on the facade — hour-level estimates must fold
    to >= the day's exact counts per watched user (one-sided law),
    and the day level must equal the sum-folded grid's estimates
    (cross-checked against the direct operator)."""
    from pyspark.sql import functions as F

    probes = eng.events.select("user_id").filter(
        F.col("user_id") % 5 == 0
    ).distinct()
    out = eng.rollup_rates("user_id", probes).collect()
    days = [r for r in out if r.granularity == "day"]
    hours = [r for r in out if r.granularity == "hour"]
    assert days and hours
    exact_day = {
        (r.d, r.user_id): r.n
        for r in eng.events.groupBy(
            F.date_trunc("day", "ts").alias("d"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in days:
        assert r.est >= exact_day.get((r.bucket_day, r.user_id), 0)
    # hour estimates of a day sum to >= the day's exact total
    from collections import defaultdict

    hsum = defaultdict(int)
    for r in hours:
        hsum[(r.bucket_day, r.user_id)] += r.est
    for (d, u), n in exact_day.items():
        if (d, u) in hsum:
            assert hsum[(d, u)] >= n or n == 0


def test_engine_actives_store_roundtrip(eng, tmp_path_factory):
    """r13: the facade's store-backed path — build_actives_store
    persists the per-hour registers once; sliding_actives(store=,
    upto=) answers the window ending at upto from the pruned store,
    identically to the raw-scan series at that bucket."""
    import os

    d = str(tmp_path_factory.mktemp("actstore"))
    path = os.path.join(d, "actives")
    eng.build_actives_store(path)
    series = {
        r.bucket: r.approx_distinct
        for r in eng.sliding_actives(window=6).collect()
    }
    upto = max(series)
    got = eng.sliding_actives(window=6, store=path, upto=upto).collect()
    assert len(got) == 1
    assert got[0].bucket == upto
    assert got[0].approx_distinct == series[upto]
    with pytest.raises(ValueError):
        eng.sliding_actives(store=path)
    # a QUIET final slide (no partial at upto) must still answer the
    # trailing window from earlier buckets: with upto one hour past
    # the last stored bucket, the 6h window ending there covers the
    # same events as the 5 trailing stored hours (ADVICE r13 #1)
    import datetime as dt

    upto2 = upto + dt.timedelta(hours=1)
    want5 = {
        r.bucket: r.approx_distinct
        for r in eng.sliding_actives(window=5).collect()
    }[upto]
    got2 = eng.sliding_actives(
        window=6, store=path, upto=upto2
    ).collect()
    assert len(got2) == 1
    assert got2[0].bucket == upto2
    assert got2[0].approx_distinct == want5
    # misaligned upto raises instead of silently matching nothing
    with pytest.raises(ValueError, match="not aligned"):
        eng.sliding_actives(
            window=6, store=path, upto=upto + dt.timedelta(minutes=30)
        )
