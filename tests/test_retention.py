"""Event-row TTL / retention maintenance (the oloop_cleaner analog).

Reference semantics: src/oloop_cleaner.cpp runs Grid::cull()
(src/grid.cpp:698-749) per person on table->maintInterval, enforcing
the per-table settings event_ttl (src/table.h:124, drop rows older
than now - ttl) and event_max (src/table.h:122, keep the newest N
rows per person). Here the policy is `retention_filter` and the
storage maintenance is `apply_retention`; the scale property under
test is that the partitioned layout DELETES whole expired days
without scanning them and confines the one real scan to the boundary
day via partition pruning.
"""

from __future__ import annotations

import datetime as dt
import os
import re

import pandas as pd
from pyspark.sql import functions as F

from openset_spark.sources.catalog import PropertyDef, TableDef
from openset_spark.sources.tables import (
    _boundary_rewrite_frame,
    apply_retention,
    list_day_partitions,
    load_table,
    retention_filter,
    write_partitioned_by_day,
)
from tests.test_plans import plan_str


def _ts_bounds_ms(ev):
    row = ev.agg(
        F.unix_millis(F.min("ts")).alias("lo"), F.unix_millis(F.max("ts")).alias("hi")
    ).first()
    return row["lo"], row["hi"]


def _midpoint_cutoff(ev):
    lo, hi = _ts_bounds_ms(ev)
    assert lo < hi
    return (lo + hi) // 2


def test_retention_filter_matches_python_replay(spark, sf_dir):
    """TTL + per-user cap vs an independent pandas replay of
    Grid::cull()'s documented semantics."""
    ev = load_table(spark, sf_dir, "events")
    lo, hi = _ts_bounds_ms(ev)
    ttl_ms = (hi - lo) // 2
    now_ms = hi
    cutoff_ms = now_ms - ttl_ms
    cap = 5

    out = retention_filter(ev, now_ms, ttl_ms=ttl_ms, event_max=cap)
    got = {
        (r["user_id"], r["event_id"])
        for r in out.select("user_id", "event_id").collect()
    }

    pdf = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    ).toPandas()
    live = pdf[pdf.ts_us >= cutoff_ms * 1000]
    expected = set()
    for _, grp in live.groupby("user_id"):
        newest = grp.sort_values(["ts_us", "event_id"], ascending=False).head(cap)
        expected.update(zip(newest.user_id, newest.event_id))
    assert got == expected and len(got) > 0


def test_retention_filter_ttl_only_skips_user_shuffle(spark, sf_dir):
    """TTL-only maintenance must stay a pure filter: no window, no
    per-user exchange in the plan."""
    from tests.test_plans import user_exchanges

    ev = load_table(spark, sf_dir, "events")
    _, hi = _ts_bounds_ms(ev)
    out = retention_filter(ev, hi, ttl_ms=3_600_000, event_max=None)
    assert user_exchanges(out) == 0, plan_str(out, "simple")


def test_retention_ttl_filter_pushes_to_scan(spark, sf_dir, tmp_path_factory):
    """On a stored (non-nano) layout the TTL comparison must reach the
    parquet scan as a pushed filter."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path_factory.mktemp("flat_ttl")) + "/events"
    ev.write.parquet(path)
    back = spark.read.parquet(path)
    _, hi = _ts_bounds_ms(ev)
    out = retention_filter(back, hi, ttl_ms=3_600_000, event_max=None)
    plan = plan_str(out)
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(ts" in plan, plan


def test_apply_retention_partitioned_drops_whole_days(spark, sf_dir, tmp_path_factory):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path_factory.mktemp("parted_ttl")) + "/events_p"
    write_partitioned_by_day(ev, path)
    days = list_day_partitions(path)
    assert len(days) >= 3, days

    # cutoff at noon of a middle day: exercises whole-day drops AND the
    # boundary-day partial rewrite in one pass
    mid_day = days[len(days) // 2]
    mid = dt.datetime.fromisoformat(mid_day).replace(
        hour=12, tzinfo=dt.timezone.utc
    )
    cutoff_ms = int(mid.timestamp() * 1000)
    ttl_ms = 86_400_000
    now_ms = cutoff_ms + ttl_ms

    expected_ids = {
        r["event_id"]
        for r in ev.filter(
            F.col("ts") >= F.timestamp_micros(F.lit(cutoff_ms * 1000))
        )
        .select("event_id")
        .collect()
    }

    report = apply_retention(spark, path, now_ms, ttl_ms=ttl_ms)
    assert report["layout"] == "partitioned"
    assert report["dropped_partitions"] == [d for d in days if d < mid_day]
    assert report["boundary_rewritten"] == mid_day

    # expired day directories are gone from disk; survivors intact
    assert list_day_partitions(path) == [d for d in days if d >= mid_day]
    back = spark.read.parquet(path)
    got_ids = {r["event_id"] for r in back.select("event_id").collect()}
    assert got_ids == expected_ids and len(got_ids) > 0

    # the boundary day kept only its post-cutoff tail
    boundary = back.filter(F.col("event_date") == mid_day)
    min_kept = boundary.agg(F.unix_millis(F.min("ts"))).first()[0]
    assert min_kept >= cutoff_ms


def test_boundary_rewrite_scan_is_partition_pruned(spark, sf_dir, tmp_path_factory):
    """The ONLY scan apply_retention issues on the partitioned layout
    must be pruned to the boundary day — deletes are directory ops,
    never reads."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path_factory.mktemp("parted_plan")) + "/events_p"
    write_partitioned_by_day(ev, path)
    days = list_day_partitions(path)
    mid_day = days[len(days) // 2]
    mid = dt.datetime.fromisoformat(mid_day).replace(
        hour=12, tzinfo=dt.timezone.utc
    )
    frame = _boundary_rewrite_frame(
        spark, path, mid_day, int(mid.timestamp() * 1_000_000), "ts"
    )
    plan = plan_str(frame)
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    assert re.search(rf"event_date#\d+ = {mid_day}", plan), plan
    # and the in-day TTL predicate is pushed into that pruned scan
    assert "GreaterThanOrEqual(ts" in plan, plan


def test_apply_retention_flat_rewrite(spark, sf_dir, tmp_path_factory):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path_factory.mktemp("flat_ttl2")) + "/events"
    ev.write.parquet(path)
    cutoff_ms = _midpoint_cutoff(ev)
    ttl_ms = 86_400_000
    report = apply_retention(spark, path, cutoff_ms + ttl_ms, ttl_ms=ttl_ms)
    assert report["layout"] == "flat"

    expected = ev.filter(
        F.col("ts") >= F.timestamp_micros(F.lit(cutoff_ms * 1000))
    ).count()
    back = spark.read.parquet(path)
    assert back.count() == expected == report["rows_kept"]
    assert report["rows_removed"] == ev.count() - expected > 0
    # no temp residue next to the table
    parent = os.path.dirname(path)
    assert [n for n in os.listdir(parent) if "retention_tmp" in n] == []


def test_tabledef_carries_retention_settings():
    t = TableDef(
        "highstreet",
        properties=(PropertyDef("value", "double"),),
        event_ttl_ms=86_400_000 * 30,
        event_max=100,
    )
    d = t.describe()
    # reference settings-key names (src/table.cpp:151-152)
    assert d["event_ttl"] == 86_400_000 * 30 and d["event_max"] == 100
    assert TableDef.from_describe(d) == t
    # defaults mirror src/table.h:122-124
    base = TableDef("t")
    assert base.event_ttl_ms == 86_400_000 * 365 * 5 and base.event_max == 5000
    # property edits preserve the settings
    assert t.with_property(PropertyDef("n", "int")).event_ttl_ms == t.event_ttl_ms
    assert t.drop_property("value").event_max == 100
    try:
        TableDef("t", event_ttl_ms=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_engine_cull_and_maintain(spark, sf_dir, tmp_path_factory):
    """The facade surface: cull() is the policy view (deterministic
    now = max stamp), maintain() the storage pass over an explicit
    materialization."""
    from openset_spark.engine import OpenSetEngine

    eng = OpenSetEngine(spark, sf_dir)
    lo, hi = _ts_bounds_ms(eng.events)
    ttl = (hi - lo) // 2
    culled = eng.cull(ttl_ms=ttl)
    expected = eng.events.filter(
        F.col("ts") >= F.timestamp_micros(F.lit((hi - ttl) * 1000))
    ).count()
    assert culled.count() == expected > 0
    # event_max caps per user
    capped = eng.cull(ttl_ms=None, event_max=2)
    per_user_max = capped.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert per_user_max <= 2

    path = str(tmp_path_factory.mktemp("eng_maint")) + "/events_p"
    write_partitioned_by_day(eng.events, path)
    report = eng.maintain(path, now_ms=hi, ttl_ms=ttl)
    assert report["layout"] == "partitioned"
    assert spark.read.parquet(path).count() == expected


def test_tabledef_drives_retention_filter(spark, sf_dir):
    """End-to-end: a table's declared settings drive the cull, same
    result as passing them explicitly."""
    ev = load_table(spark, sf_dir, "events")
    _, hi = _ts_bounds_ms(ev)
    lo, _ = _ts_bounds_ms(ev)
    t = TableDef("events", event_ttl_ms=(hi - lo) // 2, event_max=3)
    via_def = retention_filter(
        ev, hi, ttl_ms=t.event_ttl_ms, event_max=t.event_max
    )
    explicit = retention_filter(ev, hi, ttl_ms=(hi - lo) // 2, event_max=3)
    assert via_def.count() == explicit.count() > 0


def test_apply_retention_edges(spark, sf_dir, tmp_path_factory):
    """Nothing-expired is a no-op report; everything-expired drops all
    day directories (metastore semantics: an empty table, not an
    error during the maintenance pass itself)."""
    ev = load_table(spark, sf_dir, "events")
    lo, hi = _ts_bounds_ms(ev)

    # nothing expired: cutoff before the data begins
    p1 = str(tmp_path_factory.mktemp("ret_edge1")) + "/events_p"
    write_partitioned_by_day(ev, p1)
    days = list_day_partitions(p1)
    rep1 = apply_retention(spark, p1, now_ms=lo, ttl_ms=86_400_000 * 1000)
    assert rep1["dropped_partitions"] == [] and rep1["boundary_rewritten"] is None
    assert list_day_partitions(p1) == days
    assert spark.read.parquet(p1).count() == ev.count()

    # everything expired: cutoff after the data ends
    p2 = str(tmp_path_factory.mktemp("ret_edge2")) + "/events_p"
    write_partitioned_by_day(ev, p2)
    rep2 = apply_retention(spark, p2, now_ms=hi + 2 * 86_400_000, ttl_ms=1)
    assert rep2["dropped_partitions"] == days
    assert list_day_partitions(p2) == []

    # flat layout, everything expired: table remains readable and empty
    p3 = str(tmp_path_factory.mktemp("ret_edge3")) + "/events"
    ev.write.parquet(p3)
    rep3 = apply_retention(spark, p3, now_ms=hi + 2 * 86_400_000, ttl_ms=1)
    assert rep3["rows_kept"] == 0 and rep3["rows_removed"] == ev.count()
    assert spark.read.parquet(p3).count() == 0


def _cull_replay(ev, now_ms, ttl_ms, cap):
    """Independent pandas replay of Grid::cull (TTL then newest-N)."""
    pdf = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    ).toPandas()
    if ttl_ms is not None:
        pdf = pdf[pdf.ts_us >= (now_ms - ttl_ms) * 1000]
    expected = set()
    for _, grp in pdf.groupby("user_id"):
        newest = grp.sort_values(["ts_us", "event_id"], ascending=False)
        if cap is not None:
            newest = newest.head(cap)
        expected.update(zip(newest.user_id, newest.event_id))
    return expected


def _day_files(path, day):
    d = os.path.join(path, f"event_date={day}")
    return sorted(
        (f, os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def test_apply_retention_cap_partitioned(spark, sf_dir, tmp_path_factory):
    """event_max maintenance on the by-day layout: matches the pandas
    replay, and days holding no over-cap rows are never rewritten
    (their parquet files stay byte-identical on disk)."""
    ev = load_table(spark, sf_dir, "events")
    _, hi = _ts_bounds_ms(ev)
    path = str(tmp_path_factory.mktemp("parted_cap")) + "/events_p"
    write_partitioned_by_day(ev, path)
    days = list_day_partitions(path)
    cap = 20

    expected = _cull_replay(ev, hi, None, cap)
    before_files = {d: _day_files(path, d) for d in days}

    report = apply_retention(
        spark, path, now_ms=hi, ttl_ms=None, event_max=cap
    )
    assert report["layout"] == "partitioned"
    assert report["dropped_partitions"] == []
    rewritten = set(report["cap_rewritten_days"])
    assert rewritten, "cap=20 should doom rows at this SF"
    # a user's doomed rows are their OLDEST — the newest day must
    # survive untouched
    untouched = [d for d in days if d not in rewritten]
    assert days[-1] in untouched
    for d in untouched:
        assert _day_files(path, d) == before_files[d], d

    back = spark.read.parquet(path)
    got = {
        (r["user_id"], r["event_id"])
        for r in back.select("user_id", "event_id").collect()
    }
    assert got == expected and len(got) > 0
    assert report["cap_rows_removed"] == ev.count() - len(expected)


def test_apply_retention_ttl_and_cap_partitioned(spark, sf_dir, tmp_path_factory):
    """Both settings in one maintenance pass, like the reference's
    cleaner tick: TTL day-drops first, then the cap's targeted
    rewrite over the survivors."""
    ev = load_table(spark, sf_dir, "events")
    lo, hi = _ts_bounds_ms(ev)
    ttl_ms = (hi - lo) // 2
    cap = 10
    path = str(tmp_path_factory.mktemp("parted_both")) + "/events_p"
    write_partitioned_by_day(ev, path)

    expected = _cull_replay(ev, hi, ttl_ms, cap)
    report = apply_retention(
        spark, path, now_ms=hi, ttl_ms=ttl_ms, event_max=cap
    )
    assert report["dropped_partitions"], "midpoint TTL should drop days"
    back = spark.read.parquet(path)
    got = {
        (r["user_id"], r["event_id"])
        for r in back.select("user_id", "event_id").collect()
    }
    assert got == expected and len(got) > 0


def test_apply_retention_partitioned_full_drop_stays_readable(
    spark, sf_dir, tmp_path_factory
):
    """Everything-expired on the by-day layout must leave a READABLE
    empty table (schema preserved), matching the flat layout's
    empty-but-readable rewrite."""
    ev = load_table(spark, sf_dir, "events")
    _, hi = _ts_bounds_ms(ev)
    path = str(tmp_path_factory.mktemp("parted_empty")) + "/events_p"
    write_partitioned_by_day(ev, path)
    report = apply_retention(
        spark, path, now_ms=hi + 2 * 86_400_000, ttl_ms=1
    )
    assert report.get("emptied") is True
    back = spark.read.parquet(path)
    assert back.count() == 0
    assert {"user_id", "ts", "event_id", "event_date"} <= set(back.columns)


def test_apply_retention_bucketed_no_shuffle(spark, sf_dir, tmp_path_factory):
    """The bucketed layout runs TTL + cap with ZERO exchanges (the
    bucket clustering satisfies the window's distribution), and the
    swap re-registers the table with the same bucket spec."""
    from openset_spark.sources.tables import (
        apply_retention_bucketed,
        write_bucketed,
    )

    ev = load_table(spark, sf_dir, "events")
    lo, hi = _ts_bounds_ms(ev)
    ttl_ms = (hi - lo) // 2
    cap = 10
    path = str(tmp_path_factory.mktemp("bucketed_ret")) + "/events_b"
    tbl = "events_ret_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(ev, tbl, path, bucket_col="user_id", buckets=8, sort_col="ts")

    # the maintenance frame itself: no Exchange anywhere in the plan
    frame = retention_filter(
        spark.table(tbl), hi, ttl_ms=ttl_ms, event_max=cap
    )
    plan = plan_str(frame)
    assert "Exchange" not in plan, plan

    expected = _cull_replay(ev, hi, ttl_ms, cap)
    report = apply_retention_bucketed(
        spark, tbl, path, now_ms=hi, ttl_ms=ttl_ms, event_max=cap
    )
    assert report["rows_kept"] == len(expected)
    back = spark.table(tbl)
    got = {
        (r["user_id"], r["event_id"])
        for r in back.select("user_id", "event_id").collect()
    }
    assert got == expected and len(got) > 0
    # re-registered table keeps the bucket spec (so the NEXT
    # maintenance tick is also shuffle-free)
    info = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE EXTENDED {tbl}").collect()
    }
    assert info["Num Buckets"] == "8"
    assert "user_id" in info["Bucket Columns"]
    again = retention_filter(spark.table(tbl), hi, ttl_ms=ttl_ms, event_max=cap)
    assert "Exchange" not in plan_str(again)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_retention_filter_without_order_column(spark, sf_dir):
    """Frames lacking the tie-break column fall back to ts-only
    ordering instead of raising (ADVICE r6)."""
    ev = load_table(spark, sf_dir, "events").drop("event_id")
    _, hi = _ts_bounds_ms(ev)
    out = retention_filter(ev, hi, ttl_ms=None, event_max=3)
    per_user_max = (
        out.groupBy("user_id").count().agg(F.max("count")).first()[0]
    )
    assert per_user_max <= 3


def test_engine_maintain_bucketed_and_cap(spark, sf_dir, tmp_path_factory):
    """maintain() drives both new surfaces: event_max on the
    partitioned layout, and table= for the bucketed pass."""
    from openset_spark.engine import OpenSetEngine
    from openset_spark.sources.tables import write_bucketed

    eng = OpenSetEngine(spark, sf_dir)
    lo, hi = _ts_bounds_ms(eng.events)
    cap = 15

    p = str(tmp_path_factory.mktemp("eng_cap")) + "/events_p"
    write_partitioned_by_day(eng.events, p)
    rep = eng.maintain(p, now_ms=hi, ttl_ms=None, event_max=cap)
    assert rep["cap_rows_removed"] > 0
    assert spark.read.parquet(p).count() == len(
        _cull_replay(eng.events, hi, None, cap)
    )

    pb = str(tmp_path_factory.mktemp("eng_buck")) + "/events_b"
    tbl = "events_eng_buck"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(eng.events, tbl, pb, bucket_col="user_id", buckets=4)
    rep2 = eng.maintain(pb, now_ms=hi, ttl_ms=None, event_max=cap, table=tbl)
    assert rep2["layout"] == "bucketed"
    assert spark.table(tbl).count() == len(_cull_replay(eng.events, hi, None, cap))
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
