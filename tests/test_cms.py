"""Deterministic portable Count-Min sketch (pipeline/cms.py):
one-sided error law (est >= exact, always), exact counter
composability (fold == direct, bit for bit, any split), grouped
grids, weighted builds, and the heavy-hitter no-miss guarantee."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openset_spark.pipeline.cms import (
    cms_estimate,
    cms_fold,
    cms_heavy_hitters,
    cms_partials,
)


def _exact(df, col):
    return {r[col]: r["n"] for r in df.groupBy(col).agg(F.count("*").alias("n")).collect()}


def test_never_underestimates_and_error_bounded(spark):
    df = spark.range(12000).selectExpr("concat('t', id % 400) AS tok")
    sk = cms_partials(df, "tok", (), depth=4, width=512)
    probes = df.select("tok").distinct()
    est = {
        r["tok"]: r["est"]
        for r in cms_estimate(sk, probes, "tok", (), 4, 512).collect()
    }
    exact = _exact(df, "tok")
    assert all(est[t] >= exact[t] for t in exact)
    # eps = e/512, N = 12000 -> expected overcount per row ~ N/512;
    # assert a loose 8x envelope of the expectation
    assert max(est[t] - exact[t] for t in exact) <= 8 * (12000 / 512)


def test_fold_equals_direct_bit_for_bit(spark):
    """Per-hour grids folded to the day must equal the direct day
    grid EXACTLY — sums compose under any split (the same algebra
    test hll_fold carries for max)."""
    df = spark.range(9000).selectExpr(
        "concat('t', id % 250) AS tok", "id % 24 AS h"
    )
    per_h = cms_partials(df, "tok", ("h",), depth=4, width=256)
    folded = cms_fold(per_h, ())
    direct = cms_partials(df, "tok", (), depth=4, width=256)
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_partitioning_invariance(spark):
    df = spark.range(5000).selectExpr("concat('t', id % 97) AS tok")
    grids = [
        sorted(
            map(
                tuple,
                cms_partials(d, "tok", (), 3, 128).collect(),
            )
        )
        for d in (df.repartition(32), df.coalesce(1), df.repartition(5, "tok"))
    ]
    assert grids[0] == grids[1] == grids[2]


def test_unseen_item_estimates_can_be_zero_and_nulls_skipped(spark):
    df = spark.range(50).selectExpr(
        "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('t', id % 7) END AS tok"
    )
    sk = cms_partials(df, "tok", (), depth=4, width=4096)
    probes = spark.createDataFrame(
        [("t1",), ("never-seen-xyz",)], ["tok"]
    )
    est = {
        r["tok"]: r["est"]
        for r in cms_estimate(sk, probes, "tok", (), 4, 4096).collect()
    }
    exact = _exact(df.filter("tok IS NOT NULL"), "tok")
    assert est["t1"] >= exact["t1"]
    # wide sparse grid: the unseen probe's buckets are almost surely
    # absent -> the left-join coalesce(0) path must yield 0
    assert est["never-seen-xyz"] == 0


def test_grouped_grid_and_weighted_build(spark):
    df = spark.range(2000).selectExpr(
        "concat('t', id % 49) AS tok",  # odd modulus: decorrelated from grp
        "id % 2 AS grp",
        "CAST(1 + id % 3 AS INT) AS w",
    )
    sk = cms_partials(df, "tok", ("grp",), 3, 128, weight_col="w")
    probes = df.select("grp", "tok").distinct()
    est = cms_estimate(sk, probes, "tok", ("grp",), 3, 128)
    exact = df.groupBy("grp", "tok").agg(F.sum("w").alias("n"))
    j = est.join(exact, ["grp", "tok"]).collect()
    assert len(j) == 98
    assert all(r["est"] >= r["n"] for r in j)


def test_heavy_hitters_never_miss(spark):
    # 10 hot tokens at 300 each + 500 cold tokens at ~6 each
    df = spark.range(6000).selectExpr(
        "CASE WHEN id < 3000 THEN concat('hot', id % 10) "
        "ELSE concat('cold', id % 500) END AS tok"
    )
    hh = {
        r["tok"]
        for r in cms_heavy_hitters(df, "tok", threshold=300, width=2048).collect()
    }
    assert all(f"hot{i}" in hh for i in range(10))  # one-sided: no miss
    # collisions can admit a few cold tokens, never exclude hot ones
    assert len(hh) <= 10 + 25


SETTINGS = settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_law_fold_invariance_and_overcount(spark, rows):
    """Any split of the input (here: by a random shard column) folds
    to the direct grid exactly, and every point estimate dominates
    the exact count."""
    df = spark.createDataFrame(
        [(f"t{t}", s) for t, s in rows], ["tok", "shard"]
    )
    direct = cms_partials(df, "tok", (), 2, 32)
    folded = cms_fold(cms_partials(df, "tok", ("shard",), 2, 32), ())
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, folded.collect())
    )
    probes = df.select("tok").distinct()
    est = {
        r["tok"]: r["est"]
        for r in cms_estimate(direct, probes, "tok", (), 2, 32).collect()
    }
    exact = _exact(df, "tok")
    assert all(est[t] >= exact[t] for t in exact)


def test_grid_replays_in_duckdb(spark):
    """The grid is engine-portable: DuckDB computes the identical
    (d, bucket, cnt) rows via integer division over the same md5
    digits. This is the regression fence for the double-division
    bucketing bug (floor(h/1) % 2048 = 0 for h = 2^60-1 in Spark's
    double arithmetic; exact is 2047)."""
    import duckdb

    df = spark.range(5000).selectExpr("concat('t', id % 300) AS tok")
    grid = sorted(map(tuple, cms_partials(df, "tok", (), 4, 2048).collect()))
    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck = con.execute(
        """
        WITH ds AS (SELECT * FROM (VALUES (0, 1::BIGINT),
          (1, 2048::BIGINT), (2, 4194304::BIGINT),
          (3, 8589934592::BIGINT)) v(d, wp)),
        h AS (SELECT CAST(CAST(concat('0x', substr(md5(tok), 1, 15))
          AS UBIGINT) AS BIGINT) AS hv FROM t)
        SELECT d, CAST((hv // wp) % 2048 AS INTEGER) AS bucket,
          COUNT(*)::BIGINT AS cnt
        FROM h, ds GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    assert [(int(a), int(b), int(c)) for a, b, c in duck] == grid


def test_non_power_of_two_width_still_exact(spark):
    """The digit extraction is exact for ANY width (the numerator
    has a <= log2(width)-bit significand): a width-100 grid still
    replays in integer arithmetic."""
    df = spark.range(400).selectExpr("concat('t', id % 37) AS tok")
    grid = {
        (r.d, r.bucket): r.cnt
        for r in cms_partials(df, "tok", (), 3, 100).collect()
    }
    import hashlib

    expect = {}
    for i in range(400):
        tok = f"t{i % 37}"
        hv = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for d in range(3):
            k = (d, (hv // (100**d)) % 100)
            expect[k] = expect.get(k, 0) + 1
    assert grid == expect


def test_turnstile_deletions_fold_to_net_corpus(spark):
    """Negative weights = deletions: inserts folded with deletes
    equal the direct build over the net corpus exactly."""
    full = spark.range(4000).selectExpr("concat('t', id % 80) AS tok")
    gone = full.filter("tok IN ('t3', 't7')")
    ins = cms_partials(full, "tok", (), 3, 256)
    dele = cms_partials(
        gone.selectExpr("tok", "CAST(-1 AS INT) AS w"),
        "tok",
        (),
        3,
        256,
        weight_col="w",
    )
    net = cms_fold(ins.unionByName(dele), ())
    direct = cms_partials(
        full.filter("tok NOT IN ('t3', 't7')"), "tok", (), 3, 256
    )
    # zero-count buckets survive as explicit rows in the folded
    # grid; drop them for the direct comparison
    got = sorted(map(tuple, net.filter("cnt <> 0").collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_sliding_estimate_equals_direct_window_builds(spark):
    """The windowed grid fold must give EXACTLY the estimate a
    from-scratch CMS over each trailing window's raw rows gives
    (sum composes); gap hours emit (dense spine); a probe observed
    only EARLY still emits 0-estimates at later slide points; a
    probe never observed estimates 0 everywhere."""
    import datetime as dt

    from openset_spark.pipeline.cms import cms_sliding_estimate

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # 30 hours with a GAP at 12-15; item mix shifts over time;
    # "early" appears only in hours 0-3
    for h in [*range(12), *range(16, 30)]:
        for i in range(40):
            rows.append((t0 + dt.timedelta(hours=h, minutes=i), f"tok{i % (5 + h % 3)}"))
        if h < 4:
            rows.append((t0 + dt.timedelta(hours=h, minutes=50), "early"))
    df = spark.createDataFrame(rows, ["ts", "item"])
    probes = spark.createDataFrame(
        [("tok0",), ("tok3",), ("early",), ("never-seen",)], ["item"]
    )
    out = cms_sliding_estimate(
        df, "item", probes, "ts", "hour", 6, depth=3, width=1024
    )
    got = {(r.bucket, r.item): r.est for r in out.collect()}
    assert len(got) == 30 * 4  # dense spine x probes, gap included
    for h in (3, 9, 13, 16, 20, 29):
        b = t0 + dt.timedelta(hours=h)
        lo = b - dt.timedelta(hours=5)
        win = df.filter(
            (F.col("ts") >= lo) & (F.col("ts") < b + dt.timedelta(hours=1))
        )
        sk = cms_partials(win, "item", (), 3, 1024)
        want = {
            r.item: r.est
            for r in cms_estimate(sk, probes, "item", (), 3, 1024).collect()
        }
        for p in ("tok0", "tok3", "early", "never-seen"):
            assert got[(b, p)] == want[p], (h, p, got[(b, p)], want[p])
    # the early-only probe goes to 0 once its hours leave the window
    assert got[(t0 + dt.timedelta(hours=9), "early")] == 0
    assert all(got[(t0 + dt.timedelta(hours=h), "never-seen")] == 0
               for h in range(30))


def test_time_rollup_estimate_levels_match_per_level_builds(spark):
    """The single-shuffle multi-granularity grid must give EXACTLY
    the estimates independent per-level grids give (grids compose by
    sum), the one-sided est >= exact law holds at EVERY level, and a
    probe absent from the corpus estimates 0 at every level."""
    import datetime as dt
    import random

    from openset_spark.pipeline.cms import cms_time_rollup_estimate

    rnd = random.Random(7)
    rows = [
        (
            f"tok{rnd.randrange(12)}",
            dt.datetime(2024, 3, 1 + rnd.randrange(2), rnd.randrange(24)),
        )
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "item string, ts timestamp")
    probes = spark.createDataFrame(
        [("tok0",), ("tok7",), ("never-seen",)], ["item"]
    )
    out = cms_time_rollup_estimate(
        df, "item", probes, ("day", "hour"), depth=3, width=1024
    )
    got = {
        (r.granularity, r.bucket_day, r.bucket_hour, r.item): r.est
        for r in out.collect()
    }
    # per-level reference: independent grids per (day) and (day, hour)
    for level, bcols in (("day", ["bd"]), ("hour", ["bd", "bh"])):
        pre = df.withColumn("bd", F.date_trunc("day", "ts")).withColumn(
            "bh", F.date_trunc("hour", "ts")
        )
        sk = cms_partials(pre, "item", tuple(bcols), 3, 1024)
        lev = {b: None for b in set()}
        for b in [tuple(r) for r in pre.select(*bcols).distinct().collect()]:
            cond = F.lit(True)
            for c, v in zip(bcols, b):
                cond = cond & (F.col(c) == F.lit(v))
            sub = sk
            for c, v in zip(bcols, b):
                sub = sub.filter(F.col(c) == F.lit(v))
            ref = {
                r.item: r.est
                for r in cms_estimate(
                    sub.drop(*bcols), probes, "item", (), 3, 1024
                ).collect()
            }
            exact = {
                r.item: r.n
                for r in pre.filter(cond)
                .groupBy("item")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            bd = b[0]
            bh = b[1] if level == "hour" else None
            for p in ("tok0", "tok7", "never-seen"):
                est = got[(level, bd, bh, p)]
                assert est == ref[p], (level, b, p, est, ref[p])
                assert est >= exact.get(p, 0)  # one-sided at every level
    assert all(
        v == 0 for (g, bd, bh, p), v in got.items() if p == "never-seen"
    )


def test_time_rollup_estimate_expands_grid_not_rows(spark):
    """The grouping-sets Expand must sit ABOVE the finest grid
    aggregate — the xN level amplification applies to <= depth x
    width rows per finest group, never to the raw scan (the
    time_rollup_distinct / time_rollup_quantiles plan law). Asserted
    on the pre-checkpoint grid (_leveled_grid): the public function
    pins that frame (ADVICE r12 — one grid aggregate over raw), which
    collapses its optimized plan to an ExistingRDD scan."""
    import datetime as dt

    from openset_spark.pipeline.cms import _leveled_grid

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 3, 1, h)) for h in range(24)],
        "item string, ts timestamp",
    )
    out = _leveled_grid(df, "item", ("day", "hour"), "ts", 4, 2048, None)
    plan = out._jdf.queryExecution().optimizedPlan()
    found = []

    def walk(node, under_expand):
        name = node.nodeName()
        if name == "Expand":
            under_expand = True
        if under_expand and name == "Aggregate":
            found.append("agg_under_expand")
        for i in range(node.children().size()):
            walk(node.children().apply(i), under_expand)

    walk(plan, False)
    assert "agg_under_expand" in found, plan.toString()
