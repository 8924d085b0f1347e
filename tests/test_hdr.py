"""Deterministic portable log-linear quantile sketch
(pipeline/hdrhist.py): accuracy envelope vs exact ranks, exact
counter composability (fold == direct, bit for bit), partitioning
invariance, degenerate low-octave buckets, zero/null handling, and
the negative-value contract."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openset_spark.pipeline.hdrhist import (
    approx_quantiles,
    hdr_fold,
    hdr_partials,
    hdr_quantiles,
)


def _exact_rank(sorted_vals, q):
    return sorted_vals[max(0, math.ceil(q * len(sorted_vals)) - 1)]


def test_accuracy_envelope(spark):
    vals = [(i * 7919) % 100000 for i in range(20000)]  # spread, deterministic
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {
        r.q: r.est
        for r in approx_quantiles(df, "x", (0.5, 0.9, 0.99)).collect()
    }
    sv = sorted(vals)
    for q in (0.5, 0.9, 0.99):
        exact = _exact_rank(sv, q)
        # sub_bits=5 -> 1/32 ~ 3.1% bucket error (+ rank resolution)
        assert abs(got[q] - exact) <= max(2, 0.05 * exact), (q, got[q], exact)


def test_fold_equals_direct_bit_for_bit(spark):
    df = spark.range(9000).selectExpr(
        "CAST((id * 131) % 50000 AS LONG) AS x", "id % 6 AS shard"
    )
    per = hdr_partials(df, "x", ("shard",))
    folded = sorted(map(tuple, hdr_fold(per, ()).collect()))
    direct = sorted(map(tuple, hdr_partials(df, "x", ()).collect()))
    assert folded == direct
    # and the folded sketch answers the same quantiles
    a = sorted(map(tuple, hdr_quantiles(hdr_fold(per, ()), (0.5,)).collect()))
    b = sorted(map(tuple, hdr_quantiles(hdr_partials(df, "x", ()), (0.5,)).collect()))
    assert a == b


def test_partitioning_invariance(spark):
    df = spark.range(5000).selectExpr("CAST((id * 37) % 9999 AS LONG) AS x")
    sketches = [
        sorted(map(tuple, hdr_partials(d, "x").collect()))
        for d in (df.repartition(32), df.coalesce(1), df.repartition(7, "x"))
    ]
    assert sketches[0] == sketches[1] == sketches[2]


def test_low_octave_buckets_are_exact(spark):
    """For x < 2^sub_bits every integer gets its own bucket, so the
    quantile is EXACT (the degenerate-bucket midpoint clamp)."""
    df = spark.createDataFrame([(v,) for v in [0, 0, 1, 2, 3, 5, 8, 13]], ["x"])
    got = {
        r.q: r.est
        for r in approx_quantiles(df, "x", (0.25, 0.5, 0.75, 1.0)).collect()
    }
    sv = [0, 0, 1, 2, 3, 5, 8, 13]
    for q, est in got.items():
        assert est == _exact_rank(sv, q), (q, est)


def test_grouped_nulls_and_negative_contract(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", None), ("a", 1000), ("b", 7)], ["g", "x"]
    )
    out = {
        (r.g, r.q): r.est
        for r in approx_quantiles(df, "x", (1.0,), ("g",)).collect()
    }
    assert out[("b", 1.0)] == 7
    assert out[("a", 1.0)] >= 1000 * 31 // 32  # nulls skipped
    neg = spark.createDataFrame([(-3,)], ["x"])
    with pytest.raises(Exception, match="negative value"):
        approx_quantiles(neg, "x", (0.5,)).collect()
    frac = spark.createDataFrame([(0.5,)], ["x"])
    with pytest.raises(Exception, match="non-integral"):
        approx_quantiles(frac, "x", (0.5,)).collect()
    with pytest.raises(ValueError, match="sub_bits"):
        approx_quantiles(df, "x", (0.5,), sub_bits=40)


SETTINGS = settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=1 << 40),
        min_size=1,
        max_size=50,
    ),
    q=st.sampled_from([0.1, 0.5, 0.9, 1.0]),
)
@SETTINGS
def test_law_relative_error_bound(spark, vals, q):
    """The estimate is within one bucket of the exact rank value:
    rel error <= 1/32 + 1/2^octave slack, and never crosses rank
    boundaries (est between the neighbors of the exact value)."""
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    est = approx_quantiles(df, "x", (q,)).collect()[0].est
    exact = _exact_rank(sorted(vals), q)
    if exact == 0:
        assert est == 0
    else:
        assert abs(est - exact) <= max(1, exact / 16), (est, exact)


def test_time_rollup_quantiles_levels_match_per_level_builds(spark, sf_dir):
    """Every level of the grouping-sets rollup must equal an
    independent per-level sketch build — buckets compose by sum, so
    the one-shuffle rollup loses nothing."""
    from openset_spark.sources.tables import load_table
    from openset_spark.pipeline.hdrhist import time_rollup_quantiles

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100 + 0.5).cast("long")
    )
    out = time_rollup_quantiles(
        ev, ("day", "hour"), col="cents", qs=(0.5, 0.95)
    ).collect()
    pre = ev.withColumn("bucket_day", F.date_trunc("day", F.col("ts")))
    direct_day = {
        (r.bucket_day, r.q): r.est
        for r in approx_quantiles(
            pre, "cents", (0.5, 0.95), ("bucket_day",)
        ).collect()
    }
    got_day = {
        (r.bucket_day, r.q): r.est
        for r in out
        if r.granularity == "day"
    }
    assert got_day == direct_day and len(got_day) >= 20
    hours = [r for r in out if r.granularity == "hour"]
    assert len(hours) > len(got_day)
    assert all(r.bucket_hour is not None for r in hours)


def test_exact_domain_contract(spark):
    """Values >= 2^45 raise (the exact-arithmetic domain): Spark's
    `/` is double division, so larger values would silently bucket
    differently from DuckDB's integer `//`."""
    big = spark.createDataFrame([(1 << 45,)], ["x"])
    with pytest.raises(Exception, match="2.45|raise|exact|ERROR"):
        approx_quantiles(big, "x", (0.5,)).collect()
    ok = spark.createDataFrame([((1 << 45) - 1,)], ["x"])
    assert approx_quantiles(ok, "x", (0.5,)).first().est > 0


def test_weighted_quantiles(spark):
    """weight_col counts each row w times — identical to physically
    repeating the rows."""
    rows = [(10, 3), (100, 1), (1000, 2)]
    df = spark.createDataFrame(rows, ["x", "w"])
    expanded = spark.createDataFrame(
        [(x,) for x, w in rows for _ in range(w)], ["x"]
    )
    a = sorted(
        map(
            tuple,
            hdr_quantiles(
                hdr_partials(df, "x", weight_col="w"), (0.5, 1.0)
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            hdr_quantiles(hdr_partials(expanded, "x"), (0.5, 1.0)).collect(),
        )
    )
    assert a == b


def test_sliding_quantiles_equal_direct_window_builds(spark):
    """The windowed bucket-count fold must give EXACTLY the estimate
    a from-scratch sketch over each trailing window's raw rows gives
    (sum composes, so sliding maintenance loses nothing), and a GAP
    hour (zero events) still reports its non-empty trailing window —
    the spine is the dense min..max sequence."""
    import datetime as dt

    from openset_spark.pipeline.hdrhist import hdr_sliding_quantiles

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # 40 hours with a GAP at hours 20-23; drifting value distribution
    for h in [*range(20), *range(24, 40)]:
        for u in range(60):
            rows.append((t0 + dt.timedelta(hours=h, minutes=u), h * 37 + u * u))
    df = spark.createDataFrame(rows, ["ts", "value"])
    got = {
        (r.bucket, r.q): r.est
        for r in hdr_sliding_quantiles(df, window=6, qs=(0.5, 0.95)).collect()
    }
    assert len(got) == 80  # 40 dense hours x 2 quantiles (gap included)
    for h in (5, 19, 21, 23, 24, 30, 39):
        b = t0 + dt.timedelta(hours=h)
        lo = b - dt.timedelta(hours=5)
        direct_rows = df.filter(
            (F.col("ts") >= lo) & (F.col("ts") < b + dt.timedelta(hours=1))
        )
        want = {
            r.q: r.est
            for r in approx_quantiles(
                direct_rows, "value", (0.5, 0.95)
            ).collect()
        }
        for q in (0.5, 0.95):
            assert got[(b, q)] == want[q], (h, q, got[(b, q)], want[q])
