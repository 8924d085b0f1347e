"""Deterministic portable KMV sketch (pipeline/kmv.py): distinct
accuracy envelope, exact-below-k, exact order-statistic
composability (fold == direct, bit for bit), partitioning
invariance, direct Jaccard/intersection estimates (the case HLL
inclusion-exclusion fumbles), and the WindowGroupLimit build plan."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openset_spark.pipeline.kmv import (
    kmv_distinct_estimate,
    kmv_fold,
    kmv_jaccard,
    kmv_observations,
    kmv_partials,
)


def test_distinct_accuracy_envelope(spark):
    df = spark.range(40000).selectExpr("concat('u', id % 8000) AS u")
    est = kmv_distinct_estimate(kmv_partials(df, "u")).first().approx_distinct
    # k=512 -> sigma ~ 1/sqrt(510) ~ 4.4%; allow 4 sigma
    assert abs(est - 8000) / 8000 < 0.18, est


def test_exact_below_k(spark):
    df = spark.range(300).selectExpr("concat('u', id) AS u")
    est = kmv_distinct_estimate(kmv_partials(df, "u")).first().approx_distinct
    assert est == 300.0


def test_fold_equals_direct_bit_for_bit(spark):
    df = spark.range(30000).selectExpr(
        "concat('u', id % 5000) AS u", "id % 4 AS shard"
    )
    shards = [
        kmv_partials(df.filter(F.col("shard") == i), "u")
        for i in range(4)
    ]
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    folded = sorted(r.hv for r in kmv_fold(u).collect())
    direct = sorted(r.hv for r in kmv_partials(df, "u").collect())
    assert folded == direct and len(direct) == 512


def test_partitioning_invariance_and_grouped(spark):
    df = spark.range(9000).selectExpr(
        "concat('u', id % 2000) AS u", "id % 3 AS g"
    )
    a = sorted(
        map(tuple, kmv_partials(df.repartition(32), "u", ("g",), 64).collect())
    )
    b = sorted(
        map(tuple, kmv_partials(df.coalesce(1), "u", ("g",), 64).collect())
    )
    assert a == b
    ests = {
        r.g: r.approx_distinct
        for r in kmv_distinct_estimate(
            kmv_partials(df, "u", ("g",), 256), ("g",), 256
        ).collect()
    }
    assert len(ests) == 3


def test_jaccard_direct_beats_small_overlap(spark):
    """|A|=|B|=6000, |A∩B|=600 (J=0.0526): the joint-sample
    estimator stays within ~30% relative; HLL inclusion-exclusion
    at p=10 has sigma ~3.2% of EACH 6k-set -> same-order-of-
    magnitude noise as the whole answer."""
    A = spark.range(6000).selectExpr("concat('u', id) AS u")
    B = spark.range(5400, 11400).selectExpr("concat('u', id) AS u")
    r = kmv_jaccard(kmv_partials(A, "u"), kmv_partials(B, "u")).first()
    true_j = 600 / 11400
    assert abs(r.jaccard - true_j) / true_j < 0.35, r
    assert abs(r.approx_intersection - 600) / 600 < 0.4, r


def test_build_plan_uses_window_group_limit(spark):
    df = spark.range(5000).selectExpr("concat('u', id) AS u")
    plan = (
        kmv_partials(df, "u")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_validation_and_nulls(spark):
    df = spark.createDataFrame([("a",), (None,)], ["u"])
    assert kmv_partials(df, "u").count() == 1
    with pytest.raises(ValueError, match="k must be"):
        kmv_partials(df, "u", k=1)


SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    xs=st.sets(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    ys=st.sets(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
)
@SETTINGS
def test_law_small_sets_are_exact(spark, xs, ys):
    """Below k the sketch IS the distinct set: distinct estimates
    and Jaccard/intersection are EXACT."""
    A = spark.createDataFrame([(f"u{x}",) for x in xs], ["u"])
    B = spark.createDataFrame([(f"u{y}",) for y in ys], ["u"])
    sa, sb = kmv_partials(A, "u", k=512), kmv_partials(B, "u", k=512)
    assert kmv_distinct_estimate(sa, k=512).first().approx_distinct == float(len(xs))
    r = kmv_jaccard(sa, sb, k=512).first()
    inter = len(xs & ys)
    union = len(xs | ys)
    assert r.jaccard == round(inter / union, 4)
    assert abs(r.approx_intersection - inter) < 0.02


def test_overlap_matrix_exact_below_k(spark):
    """Three small segments: every pairwise Jaccard/intersection is
    EXACT (sketches below k are the sets), including a disjoint
    pair (left-join zero path)."""
    from openset_spark.pipeline.kmv import kmv_overlap_matrix

    sets = {
        "a": set(range(0, 60)),
        "b": set(range(40, 100)),
        "c": set(range(200, 230)),
    }
    rows = [(s, f"u{v}") for s, vals in sets.items() for v in vals]
    df = spark.createDataFrame(rows, ["segment", "u"])
    sk = kmv_partials(df, "u", ("segment",), k=512)
    got = {
        (r.key_a, r.key_b): (r.jaccard, r.approx_intersection)
        for r in kmv_overlap_matrix(sk, "segment", 512).collect()
    }
    assert len(got) == 3
    for (x, y), (j, i) in got.items():
        inter = len(sets[x] & sets[y])
        union = len(sets[x] | sets[y])
        assert j == round(inter / union, 4), (x, y, j)
        assert abs(i - inter) < 0.02, (x, y, i)


def test_overlap_matrix_estimates_large_sets(spark):
    """Beyond k the estimator stays in the accuracy envelope."""
    from openset_spark.pipeline.kmv import kmv_overlap_matrix

    a = spark.range(6000).selectExpr("'a' AS segment", "concat('u', id) AS u")
    b = spark.range(3000, 9000).selectExpr(
        "'b' AS segment", "concat('u', id) AS u"
    )
    sk = kmv_partials(a.unionByName(b), "u", ("segment",), k=512)
    r = kmv_overlap_matrix(sk, "segment", 512).first()
    assert abs(r.jaccard - 1 / 3) < 0.08
    assert abs(r.approx_intersection - 3000) / 3000 < 0.25


def test_difference_exact_below_k_and_estimates_beyond(spark):
    from openset_spark.pipeline.kmv import kmv_difference

    A = spark.createDataFrame([(f"u{i}",) for i in range(80)], ["u"])
    B = spark.createDataFrame([(f"u{i}",) for i in range(50, 120)], ["u"])
    d = kmv_difference(
        kmv_partials(A, "u"), kmv_partials(B, "u")
    ).first().approx_difference
    assert d == 50.0  # exact below k
    A2 = spark.range(6000).selectExpr("concat('u', id) AS u")
    B2 = spark.range(4000, 10000).selectExpr("concat('u', id) AS u")
    d2 = kmv_difference(
        kmv_partials(A2, "u"), kmv_partials(B2, "u")
    ).first().approx_difference
    assert abs(d2 - 4000) / 4000 < 0.25, d2


def test_sliding_jaccard_equals_direct_window_builds(spark):
    """The windowed sketch re-rank must give EXACTLY the estimates a
    from-scratch pair of sketches over each trailing window's raw
    rows gives (min order statistics compose: every window-k-min hash
    is inside its own hour's k-min) — including a GAP hour served by
    earlier hours, and a window where one side is absent (jaccard
    0.0)."""
    import datetime as dt

    from openset_spark.pipeline.kmv import (
        kmv_jaccard_by,
        kmv_partials,
        kmv_sliding_jaccard,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # 30 hours, GAP at 12-15; buyers only exist from hour 18 on
    for h in [*range(12), *range(16, 30)]:
        for u in range(40):
            rows.append((t0 + dt.timedelta(hours=h, minutes=u), u % 25, "view"))
        if h >= 18:
            for u in range(10):
                rows.append(
                    (t0 + dt.timedelta(hours=h, minutes=u + 40), (u + h) % 25, "buy")
                )
    df = spark.createDataFrame(rows, ["ts", "user_id", "etype"])
    A, B = F.col("etype") == "view", F.col("etype") == "buy"
    got = {
        r.bucket: (r.jaccard, r.approx_intersection)
        for r in kmv_sliding_jaccard(
            df, "user_id", A, B, window=6, k=16
        ).collect()
    }
    assert len(got) == 30  # every slide point has a non-empty window
    for h in (3, 13, 17, 19, 24, 29):
        b = t0 + dt.timedelta(hours=h)
        lo = b - dt.timedelta(hours=5)
        win = df.filter(
            (F.col("ts") >= lo) & (F.col("ts") < b + dt.timedelta(hours=1))
        )
        sa = kmv_partials(win.filter(A), "user_id", (), 16)
        sb = kmv_partials(win.filter(B), "user_id", (), 16)
        want = kmv_jaccard_by(
            sa.withColumn("g", F.lit(1)), sb.withColumn("g", F.lit(1)),
            ("g",), 16,
        ).first()
        assert got[b] == (want.jaccard, want.approx_intersection), (h, got[b], want)
    # one-sided windows report 0.0 jaccard, not a missing row
    assert got[t0 + dt.timedelta(hours=9)][0] == 0.0
