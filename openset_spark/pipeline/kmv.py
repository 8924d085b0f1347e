"""Deterministic, engine-portable KMV (K-Minimum-Values) sketch —
the set-INTERSECTION sibling of the HLL: where HLL's
inclusion-exclusion intersection (est(A)+est(B)-est(A∪B)) compounds
three estimation errors and collapses for small overlaps of large
sets, KMV holds the k smallest distinct hashes of each set and
reads the overlap DIRECTLY off the shared sample (Beyer et al.
2007, the theta-sketch ancestor), so audience-overlap / Jaccard
questions stay accurate when |A∩B| << |A|.

Deterministic and portable like its siblings:

* hash = the portable 60-bit md5 prefix (DuckDB-identical), so the
  SKETCH ITSELF — an order statistic, not a random sample — is
  oracle-replayable: the k smallest distinct hashes of a set are a
  pure function of the set;
* a "sketch" is rows (group..., hv): fold = k smallest distinct of
  the union of partials == k smallest distinct of the direct build,
  bit for bit, under ANY split (min order statistics compose);
* estimates are closed-form in the sketch: distinct ~ (k-1) *
  2^60 / hv_k (EXACT — the sketch is the whole distinct set — when
  the set has < k members); intersection from the joint sample
  below the combined threshold.

Scale: the build is dense_rank() <= k over (group, hv) — Spark's
WindowGroupLimit pushes a partial top-k into every map task
(plan-asserted in tests/test_plans.py), so the exchange carries at
most ~k rows per group per task, never the full distinct set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_SPACE = float(1 << 60)


def _hash60(col: Column) -> Column:
    """Portable 60-bit md5 prefix (the hll.py family)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_observations(
    df: DataFrame, col: str, group_by: tuple[str, ...] = ()
) -> DataFrame:
    """Per-row hash observations (group_by..., hv) — a pure
    stateless projection (streaming twin: fold the streamed
    observations and you hold exactly the batch sketch). NULLs are
    skipped (distinct-of-non-null)."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(*group_by, _hash60(F.col(col)).alias("hv"))
    )


def kmv_fold(
    obs: DataFrame, group_by: tuple[str, ...] = (), k: int = 512
) -> DataFrame:
    """k smallest DISTINCT hashes per group of ANY union of
    observations or partials — the composable step: min order
    statistics of a union are the union's order statistics, so
    fold(partials) == direct build exactly. dense_rank <= k compiles
    to a WindowGroupLimit partial top-k in every map task."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    w = Window.partitionBy(*group_by).orderBy("hv")
    return (
        obs.withColumn("_r", F.dense_rank().over(w))
        .filter(F.col("_r") <= k)
        .select(*group_by, "hv")
        .distinct()
    )


def kmv_partials(
    df: DataFrame,
    col: str,
    group_by: tuple[str, ...] = (),
    k: int = 512,
) -> DataFrame:
    """(group_by..., hv) — the sketch: k smallest distinct hashes
    per group."""
    return kmv_fold(kmv_observations(df, col, group_by), group_by, k)


def kmv_distinct_estimate(
    sketch: DataFrame, group_by: tuple[str, ...] = (), k: int = 512
) -> DataFrame:
    """(group_by..., approx_distinct): (k-1) * 2^60 / hv_k when the
    sketch is full (the classic KMV estimator, ~1/sqrt(k-2) rel
    error); EXACT row count when the set had < k distinct members
    (the sketch then IS the distinct set). ROUND(.., 4) float
    contract (identical expression tree both engines)."""
    agg = sketch.groupBy(*group_by).agg(
        F.count(F.lit(1)).alias("_n"), F.max("hv").alias("_kth")
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("_kth")
    )
    return agg.select(
        *group_by, F.round(est, 4).alias("approx_distinct")
    )


def kmv_jaccard(a: DataFrame, b: DataFrame, k: int = 512) -> DataFrame:
    """One row (jaccard, approx_intersection) from two ungrouped
    sketches: combine to the union sketch (k smallest distinct of
    A ∪ B), whose threshold theta = its max hash; the hashes below
    theta form a uniform sample of A ∪ B, so jaccard ~ |sample ∩ A
    ∩ B| / |sample| and |A ∩ B| ~ jaccard * est(A ∪ B) (Beyer et
    al. 2007). Every step is a pure function of the two sketches —
    deterministic, partitioning-invariant, DuckDB-replayable.

    The plan references each sketch several times (union, joint
    join, estimate); a sketch is <= k rows, so over large inputs
    materialize it first (``.localCheckpoint()`` / write it as the
    ingest-time artifact it is) rather than re-deriving the
    upstream scan per reference."""
    u = kmv_fold(a.unionByName(b), (), k)
    theta = u.agg(
        F.max("hv").alias("_theta"), F.count(F.lit(1)).alias("_ku")
    )
    both = (
        a.join(b, "hv", "inner")
        .join(F.broadcast(theta))
        .filter(F.col("hv") <= F.col("_theta"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    est_u = kmv_distinct_estimate(u, (), k).select(
        F.col("approx_distinct").alias("_du")
    )
    return (
        both.join(F.broadcast(theta.select("_ku")))
        .join(F.broadcast(est_u))
        .select(
            F.round(F.col("_c") / F.col("_ku"), 4).alias("jaccard"),
            # exact-DECIMAL product (see kmv_jaccard_by): a double
            # ROUND tie here diverges between engines (r12 fix)
            F.round(
                (F.col("_c") / F.col("_ku")).cast("decimal(12,10)")
                * F.col("_du").cast("decimal(20,4)"),
                4,
            )
            .cast("double")
            .alias("approx_intersection"),
        )
    )


def kmv_overlap_matrix(
    sketches: DataFrame,
    key: str = "segment",
    k: int = 512,
    keys: list | None = None,
) -> DataFrame:
    """All-pairs audience overlap from GROUPED sketches
    ((key, hv) rows, one sketch per key value): for every unordered
    pair key_a < key_b, the same joint-sample estimator as
    kmv_jaccard -> (key_a, key_b, jaccard, approx_intersection).
    The segment-overlap HEATMAP at corpus scale: every intermediate
    is bounded by n_pairs x k rows — the raw sets are never
    touched, so N segments over a 100 TB event table cost N sketch
    builds + sketch-sized joins, never N^2 set intersections.

    Estimator per pair (Beyer et al. 2007): combined sketch = k
    smallest distinct of A ∪ B, theta = its max, ku = its size;
    jaccard ~ |{hv <= theta in A ∩ B}| / ku; |A ∩ B| ~ jaccard *
    est(A ∪ B). EXACT when both sets are below k (the sketch then
    IS the set).

    ``keys=`` lists the segment names explicitly — pairs involving
    an EMPTY segment (no sketch rows) then still appear, with
    jaccard/intersection 0.0, instead of silently vanishing from
    the heatmap. Like kmv_jaccard, the plan references ``sketches``
    several times — materialize it first over large inputs (each
    sketch is <= k rows; the engine facade localCheckpoints)."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    a = sketches.select(F.col(key).alias("key_a"), "hv")
    b = sketches.select(F.col(key).alias("key_b"), "hv")
    if keys is not None:
        names = sketches.sparkSession.createDataFrame(
            [(str(x),) for x in keys], f"{key} string"
        )
        ka = names.select(F.col(key).alias("key_a"))
        kb = names.select(F.col(key).alias("key_b"))
    else:
        ka = a.select("key_a").distinct()
        kb = b.select("key_b").distinct()
    pairs = ka.join(kb).filter(F.col("key_a") < F.col("key_b"))
    # per-pair union sketch: k smallest distinct of A ∪ B
    union_rows = (
        pairs.join(a, "key_a")
        .select("key_a", "key_b", "hv")
        .unionByName(
            pairs.join(b, "key_b").select("key_a", "key_b", "hv")
        )
        .distinct()
    )
    w = Window.partitionBy("key_a", "key_b").orderBy("hv")
    u = (
        union_rows.withColumn("_r", F.dense_rank().over(w))
        .filter(F.col("_r") <= k)
        .select("key_a", "key_b", "hv")
    )
    th = u.groupBy("key_a", "key_b").agg(
        F.max("hv").alias("_theta"),
        F.count(F.lit(1)).alias("_ku"),
    )
    du = th.select(
        "key_a",
        "key_b",
        F.round(
            F.when(F.col("_ku") < k, F.col("_ku").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("_theta")
            ),
            4,
        ).alias("_du"),
    )
    joint = (
        a.join(b, "hv")
        .filter(F.col("key_a") < F.col("key_b"))
        .join(th, ["key_a", "key_b"])
        .filter(F.col("hv") <= F.col("_theta"))
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        pairs.join(th, ["key_a", "key_b"], "left")
        .join(joint, ["key_a", "key_b"], "left")
        .join(du, ["key_a", "key_b"], "left")
        .select(
            "key_a",
            "key_b",
            # a pair with an empty union (both segments empty) has
            # no th row: jaccard/intersection 0.0 by convention
            F.coalesce(
                F.round(
                    F.coalesce(F.col("_c"), F.lit(0)) / F.col("_ku"), 4
                ),
                F.lit(0.0),
            ).alias("jaccard"),
            # exact-DECIMAL product (see kmv_jaccard_by): a double
            # ROUND tie here diverges between engines (r12 fix)
            F.coalesce(
                F.round(
                    (F.coalesce(F.col("_c"), F.lit(0)) / F.col("_ku"))
                    .cast("decimal(12,10)")
                    * F.col("_du").cast("decimal(20,4)"),
                    4,
                ).cast("double"),
                F.lit(0.0),
            ).alias("approx_intersection"),
        )
    )


def kmv_difference(
    a: DataFrame, b: DataFrame, k: int = 512
) -> DataFrame:
    """One row (approx_difference,): |A \\ B| from two ungrouped
    sketches — the "new users this period" / "docs not yet
    deduped-against" estimator. Same joint-sample logic as
    kmv_jaccard: among the combined sketch's hashes (a uniform
    sample of A ∪ B below theta), count those in A but not in B;
    |A \\ B| ~ (c_only / ku) * est(A ∪ B). EXACT below k."""
    u = kmv_fold(a.unionByName(b), (), k)
    theta = u.agg(
        F.max("hv").alias("_theta"), F.count(F.lit(1)).alias("_ku")
    )
    only_a = (
        a.join(b, "hv", "left_anti")
        .join(F.broadcast(theta))
        .filter(F.col("hv") <= F.col("_theta"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    est_u = kmv_distinct_estimate(u, (), k).select(
        F.col("approx_distinct").alias("_du")
    )
    return (
        only_a.join(F.broadcast(theta.select("_ku")))
        .join(F.broadcast(est_u))
        .select(
            # exact-DECIMAL product (see kmv_jaccard_by): a double
            # ROUND tie here diverges between engines (r12 fix;
            # ADVICE r12 flagged this last double-by-double holdout)
            F.round(
                (F.col("_c") / F.col("_ku")).cast("decimal(12,10)")
                * F.col("_du").cast("decimal(20,4)"),
                4,
            )
            .cast("double")
            .alias("approx_difference")
        )
    )


def kmv_jaccard_by(
    a: DataFrame,
    b: DataFrame,
    group_by: tuple[str, ...],
    k: int = 512,
) -> DataFrame:
    """GROUPED joint-sample Jaccard: one (group_by..., jaccard,
    approx_intersection) row per group present in either sketch
    frame — the same Beyer et al. estimator as kmv_jaccard, with
    every step keyed by the group (the sliding fold groups by slide
    point). A group where the pair is disjoint still emits (jaccard
    0.0); a group absent from BOTH frames emits nothing (an empty
    union has no estimator).

    Float contract: ``jaccard`` is ROUND(c/ku, 4) — a ratio of small
    ints whose only .xxxx5 ROUND ties are dyadic (exactly
    representable, both engines round away from zero identically).
    ``approx_intersection`` multiplies two inexact doubles, whose
    ROUND ties ARE engine-divergent (Spark rounds the shortest
    decimal repr, DuckDB the binary value — hit once per ~10^4 slide
    points, measured), so the product runs in EXACT DECIMAL: each
    factor recovers its intended decimal value (c/ku at 10 places —
    dyadic-ties-only again; _du is already a 4-decimal quantity),
    the decimal product is exact, and decimal ROUND is half-up in
    both engines."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    gb = list(group_by)
    u = kmv_fold(a.unionByName(b), group_by, k)
    th = u.groupBy(*gb).agg(
        F.max("hv").alias("_theta"), F.count(F.lit(1)).alias("_ku")
    )
    joint = (
        a.join(b, gb + ["hv"])
        .join(th, gb)
        .filter(F.col("hv") <= F.col("_theta"))
        .groupBy(*gb)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    du = kmv_distinct_estimate(u, group_by, k).withColumnRenamed(
        "approx_distinct", "_du"
    )
    ratio = F.coalesce(F.col("_c"), F.lit(0)) / F.col("_ku")
    return (
        th.join(joint, gb, "left")
        .join(du, gb)
        .select(
            *gb,
            F.round(ratio, 4).alias("jaccard"),
            F.round(
                ratio.cast("decimal(12,10)")
                * F.col("_du").cast("decimal(20,4)"),
                4,
            )
            .cast("double")
            .alias("approx_intersection"),
        )
    )


def kmv_sliding_jaccard(
    df: DataFrame,
    col: str,
    a: Column,
    b: Column,
    ts_col: str = "ts",
    slide: str = "hour",
    window: int = 24,
    k: int = 512,
) -> DataFrame:
    """TRAILING-window audience overlap between two predicates at
    every slide point (Jaccard of last-24h viewers vs last-24h
    buyers, re-evaluated hourly) — the fourth sliding sketch: KMV
    min order statistics COMPOSE (a window's k smallest distinct
    hashes are all inside their own hour's k smallest), so the
    trailing sketch folds from stored per-hour sketches without
    re-touching raw rows:

    1. one per-(hour, side) sketch build (the only scan of the
       data; <= 2 x hours x k rows, materialized);
    2. each hour's sketch rows serve the ``window`` slide points
       that cover the hour — a bounded sequence-explode fan-out
       (hours x k x window x 2), clipped to the data's max bucket;
    3. re-rank per (slide point, side) to the window sketches;
    4. the grouped joint-sample estimator per slide point.

    Output: (bucket, jaccard, approx_intersection). A slide point
    whose window saw only one side emits jaccard 0.0; a slide point
    with an empty window emits nothing. By construction the window
    sketches EQUAL from-scratch builds over each window's rows, so
    estimates are identical to re-sketching (test-asserted), and
    DuckDB replays sketches, fan-out, re-rank and estimator."""
    from openset_spark.pipeline.sliding import check_slide

    check_slide(slide, window)  # BEFORE the eager sketch build below
    pre = df.withColumn("_tb", F.date_trunc(slide, F.col(ts_col)))
    obs = kmv_observations(pre.filter(a), col, ("_tb",)).withColumn(
        "_side", F.lit("a")
    ).unionByName(
        kmv_observations(pre.filter(b), col, ("_tb",)).withColumn(
            "_side", F.lit("b")
        )
    )
    # per-(hour, side) sketches: bounded (2 x hours x k), three
    # downstream references -> materialize; raw scanned once
    parts = kmv_fold(obs, ("_tb", "_side"), k).localCheckpoint()
    return kmv_sliding_from_partials(
        parts, slide, window, k, materialized=True
    )


def kmv_sliding_from_partials(
    parts: DataFrame,
    slide: str = "hour",
    window: int = 24,
    k: int = 512,
    materialized: bool = False,
    extend_to=None,
) -> DataFrame:
    """The sliding re-rank from STORED per-(slide, side) sketches
    (_tb, _side in {'a','b'}, hv) — the path a live deployment runs:
    per-hour sketches maintained incrementally (stream-folded, the
    31st parity surface), trailing overlap re-reading only the
    bounded sketch table. kmv_sliding_jaccard is exactly this on
    freshly-built sketches, so stream-fed and batch results are
    equal by construction (35th parity surface). ``parts`` is pinned
    here by default (bounded: 2 x slides x k rows) — several
    subtrees reference it, and a caller passing a fresh plan must
    not pay repeated scans (the hll/hdr from_partials convention);
    ``materialized=True`` promises the caller already pinned it and
    skips the second bounded copy (VERDICT r12 ask #5)."""
    from openset_spark.pipeline.sliding import check_slide

    check_slide(slide, window)
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    if not materialized:
        parts = parts.localCheckpoint()
    # extend_to stretches the served range past the last stored
    # bucket so a quiet final slide still answers (same contract as
    # dense_spine's extend_to; ADVICE r13 #1)
    hi_expr = F.max("_tb")
    if extend_to is not None:
        hi_expr = F.greatest(hi_expr, F.lit(extend_to))
    hi = parts.agg(hi_expr.alias("_hi"))
    served = (
        parts.crossJoin(F.broadcast(hi))
        .select(
            "_side",
            "hv",
            F.explode(
                F.expr(
                    f"sequence(_tb, least(_tb + interval {window - 1} "
                    f"{slide}, _hi), interval 1 {slide})"
                )
            ).alias("bucket"),
        )
    )
    wa = served.filter(F.col("_side") == "a").select("bucket", "hv")
    wb = served.filter(F.col("_side") == "b").select("bucket", "hv")
    return kmv_jaccard_by(
        kmv_fold(wa, ("bucket",), k),
        kmv_fold(wb, ("bucket",), k),
        ("bucket",),
        k,
    )
