"""Histograms — ``POST /v1/query/{table}/histogram/{name}``.

Reference (src/oloop_histogram.cpp, docs/rest/README.md): an OSL
script computes ONE scalar per customer (e.g. weeks since last event);
the engine buckets the returned values and reports distinct-customer
counts per bucket, with ``bucket=`` size, ``min=`` zero-fill down to a
floor and ``max=`` clipping (values >= max collapse into the max
bucket).

Spark-first: per-user scalar = one groupBy(user) aggregate; the
histogram = a second tiny aggregate over the scalar. Buckets are
carried as INTEGRAL indices (floor(v/bucket)) until the final
projection: zero-fill and the fill join run on exact longs — doing
either on double bucket values loses buckets whenever
(hi-min)/bucket or idx*bucket lands a ulp below an integer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_idx(
    value_col: str, bucket: float, max_value: float | None
) -> Column:
    """Integral bucket index with max-clip. Null stays null: the clip
    is applied AFTER the null check (least(NULL, max) would resurrect
    nulls into the max bucket).

    Int-DIVISION semantics, not floor: the reference buckets with
    int64 ``(value/bucket)*bucket`` which truncates toward zero, so
    -50 at bucket=100 lands in bucket 0, not -100. ``cast(double as
    long)`` truncates toward zero exactly like C++ integer division;
    ``F.floor`` would diverge for negative values."""
    v: Column = F.col(value_col)
    clipped = v if max_value is None else F.least(v, F.lit(float(max_value)))
    return F.when(
        v.isNotNull(), (clipped / F.lit(float(bucket))).cast("long")
    )


def _trunc_idx(value: float, bucket: float) -> int:
    """Python-side twin of _bucket_idx's truncation toward zero."""
    return int(value / bucket)


def histogram(
    per_user_scalar: DataFrame,
    value_col: str,
    bucket: float = 1.0,
    min_value: float | None = None,
    max_value: float | None = None,
    user_col: str = "user_id",
    name: str = "value",
) -> DataFrame:
    """Bucketed distinct-customer histogram of a per-user scalar frame.

    ``per_user_scalar`` must have one row per user (user_col,
    value_col) — this contract is LOAD-BEARING: `people` is computed
    as count(user) per bucket (identical to countDistinct on a
    one-row-per-user frame, without the distinct form's extra
    (bucket, user)-keyed exchange over the |users|-sized stream).
    """
    idx = _bucket_idx(value_col, bucket, max_value)
    # Zero-fill per the reference's jsonResultHistogramFill
    # (src/result.cpp:780-941):
    # - interior gaps between lo and hi ALWAYS fill with people=0 (the
    #   reference fills observed-min..max even with no min=/max=);
    # - ``min=`` forces lo, but observed buckets BELOW it are KEPT
    #   (the reference voids only values >= max, never below min);
    # - the hi bucket is always present (the reference re-injects the
    #   max branch carrying the clipped overflow, 0 if nothing hit it);
    # - empty input stays empty (the reference returns early).
    #
    # r16 shape: the bucketed histogram is bounded by the bucket count
    # (display-sized), so it collapses into ONE packed row
    # (collect_list + bounds in a single aggregate) and the fill is a
    # row-local array op: sequence(lo, hi) ∪ observed indices, people
    # looked up from a map. One reference to the histogram frame — the
    # r15 form checkpointed it because the bounds scan + full-outer
    # join re-ran the whole upstream (often a full event scan +
    # per-user aggregate) once per reference under AQE; the packed
    # form needs neither the checkpoint job nor the join. All index
    # arithmetic on longs so no FP step-count drift.
    lo_forced = None if min_value is None else _trunc_idx(min_value, bucket)
    hi_forced = None if max_value is None else _trunc_idx(max_value, bucket)
    # people = count(user), not countDistinct(user): the input
    # contract (one row per user, asserted in the docstring and
    # satisfied by every caller's per-user aggregate) makes them the
    # same integer — count(col) keeps countDistinct's NULL-user
    # exclusion — and the distinct form plans an extra
    # (bucket, user)-keyed exchange + aggregate pass over the
    # |users|-sized frame, the corpus-scale stage of this operator
    # at 100 TB (r16).
    packed = (
        per_user_scalar.select(idx.alias("_idx"), F.col(user_col))
        .filter(F.col("_idx").isNotNull())
        .groupBy("_idx")
        .agg(F.count(F.col(user_col)).alias("people"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_idx", "people"))
            ).alias("_m"),
            F.min("_idx").alias("_lo"),
            F.max("_idx").alias("_hi"),
        )
    )
    lo_c = F.col("_lo") if lo_forced is None else F.lit(lo_forced).cast("long")
    hi_c = F.col("_hi") if hi_forced is None else F.lit(hi_forced).cast("long")
    # a forced lo above everything degenerates to just the
    # re-injected hi bucket, matching the reference's no-iteration
    # fill loop + max re-inject; observed buckets outside the fill
    # range survive via the union (the old full-outer's semantics)
    all_idx = F.array_union(
        F.when(lo_c <= hi_c, F.sequence(lo_c, hi_c)).otherwise(
            F.array(hi_c)
        ),
        F.map_keys("_m"),
    )
    filled = (
        packed.filter(F.col("_lo").isNotNull())
        .select(F.col("_m"), F.explode(all_idx).alias("_idx"))
        .select(
            F.col("_idx"),
            F.coalesce(
                F.expr("try_element_at(_m, _idx)"), F.lit(0)
            ).alias("people"),
        )
    )
    return filled.select(
        (F.col("_idx").cast("double") * F.lit(float(bucket))).alias(name),
        "people",
    )


def quantiles(
    per_user_scalar: DataFrame,
    value_col: str,
    probs: list[float] = (0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """One-row quantile summary of a per-user scalar — the
    distribution view a histogram approximates. ``approx=True`` uses
    the sketch-based approx_percentile (mergeable, bounded memory —
    the 100 TB interactive path); default is exact interpolated
    percentile (matches SQL quantile_cont)."""
    fn = F.approx_percentile if approx else F.percentile
    arr = fn(F.col(value_col), F.array(*[F.lit(p) for p in probs]))
    return per_user_scalar.agg(
        *[
            F.element_at(arr, i + 1).alias(f"q{int(p * 100)}")
            for i, p in enumerate(probs)
        ]
    )


def histogram_by(
    per_user_scalar: DataFrame,
    value_col: str,
    group_col: str,
    bucket: float = 1.0,
    min_value: float | None = None,
    max_value: float | None = None,
    user_col: str = "user_id",
    name: str = "value",
) -> DataFrame:
    """The reference's ``foreach`` histogram mode
    (src/oloop_histogram.cpp:88-202): one histogram per value of a
    property — here one (group, bucket, people) aggregate, a single
    shuffle keyed by (group, bucket) instead of a per-value query loop.

    ``per_user_scalar`` has one row per (user, group) pair."""
    idx = _bucket_idx(value_col, bucket, max_value)
    # per-group interior zero-fill: the reference applies
    # jsonResultHistogramFill to EACH group's branch of a foreach
    # result (result.cpp:795-807 "isDeep" path), each group filling
    # its own observed min..max unless min=/max= force the bounds.
    # r16: same packed single-reference shape as histogram() above,
    # per group — the per-group bucket map is bounded by the bucket
    # count, and the old bounds-scan + full-outer join re-ran the
    # whole upstream (scan + per-(group,bucket) aggregate) TWICE
    # under AQE's no-cross-branch exchange reuse.
    lo_forced = None if min_value is None else _trunc_idx(min_value, bucket)
    hi_forced = None if max_value is None else _trunc_idx(max_value, bucket)
    lo_c = F.col("_lo") if lo_forced is None else F.lit(lo_forced).cast("long")
    hi_c = F.col("_hi") if hi_forced is None else F.lit(hi_forced).cast("long")
    # count(user), not countDistinct: one row per (user, group) by
    # the input contract — see histogram() above
    packed = (
        per_user_scalar.select(
            F.col(group_col), idx.alias("_idx"), F.col(user_col)
        )
        .filter(F.col("_idx").isNotNull())
        .groupBy(group_col, "_idx")
        .agg(F.count(F.col(user_col)).alias("people"))
        .groupBy(group_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_idx", "people"))
            ).alias("_m"),
            F.min("_idx").alias("_lo"),
            F.max("_idx").alias("_hi"),
        )
    )
    all_idx = F.array_union(
        F.when(lo_c <= hi_c, F.sequence(lo_c, hi_c)).otherwise(
            F.array(hi_c)
        ),
        F.map_keys("_m"),
    )
    return (
        packed.select(
            group_col, F.col("_m"), F.explode(all_idx).alias("_idx")
        )
        .select(
            group_col,
            (F.col("_idx").cast("double") * F.lit(float(bucket))).alias(name),
            F.coalesce(
                F.expr("try_element_at(_m, _idx)"), F.lit(0)
            ).alias("people"),
        )
    )
