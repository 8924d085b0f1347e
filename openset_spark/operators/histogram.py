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
    nulls into the max bucket)."""
    v: Column = F.col(value_col)
    clipped = v if max_value is None else F.least(v, F.lit(float(max_value)))
    return F.when(v.isNotNull(), F.floor(clipped / F.lit(float(bucket))))


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

    ``per_user_scalar`` must have one row per user (user_col, value_col).
    """
    idx = _bucket_idx(value_col, bucket, max_value)
    hist = (
        per_user_scalar.select(idx.alias("_idx"), F.col(user_col))
        .filter(F.col("_idx").isNotNull())
        .groupBy("_idx")
        .agg(F.countDistinct(user_col).alias("people"))
    )
    if min_value is not None:
        # zero-fill from min_value's bucket to the observed max bucket —
        # all index arithmetic on longs, so no FP step-count drift and
        # the fill join matches observed buckets exactly. Values below
        # min fall outside the histogram's floor and are dropped before
        # the fill; if nothing survives, max(_idx) is null and the
        # sequence/explode yields an empty histogram (never a
        # descending hi<lo fill).
        import math

        lo = int(math.floor(min_value / bucket))
        hist = hist.filter(F.col("_idx") >= F.lit(lo))
        bounds = hist.agg(F.max("_idx").alias("_hi")).select(
            F.explode(
                F.sequence(F.lit(lo).cast("long"), F.col("_hi").cast("long"))
            ).alias("_idx")
        )
        hist = bounds.join(
            hist.withColumnRenamed("_idx", "_b"),
            bounds["_idx"] == F.col("_b"),
            "left",
        ).select(
            bounds["_idx"], F.coalesce(F.col("people"), F.lit(0)).alias("people")
        )
    return hist.select(
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
    return (
        per_user_scalar.select(
            F.col(group_col), idx.alias("_idx"), F.col(user_col)
        )
        .filter(F.col("_idx").isNotNull())
        .groupBy(group_col, "_idx")
        .agg(F.countDistinct(user_col).alias("people"))
        .select(
            group_col,
            (F.col("_idx").cast("double") * F.lit(float(bucket))).alias(name),
            "people",
        )
    )
