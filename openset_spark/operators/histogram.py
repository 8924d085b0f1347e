"""Histograms — ``POST /v1/query/{table}/histogram/{name}``.

Reference (src/oloop_histogram.cpp, docs/rest/README.md): an OSL
script computes ONE scalar per customer (e.g. weeks since last event);
the engine buckets the returned values and reports distinct-customer
counts per bucket, with ``bucket=`` size, ``min=`` zero-fill down to a
floor and ``max=`` clipping (values >= max collapse into the max
bucket).

Spark-first: per-user scalar = one groupBy(user) aggregate; the
histogram = a second tiny aggregate over the scalar. Zero-fill uses a
``sequence()`` range frame joined left — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    v: Column = F.col(value_col)
    if max_value is not None:
        v = F.least(v, F.lit(max_value))
    bucketed = F.floor(v / F.lit(bucket)) * F.lit(bucket)
    hist = (
        per_user_scalar.filter(v.isNotNull())
        .groupBy(bucketed.alias(name))
        .agg(F.countDistinct(user_col).alias("people"))
    )
    if min_value is not None:
        # zero-fill from min_value to the observed max bucket.
        # sequence() is integral-only: generate step indices and scale.
        n_steps = F.floor(
            (F.col("hi").cast("double") - F.lit(float(min_value))) / F.lit(bucket)
        ).cast("long")
        bounds = hist.agg(F.max(name).alias("hi")).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0).cast("long"), n_steps),
                    lambda i: F.lit(float(min_value))
                    + i.cast("double") * F.lit(float(bucket)),
                )
            ).alias(name)
        )
        hist = (
            bounds.join(hist.withColumnRenamed(name, "_b"), bounds[name] == F.col("_b"), "left")
            .select(bounds[name], F.coalesce(F.col("people"), F.lit(0)).alias("people"))
        )
    return hist


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
    v: Column = F.col(value_col)
    if max_value is not None:
        v = F.least(v, F.lit(max_value))
    bucketed = F.floor(v / F.lit(bucket)) * F.lit(bucket)
    return (
        per_user_scalar.filter(v.isNotNull())
        .groupBy(F.col(group_col), bucketed.alias(name))
        .agg(F.countDistinct(user_col).alias("people"))
    )
