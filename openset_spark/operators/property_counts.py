"""Property counts — ``GET /v1/query/{table}/property/{prop}``.

Reference (src/oloop_property.cpp, docs/rest/README.md): for one
property, return distinct-customer counts per value, with optional
value filters (gt/gte/lt/lte/eq/between/rx/sub) and ``bucket=`` for
histogram-style clustering; ``segments=`` compares counts across
segment memberships.

Spark-first: groupBy(value) + countDistinct(user) — partial
aggregation map-side, one shuffle keyed by value. Segment-compare
joins the per-user membership frame on user_id BEFORE grouping, so
each segment is a conditional distinct count in the same aggregate
(no per-segment passes like the reference's bitmap loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.time import bucket as bucket_fn


def property_counts(
    df: DataFrame,
    prop: str,
    user_col: str = "user_id",
    bucket: float | None = None,
    value_filter: Column | None = None,
) -> DataFrame:
    """(value, people) distinct-customer counts per property value."""
    col: Column = F.col(prop)
    if value_filter is not None:
        df = df.filter(value_filter)
    value = bucket_fn(col, bucket) if bucket is not None else col
    return (
        df.filter(col.isNotNull())
        .groupBy(value.alias("value"))
        .agg(F.countDistinct(user_col).alias("people"))
    )


def property_counts_by_segment(
    df: DataFrame,
    prop: str,
    membership: DataFrame,
    segment_names: list[str],
    user_col: str = "user_id",
    bucket: float | None = None,
) -> DataFrame:
    """(value, people, <seg>_people...) — the `segments=*,seg` compare
    mode: total distinct users per value plus distinct users per value
    within each segment, in ONE aggregate pass."""
    col = F.col(prop)
    value = bucket_fn(col, bucket) if bucket is not None else col
    joined = df.filter(col.isNotNull()).join(membership, user_col, "left")
    aggs = [F.countDistinct(user_col).alias("people")]
    for name in segment_names:
        aggs.append(
            F.countDistinct(F.when(F.col(name), F.col(user_col))).alias(
                f"{name}_people"
            )
        )
    return joined.groupBy(value.alias("value")).agg(*aggs)
