"""Cohort retention — the reference's cohort/sequence reporting
(README "Sequence Analysis (cohorts, funnels, paths)").

Cohort = period of the user's first event; retention cell (cohort,
period_n) = distinct users from that cohort active n periods later.

Spark-first: the cohort is a window ``min(ts) over (partition by
user)`` — NO join (a broadcast of a per-user frame would not survive
billions of users), one hash shuffle by user, then a partial-
aggregated grouped distinct count over the small (cohort, offset)
key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PERIOD_SECONDS = {"day": 86400, "week": 7 * 86400}


def retention(
    df: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, period_n, people) with period_n = periods since cohort."""
    w = Window.partitionBy(user_col)
    with_cohort = df.select(
        user_col,
        F.date_trunc(period, F.col(ts_col)).alias("active_period"),
        F.date_trunc(period, F.min(ts_col).over(w)).alias("cohort"),
    )
    if period == "month":
        # months are variable-length: calendar arithmetic, not seconds
        period_n = F.months_between("active_period", "cohort").cast("long")
    else:
        divisor = _PERIOD_SECONDS[period]
        period_n = (
            (F.unix_timestamp("active_period") - F.unix_timestamp("cohort"))
            / divisor
        ).cast("long")
    return with_cohort.groupBy(
        "cohort", period_n.alias("period_n")
    ).agg(F.countDistinct(user_col).alias("people"))
