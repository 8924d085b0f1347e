"""Customer timeline — ``GET /v1/query/{table}/customer``.

Reference (src/oloop_customer.cpp, src/rpc_query.cpp): return one
customer's full event history (plus customer props). Spark-first:
a pushed-down point filter on the partition/sort key — with the
events table written bucketed or z-ordered by user_id this is a
single-file read at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def customer_timeline(
    events: DataFrame,
    user_id,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """All events for one customer in timeline order."""
    return events.filter(F.col(user_col) == F.lit(user_id)).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
