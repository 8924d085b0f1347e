"""Result shaping — the reference's sort/order/trim controls on query
results (src/result.cpp jsonResultSortByColumn, trim parameters on the
property/histogram endpoints; README `trim:`).

The reference sorts and trims each result-tree node; the relational
equivalent is top-N within a group: rank over a (group) window and
keep n. At scale this stays a single window pass — never a per-group
driver loop — and Catalyst pushes the rank filter into the window via
WindowGroupLimit (verify in the plan), so partitions stream instead of
fully sorting."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    n: int,
    rank_alias: str = "rank",
) -> DataFrame:
    """Keep the first ``n`` rows of each group under the given order
    (order_cols should include a deterministic tiebreak)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_alias, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_alias) <= n)
    )
