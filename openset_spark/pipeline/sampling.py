"""Corpus sampling for training-mix construction.

Deterministic (seeded) so mixes are reproducible run-to-run — at
100 TB a re-run that samples different rows invalidates every
downstream cache. Stratified sampling is ``sampleBy`` (per-stratum
Bernoulli, no shuffle); weighted sampling keeps a row when a seeded
uniform hash falls under its weight (one projection, no RNG state)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. {'en': 1.0, 'de': 0.25}).
    Strata missing from ``fractions`` are dropped — the usual
    language-mix contract."""
    return df.sampleBy(strata_col, fractions, seed)


def hash_uniform(cols: list[str], seed: int = 42) -> Column:
    """Deterministic per-row uniform in [0,1): xxhash64 of the key
    columns, scaled. Same row + same seed -> same draw, on any
    cluster, in any partition order."""
    h = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
    # map signed 64-bit to [0,1)
    return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Keep each row with probability = its weight column (clamped to
    [0,1]), decided by the row's own hash — reproducible without RNG
    state, resumable, and independent of partitioning."""
    keep = hash_uniform(key_cols, seed) < F.least(
        F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0)
    )
    return df.filter(keep)


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "quality",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int = 32,
) -> DataFrame:
    """Select the best documents that fit a token budget — the
    data-mixing primitive ("take the top-quality docs until N tokens"):
    keep every document whose running token total, in (score DESC,
    id ASC) order, stays within ``budget``.

    The naive form is a global-ordering window — ONE partition doing
    all the work, the classic 100 TB anti-pattern. Here the prefix sum
    is distributed instead: ``repartitionByRange`` on the sort key
    gives range-partitioned data whose partition ids follow the global
    order, each partition computes its LOCAL running total with an
    ordinary per-partition window, and the per-partition totals (one
    tiny row each) are prefix-summed and broadcast back as offsets.
    Work per partition is uniform; no stage sees more than its slice.
    """
    w_key = [F.col(score_col).desc(), F.col(id_col).asc()]
    ranged = df.repartitionByRange(partitions, *w_key)
    part = ranged.withColumn("_pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*w_key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_local_cum", F.sum(token_col).over(local_w))
    # per-partition totals: `partitions` rows — the prefix-sum over
    # them is driver-trivial but stays in-plan as a broadcast join
    totals = local.groupBy("_pid").agg(F.sum(token_col).alias("_ptot"))
    offset_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "_offset", F.sum("_ptot").over(offset_w) - F.col("_ptot")
    ).select("_pid", "_offset")
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("_cum", F.col("_local_cum") + F.col("_offset"))
        .filter(F.col("_cum") <= budget)
        .drop("_pid", "_local_cum", "_offset")
    )
    return out.withColumnRenamed("_cum", "cum_tokens")
