"""Corpus sampling for training-mix construction.

Deterministic (seeded) so mixes are reproducible run-to-run — at
100 TB a re-run that samples different rows invalidates every
downstream cache. Stratified sampling is ``sampleBy`` (per-stratum
Bernoulli, no shuffle); weighted sampling keeps a row when a seeded
uniform hash falls under its weight (one projection, no RNG state)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
