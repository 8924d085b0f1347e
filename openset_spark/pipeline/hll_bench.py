"""Scale evidence for the portable HLL: grouped approx_distinct vs
exact countDistinct on a synthetic high-cardinality corpus — the
sketch's win is not speed at toy sizes but SHUFFLE VOLUME: exact
distinct moves every (group, user) pair; the sketch moves at most
m rows per group regardless of cardinality. Reported: both timings,
the speedup, and the worst per-group relative error vs truth."""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_hll_bench(
    spark: SparkSession, n_rows: int = 6_000_000, n_users: int = 500_000,
    n_groups: int = 8,
) -> dict:
    from openset_spark.pipeline.hll import approx_distinct

    df = (
        spark.range(n_rows)
        .selectExpr(
            f"CAST(id % {n_users} AS LONG) AS user_id",
            f"CAST(xxhash64(id) % {n_groups} AS INT) AS g",
        )
        .localCheckpoint()
    )
    t0 = time.time()
    exact = {
        r.g: r.d
        for r in df.groupBy("g")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    exact_sec = time.time() - t0
    t0 = time.time()
    approx = {
        r.g: r.approx_distinct
        for r in approx_distinct(df, "user_id", ("g",)).collect()
    }
    approx_sec = time.time() - t0
    worst = max(
        abs(approx[g] - exact[g]) / exact[g] for g in exact
    )
    return {
        "n_rows": n_rows,
        "n_users": n_users,
        "n_groups": n_groups,
        "exact_distinct_sec": round(exact_sec, 3),
        "hll_sec": round(approx_sec, 3),
        "speedup": round(exact_sec / max(approx_sec, 1e-9), 2),
        "worst_rel_err": round(worst, 4),
    }
