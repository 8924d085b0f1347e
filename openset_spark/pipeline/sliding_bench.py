"""Scale evidence for the sliding-sketch family: trailing-window
answers from stored per-slide partials vs naively re-sketching every
window from raw rows. The fold's win is SCAN COUNT: one pass builds
the bounded partial table and every slide point folds from it, while
the naive path re-scans the raw data once per slide point — at 72
hourly slide points that is 72 full scans of a 100 TB table. The
answers are IDENTICAL by construction (fold == re-sketch, the
test-asserted law), so this measures pure plan shape, not accuracy.

Reported: the fold's end-to-end wall (build + 72 trailing answers),
the naive per-slide-point median (measured on a sample of slide
points), the naive total extrapolated to all slide points, and the
speedup. Numbers at 6M rows / 72 hours / 300k users."""

from __future__ import annotations

import datetime as dt
import statistics
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_sliding_bench(
    spark: SparkSession,
    n_rows: int = 6_000_000,
    n_hours: int = 72,
    n_users: int = 300_000,
    window: int = 24,
    sample_points: int = 5,
) -> dict:
    from openset_spark.pipeline.hll import (
        approx_distinct,
        hll_sliding_distinct,
    )

    t0_ts = dt.datetime(2024, 1, 1)
    df = (
        spark.range(n_rows)
        .selectExpr(
            f"timestamp'{t0_ts}' + make_interval(0, 0, 0, 0, "
            f"CAST(id % {n_hours} AS INT), 0, 0) "
            "+ make_interval(0, 0, 0, 0, 0, CAST(pmod(xxhash64(id), 60) AS INT),"
            " 0) AS ts",
            f"CAST(pmod(xxhash64(id + 13), {n_users}) AS LONG) AS user_id",
        )
        .localCheckpoint()
    )

    t0 = time.time()
    fold = hll_sliding_distinct(df, "user_id", "ts", "hour", window)
    fold_rows = fold.count()
    fold_sec = time.time() - t0

    # naive: one full-scan re-sketch per sampled slide point
    samples = []
    points = [n_hours - 1 - i * (n_hours // sample_points)
              for i in range(sample_points)]
    for h in points:
        b = t0_ts + dt.timedelta(hours=h)
        lo = b - dt.timedelta(hours=window - 1)
        t0 = time.time()
        approx_distinct(
            df.filter(
                (F.col("ts") >= F.lit(lo))
                & (F.col("ts") < F.lit(b + dt.timedelta(hours=1)))
            ),
            "user_id",
        ).collect()
        samples.append(time.time() - t0)
    per_point = statistics.median(samples)
    naive_total = per_point * n_hours
    return {
        "n_rows": n_rows,
        "n_slide_points": n_hours,
        "fold_sec": round(fold_sec, 3),
        "fold_rows": fold_rows,
        "naive_per_point_sec": round(per_point, 3),
        "naive_total_est_sec": round(naive_total, 3),
        "speedup": round(naive_total / fold_sec, 1),
    }
