"""SparkSession factory tuned for the analytics workload.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same configs
(AQE, Arrow, sized shuffle partitions) are what we would ship on a
multi-executor cluster — nothing here assumes single-node.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "openset-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Align whole-stage codegen's bail-out with HotSpot's actual
        # JIT refusal threshold (-XX:HugeMethodLimit = 8000 bytecode
        # bytes, JVM-version-independent). Spark's default (65535)
        # keeps stages whose generated methods land in the
        # 8 KB..64 KB band: those COMPILE but can never be JIT'd, so
        # the hot loop runs in the bytecode interpreter — the
        # measured 2.5-8x cliff documented in functions/vector.py.
        # With 8000, such stages fall back to per-operator codegen
        # (method-split, JIT-able); the successful compile that
        # sized them is cached, so the check is paid once per plan,
        # not per action. Scale-independent JVM behavior — the same
        # setting is right on a cluster. Validated against the
        # registry bench (alternated full-headline A/B, r15 #21);
        # overridable per-deployment via SPARK_GRAFT_HUGE_METHOD_LIMIT
        # because Spark ships 65535 for a reason — a stage whose
        # generated method lands in the 8-64 KB band but whose hot
        # loop is elsewhere loses whole-stage fusion under this cap.
        .config(
            "spark.sql.codegen.hugeMethodLimit",
            os.environ.get("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"),
        )
    )
    return builder.getOrCreate()
