"""Parquet table loaders.

The testdata layout is one parquet file per table under an sf dir
(see TESTDATA.md). At cluster scale the same loader points at a
partitioned parquet/iceberg location; we deliberately go through
``spark.read.parquet`` so partition pruning, predicate pushdown and
column pruning all apply (verify with ``df.explain``: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


# Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot read
# natively: we read them as raw nanosecond longs and convert with exact
# integer division (a double `/ 1000` would lose microseconds at 1e18).
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The engine's time semantics are naive-wall-clock == UTC (matching
    # DuckDB's epoch_us on tz-less parquet). Pin the session timezone so
    # NTZ→LTZ casts are deterministic regardless of the caller's session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Spark 4 reads tz-less parquet timestamp[us] as TIMESTAMP_NTZ, which
    # unix_micros/unix_millis reject; normalize every NTZ column to LTZ
    # here so no operator downstream ever sees NTZ.
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp_ltz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views for spark.sql."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def write_partitioned_by_day(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
) -> None:
    """Materialize events partitioned by event date — the other half
    of the 100 TB layout: time-range queries prune whole directories
    at planning time (PartitionFilters in the scan, asserted in
    tests/test_plans.py), so a last-7-days query over 3 years of data
    reads 0.6% of it."""
    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str = "user_id",
    buckets: int = 32,
    sort_col: str | None = "ts",
) -> None:
    """Materialize a table bucketed (and optionally sorted) by a key —
    the 100 TB layout for the events table: every subsequent
    per-user window/groupBy reads co-located buckets and skips the
    exchange entirely (asserted in tests/test_plans.py). On a real
    cluster this is the once-per-ingest cost that removes the
    per-query shuffle of the dominant table."""
    w = df.write.format("parquet").option("path", path).bucketBy(
        buckets, bucket_col
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode("overwrite").saveAsTable(table)
