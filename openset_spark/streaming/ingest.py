"""Streaming ingest — the reference's real-time JSON insert endpoint
(src/rpc_insert.cpp) re-expressed as Structured Streaming.

Events arrive as JSON lines (one object per event, keys matching the
table's properties — the reference's insert format). A file/Kafka
source streams them through ``from_json`` into the typed events
schema; downstream operators are the same DataFrame transformations
as batch (Structured Streaming's unified model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Stream JSON-lines event files from a directory (swap for Kafka
    in production: ``spark.readStream.format("kafka")`` + the same
    from_json projection)."""
    raw = (
        spark.readStream.schema(StructType([StructField("value", StringType())]))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    parsed = raw.select(F.from_json("value", EVENT_SCHEMA).alias("e")).select("e.*")
    return parsed.withWatermark("ts", "1 hour")
