"""Streaming exact dedup — drop documents whose normalized text was
already seen, as they arrive (the live analog of
pipeline/dedup.py::exact_dedup for an ingest firehose).

``dropDuplicates`` on the content hash with a watermark bounds state:
a hash older than the allowed lateness is forgotten, so state is
O(docs per watermark window), not O(corpus). Exactly the trade a
100 TB ingest wants — global history dedup belongs in the batch
layer; the stream guards the recent window."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import normalize


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """doc stream -> first-seen-only doc stream (append).

    ``watermark=None`` keeps the upstream watermark (Spark disallows
    redefining one mid-stream)."""
    hashed = docs.withColumn("_text_hash", F.md5(normalize(F.col(text_col))))
    if watermark is not None:
        hashed = hashed.withWatermark(ts_col, watermark)
    # dropDuplicatesWithinWatermark, NOT dropDuplicates: with a plain
    # subset=[hash] the state store never evicts (eviction requires the
    # event-time column in the subset), so state would grow O(corpus).
    return hashed.dropDuplicatesWithinWatermark(["_text_hash"]).drop(
        "_text_hash"
    )
