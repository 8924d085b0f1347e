"""Streaming benchmark n-gram coverage — the live twin of
``pipeline/decontam.py::ngram_coverage`` (13th batch-parity surface).

An eval-integrity monitor over an ingest firehose: as corpus
documents stream in, each benchmark document's covered-gram count
rises monotonically; the final counts must equal the batch coverage
of the union (the property tests/test_stream_parity.py locks —
coverage is a set-union statistic, so arrival order and micro-batch
splits cannot change it).

Spark-first shape: the stream side explodes into (gram-hash) rows and
inner-joins the STATIC benchmark gram index (a stream-static join is
stateless); ``applyInPandasWithState`` keyed by benchmark doc holds
the covered-hash set — state is O(grams of that benchmark doc), never
O(corpus) — and emits a monotone snapshot row whenever a batch adds
coverage. A sink keeps the latest row per benchmark doc.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from openset_spark.functions.text import tokens
from openset_spark.pipeline.decontam import _ngram_expr

COVERAGE_STATE_SCHEMA = StructType(
    [StructField("covered", ArrayType(LongType()))]
)
COVERAGE_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_grams", LongType()),
        StructField("n_covered", LongType()),
    ]
)


def benchmark_gram_index(
    benchmark: DataFrame, n: int = 5, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Static join index: (bench doc_id, gram hash, that doc's total
    distinct gram count). Built once at monitor start — eval sets are
    small and the frame broadcasts into the stream-static join."""
    grams = (
        benchmark.select(
            F.col(id_col), tokens(F.col(text_col)).alias("toks")
        )
        .filter(F.size("toks") >= n)
        .select(
            F.col(id_col).alias("bench_id"),
            F.explode(F.array_distinct(_ngram_expr("toks", n))).alias("ng"),
        )
        .select("bench_id", F.xxhash64("ng").alias("ngh"))
    )
    totals = grams.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    return grams.join(totals, "bench_id")


def stream_ngram_coverage(
    docs: DataFrame,
    bench_index: DataFrame,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """corpus doc stream -> (doc_id, n_grams, n_covered) snapshot
    stream (doc_id = BENCHMARK doc; one row per key per batch that
    increased its coverage; counts are monotone, latest row wins)."""
    stream_grams = (
        docs.select(tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= n)
        .select(F.explode(_ngram_expr("toks", n)).alias("ng"))
        .select(F.xxhash64("ng").alias("ngh"))
    )
    hits = stream_grams.join(bench_index, "ngh").select(
        "bench_id", "ngh", "n_grams"
    )

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        covered: set[int] = (
            set(state.get[0]) if state.exists else set()
        )
        before = len(covered)
        n_grams = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_grams = int(pdf["n_grams"].iloc[0])
            covered.update(int(h) for h in pdf["ngh"])
        if len(covered) > before:
            state.update((sorted(covered),))
            yield pd.DataFrame(
                {
                    "doc_id": [key[0]],
                    "n_grams": [n_grams],
                    "n_covered": [len(covered)],
                }
            )

    return hits.groupBy("bench_id").applyInPandasWithState(
        update,
        COVERAGE_OUT_SCHEMA,
        COVERAGE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
