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
from openset_spark.pipeline.dedup import with_minhash_bands


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


def stream_near_dedup(
    docs: DataFrame,
    corpus_bands: DataFrame,
    window: str = "10 seconds",
    watermark: str | None = "5 seconds",
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Ingest-time NEAR-dup filtering: drop arriving documents that
    MinHash/LSH-collide with an existing corpus (the live analog of
    pipeline/dedup.py::near_dup_against — its batch parity oracle).

    ``corpus_bands`` is the STATIC published index of the training
    set: the distinct (band_idx, band_hash) buckets of
    `minhash_bands` — refreshed by the batch layer, read-only here.

    Pipeline (all streaming-legal): the arriving doc's band keys are
    PURE projections (`with_minhash_bands` — value-identical to the
    batch banding, tested), posexplode is a stateless row generator,
    the bucket probe is a stream-static LEFT join, and the per-doc
    any-hit verdict is a watermark-bounded windowed aggregate that
    emits each clean document once its window closes. State is
    O(bands per watermark window), not O(corpus) — the corpus lives
    in the static index, exactly where a 100 TB deployment wants it."""
    banded = with_minhash_bands(
        docs, text_col, num_hashes, bands, shingle_n
    )
    if watermark is not None:
        banded = banded.withWatermark(ts_col, watermark)
    exploded = banded.select(
        id_col,
        ts_col,
        text_col,
        F.posexplode("band_keys").alias("band_idx", "band_hash"),
    )
    probed = exploded.join(
        corpus_bands.select(
            "band_idx", "band_hash", F.lit(1).alias("_hit")
        ),
        ["band_idx", "band_hash"],
        "left",
    )
    verdict = probed.groupBy(
        F.window(ts_col, window), F.col(id_col)
    ).agg(
        F.max("_hit").alias("_any_hit"),
        F.first(text_col).alias(text_col),
        F.first(ts_col).alias(ts_col),
    )
    return verdict.filter(F.col("_any_hit").isNull()).select(
        id_col, ts_col, text_col
    )



def stream_keeper_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Live keeper reconciliation — the ORDER-FREE streaming twin of
    ``pipeline/dedup.py::exact_dedup_clusters`` (14th parity surface).

    ``stream_exact_dedup`` above answers "have I seen this text
    recently?" and is inherently arrival-order dependent (first
    arrival wins). This operator answers the batch question — "which
    doc is the canonical keeper (min id) of each normalized text?" —
    and maintains it LIVE: keyed by the content hash, state is the
    current minimum id; when a smaller id arrives the stream emits an
    ``evict`` for the dethroned keeper and an ``admit`` for the new
    one. Folding admits minus evicts at any point yields EXACTLY
    ``exact_dedup_clusters`` of everything that has arrived —
    whatever order documents came in and however micro-batches split
    them (the reservoir-surface proof shape, with k=1 and the id
    itself as the ranking key).

    Scale shape: one shuffle keyed by text hash (the batch
    operator's own aggregate key), O(1) state per DISTINCT text.
    A 100 TB deployment points this at the ingest firehose and gets
    the dedup keeper table as an incrementally-maintained view
    instead of a nightly batch rebuild."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from openset_spark.functions.text import normalize

    hashed = docs.select(
        F.md5(normalize(F.col(text_col))).alias("text_hash"),
        F.col(id_col).cast("long").alias(id_col),
    )
    out_schema = StructType(
        [
            StructField("text_hash", StringType()),
            StructField(id_col, LongType()),
            StructField("action", StringType()),
        ]
    )
    state_schema = StructType([StructField("keeper", LongType())])

    def update(key, pdfs, state: GroupState):
        keeper = state.get[0] if state.exists else None
        best = keeper
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf[id_col].min())
                best = m if best is None else min(best, m)
        if best == keeper:
            return
        state.update((int(best),))
        rows_id, rows_act = [best], ["admit"]
        if keeper is not None:
            rows_id.append(keeper)
            rows_act.append("evict")
        yield pd.DataFrame(
            {
                "text_hash": [key[0]] * len(rows_id),
                id_col: rows_id,
                "action": rows_act,
            }
        )

    return hashed.groupBy("text_hash").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_keep_best(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Live QUALITY-keeper reconciliation — the streaming twin of
    ``pipeline/dedup.py::dedup_keep_best``'s resolution policy
    (19th parity surface; VERDICT r9 ask #7).

    ``stream_keeper_dedup`` maintains the min-ID keeper; this one
    maintains the batch keep-best rule — highest ``score_col``,
    ties to the LOWER id — per normalized text. State per distinct
    text is the current (score, id) champion; a strictly better
    arrival emits an ``evict`` for the dethroned doc and an
    ``admit`` for the new keeper. Folding admits minus evicts at
    any point equals the keep=True rows of ``dedup_keep_best`` over
    everything that has arrived (with exact-text duplicate pairs),
    for ANY arrival order and ANY micro-batch split — the comparator
    is a pure max over (score, -id), which is order-free. The score
    is carried verbatim (never recomputed or rounded), so the
    comparison is the same IEEE comparison the batch window sort
    makes.

    Scale shape: one shuffle keyed by the content hash (the batch
    aggregate key), O(1) state per distinct text."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from openset_spark.functions.text import normalize

    hashed = docs.select(
        F.md5(normalize(F.col(text_col))).alias("text_hash"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(score_col).cast("double").alias(score_col),
    )
    out_schema = StructType(
        [
            StructField("text_hash", StringType()),
            StructField(id_col, LongType()),
            StructField(score_col, DoubleType()),
            StructField("action", StringType()),
        ]
    )
    state_schema = StructType(
        [StructField("score", DoubleType()), StructField("keeper", LongType())]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            best_score, best_id = float(state.get[0]), int(state.get[1])
        else:
            best_score, best_id = None, None
        old = (best_score, best_id)
        for pdf in pdfs:
            for s, i in zip(pdf[score_col], pdf[id_col]):
                s, i = float(s), int(i)
                if (
                    best_id is None
                    or s > best_score
                    or (s == best_score and i < best_id)
                ):
                    best_score, best_id = s, i
        if (best_score, best_id) == old:
            return
        state.update((best_score, best_id))
        ids, scores, acts = [best_id], [best_score], ["admit"]
        if old[1] is not None:
            ids.append(old[1])
            scores.append(old[0])
            acts.append("evict")
        yield pd.DataFrame(
            {
                "text_hash": [key[0]] * len(ids),
                id_col: ids,
                score_col: scores,
                "action": acts,
            }
        )

    return hashed.groupBy("text_hash").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

