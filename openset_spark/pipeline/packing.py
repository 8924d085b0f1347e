"""Sequence packing — the training-batch construction primitive.

GPT-style pretraining concatenates the corpus into one token stream
(EOS-separated) and splits it into fixed-length sequences; a document
crossing a boundary contributes a piece to each side. The output here
is the PLAN of that packing: one row per (sequence, document piece)
with offsets, which a loader joins back to the tokenized text. This
is the packing used by GPT-3/Pile-style pipelines — no padding waste,
deterministic, and embarrassingly parallel once every document knows
its global start offset.

That global start offset is the only hard part at 100 TB: it is a
corpus-wide running total, and the naive form is a single-partition
window. `distributed_cumsum` (pipeline/sampling.py) computes it with
range partitions + local windows + broadcast offsets instead, so no
stage sees more than its slice; the piece explosion afterwards is a
pure JVM `sequence()` over the few sequences each document touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import tokens
from openset_spark.pipeline.sampling import distributed_cumsum


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int = 32,
) -> DataFrame:
    """Assign every document its pieces in the packed token stream.

    Documents are concatenated in ``id_col`` order (deterministic —
    repack on any cluster yields byte-identical batches) and split at
    every ``seq_len`` boundary. Returns one row per piece:

    * ``seq_id``      — which fixed-length sequence the piece lands in
    * ``doc_id``      — the contributing document
    * ``seq_offset``  — where in the sequence the piece starts
    * ``doc_offset``  — where in the document the piece starts
    * ``piece_tokens``— piece length

    Zero-token documents are excluded (they occupy no stream space).
    A document longer than ``seq_len`` simply spans several sequences
    — the spec of suffix pieces is exact, not truncated.
    """
    base = df.filter(F.col(token_col) > 0)
    c = distributed_cumsum(
        base, [F.col(id_col).asc()], token_col, partitions
    )
    n = F.col(token_col).cast("long")
    start = (F.col("_cum") - n).alias("_start")
    c = c.withColumn("_start", start)
    first = F.floor(F.col("_start") / seq_len)
    last = F.floor((F.col("_start") + n - 1) / seq_len)
    out = c.withColumn("seq_id", F.explode(F.sequence(first, last)))
    seq_start = F.col("seq_id") * seq_len
    return out.select(
        F.col("seq_id"),
        F.col(id_col),
        F.greatest(F.col("_start") - seq_start, F.lit(0)).alias("seq_offset"),
        F.greatest(seq_start - F.col("_start"), F.lit(0)).alias("doc_offset"),
        (
            F.least(F.col("_start") + n, seq_start + seq_len)
            - F.greatest(F.col("_start"), seq_start)
        ).alias("piece_tokens"),
    )


def chunk_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking (the RAG / retrieval-index shape):
    each document yields overlapping token windows of ``window``
    tokens every ``stride`` tokens — chunk starts at 0, S, 2S, … for
    every start < n_tokens, so the tail chunk may be short but no
    token is unreachable. One row per chunk with a content hash
    (md5 of the space-joined window) so a downstream index or
    chunk-level dedup never re-tokenizes.

    Scale shape: pure per-row explode — no shuffle at all; the chunk
    fan-out is n/stride per doc and the slices are computed inside
    codegen from the one tokens() array."""
    base = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .filter(F.size("_toks") > 0)
    )
    n = F.size("_toks").cast("long")
    last_chunk = F.floor((n - 1) / stride)
    step1 = base.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.col("_toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), last_chunk)).alias(
            "chunk_id"
        ),
    )
    start = F.col("chunk_id") * stride
    return step1.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        F.least(F.lit(window).cast("long"), F.col("n_tokens") - start).alias(
            "chunk_len"
        ),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("_toks"), start.cast("int") + 1, window)
            )
        ).alias("chunk_hash"),
    )


def shard_manifest(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int = 32,
) -> DataFrame:
    """The training-corpus WRITER's manifest: documents concatenate in
    ``id_col`` order and cut into output shards of ~``budget`` tokens
    each — a doc never splits across shards; the shard a doc lands in
    is ``(inclusive_cumsum - 1) div budget``, i.e. a shard closes when
    the running total crosses its budget boundary. One row per shard:
    (shard_id, n_docs, n_tokens, first_doc, last_doc). The assignment
    is a pure function of the ordered token totals, so re-running the
    writer on any cluster layout reproduces the same shard boundaries
    — the property that makes resumable multi-epoch training and
    shard-addressed data loaders possible (the reference's segment
    writer sizes its row groups the same way).

    Scale shape: distributed_cumsum (range partitions + broadcast
    offsets — no global-ordering window), then ONE groupBy(shard_id)
    whose cardinality is total_tokens/budget. Zero-token docs are
    excluded (they occupy no stream space, matching pack_sequences).
    """
    base = df.filter(F.col(token_col) > 0)
    c = distributed_cumsum(base, [F.col(id_col).asc()], token_col, partitions)
    # integer div, not float floor: cumsum is int64 and stays exact
    shard = F.expr(f"(_cum - 1) div {int(budget)}").cast("long")
    return (
        c.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(token_col).cast("long").alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    batch_size: int,
    id_col: str = "doc_id",
    partitions: int = 32,
) -> DataFrame:
    """Deterministic epoch shuffle + batch assignment — the data-
    loader contract at 100 TB. "Random" order for epoch ``seed`` is
    the sort by ``md5(seed || ':' || id)`` (engine-portable, stable,
    and reshuffleable per epoch by changing the seed); the global
    rank comes from distributed_cumsum over unit weights (range
    partitions + broadcast offsets — NO global-ordering window, the
    token_budget_select decomposition), and ``batch_id = (rank-1)
    div batch_size``. Any worker can locate its batches by range —
    resumable mid-epoch training without a driver-side shuffle
    index. One row per doc: (doc_id, rank, batch_id)."""
    keyed = df.select(
        F.col(id_col),
        F.md5(
            F.concat_ws(":", F.lit(str(int(seed))), F.col(id_col).cast("string"))
        ).alias("_k"),
        F.lit(1).alias("_one"),
    )
    c = distributed_cumsum(
        keyed, [F.col("_k").asc(), F.col(id_col).asc()], "_one", partitions
    )
    return c.select(
        F.col(id_col),
        F.col("_cum").cast("long").alias("rank"),
        F.expr(f"(_cum - 1) div {int(batch_size)}").cast("long").alias(
            "batch_id"
        ),
    )


def sentence_chunks(
    df: DataFrame,
    budget: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-ALIGNED retrieval chunks — the RAG indexing shape
    beside chunk_windows' fixed token windows: sentences never
    split; chunk boundaries land where the running token count
    crosses the budget, by the shard_manifest assignment law
    (chunk_id = (cum_tokens - 1) div budget on the INCLUSIVE per-doc
    running sum) — deterministic, window-free of global state, and
    exactly SQL-replayable, unlike greedy repacking. A sentence
    longer than the budget keeps its own chunk(s) boundary — chunks
    can overshoot by at most one sentence, the doc-atomic
    shard_manifest tradeoff.

    Sentence split = the portable alternation
    ``[^.!?]+[.!?]+|[^.!?]+$`` (leftmost-preferred in both Java and
    RE2); punctuation-only/whitespace docs emit nothing. Emits
    (id, chunk_id, n_sentences, n_tokens, chunk_text).

    Shape: one posexplode (order kept), ONE exchange — the per-doc
    cumsum window partitions by id and the (id, chunk) aggregate
    reuses that partitioning (subset-key distribution); reassembly
    is sort_array(collect_list) inside the aggregate (the
    dedup_lines pattern), never a second window."""
    from pyspark.sql.window import Window

    sent_re = r"[^.!?]+[.!?]+|[^.!?]+$"
    ws = r"[ \t\n\r\f]+"
    sents = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(sent_re), F.lit(0))
        ).alias("idx", "_s"),
    ).select(
        F.col(id_col), "idx", F.trim(F.col("_s")).alias("sentence")
    ).filter(F.col("sentence") != "")
    toks = F.size(
        F.filter(
            F.split(F.col("sentence"), ws), lambda x: x != ""
        )
    )
    w = Window.partitionBy(id_col).orderBy("idx")
    cum = sents.select(
        "*",
        toks.alias("n_toks"),
    ).select(
        "*",
        F.sum("n_toks").over(w).alias("_cum"),
    ).select(
        "*",
        F.expr(f"CAST((_cum - 1) div {int(budget)} AS BIGINT)").alias(
            "chunk_id"
        ),
    )
    return (
        cum.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "sentence"))
                    ),
                    lambda s: s["sentence"],
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
