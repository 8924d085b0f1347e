"""Streaming per-stratum reservoir — the live twin of
``pipeline/sampling.py::sample_per_stratum``.

Because the batch operator's draw is DETERMINISTIC (the k smallest
portable md5 hashes of the id per stratum, ties by id), its streaming
counterpart can be held to EXACT parity: whatever order documents
arrive in, and however micro-batches split them, the final reservoir
must equal the batch sample of the union — the property
tests/test_stream_parity.py locks (11th parity surface).

Spark-first shape: ``applyInPandasWithState`` keyed by the strata
columns; state is the current top-k (hash, id) pairs — O(k) per
stratum regardless of stream length. Each batch emits an ``admit``
row for every document entering the reservoir and an ``evict`` row
for every one it displaces, so a downstream sink can maintain the
live sample incrementally (final sample = admits minus evicts —
append-only friendly, no retraction semantics needed in the sink).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# state: parallel arrays of the reservoir's (hash, id), sorted
RESERVOIR_STATE_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
    ]
)


def _portable_hash(doc_id: int) -> int:
    """First 8 md5 hex digits of str(id) as an int — identical to the
    batch operator's conv(substr(md5(cast(id AS string)),1,8),16,10)
    (and to the DuckDB oracle's UBIGINT cast)."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def stream_sample_per_stratum(
    docs: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """doc stream -> (strata..., doc_id, action) admit/evict stream.

    The reservoir keeps the ``k`` documents with the smallest
    (portable_hash, id) per stratum. Re-arrivals of an id already in
    the reservoir are ignored (idempotent ingest)."""
    out_schema = StructType(
        [docs.schema[c] for c in strata_cols]
        + [
            StructField(id_col, LongType()),
            StructField("action", StringType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hashes, ids = state.get
            reservoir = list(zip(hashes, ids))
        else:
            reservoir = []
        held = set(reservoir)
        new_pairs = set()
        for pdf in pdfs:
            for did in pdf[id_col]:
                did = int(did)
                p = (_portable_hash(did), did)
                if p not in held:
                    new_pairs.add(p)
        if not new_pairs:
            return
        merged = sorted(held | new_pairs)[:k]
        admits = [p for p in merged if p in new_pairs]
        evicts = [p for p in reservoir if p not in merged]
        state.update((
            [int(h) for h, _ in merged],
            [int(i) for _, i in merged],
        ))
        if not admits and not evicts:
            return
        rows = [(i, "admit") for _, i in admits] + [
            (i, "evict") for _, i in evicts
        ]
        out = {c: [key[j]] * len(rows) for j, c in enumerate(strata_cols)}
        out[id_col] = [r[0] for r in rows]
        out["action"] = [r[1] for r in rows]
        yield pd.DataFrame(out)

    return docs.groupBy(*strata_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# state: total tokens ARRIVED for the domain (admitted or not) — the
# batch rule filters on the inclusive cumsum over every candidate,
# so the streaming replica must accumulate rejected docs too
ADMIT_STATE_SCHEMA = StructType([StructField("arrived_tokens", LongType())])


def stream_mixture_admit(
    docs: DataFrame,
    budgets: dict[str, int],
    domain_col: str = "lang",
    score_col: str = "quality",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest-time enforcement of the ``mixture_select`` policy: a
    ranked doc stream (upstream scorer emits in (score DESC, id ASC)
    order) -> the admitted (domain, doc_id, n_tokens, cum_tokens)
    stream, cut off at each domain's token budget.

    EXACT batch parity (12th parity surface): because the batch
    operator filters on the inclusive per-domain cumsum over EVERY
    candidate — not just over admitted docs — the state here is
    "tokens arrived", advanced by rejected documents too. For any
    micro-batch split of a stream arriving in the batch sort order,
    admitted rows (including cum_tokens) equal
    ``mixture_select(batch_union)`` row-for-row. Order sensitivity
    is inherent to quota admission, so the locked property is
    boundary-invariance of an in-order stream (the reservoir surface
    covers the order-free case). Domains without a budget are
    dropped before the stateful stage; state is O(1) per domain."""
    filtered = docs.filter(F.col(domain_col).isin(list(budgets)))
    out_schema = StructType(
        [
            docs.schema[domain_col],
            StructField(id_col, LongType()),
            StructField(token_col, LongType()),
            StructField("cum_tokens", LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        arrived = state.get[0] if state.exists else 0
        budget = budgets[key[0]]
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values(
            [score_col, id_col], ascending=[False, True]
        )
        out_ids, out_toks, out_cums = [], [], []
        for did, ntok in zip(batch[id_col], batch[token_col]):
            arrived += int(ntok)
            if arrived <= budget:
                out_ids.append(int(did))
                out_toks.append(int(ntok))
                out_cums.append(arrived)
        state.update((int(arrived),))
        if not out_ids:
            return
        yield pd.DataFrame(
            {
                domain_col: [key[0]] * len(out_ids),
                id_col: out_ids,
                token_col: out_toks,
                "cum_tokens": out_cums,
            }
        )

    return filtered.groupBy(domain_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# state for the live shard writer: tokens arrived so far (the shard
# cut is a pure function of the running total)
SHARD_STATE_SCHEMA = StructType([StructField("arrived_tokens", LongType())])


def stream_shard_manifest(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Live twin of ``pipeline/packing.py::shard_manifest`` (15th
    parity surface): an in-id-order doc stream -> one row per doc
    (doc_id, n_tokens, cum_tokens, shard_id) with
    ``shard_id = (cum - 1) div budget`` — fold by shard_id at any
    point and you have EXACTLY the batch manifest of everything
    arrived, for any micro-batch split (boundary invariance; the
    mixture_admit proof shape).

    The running total is a single logical sequence, so state lives
    under ONE constant key — O(1) state, throughput bounded by the
    one writer task. That is not a flaw to engineer around: a shard
    WRITER is serial by contract (shard N must close before N+1
    opens); the batch operator is the scale path when order can be
    recomputed, this surface is the ingest-tail path that keeps the
    manifest live between batch rebuilds."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(token_col, LongType()),
            StructField("cum_tokens", LongType()),
            StructField("shard_id", LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        arrived = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values(id_col)
        ids, toks, cums, shards = [], [], [], []
        for did, ntok in zip(batch[id_col], batch[token_col]):
            ntok = int(ntok)
            if ntok <= 0:
                continue  # zero-token docs occupy no stream space
            arrived += ntok
            ids.append(int(did))
            toks.append(ntok)
            cums.append(arrived)
            shards.append((arrived - 1) // int(budget))
        state.update((int(arrived),))
        if not ids:
            return
        yield pd.DataFrame(
            {
                id_col: ids,
                token_col: toks,
                "cum_tokens": cums,
                "shard_id": shards,
            }
        )

    keyed = docs.withColumn("_w", F.lit(0))
    return (
        keyed.groupBy("_w")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=SHARD_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
