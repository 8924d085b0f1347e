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
