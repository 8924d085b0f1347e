"""Streaming embedding-drift monitor — the live twin of
``pipeline/similarity.py::embedding_drift`` (16th parity surface).

The statistic: for every arriving vector, its squared distance to the
centroid of every PRIOR same-label arrival. This is the alarm signal
an ingest pipeline watches to catch a feed whose embedding
distribution walks away from its history (a model swap upstream, a
corrupted shard, an injected domain).

Exact parity shape: the state per label is the running (count,
per-dim sum) — the same left fold the batch operator's running
window computes. Because both sides add the SAME doubles in the SAME
(id) order, and both reduce across dims as a sequential fold in dim
order, the emitted distances are BIT-IDENTICAL to the batch frame,
for any micro-batch split of an in-id-order stream (the
mixture-admit proof shape: order sensitivity is inherent to
prefix statistics, so the locked property is boundary invariance).

State is O(dim) per label; throughput parallelises across labels.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DRIFT_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sums", ArrayType(DoubleType())),
    ]
)


def stream_embedding_drift(
    vecs: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(label, vec_id, n_prior, d2) per arrival with at least one
    prior same-label vector — d2 is the squared distance to the
    prefix centroid, ROUND(.., 4) like the batch twin.

    The per-batch group is sorted by ``id_col`` (the stream contract
    is in-id-order arrival ACROSS batches; within a batch the sort
    pins ties the file source may deliver interleaved)."""
    out_schema = StructType(
        [
            StructField(label_col, IntegerType()),
            StructField(id_col, LongType()),
            StructField("n_prior", LongType()),
            StructField("d2", DoubleType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, sums = state.get[0], list(state.get[1])
        else:
            n, sums = 0, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values(id_col)
        out_ids, out_np, out_d2 = [], [], []
        for vid, vec in zip(batch[id_col], batch[vec_col]):
            xs = [float(x) for x in vec]
            if sums is None:
                sums = [0.0] * len(xs)
            if n > 0:
                # sequential fold in dim order — mirrors the batch
                # aggregate() over the dim-sorted struct array exactly
                d2 = 0.0
                for d in range(len(xs)):
                    diff = xs[d] - sums[d] / n
                    d2 = d2 + diff * diff
                out_ids.append(int(vid))
                out_np.append(n)
                out_d2.append(d2)
            for d in range(len(xs)):
                sums[d] = sums[d] + xs[d]
            n += 1
        state.update((n, sums))
        if not out_ids:
            return
        yield pd.DataFrame(
            {
                label_col: [key[0]] * len(out_ids),
                id_col: out_ids,
                "n_prior": out_np,
                "d2": out_d2,
            }
        )

    out = vecs.groupBy(label_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # round JVM-side: the Python worker ships the raw fold result and
    # BOTH twins round through the same Spark HALF_UP decimal path
    # (python round() is half-even on the binary value — divergent on
    # shortest-repr boundary cases)
    from pyspark.sql import functions as F

    return out.withColumn("d2", F.round("d2", 4) + F.lit(0.0))


def stream_ivfpq_encode(
    vecs: DataFrame,
    centroids: list,
    books: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Live IVF-PQ index writer (17th parity surface): vectors
    arriving after the nightly batch build get (list_id, codes) on
    ingest against the SAME centroids/books, appended to the same
    list_id-partitioned layout — the index stays queryable between
    batch rebuilds (the stream_keeper_dedup posture, but for the ANN
    index). Stateless: the encode is pure projections (JVM normalize
    + coarse argmax + numpy residual codes), so parity with the
    batch `ivfpq_encode_frame` over the union is BIT-EXACT for any
    arrival order or micro-batch split."""
    from openset_spark.pipeline.pq import ivfpq_encode_frame

    return ivfpq_encode_frame(
        vecs, centroids, books, id_col=id_col, vec_col=vec_col
    )
