"""Live stream enrichment: the streaming twins of the temporal join
operators (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def stream_asof_enrich(
    rows: DataFrame,
    by: str = "user_id",
    on: str = "ts",
    side_col: str = "side",
    payload_col: str = "price",
    id_col: str = "event_id",
) -> DataFrame:
    """Live AS-OF enrichment — the streaming twin of
    ``operators/asof.py::asof_join`` (21st parity surface): one
    stream carries BOTH sides, tagged by ``side_col`` ('snapshot'
    rows bear the payload, 'event' rows want it); state per key is
    the latest snapshot (ts, payload); each event row emits enriched
    with the newest snapshot at-or-before it.

    For an IN-ORDER stream (per key, by ``on``; snapshots before
    events at equal timestamps — the arrival contract a market-data
    or CDC feed provides) the output equals the batch
    ``asof_join`` of the split sides EXACTLY, for any micro-batch
    split: within a batch the group's rows are sorted by (ts, side)
    with snapshots first, so the state transition order is
    independent of the batch boundaries. State is O(1) per key —
    the 100 TB enrichment join as an incrementally-maintained view.
    """
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
        TimestampType,
    )

    keyed = rows.select(
        F.col(by).cast("long").alias(by),
        F.col(on).alias(on),
        F.col(side_col).alias(side_col),
        F.col(payload_col).cast("double").alias(payload_col),
        F.col(id_col).cast("long").alias(id_col),
    )
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(by, LongType()),
            StructField(on, TimestampType()),
            StructField("ts_asof", TimestampType()),
            StructField(f"{payload_col}_asof", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("snap_ts", TimestampType()),
            StructField("snap_val", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        snap_ts, snap_val = (
            (state.get[0], float(state.get[1]))
            if state.exists
            else (None, None)
        )
        out_ids, out_ts, out_mts, out_val = [], [], [], []
        for pdf in pdfs:
            # snapshots sort before events at equal ts: the batch
            # operator's inclusive <= match, replayed in state order
            pdf = pdf.sort_values(
                [on, side_col],
                key=lambda s: s.map(
                    {"snapshot": 0, "event": 1}
                ) if s.name == side_col else s,
            )
            for _, r in pdf.iterrows():
                if r[side_col] == "snapshot":
                    snap_ts, snap_val = r[on], float(r[payload_col])
                else:
                    out_ids.append(int(r[id_col]))
                    out_ts.append(r[on])
                    out_mts.append(snap_ts)
                    out_val.append(snap_val)
        if snap_ts is not None:
            state.update((snap_ts, snap_val))
        if out_ids:
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    by: [key[0]] * len(out_ids),
                    on: out_ts,
                    "ts_asof": out_mts,
                    f"{payload_col}_asof": out_val,
                }
            )

    return keyed.groupBy(by).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_interval_tag(
    events: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Live point-in-interval tagging — the streaming twin of
    ``operators/asof.py::interval_join`` (23rd parity surface):
    ``events`` is a STREAM, ``intervals`` a static frame (campaign /
    maintenance / validity windows). The batch operator's inner path
    is reused verbatim: the static side explodes to its buckets once,
    each live event computes its single bucket, and Spark runs a
    stateless stream-static equijoin on (key, bucket) + the exact
    containment post-filter — no state store at all, so parity with
    the batch join is exact for ANY micro-batch split by
    construction (and locked by the test anyway)."""
    from openset_spark.operators.asof import interval_join

    return interval_join(
        events,
        intervals,
        on=on,
        by=by,
        start_col=start_col,
        end_col=end_col,
        bucket_ms=bucket_ms,
        how="inner",
    )
