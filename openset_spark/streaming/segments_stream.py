"""Streaming segment membership with enter/exit events — the
reference's ``on_insert`` segments + subscribers
(src/oloop_seg_refresh.cpp, src/message_broker.cpp): when a customer's
data changes, segments re-evaluate and subscribers are notified on
enter/exit.

Spark-first: ``applyInPandasWithState`` keyed by user; state is the
boolean membership vector. Each batch folds the new events into
per-segment "ever" accumulators and emits one row per membership
flip. For ever/never predicates the fold is monotone (max), so state
is a fixed-width bit vector — O(segments) per user at any scale.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("segment", StringType()),
        StructField("transition", StringType()),  # enter | exit
        StructField("stamp", LongType()),  # epoch ms of the flip batch
    ]
)


class StreamSegment:
    """A segment over the event stream: name + a vectorized pandas
    predicate (pd.DataFrame -> pd.Series[bool]) + mode.

    mode "ever": once true, always true (enter-only).
    mode "never": starts true, exits when the predicate first matches.
    """

    def __init__(self, name: str, predicate, mode: str = "ever"):
        self.name = name
        self.predicate = predicate
        self.mode = mode


def make_segment_transitions(segments: list[StreamSegment]):
    """Build the stateful mapper for the given segment list."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        hits = [False] * len(segments)
        any_rows = False
        stamp_ms = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            any_rows = True
            if "ts" in pdf.columns:
                stamp_ms = max(
                    stamp_ms, int(pd.Timestamp(pdf["ts"].max()).value // 10**6)
                )
            for i, seg in enumerate(segments):
                if not hits[i]:
                    hits[i] = bool(seg.predicate(pdf).any())
        if not any_rows:
            return
        prev = list(state.get) if state.exists else [0] * len(segments)
        out_user, out_seg, out_tr = [], [], []
        new = list(prev)
        for i, seg in enumerate(segments):
            ever = bool(prev[i]) or hits[i]
            new[i] = int(ever)
            if ever and not prev[i]:
                out_user.append(user_id)
                out_seg.append(seg.name)
                out_tr.append("enter" if seg.mode == "ever" else "exit")
        state.update(tuple(new))
        if out_user:
            yield pd.DataFrame(
                {
                    "user_id": out_user,
                    "segment": out_seg,
                    "transition": out_tr,
                    "stamp": [stamp_ms] * len(out_user),
                }
            )

    state_schema = StructType(
        [StructField(f"s_{i}", LongType()) for i in range(len(segments))]
    )
    return fn, state_schema


def stream_segment_transitions(
    events: DataFrame, segments: list[StreamSegment]
) -> DataFrame:
    """events stream -> (user_id, segment, enter|exit) transition stream."""
    fn, state_schema = make_segment_transitions(segments)
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
