"""Streaming funnel — live ordered-sequence progression.

The batch funnel (operators/funnel.py) recomputes min-ts chains per
query; the streaming analog keeps each customer's current step in
state and emits an advance row the moment an arriving event completes
the next step (the reference's on-insert segment re-evaluation,
specialized to sequences).

State per user is (current_step, ts of last completed step) — O(1)
regardless of timeline length; a finished customer keeps a terminal
marker so the funnel completes at most once per user (identical to
the batch min-ts chain regardless of micro-batch boundaries).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step", IntegerType()),  # 1-based step just completed
        StructField("ts", TimestampType()),
    ]
)

# (current_step: steps completed so far, last_us: its event time)
FUNNEL_STATE_SCHEMA = StructType(
    [StructField("current_step", IntegerType()), StructField("last_us", LongType())]
)


def stream_funnel(events: DataFrame, steps: Sequence[str]) -> DataFrame:
    """events stream -> (user_id, step, ts) advance stream.

    ``steps`` are event_type names in funnel order. Ordering semantics
    match the batch funnel: step k must occur strictly after step k-1.
    Within a micro-batch events are processed in ts order."""
    step_list = list(steps)

    def advance(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # no timeout configured; defensive
            return
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(t.value // 1000), et)
                for t, et in zip(pdf["ts"], pdf["event_type"])
            )
        if not rows:
            return
        rows.sort()
        cur, last_us = state.get if state.exists else (0, -1)
        out_steps, out_ts = [], []
        for ts_us, et in rows:
            if cur >= len(step_list):
                break
            if et == step_list[cur] and ts_us > last_us:
                cur += 1
                last_us = ts_us
                out_steps.append(cur)
                out_ts.append(pd.Timestamp(ts_us, unit="us"))
        # Completed users keep a terminal (cur == n_steps) marker: a
        # batch<->stream parity test caught that removing the state
        # slot here made the funnel RESTART in the next micro-batch —
        # results then depended on where batch boundaries fell. The
        # terminal slot is two ints; at scale an idle-timeout sweep
        # would reclaim it once the funnel's observation window ends.
        state.update((cur, last_us))
        if out_steps:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_steps),
                    "step": out_steps,
                    "ts": out_ts,
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        advance,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
