"""Named segment-change subscriptions with retained message feeds.

Mirrors the reference's subscription surface
(docs/rest/README.md:160-212; src/message_broker.cpp behavior):

- ``PUT /v1/subscription/{table}/{segment}/{sub}`` -> ``create()``
- ``DELETE /v1/subscription/{table}/{segment}/{sub}`` -> ``delete()``
- web-hook payload ``{"messages": [{stamp, stamp_iso, uid, state}]}``
  with a ``remaining`` backlog count -> ``poll()``

Each subscription is an INDEPENDENT feed over the same segment's
enter/exit transitions, retained for ``retention_ms`` (reference
default: 3 hours).

Spark-first split: membership detection is the distributed part —
``stream_segment_transitions`` (applyInPandasWithState keyed by user)
emits only the FLIPS, so the per-batch transition volume is bounded by
(new members + exits), not by event volume. The broker then fans the
tiny flip stream out to subscribers driver-side via ``foreachBatch``
— the same shape as the reference's in-process message broker. At
100 TB the broker would sit behind the sink (e.g. a topic per
segment); the feed contract here is identical.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame

DEFAULT_RETENTION_MS = 3 * 3600 * 1000  # reference default: 3 hours


def _iso(ms: int) -> str:
    return (
        datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
        .isoformat(timespec="milliseconds")
        .replace("+00:00", "Z")
    )


@dataclass
class Subscription:
    segment: str
    name: str
    retention_ms: int = DEFAULT_RETENTION_MS
    _messages: deque = field(default_factory=deque)

    def push(self, stamp: int, uid, state: str) -> None:
        self._messages.append((stamp, uid, state))

    def trim(self, now_ms: int) -> int:
        """Drop messages older than the retention period; return the
        number dropped."""
        cutoff = now_ms - self.retention_ms
        dropped = 0
        while self._messages and self._messages[0][0] < cutoff:
            self._messages.popleft()
            dropped += 1
        return dropped

    def poll(self, limit: int | None = None, now_ms: int | None = None) -> dict:
        """Drain up to ``limit`` retained messages (all by default).
        Returns the web-hook payload shape: the messages body plus the
        CGI parameters the reference passes alongside
        (segment/subscriber/count/remaining)."""
        now = int(time.time() * 1000) if now_ms is None else now_ms
        self.trim(now)
        n = len(self._messages) if limit is None else min(limit, len(self._messages))
        out = [self._messages.popleft() for _ in range(n)]
        return {
            "segment": self.segment,
            "subscriber": self.name,
            "count": n,
            "remaining": len(self._messages),
            "messages": [
                {
                    "stamp": stamp,
                    "stamp_iso": _iso(stamp),
                    "uid": uid,
                    "state": state,
                }
                for stamp, uid, state in out
            ],
        }


class SubscriptionBroker:
    """The per-table subscription registry + transition fan-out."""

    def __init__(self) -> None:
        self._subs: dict[tuple[str, str], Subscription] = {}

    # -- registry (PUT / DELETE) --------------------------------------
    def create(
        self,
        segment: str,
        sub_name: str,
        retention_ms: int = DEFAULT_RETENTION_MS,
    ) -> Subscription:
        key = (segment, sub_name)
        if key in self._subs:
            raise ValueError(f"subscription {sub_name!r} on {segment!r} exists")
        sub = Subscription(segment, sub_name, retention_ms)
        self._subs[key] = sub
        return sub

    def delete(self, segment: str, sub_name: str) -> None:
        if (segment, sub_name) not in self._subs:
            raise KeyError(f"no subscription {sub_name!r} on {segment!r}")
        del self._subs[(segment, sub_name)]

    def get(self, segment: str, sub_name: str) -> Subscription:
        return self._subs[(segment, sub_name)]

    def list(self) -> list[tuple[str, str]]:
        return sorted(self._subs)

    # -- feed ---------------------------------------------------------
    def feed(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch sink: fan a (user_id, segment, transition,
        stamp) micro-batch out to every matching subscriber. The batch
        holds membership FLIPS only, so collecting it is bounded and
        cheap (enters happen once per user per segment)."""
        if not self._subs:
            return
        wanted = {seg for seg, _ in self._subs}
        rows = (
            batch_df.filter(batch_df.segment.isin(list(wanted)))
            .select("stamp", "user_id", "segment", "transition")
            .collect()
        )
        for r in rows:
            state = "entered" if r.transition == "enter" else "exited"
            for (seg, _name), sub in self._subs.items():
                if seg == r.segment:
                    sub.push(r.stamp or 0, r.user_id, state)

    def attach(self, transitions: DataFrame, checkpoint: str, **trigger):
        """Start the fan-out query over a transition stream (see
        stream_segment_transitions). ``trigger`` kwargs pass through
        (e.g. ``availableNow=True``)."""
        return (
            transitions.writeStream.foreachBatch(self.feed)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**trigger)
            .start()
        )
