"""Skew-evidence benchmark harness.

Materializes a deterministic skewed events corpus — ONE user owns
~30% of all rows (the bot/test-account shape that breaks per-user
operators at 100 TB) — and times the skew-bound plans against their
skew-safe forms:

- ``scalar`` (sum/count per user): ``user_scalar`` vs
  ``user_scalar_salted``. EXPECTED ~1x: Spark's map-side partial
  aggregation already collapses each input partition to one row per
  user, so the shuffle is tiny whatever the key skew. The honest
  lesson is that algebraic aggs need no salting — the salted variant
  exists for pipelines that break partial aggregation.
- ``first_row`` (earliest row per user): ``matching_rows(limit=1)``
  (window sort — the hot user's whole timeline sorts in ONE task) vs
  ``user_first_row_salted`` (min-struct algebraic form). This is
  where the skew actually bites and where the salted/algebraic
  rewrite wins.

Corpus generation is seeded and cached under ``.cache/skew_bench`` so
repeated bench runs pay it once.
"""

from __future__ import annotations

import math
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from openset_spark.operators.events import (
    matching_rows,
    user_first_row_salted,
    user_scalar,
    user_scalar_salted,
)

DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "skew_bench",
)

N_ROWS = 6_000_000
N_USERS = 100_000
HOT_SHARE = 0.30
SEED = 11


def ensure_skew_corpus(
    cache_dir: str = DEFAULT_CACHE,
    n_rows: int = N_ROWS,
    n_users: int = N_USERS,
    hot_share: float = HOT_SHARE,
    seed: int = SEED,
) -> str:
    """events-shaped parquet where user 0 owns ``hot_share`` of rows,
    the rest uniform over ``n_users`` users; row order shuffled so the
    hot user spreads across input splits (the realistic layout)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"events_{n_rows}_{n_users}.parquet")
    if not os.path.exists(path):
        rng = np.random.default_rng(seed)
        n_hot = int(n_rows * hot_share)
        users = np.concatenate(
            [
                np.zeros(n_hot, dtype=np.int64),
                rng.integers(1, n_users, size=n_rows - n_hot, dtype=np.int64),
            ]
        )
        rng.shuffle(users)
        base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
        ts = base + rng.integers(0, 30 * 86_400 * 10**6, size=n_rows)
        table = pa.table(
            {
                "event_id": pa.array(np.arange(n_rows), pa.int64()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "value": pa.array(rng.random(n_rows) * 100),
            }
        )
        pq.write_table(table, path, row_group_size=512 * 1024)
    return path


def run_skew_bench(
    spark: SparkSession, cache_dir: str = DEFAULT_CACHE, reps: int = 2
) -> dict:
    path = ensure_skew_corpus(cache_dir)
    df = spark.read.parquet(path)
    df.count()  # warm file listing
    # warm codegen/JIT so the first timed plan doesn't carry the
    # one-time cost (min-of-reps below absorbs the rest)
    user_scalar(df, [("count", "event_id", "n")]).count()

    def timed(build):
        best = math.inf
        for _ in range(reps):
            t0 = time.time()
            build().count()
            best = min(best, time.time() - t0)
        return round(best, 3)

    aggs = [("sum", "value", "total"), ("count", "event_id", "n")]
    out = {
        "n_rows": N_ROWS,
        "n_users": N_USERS,
        "hot_user_share": HOT_SHARE,
        "scalar_unsalted_sec": timed(lambda: user_scalar(df, aggs)),
        "scalar_salted_sec": timed(
            lambda: user_scalar_salted(df, aggs, salt_buckets=16)
        ),
        "first_row_window_sec": timed(lambda: matching_rows(df, limit=1)),
        "first_row_salted_sec": timed(
            lambda: user_first_row_salted(df, salt_buckets=16)
        ),
    }
    out["first_row_speedup"] = round(
        out["first_row_window_sec"] / max(out["first_row_salted_sec"], 1e-9), 2
    )
    out["note"] = (
        "scalar ~1x expected: map-side partial agg already absorbs "
        "algebraic skew; the window->min-struct rewrite is where the "
        "hot user stops serializing a stage"
    )
    return out
