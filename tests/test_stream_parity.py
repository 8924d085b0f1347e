"""Batch <-> stream parity (the round-4 verification gap): each
stateful streaming operator must agree with the oracle-checked batch
operator it mirrors, on the SAME real events, processed across
MULTIPLE micro-batches. Reference analog: on-insert re-evaluation
produces the same memberships/sessions a query-time scan would
(src/oloop_seg_refresh.cpp semantics).

The input is the sf0.001 events table itself (not synthetic rows):
events for a user subset are re-serialized as time-ordered JSON files
and streamed with maxFilesPerTrigger=1, so state genuinely crosses
micro-batch boundaries; the batch side reads the exact same files.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from openset_spark.operators.funnel import funnel_user_steps
from openset_spark.operators.sessionize import session_stats
from openset_spark.pipeline.dedup import exact_dedup
from openset_spark.sources.tables import load_table
from openset_spark.streaming.ingest import EVENT_SCHEMA, read_event_stream


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="oss-parity-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


N_FILES = 3


def _spill_events(spark, sf_dir, outdir, n_users=40):
    """Re-serialize real events (user subset, ts-ordered) into N_FILES
    JSON-lines files named so the file source replays them in time
    order, one micro-batch each."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < n_users)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .orderBy("ts", "event_id")
    )
    rows = [r.asDict() for r in ev.collect()]
    chunk = (len(rows) + N_FILES - 1) // N_FILES
    import json

    for i in range(N_FILES):
        with open(f"{outdir}/batch-{i:03d}.json", "w") as f:
            for r in rows[i * chunk : (i + 1) * chunk]:
                f.write(json.dumps(r) + "\n")
    return len(rows)


def _batch_frame(spark, path):
    """The batch-side read of the SAME files the stream consumed."""
    return spark.read.schema(EVENT_SCHEMA).json(path)


def _run_available(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # must assert termination: an expired wait would leave a PARTIAL
    # memory table and a baffling parity diff (seen once under load)
    assert q.awaitTermination(300), "stream did not drain in 300s"
    return q


def test_stream_sessionize_matches_batch_with_session(spark, sf_dir, tmpdir):
    """Closed streaming sessions == batch session_stats minus each
    user's final (still-open) session: identical (user, start, end,
    n_events) tuples."""
    from openset_spark.streaming.sessions import stream_sessionize

    n = _spill_events(spark, sf_dir, tmpdir)
    assert n > 0
    stream = read_event_stream(spark, tmpdir, max_files_per_trigger=1)
    name = f"parity_sess_{uuid.uuid4().hex[:8]}"
    _run_available(stream_sessionize(stream), name)
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql(f"select * from {name}").collect()
    }

    batch = session_stats(_batch_frame(spark, tmpdir))
    last = batch.groupBy("user_id").agg(F.max("session").alias("_last"))
    closed = batch.join(last, "user_id").filter(F.col("session") < F.col("_last"))
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in closed.collect()
    }
    assert len(expected) > 10  # real multi-session data, not a vacuous pass
    assert streamed == expected


def test_stream_funnel_matches_batch_funnel(spark, sf_dir, tmpdir):
    """Streaming funnel advances == the batch min-ts chain: for every
    user, the set of completed steps and their completion stamps."""
    from openset_spark.streaming.funnel import stream_funnel

    _spill_events(spark, sf_dir, tmpdir)
    steps = ["signup", "purchase"]
    stream = read_event_stream(spark, tmpdir, max_files_per_trigger=1)
    name = f"parity_fun_{uuid.uuid4().hex[:8]}"
    _run_available(stream_funnel(stream, steps), name)
    streamed = {
        (r.user_id, r.step, r.ts)
        for r in spark.sql(f"select * from {name}").collect()
    }

    per_user = funnel_user_steps(
        _batch_frame(spark, tmpdir),
        [F.col("event_type") == s for s in steps],
    )
    expected = set()
    for r in per_user.collect():
        if r.step_1 is not None:
            expected.add((r.user_id, 1, r.step_1))
        if r.step_2 is not None:
            expected.add((r.user_id, 2, r.step_2))
    assert any(s == 2 for _, s, _ in expected)  # funnel completions exist
    assert streamed == expected


def test_stream_dedup_matches_batch_exact_dedup(spark, sf_dir, tmpdir):
    """Streaming first-seen dedup == batch exact_dedup on the same
    corpus: one survivor per normalized text, same content set. (The
    surviving REPRESENTATIVE may differ — batch keeps min doc_id, the
    stream keeps arrival-first — so parity is on the deduped content,
    which is what downstream training-data consumers see.)"""
    from openset_spark.functions.text import normalize
    from openset_spark.streaming.dedup import stream_exact_dedup

    _spill_events(spark, sf_dir, tmpdir)
    # event_type plays the doc text (real column, heavy duplication);
    # a 30-day watermark >> the data span, so stream state never
    # evicts and global parity is well-defined.
    doc_stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(tmpdir)
        .select(F.col("event_id").alias("doc_id"), "ts", F.col("event_type").alias("text"))
    )
    name = f"parity_dedup_{uuid.uuid4().hex[:8]}"
    _run_available(stream_exact_dedup(doc_stream, watermark="30 days"), name)
    survivors = spark.sql(f"select * from {name}").collect()

    batch_docs = _batch_frame(spark, tmpdir).select(
        F.col("event_id").alias("doc_id"), "ts", F.col("event_type").alias("text")
    )
    expected_texts = {
        r.n for r in batch_docs.select(normalize(F.col("text")).alias("n")).distinct().collect()
    }
    batch_survivors = exact_dedup(batch_docs).count()

    got_texts = [r.text.strip().lower() for r in survivors]
    assert sorted(set(got_texts)) == sorted(expected_texts)
    assert len(got_texts) == len(set(got_texts)) == batch_survivors


def test_subscription_poll_is_cappable(spark):
    """An oversized retained feed pages out under poll(limit=) — the
    REST analog never ships an unbounded body (VERDICT r4 ask #6)."""
    from openset_spark.streaming.subscriptions import Subscription

    sub = Subscription("seg", "sub", retention_ms=10**12)
    for i in range(1000):
        sub.push(stamp=i, uid=i, state="entered")
    page = sub.poll(limit=100, now_ms=10**9)
    assert page["count"] == 100
    assert page["remaining"] == 900
    assert [m["uid"] for m in page["messages"]] == list(range(100))
    page2 = sub.poll(limit=100, now_ms=10**9)
    assert [m["uid"] for m in page2["messages"]] == list(range(100, 200))
    assert page2["remaining"] == 800
