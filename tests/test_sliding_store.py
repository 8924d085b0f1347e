"""The persisted sliding-partial store (pipeline/sliding.py): write
partitioned-by-day, read partition-pruned, and the foreachBatch
maintainer that keeps it live — the storage loop a deployment runs
under the *_sliding_from_partials query halves (VERDICT r12 ask #6).

Two contracts:
* the partition-pruned read of a trailing window touches ONLY the
  overlapping day directories (plan-asserted PartitionFilters +
  inputFiles), and feeding it to the fold yields EXACTLY the batch
  sliding answer at that bucket;
* a store maintained across N micro-batches equals a fresh build
  over all the data (exact fold laws: max / sum / k-min re-rank).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from openset_spark.pipeline.sliding import (
    read_sliding_partials,
    sliding_store_maintainer,
    write_sliding_partials,
)
from openset_spark.sources.tables import load_table

from tests.test_stream_parity import (
    _batch_frame,
    _spill_events,
)
from openset_spark.streaming.ingest import read_event_stream


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="oss-slstore-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _hourly(df):
    return df.withColumn("_b", F.date_trunc("hour", F.col("ts")))


def test_pruned_read_answers_trailing_window(spark, sf_dir, tmpdir):
    from openset_spark.pipeline.hll import (
        hll_partials,
        hll_sliding_distinct,
        hll_sliding_from_partials,
    )

    ev = load_table(spark, sf_dir, "events")
    parts = hll_partials(_hourly(ev), "user_id", ("_b",))
    store = os.path.join(tmpdir, "hll_store")
    write_sliding_partials(parts, store, "_b")

    upto = ev.agg(F.max(F.date_trunc("hour", F.col("ts")))).first()[0]
    pruned = read_sliding_partials(spark, store, "_b", upto, "hour", 24)

    # the _day range must reach the scan as PartitionFilters (the
    # string form "isnotnull(_day#n), (_day#n >= ...), (_day#n <= ...)"
    # — directory-level pruning, not a post-scan filter)
    import re

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert re.search(r"_day#\d+ >= ", m.group(1)), m.group(1)
    assert re.search(r"_day#\d+ <= ", m.group(1)), m.group(1)
    n_store_days = len(
        [d for d in os.listdir(store) if d.startswith("_day=")]
    )
    assert n_store_days > 2, "fixture must span > 2 days"
    # and the pruned frame's rows genuinely span <= 2 days
    got_days = pruned.select(
        F.to_date("_b").alias("d")
    ).distinct().count()
    assert got_days <= 2, got_days

    got = {
        r.bucket: r.approx_distinct
        for r in hll_sliding_from_partials(pruned, "hour", 24).collect()
    }
    want = {
        r.bucket: r.approx_distinct
        for r in hll_sliding_distinct(
            ev, "user_id", "ts", "hour", 24
        ).collect()
    }
    # the pruned read answers the window ENDING at upto exactly
    assert got[upto] == want[upto]


def test_check_upto_alignment():
    """check_upto: boundary-aligned timestamps pass through; anything
    off-grain raises (a misaligned upto can never match a bucket —
    the silent-empty-result foot-gun, ADVICE r13 #1)."""
    from openset_spark.pipeline.sliding import check_upto

    t = dt.datetime(2024, 3, 5, 14, 0, 0)
    assert check_upto(t, "hour") == t
    with pytest.raises(ValueError, match="not aligned"):
        check_upto(t.replace(minute=30), "hour")
    with pytest.raises(ValueError, match="not aligned"):
        check_upto(t, "day")  # 14:00 is not a day boundary
    assert check_upto(t.replace(hour=0), "day") == t.replace(hour=0)
    with pytest.raises(TypeError):
        check_upto("2024-03-05T14:00:00", "hour")


def test_maintained_store_equals_fresh_build(spark, sf_dir, tmpdir):
    """hll: N micro-batches through the foreachBatch maintainer ==
    one fresh build; the sliding fold over the maintained store ==
    the batch sliding op."""
    from openset_spark.pipeline.hll import (
        hll_fold,
        hll_partials,
        hll_sliding_distinct,
        hll_sliding_from_partials,
    )

    src = os.path.join(tmpdir, "events")
    os.makedirs(src)
    _spill_events(spark, sf_dir, src)
    store = os.path.join(tmpdir, "store_hll")
    fn = sliding_store_maintainer(
        store,
        lambda df: hll_partials(_hourly(df), "user_id", ("_b",)),
        lambda df: hll_fold(df, ("_b",)),
        "_b",
    )
    q = (
        read_event_stream(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(fn)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )
    q.awaitTermination()

    maintained = spark.read.parquet(store).drop("_day")
    fresh = hll_partials(
        _hourly(_batch_frame(spark, src)), "user_id", ("_b",)
    )
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, fresh.collect())
    )
    got = {
        r.bucket: r.approx_distinct
        for r in hll_sliding_from_partials(
            maintained, "hour", 6
        ).collect()
    }
    want = {
        r.bucket: r.approx_distinct
        for r in hll_sliding_distinct(
            _batch_frame(spark, src), "user_id", "ts", "hour", 6
        ).collect()
    }
    assert got == want and len(want) >= 5


def test_maintained_kmv_store_reranks_exactly(spark, sf_dir, tmpdir):
    """kmv: the merge law is a re-rank (window k-min of old+new), the
    one non-monoid-looking fold — a maintained two-sided sketch store
    must still equal the fresh build and feed the sliding jaccard."""
    from openset_spark.pipeline.kmv import (
        kmv_fold,
        kmv_observations,
        kmv_sliding_from_partials,
        kmv_sliding_jaccard,
    )

    src = os.path.join(tmpdir, "events")
    os.makedirs(src)
    _spill_events(spark, sf_dir, src)
    k = 64

    def two_sided(df):
        pre = _hourly(df).withColumnRenamed("_b", "_tb")
        a = kmv_observations(
            pre.filter(F.col("event_type") == "view"), "user_id", ("_tb",)
        ).withColumn("_side", F.lit("a"))
        b = kmv_observations(
            pre.filter(F.col("event_type") == "purchase"),
            "user_id",
            ("_tb",),
        ).withColumn("_side", F.lit("b"))
        return kmv_fold(a.unionByName(b), ("_tb", "_side"), k)

    store = os.path.join(tmpdir, "store_kmv")
    fn = sliding_store_maintainer(
        store,
        two_sided,
        lambda df: kmv_fold(df, ("_tb", "_side"), k),
        "_tb",
    )
    q = (
        read_event_stream(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(fn)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_kmv"))
        .start()
    )
    q.awaitTermination()

    maintained = spark.read.parquet(store).drop("_day")
    fresh = two_sided(_batch_frame(spark, src))
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, fresh.collect())
    )
    got = sorted(
        map(
            tuple,
            kmv_sliding_from_partials(maintained, "hour", 6, k).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            kmv_sliding_jaccard(
                _batch_frame(spark, src),
                "user_id",
                F.col("event_type") == "view",
                F.col("event_type") == "purchase",
                window=6,
                k=k,
            ).collect(),
        )
    )
    assert got == want and len(want) >= 5


def test_maintained_hdr_and_cms_stores_sum_fold_exactly(spark, sf_dir, tmpdir):
    """hdr + cms: the sum-compose stores complete the maintained
    quartet (hll max, kmv re-rank proven above) — N micro-batches
    through the maintainer equal a fresh build, and each store feeds
    its sliding fold to the exact batch answer."""
    from openset_spark.pipeline.cms import (
        cms_fold,
        cms_partials,
        cms_sliding_estimate,
        cms_sliding_from_partials,
    )
    from openset_spark.pipeline.hdrhist import (
        hdr_fold,
        hdr_partials,
        hdr_sliding_from_partials,
        hdr_sliding_quantiles,
    )

    src = os.path.join(tmpdir, "events")
    os.makedirs(src)
    _spill_events(spark, sf_dir, src)
    batch = _batch_frame(spark, src)

    def cents(df):
        return df.withColumn(
            "cents", F.floor(F.col("value") * 100 + 0.5).cast("long")
        ).withColumn("_tb", F.date_trunc("hour", F.col("ts")))

    store_h = os.path.join(tmpdir, "store_hdr")
    fn_h = sliding_store_maintainer(
        store_h,
        lambda df: hdr_partials(cents(df), "cents", ("_tb",)),
        lambda df: hdr_fold(df, ("_tb",)),
        "_tb",
    )
    q = (
        read_event_stream(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(fn_h)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "ck_h"))
        .start()
    )
    q.awaitTermination()
    maintained_h = spark.read.parquet(store_h).drop("_day")
    fresh_h = hdr_partials(cents(batch), "cents", ("_tb",))
    assert sorted(map(tuple, maintained_h.collect())) == sorted(
        map(tuple, fresh_h.collect())
    )
    got = sorted(map(tuple, hdr_sliding_from_partials(
        maintained_h, "hour", 6, (0.5,)
    ).collect()))
    want = sorted(map(tuple, hdr_sliding_quantiles(
        cents(batch).drop("_tb"), "cents", "ts", "hour", 6, (0.5,)
    ).collect()))
    assert got == want and len(want) >= 5

    store_c = os.path.join(tmpdir, "store_cms")
    fn_c = sliding_store_maintainer(
        store_c,
        lambda df: cms_partials(
            df.withColumn("_tb", F.date_trunc("hour", F.col("ts"))),
            "user_id",
            ("_tb",),
        ),
        lambda df: cms_fold(df, ("_tb",)),
        "_tb",
    )
    q = (
        read_event_stream(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(fn_c)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "ck_c"))
        .start()
    )
    q.awaitTermination()
    maintained_c = spark.read.parquet(store_c).drop("_day")
    fresh_c = cms_partials(
        batch.withColumn("_tb", F.date_trunc("hour", F.col("ts"))),
        "user_id",
        ("_tb",),
    )
    assert sorted(map(tuple, maintained_c.collect())) == sorted(
        map(tuple, fresh_c.collect())
    )
    probes = batch.select("user_id").filter(
        F.col("user_id") % 7 == 0
    ).distinct().localCheckpoint()
    got = sorted(map(tuple, cms_sliding_from_partials(
        maintained_c, "user_id", probes, "hour", 6
    ).collect()))
    want = sorted(map(tuple, cms_sliding_estimate(
        batch, "user_id", probes, "ts", "hour", 6
    ).collect()))
    assert got == want and len(want) >= 5


def test_maintained_decayed_store_matches_direct(spark, sf_dir, tmpdir):
    """decayed counters, the fifth store family member: N
    micro-batches through the SAME foreachBatch maintainer
    (partials keyed on the _db day bucket, sum-fold) == fresh
    per-day partials on n_events exactly and on de/dv within double
    summation-order noise; the rescale fold over the maintained
    store answers within the ROUND(4) surface of the direct
    decayed_counts build."""
    import datetime as dt

    from openset_spark.operators.events import (
        decayed_counts,
        decayed_fold,
        decayed_from_partials,
        decayed_partials,
    )

    src = os.path.join(tmpdir, "events")
    os.makedirs(src)
    _spill_events(spark, sf_dir, src)
    store = os.path.join(tmpdir, "store_decayed")
    fn = sliding_store_maintainer(
        store,
        lambda df: decayed_partials(df, half_life_days=7.0),
        decayed_fold,
        "_db",
    )
    q = (
        read_event_stream(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(fn)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_dc"))
        .start()
    )
    q.awaitTermination()

    maintained = spark.read.parquet(store).drop("_day")
    fresh = {
        (r.user_id, r._db): (r.n_events, r.de, r.dv)
        for r in decayed_partials(
            _batch_frame(spark, src), half_life_days=7.0
        ).collect()
    }
    got = {
        (r.user_id, r._db): (r.n_events, r.de, r.dv)
        for r in maintained.collect()
    }
    assert set(got) == set(fresh)
    for k in fresh:
        assert got[k][0] == fresh[k][0], k
        for i in (1, 2):
            assert abs(got[k][i] - fresh[k][i]) <= 1e-9 * (
                1.0 + abs(fresh[k][i])
            ), (k, i)

    at = dt.datetime(2024, 2, 1)
    want = {
        r.user_id: (r.n_events, r.decayed_events, r.decayed_value)
        for r in decayed_counts(
            _batch_frame(spark, src), at=at, half_life_days=7.0
        ).collect()
    }
    ans = {
        r.user_id: (r.n_events, r.decayed_events, r.decayed_value)
        for r in decayed_from_partials(
            maintained, at=at, half_life_days=7.0
        ).collect()
    }
    assert set(ans) == set(want)
    for u in want:
        assert ans[u][0] == want[u][0], u
        for i in (1, 2):
            assert abs(ans[u][i] - want[u][i]) <= 1e-3, (u, i)
