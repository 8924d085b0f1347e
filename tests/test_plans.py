"""Physical-plan invariants — the scale posture of SURVEY §4/§6,
asserted mechanically so a regression that adds a shuffle, drops a
broadcast, loses filter pushdown, or sneaks a Python UDF into a hot
path fails CI rather than an eventual 100 TB run.

`local[k]` executes the same physical plans a 1000-executor cluster
would (modulo AQE runtime re-plans), so Exchange/BroadcastHashJoin/
PushedFilters in the explain output are faithful scale signals."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from openset_spark.operators.funnel import funnel
from openset_spark.operators.sessionize import session_stats, with_session
from openset_spark.pipeline.dedup import minhash_candidates
from openset_spark.sources.tables import load_table


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def user_exchanges(df) -> int:
    """Count shuffles keyed by user_id (hashpartitioning exchanges);
    simple mode prints `Exchange hashpartitioning(user_id...)` on one
    line per exchange node."""
    return len(
        re.findall(
            r"Exchange hashpartitioning\(user_id", plan_str(df, "simple")
        )
    )


def test_sessionize_chain_shuffles_once_by_user(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    df = session_stats(with_session(ev))
    # window(user) then groupBy(user, session) must share ONE exchange;
    # only the final global stats row may add a SinglePartition one.
    assert user_exchanges(df) == 1, plan_str(df, "simple")


def test_funnel_shuffles_once_by_user(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    steps = [F.col("event_type") == s for s in ("signup", "click", "purchase")]
    df = funnel(ev, steps)
    assert user_exchanges(df) == 1, plan_str(df, "simple")


def test_dim_join_broadcasts(spark, sf_dir):
    import __spark_entry__ as entry

    plan = plan_str(entry.q_events_with_user_dim(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q3_broadcasts_customer_dim(spark, sf_dir):
    import __spark_entry__ as entry

    plan = plan_str(entry.q_tpch_q3(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 24)
        .select("l_orderkey", "l_quantity")
    )
    plan = plan_str(li)
    assert "PushedFilters: [" in plan and "LessThan(l_quantity,24" in plan, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_orderkey",
        "l_quantity",
    }, plan


def test_no_python_udfs_on_hot_paths(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    hot = [
        session_stats(with_session(ev)),
        funnel(ev, [F.col("event_type") == "signup"]),
        minhash_candidates(docs),
    ]
    for df in hot:
        plan = plan_str(df)
        assert "EvalPython" not in plan, plan  # Batch/ArrowEvalPython


def test_ann_scale_paths_avoid_cross_join(spark, sf_dir):
    """The LSH and IVF ANN operators must form candidates by a hash
    join on a bucket key — never an all-pairs product. Only the
    brute-force oracle baseline is allowed to nested-loop. (The entry
    wrappers q_ann_lsh/q_ann_ivf embed that oracle in-plan since r5
    for the driver's recall gate, so assert on the raw operators.)"""
    from openset_spark.pipeline.similarity import ivf_topk, lsh_topk

    embs = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qs = embs.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for df in (
        lsh_topk(embs, qs, dim=64, k=10, n_planes=3, n_tables=12),
        ivf_topk(embs, qs, k=10, n_lists=16, nprobe=12),
    ):
        plan = plan_str(df, "simple")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_whole_stage_codegen_covers_event_agg(spark, sf_dir):
    from openset_spark.operators.events import event_aggregate

    ev = load_table(spark, sf_dir, "events")
    out = event_aggregate(ev, ["event_type"], [("sum", "value", "v")])
    # AQE finalizes codegen stages only at execution: run the query,
    # then assert the final plan ran the agg inside WholeStageCodegen
    # (`*(n)` markers), not interpreted.
    out.collect()  # count() would build a separate QueryExecution
    plan = plan_str(out, "simple")
    assert "isFinalPlan=true" in plan, plan
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan


def test_approx_people_swaps_hll(spark, sf_dir):
    from openset_spark.operators.events import event_aggregate

    ev = load_table(spark, sf_dir, "events")
    exact = event_aggregate(ev, ["event_type"]).collect()
    approx = event_aggregate(ev, ["event_type"], approx_people=True)
    assert "approx_count_distinct" in plan_str(approx, "simple")
    got = {r.event_type: r.people for r in approx.collect()}
    for r in exact:
        assert abs(got[r.event_type] - r.people) <= max(2, 0.05 * r.people)


def test_top_n_per_group_uses_window_group_limit(spark, sf_dir):
    from openset_spark.operators.shaping import top_n_per_group

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("events"))
    out = top_n_per_group(daily, ["event_type"], [F.desc("events")], 2)
    # rank<=n must push into the window as a group limit (partitions
    # stream top-n instead of fully sorting every group).
    assert "WindowGroupLimit" in plan_str(out, "simple")


def test_bucketed_events_skip_user_shuffle(spark, sf_dir, tmp_path_factory):
    from openset_spark.sources.tables import write_bucketed

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path_factory.mktemp("bucketed")) + "/events_b"
    write_bucketed(ev, "events_bucketed_test", path, buckets=8)
    try:
        b = spark.table("events_bucketed_test")
        agg = b.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        # bucketed layout: the per-user aggregate needs NO exchange
        assert user_exchanges(agg) == 0, plan_str(agg, "simple")
        # unbucketed baseline for contrast
        plain = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        assert user_exchanges(plain) == 1
        assert agg.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS events_bucketed_test")


def test_partitioned_events_prune_date_ranges(spark, sf_dir, tmp_path_factory):
    from openset_spark.sources.tables import write_partitioned_by_day

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path_factory.mktemp("parted")) + "/events_p"
    write_partitioned_by_day(ev, path)
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == "2024-01-03")
    plan = plan_str(one_day)
    # the date predicate must prune partitions at plan time, not scan+filter
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    n_total = back.count()
    n_day = one_day.count()
    assert 0 < n_day < n_total


def test_osl_compiled_plans_keep_scale_invariants(spark, sf_dir):
    """Scripts through the OSL front-end must compile to the same
    plans the hand-built operators produce: one user-keyed exchange
    for per-user semantics, no Python eval anywhere."""
    import __spark_entry__ as entry

    ev = load_table(spark, sf_dir, "events")
    from openset_spark.osl import compile_osl, compile_osl_segments

    # ever/never where-clause: window booleans share ONE user exchange
    q = compile_osl(
        'each_row where event.is(== "purchase") && event.ever(== "signup")\n'
        "  << event\nend"
    )
    df = q.dataframe(ev)
    assert user_exchanges(df) == 1, plan_str(df, "simple")
    assert "EvalPython" not in plan_str(df)

    # @segment script: N segments -> ONE user-keyed aggregation
    segs = compile_osl_segments(entry._OSL_SEGMENT_SCRIPT)
    m = segs.membership(ev)
    assert user_exchanges(m) == 1, plan_str(m, "simple")
    assert "EvalPython" not in plan_str(m)


def test_segment_scope_broadcasts_membership(spark, sf_dir):
    """`segments=` scoping is a semi-join against a per-user membership
    frame; the big events side must NOT be re-shuffled for it (the
    small side broadcasts under AQE)."""
    from openset_spark.engine import OpenSetEngine
    from openset_spark.operators.segments import Segment

    eng = OpenSetEngine(spark, sf_dir)
    eng.segment_store.define(
        Segment("buyers", F.col("event_type") == "purchase")
    )
    out = eng.event_query(["event_type"], segments=["buyers"])
    out.collect()  # let AQE finalize join strategies
    plan = plan_str(out, "simple")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_osl_script_queries_single_user_exchange(spark, sf_dir):
    # simple (mod-free, window-free) OSL scans fold counters, return
    # sites and customer-prop writes into ONE shared per-user
    # aggregate: exactly one hashpartitioning(user_id) exchange, no
    # join against a separate matched frame.
    import __spark_entry__ as entry

    for name in (
        "osl_script_counter",
        "osl_customer_write",
        "osl_return_first",
    ):
        df = entry.queries()[name](spark, sf_dir)
        assert user_exchanges(df) == 1, (name, plan_str(df, "simple"))


def test_result_tree_trim_clips_branches_keeps_totals(spark, sf_dir):
    from openset_spark.operators.events import event_aggregate_rollup
    from openset_spark.plans.result_tree import to_result_tree

    ev = load_table(spark, sf_dir, "events")
    roll = event_aggregate_rollup(
        ev, group_by=["event_type"], aggs=[("count", "event_id", "n")]
    )
    full = to_result_tree(roll, ["event_type"], ["people", "n"])
    trimmed = to_result_tree(roll, ["event_type"], ["people", "n"], trim=2)
    assert len(trimmed["_"]) == 2 and len(full["_"]) > 2
    # the root subtotal keeps the FULL branch totals after trimming
    assert trimmed["c"] == full["c"]
    # the survivors are the top-2 branches by people count
    top2 = sorted((n["c"][0] for n in full["_"]), reverse=True)[:2]
    assert sorted((n["c"][0] for n in trimmed["_"]), reverse=True) == top2


def test_every_query_plan_is_scale_clean(spark, sf_dir):
    # the whole driver surface: no cartesian products (the brute-force
    # oracle is broadcast-nested-loop by design, still not cartesian)
    # and no row-at-a-time Python UDFs anywhere
    import __spark_entry__ as entry

    offenders = []
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            offenders.append((name, "row-python UDF"))
    assert not offenders, offenders


def test_salting_adds_exactly_one_exchange(spark, sf_dir):
    """user_scalar_salted = the unsalted plan + exactly ONE extra
    user-keyed exchange (the (user, salt) partial stage)."""
    from openset_spark.operators.events import user_scalar, user_scalar_salted

    ev = load_table(spark, sf_dir, "events")
    aggs = [("sum", "value", "total"), ("count", "event_id", "n")]
    plain = user_exchanges(user_scalar(ev, aggs))
    salted = user_exchanges(user_scalar_salted(ev, aggs, salt_buckets=8))
    assert (plain, salted) == (1, 2), (plain, salted)


def test_first_row_salted_is_aggregate_not_window(spark, sf_dir):
    """The skew-safe first-row form must plan as AGGREGATES — no
    Window over whole user timelines. Struct min plans as
    SortAggregate: the sorts are per input partition (uniform work),
    the map-side partial min collapses the hot user to one row per
    split BEFORE each shuffle, and the two exchanges are the salted
    (user, salt) stage + the user re-agg — the one-extra-exchange
    trade salting makes."""
    from openset_spark.operators.events import user_first_row_salted

    df = user_first_row_salted(load_table(spark, sf_dir, "events"))
    plan = plan_str(df, "simple")
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan  # map-side combine present
    assert user_exchanges(df) == 2, plan


def test_culled_funnel_semijoins_before_window(spark, sf_dir):
    """cull=True must plan the candidate-user pre-pass as a (semi)
    hash join feeding the single user-keyed window exchange — people
    pruning in the plan, the reference's index bits made visible."""
    from openset_spark.operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events")
    steps = [F.col("event_type") == "signup", F.col("event_type") == "purchase"]
    plan = plan_str(funnel(ev, steps, cull=True), "simple")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bucketed_corpus_diff_is_zero_exchange(spark, sf_dir, tmp_path_factory):
    """corpus_diff's scale claim, proven: two snapshot tables bucketed
    by doc_id full-outer-join with NO exchange on either side, while
    the plain-parquet baseline shuffles both."""
    from openset_spark.pipeline.compose import corpus_diff
    from openset_spark.sources.tables import write_bucketed

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = str(tmp_path_factory.mktemp("snaps"))
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 11 != 0)
    write_bucketed(
        old, "corpus_snap_old", base + "/old",
        bucket_col="doc_id", buckets=8, sort_col=None,
    )
    write_bucketed(
        new, "corpus_snap_new", base + "/new",
        bucket_col="doc_id", buckets=8, sort_col=None,
    )
    try:
        diff_b = corpus_diff(
            spark.table("corpus_snap_old"), spark.table("corpus_snap_new")
        )
        plan = plan_str(diff_b, "simple")
        assert "Exchange hashpartitioning(doc_id" not in plan, plan
        # unbucketed baseline shuffles both sides
        diff_p = corpus_diff(old, new)
        assert (
            len(re.findall(
                r"Exchange hashpartitioning\(doc_id",
                plan_str(diff_p, "simple"),
            )) == 2
        )
        # and the results are identical
        a = sorted(diff_b.collect())
        b = sorted(diff_p.collect())
        assert a == b and len(a) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_snap_old")
        spark.sql("DROP TABLE IF EXISTS corpus_snap_new")


def test_time_rollup_expand_carries_exactly_m_projections(spark, sf_dir):
    """time_rollup's GROUPING SETS rewrite (r11): the Expand node must
    emit exactly one projection per requested granularity — the old
    rollup-then-filter shape paid for g+1 extra levels (grand total +
    dims-rolled-away) that the _gid filter immediately discarded."""
    from openset_spark.operators.events import time_rollup

    ev = load_table(spark, sf_dir, "events")
    for grans in [("day", "hour", "minute"), ("day", "hour")]:
        out = time_rollup(ev, granularities=grans)
        plan = out._jdf.queryExecution().optimizedPlan()
        expands = []

        def walk(node):
            if node.nodeName() == "Expand":
                expands.append(node)
            for i in range(node.children().size()):
                walk(node.children().apply(i))

        walk(plan)
        assert len(expands) == 1, plan.toString()
        nproj = expands[0].projections().size()
        assert nproj == len(grans), (
            f"Expand carries {nproj} projections for {len(grans)} "
            f"granularities:\n{plan.toString()}"
        )


def test_time_rollup_rejects_misordered_granularities(spark):
    from openset_spark.operators.events import time_rollup

    df = spark.range(1).withColumn("ts", F.current_timestamp())
    with pytest.raises(ValueError, match="coarsest to finest"):
        time_rollup(df, granularities=("minute", "hour", "day"), group_by=())
    with pytest.raises(ValueError, match="unknown"):
        time_rollup(df, granularities=("day", "fortnight"), group_by=())


def test_asof_nearest_is_one_shuffle_two_sorts(spark, sf_dir):
    """direction="nearest" computes BOTH running carries on one key
    exchange: the plan must show exactly one user_id hash exchange
    (AQE-independent: counted on the pre-execution physical plan)
    and two Window nodes, never a second shuffle or a range join."""
    from openset_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(left, right, direction="nearest")
    plan = plan_str(out, "simple")
    # key-ONLY exchanges (the windows); the right-side (user_id, ts)
    # snapshot-dedup aggregate keys on both columns and doesn't count
    assert len(
        re.findall(r"Exchange hashpartitioning\(user_id#\d+L?, \d+\)", plan)
    ) == 1, plan
    assert len(re.findall(r"\bWindow\b", plan)) == 2, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_is_single_hash_join_no_distinct(
    spark, sf_dir
):
    """The anchor-bucket emission needs no dedup: one SortMergeJoin/
    ShuffledHashJoin on (key, bucket), zero HashAggregate-for-distinct
    above it, and never a nested loop."""
    from openset_spark.operators.asof import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("l_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 15 MINUTES")).alias("valid_from"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("valid_to"),
    )
    out = interval_overlap_join(left, right)
    plan = plan_str(out, "simple")
    joins = re.findall(
        r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan
    )
    assert len(joins) == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # no distinct/aggregate above the join — emission is unique by
    # construction
    assert "HashAggregate" not in plan, plan


def test_interval_join_left_is_single_outer_join(spark, sf_dir):
    """The r11 single-pass left path: the containment predicate rides
    the (key, bucket) equi-join as a residual condition — one
    SortMergeJoin/ShuffledHashJoin LeftOuter, each input scanned
    once, never a nested loop and no union of a second anti pass."""
    from openset_spark.operators.asof import interval_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("valid_to"),
    )
    out = interval_join(left, right, how="left")
    plan = plan_str(out, "simple")
    joins = re.findall(
        r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan
    )
    assert len(joins) == 1, plan
    assert "LeftOuter" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Union" not in plan, plan


def test_nb_scoring_join_broadcasts_model(spark, sf_dir):
    """The NB weight frame is vocabulary-bounded — after AQE sizes
    it, the scoring join must run as a broadcast, not a shuffle of
    the exploded token table."""
    from openset_spark.pipeline.classify import nb_quality_scores

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    ref = F.col("source").isin("src0", "src1")
    out = nb_quality_scores(docs, docs.filter(ref), docs.filter(~ref))
    out.collect()  # let AQE finalize
    plan = plan_str(out, "simple")
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan, plan


def test_time_rollup_distinct_expands_registers_not_rows(spark, sf_dir):
    """The grouping-sets Expand must sit ABOVE the finest register
    aggregate (which touches the raw rows exactly once) — the xN
    level amplification applies to <= m rows per finest group, never
    to the event scan."""
    from openset_spark.pipeline.hll import time_rollup_distinct

    ev = load_table(spark, sf_dir, "events")
    out = time_rollup_distinct(ev, ("day", "hour"))
    plan = out._jdf.queryExecution().optimizedPlan()
    found = []

    def walk(node, under_expand):
        name = node.nodeName()
        if name == "Expand":
            under_expand = True
        if under_expand and name == "Aggregate":
            found.append("agg_under_expand")
        for i in range(node.children().size()):
            walk(node.children().apply(i), under_expand)

    walk(plan, False)
    # the finest register aggregate must appear BELOW the Expand
    assert "agg_under_expand" in found, plan.toString()


def test_bloom_prune_filters_probe_before_any_exchange(spark, sf_dir):
    """The bloom prune (xxhash64 bit tests against the broadcast
    bitmap) must execute on the probe BELOW the exact semijoin and
    below any probe-side shuffle — the rows it rejects are exactly
    the shuffle the filter saves. PushLeftSemiThroughJoin would
    happily reorder the semijoin under the bloom (un-pruning the
    probe); bloom_semijoin pins the order with a marker-entangled
    residual conjunct, and this test keeps it pinned."""
    from openset_spark.pipeline.bloom import bloom_filter, bloom_semijoin, bloom_words

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    out = bloom_semijoin(li, urgent, on="l_orderkey", build_col="o_orderkey")
    phys = out._jdf.queryExecution().executedPlan().toString()
    lines = phys.split("\n")
    semi = next(i for i, l in enumerate(lines) if "LeftSemi" in l)
    bloom = next(
        i for i, l in enumerate(lines) if "BroadcastNestedLoopJoin" in l
    )
    # tree order: the semijoin node prints ABOVE the bloom join =>
    # the bloom filters the probe BEFORE the semijoin consumes it
    assert semi < bloom, phys
    assert "SortMergeJoin" not in phys, phys
    # the pruned probe never shuffles on the key: the only exchanges
    # in the bare filter plan belong to the bitmap build
    pruned = bloom_filter(
        li, "l_orderkey", bloom_words(urgent, "o_orderkey")
    )
    pphys = pruned._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(l_orderkey" not in pphys, pphys


def test_time_rollup_quantiles_expands_buckets_not_rows(spark, sf_dir):
    """The grouping-sets Expand must sit ABOVE the finest bucket
    aggregate (which touches the raw rows exactly once) — the xN
    level amplification applies to <= 64*s + 1 rows per finest
    group, never to the event scan (the hll rollup posture)."""
    from openset_spark.pipeline.hdrhist import time_rollup_quantiles

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100 + 0.5).cast("long")
    )
    out = time_rollup_quantiles(ev, ("day", "hour"), col="cents")
    plan = out._jdf.queryExecution().optimizedPlan()
    found = []

    def walk(node, under_expand):
        name = node.nodeName()
        if name == "Expand":
            under_expand = True
        if under_expand and name == "Aggregate":
            found.append("agg_under_expand")
        for i in range(node.children().size()):
            walk(node.children().apply(i), under_expand)

    walk(plan, False)
    assert "agg_under_expand" in found, plan.toString()


def test_sliding_folds_scan_raw_exactly_once(spark, sf_dir):
    """Both sliding folds reference their partial table from THREE
    subtrees (bounds agg, distinct regs/buckets, densify join) —
    without materialization Catalyst plans three separate raw scans
    (measured). The bounded partial table is localCheckpoint-pinned,
    so the final plan must contain ZERO parquet scans: the one raw
    pass already happened building the partials."""
    from openset_spark.pipeline.hdrhist import hdr_sliding_quantiles
    from openset_spark.pipeline.hll import hll_sliding_distinct

    ev = load_table(spark, sf_dir, "events")
    d = hll_sliding_distinct(ev, "user_id", "ts", "hour", 6)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan
    assert plan.count("Scan ExistingRDD") == 3, plan

    q = hdr_sliding_quantiles(
        ev.withColumn(
            "cents", F.floor(F.col("value") * 100 + 0.5).cast("long")
        ),
        "cents",
        window=6,
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan
    # >= 3: the quantile-rank walk adds a LocalTableScan of qs, and
    # exact node counts vary with AQE — the invariant is NO raw scan
    assert plan.count("Scan ExistingRDD") >= 3, plan

    from openset_spark.pipeline.cms import cms_sliding_estimate
    from openset_spark.pipeline.kmv import kmv_sliding_jaccard

    probes = ev.select("user_id").filter(
        F.col("user_id") % 7 == 0
    ).distinct()
    r = cms_sliding_estimate(ev, "user_id", probes, "ts", "hour", 6)
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan

    j = kmv_sliding_jaccard(
        ev,
        "user_id",
        F.col("event_type") == "view",
        F.col("event_type") == "purchase",
        window=6,
        k=32,
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan


def test_cms_rollup_scans_raw_exactly_once(spark, sf_dir):
    """cms_time_rollup_estimate references its leveled grid from TWO
    subtrees (the lev_keys distinct and the estimate join) — without
    materialization Catalyst plans two separate raw scans, doubling
    the dominant cost at scale (ADVICE r12). The bounded leveled
    table (<= depth x width rows per finest group) is
    localCheckpoint-pinned, so the final plan must contain ZERO
    parquet scans: the one raw pass already happened building it."""
    from openset_spark.pipeline.cms import cms_time_rollup_estimate

    ev = load_table(spark, sf_dir, "events")
    probes = (
        ev.select("user_id").filter(F.col("user_id") % 7 == 0).distinct()
    )
    out = cms_time_rollup_estimate(ev, "user_id", probes, ("day", "hour"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan
