"""The engine facade — one object with the reference's query surface.

A user of the reference talks to REST endpoints per table; here the
same verbs are methods over a loaded table set:

    eng = OpenSetEngine(spark, "/data/sf")          # cluster: parquet root
    eng.event_query(group_by=["event_type"], ...)    # POST /query/{t}/event
    eng.segments([Segment(...), ...])                # POST /query/{t}/segment
    eng.property_counts("event_type", rx="^p")       # GET  /query/{t}/property/{p}
    eng.histogram(scalar_fn, bucket=50)              # POST /query/{t}/histogram
    eng.customer(7)                                  # GET  /query/{t}/customer
    eng.batch(BatchQuery(...))                       # POST /query/{t}/batch

Every method returns a DataFrame (lazy — compose, then act); nothing
collects driver-side. Sessionization honors the reference's
``session_time`` query parameter as ``session_gap_ms``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from openset_spark.operators.customer import customer_timeline
from openset_spark.operators.events import (
    event_aggregate,
    event_aggregate_rollup,
    matching_rows,
    user_scalar,
)
from openset_spark.operators.funnel import funnel
from openset_spark.operators.histogram import histogram, histogram_by
from openset_spark.operators.paths import top_paths, transition_matrix
from openset_spark.operators.property_counts import (
    property_counts,
    property_counts_by_segment,
)
from openset_spark.operators.retention import retention
from openset_spark.operators.segments import (
    Segment,
    membership,
    segment_counts,
    sequence_membership,
)
from openset_spark.operators.sessionize import with_session
from openset_spark.plans.batch import BatchQuery, run_batch
from openset_spark.sources.tables import TABLE_NAMES, load_table

DEFAULT_SESSION_GAP_MS = 30 * 60 * 1000


class OpenSetEngine:
    """Query surface over one events table (+ optional dims)."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        events_table: str = "events",
        session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
        event_order: Sequence[str] | None = None,
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.session_gap_ms = session_gap_ms
        # the table's declared z-order priority (catalog
        # TableDef.event_order, test/test_zorder.h): same-stamp rows
        # iterate in this order through every grid/session surface
        self.event_order = list(event_order) if event_order else None
        self._events = load_table(spark, sf_dir, events_table)
        self._segment_store = None

    # -- data access --------------------------------------------------
    @property
    def events(self) -> DataFrame:
        return self._events

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    # -- node health surface (GET /ping, GET /status —
    #    docs/rest/README.md:464-476, src/rpc_status.cpp) ------------
    def ping(self) -> dict:
        """The liveness probe, verbatim."""
        return {"pong": True}

    def status(self) -> dict:
        """The /status shape with Spark standing in for the
        sentinel's cluster bookkeeping: the reference reports
        partition balance / redundancy / failure tolerance because it
        IS the cluster manager; here those properties belong to Spark
        (executors + shuffle partitions + storage replication), so
        the same keys carry the Spark-level equivalents and the
        table list comes from the engine's source directory."""
        import os as _os

        sc = self.spark.sparkContext
        tables = [
            t
            for t in sorted(TABLE_NAMES)
            if _os.path.exists(
                _os.path.join(self.sf_dir, f"{t}.parquet")
            )
        ]
        return {
            "status": {
                "init": not sc._jsc.sc().isStopped(),
                "cluster_complete": True,  # Spark admits no partial quorum
                "redundancy": int(
                    self.spark.conf.get("spark.task.maxFailures", "4")
                ),
                "balanced": True,  # AQE rebalances at runtime
                "sentinel": sc.master,
                "tables": len(tables),
            },
            "partitions": {
                "count": int(
                    self.spark.conf.get("spark.sql.shuffle.partitions")
                ),
                "parallelism": sc.defaultParallelism,
            },
            "tables": tables,
        }

    def sessionized(self) -> DataFrame:
        """Events with the synthetic ``session`` property (the
        reference computes it on demand when a script references it)."""
        return with_session(
            self._events, self.session_gap_ms, event_order=self.event_order
        )

    # -- retention maintenance (src/oloop_cleaner.cpp analog) ---------
    def cull(
        self,
        now_ms: int | None = None,
        ttl_ms: int | None = 86_400_000 * 365 * 5,
        event_max: int | None = None,
    ) -> DataFrame:
        """The table's Grid::cull() policy as a VIEW over events: rows
        older than ``ttl_ms`` drop (pushed-down filter), and with
        ``event_max`` each user keeps only the newest N. ``now_ms``
        defaults to the table's max stamp so results are deterministic
        on static testdata (the reference uses wall-clock Now())."""
        from openset_spark.sources.tables import retention_filter

        if now_ms is None:
            now_ms = self._events.agg(
                F.unix_millis(F.max("ts"))
            ).first()[0]
        return retention_filter(
            self._events, now_ms, ttl_ms=ttl_ms, event_max=event_max
        )

    def maintain(
        self,
        path: str,
        now_ms: int,
        ttl_ms: int | None = 86_400_000 * 365 * 5,
        event_max: int | None = None,
        table: str | None = None,
    ) -> dict:
        """Run the stored-layout retention pass (the daily
        oloop_cleaner tick) over an events materialization at ``path``
        — flat parquet gets a filtered rewrite, a by-day partitioned
        layout gets whole expired days deleted as directories plus a
        targeted rewrite of cap-affected days, and with ``table`` set
        (a user-bucketed `write_bucketed` materialization) the whole
        pass runs shuffle-free per bucket. ``event_max`` enforces the
        reference's newest-N-per-person cap alongside the TTL
        (src/table.h:122-124 — the cleaner applies both). The path is
        explicit (never the engine's read-only source dir); see
        ``sources.tables.apply_retention`` for the layout rules."""
        from openset_spark.sources.tables import (
            apply_retention,
            apply_retention_bucketed,
        )

        if table is not None:
            return apply_retention_bucketed(
                self.spark, table, path, now_ms,
                ttl_ms=ttl_ms, event_max=event_max,
            )
        return apply_retention(
            self.spark, path, now_ms, ttl_ms=ttl_ms, event_max=event_max
        )

    # -- query endpoints ---------------------------------------------
    def event_query(
        self,
        group_by: Sequence[Column | str],
        aggs: Sequence[tuple[str, str, str]] = (),
        where: Column | None = None,
        rollup: bool = False,
        segments: Sequence[str] = (),
        **kw,
    ) -> DataFrame:
        fn = event_aggregate_rollup if rollup else event_aggregate
        return fn(self._scope(segments), group_by, aggs, where, **kw)

    def user_query(
        self,
        aggs: Sequence[tuple[str, str, str]],
        where: Column | None = None,
        segments: Sequence[str] = (),
    ) -> DataFrame:
        return user_scalar(self._scope(segments), aggs, where)

    def segments(self, segments: list[Segment]) -> DataFrame:
        return segment_counts(self._events, segments)

    # -- named segment store (the /counts endpoint's cached segments,
    #    docs/rest/README.md:260-270) ---------------------------------
    @property
    def segment_store(self):
        """Named segments with ttl/refresh/use_cached/on_insert/z_index
        policy; members are then usable via the ``segments=`` param of
        the other query methods."""
        if self._segment_store is None:
            from openset_spark.operators.segment_store import SegmentStore

            self._segment_store = SegmentStore(lambda: self._events)
        return self._segment_store

    def osl(
        self,
        script: str,
        column_map: dict[str, str] | None = None,
        customer_df: DataFrame | None = None,
        params: dict | None = None,
        debug: bool = False,
        cull: bool = False,
        **kw,
    ) -> DataFrame | str:
        """POST /query/{t}/events with an OSL script body: parse,
        compile against this table, return the aggregated result.
        ``customer_df`` (one row per user) exposes is_customer
        properties to the script. ``params`` mirrors the REST
        str_/int_/dbl_/bool_{var} query params. ``cull=True`` turns on
        the index-compiler people pre-pass (compiler.py culling notes).
        ``debug=True`` returns the query's "assembly" — here, the
        formatted physical plan — instead of results (the reference's
        ``debug=`` param). The table's declared z-order threads into
        the compiled plan automatically."""
        from openset_spark.osl import compile_osl

        q = compile_osl(
            script,
            column_map=column_map,
            customer_df=customer_df,
            params=params,
            event_order=self.event_order,
            cull=cull,
        )
        df = q.dataframe(self._events, **kw)
        if debug:
            jvm = df.sparkSession._jvm
            return jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        return df

    def script_runner(self, script: str, **kw):
        """The imperative-OSL surface (variables, containers, flow
        control, debug/return, customer-prop writes): a ScriptRunner
        bound to this table. ``.replay()`` is the bounded debug view,
        ``.frame()``/``.result_frame()`` the distributed results,
        ``.customer_updates()`` the write-back frame."""
        from openset_spark.osl.lang import ScriptRunner

        return ScriptRunner(script, **kw)

    def script_debug(self, script: str, **kw) -> list:
        """Replay a script against this table and return the debug
        log (the reference interpreter's debugLog())."""
        return self.script_runner(script, **kw).replay(self._events)

    def on_insert(
        self, script: str, customer_df: DataFrame, id_col: str = "id", **kw
    ) -> DataFrame:
        """The reference's ``on_insert`` customer-prop maintenance
        script (language_reference.md:102-117): run the script's
        aggregate assignments over this table's events and merge the
        write-back frame into ``customer_df``."""
        return self.script_runner(script, **kw).apply_customer_updates(
            customer_df, self._events, id_col=id_col
        )

    def counts_query(
        self, script: str, now_ms: int = 0, **kw
    ) -> DataFrame:
        """POST /query/{t}/counts with an OSL ``@segment`` script
        body: parse the sections, install them (with their policy
        params) into the segment store, and return (segment, people).
        The named segments are then usable via ``segments=`` on the
        other endpoints (docs/rest/README.md:245-300)."""
        from openset_spark.osl.compiler import compile_osl_segments

        segs = compile_osl_segments(script, **kw)
        segs.register(self.segment_store)
        return self.segment_store.counts(
            [d.name for d in segs.defs], now_ms=now_ms
        )

    def histogram_query(
        self,
        script: str,
        bucket: float = 1.0,
        min_value: float | None = None,
        max_value: float | None = None,
        now_ms: int | None = None,
        name: str = "value",
        segments: Sequence[str] = (),
    ) -> DataFrame:
        """POST /query/{t}/histogram/{name} with an OSL ``return(expr)``
        script body (docs/rest/README.md:339-357): the expression is
        the per-customer scalar; bucket/min/max/segments behave as the
        endpoint's query params (``segments=`` restricts the scored
        population to stored-segment members)."""
        from openset_spark.osl.compiler import compile_osl_histogram

        h = compile_osl_histogram(script)
        return h.histogram(
            self._scope(segments), bucket=bucket, min_value=min_value,
            max_value=max_value, name=name, now_ms=now_ms,
        )

    def _scope(
        self, segments: Sequence[str], now_ms: int = 0
    ) -> DataFrame:
        """Events restricted to members of ALL named segments (the
        reference's ``segments=`` query param). Membership frames are
        one row per user — the semi-join broadcasts under AQE instead
        of reshuffling the events table."""
        ev = self._events
        for name in segments:
            ev = ev.join(
                self.segment_store.users(name, now_ms), "user_id", "semi"
            )
        return ev

    def segment_membership(self, segments: list[Segment]) -> DataFrame:
        return membership(self._events, segments)

    def sequence_segments(
        self, sequences: dict[str, list[Column]], **kw
    ) -> DataFrame:
        return sequence_membership(self._events, sequences, **kw)

    def property_counts(
        self,
        prop: str,
        bucket: float | None = None,
        gt: float | None = None,
        gte: float | None = None,
        lt: float | None = None,
        lte: float | None = None,
        eq=None,
        between: tuple[float, float] | None = None,
        rx: str | None = None,
        sub: str | None = None,
        segments: list[Segment] | list[str] | None = None,
        order: str = "desc",
        trim: int | None = None,
    ) -> DataFrame:
        """The property endpoint's filter params, verbatim
        (docs/rest/README.md:304-316): gt/gte/lt/lte/eq, between+and
        (half-open: >= lo and < hi), rx, sub, bucket, plus the
        order=asc|desc and trim=# result-shaping params (sorted by
        people count; trim keeps the top/bottom # values)."""
        col = F.col(prop)
        flt: Column | None = None
        for cond in (
            col > gt if gt is not None else None,
            col >= gte if gte is not None else None,
            col < lt if lt is not None else None,
            col <= lte if lte is not None else None,
            col == eq if eq is not None else None,
            (col >= between[0]) & (col < between[1]) if between is not None else None,
            col.rlike(rx) if rx is not None else None,
            col.contains(sub) if sub is not None else None,
        ):
            if cond is not None:
                flt = cond if flt is None else (flt & cond)
        if segments:
            # compare mode: ad-hoc Segment objects, or NAMES of stored
            # segments (the REST ``segments=`` param names cached ones)
            if all(isinstance(s, str) for s in segments):
                names = list(segments)
                m = self.segment_store.membership(names)
            else:
                names = [s.name for s in segments]
                m = membership(self._events, segments)
            df = self._events if flt is None else self._events.filter(flt)
            out = property_counts_by_segment(df, prop, m, names, bucket=bucket)
        else:
            out = property_counts(
                self._events, prop, bucket=bucket, value_filter=flt
            )
        if trim is not None:
            # top-N by people under the requested order — a single
            # TakeOrderedAndProject, no full result sort at scale.
            by = F.asc("people") if order == "asc" else F.desc("people")
            return out.orderBy(by, F.asc("value")).limit(trim)
        return out

    def histogram(
        self,
        scalar: Callable[[DataFrame], DataFrame],
        bucket: float = 1.0,
        min_value: float | None = None,
        max_value: float | None = None,
        foreach: str | None = None,
        name: str = "value",
    ) -> DataFrame:
        per_user = scalar(self._events)
        if foreach is not None:
            if min_value is not None:
                raise ValueError(
                    "min= zero-fill is not supported with foreach= "
                    "(per-group fill bounds are ambiguous); fill the "
                    "groups downstream or drop min_value"
                )
            value_col = [
                c for c in per_user.columns if c not in ("user_id", foreach)
            ][0]
            return histogram_by(
                per_user, value_col, foreach, bucket, max_value, name=name
            )
        value_col = [c for c in per_user.columns if c != "user_id"][0]
        return histogram(per_user, value_col, bucket, min_value, max_value, name=name)

    def customer(self, user_id, with_sessions: bool = False) -> DataFrame:
        src = self.sessionized() if with_sessions else self._events
        return customer_timeline(src, user_id)

    def batch(self, batch: BatchQuery) -> dict[str, DataFrame]:
        return run_batch(self._events, batch)

    def batch_osl(
        self, script: str, now_ms: int | None = None, **kw
    ) -> dict[str, DataFrame]:
        """POST /query/{t}/batch with the endpoint's combined OSL
        document (docs/rest/README.md:379-418): @segment sections,
        @use, @property lines, @histogram return() bodies — one cached
        scan, shared membership, k tiny aggregates."""
        from openset_spark.osl import compile_osl_batch

        return compile_osl_batch(script, **kw).run(self._events, now_ms)

    # -- behavioral reports ------------------------------------------
    def funnel(
        self, steps: Sequence[Column], segments: Sequence[str] = (), **kw
    ) -> DataFrame:
        return funnel(self._scope(segments), steps, **kw)

    def retention(self, period: str = "week") -> DataFrame:
        return retention(self._events, period)

    def transitions(self, **kw) -> DataFrame:
        return transition_matrix(self._events, **kw)

    def paths(self, max_steps: int = 3, n: int = 10, **kw) -> DataFrame:
        return top_paths(self._events, max_steps, n, **kw)

    def first_matching(
        self, where: Column | None = None, limit: int = 1, reverse: bool = False
    ) -> DataFrame:
        return matching_rows(
            self._events, where, limit, reverse, event_order=self.event_order
        )

    def next_baskets(self, **kw) -> DataFrame:
        from openset_spark.operators.paths import next_session_transitions

        return next_session_transitions(
            self._events, gap_ms=self.session_gap_ms, **kw
        )

    def quantiles(
        self,
        scalar: Callable[[DataFrame], DataFrame],
        probs: list[float] = (0.5, 0.9, 0.99),
        approx: bool = False,
    ) -> DataFrame:
        from openset_spark.operators.histogram import quantiles

        per_user = scalar(self._events)
        value_col = [c for c in per_user.columns if c != "user_id"][0]
        return quantiles(per_user, value_col, list(probs), approx)

    def result_tree(
        self,
        group_by: list[str],
        aggs: Sequence[tuple[str, str, str]] = (),
        where: Column | None = None,
    ) -> dict:
        """Reference-format nested response ({"g","c","_"} nodes) for
        an event query — rollup + driver-side reassembly."""
        from openset_spark.plans.result_tree import to_result_tree

        roll = event_aggregate_rollup(self._events, group_by, aggs, where)
        agg_cols = ["people"] + [alias for _, _, alias in aggs]
        return to_result_tree(roll, group_by, agg_cols)

    # -- sketch surface (r11): bounded-state approximate analytics --

    def approx_people(
        self, group_by: list[str] | None = None, p: int = 10
    ) -> DataFrame:
        """Approximate distinct users (per group) via the portable
        HLL — deterministic under any partitioning, fold-exact
        partials (pipeline/hll.py)."""
        from openset_spark.pipeline.hll import approx_distinct

        return approx_distinct(
            self._events, "user_id", tuple(group_by or ()), p
        )

    def segment_overlap(
        self, a: Column, b: Column, k: int = 512
    ) -> DataFrame:
        """Direct Jaccard + intersection estimate between two event
        predicates' user sets (KMV joint sample — accurate even for
        small overlaps of large audiences; pipeline/kmv.py)."""
        from openset_spark.pipeline.kmv import kmv_jaccard, kmv_partials

        # materialize the <= k-row sketches: kmv_jaccard references
        # each sketch from three subtrees, which would otherwise
        # re-scan the events table ~3x per side
        sa = kmv_partials(
            self._events.filter(a), "user_id", (), k
        ).localCheckpoint()
        sb = kmv_partials(
            self._events.filter(b), "user_id", (), k
        ).localCheckpoint()
        return kmv_jaccard(sa, sb, k)

    def approx_quantiles(
        self,
        col: str,
        qs: tuple[float, ...] = (0.5, 0.95, 0.99),
        group_by: list[str] | None = None,
        sub_bits: int = 5,
    ) -> DataFrame:
        """Grouped quantiles of a non-negative integer column with
        bounded state (log-linear sketch, pipeline/hdrhist.py)."""
        from openset_spark.pipeline.hdrhist import approx_quantiles

        return approx_quantiles(
            self._events, col, qs, tuple(group_by or ()), sub_bits
        )

    def heavy_hitters(
        self,
        col: str,
        threshold: int,
        depth: int = 4,
        width: int = 2048,
    ) -> DataFrame:
        """Items of ``col`` whose estimated frequency reaches
        ``threshold`` — CMS one-sided screen, no true heavy hitter
        ever missed (pipeline/cms.py)."""
        from openset_spark.pipeline.cms import cms_heavy_hitters

        return cms_heavy_hitters(
            self._events, col, threshold, depth, width
        )

    def segment_overlap_matrix(
        self, segments: dict[str, "Column"], k: int = 512
    ) -> DataFrame:
        """All-pairs audience overlap between named event predicates
        -> (key_a, key_b, jaccard, approx_intersection) — the
        heatmap behind segment dashboards, from <= k-row KMV
        sketches per segment (pipeline/kmv.py)."""
        from openset_spark.pipeline.kmv import (
            kmv_overlap_matrix,
            kmv_partials,
        )

        if not segments:
            raise ValueError("segments must be non-empty")
        # ONE events scan builds every sketch: tag each row with the
        # segments its predicate matches (posexplode of a when-array,
        # nulls dropped), then a single grouped kmv_partials
        tags = F.array(
            *[
                F.when(pred, F.lit(name))
                for name, pred in segments.items()
            ]
        )
        tagged = (
            self._events.select(
                F.col("user_id"), F.explode(tags).alias("segment")
            )
            .filter(F.col("segment").isNotNull())
        )
        sketches = kmv_partials(
            tagged, "user_id", ("segment",), k
        ).localCheckpoint()
        # keys= keeps pairs involving EMPTY segments in the output
        return kmv_overlap_matrix(
            sketches, "segment", k, keys=list(segments)
        )

    def build_actives_store(
        self, path: str, slide: str = "hour", p: int = 10
    ) -> None:
        """Persist the per-slide HLL register partials behind
        sliding_actives as a day-partitioned store (one raw scan;
        pipeline/sliding.py::write_sliding_partials). A deployment
        keeps it live with sliding_store_maintainer on the event
        stream; sliding_actives(store=...) then answers any trailing
        window without touching raw events."""
        from openset_spark.pipeline.hll import hll_partials
        from openset_spark.pipeline.sliding import write_sliding_partials

        parts = hll_partials(
            self._events.withColumn(
                "_b", F.date_trunc(slide, F.col("ts"))
            ),
            "user_id",
            ("_b",),
            p,
        )
        write_sliding_partials(parts, path, "_b")

    def sliding_actives(
        self,
        slide: str = "hour",
        window: int = 24,
        p: int = 10,
        store: str | None = None,
        upto=None,
    ) -> DataFrame:
        """Trailing-window distinct users at every slide point (the
        live 24h-actives series) — range-framed register fold over a
        dense time spine; equal to re-sketching each window from
        scratch (pipeline/hll.py::hll_sliding_distinct).

        With ``store=`` (a build_actives_store path) and ``upto=``
        (the evaluation timestamp), the answer comes from a
        PartitionFilter-pruned read of the persisted partials —
        ceil(window_span/1day)+1 day directories, never raw events —
        and is the ONE row whose window ends at ``upto``."""
        from openset_spark.pipeline.hll import (
            hll_sliding_distinct,
            hll_sliding_from_partials,
        )

        if store is not None:
            if upto is None:
                raise ValueError("store= requires upto= (window end)")
            from openset_spark.pipeline.sliding import (
                check_upto,
                read_sliding_partials,
            )

            # a misaligned upto can never equal any bucket — raise
            # instead of silently returning zero rows; extend_to
            # stretches the fold spine through upto so a quiet final
            # slide still yields the trailing-window answer from
            # earlier partials (ADVICE r13 #1)
            upto = check_upto(upto, slide)
            pruned = read_sliding_partials(
                self._events.sparkSession, store, "_b", upto, slide,
                window,
            )
            return hll_sliding_from_partials(
                pruned, slide, window, p, extend_to=upto
            ).filter(F.col("bucket") == F.lit(upto))
        return hll_sliding_distinct(
            self._events, "user_id", "ts", slide, window, p
        )

    def rollup_rates(
        self,
        col: str,
        probes: "DataFrame",
        granularities: tuple[str, ...] = ("day", "hour"),
        depth: int = 4,
        width: int = 2048,
    ) -> DataFrame:
        """Watched-item frequencies at every granularity of a time
        hierarchy from ONE finest-grain grid shuffle (one-sided CMS
        law at every level; pipeline/cms.py::cms_time_rollup_estimate)."""
        from openset_spark.pipeline.cms import cms_time_rollup_estimate

        return cms_time_rollup_estimate(
            self._events, col, probes, granularities, "ts", depth, width
        )

    def sliding_counts(
        self,
        where: Column | None = None,
        slide: str = "hour",
        window: int = 24,
    ) -> DataFrame:
        """Trailing-window EVENT COUNTS at every slide point (the
        exact member of the sliding family — counts fold by plain
        sum, no sketch needed): one per-slide aggregate, then a
        range-framed sum over the dense min..max spine, so gap
        hours emit their non-empty trailing totals like the sketch
        siblings. Output: (bucket, n)."""
        from pyspark.sql.window import Window as W

        from openset_spark.pipeline.sliding import check_slide, dense_spine

        sec = check_slide(slide, window)
        ev = self._events if where is None else self._events.filter(where)
        parts = (
            ev.withColumn("_tb", F.date_trunc(slide, F.col("ts")))
            .groupBy("_tb")
            .agg(F.count(F.lit(1)).alias("_n"))
            .localCheckpoint()  # bounded: one row per slide bucket
        )
        dense = dense_spine(parts, "_tb", slide).join(parts, "_tb", "left")
        tidx = (F.unix_timestamp(F.col("_tb")) / sec).cast("long")
        w = W.orderBy(tidx).rangeBetween(-(window - 1), 0)
        return dense.select(
            F.col("_tb").alias("bucket"),
            F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("n"),
        )

    def sliding_rates(
        self,
        col: str,
        probes: "DataFrame",
        slide: str = "hour",
        window: int = 24,
        depth: int = 4,
        width: int = 2048,
    ) -> DataFrame:
        """Trailing-window event rates for a watched probe set at
        every slide point (the live rate/abuse monitor) — grids
        compose by sum; only the probes' own cells ride the fold
        (pipeline/cms.py::cms_sliding_estimate)."""
        from openset_spark.pipeline.cms import cms_sliding_estimate

        return cms_sliding_estimate(
            self._events, col, probes, "ts", slide, window, depth, width
        )

    def sliding_quantiles(
        self,
        col: str,
        slide: str = "hour",
        window: int = 24,
        qs: tuple[float, ...] = (0.5, 0.95),
        sub_bits: int = 5,
    ) -> DataFrame:
        """Trailing-window quantiles of a non-negative integer
        column at every slide point (the live p95 series) — bucket
        counts compose by sum, so the trailing fold re-reads only
        bounded partials (pipeline/hdrhist.py::hdr_sliding_quantiles)."""
        from openset_spark.pipeline.hdrhist import hdr_sliding_quantiles

        return hdr_sliding_quantiles(
            self._events, col, "ts", slide, window, qs, sub_bits
        )
