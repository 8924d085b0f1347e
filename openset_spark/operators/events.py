"""The core event-query operator: the reference's ``select`` +
``each_row where`` + ``<<`` aggregator tree.

Reference semantics (src/queryinterpreter.cpp marshal_tally,
src/result.cpp): rows matching the ``where`` predicate are pushed into
an aggregator keyed by the grouping values; ``count id`` counts
DISTINCT customers per group node, ``count prop`` counts matching rows
with a non-null prop, ``sum/min/max/avg prop`` aggregate the prop over
matching rows.

Spark-first: a filter + groupBy — Catalyst pushes the filter to the
scan and does map-side partial aggregation; countDistinct(user) is the
only agg that forces a wider exchange, and can be swapped for
approx_count_distinct at interactive scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# `dcount` doubles as the reference's stamped-row count method
# (test/test_count_methods.h useStampedRowIds: rows sharing a stamp
# count once) — pass ("dcount", "ts", alias).
_AGG_FNS = {
    "count": F.count,
    "dcount": F.countDistinct,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
}

# date_trunc units accepted by time_rollup, coarse → fine; the rollup
# hierarchy only makes sense in that order (grouping_id level labels
# depend on it), so the precondition is validated, not assumed.
_GRANULARITY_RANK = {
    "year": 0,
    "quarter": 1,
    "month": 2,
    "week": 3,
    "day": 4,
    "hour": 5,
    "minute": 6,
    "second": 7,
}


def event_aggregate(
    df: DataFrame,
    group_by: Sequence[Column | str],
    aggs: Sequence[tuple[str, str, str]] = (),
    where: Column | None = None,
    user_col: str = "user_id",
    count_people: bool = True,
    people_alias: str = "people",
    approx_people: bool = False,
) -> DataFrame:
    """OSL event query as one declarative plan.

    ``aggs`` entries are ``(fn, column, alias)`` with fn in
    count/dcount/sum/min/max/avg. ``count_people`` adds the reference's
    implicit ``count id`` (distinct customers per group).
    ``approx_people=True`` swaps the exact distinct count for
    HyperLogLog++ (``approx_count_distinct``, default 5% rsd) — at
    trillion-row interactive scale the exact count's expand+double
    shuffle is the dominant cost and ±2% people counts are usually
    acceptable.
    """
    if where is not None:
        df = df.filter(where)
    exprs: list[Column] = []
    if count_people:
        people = (
            F.approx_count_distinct(user_col)
            if approx_people
            else F.countDistinct(user_col)
        )
        exprs.append(people.alias(people_alias))
    for fn, col, alias in aggs:
        exprs.append(_AGG_FNS[fn](col).alias(alias))
    return df.groupBy(*group_by).agg(*exprs)


def user_scalar(
    df: DataFrame,
    aggs: Sequence[tuple[str, str, str]],
    where: Column | None = None,
    user_col: str = "user_id",
) -> DataFrame:
    """OSL row-search aggregations (language_reference.md:767-803):
    per-customer ``sum/count/min/max/avg(expr) where ...`` — the scalar
    a script would assign to a variable, here one row per customer."""
    if where is not None:
        df = df.filter(where)
    exprs = [_AGG_FNS[fn](col).alias(alias) for fn, col, alias in aggs]
    return df.groupBy(user_col).agg(*exprs)


def event_aggregate_rollup(
    df: DataFrame,
    group_by: Sequence[Column | str],
    aggs: Sequence[tuple[str, str, str]] = (),
    where: Column | None = None,
    user_col: str = "user_id",
    count_people: bool = True,
    people_alias: str = "people",
    approx_people: bool = False,
) -> DataFrame:
    """Multi-level pivot totals in ONE pass: the reference's result
    tree carries per-node totals at every pivot depth; ``rollup``
    computes all prefix-grouping levels (a,b), (a), () in a single
    shuffle instead of one query per level. Same keyword surface as
    ``event_aggregate`` so callers can toggle rollup freely."""
    if where is not None:
        df = df.filter(where)
    exprs: list[Column] = []
    if count_people:
        people = (
            F.approx_count_distinct(user_col)
            if approx_people
            else F.countDistinct(user_col)
        )
        exprs.append(people.alias(people_alias))
    exprs += [_AGG_FNS[fn](col).alias(alias) for fn, col, alias in aggs]
    return df.rollup(*group_by).agg(*exprs)


def user_scalar_salted(
    df: DataFrame,
    aggs: Sequence[tuple[str, str, str]],
    where: Column | None = None,
    user_col: str = "user_id",
    salt_buckets: int = 16,
    salt_col: str = "event_id",
) -> DataFrame:
    """Skew-safe ``user_scalar`` for algebraic aggs (sum/count/min/max):
    aggregate by (user, salt) first — a bot with 10^8 events splits
    across ``salt_buckets`` tasks — then re-aggregate by user
    (operators/README.md strategy 2). Two small shuffles instead of
    one skewed one; results are identical for the supported aggs."""
    reagg = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    unsupported = [fn for fn, _, _ in aggs if fn not in reagg]
    if unsupported:
        raise ValueError(f"not algebraic under salting: {unsupported}")
    if where is not None:
        df = df.filter(where)
    salt = F.pmod(F.xxhash64(salt_col), F.lit(salt_buckets)).alias("_salt")
    partial = df.groupBy(user_col, salt).agg(
        *[_AGG_FNS[fn](col).alias(alias) for fn, col, alias in aggs]
    )
    return partial.groupBy(user_col).agg(
        *[_AGG_FNS[reagg[fn]](alias).alias(alias) for fn, _, alias in aggs]
    )


def user_first_row_salted(
    df: DataFrame,
    user_col: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    payload_cols: Sequence[str] | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe ``each_row.limit(1)``: the first row per user computed
    as an ALGEBRAIC aggregate — min of the (order, payload) struct per
    (user, salt), then re-min per user.

    This is where salting actually pays in Spark. For plain scalar
    aggs (``user_scalar``) map-side partial aggregation already
    neutralizes key skew, but the WINDOW form of first-row
    (``matching_rows``) must sort a user's whole timeline in ONE task
    — a bot owning 30% of a 100 TB day stalls the stage. Expressed as
    a min-struct the same result partial-aggregates map-side (the hot
    user collapses to one row per input split BEFORE the shuffle);
    the salt additionally bounds the (user, salt) group state if
    per-partition cardinality ever defeats map-side combine. Measured
    3x over the window form at 6M rows/30% hot (skew_bench.py).
    Results are identical to ``matching_rows(limit=1)`` for non-null
    order columns (struct comparison is lexicographic by field)."""
    payload = list(
        payload_cols
        if payload_cols is not None
        else [c for c in df.columns if c != user_col and c not in order_cols]
    )
    ordered = [*order_cols, *payload]
    struct = F.struct(*[F.col(c) for c in ordered])
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets)
    ).alias("_salt")
    partial = (
        df.select(F.col(user_col), salt, struct.alias("_ord"))
        .groupBy(user_col, "_salt")
        .agg(F.min("_ord").alias("_ord"))
    )
    top = partial.groupBy(user_col).agg(F.min("_ord").alias("_ord"))
    return top.select(user_col, "_ord.*")


def matching_rows(
    df: DataFrame,
    where: Column | None = None,
    limit: int = 1,
    reverse: bool = False,
    user_col: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    from_row: int = 0,
    event_order: Sequence[str] | None = None,
    event_col: str = "event_type",
) -> DataFrame:
    """OSL ``each_row.limit(n)`` / ``.reverse().limit(n)`` /
    ``.from(#)`` (docs/osl/language_reference.md:276-326): the first
    (or last) n rows per customer matching the predicate, tie-broken
    like the reference's z-ordered row grid — pass the table's
    declared ``event_order`` (test/test_zorder.h setup: same-stamp
    rows iterate in declared priority, then insertion id) to slot the
    priority key between the stamp and the row id; ``from_row`` skips
    that many rows of the timeline (pre-filter, 0-based) before
    matching starts.

    One window over the user partition — the filter runs BEFORE the
    rank so only matching rows are sorted (two window passes share the
    exchange when ``from_row`` is used); adds a ``match_n`` column
    (1-based match index in iteration order)."""
    keys = _grid_keys(order_cols, event_order, event_col)
    order = [k.desc() if reverse else k.asc() for k in keys]
    w = Window.partitionBy(user_col).orderBy(*order)
    if from_row:
        df = (
            df.withColumn("_cursor", F.row_number().over(w) - 1)
            .filter(F.col("_cursor") >= from_row)
            .drop("_cursor")
        )
    if where is not None:
        df = df.filter(where)
    return (
        df.withColumn("match_n", F.row_number().over(w).cast("long"))
        .filter(F.col("match_n") <= limit)
    )


def cull_users(
    df: DataFrame, must_match: Column, user_col: str = "user_id"
) -> DataFrame:
    """The reference's query-index culling (src/queryindexing.h;
    test/test_db.h "index compiler" suite) re-expressed for Spark:
    before running a per-user sequence operator, drop every customer
    who can NEVER satisfy a required ``ever`` predicate — the bitmap
    pre-pass that decides which people to scan at all.

    Declarative form: a left-semi join of the events table against
    the distinct matching-user set. Sound whenever the downstream
    operator ignores users with zero matching rows (funnels keyed on
    step 1, segment ``ever`` counts, matching-row grids). At scale
    this is the difference between window-sorting 100 TB of
    timelines and window-sorting only the candidate users' slice —
    Catalyst's pushdown prunes COLUMNS and PARTITIONS, this prunes
    PEOPLE, which is exactly what the reference's index bits do."""
    candidates = df.filter(must_match).select(user_col).distinct()
    return df.join(candidates, user_col, "left_semi")


def _grid_keys(
    order_cols: Sequence[str],
    event_order: Sequence[str] | None,
    event_col: str,
) -> list[Column]:
    """The reference row-grid ordering: stamp, declared event
    priority (z-order), then the remaining tie-break columns."""
    from openset_spark.operators.sessionize import zorder_key

    keys: list[Column] = [F.col(order_cols[0])]
    if event_order:
        keys.append(zorder_key(F.col(event_col), list(event_order)))
    keys += [F.col(c) for c in order_cols[1:]]
    return keys


def first_match_row(
    df: DataFrame,
    where: Column,
    user_col: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    event_order: Sequence[str] | None = None,
    event_col: str = "event_type",
) -> DataFrame:
    """OSL one-line ``row``/``test`` searches
    (docs/osl/language_reference.md:767-803): per customer, the
    0-based row index of the first match (``row``) and whether any
    row matched (``test``); customers with no match get null/false.
    One shuffle: cursor window + groupBy share the user partitioning."""
    order = [k.asc() for k in _grid_keys(order_cols, event_order, event_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    cur = df.withColumn("_cursor", F.row_number().over(w) - 1)
    return cur.groupBy(user_col).agg(
        F.min(F.when(where, F.col("_cursor"))).alias("row"),
        F.max(F.when(where, True).otherwise(False)).alias("test"),
    )


def time_rollup(
    df: DataFrame,
    granularities: Sequence[str] = ("day", "hour", "minute"),
    ts_col: str = "ts",
    group_by: Sequence[str] = ("event_type",),
    aggs: Sequence[tuple[str, str, str]] = (),
    count_alias: str = "n",
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the SAME
    aggregates at EVERY time granularity of a hierarchy (day > hour >
    minute ...) in ONE shuffle — the pre-aggregation table a
    time-series store maintains so dashboards never rescan raw
    events. Each output row carries its ``granularity`` label, the
    bucket columns (finer ones NULL at coarser levels — the standard
    rollup shape), the fixed ``group_by`` dims, a row count, and the
    requested aggregates.

    Plan shape: one ``GROUPING SETS`` over (group_by...,
    bucket_coarse ... bucket_fine) that names EXACTLY the m wanted
    levels — Spark's Expand emits m projections per input row, all
    aggregated map-side-partially in a single exchange; N
    granularities never cost N scans, and (unlike a rollup-then-
    filter) no discarded grand-total / dims-rolled-away levels
    inflate the Expand output. The incremental-refresh twin is the
    streaming aggregate surface (streaming/aggregate.py) feeding the
    same bucket expressions."""
    validate_granularities(granularities)
    bnames = [f"bucket_{g}" for g in granularities]
    pre = df.withColumns(
        {n: F.date_trunc(g, F.col(ts_col)) for n, g in zip(bnames, granularities)}
    )
    exprs: list[Column] = [F.count(F.lit(1)).alias(count_alias)]
    exprs += [_AGG_FNS[fn](col).alias(alias) for fn, col, alias in aggs]
    return grouping_sets_rollup(
        pre, granularities, group_by, exprs,
        out_cols=[count_alias] + [alias for _fn, _c, alias in aggs],
    )


def validate_granularities(granularities: Sequence[str]) -> None:
    """Rollup hierarchies must be coarsest-to-finest (the grouping_id
    level labels depend on it) and built from known date_trunc units."""
    ranks = [_GRANULARITY_RANK.get(g) for g in granularities]
    if None in ranks:
        bad = [g for g in granularities if g not in _GRANULARITY_RANK]
        raise ValueError(f"unknown granularities: {bad}")
    if ranks != sorted(ranks) or len(set(ranks)) != len(ranks):
        raise ValueError(
            "granularities must be ordered coarsest to finest, e.g. "
            f"('day', 'hour', 'minute'); got {tuple(granularities)}"
        )


def grouping_sets_rollup(
    pre: DataFrame,
    granularities: Sequence[str],
    group_by: Sequence[str],
    exprs: Sequence[Column],
    out_cols: Sequence[str],
) -> DataFrame:
    """The shared GROUPING SETS core of :func:`time_rollup` and its
    streaming fold twin (streaming/aggregate.py::fold_rollup):
    ``pre`` already carries ``bucket_<g>`` columns; one Expand emits
    exactly one projection per granularity level (dims + the
    coarse-to-g bucket prefix), the grouping_id labels the level."""
    bnames = [f"bucket_{g}" for g in granularities]
    all_keys = list(group_by) + bnames
    # level i keeps buckets[0..i]: dims + a coarse-to-g prefix
    sets = [
        [F.col(c) for c in list(group_by) + bnames[: i + 1]]
        for i in range(len(granularities))
    ]
    rolled = pre.groupingSets(sets, *[F.col(c) for c in all_keys]).agg(
        *exprs, F.grouping_id().alias("_gid")
    )
    level = F.lit(None).cast("string")
    for i, g in enumerate(granularities):
        # level g: buckets finer than g are grouped away — gid has
        # exactly (len - 1 - i) low bits set
        gid = (1 << (len(granularities) - 1 - i)) - 1
        level = F.when(F.col("_gid") == gid, F.lit(g)).otherwise(level)
    return rolled.select(
        level.alias("granularity"),
        *[F.col(c) for c in group_by],
        *bnames,
        *out_cols,
    )


def decayed_counts(
    df: DataFrame,
    at,
    half_life_days: float = 7.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially-decayed per-user activity counters evaluated at
    ``at`` — the feature-store recency features (a purchase last
    night outweighs ten from last quarter): decayed_events =
    Σ 0.5^(age_days / half_life), decayed_value the value-weighted
    twin; events after ``at`` are excluded (no future leakage).

    One map-side-combinable groupBy — the cheapest possible shape;
    the decay weight is a row-local projection. Cross-engine float
    contract (the char_entropy/readability posture): ages derive
    from EXACT integer microseconds (< 2^53, so the division is the
    same IEEE double in both engines), the weight is one exp() per
    row (libm last-ulp differences vanish in the ROUND(4) the
    oracle locks), sums surface rounded. At 100 TB: the decayed sum
    FOLDS like any sum — per-shard/day partials compose, and
    re-evaluating at a later ``at`` only multiplies every partial by
    a constant 0.5^(Δ/half_life) — so a store of per-day partials
    answers any evaluation time without rescanning raw events (the
    sliding-partial store pattern; documented, not persisted here).
    """
    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be > 0: {half_life_days}")
    import math

    lam = math.log(2.0) / float(half_life_days)
    age_days = (
        F.unix_micros(F.lit(at)) - F.unix_micros(F.col(ts_col))
    ) / F.lit(86400e6)
    w = F.exp(-F.lit(lam) * age_days)
    kept = df.filter(F.col(ts_col) <= F.lit(at))
    return kept.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(w), 4).alias("decayed_events"),
        F.round(F.sum(w * F.col(value_col)), 4).alias("decayed_value"),
    )


def decayed_partials(
    df: DataFrame,
    half_life_days: float = 7.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(user, day) decayed partials, each evaluated at ITS OWN
    day-end boundary — the stored half of decayed_counts (write with
    pipeline.sliding.write_sliding_partials: the frame carries the
    ``_db`` day-bucket column the store machinery partitions and
    folds on). A day's partial
    never changes once the day closes, so the maintainer only ever
    appends/overwrites the current day."""
    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be > 0: {half_life_days}")
    import math

    lam = math.log(2.0) / float(half_life_days)
    day = F.date_trunc("day", F.col(ts_col))
    day_end = day + F.expr("interval 1 day")
    age_days = (
        F.unix_micros(day_end) - F.unix_micros(F.col(ts_col))
    ) / F.lit(86400e6)
    w = F.exp(-F.lit(lam) * age_days)
    return df.groupBy(
        F.col(user_col).alias(user_col), day.alias("_db")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(w).alias("de"),
        F.sum(w * F.col(value_col)).alias("dv"),
    )


def decayed_from_partials(
    parts: DataFrame,
    at,
    half_life_days: float = 7.0,
    user_col: str = "user_id",
) -> DataFrame:
    """decayed_counts from STORED per-(user, day) partials: each
    day's partial rescales from its own day-end boundary to ``at``
    by the constant 0.5^(gap/half_life) and the rescaled partials
    sum per user — the bounded partial table (users x days) answers
    any evaluation time without rescanning raw events. Days at or
    after ``at``'s date are excluded (their rows could contain
    future events; re-aggregate the current open day from raw if
    sub-day freshness is needed).

    Boundary convention (ADVICE r14): the direct build
    (:func:`decayed_counts`) filters ``ts <= at`` INCLUSIVE, while
    this store path drops the whole ``date_trunc('day', at)`` day —
    so an event stamped exactly at a midnight ``at`` is counted by
    the direct build but lives in the excluded open day here and
    must come from the raw re-aggregation. Callers needing the two
    paths to agree at midnight boundaries must union the open day.

    Float note — the ONE fold in the store family that is not
    bit-exact: exp(a)*exp(b) and exp(a+b) differ in the last ulp,
    so maintained == direct holds to ~1e-12 relative, inside the
    ROUND(4) surface (tolerance-locked in pytest, unlike the
    max/sum/k-min folds' exact equality)."""
    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be > 0: {half_life_days}")
    import math

    lam = math.log(2.0) / float(half_life_days)
    day_end = F.col("_db") + F.expr("interval 1 day")
    gap_days = (
        F.unix_micros(F.lit(at)) - F.unix_micros(day_end)
    ) / F.lit(86400e6)
    scale = F.exp(-F.lit(lam) * gap_days)
    kept = parts.filter(
        F.col("_db") < F.date_trunc("day", F.lit(at))
    )
    return kept.groupBy(user_col).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(F.sum(F.col("de") * scale), 4).alias("decayed_events"),
        F.round(F.sum(F.col("dv") * scale), 4).alias("decayed_value"),
    )


def decayed_fold(parts: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Compose same-(user, day) decayed partials — plain SUMS at the
    fixed day-end boundary, so unlike the rescale in
    decayed_from_partials this fold is BIT-exact only up to double
    summation order; n_events is exact. The maintainer fold for a
    live decayed-counter store (pipeline.sliding.
    sliding_store_maintainer with tb_col='_db')."""
    return parts.groupBy(user_col, "_db").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("de").alias("de"),
        F.sum("dv").alias("dv"),
    )
