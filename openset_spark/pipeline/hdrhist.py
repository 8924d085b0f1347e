"""Deterministic, engine-portable log-linear quantile sketch — the
third sketch sibling (hll.py counts distincts, cms.py counts
frequencies, this one answers QUANTILES: p50/p95/p99 of lengths,
latencies, token counts) whose partials COMPOSE EXACTLY.

The HdrHistogram idea in pure relational algebra: a non-negative
integer value buckets by (octave, sub-bucket) — octave e =
floor(log2(x)) computed EXACTLY as ``length(bin(x)) - 1`` (the
hll.py rho trick; no floating log anywhere), then the octave
[2^e, 2^{e+1}) splits linearly into s = 2^sub_bits sub-buckets:
``sub = (x - 2^e) * s div 2^e``. Every step is INTEGER arithmetic,
so Spark and DuckDB bucket identically by construction — the
float-boundary hazard a log-gamma DDSketch would carry (ln() last-
ulp disagreement flipping a ceil) simply cannot occur.

* a "sketch" is rows (group..., bucket, cnt): bucket = e*s + sub
  (lexicographic = numeric order), 0 maps to bucket -1; cnt is a
  LONG SUM — partials from any split (shard/hour/micro-batch) fold
  to EXACTLY the direct build's rows, bit for bit, and the
  observation projection is stateless (streaming twin).
* a quantile reads the first bucket whose running count reaches
  rank ceil(q*n) and reports the bucket's integer midpoint:
  relative error <= 1/s + rank resolution (s = 32 -> ~3%, s = 128
  -> ~0.8%), max 64*s + 1 buckets per group REGARDLESS of n — the
  bounded-state quantile an exact distributed sort can never be.

Scale: the one shuffle is map-side-combinable (<= 64*s + 1 rows per
task per group); the quantile walk is a window over the bucket rows
only — never over the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


MAX_VALUE = 1 << 45  # exact-arithmetic domain bound (see _check)


def _check(sub_bits: int) -> None:
    # sub_bits <= 8 and x < 2^45 keep EVERY division exact in BOTH
    # engines: Spark's `/` is double division, so (x - 2^e) * s must
    # stay under 2^53 (2^45 * 2^8) for floor() to equal integer
    # division — DuckDB's `//` is integer-exact either way, and the
    # decode products (sub+1)*2^e stay inside BIGINT. 2^45 covers
    # counts, lengths, cents, and 35 000 years of milliseconds.
    if not 0 <= sub_bits <= 8:
        raise ValueError(f"sub_bits must be in [0, 8]: {sub_bits}")


def _bucket(x: Column, s: int) -> Column:
    """(octave*s + sub) for x >= 1; -1 for x = 0. Pure integer ops:
    octave from the binary-string length, sub by scaled division."""
    e = (F.length(F.conv(x.cast("long"), 10, 2)) - 1).cast("long")
    pw = F.pow(F.lit(2.0), e).cast("long")  # 2^e exact (e <= 62)
    sub = F.floor((x.cast("long") - pw) * s / pw).cast("long")
    return F.when(x == 0, F.lit(-1)).otherwise(e * s + sub)


def _lo(bucket: Column, s: int) -> Column:
    """Inclusive lower bound of a bucket: 2^e + sub*2^e div s."""
    e = F.floor(bucket / s).cast("long")
    sub = bucket % s
    pw = F.pow(F.lit(2.0), e).cast("long")
    return pw + F.floor(sub * pw / s).cast("long")


def _hi(bucket: Column, s: int) -> Column:
    """Exclusive upper bound: the next sub-bucket's lower bound."""
    e = F.floor(bucket / s).cast("long")
    sub = bucket % s
    pw = F.pow(F.lit(2.0), e).cast("long")
    return pw + F.floor((sub + 1) * pw / s).cast("long")


def hdr_observations(
    df: DataFrame,
    col: str,
    group_by: tuple[str, ...] = (),
    sub_bits: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-row bucket observations (group_by..., bucket, cnt=1) — a
    pure stateless projection, so it drops unchanged into a
    STREAMING pipeline (fold the streamed observations and you hold
    exactly the batch sketch, any arrival order). NULLs are skipped;
    negative values and values >= 2^45 are contract violations and
    raise at runtime via CASE guards (signed data should sketch the
    two signs separately; rescale units to fit the exact-arithmetic
    domain — see _check). ``weight_col`` (integer) counts each row
    that many times — the weighted-quantile form (e.g. doc-length
    percentiles weighted by token count)."""
    _check(sub_bits)
    s = 1 << sub_bits
    x = F.col(col)
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    guarded = F.when(
        x < 0, F.raise_error(F.lit(f"hdr sketch: negative value in {col}"))
    ).when(
        x >= MAX_VALUE,
        F.raise_error(F.lit(f"hdr sketch: {col} >= 2^45 (exact domain)")),
    ).when(
        x != F.floor(x),
        F.raise_error(
            F.lit(f"hdr sketch: non-integral value in {col} (rescale "
                  "units to integers)")
        ),
    ).otherwise(_bucket(x, s))
    return (
        df.filter(x.isNotNull())
        .select(*group_by, guarded.alias("bucket"), w.alias("cnt"))
    )


def hdr_partials(
    df: DataFrame,
    col: str,
    group_by: tuple[str, ...] = (),
    sub_bits: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """(group_by..., bucket, cnt) — the composable sketch: one
    map-side-combinable sum over the observations."""
    return (
        hdr_observations(df, col, group_by, sub_bits, weight_col)
        .groupBy(*group_by, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hdr_fold(
    partials: DataFrame, group_by: tuple[str, ...] = ()
) -> DataFrame:
    """Fold sketches to a coarser grouping: same row shape, exact
    counter algebra — sum of sums IS the direct build's sum."""
    return partials.groupBy(*group_by, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def hdr_quantiles(
    partials: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_by: tuple[str, ...] = (),
    sub_bits: int = 5,
) -> DataFrame:
    """(group_by..., q, est): est = integer midpoint of the first
    bucket whose running count reaches rank ceil(q*n) (bucket -1 ->
    0). The window runs over BUCKET rows (<= 64*s + 1 per group),
    never over the data. All arithmetic integer; the only floats
    are the q labels themselves."""
    _check(sub_bits)
    s = 1 << sub_bits
    w = Window.partitionBy(*group_by).orderBy("bucket")
    cum = partials.select(
        *group_by,
        "bucket",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy(*group_by)).alias("_n"),
    )
    qdf = partials.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = cum.crossJoin(F.broadcast(qdf)).filter(
        F.col("_cum") >= F.ceil(F.col("q") * F.col("_n"))
    )
    best = hit.groupBy(*group_by, "q").agg(
        F.min("bucket").alias("_b"), F.first("_n").alias("_n")
    )
    b = F.col("_b")
    lo = _lo(b, s)
    # low octaves (2^e < s) have single-value buckets where the raw
    # hi equals lo — clamp so the midpoint never drops below lo
    hi = F.greatest(_hi(b, s), lo + 1)
    mid = F.floor((lo + hi - 1) / 2).cast("long")
    return best.select(
        *group_by,
        "q",
        F.when(b == -1, F.lit(0).cast("long")).otherwise(mid).alias("est"),
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_by: tuple[str, ...] = (),
    sub_bits: int = 5,
) -> DataFrame:
    """Grouped quantiles of a non-negative integer column with
    <= 1/s relative bucket error and bounded state, deterministically
    and oracle-replayably (unlike percentile_approx, whose
    Greenwald-Khanna compaction is partitioning-dependent)."""
    return hdr_quantiles(
        hdr_partials(df, col, group_by, sub_bits), qs, group_by, sub_bits
    )


def time_rollup_quantiles(
    df: DataFrame,
    granularities: tuple[str, ...] = ("day", "hour"),
    ts_col: str = "ts",
    group_by: tuple[str, ...] = (),
    col: str = "value",
    qs: tuple[float, ...] = (0.5, 0.95),
    sub_bits: int = 5,
) -> DataFrame:
    """Quantiles at EVERY granularity of a time hierarchy (p50/p95
    per hour, per day, per month ...) — the continuous-aggregate
    percentile query an exact percentile can never fold (a value
    set's median is not a function of its hours' medians) and
    percentile_approx can never replay. Mirrors
    hll.time_rollup_distinct: the RAW rows pay exactly one bucket
    aggregate at the finest grain (map-side-combinable sum, one
    exchange); the GROUPING SETS Expand then runs over the finest
    BUCKET table — at most 64*s + 1 rows per finest group — because
    HDR buckets compose by sum, the same law hdr_fold rides. Output:
    (granularity, group_by..., bucket_<g>..., q, est)."""
    from openset_spark.operators.events import validate_granularities

    validate_granularities(granularities)
    _check(sub_bits)
    bnames = [f"bucket_{g}" for g in granularities]
    pre = df.withColumns(
        {
            n: F.date_trunc(g, F.col(ts_col))
            for n, g in zip(bnames, granularities)
        }
    )
    finest = hdr_partials(
        pre, col, tuple(group_by) + tuple(bnames), sub_bits
    )
    all_keys = list(group_by) + bnames + ["bucket"]
    sets = [
        [F.col(c) for c in list(group_by) + bnames[: i + 1] + ["bucket"]]
        for i in range(len(granularities))
    ]
    rolled = finest.groupingSets(
        sets, *[F.col(c) for c in all_keys]
    ).agg(F.sum("cnt").alias("cnt"), F.grouping_id().alias("_gid"))
    level = F.lit(None).cast("string")
    for i, g in enumerate(granularities):
        # sketch bucket is the last gid bit and always present (0);
        # time buckets finer than level i are grouped away
        gid = ((1 << (len(granularities) - 1 - i)) - 1) << 1
        level = F.when(F.col("_gid") == gid, F.lit(g)).otherwise(level)
    leveled = rolled.select(
        level.alias("granularity"), *all_keys[:-1], "bucket", "cnt"
    )
    return hdr_quantiles(
        leveled, qs, ("granularity", *group_by, *bnames), sub_bits
    )


def hdr_sliding_quantiles(
    df: DataFrame,
    col: str = "value",
    ts_col: str = "ts",
    slide: str = "hour",
    window: int = 24,
    qs: tuple[float, ...] = (0.5, 0.95),
    sub_bits: int = 5,
) -> DataFrame:
    """TRAILING-window quantiles at every slide point (p95 of the
    last 24 hours, re-evaluated hourly) — the sliding percentile an
    exact sort can never maintain and percentile_approx can never
    replay. The hll.py sliding twin (VERDICT r11 ask #8): HDR
    buckets compose by SUM, so the trailing window folds without
    re-touching raw rows:

    1. one per-slide bucket build (the only scan of the data);
    2. densify over the (dense min..max slide sequence x observed
       sketch buckets) spine — bounded by time x (64*s + 1), never
       by data, and gap-free: a slide point with zero events still
       reports its non-empty trailing window;
    3. a RANGE-framed window SUM per sketch bucket over the
       trailing ``window`` slide indices (sum skips the nulls the
       densify introduced);
    4. the rank walk per slide point, over bucket rows only.

    Output: (bucket, q, est) — ``est`` at ``bucket`` covers
    (bucket - window + 1 .. bucket]. By construction the windowed
    counts EQUAL a direct sketch over the window's rows (sum
    composes), so the estimate is identical to re-sketching from
    scratch (test-asserted), and DuckDB replays the whole pipeline.
    """
    _check(sub_bits)
    pre = df.withColumn("_tb", F.date_trunc(slide, F.col(ts_col)))
    parts = hdr_partials(pre, col, ("_tb",), sub_bits)
    return hdr_sliding_from_partials(parts, slide, window, qs, sub_bits)


def hdr_sliding_from_partials(
    parts: DataFrame,
    slide: str = "hour",
    window: int = 24,
    qs: tuple[float, ...] = (0.5, 0.95),
    sub_bits: int = 5,
    materialized: bool = False,
    extend_to=None,
) -> DataFrame:
    """The sliding fold from STORED per-slide partials (_tb, bucket,
    cnt) — the path a live deployment runs: per-hour sketches are
    maintained incrementally (e.g. stream-folded, the 29th parity
    surface), and every trailing-window quantile re-reads only the
    bounded partial table, never raw rows. hdr_sliding_quantiles is
    exactly this on freshly-built partials, so stream-fed and batch
    results are equal by construction (33rd parity surface).

    ``materialized=True`` promises ``parts`` is already pinned (a
    checkpoint or a stored table) and skips the defensive copy below
    (VERDICT r12 ask #5 — the double-materialization opt-out)."""
    from openset_spark.pipeline.sliding import check_slide, dense_spine

    _check(sub_bits)
    sec = check_slide(slide, window)
    # Three subtrees reference `parts` (bounds agg, distinct buckets,
    # densify join) — materialize the bounded partial table (slide
    # buckets x <= 64*s + 1 rows) so the raw scan runs exactly once
    # (same reasoning as hll_sliding_from_partials; measured 3 scans
    # otherwise).
    if not materialized:
        parts = parts.localCheckpoint()
    spine = dense_spine(parts, "_tb", slide, extend_to)
    buckets = parts.select("bucket").distinct()
    dense = spine.join(buckets).join(parts, ["_tb", "bucket"], "left")
    tidx = (F.unix_timestamp(F.col("_tb")) / sec).cast("long")
    w = (
        Window.partitionBy("bucket")
        .orderBy(tidx)
        .rangeBetween(-(window - 1), 0)
    )
    rolled = dense.select(
        "_tb", "bucket", F.sum("cnt").over(w).alias("cnt")
    ).filter(F.col("cnt").isNotNull())
    out = hdr_quantiles(rolled, qs, ("_tb",), sub_bits)
    return out.withColumnRenamed("_tb", "bucket")
