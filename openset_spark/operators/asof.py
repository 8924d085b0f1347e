"""AS-OF JOIN: each left row picks the temporally nearest right row
at-or-before (backward) or at-or-after (forward) its own timestamp,
per key — the kdb `aj` / pandas `merge_asof` / DuckDB `ASOF JOIN`
operator Spark lacks natively. The canonical uses: join events to
the dimension snapshot that was CURRENT when the event happened
(SCD-2 without effective-date ranges), trades to the latest quote,
sensor readings to the last calibration.

Scale shape — union + running window, NOT a range join:

* the right side collapses to one row per (key, ts) (deterministic
  max-of-struct on the payload, so duplicate snapshot rows can't
  make the result order-dependent);
* both sides union into one frame tagged with a side bit, RIGHT
  rows ordering BEFORE left rows at equal timestamps (that is what
  makes the match inclusive: ts_right <= ts_left);
* one window per key ordered by (ts, side) carries the most recent
  payload forward via last(ignorenulls) — every left row reads its
  answer from the running state.

Cost: ONE shuffle of |left| + |right(key,ts)-distinct| rows keyed by
the join key, and a per-key ordered scan — the same posture as
sessionize (a key is processed within one task; key-level skew is
the documented caveat, mitigated the same way: per-key history is
bounded by retention). The naive alternatives lose at scale: a
range-condition join degenerates to per-key cross products, and a
per-left-row subquery probe is quadratic.

``tolerance_ms`` nulls the match when the time gap exceeds it (the
merge_asof semantics); unmatched left rows survive with NULL payload
(LEFT-join semantics, mirroring DuckDB's ASOF LEFT JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    values: tuple[str, ...] | None = None,
    direction: str = "backward",
    tolerance_ms: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Every ``left`` row + the payload ``values`` of the nearest
    ``right`` row per ``by`` key (backward: greatest right.on <=
    left.on; forward: least right.on >= left.on; nearest: smaller
    absolute gap of the two, ties to backward — pandas merge_asof's
    rule; equality matches in every direction). Output = all left
    columns, then ``<on><suffix>`` (the matched right timestamp) and
    ``<v><suffix>`` per payload column — NULL when no match (or
    outside ``tolerance_ms``).

    ``nearest`` still costs ONE shuffle: both running carries
    (backward = asc order, forward = desc order) are windows over
    the same key partitioning — Spark plans two sorts on one
    exchange — and the pick is a row-local integer-microsecond gap
    comparison (``unix_micros``, never float seconds, so equal-gap
    ties cannot flip on rounding)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
    if values is None:
        values = tuple(
            c for c in right.columns if c != on and c not in by
        )
    if not values:
        raise ValueError("right side has no payload columns")

    # one snapshot row per (key, ts): deterministic max-of-struct
    right_d = right.groupBy(*by, on).agg(
        F.max(F.struct(*[F.col(v) for v in values])).alias("_rp")
    )
    r_side = right_d.select(
        *by,
        F.col(on).alias("_ots"),
        F.col(on).alias("_rts"),
        F.col("_rp"),
        F.lit(0).alias("_side"),
        F.lit(None).alias("_lrow"),
    )
    l_side = left.select(
        *by,
        F.col(on).alias("_ots"),
        F.lit(None).cast(right_d.schema[on].dataType).alias("_rts"),
        F.lit(None).cast(right_d.schema["_rp"].dataType).alias("_rp"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    unioned = r_side.unionByName(l_side, allowMissingColumns=False)
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.asc("_ots"), F.asc("_side"))
        .rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.desc("_ots"), F.asc("_side"))
        .rowsBetween(*frame)
    )
    if direction == "nearest":
        both = unioned.select(
            "_side",
            "_ots",
            "_lrow",
            F.last("_rts", ignorenulls=True).over(w_back).alias("_bts"),
            F.last("_rp", ignorenulls=True).over(w_back).alias("_bp"),
            F.last("_rts", ignorenulls=True).over(w_fwd).alias("_fts"),
            F.last("_rp", ignorenulls=True).over(w_fwd).alias("_fp"),
        ).filter(F.col("_side") == 1)
        bgap = F.unix_micros(F.col("_ots")) - F.unix_micros(F.col("_bts"))
        fgap = F.unix_micros(F.col("_fts")) - F.unix_micros(F.col("_ots"))
        if tolerance_ms is not None:
            lim = int(tolerance_ms) * 1000
            both = both.select(
                "_side",
                "_ots",
                "_lrow",
                F.when(bgap <= lim, F.col("_bts")).alias("_bts"),
                F.when(bgap <= lim, F.col("_bp")).alias("_bp"),
                F.when(fgap <= lim, F.col("_fts")).alias("_fts"),
                F.when(fgap <= lim, F.col("_fp")).alias("_fp"),
            )
            bgap = F.unix_micros(F.col("_ots")) - F.unix_micros(
                F.col("_bts")
            )
            fgap = F.unix_micros(F.col("_fts")) - F.unix_micros(
                F.col("_ots")
            )
        take_back = F.col("_bts").isNotNull() & (
            F.col("_fts").isNull() | (bgap <= fgap)
        )
        carried = both.select(
            "_side",
            "_ots",
            "_lrow",
            F.when(take_back, F.col("_bts"))
            .otherwise(F.col("_fts"))
            .alias("_mts"),
            F.when(take_back, F.col("_bp"))
            .otherwise(F.col("_fp"))
            .alias("_mp"),
        )
        out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
        out_cols.append(F.col("_mts").alias(f"{on}{suffix}"))
        out_cols.extend(
            F.col(f"_mp.{v}").alias(f"{v}{suffix}") for v in values
        )
        return carried.select(*out_cols)
    w = w_back if direction == "backward" else w_fwd
    carried = unioned.select(
        "_side",
        "_ots",
        "_lrow",
        F.last("_rts", ignorenulls=True).over(w).alias("_mts"),
        F.last("_rp", ignorenulls=True).over(w).alias("_mp"),
    ).filter(F.col("_side") == 1)
    if tolerance_ms is not None:
        gap = F.abs(
            F.col("_ots").cast("double") - F.col("_mts").cast("double")
        ) * 1000.0  # timestamps cast to double = epoch SECONDS
        ok = F.col("_mts").isNotNull() & (gap <= float(tolerance_ms))
        carried = carried.select(
            "_side",
            "_ots",
            "_lrow",
            F.when(ok, F.col("_mts")).alias("_mts"),
            F.when(ok, F.col("_mp")).alias("_mp"),
        )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_mts").alias(f"{on}{suffix}"))
    out_cols.extend(
        F.col(f"_mp.{v}").alias(f"{v}{suffix}") for v in values
    )
    return carried.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    bucket_ms: int = 3_600_000,
    how: str = "inner",
) -> DataFrame:
    """RANGE/INTERVAL JOIN: every ``left`` row x every ``right``
    interval (``[start_col, end_col)``, same ``by`` key) that
    CONTAINS its timestamp — the validity-window join (SCD-2 dims
    with effective ranges, campaign windows, maintenance periods).
    Many-to-many by definition: overlapping intervals each emit a
    row.

    Scale shape: Spark turns a bare range predicate into a per-key
    nested-loop — quadratic in the key's row count. Instead both
    sides BUCKETIZE on ``bucket_ms``: a point lands in exactly one
    bucket, an interval explodes to the buckets it touches, the join
    is a plain hash join on (key, bucket), and the exact containment
    predicate filters after. Each (row, interval) pair can only meet
    in the row's single bucket, so no dedup is needed. The explode
    factor is interval_length / bucket_ms — pick the bucket near the
    TYPICAL interval length (default 1 h); degenerate/empty
    intervals (end <= start) match nothing and are dropped before
    exploding.

    ``how="left"`` keeps unmatched left rows with NULL interval
    columns in ONE pass: the containment predicate rides the
    (key, bucket) equi-join as its residual condition in a LEFT
    OUTER join — a left row with no passing match emits exactly once
    with NULLs, so there is no join-back on left columns at all
    (duplicated left rows survive independently, NULL payloads can't
    drop genuine matches) and no second scan of either side."""
    from openset_spark.functions.time import epoch_ms

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    w = int(bucket_ms)
    lb = left.withColumn(
        "_b", F.floor(epoch_ms(F.col(on)) / w).cast("long")
    )
    r_ok = right.filter(F.col(end_col) > F.col(start_col))
    rb = r_ok.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(epoch_ms(F.col(start_col)) / w).cast("long"),
                F.floor((epoch_ms(F.col(end_col)) - 1) / w).cast("long"),
            )
        ),
    )
    if how == "inner":
        return (
            lb.join(rb, [*by, "_b"])
            .filter(
                (F.col(start_col) <= F.col(on))
                & (F.col(on) < F.col(end_col))
            )
            .drop("_b")
        )
    cond = F.lit(True)
    for c in by:
        cond = cond & (lb[c] == rb[c])
    cond = (
        cond
        & (lb["_b"] == rb["_b"])
        & (rb[start_col] <= lb[on])
        & (lb[on] < rb[end_col])
    )
    right_only = [c for c in rb.columns if c not in (*by, "_b")]
    return lb.join(rb, cond, "left").select(
        *[lb[c] for c in by],
        *[lb[c] for c in left.columns if c not in by],
        *[rb[c] for c in right_only],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: tuple[str, ...] = ("user_id",),
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "valid_from",
    right_end: str = "valid_to",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """INTERVAL x INTERVAL overlap join: every left interval
    ``[left_start, left_end)`` x every right interval (same ``by``
    key) with a non-empty intersection — concurrent sessions,
    campaign/maintenance windows overlapping activity spans. Output
    = left columns + right columns (join keys once).

    Scale shape: both sides explode to the ``bucket_ms`` buckets they
    touch and hash-join on (key, bucket) — but unlike the
    point-in-interval case a pair can share MANY buckets, so the
    join would duplicate. The standard dedup-free trick: a pair is
    emitted only in the bucket of max(left_start, right_start) — the
    first bucket where both are alive, which both sides are
    guaranteed to have exploded (it lies inside each interval's
    bucket range). One hash join, no distinct, exact overlap
    predicate as post-filter. Empty intervals (end <= start) match
    nothing and are dropped before exploding."""
    from openset_spark.functions.time import epoch_ms

    w = int(bucket_ms)

    def bucketed(df, s, e):
        ok = df.filter(F.col(e) > F.col(s))
        return ok.withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(epoch_ms(F.col(s)) / w).cast("long"),
                    F.floor((epoch_ms(F.col(e)) - 1) / w).cast("long"),
                )
            ),
        )

    lb = bucketed(left, left_start, left_end)
    rb = bucketed(right, right_start, right_end)
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    anchor = F.floor(
        F.greatest(
            epoch_ms(F.col(left_start)), epoch_ms(F.col(right_start))
        )
        / w
    ).cast("long")
    return (
        lb.join(rb, [*by, "_b"])
        .filter(overlap & (F.col("_b") == anchor))
        .drop("_b")
    )
