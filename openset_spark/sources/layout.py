"""Multi-dimensional Z-ORDER and HILBERT data layout — the
file-skipping lever for selective multi-column scans at 100 TB (the
OPTIMIZE ZORDER / liquid clustering of Delta/Iceberg, expressed as
plain Spark). Z-order handles any column count; the Hilbert variant
(2 columns) walks the grid one cell at a time — no Z-seam jumps —
for strictly tighter footer stats (measured in layout_scale).

Parquet scans prune files and row groups from min/max footer
statistics; a range-partitioned-by-one-column layout makes those
stats tight for THAT column and useless for every other. Z-ordering
interleaves the bit planes of several columns' bucket ids into one
locality key, so sorting by it keeps EVERY indexed column's values
clustered: a selective predicate on any of them touches a small
fraction of files instead of all of them. The win compounds at
scale — at 100 TB the difference between scanning 2% and 100% of
files IS the query.

Implementation is pure relational algebra, no UDFs:

* per column: bucket id via ``width_bucket`` over the column's
  [min, max] (computed in ONE tiny aggregate, broadcast as a
  literal) — equi-width, which is what min/max footer pruning
  actually keys on (heavily skewed columns: pre-transform, e.g.
  log, before indexing);
* the Z value interleaves the bucket bits with a closed-form sum of
  shifted bit tests (2 x bits terms, all whole-stage codegen);
* the write is ``repartitionByRange(z)`` + ``sortWithinPartitions
  (z)`` — range partitioning gives non-overlapping z ranges per
  file, the sort keeps row groups tight inside each file.

``zorder_candidate_files`` reads the parquet FOOTERS (pyarrow) and
counts how many files a [lo, hi] predicate on one column could
touch — the deterministic file-skipping measurement the tests and
bench assert on (no timing noise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each bucket id: bit i of
    column c lands at position i * n_cols + c. Closed form — no UDF,
    no loop at runtime."""
    n = len(buckets)
    z = F.lit(0).cast("long")
    for c, b in enumerate(buckets):
        for i in range(bits):
            # ((b >> i) & 1) << (i*n + c). shiftright is a true
            # integer shift — exact for ANY long. (The previous
            # `/ (1 << i)` form was DOUBLE division in Spark, exact
            # only while the bucket id fits a 53-bit significand —
            # the same hazard class pipeline/cms.py::_check fences.)
            bit = F.shiftright(b.cast("long"), i) % 2
            z = z + bit * (1 << (i * n + c))
    return z


def _validate_and_stats(df: DataFrame, cols: list[str], bits: int):
    """Shared by both writers: the bits budget check and the ONE
    tiny per-column min/max aggregate."""
    if not 1 <= bits * len(cols) <= 62:
        raise ValueError(f"bits*cols must be in [1, 62]: {bits}x{len(cols)}")
    return df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
            )
        ]
    ).first()


def _width_buckets(cols: list[str], stats, bits: int) -> list[Column]:
    """Equi-width bucket ids (0 .. 2^bits - 1) per column from the
    shared min/max stats; NULLs and constant columns bucket to 0
    (cluster together at the low end)."""
    nb = 1 << bits
    buckets = []
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        if mn is None or mx is None or mn == mx:
            buckets.append(F.lit(0))
            continue
        b = F.width_bucket(
            F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(nb)
        )
        # width_bucket: 1..nb, nb+1 at v == max, NULL input -> NULL
        buckets.append(
            F.least(F.coalesce(b, F.lit(1)), F.lit(nb)) - 1
        )
    return buckets


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 10
) -> DataFrame:
    """``df`` + a ``_z`` locality column interleaving ``cols``.
    bits * len(cols) must fit a long (validated); NULLs bucket to 0
    (cluster together at the low end)."""
    stats = _validate_and_stats(df, cols, bits)
    return df.withColumn(
        "_z", _interleave(_width_buckets(cols, stats, bits), bits)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 32,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned
    and sorted by the Z value of ``cols`` — every indexed column's
    min/max footer stats become tight, so selective predicates on
    ANY of them skip most files."""
    zorder_value(df, cols, bits).repartitionByRange(
        n_files, "_z"
    ).sortWithinPartitions("_z").drop("_z").write.mode(
        "overwrite"
    ).parquet(path)


def zorder_candidate_files(
    path: str, col: str, lo, hi
) -> tuple[int, int, int, int]:
    """(candidate_files, total_files, candidate_rows, total_rows):
    how much of the dataset a [lo, hi] predicate on ``col`` could
    touch, judged EXACTLY the way a scan does — from the footer
    min/max statistics (pyarrow; driver-side metadata only, no data
    read). The ROW counts are the robust metric: file counts
    mislead when file sizes are unequal (one fat file holding all
    rows reads as "1 of 2 files" but is 100% of the scan)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = rows_hit = rows_total = 0
    col_seen = False
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows_total += md.num_rows
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col_md = md.row_group(rg).column(ci)
                if col_md.path_in_schema != col:
                    continue
                col_seen = True
                st = col_md.statistics
                if st is None or not st.has_min_max:
                    fmin = lo  # no stats -> must scan
                    fmax = hi
                    break
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
            rows_hit += md.num_rows
    if files and not col_seen:
        # a misspelled column would otherwise read as PERFECT
        # skipping (0 candidates) — the inverted measurement
        raise ValueError(f"column {col!r} not present in {path}")
    return hit, len(files), rows_hit, rows_total


def _equidepth_buckets(
    df: DataFrame, cols: list[str], stats, nb: int
) -> DataFrame:
    """Replace each column's equi-width bucket with an EQUI-DEPTH
    one, skew-robustly, in O(1) per row: quantize each column to a
    2^20 grid over [min, max], sketch ALL columns' quantized values
    in ONE stacked pass (explode to (col, q), one grouped log-linear
    HDR aggregate), map each HDR bucket to
    floor(nb * cumulative_count_before / n) — the quantile rank of
    its lower edge, computed in exact Python integers — and apply
    each column's tiny map as a dense-array-literal element_at. One
    extra scan TOTAL (not per column), zero joins, no per-row
    boundary search, no global sort. Adds ``_b_<col>`` columns."""
    from openset_spark.pipeline.hdrhist import _bucket, hdr_partials

    S = 1 << 20

    def quantized(c: str):
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        scaled = F.floor(
            (F.col(c).cast("double") - mn) * S / (mx - mn)
        ).cast("long")
        return F.least(F.greatest(scaled, F.lit(0)), F.lit(S - 1))

    live = [
        c
        for c in cols
        if stats[f"_mn_{c}"] is not None
        and stats[f"_mx_{c}"] is not None
        and stats[f"_mn_{c}"] != stats[f"_mx_{c}"]
    ]
    out = df
    for c in cols:
        if c not in live:
            out = out.withColumn(f"_b_{c}", F.lit(0))
    if not live:
        return out

    # ONE extra pass for ALL columns (r11 built one sketch scan per
    # column, and each scan re-ran the previously-joined plan —
    # O(cols^2) work): stack every column's quantized value as a
    # (col, q) observation with a single explode, then one grouped
    # HDR-sketch aggregate over the stacked frame.
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("idx_col"),
                        quantized(c).alias("_q"),
                    )
                    for c in live
                ]
            )
        ).alias("s")
    ).select("s.idx_col", "s._q")
    sk = hdr_partials(stacked, "_q", ("idx_col",), 5)

    # The sketch is bounded by construction (q < 2^20, sub_bits=5 ->
    # bucket ids in {-1} U [0, 639]; <= 641 rows per column), so it is
    # a legitimate driver-side collect — same class as the seed /
    # query-set broadcasts. Rank math runs in PYTHON integers (no
    # double-division hazard at all), and each column's bucket -> rank
    # map is applied as an O(1) dense-array-literal lookup: ZERO joins,
    # zero re-scans.
    by_col: dict[str, list[tuple[int, int]]] = {c: [] for c in live}
    for r in sk.collect():
        by_col[r["idx_col"]].append((r["bucket"], r["cnt"]))
    for c in live:
        ranks = sorted(by_col[c])
        n = sum(cnt for _, cnt in ranks)
        arr = [0] * (ranks[-1][0] + 2)  # index = bucket + 1 (0-based)
        cum = rank = 0
        prev = 0
        for b, cnt in ranks:
            rank = min(nb * cum // n, nb - 1)
            for gap in range(prev, b + 1):
                arr[gap + 1] = rank
            prev = b + 1
            cum += cnt
        # element_at is 1-based -> index = bucket + 2. NULL values
        # quantize to NULL -> element_at NULL: coalesce to bucket 0 so
        # NULLs cluster at the low end, the same contract as the
        # width-bucket path (code review r12 — the replaced r11 inner
        # join silently DROPPED those rows).
        out = out.withColumn(
            f"_b_{c}",
            F.coalesce(
                F.element_at(
                    F.lit(arr), (_bucket(quantized(c), 32) + 2).cast("int")
                ),
                F.lit(0),
            ).cast("int"),
        )
    return out


def write_zordered_equidepth(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 32,
) -> None:
    """write_zordered with SKEW-ROBUST equi-depth buckets: an
    outlier that would squeeze the whole population into a few
    equi-width buckets (leaving most files spanning the hot range)
    costs one quantile-rank bucket instead. Same Z interleave and
    range-partitioned sorted write."""
    stats = _validate_and_stats(df, cols, bits)
    nb = 1 << bits
    bucketed = _equidepth_buckets(df, cols, stats, nb)
    z = _interleave([F.col(f"_b_{c}") for c in cols], bits)
    (
        bucketed.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_b_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )


def _hilbert2(x: Column, y: Column, bits: int) -> Column:
    """2-D Hilbert curve index of two bucket ids (each < 2^bits) —
    the standard top-down quadrant walk (rotate/reflect per level),
    run JVM-SIDE inside ONE higher-order F.aggregate over the level
    sequence. A naive per-level column chain references the previous
    level's (x, y) ~3x each, so the expression TREE grows 3^bits
    (59k nodes at bits=10, seconds of analysis time); the aggregate
    lambda keeps the state in a single struct accumulator — linear
    plan size, no UDF, no Python. All arithmetic is bitwise/integer
    (shiftleft, &, ^) — no division, no exactness envelope at all."""
    def step(acc: Column, i: Column) -> Column:
        # 2^i with a COLUMN exponent (shiftleft only takes a literal
        # shift): pow is double but exact here — i <= 31 << the
        # 53-bit significand (bits*2 <= 62 via _validate_and_stats)
        s = F.pow(F.lit(2.0), i.cast("int")).cast("long")
        ax, ay, ad = acc.getField("x"), acc.getField("y"), acc.getField("d")
        rx = F.when(ax.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast(
            "long"
        )
        ry = F.when(ay.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast(
            "long"
        )
        d2 = ad + s * s * (rx * 3).bitwiseXOR(ry)
        nx = F.when(
            ry == 0, F.when(rx == 1, s - 1 - ay).otherwise(ay)
        ).otherwise(ax)
        ny = F.when(
            ry == 0, F.when(rx == 1, s - 1 - ax).otherwise(ax)
        ).otherwise(ay)
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    levels = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))
    return F.aggregate(levels, init, step).getField("d")


def hilbert_value(
    df: DataFrame, cols: list[str], bits: int = 10
) -> DataFrame:
    """``df`` + a ``_h`` locality column: the 2-D Hilbert index of the
    two columns' equi-width buckets. The Hilbert walk visits adjacent
    cells consecutively (no Z-curve seam jumps), so range-partitioned
    files get TIGHTER per-column min/max footer stats than Z-order on
    the same data — strictly better file skipping for 2-column
    indexes (the clustering Delta/Databricks moved to for the same
    reason). Exactly two columns (the quadrant walk is 2-D; for 3+
    columns use ``zorder_value``)."""
    if len(cols) != 2:
        raise ValueError(
            f"hilbert_value indexes exactly 2 columns: {cols} "
            "(use zorder_value for 3+)"
        )
    stats = _validate_and_stats(df, cols, bits)
    bx, by = _width_buckets(cols, stats, bits)
    return df.withColumn("_h", _hilbert2(bx, by, bits))


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 32,
) -> None:
    """write_zordered's Hilbert sibling: range-partitioned + sorted
    by the Hilbert index of two columns."""
    hilbert_value(df, cols, bits).repartitionByRange(
        n_files, "_h"
    ).sortWithinPartitions("_h").drop("_h").write.mode(
        "overwrite"
    ).parquet(path)


def write_hilbert_equidepth(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 32,
) -> None:
    """write_hilbert with SKEW-ROBUST equi-depth buckets (the
    write_zordered_equidepth sibling): quantile-rank bucket ids from
    the one-pass stacked HDR sketch feed the same Hilbert walk."""
    if len(cols) != 2:
        raise ValueError(
            f"write_hilbert_equidepth indexes exactly 2 columns: {cols}"
        )
    stats = _validate_and_stats(df, cols, bits)
    bucketed = _equidepth_buckets(df, cols, stats, 1 << bits)
    h = _hilbert2(F.col(f"_b_{cols[0]}"), F.col(f"_b_{cols[1]}"), bits)
    (
        bucketed.withColumn("_h", h)
        .repartitionByRange(n_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h", *[f"_b_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
