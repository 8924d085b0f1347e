"""Multi-dimensional Z-ORDER data layout — the file-skipping lever
for selective multi-column scans at 100 TB (the OPTIMIZE ZORDER of
Delta/Iceberg, expressed as plain Spark).

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
            # ((b >> i) & 1) << (i*n + c), with >> via exact
            # power-of-two arithmetic (b < 2^bits is small)
            bit = (b.cast("long") / (1 << i)).cast("long") % 2
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


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 10
) -> DataFrame:
    """``df`` + a ``_z`` locality column interleaving ``cols``.
    bits * len(cols) must fit a long (validated); NULLs bucket to 0
    (cluster together at the low end)."""
    stats = _validate_and_stats(df, cols, bits)
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
    return df.withColumn("_z", _interleave(buckets, bits))


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
    one, skew-robustly, in O(1) per row: quantize the column to a
    2^20 grid over [min, max], sketch the quantized values with the
    log-linear HDR histogram (bounded buckets), map each HDR bucket
    to floor(nb * cumulative_count_before / n) — the quantile rank
    of its lower edge — and broadcast-join that tiny map back. One
    extra scan + one broadcast join per indexed column; no per-row
    boundary search, no global sort. Adds ``_b_<col>`` columns."""
    from pyspark.sql.window import Window

    from openset_spark.pipeline.hdrhist import _bucket, hdr_partials

    S = 1 << 20
    out = df
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        if mn is None or mx is None or mn == mx:
            out = out.withColumn(f"_b_{c}", F.lit(0))
            continue
        scaled = F.floor(
            (F.col(c).cast("double") - mn) * S / (mx - mn)
        ).cast("long")
        scaled = F.least(F.greatest(scaled, F.lit(0)), F.lit(S - 1))
        tmp = out.withColumn(f"_q_{c}", scaled)
        sk = hdr_partials(tmp, f"_q_{c}", (), 5)
        w = Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
        mapping = sk.select(
            F.col("bucket").alias(f"_hb_{c}"),
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("_cb"),
            F.sum("cnt").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("_n"),
        ).select(
            f"_hb_{c}",
            F.least(
                F.floor(F.lit(nb) * F.col("_cb") / F.col("_n")),
                F.lit(nb - 1),
            )
            .cast("int")
            .alias(f"_b_{c}"),
        )
        out = (
            tmp.withColumn(f"_hb_{c}", _bucket(F.col(f"_q_{c}"), 32))
            .join(F.broadcast(mapping), f"_hb_{c}")
            .drop(f"_q_{c}", f"_hb_{c}")
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
