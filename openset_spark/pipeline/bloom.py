"""Deterministic, engine-portable Bloom filter — the SHUFFLE-KILLER
for selective semijoins: build a bounded bitmap over the small
side's keys, broadcast it into the big side's scan as a pure
codegen predicate, and only the (few) surviving rows ever reach the
join exchange. At 100 TB the difference is the whole game: a plain
``probe SEMI JOIN build`` shuffles every probe row on the key;
bloom-pruned, the scan discards non-members at the source and the
exchange carries ~selectivity x N rows (+ the eps false-positive
tail, which the final exact semijoin removes — results are EXACT,
the bloom is semantically invisible).

Design, shared with the hll.py/cms.py siblings:

* ONE 60-bit hash per row; the k probe positions derive from it by
  the Kirsch-Mitzenmacher double-hashing scheme (pos_d = (h1 +
  d*h2) mod m, h1/h2 = disjoint bit fields, h2 odd — KM 2006 shows
  this preserves the Bloom fp asymptotics), so per-row cost is one
  hash, not k. Two hash families: ``hash="xx64"`` (default —
  Spark's codegen-intrinsic xxhash64, the hot path) and
  ``hash="md5"`` (the portable 60-bit md5 prefix DuckDB computes
  identically, for cross-engine bitmap audits). Exactness never
  depends on the family — the final semijoin settles membership —
  so the fast family is safe wherever the bitmap itself isn't the
  oracle.
* the bitmap is rows (word_idx, word): 32 bits per word in a LONG,
  combined by ``bit_or`` — commutative/associative/idempotent, so
  partials from any split fold to EXACTLY the direct build's words
  (32-bit words keep every shift in-range in BOTH engines: DuckDB
  raises on ``1::BIGINT << 63``);
* the probe side never sees a giant literal and the driver never
  sees the bitmap at all: the words DENSIFY to a single
  ARRAY<LONG> row inside Spark (map_from_entries + transform) and
  ride a BROADCAST cross join — k O(1) ``element_at`` bit tests
  per row in whole-stage codegen, zero Python, zero driver
  round-trip. (Measured dead ends, kept out: a hex-string literal
  probed by dynamic substring is ~35x slower than element_at; a
  py4j ARRAY literal costs 12-48 s to CONSTRUCT beyond 2^20 bits.
  The broadcast one-row array costs ~0.4 s at 2^24 and executes at
  literal speed.)

Sizing: false-positive rate ~ (1 - e^{-kn/m})^k; size m at ~8-16
bits per expected build key (k=3: fp ~3% at 8 bits, ~0.6% at 16).
The broadcast is m/32 longs — 2 MiB at m=2^24.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32
_H1_MOD = 1 << 30
_H2_MOD = 1 << 29
_MASK60 = (1 << 60) - 1


def _hash60(col: Column, hash: str) -> Column:
    """60-bit row hash: xx64 = codegen-intrinsic (hot path), md5 =
    the portable prefix DuckDB replays (audit path). BOTH families
    hash the STRING form of the key: xxhash64 over raw columns is
    TYPE-sensitive (xxhash64(42 as int) != xxhash64(42 as long)), so
    an INT probe against a BIGINT build would silently prune every
    true member — the cast makes membership value-based, matching
    the equi-join's coercion semantics."""
    if hash == "xx64":
        return F.xxhash64(col.cast("string")).bitwiseAND(F.lit(_MASK60))
    if hash == "md5":
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
        ).cast("long")
    raise ValueError(f"hash must be xx64|md5: {hash}")


def _check(m_bits: int, k: int) -> None:
    if m_bits < WORD_BITS or m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of 32: {m_bits}")
    if m_bits > _H1_MOD:
        raise ValueError(f"m_bits must be <= 2^30: {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16]: {k}")


def _positions_from(h: Column, m_bits: int, k: int) -> list[Column]:
    """k Kirsch-Mitzenmacher positions from an already-evaluated
    60-bit hash column: h1 = low 30 bits, h2 = odd-ified next 29
    bits, pos_d = (h1 + d*h2) mod m."""
    h1 = h % _H1_MOD
    # EXACT floor division by 2^30: (h - h%2^30)/2^30 is a pure
    # exponent shift (a bare floor(h / 2^30) is double division —
    # for h near a multiple of 2^30 the last-ulp error flips the
    # quotient ~2^-24 per key, silently diverging from DuckDB's //)
    h2 = (((h - h1) / _H1_MOD).cast("long") % _H2_MOD) * 2 + 1
    return [((h1 + d * h2) % m_bits).cast("int") for d in range(k)]


def _bit_test(h: Column, arr: Column, m_bits: int, k: int) -> Column:
    out = None
    for pos in _positions_from(h, m_bits, k):
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + 1)
        # 2^b exactly (b < 32, double-exact); F.shiftleft only takes
        # a literal shift amount
        mask = F.pow(F.lit(2.0), pos % WORD_BITS).cast("long")
        c = word.bitwiseAND(mask) != 0
        out = c if out is None else (out & c)
    return out


def bloom_words(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 17,
    k: int = 3,
    hash: str = "xx64",
) -> DataFrame:
    """The bitmap as rows (word_idx, word): global bit ``i`` is bit
    ``i % 32`` of word ``i // 32``. One shuffle bounded by m/32 rows
    out (map-side bit_or partials collapse each task to <= m/32
    rows first). NULL keys are skipped (SQL semijoin semantics: NULL
    never matches). Absent word_idx rows mean an all-zero word."""
    _check(m_bits, k)
    base = df.filter(F.col(col).isNotNull()).select(
        # hash ONCE per row in a projection, then fan out positions
        _hash60(F.col(col), hash).alias("_h60")
    )
    positions = F.array(*_positions_from(F.col("_h60"), m_bits, k))
    return (
        base.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
            F.pow(F.lit(2.0), F.col("pos") % WORD_BITS)
            .cast("long")
            .alias("word"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def bloom_fold(words: DataFrame) -> DataFrame:
    """Merge bitmaps from any split (shards, days, micro-batches):
    bit_or of bit_ors IS the direct build — exact, idempotent."""
    return words.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_dense(words: DataFrame, m_bits: int = 1 << 17) -> DataFrame:
    """Densify the word rows to ONE row holding the whole bitmap as
    ``_bm: array<long>`` (absent words = 0) — entirely inside Spark,
    so the bitmap never visits the driver and broadcasts straight to
    the probe. Zero-fill comes from a range LEFT JOIN (m/32 rows —
    an index-build-sized shuffle, paid once); the array assembles as
    sort-by-index + project, all O(n log n). (NOT map_from_entries +
    per-index element_at: Spark map lookup is a LINEAR scan, which
    made the assembly quadratic — measured minutes at 2^24 bits.)"""
    n = m_bits // WORD_BITS
    idx = words.sparkSession.range(n).select(
        F.col("id").cast("int").alias("word_idx")
    )
    dense = idx.join(F.broadcast(words), "word_idx", "left").select(
        "word_idx",
        F.coalesce(F.col("word"), F.lit(0).cast("long")).alias("word"),
    )
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("word_idx", "word"))),
        lambda s: s["word"],
    )
    return dense.groupBy().agg(arr.alias("_bm"))


def bloom_pack(words_rows, m_bits: int = 1 << 17) -> list[int]:
    """Pack COLLECTED (word_idx, word) rows into the dense word list
    (entry ``j`` = global bits [32j, 32j+32), bit ``i`` at weight
    ``1 << (i % 32)``) — for driver-side reuse of a persisted
    bitmap. The hot path (bloom_filter/bloom_semijoin) densifies in
    Spark instead and never collects."""
    packed = [0] * (m_bits // WORD_BITS)
    for r in words_rows:
        packed[int(r["word_idx"])] = int(r["word"])
    return packed


def bloom_contains(
    col: Column,
    packed: list[int],
    m_bits: int = 1 << 17,
    k: int = 3,
    hash: str = "xx64",
) -> Column:
    """Column-level membership predicate against a driver-held
    packed bitmap (small m only: the array literal costs py4j
    seconds beyond ~2^20 bits — use bloom_filter for big bitmaps).
    True = "maybe member" (eps false positives), False = definitely
    absent (the Bloom guarantee)."""
    _check(m_bits, k)
    if len(packed) != m_bits // WORD_BITS:
        raise ValueError(
            f"packed length {len(packed)} != m_bits/32 = {m_bits // WORD_BITS}"
        )
    arr = F.lit([int(w) for w in packed])
    return _bit_test(_hash60(col, hash), arr, m_bits, k)


def bloom_filter(
    df: DataFrame,
    col: str,
    words: DataFrame,
    m_bits: int = 1 << 17,
    k: int = 3,
    hash: str = "xx64",
    _keep_marker: bool = False,
) -> DataFrame:
    """``df`` rows whose ``col`` maybe-belongs to the bitmap — the
    scan-side prune. The words densify to a one-row array that
    rides a broadcast cross join (no shuffle of ``df``, no driver
    round-trip); the hash is evaluated ONCE per row in a projection
    under the filter (FilterExec does no subexpression elimination
    — h1/h2 would otherwise re-hash per position, measured 2.5x)."""
    _check(m_bits, k)
    # same guard as cms_estimate (ADVICE r11): withColumn REPLACES a
    # same-named user column, so a probe frame already carrying one of
    # the internal names would be silently clobbered and then dropped
    clash = {"_h60", "_bm", "_bmk"} & set(df.columns)
    if clash:
        raise ValueError(f"probe columns collide with internals: {clash}")
    dense = bloom_dense(words, m_bits)
    return (
        df.withColumn("_h60", _hash60(F.col(col), hash))
        .crossJoin(F.broadcast(dense))
        .filter(
            F.col(col).isNotNull()
            & _bit_test(F.col("_h60"), F.col("_bm"), m_bits, k)
        )
        # _keep_marker: retain a bitmap-derived column — a downstream
        # residual join whose condition references it cannot be
        # reordered BELOW this filter (PushLeftSemiThroughJoin would
        # otherwise slide the exact semijoin under the bloom and
        # un-prune the probe)
        .withColumn("_bmk", F.size(F.col("_bm")))
        .drop("_h60", "_bm", *([] if _keep_marker else ["_bmk"]))
    )


def bloom_semijoin(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    build_col: str | None = None,
    m_bits: int = 1 << 17,
    k: int = 3,
    hash: str = "xx64",
    broadcast_keys: bool = True,
) -> DataFrame:
    """EXACT ``probe WHERE on IN (SELECT build_col FROM build)`` with
    the bloom as a scan-side pre-filter: build the bitmap (one
    bounded aggregate over the SMALL side), broadcast it densified
    into a probe-side filter, then a final LEFT SEMI join removes
    the eps false positives. Rows the bloom rejects never reach the
    semijoin — at scale that is the entire shuffle saved.
    ``broadcast_keys=False`` for build sides beyond the broadcast
    budget: the residual semijoin then shuffles only the bloom
    SURVIVORS (selectivity x N + eps x N rows), which is the honest
    big-build win."""
    bc = build_col or on
    words = bloom_words(build, bc, m_bits, k, hash)
    pruned = bloom_filter(
        probe, on, words, m_bits, k, hash, _keep_marker=True
    )
    keys = build.select(F.col(bc).alias("_bkey")).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    # pin the semijoin ABOVE the bloom filter: the second conjunct
    # (always true — _bmk >= 0 by construction) references BOTH the
    # bitmap-derived marker and the key side, so it cannot be split
    # or pushed, and PushLeftSemiThroughJoin cannot slide the
    # semijoin under the bloom (which would un-prune the probe).
    # BHJ/SMJ still extract the clean equi-key; the conjunct rides
    # as a residual condition.
    cond = (pruned[on] == keys["_bkey"]) & (
        (pruned["_bmk"] >= 0) | keys["_bkey"].isNull()
    )
    return pruned.join(keys, cond, "left_semi").drop("_bmk")
