"""Deterministic, engine-portable Bloom filter — the SHUFFLE-KILLER
for selective semijoins: build a bounded bitmap over the small
side's keys, ship it into the big side's scan as a pure codegen
predicate, and only the (few) surviving rows ever reach the join
exchange. At 100 TB the difference is the whole game: a plain
``probe SEMI JOIN build`` shuffles every probe row on the key;
bloom-pruned, the scan discards non-members at the source and the
exchange carries ~selectivity x N rows (+ the eps false-positive
tail, which the final exact semijoin removes — results are EXACT,
the bloom is semantically invisible).

Deterministic and portable like its siblings (hll.py, cms.py):

* hash family = the seeded portable 60-bit md5 prefix, so the
  BITMAP ITSELF is oracle-replayable (DuckDB computes identical
  words — the audit path);
* the bitmap is rows (word_idx, word): 32 bits per word in a LONG,
  combined by ``bit_or`` — commutative/associative/idempotent, so
  partials from any split fold to EXACTLY the direct build's words
  (32-bit words keep every shift in-range in BOTH engines: DuckDB
  raises on ``1::BIGINT << 63``);
* the probe predicate is closed-form over a HEX-STRING literal of
  the bitmap (built once from the <= m/32 collected words — the
  NB-model/frozenset closure precedent): k x (substr + conv + &)
  per row, all inside whole-stage codegen, zero Python.

Sizing: false-positive rate ~ (1 - e^{-kn/m})^k; the default
m = 2^17 bits (16 KiB) with k = 3 holds ~1% at n = 10k keys. The
literal is 32 KiB of hex in the plan — broadcast-by-construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def _hash60(col: Column, seed: int) -> Column:
    """Portable seeded 60-bit hash (the cms.py family)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def _check(m_bits: int, k: int) -> None:
    if m_bits < WORD_BITS or m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of 32: {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16]: {k}")


def bloom_words(
    df: DataFrame, col: str, m_bits: int = 1 << 17, k: int = 3
) -> DataFrame:
    """The bitmap as rows (word_idx, word): global bit ``i`` is bit
    ``i % 32`` of word ``i // 32``. One shuffle bounded by m/32 rows
    out (map-side bit_or partials collapse each task to <= m/32
    rows first). NULL keys are skipped (SQL semijoin semantics: NULL
    never matches). Absent word_idx rows mean an all-zero word."""
    _check(m_bits, k)
    positions = F.array(
        *[(_hash60(F.col(col), d) % m_bits).cast("int") for d in range(k)]
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
            # 2^b exactly (b < 32, double-exact); F.shiftleft only
            # takes a literal shift amount
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


def bloom_hex(words_rows, m_bits: int = 1 << 17) -> str:
    """Pack collected (word_idx, word) rows into the hex-string
    bitmap: byte ``j`` (2 hex chars at offset 2j) holds global bits
    [8j, 8j+8), bit ``i`` at weight ``1 << (i % 8)``. Bounded
    driver-side work: m/32 rows -> m/4 hex chars."""
    buf = bytearray(m_bits // 8)
    for r in words_rows:
        idx, word = int(r["word_idx"]), int(r["word"])
        for b in range(4):
            buf[idx * 4 + b] = (word >> (8 * b)) & 0xFF
    return buf.hex()


def bloom_contains(
    col: Column, hex_bitmap: str, m_bits: int = 1 << 17, k: int = 3
) -> Column:
    """Pure-codegen membership predicate: k seeded hashes, each
    testing one bit of the hex literal via substr + conv + bitwise
    AND — no UDF, no join, survives into the scan as a plain
    filter. True = "maybe member" (eps false positives), False =
    definitely absent (the Bloom guarantee)."""
    _check(m_bits, k)
    lit = F.lit(hex_bitmap)
    conds = []
    for d in range(k):
        pos = _hash60(col, d) % m_bits
        byte_idx = (pos / 8).cast("int")
        bit = (pos % 8).cast("int")
        nibble_pair = F.substring(
            lit, byte_idx * 2 + 1, 2
        )  # substring is 1-based
        byte_val = F.conv(nibble_pair, 16, 10).cast("int")
        mask = F.pow(F.lit(2.0), bit).cast("int")  # 2^b, b < 8
        conds.append(byte_val.bitwiseAND(mask) != 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def bloom_semijoin(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    build_col: str | None = None,
    m_bits: int = 1 << 17,
    k: int = 3,
) -> DataFrame:
    """EXACT ``probe WHERE on IN (SELECT build_col FROM build)`` with
    the bloom as a scan-side pre-filter: build the bitmap (one
    bounded aggregate over the SMALL side), collect its <= m/32
    words, inline the hex literal into a probe-side filter, then a
    final LEFT SEMI join (broadcast-eligible: the build keys are by
    premise small) removes the eps false positives. Rows the bloom
    rejects never reach the exchange — at scale that is the entire
    shuffle saved."""
    bc = build_col or on
    words = bloom_words(build, bc, m_bits, k).collect()
    hx = bloom_hex(words, m_bits)
    pruned = probe.filter(bloom_contains(F.col(on), hx, m_bits, k))
    keys = build.select(F.col(bc).alias(on)).distinct()
    return pruned.join(F.broadcast(keys), on, "left_semi")
