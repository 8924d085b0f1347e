"""Perceptual image dedup: dHash / pHash over DECODED pixels +
Hamming-banded candidate pairs.

Closes the one dedup modality the pipeline lacked (text has
minhash/simhash/substring, embeddings have SemDeDup; images had only
payload-byte exact dedup, which misses every re-encode/resize). The
reference's media tooling stops at metadata probes (src/mediaprobe,
src/tablepartitioned.cpp ingest routing); the perceptual layer is the
LLM-training-pipeline extension the assignment asks for.

Pipeline shape (all stages 100 TB-safe):

1. ``decode_images`` (multimodal.py) — Arrow ``mapInPandas``, per-row
   decode, no shuffle.
2. ``image_hashes`` — grayscale + area-average resize + dHash/pHash,
   numpy inside the SAME mapInPandas tier; emits one 64-bit LONG per
   image. Per-row cost, no shuffle.
3. ``hamming_block_candidates`` — the simhash pigeonhole: split the
   hash into ``blocks`` equal bit blocks; any pair within Hamming
   distance ``blocks-1`` MUST share a block, so candidates = pairs
   sharing any (block_idx, block_value) bucket. One groupBy, pairs
   generated JVM-side (dedup._bucket_pairs).
4. ``image_near_dups`` — exact Hamming re-rank over candidates via
   ``bit_count(xor)`` (JVM, codegen) and the distance threshold.

Determinism: grayscale is integer Rec.601 (no float luma), the
area-average box sums are exact integers divided once, and the DCT
basis is float64 with a fixed fold order — the hash of a byte string
is a pure function, identical across partitionings and engines.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

IMAGE_HASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
        StructField("phash", LongType()),
    ]
)


def _to_gray(np, px: bytes, w: int, h: int, ch: int):
    """(h, w) int32 grayscale via integer Rec.601 (no float luma)."""
    a = np.frombuffer(px, dtype=np.uint8)
    a = a[: w * h * ch].reshape(h, w, ch).astype(np.int32)
    if ch <= 2:
        # 1 = gray, 2 = gray+alpha (PNG color type 4): luma is
        # channel 0 either way; alpha doesn't enter the hash
        return a[:, :, 0]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    return (299 * r + 587 * g + 114 * b) // 1000


def _area_resize(np, gray, out_h: int, out_w: int):
    """Area-average downsample (float64) with integer box boundaries
    i*h//H — exact, partition-free, and defined for ANY size ratio
    (upsampling repeats pixels; boxes are never empty). Vectorized
    via an int64 integral image: box sums are exact integers, so the
    float64 division gives the same values the per-box loop did."""
    h, w = gray.shape
    ss = np.zeros((h + 1, w + 1), dtype=np.int64)
    ss[1:, 1:] = gray.astype(np.int64).cumsum(axis=0).cumsum(axis=1)
    ys = np.array([(i * h) // out_h for i in range(out_h)] + [h])
    xs = np.array([(j * w) // out_w for j in range(out_w)] + [w])
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    sums = (
        ss[y1][:, x1] - ss[y0][:, x1] - ss[y1][:, x0] + ss[y0][:, x0]
    )
    sizes = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / sizes


def _dct_basis(np, n: int):
    """Orthonormal DCT-II basis matrix C (n x n): C @ x applies the
    1-D transform; C @ X @ C.T the 2-D one. Same cosine kernel as
    jpeg.py's IDCT (which is this basis transposed) — the test suite
    round-trips one through the other as the independent model."""
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    c = np.cos((2 * i + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c


def dhash64(np, gray) -> int:
    """Row-wise gradient hash: resize to 9x8, bit = left pixel >
    right pixel. Invariant to any monotone per-image brightness
    shift (differences keep their sign)."""
    g = _area_resize(np, gray, 8, 9)
    bits = (g[:, :-1] > g[:, 1:]).flatten()
    v = 0
    for idx in range(64):
        if bits[idx]:
            v |= 1 << idx
    return v - (1 << 64) if v >= 1 << 63 else v


def phash64(np, gray) -> int:
    """DCT hash: resize to 32x32, 2-D orthonormal DCT-II, keep the
    top-left 8x8 low-frequency block, bit = coefficient > median of
    the 63 AC coefficients (DC excluded — brightness-shift
    invariant). Bit 63 (the DC slot) is always 0, so the long is
    non-negative."""
    g = _area_resize(np, gray, 32, 32)
    c = _dct_basis(np, 32)
    d = c @ g @ c.T
    block = d[:8, :8].flatten()
    ac = block[1:]
    med = float(np.median(ac))
    v = 0
    for idx in range(63):
        # the epsilon keeps float-noise coefficients (a constant
        # image's AC block is ±1e-13, median likewise) from minting
        # arbitrary bits — a real image's AC energy is orders above
        if float(ac[idx]) > med + 1e-6:
            v |= 1 << idx
    return v


def image_hashes(decoded: DataFrame) -> DataFrame:
    """(media_id, dhash, phash) from a :func:`decode_images` output
    frame. One Arrow batch pass, both hashes off the SAME grayscale
    (the resize work is shared); rows whose pixel buffer is shorter
    than width*height*channels are dropped (corrupt decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, dhs, phs = [], [], []
            for mid, w, h, ch, px in zip(
                pdf["media_id"],
                pdf["width"],
                pdf["height"],
                pdf["channels"],
                pdf["pixels"],
            ):
                w, h, ch = int(w), int(h), int(ch)
                raw = bytes(px or b"")
                if w <= 0 or h <= 0 or len(raw) < w * h * ch:
                    continue
                gray = _to_gray(np, raw, w, h, ch)
                ids.append(mid)
                dhs.append(dhash64(np, gray))
                phs.append(phash64(np, gray))
            yield pd.DataFrame(
                {"media_id": ids, "dhash": dhs, "phash": phs}
            )

    return decoded.mapInPandas(run, IMAGE_HASH_SCHEMA)


def hamming_block_candidates(
    hashes: DataFrame,
    hash_col: str = "phash",
    id_col: str = "media_id",
    blocks: int = 4,
) -> DataFrame:
    """(id_a, id_b) pairs sharing any of ``blocks`` equal-width bit
    blocks of the 64-bit hash — pigeonhole guarantees every pair
    within Hamming distance ``blocks-1`` is a candidate. Same
    bucket-join shape as dedup.simhash_candidates (arithmetic
    shiftright + mask handles the signed bit 63)."""
    from openset_spark.pipeline.dedup import _bucket_pairs

    if blocks < 1 or 64 % blocks != 0:
        # a remainder would leave the top 64 - blocks*(64//blocks)
        # bits outside every block, silently voiding the pigeonhole
        # guarantee for pairs differing only there
        raise ValueError(f"blocks must divide 64: {blocks}")
    width = 64 // blocks
    block_arr = F.array(
        *[
            F.shiftright(F.col(hash_col), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for i in range(blocks)
        ]
    )
    blocked = hashes.select(
        F.col(id_col),
        F.posexplode(block_arr).alias("block_idx", "block_value"),
    )
    return _bucket_pairs(blocked, ["block_idx", "block_value"], id_col)


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hash columns (JVM
    bit_count over xor — stays in codegen)."""
    return F.bit_count(a.bitwiseXOR(b))


def image_near_dups(
    decoded: DataFrame,
    method: str = "phash",
    max_hamming: int = 10,
    blocks: int = 4,
) -> DataFrame:
    """(id_a, id_b, dist) perceptual near-duplicate pairs over a
    decoded-image frame: hash -> Hamming-banded candidates -> exact
    bit_count re-rank. ``max_hamming`` above ``blocks-1`` trades
    recall for candidate volume exactly like simhash (the banding
    only GUARANTEES distance <= blocks-1; beyond that it still finds
    every pair that happens to share a block — raise ``blocks`` for
    a hard guarantee at higher distances)."""
    if method not in ("phash", "dhash"):
        raise ValueError(f"unknown perceptual hash method: {method}")
    hs = image_hashes(decoded).localCheckpoint()
    pairs = hamming_block_candidates(hs, method, "media_id", blocks)
    a = hs.select(
        F.col("media_id").alias("id_a"), F.col(method).alias("_ha")
    )
    b = hs.select(
        F.col("media_id").alias("id_b"), F.col(method).alias("_hb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            hamming(F.col("_ha"), F.col("_hb")).cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= max_hamming)
    )
