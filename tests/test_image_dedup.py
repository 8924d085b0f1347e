"""Perceptual image dedup (pipeline/image_dedup.py): dHash/pHash over
decoded pixels, Hamming-banded candidates, exact bit_count re-rank.
Pytest-tier like BPE (no binary testdata -> no registry oracle):
in-test encoded images, resize/re-encode/brightness twins found,
distinct images not; the DCT basis is cross-checked against jpeg.py's
independent IDCT transcription (the r9 dequant-x16 lesson: never
trust a transform verified only against its own mirror)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openset_spark.pipeline.image_dedup import (
    _area_resize,
    _dct_basis,
    dhash64,
    hamming_block_candidates,
    image_hashes,
    image_near_dups,
    phash64,
)


_AMPS = {
    (u, v): ((-1) ** (u + v)) * (10 + 3 * u + 5 * v)
    for u in range(8)
    for v in range(8)
    if (u, v) != (0, 0)
}
_SMAX = sum(abs(a) for a in _AMPS.values())


def _pattern(x, y, w, h):
    """Spectrally RICH low-band pattern, sampled by pixel center in
    unit coordinates — the same underlying image at any resolution,
    with EVERY 8x8 DCT coefficient carrying distinct energy (a
    too-smooth pattern leaves most AC coefficients ~0, whose
    median-comparison bits are sampling noise — that is a property
    of sparse synthetic images, not of the hash)."""
    s = 0.0
    for (u, v), a in _AMPS.items():
        s += (
            a
            * np.cos(np.pi * u * (x + 0.5) / w)
            * np.cos(np.pi * v * (y + 0.5) / h)
        )
    return max(0, min(255, int(128 + 880 * s / _SMAX)))


def _ppm(w, h, fn, shift=0):
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            g = max(0, min(255, fn(x, y, w, h) + shift))
            px += bytes((g, g, g))
    return header + bytes(px)


def _media(spark, rows):
    from openset_spark.pipeline.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(
        [
            (mid, "image", bytearray(payload), "image/ppm", None, None, None)
            for mid, payload in rows
        ],
        MEDIA_SCHEMA,
    )


def _decoded(spark, rows):
    from openset_spark.pipeline.multimodal import decode_images

    return decode_images(_media(spark, rows), deterministic=False)


def test_dct_basis_matches_jpeg_idct_transcription():
    """Independent model: the forward DCT basis must be the transpose
    pair of jpeg.py's T.81 A.3.3 IDCT basis (same kernel, derived
    separately) and round-trip through it to identity."""
    from openset_spark.pipeline.jpeg import _A

    c8 = _dct_basis(np, 8)
    np.testing.assert_allclose(c8, _A, atol=1e-12)
    rng_free = np.arange(64, dtype=np.float64).reshape(8, 8) * 3.7 - 100
    coeffs = c8 @ rng_free @ c8.T
    back = _A.T @ coeffs @ _A  # jpeg's inverse
    np.testing.assert_allclose(back, rng_free, atol=1e-9)
    # orthonormality (Parseval)
    np.testing.assert_allclose(c8 @ c8.T, np.eye(8), atol=1e-12)


def test_area_resize_exact_on_block_constant_image():
    g = np.repeat(np.repeat(np.array([[10.0, 50.0], [90.0, 130.0]]), 8, 0), 8, 1)
    out = _area_resize(np, g, 2, 2)
    np.testing.assert_allclose(out, [[10, 50], [90, 130]])
    # identity resize
    np.testing.assert_allclose(_area_resize(np, g, 16, 16), g)


def test_hashes_invariant_to_brightness_shift():
    # clip the fixture into [0, 230] so the +25 shift cannot clamp —
    # the invariance claim is exact only without saturation
    g = np.array(
        [[min(_pattern(x, y, 40, 30), 230) for x in range(40)] for y in range(30)],
        dtype=np.int32,
    )
    assert dhash64(np, g) == dhash64(np, g + 25)
    assert phash64(np, g) == phash64(np, g + 25)
    # and the hash is a pure function (same input twice)
    assert phash64(np, g.copy()) == phash64(np, g)


def test_resize_and_reencode_twins_found_distinct_not(spark):
    base = _ppm(64, 48, _pattern)
    resized = _ppm(40, 32, _pattern)          # same image, new raster
    bright = _ppm(64, 48, _pattern, shift=18)  # re-exposed
    other = _ppm(
        64, 48,
        lambda x, y, w, h: (x * 7 + (y * y) // 3 + (x * y) // 5) % 256,
    )  # high-frequency, genuinely different
    rows = [(1, base), (2, resized), (3, bright), (4, other)]
    dups = image_near_dups(
        _decoded(spark, rows), method="phash", max_hamming=10
    )
    got = {(r.id_a, r.id_b) for r in dups.collect()}
    assert (1, 2) in got
    assert (1, 3) in got
    assert (2, 3) in got
    assert not any(4 in p for p in got)


def test_dhash_near_dups_and_distance_column(spark):
    rows = [
        (1, _ppm(64, 48, _pattern)),
        (2, _ppm(48, 36, _pattern)),
        (3, _ppm(
            64, 48,
            lambda x, y, w, h: (255 - x * 5 + y * 11) % 256,
        )),
    ]
    out = {
        (r.id_a, r.id_b): r.dist
        for r in image_near_dups(
            _decoded(spark, rows), method="dhash", max_hamming=8
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)] <= 8
    assert not any(3 in p for p in out)


def test_hamming_block_candidates_pigeonhole(spark):
    """Pairs within Hamming distance blocks-1 are GUARANTEED
    candidates, including across the signed top block."""
    h0 = -(1 << 63) | (0x5A5A << 16) | 0x0F0F
    flip3 = h0 ^ (1 << 2) ^ (1 << 21) ^ (1 << 40)  # 3 bits, 3 blocks
    far = ~h0 & ((1 << 64) - 1)
    far = far - (1 << 64) if far >= 1 << 63 else far  # all 64 bits differ
    hashes = spark.createDataFrame(
        [(1, h0), (2, flip3), (3, far)], "media_id long, phash long"
    )
    got = {
        (r.id_a, r.id_b)
        for r in hamming_block_candidates(hashes, "phash").collect()
    }
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_exact_hamming_via_bit_count(spark):
    from openset_spark.pipeline.image_dedup import hamming

    df = spark.createDataFrame(
        [(0x0F, 0xF0), (-1, 0), (123456789, 123456789)], "a long, b long"
    )
    got = [r.d for r in df.select(hamming(F.col("a"), F.col("b")).alias("d")).collect()]
    assert got == [8, 64, 0]


def test_image_hashes_skips_corrupt_rows(spark):
    from openset_spark.pipeline.multimodal import DECODED_IMAGE_SCHEMA

    decoded = spark.createDataFrame(
        [
            (1, 4, 4, 3, bytearray(b"\x80" * 48)),
            (2, 4, 4, 3, bytearray(b"\x00" * 5)),  # truncated buffer
        ],
        DECODED_IMAGE_SCHEMA,
    )
    out = image_hashes(decoded).collect()
    assert [r.media_id for r in out] == [1]
    # a constant image has no gradient and no AC energy
    assert out[0].dhash == 0 and out[0].phash == 0


def test_image_near_dups_rejects_unknown_method(spark):
    with pytest.raises(ValueError):
        image_near_dups(_decoded(spark, [(1, _ppm(8, 8, _pattern))]), method="md5")


def test_gray_alpha_two_channel_rows_hash_not_crash(spark):
    """PNG color type 4 decodes to channels=2 (gray+alpha); _to_gray
    must use channel 0 instead of indexing a missing channel 2 and
    killing the whole Spark task (ADVICE r10). The alpha plane must
    not affect the hash: the same gray pixels with different alphas
    hash identically."""
    from openset_spark.pipeline.multimodal import DECODED_IMAGE_SCHEMA

    w = h = 24
    gray = bytes(
        _pattern(x, y, w, h) for y in range(h) for x in range(w)
    )

    def interleave(alpha):
        out = bytearray()
        for g in gray:
            out += bytes((g, alpha))
        return bytes(out)

    rows = [
        (1, w, h, 2, bytearray(interleave(255))),
        (2, w, h, 2, bytearray(interleave(7))),
        (3, w, h, 1, bytearray(gray)),
    ]
    decoded = spark.createDataFrame(rows, DECODED_IMAGE_SCHEMA)
    got = {r.media_id: (r.dhash, r.phash) for r in image_hashes(decoded).collect()}
    assert set(got) == {1, 2, 3}
    # alpha ignored AND gray+alpha == pure gray for identical luma
    assert got[1] == got[2] == got[3]


def test_hamming_block_candidates_rejects_non_divisor_blocks(spark):
    hashes = spark.createDataFrame(
        [(1, 0), (2, 1)], "media_id long, phash long"
    )
    with pytest.raises(ValueError, match="divide 64"):
        hamming_block_candidates(hashes, blocks=3)
    with pytest.raises(ValueError, match="divide 64"):
        hamming_block_candidates(hashes, blocks=0)


def test_real_gray_alpha_png_flows_end_to_end(spark):
    """A genuine color-type-4 PNG (gray+alpha) through decode_images
    -> image_hashes: decode emits channels=2 and the hash equals the
    pure-gray twin's (alpha ignored) — the full ADVICE-r10 path, not
    just the _to_gray unit."""
    import struct
    import zlib

    from openset_spark.pipeline.multimodal import MEDIA_SCHEMA, decode_images

    w = h = 24

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def png(color_type, row_px):
        raw = b""
        for y in range(h):
            raw += b"\x00" + bytes(row_px(y))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0),
            )
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def gray(x, y):
        return _pattern(x, y, w, h)

    ga = png(4, lambda y: [v for x in range(w) for v in (gray(x, y), 7)])
    g = png(0, lambda y: [gray(x, y) for x in range(w)])
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(ga), "image/png", None, None, None),
            (2, "image", bytearray(g), "image/png", None, None, None),
        ],
        MEDIA_SCHEMA,
    )
    decoded = decode_images(media, deterministic=False)
    chans = {r.media_id: r.channels for r in decoded.select("media_id", "channels").collect()}
    assert chans == {1: 2, 2: 1}
    hs = {r.media_id: (r.dhash, r.phash) for r in image_hashes(decoded).collect()}
    assert hs[1] == hs[2]
