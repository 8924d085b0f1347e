"""Media-path throughput bench: decode_images / image_hashes /
audio_feature_rows over generated payloads at a FIXED BYTE BUDGET,
so the Arrow mapInPandas decode tier gets a per-round series like
every SQL operator (VERDICT r9 ask #5 — these paths had never been
timed).

Payload corpora are deterministic and cached under ``.cache/`` like
the ANN indexes: PPM (raw RGB — measures the Arrow plumbing floor),
PNG (zlib + unfilter — the pure-Python kernel cost), WAV (16-bit PCM
frames through the integer DSP features). The generator uses stdlib
zlib/wave only — no test-tier encoders, no external codecs.

Reported numbers are MB/s of PAYLOAD bytes through `.count()` on the
operator output (decode + feature work included, Spark overheads
included — it is the end-to-end number a pipeline sees)."""

from __future__ import annotations

import math
import os
import struct
import time
import zlib

from pyspark.sql import SparkSession

DEFAULT_CACHE = os.path.join(os.path.dirname(__file__), "..", "..", ".cache")

_TWIN_OFFSET = 10_000


def _ppm_payload(seed: int, w: int, h: int) -> bytes:
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray(w * h * 3)
    for i in range(0, len(px), 3):
        v = (seed * 2654435761 + i * 40503) & 0xFFFFFF
        px[i] = v & 0xFF
        px[i + 1] = (v >> 8) & 0xFF
        px[i + 2] = (v >> 16) & 0xFF
    return header + bytes(px)


def _png_payload(seed: int, w: int, h: int) -> bytes:
    """Minimal truecolor PNG via stdlib zlib (filter 0 rows)."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0
        for x in range(w):
            v = (seed * 40503 + (y * w + x) * 2654435761) & 0xFFFFFF
            raw += bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _avi_payload(seed: int, w: int, h: int, n_frames: int) -> bytes:
    """Minimal uncompressed-DIB AVI (bottom-up 24-bit frames, rows
    padded to 4 bytes) — plain RIFF building from the public spec,
    independent of the decoder and of the test suite's writer."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    row_bytes = (w * 3 + 3) & ~3
    frames = []
    for f in range(n_frames):
        rows = bytearray()
        for y in range(h):
            for x in range(w):
                v = (seed * 2654435761 + (f * h + y) * w * 3 + x * 97) & 0xFFFFFF
                rows += bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))
            rows += b"\x00" * (row_bytes - w * 3)
        frames.append(bytes(rows))
    avih = chunk(
        b"avih",
        struct.pack("<IIIII", 100_000, 0, 0, 0, n_frames)
        + struct.pack("<III", 0, 1, 0)
        + struct.pack("<II", w, h)
        + b"\x00" * 16,
    )
    strh = chunk(
        b"strh",
        b"vids" + b"DIB "
        + struct.pack("<IHHI", 0, 0, 0, 0)
        + struct.pack("<IIII", 1, 10, 0, n_frames)
        + struct.pack("<III", 0, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h),
    )
    strf = chunk(
        b"strf",
        struct.pack("<IiiHH", 40, w, h, 1, 24)
        + b"\x00\x00\x00\x00"
        + struct.pack("<IiiII", row_bytes * h, 0, 0, 0, 0),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00db", fr) for fr in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _wav_payload(seed: int, n_samples: int, rate: int = 16000) -> bytes:
    """16-bit mono PCM WAV: deterministic integer triangle-ish wave."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        frames = bytearray()
        for i in range(n_samples):
            v = ((seed * 131 + i * 977) % 20000) - 10000
            frames += struct.pack("<h", v)
        wf.writeframes(bytes(frames))
    return buf.getvalue()


def _ppm_twin_payload(seed: int, w: int, h: int, shift: int = 0) -> bytes:
    """Deterministic RGB noise with every byte in [8, 239], so a
    brightness twin (same seed, shift=+8) never clips — dhash/phash
    are exactly invariant to the shift and the planted pair's Hamming
    distance is 0 by construction."""
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray(w * h * 3)
    for i in range(len(px)):
        v = (seed * 2654435761 + i * 40503) >> 7
        px[i] = 8 + (v % 232) + shift
    return header + bytes(px)


def ensure_media_corpus(
    spark: SparkSession, cache_dir: str = DEFAULT_CACHE
) -> dict[str, tuple[str, int]]:
    """Materialize the three payload tables once; returns
    {kind: (parquet_path, payload_bytes)}."""
    from openset_spark.pipeline.multimodal import MEDIA_SCHEMA

    os.makedirs(cache_dir, exist_ok=True)
    specs = {
        # ~24 MB of raw RGB rows (64 x 128x96 PPMs x ~36 KB)
        "ppm": (
            "media_ppm.parquet",
            [(i, "image", _ppm_payload(i, 128, 96)) for i in range(640)],
        ),
        # ~24 MB compressed / ~94 MB decoded PNG — sized r10 after the
        # numpy fast-path unfilter (155 MB/s single-core) made the old
        # 6 MB corpus a pure Spark-overhead measurement
        "png": (
            "media_png.parquet",
            [(i, "image", _png_payload(i, 128, 96)) for i in range(640)],
        ),
        # ~32 MB of PCM (128 x 128k-sample mono WAVs x 256 KB)
        "wav": (
            "media_wav.parquet",
            [(i, "audio", _wav_payload(i, 131072)) for i in range(128)],
        ),
        # ~14 MB of DIB AVI (48 clips x 6 frames of 128x96x24bpp)
        "avi": (
            "media_avi.parquet",
            [(i, "video", _avi_payload(i, 128, 96, 6)) for i in range(48)],
        ),
        # 320 bases + 320 planted brightness twins (id + _TWIN_OFFSET)
        # for the image_near_dups candidate-join timing + recall check
        "ppm_twins": (
            "media_ppm_twins.parquet",
            [
                (i, "image", _ppm_twin_payload(i, 128, 96))
                for i in range(320)
            ]
            + [
                (
                    _TWIN_OFFSET + i,
                    "image",
                    _ppm_twin_payload(i, 128, 96, shift=8),
                )
                for i in range(320)
            ],
        ),
    }
    out = {}
    for kind, (fname, rows) in specs.items():
        path = os.path.join(cache_dir, fname)
        nbytes = sum(len(p) for _, _, p in rows)
        if not os.path.exists(path):
            df = spark.createDataFrame(
                [
                    (mid, k, bytearray(p), None, None, None, None)
                    for mid, k, p in rows
                ],
                MEDIA_SCHEMA,
            )
            df.repartition(8).write.mode("overwrite").parquet(path)
        out[kind] = (path, nbytes)
    return out


def run_media_bench(
    spark: SparkSession, cache_dir: str = DEFAULT_CACHE, reps: int = 2
) -> dict:
    """Time each media operator over its payload corpus; report
    seconds (min of ``reps``) and MB/s of payload through the op."""
    from openset_spark.pipeline.image_dedup import image_hashes
    from openset_spark.pipeline.multimodal import (
        audio_feature_rows,
        decode_images,
        video_frame_rows,
    )
    from openset_spark.pipeline.scenes import keyframes as _keyframes

    corpora = ensure_media_corpus(spark, cache_dir)
    frames = {k: spark.read.parquet(p) for k, (p, _) in corpora.items()}
    for df in frames.values():
        df.count()  # warm file listings

    def timed(build) -> float:
        best = math.inf
        for _ in range(reps):
            t0 = time.time()
            build().count()
            best = min(best, time.time() - t0)
        return best

    out: dict = {}
    jobs = {
        "decode_ppm": (lambda: decode_images(frames["ppm"]), "ppm"),
        "decode_png": (lambda: decode_images(frames["png"]), "png"),
        "image_hashes_ppm": (
            lambda: image_hashes(decode_images(frames["ppm"])),
            "ppm",
        ),
        "audio_features_wav": (
            lambda: audio_feature_rows(frames["wav"]),
            "wav",
        ),
        "video_frames_avi": (
            lambda: video_frame_rows(frames["avi"]),
            "avi",
        ),
        "video_keyframes_avi": (
            lambda: _keyframes(video_frame_rows(frames["avi"])),
            "avi",
        ),
    }
    for name, (build, kind) in jobs.items():
        sec = timed(build)
        mb = corpora[kind][1] / 1e6
        out[f"{name}_sec"] = round(sec, 3)
        out[f"{name}_mb_per_s"] = round(mb / max(sec, 1e-9), 1)

    # image_near_dups end to end (VERDICT r10 ask #7): hash -> banded
    # candidates -> bit_count re-rank over 320 planted brightness
    # twins + 320 distinct bases; reports the candidate-set size the
    # pigeonhole banding admitted and the planted-pair recall
    from openset_spark.pipeline.image_dedup import (
        hamming_block_candidates,
        image_hashes,
        image_near_dups,
    )
    from openset_spark.pipeline.multimodal import decode_images

    twins = frames["ppm_twins"]
    t0 = time.time()
    pairs = image_near_dups(decode_images(twins), max_hamming=3).collect()
    out["image_near_dups_sec"] = round(time.time() - t0, 3)
    out["image_near_dups_pairs"] = len(pairs)
    planted = {
        frozenset((i, _TWIN_OFFSET + i)) for i in range(320)
    }
    found = {frozenset((r.id_a, r.id_b)) for r in pairs}
    out["image_near_dups_recall"] = round(
        len(planted & found) / len(planted), 3
    )
    out["image_near_dups_candidates"] = hamming_block_candidates(
        image_hashes(decode_images(twins))
    ).count()
    out["ppm_mb"] = round(corpora["ppm"][1] / 1e6, 1)
    out["png_mb"] = round(corpora["png"][1] / 1e6, 1)
    out["wav_mb"] = round(corpora["wav"][1] / 1e6, 1)
    out["avi_mb"] = round(corpora["avi"][1] / 1e6, 1)
    return out
