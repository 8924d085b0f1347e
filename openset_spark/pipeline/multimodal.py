"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns plus typed
metadata structs; per-item decode/feature work runs in Arrow-batched
``mapInPandas`` so a 100 TB media table streams through Python in
columnar batches (never row-at-a-time).

Decode kernels: formats with pure-Python codecs are REAL — binary
PPM/PGM images (P6/P5), PNG (8/16-bit gray/RGB/gray+A/RGBA +
palettes + Adam7 via stdlib zlib), JPEG in all four entropy/scan
shapes (baseline + progressive Huffman, sequential + progressive
ARITHMETIC via the T.81 QM-coder, CMYK/YCCK 4-component —
``pipeline/jpeg.py``/``jpeg_arith.py``), GIF 87a/89a incl. animation
frame composition (``pipeline/gif.py``), WebP BOTH lossless VP8L and
lossy VP8 (RFC 6386 keyframe decoder, VP8X/ALPH/first-ANMF —
``pipeline/webp.py``/``vp8.py``), AVI MJPEG/DIB video frames
(``pipeline/avi.py``), H.264 Annex-B keyframe extraction (baseline
IDR CAVLC decode, ``pipeline/h264.py``) and RIFF/WAV PCM audio, all
inside the Arrow batches. Codecs that genuinely need native libs
(H.264 inter frames/CABAC, VP9/AV1 video, AV1F/HEIF payloads) stay
stubbed —
``probe_mp4_bytes``/``probe_avif_bytes`` still route them by
metadata; ``deterministic=True`` yields a seeded fake so the Spark
plumbing — schema, batching, partitioning — is testable;
``deterministic=False`` raises NotImplementedError where PIL/ffmpeg
would slot in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_ppm_bytes(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python binary PPM/PGM (P6/P5) decoder ->
    (width, height, channels, row-major pixel bytes). Supports header
    comments and maxval <= 255."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {magic!r}")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    px = data[pos : pos + need]
    if len(px) < need:
        raise ValueError(f"truncated pixel data: {len(px)} < {need}")
    return w, h, channels, bytes(px)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png_bytes(
    data: bytes, keep_16bit: bool = False
) -> tuple[int, int, int, bytes]:
    """Pure-Python PNG decoder (stdlib zlib only) ->
    (width, height, channels, row-major pixel bytes).

    Supports the still-image profile: 8- and 16-BIT gray/RGB/gray+A/
    RGBA, PALETTE images (color type 3 at bit depths 1/2/4/8, PLTE +
    tRNS alpha -> RGB or RGBA output), Adam7 INTERLACING for every
    supported color type, and all five scanline filters
    (None/Sub/Up/Average/Paeth) per the PNG spec §9. IDAT chunks
    concatenate before inflate, as the spec requires.

    16-bit samples are reduced to 8 bits by taking the HIGH byte
    (libpng's 16->8 strip); pass ``keep_16bit=True`` to get the full
    big-endian u16 samples instead (2 bytes per channel)."""
    import struct
    import zlib

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(data):
        length, cid = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if cid == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif cid == b"PLTE":
            plte = body
        elif cid == b"tRNS":
            trns = body
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc32
    if w is None:
        raise ValueError("missing IHDR")
    paletted = ctype == 3
    ok_depth = depth in (1, 2, 4, 8) if paletted else depth in (8, 16)
    if not ok_depth or (not paletted and ctype not in _PNG_CHANNELS) or (
        interlace not in (0, 1)
    ):
        raise ValueError(
            f"unsupported PNG profile: depth={depth} color={ctype} "
            f"interlace={interlace}"
        )
    if paletted and plte is None:
        raise ValueError("invalid PNG: palette image without PLTE")
    channels = 1 if paletted else _PNG_CHANNELS[ctype]
    bpp = max(1, channels * depth // 8)  # filter granularity (bytes)

    def row_stride(pw: int) -> int:
        return (pw * channels * depth + 7) // 8

    raw = zlib.decompress(bytes(idat))

    if interlace == 0 and depth == 8 and not paletted:
        # numpy FAST PATH for the dominant profile (8-bit truecolor/
        # gray, no interlace): whole-row vector unfilter for
        # None/Sub/Up (Sub is a per-lane cumsum — exact, since mod
        # 256 distributes over the sum) and direct array assembly —
        # no per-pixel tuple grid. Average/Paeth rows keep the
        # per-byte loop (true left-dependency). Bit-identical to the
        # general path below, which still serves palette/16-bit/
        # Adam7 (the exact-pixel suites cover every filter on both).
        import numpy as np

        stride = row_stride(w)
        need = h * (stride + 1)
        if len(raw) < need:
            raise ValueError("truncated PNG pixel data")
        mat = np.frombuffer(raw, dtype=np.uint8)[:need].reshape(
            h, stride + 1
        )
        filters = mat[:, 0]
        out_rows = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            f = int(filters[y])
            line = mat[y, 1:].astype(np.int64)
            if f == 0:
                cur = line
            elif f == 1:  # Sub
                cur = np.cumsum(line.reshape(-1, bpp), axis=0).reshape(
                    stride
                )
            elif f == 2:  # Up
                cur = line + prev
            elif f in (3, 4):  # Average/Paeth: sequential left dep
                lb = bytearray(mat[y, 1:].tobytes())
                pb_ = prev.astype(np.uint8).tobytes()
                if f == 3:
                    for i in range(stride):
                        a = lb[i - bpp] if i >= bpp else 0
                        lb[i] = (lb[i] + ((a + pb_[i]) >> 1)) & 0xFF
                else:
                    for i in range(stride):
                        a = lb[i - bpp] if i >= bpp else 0
                        b = pb_[i]
                        c = pb_[i - bpp] if i >= bpp else 0
                        pa, pb2, pc = (
                            abs(b - c), abs(a - c), abs(a + b - 2 * c)
                        )
                        pr = (
                            a if pa <= pb2 and pa <= pc
                            else (b if pb2 <= pc else c)
                        )
                        lb[i] = (lb[i] + pr) & 0xFF
                cur = np.frombuffer(bytes(lb), dtype=np.uint8).astype(
                    np.int64
                )
            else:
                raise ValueError(f"bad scanline filter {f}")
            cur = cur & 0xFF
            out_rows[y] = cur
            prev = cur
        return w, h, channels, out_rows.tobytes()

    def unfilter(pos: int, pw: int, ph: int):
        """One filtered sub-image -> list of unfiltered row buffers."""
        stride = row_stride(pw)
        rows = []
        prev = bytearray(stride)
        for _y in range(ph):
            f = raw[pos]
            line = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += 1 + stride
            if f == 1:  # Sub
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif f == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif f == 3:  # Average
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    line[i] = (line[i] + pr) & 0xFF
            elif f != 0:
                raise ValueError(f"bad scanline filter {f}")
            rows.append(line)
            prev = line
        return rows, pos

    def row_pixels(line: bytearray, pw: int):
        """Row buffer -> per-pixel tuples (channel values or index);
        16-bit channels come out as u16 ints (big-endian pairs)."""
        if depth == 16:
            return [
                tuple(
                    (line[(x * channels + c) * 2] << 8)
                    | line[(x * channels + c) * 2 + 1]
                    for c in range(channels)
                )
                for x in range(pw)
            ]
        if depth == 8:
            return [
                tuple(line[x * channels : (x + 1) * channels])
                for x in range(pw)
            ]
        per_byte = 8 // depth
        mask = (1 << depth) - 1
        out = []
        for x in range(pw):
            b = line[x // per_byte]
            shift = 8 - depth * (x % per_byte + 1)  # MSB-first packing
            out.append(((b >> shift) & mask,))
        return out

    grid = [[None] * w for _ in range(h)]
    p = 0
    if interlace == 0:
        rows, p = unfilter(0, w, h)
        for y, line in enumerate(rows):
            grid[y] = row_pixels(line, w)
    else:
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            rows, p = unfilter(p, pw, ph)
            for ry, line in enumerate(rows):
                for rx, pxv in enumerate(row_pixels(line, pw)):
                    grid[y0 + ry * dy][x0 + rx * dx] = pxv

    if not paletted:
        out = bytearray()
        if depth == 16:
            for y in range(h):
                for pxv in grid[y]:
                    for v in pxv:
                        if keep_16bit:
                            out.append(v >> 8)
                            out.append(v & 0xFF)
                        else:
                            out.append(v >> 8)  # libpng-style strip
        else:
            for y in range(h):
                for pxv in grid[y]:
                    out += bytes(pxv)
        return w, h, channels, bytes(out)

    n_pal = len(plte) // 3
    has_alpha = trns is not None
    out = bytearray()
    for y in range(h):
        for (idx,) in grid[y]:
            if idx >= n_pal:
                raise ValueError("invalid PNG: palette index out of range")
            out += plte[3 * idx : 3 * idx + 3]
            if has_alpha:
                out.append(trns[idx] if idx < len(trns) else 255)
    return w, h, 4 if has_alpha else 3, bytes(out)


def decode_wav_bytes(data: bytes) -> tuple[int, int, int, int, int]:
    """Pure-Python RIFF/WAV PCM header decoder ->
    (sample_rate, channels, bits_per_sample, n_samples, duration_ms)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt: tuple[int, int, int] | None = None
    n_data: int | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _afmt, n_ch, rate, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            n_data = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or n_data is None:
        raise ValueError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    frame = n_ch * (bits // 8)
    n_samples = n_data // frame if frame else 0
    duration_ms = n_samples * 1000 // rate if rate else 0
    return rate, n_ch, bits, n_samples, duration_ms


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    # Deterministic stand-in for a decoded feature vector: bytes -> a
    # repeatable pseudo-embedding. Replace with a real decoder at
    # deployment; the Spark-side contract is identical.
    h = 1469598103934665603
    out = []
    for i in range(dim):
        for b in payload[i::dim] or b"\x00":
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        out.append(((h >> 16) % 100000) / 100000.0)
    return out


def extract_features(
    media: DataFrame, dim: int = 16, deterministic: bool = True
) -> DataFrame:
    """media frame -> (media_id, kind, n_bytes, feature) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in container"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "feature": payloads.map(
                        lambda p: _fake_feature(bytes(p or b""), dim)
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (JVM sequence — the expensive decode happens later in
    extract_features over the exploded plan)."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixels", BinaryType()),  # row-major RGB
    ]
)


def decode_images(
    media: DataFrame, deterministic: bool = True
) -> DataFrame:
    """image rows -> decoded (media_id, width, height, channels,
    pixels) via mapInPandas. PPM/PGM (P6/P5) and PNG payloads decode
    for REAL (pure-Python kernels, same Arrow batch path a PIL
    decoder would use); other codecs fall back to the deterministic
    stub, or raise NotImplementedError with ``deterministic=False``
    where PIL would slot in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            ids, ws, hs, chs, pxs = [], [], [], [], []
            for mid, p, mw, mh in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                raw = bytes(p or b"")
                if raw[:2] in (b"P6", b"P5"):
                    w, h, ch, px = decode_ppm_bytes(raw)
                elif raw[:8] == PNG_SIG:
                    w, h, ch, px = decode_png_bytes(raw)
                elif raw[:2] == JPEG_SIG:
                    from openset_spark.pipeline.jpeg import decode_jpeg_bytes

                    w, h, ch, px = decode_jpeg_bytes(raw)
                elif raw[:6] in (b"GIF87a", b"GIF89a"):
                    from openset_spark.pipeline.gif import decode_gif_bytes

                    w, h, ch, px = decode_gif_bytes(raw)
                elif raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
                    from openset_spark.pipeline.webp import decode_webp_bytes

                    # lossless VP8L AND lossy VP8 (pipeline/vp8.py)
                    # both decode for real, incl. VP8X/ALPH/first
                    # ANMF frame; the deterministic fallback now only
                    # covers corrupt payloads
                    try:
                        w, h, ch, px = decode_webp_bytes(raw)
                    except NotImplementedError:
                        if not deterministic:
                            raise
                        w = int(mw) if mw is not None and mw == mw else 1
                        h = int(mh) if mh is not None and mh == mh else 1
                        ch = 3
                        px = bytes(
                            ((raw or b"\x00") * (w * h * 3))[: w * h * 3]
                        )
                elif not deterministic:
                    raise NotImplementedError(
                        "unsupported image format (AVIF/BMP/TIFF...) — "
                        "requires PIL; not in container"
                    )
                else:
                    w = int(mw) if mw is not None and mw == mw else 1
                    h = int(mh) if mh is not None and mh == mh else 1
                    ch = 3
                    px = bytes(((raw or b"\x00") * (w * h * 3))[: w * h * 3])
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                chs.append(ch)
                pxs.append(px)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "channels": chs,
                    "pixels": pxs,
                }
            )

    return media.mapInPandas(run, DECODED_IMAGE_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("bits", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def decode_audio(
    media: DataFrame, deterministic: bool = True
) -> DataFrame:
    """audio rows -> (media_id, sample_rate, channels, bits,
    n_samples, duration_ms). RIFF/WAV and FLAC payloads decode for
    REAL; other codecs use the metadata stub or raise with
    ``deterministic=False`` where ffmpeg would slot in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            rows = {k: [] for k in (
                "media_id", "sample_rate", "channels", "bits",
                "n_samples", "duration_ms",
            )}
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                raw = bytes(p or b"")
                if raw[:4] == b"RIFF":
                    rate, ch, bits, n, ms = decode_wav_bytes(raw)
                elif raw[:4] == b"fLaC":
                    from openset_spark.pipeline.flac import (
                        decode_flac_bytes,
                    )

                    rate, ch, bits, chans = decode_flac_bytes(raw)
                    n = len(chans[0]) if chans else 0
                    ms = n * 1000 // rate if rate else 0
                elif raw[:4] == b"FORM" and raw[8:12] == b"AIFF":
                    rate, ch, bits, chans = decode_aiff_bytes(raw)
                    n = len(chans[0]) if chans else 0
                    ms = n * 1000 // rate if rate else 0
                elif not deterministic:
                    raise NotImplementedError(
                        "non-WAV audio decode requires ffmpeg; not in container"
                    )
                else:
                    rate, ch, bits = 16000, 1, 16
                    ms = int(dur) if dur is not None and dur == dur else 0
                    n = ms * rate // 1000
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["bits"].append(bits)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(ms)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, AUDIO_SCHEMA)


def resize_images(
    decoded: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """decoded images -> nearest-neighbor resize to (out_w, out_h),
    same schema. The sampling itself is trivially expressible in
    Python over the Arrow batch; at scale the win is that resize runs
    fused in the same stage as decode (no shuffle between them)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for px, w, h, ch in zip(
                pdf["pixels"], pdf["width"], pdf["height"], pdf["channels"]
            ):
                src = bytes(px)
                ch = int(ch)
                buf = bytearray()
                for y in range(out_h):
                    sy = min(int(y * h / out_h), h - 1)
                    for x in range(out_w):
                        sx = min(int(x * w / out_w), w - 1)
                        o = (sy * w + sx) * ch
                        buf += src[o : o + ch]
                out_px.append(bytes(buf))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "channels": pdf["channels"],
                    "pixels": out_px,
                }
            )

    return decoded.mapInPandas(run, DECODED_IMAGE_SCHEMA)


# ------------------------------------------------- video metadata probe
def probe_mp4_bytes(data: bytes) -> dict:
    """ISO BMFF (MP4/MOV) metadata probe — pure box-tree parsing, no
    codec work: brand, duration (mvhd timescale), per-track type,
    codec fourcc and visual dimensions (tkhd fixed-point 16.16).
    This is what a 100 TB video ingest actually needs at catalog
    time: route/filter/sample by duration, resolution and codec
    BEFORE any expensive decode (which stays ffmpeg territory)."""
    import struct as _struct

    def walk(lo: int, hi: int):
        while lo + 8 <= hi:
            size, box = _struct.unpack(">I4s", data[lo : lo + 8])
            body = lo + 8
            if size == 1:  # 64-bit largesize
                size = _struct.unpack(">Q", data[lo + 8 : lo + 16])[0]
                body = lo + 16
            elif size == 0:
                size = hi - lo
            yield box, body, lo + size
            lo += size

    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    out: dict = {"brand": data[8:12].decode("latin1"), "tracks": []}

    def parse_mvhd(b: int):
        ver = data[b]
        if ver == 1:
            ts, dur = _struct.unpack(">IQ", data[b + 20 : b + 32])
        else:
            ts, dur = _struct.unpack(">II", data[b + 12 : b + 20])
        out["duration_ms"] = dur * 1000 // ts if ts else 0

    def parse_trak(lo: int, hi: int):
        trk: dict = {}
        for box, b, e in walk(lo, hi):
            if box == b"tkhd":
                ver = data[b]
                off = b + (32 if ver == 1 else 20)
                w16, h16 = _struct.unpack(">II", data[e - 8 : e])
                trk["width"] = w16 >> 16
                trk["height"] = h16 >> 16
                _ = off
            elif box == b"mdia":
                for box2, b2, e2 in walk(b, e):
                    if box2 == b"hdlr":
                        trk["kind"] = data[b2 + 8 : b2 + 12].decode("latin1")
                    elif box2 == b"minf":
                        for box3, b3, e3 in walk(b2, e2):
                            if box3 == b"stbl":
                                for box4, b4, e4 in walk(b3, e3):
                                    if box4 == b"stsd":
                                        trk["codec"] = data[
                                            b4 + 12 : b4 + 16
                                        ].decode("latin1")
        out["tracks"].append(trk)

    for box, b, e in walk(0, len(data)):
        if box == b"moov":
            for box2, b2, e2 in walk(b, e):
                if box2 == b"mvhd":
                    parse_mvhd(b2)
                elif box2 == b"trak":
                    parse_trak(b2, e2)
    if "duration_ms" not in out:
        raise ValueError("invalid MP4: no moov/mvhd")
    return out


def extract_mp4_h264_keyframe(data: bytes) -> bytes:
    """MP4/ISO-BMFF -> Annex-B byte stream of the FIRST sync sample
    of the first AVC track: avcC parameter sets + the sample's
    length-prefixed NALs converted to start codes. Pure sample-table
    walking (stsd/avcC, stsz, stsc, stco/co64, stss) — feed the
    result to ``pipeline/h264.py::decode_h264_frame`` for the
    container-to-pixels keyframe path of a video ingest."""
    import struct as _struct

    def walk(lo: int, hi: int):
        while lo + 8 <= hi:
            size, box = _struct.unpack(">I4s", data[lo : lo + 8])
            body = lo + 8
            if size == 1:
                size = _struct.unpack(">Q", data[lo + 8 : lo + 16])[0]
                body = lo + 16
            elif size == 0:
                size = hi - lo
            yield box, body, lo + size
            lo += size

    def find(lo, hi, *path):
        for box, b, e in walk(lo, hi):
            if box == path[0]:
                if len(path) == 1:
                    return b, e
                return find(b, e, *path[1:])
        return None

    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    moov = find(0, len(data), b"moov")
    if moov is None:
        raise ValueError("invalid MP4: no moov")
    for box, tb, te in walk(*moov):
        if box != b"trak":
            continue
        stbl = find(tb, te, b"mdia", b"minf", b"stbl")
        if stbl is None:
            continue
        stsd = find(*stbl, b"stsd")
        if stsd is None:
            continue
        # sample entries start after version/flags + entry_count
        entry = stsd[0] + 8
        fourcc = data[entry + 4 : entry + 8]
        if fourcc not in (b"avc1", b"avc3"):
            continue
        # avcC lives inside the visual sample entry after 78 bytes
        avcc = find(entry + 8 + 78, stsd[1], b"avcC")
        if avcc is None:
            raise ValueError("AVC track without avcC configuration")
        b = avcc[0]
        length_size = (data[b + 4] & 3) + 1
        out = bytearray()
        n_sps = data[b + 5] & 0x1F
        p = b + 6
        for _ in range(n_sps):
            (ln,) = _struct.unpack(">H", data[p : p + 2])
            out += b"\x00\x00\x00\x01" + data[p + 2 : p + 2 + ln]
            p += 2 + ln
        n_pps = data[p]
        p += 1
        for _ in range(n_pps):
            (ln,) = _struct.unpack(">H", data[p : p + 2])
            out += b"\x00\x00\x00\x01" + data[p + 2 : p + 2 + ln]
            p += 2 + ln

        # first sync sample index (1-based); no stss => all sync
        sync = 1
        stss = find(*stbl, b"stss")
        if stss is not None:
            cnt = _struct.unpack(">I", data[stss[0] + 4 : stss[0] + 8])[0]
            if cnt:
                sync = _struct.unpack(
                    ">I", data[stss[0] + 8 : stss[0] + 12]
                )[0]

        stsz_b = find(*stbl, b"stsz")
        uniform, n_samples = _struct.unpack(
            ">II", data[stsz_b[0] + 4 : stsz_b[0] + 12]
        )

        def sample_size(i):  # 1-based
            if uniform:
                return uniform
            off = stsz_b[0] + 12 + 4 * (i - 1)
            return _struct.unpack(">I", data[off : off + 4])[0]

        if sync > n_samples:
            raise ValueError("invalid MP4: sync sample out of range")

        # sample -> chunk via stsc runs
        stsc_b = find(*stbl, b"stsc")
        n_runs = _struct.unpack(">I", data[stsc_b[0] + 4 : stsc_b[0] + 8])[0]
        runs = []
        for i in range(n_runs):
            off = stsc_b[0] + 8 + 12 * i
            first_chunk, per_chunk, _desc = _struct.unpack(
                ">III", data[off : off + 12]
            )
            runs.append((first_chunk, per_chunk))
        co = find(*stbl, b"stco")
        if co is not None:
            n_chunks = _struct.unpack(">I", data[co[0] + 4 : co[0] + 8])[0]
            offsets = [
                _struct.unpack(
                    ">I", data[co[0] + 8 + 4 * i : co[0] + 12 + 4 * i]
                )[0]
                for i in range(n_chunks)
            ]
        else:
            co = find(*stbl, b"co64")
            n_chunks = _struct.unpack(">I", data[co[0] + 4 : co[0] + 8])[0]
            offsets = [
                _struct.unpack(
                    ">Q", data[co[0] + 8 + 8 * i : co[0] + 16 + 8 * i]
                )[0]
                for i in range(n_chunks)
            ]

        # walk chunks until the sync sample's chunk
        sample = 1
        for ci in range(1, n_chunks + 1):
            per = runs[0][1]
            for fc, pc in runs:
                if fc <= ci:
                    per = pc
            if sample + per > sync:
                off = offsets[ci - 1]
                for s in range(sample, sync):
                    off += sample_size(s)
                size = sample_size(sync)
                raw = data[off : off + size]
                q = 0
                while q + length_size <= len(raw):
                    ln = int.from_bytes(raw[q : q + length_size], "big")
                    out += b"\x00\x00\x00\x01"
                    out += raw[q + length_size : q + length_size + ln]
                    q += length_size + ln
                return bytes(out)
            sample += per
        raise ValueError("invalid MP4: sync sample beyond chunk map")
    raise ValueError("no AVC video track found")


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("brand", StringType()),
        StructField("duration_ms", LongType()),
        StructField("n_tracks", LongType()),
        StructField("video_codec", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def probe_videos(media: DataFrame) -> DataFrame:
    """video rows -> container metadata via the same Arrow batch path
    the decoders use. MP4/MOV and RIFF/AVI parse for REAL; other
    containers yield nulls. Frame DECODE is real for MJPEG/DIB AVIs
    (`video_frame_rows`); other codecs remain the ffmpeg stub."""

    from openset_spark.pipeline.avi import probe_avi_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p or b"")
                try:
                    meta = probe_mp4_bytes(raw)
                except ValueError:
                    try:
                        meta = probe_avi_bytes(raw)
                    except ValueError:
                        rows.append(
                            (mid, None, None, None, None, None, None)
                        )
                        continue
                vid = next(
                    (t for t in meta["tracks"] if t.get("kind") == "vide"),
                    {},
                )
                rows.append(
                    (
                        mid,
                        meta["brand"],
                        meta["duration_ms"],
                        len(meta["tracks"]),
                        vid.get("codec"),
                        vid.get("width"),
                        vid.get("height"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "brand", "duration_ms", "n_tracks",
                    "video_codec", "width", "height",
                ],
            )

    return media.mapInPandas(run, VIDEO_META_SCHEMA)


_MP3_BITRATES = {  # kbps, MPEG1 layer III / MPEG2 layer III columns
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000)}


def probe_mp3_bytes(data: bytes) -> dict:
    """MPEG audio (MP3) header probe: skips an ID3v2 tag, finds the
    first frame sync, and reads version/layer/bitrate/sample-rate/
    channel mode; duration is the CBR estimate from the audio byte
    count. Catalog-time metadata, no decoding."""
    pos = 0
    if data[:3] == b"ID3":
        sz = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        pos = 10 + sz
    n = len(data)
    while pos + 4 <= n:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
            ver = {3: 1, 2: 2, 0: 2}.get((b1 >> 3) & 0x03)
            layer = 4 - ((b1 >> 1) & 0x03)
            br_idx = (b2 >> 4) & 0x0F
            sr_idx = (b2 >> 2) & 0x03
            if (
                ver is not None and layer == 3 and 0 < br_idx < 15
                and sr_idx < 3
            ):
                bitrate = _MP3_BITRATES[(ver, 3)][br_idx] * 1000
                rate = _MP3_RATES[ver][sr_idx]
                mode = (b3 >> 6) & 0x03
                audio_bytes = n - pos
                return {
                    "mpeg_version": ver,
                    "layer": 3,
                    "bitrate": bitrate,
                    "sample_rate": rate,
                    "channels": 1 if mode == 3 else 2,
                    "duration_ms": audio_bytes * 8000 // bitrate,
                }
        pos += 1
    raise ValueError("not an MPEG audio payload (no frame sync)")


def video_frame_rows(
    media: DataFrame, every_ms: int | None = None, max_frames: int = 64
) -> DataFrame:
    """AVI frame SAMPLING with real pixels: each MJPEG/DIB AVI payload
    expands to decoded frames timestamped on the stream clock; with
    ``every_ms`` only the latest frame at or before each sample
    instant survives — the video analog of `gif_frame_rows` (same
    output schema), real where `frame_sample_plan` only plans.
    H.264 Annex-B elementary streams (start-code payloads) decode
    their first IDR picture through ``pipeline/h264.py`` as frame 0 —
    the keyframe-extraction route of a video ingest. Non-AVI /
    non-Annex-B / non-decodable payloads are skipped, not errors:
    route them to the ffmpeg tier via `probe_videos` metadata."""
    import struct

    from openset_spark.pipeline.avi import AVI_SIG, decode_avi_frames
    from openset_spark.pipeline.h264 import decode_h264_frame, h264_to_rgb

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p or b"")
                if raw[:4] == b"\x00\x00\x00\x01" or raw[:3] == b"\x00\x00\x01":
                    try:
                        w, h, y, u, v = decode_h264_frame(raw)
                        px = h264_to_rgb(w, h, y, u, v)
                    except (ValueError, NotImplementedError, IndexError):
                        continue
                    rows.append((mid, 0, 0, w, h, 3, px))
                    continue
                if len(raw) >= 12 and raw[4:8] == b"ftyp":
                    # MP4: first AVC sync sample -> Annex-B -> decode
                    try:
                        annexb = extract_mp4_h264_keyframe(raw)
                        w, h, y, u, v = decode_h264_frame(annexb)
                        px = h264_to_rgb(w, h, y, u, v)
                    except (ValueError, NotImplementedError, IndexError,
                            struct.error):
                        continue
                    rows.append((mid, 0, 0, w, h, 3, px))
                    continue
                if raw[:4] != AVI_SIG or raw[8:12] != b"AVI ":
                    continue
                try:
                    w, h, frames = decode_avi_frames(raw, max_frames=max_frames)
                except ValueError:
                    continue
                timeline = [
                    (i, ts, ch, px) for i, (ts, ch, px) in enumerate(frames)
                ]
                if every_ms and timeline:
                    # sample through the LAST frame's display period
                    period = (
                        timeline[1][1] - timeline[0][1]
                        if len(timeline) > 1
                        else every_ms
                    )
                    total = timeline[-1][1] + max(period, 1)
                    picked = []
                    t = 0
                    while t < max(total, 1):
                        cand = [f for f in timeline if f[1] <= t]
                        if cand:
                            picked.append(cand[-1])
                        t += every_ms
                    seen = set()
                    timeline = [
                        f for f in picked
                        if not (f[0] in seen or seen.add(f[0]))
                    ]
                for i, ts, ch, px in timeline:
                    rows.append((mid, i, ts, w, h, ch, px))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "ts_ms", "width", "height",
                    "channels", "pixels",
                ],
            )

    return media.mapInPandas(run, GIF_FRAME_SCHEMA)


GIF_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixels", BinaryType()),
    ]
)


def gif_frame_rows(
    media: DataFrame, every_ms: int | None = None, max_frames: int = 64
) -> DataFrame:
    """Animated-GIF frame SAMPLING with real pixels: each GIF payload
    expands to composed RGBA frames (disposal semantics applied)
    timestamped by the accumulated frame delays; with ``every_ms``
    only the latest frame at or before each sample instant survives —
    the GIF analog of `frame_sample_plan`, except the frames are
    decoded, not planned. Non-GIF rows are skipped."""
    from openset_spark.pipeline.gif import GIF_SIGS, decode_gif_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p or b"")
                if raw[:6] not in GIF_SIGS:
                    continue
                w, h, frames = decode_gif_frames(raw, max_frames=max_frames)
                ts = 0
                timeline = []
                for i, (delay, px) in enumerate(frames):
                    timeline.append((i, ts, px))
                    ts += delay if delay > 0 else 100  # GIF default tick
                if every_ms:
                    total = ts
                    picked = []
                    t = 0
                    while t < max(total, 1):
                        cand = [f for f in timeline if f[1] <= t]
                        if cand:
                            picked.append(cand[-1])
                        t += every_ms
                    # dedupe consecutive repeats, keep order
                    seen = set()
                    timeline = [
                        f for f in picked
                        if not (f[0] in seen or seen.add(f[0]))
                    ]
                for i, t, px in timeline:
                    rows.append((mid, i, t, w, h, 4, px))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "ts_ms", "width", "height",
                    "channels", "pixels",
                ],
            )

    return media.mapInPandas(run, GIF_FRAME_SCHEMA)


def probe_avif_bytes(data: bytes) -> dict:
    """AVIF/HEIF still-image metadata probe — the same ISO-BMFF
    box-tree parsing as ``probe_mp4_bytes``, reading the item
    properties instead of movie tracks: brand, pixel dimensions from
    the ``ispe`` property, and the coded format from the codec config
    box present in ``ipco`` (``av1C`` -> av01, ``hvcC`` -> hvc1).
    AV1/HEVC payload decode is native-codec territory (an explicit
    stub in decode_images); this probe is the route/filter step a
    catalog needs before deciding what to hand to one."""
    import struct as _struct

    def walk(lo: int, hi: int):
        while lo + 8 <= hi:
            size, box = _struct.unpack(">I4s", data[lo : lo + 8])
            body = lo + 8
            if size == 1:
                size = _struct.unpack(">Q", data[lo + 8 : lo + 16])[0]
                body = lo + 16
            elif size == 0:
                size = hi - lo
            yield box, body, lo + size
            lo += size

    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    out: dict = {
        "brand": data[8:12].decode("latin1"),
        "codec": None,
        "width": None,
        "height": None,
    }

    def parse_ipco(lo: int, hi: int):
        for box, b, e in walk(lo, hi):
            if box == b"ispe" and out["width"] is None:
                w, h = _struct.unpack(">II", data[b + 4 : b + 12])
                out["width"], out["height"] = w, h
            elif box == b"av1C":
                out["codec"] = "av01"
            elif box == b"hvcC":
                out["codec"] = "hvc1"

    for box, b, e in walk(0, len(data)):
        if box == b"meta":  # fullbox: 4 version/flags bytes
            for box2, b2, e2 in walk(b + 4, e):
                if box2 == b"iprp":
                    for box3, b3, e3 in walk(b2, e2):
                        if box3 == b"ipco":
                            parse_ipco(b3, e3)
    if out["width"] is None:
        raise ValueError("invalid AVIF/HEIF: no ispe property")
    return out


def wav_samples(data: bytes) -> tuple[int, int, int, list[list[int]]]:
    """RIFF/WAV PCM sample extraction -> (rate, channels, bits,
    per-channel integer sample lists). 8-bit PCM is unsigned per the
    spec and is re-centered to signed (-128..127); 16/24/32-bit are
    little-endian two's complement. Deinterleaves into one list per
    channel so windowed DSP never mixes channels."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt: tuple[int, int, int] | None = None
    payload: bytes | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _afmt, n_ch, rate, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM width {bits}")
    step = bits // 8
    frame = n_ch * step
    n_frames = len(payload) // frame if frame else 0
    if bits in (8, 16, 32) and n_frames:
        # numpy fast path: native dtypes deinterleave as one strided
        # view (values identical to the per-sample loop — same
        # two's-complement reads, same 8-bit recentering). 24-bit has
        # no native dtype and keeps the loop.
        import numpy as np

        dt = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
        flat = np.frombuffer(
            payload[: n_frames * frame], dtype=dt
        ).reshape(n_frames, n_ch)
        if bits == 8:
            flat = flat.astype(np.int64) - 128
        return rate, n_ch, bits, [
            flat[:, c].tolist() for c in range(n_ch)
        ]
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    for i in range(n_frames):
        base = i * frame
        for c in range(n_ch):
            raw = payload[base + c * step : base + (c + 1) * step]
            if bits == 8:
                chans[c].append(raw[0] - 128)
            else:
                chans[c].append(
                    int.from_bytes(raw, "little", signed=True)
                )
    return rate, n_ch, bits, chans


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("channel", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n", LongType()),
        StructField("rms", DoubleType()),
        StructField("zcr", LongType()),
        StructField("peak", LongType()),
    ]
)


def audio_feature_rows(
    media: DataFrame, frame: int = 1024
) -> DataFrame:
    """Windowed audio features over WAV payload rows: per (media,
    channel, non-overlapping frame of ``frame`` samples) -> RMS,
    zero-crossing count (strict sign flips) and peak |amplitude|.
    The VAD/energy-gate front end of an audio training pipeline —
    silence trimming, clipping detection and speech/music heuristics
    all key off these three.

    Integer DSP: the squared sum is exact (python ints), RMS is the
    single IEEE sqrt(sumsq/n) at the end — deterministic across
    platforms. Non-WAV audio raises like decode_audio (probe + route
    tier). Arrow-batched via mapInPandas; each payload expands to
    n_samples/frame rows, so partition counts follow payload bytes,
    not row counts."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            out = {
                "media_id": [],
                "channel": [],
                "frame_idx": [],
                "n": [],
                "rms": [],
                "zcr": [],
                "peak": [],
            }
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                if raw is None:
                    continue
                b = bytes(raw)
                if b[:4] == b"fLaC":
                    from openset_spark.pipeline.flac import (
                        decode_flac_bytes,
                    )

                    _rate, n_ch, _bits, chans = decode_flac_bytes(b)
                elif b[:4] == b"FORM" and b[8:12] == b"AIFF":
                    _rate, n_ch, _bits, chans = decode_aiff_bytes(b)
                else:
                    _rate, n_ch, _bits, chans = wav_samples(b)
                for c in range(n_ch):
                    xs = chans[c]
                    if _bits <= 16 and xs:
                        # numpy fast path: s*s <= 2^30, so int64
                        # frame sums are exact for any sane frame
                        # size; np.sqrt and math.sqrt are both the
                        # correctly-rounded IEEE sqrt, so values are
                        # bit-identical to the loop below (which
                        # stays for 24/32-bit samples, whose squares
                        # could overflow the int64 accumulator)
                        import numpy as np

                        arr = np.asarray(xs, dtype=np.int64)
                        for f0 in range(0, len(arr), frame):
                            wn = arr[f0 : f0 + frame]
                            sumsq = int((wn * wn).sum())
                            zcr = int((wn[:-1] * wn[1:] < 0).sum())
                            peak = int(np.abs(wn).max())
                            out["media_id"].append(int(mid))
                            out["channel"].append(c)
                            out["frame_idx"].append(f0 // frame)
                            out["n"].append(len(wn))
                            out["rms"].append(math.sqrt(sumsq / len(wn)))
                            out["zcr"].append(zcr)
                            out["peak"].append(peak)
                        continue
                    for f0 in range(0, len(xs), frame):
                        win = xs[f0 : f0 + frame]
                        sumsq = 0
                        zcr = 0
                        peak = 0
                        prev = 0
                        for j, s in enumerate(win):
                            sumsq += s * s
                            a = -s if s < 0 else s
                            if a > peak:
                                peak = a
                            if j > 0 and prev * s < 0:
                                zcr += 1
                            prev = s
                        out["media_id"].append(int(mid))
                        out["channel"].append(c)
                        out["frame_idx"].append(f0 // frame)
                        out["n"].append(len(win))
                        out["rms"].append(math.sqrt(sumsq / len(win)))
                        out["zcr"].append(zcr)
                        out["peak"].append(peak)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def decode_aiff_bytes(
    data: bytes,
) -> tuple[int, int, int, list[list[int]]]:
    """AIFF (the big-endian IFF cousin of WAV) -> the `wav_samples`
    contract: (rate, channels, bits, per-channel sample lists).
    Parses FORM/AIFF, COMM (channels, frames, bits, 80-bit extended-
    float sample rate — decoded exactly: rate = mantissa >>
    (63 - (exp - 16383))) and SSND (offset/blockSize headers then
    big-endian two's-complement frames)."""
    import struct

    if data[:4] != b"FORM" or data[8:12] != b"AIFF":
        raise ValueError("not an AIFF payload")
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack(">I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            n_ch, n_frames, bits = struct.unpack(">hIh", body[:8])
            # 80-bit IEEE 754 extended float, always integral for
            # real sample rates -> exact integer extraction
            exp = struct.unpack(">H", body[8:10])[0] & 0x7FFF
            mant = int.from_bytes(body[10:18], "big")
            rate = mant >> (63 - (exp - 16383)) if exp else 0
            comm = (n_ch, n_frames, bits, rate)
        elif cid == b"SSND":
            offset, _blk = struct.unpack(">II", body[:8])
            ssnd = body[8 + offset :]
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("missing COMM/SSND chunk")
    n_ch, n_frames, bits, rate = comm
    step = (bits + 7) // 8
    frame = n_ch * step
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    for i in range(min(n_frames, len(ssnd) // frame)):
        base = i * frame
        for c in range(n_ch):
            raw = ssnd[base + c * step : base + (c + 1) * step]
            chans[c].append(int.from_bytes(raw, "big", signed=True))
    return rate, n_ch, bits, chans
