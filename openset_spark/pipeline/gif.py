"""Pure-Python GIF (87a/89a) still-image decoder.

The third big web-corpus raster format (after JPEG/PNG): palette
images with GIF-variant LZW compression, optional interlacing and a
transparency index from the 89a graphic-control extension. Decodes
the FIRST frame (training-data pipelines treat animations as
video-ish media — `frame_sample_plan` handles cadence); the frame
count is exposed via `gif_frame_count` for that routing decision.

Entry point: ``decode_gif_bytes(data) -> (width, height, channels,
row-major pixel bytes)`` — the same contract as the PPM/PNG/JPEG
kernels. channels = 4 (RGBA) when the first frame declares a
transparent index, else 3.
"""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")


class _BitReaderLSB:
    """GIF packs LZW codes least-significant-bit first."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bits = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("invalid GIF: LZW stream exhausted")
            self.bits |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.bits & ((1 << n) - 1)
        self.bits >>= n
        self.nbits -= n
        return v


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytes:
    """GIF-variant LZW: clear/EOI codes, code width grows 3..12 bits,
    dictionary resets on clear."""
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _BitReaderLSB(data)

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while len(out) < max_pixels:
        code = reader.read(code_size)
        if code == clear:
            table = fresh()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("invalid GIF: LZW code out of range")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:max_pixels])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indices: bytes, w: int, h: int) -> bytes:
    out = bytearray(w * h)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for row in range(start, h, step):
            out[row * w : (row + 1) * w] = indices[src : src + w]
            src += w
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


def _parse(data: bytes):
    """Yield first-frame pixels and frame count in one walk."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (missing signature)")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    transparent = None
    first = None  # (fw, fh, left, top, palette, indices, transparent)
    frames = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = _sub_blocks(data, pos)
                if len(blk) >= 4 and blk[0] & 0x01:
                    transparent = blk[3]
                else:
                    transparent = None
            else:
                _, pos = _sub_blocks(data, pos)
            continue
        if b == 0x2C:  # image descriptor
            left, top, fw, fh, iflags = struct.unpack(
                "<HHHHB", data[pos : pos + 9]
            )
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = data[pos : pos + 3 * n]
                pos += 3 * n
            if pal is None:
                raise ValueError("invalid GIF: no color table")
            mcs = data[pos]
            pos += 1
            lzw, pos = _sub_blocks(data, pos)
            frames += 1
            if first is None:
                idx = _lzw_decode(mcs, lzw, fw * fh)
                if len(idx) < fw * fh:
                    raise ValueError("invalid GIF: truncated image data")
                if iflags & 0x40:
                    idx = _deinterlace(idx, fw, fh)
                first = (fw, fh, left, top, pal, idx, transparent)
            continue
        raise ValueError(f"invalid GIF: unknown block 0x{b:02x}")
    if first is None:
        raise ValueError("invalid GIF: no image data")
    return w, h, first, frames


def gif_frame_count(data: bytes) -> int:
    return _parse(data)[3]


def decode_gif_bytes(data: bytes) -> tuple[int, int, int, bytes]:
    """First frame -> (width, height, channels, row-major pixels),
    composed onto the logical screen (frames can be smaller and
    offset; the off-frame area is palette entry 0, fully transparent
    when a transparency index applies)."""
    w, h, (fw, fh, left, top, pal, idx, transparent), _ = _parse(data)

    def color(i: int) -> bytes:
        rgb = pal[3 * i : 3 * i + 3]
        if len(rgb) < 3:
            rgb = b"\x00\x00\x00"
        if transparent is None:
            return rgb
        return rgb + (b"\x00" if i == transparent else b"\xff")

    ch = 3 if transparent is None else 4
    lut = [color(i) for i in range(len(pal) // 3)]
    blank = (
        lut[0] if transparent is None else lut[0][:3] + b"\x00"
    )
    rows = []
    for y in range(h):
        if top <= y < top + fh:
            src = idx[(y - top) * fw : (y - top + 1) * fw]
            row = (
                blank * left
                + b"".join(lut[i] for i in src)
                + blank * (w - left - fw)
            )
        else:
            row = blank * w
        rows.append(row)
    return w, h, ch, b"".join(rows)


def decode_gif_frames(
    data: bytes, max_frames: int | None = None
) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Animated GIF -> (width, height, [(delay_ms, RGBA pixels)...]):
    every frame fully COMPOSED onto the logical screen with the 89a
    disposal semantics (1/0 keep, 2 restore-background-as-transparent,
    3 restore-previous) and per-frame transparency, so downstream
    frame sampling sees what a viewer sees, not raw sub-rectangles.
    Frames are RGBA (animations almost always involve transparency
    between frames)."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (missing signature)")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n

    canvas = bytearray(w * h * 4)  # transparent black
    frames: list[tuple[int, bytes]] = []
    transparent = None
    disposal = 0
    delay_ms = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            label = data[pos]
            pos += 1
            if label == 0xF9:
                blk, pos = _sub_blocks(data, pos)
                if len(blk) >= 4:
                    disposal = (blk[0] >> 2) & 0x07
                    transparent = blk[3] if blk[0] & 0x01 else None
                    delay_ms = struct.unpack("<H", blk[1:3])[0] * 10
            else:
                _, pos = _sub_blocks(data, pos)
            continue
        if b == 0x2C:
            left, top, fw, fh, iflags = struct.unpack(
                "<HHHHB", data[pos : pos + 9]
            )
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = data[pos : pos + 3 * n]
                pos += 3 * n
            if pal is None:
                raise ValueError("invalid GIF: no color table")
            mcs = data[pos]
            pos += 1
            lzw, pos = _sub_blocks(data, pos)
            idx = _lzw_decode(mcs, lzw, fw * fh)
            if iflags & 0x40:
                idx = _deinterlace(idx, fw, fh)
            saved = bytes(canvas) if disposal == 3 else None
            region = (left, top, fw, fh)
            for y in range(fh):
                cy = top + y
                if cy >= h:
                    break
                for x in range(fw):
                    cx = left + x
                    if cx >= w:
                        break
                    i = idx[y * fw + x]
                    if transparent is not None and i == transparent:
                        continue
                    j = (cy * w + cx) * 4
                    canvas[j : j + 3] = pal[3 * i : 3 * i + 3]
                    canvas[j + 3] = 255
            frames.append((delay_ms, bytes(canvas)))
            if max_frames is not None and len(frames) >= max_frames:
                return w, h, frames
            if disposal == 2:  # restore background = transparent
                lft, tp, rw, rh = region
                for y in range(rh):
                    cy = tp + y
                    if cy >= h:
                        break
                    j0 = (cy * w + lft) * 4
                    span = min(rw, w - lft)
                    canvas[j0 : j0 + span * 4] = b"\x00" * (span * 4)
            elif disposal == 3 and saved is not None:
                canvas = bytearray(saved)
            transparent = None
            disposal = 0
            continue
        raise ValueError(f"invalid GIF: unknown block 0x{b:02x}")
    if not frames:
        raise ValueError("invalid GIF: no image data")
    return w, h, frames
