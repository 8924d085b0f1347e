"""Pure-Python WebP LOSSLESS (VP8L) decoder.

WebP ships two codecs: lossy VP8 (a DCT video-intra codec — stays a
stub, like video) and the self-contained lossless VP8L bitstream
decoded here from the public container/bitstream specification:
LSB-first bit packing, canonical prefix (huffman) codes including the
RLE-coded code-length codes, meta-prefix tiling, LZ77 backward
references with the 2D distance neighborhood, the color cache, and
all four transforms (predictor, color, subtract-green,
color-indexing with pixel bundling) inverted in reverse order.

Verification: exact-pixel round-trips against an in-test VP8L
ENCODER (tests/test_webp.py) across transforms, cache sizes, meta
groups and LZ77 shapes — the two sides share only this module's
constant tables, so entropy/transform coding is exercised from both
directions. The 2D distance-map ordering and predictor edge rules
are transcribed from the published spec; container-in-the-wild
quirks (EXIF/alpha chunks) are out of scope.

Entry point: ``decode_webp_bytes(data) -> (width, height, channels,
row-major pixels)`` — same contract as the PPM/PNG/JPEG/GIF kernels;
channels is 4 when the stream declares alpha, else 3.
"""

from __future__ import annotations

import struct

# code-length-code read order (spec §5.2.2)
CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)

# 2D offsets for distance codes 1..120 (spec §4.2.2 neighborhood map,
# ordered as published: (dx, dy) with dy >= 0)
DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5),
    (8, 4), (3, 8), (-3, 8), (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 5),
)


class BitReader:
    """VP8L packs bits least-significant-bit first."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.bits |= b << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.bits & ((1 << n) - 1)
        self.bits >>= n
        self.nbits -= n
        return v


class Huffman:
    """Canonical prefix code from per-symbol code lengths; codes are
    assigned shortest-first / smallest-symbol-first and read one bit
    at a time MSB-first within the code (spec §5.2.1)."""

    def __init__(self, lengths: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            # degenerate single-symbol code: zero bits
            self.single: int | None = nz[0][1]
            return
        self.single = None
        code = 0
        prev_len = 0
        for ln, sym in sorted(nz):
            code <<= ln - prev_len
            prev_len = ln
            self.lookup[(ln, code)] = sym
            code += 1

    def decode(self, r: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | r.read(1)
            sym = self.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L: prefix code not found")


def _read_code_lengths(r: BitReader, num_symbols: int) -> list[int]:
    """Normal prefix-code header: code-length-code lengths, then
    symbol lengths with 16/17/18 repeat codes (spec §5.2.2)."""
    num_codes = 4 + r.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[CODE_LENGTH_ORDER[i]] = r.read(3)
    cl_huff = Huffman(cl_lengths)

    if r.read(1):  # use a symbol-count limit
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = num_symbols

    lengths = [0] * num_symbols
    prev = 8
    i = 0
    while i < num_symbols:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_huff.decode(r)
        if s < 16:
            lengths[i] = s
            i += 1
            if s != 0:
                prev = s
        elif s == 16:
            rep = 3 + r.read(2)
            lengths[i : i + rep] = [prev] * rep
            i += rep
        elif s == 17:
            i += 3 + r.read(3)
        else:  # 18
            i += 11 + r.read(7)
    return lengths


def _read_huffman(r: BitReader, num_symbols: int) -> Huffman:
    if r.read(1):  # simple code
        n = 1 + r.read(1)
        if r.read(1):  # first symbol is 8 bits
            first = r.read(8)
        else:
            first = r.read(1)
        syms = [first]
        if n == 2:
            syms.append(r.read(8))
        lengths = [0] * num_symbols
        if n == 1:
            lengths[syms[0]] = 1  # marker; decode() uses .single
            h = Huffman(lengths)
            h.single = syms[0]
            return h
        for s in syms:
            lengths[s] = 1
        return Huffman(lengths)
    return Huffman(_read_code_lengths(r, num_symbols))


def _prefix_value(r: BitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read(extra) + 1


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


class _Groups:
    """Per-tile prefix-code groups (meta-prefix image or a single
    group)."""

    def __init__(self, groups, meta, tile_bits, tiles_x):
        self.groups = groups
        self.meta = meta  # list of group indices per tile, or None
        self.tile_bits = tile_bits
        self.tiles_x = tiles_x

    def at(self, x: int, y: int):
        if self.meta is None:
            return self.groups[0]
        t = (y >> self.tile_bits) * self.tiles_x + (x >> self.tile_bits)
        return self.groups[self.meta[t]]


def _read_groups(r: BitReader, w: int, h: int, cache_bits: int, allow_meta: bool):
    meta = None
    tile_bits = 0
    tiles_x = 0
    n_groups = 1
    if allow_meta and r.read(1):
        tile_bits = 2 + r.read(3)
        tiles_x = _div_round_up(w, 1 << tile_bits)
        tiles_y = _div_round_up(h, 1 << tile_bits)
        entropy = _decode_image(r, tiles_x, tiles_y, allow_meta=False)
        # group index lives in (red << 8) | green
        meta = [((p >> 8) & 0xFFFF) for p in entropy]
        n_groups = max(meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_huffman(r, 256 + 24 + cache_size)
        red = _read_huffman(r, 256)
        blue = _read_huffman(r, 256)
        alpha = _read_huffman(r, 256)
        dist = _read_huffman(r, 40)
        groups.append((green, red, blue, alpha, dist))
    return _Groups(groups, meta, tile_bits, tiles_x)


def _decode_pixels(r: BitReader, w: int, h: int, groups: _Groups, cache_bits: int):
    """The entropy-coded ARGB stream: literals, LZ77 backrefs, color
    cache hits. Pixels are 32-bit ints 0xAARRGGBB."""
    n = w * h
    out = [0] * n
    cache = [0] * (1 << cache_bits) if cache_bits else None
    pos = 0
    while pos < n:
        g, rd, bl, al, ds = groups.at(pos % w, pos // w)
        s = g.decode(r)
        if s < 256:  # literal
            green = s
            red = rd.decode(r)
            blue = bl.decode(r)
            alpha = al.decode(r)
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _prefix_value(r, s - 256)
            dcode = _prefix_value(r, ds.decode(r))
            if dcode <= 120:
                dx, dy = DIST_MAP[dcode - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            else:
                dist = dcode - 120
            for _ in range(length):
                if pos >= n:
                    break
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:  # color cache
            if cache is None:
                raise ValueError("invalid VP8L: cache hit without cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _decode_image(r: BitReader, w: int, h: int, allow_meta: bool):
    """An entropy-coded sub-image (meta-prefix / transform data):
    no transforms of its own, optional color cache."""
    cache_bits = r.read(4) if r.read(1) else 0
    groups = _read_groups(r, w, h, cache_bits, allow_meta)
    return _decode_pixels(r, w, h, groups, cache_bits)


# ------------------------------------------------- transforms
def _inv_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = ((p >> 16) + g) & 0xFF
        b = (p + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | (((a & 0xFF) + (b & 0xFF)) // 2)
    )


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | (((a + b) & 0xFF))
    )


def _select(l: int, t: int, tl: int) -> int:  # noqa: E741
    p_alpha = (l >> 24 & 0xFF) + (t >> 24 & 0xFF) - (tl >> 24 & 0xFF)
    p_red = (l >> 16 & 0xFF) + (t >> 16 & 0xFF) - (tl >> 16 & 0xFF)
    p_green = (l >> 8 & 0xFF) + (t >> 8 & 0xFF) - (tl >> 8 & 0xFF)
    p_blue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    pl = (
        abs(p_alpha - (l >> 24 & 0xFF))
        + abs(p_red - (l >> 16 & 0xFF))
        + abs(p_green - (l >> 8 & 0xFF))
        + abs(p_blue - (l & 0xFF))
    )
    pt = (
        abs(p_alpha - (t >> 24 & 0xFF))
        + abs(p_red - (t >> 16 & 0xFF))
        + abs(p_green - (t >> 8 & 0xFF))
        + abs(p_blue - (t & 0xFF))
    )
    return l if pl < pt else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:  # noqa: E741
    out = 0
    for shift in (24, 16, 8, 0):
        v = _clamp(
            ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        )
        out |= v << shift
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    # spec pseudo-code is C: (a - b) / 2 TRUNCATES TOWARD ZERO.
    # Python // floors, which differs for odd negative deltas
    # (a=10, b=15: C -> 8, floor -> 7) — a divergence the mirrored
    # in-test encoder could never see (caught r10 by the independent
    # numpy model, the r9 dequant-x16 lesson applied)
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        c = (tl >> shift) & 0xFF
        d = a - c
        half = d // 2 if d >= 0 else -((-d) // 2)
        v = _clamp(a + half)
        out |= v << shift
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:  # noqa: E741
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ValueError(f"invalid predictor mode {mode}")


def _inv_predictor(px: list[int], w: int, h: int, tiles: list[int], bits: int) -> None:
    """Inverse predictor transform (spec §4.2.1): residual + predicted,
    per-channel mod 256. Edge rules: (0,0) predicts black; row 0
    predicts L; column 0 predicts T; TR on the right edge is the
    pixel above-left-of-start of the row's end — i.e. pixel (0, y-1)
    wrapped, per the spec ("the topmost-rightmost wrap")."""
    tiles_x = _div_round_up(w, 1 << bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]  # L
            elif x == 0:
                pred = px[i - w]  # T
            else:
                mode = (tiles[(y >> bits) * tiles_x + (x >> bits)] >> 8) & 0xFF
                l = px[i - 1]  # noqa: E741
                t = px[i - w]
                tl = px[i - w - 1]
                tr = px[i - w + 1] if x + 1 < w else px[(y - 1) * w]
                pred = _predict(mode, l, t, tr, tl)
            px[i] = _add_px(px[i], pred)


def _ctdelta(t: int, c: int) -> int:
    """ColorTransformDelta: signed 3.5 fixed-point (spec §4.2.1)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, tiles: list[int], bits: int) -> None:
    tiles_x = _div_round_up(w, 1 << bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            t = tiles[(y >> bits) * tiles_x + (x >> bits)]
            g2r = (t >> 16) & 0xFF  # red channel of the tile pixel
            g2b = (t >> 8) & 0xFF  # green channel
            r2b = t & 0xFF  # blue channel
            p = px[i]
            green = (p >> 8) & 0xFF
            red = ((p >> 16) + _ctdelta(g2r, green)) & 0xFF
            blue = (p + _ctdelta(g2b, green) + _ctdelta(r2b, red)) & 0xFF
            px[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _inv_color_index(
    px: list[int], w: int, h: int, palette: list[int], packed_w: int
) -> list[int]:
    n = len(palette)
    if n > 16:
        bpp = 8
    elif n > 4:
        bpp = 4
    elif n > 2:
        bpp = 2
    else:
        bpp = 1
    per_byte = 8 // bpp
    out = [0] * (w * h)
    mask = (1 << bpp) - 1
    for y in range(h):
        for x in range(w):
            packed = px[y * packed_w + (x // per_byte)]
            bundle = (packed >> 8) & 0xFF  # green channel holds indices
            idx = (bundle >> (bpp * (x % per_byte))) & mask
            out[y * w + x] = palette[idx] if idx < n else 0
    return out


def decode_vp8l(data: bytes) -> tuple[int, int, bool, list[int]]:
    """Raw VP8L payload -> (w, h, has_alpha_hint, ARGB pixel list)."""
    if not data or data[0] != 0x2F:
        raise ValueError("invalid VP8L signature")
    r = BitReader(data, 1)
    w = r.read(14) + 1
    h = r.read(14) + 1
    alpha_hint = bool(r.read(1))
    if r.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    return w, h, alpha_hint, _decode_argb_stream(r, w, h)


def _decode_argb_stream(r: BitReader, w: int, h: int) -> list[int]:
    """Header-less VP8L image stream (transforms + entropy-coded
    pixels) at known dimensions -> ARGB pixel list. Shared by the
    VP8L path (after its 5-byte signature/size header) and ALPH-chunk
    lossless alpha, whose stream carries NO header — dimensions come
    from the embedding container."""
    transforms = []  # applied in reverse at the end
    xsize = w
    while r.read(1):
        ttype = r.read(2)
        if ttype == 2:  # subtract-green
            transforms.append(("subgreen",))
        elif ttype in (0, 1):  # predictor / color transform
            bits = 2 + r.read(3)
            tw = _div_round_up(xsize, 1 << bits)
            th = _div_round_up(h, 1 << bits)
            tiles = _decode_image(r, tw, th, allow_meta=False)
            transforms.append(
                ("predictor" if ttype == 0 else "color", tiles, bits)
            )
        elif ttype == 3:  # color indexing
            n = 1 + r.read(8)
            pal = _decode_image(r, n, 1, allow_meta=False)
            # palette entries are delta-coded against the previous
            palette = []
            prev = 0
            for p in pal:
                prev = _add_px(prev, p)
                palette.append(prev)
            if n > 16:
                per_byte = 1
            elif n > 4:
                per_byte = 2
            elif n > 2:
                per_byte = 4
            else:
                per_byte = 8
            packed_w = _div_round_up(xsize, per_byte)
            transforms.append(("index", palette, xsize, packed_w))
            xsize = packed_w
        else:
            raise ValueError("invalid VP8L transform")

    cache_bits = r.read(4) if r.read(1) else 0
    groups = _read_groups(r, xsize, h, cache_bits, allow_meta=True)
    px = _decode_pixels(r, xsize, h, groups, cache_bits)

    for t in reversed(transforms):
        if t[0] == "index":
            _, palette, true_w, packed_w = t
            px = _inv_color_index(px, true_w, h, palette, packed_w)
            xsize = true_w
        elif t[0] == "subgreen":
            _inv_subtract_green(px)
        elif t[0] == "predictor":
            _inv_predictor(px, xsize, h, t[1], t[2])
        elif t[0] == "color":
            _inv_color_transform(px, xsize, h, t[1], t[2])
    return px


def _unfilter_alpha(vals: bytearray, w: int, h: int, method: int) -> None:
    """In-place ALPH-chunk prediction unfilter (libwebp dsp/filters.c
    semantics): 1=horizontal (pred=left; row 0 col 0 pred=0; later
    rows' col 0 pred=above), 2=vertical (row 0 falls back to
    horizontal; else pred=above), 3=gradient (row 0 / col 0 fall back;
    else pred=clamp(left+above-aboveleft))."""
    if method == 0:
        return
    for y in range(h):
        base = y * w
        for x in range(w):
            i = base + x
            if y == 0:
                pred = 0 if x == 0 else vals[i - 1]
            elif method == 1:
                pred = vals[i - w] if x == 0 else vals[i - 1]
            elif method == 2:
                pred = vals[i - w]
            else:  # gradient
                if x == 0:
                    pred = vals[i - w]
                else:
                    g = vals[i - 1] + vals[i - w] - vals[i - w - 1]
                    pred = 0 if g < 0 else (255 if g > 255 else g)
            vals[i] = (vals[i] + pred) & 0xFF


def _decode_alpha(body: bytes, w: int, h: int) -> bytes:
    """ALPH chunk -> w*h row-major alpha bytes. Header byte (LSB
    first): compression in bits 0-1 (0=raw, 1=header-less VP8L stream
    with alpha in the green channel), filter method in bits 2-3,
    pre-processing in 4-5 (encode-side level reduction — no decoder
    action)."""
    if not body:
        raise ValueError("empty ALPH chunk")
    comp = body[0] & 0x03
    filt = (body[0] >> 2) & 0x03
    if comp == 0:
        raw = body[1 : 1 + w * h]
        if len(raw) < w * h:
            raise ValueError("short raw alpha plane")
        vals = bytearray(raw)
    elif comp == 1:
        px = _decode_argb_stream(BitReader(body, 1), w, h)
        vals = bytearray((p >> 8) & 0xFF for p in px)
    else:
        raise ValueError(f"invalid alpha compression {comp}")
    _unfilter_alpha(vals, w, h, filt)
    return bytes(vals)


def _argb_to_bytes(w: int, h: int, px: list[int]) -> tuple[int, bytes]:
    """ARGB ints -> (channels, row-major bytes); alpha emitted only
    when some pixel actually uses it."""
    has_alpha = any((p >> 24) & 0xFF != 0xFF for p in px)
    ch = 4 if has_alpha else 3
    out = bytearray(w * h * ch)
    for i, p in enumerate(px):
        j = i * ch
        out[j] = (p >> 16) & 0xFF
        out[j + 1] = (p >> 8) & 0xFF
        out[j + 2] = p & 0xFF
        if ch == 4:
            out[j + 3] = (p >> 24) & 0xFF
    return ch, bytes(out)


def decode_webp_bytes(data: bytes) -> tuple[int, int, int, bytes]:
    """RIFF/WEBP container -> first image as (width, height,
    channels, row-major pixels).

    Handles all three container shapes: simple VP8L (lossless,
    decode_vp8l), simple lossy VP8 (the RFC 6386 keyframe decoder in
    pipeline/vp8.py + BT.601 upsampling), and extended VP8X — whose
    walk continues into the feature chunks (ALPH alpha plane fused
    onto the lossy RGB; ANIM/ANMF animations yield their FIRST frame
    by descending into the ANMF payload's own chunk list)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    end = len(data)
    alpha_body: bytes | None = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"VP8L":
            w, h, _hint, px = decode_vp8l(body)
            ch, out = _argb_to_bytes(w, h, px)
            return w, h, ch, out
        if cid == b"VP8 ":
            from openset_spark.pipeline.vp8 import (
                decode_vp8_frame,
                vp8_to_rgb,
            )

            w, h, y, u, v = decode_vp8_frame(body)
            rgb = vp8_to_rgb(w, h, y, u, v)
            if alpha_body is None:
                return w, h, 3, rgb
            a = _decode_alpha(alpha_body, w, h)
            out = bytearray(w * h * 4)
            for i in range(w * h):
                out[i * 4 : i * 4 + 3] = rgb[i * 3 : i * 3 + 3]
                out[i * 4 + 3] = a[i]
            return w, h, 4, bytes(out)
        if cid == b"ALPH":
            alpha_body = body
        elif cid == b"ANMF":
            # frame params are 16 bytes (x/y/w/h/duration/flags);
            # the frame's ALPH/VP8/VP8L chunks follow inside — descend
            pos = pos + 8 + 16
            continue
        # VP8X header / ANIM params / ICCP / EXIF / XMP: skip
        pos += 8 + size + (size & 1)
    raise ValueError("invalid WebP: no image chunk")
