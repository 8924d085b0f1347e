"""Lossy VP8 keyframe decode, verified against an in-test VP8
encoder. The boolean coder pair is fuzzed first — everything else
stands on it."""

from __future__ import annotations

import numpy as np

from openset_spark.pipeline.vp8 import BoolDecoder


# ------------------------------------------------- in-test bool encoder
class BoolEncoder:
    """RFC 6386 §8.1 boolean encoder (carry-propagating)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0  # 32-bit window
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob: int, val: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if val:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def flag(self, val: int):
        self.put(128, val)

    def literal(self, n: int, v: int):
        for b in range(n - 1, -1, -1):
            self.put(128, (v >> b) & 1)

    def signed_literal(self, n: int, v: int):
        self.literal(n, abs(v))
        self.put(128, 1 if v < 0 else 0)

    def tree(self, tree: tuple, probs, leaf: int, start: int = 0):
        """Emit the bit path that reaches ``-leaf`` in the tree."""
        path = []  # (node_index, bit)
        found = self._find(tree, start, -leaf, path)
        assert found, f"leaf {leaf} not in tree"
        for i, bit in path:
            self.put(probs[i >> 1], bit)

    def _find(self, tree, i, target, path):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == target:
                path.append((i, bit))
                return True
            if nxt > 0:
                path.append((i, bit))
                if self._find(tree, nxt, target, path):
                    return True
                path.pop()
        return False

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def test_bool_coder_roundtrip_fuzz():
    rng = np.random.default_rng(70)
    for trial in range(40):
        n = int(rng.integers(1, 400))
        probs = rng.integers(1, 255, size=n)
        bits = rng.integers(0, 2, size=n)
        enc = BoolEncoder()
        for p, b in zip(probs, bits):
            enc.put(int(p), int(b))
        data = enc.flush()
        dec = BoolDecoder(data)
        got = [dec.get(int(p)) for p in probs]
        assert got == [int(b) for b in bits], f"trial {trial}"


def test_bool_coder_literals_and_trees():
    rng = np.random.default_rng(71)
    tree = (-0, 2, -1, 4, -2, -3)  # 4-leaf comb tree
    probs = [180, 90, 200]
    for _ in range(10):
        lits = [int(v) for v in rng.integers(0, 256, size=8)]
        leaves = [int(v) for v in rng.integers(0, 4, size=20)]
        signed = [int(v) for v in rng.integers(-63, 64, size=6)]
        enc = BoolEncoder()
        for v in lits:
            enc.literal(8, v)
        for v in leaves:
            enc.tree(tree, probs, v)
        for v in signed:
            enc.signed_literal(6, v)
        dec = BoolDecoder(enc.flush())
        assert [dec.literal(8) for _ in lits] == lits
        assert [dec.tree(tree, probs) for _ in leaves] == leaves
        assert [dec.signed_literal(6) for _ in signed] == signed


# ==================================================================
# In-test VP8 keyframe ENCODER (mirrors RFC 6386 field order; shares
# only the constant tables with the production decoder)
# ==================================================================
from openset_spark.pipeline import vp8 as V  # noqa: E402


def _enc_tree(enc: BoolEncoder, tree, probs, leaf, start=0):
    path = []
    assert enc._find(tree, start, -leaf, path), f"leaf {leaf} unreachable"
    for i, bit in path:
        enc.put(probs[i >> 1], bit)


def _enc_flagged_delta(enc: BoolEncoder, bits: int, v: int):
    if v == 0:
        enc.flag(0)
        return
    enc.flag(1)
    enc.literal(bits, abs(v))
    enc.flag(1 if v < 0 else 0)


def _classify_level(v: int) -> int:
    a = abs(v)
    if a <= 4:
        return a  # ZERO..FOUR tokens carry their face value
    for tok in (V.CAT1_TOKEN, V.CAT2_TOKEN, V.CAT3_TOKEN, V.CAT4_TOKEN,
                V.CAT5_TOKEN):
        lo = V.CAT_BASE[tok]
        hi = lo + (1 << len(V.CAT_PROBS[tok])) - 1
        if lo <= a <= hi:
            return tok
    return V.CAT6_TOKEN


class VP8Encoder:
    def __init__(
        self, w, h, q_index=40, q_deltas=(0, 0, 0, 0, 0),
        filter_type=0, filter_level=0, sharpness=0,
        n_part_log2=0, segmentation=None, lf_deltas=None,
        mb_no_skip=True, prob_skip=200, prob_seed=None,
    ):
        self.w, self.h = w, h
        self.mb_w, self.mb_h = (w + 15) // 16, (h + 15) // 16
        self.q_index, self.q_deltas = q_index, q_deltas
        self.filter_type = filter_type
        self.filter_level = filter_level
        self.sharpness = sharpness
        self.n_parts = 1 << n_part_log2
        self.n_part_log2 = n_part_log2
        self.seg = segmentation  # {abs, quant[4], filter[4], probs[3]}
        self.lf_deltas = lf_deltas  # (ref[4], mode[4])
        self.mb_no_skip = mb_no_skip
        self.prob_skip = prob_skip
        self.probs = [
            [[list(c) for c in b] for b in t] for t in V.DEFAULT_COEFF_PROBS
        ]
        self.prob_updates = {}
        if prob_seed is not None:
            rng = np.random.default_rng(prob_seed)
            for _ in range(60):  # sprinkle updates across the table
                i, j, k, m = (int(rng.integers(4)), int(rng.integers(8)),
                              int(rng.integers(3)), int(rng.integers(11)))
                p = int(rng.integers(1, 255))
                self.prob_updates[(i, j, k, m)] = p
                self.probs[i][j][k][m] = p

    # ---- header + modes (partition 1)
    def _write_header(self, e: BoolEncoder):
        e.literal(1, 0)  # color space
        e.literal(1, 0)  # clamping
        if self.seg is None:
            e.literal(1, 0)
        else:
            e.literal(1, 1)
            e.literal(1, 1)  # update map
            e.literal(1, 1)  # update data
            e.literal(1, self.seg["abs"])
            for v in self.seg["quant"]:
                _enc_flagged_delta(e, 7, v)
            for v in self.seg["filter"]:
                _enc_flagged_delta(e, 6, v)
            for p in self.seg["probs"]:
                if p == 255:
                    e.flag(0)
                else:
                    e.flag(1)
                    e.literal(8, p)
        e.literal(1, self.filter_type)
        e.literal(6, self.filter_level)
        e.literal(3, self.sharpness)
        if self.lf_deltas is None:
            e.literal(1, 0)
        else:
            e.literal(1, 1)
            e.literal(1, 1)
            for v in self.lf_deltas[0]:
                _enc_flagged_delta(e, 6, v)
            for v in self.lf_deltas[1]:
                _enc_flagged_delta(e, 6, v)
        e.literal(2, self.n_part_log2)
        e.literal(7, self.q_index)
        for v in self.q_deltas:
            _enc_flagged_delta(e, 4, v)
        e.literal(1, 0)  # refresh entropy (keyframe resets anyway)
        for i in range(4):
            for j in range(8):
                for k in range(3):
                    for m in range(11):
                        upd = (i, j, k, m) in self.prob_updates
                        e.put(V.COEFF_UPDATE_PROB, 1 if upd else 0)
                        if upd:
                            e.literal(8, self.prob_updates[(i, j, k, m)])
        e.literal(1, 1 if self.mb_no_skip else 0)
        if self.mb_no_skip:
            e.literal(8, self.prob_skip)

    def _write_modes(self, e: BoolEncoder, mbs):
        for mb in mbs:
            if self.seg is not None:
                _enc_tree(e, V.MB_SEGMENT_TREE, self.seg["probs"],
                          mb.get("segment", 0))
            if self.mb_no_skip:
                e.put(self.prob_skip, mb.get("skip", 0))
            ymode = mb["ymode"]
            _enc_tree(e, V.KF_YMODE_TREE, V.KF_YMODE_PROB, ymode)
            if ymode == V.B_PRED:
                for bm in mb["bmodes"]:
                    _enc_tree(e, V.BMODE_TREE, V.BMODE_PROB, bm)
            _enc_tree(e, V.UV_MODE_TREE, V.KF_UV_MODE_PROB, mb["uvmode"])

    # ---- tokens
    def _encode_block(self, e, btype, ctx, first, levels):
        last = first - 1
        for i in range(first, 16):
            if levels[i]:
                last = i
        i = first
        skip_eob = False
        while i <= last:
            p = self.probs[btype][V.COEFF_BANDS[i]][ctx]
            v = levels[i]
            tok = _classify_level(v)
            _enc_tree(e, V.COEFF_TREE, p, tok, start=2 if skip_eob else 0)
            if tok == V.ZERO_TOKEN:
                ctx = 0
                skip_eob = True
                i += 1
                continue
            skip_eob = False
            if tok > V.FOUR_TOKEN:
                extra = abs(v) - V.CAT_BASE[tok]
                cps = V.CAT_PROBS[tok]
                for b, cp in enumerate(cps):
                    e.put(cp, (extra >> (len(cps) - 1 - b)) & 1)
            e.flag(1 if v < 0 else 0)
            ctx = 1 if abs(v) == 1 else 2
            i += 1
        if last < 15:
            p = self.probs[btype][V.COEFF_BANDS[last + 1]][ctx]
            _enc_tree(e, V.COEFF_TREE, p, V.EOB_TOKEN)
        return last >= first

    def encode(self, mbs) -> bytes:
        mb_w, mb_h = self.mb_w, self.mb_h
        assert len(mbs) == mb_w * mb_h
        p1 = BoolEncoder()
        self._write_header(p1)
        self._write_modes(p1, mbs)

        token_parts = [BoolEncoder() for _ in range(self.n_parts)]
        above_y = [[0] * 4 for _ in range(mb_w)]
        above_u = [[0] * 2 for _ in range(mb_w)]
        above_v = [[0] * 2 for _ in range(mb_w)]
        above_y2 = [0] * mb_w
        for my in range(mb_h):
            e = token_parts[my % self.n_parts]
            left_y = [0] * 4
            left_u = [0] * 2
            left_v = [0] * 2
            left_y2 = 0
            for mx in range(mb_w):
                mb = mbs[my * mb_w + mx]
                has_y2 = mb["ymode"] != V.B_PRED
                if mb.get("skip", 0):
                    left_y = [0] * 4
                    left_u = [0] * 2
                    left_v = [0] * 2
                    above_y[mx] = [0] * 4
                    above_u[mx] = [0] * 2
                    above_v[mx] = [0] * 2
                    if has_y2:
                        above_y2[mx] = left_y2 = 0
                    continue
                if has_y2:
                    ctx = above_y2[mx] + left_y2
                    nz = self._encode_block(
                        e, 1, ctx, 0, mb.get("y2", [0] * 16)
                    )
                    above_y2[mx] = left_y2 = 1 if nz else 0
                btype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    ctx = above_y[mx][c] + left_y[r]
                    nz = self._encode_block(
                        e, btype, ctx, first, mb["y"][sb]
                    )
                    above_y[mx][c] = left_y[r] = 1 if nz else 0
                for key, above_c, left_c in (
                    ("u", above_u, left_u), ("v", above_v, left_v)
                ):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        ctx = above_c[mx][c] + left_c[r]
                        nz = self._encode_block(
                            e, 2, ctx, 0, mb[key][sb]
                        )
                        above_c[mx][c] = left_c[r] = 1 if nz else 0

        first_part = p1.flush()
        bodies = [tp.flush() for tp in token_parts]
        tag = (0) | (3 << 1) | (1 << 4) | (len(first_part) << 5)
        out = bytearray(
            [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
        )
        out += b"\x9d\x01\x2a"
        out += bytes([self.w & 0xFF, (self.w >> 8) & 0x3F])
        out += bytes([self.h & 0xFF, (self.h >> 8) & 0x3F])
        out += first_part
        for b in bodies[:-1]:
            out += bytes(
                [len(b) & 0xFF, (len(b) >> 8) & 0xFF, (len(b) >> 16) & 0xFF]
            )
        for b in bodies:
            out += b
        return bytes(out)


# ==================================================================
# Independent reference reconstruction: same RFC, deliberately
# DIFFERENT formulations (matrix WHT, numpy iDCT, general-rule
# diagonal predictors vs the decoder's unrolled assignments).
# ==================================================================
def ref_iwalsh(c):
    C = np.array(
        [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
        dtype=np.int64,
    )
    x = np.array(c, dtype=np.int64).reshape(4, 4)
    t = C @ x          # column pass
    out = t @ C.T      # row pass
    return ((out + 3) >> 3).reshape(-1).tolist()


def ref_idct(c):
    def pass1(v):
        a = v[0] + v[2]
        b = v[0] - v[2]
        cc = ((v[1] * 35468) >> 16) - (v[3] + ((v[3] * 20091) >> 16))
        d = (v[1] + ((v[1] * 20091) >> 16)) + ((v[3] * 35468) >> 16)
        return np.array([a + d, b + cc, b - cc, a - d], dtype=np.int64)

    x = np.array(c, dtype=np.int64).reshape(4, 4)
    t = np.stack([pass1(x[:, i]) for i in range(4)], axis=1)
    out = np.stack([pass1(t[i, :]) for i in range(4)], axis=0)
    return ((out + 4) >> 3).reshape(-1).tolist()


def _a2(a, b):
    return (a + b + 1) >> 1


def _a3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def ref_predict_b(mode, a, l, p):  # noqa: E741
    o = np.zeros((4, 4), dtype=np.int64)
    if mode == V.B_DC_PRED:
        o[:] = (sum(a[:4]) + sum(l) + 4) >> 3
    elif mode == V.B_TM_PRED:
        for r in range(4):
            for c in range(4):
                o[r][c] = min(255, max(0, l[r] + a[c] - p))
    elif mode == V.B_VE_PRED:
        ext = [p] + list(a[:5])
        for c in range(4):
            o[:, c] = _a3(ext[c], ext[c + 1], ext[c + 2])
    elif mode == V.B_HE_PRED:
        ext = [p] + list(l) + [l[3]]
        for r in range(4):
            o[r, :] = _a3(ext[r], ext[r + 1], ext[r + 2])
    elif mode == V.B_LD_PRED:
        for r in range(4):
            for c in range(4):
                i = r + c
                o[r][c] = (
                    _a3(a[6], a[7], a[7]) if i == 6
                    else _a3(a[i], a[i + 1], a[i + 2])
                )
    elif mode == V.B_RD_PRED:
        e = [l[3], l[2], l[1], l[0], p] + list(a[:4])
        for r in range(4):
            for c in range(4):
                o[r][c] = _a3(e[c - r + 3], e[c - r + 4], e[c - r + 5])
    elif mode == V.B_VR_PRED:
        e = [l[3], l[2], l[1], l[0], p] + list(a[:4])
        for r in range(4):
            for c in range(4):
                d = 2 * c - r
                if d < 0:
                    o[r][c] = _a3(e[4 + d], e[5 + d], e[6 + d])
                elif d % 2 == 0:
                    o[r][c] = _a2(e[4 + d // 2], e[5 + d // 2])
                else:
                    k = (d - 1) // 2
                    o[r][c] = _a3(e[4 + k], e[5 + k], e[6 + k])
    elif mode == V.B_VL_PRED:
        for r in range(4):
            for c in range(4):
                if (r, c) == (2, 3):
                    o[r][c] = _a3(a[4], a[5], a[6])
                elif (r, c) == (3, 3):
                    o[r][c] = _a3(a[5], a[6], a[7])
                elif r % 2 == 0:
                    k = c + r // 2
                    o[r][c] = _a2(a[k], a[k + 1])
                else:
                    k = c + (r - 1) // 2
                    o[r][c] = _a3(a[k], a[k + 1], a[k + 2])
    elif mode == V.B_HD_PRED:
        e = [l[3], l[2], l[1], l[0], p] + list(a[:4])
        for r in range(4):
            for c in range(4):
                if (r, c) == (0, 2):
                    o[r][c] = _a3(e[4], e[5], e[6])
                elif (r, c) == (0, 3):
                    o[r][c] = _a3(e[5], e[6], e[7])
                else:
                    k = 3 - r + (c // 2)
                    o[r][c] = (
                        _a2(e[k], e[k + 1]) if c % 2 == 0
                        else _a3(e[k], e[k + 1], e[k + 2])
                    )
    elif mode == V.B_HU_PRED:
        ll = list(l) + [l[3], l[3], l[3]]
        for r in range(4):
            for c in range(4):
                k = r + c // 2
                if k >= 3:
                    o[r][c] = l[3]
                elif c % 2 == 0:
                    o[r][c] = _a2(ll[k], ll[k + 1])
                else:
                    o[r][c] = _a3(ll[k], ll[k + 1], ll[k + 2])
    else:
        raise AssertionError(mode)
    return o


def ref_predict_full(mode, size, a, l, p, up, left):  # noqa: E741
    o = np.zeros((size, size), dtype=np.int64)
    if mode == V.DC_PRED:
        if up and left:
            o[:] = (sum(a) + sum(l) + size) >> (5 if size == 16 else 4)
        elif up:
            o[:] = (sum(a) + size // 2) >> (4 if size == 16 else 3)
        elif left:
            o[:] = (sum(l) + size // 2) >> (4 if size == 16 else 3)
        else:
            o[:] = 128
    elif mode == V.V_PRED:
        o[:, :] = np.array(a)[None, :]
    elif mode == V.H_PRED:
        o[:, :] = np.array(l)[:, None]
    else:
        for r in range(size):
            for c in range(size):
                o[r][c] = min(255, max(0, l[r] + a[c] - p))
    return o


def ref_dequant(enc: VP8Encoder, segment):
    def cq(x):
        return min(127, max(0, x))

    if enc.seg is not None:
        q = (
            enc.seg["quant"][segment]
            if enc.seg["abs"]
            else enc.q_index + enc.seg["quant"][segment]
        )
    else:
        q = enc.q_index
    q = cq(q)
    d = enc.q_deltas
    y2ac = max(8, V.AC_QLOOKUP[cq(q + d[2])] * 155 // 100)
    return {
        "y": (V.DC_QLOOKUP[cq(q + d[0])], V.AC_QLOOKUP[q]),
        "y2": (V.DC_QLOOKUP[cq(q + d[1])] * 2, y2ac),
        "uv": (min(132, V.DC_QLOOKUP[cq(q + d[3])]), V.AC_QLOOKUP[cq(q + d[4])]),
    }


def _deq_block(levels, dq, first):
    """scan-order levels -> raster-order dequantized coefficients."""
    out = [0] * 16
    for i in range(first, 16):
        out[V.ZIGZAG[i]] = levels[i] * (dq[0] if i == 0 else dq[1])
    return out


def expected_planes(enc: VP8Encoder, mbs):
    mb_w, mb_h = enc.mb_w, enc.mb_h
    W, H = mb_w * 16, mb_h * 16
    Y = np.zeros((H, W), dtype=np.int64)
    U = np.zeros((H // 2, W // 2), dtype=np.int64)
    Vp = np.zeros((H // 2, W // 2), dtype=np.int64)

    def gp(plane, x, y):
        if y < 0:
            return 127
        if x < 0:
            return 129
        return int(plane[y][min(x, plane.shape[1] - 1)])

    for my in range(mb_h):
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            dq = ref_dequant(enc, mb.get("segment", 0))
            x0, y0 = mx * 16, my * 16
            ymode = mb["ymode"]
            skip = mb.get("skip", 0)
            if ymode == V.B_PRED:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    bx, by = x0 + c * 4, y0 + r * 4
                    if c == 3 and r > 0:
                        a = [gp(Y, bx + k, by - 1) for k in range(4)] + [
                            gp(Y, x0 + 16 + k, y0 - 1) for k in range(4)
                        ]
                    else:
                        a = [gp(Y, bx + k, by - 1) for k in range(8)]
                    l4 = [gp(Y, bx - 1, by + k) for k in range(4)]
                    p = gp(Y, bx - 1, by - 1)
                    pred = ref_predict_b(mb["bmodes"][sb], a, l4, p)
                    res = (
                        [0] * 16 if skip else
                        ref_idct(_deq_block(mb["y"][sb], dq["y"], 0))
                    )
                    blk = pred + np.array(res).reshape(4, 4)
                    Y[by : by + 4, bx : bx + 4] = np.clip(blk, 0, 255)
            else:
                a16 = [gp(Y, x0 + k, y0 - 1) for k in range(16)]
                l16 = [gp(Y, x0 - 1, y0 + k) for k in range(16)]
                p = gp(Y, x0 - 1, y0 - 1)
                pred = ref_predict_full(
                    ymode, 16, a16, l16, p, my > 0, mx > 0
                )
                wht = (
                    [0] * 16 if skip else
                    ref_iwalsh(_deq_block(mb.get("y2", [0] * 16), dq["y2"], 0))
                )
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    coefs = (
                        [0] * 16 if skip else
                        _deq_block(mb["y"][sb], dq["y"], 1)
                    )
                    coefs[0] = wht[sb]
                    res = ref_idct(coefs)
                    blk = (
                        pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                        + np.array(res).reshape(4, 4)
                    )
                    Y[y0 + r * 4 : y0 + r * 4 + 4, x0 + c * 4 : x0 + c * 4 + 4] = (
                        np.clip(blk, 0, 255)
                    )
            cx0, cy0 = mx * 8, my * 8
            for plane, key in ((U, "u"), (Vp, "v")):
                a8 = [gp(plane, cx0 + k, cy0 - 1) for k in range(8)]
                l8 = [gp(plane, cx0 - 1, cy0 + k) for k in range(8)]
                p = gp(plane, cx0 - 1, cy0 - 1)
                pred = ref_predict_full(
                    mb["uvmode"], 8, a8, l8, p, my > 0, mx > 0
                )
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    coefs = (
                        [0] * 16 if skip else
                        _deq_block(mb[key][sb], dq["uv"], 0)
                    )
                    res = ref_idct(coefs)
                    blk = (
                        pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                        + np.array(res).reshape(4, 4)
                    )
                    plane[
                        cy0 + r * 4 : cy0 + r * 4 + 4,
                        cx0 + c * 4 : cx0 + c * 4 + 4,
                    ] = np.clip(blk, 0, 255)
    return Y, U, Vp
