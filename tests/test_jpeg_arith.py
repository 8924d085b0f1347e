"""Arithmetic-coded JPEG (SOF9): an in-test QM ENCODER (T.81 Annex D
mirror: conditional exchange, carry propagation over stacked 0xFF
bytes, 0x00 byte stuffing, the flush that picks the code point with
the most trailing zeros) + the sequential DC/AC statistical models —
exercising pipeline/jpeg_arith.py from the other direction.

The decisive test is cross-CODEC: the same quantized coefficient
blocks encoded as Huffman SOF0 (tests/test_jpeg.py's encoder) and as
arithmetic SOF9 must decode to byte-identical pixels.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openset_spark.pipeline.jpeg import decode_jpeg_bytes
from openset_spark.pipeline.jpeg_arith import (
    QE_TABLE,
    ArithDecoder,
    _new_ac_stats,
    _new_dc_stats,
    decode_ac_coefs,
    decode_dc_diff,
)

from test_jpeg import QTABLE, _expected_pixels, _rand_blocks, encode_baseline_jpeg


# ------------------------------------------------- QM encoder (D.1)
class ArithEncoder:
    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending byte (might still take a carry)
        self.sc = 0  # stacked 0xFF bytes between buffer and c
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # JPEG byte stuffing

    def _byte_out(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry ripples through every stacked 0xFF into buffer
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            while self.sc:
                self._emit(0x00)
                self.sc -= 1
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # defer: may still absorb a carry
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            while self.sc:
                self._emit(0xFF)
                self.sc -= 1
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
            if self.a >= 0x8000:
                break

    def encode(self, bins: list[int], idx: int, bit: int) -> None:
        st = bins[idx]
        i = st >> 1
        mps = st & 1
        qe, nmps, nlps, switch = QE_TABLE[i]
        self.a -= qe
        if bit != mps:
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            bins[idx] = (nlps << 1) | (mps ^ switch)
            self._renorm()
        else:
            if self.a & 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            bins[idx] = (nmps << 1) | mps
            self._renorm()

    def encode_fixed(self, bit: int) -> None:
        bins = [113 << 1]
        self.encode(bins, 0, bit)

    def flush(self) -> bytes:
        # code point with the most trailing zeros inside [c, c+a)
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            while self.sc:
                self._emit(0x00)
                self.sc -= 1
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            while self.sc:
                self._emit(0xFF)
                self.sc -= 1
        self._emit((self.c >> 19) & 0xFF)
        self._emit((self.c >> 11) & 0xFF)
        return bytes(self.out)


# ------------------------------------------------- models (F.1.4)
def _classify(m: int, sign: int, cl: int, cu: int) -> int:
    if m < (1 << cl) >> 1:
        return 0
    if m > (1 << cu) >> 1:
        return 12 + sign * 4
    return 4 + sign * 4


def encode_dc_diff(enc, stats, ctx, diff, cl, cu) -> int:
    base = ctx
    if diff == 0:
        enc.encode(stats, base, 0)
        return 0
    enc.encode(stats, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, base + 1, sign)
    sz = abs(diff) - 1
    st = base + 2 + sign
    if sz == 0:
        enc.encode(stats, st, 0)
        m = 0
    else:
        enc.encode(stats, st, 1)
        m = 1
        st = 20
        while sz >= (m << 1):
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
        enc.encode(stats, st, 0)
    new_ctx = _classify(m, sign, cl, cu)
    st += 14
    mm = m >> 1
    while mm:
        enc.encode(stats, st, 1 if sz & mm else 0)
        mm >>= 1
    return new_ctx


def encode_ac_coefs(enc, stats, block, kx) -> None:
    last = 0
    for k in range(1, 64):
        if block[k]:
            last = k
    k = 1
    while k <= last:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not end-of-block
        while block[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = int(block[k])
        sign = 1 if v < 0 else 0
        enc.encode_fixed(sign)
        sz = abs(v) - 1
        st += 2
        if sz == 0:
            enc.encode(stats, st, 0)
            m = 0
        elif sz == 1:
            enc.encode(stats, st, 1)
            enc.encode(stats, st, 0)  # second decision on the same bin
            m = 1
        else:
            enc.encode(stats, st, 1)
            enc.encode(stats, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while sz >= (m << 1):
                enc.encode(stats, st, 1)
                m <<= 1
                st += 1
            enc.encode(stats, st, 0)
        st += 14
        mm = m >> 1
        while mm:
            enc.encode(stats, st, 1 if sz & mm else 0)
            mm >>= 1
        k += 1
    if last < 63:
        enc.encode(stats, 3 * (k - 1), 1)  # end-of-block


def encode_arith_jpeg(
    w, h, comp_blocks, qtables, restart_interval=0, dc_cond=None,
    ac_cond=None, precision=8,
) -> bytes:
    """SOF9 mirror of test_jpeg.encode_baseline_jpeg: same comp_blocks
    structure, QM-coded entropy segment, optional DAC conditioning."""
    cl, cu = dc_cond if dc_cond else (0, 1)
    kx = ac_cond if ac_cond is not None else 5
    hmax = max(c["h"] for c in comp_blocks)
    vmax = max(c["v"] for c in comp_blocks)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    for tq, q in enumerate(qtables):
        if precision == 12:
            seg(0xDB, bytes([0x10 | tq]) + struct.pack(">64H", *q))
        else:
            seg(0xDB, bytes([tq]) + bytes(q))
    sof = (
        bytearray([precision])
        + struct.pack(">HH", h, w)
        + bytes([len(comp_blocks)])
    )
    for i, c in enumerate(comp_blocks):
        sof += bytes([i + 1, (c["h"] << 4) | c["v"], c["tq"]])
    seg(0xC9, bytes(sof))
    if dc_cond or ac_cond is not None:
        seg(0xCC, bytes([0x00, (cu << 4) | cl, 0x10, kx]))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comp_blocks)])
    for i in range(len(comp_blocks)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    state = {
        "enc": ArithEncoder(),
        "dc": _new_dc_stats(),
        "ac": _new_ac_stats(),
        "rst": 0,
    }
    preds = [0] * len(comp_blocks)
    ctxs = [0] * len(comp_blocks)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                out.extend(state["enc"].flush())
                out.extend(b"\xff" + bytes([0xD0 + (state["rst"] % 8)]))
                state["rst"] += 1
                state["enc"] = ArithEncoder()
                state["dc"] = _new_dc_stats()
                state["ac"] = _new_ac_stats()
                preds = [0] * len(comp_blocks)
                ctxs = [0] * len(comp_blocks)
            for ci, c in enumerate(comp_blocks):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = c["blocks"][(mx * c["h"] + hh, my * c["v"] + v)]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        ctxs[ci] = encode_dc_diff(
                            state["enc"], state["dc"], ctxs[ci], diff, cl, cu
                        )
                        encode_ac_coefs(state["enc"], state["ac"], zz, kx)
            mcu_count += 1
    out.extend(state["enc"].flush())
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------------- tests
def test_qm_coder_bit_roundtrip_fuzz():
    # the strongest coder-level check: random bit streams over random
    # shared contexts survive encode->decode exactly, covering MPS/LPS
    # exchange, carry propagation, 0xFF stacking and byte stuffing
    rng = np.random.default_rng(0)
    for trial in range(40):
        n_ctx = int(rng.integers(1, 8))
        n = int(rng.integers(1, 600))
        # biased bits make long MPS runs -> deep Qe states + carries
        bias = rng.random()
        bits = (rng.random(n) < bias).astype(int).tolist()
        ctx_seq = rng.integers(0, n_ctx, n).tolist()
        enc = ArithEncoder()
        ebins = [0] * n_ctx
        for b, cx in zip(bits, ctx_seq):
            enc.encode(ebins, cx, b)
        payload = enc.flush()
        dec = ArithDecoder(payload, 0)
        dbins = [0] * n_ctx
        got = [dec.decode(dbins, cx) for cx in ctx_seq]
        assert got == bits, f"trial {trial} diverged"
        assert dbins == ebins  # state machines marched in lockstep


def test_qm_coder_fixed_bin_roundtrip():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 200).tolist()
    enc = ArithEncoder()
    for b in bits:
        enc.encode_fixed(b)
    dec = ArithDecoder(enc.flush(), 0)
    assert [dec.decode_fixed() for _ in bits] == bits


def test_dc_ac_model_roundtrip():
    rng = np.random.default_rng(7)
    diffs = [0, 1, -1, 2, -3, 255, -256, 0, 77, -1024, 4, 0]
    enc = ArithEncoder()
    dstats = _new_dc_stats()
    astats = _new_ac_stats()
    blocks = []
    ctx = 0
    for d in diffs:
        ctx = encode_dc_diff(enc, dstats, ctx, d, 0, 1)
        zz = np.zeros(64, dtype=np.int64)
        n_ac = int(rng.integers(0, 20))
        idx = rng.choice(np.arange(1, 64), size=n_ac, replace=False)
        zz[idx] = rng.integers(-300, 300, size=n_ac)
        blocks.append(zz)
        encode_ac_coefs(enc, astats, zz.tolist(), 5)
    dec = ArithDecoder(enc.flush(), 0)
    ddstats = _new_dc_stats()
    dastats = _new_ac_stats()
    ctx = 0
    for d, zz in zip(diffs, blocks):
        got, ctx = decode_dc_diff(dec, ddstats, ctx, 0, 1)
        assert got == d
        out = np.zeros(64, dtype=np.int64)
        decode_ac_coefs(dec, dastats, out, 5)
        np.testing.assert_array_equal(out[1:], zz[1:])


def _arith_roundtrip(w, h, comps, qtables, **kw):
    data = encode_arith_jpeg(w, h, comps, qtables, **kw)
    gw, gh, ch, px = decode_jpeg_bytes(data)
    assert (gw, gh) == (w, h)
    got = np.frombuffer(px, dtype=np.uint8)
    exp = _expected_pixels(w, h, comps, qtables)
    np.testing.assert_array_equal(got.reshape(exp.shape), exp)
    return data


def test_arith_gray_single_block():
    rng = np.random.default_rng(11)
    comps = [{"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 1, 1)}]
    _arith_roundtrip(8, 8, comps, [QTABLE])


def test_arith_color_420_crop():
    rng = np.random.default_rng(13)
    comps = [
        {"h": 2, "v": 2, "tq": 0, "blocks": _rand_blocks(rng, 4, 4)},
        {"h": 1, "v": 1, "tq": 1, "blocks": _rand_blocks(rng, 2, 2)},
        {"h": 1, "v": 1, "tq": 1, "blocks": _rand_blocks(rng, 2, 2)},
    ]
    _arith_roundtrip(29, 27, comps, [QTABLE, QTABLE])


def test_arith_matches_huffman_decode():
    # same coefficients through both entropy coders -> identical pixels
    rng = np.random.default_rng(17)
    comps = [
        {"h": 2, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 4, 2, dense=True)},
        {"h": 1, "v": 1, "tq": 1, "blocks": _rand_blocks(rng, 2, 2)},
        {"h": 1, "v": 1, "tq": 1, "blocks": _rand_blocks(rng, 2, 2)},
    ]
    huff = encode_baseline_jpeg(32, 16, comps, [QTABLE, QTABLE])
    arith = encode_arith_jpeg(32, 16, comps, [QTABLE, QTABLE])
    assert decode_jpeg_bytes(huff) == decode_jpeg_bytes(arith)


def test_arith_restart_intervals():
    rng = np.random.default_rng(19)
    comps = [{"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 4, 4)}]
    _arith_roundtrip(32, 32, comps, [QTABLE], restart_interval=3)


def test_arith_dac_conditioning():
    rng = np.random.default_rng(23)
    comps = [{"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 3, 3)}]
    _arith_roundtrip(
        24, 24, comps, [QTABLE], dc_cond=(1, 3), ac_cond=12
    )


def test_arith_fuzz_roundtrip():
    rng = np.random.default_rng(29)
    for trial in range(6):
        hv = [(1, 1), (2, 1), (1, 2), (2, 2)][int(rng.integers(4))]
        ncomp = int(rng.integers(1, 4))
        if ncomp == 2:
            ncomp = 3  # JPEG corpora are 1- or 3-component
        comps = []
        for ci in range(ncomp):
            h_, v_ = hv if ci == 0 else (1, 1)
            comps.append(
                {
                    "h": h_,
                    "v": v_,
                    "tq": 0 if ci == 0 else min(1, len([QTABLE, QTABLE]) - 1),
                    "blocks": None,
                    "_hv": (h_, v_),
                }
            )
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        w = int(rng.integers(9, 40))
        h = int(rng.integers(9, 40))
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        for c in comps:
            c["blocks"] = _rand_blocks(
                rng, mcux * c["h"], mcuy * c["v"], dense=bool(rng.integers(2))
            )
            del c["_hv"]
        ri = int(rng.integers(0, 4))
        _arith_roundtrip(
            w, h, comps, [QTABLE, QTABLE], restart_interval=ri
        )


def test_lossless_arithmetic_still_rejected():
    # SOF10 (progressive arithmetic) decodes since r8; SOF11
    # (lossless arithmetic) remains out of scope
    rng = np.random.default_rng(31)
    comps = [{"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 1, 1)}]
    data = bytearray(encode_arith_jpeg(8, 8, comps, [QTABLE]))
    i = data.index(b"\xff\xc9")
    data[i + 1] = 0xCB  # SOF9 -> SOF11 (lossless arithmetic)
    with pytest.raises(NotImplementedError):
        decode_jpeg_bytes(bytes(data))


# ------------------------------------------------- progressive (G.1.3)
def encode_dc_first_arith(enc, stats, ctx, zz0, pred, al, cl, cu):
    v = int(zz0) >> al  # DC point transform: arithmetic shift
    diff = v - pred
    ctx = encode_dc_diff(enc, stats, ctx, diff, cl, cu)
    return v, ctx


def encode_ac_first_arith(enc, stats, zz, ss, se, al, kx):
    vals = {
        k: (1 if zz[k] > 0 else -1) * (abs(int(zz[k])) >> al)
        for k in range(ss, se + 1)
    }
    last = 0
    for k in range(ss, se + 1):
        if vals[k]:
            last = k
    if last == 0:
        enc.encode(stats, 3 * (ss - 1), 1)  # immediate EOB
        return
    k = ss
    while k <= last:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)
        while vals[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = vals[k]
        sign = 1 if v < 0 else 0
        enc.encode_fixed(sign)
        sz = abs(v) - 1
        st += 2
        if sz == 0:
            enc.encode(stats, st, 0)
            m = 0
        elif sz == 1:
            enc.encode(stats, st, 1)
            enc.encode(stats, st, 0)
            m = 1
        else:
            enc.encode(stats, st, 1)
            enc.encode(stats, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while sz >= (m << 1):
                enc.encode(stats, st, 1)
                m <<= 1
                st += 1
            enc.encode(stats, st, 0)
        st += 14
        mm = m >> 1
        while mm:
            enc.encode(stats, st, 1 if sz & mm else 0)
            mm >>= 1
        k += 1
    if last < se:
        enc.encode(stats, 3 * (k - 1), 1)


def encode_ac_refine_arith(enc, stats, zz, ss, se, ah, al):
    def vis(k, sh):
        v = int(zz[k])
        return (1 if v > 0 else -1) * (abs(v) >> sh)

    prev = {k: vis(k, ah) for k in range(ss, se + 1)}
    cur = {k: vis(k, al) for k in range(ss, se + 1)}
    kex = 0
    for kk in range(se, ss - 1, -1):
        if prev[kk]:
            kex = kk
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if all(cur[j] == 0 for j in range(k, se + 1)):
                enc.encode(stats, st, 1)  # EOB
                return
            enc.encode(stats, st, 0)
        while True:
            if prev[k]:
                # the newly revealed magnitude bit: cur = 2*prev + bit
                enc.encode(stats, st + 2, abs(cur[k]) & 1)
                break
            if cur[k]:
                enc.encode(stats, st + 1, 1)
                enc.encode_fixed(1 if cur[k] < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        k += 1


def encode_progressive_arith_jpeg(
    w, h, comp_blocks, qtables, scans, restart_interval=0
) -> bytes:
    """SOF10 mirror of test_jpeg.encode_progressive_jpeg: same scan
    scripts, QM-coded; statistics and coder re-init per scan and at
    every restart marker."""
    cl, cu, kx = 0, 1, 5
    hmax = max(c["h"] for c in comp_blocks)
    vmax = max(c["v"] for c in comp_blocks)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comp_blocks:
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        c["bw"] = (cw + 7) // 8
        c["bh"] = (ch + 7) // 8

    def units(idxs):
        if len(idxs) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    unit = []
                    for ci in idxs:
                        c = comp_blocks[ci]
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                unit.append(
                                    (ci, mx * c["h"] + hh, my * c["v"] + v)
                                )
                    yield unit
        else:
            c = comp_blocks[idxs[0]]
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    yield [(idxs[0], bx, by)]

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    for tq, q in enumerate(qtables):
        seg(0xDB, bytes([tq]) + bytes(q))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comp_blocks)])
    for i, c in enumerate(comp_blocks):
        sof += bytes([i + 1, (c["h"] << 4) | c["v"], c["tq"]])
    seg(0xCA, bytes(sof))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    for idxs, ss, se, ah, al in scans:
        sos = bytearray([len(idxs)])
        for ci in idxs:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(sos))
        enc = ArithEncoder()
        dstats = _new_dc_stats()
        astats = _new_ac_stats()
        preds = {ci: 0 for ci in idxs}
        ctxs = {ci: 0 for ci in idxs}
        rst = 0
        for ui, unit in enumerate(units(idxs)):
            if restart_interval and ui and ui % restart_interval == 0:
                out.extend(enc.flush())
                out.extend(b"\xff" + bytes([0xD0 + (rst % 8)]))
                rst += 1
                enc = ArithEncoder()
                dstats = _new_dc_stats()
                astats = _new_ac_stats()
                preds = {ci: 0 for ci in idxs}
                ctxs = {ci: 0 for ci in idxs}
            for ci, bx, by in unit:
                zz = comp_blocks[ci]["blocks"][(bx, by)]
                if ss == 0:
                    if ah == 0:
                        preds[ci], ctxs[ci] = encode_dc_first_arith(
                            enc, dstats, ctxs[ci], zz[0], preds[ci], al,
                            cl, cu,
                        )
                    else:
                        enc.encode_fixed((int(zz[0]) >> al) & 1)
                elif ah == 0:
                    encode_ac_first_arith(enc, astats, zz, ss, se, al, kx)
                else:
                    encode_ac_refine_arith(enc, astats, zz, ss, se, ah, al)
        out.extend(enc.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_arith_progressive_gray_spectral():
    from test_jpeg import _sa_ladder

    rng = np.random.default_rng(41)
    comps = [{"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 2, 2)}]
    scans = [([0], 0, 0, 0, 0), ([0], 1, 20, 0, 0), ([0], 21, 63, 0, 0)]
    data = encode_progressive_arith_jpeg(16, 16, comps, [QTABLE], scans)
    gw, gh, ch, px = decode_jpeg_bytes(data)
    got = np.frombuffer(px, dtype=np.uint8)
    exp = _expected_pixels(16, 16, comps, [QTABLE])
    np.testing.assert_array_equal(got.reshape(exp.shape), exp)


def test_arith_progressive_color_sa_ladder():
    from test_jpeg import _sa_ladder

    rng = np.random.default_rng(43)
    comps = [
        {"h": 2, "v": 2, "tq": 0, "blocks": _rand_blocks(rng, 2, 2, dense=True)},
        {"h": 1, "v": 1, "tq": 1, "blocks": _rand_blocks(rng, 1, 1)},
        {"h": 1, "v": 1, "tq": 1, "blocks": _rand_blocks(rng, 1, 1)},
    ]
    scans = _sa_ladder(3, al=2)
    data = encode_progressive_arith_jpeg(14, 13, comps, [QTABLE, QTABLE], scans)
    gw, gh, ch, px = decode_jpeg_bytes(data)
    assert (gw, gh, ch) == (14, 13, 3)
    got = np.frombuffer(px, dtype=np.uint8)
    exp = _expected_pixels(14, 13, comps, [QTABLE, QTABLE])
    np.testing.assert_array_equal(got.reshape(exp.shape), exp)


def test_arith_progressive_equals_huffman_progressive():
    from test_jpeg import _sa_ladder, encode_progressive_jpeg

    rng = np.random.default_rng(47)
    comps = [
        {"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 3, 2, dense=True)}
    ]
    scans = _sa_ladder(1, al=1)
    ja = encode_progressive_arith_jpeg(22, 11, comps, [QTABLE], scans)
    jh = encode_progressive_jpeg(22, 11, comps, [QTABLE], scans)
    assert decode_jpeg_bytes(ja) == decode_jpeg_bytes(jh)


def test_arith_progressive_with_restarts():
    rng = np.random.default_rng(53)
    comps = [{"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 4, 4)}]
    scans = [([0], 0, 0, 0, 1), ([0], 1, 63, 0, 1),
             ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    data = encode_progressive_arith_jpeg(
        32, 32, comps, [QTABLE], scans, restart_interval=3
    )
    gw, gh, ch, px = decode_jpeg_bytes(data)
    got = np.frombuffer(px, dtype=np.uint8)
    exp = _expected_pixels(32, 32, comps, [QTABLE])
    np.testing.assert_array_equal(got.reshape(exp.shape), exp)


def test_arith_12bit_gray():
    from test_jpeg import QTABLE12, _expected_pixels12, _rand_blocks12

    rng = np.random.default_rng(79)
    comps = [{"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks12(rng, 2, 2)}]
    data = encode_arith_jpeg(16, 16, comps, [QTABLE12], precision=12)
    gw, gh, ch, px = decode_jpeg_bytes(data)
    assert (gw, gh, ch) == (16, 16, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(16, 16)
    np.testing.assert_array_equal(
        got, _expected_pixels12(16, 16, comps, [QTABLE12])
    )


def test_arith_12bit_matches_huffman_12bit():
    from test_jpeg import QTABLE12, _rand_blocks12

    rng = np.random.default_rng(83)
    comps = [
        {"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks12(rng, 2, 2)},
        {"h": 1, "v": 1, "tq": 1, "blocks": _rand_blocks12(rng, 2, 2)},
        {"h": 1, "v": 1, "tq": 1, "blocks": _rand_blocks12(rng, 2, 2)},
    ]
    jh = encode_baseline_jpeg(
        16, 16, comps, [QTABLE12, QTABLE12], precision=12
    )
    ja = encode_arith_jpeg(
        16, 16, comps, [QTABLE12, QTABLE12], precision=12
    )
    assert decode_jpeg_bytes(jh) == decode_jpeg_bytes(ja)
