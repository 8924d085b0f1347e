"""Enabled-path verification of the H.264 in-loop deblocking filter
(spec §8.7) — VERDICT r8 ask #1.

Every stream in tests/test_h264.py uses disable_deblocking_filter_idc
= 1, so the filter the decoder runs on real-world streams (idc 0/2)
had no coverage. This file round-trips encoder output with the filter
ENABLED against an independent numpy model of §8.7, written
vectorized-per-edge (the decoder is scalar-per-line): Tables 8-16 /
8-17 are transcribed here separately, filterSamplesFlag is evaluated
as masked array ops rather than early-outs, and the qPp bookkeeping
is re-derived from the macroblock specs rather than read from the
decoder's frame state. A transcription or clipping bug on either
side shows up as a pixel mismatch.

Covers: bS=4 strong/3-tap filtering on MB edges (luma + chroma),
bS=3 internal transform edges, the luma p1/q1 taps, chroma qP
mapping with nonzero chroma_qp_index_offset, alpha/beta slice
offsets incl. indexA/indexB clipping at both ends of the QP range,
idc=2 slice-boundary skips, per-slice parameter mixes, and I_PCM
neighbors (qPp = 0)."""

from __future__ import annotations

import numpy as np

from openset_spark.pipeline import h264 as H
from test_h264 import _rand_mb, _ref_decode, encode_frame

# ---- independent transcription of Tables 8-16 / 8-17 ---------------
# (index 0..51; values below index 16 are all zero)
_ALPHA = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
    162, 182, 203, 226, 255, 255,
]
_BETA = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
    16, 16, 17, 17, 18, 18,
]
_TC0 = {
    1: [0] * 16 + [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                   1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8,
                   9, 10, 11, 13],
    2: [0] * 16 + [0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
                   2, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 8, 9, 10,
                   12, 13, 15, 17],
    3: [0] * 16 + [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
                   3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14,
                   16, 18, 20, 23, 25],
}
# Table 8-15: QPc as a function of qPi (chroma QP mapping)
_QPC = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                          36, 36, 37, 37, 37, 38, 38, 38, 39, 39,
                          39, 39]


def _c3(lo, hi, x):
    return np.clip(x, lo, hi)


def _qpc(qp_y: int, offset: int) -> int:
    return _QPC[int(np.clip(qp_y + offset, 0, 51))]


def _filter_pq(P, Q, bs, idx_a, idx_b, chroma):
    """§8.7.2.3/8.7.2.4 for one edge, all lines at once. P/Q are
    (n, 4) int64 arrays with P[:, 3] = p0 ... P[:, 0] = p3 and
    Q[:, 0] = q0 ... Q[:, 3] = q3. Returns filtered copies."""
    alpha, beta = _ALPHA[idx_a], _BETA[idx_b]
    p3, p2, p1, p0 = P[:, 0], P[:, 1], P[:, 2], P[:, 3]
    q0, q1, q2, q3 = Q[:, 0], Q[:, 1], Q[:, 2], Q[:, 3]
    fs = (
        (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    Pn, Qn = P.copy(), Q.copy()
    if bs == 4:
        if chroma:
            Pn[:, 3] = np.where(fs, (2 * p1 + p0 + q1 + 2) >> 2, p0)
            Qn[:, 0] = np.where(fs, (2 * q1 + q0 + p1 + 2) >> 2, q0)
            return Pn, Qn
        small = np.abs(p0 - q0) < ((alpha >> 2) + 2)
        sp = fs & ap & small
        sq = fs & aq & small
        weak = fs & ~sp  # 3-tap fallback on the p side
        Pn[:, 3] = np.where(
            sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
            np.where(weak, (2 * p1 + p0 + q1 + 2) >> 2, p0),
        )
        Pn[:, 2] = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
        Pn[:, 1] = np.where(
            sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2
        )
        weakq = fs & ~sq
        Qn[:, 0] = np.where(
            sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
            np.where(weakq, (2 * q1 + q0 + p1 + 2) >> 2, q0),
        )
        Qn[:, 1] = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
        Qn[:, 2] = np.where(
            sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2
        )
        return Pn, Qn
    # normal filter, bS 1..3
    tc0 = _TC0[bs][idx_a]
    tc = (tc0 + 1) if chroma else tc0 + ap.astype(np.int64) + aq.astype(
        np.int64
    )
    delta = _c3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    Pn[:, 3] = np.where(fs, _c3(0, 255, p0 + delta), p0)
    Qn[:, 0] = np.where(fs, _c3(0, 255, q0 - delta), q0)
    if not chroma:
        dp1 = _c3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
        dq1 = _c3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
        Pn[:, 2] = np.where(fs & ap, p1 + dp1, p1)
        Qn[:, 1] = np.where(fs & aq, q1 + dq1, q1)
    return Pn, Qn


def _ref_mb_qp(mbs, mb_w, mb_h, pic_init_qp, slice_starts):
    """Re-derive each MB's qPp from the macroblock SPECS (the stream
    inputs), independently of the decoder's frame bookkeeping. I_PCM
    records 0 and leaves the running QP untouched; MBs that carry no
    mb_qp_delta element keep the running value."""
    qp_map = np.zeros((mb_h, mb_w), dtype=np.int64)
    qp = pic_init_qp
    for addr, mb in enumerate(mbs):
        if addr in slice_starts:
            qp = pic_init_qp  # slice_qp_delta is always 0 in-test
        mby, mbx = addr // mb_w, addr % mb_w
        if mb["type"] == "pcm":
            qp_map[mby, mbx] = 0
            continue
        if mb["cbp_luma"] or mb["cbp_chroma"] or mb["type"] == "i16":
            qp = (qp + mb["qp_delta"] + 52) % 52
        qp_map[mby, mbx] = qp
    return qp_map


def ref_deblock(Y, U, V, mbs, mb_w, mb_h, pic_init_qp, chroma_offset,
                slice_starts, deblock):
    """Independent §8.7 pass over the reconstructed (pre-filter)
    planes, in place. ``deblock`` = one (idc, a_div2, b_div2) tuple
    or a per-slice list, mirroring encode_frame."""
    starts = list(slice_starts)
    slice_of = np.zeros(mb_w * mb_h, dtype=int)
    bounds = starts + [mb_w * mb_h]
    for si in range(len(starts)):
        slice_of[bounds[si]:bounds[si + 1]] = si
    qp_map = _ref_mb_qp(mbs, mb_w, mb_h, pic_init_qp, starts)

    def vedge(plane, x, y0, n, bs, qpav, aoff, boff, chroma):
        ia = int(np.clip(qpav + aoff, 0, 51))
        ib = int(np.clip(qpav + boff, 0, 51))
        P = plane[y0:y0 + n, x - 4:x].astype(np.int64)
        Q = plane[y0:y0 + n, x:x + 4].astype(np.int64)
        Pn, Qn = _filter_pq(P, Q, bs, ia, ib, chroma)
        plane[y0:y0 + n, x - 4:x] = Pn
        plane[y0:y0 + n, x:x + 4] = Qn

    def hedge(plane, y, x0, n, bs, qpav, aoff, boff, chroma):
        ia = int(np.clip(qpav + aoff, 0, 51))
        ib = int(np.clip(qpav + boff, 0, 51))
        P = plane[y - 4:y, x0:x0 + n].T.astype(np.int64)
        Q = plane[y:y + 4, x0:x0 + n].T.astype(np.int64)
        Pn, Qn = _filter_pq(P, Q, bs, ia, ib, chroma)
        plane[y - 4:y, x0:x0 + n] = Pn.T
        plane[y:y + 4, x0:x0 + n] = Qn.T

    for addr in range(mb_w * mb_h):
        si = int(slice_of[addr])
        idc, a2, b2 = deblock[si] if isinstance(deblock, list) else deblock
        if idc == 1:
            continue
        aoff, boff = a2 * 2, b2 * 2
        mby, mbx = addr // mb_w, addr % mb_w
        qp = int(qp_map[mby, mbx])
        qpc = _qpc(qp, chroma_offset)
        x16, y16, x8, y8 = mbx * 16, mby * 16, mbx * 8, mby * 8
        # 8x8-transform MBs filter only the internal edge at 8
        internal = (8,) if mbs[addr].get("type") == "i8" else (4, 8, 12)

        def mb_edge_qp(nbx, nby):
            if nbx < 0 or nby < 0:
                return None
            if idc == 2 and slice_of[nby * mb_w + nbx] != si:
                return None
            nqp = int(qp_map[nby, nbx])
            return (
                (qp + nqp + 1) >> 1,
                (qpc + _qpc(nqp, chroma_offset) + 1) >> 1,
            )

        left = mb_edge_qp(mbx - 1, mby)
        if left is not None:
            vedge(Y, x16, y16, 16, 4, left[0], aoff, boff, False)
            vedge(U, x8, y8, 8, 4, left[1], aoff, boff, True)
            vedge(V, x8, y8, 8, 4, left[1], aoff, boff, True)
        for xe in internal:
            vedge(Y, x16 + xe, y16, 16, 3, qp, aoff, boff, False)
        vedge(U, x8 + 4, y8, 8, 3, qpc, aoff, boff, True)
        vedge(V, x8 + 4, y8, 8, 3, qpc, aoff, boff, True)
        top = mb_edge_qp(mbx, mby - 1)
        if top is not None:
            hedge(Y, y16, x16, 16, 4, top[0], aoff, boff, False)
            hedge(U, y8, x8, 8, 4, top[1], aoff, boff, True)
            hedge(V, y8, x8, 8, 4, top[1], aoff, boff, True)
        for ye in internal:
            hedge(Y, y16 + ye, x16, 16, 3, qp, aoff, boff, False)
        hedge(U, y8 + 4, x8, 8, 3, qpc, aoff, boff, True)
        hedge(V, y8 + 4, x8, 8, 3, qpc, aoff, boff, True)


def _deblock_roundtrip(mb_w, mb_h, mbs, qp=26, chroma_offset=0,
                       slice_starts=(0,), deblock=(0, 0, 0)):
    """Decode an enabled-deblock stream and compare every pixel with
    _ref_decode (reconstruction) + ref_deblock (this file's model)."""
    data, _ = encode_frame(mb_w, mb_h, mbs, qp, chroma_offset,
                           (0, 0, 0, 0), slice_starts, deblock)
    w, h, y, u, v = H.decode_h264_frame(data)
    Y, U, V = _ref_decode(mb_w, mb_h, mbs, qp, chroma_offset,
                          slice_starts)
    Y = Y.astype(np.int64)
    U = U.astype(np.int64)
    V = V.astype(np.int64)
    ref_deblock(Y, U, V, mbs, mb_w, mb_h, qp, chroma_offset,
                slice_starts, deblock)
    np.testing.assert_array_equal(np.array(y), Y)
    np.testing.assert_array_equal(np.array(u), U)
    np.testing.assert_array_equal(np.array(v), V)
    return np.array(y), np.array(u), np.array(v)


def _flat_i16(dc_level, qp_delta=0, chroma_dc=0):
    """An I_16x16 DC-mode MB whose only residuals are flat DC levels
    — reconstructs to flat planes, ideal for constructing known
    pixel steps across MB edges."""
    return {
        "type": "i16", "modes": 2, "chroma_mode": 0, "cbp_luma": 0,
        "qp_delta": qp_delta, "cbp_chroma": 1 if chroma_dc else 0,
        "luma_dc": [dc_level] + [0] * 15,
        "luma": {b: [0] * 15 for b in range(16)},
        "chroma_dc": {0: [chroma_dc] + [0] * 3, 1: [0] * 4},
        "chroma_ac": {c: {b: [0] * 15 for b in range(4)} for c in range(2)},
    }


def test_deblock_bs4_strong_filter_on_mb_edge():
    """Two flat I16 MBs with a small DC step at QP 36: the MB edge is
    bS=4 and |p0-q0| < (alpha>>2)+2, so the 3/4/5-tap STRONG path
    fires on luma (and the chroma strong formula on chroma). The
    decoder must match the model exactly AND differ from its own
    unfiltered output (proving the filter ran)."""
    # small DC steps at QP 36 (post-r9 corrected DC scale: ~3 px per
    # luma DC unit, ~2.5 per chroma unit): inside alpha, so the bS=4
    # strong path fires; much larger steps would exceed alpha and be
    # correctly kept as real edges
    mbs = [_flat_i16(2, chroma_dc=2), _flat_i16(4, chroma_dc=-2)]
    y, u, v = _deblock_roundtrip(2, 1, mbs, qp=36)
    data_off, _ = encode_frame(2, 1, mbs, 36, 0, (0, 0, 0, 0), (0,),
                               (1, 0, 0))
    _, _, y0, u0, v0 = H.decode_h264_frame(data_off)
    y0 = np.array(y0)
    assert not np.array_equal(y, y0), "luma MB edge was not filtered"
    # strong filtering reaches p2/q2 — three columns on each side of
    # the x=16 edge must have moved, not just p0/q0
    changed_cols = {int(c) for c in np.where((y != y0).any(axis=0))[0]}
    assert {13, 14, 15, 16, 17, 18} <= changed_cols
    # chroma bS=4 touches only p0/q0 (one column each side of x=8)
    u0 = np.array(u0)
    uc = {int(c) for c in np.where((u != u0).any(axis=0))[0]}
    assert uc == {7, 8}


def test_deblock_normal_filter_internal_edges():
    """A single MB with per-4x4-block steps exercises the bS=3
    internal edges (normal filter incl. the p1/q1 luma taps)."""
    mb = _flat_i16(30)
    # per-block AC level steps create internal discontinuities
    mb["cbp_luma"] = 15
    mb["luma"] = {
        b: ([3, 0, 0, -2] + [0] * 11 if b % 2 else [-4, 1, 0, 0] + [0] * 11)
        for b in range(16)
    }
    y, u, v = _deblock_roundtrip(1, 1, [mb], qp=33)
    data_off, _ = encode_frame(1, 1, [mb], 33, 0, (0, 0, 0, 0), (0,),
                               (1, 0, 0))
    _, _, y0, _, _ = H.decode_h264_frame(data_off)
    assert not np.array_equal(y, np.array(y0))


def test_deblock_alpha_beta_offsets_and_qp_clipping():
    """Slice alpha/beta offsets shift indexA/indexB, clipped to
    [0, 51]: at QP 51 with +6/+6 the indexes saturate high; at QP 10
    with -6/-6 they clip to the zero region and the filter is a
    provable no-op."""
    mbs = [_flat_i16(40), _flat_i16(48)]
    _deblock_roundtrip(2, 1, mbs, qp=51, deblock=(0, 6, 6))
    _deblock_roundtrip(2, 1, mbs, qp=46, deblock=(0, -3, 2))
    # zero region: decoded output equals the unfiltered reconstruction
    data, _ = encode_frame(2, 1, mbs, 10, 0, (0, 0, 0, 0), (0,),
                           (0, -6, -6))
    _, _, y, u, v = H.decode_h264_frame(data)
    Y, U, V = _ref_decode(2, 1, mbs, 10, 0, (0,))
    np.testing.assert_array_equal(np.array(y), Y)
    np.testing.assert_array_equal(np.array(u), U)
    np.testing.assert_array_equal(np.array(v), V)


def test_deblock_chroma_qp_offset():
    """Nonzero chroma_qp_index_offset drives the chroma edges through
    the Table 8-15 mapping on BOTH the current and neighbor MB."""
    mbs = [_flat_i16(36, qp_delta=0), _flat_i16(40, qp_delta=3)]
    for off in (-12, -4, 5, 12):
        _deblock_roundtrip(2, 1, mbs, qp=38, chroma_offset=off)


def test_deblock_ipcm_neighbor_uses_qp_zero():
    """qPp of an I_PCM macroblock is 0, which halves qPav on the
    shared MB edge; the PCM payload itself provides the sharpest
    possible edges."""
    rng = np.random.default_rng(77)
    pcm = {
        "type": "pcm",
        "pcm": (
            rng.integers(0, 256, (16, 16)),
            rng.integers(0, 256, (8, 8)),
            rng.integers(0, 256, (8, 8)),
        ),
    }
    mbs = [_flat_i16(40), pcm, _flat_i16(44), _flat_i16(-30)]
    _deblock_roundtrip(2, 2, mbs, qp=44)


def test_deblock_idc2_skips_slice_boundary_edges():
    """idc=2 filters inside each slice but must not touch edges whose
    two sides belong to different slices: with the slice split on the
    MB row boundary, the horizontal y=16 luma edge (y=8 chroma) stays
    sharp, while the same stream with idc=0 smooths it."""
    mbs = [_flat_i16(4), _flat_i16(4), _flat_i16(-4), _flat_i16(-4)]
    y2, u2, v2 = _deblock_roundtrip(
        2, 2, mbs, qp=40, slice_starts=(0, 2),
        deblock=[(2, 0, 0), (2, 0, 0)],
    )
    y0, u0, v0 = _deblock_roundtrip(
        2, 2, mbs, qp=40, slice_starts=(0, 2),
        deblock=[(0, 0, 0), (0, 0, 0)],
    )
    # idc=0 filtered across the boundary; idc=2 left rows 15/16 alone
    assert not np.array_equal(y2[14:18], y0[14:18])
    step2 = np.abs(y2[16].astype(int) - y2[15].astype(int)).max()
    step0 = np.abs(y0[16].astype(int) - y0[15].astype(int)).max()
    assert step2 > step0


def test_deblock_per_slice_parameter_mix():
    """One slice disables the filter (idc=1), the other enables it
    with offsets — deblock_frame must consult each MB's own slice."""
    mbs = [_flat_i16(40), _flat_i16(-20), _flat_i16(25), _flat_i16(-45)]
    _deblock_roundtrip(
        2, 2, mbs, qp=42, slice_starts=(0, 2),
        deblock=[(1, 0, 0), (0, 2, -1)],
    )


def test_deblock_enabled_roundtrip_fuzz():
    """Random multi-MB frames (i4/i16/PCM mix, random QP ladders,
    random offsets, single- and two-slice, idc 0/2) — decoder output
    must equal reconstruction + independent §8.7 model exactly."""
    rng = np.random.default_rng(20260815)
    for trial in range(24):
        mb_w = int(rng.integers(1, 4))
        mb_h = int(rng.integers(1, 4))
        n = mb_w * mb_h
        two_slices = mb_h > 1 and rng.random() < 0.5
        if two_slices:
            split_row = int(rng.integers(1, mb_h))
            slice_starts = (0, split_row * mb_w)
        else:
            slice_starts = (0,)
        mbs = []
        for addr in range(n):
            mbx, mby = addr % mb_w, addr // mb_w
            # availability is slice-local: MBs on a slice's first row
            # must not predict from above
            eff_mby = mby
            if two_slices and mby == split_row:
                eff_mby = 0
            mbs.append(_rand_mb(rng, mbx, eff_mby, mb_w))
        qp = int(rng.choice([14, 22, 30, 37, 44, 51]))
        chroma_off = int(rng.integers(-12, 13))
        idc = int(rng.choice([0, 2]))
        a2 = int(rng.integers(-6, 7))
        b2 = int(rng.integers(-6, 7))
        _deblock_roundtrip(
            mb_w, mb_h, mbs, qp=qp, chroma_offset=chroma_off,
            slice_starts=slice_starts, deblock=(idc, a2, b2),
        )
