"""H.264 scaling matrices (7.3.2.1.1, Table 7-2 fallback rules,
weighted 8.5.12/8.5.13 dequant) — r9, closing the last High-profile
intra gap.

Entropy coding never sees scaling lists, so a CAVLC slice payload is
reusable under ANY parameter sets: tests build streams by swapping
custom SPS/PPS NALs into encoder output. Verification is three-way:
(a) explicit all-16 lists must decode bit-identically to the flat
shortcut (the algebraic identity (c*16*v) >> 4 == c*v), (b) default
and custom lists produce hand-computed known pixel values, and (c)
the parse-level fallback rules are asserted directly on crafted
RBSPs."""

from __future__ import annotations

import numpy as np

from openset_spark.pipeline import h264 as H
from test_h264 import BW, _nal, _pps_nal, encode_frame
from test_h264_deblock import _flat_i16


def _emit_scaling_list(w: BW, lst):
    last = 8
    for val in lst:
        delta = (val - last) % 256
        if delta > 127:
            delta -= 256
        w.se(delta)
        last = val


def _sps_nal_high(mb_w, mb_h, lists=None, present=None):
    """profile-100 SPS; ``lists``/``present``: 8 scaling lists and
    their present flags (None = seq_scaling_matrix_present 0).
    present[i] may be "default" to emit the use-default escape."""
    w = BW()
    w.u(100, 8)  # High profile
    w.u(0, 8)
    w.u(40, 8)
    w.ue(0)  # sps_id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.u(0, 1)  # qpprime
    if lists is None and present is None:
        w.u(0, 1)
    else:
        w.u(1, 1)  # seq_scaling_matrix_present
        for i in range(8):
            flag = present[i]
            if flag == 0:
                w.u(0, 1)
            elif flag == "default":
                w.u(1, 1)
                w.se(-8)  # nextScale 0 at j=0 -> useDefault
            else:
                w.u(1, 1)
                _emit_scaling_list(w, lists[i])
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(0)  # log2_max_poc_minus4
    w.ue(1)
    w.u(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)
    w.u(1, 1)
    w.u(0, 1)  # no crop
    w.u(0, 1)  # no vui
    return _nal(7, w.rbsp())


def _pps_nal_scaling(pic_init_qp, transform8x8, lists, present,
                     chroma_offset=0):
    """PPS with pic_scaling_matrix_present=1."""
    w = BW()
    w.ue(0)
    w.ue(0)
    w.u(0, 1)  # CAVLC
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(pic_init_qp - 26)
    w.se(0)
    w.se(chroma_offset)
    w.u(1, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.u(transform8x8, 1)
    w.u(1, 1)  # pic_scaling_matrix_present
    n_lists = 6 + 2 * transform8x8
    for i in range(n_lists):
        flag = present[i]
        if flag == 0:
            w.u(0, 1)
        elif flag == "default":
            w.u(1, 1)
            w.se(-8)
        else:
            w.u(1, 1)
            _emit_scaling_list(w, lists[i])
    w.se(chroma_offset)  # second_chroma_qp_index_offset
    return _nal(8, w.rbsp())


def _swap_params(stream: bytes, sps_nal: bytes, pps_nal: bytes) -> bytes:
    """Replace the SPS/PPS NALs of an encoded stream, keeping slices."""
    out = bytearray()
    for nal in H.split_nals(stream):
        if not nal:
            continue
        t = nal[0] & 0x1F
        if t == 7:
            out += sps_nal
        elif t == 8:
            out += pps_nal
        else:
            out += b"\x00\x00\x00\x01" + nal
    return bytes(out)


FLAT16_4 = [16] * 16
FLAT16_8 = [16] * 64


def test_explicit_flat_lists_match_flat_shortcut():
    """All-16 lists through the general weighted formulas must equal
    the no-matrix fast path bit-for-bit (4x4, 16x16 DC, chroma, 8x8),
    across the QP shift pivots."""
    rng = np.random.default_rng(3)
    from test_h264 import _rand_mb

    for qp in (10, 23, 24, 35, 36, 47):
        mbs = [_rand_mb(rng, x, y, 2, allow_pcm=False, allow_i8=True)
               for y in range(2) for x in range(2)]
        base, _ = encode_frame(2, 2, mbs, qp, transform8x8=1)
        ref = H.decode_h264_frame(base)
        sps = _sps_nal_high(2, 2, [FLAT16_4] * 6 + [FLAT16_8] * 2,
                            [1] * 8)
        pps = _pps_nal_scaling(qp, 1, [FLAT16_4] * 6 + [FLAT16_8] * 2,
                               [1] * 8)
        got = H.decode_h264_frame(_swap_params(base, sps, pps))
        assert got == ref


def test_sps_fallback_rule_a_and_use_default():
    """Absent lists 0/3/6/7 take defaults; absent others copy the
    previous list; the j=0 nextScale-0 escape selects the default."""
    sps_nal = _sps_nal_high(1, 1, [None] * 8, [0] * 8)
    sps = H.parse_sps(H.rbsp_unescape(sps_nal[5:]))
    l4, l8 = sps["seq_scaling"]
    assert l4[0] == H.DEFAULT_4X4_INTRA
    assert l4[1] == H.DEFAULT_4X4_INTRA  # copies previous
    assert l4[3] == H.DEFAULT_4X4_INTER
    assert l4[5] == H.DEFAULT_4X4_INTER
    assert l8[0] == H.DEFAULT_8X8_INTRA
    assert l8[1] == H.DEFAULT_8X8_INTER
    # use-default escape on an otherwise present list
    custom = list(range(20, 36))
    sps_nal = _sps_nal_high(
        1, 1, [custom] + [None] * 7,
        [1, "default", 0, 0, 0, 0, 0, 0],
    )
    l4, _ = H.parse_sps(H.rbsp_unescape(sps_nal[5:]))["seq_scaling"]
    assert l4[0] == custom
    assert l4[1] == H.DEFAULT_4X4_INTRA  # escape -> default, NOT copy
    assert l4[2] == H.DEFAULT_4X4_INTRA  # then copies the default


def test_pps_fallback_rule_b_inherits_sps():
    custom = [16] * 15 + [40]
    sps_nal = _sps_nal_high(1, 1, [custom] + [None] * 7,
                            [1, 0, 0, 0, 0, 0, 0, 0])
    sps = H.parse_sps(H.rbsp_unescape(sps_nal[5:]))
    override = [16] * 14 + [99, 16]
    pps_nal = _pps_nal_scaling(
        26, 1, [None, override] + [None] * 6,
        [0, 1, 0, 0, 0, 0, 0, 0],
    )
    pps = H.parse_pps(H.rbsp_unescape(pps_nal[5:]), sps)
    # list 0 absent in PPS -> inherits the SPS list (rule B)
    assert pps["w4"][0] == custom
    assert pps["w4"][1] == override
    assert pps["w4"][2] == override  # copies previous
    assert pps["w4"][3] == H.DEFAULT_4X4_INTER  # SPS fell back there
    assert pps["w8"][0] == H.DEFAULT_8X8_INTRA


def test_known_value_i16_dc_default_intra_list():
    """Default intra list weight(0,0)=6: one DC level at QP 36 adds
    (1*6*10 + 32) >> 6 = 1 pixel level (flat 16 adds 3)."""
    mb = _flat_i16(1)
    base, _ = encode_frame(1, 1, [mb], 36)
    sps = _sps_nal_high(1, 1, [None] * 8, [0] * 8)  # all defaults
    pps = _pps_nal(36, entropy=0)
    _, _, y, _, _ = H.decode_h264_frame(_swap_params(base, sps, pps))
    assert y[0][0] == 129
    _, _, yflat, _, _ = H.decode_h264_frame(base)
    assert yflat[0][0] == 131


def test_known_value_custom_4x4_ac_weight():
    """A custom list doubling one AC weight doubles exactly that
    coefficient's dequant at qp >= 24: scan position 1 (raster (0,1),
    normAdjust class 2) with weight 32 at QP 24 gives
    (3*32*13) << 0 >> 4 = 78 vs flat 39."""
    mb = {
        "type": "i4", "modes": [2] * 16, "chroma_mode": 0,
        "cbp_luma": 1, "cbp_chroma": 0, "qp_delta": 0,
        "luma": {b: ([0, 3] + [0] * 14 if b == 0 else [0] * 16)
                 for b in range(16)},
        "chroma_dc": {0: [0] * 4, 1: [0] * 4},
        "chroma_ac": {c: {b: [0] * 15 for b in range(4)}
                      for c in range(2)},
    }
    base, _ = encode_frame(1, 1, [mb], 24)
    _, _, yflat, _, _ = H.decode_h264_frame(base)
    lst = [16, 32] + [16] * 14
    sps = _sps_nal_high(1, 1, [lst] + [FLAT16_4] * 5 + [FLAT16_8] * 2,
                        [1] * 8)
    pps = _pps_nal(24, entropy=0)
    _, _, y, _, _ = H.decode_h264_frame(_swap_params(base, sps, pps))
    # residual for coefficient at (0,1): inverse transform spreads
    # it, but the (0,0) pixel delta doubles exactly with the weight
    d_flat = yflat[0][0] - 128
    d_wide = y[0][0] - 128
    assert d_flat != 0
    assert d_wide == (
        H.inverse_4x4(
            H._dequant_4x4([0, 3] + [0] * 14, 24, weights=lst)
        )[0][0]
    )
    assert abs(d_wide) > abs(d_flat)


def test_known_value_8x8_default_list():
    """8x8 DC with the default intra list (w(0,0)=6) at QP 36:
    (1*6*20) << 0 = 120 -> (120+32)>>6 = 2 pixel levels."""
    levels = {b: [0] * 64 for b in range(4)}
    levels[0][0] = 1
    mb = {
        "type": "i8", "modes": [2] * 4, "chroma_mode": 0,
        "cbp_luma": 1, "cbp_chroma": 0, "qp_delta": 0,
        "luma8": levels,
        "chroma_dc": {0: [0] * 4, 1: [0] * 4},
        "chroma_ac": {c: {b: [0] * 15 for b in range(4)}
                      for c in range(2)},
    }
    base, _ = encode_frame(1, 1, [mb], 36, transform8x8=1)
    _, _, yflat, _, _ = H.decode_h264_frame(base)
    assert yflat[0][0] == 128 + ((1 * 16 * 20 + 32) >> 6)  # flat = 133
    sps = _sps_nal_high(1, 1, [None] * 8, [0] * 8)
    pps = _pps_nal(36, entropy=0, transform8x8=1)
    _, _, y, _, _ = H.decode_h264_frame(_swap_params(base, sps, pps))
    assert y[0][0] == 130


def test_chroma_lists_apply_per_component():
    """Intra chroma uses list 1 (Cb) and list 2 (Cr) — a weight
    boost on list 1 only must move U and leave V at the default."""
    mb = _flat_i16(0)
    mb["cbp_chroma"] = 1
    mb["chroma_dc"] = {0: [2, 0, 0, 0], 1: [2, 0, 0, 0]}
    base, _ = encode_frame(1, 1, [mb], 30)
    _, _, _, uflat, vflat = H.decode_h264_frame(base)
    boosted = [48] + [16] * 15
    sps = _sps_nal_high(
        1, 1, [FLAT16_4, boosted, FLAT16_4, FLAT16_4, FLAT16_4,
               FLAT16_4, FLAT16_8, FLAT16_8], [1] * 8,
    )
    pps = _pps_nal(30, entropy=0)
    _, _, _, u, v = H.decode_h264_frame(_swap_params(base, sps, pps))
    assert v == vflat  # Cr untouched (its list is flat)
    assert u != uflat  # Cb scaled up by the boosted w(0,0)
    assert u[0][0] - 128 > uflat[0][0] - 128 > 0
