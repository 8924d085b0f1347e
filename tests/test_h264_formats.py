"""H.264 monochrome (4:0:0) and High-10 (bit depth > 8) coverage.

Strategy mirrors the repo's codec posture (in-test encoder + exact
cross-checks), with two DIFFERENTIAL oracles that lean on the already
independently-verified 4:2:0/8-bit path:

- monochrome: the luma bitstream syntax and reconstruction are
  IDENTICAL to 4:2:0 (only chroma syntax disappears), so a 4:0:0
  encode of the same macroblock specs must decode to exactly the
  4:2:0 stream's luma plane.
- High-10: every intra predictor and the IDCT are equivariant under
  a constant +384 sample shift (128 -> 512 neutral level), and
  dequant at QPY uses qP = QPY + 12 — so a 10-bit stream at
  QPY = Q-12 carrying the same levels as an 8-bit stream at Q must
  decode to exactly (8-bit plane + 384), provided nothing clips
  (asserted). This exercises the full 10-bit parse/dequant/predict
  path against already-proven 8-bit arithmetic.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

from openset_spark.pipeline import h264 as H
from test_h264 import BW, _nal, _sps_nal, _rand_mb, encode_frame
from test_h264_cabac import encode_frame_cabac


def _neutral_chroma(mb):
    """Strip chroma signal so 4:0:0 and 4:2:0 encodes share a spec."""
    mb = copy.deepcopy(mb)
    if mb["type"] == "pcm":
        return mb
    mb["cbp_chroma"] = 0
    mb["chroma_mode"] = 0
    return mb


def _shrink_levels(mb):
    """Clamp residual levels to {-1, 0, 1}: keeps every reconstructed
    sample far from both clip rails in the +384 differential."""
    mb = copy.deepcopy(mb)

    def cl(lst):
        return [max(-1, min(1, v)) for v in lst]

    for key in ("luma_dc",):
        if key in mb:
            mb[key] = cl(mb[key])
    for key in ("luma", "luma8"):
        if key in mb:
            mb[key] = {b: cl(v) for b, v in mb[key].items()}
    if "chroma_dc" in mb:
        mb["chroma_dc"] = {c: cl(v) for c, v in mb["chroma_dc"].items()}
    if "chroma_ac" in mb:
        mb["chroma_ac"] = {
            c: {b: cl(v) for b, v in blks.items()}
            for c, blks in mb["chroma_ac"].items()
        }
    mb["qp_delta"] = 0
    return mb


def _mixed_mbs(seed, n, mb_w, *, chroma_neutral, shrink=False,
               allow_pcm=True):
    rng = np.random.default_rng(seed)
    mbs = []
    for addr in range(n):
        mb = _rand_mb(rng, addr % mb_w, addr // mb_w, mb_w,
                      allow_pcm=allow_pcm, allow_i8=True)
        if shrink and mb["type"] != "pcm":
            mb = _shrink_levels(mb)
        if chroma_neutral:
            mb = _neutral_chroma(mb)
        mbs.append(mb)
    return mbs


# ------------------------------------------------------------------
# SPS format fields
# ------------------------------------------------------------------
def test_sps_format_fields():
    sps = H.parse_sps(
        H.rbsp_unescape(_sps_nal(3, 2, chroma_format=0, bit_depth=10)[5:])
    )
    assert sps["chroma_format"] == 0
    assert sps["bit_depth"] == 10
    # baseline SPS defaults to 4:2:0 / 8-bit
    sps = H.parse_sps(H.rbsp_unescape(_sps_nal(3, 2)[5:]))
    assert sps["chroma_format"] == 1
    assert sps["bit_depth"] == 8


def test_sps_rejects_422():
    w = BW()
    w.u(100, 8)
    w.u(0, 8)
    w.u(30, 8)
    w.ue(0)  # sps_id
    w.ue(2)  # chroma_format_idc = 4:2:2
    with pytest.raises(NotImplementedError):
        H.parse_sps(H.rbsp_unescape(_nal(7, w.rbsp())[5:]))


# ------------------------------------------------------------------
# monochrome
# ------------------------------------------------------------------
def test_monochrome_pcm_roundtrip():
    y = [[(7 * x + 13 * yy) % 256 for x in range(16)] for yy in range(16)]
    mbs = [{
        "type": "pcm",
        "pcm": (np.array(y), np.zeros((8, 8), int), np.zeros((8, 8), int)),
    }]
    data, _ = encode_frame(1, 1, mbs, chroma_format=0)
    w, h, Y, U, V = H.decode_h264_frame(data)
    assert (w, h) == (16, 16)
    assert U is None and V is None
    assert Y == y


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_monochrome_luma_matches_420(entropy):
    """4:0:0 decode == the 4:2:0 stream's luma, exactly — mixed
    i4/i16/i8x8/PCM macroblocks, qp deltas, deblocking enabled."""
    mb_w, mb_h = 3, 2
    mbs = _mixed_mbs(1234, mb_w * mb_h, mb_w, chroma_neutral=True)
    kw = dict(transform8x8=1, deblock=(0, 0, 0))
    if entropy == "cavlc":
        d420, _ = encode_frame(mb_w, mb_h, mbs, **kw)
        dmono, _ = encode_frame(mb_w, mb_h, mbs, chroma_format=0, **kw)
    else:
        d420 = encode_frame_cabac(mb_w, mb_h, mbs, **kw)
        dmono = encode_frame_cabac(mb_w, mb_h, mbs, chroma_format=0, **kw)
    _, _, y0, u0, v0 = H.decode_h264_frame(d420)
    _, _, y1, u1, v1 = H.decode_h264_frame(dmono)
    assert u0 is not None and v0 is not None
    assert u1 is None and v1 is None
    assert y1 == y0


# ------------------------------------------------------------------
# High 10
# ------------------------------------------------------------------
@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_high10_pcm_roundtrip(entropy):
    y = [[(67 * x + 31 * yy + 700) % 1024 for x in range(16)]
         for yy in range(16)]
    u = [[(x * 101 + yy) % 1024 for x in range(8)] for yy in range(8)]
    v = [[(x + yy * 97 + 1000) % 1024 for x in range(8)] for yy in range(8)]
    mbs = [{"type": "pcm", "pcm": (np.array(y), np.array(u), np.array(v))}]
    if entropy == "cavlc":
        data, _ = encode_frame(1, 1, mbs, bit_depth=10)
    else:
        data = encode_frame_cabac(1, 1, mbs, bit_depth=10)
    w, h, Y, U, V = H.decode_h264_frame(data)
    assert (w, h) == (16, 16)
    assert Y == y and U == u and V == v
    assert max(max(r) for r in Y) > 255  # really 10-bit samples


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_high10_tracks_8bit_plus_384(entropy):
    """Same levels, QPY(10-bit) = QPY(8-bit) - 12: every decoded
    sample must come out exactly 384 above the 8-bit decode, luma
    and chroma (the shift-equivariance differential). No-clip is
    asserted so the equivalence is airtight."""
    mb_w, mb_h = 3, 2
    q8 = 20
    mbs = _mixed_mbs(77, mb_w * mb_h, mb_w, chroma_neutral=False,
                     shrink=True, allow_pcm=False)
    kw = dict(transform8x8=1, deblock=(1, 0, 0))
    if entropy == "cavlc":
        d8, _ = encode_frame(mb_w, mb_h, mbs, pic_init_qp=q8, **kw)
        d10, _ = encode_frame(mb_w, mb_h, mbs, pic_init_qp=q8 - 12,
                              bit_depth=10, **kw)
    else:
        d8 = encode_frame_cabac(mb_w, mb_h, mbs, pic_init_qp=q8, **kw)
        d10 = encode_frame_cabac(mb_w, mb_h, mbs, pic_init_qp=q8 - 12,
                                 bit_depth=10, **kw)
    _, _, y8, u8, v8 = H.decode_h264_frame(d8)
    _, _, y10, u10, v10 = H.decode_h264_frame(d10)
    for p8, p10 in ((y8, y10), (u8, u10), (v8, v10)):
        a8 = np.array(p8)
        # the no-clip guard that makes the differential exact
        assert a8.min() > 0 and a8.max() < 255
        assert np.array_equal(np.array(p10), a8 + 384)


def test_high10_qp_wrap_range():
    """QPY wraps in [-12, 51] at bit depth 10 (7.4.5): drive a qp
    delta that lands below zero and confirm the dequant still uses
    qP = QPY + 12 >= 0 (decode succeeds, samples legal)."""
    mbs = _mixed_mbs(5, 1, 1, chroma_neutral=False, shrink=True,
                     allow_pcm=False)
    mbs[0]["qp_delta"] = -3
    data, _ = encode_frame(1, 1, mbs, pic_init_qp=1, bit_depth=10,
                           transform8x8=1)
    _, _, Y, U, V = H.decode_h264_frame(data)
    assert all(0 <= v <= 1023 for row in Y for v in row)


# ------------------------------------------------------------------
# deblocking at 10 bits
# ------------------------------------------------------------------
def test_deblock_thresholds_scale_with_bit_depth():
    """8.7.2.2: alpha/beta/tC0 scale by 1 << (bd-8). Exact check of
    one bS=3 vertical edge line at bd=10 against the spec formulas
    computed independently here."""
    qp, a_off, b_off = 30, 0, 0
    alpha8, beta8, tc08 = 18, 9, 2  # table values at index 30, bS 3
    alpha, beta, tc0 = alpha8 << 2, beta8 << 2, tc08 << 2
    # p3..q3 chosen to fire the filter (|p0-q0| < alpha etc.)
    line = [400, 402, 404, 410, 460, 462, 464, 466]
    p3, p2, p1, p0, q0, q1, q2, q3 = line
    # independent spec math (8.7.2.3, luma, bS<4)
    ap = abs(p2 - p0) < beta
    aq = abs(q2 - q0) < beta
    assert abs(p0 - q0) < alpha and abs(p1 - p0) < beta
    tc = tc0 + (1 if ap else 0) + (1 if aq else 0)
    delta = max(-tc, min(tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3))
    exp_p0 = max(0, min(1023, p0 + delta))
    exp_q0 = max(0, min(1023, q0 - delta))
    exp_p1 = p1 + max(-tc0, min(tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)) if ap else p1
    exp_q1 = q1 + max(-tc0, min(tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)) if aq else q1

    plane = [list(line)]
    H._deblock_edges(plane, 4, 0, 1, True, 3, qp, a_off, b_off, False,
                     bd=10)
    assert plane[0][3] == exp_p0 and plane[0][4] == exp_q0
    assert plane[0][2] == exp_p1 and plane[0][5] == exp_q1
    # without the bit-depth scaling this edge would NOT fire at all
    # (|p0-q0| = 50 >= alpha8 = 18): prove the 8-bit thresholds skip
    plane8 = [list(line)]
    H._deblock_edges(plane8, 4, 0, 1, True, 3, qp, a_off, b_off, False,
                     bd=8)
    assert plane8[0] == list(line)
