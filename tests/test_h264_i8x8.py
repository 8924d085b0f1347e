"""High-profile 8x8 transform (r9): transform_size_8x8_flag streams
round-tripped against the independent numpy 8x8 model — intra 8x8
prediction with §8.3.2.2.1 reference filtering, the 8.5.13 dequant
(flat lists) + integer butterfly, the CAVLC four-sub-block
interleave, deblocking's transform-block-edge rule (internal 4/12
luma edges unfiltered), and the PPS second_chroma_qp_index_offset."""

from __future__ import annotations

import numpy as np

from openset_spark.pipeline import h264 as H
from test_h264 import _rand_mb, _ref_decode, encode_frame
from test_h264_deblock import ref_deblock


def _i8_roundtrip(mb_w, mb_h, mbs, qp=26, chroma_offset=0,
                  deblock=(1, 0, 0), second_chroma=None,
                  slice_starts=(0,)):
    data, _ = encode_frame(
        mb_w, mb_h, mbs, qp, chroma_offset, (0, 0, 0, 0), slice_starts,
        deblock, transform8x8=1, second_chroma=second_chroma,
    )
    w, h, y, u, v = H.decode_h264_frame(data)
    Y, U, V = _ref_decode(mb_w, mb_h, mbs, qp, chroma_offset,
                          slice_starts, second_chroma=second_chroma)
    Y = Y.astype(np.int64)
    U = U.astype(np.int64)
    V = V.astype(np.int64)
    if (deblock[0] if not isinstance(deblock, list) else 0) != 1 or (
        isinstance(deblock, list)
    ):
        assert second_chroma in (None, chroma_offset), (
            "deblock ref model assumes one chroma offset"
        )
        ref_deblock(Y, U, V, mbs, mb_w, mb_h, qp, chroma_offset,
                    slice_starts, deblock)
    np.testing.assert_array_equal(np.array(y), Y)
    np.testing.assert_array_equal(np.array(u), U)
    np.testing.assert_array_equal(np.array(v), V)
    return np.array(y), np.array(u), np.array(v)


def _flat_i8(modes, cbp_luma=0, levels=None, qp_delta=0):
    mb = {
        "type": "i8", "modes": modes, "chroma_mode": 0,
        "cbp_luma": cbp_luma, "cbp_chroma": 0, "qp_delta": qp_delta,
        "luma8": levels or {b: [0] * 64 for b in range(4)},
        "chroma_dc": {0: [0] * 4, 1: [0] * 4},
        "chroma_ac": {c: {b: [0] * 15 for b in range(4)} for c in range(2)},
    }
    return mb


def test_i8x8_dc_only_single_mb():
    levels = {b: [0] * 64 for b in range(4)}
    levels[0][0] = 9
    levels[3][0] = -6
    _i8_roundtrip(1, 1, [_flat_i8([2, 2, 2, 2], cbp_luma=9,
                                  levels=levels, qp_delta=2)], qp=28)


def test_i8x8_all_modes_with_neighbors():
    """A 3x2 grid of i8 MBs with mode choices spanning all nine
    prediction modes (availability-legal per block) + dense random
    residuals — exercises the reference filtering on every edge
    configuration, including above-right padding."""
    rng = np.random.default_rng(17)
    mbs = [
        _rand_mb(rng, x, y, 3, allow_pcm=False, allow_i8=True)
        for y in range(2) for x in range(3)
    ]
    # force i8 everywhere with full luma cbp for residual coverage
    for i, mb in enumerate(mbs):
        if mb["type"] != "i8":
            mbs[i] = _rand_mb(rng, i % 3, i // 3, 3, allow_pcm=False,
                              allow_i8=True)
            while mbs[i]["type"] != "i8":
                mbs[i] = _rand_mb(rng, i % 3, i // 3, 3,
                                  allow_pcm=False, allow_i8=True)
    for mb in mbs:
        mb["cbp_luma"] = 15
        for b in range(4):
            if not any(mb["luma8"][b]):
                mb["luma8"][b][5] = 3
    _i8_roundtrip(3, 2, mbs, qp=30)


def test_i8x8_qp_sweep_dequant_pivot():
    """The 8x8 dequant pivots at QP 36 (shift vs rounded downshift) —
    sweep both sides and the extremes."""
    levels = {b: [0] * 64 for b in range(4)}
    levels[0] = [7, -3, 2, 0, 1] + [0] * 59
    levels[1][63] = 4  # the final scan position
    for qp in (0, 10, 20, 35, 36, 37, 45, 51):
        _i8_roundtrip(
            1, 1,
            [_flat_i8([2, 2, 2, 2], cbp_luma=3, levels=levels)],
            qp=qp,
        )


def test_i8x8_mixed_with_4x4_and_16x16():
    """i8 MBs interleaved with i4/i16/PCM neighbors: mode prediction
    crosses block-size boundaries (8x8 modes recorded per 4x4 cell),
    and the CAVLC nC contexts mix sub-block and plain 4x4 nnz."""
    rng = np.random.default_rng(23)
    for trial in range(8):
        mb_w = int(rng.integers(1, 4))
        mb_h = int(rng.integers(1, 4))
        mbs = [
            _rand_mb(rng, a % mb_w, a // mb_w, mb_w, allow_i8=True)
            for a in range(mb_w * mb_h)
        ]
        qp = int(rng.choice([14, 26, 33, 40, 51]))
        _i8_roundtrip(mb_w, mb_h, mbs, qp=qp,
                      chroma_offset=int(rng.integers(-6, 7)))


def test_i8x8_deblock_skips_quarter_edges():
    """With the 8x8 transform there are no 4x4 transform edges: the
    internal luma edges at x/y offsets 4 and 12 must stay UNfiltered
    while offset 8 filters (both verified vs the adapted model, and
    the 4/12 skip shown against an i4 twin that does filter there)."""
    # near-flat 8x8 halves with a small DC step across the offset-8
    # edges: inside alpha, so the bS=3 filter fires there (a sharp
    # random-texture edge would correctly be LEFT alone)
    levels = {b: [(4 if b in (0, 2) else 6)] + [0] * 63 for b in range(4)}
    mbs8 = [_flat_i8([2, 2, 2, 2], cbp_luma=15, levels=levels)]
    y8, _, _ = _i8_roundtrip(1, 1, mbs8, qp=40, deblock=(0, 0, 0))
    data_off, _ = encode_frame(1, 1, mbs8, 40, 0, (0, 0, 0, 0), (0,),
                               (1, 0, 0), transform8x8=1)
    _, _, y0, _, _ = H.decode_h264_frame(data_off)
    y0 = np.array(y0)
    # some pixel near the offset-8 edge moved...
    assert not np.array_equal(y8[:, 6:10], y0[:, 6:10]) or not (
        np.array_equal(y8[6:10, :], y0[6:10, :])
    )
    # ...but columns/rows that only a 4x4-edge filter would touch
    # (offsets 4/12, beyond the +-2 reach of the offset-8 edge) are
    # bit-identical to the unfiltered decode
    # (rows 5..10 are reachable by the HORIZONTAL offset-8 edge, and
    # cols 5..10 by the vertical one — exclude that band)
    keep = [r for r in range(16) if not 5 <= r <= 10]
    for e in (4, 12):
        assert np.array_equal(
            y8[np.ix_(keep, range(e - 2, e + 2))],
            y0[np.ix_(keep, range(e - 2, e + 2))],
        )
        assert np.array_equal(
            y8[np.ix_(range(e - 2, e + 2), keep)],
            y0[np.ix_(range(e - 2, e + 2), keep)],
        )


def test_second_chroma_qp_offset():
    """High-profile PPS second_chroma_qp_index_offset drives Cr
    through a different QPc than Cb."""
    rng = np.random.default_rng(41)
    mb = _flat_i8([2, 2, 2, 2])
    mb["cbp_chroma"] = 2
    mb["chroma_dc"] = {0: [8, 0, 0, 0], 1: [-8, 0, 0, 0]}
    mb["chroma_ac"] = {
        c: {b: [3, 0, -2] + [0] * 12 for b in range(4)} for c in range(2)
    }
    for second in (-12, -4, 0, 6, 12):
        _i8_roundtrip(1, 1, [mb], qp=33, chroma_offset=3,
                      second_chroma=second)


def test_i8x8_multi_slice_and_pcm_neighbors():
    rng = np.random.default_rng(53)
    mbs = []
    for y in range(3):
        for x in range(2):
            eff_y = 0 if y == 1 else y
            mbs.append(
                _rand_mb(rng, x, eff_y, 2, allow_pcm=True, allow_i8=True)
            )
    _i8_roundtrip(2, 3, mbs, qp=32, slice_starts=(0, 2))
