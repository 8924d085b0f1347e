"""End-to-end VP8 keyframe round-trips: the in-test encoder
(tests/test_vp8.py) produces real RFC 6386 bitstreams which
``decode_vp8_frame`` must reconstruct EXACTLY per the independent
numpy reference model (``expected_planes`` — same RFC, deliberately
different formulations). Loop-filter correctness is pinned by the
flat-frame identity: zero residuals reconstruct to a constant plane,
on which every filter variant must be a no-op.
"""

from __future__ import annotations

import numpy as np
import pytest

from openset_spark.pipeline import vp8 as V
from openset_spark.pipeline.vp8 import decode_vp8_frame, vp8_to_rgb

from test_vp8 import VP8Encoder, expected_planes


def _rand_levels(rng, density=0.35, mag=18, first=0):
    lv = [0] * 16
    for i in range(first, 16):
        if rng.random() < density:
            v = int(rng.integers(1, mag + 1))
            lv[i] = v if rng.random() < 0.5 else -v
    return lv


def _rand_mb(rng, density=0.35, mag=18, allow_skip=False, nseg=0):
    ymode = int(rng.integers(0, 5))
    mb = {
        "ymode": ymode,
        "uvmode": int(rng.integers(0, 4)),
        "u": [_rand_levels(rng, density, mag) for _ in range(4)],
        "v": [_rand_levels(rng, density, mag) for _ in range(4)],
    }
    if ymode == V.B_PRED:
        mb["bmodes"] = [int(rng.integers(0, 10)) for _ in range(16)]
        mb["y"] = [_rand_levels(rng, density, mag) for _ in range(16)]
    else:
        mb["y2"] = _rand_levels(rng, density, mag)
        mb["y"] = [
            _rand_levels(rng, density, mag, first=1) for _ in range(16)
        ]
    if allow_skip and rng.random() < 0.3:
        mb["skip"] = 1
    if nseg:
        mb["segment"] = int(rng.integers(0, nseg))
    return mb


def _assert_frame(enc: VP8Encoder, mbs):
    data = enc.encode(mbs)
    w, h, y, u, v = decode_vp8_frame(data)
    assert (w, h) == (enc.w, enc.h)
    refY, refU, refV = expected_planes(enc, mbs)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    assert np.array_equal(np.array(y), refY[:h, :w])
    assert np.array_equal(np.array(u), refU[:ch, :cw])
    assert np.array_equal(np.array(v), refV[:ch, :cw])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_frame_roundtrip_mode_mix(seed):
    rng = np.random.default_rng(seed)
    enc = VP8Encoder(48, 32, q_index=int(rng.integers(0, 128)))
    mbs = [_rand_mb(rng) for _ in range(enc.mb_w * enc.mb_h)]
    _assert_frame(enc, mbs)


def test_frame_roundtrip_cropped_dims():
    # non-multiple-of-16 dims exercise the crop path (and the
    # replicated-edge prediction rule at the right/bottom MB borders)
    rng = np.random.default_rng(7)
    enc = VP8Encoder(20, 12, q_index=60)
    mbs = [_rand_mb(rng) for _ in range(enc.mb_w * enc.mb_h)]
    _assert_frame(enc, mbs)


def test_frame_roundtrip_skip_flags():
    rng = np.random.default_rng(11)
    enc = VP8Encoder(32, 32, q_index=40, mb_no_skip=True, prob_skip=120)
    mbs = [
        _rand_mb(rng, allow_skip=True) for _ in range(enc.mb_w * enc.mb_h)
    ]
    mbs[0]["skip"] = 1  # at least one on each path
    mbs[1]["skip"] = 0
    _assert_frame(enc, mbs)


def test_frame_roundtrip_segmentation_and_qdeltas():
    rng = np.random.default_rng(13)
    seg = {
        "abs": 0,
        "quant": [0, -12, 15, 30],
        "filter": [0, 0, 0, 0],
        "probs": [200, 128, 80],
    }
    enc = VP8Encoder(
        48, 16, q_index=50, q_deltas=(4, -2, 3, -4, 5), segmentation=seg
    )
    mbs = [
        _rand_mb(rng, nseg=4) for _ in range(enc.mb_w * enc.mb_h)
    ]
    _assert_frame(enc, mbs)


def test_frame_roundtrip_multi_partition_and_prob_updates():
    rng = np.random.default_rng(17)
    enc = VP8Encoder(32, 48, q_index=30, n_part_log2=2, prob_seed=99)
    mbs = [_rand_mb(rng) for _ in range(enc.mb_w * enc.mb_h)]
    _assert_frame(enc, mbs)


@pytest.mark.parametrize("ftype,flevel", [(0, 24), (1, 24), (0, 63)])
def test_loop_filter_flat_frame_identity(ftype, flevel):
    # zero residual + DC prediction reconstructs a constant 128 plane;
    # every loop-filter variant must leave it untouched
    enc = VP8Encoder(
        48, 32, q_index=40, filter_type=ftype, filter_level=flevel
    )
    zero = [0] * 16
    mbs = [
        {
            "ymode": V.DC_PRED,
            "uvmode": V.DC_PRED,
            "y": [list(zero) for _ in range(16)],
            "y2": list(zero),
            "u": [list(zero) for _ in range(4)],
            "v": [list(zero) for _ in range(4)],
        }
        for _ in range(enc.mb_w * enc.mb_h)
    ]
    w, h, y, u, v = decode_vp8_frame(enc.encode(mbs))
    assert all(px == 128 for row in y for px in row)
    assert all(px == 128 for row in u for px in row)
    assert all(px == 128 for row in v for px in row)


def test_loop_filter_smoke_on_textured_frame():
    # no exact reference for the filtered path — assert decode runs
    # and output stays in range on a frame with real residuals
    rng = np.random.default_rng(23)
    enc = VP8Encoder(32, 32, q_index=80, filter_type=0, filter_level=32)
    mbs = [_rand_mb(rng, density=0.5) for _ in range(enc.mb_w * enc.mb_h)]
    w, h, y, u, v = decode_vp8_frame(enc.encode(mbs))
    assert len(y) == h and len(y[0]) == w
    assert all(0 <= px <= 255 for row in y for px in row)


def test_vp8_to_rgb_bt601_known_values():
    # single gray pixel: Y=128,U=V=128 -> (130,130,130) under the
    # integer BT.601 matrix ((298*(128-16)+128)>>8); Y=16 -> black
    rgb = vp8_to_rgb(1, 1, [[128]], [[128]], [[128]])
    assert rgb == bytes([130, 130, 130])
    rgb = vp8_to_rgb(1, 1, [[16]], [[128]], [[128]])
    assert rgb == bytes([0, 0, 0])
