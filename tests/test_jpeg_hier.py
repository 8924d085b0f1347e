"""Hierarchical JPEG (T.81 Annex J): an in-test multi-frame encoder
(DHP + non-differential first stage + EXP reference expansion + SOF5
differential stages) round-tripped against an independent numpy model
of the documented stage rules — per-stage integer rounding/clamping,
J.1.1.2 interpolative expansion, differential DC without prediction
and without level shift."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from test_jpeg import (
    QTABLE,
    _amplitude,
    _BitWriter,
    _category,
    _FixedTable,
    _idct_block,
    _rand_blocks,
    encode_baseline_jpeg,
)

from openset_spark.pipeline.jpeg import decode_jpeg_bytes


def _seg(out: bytearray, marker: int, payload: bytes) -> None:
    out.extend(b"\xff" + bytes([marker]))
    out.extend(struct.pack(">H", len(payload) + 2))
    out.extend(payload)


def _sof_payload(w, h, comp_blocks, precision=8) -> bytes:
    p = bytearray([precision]) + struct.pack(">HH", h, w)
    p += bytes([len(comp_blocks)])
    for i, c in enumerate(comp_blocks):
        p += bytes([i + 1, (c["h"] << 4) | c["v"], c["tq"]])
    return bytes(p)


def _emit_frame(
    out: bytearray,
    w: int,
    h: int,
    comp_blocks: list[dict],
    qtables,
    differential: bool,
    emit_dqt: bool,
    split_scans: bool = False,
) -> None:
    """One hierarchical stage: optional DQTs, SOF0/SOF5, fresh DHTs,
    and either one interleaved scan or one scan per component."""
    hmax = max(c["h"] for c in comp_blocks)
    vmax = max(c["v"] for c in comp_blocks)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def traverse(members, on_dc, on_ac, on_bits):
        preds = {id(c): 0 for c in members}
        for my in range(mcuy):
            for mx in range(mcux):
                for c in members:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            zz = c["blocks"][
                                (mx * c["h"] + hh, my * c["v"] + v)
                            ]
                            if differential:
                                diff = zz[0]
                            else:
                                diff = zz[0] - preds[id(c)]
                                preds[id(c)] = zz[0]
                            t = _category(diff)
                            on_dc(t)
                            on_bits(_amplitude(diff, t), t)
                            run = 0
                            for k in range(1, 64):
                                if zz[k] == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    on_ac(0xF0)
                                    run -= 16
                                s = _category(zz[k])
                                on_ac((run << 4) | s)
                                on_bits(_amplitude(zz[k], s), s)
                                run = 0
                            if run:
                                on_ac(0x00)

    dc_syms, ac_syms = set(), {0x00}
    traverse(comp_blocks, dc_syms.add, ac_syms.add, lambda v, n: None)
    dc_tab = _FixedTable(sorted(dc_syms))
    ac_tab = _FixedTable(sorted(ac_syms))

    if emit_dqt:
        for tq, q in enumerate(qtables):
            _seg(out, 0xDB, bytes([tq]) + bytes(q))
    _seg(out, 0xC5 if differential else 0xC0, _sof_payload(w, h, comp_blocks))
    _seg(out, 0xC4, dc_tab.dht_payload(0, 0))
    _seg(out, 0xC4, ac_tab.dht_payload(1, 0))

    groups = (
        [[c] for c in comp_blocks] if split_scans else [comp_blocks]
    )
    for grp in groups:
        sos = bytearray([len(grp)])
        for c in grp:
            sos += bytes([comp_blocks.index(c) + 1, 0x00])
        sos += bytes([0, 63, 0])
        _seg(out, 0xDA, bytes(sos))
        bw = _BitWriter()
        traverse(
            grp,
            lambda t: dc_tab.emit(bw, t),
            lambda s: ac_tab.emit(bw, s),
            lambda v, n: bw.put(v, n),
        )
        bw.flush()
        out.extend(bw.out)


def encode_hierarchical_jpeg(
    w: int,
    h: int,
    stages: list[dict],
    qtables,
    split_scans: bool = False,
) -> bytes:
    """stages: [{w, h, comps, differential, exp_before: (eh, ev)|None}]
    — comps as in encode_baseline_jpeg ({h, v, tq, blocks})."""
    out = bytearray(b"\xff\xd8")
    _seg(out, 0xDE, _sof_payload(w, h, stages[0]["comps"]))
    first = True
    for st in stages:
        if st.get("exp_before"):
            eh, ev = st["exp_before"]
            _seg(out, 0xDF, bytes([(eh << 4) | ev]))
        _emit_frame(
            out,
            st["w"],
            st["h"],
            st["comps"],
            qtables,
            st["differential"],
            emit_dqt=first,
            split_scans=split_scans,
        )
        first = False
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------ independent reference model
def _model_expand(p: np.ndarray, eh: int, ev: int) -> np.ndarray:
    if eh:
        n = p.shape[1]
        out = np.zeros((p.shape[0], 2 * n))
        out[:, 0::2] = p
        if n > 1:
            out[:, 1:-1:2] = (p[:, :-1] + p[:, 1:] + 1) // 2
        out[:, -1] = p[:, -1]
        p = out
    if ev:
        n = p.shape[0]
        out = np.zeros((2 * n, p.shape[1]))
        out[0::2, :] = p
        if n > 1:
            out[1:-1:2, :] = (p[:-1, :] + p[1:, :] + 1) // 2
        out[-1, :] = p[-1, :]
        p = out
    return p


def _model_stage_plane(c, w, h, hmax, vmax, q, differential):
    """One component's spatial stage signal via the independent
    cos-sum IDCT, cropped to the stage's component dims."""
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    plane = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
    for (bx, by), zz in c["blocks"].items():
        blk = _idct_block(zz, q)  # cos-sum + 128 level shift
        if differential:
            blk = blk - 128.0  # differential stages carry no shift
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    cw = (w * c["h"] + hmax - 1) // hmax
    ch = (h * c["v"] + vmax - 1) // vmax
    return np.round(plane[:ch, :cw])


def _model_hier(w, h, stages, qtables):
    """Replay the documented hierarchical rules: per-stage rounded
    planes, EXP expansion, differential addition, [0,255] clamp."""
    refs: dict[int, np.ndarray] = {}
    comps = None
    for st in stages:
        if st.get("exp_before"):
            eh, ev = st["exp_before"]
            for k in refs:
                refs[k] = _model_expand(refs[k], eh, ev)
        hmax = max(c["h"] for c in st["comps"])
        vmax = max(c["v"] for c in st["comps"])
        for i, c in enumerate(st["comps"]):
            sig = _model_stage_plane(
                c, st["w"], st["h"], hmax, vmax, qtables[c["tq"]],
                st["differential"],
            )
            if st["differential"]:
                ref = refs[i + 1]
                sig = ref[: sig.shape[0], : sig.shape[1]] + sig
            refs[i + 1] = np.clip(sig, 0, 255)
        comps = st["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for i, c in enumerate(comps):
        p = refs[i + 1]
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sx > 1 or sy > 1:
            p = np.repeat(np.repeat(p, sy, axis=0), sx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(
        np.uint8
    )


def _stage_comps(rng, w, h, sampling, dense=False):
    """Random quantized blocks sized for an interleaved stage."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for (hh, vv) in sampling:
        comps.append(
            {
                "h": hh,
                "v": vv,
                "tq": 0,
                "blocks": _rand_blocks(rng, mcux * hh, mcuy * vv, dense),
            }
        )
    return comps


def _roundtrip(w, h, stages, qtables, split_scans=False):
    data = encode_hierarchical_jpeg(w, h, stages, qtables, split_scans)
    gw, gh, ch, px = decode_jpeg_bytes(data)
    assert (gw, gh) == (w, h)
    exp = _model_hier(w, h, stages, qtables)
    got = np.frombuffer(px, dtype=np.uint8).reshape(exp.shape)
    np.testing.assert_array_equal(got, exp)


def test_hier_gray_two_stage_pyramid():
    rng = np.random.default_rng(7)
    w, h = 21, 13
    w2, h2 = (w + 1) // 2, (h + 1) // 2
    stages = [
        {
            "w": w2, "h": h2, "differential": False,
            "comps": _stage_comps(rng, w2, h2, [(1, 1)]),
        },
        {
            "w": w, "h": h, "differential": True,
            "exp_before": (1, 1),
            "comps": _stage_comps(rng, w, h, [(1, 1)]),
        },
    ]
    _roundtrip(w, h, stages, [QTABLE])


def test_hier_three_stage_pyramid():
    rng = np.random.default_rng(11)
    w, h = 20, 12
    w4, h4 = (w + 3) // 4, (h + 3) // 4
    w2, h2 = (w + 1) // 2, (h + 1) // 2
    stages = [
        {"w": w4, "h": h4, "differential": False,
         "comps": _stage_comps(rng, w4, h4, [(1, 1)])},
        {"w": w2, "h": h2, "differential": True, "exp_before": (1, 1),
         "comps": _stage_comps(rng, w2, h2, [(1, 1)])},
        {"w": w, "h": h, "differential": True, "exp_before": (1, 1),
         "comps": _stage_comps(rng, w, h, [(1, 1)])},
    ]
    _roundtrip(w, h, stages, [QTABLE])


def test_hier_color_420_final_stage():
    rng = np.random.default_rng(23)
    w, h = 19, 11
    w2, h2 = (w + 1) // 2, (h + 1) // 2
    sampling = [(2, 2), (1, 1), (1, 1)]  # 4:2:0 in BOTH stages
    stages = [
        {"w": w2, "h": h2, "differential": False,
         "comps": _stage_comps(rng, w2, h2, sampling)},
        {"w": w, "h": h, "differential": True, "exp_before": (1, 1),
         "comps": _stage_comps(rng, w, h, sampling)},
    ]
    _roundtrip(w, h, stages, [QTABLE])


def test_hier_split_scans_per_component():
    rng = np.random.default_rng(31)
    w, h = 17, 9
    w2, h2 = (w + 1) // 2, (h + 1) // 2
    sampling = [(1, 1), (1, 1), (1, 1)]
    stages = [
        {"w": w2, "h": h2, "differential": False,
         "comps": _stage_comps(rng, w2, h2, sampling)},
        {"w": w, "h": h, "differential": True, "exp_before": (1, 1),
         "comps": _stage_comps(rng, w, h, sampling)},
    ]
    _roundtrip(w, h, stages, [QTABLE], split_scans=True)


def test_hier_horizontal_only_expansion():
    rng = np.random.default_rng(43)
    w, h = 22, 10
    w2 = (w + 1) // 2
    stages = [
        {"w": w2, "h": h, "differential": False,
         "comps": _stage_comps(rng, w2, h, [(1, 1)])},
        {"w": w, "h": h, "differential": True, "exp_before": (1, 0),
         "comps": _stage_comps(rng, w, h, [(1, 1)])},
    ]
    _roundtrip(w, h, stages, [QTABLE])


def test_hier_real_pyramid_refines_toward_original():
    """A REAL two-stage pyramid: stage 1 codes the 2x downsample,
    the differential stage codes the residual vs the expanded
    reference — with unit quantizers the final image must land
    within rounding distance of the original."""
    rng = np.random.default_rng(5)
    w = h = 16
    # smooth-ish original so the coarse stage is a fair preview
    base = rng.integers(40, 216, size=(h // 4, w // 4)).astype(np.float64)
    orig = np.round(
        np.kron(base, np.ones((4, 4)))
        + rng.integers(-8, 9, size=(h, w))
    ).clip(0, 255)

    A = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)

    def fdct_blocks(img, shift):
        hh, ww = img.shape
        blocks = {}
        for by in range(hh // 8):
            for bx in range(ww // 8):
                blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - shift
                coefs = A @ blk @ A.T
                zz = np.zeros(64, dtype=np.int64)
                from test_jpeg import ZIGZAG

                for k in range(64):
                    zz[k] = int(round(coefs[ZIGZAG[k] // 8, ZIGZAG[k] % 8]))
                blocks[(bx, by)] = zz.tolist()
        return blocks

    down = np.round(
        (orig[0::2, 0::2] + orig[0::2, 1::2]
         + orig[1::2, 0::2] + orig[1::2, 1::2]) / 4.0
    )
    unit_q = [1] * 64
    stage1 = {
        "w": w // 2, "h": h // 2, "differential": False,
        "comps": [{"h": 1, "v": 1, "tq": 0,
                   "blocks": fdct_blocks(down, 128.0)}],
    }
    # track the decoder's reference exactly (via the model) to build
    # the residual the encoder must transmit
    ref = np.clip(
        _model_stage_plane(
            stage1["comps"][0], w // 2, h // 2, 1, 1, unit_q, False
        ),
        0, 255,
    )
    ref = _model_expand(ref, 1, 1)
    resid = orig - ref
    stage2 = {
        "w": w, "h": h, "differential": True, "exp_before": (1, 1),
        "comps": [{"h": 1, "v": 1, "tq": 0,
                   "blocks": fdct_blocks(resid, 0.0)}],
    }
    data = encode_hierarchical_jpeg(w, h, [stage1, stage2], [unit_q])
    gw, gh, ch, px = decode_jpeg_bytes(data)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(float)
    assert np.max(np.abs(got - orig)) <= 2.0
    # and the pyramid genuinely refined: coarse preview alone is worse
    coarse_err = np.max(np.abs(ref[:h, :w] - orig))
    assert coarse_err > 2.0


def test_exp_without_reference_rejected():
    out = bytearray(b"\xff\xd8")
    _seg(out, 0xDE, _sof_payload(8, 8, [{"h": 1, "v": 1, "tq": 0}]))
    _seg(out, 0xDF, bytes([0x11]))
    out.extend(b"\xff\xd9")
    with pytest.raises(ValueError, match="EXP without reference"):
        decode_jpeg_bytes(bytes(out))


def test_differential_frame_without_dhp_rejected():
    rng = np.random.default_rng(3)
    comps = [{"h": 1, "v": 1, "tq": 0, "blocks": _rand_blocks(rng, 1, 1)}]
    data = bytearray(encode_baseline_jpeg(8, 8, comps, [QTABLE]))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC5
    with pytest.raises(ValueError, match="without DHP"):
        decode_jpeg_bytes(bytes(data))


def test_differential_progressive_rejected():
    out = bytearray(b"\xff\xd8")
    _seg(out, 0xDE, _sof_payload(8, 8, [{"h": 1, "v": 1, "tq": 0}]))
    _seg(out, 0xC6, _sof_payload(8, 8, [{"h": 1, "v": 1, "tq": 0}]))
    out.extend(b"\xff\xd9")
    with pytest.raises(NotImplementedError):
        decode_jpeg_bytes(bytes(out))
