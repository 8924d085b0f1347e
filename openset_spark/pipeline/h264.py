"""Pure-Python H.264/AVC BASELINE I-frame decoder (ITU-T H.264 /
ISO 14496-10) — the keyframe slice of the world's most common video
codec, built from the public specification.

Scope: IDR pictures of Constrained-Baseline-style streams — Annex B
byte streams, SPS/PPS, CAVLC entropy coding (coeff_token /
total_zeros / run_before VLC tables, level prefix/suffix with
adaptive suffix length), I_4x4 and I_16x16 macroblocks with all nine
4x4 / four 16x16 / four chroma intra prediction modes plus I_PCM,
the 4x4 integer inverse transform with the Intra16x16 luma Hadamard
DC and the 2x2 chroma DC, per-macroblock QP deltas with the chroma
QP mapping, frame cropping, multiple slices per picture, and the
full in-loop deblocking filter (8.7: strong/normal modes, alpha/
beta/tC0 tables, slice alpha/beta offsets, idc 0/1/2 incl. the
don't-cross-slice-boundaries mode; bS derivation collapses to 4 on
MB edges / 3 on internal edges for intra-only pictures). Inter
frames (P/B) and CABAC are out of scope: this kernel serves corpus
keyframe EXTRACTION, where streams are decoded at their IDR access
points (the frame-sampling step of a video ingest).

Verification mirrors ``pipeline/vp8.py``: exact-pixel YUV round
trips against an in-test H.264 ENCODER (tests/test_h264.py) across
mode mixes, QP deltas, CBP patterns and multi-slice layouts. As
there, entropy-code TABLES are shared between the two directions —
they affect only the bitstream, never reconstruction values — while
prefix-freeness/Kraft completeness of every VLC table and an
independent numpy model of prediction + transforms are asserted
separately.

Entry points: ``decode_h264_frame(data) -> (w, h, y, u, v)`` (first
IDR of an Annex-B stream, YUV 4:2:0 planes) and ``h264_to_rgb`` with
BT.601 limited-range conversion.
"""

from __future__ import annotations


# ------------------------------------------------------------------
# Bitstream: Annex-B framing, RBSP unescaping, Exp-Golomb reader
# ------------------------------------------------------------------
def split_nals(data: bytes) -> list[bytes]:
    """Annex-B start-code split (00 00 01 / 00 00 00 01)."""
    nals = []
    i = 0
    n = len(data)
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            j = i + 3
            k = j
            while k + 3 <= n and not (
                data[k] == 0 and data[k + 1] == 0 and data[k + 2] == 1
            ):
                k += 1
            end = k if k + 3 <= n else n
            # trim the 0x00 that belongs to a 4-byte start code
            while end > j and data[end - 1] == 0 and end + 3 <= n:
                end -= 1
            nals.append(data[j:end])
            i = end
        else:
            i += 1
    return nals


def rbsp_unescape(nal: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    i = 0
    n = len(nal)
    while i < n:
        if i + 2 < n and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("invalid exp-golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 == 1 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def more_rbsp_data(self) -> bool:
        # data remains before the rbsp_stop_one_bit
        total = len(self.data) * 8
        if self.pos >= total:
            return False
        # find last set bit (the stop bit)
        last = total - 1
        while last >= 0:
            byte = self.data[last >> 3]
            if (byte >> (7 - (last & 7))) & 1:
                break
            last -= 1
        return self.pos < last


# ------------------------------------------------------------------
# CAVLC tables (H.264 tables 9-5, 9-7, 9-8, 9-9, 9-10). Shared with
# the in-test encoder; prefix-freeness and (where the spec's code is
# complete) Kraft equality are asserted in tests/test_h264.py.
# ------------------------------------------------------------------
# coeff_token: lentab/codtab[context][trailing_ones][total_coeff]
_CT_LEN = [
    [  # 0 <= nC < 2
        [1, 6, 8, 9, 10, 11, 13, 13, 13, 14, 14, 15, 15, 16, 16, 16, 16],
        [0, 2, 6, 8, 9, 10, 11, 13, 13, 14, 14, 15, 15, 15, 16, 16, 16],
        [0, 0, 3, 7, 8, 9, 10, 11, 13, 13, 14, 14, 15, 15, 16, 16, 16],
        [0, 0, 0, 5, 6, 7, 8, 9, 10, 11, 13, 14, 14, 15, 15, 16, 16],
    ],
    [  # 2 <= nC < 4
        [2, 6, 6, 7, 8, 8, 9, 11, 11, 12, 12, 12, 13, 13, 13, 14, 14],
        [0, 2, 5, 6, 6, 7, 8, 9, 11, 11, 12, 12, 13, 13, 14, 14, 14],
        [0, 0, 3, 6, 6, 7, 8, 9, 11, 11, 12, 12, 13, 13, 13, 14, 14],
        [0, 0, 0, 4, 4, 5, 6, 6, 7, 9, 11, 11, 12, 13, 13, 13, 14],
    ],
    [  # 4 <= nC < 8
        [4, 6, 6, 6, 7, 7, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 10],
        [0, 4, 5, 5, 5, 5, 6, 6, 7, 8, 8, 9, 9, 9, 10, 10, 10],
        [0, 0, 4, 5, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 10],
        [0, 0, 0, 4, 4, 4, 4, 4, 5, 6, 7, 8, 8, 9, 10, 10, 10],
    ],
]
_CT_CODE = [
    [
        [1, 5, 7, 7, 7, 7, 15, 11, 8, 15, 11, 15, 11, 15, 11, 7, 4],
        [0, 1, 4, 6, 6, 6, 6, 14, 10, 14, 10, 14, 10, 1, 14, 10, 6],
        [0, 0, 1, 5, 5, 5, 5, 5, 13, 9, 13, 9, 13, 9, 13, 9, 5],
        [0, 0, 0, 3, 3, 4, 4, 4, 4, 4, 12, 8, 12, 12, 8, 12, 8],
    ],
    [
        [3, 11, 7, 7, 7, 4, 7, 15, 11, 15, 11, 8, 15, 11, 7, 9, 7],
        [0, 2, 7, 10, 6, 6, 6, 6, 14, 10, 14, 10, 14, 10, 11, 8, 6],
        [0, 0, 3, 9, 5, 5, 5, 5, 13, 9, 13, 9, 13, 9, 6, 10, 5],
        [0, 0, 0, 5, 4, 6, 8, 4, 4, 4, 12, 8, 12, 12, 8, 1, 4],
    ],
    [
        [15, 15, 11, 8, 15, 11, 9, 8, 15, 11, 15, 11, 8, 13, 9, 5, 1],
        [0, 14, 15, 12, 10, 8, 14, 10, 14, 14, 10, 14, 10, 7, 12, 8, 4],
        [0, 0, 13, 14, 11, 9, 13, 9, 13, 10, 13, 9, 13, 9, 11, 7, 3],
        [0, 0, 0, 12, 11, 10, 9, 8, 13, 12, 12, 12, 8, 12, 10, 6, 2],
    ],
]
# chroma DC (4:2:0): [trailing_ones][total_coeff 0..4]
_CT_LEN_CDC = [
    [2, 6, 6, 6, 6],
    [0, 1, 6, 7, 8],
    [0, 0, 3, 7, 8],
    [0, 0, 0, 6, 7],
]
_CT_CODE_CDC = [
    [1, 7, 4, 3, 2],
    [0, 1, 6, 3, 3],
    [0, 0, 1, 2, 2],
    [0, 0, 0, 5, 0],
]

# total_zeros, 4x4 blocks: [total_coeff-1][total_zeros]
_TZ_LEN = [
    [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9],
    [3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6],
    [4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6],
    [5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5],
    [4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5],
    [6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6],
    [6, 5, 3, 3, 3, 2, 3, 4, 3, 6],
    [6, 4, 5, 3, 2, 2, 3, 3, 6],
    [6, 6, 4, 2, 2, 3, 2, 5],
    [5, 5, 3, 2, 2, 2, 4],
    [4, 4, 3, 3, 1, 3],
    [4, 4, 2, 1, 3],
    [3, 3, 1, 2],
    [2, 2, 1],
    [1, 1],
]
_TZ_CODE = [
    [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1],
    [7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0],
    [5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0],
    [3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0],
    [5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 5, 4, 3, 3, 2, 1, 1, 0],
    [1, 1, 1, 3, 3, 2, 2, 1, 0],
    [1, 0, 1, 3, 2, 1, 1, 1],
    [1, 0, 1, 3, 2, 1, 1],
    [0, 1, 1, 2, 1, 3],
    [0, 1, 1, 1, 1],
    [0, 1, 1, 1],
    [0, 1, 1],
    [0, 1],
]
# total_zeros, chroma DC 2x2: [total_coeff-1][total_zeros]
_TZ_LEN_CDC = [[1, 2, 3, 3], [1, 2, 2], [1, 1]]
_TZ_CODE_CDC = [[1, 1, 1, 0], [1, 1, 0], [1, 0]]

# run_before: [min(zeros_left,7)-1][run]
_RB_LEN = [
    [1, 1],
    [1, 2, 2],
    [2, 2, 2, 2],
    [2, 2, 2, 3, 3],
    [2, 2, 3, 3, 3, 3],
    [2, 3, 3, 3, 3, 3, 3],
    [3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11],
]
_RB_CODE = [
    [1, 0],
    [1, 1, 0],
    [3, 2, 1, 0],
    [3, 2, 1, 1, 0],
    [3, 2, 3, 2, 1, 0],
    [3, 0, 1, 3, 2, 5, 4],
    [7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1],
]


def _vlc_dict(lens, codes, payload) -> dict:
    """(length, code) -> payload lookup for the bit-walk decoder."""
    d = {}
    for ln, cd, pl in zip(lens, codes, payload):
        if ln == 0:
            continue
        key = (ln, cd)
        if key in d:
            raise ValueError(f"duplicate VLC code {key}")
        d[key] = pl
    return d


def _coeff_token_dict(ctx: int) -> dict:
    lens, codes, pays = [], [], []
    tabs = (
        (_CT_LEN_CDC, _CT_CODE_CDC) if ctx == 3 else (_CT_LEN[ctx], _CT_CODE[ctx])
    )
    for t1 in range(4):
        for tc in range(len(tabs[0][t1])):
            if tabs[0][t1][tc] == 0 and not (t1 == 0 and tc == 0):
                continue
            if t1 > tc:
                continue
            lens.append(tabs[0][t1][tc])
            codes.append(tabs[1][t1][tc])
            pays.append((t1, tc))
    return _vlc_dict(lens, codes, pays)


_COEFF_TOKEN = [_coeff_token_dict(i) for i in range(4)]  # [3] = chroma DC
_TOTAL_ZEROS = [
    _vlc_dict(_TZ_LEN[i], _TZ_CODE[i], range(len(_TZ_LEN[i])))
    for i in range(15)
]
_TOTAL_ZEROS_CDC = [
    _vlc_dict(_TZ_LEN_CDC[i], _TZ_CODE_CDC[i], range(len(_TZ_LEN_CDC[i])))
    for i in range(3)
]
_RUN_BEFORE = [
    _vlc_dict(_RB_LEN[i], _RB_CODE[i], range(len(_RB_LEN[i])))
    for i in range(7)
]


def _read_vlc(br: BitReader, table: dict):
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.u(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid H.264 VLC code")


# mapping of coded_block_pattern ue(v) -> CBP for Intra_4x4 (Table 9-4)
_CBP_INTRA = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
# same mapping for ChromaArrayType 0 (monochrome): luma-only CBP
_CBP_INTRA_MONO = [0, 1, 2, 4, 8, 3, 5, 10, 12, 15, 7, 11, 13, 14, 6, 9]

# zig-zag scan for 4x4 blocks (Table 8-13 frame scan)
_ZZ4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# dequant weights V (Table derived from 8.5.9 normAdjust4x4)
_V = [
    [10, 16, 13],
    [11, 18, 14],
    [13, 20, 16],
    [14, 23, 18],
    [16, 25, 20],
    [18, 29, 23],
]


def _level_scale(m: int, i: int, j: int) -> int:
    if (i % 2, j % 2) == (0, 0):
        return _V[m][0]
    if (i % 2, j % 2) == (1, 1):
        return _V[m][1]
    return _V[m][2]


# chroma QP mapping (Table 8-15)
_QPC = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
        38, 38, 38, 39, 39, 39, 39]


def _chroma_qp(qpy: int, offset: int, bd_off: int = 0) -> int:
    """QP'C (8.5.8): table-mapped chroma QP. With a high bit depth,
    qPI clips at -QpBdOffsetC below and the offset is added back
    AFTER the table — that sum is what LevelScale consumes.
    ``bd_off=0`` (the deblock caller) yields the plain QPC used for
    threshold indexing."""
    qpi = max(-bd_off, min(51, qpy + offset))
    qpc = qpi if qpi < 30 else _QPC[qpi - 30]
    return qpc + bd_off


# intra 4x4 blocks: z-scan index -> (x, y) in 4x4 units within the MB
_BLK_XY = [
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3),
]


# ------------------------------------------------------------------
# Parameter sets and slice headers (the baseline-I subset)
# ------------------------------------------------------------------
# ------------------------------------------------------------------
# scaling matrices (7.3.2.1.1 / Table 7-2 fallback rules)
# ------------------------------------------------------------------
# default lists, in zig-zag scan order (Tables 7-3 / 7-4)
DEFAULT_4X4_INTRA = [6, 13, 13, 20, 20, 20, 28, 28, 28, 28, 32, 32,
                     32, 37, 37, 42]
DEFAULT_4X4_INTER = [10, 14, 14, 20, 20, 20, 24, 24, 24, 24, 27, 27,
                     27, 30, 30, 34]
DEFAULT_8X8_INTRA = [
    6, 10, 10, 13, 11, 13, 16, 16, 16, 16, 18, 18, 18, 18, 18, 23,
    23, 23, 23, 23, 23, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27,
    27, 27, 27, 27, 29, 29, 29, 29, 29, 29, 29, 29, 31, 31, 31, 31,
    31, 31, 31, 33, 33, 33, 33, 33, 33, 36, 36, 36, 36, 38, 40, 42,
]
DEFAULT_8X8_INTER = [
    9, 13, 13, 15, 13, 15, 17, 17, 17, 17, 19, 19, 19, 19, 19, 21,
    21, 21, 21, 21, 21, 22, 22, 22, 22, 22, 22, 22, 24, 24, 24, 24,
    24, 24, 24, 24, 25, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27,
    27, 27, 27, 28, 28, 28, 28, 28, 28, 30, 30, 30, 30, 32, 33, 35,
]
_FALLBACK_A = {0: DEFAULT_4X4_INTRA, 3: DEFAULT_4X4_INTER,
               6: DEFAULT_8X8_INTRA, 7: DEFAULT_8X8_INTER}


def _parse_scaling_list(br: "BitReader", size: int):
    """7.3.2.1.1: returns (list in scan order, use_default_flag)."""
    lst = [0] * size
    last, nxt = 8, 8
    use_default = False
    for j in range(size):
        if nxt != 0:
            delta = br.se()
            nxt = (last + delta + 256) % 256
            if j == 0 and nxt == 0:
                use_default = True
        lst[j] = last if nxt == 0 else nxt
        last = lst[j]
    return lst, use_default


def _parse_scaling_matrices(br, n_lists, fallback):
    """Shared SPS/PPS scaling-matrix parse. ``fallback[i]`` supplies
    the list used when scaling_list_present_flag[i] is 0 (rule A for
    SPS, rule B for PPS); absent-and-no-previous falls back through
    the chain the caller encodes in ``fallback``. Returns the list of
    resolved scan-order lists."""
    out = []
    for i in range(n_lists):
        size = 16 if i < 6 else 64
        if br.u(1):  # scaling_list_present_flag
            lst, use_default = _parse_scaling_list(br, size)
            if use_default:
                lst = list(_FALLBACK_A[i] if i in _FALLBACK_A else (
                    DEFAULT_4X4_INTRA if i < 3
                    else DEFAULT_4X4_INTER if i < 6
                    else DEFAULT_8X8_INTRA if i == 6
                    else DEFAULT_8X8_INTER
                ))
            out.append(lst)
        else:
            if i in fallback and fallback[i] is not None:
                out.append(list(fallback[i]))
            else:
                out.append(list(out[i - 1]) if i not in _FALLBACK_A
                           else list(_FALLBACK_A[i]))
    return out


def parse_sps(rbsp: bytes) -> dict:
    br = BitReader(rbsp)
    profile_idc = br.u(8)
    br.u(8)  # constraint flags + reserved
    level_idc = br.u(8)
    sps_id = br.ue()
    chroma_format_idc, bit_depth = 1, 8
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma_format_idc = br.ue()
        if chroma_format_idc not in (0, 1):
            raise NotImplementedError("4:2:2/4:4:4 H.264 not supported")
        bit_depth = br.ue() + 8
        bd_chroma = br.ue() + 8
        if bit_depth > 14:
            raise ValueError(f"invalid H.264 bit depth {bit_depth}")
        if chroma_format_idc != 0 and bd_chroma != bit_depth:
            raise NotImplementedError(
                "distinct luma/chroma bit depths not supported"
            )
        br.u(1)  # qpprime_y_zero_transform_bypass
        if br.u(1):  # seq_scaling_matrix_present
            # fallback rule A: absent lists 0/3/6/7 take the default,
            # others copy the previous list
            scaling = _parse_scaling_matrices(br, 8, _FALLBACK_A)
            seq_scaling = (scaling[:6], scaling[6:])
        else:
            seq_scaling = None
    else:
        seq_scaling = None
    log2_max_frame_num = br.ue() + 4
    pic_order_cnt_type = br.ue()
    log2_max_poc = 4
    if pic_order_cnt_type == 0:
        log2_max_poc = br.ue() + 4
    elif pic_order_cnt_type == 1:
        br.u(1)
        br.se()
        br.se()
        for _ in range(br.ue()):
            br.se()
    max_num_ref_frames = br.ue()
    br.u(1)  # gaps_in_frame_num_value_allowed
    pic_width_in_mbs = br.ue() + 1
    pic_height_in_map_units = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlaced H.264 not supported")
    br.u(1)  # direct_8x8_inference
    crop = (0, 0, 0, 0)
    if br.u(1):  # frame_cropping
        crop = (br.ue(), br.ue(), br.ue(), br.ue())
    return {
        "id": sps_id,
        "profile": profile_idc,
        "level": level_idc,
        # 0 = monochrome (4:0:0), 1 = 4:2:0
        "chroma_format": chroma_format_idc,
        "bit_depth": bit_depth,  # 8..14 (High 10 / High-profile depths)
        "seq_scaling": seq_scaling,  # ([6 x 4x4 lists], [2 x 8x8]) | None
        "log2_max_frame_num": log2_max_frame_num,
        "pic_order_cnt_type": pic_order_cnt_type,
        "log2_max_poc": log2_max_poc,
        "mb_w": pic_width_in_mbs,
        "mb_h": pic_height_in_map_units,
        "crop": crop,  # left, right, top, bottom (in 2-sample units)
    }


def parse_pps(rbsp: bytes, sps: dict | None = None) -> dict:
    """``sps`` (the referenced SPS dict) is needed only to resolve
    fallback rule B when the PPS carries its own scaling matrices."""
    br = BitReader(rbsp)
    pps_id = br.ue()
    sps_id = br.ue()
    entropy_coding_mode = br.u(1)  # 0 = CAVLC, 1 = CABAC
    br.u(1)  # bottom_field_pic_order_in_frame_present
    num_slice_groups = br.ue() + 1
    if num_slice_groups != 1:
        raise NotImplementedError("slice groups (FMO) not supported")
    br.ue()  # num_ref_idx_l0_default_active_minus1
    br.ue()  # num_ref_idx_l1_default_active_minus1
    br.u(1)  # weighted_pred_flag
    br.u(2)  # weighted_bipred_idc
    pic_init_qp = br.se() + 26
    br.se()  # pic_init_qs
    chroma_qp_index_offset = br.se()
    deblocking_filter_control_present = br.u(1)
    constrained_intra_pred = br.u(1)
    redundant_pic_cnt_present = br.u(1)
    # High-profile PPS extension (present iff more RBSP data remains)
    transform_8x8_mode = 0
    second_chroma_qp_offset = chroma_qp_index_offset
    seq_scaling = (sps or {}).get("seq_scaling")
    pic_scaling = None
    if br.more_rbsp_data():
        transform_8x8_mode = br.u(1)
        if br.u(1):  # pic_scaling_matrix_present
            # fallback rule B: absent lists 0/3/6/7 inherit the SPS
            # list when the SPS carried matrices, else the default;
            # other absent lists copy the previous list
            if seq_scaling is not None:
                fb = {0: seq_scaling[0][0], 3: seq_scaling[0][3],
                      6: seq_scaling[1][0], 7: seq_scaling[1][1]}
            else:
                fb = _FALLBACK_A
            n_lists = 6 + 2 * transform_8x8_mode
            lists = _parse_scaling_matrices(br, n_lists, fb)
            pic_scaling = (
                lists[:6],
                lists[6:] if n_lists > 6 else (
                    list(seq_scaling[1]) if seq_scaling is not None
                    else None
                ),
            )
        second_chroma_qp_offset = br.se()
    # effective weight matrices for this PPS (None = flat 16 fast
    # path): PPS lists win, else SPS lists, else flat
    if pic_scaling is not None:
        w4, w8 = pic_scaling
    elif seq_scaling is not None:
        w4, w8 = seq_scaling
    else:
        w4, w8 = None, None
    return {
        "id": pps_id,
        "sps_id": sps_id,
        "entropy": entropy_coding_mode,
        "pic_init_qp": pic_init_qp,
        "chroma_qp_index_offset": chroma_qp_index_offset,
        "second_chroma_qp_offset": second_chroma_qp_offset,
        "transform_8x8_mode": transform_8x8_mode,
        "w4": w4,  # 6 scan-order 16-entry weight lists | None (flat)
        "w8": w8,  # 2 scan-order 64-entry weight lists | None
        "deblocking_control": deblocking_filter_control_present,
        "constrained_intra_pred": constrained_intra_pred,
        "redundant_pic_cnt_present": redundant_pic_cnt_present,
    }


# ------------------------------------------------------------------
# CAVLC residual block decode (9.2)
# ------------------------------------------------------------------
def decode_residual_block(br: BitReader, n_c: int, max_coeff: int) -> list[int]:
    """One residual block's coefficient levels in scan order
    (length ``max_coeff``). ``n_c`` selects the coeff_token context
    (-1 = chroma DC)."""
    if n_c == -1:
        tok = _read_vlc(br, _COEFF_TOKEN[3])
    elif n_c < 2:
        tok = _read_vlc(br, _COEFF_TOKEN[0])
    elif n_c < 4:
        tok = _read_vlc(br, _COEFF_TOKEN[1])
    elif n_c < 8:
        tok = _read_vlc(br, _COEFF_TOKEN[2])
    else:  # FLC
        v = br.u(6)
        tok = (0, 0) if v == 3 else (v & 3, (v >> 2) + 1)
    t1s, total_coeff = tok
    coeffs = [0] * max_coeff
    if total_coeff == 0:
        return coeffs, 0

    levels = []
    suffix_length = 1 if (total_coeff > 10 and t1s < 3) else 0
    for i in range(total_coeff):
        if i < t1s:
            levels.append(1 - 2 * br.u(1))
            continue
        level_prefix = 0
        while br.u(1) == 0:
            level_prefix += 1
            if level_prefix > 47:
                raise ValueError("invalid level_prefix")
        level_code = min(15, level_prefix) << suffix_length
        if suffix_length > 0 or level_prefix >= 14:
            if level_prefix == 14 and suffix_length == 0:
                size = 4
            elif level_prefix >= 15:
                size = level_prefix - 3
            else:
                size = suffix_length
            if size:
                level_code += br.u(size)
        if level_prefix >= 15 and suffix_length == 0:
            level_code += 15
        if level_prefix >= 16:
            level_code += (1 << (level_prefix - 3)) - 4096
        if i == t1s and t1s < 3:
            level_code += 2
        if level_code % 2 == 0:
            lvl = (level_code + 2) >> 1
        else:
            lvl = -((level_code + 1) >> 1)
        levels.append(lvl)
        if suffix_length == 0:
            suffix_length = 1
        if abs(lvl) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1

    if total_coeff < max_coeff:
        if n_c == -1:
            total_zeros = _read_vlc(br, _TOTAL_ZEROS_CDC[total_coeff - 1])
        else:
            total_zeros = _read_vlc(br, _TOTAL_ZEROS[total_coeff - 1])
    else:
        total_zeros = 0

    zeros_left = total_zeros
    coeff_num = zeros_left + total_coeff - 1
    for i in range(total_coeff):
        coeffs[coeff_num] = levels[i]
        if i < total_coeff - 1:
            if zeros_left > 0:
                run = _read_vlc(br, _RUN_BEFORE[min(zeros_left, 7) - 1])
            else:
                run = 0
            zeros_left -= run
            coeff_num -= run + 1
    return coeffs, total_coeff


# ------------------------------------------------------------------
# Transforms (8.5)
# ------------------------------------------------------------------
def inverse_4x4(d: list[list[int]]) -> list[list[int]]:
    """Core inverse integer transform incl. the final (x+32)>>6."""
    e = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a = d[i][0] + d[i][2]
        b = d[i][0] - d[i][2]
        c = (d[i][1] >> 1) - d[i][3]
        t = d[i][1] + (d[i][3] >> 1)
        e[i][0] = a + t
        e[i][1] = b + c
        e[i][2] = b - c
        e[i][3] = a - t
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a = e[0][j] + e[2][j]
        b = e[0][j] - e[2][j]
        c = (e[1][j] >> 1) - e[3][j]
        t = e[1][j] + (e[3][j] >> 1)
        out[0][j] = (a + t + 32) >> 6
        out[1][j] = (b + c + 32) >> 6
        out[2][j] = (b - c + 32) >> 6
        out[3][j] = (a - t + 32) >> 6
    return out


def inverse_hadamard_4x4(c: list[list[int]]) -> list[list[int]]:
    e = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a = c[i][0] + c[i][2]
        b = c[i][0] - c[i][2]
        d = c[i][1] - c[i][3]
        t = c[i][1] + c[i][3]
        e[i][0] = a + t
        e[i][1] = b + d
        e[i][2] = b - d
        e[i][3] = a - t
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a = e[0][j] + e[2][j]
        b = e[0][j] - e[2][j]
        d = e[1][j] - e[3][j]
        t = e[1][j] + e[3][j]
        out[0][j] = a + t
        out[1][j] = b + d
        out[2][j] = b - d
        out[3][j] = a - t
    return out


def _dequant_4x4(coeffs: list[int], qp: int, dc_from=None,
                 weights: list[int] | None = None) -> list[list[int]]:
    """Zig-zag coeffs -> dequantized 4x4 residual matrix d (8.5.12.1);
    ``dc_from`` substitutes d[0][0] (Intra16x16 / chroma DC paths).
    ``weights`` is the scan-order 16-entry scaling list (weightScale);
    None = flat 16, for which the general (c*w*v) << (sh-4) collapses
    to the exact shortcut (c*v) << sh (the 16 cancels the >>4)."""
    d = [[0] * 4 for _ in range(4)]
    m = qp % 6
    shift = qp // 6
    for k, lvl in enumerate(coeffs):
        if lvl == 0:
            continue
        idx = _ZZ4[k]
        i, j = idx >> 2, idx & 3
        v = _level_scale(m, i, j)
        if weights is None:
            d[i][j] = (lvl * v) << shift
        elif qp >= 24:
            d[i][j] = (lvl * weights[k] * v) << (shift - 4)
        else:
            d[i][j] = (
                lvl * weights[k] * v + (1 << (3 - shift))
            ) >> (4 - shift)
    if dc_from is not None:
        d[0][0] = dc_from
    return d


def _scale_luma_dc(f: int, qp: int, w00: int = 16) -> int:
    """8.5.10 — LevelScale4x4(m,0,0) INCLUDES the weightScale (16
    with flat lists): dropping it decodes every Intra16x16 DC 16x
    too small (the JM identity InvLevelScale = dequant_coef * 16;
    caught r9 alongside the same bug in the 8x8 path — the AC path
    was always correct because its 16 cancels against the >>4)."""
    ls = w00 * _level_scale(qp % 6, 0, 0)
    if qp >= 36:
        return (f * ls) << (qp // 6 - 6)
    return (f * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def _scale_chroma_dc(f: int, qp: int, w00: int = 16) -> int:
    # 8.5.11 with the same weightScale factor (see _scale_luma_dc)
    return ((f * w00 * _level_scale(qp % 6, 0, 0)) << (qp // 6)) >> 5


# ------------------------------------------------------------------
# Intra prediction (8.3)
# ------------------------------------------------------------------
def _clip(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def predict_4x4(mode, A, L, X, a_ok, l_ok, ar, bd=8):
    """9 intra 4x4 modes. A: 4 above samples, ar: 4 above-right
    (already substituted when unavailable), L: 4 left, X: above-left.
    Returns 4x4 prediction."""
    p = [[0] * 4 for _ in range(4)]
    if mode == 0:  # vertical
        if not a_ok:
            raise ValueError("intra4x4 vertical without above")
        for y in range(4):
            for x in range(4):
                p[y][x] = A[x]
    elif mode == 1:  # horizontal
        if not l_ok:
            raise ValueError("intra4x4 horizontal without left")
        for y in range(4):
            for x in range(4):
                p[y][x] = L[y]
    elif mode == 2:  # DC
        if a_ok and l_ok:
            dc = (sum(A) + sum(L) + 4) >> 3
        elif a_ok:
            dc = (sum(A) + 2) >> 2
        elif l_ok:
            dc = (sum(L) + 2) >> 2
        else:
            dc = 1 << (bd - 1)
        for y in range(4):
            for x in range(4):
                p[y][x] = dc
    elif mode == 3:  # diagonal down-left
        q = A + ar
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y][x] = (q[6] + 3 * q[7] + 2) >> 2
                else:
                    k = x + y
                    p[y][x] = (q[k] + 2 * q[k + 1] + q[k + 2] + 2) >> 2
    elif mode == 4:  # diagonal down-right
        for y in range(4):
            for x in range(4):
                if x > y:
                    k = x - y - 2
                    a0 = A[k] if k >= 0 else X
                    a1 = A[k + 1] if k + 1 >= 0 else X
                    a2 = A[k + 2]
                    p[y][x] = (a0 + 2 * a1 + a2 + 2) >> 2
                elif x < y:
                    k = y - x - 2
                    l0 = L[k] if k >= 0 else X
                    l1 = L[k + 1] if k + 1 >= 0 else X
                    l2 = L[k + 2]
                    p[y][x] = (l0 + 2 * l1 + l2 + 2) >> 2
                else:
                    p[y][x] = (A[0] + 2 * X + L[0] + 2) >> 2
    elif mode == 5:  # vertical-right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    k = x - (y >> 1) - 1
                    a0 = A[k] if k >= 0 else X
                    a1 = A[k + 1]
                    p[y][x] = (a0 + a1 + 1) >> 1
                elif z >= 0:
                    k = x - (y >> 1) - 2
                    a0 = A[k] if k >= 0 else X
                    a1 = A[k + 1] if k + 1 >= 0 else X
                    a2 = A[k + 2]
                    p[y][x] = (a0 + 2 * a1 + a2 + 2) >> 2
                elif z == -1:
                    p[y][x] = (L[0] + 2 * X + A[0] + 2) >> 2
                else:
                    p[y][x] = (L[y - 1] + 2 * L[y - 2] + (L[y - 3] if y >= 3 else X) + 2) >> 2
    elif mode == 6:  # horizontal-down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    k = y - (x >> 1) - 1
                    l0 = L[k] if k >= 0 else X
                    l1 = L[k + 1]
                    p[y][x] = (l0 + l1 + 1) >> 1
                elif z >= 0:
                    k = y - (x >> 1) - 2
                    l0 = L[k] if k >= 0 else X
                    l1 = L[k + 1] if k + 1 >= 0 else X
                    l2 = L[k + 2]
                    p[y][x] = (l0 + 2 * l1 + l2 + 2) >> 2
                elif z == -1:
                    p[y][x] = (A[0] + 2 * X + L[0] + 2) >> 2
                else:
                    p[y][x] = (A[x - 1] + 2 * A[x - 2] + (A[x - 3] if x >= 3 else X) + 2) >> 2
    elif mode == 7:  # vertical-left
        q = A + ar
        for y in range(4):
            for x in range(4):
                k = x + (y >> 1)
                if y % 2 == 0:
                    p[y][x] = (q[k] + q[k + 1] + 1) >> 1
                else:
                    p[y][x] = (q[k] + 2 * q[k + 1] + q[k + 2] + 2) >> 2
    elif mode == 8:  # horizontal-up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z < 5 and z % 2 == 0:
                    k = y + (x >> 1)
                    p[y][x] = (L[k] + L[k + 1] + 1) >> 1
                elif z < 5:
                    k = y + (x >> 1)
                    p[y][x] = (L[k] + 2 * L[k + 1] + L[k + 2] + 2) >> 2
                elif z == 5:
                    p[y][x] = (L[2] + 3 * L[3] + 2) >> 2
                else:
                    p[y][x] = L[3]
    else:
        raise ValueError(f"invalid intra4x4 mode {mode}")
    return p


def predict_16x16(mode, above, left, top_left, a_ok, l_ok, bd=8):
    p = [[0] * 16 for _ in range(16)]
    if mode == 0:  # vertical
        for y in range(16):
            for x in range(16):
                p[y][x] = above[x]
    elif mode == 1:  # horizontal
        for y in range(16):
            for x in range(16):
                p[y][x] = left[y]
    elif mode == 2:  # DC
        if a_ok and l_ok:
            dc = (sum(above) + sum(left) + 16) >> 5
        elif a_ok:
            dc = (sum(above) + 8) >> 4
        elif l_ok:
            dc = (sum(left) + 8) >> 4
        else:
            dc = 1 << (bd - 1)
        for y in range(16):
            for x in range(16):
                p[y][x] = dc
    elif mode == 3:  # plane
        hsum = sum(
            (x + 1)
            * (above[8 + x] - (above[6 - x] if 6 - x >= 0 else top_left))
            for x in range(8)
        )
        vs = 0
        for y in range(8):
            lo = left[6 - y] if 6 - y >= 0 else top_left
            vs += (y + 1) * (left[8 + y] - lo)
        b = (5 * hsum + 32) >> 6
        c = (5 * vs + 32) >> 6
        a = 16 * (above[15] + left[15])
        for y in range(16):
            for x in range(16):
                p[y][x] = _clip3(0, (1 << bd) - 1, (a + b * (x - 7) + c * (y - 7) + 16) >> 5)
    else:
        raise ValueError(f"invalid intra16x16 mode {mode}")
    return p


def predict_chroma(mode, above, left, top_left, a_ok, l_ok, bd=8):
    """8x8 chroma prediction (modes: 0 DC, 1 horizontal, 2 vertical,
    3 plane)."""
    p = [[0] * 8 for _ in range(8)]
    if mode == 0:  # DC, per 4x4 quadrant
        for qy in (0, 4):
            for qx in (0, 4):
                s_a = sum(above[qx : qx + 4]) if a_ok else None
                s_l = sum(left[qy : qy + 4]) if l_ok else None
                if qx == 0 and qy == 0 or (qx == 4 and qy == 4):
                    if s_a is not None and s_l is not None:
                        dc = (s_a + s_l + 4) >> 3
                    elif s_a is not None:
                        dc = (s_a + 2) >> 2
                    elif s_l is not None:
                        dc = (s_l + 2) >> 2
                    else:
                        dc = 1 << (bd - 1)
                elif qx == 4:  # top-right prefers above
                    if s_a is not None:
                        dc = (s_a + 2) >> 2
                    elif s_l is not None:
                        dc = (s_l + 2) >> 2
                    else:
                        dc = 1 << (bd - 1)
                else:  # bottom-left prefers left
                    if s_l is not None:
                        dc = (s_l + 2) >> 2
                    elif s_a is not None:
                        dc = (s_a + 2) >> 2
                    else:
                        dc = 1 << (bd - 1)
                for y in range(4):
                    for x in range(4):
                        p[qy + y][qx + x] = dc
    elif mode == 1:  # horizontal
        for y in range(8):
            for x in range(8):
                p[y][x] = left[y]
    elif mode == 2:  # vertical
        for y in range(8):
            for x in range(8):
                p[y][x] = above[x]
    elif mode == 3:  # plane
        hsum = sum(
            (x + 1)
            * (above[4 + x] - (above[2 - x] if 2 - x >= 0 else top_left))
            for x in range(4)
        )
        vs = 0
        for y in range(4):
            lo = left[2 - y] if 2 - y >= 0 else top_left
            vs += (y + 1) * (left[4 + y] - lo)
        b = (17 * hsum + 16) >> 5
        c = (17 * vs + 16) >> 5
        a = 16 * (above[7] + left[7])
        for y in range(8):
            for x in range(8):
                p[y][x] = _clip3(0, (1 << bd) - 1, (a + b * (x - 3) + c * (y - 3) + 16) >> 5)
    else:
        raise ValueError(f"invalid chroma mode {mode}")
    return p


# ------------------------------------------------------------------
# Frame decoder
# ------------------------------------------------------------------
class _Frame:
    """Decode state for one IDR picture."""

    def __init__(self, sps, pps):
        self.sps = sps
        self.pps = pps
        self.mb_w = sps["mb_w"]
        self.mb_h = sps["mb_h"]
        # format parameters: 4:0:0 drops every chroma stage; bit
        # depths > 8 widen samples, QP range, and deblock thresholds
        self.cf = sps.get("chroma_format", 1)
        self.bd = sps.get("bit_depth", 8)
        self.maxv = (1 << self.bd) - 1
        self.mid = 1 << (self.bd - 1)
        self.qp_off = 6 * (self.bd - 8)  # QpBdOffsetY (== C here)
        W, H = self.mb_w * 16, self.mb_h * 16
        self.y = [[0] * W for _ in range(H)]
        self.u = [[0] * (W // 2) for _ in range(H // 2)]
        self.v = [[0] * (W // 2) for _ in range(H // 2)]
        bw, bh = self.mb_w * 4, self.mb_h * 4
        self.nnz_y = [[0] * bw for _ in range(bh)]
        cw, chh = self.mb_w * 2, self.mb_h * 2
        self.nnz_c = [
            [[0] * cw for _ in range(chh)] for _ in range(2)
        ]
        self.mode4 = [[-1] * bw for _ in range(bh)]  # intra4x4 modes
        self.decoded4 = [[False] * bw for _ in range(bh)]
        self.is_i4 = [[False] * self.mb_w for _ in range(self.mb_h)]
        # True when the MB used the High-profile 8x8 transform (the
        # deblocking filter skips the 4/12 internal luma edges then)
        self.mb_t8 = [[False] * self.mb_w for _ in range(self.mb_h)]
        self.mb_slice = [[-1] * self.mb_w for _ in range(self.mb_h)]
        # per-MB luma QP for the deblocking filter (8.7); I_PCM MBs
        # record 0 per the qPp derivation rule
        self.mb_qp = [[0] * self.mb_w for _ in range(self.mb_h)]

    # ---- availability -------------------------------------------------
    def mb_avail(self, mbx, mby, cur_slice):
        return (
            0 <= mbx < self.mb_w
            and 0 <= mby < self.mb_h
            and self.mb_slice[mby][mbx] == cur_slice
        )

    def blk_mb(self, bx, by):
        return bx // 4, by // 4

    def luma_nC(self, bx, by, cur_slice):
        nA = nB = None
        if bx > 0 and self.mb_avail(*self.blk_mb(bx - 1, by), cur_slice):
            nA = self.nnz_y[by][bx - 1]
        if by > 0 and self.mb_avail(*self.blk_mb(bx, by - 1), cur_slice):
            nB = self.nnz_y[by - 1][bx]
        if nA is not None and nB is not None:
            return (nA + nB + 1) >> 1
        if nA is not None:
            return nA
        if nB is not None:
            return nB
        return 0

    def chroma_nC(self, comp, cx, cy, cur_slice):
        nA = nB = None
        if cx > 0 and self.mb_avail(cx - 1 >> 1, cy >> 1, cur_slice):
            nA = self.nnz_c[comp][cy][cx - 1]
        if cy > 0 and self.mb_avail(cx >> 1, cy - 1 >> 1, cur_slice):
            nB = self.nnz_c[comp][cy - 1][cx]
        if nA is not None and nB is not None:
            return (nA + nB + 1) >> 1
        if nA is not None:
            return nA
        if nB is not None:
            return nB
        return 0


def _decode_slice(br, frame: _Frame, slice_idx, header):
    sps, pps = frame.sps, frame.pps
    qp = header["qp"]
    mb_addr = header["first_mb"]
    n_mbs = frame.mb_w * frame.mb_h
    while True:
        if mb_addr >= n_mbs:
            raise ValueError("invalid H.264: MB address overflow")
        mbx, mby = mb_addr % frame.mb_w, mb_addr // frame.mb_w
        frame.mb_slice[mby][mbx] = slice_idx
        qp = _decode_macroblock(br, frame, mbx, mby, qp, slice_idx)
        mb_addr += 1
        if not br.more_rbsp_data():
            break
    return mb_addr


def _decode_macroblock(br, frame: _Frame, mbx, mby, qp, cur_slice):
    mb_type = br.ue()
    if mb_type > 25:
        raise ValueError(f"invalid I-slice mb_type {mb_type}")
    if mb_type == 25:  # I_PCM
        return _decode_ipcm(br, frame, mbx, mby, qp)
    if mb_type == 0:
        return _decode_i4x4(br, frame, mbx, mby, qp, cur_slice)
    return _decode_i16x16(br, frame, mbx, mby, qp, cur_slice, mb_type)


def _decode_ipcm(br, frame, mbx, mby, qp):
    br.byte_align()
    for yy in range(16):
        for xx in range(16):
            frame.y[mby * 16 + yy][mbx * 16 + xx] = br.u(frame.bd)
    if frame.cf:
        for plane in (frame.u, frame.v):
            for yy in range(8):
                for xx in range(8):
                    plane[mby * 8 + yy][mbx * 8 + xx] = br.u(frame.bd)
    for yy in range(4):
        for xx in range(4):
            frame.nnz_y[mby * 4 + yy][mbx * 4 + xx] = 16
            frame.decoded4[mby * 4 + yy][mbx * 4 + xx] = True
    for comp in range(2):
        for yy in range(2):
            for xx in range(2):
                frame.nnz_c[comp][mby * 2 + yy][mbx * 2 + xx] = 16
    return qp


def _pred_mode_4x4(frame, bx, by, cur_slice):
    """predIntra4x4PredMode (8.3.1.1): min of the left/above blocks'
    modes; unavailable or non-I4x4 neighbors count as DC (2)."""

    def nmode(nbx, nby):
        if nbx < 0 or nby < 0:
            return None
        if not frame.mb_avail(*frame.blk_mb(nbx, nby), cur_slice):
            return None
        m = frame.mode4[nby][nbx]
        return 2 if m < 0 else m

    a = nmode(bx - 1, by)
    b = nmode(bx, by - 1)
    if a is None or b is None:
        return 2
    return min(a, b)


def _neighbors_4x4(frame, bx, by, cur_slice):
    """(A, L, X, a_ok, l_ok, AR) sample neighborhoods for one luma
    4x4 block at block coords (bx, by), with the above-right
    substitution rule (8.3.1.2)."""
    x0, y0 = bx * 4, by * 4
    a_ok = by > 0 and frame.mb_avail(*frame.blk_mb(bx, by - 1), cur_slice)
    l_ok = bx > 0 and frame.mb_avail(*frame.blk_mb(bx - 1, by), cur_slice)
    A = [frame.y[y0 - 1][x0 + i] for i in range(4)] if a_ok else [0] * 4
    L = [frame.y[y0 + i][x0 - 1] for i in range(4)] if l_ok else [0] * 4
    x_ok = a_ok and l_ok and frame.mb_avail(
        *frame.blk_mb(bx - 1, by - 1), cur_slice
    )
    X = frame.y[y0 - 1][x0 - 1] if x_ok else (A[0] if a_ok else (L[0] if l_ok else frame.mid))
    # above-right: available iff in frame, same slice, and DECODED
    # (z-scan order makes intra-MB cases resolve correctly)
    ar_ok = (
        by > 0
        and bx + 1 < frame.mb_w * 4
        and frame.mb_avail(*frame.blk_mb(bx + 1, by - 1), cur_slice)
        and frame.decoded4[by - 1][bx + 1]
    )
    if ar_ok:
        AR = [frame.y[y0 - 1][x0 + 4 + i] for i in range(4)]
    elif a_ok:
        AR = [A[3]] * 4  # substitution with p[3,-1]
    else:
        AR = [0] * 4
    return A, L, X, a_ok, l_ok, AR


def _parse_cbp_qp(br, frame, qp, intra16):
    if intra16:
        cbp_luma = cbp_chroma = None  # from mb_type, set by caller
        delta = br.se()
    elif frame.cf == 0:
        # Table 9-4, ChromaArrayType 0: luma-only cbp, 16 codes
        code = br.ue()
        if code >= 16:
            raise ValueError("invalid coded_block_pattern")
        cbp_luma, cbp_chroma = _CBP_INTRA_MONO[code], 0
        delta = br.se() if cbp_luma != 0 else 0
    else:
        code = br.ue()
        if code >= 48:
            raise ValueError("invalid coded_block_pattern")
        cbp = _CBP_INTRA[code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp_chroma == 3:
            raise ValueError("invalid chroma CBP")
        delta = br.se() if cbp != 0 else 0
    # 7.4.5: QPY wraps in [-QpBdOffsetY, 51]
    off = frame.qp_off
    qp = ((qp + delta + 52 + 2 * off) % (52 + off)) - off
    return cbp_luma, cbp_chroma, qp


def _decode_i4x4(br, frame, mbx, mby, qp, cur_slice):
    # High profile: I_NxN carries transform_size_8x8_flag first
    if frame.pps.get("transform_8x8_mode") and br.u(1):
        return _decode_i8x8_cavlc(br, frame, mbx, mby, qp, cur_slice)
    frame.is_i4[mby][mbx] = True
    # mb_pred: 16 intra modes (z-scan), then chroma mode
    modes = []
    for blk in range(16):
        dx, dy = _BLK_XY[blk]
        bx, by = mbx * 4 + dx, mby * 4 + dy
        pred = _pred_mode_4x4(frame, bx, by, cur_slice)
        if br.u(1):
            mode = pred
        else:
            rem = br.u(3)
            mode = rem if rem < pred else rem + 1
        modes.append(mode)
        frame.mode4[by][bx] = mode  # later blocks predict from it
    chroma_mode = br.ue() if frame.cf else 0
    cbp_luma, cbp_chroma, qp = _parse_cbp_qp(br, frame, qp, False)
    frame.mb_qp[mby][mbx] = qp

    # residual parse (z-scan), tracking nnz for nC contexts
    blocks = []
    for blk in range(16):
        dx, dy = _BLK_XY[blk]
        bx, by = mbx * 4 + dx, mby * 4 + dy
        if cbp_luma & (1 << (blk // 4)):
            nc = frame.luma_nC(bx, by, cur_slice)
            coeffs, tc = decode_residual_block(br, nc, 16)
        else:
            coeffs, tc = [0] * 16, 0
        frame.nnz_y[by][bx] = tc
        blocks.append(coeffs)
    chroma_res = _parse_chroma_residual(
        br, frame, mbx, mby, cbp_chroma, cur_slice
    ) if frame.cf else None

    _recon_i4x4_luma(frame, mbx, mby, modes, blocks, qp, cur_slice)
    if frame.cf:
        _recon_chroma(frame, mbx, mby, chroma_mode, chroma_res, qp,
                      cur_slice)
    return qp


def _recon_i4x4_luma(frame, mbx, mby, modes, blocks, qp, cur_slice):
    """Reconstruct the 16 luma 4x4 blocks of an I_NxN macroblock from
    parsed modes + scan-order coefficient lists (shared by the CAVLC
    and CABAC entropy front-ends — prediction, dequant and transform
    are entropy-agnostic)."""
    w4 = frame.pps.get("w4")
    wy = w4[0] if w4 else None  # intra luma 4x4 scaling list
    for blk in range(16):
        dx, dy = _BLK_XY[blk]
        bx, by = mbx * 4 + dx, mby * 4 + dy
        A, L, X, a_ok, l_ok, AR = _neighbors_4x4(frame, bx, by, cur_slice)
        pred = predict_4x4(modes[blk], A, L, X, a_ok, l_ok, AR, bd=frame.bd)
        res = inverse_4x4(
            _dequant_4x4(blocks[blk], qp + frame.qp_off, weights=wy)
        )
        x0, y0 = bx * 4, by * 4
        for yy in range(4):
            for xx in range(4):
                frame.y[y0 + yy][x0 + xx] = _clip3(
                    0, frame.maxv, pred[yy][xx] + res[yy][xx]
                )
        frame.decoded4[by][bx] = True


def _decode_i16x16(br, frame, mbx, mby, qp, cur_slice, mb_type):
    pred_mode = (mb_type - 1) % 4
    cbp_chroma = ((mb_type - 1) // 4) % 3
    cbp_luma = 15 if (mb_type - 1) >= 12 else 0
    chroma_mode = br.ue() if frame.cf else 0
    _, _, qp = _parse_cbp_qp(br, frame, qp, True)
    frame.mb_qp[mby][mbx] = qp

    # DC block: nC context of luma block 0
    bx0, by0 = mbx * 4, mby * 4
    nc = frame.luma_nC(bx0, by0, cur_slice)
    dc_coeffs, _ = decode_residual_block(br, nc, 16)
    ac_blocks = []
    for blk in range(16):
        dx, dy = _BLK_XY[blk]
        bx, by = mbx * 4 + dx, mby * 4 + dy
        if cbp_luma:
            nc = frame.luma_nC(bx, by, cur_slice)
            coeffs, tc = decode_residual_block(br, nc, 15)
        else:
            coeffs, tc = [0] * 15, 0
        frame.nnz_y[by][bx] = tc
        ac_blocks.append(coeffs)
    chroma_res = _parse_chroma_residual(
        br, frame, mbx, mby, cbp_chroma, cur_slice
    ) if frame.cf else None

    _recon_i16x16_luma(
        frame, mbx, mby, pred_mode, dc_coeffs, ac_blocks, qp, cur_slice
    )
    if frame.cf:
        _recon_chroma(frame, mbx, mby, chroma_mode, chroma_res, qp,
                      cur_slice)
    return qp


def _recon_i16x16_luma(frame, mbx, mby, pred_mode, dc_coeffs, ac_blocks,
                       qp, cur_slice):
    """Reconstruct an I_16x16 macroblock's luma from the parsed DC
    (scan order, 16) and AC (scan order, 15 each) levels — shared by
    the CAVLC and CABAC entropy front-ends."""
    x0, y0 = mbx * 16, mby * 16
    a_ok = mby > 0 and frame.mb_avail(mbx, mby - 1, cur_slice)
    l_ok = mbx > 0 and frame.mb_avail(mbx - 1, mby, cur_slice)
    above = [frame.y[y0 - 1][x0 + i] for i in range(16)] if a_ok else [0] * 16
    left = [frame.y[y0 + i][x0 - 1] for i in range(16)] if l_ok else [0] * 16
    x_ok = a_ok and l_ok and frame.mb_avail(mbx - 1, mby - 1, cur_slice)
    tl = frame.y[y0 - 1][x0 - 1] if x_ok else frame.mid
    if pred_mode == 3 and not (a_ok and l_ok and x_ok):
        raise ValueError("intra16x16 plane without neighbors")
    pred = predict_16x16(pred_mode, above, left, tl, a_ok, l_ok,
                         bd=frame.bd)

    # luma DC: inverse Hadamard, then 8.5.10 scaling
    f = [[0] * 4 for _ in range(4)]
    for k in range(16):
        idx = _ZZ4[k]
        f[idx >> 2][idx & 3] = dc_coeffs[k]
    w4 = frame.pps.get("w4")
    wy = w4[0] if w4 else None
    w00 = wy[0] if wy else 16
    g = inverse_hadamard_4x4(f)
    dc = [[_scale_luma_dc(g[i][j], qp + frame.qp_off, w00) for j in range(4)]
          for i in range(4)]

    for blk in range(16):
        dx, dy = _BLK_XY[blk]
        bx, by = mbx * 4 + dx, mby * 4 + dy
        coeffs = [0] + ac_blocks[blk]  # AC levels occupy scan 1..15
        res = inverse_4x4(
            _dequant_4x4(coeffs, qp + frame.qp_off,
                         dc_from=dc[dy][dx], weights=wy)
        )
        px, py = bx * 4, by * 4
        for yy in range(4):
            for xx in range(4):
                frame.y[py + yy][px + xx] = _clip3(
                    0, frame.maxv,
                    pred[(dy * 4) + yy][(dx * 4) + xx] + res[yy][xx]
                )
        frame.decoded4[by][bx] = True


def _parse_chroma_residual(br, frame, mbx, mby, cbp_chroma, cur_slice):
    """Chroma DC (2x2, nC=-1) and AC (15-coeff) blocks for both
    components, per CBP; returns ({comp: dc4}, {comp: [ac x4]})."""
    dcs = {0: [0] * 4, 1: [0] * 4}
    acs = {0: [[0] * 15 for _ in range(4)], 1: [[0] * 15 for _ in range(4)]}
    if cbp_chroma:
        for comp in range(2):
            dcs[comp], _ = decode_residual_block(br, -1, 4)
    for comp in range(2):
        for blk in range(4):
            cx = mbx * 2 + (blk & 1)
            cy = mby * 2 + (blk >> 1)
            if cbp_chroma == 2:
                nc = frame.chroma_nC(comp, cx, cy, cur_slice)
                coeffs, tc = decode_residual_block(br, nc, 15)
                acs[comp][blk] = coeffs
            else:
                tc = 0
            frame.nnz_c[comp][cy][cx] = tc
    return dcs, acs


def _recon_chroma(frame, mbx, mby, mode, chroma_res, qp_y, cur_slice):
    dcs, acs = chroma_res
    qpc_by_comp = (
        _chroma_qp(qp_y, frame.pps["chroma_qp_index_offset"],
                   frame.qp_off),
        _chroma_qp(
            qp_y,
            frame.pps.get(
                "second_chroma_qp_offset",
                frame.pps["chroma_qp_index_offset"],
            ),
            frame.qp_off,
        ),
    )
    a_ok = mby > 0 and frame.mb_avail(mbx, mby - 1, cur_slice)
    l_ok = mbx > 0 and frame.mb_avail(mbx - 1, mby, cur_slice)
    x_ok = a_ok and l_ok and frame.mb_avail(mbx - 1, mby - 1, cur_slice)
    if mode == 3 and not (a_ok and l_ok and x_ok):
        raise ValueError("chroma plane without neighbors")
    if mode == 1 and not l_ok:
        raise ValueError("chroma horizontal without left")
    if mode == 2 and not a_ok:
        raise ValueError("chroma vertical without above")
    for comp, plane in ((0, frame.u), (1, frame.v)):
        qpc = qpc_by_comp[comp]
        x0, y0 = mbx * 8, mby * 8
        above = [plane[y0 - 1][x0 + i] for i in range(8)] if a_ok else [0] * 8
        left = [plane[y0 + i][x0 - 1] for i in range(8)] if l_ok else [0] * 8
        tl = plane[y0 - 1][x0 - 1] if x_ok else frame.mid
        pred = predict_chroma(mode, above, left, tl, a_ok, l_ok,
                              bd=frame.bd)
        # 2x2 DC inverse transform (8.5.11) + scaling
        c = dcs[comp]
        g = [
            c[0] + c[1] + c[2] + c[3],
            c[0] - c[1] + c[2] - c[3],
            c[0] + c[1] - c[2] - c[3],
            c[0] - c[1] - c[2] + c[3],
        ]
        w4 = frame.pps.get("w4")
        # intra chroma scaling lists: Cb = list 1, Cr = list 2
        wc = w4[1 + comp] if w4 else None
        dc = [_scale_chroma_dc(v, qpc, wc[0] if wc else 16) for v in g]
        for blk in range(4):
            coeffs = [0] + acs[comp][blk]
            res = inverse_4x4(
                _dequant_4x4(coeffs, qpc, dc_from=dc[blk], weights=wc)
            )
            bx0 = (blk & 1) * 4
            by0 = (blk >> 1) * 4
            for yy in range(4):
                for xx in range(4):
                    plane[y0 + by0 + yy][x0 + bx0 + xx] = _clip3(
                        0, frame.maxv,
                        pred[by0 + yy][bx0 + xx] + res[yy][xx]
                    )


# ---- in-loop deblocking filter (8.7) -------------------------------
# Tables 8-16 / 8-17: alpha/beta thresholds and t'C0 clipping values,
# indexed by indexA/indexB = Clip3(0, 51, qPav + slice offset).
_DB_ALPHA = [0] * 16 + [
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
    40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255,
]
_DB_BETA = [0] * 16 + [
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10,
    11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18,
]
# t'C0 rows for bS = 1, 2, 3
_DB_TC0 = {
    1: [0] * 16 + [
        0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
        2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13,
    ],
    2: [0] * 16 + [
        0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3,
        4, 4, 4, 5, 5, 6, 6, 7, 8, 8, 9, 10, 12, 13, 15, 17,
    ],
    3: [0] * 16 + [
        0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4,
        4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23, 25,
    ],
}


def _clip3(lo, hi, v):
    return lo if v < lo else hi if v > hi else v


def _filter_line(buf, bs, alpha, beta, tc0, chroma, maxv=255):
    """Filter one 8-sample line across an edge IN PLACE.
    ``buf`` = [p3, p2, p1, p0, q0, q1, q2, q3] (p-side first)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = buf
    if not (
        abs(p0 - q0) < alpha and abs(p1 - p0) < beta and abs(q1 - q0) < beta
    ):
        return
    ap = abs(p2 - p0) < beta
    aq = abs(q2 - q0) < beta
    if bs == 4:
        if chroma:
            buf[3] = (2 * p1 + p0 + q1 + 2) >> 2
            buf[4] = (2 * q1 + q0 + p1 + 2) >> 2
            return
        strong = abs(p0 - q0) < (alpha >> 2) + 2
        if ap and strong:
            buf[3] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
            buf[2] = (p2 + p1 + p0 + q0 + 2) >> 2
            buf[1] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
        else:
            buf[3] = (2 * p1 + p0 + q1 + 2) >> 2
        if aq and strong:
            buf[4] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
            buf[5] = (q2 + q1 + q0 + p0 + 2) >> 2
            buf[6] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
        else:
            buf[4] = (2 * q1 + q0 + p1 + 2) >> 2
        return
    # bS 1..3: clipped delta on p0/q0 (+ p1/q1 for luma)
    tc = tc0 + 1 if chroma else tc0 + (1 if ap else 0) + (1 if aq else 0)
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    buf[3] = _clip3(0, maxv, p0 + delta)
    buf[4] = _clip3(0, maxv, q0 - delta)
    if not chroma:
        if ap:
            buf[2] = p1 + _clip3(
                -tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1
            )
        if aq:
            buf[5] = q1 + _clip3(
                -tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1
            )


def _deblock_edges(plane, x0, y0, span, vertical, bs, qpav, a_off, b_off, chroma, bd=8):
    """Filter ``span`` lines of one edge of ``plane``; the edge sits
    LEFT of column x0 (vertical) or ABOVE row y0 (horizontal)."""
    idx_a = _clip3(0, 51, qpav + a_off)
    idx_b = _clip3(0, 51, qpav + b_off)
    # 8.7.2.2: thresholds scale with bit depth; tables stay 8-bit
    sh = bd - 8
    alpha = _DB_ALPHA[idx_a] << sh
    beta = _DB_BETA[idx_b] << sh
    if alpha == 0 or beta == 0:
        return
    tc0 = 0 if bs == 4 else _DB_TC0[bs][idx_a] << sh
    maxv = (1 << bd) - 1
    for k in range(span):
        if vertical:
            row = plane[y0 + k]
            buf = [row[x0 - 4 + i] for i in range(8)]
            _filter_line(buf, bs, alpha, beta, tc0, chroma, maxv)
            for i in range(1, 7):  # p3/q3 never change
                row[x0 - 4 + i] = buf[i]
        else:
            x = x0 + k
            buf = [plane[y0 - 4 + i][x] for i in range(8)]
            _filter_line(buf, bs, alpha, beta, tc0, chroma, maxv)
            for i in range(1, 7):
                plane[y0 - 4 + i][x] = buf[i]


def deblock_frame(frame: "_Frame", slice_deblock) -> None:
    """8.7 for intra-only pictures: per MB in raster order, all
    vertical edges left-to-right then all horizontal edges
    top-to-bottom, filtering in place so later edges read earlier
    edges' output (the spec's sequential semantics). bS derivation
    collapses for I slices: 4 on macroblock edges, 3 on internal
    transform edges. idc=1 disables the MB's slice entirely; idc=2
    skips edges that cross a slice boundary. I_PCM macroblocks take
    qPp = 0 (frame.mb_qp records that at decode time)."""
    co_u = frame.pps["chroma_qp_index_offset"]
    co_v = frame.pps.get("second_chroma_qp_offset", co_u)
    for mby in range(frame.mb_h):
        for mbx in range(frame.mb_w):
            sl = frame.mb_slice[mby][mbx]
            idc, a_off, b_off = slice_deblock[sl]
            if idc == 1:
                continue
            qp_cur = frame.mb_qp[mby][mbx]
            # 8x8-transform MBs have no 4x4 luma transform edges:
            # only the internal edge at 8 is filtered (8.7's
            # transform-block-boundary condition)
            internal = (8,) if frame.mb_t8[mby][mbx] else (4, 8, 12)

            def edge_sets(n_mbx, n_mby):
                """(bs, qpav_luma, (qpav_u, qpav_v)) for the
                MB-boundary edge vs neighbor, or None if it must not
                filter."""
                if n_mbx < 0 or n_mby < 0:
                    return None
                if (
                    idc == 2
                    and frame.mb_slice[n_mby][n_mbx] != sl
                ):
                    return None
                qp_n = frame.mb_qp[n_mby][n_mbx]
                qpav = (qp_cur + qp_n + 1) >> 1
                qpav_c = tuple(
                    (_chroma_qp(qp_cur, co) + _chroma_qp(qp_n, co) + 1)
                    >> 1
                    for co in (co_u, co_v)
                )
                return 4, qpav, qpav_c

            qpc_u = _chroma_qp(qp_cur, co_u)
            qpc_v = _chroma_qp(qp_cur, co_v)
            x16, y16 = mbx * 16, mby * 16
            x8, y8 = mbx * 8, mby * 8
            # vertical edges, left to right
            bd, cf = frame.bd, frame.cf
            left = edge_sets(mbx - 1, mby)
            if left is not None:
                bs, qa, qac = left
                _deblock_edges(frame.y, x16, y16, 16, True, bs, qa, a_off, b_off, False, bd)
                if cf:
                    _deblock_edges(frame.u, x8, y8, 8, True, bs, qac[0], a_off, b_off, True, bd)
                    _deblock_edges(frame.v, x8, y8, 8, True, bs, qac[1], a_off, b_off, True, bd)
            for xe in internal:
                _deblock_edges(frame.y, x16 + xe, y16, 16, True, 3, qp_cur, a_off, b_off, False, bd)
            if cf:
                _deblock_edges(frame.u, x8 + 4, y8, 8, True, 3, qpc_u, a_off, b_off, True, bd)
                _deblock_edges(frame.v, x8 + 4, y8, 8, True, 3, qpc_v, a_off, b_off, True, bd)
            # horizontal edges, top to bottom
            top = edge_sets(mbx, mby - 1)
            if top is not None:
                bs, qa, qac = top
                _deblock_edges(frame.y, x16, y16, 16, False, bs, qa, a_off, b_off, False, bd)
                if cf:
                    _deblock_edges(frame.u, x8, y8, 8, False, bs, qac[0], a_off, b_off, True, bd)
                    _deblock_edges(frame.v, x8, y8, 8, False, bs, qac[1], a_off, b_off, True, bd)
            for ye in internal:
                _deblock_edges(frame.y, x16, y16 + ye, 16, False, 3, qp_cur, a_off, b_off, False, bd)
            if cf:
                _deblock_edges(frame.u, x8, y8 + 4, 8, False, 3, qpc_u, a_off, b_off, True, bd)
                _deblock_edges(frame.v, x8, y8 + 4, 8, False, 3, qpc_v, a_off, b_off, True, bd)


def _parse_slice_header(br, nal_type, sps_map, pps_map):
    first_mb = br.ue()
    slice_type = br.ue()
    if slice_type % 5 != 2:  # I slices only
        raise NotImplementedError("only I slices supported (P/B need inter)")
    pps = pps_map[br.ue()]
    sps = sps_map[pps["sps_id"]]
    br.u(sps["log2_max_frame_num"])  # frame_num
    if nal_type == 5:
        br.ue()  # idr_pic_id
    if sps["pic_order_cnt_type"] == 0:
        br.u(sps["log2_max_poc"])  # pic_order_cnt_lsb
    if pps["redundant_pic_cnt_present"]:
        br.ue()
    if nal_type == 5:
        br.u(1)  # no_output_of_prior_pics
        br.u(1)  # long_term_reference_flag
    qp = pps["pic_init_qp"] + br.se()
    idc, a_off, b_off = 0, 0, 0
    if pps["deblocking_control"]:
        idc = br.ue()
        if idc > 2:
            raise ValueError(f"invalid disable_deblocking_filter_idc {idc}")
        if idc != 1:
            a_off = br.se() * 2  # slice_alpha_c0_offset_div2
            b_off = br.se() * 2  # slice_beta_offset_div2
    return sps, pps, {
        "first_mb": first_mb,
        "qp": qp,
        "deblock": (idc, a_off, b_off),
    }


def decode_h264_frame(data: bytes):
    """Decode the first IDR picture of an Annex-B byte stream:
    -> (width, height, y_plane, u_plane, v_plane) with planes as
    row-major lists of lists (YUV 4:2:0, cropped). Monochrome
    (4:0:0) streams return u = v = None; High-10/14 streams return
    full-precision samples (0..(1<<bit_depth)-1)."""
    sps_map: dict[int, dict] = {}
    pps_map: dict[int, dict] = {}
    frame = None
    slice_idx = 0
    slice_deblock: list[tuple[int, int, int]] = []
    for nal in split_nals(data):
        if not nal:
            continue
        nal_type = nal[0] & 0x1F
        rbsp = rbsp_unescape(nal[1:])
        if nal_type == 7:
            sps = parse_sps(rbsp)
            sps_map[sps["id"]] = sps
        elif nal_type == 8:
            # rule-B scaling fallback needs the referenced SPS
            _sps_id_peek = None
            _br = BitReader(rbsp)
            _br.ue()  # pps_id
            _sps_id_peek = _br.ue()
            pps = parse_pps(rbsp, sps_map.get(_sps_id_peek))
            pps_map[pps["id"]] = pps
        elif nal_type in (1, 5):
            br = BitReader(rbsp)
            sps, pps, header = _parse_slice_header(
                br, nal_type, sps_map, pps_map
            )
            if frame is None:
                frame = _Frame(sps, pps)
            slice_deblock.append(header["deblock"])
            if pps["entropy"]:
                from openset_spark.pipeline.h264_cabac import (
                    decode_slice_cabac,
                )

                end = decode_slice_cabac(br, frame, slice_idx, header)
            else:
                end = _decode_slice(br, frame, slice_idx, header)
            slice_idx += 1
            if end >= frame.mb_w * frame.mb_h:
                break
    if frame is None:
        raise ValueError("no decodable H.264 slice found")
    # in-loop deblocking runs over the FULL decoded picture, before
    # cropping (8.7: a separate per-MB pass after reconstruction)
    deblock_frame(frame, slice_deblock)
    cl, cr, ct, cb = frame.sps["crop"]
    W, H = frame.mb_w * 16, frame.mb_h * 16
    w = W - 2 * (cl + cr)
    h = H - 2 * (ct + cb)
    y = [row[2 * cl : 2 * cl + w] for row in frame.y[2 * ct : 2 * ct + h]]
    if not frame.cf:
        return w, h, y, None, None
    u = [
        row[cl : cl + w // 2]
        for row in frame.u[ct : ct + (h + 1) // 2]
    ]
    v = [
        row[cl : cl + w // 2]
        for row in frame.v[ct : ct + (h + 1) // 2]
    ]
    return w, h, y, u, v


def h264_to_rgb(w, h, y, u, v, bd: int = 8) -> bytes:
    """BT.601 limited-range YUV 4:2:0 -> interleaved 8-bit RGB.
    ``u``/``v`` None (monochrome) renders the luma plane gray;
    ``bd`` > 8 right-shifts samples to 8-bit before the matrix."""
    sh = bd - 8
    out = bytearray(w * h * 3)
    for yy in range(h):
        yr = y[yy]
        ur = u[yy >> 1] if u is not None else None
        vr = v[yy >> 1] if v is not None else None
        base = yy * w * 3
        for xx in range(w):
            Y = (yr[xx] >> sh) - 16
            U = (ur[xx >> 1] >> sh) - 128 if ur is not None else 0
            V = (vr[xx >> 1] >> sh) - 128 if vr is not None else 0
            r = (298 * Y + 409 * V + 128) >> 8
            g = (298 * Y - 100 * U - 208 * V + 128) >> 8
            b = (298 * Y + 516 * U + 128) >> 8
            o = base + xx * 3
            out[o] = _clip(r)
            out[o + 1] = _clip(g)
            out[o + 2] = _clip(b)
    return bytes(out)


# ------------------------------------------------------------------
# High-profile 8x8 transform (8.3.2 intra prediction, 8.5.13
# scaling + transform, 7.3.5.3.2 CAVLC interleave)
# ------------------------------------------------------------------
_ZZ8 = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# Table 8-40-style per-class weights (flat scaling lists): the six
# distinct LevelScale8x8 values per qp%6
_V8 = [
    [20, 18, 32, 19, 25, 24],
    [22, 19, 35, 21, 28, 26],
    [26, 23, 42, 24, 33, 31],
    [28, 25, 45, 26, 35, 33],
    [32, 28, 51, 30, 40, 38],
    [36, 32, 58, 34, 46, 43],
]


def _level_scale8(m: int, i: int, j: int) -> int:
    if i % 4 == 0 and j % 4 == 0:
        idx = 0
    elif i % 2 == 1 and j % 2 == 1:
        idx = 1
    elif i % 4 == 2 and j % 4 == 2:
        idx = 2
    elif (i % 4 == 0 and j % 2 == 1) or (i % 2 == 1 and j % 4 == 0):
        idx = 3
    elif (i % 4 == 0 and j % 4 == 2) or (i % 4 == 2 and j % 4 == 0):
        idx = 4
    else:
        idx = 5
    return _V8[m][idx]


def _dequant_8x8(coeffs: list[int], qp: int,
                 weights: list[int] | None = None) -> list[list[int]]:
    """64 scan-order levels -> dequantized 8x8 matrix (8.5.13.1).
    LevelScale8x8 = weightScale(i,j) * normAdjust8x8(m,i,j); with
    flat scaling lists weightScale is 16 (do NOT drop it — the
    public `(c*qmul + 32) >> 6` dequant form carries the same x16,
    and without it every 8x8 residual lands 16x too small). The
    shift pivot is qp 36, with the rounded downshift below it."""
    d = [[0] * 8 for _ in range(8)]
    m, sh = qp % 6, qp // 6
    for k, lvl in enumerate(coeffs):
        if lvl == 0:
            continue
        idx = _ZZ8[k]
        i, j = idx >> 3, idx & 7
        w = 16 if weights is None else weights[k]
        ls = w * _level_scale8(m, i, j)
        if qp >= 36:
            d[i][j] = (lvl * ls) << (sh - 6)
        else:
            d[i][j] = (lvl * ls + (1 << (5 - sh))) >> (6 - sh)
    return d


def _idct8_1d(f: list[int]) -> list[int]:
    """One 8-point pass of the 8.5.13.2 integer butterfly."""
    e0 = f[0] + f[4]
    e1 = -f[3] + f[5] - f[7] - (f[7] >> 1)
    e2 = f[0] - f[4]
    e3 = f[1] + f[7] - f[3] - (f[3] >> 1)
    e4 = (f[2] >> 1) - f[6]
    e5 = -f[1] + f[7] + f[5] + (f[5] >> 1)
    e6 = f[2] + (f[6] >> 1)
    e7 = f[3] + f[5] + f[1] + (f[1] >> 1)
    g0 = e0 + e6
    g1 = e1 + (e7 >> 2)
    g2 = e2 + e4
    g3 = e3 + (e5 >> 2)
    g4 = e2 - e4
    g5 = (e3 >> 2) - e5
    g6 = e0 - e6
    g7 = e7 - (e1 >> 2)
    return [
        g0 + g7, g2 + g5, g4 + g3, g6 + g1,
        g6 - g1, g4 - g3, g2 - g5, g0 - g7,
    ]


def inverse_8x8(d: list[list[int]]) -> list[list[int]]:
    """8.5.13.2: rows, then columns, then (x + 32) >> 6."""
    rows = [_idct8_1d(d[i]) for i in range(8)]
    out = [[0] * 8 for _ in range(8)]
    for j in range(8):
        col = _idct8_1d([rows[i][j] for i in range(8)])
        for i in range(8):
            out[i][j] = (col[i] + 32) >> 6
    return out


def _filter_ref_8x8(A, L, X, a_ok, l_ok, x_ok):
    """8.3.2.2.1 reference-sample low-pass. A: 16 above samples
    (above-right already padded), L: 8 left, X: corner. Returns
    filtered copies (unavailable sides returned untouched)."""
    fA, fL, fX = list(A), list(L), X
    if a_ok:
        first = (
            (X + 2 * A[0] + A[1] + 2) >> 2
            if x_ok
            else (3 * A[0] + A[1] + 2) >> 2
        )
        fA = [first] + [
            (A[x - 1] + 2 * A[x] + A[x + 1] + 2) >> 2 for x in range(1, 15)
        ] + [(A[14] + 3 * A[15] + 2) >> 2]
    if x_ok:
        if a_ok and l_ok:
            fX = (A[0] + 2 * X + L[0] + 2) >> 2
        elif a_ok:
            fX = (3 * X + A[0] + 2) >> 2
        elif l_ok:
            fX = (3 * X + L[0] + 2) >> 2
    if l_ok:
        first = (
            (X + 2 * L[0] + L[1] + 2) >> 2
            if x_ok
            else (3 * L[0] + L[1] + 2) >> 2
        )
        fL = [first] + [
            (L[y - 1] + 2 * L[y] + L[y + 1] + 2) >> 2 for y in range(1, 7)
        ] + [(L[6] + 3 * L[7] + 2) >> 2]
    return fA, fL, fX


def predict_8x8(mode, A, L, X, a_ok, l_ok, bd=8):
    """9 intra 8x8 modes over FILTERED references (the 4x4 formulas
    at N=8). A: 16 filtered above(+right) samples, L: 8 filtered
    left, X: filtered corner."""
    p = [[0] * 8 for _ in range(8)]
    if mode == 0:  # vertical
        if not a_ok:
            raise ValueError("intra8x8 vertical without above")
        for y in range(8):
            for x in range(8):
                p[y][x] = A[x]
    elif mode == 1:  # horizontal
        if not l_ok:
            raise ValueError("intra8x8 horizontal without left")
        for y in range(8):
            for x in range(8):
                p[y][x] = L[y]
    elif mode == 2:  # DC
        if a_ok and l_ok:
            dc = (sum(A[:8]) + sum(L) + 8) >> 4
        elif a_ok:
            dc = (sum(A[:8]) + 4) >> 3
        elif l_ok:
            dc = (sum(L) + 4) >> 3
        else:
            dc = 1 << (bd - 1)
        for y in range(8):
            for x in range(8):
                p[y][x] = dc
    elif mode == 3:  # diagonal down-left
        for y in range(8):
            for x in range(8):
                if x == 7 and y == 7:
                    p[y][x] = (A[14] + 3 * A[15] + 2) >> 2
                else:
                    k = x + y
                    p[y][x] = (A[k] + 2 * A[k + 1] + A[k + 2] + 2) >> 2
    elif mode == 4:  # diagonal down-right
        for y in range(8):
            for x in range(8):
                if x > y:
                    k = x - y - 2
                    a0 = A[k] if k >= 0 else X
                    a1 = A[k + 1] if k + 1 >= 0 else X
                    p[y][x] = (a0 + 2 * a1 + A[k + 2] + 2) >> 2
                elif x < y:
                    k = y - x - 2
                    l0 = L[k] if k >= 0 else X
                    l1 = L[k + 1] if k + 1 >= 0 else X
                    p[y][x] = (l0 + 2 * l1 + L[k + 2] + 2) >> 2
                else:
                    p[y][x] = (A[0] + 2 * X + L[0] + 2) >> 2
    elif mode == 5:  # vertical-right
        for y in range(8):
            for x in range(8):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    k = x - (y >> 1) - 1
                    a0 = A[k] if k >= 0 else X
                    p[y][x] = (a0 + A[k + 1] + 1) >> 1
                elif z >= 0:
                    k = x - (y >> 1) - 2
                    a0 = A[k] if k >= 0 else X
                    a1 = A[k + 1] if k + 1 >= 0 else X
                    p[y][x] = (a0 + 2 * a1 + A[k + 2] + 2) >> 2
                elif z == -1:
                    p[y][x] = (L[0] + 2 * X + A[0] + 2) >> 2
                else:
                    k = y - 2 * x
                    l2 = L[k - 3] if k >= 3 else X
                    p[y][x] = (L[k - 1] + 2 * L[k - 2] + l2 + 2) >> 2
    elif mode == 6:  # horizontal-down
        for y in range(8):
            for x in range(8):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    k = y - (x >> 1) - 1
                    l0 = L[k] if k >= 0 else X
                    p[y][x] = (l0 + L[k + 1] + 1) >> 1
                elif z >= 0:
                    k = y - (x >> 1) - 2
                    l0 = L[k] if k >= 0 else X
                    l1 = L[k + 1] if k + 1 >= 0 else X
                    p[y][x] = (l0 + 2 * l1 + L[k + 2] + 2) >> 2
                elif z == -1:
                    p[y][x] = (A[0] + 2 * X + L[0] + 2) >> 2
                else:
                    k = x - 2 * y
                    a2 = A[k - 3] if k >= 3 else X
                    p[y][x] = (A[k - 1] + 2 * A[k - 2] + a2 + 2) >> 2
    elif mode == 7:  # vertical-left
        for y in range(8):
            for x in range(8):
                k = x + (y >> 1)
                if y % 2 == 0:
                    p[y][x] = (A[k] + A[k + 1] + 1) >> 1
                else:
                    p[y][x] = (A[k] + 2 * A[k + 1] + A[k + 2] + 2) >> 2
    elif mode == 8:  # horizontal-up
        for y in range(8):
            for x in range(8):
                z = x + 2 * y
                if z < 13 and z % 2 == 0:
                    k = y + (x >> 1)
                    p[y][x] = (L[k] + L[k + 1] + 1) >> 1
                elif z < 13:
                    k = y + (x >> 1)
                    p[y][x] = (L[k] + 2 * L[k + 1] + L[k + 2] + 2) >> 2
                elif z == 13:
                    p[y][x] = (L[6] + 3 * L[7] + 2) >> 2
                else:
                    p[y][x] = L[7]
    else:
        raise ValueError(f"invalid intra8x8 mode {mode}")
    return p


def _neighbors_8x8(frame, b8x, b8y, cur_slice):
    """Raw (A16, L8, X, a_ok, l_ok, x_ok) references for the 8x8 luma
    block at 8x8-grid coords (b8x, b8y) — decoded-flag above-right
    availability at 4x4 granularity, pad-with-A[7] substitution."""
    bx, by = b8x * 2, b8y * 2  # top-left 4x4 cell
    x0, y0 = b8x * 8, b8y * 8
    a_ok = by > 0 and frame.mb_avail(*frame.blk_mb(bx, by - 1), cur_slice)
    l_ok = bx > 0 and frame.mb_avail(*frame.blk_mb(bx - 1, by), cur_slice)
    x_ok = (
        a_ok
        and l_ok
        and frame.mb_avail(*frame.blk_mb(bx - 1, by - 1), cur_slice)
    )
    A = [0] * 16
    L = [0] * 8
    X = frame.mid
    if a_ok:
        A[:8] = frame.y[y0 - 1][x0:x0 + 8]
        ar_ok = (
            bx + 2 < frame.mb_w * 4
            and frame.mb_avail(*frame.blk_mb(bx + 2, by - 1), cur_slice)
            and frame.decoded4[by - 1][bx + 2]
            and frame.decoded4[by - 1][bx + 3]
        )
        if ar_ok:
            A[8:] = frame.y[y0 - 1][x0 + 8:x0 + 16]
        else:
            A[8:] = [A[7]] * 8
    if l_ok:
        L = [frame.y[y0 + i][x0 - 1] for i in range(8)]
    if x_ok:
        X = frame.y[y0 - 1][x0 - 1]
    elif a_ok:
        X = A[0]
    elif l_ok:
        X = L[0]
    return A, L, X, a_ok, l_ok, x_ok


def _recon_i8x8_luma(frame, mbx, mby, modes, blocks, qp, cur_slice):
    """Reconstruct the 4 luma 8x8 blocks of an I_NxN/8x8 macroblock
    from parsed modes + 64-length scan-order levels (shared by the
    CAVLC and CABAC front-ends)."""
    frame.mb_t8[mby][mbx] = True
    w8 = frame.pps.get("w8")
    w8y = w8[0] if w8 else None  # intra luma 8x8 scaling list
    for b8 in range(4):
        b8x = mbx * 2 + (b8 & 1)
        b8y = mby * 2 + (b8 >> 1)
        A, L, X, a_ok, l_ok, x_ok = _neighbors_8x8(
            frame, b8x, b8y, cur_slice
        )
        fA, fL, fX = _filter_ref_8x8(A, L, X, a_ok, l_ok, x_ok)
        pred = predict_8x8(modes[b8], fA, fL, fX, a_ok, l_ok,
                           bd=frame.bd)
        res = inverse_8x8(
            _dequant_8x8(blocks[b8], qp + frame.qp_off, weights=w8y)
        )
        x0, y0 = b8x * 8, b8y * 8
        for yy in range(8):
            for xx in range(8):
                frame.y[y0 + yy][x0 + xx] = _clip3(
                    0, frame.maxv, pred[yy][xx] + res[yy][xx]
                )
        for cy in range(2):
            for cx in range(2):
                frame.decoded4[b8y * 2 + cy][b8x * 2 + cx] = True


def _pred_mode_8x8(frame, b8x, b8y, cur_slice):
    """predIntra8x8PredMode (8.3.2.1): min of the neighboring blocks'
    intra NxN modes (8x8 MBs record their mode in every covered 4x4
    cell, so the 4x4 lookup covers both block sizes)."""
    bx, by = b8x * 2, b8y * 2
    return _pred_mode_4x4(frame, bx, by, cur_slice)


def _decode_i8x8_cavlc(br, frame, mbx, mby, qp, cur_slice):
    """I_NxN with transform_size_8x8_flag=1, CAVLC entropy: 4 8x8
    prediction modes, then each coded 8x8 parsed as FOUR interleaved
    4x4 CAVLC blocks (level8x8[4*i + k] = level4x4[k][i] — 8.5.8's
    de-interleave), nnz tracked per 4x4 cell for nC contexts."""
    frame.is_i4[mby][mbx] = True  # I_NxN for mb_type ctx purposes
    modes = []
    for b8 in range(4):
        b8x = mbx * 2 + (b8 & 1)
        b8y = mby * 2 + (b8 >> 1)
        pred = _pred_mode_8x8(frame, b8x, b8y, cur_slice)
        if br.u(1):
            mode = pred
        else:
            rem = br.u(3)
            mode = rem if rem < pred else rem + 1
        modes.append(mode)
        for cy in range(2):
            for cx in range(2):
                frame.mode4[b8y * 2 + cy][b8x * 2 + cx] = mode
    chroma_mode = br.ue() if frame.cf else 0
    cbp_luma, cbp_chroma, qp = _parse_cbp_qp(br, frame, qp, False)
    frame.mb_qp[mby][mbx] = qp

    blocks = []
    for b8 in range(4):
        levels = [0] * 64
        if cbp_luma & (1 << b8):
            for k in range(4):
                blk = b8 * 4 + k
                dx, dy = _BLK_XY[blk]
                bx, by = mbx * 4 + dx, mby * 4 + dy
                nc = frame.luma_nC(bx, by, cur_slice)
                sub, tc = decode_residual_block(br, nc, 16)
                frame.nnz_y[by][bx] = tc
                for i in range(16):
                    levels[4 * i + k] = sub[i]
        else:
            for k in range(4):
                dx, dy = _BLK_XY[b8 * 4 + k]
                frame.nnz_y[mby * 4 + dy][mbx * 4 + dx] = 0
        blocks.append(levels)
    chroma_res = _parse_chroma_residual(
        br, frame, mbx, mby, cbp_chroma, cur_slice
    ) if frame.cf else None
    _recon_i8x8_luma(frame, mbx, mby, modes, blocks, qp, cur_slice)
    if frame.cf:
        _recon_chroma(frame, mbx, mby, chroma_mode, chroma_res, qp,
                      cur_slice)
    return qp
