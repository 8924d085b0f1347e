"""Arithmetic-coded JPEG entropy decoding (ITU T.81 Annexes D & F —
the QM-coder with the sequential-DCT DC/AC statistical models,
i.e. SOF9 streams).

Layout (all public-spec structures):
- ``QE_TABLE``: Table D.3 — the 113-state probability estimation
  machine (Qe value, next-MPS index, next-LPS index, MPS switch) plus
  the extra non-adapting ~0.5 state used for AC sign decisions.
- ``ArithDecoder``: the QM decoder. Registers follow D.2: A is the
  16-bit interval (renormalized into [0x8000, 0x10000)), C holds the
  offset of the code stream inside the interval with the top 16 bits
  (Chigh) on A's scale. The byte stream uses JPEG's 0x00 byte
  stuffing after 0xFF; hitting a real marker switches to feeding
  zero bytes (legal mid-stream in arithmetic JPEG — D.2.6 note).
- DC model (F.2.4.1): per-component conditioning on the previous
  diff's classification (zero / small+- / large+- via the L/U
  conditioning bounds), bins {S0, SS, SP, SN} + X-escalation chain
  at offset 20 + magnitude bits at +14. 64 bins per table.
- AC model (F.2.4.2): per-K bins {SE end-of-block, S0 significant,
  SP/X1} at 3*(k-1), sign on the FIXED state, X-escalation chains at
  189 (k <= Kx) / 217 (k > Kx), magnitude bits at +14. 256 bins.

The matching encoder lives in tests/test_jpeg_arith.py (the repo's
codec convention: exact round-trips against an in-test encoder that
shares only these CONSTANT tables). As with the VP8 probability
tables, a transcription slip in Table D.3 would affect conformance
with foreign encoders but never the round-trip tests — the
structural decode logic is what the tests pin.
"""

from __future__ import annotations

# Table D.3: (Qe, NMPS, NLPS, SWITCH). Index 113 is the appended
# non-adapting state (Qe ~ 0.5, transitions to itself) used for AC
# coefficient signs.
QE_TABLE: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    # appended fixed state for AC signs: never adapts
    (0x5A1D, 113, 113, 0),
)

FIXED_BIN = 113 << 1  # state word: index 113, MPS = 0


class ArithDecoder:
    """QM decoder over a JPEG entropy-coded segment.

    Context bins are single ints: (state_index << 1) | MPS, stored in
    caller-owned lists so the statistical models can slice/reset them
    (restart markers reset every bin to state 0 / MPS 0).
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.marker_seen = False
        # INITDEC: interval starts at full scale 0x10000 (D.2.7);
        # Chigh (bits 16..31) gets the first two data bytes; the next
        # byte STAGES at bits 8..15 and shifts into Chigh over the
        # following 8 renormalizations — one byte per 8 shifts, or
        # zeros would leak in between code bits
        self.a = 0x10000
        self.c = (self._byte() << 24) | (self._byte() << 16)
        self.c |= self._byte() << 8
        self.ct = 8

    def _byte(self) -> int:
        """Next data byte: 0xFF00 destuffing; a real marker stops the
        stream and feeds zeros (D.2.6 note — legal in arithmetic
        scans, the models simply stop asking once the MCUs are done).
        """
        if self.marker_seen:
            return 0
        d = self.data
        if self.pos >= len(d):
            self.marker_seen = True
            return 0
        b = d[self.pos]
        self.pos += 1
        if b != 0xFF:
            return b
        while self.pos < len(d) and d[self.pos] == 0xFF:
            self.pos += 1  # FF fill bytes
        nxt = d[self.pos] if self.pos < len(d) else 0xD9
        if nxt == 0:
            self.pos += 1  # stuffed zero: datum is 0xFF
            return 0xFF
        # real marker: rewind to the 0xFF so the caller can find it
        self.pos -= 1
        self.marker_seen = True
        return 0

    def decode(self, bins: list[int], idx: int) -> int:
        """One binary decision against context bin ``bins[idx]``."""
        st = bins[idx]
        i = st >> 1
        mps = st & 1
        qe, nmps, nlps, switch = QE_TABLE[i]
        a = self.a - qe
        if (self.c >> 16) < a:
            if a & 0x8000:
                self.a = a
                return mps
            # MPS path needing renormalization: conditional exchange
            if a < qe:
                d = 1 - mps
                bins[idx] = (nlps << 1) | (mps ^ switch)
            else:
                d = mps
                bins[idx] = (nmps << 1) | mps
        else:
            self.c -= a << 16
            # LPS path: conditional exchange
            if a < qe:
                d = mps
                bins[idx] = (nmps << 1) | mps
            else:
                d = 1 - mps
                bins[idx] = (nlps << 1) | (mps ^ switch)
            a = qe
        # RENORMD: feed a fresh byte into the bit-8..15 staging area
        # each time the previous one has fully shifted into Chigh
        while a < 0x8000:
            a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self.c |= self._byte() << 8
                self.ct = 8
        self.a = a
        return d

    def decode_fixed(self) -> int:
        """Non-adapting ~0.5 decision (AC coefficient signs)."""
        bins = [FIXED_BIN]
        return self.decode(bins, 0)

    def find_marker(self) -> int:
        """Skip to the next marker after the scan (for restarts)."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and d[p + 1] != 0 and d[p + 1] != 0xFF:
                return p
            p += 1
        return len(d)


def _new_dc_stats() -> list[int]:
    return [0] * 64


def _new_ac_stats() -> list[int]:
    return [0] * 256


def decode_dc_diff(
    dec: ArithDecoder, stats: list[int], ctx: int, cond_l: int, cond_u: int
) -> tuple[int, int]:
    """Decode one DC difference (F.2.4.1). Returns (diff, new_ctx)
    where ``ctx`` indexes the {zero, small+, small-, large+, large-}
    conditioning group (0 / 4 / 8 / 12 / 16)."""
    base = ctx
    if dec.decode(stats, base) == 0:
        return 0, 0
    sign = dec.decode(stats, base + 1)
    st = base + 2 + sign
    m = dec.decode(stats, st)
    if m != 0:
        st = 20  # X1
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG: DC magnitude overflow")
            st += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < (1 << cond_l) >> 1:
        new_ctx = 0
    elif m > (1 << cond_u) >> 1:
        new_ctx = 12 + sign * 4
    else:
        new_ctx = 4 + sign * 4
    v = m
    st += 14
    mm = m
    while mm := mm >> 1:
        if dec.decode(stats, st):
            v |= mm
    v += 1
    return (-v if sign else v), new_ctx


def decode_ac_coefs(
    dec: ArithDecoder, stats: list[int], block, kx: int
) -> None:
    """Decode the 63 AC coefficients of one block into ``block``
    (zig-zag order, index 1..63) per F.2.4.2."""
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > 63:
                raise ValueError("arithmetic JPEG: AC index overflow")
        sign = dec.decode_fixed()
        st += 2
        m = dec.decode(stats, st)
        if m != 0:
            if dec.decode(stats, st):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic JPEG: AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        mm = m
        while mm := mm >> 1:
            if dec.decode(stats, st):
                v |= mm
        v += 1
        block[k] = -v if sign else v
        k += 1


# ---------------------------------------------------------------
# Progressive models (T.81 G.1.3 / SOF10 scans)
# ---------------------------------------------------------------
def decode_ac_first(
    dec: ArithDecoder, stats: list[int], block, ss: int, se: int,
    al: int, kx: int
) -> None:
    """AC first scan (Ah=0): the sequential AC model restricted to
    the Ss..Se band, decoded values point-transformed up by Al.
    Arithmetic scans have per-block EOB decisions — no Huffman-style
    EOB runs."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic JPEG: AC band overflow")
        sign = dec.decode_fixed()
        st += 2
        m = dec.decode(stats, st)
        if m != 0:
            if dec.decode(stats, st):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic JPEG: AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        mm = m
        while mm := mm >> 1:
            if dec.decode(stats, st):
                v |= mm
        v += 1
        block[k] = (-v if sign else v) << al
        k += 1


def decode_dc_refine(dec: ArithDecoder, block, al: int) -> None:
    """DC refinement: one fixed-probability correction bit (G.1.3.1)."""
    if dec.decode_fixed():
        block[0] = int(block[0]) | (1 << al)


def decode_ac_refine(
    dec: ArithDecoder, stats: list[int], block, ss: int, se: int, al: int
) -> None:
    """AC refinement scan (G.1.3.3): EOB decisions only beyond the
    previous stage's last nonzero index; per-coefficient correction
    bits for already-nonzero entries, newly-significant values get a
    fixed-probability sign."""
    p1 = 1 << al
    m1 = -p1
    kex = 0
    for kk in range(se, 0, -1):
        if block[kk]:
            kex = kk
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, st):
                return  # EOB
        while True:
            if block[k]:
                if dec.decode(stats, st + 2):
                    block[k] += m1 if block[k] < 0 else p1
                break
            if dec.decode(stats, st + 1):
                block[k] = m1 if dec.decode_fixed() else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic JPEG: AC refine overflow")
        k += 1
