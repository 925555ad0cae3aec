"""REAL lossy VP8 key-frame codec (round 13) — RFC 6386, pure
Python/numpy, no codec library.

Most .webp in the wild is LOSSY (VP8), not VP8L — this was the largest
image-decode boundary item left after round 12. The decode path is the
full key-frame pipeline: boolean arithmetic decoder (RFC section 7),
frame/segmentation/filter/quantizer headers (section 9), keyframe
intra-mode parsing with the tree-coded contexts (section 11),
token/coefficient decode over the four block types with band and
nonzero contexts (section 13), per-segment dequantization (14.1),
the 4x4 integer IDCT + Walsh-Hadamard for Y2 (14.2-14.3), all intra
prediction modes (B_PRED's ten 4x4 modes included, section 12), and
the normal + simple in-loop deblocking filters (section 15).

Constant tables (default/update coefficient probabilities, keyframe
B-mode probabilities, quantizer lookups) are normative public-spec
values; this container has no RFC text, so they are derived from
libwebp's .rodata by signature (tools/derive_vp8_tables.py — the same
clean-room method that pinned the VP8L distance table and the T.4/T.6
fax tables) and validated BEHAVIORALLY: the crosscheck suite decodes
libwebp-encoded images and compares Y/U/V planes sample-exact against
WebPDecodeYUV (tests/test_codec_crosscheck.py).

``encode_vp8_gray_flat`` is the minimal write twin (keyframe, single
segment, loop filter level 0, one token partition, all-DC_PRED with a
Y2-carried DC residual) used by the driver row's closed-form oracle —
libwebp reads its output bit-exact.

Reference parity note: the reference repo handles no media; this is
the training-data-pipeline surface (SURVEY.md LLM-ops section).
"""

from __future__ import annotations

import numpy as np

from routing_algorithm_for_graph_dbs_spark.operators.vp8_tables import (
    AC_QLOOKUP,
    COEFF_BANDS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
    ZIGZAG4,
)

# ---------------------------------------------------------------------------
# boolean coder (RFC 6386 sections 7/8)


class BoolDecoder:
    """RFC 6386 section 7 boolean decoder, byte-at-a-time renormalize."""

    __slots__ = ("d", "pos", "rng", "val", "bitcnt", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data)
        self.pos = 2
        self.rng = 255
        self.val = (data[0] << 8 | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0
        )
        self.bitcnt = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.val >= big:
            ret = 1
            self.rng -= split
            self.val -= big
        else:
            ret = 0
            self.rng = split
        while self.rng < 128:
            self.val <<= 1
            self.rng <<= 1
            self.bitcnt += 1
            if self.bitcnt == 8:
                self.bitcnt = 0
                if self.pos < self.n:
                    self.val |= self.d[self.pos]
                    self.pos += 1
        return ret

    def flag(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: list[int], probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 section 8 boolean encoder — the write twin."""

    def __init__(self) -> None:
        self.low = 0
        self.rng = 255
        self.bitcnt = 24
        self.out = bytearray()

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            if self.low & (1 << 31):  # carry
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                if i < 0:
                    # A carry off the front of the buffer would corrupt
                    # the stream silently (r13 ADVICE). Unreachable for
                    # streams this encoder mints (the first emitted byte
                    # is never 0xFF-saturated), so fail loudly rather
                    # than emit garbage.
                    raise AssertionError(
                        "BoolEncoder carry ran off the buffer front"
                    )
                self.out[i] += 1
            self.low = (self.low << 1) & 0xFFFFFFFF
            self.bitcnt -= 1
            if self.bitcnt == 0:
                self.out.append((self.low >> 24) & 0xFF)
                self.low &= 0xFFFFFF
                self.bitcnt = 8
        # keep low bounded
        self.low &= 0xFFFFFFFF

    def put_flag(self, bit: int) -> None:
        self.put(128, bit)

    def put_literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def finish(self) -> bytes:
        for _ in range(32):
            self.put_flag(0)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# trees (RFC 6386 sections 11.2/11.5; probabilities for the keyframe
# mode trees are spec constants)

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
KF_YMODE_PROBS = [145, 156, 163, 128]
UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_MODE_PROBS = [142, 114, 183]
BMODE_TREE = [
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
]
# the implied subblock mode of a 16x16-mode neighbor (for B-mode ctx)
_IMPLIED_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# RFC B-mode order (this module) -> libwebp B-mode order (the
# extracted KF_BMODE_PROBS table's index space): libwebp enumerates
# {DC, TM, VE, HE, RD, VR, LD, VL, HD, HU} where the RFC has
# {DC, TM, VE, HE, LD, RD, VR, VL, HD, HU}
_LW = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]

# token-category extra-bit probabilities (RFC 13.2, spec constants)
_CAT3456 = (
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
)


def _clip127(v: int) -> int:
    return 0 if v < 0 else 127 if v > 127 else v


class _Headers:
    """Parsed first-partition state."""

    __slots__ = (
        "w", "h", "mb_w", "mb_h", "segmentation", "seg_abs", "seg_quant",
        "seg_lf", "seg_tree_probs", "update_map", "filter_type",
        "filter_level", "sharpness", "lf_delta_enabled", "ref_lf_delta",
        "mode_lf_delta", "q_index", "y_dc_delta", "y2_dc_delta",
        "y2_ac_delta", "uv_dc_delta", "uv_ac_delta", "coeff_probs",
        "use_skip", "skip_prob", "partitions",
    )


def _parse_headers(bd: BoolDecoder, data: bytes, part0_end: int,
                   w: int, h: int) -> _Headers:
    hd = _Headers()
    hd.w, hd.h = w, h
    hd.mb_w, hd.mb_h = (w + 15) // 16, (h + 15) // 16
    bd.get(128)  # color_space (keyframe)
    bd.get(128)  # clamping_type
    hd.segmentation = bd.flag()
    hd.seg_quant = [0, 0, 0, 0]
    hd.seg_lf = [0, 0, 0, 0]
    hd.seg_abs = 0
    hd.seg_tree_probs = [255, 255, 255]
    hd.update_map = 0
    if hd.segmentation:
        hd.update_map = bd.flag()
        update_data = bd.flag()
        if update_data:
            hd.seg_abs = bd.flag()
            for i in range(4):
                if bd.flag():
                    hd.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.flag():
                    hd.seg_lf[i] = bd.signed_literal(6)
        if hd.update_map:
            for i in range(3):
                if bd.flag():
                    hd.seg_tree_probs[i] = bd.literal(8)
    hd.filter_type = bd.flag()  # 1 = simple
    hd.filter_level = bd.literal(6)
    hd.sharpness = bd.literal(3)
    hd.lf_delta_enabled = bd.flag()
    hd.ref_lf_delta = [0, 0, 0, 0]
    hd.mode_lf_delta = [0, 0, 0, 0]
    if hd.lf_delta_enabled and bd.flag():  # mode_ref_lf_delta_update
        for i in range(4):
            if bd.flag():
                hd.ref_lf_delta[i] = bd.signed_literal(6)
        for i in range(4):
            if bd.flag():
                hd.mode_lf_delta[i] = bd.signed_literal(6)
    n_parts = 1 << bd.literal(2)
    # token partition sizes: (n_parts - 1) 3-byte LE sizes right after
    # partition 0; the last partition runs to EOF
    sizes_at = part0_end
    part_start = sizes_at + 3 * (n_parts - 1)
    hd.partitions = []
    pos = part_start
    for i in range(n_parts - 1):
        o = sizes_at + 3 * i
        sz = data[o] | (data[o + 1] << 8) | (data[o + 2] << 16)
        hd.partitions.append(data[pos : pos + sz])
        pos += sz
    hd.partitions.append(data[pos:])
    hd.q_index = bd.literal(7)
    hd.y_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    hd.y2_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    hd.y2_ac_delta = bd.signed_literal(4) if bd.flag() else 0
    hd.uv_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    hd.uv_ac_delta = bd.signed_literal(4) if bd.flag() else 0
    bd.flag()  # refresh_entropy_probs (ignored for a single keyframe)
    # coefficient probability updates
    probs = list(COEFF_PROBS)
    for i in range(1056):
        if bd.get(COEFF_UPDATE_PROBS[i]):
            probs[i] = bd.literal(8)
    hd.coeff_probs = probs
    hd.use_skip = bd.flag()
    hd.skip_prob = bd.literal(8) if hd.use_skip else 0
    return hd


def _dequant_factors(hd: _Headers):
    """Per-segment [y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac]
    (RFC 14.1; fixed-point 155/100 identical to the spec rational over
    the table range)."""
    out = []
    for s in range(4):
        if hd.segmentation:
            q = hd.seg_quant[s] if hd.seg_abs else hd.q_index + hd.seg_quant[s]
        else:
            q = hd.q_index
        q = _clip127(q)
        y1_dc = DC_QLOOKUP[_clip127(q + hd.y_dc_delta)]
        y1_ac = AC_QLOOKUP[q]
        y2_dc = DC_QLOOKUP[_clip127(q + hd.y2_dc_delta)] * 2
        y2_ac = (AC_QLOOKUP[_clip127(q + hd.y2_ac_delta)] * 101581) >> 16
        if y2_ac < 8:
            y2_ac = 8
        uv_dc = DC_QLOOKUP[_clip127(q + hd.uv_dc_delta)]
        if uv_dc > 132:
            uv_dc = 132
        uv_ac = AC_QLOOKUP[_clip127(q + hd.uv_ac_delta)]
        out.append((y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac))
    return out


# ---------------------------------------------------------------------------
# coefficient decode (RFC section 13)


def _get_coeffs(bd: BoolDecoder, probs: list[int], type_: int, ctx: int,
                dq_dc: int, dq_ac: int, first: int, out: np.ndarray) -> int:
    """Token-decode one 4x4 block into ``out`` (natural order,
    dequantized). Returns the index AFTER the last nonzero coeff (0 if
    the block is empty) — the value the nonzero context wants."""
    base = type_ * 264
    n = first
    p = base + COEFF_BANDS[n] * 33 + ctx * 11
    last_nz = 0
    while n < 16:
        if not bd.get(probs[p + 0]):
            return last_nz  # EOB
        # run of zeros: after a zero token the next token has no EOB
        while not bd.get(probs[p + 1]):
            n += 1
            if n == 16:
                return last_nz
            p = base + COEFF_BANDS[n] * 33  # ctx 0
        if not bd.get(probs[p + 2]):
            v = 1
            nctx = 1
        else:
            nctx = 2
            if not bd.get(probs[p + 3]):
                if not bd.get(probs[p + 4]):
                    v = 2
                else:
                    v = 3 + bd.get(probs[p + 5])
            elif not bd.get(probs[p + 6]):
                if not bd.get(probs[p + 7]):
                    v = 5 + bd.get(159)
                else:
                    v = 7 + 2 * bd.get(165) + bd.get(145)
            else:
                bit1 = bd.get(probs[p + 8])
                bit0 = bd.get(probs[p + 9 + bit1])
                cat = 2 * bit1 + bit0
                v = 0
                for cp in _CAT3456[cat]:
                    v += v + bd.get(cp)
                v += 3 + (8 << cat)
        if bd.flag():  # sign (prob 128 — raw bit)
            v = -v
        out[ZIGZAG4[n]] = v * (dq_dc if n == 0 else dq_ac)
        last_nz = n + 1
        n += 1
        if n == 16:
            return last_nz
        p = base + COEFF_BANDS[n] * 33 + nctx * 11
    return last_nz


# ---------------------------------------------------------------------------
# transforms (RFC sections 14.2/14.3)


def _iwht4x4(inp: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block."""
    ip = inp.astype(np.int64).reshape(4, 4)
    a = ip[0] + ip[3]
    b = ip[1] + ip[2]
    c = ip[1] - ip[2]
    d = ip[0] - ip[3]
    t = np.vstack((a + b, c + d, a - b, d - c))
    a = t[:, 0] + t[:, 3]
    b = t[:, 1] + t[:, 2]
    c = t[:, 1] - t[:, 2]
    d = t[:, 0] - t[:, 3]
    out = np.stack(
        ((a + b + 3) >> 3, (c + d + 3) >> 3, (a - b + 3) >> 3,
         (d - c + 3) >> 3),
        axis=1,
    )
    return out


def _idct4x4(blk: np.ndarray) -> np.ndarray:
    """VP8 4x4 inverse DCT (fixed-point 20091/35468 per RFC 14.3)."""
    ip = blk.astype(np.int64).reshape(4, 4)

    def mul1(v):  # (v * 20091) >> 16 + v  == v * cospi8sqrt2 >> 16
        return v + ((v * 20091) >> 16)

    def mul2(v):  # (v * 35468) >> 16 == v * sinpi8sqrt2 >> 16
        return (v * 35468) >> 16

    # vertical pass (columns)
    a1 = ip[0] + ip[2]
    b1 = ip[0] - ip[2]
    c1 = mul2(ip[1]) - mul1(ip[3])
    d1 = mul1(ip[1]) + mul2(ip[3])
    t = np.vstack((a1 + d1, b1 + c1, b1 - c1, a1 - d1))
    # horizontal pass (rows)
    a1 = t[:, 0] + t[:, 2]
    b1 = t[:, 0] - t[:, 2]
    c1 = mul2(t[:, 1]) - mul1(t[:, 3])
    d1 = mul1(t[:, 1]) + mul2(t[:, 3])
    out = np.stack(
        ((a1 + d1 + 4) >> 3, (b1 + c1 + 4) >> 3, (b1 - c1 + 4) >> 3,
         (a1 - d1 + 4) >> 3),
        axis=1,
    )
    return out

# ---------------------------------------------------------------------------
# intra prediction (RFC section 12) — operates on the bordered planes


def _clip255(a):
    return np.clip(a, 0, 255)


def _pred16(buf: np.ndarray, y: int, x: int, mode: int, size: int,
            have_above: bool, have_left: bool) -> np.ndarray:
    """16x16 / 8x8 whole-block prediction into a fresh int array.
    ``buf`` is the bordered plane; (y, x) the block's top-left in it."""
    above = buf[y - 1, x : x + size].astype(np.int64)
    left = buf[y : y + size, x - 1].astype(np.int64)
    tl = int(buf[y - 1, x - 1])
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif have_above:
            dc = (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int64)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM_PRED
    return _clip255(left[:, None] + above[None, :] - tl)


def _pred_b(A: np.ndarray, L: np.ndarray, P: int, mode: int) -> np.ndarray:
    """One 4x4 B_PRED subblock (RFC 12.3). ``A`` has 8 entries (above +
    above-right), ``L`` 4 (left), ``P`` the top-left pixel."""
    o = np.zeros((4, 4), np.int64)
    if mode == B_DC:
        dc = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
        o[:] = dc
    elif mode == B_TM:
        o[:] = _clip255(L[:, None] + A[None, :4] - P)
    elif mode == B_VE:
        e = np.array(
            [(P + 2 * A[0] + A[1] + 2) >> 2,
             (A[0] + 2 * A[1] + A[2] + 2) >> 2,
             (A[1] + 2 * A[2] + A[3] + 2) >> 2,
             (A[2] + 2 * A[3] + A[4] + 2) >> 2])
        o[:] = e[None, :]
    elif mode == B_HE:
        e = np.array(
            [(P + 2 * L[0] + L[1] + 2) >> 2,
             (L[0] + 2 * L[1] + L[2] + 2) >> 2,
             (L[1] + 2 * L[2] + L[3] + 2) >> 2,
             (L[2] + 2 * L[3] + L[3] + 2) >> 2])
        o[:] = e[:, None]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    o[r, c] = (A[i] + 2 * A[i + 1] + A[i + 2] + 2) >> 2
                else:
                    o[r, c] = (A[6] + 3 * A[7] + 2) >> 2
    elif mode == B_RD:
        e = [
            (L[3] + 2 * L[2] + L[1] + 2) >> 2,
            (L[2] + 2 * L[1] + L[0] + 2) >> 2,
            (L[1] + 2 * L[0] + P + 2) >> 2,
            (L[0] + 2 * P + A[0] + 2) >> 2,
            (P + 2 * A[0] + A[1] + 2) >> 2,
            (A[0] + 2 * A[1] + A[2] + 2) >> 2,
            (A[1] + 2 * A[2] + A[3] + 2) >> 2,
        ]
        for r in range(4):
            for c in range(4):
                o[r, c] = e[c - r + 3]
    elif mode == B_VR:
        o[0, 0] = o[2, 1] = (P + A[0] + 1) >> 1
        o[0, 1] = o[2, 2] = (A[0] + A[1] + 1) >> 1
        o[0, 2] = o[2, 3] = (A[1] + A[2] + 1) >> 1
        o[0, 3] = (A[2] + A[3] + 1) >> 1
        o[1, 0] = o[3, 1] = (L[0] + 2 * P + A[0] + 2) >> 2
        o[1, 1] = o[3, 2] = (P + 2 * A[0] + A[1] + 2) >> 2
        o[1, 2] = o[3, 3] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        o[1, 3] = (A[1] + 2 * A[2] + A[3] + 2) >> 2
        o[2, 0] = (P + 2 * L[0] + L[1] + 2) >> 2
        o[3, 0] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
    elif mode == B_VL:
        o[0, 0] = (A[0] + A[1] + 1) >> 1
        o[0, 1] = o[2, 0] = (A[1] + A[2] + 1) >> 1
        o[0, 2] = o[2, 1] = (A[2] + A[3] + 1) >> 1
        o[0, 3] = o[2, 2] = (A[3] + A[4] + 1) >> 1
        o[1, 0] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        o[1, 1] = o[3, 0] = (A[1] + 2 * A[2] + A[3] + 2) >> 2
        o[1, 2] = o[3, 1] = (A[2] + 2 * A[3] + A[4] + 2) >> 2
        o[1, 3] = o[3, 2] = (A[3] + 2 * A[4] + A[5] + 2) >> 2
        o[2, 3] = (A[4] + 2 * A[5] + A[6] + 2) >> 2
        o[3, 3] = (A[5] + 2 * A[6] + A[7] + 2) >> 2
    elif mode == B_HD:
        o[0, 0] = o[1, 2] = (P + L[0] + 1) >> 1
        o[0, 1] = o[1, 3] = (L[0] + 2 * P + A[0] + 2) >> 2
        o[0, 2] = (P + 2 * A[0] + A[1] + 2) >> 2
        o[0, 3] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        o[1, 0] = o[2, 2] = (L[0] + L[1] + 1) >> 1
        o[1, 1] = o[2, 3] = (P + 2 * L[0] + L[1] + 2) >> 2
        o[2, 0] = o[3, 2] = (L[1] + L[2] + 1) >> 1
        o[2, 1] = o[3, 3] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
        o[3, 0] = (L[2] + L[3] + 1) >> 1
        o[3, 1] = (L[1] + 2 * L[2] + L[3] + 2) >> 2
    elif mode == B_HU:
        o[0, 0] = (L[0] + L[1] + 1) >> 1
        o[0, 1] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
        o[0, 2] = o[1, 0] = (L[1] + L[2] + 1) >> 1
        o[0, 3] = o[1, 1] = (L[1] + 2 * L[2] + L[3] + 2) >> 2
        o[1, 2] = o[2, 0] = (L[2] + L[3] + 1) >> 1
        o[1, 3] = o[2, 1] = (L[2] + 2 * L[3] + L[3] + 2) >> 2
        o[2, 2] = o[2, 3] = o[3, 0] = o[3, 1] = o[3, 2] = o[3, 3] = L[3]
    else:
        raise ValueError(f"bad B_PRED mode {mode}")
    return o


# ---------------------------------------------------------------------------
# key-frame decode


def decode_vp8_keyframe(data: bytes, _debug: dict | None = None):
    """Decode a VP8 key frame -> (Y, U, V) uint8 planes cropped to the
    frame size (Y is (h, w); U/V are ((h+1)//2, (w+1)//2))."""
    if len(data) < 10:
        raise ValueError("VP8 payload truncated")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 interframes need reference buffers — only key frames "
            "appear in still WebP"
        )
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    if w < 1 or h < 1:
        raise ValueError("bad VP8 frame dimensions")
    if w * h > 100_000_000:
        raise ValueError(f"VP8 frame {w}x{h} exceeds the 100MP cap")
    part0_end = 10 + part0_size
    bd = BoolDecoder(data[10:part0_end])
    hd = _parse_headers(bd, data, part0_end, w, h)
    dq = _dequant_factors(hd)
    mb_w, mb_h = hd.mb_w, hd.mb_h

    # --- pass 1: intra modes for every MB (partition 0, raster order)
    seg_ids = np.zeros((mb_h, mb_w), np.int32)
    skips = np.zeros((mb_h, mb_w), np.int32)
    ymodes = np.zeros((mb_h, mb_w), np.int32)
    uvmodes = np.zeros((mb_h, mb_w), np.int32)
    bmodes = np.zeros((mb_h, mb_w, 4, 4), np.int32)  # per 4x4 subblock
    above_sub = np.full((mb_w, 4), B_DC, np.int32)  # bottom row submodes
    seg_tree = [2, 4, -0, -1, -2, -3]
    for my in range(mb_h):
        left_sub = np.full(4, B_DC, np.int32)
        for mx in range(mb_w):
            if hd.segmentation and hd.update_map:
                seg_ids[my, mx] = bd.tree(seg_tree, hd.seg_tree_probs)
            if hd.use_skip:
                skips[my, mx] = bd.get(hd.skip_prob)
            ym = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                for r in range(4):
                    for c in range(4):
                        a = above_sub[mx, c] if r == 0 else bmodes[my, mx, r - 1, c]
                        lft = left_sub[r] if c == 0 else bmodes[my, mx, r, c - 1]
                        # the extracted table indexes [above][left] in
                        # LIBWEBP's B-mode numbering, which swaps
                        # RD/VR/LD relative to this module's RFC-order
                        # constants — remap both context values
                        row = (_LW[int(a)] * 10 + _LW[int(lft)]) * 9
                        probs = KF_BMODE_PROBS[row : row + 9]
                        bmodes[my, mx, r, c] = bd.tree(BMODE_TREE, probs)
                above_sub[mx] = bmodes[my, mx, 3]
                left_sub = bmodes[my, mx, :, 3].copy()
            else:
                imp = _IMPLIED_B[ym]
                bmodes[my, mx] = imp
                above_sub[mx] = imp
                left_sub[:] = imp
            uvmodes[my, mx] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

    # --- pass 2: residuals + reconstruction
    W16, H16 = mb_w * 16, mb_h * 16
    W8, H8 = mb_w * 8, mb_h * 8
    # bordered planes: row 0 = above border (127), col 0 = left border
    # (129), +4 right extension on Y for above-right reads (filled per
    # MB row with the replicate-last rule)
    ybuf = np.empty((H16 + 1, W16 + 1 + 4), np.uint8)
    ubuf = np.empty((H8 + 1, W8 + 1), np.uint8)
    vbuf = np.empty((H8 + 1, W8 + 1), np.uint8)
    for buf in (ybuf, ubuf, vbuf):
        buf[0, :] = 127
        buf[1:, 0] = 129
    token_bds = [BoolDecoder(p) for p in hd.partitions]
    n_parts = len(token_bds)

    # nonzero contexts (per 4x4 block column / row)
    above_y2 = np.zeros(mb_w, np.int32)
    above_y = np.zeros((mb_w, 4), np.int32)
    above_u = np.zeros((mb_w, 2), np.int32)
    above_v = np.zeros((mb_w, 2), np.int32)
    # per-MB "has any coefficient" for the loop filter's inner-edge rule
    mb_has_coeffs = np.zeros((mb_h, mb_w), bool)

    probs = hd.coeff_probs
    for my in range(mb_h):
        tbd = token_bds[my % n_parts]
        left_y2 = 0
        left_y = np.zeros(4, np.int32)
        left_u = np.zeros(2, np.int32)
        left_v = np.zeros(2, np.int32)
        for mx in range(mb_w):
            seg = int(seg_ids[my, mx])
            y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac = dq[seg]
            ym = int(ymodes[my, mx])
            has_y2 = ym != B_PRED
            ycoef = np.zeros((4, 4, 16), np.int64)
            ucoef = np.zeros((2, 2, 16), np.int64)
            vcoef = np.zeros((2, 2, 16), np.int64)
            yany = np.zeros((4, 4), bool)   # needs an IDCT pass
            uany = np.zeros((2, 2), bool)
            vany = np.zeros((2, 2), bool)
            if skips[my, mx]:
                left_y[:] = 0
                above_y[mx, :] = 0
                left_u[:] = 0
                above_u[mx, :] = 0
                left_v[:] = 0
                above_v[mx, :] = 0
                if has_y2:
                    # a skipped Y2 macroblock clears the Y2 context;
                    # B_PRED macroblocks never touch it (no Y2 block)
                    left_y2 = 0
                    above_y2[mx] = 0
            else:
                if has_y2:
                    y2 = np.zeros(16, np.int64)
                    nz2 = _get_coeffs(
                        tbd, probs, 1, int(above_y2[mx] + left_y2),
                        y2_dc, y2_ac, 0, y2,
                    )
                    above_y2[mx] = left_y2 = int(nz2 > 0)
                    if nz2 > 0:
                        mb_has_coeffs[my, mx] = True
                    dcs = _iwht4x4(y2)
                    ycoef[:, :, 0] = dcs
                    yany |= dcs != 0
                    first, ytype = 1, 0
                else:
                    first, ytype = 0, 3
                # luma 4x4 blocks, raster order
                ynzf = np.zeros((4, 4), np.int32)  # token-nz flags
                for r in range(4):
                    for c in range(4):
                        actx = above_y[mx, c] if r == 0 else ynzf[r - 1, c]
                        lctx = left_y[r] if c == 0 else ynzf[r, c - 1]
                        nz = _get_coeffs(
                            tbd, probs, ytype, int(actx + lctx),
                            y1_dc, y1_ac, first, ycoef[r, c],
                        )
                        f = int(nz > first)
                        ynzf[r, c] = f
                        if f:
                            yany[r, c] = True
                            mb_has_coeffs[my, mx] = True
                above_y[mx, :] = ynzf[3]
                left_y[:] = ynzf[:, 3]
                # chroma 2x2 blocks per plane
                for plane, coef, anyf, above_c, left_c in (
                    (0, ucoef, uany, above_u, left_u),
                    (1, vcoef, vany, above_v, left_v),
                ):
                    nzf = np.zeros((2, 2), np.int32)
                    for r in range(2):
                        for c in range(2):
                            actx = above_c[mx, c] if r == 0 else nzf[r - 1, c]
                            lctx = left_c[r] if c == 0 else nzf[r, c - 1]
                            nz = _get_coeffs(
                                tbd, probs, 2, int(actx + lctx),
                                uv_dc, uv_ac, 0, coef[r, c],
                            )
                            f = int(nz > 0)
                            nzf[r, c] = f
                            if f:
                                anyf[r, c] = True
                                mb_has_coeffs[my, mx] = True
                    above_c[mx, :] = nzf[1]
                    left_c[:] = nzf[:, 1]

            if _debug is not None:
                _debug.setdefault("coefs", {})[(my, mx)] = (
                    ycoef.copy(), yany.copy(), ucoef.copy(), vcoef.copy())

            # --- reconstruct this MB
            y0, x0 = 1 + my * 16, 1 + mx * 16
            have_a, have_l = my > 0, mx > 0
            if ym == B_PRED:
                # fill the above-right extension for this MB
                if mx == mb_w - 1:
                    ybuf[y0 - 1, x0 + 16 : x0 + 20] = ybuf[y0 - 1, x0 + 15]
                for r in range(4):
                    for c in range(4):
                        py, px = y0 + 4 * r, x0 + 4 * c
                        if c < 3:
                            A = ybuf[py - 1, px : px + 8].astype(np.int64)
                        else:
                            A = np.concatenate((
                                ybuf[py - 1, px : px + 4],
                                ybuf[y0 - 1, x0 + 16 : x0 + 20],
                            )).astype(np.int64)
                        L = ybuf[py : py + 4, px - 1].astype(np.int64)
                        P = int(ybuf[py - 1, px - 1])
                        pred = _pred_b(A, L, P, int(bmodes[my, mx, r, c]))
                        if yany[r, c]:
                            pred = pred + _idct4x4(ycoef[r, c])
                        ybuf[py : py + 4, px : px + 4] = _clip255(pred)
            else:
                pred = _pred16(ybuf, y0, x0, ym, 16, have_a, have_l)
                for r in range(4):
                    for c in range(4):
                        if yany[r, c]:
                            pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += (
                                _idct4x4(ycoef[r, c])
                            )
                ybuf[y0 : y0 + 16, x0 : x0 + 16] = _clip255(pred)
            u0, v0x = 1 + my * 8, 1 + mx * 8
            uvm = int(uvmodes[my, mx])
            for buf, coef, anyf in ((ubuf, ucoef, uany), (vbuf, vcoef, vany)):
                pred = _pred16(buf, u0, v0x, uvm, 8, have_a, have_l)
                for r in range(2):
                    for c in range(2):
                        if anyf[r, c]:
                            pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += (
                                _idct4x4(coef[r, c])
                            )
                buf[u0 : u0 + 8, v0x : v0x + 8] = _clip255(pred)

    if _debug is not None:
        _debug.update(
            hd=hd, seg_ids=seg_ids, skips=skips, ymodes=ymodes,
            uvmodes=uvmodes, bmodes=bmodes, mb_has_coeffs=mb_has_coeffs,
            ybuf_prefilter=ybuf.copy(), ubuf_prefilter=ubuf.copy(),
            vbuf_prefilter=vbuf.copy(),
        )

    # --- in-loop deblocking (RFC section 15)
    if hd.filter_level > 0:
        _loop_filter(hd, seg_ids, ymodes, mb_has_coeffs, ybuf, ubuf, vbuf)

    y_plane = ybuf[1 : h + 1, 1 : w + 1].copy()
    uw, uh = (w + 1) // 2, (h + 1) // 2
    u_plane = ubuf[1 : uh + 1, 1 : uw + 1].copy()
    v_plane = vbuf[1 : uh + 1, 1 : uw + 1].copy()
    return y_plane, u_plane, v_plane


# ---------------------------------------------------------------------------
# loop filter (RFC section 15)


def _s(v):
    """uint8 -> signed (value - 128) domain used by the filters."""
    return v.astype(np.int64) - 128


def _u(v):
    return np.clip(v + 128, 0, 255).astype(np.uint8)


def _c128(v):
    return np.clip(v, -128, 127)


def _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, ilim, elim):
    return (
        (np.abs(p3 - p2) <= ilim) & (np.abs(p2 - p1) <= ilim)
        & (np.abs(p1 - p0) <= ilim) & (np.abs(q1 - q0) <= ilim)
        & (np.abs(q2 - q1) <= ilim) & (np.abs(q3 - q2) <= ilim)
        & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= elim)
    )


def _hev_mask(p1, p0, q0, q1, thresh):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _common_adjust(use_outer, p1, p0, q0, q1, mask):
    """RFC 15.3 common_adjust over vectors; mutates p0/q0 in place and
    returns the filter value F."""
    a = _c128((_c128(p1 - q1) if use_outer is True else use_outer * _c128(p1 - q1)) + 3 * (q0 - p0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    q0 -= np.where(mask, f1, 0)
    p0 += np.where(mask, f2, 0)
    return np.where(mask, f1, 0)


def _subblock_filter(px, ilim, elim, hev_t, get, put):
    """Apply the normal subblock filter along one edge. ``get(i)``
    returns the pixel vector at offset i from the edge (negative =
    p-side), ``put(i, v)`` stores it back."""
    p3, p2, p1, p0 = get(-4), get(-3), get(-2), get(-1)
    q0, q1, q2, q3 = get(0), get(1), get(2), get(3)
    mask = _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, ilim, elim)
    hev = _hev_mask(p1, p0, q0, q1, hev_t)
    sp1, sp0, sq0, sq1 = _s(p1), _s(p0), _s(q0), _s(q1)
    # outer taps included only under hev; then the extra inner tap
    a = _c128(np.where(hev, _c128(sp1 - sq1), 0) + 3 * (sq0 - sp0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    sq0 = sq0 - np.where(mask, f1, 0)
    sp0 = sp0 + np.where(mask, f2, 0)
    flt = np.where(mask & ~hev, (f1 + 1) >> 1, 0)
    sq1 = sq1 - flt
    sp1 = sp1 + flt
    put(-2, _u(sp1))
    put(-1, _u(sp0))
    put(0, _u(sq0))
    put(1, _u(sq1))


def _mbedge_filter(px, ilim, elim, hev_t, get, put):
    """Apply the normal macroblock-edge filter along one edge."""
    p3, p2, p1, p0 = get(-4), get(-3), get(-2), get(-1)
    q0, q1, q2, q3 = get(0), get(1), get(2), get(3)
    mask = _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, ilim, elim)
    hev = _hev_mask(p1, p0, q0, q1, hev_t)
    sp2, sp1, sp0 = _s(p2), _s(p1), _s(p0)
    sq0, sq1, sq2 = _s(q0), _s(q1), _s(q2)
    # hev pixels: common_adjust with outer taps, no extra spreading
    a_h = _c128(_c128(sp1 - sq1) + 3 * (sq0 - sp0))
    f1 = _c128(a_h + 4) >> 3
    f2 = _c128(a_h + 3) >> 3
    mh = mask & hev
    sq0 = sq0 - np.where(mh, f1, 0)
    sp0 = sp0 + np.where(mh, f2, 0)
    # non-hev pixels: the wide 3-tap adjustment
    w = _c128(_c128(sp1 - sq1) + 3 * (sq0 - sp0))
    mn = mask & ~hev
    a = _c128((27 * w + 63) >> 7)
    sq0 = sq0 - np.where(mn, a, 0)
    sp0 = sp0 + np.where(mn, a, 0)
    a = _c128((18 * w + 63) >> 7)
    sq1 = sq1 - np.where(mn, a, 0)
    sp1 = sp1 + np.where(mn, a, 0)
    a = _c128((9 * w + 63) >> 7)
    sq2 = sq2 - np.where(mn, a, 0)
    sp2 = sp2 + np.where(mn, a, 0)
    put(-3, _u(sp2))
    put(-2, _u(sp1))
    put(-1, _u(sp0))
    put(0, _u(sq0))
    put(1, _u(sq1))
    put(2, _u(sq2))


def _simple_filter(buf, y0, x0, n, vertical, elim):
    get, put = _edge_access(buf, y0, x0, n, vertical)
    p1, p0, q0, q1 = get(-2), get(-1), get(0), get(1)
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= elim
    sp1, sp0, sq0, sq1 = _s(p1), _s(p0), _s(q0), _s(q1)
    a = _c128(_c128(sp1 - sq1) + 3 * (sq0 - sp0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    sq0 = sq0 - np.where(mask, f1, 0)
    sp0 = sp0 + np.where(mask, f2, 0)
    put(-1, _u(sp0))
    put(0, _u(sq0))


def _edge_access(buf, y0, x0, n, vertical):
    """Accessors for an n-pixel edge at (y0, x0): vertical=True means
    the edge runs vertically (filter across columns)."""
    if vertical:
        def get(i):
            return buf[y0 : y0 + n, x0 + i].astype(np.int64)

        def put(i, v):
            buf[y0 : y0 + n, x0 + i] = v
    else:
        def get(i):
            return buf[y0 + i, x0 : x0 + n].astype(np.int64)

        def put(i, v):
            buf[y0 + i, x0 : x0 + n] = v
    return get, put


def _loop_filter(hd, seg_ids, ymodes, mb_has_coeffs, ybuf, ubuf, vbuf):
    """RFC 6386 section 15: per-MB raster walk, left MB edge, inner
    vertical edges, top MB edge, inner horizontal edges; the current
    MB's limits apply to all of them. filter_type 1 = simple (Y only)."""
    mb_h, mb_w = seg_ids.shape
    for my in range(mb_h):
        for mx in range(mb_w):
            level = hd.filter_level
            if hd.segmentation:
                s = int(seg_ids[my, mx])
                level = hd.seg_lf[s] if hd.seg_abs else level + hd.seg_lf[s]
                level = max(0, min(63, level))
            if hd.lf_delta_enabled:
                level += hd.ref_lf_delta[0]  # keyframe: intra frame ref
                if int(ymodes[my, mx]) == B_PRED:
                    level += hd.mode_lf_delta[0]
                level = max(0, min(63, level))
            if level == 0:
                continue
            interior = level
            if hd.sharpness:
                interior >>= 2 if hd.sharpness > 4 else 1
                if interior > 9 - hd.sharpness:
                    interior = 9 - hd.sharpness
            if interior < 1:
                interior = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_lim = ((level + 2) * 2) + interior
            sub_lim = (level * 2) + interior
            inner = mb_has_coeffs[my, mx] or int(ymodes[my, mx]) == B_PRED
            y0, x0 = 1 + my * 16, 1 + mx * 16
            c0, cx = 1 + my * 8, 1 + mx * 8
            if hd.filter_type:  # simple: luma only
                if mx > 0:
                    _simple_filter(ybuf, y0, x0, 16, True, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _simple_filter(ybuf, y0, x0 + dx, 16, True, sub_lim)
                if my > 0:
                    _simple_filter(ybuf, y0, x0, 16, False, mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _simple_filter(ybuf, y0 + dy, x0, 16, False, sub_lim)
                continue
            if mx > 0:
                g, p = _edge_access(ybuf, y0, x0, 16, True)
                _mbedge_filter(None, interior, mb_lim, hev_t, g, p)
                for cbuf in (ubuf, vbuf):
                    g, p = _edge_access(cbuf, c0, cx, 8, True)
                    _mbedge_filter(None, interior, mb_lim, hev_t, g, p)
            if inner:
                for dx in (4, 8, 12):
                    g, p = _edge_access(ybuf, y0, x0 + dx, 16, True)
                    _subblock_filter(None, interior, sub_lim, hev_t, g, p)
                for cbuf in (ubuf, vbuf):
                    g, p = _edge_access(cbuf, c0, cx + 4, 8, True)
                    _subblock_filter(None, interior, sub_lim, hev_t, g, p)
            if my > 0:
                g, p = _edge_access(ybuf, y0, x0, 16, False)
                _mbedge_filter(None, interior, mb_lim, hev_t, g, p)
                for cbuf in (ubuf, vbuf):
                    g, p = _edge_access(cbuf, c0, cx, 8, False)
                    _mbedge_filter(None, interior, mb_lim, hev_t, g, p)
            if inner:
                for dy in (4, 8, 12):
                    g, p = _edge_access(ybuf, y0 + dy, x0, 16, False)
                    _subblock_filter(None, interior, sub_lim, hev_t, g, p)
                for cbuf in (ubuf, vbuf):
                    g, p = _edge_access(cbuf, c0 + 4, cx, 8, False)
                    _subblock_filter(None, interior, sub_lim, hev_t, g, p)


# ---------------------------------------------------------------------------
# minimal write twin: flat-gray key frame (driver-row golden source)


def _put_coeff_value(te: "BoolEncoder", probs, p: int, v: int) -> None:
    """Encode a nonzero coefficient magnitude ``v`` (1..2114) through
    the RFC 6386 13.2 token tree at prob base ``p`` — the write twin of
    the magnitude branch in :func:`_get_coeffs` (round 14: the flat
    encoder previously hardcoded the cat6 path, corrupting |level| <
    67, i.e. flat grays within 8 of 128)."""
    te.put(probs[p + 1], 1)  # not zero
    if v == 1:
        te.put(probs[p + 2], 0)
        return
    te.put(probs[p + 2], 1)
    if v <= 4:
        te.put(probs[p + 3], 0)
        if v == 2:
            te.put(probs[p + 4], 0)
        else:
            te.put(probs[p + 4], 1)
            te.put(probs[p + 5], v - 3)
        return
    te.put(probs[p + 3], 1)
    if v <= 10:
        te.put(probs[p + 6], 0)
        if v <= 6:
            te.put(probs[p + 7], 0)
            te.put(159, v - 5)
        else:
            te.put(probs[p + 7], 1)
            e = v - 7
            te.put(165, e >> 1)
            te.put(145, e & 1)
        return
    te.put(probs[p + 6], 1)
    for cat in range(4):
        base = 3 + (8 << cat)  # 11, 19, 35, 67
        hi = (3 + (8 << (cat + 1)) - 1) if cat < 3 else base + (1 << 11) - 1
        if v <= hi:
            bit1, bit0 = cat >> 1, cat & 1
            te.put(probs[p + 8], bit1)
            te.put(probs[p + 9 + bit1], bit0)
            extra = v - base
            cp = _CAT3456[cat]
            for i, c in enumerate(cp):
                te.put(c, (extra >> (len(cp) - 1 - i)) & 1)
            return
    raise ValueError(f"coefficient magnitude {v} exceeds cat6 range")


def encode_vp8_gray_flat(g: int, w: int, h: int) -> bytes:
    """Encode a flat gray (Y = g, chroma = 128) key frame: single
    segment, loop filter 0, one token partition, qindex 0, all-DC_PRED.
    The only residual is MB (0,0)'s Y2-carried DC (level 8*(g-128):
    with qindex 0 the dequant+IWHT+IDCT chain reconstructs EXACTLY g,
    see the derivation in the driver row's oracle), every other MB is
    a skip whose DC prediction propagates g. Standard-conformant:
    libwebp reads it bit-exact (crosschecked)."""
    if not 0 <= g <= 255 or not 1 <= w <= 0x3FFF or not 1 <= h <= 0x3FFF:
        raise ValueError("bad flat-frame parameters")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    c = g - 128

    be = BoolEncoder()
    be.put_flag(0)  # color_space
    be.put_flag(0)  # clamping_type
    be.put_flag(0)  # segmentation_enabled
    be.put_flag(0)  # filter_type
    be.put_literal(0, 6)  # filter_level
    be.put_literal(0, 3)  # sharpness
    be.put_flag(0)  # lf_delta_enabled
    be.put_literal(0, 2)  # log2(token partitions) = 0 -> 1
    be.put_literal(0, 7)  # y_ac_qi = 0
    for _ in range(5):
        be.put_flag(0)  # quantizer deltas absent
    be.put_flag(1)  # refresh_entropy_probs
    for i in range(1056):
        be.put(COEFF_UPDATE_PROBS[i], 0)  # no coeff prob updates
    be.put_flag(1)  # mb_no_coeff_skip
    be.put_literal(128, 8)  # prob_skip_false
    for my in range(mb_h):
        for mx in range(mb_w):
            first = my == 0 and mx == 0
            be.put(128, 0 if (first and c != 0) else 1)  # skip flag
            # ymode DC_PRED via the kf tree: 1, 0, 0
            be.put(KF_YMODE_PROBS[0], 1)
            be.put(KF_YMODE_PROBS[1], 0)
            be.put(KF_YMODE_PROBS[2], 0)
            be.put(KF_UV_MODE_PROBS[0], 0)  # uv DC_PRED
    part0 = be.finish()

    te = BoolEncoder()
    if c != 0:
        lvl = 8 * c
        v = abs(lvl)
        # Y2 block (type 1, band 0, ctx 0): one DC token then EOB.
        # v = 8|c| spans 8..1016 — the full token tree, not just cat6
        # (r14 fix: grays within 8 of 128 land in the DCT_4/cat1/cat2
        # branches the old hardcoded cat6 path corrupted)
        p = 1 * 264 + 0 * 33 + 0 * 11
        te.put(COEFF_PROBS[p + 0], 1)  # not EOB
        _put_coeff_value(te, COEFF_PROBS, p, v)
        te.put(128, 1 if lvl < 0 else 0)  # sign
        # EOB at coeff 1 (band 1, nonzero-ctx 2 after a big value)
        p = 1 * 264 + COEFF_BANDS[1] * 33 + 2 * 11
        te.put(COEFF_PROBS[p + 0], 0)
        # 16 luma blocks (type 0, first coeff 1, all empty, ctx 0)
        p = 0 * 264 + COEFF_BANDS[1] * 33 + 0 * 11
        for _ in range(16):
            te.put(COEFF_PROBS[p + 0], 0)
        # 8 chroma blocks (type 2, coeff 0, ctx 0)
        p = 2 * 264 + 0 * 33 + 0 * 11
        for _ in range(8):
            te.put(COEFF_PROBS[p + 0], 0)
    part1 = te.finish()

    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    out = bytearray()
    out += bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    out += b"\x9d\x01\x2a"
    out += bytes([w & 0xFF, (w >> 8) & 0x3F])
    out += bytes([h & 0xFF, (h >> 8) & 0x3F])
    out += part0
    out += part1
    return bytes(out)


def build_webp_lossy_flat(g: int, w: int, h: int) -> bytes:
    """Wrap encode_vp8_gray_flat in a RIFF/WebP container."""
    vp8 = encode_vp8_gray_flat(g, w, h)
    chunk = b"VP8 " + len(vp8).to_bytes(4, "little") + vp8
    if len(vp8) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
