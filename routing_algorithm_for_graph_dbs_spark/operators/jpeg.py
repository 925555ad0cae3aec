"""Pure-Python/numpy baseline JPEG codec for the multimodal pipeline.

The multimodal boundary contract (``operators/multimodal.py``): formats we
can decode natively are decoded for REAL; everything else is a marked stub.
Round 7 moves baseline JPEG from the stub side to the real side — a
training-data pipeline meets JPEG before any other binary format, and the
luma statistics the pipeline derives (quality filters, near-dup pHash)
only need the Y channel.

``decode_jpeg``: sequential DCT (SOF0/1) AND progressive (SOF2, round 8:
spectral selection + successive approximation per T.81 Annex G), 8- and
12-bit, Huffman entropy coding, grayscale or YCbCr with any sampling factors
(4:4:4 / 4:2:0 / 4:2:2 ...), restart intervals. Sequential scans
entropy-decode EVERY component's coefficients (the MCU stream
interleaves them — skipping requires decoding), but only the Y component
is inverse-transformed; chroma upsampling never runs because the
returned statistic is Rec.601 luma and JPEG's Y channel IS that luma.
Progressive chroma AC scans are skipped outright (their entropy data is
self-delimiting). 12-bit precision decodes too (round 8: level shift
and sample range follow the frame precision; the returned plane rescales
to the uniform [0, 255] contract; ``encode_jpeg_gray12`` mints the
golden bytes). ARITHMETIC coding decodes too — both
SEQUENTIAL (SOF9) and PROGRESSIVE (SOF10) — via the round-12 T.81
Annex D QM-coder + Annex F/G conditioning, byte-exact against libjpeg
(see the arithmetic section below). LOSSLESS Huffman (SOF3) decodes
too — the round-13 T.81 Annex H DPCM path (all 7 predictors, point
transform, restart resets, mod-2^16 reconstruction, 2..16-bit), with
``encode_jpeg_gray_lossless`` as its write twin and hand-derived
Annex H byte goldens as the external truth (libjpeg .so.62 in this
container predates the lossless API). HIERARCHICAL mode (round 14, T.81
Annex J) decodes too: DHP/EXP pyramid walks with SOF0/1/3 initial and
SOF5/6/7 Huffman differential frames, ``encode_jpeg_gray_hierarchical``
as the write twin (the all-lossless pyramid round-trips exactly; no
external validator exists — libjpeg has never implemented hierarchical
mode). ARITHMETIC LOSSLESS (SOF11, round 14) decodes too — the H.1.2
conditioning over the validated QM coder, ``arith=True`` on the
lossless encoder as its twin, an independent from-scratch C decoder as
the crosscheck — and so do the ARITHMETIC frames inside hierarchical
streams (SOF9/11 initial, SOF13/14/15 differential; ``arith=True`` on
the hierarchical encoder). EVERY SOF the standard defines now decodes;
the only remaining ``NotImplementedError`` sites are structural
narrowings (progressive-INITIAL hierarchical frames, multi-component
hierarchical streams, non-8-bit hierarchical DCT) rather than codec
families.

``encode_jpeg_gray``: minimal single-component baseline encoder (Annex K
tables) — the write half used to generate REAL jpeg bytes for golden
tests (same discipline as ``encode_bmp``); any standard decoder can read
its output.

The IDCT is the exact orthonormal float transform (basis-matrix
multiplication, vectorized over all blocks at once) — mathematically
exact for the decoded coefficients, so round-trip error against known
pixels is bounded by quantization alone, which the golden tests assert.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 luminance quantization table (quality 50 base)
QUANT_LUMA_K1 = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Annex K.3: typical luminance DC/AC Huffman tables as (BITS, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis matrix T: coeff = T @ x @ T.T."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    t = np.cos((2 * n + 1) * k * np.pi / 16)
    t[0] *= np.sqrt(1 / 8)
    t[1:] *= np.sqrt(2 / 8)
    return t


_T = _dct_basis()


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """{(code_length, code): symbol} per T.81 Annex C code assignment."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_huffman_lengths(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code_length, code)} — encoder-side view of the same table."""
    return {v: k for k, v in _build_huffman(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # spec: pad with 1-bits at end of scan
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed literal FF
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker sits at a byte boundary; the MCU loop
                    # consumes it via expect_restart() — pad until then
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:  # EOI / next segment: stop feeding real bytes
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8
        # truncate to the live bits: consumed high bits would otherwise
        # accumulate forever (the int grows 8 bits per scan byte, making
        # every read_bit shift superlinear on DRI-less streams)
        self.bitbuf &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def align_and_expect_restart(self, n: int) -> None:
        """Drop to a byte boundary and consume the RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                if (d[self.pos + 1] & 7) != (n & 7):
                    raise ValueError("restart marker out of sequence")
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker, hit end of data")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_jpeg_plane(payload: bytes):
    """Shared decode core: (width, height, n_components, y_plane) with
    ``y_plane`` the float64 Y channel in [0, 255], cropped to the Y
    component's true size (subsampled chroma layouts give a Y plane at
    the Y component's resolution)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    dac_dc: dict[int, tuple] = {}
    dac_ac: dict[int, int] = {}
    frame = None
    progressive = False
    prog_state = None  # persistent Y coefficient grid across scans
    lossless_planes = None  # SOF3: comp id -> decoded uint16 plane
    restart_interval = 0
    pos = 2
    d = payload
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", d, pos + 2)[0]
        seg = d[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDE:
            # DHP — hierarchical stream (T.81 Annex J, round 14): its own
            # multi-frame walk (EXP expansion + differential frames)
            return _decode_jpeg_hierarchical(d)
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:  # 16-bit table
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                quant[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 Huffman sequential, SOF2 Huffman progressive,
            # SOF9/SOF10 ARITHMETIC sequential/progressive (round 12,
            # T.81 Annexes D/F/G)
            precision = seg[0]
            if precision not in (8, 12):
                raise NotImplementedError(
                    f"{precision}-bit JPEG not supported (8/12 only)"
                )
            h, w = struct.unpack_from(">HH", seg, 1)
            if w < 1 or h < 1:
                raise ValueError(f"bad JPEG frame dimensions {w}x{h}")
            if w * h > 100_000_000:
                # a crafted SOF claiming ~4Gpx would allocate a ~34 GB
                # coefficient grid before any entropy decode could fail
                raise ValueError(
                    f"JPEG frame {w}x{h} exceeds the 100MP cap"
                )
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 15) <= 4):
                    raise ValueError(
                        f"bad JPEG sampling factors 0x{hv:02X} for"
                        f" component {cid}"
                    )
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "prec": precision,
                     "arith": marker in (0xC9, 0xCA)}
            progressive = marker in (0xC2, 0xCA)
        elif marker in (0xC3, 0xCB):
            # SOF3 — LOSSLESS Huffman (T.81 Annex H, round 13) and
            # SOF11 — LOSSLESS ARITHMETIC (H.1.2, round 14): spatial
            # DPCM, no DCT/quantization; precision 2..16
            precision = seg[0]
            if not 2 <= precision <= 16:
                raise ValueError(
                    f"lossless JPEG precision {precision} out of [2, 16]"
                )
            h, w = struct.unpack_from(">HH", seg, 1)
            if w < 1 or h < 1:
                raise ValueError(f"bad JPEG frame dimensions {w}x{h}")
            if w * h > 100_000_000:
                raise ValueError(
                    f"JPEG frame {w}x{h} exceeds the 100MP cap"
                )
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 15) <= 4):
                    raise ValueError(
                        f"bad JPEG sampling factors 0x{hv:02X} for"
                        f" component {cid}"
                    )
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "prec": precision,
                     "arith": marker == 0xCB, "lossless": True}
            progressive = False
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            # differential frames (Huffman or arithmetic) are only legal
            # after DHP (B.2.1); the hierarchical walk above handles them
            raise ValueError(
                f"differential frame (SOF marker 0x{marker:02X}) outside a "
                "hierarchical (DHP) stream"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xCC:  # DAC — arithmetic conditioning (T.81 B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                tc_tb, val = seg[i], seg[i + 1]
                if tc_tb >> 4 == 0:
                    dac_dc[tc_tb & 15] = (val & 15, val >> 4)  # (L, U)
                else:
                    dac_ac[tc_tb & 15] = val  # Kx
                i += 2
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if frame.get("lossless"):
                # SOF3 scan: Ss = predictor selector, Al = point
                # transform; each non-interleaved scan is independent,
                # planes accumulate until EOI
                scan = []
                for c in range(ns):
                    cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                    comp = next(
                        (x for x in frame["comps"] if x["id"] == cs), None
                    )
                    if comp is None:
                        raise ValueError(
                            f"SOS references unknown component id {cs}"
                        )
                    scan.append((comp, tdta >> 4))
                sel = seg[1 + 2 * ns]
                pt = seg[3 + 2 * ns] & 15
                if lossless_planes is None:
                    lossless_planes = {}
                data_pos = pos + 2 + seg_len
                if frame.get("arith"):
                    end = _decode_scan_lossless_arith(
                        d, data_pos, frame, scan, sel, pt, dac_dc,
                        restart_interval, lossless_planes,
                    )
                else:
                    end = _decode_scan_lossless(
                        d, data_pos, frame, scan, sel, pt, huff_dc,
                        restart_interval, lossless_planes,
                    )
                pos = end
                continue
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"SOS references unknown component id {cs}"
                    )
                if comp["tq"] not in quant:
                    raise ValueError(
                        f"scan component {cs} references missing "
                        f"quantization table {comp['tq']}"
                    )
                scan.append((comp, tdta >> 4, tdta & 15))
            if frame.get("arith") and not progressive:
                return _decode_scan_arith(
                    d, pos + 2 + seg_len, frame, scan, quant, dac_dc,
                    dac_ac, restart_interval,
                )
            if frame.get("arith"):
                # SOF10: arithmetic progressive — same multi-scan grid
                # accumulation as the Huffman path, QM-coder entropy
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah_al = seg[3 + 2 * ns]
                if prog_state is None:
                    prog_state = _init_prog_state(frame)
                data_pos = pos + 2 + seg_len
                if any(c is frame["comps"][0] for c, _, _ in scan):
                    _decode_prog_scan_arith(
                        d, data_pos, frame, scan, ss, se, ah_al >> 4,
                        ah_al & 15, dac_dc, dac_ac, restart_interval,
                        prog_state,
                    )
                pos = _entropy_end(d, data_pos)
                continue
            if not progressive:
                return _decode_scan(
                    d, pos + 2 + seg_len, frame, scan, quant, huff_dc,
                    huff_ac, restart_interval,
                )
            # progressive (T.81 Annex G): many scans accumulate into one
            # coefficient grid; each scan's entropy data is self-delimiting
            # (ends at the next real marker), so scans that never touch the
            # Y component (chroma AC refinements) are skipped outright
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            if prog_state is None:
                prog_state = _init_prog_state(frame)
            data_pos = pos + 2 + seg_len
            if any(c is frame["comps"][0] for c, _, _ in scan):
                _decode_prog_scan(
                    d, data_pos, frame, scan, ss, se, ah_al >> 4, ah_al & 15,
                    huff_dc, huff_ac, restart_interval, prog_state,
                )
            pos = _entropy_end(d, data_pos)
            continue
        # APPn/COM/other: skip
        pos += 2 + seg_len
    if lossless_planes is not None:
        return _assemble_lossless(frame, lossless_planes)
    if prog_state is not None:
        return _assemble_y(frame, prog_state["zz"], quant)
    raise ValueError("no SOS segment found")


def _decode_scan(
    d: bytes,
    data_pos: int,
    frame: dict,
    scan: list,
    quant: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
    differential: bool = False,
) -> tuple:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # Y = the first scan component (grayscale: the only one)
    y_comp = scan[0][0]
    y_bw = mcus_x * y_comp["h"]  # Y blocks per row
    y_bh = mcus_y * y_comp["v"]
    y_coeffs = np.zeros((y_bh * y_bw, 64), dtype=np.float64)

    reader = _BitReader(d, data_pos)
    pred = {c["id"]: 0 for c, _, _ in scan}
    rst = 0
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.align_and_expect_restart(rst)
            rst = (rst + 1) & 7
            for c, _, _ in scan:
                pred[c["id"]] = 0
        my, mx = divmod(mcu, mcus_x)
        for comp, td, ta in scan:
            if td not in huff_dc or ta not in huff_ac:
                raise ValueError(
                    f"scan references missing Huffman table (DC {td} /"
                    f" AC {ta})"
                )
            dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    # -- DC
                    t = reader.decode_symbol(dc_tbl)
                    if t > 16:
                        raise ValueError(
                            f"DC magnitude category {t} out of range"
                        )
                    diff = _extend(reader.receive(t), t)
                    pred[comp["id"]] += diff
                    block = None
                    if comp is y_comp:
                        block = np.zeros(64, dtype=np.float64)
                        block[0] = pred[comp["id"]]
                    # -- AC
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overran block")
                        v = _extend(reader.receive(s), s)
                        if block is not None:
                            block[ZIGZAG[k]] = v
                        k += 1
                    if block is not None:
                        q = quant[comp["tq"]]
                        deq = np.zeros(64)
                        deq[ZIGZAG] = block[ZIGZAG] * q
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        y_coeffs[row * y_bw + col] = deq

    # vectorized exact IDCT over every Y block at once; level shift and
    # sample range follow the frame precision (12-bit: 2048 / 4095), and
    # the plane contract stays [0, 255] via an exact rescale
    prec = frame.get("prec", 8)
    level, maxval = float(1 << (prec - 1)), float((1 << prec) - 1)
    blocks = y_coeffs.reshape(-1, 8, 8)
    if differential:
        # hierarchical differential frame (T.81 Annex J): IDCT output IS
        # the signed difference image — no level shift, no sample clamp,
        # no [0, 255] rescale; the hierarchical walk adds it to the
        # reference and clamps there
        pix = np.einsum("ki,nkl,lj->nij", _T, blocks, _T)
    else:
        pix = np.einsum("ki,nkl,lj->nij", _T, blocks, _T) + level
        pix = np.clip(pix, 0.0, maxval) * (255.0 / maxval)
    plane = (
        pix.reshape(y_bh, y_bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(y_bh * 8, y_bw * 8)
    )
    # crop MCU padding to the true Y size (Y dims scale by h/hmax, v/vmax)
    y_w = -(-w * y_comp["h"] // hmax)
    y_h = -(-h * y_comp["v"] // vmax)
    return w, h, len(comps), plane[:y_h, :y_w]


# ---------------------------------------------------------------------------
# progressive mode (SOF2), T.81 Annex G — Huffman spectral selection +
# successive approximation. Scans accumulate quantized coefficients into a
# persistent per-block grid (zigzag index order); dequantization and the
# exact IDCT run once at EOI. Only the Y component's coefficients are
# stored — interleaved DC scans still entropy-decode every component in
# the scan (the bits interleave), AC scans are single-component by spec
# and non-Y ones never reach the decoder (their entropy data is
# self-delimiting).


def _entropy_end(d: bytes, pos: int) -> int:
    """Position of the next real marker after entropy-coded data: skips
    stuffed 0xFF00 pairs, restart markers, and 0xFF fill bytes."""
    n = len(d)
    while pos + 1 < n:
        if d[pos] != 0xFF:
            pos += 1
        elif d[pos + 1] == 0x00 or 0xD0 <= d[pos + 1] <= 0xD7:
            pos += 2
        elif d[pos + 1] == 0xFF:  # fill byte
            pos += 1
        else:
            return pos
    return n


def _init_prog_state(frame: dict) -> dict:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    y = comps[0]
    bw, bh = mcus_x * y["h"], mcus_y * y["v"]
    return {
        "zz": np.zeros((bh * bw, 64), dtype=np.int32),
        "bw": bw,
        "bh": bh,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "hmax": hmax,
        "vmax": vmax,
    }


def _comp_block_dims(frame: dict, comp: dict, state: dict) -> tuple[int, int]:
    """Block grid of a NON-interleaved scan (T.81 A.2.2): the component's
    true sample extent, not the MCU-padded grid."""
    cw = -(-frame["w"] * comp["h"] // state["hmax"])
    ch = -(-frame["h"] * comp["v"] // state["vmax"])
    return -(-cw // 8), -(-ch // 8)


def _decode_prog_scan(
    d: bytes,
    data_pos: int,
    frame: dict,
    scan: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
    state: dict,
) -> None:
    """Decode ONE progressive scan into the persistent coefficient grid
    (T.81 G.1.2; the control flow mirrors the spec's decision figures,
    independently implemented)."""
    zz = state["zz"]
    y_comp = frame["comps"][0]
    reader = _BitReader(d, data_pos)
    rst = 0
    eobrun = 0
    p1 = 1 << al
    m1 = -p1

    if ss == 0:  # ---- DC scan (first or refinement); may interleave comps
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        pred = {c["id"]: 0 for c, _, _ in scan}

        def dc_block(comp: dict, td: int, idx: int | None) -> None:
            if ah == 0:  # G.1.2.1: first scan — diff-coded, scaled by 2^Al
                if td not in huff_dc:
                    raise ValueError(f"missing Huffman DC table {td}")
                t = reader.decode_symbol(huff_dc[td])
                if t > 16:
                    raise ValueError(
                        f"DC magnitude category {t} out of range"
                    )
                pred[comp["id"]] += _extend(reader.receive(t), t)
                if idx is not None:
                    zz[idx, 0] = pred[comp["id"]] << al
            else:  # refinement — one appended bit per block
                if reader.read_bit() and idx is not None:
                    zz[idx, 0] |= p1

        interleaved = len(scan) > 1
        if interleaved:
            mcus_x = state["mcus_x"]
            n_units = mcus_x * state["mcus_y"]
        else:
            bw_n, bh_n = _comp_block_dims(frame, scan[0][0], state)
            n_units = bw_n * bh_n
        for unit in range(n_units):
            if restart_interval and unit and unit % restart_interval == 0:
                reader.align_and_expect_restart(rst)
                rst = (rst + 1) & 7
                for c, _, _ in scan:
                    pred[c["id"]] = 0
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for comp, td, _ta in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            idx = None
                            if comp is y_comp:
                                row = my * comp["v"] + by
                                col = mx * comp["h"] + bx
                                idx = row * state["bw"] + col
                            dc_block(comp, td, idx)
            else:
                comp, td, _ta = scan[0]
                by, bx = divmod(unit, bw_n)
                idx = by * state["bw"] + bx if comp is y_comp else None
                dc_block(comp, td, idx)
        return

    # ---- AC scan: single component by spec, only Y reaches here
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    comp, _td, ta = scan[0]
    if ta not in huff_ac:
        raise ValueError(f"missing Huffman AC table {ta}")
    ac_tbl = huff_ac[ta]
    bw_n, bh_n = _comp_block_dims(frame, comp, state)
    store_bw = state["bw"]
    for unit in range(bw_n * bh_n):
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align_and_expect_restart(rst)
            rst = (rst + 1) & 7
            eobrun = 0
        by, bx = divmod(unit, bw_n)
        blk = zz[by * store_bw + bx]
        if ah == 0:  # -- G.1.2.2: first scan of this band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rsym = reader.decode_symbol(ac_tbl)
                r, s = rsym >> 4, rsym & 15
                if s == 0:
                    if r == 15:  # ZRL: 16 zero coefficients
                        k += 16
                        continue
                    eobrun = (1 << r) - 1  # EOBn: this block + 2^r-1 more
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC index overran spectral band")
                blk[k] = _extend(reader.receive(s), s) << al
                k += 1
        else:  # -- G.1.2.3: refinement — one more magnitude bit per coeff
            k = ss
            if eobrun == 0:
                while k <= se:
                    rsym = reader.decode_symbol(ac_tbl)
                    r, s = rsym >> 4, rsym & 15
                    sval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # ZRL: skip 16 zero-history coefficients below
                    else:
                        if s != 1:
                            raise ValueError(
                                "refinement scan symbol with size != 1"
                            )
                        sval = p1 if reader.read_bit() else m1
                    # advance: correction bits ride along for every
                    # already-nonzero coefficient passed over; r counts
                    # only zero-history positions
                    while k <= se:
                        c = int(blk[k])
                        if c != 0:
                            if reader.read_bit() and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if sval:
                        if k > se:
                            raise ValueError(
                                "refinement overran spectral band"
                            )
                        blk[k] = sval
                    k += 1
            if eobrun > 0:
                # EOB region: correction bits still flow for the
                # already-nonzero coefficients in the rest of the band
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1


def _assemble_y(
    frame: dict, zz: np.ndarray, quant: dict, differential: bool = False
) -> tuple:
    """Dequantize + exact IDCT of the accumulated Y grid (progressive
    epilogue); same vectorized math as the baseline path.
    ``differential`` (SOF6, T.81 Annex J): the IDCT output is the signed
    difference image — skip level shift / clamp / rescale."""
    comps = frame["comps"]
    y_comp = comps[0]
    q = quant[y_comp["tq"]].astype(np.float64)
    deq = np.zeros((zz.shape[0], 64), dtype=np.float64)
    deq[:, ZIGZAG] = zz.astype(np.float64) * q  # q is zigzag-ordered (DQT)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    y_bw = mcus_x * y_comp["h"]
    y_bh = mcus_y * y_comp["v"]
    prec = frame.get("prec", 8)
    level, maxval = float(1 << (prec - 1)), float((1 << prec) - 1)
    blocks = deq.reshape(-1, 8, 8)
    if differential:
        pix = np.einsum("ki,nkl,lj->nij", _T, blocks, _T)
    else:
        pix = np.einsum("ki,nkl,lj->nij", _T, blocks, _T) + level
        pix = np.clip(pix, 0.0, maxval) * (255.0 / maxval)
    plane = (
        pix.reshape(y_bh, y_bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(y_bh * 8, y_bw * 8)
    )
    y_w = -(-frame["w"] * y_comp["h"] // hmax)
    y_h = -(-frame["h"] * y_comp["v"] // vmax)
    return frame["w"], frame["h"], len(comps), plane[:y_h, :y_w]


# ---------------------------------------------------------------------------
# LOSSLESS mode (SOF3), T.81 Annex H — spatial DPCM with 7 integer
# predictors, Huffman-coded difference categories 0..16 (SSSS 16 codes
# the difference 32768 with no appended bits, H.2 Table H.2), modulo
# 2^16 reconstruction (H.1.2.1), point transform = Al low-order bits
# dropped before prediction and re-appended on output (A.4.1).
# libjpeg in this container (.so.62) predates the lossless API, so the
# byte-stream truth is pinned by hand-derived Annex H goldens in
# tests/test_codec_crosscheck.py — the fax.py empirical precedent.


def _lossless_predict(plane: np.ndarray, x: int, y: int, sel: int,
                      default: int, line0: int) -> int:
    """Annex H.1.1 prediction for one sample. ``line0`` is the first
    line of the current restart interval (that line is predicted 1-D
    horizontally; later lines use ``sel``; first column uses Rb)."""
    if y == line0:
        return int(plane[y, x - 1])  # Ra (the interval's first sample
        # is handled by the caller with the default prediction)
    if x == 0:
        return int(plane[y - 1, x])  # Rb
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"lossless predictor {sel} out of [1, 7]")


def _read_lossless_diff(br: _BitReader, table: dict) -> int:
    """One DPCM difference: SSSS category then appended bits; SSSS=16
    means +32768 outright (T.81 H.2)."""
    s = br.decode_symbol(table)
    if s == 16:
        return 32768
    if s > 16:
        raise ValueError(f"lossless SSSS category {s} out of range")
    return _extend(br.receive(s), s) if s else 0


def _decode_scan_lossless(d, data_pos, frame, scan, sel, pt, huff_dc,
                          restart_interval, planes) -> int:
    """Decode ONE lossless scan (interleaved or single-component) into
    ``planes`` (comp id -> uint16 array, point-transformed domain);
    returns the stream offset just past the scan's entropy data.

    MCU walk per T.81 A.2: ns==1 -> one sample per MCU over the
    component's own grid; interleaved -> v x h samples per component
    per MCU over ceil-padded dimensions (padding columns/rows are
    decoded then cropped by _assemble_lossless)."""
    if sel == 0 and not frame.get("diff"):
        raise ValueError(
            "lossless predictor selector 0 is only valid in hierarchical"
            " differential frames (T.81 J.1.1.3)"
        )
    if not 0 <= sel <= 7:
        raise ValueError(f"lossless predictor selector {sel} out of [0, 7]")
    prec = frame["prec"]
    if pt >= prec:
        raise ValueError(f"point transform {pt} >= precision {prec}")
    default = 1 << (prec - pt - 1)
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    interleaved = len(scan) > 1
    st = []  # per scan-component decode state
    for comp, td in scan:
        if td not in huff_dc:
            raise ValueError(f"lossless scan references missing DC "
                             f"table {td}")
        cw = -(-frame["w"] * comp["h"] // hmax)
        ch = -(-frame["h"] * comp["v"] // vmax)
        if interleaved:
            # pad to whole MCUs; crop happens at assembly
            pw = comp["h"] * -(-cw // comp["h"])
            ph = comp["v"] * -(-ch // comp["v"])
        else:
            pw, ph = cw, ch
        plane = np.zeros((ph, pw), np.uint16)
        st.append({
            "comp": comp, "table": huff_dc[td], "plane": plane,
            "cw": cw, "ch": ch, "x": 0, "y": 0,
            "fresh": True, "line0": 0,
        })
    if interleaved:
        mcus_x = -(-frame["w"] // hmax)
        mcus_y = -(-frame["h"] // vmax)
        n_mcus = mcus_x * mcus_y
    else:
        n_mcus = st[0]["plane"].size
    br = _BitReader(d, data_pos)
    rst_n = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            br.align_and_expect_restart(rst_n)
            rst_n += 1
            for s in st:
                s["fresh"] = True
                # Mid-row restarts (DRI counts MCUs, not rows — possible
                # in foreign SOF3 streams): T.81 H.1.1 is ambiguous about
                # the "first line" after such a restart. This decoder
                # treats the REMAINDER of the current row as the
                # interval's first line (Ra prediction from pre-restart
                # pixels via line0); other decoders may differ there.
                # The in-repo encoder only emits row-aligned restarts,
                # so round-trips and goldens never hit the ambiguity
                # (r13 ADVICE: documented interpretation).
                s["line0"] = s["y"]
        for s in st:
            comp, plane = s["comp"], s["plane"]
            nh = comp["h"] if interleaved else 1
            nv = comp["v"] if interleaved else 1
            if interleaved:
                mrow, mcol = divmod(m, mcus_x)
                ys, xs = mrow * nv, mcol * nh
            else:
                ys, xs = s["y"], s["x"]
            for dy in range(nv):
                for dx in range(nh):
                    y, x = ys + dy, xs + dx
                    diff = _read_lossless_diff(br, s["table"])
                    if sel == 0:
                        # hierarchical differential (T.81 J.1.1.3): no
                        # in-frame prediction — the plane holds mod-2^16
                        # differences vs the (expanded) reference image
                        px = 0
                    elif s["fresh"]:
                        px = default
                        s["fresh"] = False
                        s["line0"] = y
                    else:
                        px = _lossless_predict(
                            plane, x, y, sel, default, s["line0"])
                    plane[y, x] = (px + diff) & 0xFFFF
            if not interleaved:
                s["x"] += 1
                if s["x"] == plane.shape[1]:
                    s["x"] = 0
                    s["y"] += 1
    for s in st:
        planes[s["comp"]["id"]] = (
            s["plane"][:s["ch"], :s["cw"]], pt)
    # skip any trailing fill bits, then hand back the marker offset
    return _entropy_end(d, data_pos)


def _assemble_lossless(frame, planes):
    """(w, h, ncomp, y_plane) from accumulated SOF3 component planes —
    the first component, inverse-point-transformed (<< Pt) and scaled
    to the [0, 255] float contract shared with the DCT paths."""
    comps = frame["comps"]
    missing = [c["id"] for c in comps if c["id"] not in planes]
    if missing:
        raise ValueError(f"lossless scan(s) never covered "
                         f"component(s) {missing}")
    plane, pt = planes[comps[0]["id"]]
    vals = plane.astype(np.float64) * float(1 << pt)
    maxval = float((1 << frame["prec"]) - 1)
    return (frame["w"], frame["h"], len(comps),
            np.clip(vals, 0.0, maxval) * (255.0 / maxval))


# ---------------------------------------------------------------------------
# HIERARCHICAL mode (DHP/EXP + SOF5/6/7 differential frames), T.81 Annex J
# (round 14 — closes the VERDICT r13 "cheapest remaining boundary" item).
# A hierarchical stream is a pyramid: one non-differential first frame
# (SOF0/1 DCT or SOF3 lossless here), then differential frames, each
# optionally preceded by an EXP marker that doubles the reference
# horizontally and/or vertically with the J.1.1.2 bilinear interpolation.
# Differential frames code the signed difference vs the (expanded)
# reference: DCT differentials (SOF5 sequential / SOF6 progressive) skip
# the level shift, lossless differentials (SOF7) use predictor 0 and
# mod-2^16 reconstruction. No external validator exists in this container
# (libjpeg has never implemented hierarchical mode), so the byte-stream
# truth is pinned the same way as SOF3: hand-derived goldens plus an
# encode twin whose lossless pyramid round-trips EXACTLY.
# Interpretation note (documented, not crosscheckable): DCT differential
# reconstruction clamps ref+diff to [0, 2^P-1] at each frame; lossless
# differential reconstruction is mod-2^16 per J.1.1.3.


def _exp_reference(ref: np.ndarray, eh: int, ev: int, tw: int, th: int) -> np.ndarray:
    """T.81 J.1.1.2 reference expansion: double along the flagged axes
    (even output samples copy the input, odd ones are the rounded mean
    of their neighbors, the trailing odd sample replicates the edge),
    then crop to the next frame's dims (2w or 2w-1 per the ceil
    hierarchy of frame sizes)."""
    out = ref
    if eh:
        h_, w_ = out.shape
        if tw not in (2 * w_ - 1, 2 * w_):
            raise ValueError(
                f"EXP horizontal: frame width {tw} is not 2*{w_}(-1)"
            )
        up = np.zeros((h_, 2 * w_), out.dtype)
        up[:, 0::2] = out
        up[:, 1:-1:2] = (out[:, :-1] + out[:, 1:] + 1) >> 1
        up[:, -1] = out[:, -1]
        out = up[:, :tw]
    elif out.shape[1] != tw:
        raise ValueError(
            f"frame width {tw} != reference width {out.shape[1]} with no EXP"
        )
    if ev:
        h_, w_ = out.shape
        if th not in (2 * h_ - 1, 2 * h_):
            raise ValueError(
                f"EXP vertical: frame height {th} is not 2*{h_}(-1)"
            )
        up = np.zeros((2 * h_, w_), out.dtype)
        up[0::2, :] = out
        up[1:-1:2, :] = (out[:-1, :] + out[1:, :] + 1) >> 1
        up[-1, :] = out[-1, :]
        out = up[:th, :]
    elif out.shape[0] != th:
        raise ValueError(
            f"frame height {th} != reference height {out.shape[0]} with no EXP"
        )
    return out


def _decode_jpeg_hierarchical(d: bytes) -> tuple:
    """Decode a grayscale hierarchical JPEG (DHP at ``d[2:]`` onward);
    returns the shared (w, h, ncomp, y_plane[0..255]) plane contract."""
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    dac_dc: dict[int, tuple] = {}
    dac_ac: dict[int, int] = {}
    restart_interval = 0
    dhp = None
    ref = None  # int64 full-precision sample plane
    pending_exp = None
    frame = None
    prog_state = None  # SOF6/14 scans accumulate; committed at frame end
    prog_frame = None

    def parse_frame_header(seg, lossless):
        precision = seg[0]
        if lossless:
            if not 2 <= precision <= 16:
                raise ValueError(
                    f"lossless JPEG precision {precision} out of [2, 16]"
                )
        elif precision != 8:
            raise NotImplementedError(
                "hierarchical DCT frames are decoded at 8-bit precision only"
            )
        fh, fw = struct.unpack_from(">HH", seg, 1)
        if fw < 1 or fh < 1:
            raise ValueError(f"bad JPEG frame dimensions {fw}x{fh}")
        if fw * fh > 100_000_000:
            raise ValueError(f"JPEG frame {fw}x{fh} exceeds the 100MP cap")
        ncomp = seg[5]
        if ncomp != 1:
            raise NotImplementedError(
                "hierarchical JPEG is decoded for grayscale (1-component)"
                " streams only"
            )
        cid, hv, tq = seg[6], seg[7], seg[8]
        if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 15) <= 4):
            raise ValueError(
                f"bad JPEG sampling factors 0x{hv:02X} for component {cid}"
            )
        return {
            "w": fw, "h": fh, "prec": precision, "arith": False,
            "comps": [{"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}],
        }

    def commit_prog():
        nonlocal ref, prog_state, prog_frame
        if prog_state is None:
            return
        _, _, _, out = _assemble_y(
            prog_frame, prog_state["zz"], quant, differential=True
        )
        maxval = (1 << dhp["prec"]) - 1
        ref = np.clip(ref + np.rint(out).astype(np.int64), 0, maxval)
        prog_state, prog_frame = None, None

    pos = 2
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", d, pos + 2)[0]
        seg = d[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                quant[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xCC:  # DAC — arithmetic conditioning
            i = 0
            while i + 1 < len(seg):
                tc_tb, val = seg[i], seg[i + 1]
                if tc_tb >> 4 == 0:
                    dac_dc[tc_tb & 15] = (val & 15, val >> 4)  # (L, U)
                else:
                    dac_ac[tc_tb & 15] = val  # Kx
                i += 2
        elif marker == 0xDE:  # DHP
            if dhp is not None:
                raise ValueError("multiple DHP segments")
            dhp = parse_frame_header(seg, lossless=True)
        elif marker == 0xDF:  # EXP
            commit_prog()
            pending_exp = (seg[0] >> 4, seg[0] & 15)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCB, 0xCD, 0xCE, 0xCF):
            # Huffman: SOF0/1 + SOF3 initial, SOF5/6/7 differential.
            # Arithmetic (round 14): SOF9 sequential + SOF11 lossless
            # initial, SOF13 sequential / SOF14 progressive / SOF15
            # lossless differential — the QM-coded twins over the same
            # pyramid walk.
            commit_prog()
            if dhp is None:
                raise ValueError("hierarchical frame before DHP")
            lossless = marker in (0xC3, 0xC7, 0xCB, 0xCF)
            frame = parse_frame_header(seg, lossless)
            frame["diff"] = marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            frame["lossless"] = lossless
            frame["progressive"] = marker in (0xC6, 0xCE)
            frame["arith"] = marker in (0xC9, 0xCB, 0xCD, 0xCE, 0xCF)
            if frame["diff"]:
                if ref is None:
                    raise ValueError("differential frame before any reference")
                eh, ev = pending_exp if pending_exp else (0, 0)
                ref = _exp_reference(ref, eh, ev, frame["w"], frame["h"])
                pending_exp = None
            elif ref is not None:
                raise ValueError(
                    "second non-differential frame in hierarchical stream"
                )
            if frame["progressive"]:
                prog_state = _init_prog_state(frame)
                prog_frame = frame
        elif marker in (0xC2, 0xCA):
            raise NotImplementedError(
                "hierarchical JPEG decodes sequential/lossless initial "
                f"frames only (got SOF marker 0x{marker:02X}) — a "
                "progressive-INITIAL frame needs a real image lib"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            data_pos = pos + 2 + seg_len
            if frame["lossless"]:
                scan = []
                for c in range(ns):
                    cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                    comp = next(
                        (x for x in frame["comps"] if x["id"] == cs), None
                    )
                    if comp is None:
                        raise ValueError(
                            f"SOS references unknown component id {cs}"
                        )
                    scan.append((comp, tdta >> 4))
                sel = seg[1 + 2 * ns]
                pt = seg[3 + 2 * ns] & 15
                if frame["diff"] and sel != 0:
                    raise ValueError(
                        "differential lossless scan requires predictor 0"
                    )
                planes: dict = {}
                if frame["arith"]:
                    pos = _decode_scan_lossless_arith(
                        d, data_pos, frame, scan, sel, pt, dac_dc,
                        restart_interval, planes,
                    )
                else:
                    pos = _decode_scan_lossless(
                        d, data_pos, frame, scan, sel, pt, huff_dc,
                        restart_interval, planes,
                    )
                plane, pt_out = planes[frame["comps"][0]["id"]]
                vals = plane.astype(np.int64) << pt_out
                if frame["diff"]:
                    ref = (ref + vals) & 0xFFFF  # J.1.1.3 mod-2^16
                else:
                    ref = vals
                continue
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"SOS references unknown component id {cs}"
                    )
                if comp["tq"] not in quant:
                    raise ValueError(
                        f"scan component {cs} references missing "
                        f"quantization table {comp['tq']}"
                    )
                scan.append((comp, tdta >> 4, tdta & 15))
            if frame["progressive"]:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah_al = seg[3 + 2 * ns]
                if frame["arith"]:  # SOF14 (round 14)
                    _decode_prog_scan_arith(
                        d, data_pos, frame, scan, ss, se, ah_al >> 4,
                        ah_al & 15, dac_dc, dac_ac, restart_interval,
                        prog_state,
                    )
                else:
                    _decode_prog_scan(
                        d, data_pos, frame, scan, ss, se, ah_al >> 4,
                        ah_al & 15, huff_dc, huff_ac, restart_interval,
                        prog_state,
                    )
                pos = _entropy_end(d, data_pos)
                continue
            if frame["arith"]:  # SOF9 initial / SOF13 differential (r14)
                _, _, _, out = _decode_scan_arith(
                    d, data_pos, frame, scan, quant, dac_dc, dac_ac,
                    restart_interval, differential=frame["diff"],
                )
            else:
                _, _, _, out = _decode_scan(
                    d, data_pos, frame, scan, quant, huff_dc, huff_ac,
                    restart_interval, differential=frame["diff"],
                )
            pos = _entropy_end(d, data_pos)
            maxval = (1 << frame["prec"]) - 1
            if frame["diff"]:
                ref = np.clip(
                    ref + np.rint(out).astype(np.int64), 0, maxval
                )
            else:
                # prec==8 enforced: the [0,255] plane IS the sample domain
                ref = np.clip(np.rint(out), 0, maxval).astype(np.int64)
            continue
        # APPn/COM/other: skip
        pos += 2 + seg_len
    commit_prog()
    if dhp is None or ref is None:
        raise ValueError("hierarchical stream missing DHP or frames")
    if ref.shape != (dhp["h"], dhp["w"]):
        raise ValueError(
            f"final reference {ref.shape[1]}x{ref.shape[0]} does not match "
            f"DHP dims {dhp['w']}x{dhp['h']}"
        )
    maxval = float((1 << dhp["prec"]) - 1)
    plane = np.clip(ref.astype(np.float64), 0.0, maxval) * (255.0 / maxval)
    return dhp["w"], dhp["h"], 1, plane


def _encode_lossless_arith_body(samples, precision, pt, predictor,
                                restart_rows, w, h) -> bytes:
    """SOF11 entropy body (single component): the structural mirror of
    :func:`_decode_scan_lossless_arith` — same prediction, conditioning
    classifications, restart resets and mod-2^16 difference domain, so
    the context walks cannot drift apart. Bit-level primitives are
    declared next to the decode twin (see the H.1.2 section comment)."""
    default = 1 << (precision - pt - 1)
    plane = samples.astype(np.int64)
    cats = np.zeros((h, w), np.int8)
    L, U = 0, 1  # default conditioning; no DAC emitted
    enc = _ArithEncoder()
    stats = bytearray(158)
    body = bytearray()
    rst_n = 0
    line0 = 0
    fresh = True
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            body += enc.finish()
            body += bytes([0xFF, 0xD0 + (rst_n & 7)])
            rst_n += 1
            enc = _ArithEncoder()
            stats = bytearray(158)
            cats[:] = 0
            fresh = True
            line0 = y
        for x in range(w):
            ca = int(cats[y, x - 1]) if x > 0 else 0
            cb = int(cats[y - 1, x]) if y > 0 else 0
            if fresh:
                px = default
                fresh = False
            else:
                px = _lossless_predict(plane, x, y, predictor,
                                       default, line0)
            diff = ((int(plane[y, x]) - px + 32768) & 0xFFFF) - 32768
            sign, mcat, zero = _arith_ll_encode_diff(
                enc, stats, ca, cb, diff
            )
            cats[y, x] = _arith_ll_cat(zero, mcat, sign, L, U)
    body += enc.finish()
    return bytes(body)


def encode_jpeg_gray_lossless(pixels: np.ndarray, predictor: int = 1,
                              pt: int = 0, precision: int | None = None,
                              restart_rows: int = 0,
                              arith: bool = False) -> bytes:
    """Encode an (H, W) integer array as a LOSSLESS JPEG — the decode
    twin of the Annex H path above; standard-conformant output.
    ``precision`` defaults to 8 for uint8 input / 16 for wider;
    ``restart_rows`` > 0 emits DRI + RSTn every that many sample rows
    (the per-interval predictor reset of H.1.1 applies). ``arith=True``
    emits SOF11 with the H.1.2 QM-coded statistical model (round 14)
    instead of SOF3 Huffman; default conditioning (L=0, U=1), so no
    DAC segment is needed."""
    arr = np.asarray(pixels)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) grayscale array")
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("precision in [2, 16]")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor in [1, 7]")
    if not 0 <= pt < precision:
        raise ValueError("point transform in [0, precision)")
    h, w = arr.shape
    samples = (arr.astype(np.int64) >> pt)
    if samples.min() < 0 or samples.max() >= (1 << (precision - pt)):
        raise ValueError("samples exceed the declared precision")

    out = bytearray()
    out += b"\xff\xd8"
    out += (bytes([0xFF, 0xCB if arith else 0xC3])
            + struct.pack(">HBHHB", 11, precision, h, w, 1)
            + bytes([1, 0x11, 0]))
    if not arith:
        out += (b"\xff\xc4"
                + struct.pack(">H", 3 + 16 + len(LOSSLESS_DC_VALS))
                + bytes([0x00] + LOSSLESS_DC_BITS + LOSSLESS_DC_VALS))
    if restart_rows:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_rows * w)
    out += (b"\xff\xda" + struct.pack(">H", 8)
            + bytes([1, 1, 0x00, predictor, 0, pt & 15]))

    if arith:
        out += _encode_lossless_arith_body(
            samples, precision, pt, predictor, restart_rows, w, h
        )
        out += b"\xff\xd9"
        return bytes(out)

    codes = _encode_huffman_lengths(LOSSLESS_DC_BITS, LOSSLESS_DC_VALS)
    body = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, length: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << length) | (code & ((1 << length) - 1))
        nbits += length
        while nbits >= 8:
            nbits -= 8
            byte = (bitbuf >> nbits) & 0xFF
            body.append(byte)
            if byte == 0xFF:
                body.append(0x00)

    def flush() -> None:
        nonlocal bitbuf, nbits
        while nbits:
            emit(1, 1)

    default = 1 << (precision - pt - 1)
    plane = samples.astype(np.int64)
    rst_n = 0
    line0 = 0
    fresh = True
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            flush()
            body += bytes([0xFF, 0xD0 + (rst_n & 7)])
            rst_n += 1
            fresh = True
            line0 = y
        for x in range(w):
            if fresh:
                px = default
                fresh = False
            else:
                px = _lossless_predict(plane, x, y, predictor,
                                       default, line0)
            diff = ((int(plane[y, x]) - px + 32768) & 0xFFFF) - 32768
            if diff == -32768:
                ln, code = codes[16]
                emit(code, ln)
                continue
            t = int(diff).bit_length() if diff > 0 else int(-diff).bit_length()
            mv = diff if diff >= 0 else diff + (1 << t) - 1
            ln, code = codes[t]
            emit(code, ln)
            if t:
                emit(mv, t)
    flush()
    out += body
    out += b"\xff\xd9"
    return bytes(out)


# canonical Huffman for SSSS 0..16 — the standard DC luminance lengths
# (T.81 Table K.3) extended with one code per length 10..14 for
# categories 12..16; Kraft sum 0.99994 < 1 so the all-ones code of the
# longest length stays reserved (Annex C convention)
LOSSLESS_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
LOSSLESS_DC_VALS = list(range(17))
assert sum(LOSSLESS_DC_BITS) == len(LOSSLESS_DC_VALS)


def encode_jpeg_gray_hierarchical(
    pixels: np.ndarray,
    levels: int = 3,
    final: str = "lossless",
    quality: int = 90,
    arith: bool = False,
) -> bytes:
    """Encode an (H, W) uint8 array as a HIERARCHICAL (Annex J) JPEG —
    the write twin of ``_decode_jpeg_hierarchical``.

    The pyramid has ``levels`` frames: each level decimates the previous
    by 2 per axis (ceil dims, matching the EXP expansion relation); the
    smallest level is a non-differential SOF3 frame (predictor 1), every
    later level is EXP(both axes) + a differential frame. ``final``
    picks the full-resolution frame's coding: ``"lossless"`` (SOF7 —
    the whole pyramid round-trips EXACTLY), ``"dct"`` (SOF5 sequential
    DCT at ``quality``) or ``"dct_progressive"`` (SOF6, DC scan then AC
    scan). ``arith=True`` (round 14) swaps every frame's entropy stage
    for the QM coder: SOF11 initial + SOF15 lossless differentials,
    SOF13/SOF14 for the DCT finals — coefficients and pixels are
    IDENTICAL to the Huffman pyramid by construction. Interpretation
    note (no external hierarchical decoder exists to crosscheck —
    libjpeg never implemented Annex J): differential DCT frames keep
    the F.1.1.5.1 DC prediction chain, and reconstruction clamps
    ref+diff to [0, 2^P-1]; both twins agree.
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) grayscale array")
    if levels < 1:
        raise ValueError("levels >= 1")
    if final not in ("lossless", "dct", "dct_progressive"):
        raise ValueError("final in ('lossless', 'dct', 'dct_progressive')")
    pyr = [arr.astype(np.int64)]
    for _ in range(levels - 1):
        pyr.append(pyr[-1][::2, ::2])  # ceil-dims decimation
    pyr = pyr[::-1]  # smallest level first
    h, w = arr.shape

    out = bytearray(b"\xff\xd8")
    # DHP: same syntax as a SOF, full-image dims (J.2)
    out += (b"\xff\xde" + struct.pack(">HBHHB", 11, 8, h, w, 1)
            + bytes([1, 0x11, 0]))
    ll_codes = _encode_huffman_lengths(LOSSLESS_DC_BITS, LOSSLESS_DC_VALS)

    def lossless_frame(marker: int, samples: np.ndarray, sel: int) -> bytes:
        """SOFn + DHT + SOS + entropy for one lossless frame; ``sel`` 0 =
        differential (prediction 0, samples are mod-2^16 differences).
        ``arith`` swaps Huffman SSSS codes for the SOF11/15 QM model."""
        fh, fw = samples.shape
        seg = bytearray()
        seg += (bytes([0xFF, marker]) + struct.pack(">HBHHB", 11, 8, fh, fw, 1)
                + bytes([1, 0x11, 0]))
        if not arith:
            seg += (b"\xff\xc4"
                    + struct.pack(">H", 3 + 16 + len(LOSSLESS_DC_VALS))
                    + bytes([0x00] + LOSSLESS_DC_BITS + LOSSLESS_DC_VALS))
        seg += (b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, 1, 0x00, sel, 0, 0]))
        if arith:
            enc = _ArithEncoder()
            st = bytearray(158)
            cats = np.zeros((fh, fw), np.int8)
            dflt = 1 << 7
            for y in range(fh):
                for x in range(fw):
                    ca = int(cats[y, x - 1]) if x > 0 else 0
                    cb = int(cats[y - 1, x]) if y > 0 else 0
                    if sel == 0:
                        px = 0
                    elif y == 0 and x == 0:
                        px = dflt
                    else:
                        px = _lossless_predict(samples, x, y, sel, dflt, 0)
                    diff = ((int(samples[y, x]) - px + 32768) & 0xFFFF) - 32768
                    sign, mcat, zero = _arith_ll_encode_diff(
                        enc, st, ca, cb, diff
                    )
                    cats[y, x] = _arith_ll_cat(zero, mcat, sign, 0, 1)
            return bytes(seg) + enc.finish()
        wtr = _BitWriter()
        default = 1 << 7
        for y in range(fh):
            for x in range(fw):
                if sel == 0:
                    px = 0
                elif y == 0 and x == 0:
                    px = default
                else:
                    px = _lossless_predict(samples, x, y, sel, default, 0)
                diff = ((int(samples[y, x]) - px + 32768) & 0xFFFF) - 32768
                if diff == -32768:
                    ln, code = ll_codes[16]
                    wtr.emit(code, ln)
                    continue
                t = (int(diff).bit_length() if diff > 0
                     else int(-diff).bit_length())
                mv = diff if diff >= 0 else diff + (1 << t) - 1
                ln, code = ll_codes[t]
                wtr.emit(code, ln)
                if t:
                    wtr.emit(mv, t)
        wtr.flush()
        return bytes(seg) + bytes(wtr.body)

    def dct_diff_frame(diff: np.ndarray, progressive: bool) -> bytes:
        """DQT + SOF + scan(s) for one DCT differential frame —
        Huffman SOF5/6 or (``arith``) QM-coded SOF13/14."""
        fh, fw = diff.shape
        zzq, q, _bw = _quantize_zigzag(diff, quality, level=0.0, pad="zero")
        seg = bytearray()
        seg += (b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
                + bytes(int(x) for x in q))
        if arith:
            seg += (bytes([0xFF, 0xCE if progressive else 0xCD])
                    + struct.pack(">HBHHB", 11, 8, fh, fw, 1)
                    + bytes([1, 0x11, 0]))
            blocks = list(zzq)
            scans = [(0, 0), (1, 63)] if progressive else [(0, 63)]
            for ss, se in scans:
                seg += (b"\xff\xda" + struct.pack(">H", 8)
                        + bytes([1, 1, 0x00, ss, se, 0]))
                enc = _ArithEncoder()
                dc_stats = bytearray(64)
                ac_stats = bytearray(256)
                fixed = bytearray([113])
                if not progressive:
                    # sequential SOF13: whole blocks through the F.1.4
                    # procedures (default conditioning L=0, U=1, Kx=5)
                    dc_state = {1: (0, 0)}
                    for blk in blocks:
                        _arith_encode_block(
                            enc, blk, dc_stats, ac_stats, fixed,
                            dc_state, 1, 0, 1, 5,
                        )
                elif ss == 0:
                    # SOF14 DC-first scan (G.1.2.1 arith, al=0)
                    last_dc = 0
                    ctx = 0
                    for blk in blocks:
                        cur = int(blk[0])
                        si = ctx
                        v = cur - last_dc
                        if v == 0:
                            enc.encode(dc_stats, si, 0)
                            ctx = 0
                            continue
                        last_dc = cur
                        enc.encode(dc_stats, si, 1)
                        if v > 0:
                            enc.encode(dc_stats, si + 1, 0)
                            si += 2
                            sign = 0
                        else:
                            v = -v
                            enc.encode(dc_stats, si + 1, 1)
                            si += 3
                            sign = 1
                        m = 0
                        v1 = v - 1
                        if v1:
                            enc.encode(dc_stats, si, 1)
                            m = 1
                            si = 20
                            v2 = v1 >> 1
                            while v2:
                                enc.encode(dc_stats, si, 1)
                                m <<= 1
                                si += 1
                                v2 >>= 1
                        enc.encode(dc_stats, si, 0)
                        ctx = (0 if m < ((1 << 0) >> 1) else
                               12 + sign * 4 if m > ((1 << 1) >> 1) else
                               4 + sign * 4)
                        si += 14
                        mm = m
                        while True:
                            mm >>= 1
                            if not mm:
                                break
                            enc.encode(dc_stats, si, 1 if (mm & v1) else 0)
                else:
                    # SOF14 AC-first scan over [1, 63] (G.2 arith, al=0)
                    for blk in blocks:
                        ke = se
                        while ke >= ss and int(blk[ke]) == 0:
                            ke -= 1
                        k = ss
                        while k <= ke:
                            si = 3 * (k - 1)
                            enc.encode(ac_stats, si, 0)  # not EOB
                            while int(blk[k]) == 0:
                                enc.encode(ac_stats, si + 1, 0)
                                si += 3
                                k += 1
                            enc.encode(ac_stats, si + 1, 1)
                            v = int(blk[k])
                            if v > 0:
                                enc.encode(fixed, 0, 0)
                            else:
                                v = -v
                                enc.encode(fixed, 0, 1)
                            si += 2
                            m = 0
                            v1 = v - 1
                            if v1:
                                enc.encode(ac_stats, si, 1)
                                m = 1
                                v2 = v1 >> 1
                                if v2:
                                    enc.encode(ac_stats, si, 1)
                                    m <<= 1
                                    si = 189 if k <= 5 else 217
                                    v2 >>= 1
                                    while v2:
                                        enc.encode(ac_stats, si, 1)
                                        m <<= 1
                                        si += 1
                                        v2 >>= 1
                            enc.encode(ac_stats, si, 0)
                            si += 14
                            mm = m
                            while True:
                                mm >>= 1
                                if not mm:
                                    break
                                enc.encode(
                                    ac_stats, si, 1 if (mm & v1) else 0
                                )
                            k += 1
                        if k <= se:
                            enc.encode(ac_stats, 3 * (k - 1), 1)  # EOB
                seg += enc.finish()
            return bytes(seg)
        dc_codes = _encode_huffman_lengths(DC_LUMA_BITS, DC_LUMA_VALS)
        seg += (bytes([0xFF, 0xC6 if progressive else 0xC5])
                + struct.pack(">HBHHB", 11, 8, fh, fw, 1)
                + bytes([1, 0x11, 0]))
        seg += _dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
        if progressive:
            ac_codes = _encode_huffman_lengths(PROG_AC_BITS, PROG_AC_VALS)
            seg += _dht(0x10, PROG_AC_BITS, PROG_AC_VALS)
            blocks = list(zzq)
            for ss, se in ((0, 0), (1, 63)):
                seg += (b"\xff\xda" + struct.pack(">H", 8)
                        + bytes([1, 1, 0x00, ss, se, 0]))
                wtr = _BitWriter()
                if ss == 0:
                    _emit_dc_first(
                        wtr, ((0, b[0]) for b in blocks), dc_codes, 0, {0: 0}
                    )
                else:
                    _emit_ac_first(wtr, blocks, ac_codes, ss, se, 0)
                wtr.flush()
                seg += wtr.body
            return bytes(seg)
        ac_codes = _encode_huffman_lengths(AC_LUMA_BITS, AC_LUMA_VALS)
        seg += _dht(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
        seg += (b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, 1, 0x00, 0, 63, 0]))
        wtr = _BitWriter()
        pred = 0
        for zz in zzq:
            dcd = int(zz[0]) - pred
            pred = int(zz[0])
            t = (int(dcd).bit_length() if dcd > 0
                 else int(-dcd).bit_length())
            mv = dcd if dcd >= 0 else dcd + (1 << t) - 1
            ln, code = dc_codes[t]
            wtr.emit(code, ln)
            if t:
                wtr.emit(mv, t)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last_nz = (nz[-1] + 1) if len(nz) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]  # ZRL
                    wtr.emit(code, ln)
                    run -= 16
                t = int(v).bit_length() if v > 0 else int(-v).bit_length()
                mv = v if v >= 0 else v + (1 << t) - 1
                ln, code = ac_codes[(run << 4) | t]
                wtr.emit(code, ln)
                wtr.emit(mv, t)
                run = 0
            if last_nz < 63:
                ln, code = ac_codes[0x00]  # EOB
                wtr.emit(code, ln)
        wtr.flush()
        return bytes(seg) + bytes(wtr.body)

    ref = None
    for li, img in enumerate(pyr):
        if li == 0:
            out += lossless_frame(0xCB if arith else 0xC3, img, sel=1)
            ref = img.copy()
            continue
        th_, tw_ = img.shape
        out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])  # EXP h+v
        ref = _exp_reference(ref, 1, 1, tw_, th_)
        if final == "lossless" or li < levels - 1:
            out += lossless_frame(
                0xCF if arith else 0xC7, (img - ref) & 0xFFFF, sel=0
            )
            ref = img.copy()
        else:
            out += dct_diff_frame(img - ref, final == "dct_progressive")
            # last frame: no further ref use (lossy reconstruction lives
            # in the decoder)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# minimal baseline grayscale encoder (golden-test byte source)


def decode_jpeg(payload: bytes) -> tuple[int, int, int, float]:
    """Decode a baseline JPEG; return (width, height, n_components,
    mean_luma) with mean_luma the mean of the decoded Y plane (cropped to
    the true image size) normalized to [0, 1], rounded to 6 — the same
    contract as ``decode_bmp``.
    """
    w, h, nc, plane = _decode_jpeg_plane(payload)
    return w, h, nc, round(float(plane.mean() / 255.0), 6)


def decode_jpeg_luma(payload: bytes) -> np.ndarray:
    """Pixel-level JPEG decode: the Y (luma) plane as a uint8 array —
    the entry the real pHash / resize operators build on. For subsampled
    color JPEGs this is the Y component's resolution (what perceptual
    hashing wants anyway); chroma reconstruction stays outside this
    codec's scope."""
    _w, _h, _nc, plane = _decode_jpeg_plane(payload)
    return np.clip(np.rint(plane), 0, 255).astype(np.uint8)


def encode_jpeg_gray(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) uint8 grayscale array as a baseline JPEG (single
    component, Annex K tables scaled by ``quality`` per the libjpeg
    convention). Standard-conformant output — any JPEG decoder reads it."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) grayscale array")
    h, w = arr.shape
    if quality < 1 or quality > 100:
        raise ValueError("quality in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((QUANT_LUMA_K1 * scale + 50) // 100, 1, 255).astype(np.int64)

    dc_codes = _encode_huffman_lengths(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_lengths(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return (
            b"\xff\xc4"
            + struct.pack(">H", 3 + 16 + len(vals))
            + bytes([tc_th] + bits + vals)
        )

    out += dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])

    # pad to full blocks by edge replication
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, bh - h), (0, bw - w)), mode="edge").astype(np.float64)
    blocks = (
        padded.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coeff = np.einsum("ik,nkl,jl->nij", _T, blocks - 128.0, _T)
    # q is serialized in zigzag order in the DQT segment; the math needs
    # natural (row-major) order
    q_nat = np.zeros(64, dtype=np.int64)
    q_nat[ZIGZAG] = q
    qz = np.round(coeff.reshape(-1, 64) / q_nat).astype(np.int64)

    bitbuf = 0
    nbits = 0
    body = bytearray()

    def emit(code: int, length: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << length) | (code & ((1 << length) - 1))
        nbits += length
        while nbits >= 8:
            nbits -= 8
            byte = (bitbuf >> nbits) & 0xFF
            body.append(byte)
            if byte == 0xFF:
                body.append(0x00)

    def magnitude(v: int) -> tuple[int, int]:
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        if v < 0:
            v = v + (1 << t) - 1
        return t, v

    pred = 0
    for blk in qz:
        zz = blk[ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t, mv = magnitude(diff)
        ln, code = dc_codes[t]
        emit(code, ln)
        if t:
            emit(mv, t)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]  # ZRL
                emit(code, ln)
                run -= 16
            t, mv = magnitude(v)
            ln, code = ac_codes[(run << 4) | t]
            emit(code, ln)
            emit(mv, t)
            run = 0
        if last_nz < 63:
            ln, code = ac_codes[0x00]  # EOB
            emit(code, ln)
    while nbits:  # flush: pad the final partial byte with 1-bits (spec)
        emit(1, 1)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (golden-byte source for the SOF2 decode path) —
# standard-conformant output; any progressive-capable decoder reads it.

# one flat 8-bit Huffman table covering every symbol a progressive AC scan
# can emit: run/size for s 1..10, EOBn (r<<4 for r 0..14) and ZRL. 176
# codes of length 8 leave the all-ones code unused (T.81 C.2 requirement).
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)]
    + [0xF0]
)

# (Ss, Se, Ah, Al) script: DC first with point transform, split AC bands,
# two successive-approximation refinement rounds per band, DC refinement —
# every Annex G decode procedure fires
DEFAULT_PROG_SCANS = (
    (0, 0, 0, 1),
    (1, 5, 0, 2),
    (6, 63, 0, 2),
    (1, 5, 2, 1),
    (6, 63, 2, 1),
    (1, 5, 1, 0),
    (6, 63, 1, 0),
    (0, 0, 1, 0),
)


class _BitWriter:
    """MSB-first bit emitter with 0xFF byte stuffing (encoder twin of
    _BitReader)."""

    def __init__(self) -> None:
        self.body = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def emit(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.bitbuf >> self.nbits) & 0xFF
            self.body.append(byte)
            if byte == 0xFF:
                self.body.append(0x00)
        self.bitbuf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        while self.nbits:
            self.emit(1, 1)


def _quantize_zigzag(
    arr: np.ndarray,
    quality: int,
    mcu: int = 8,
    level: float = 128.0,
    pad: str = "edge",
):
    """(H, W) uint8 -> ((n_blocks, 64) int64 zigzag-ordered quantized
    coefficients in raster block order over the mcu-padded grid, zigzag
    DQT table, blocks-per-row). ``level``/``pad`` support hierarchical
    DIFFERENTIAL frames (round 14): signed difference input, no level
    shift, zero padding."""
    h, w = arr.shape
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((QUANT_LUMA_K1 * scale + 50) // 100, 1, 255).astype(np.int64)
    q_nat = np.zeros(64, dtype=np.int64)
    q_nat[ZIGZAG] = q
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    padded = np.pad(
        arr,
        ((0, ph - h), (0, pw - w)),
        mode=("constant" if pad == "zero" else pad),
    ).astype(np.float64)
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coeff = np.einsum("ik,nkl,jl->nij", _T, blocks - level, _T)
    qz = np.round(coeff.reshape(-1, 64) / q_nat).astype(np.int64)
    return qz[:, ZIGZAG], q, pw // 8


def _emit_dc_first(wtr: _BitWriter, seq, dc_codes: dict, al: int, preds: dict) -> None:
    """DC first scan (G.1.1.1.1): diff-code coef0 >> Al (arithmetic shift).
    ``seq`` yields (component_key, coef0); preds is per-key state."""
    for key, c0 in seq:
        v = int(c0) >> al
        diff = v - preds[key]
        preds[key] = v
        t = diff.bit_length() if diff >= 0 else (-diff).bit_length()
        ln, code = dc_codes[t]
        wtr.emit(code, ln)
        if t:
            mv = diff if diff >= 0 else diff + (1 << t) - 1
            wtr.emit(mv & ((1 << t) - 1), t)


def _emit_dc_refine(wtr: _BitWriter, seq, al: int) -> None:
    """DC refinement: one appended magnitude bit per block."""
    for _key, c0 in seq:
        wtr.emit((int(c0) >> al) & 1, 1)


def _emit_ac_first(wtr: _BitWriter, blocks, ac_codes: dict, ss: int, se: int, al: int) -> None:
    """AC first scan of a band (G.1.1.2 encoder flow): run/size coding of
    the point-transformed coefficients, EOB runs across blocks."""
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            ln, code = ac_codes[nb << 4]
            wtr.emit(code, ln)
            if nb:
                wtr.emit(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0

    for zzb in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(zzb[k])
            if v < 0:
                t = (-v) >> al
                t2 = ~t  # low bits = magnitude complement (sign coding)
            else:
                t = v >> al
                t2 = t
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                ln, code = ac_codes[0xF0]
                wtr.emit(code, ln)
                r -= 16
            nb = t.bit_length()
            ln, code = ac_codes[(r << 4) | nb]
            wtr.emit(code, ln)
            wtr.emit(t2 & ((1 << nb) - 1), nb)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _emit_ac_refine(wtr: _BitWriter, blocks, ac_codes: dict, ss: int, se: int, al: int) -> None:
    """AC refinement scan (G.1.1.2 successive approximation): one
    correction bit per already-nonzero coefficient, run/size(=1) symbols
    for newly-nonzero ones, correction bits buffered to ride just after
    the symbol that closes their run (decoder reads them interleaved)."""
    eobrun = 0
    be_bits: list[int] = []  # correction bits owed after the next EOBn

    def flush_eob() -> None:
        nonlocal eobrun, be_bits
        if eobrun:
            nb = eobrun.bit_length() - 1
            ln, code = ac_codes[nb << 4]
            wtr.emit(code, ln)
            if nb:
                wtr.emit(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0
        for b in be_bits:
            wtr.emit(b, 1)
        be_bits = []

    for zzb in blocks:
        vals = [int(zzb[k]) for k in range(ss, se + 1)]
        absv = [(-v if v < 0 else v) >> al for v in vals]
        eob_i = -1  # last newly-nonzero index; later ZRLs fold into EOB
        for i, t in enumerate(absv):
            if t == 1:
                eob_i = i
        r = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob_i:
                flush_eob()
                ln, code = ac_codes[0xF0]
                wtr.emit(code, ln)
                r -= 16
                for b in br:
                    wtr.emit(b, 1)
                br = []
            if t > 1:  # history-nonzero: correction bit only
                br.append(t & 1)
                continue
            flush_eob()  # newly-nonzero: close the run
            ln, code = ac_codes[(r << 4) | 1]
            wtr.emit(code, ln)
            wtr.emit(0 if vals[i] < 0 else 1, 1)
            for b in br:
                wtr.emit(b, 1)
            br = []
            r = 0
        if r or br:
            eobrun += 1
            be_bits.extend(br)
            if eobrun == 0x7FFF or len(be_bits) > 900:
                flush_eob()
    flush_eob()


def _dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return (
        b"\xff\xc4"
        + struct.pack(">H", 3 + 16 + len(vals))
        + bytes([tc_th] + bits + vals)
    )


def encode_jpeg_gray_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    scans: tuple = DEFAULT_PROG_SCANS,
) -> bytes:
    """Encode an (H, W) uint8 grayscale array as a PROGRESSIVE (SOF2)
    JPEG — the multi-scan twin of :func:`encode_jpeg_gray`, used to
    generate real progressive bytes for the decoder's golden tests. The
    quantized coefficients are identical to the baseline encoder's at the
    same quality, so a correct progressive decode must match the baseline
    decode bit-for-bit."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) grayscale array")
    h, w = arr.shape
    if quality < 1 or quality > 100:
        raise ValueError("quality in [1, 100]")
    zzq, q, _bw = _quantize_zigzag(arr, quality)
    dc_codes = _encode_huffman_lengths(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_lengths(PROG_AC_BITS, PROG_AC_VALS)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in q)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    out += _dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(0x10, PROG_AC_BITS, PROG_AC_VALS)
    blocks = list(zzq)
    for ss, se, ah, al in scans:
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes(
            [1, 1, 0x00, ss, se, (ah << 4) | al]
        )
        wtr = _BitWriter()
        if ss == 0:
            if ah == 0:
                _emit_dc_first(
                    wtr, ((0, b[0]) for b in blocks), dc_codes, al, {0: 0}
                )
            else:
                _emit_dc_refine(wtr, ((0, b[0]) for b in blocks), al)
        elif ah == 0:
            _emit_ac_first(wtr, blocks, ac_codes, ss, se, al)
        else:
            _emit_ac_refine(wtr, blocks, ac_codes, ss, se, al)
        wtr.flush()
        out += wtr.body
    out += b"\xff\xd9"
    return bytes(out)


# flat tables wide enough for 12-bit data: DC sizes 0..15 as 5-bit codes
# (4-bit would need the forbidden all-ones code), AC run/size with sizes
# 1..14 plus EOB and ZRL as 8-bit codes (226 of 255 — all-ones unused)
DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC12_VALS = list(range(16))
AC12_BITS = [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0]
AC12_VALS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 15)] + [0x00, 0xF0]
)


# ---------------------------------------------------------------------------
# arithmetic entropy coding (round 12): ITU T.81 Annex D QM-coder +
# Annex F/G conditioning, moving SOF9 (sequential) AND SOF10
# (progressive) arithmetic JPEG OFF the declared boundary. The probability state machine is T.81 Table D.3
# (113 adaptive states + the fixed ~0.5 bin), packed per entry as
# (Qe << 16) | (NMPS << 8) | (Switch << 7) | NLPS. The packing and
# every coder detail below are pinned BYTE-EXACTLY against libjpeg:
# tests/test_codec_crosscheck.py compiles a libjpeg driver and asserts
# our encoder reproduces libjpeg's arithmetic entropy segment to the
# byte, our decoder recovers the exact coefficients, and this table
# equals the library's exported jpeg_aritab. Two details were derived
# empirically there: the code fraction aligns at bit 15 of the initial
# 17-bit interval (the encoder's 3 spacer bits), and a marker in the
# entropy stream feeds zero bytes from then on (byte stuffing FF 00 ->
# data FF, exactly like the Huffman segments).
# ---------------------------------------------------------------------------

_ARITH_TAB = (
    0x5A1D0181, 0x2586020E, 0x11140310, 0x080B0412, 0x03D80514, 0x01DA0617,
    0x00E50719, 0x006F081C, 0x0036091E, 0x001A0A21, 0x000D0B23, 0x00060C09,
    0x00030D0A, 0x00010D0C, 0x5A7F0F8F, 0x3F251024, 0x2CF21126, 0x207C1227,
    0x17B91328, 0x1182142A, 0x0CEF152B, 0x09A1162D, 0x072F172E, 0x055C1830,
    0x04061931, 0x03031A33, 0x02401B34, 0x01B11C36, 0x01441D38, 0x00F51E39,
    0x00B71F3B, 0x008A203C, 0x0068213E, 0x004E223F, 0x003B2320, 0x002C0921,
    0x5AE125A5, 0x484C2640, 0x3A0D2741, 0x2EF12843, 0x261F2944, 0x1F332A45,
    0x19A82B46, 0x15182C48, 0x11772D49, 0x0E742E4A, 0x0BFB2F4B, 0x09F8304D,
    0x0861314E, 0x0706324F, 0x05CD3330, 0x04DE3432, 0x040F3532, 0x03633633,
    0x02D43734, 0x025C3835, 0x01F83936, 0x01A43A37, 0x01603B38, 0x01253C39,
    0x00F63D3A, 0x00CB3E3B, 0x00AB3F3D, 0x008F203D, 0x5B1241C1, 0x4D044250,
    0x412C4351, 0x37D84452, 0x2FE84553, 0x293C4654, 0x23794756, 0x1EDF4857,
    0x1AA94957, 0x174E4A48, 0x14244B48, 0x119C4C4A, 0x0F6B4D4A, 0x0D514E4B,
    0x0BB64F4D, 0x0A40304D, 0x583251D0, 0x4D1C5258, 0x438E5359, 0x3BDD545A,
    0x34EE555B, 0x2EAE565C, 0x299A575D, 0x25164756, 0x557059D8, 0x4CA95A5F,
    0x44D95B60, 0x3E225C61, 0x38245D63, 0x32B45E63, 0x2E17565D, 0x56A860DF,
    0x4F466165, 0x47E56266, 0x41CF6367, 0x3C3D6468, 0x375E5D63, 0x52316669,
    0x4C0F676A, 0x4639686B, 0x415E6367, 0x56276AE9, 0x50E76B6C, 0x4B85676D,
    0x55976D6E, 0x504F6B6F, 0x5A106FEE, 0x55226D70, 0x59EB6FF0, 0x5A1D7171,
)


class _ArithDecoder:
    """T.81 Annex D arithmetic decoder over one entropy segment.

    Bit-lazy software shape: ``a``/``c`` are plain ints over the
    current 16-bit-normalized interval; one stream bit feeds per
    renormalization shift. Input honors JPEG byte stuffing (FF 00 is a
    literal FF data byte) and feeds zero bytes once a real marker is
    reached (legal in arithmetic scans — the tail decisions resolve
    from the flushed interval)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.n = len(data)
        self.marker = False
        self.cur = 0
        self.nbits = 0
        self.a = 0x10000
        self.c = 0
        for _ in range(16):
            self.c = (self.c << 1) | self._bit()

    def _byte(self) -> int:
        if self.marker or self.pos >= self.n:
            self.marker = True
            return 0
        b = self.d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        p = self.pos + 1
        while p < self.n and self.d[p] == 0xFF:
            p += 1
        if p < self.n and self.d[p] == 0x00:
            self.pos = p + 1
            return 0xFF
        self.marker = True  # leave pos AT the marker's 0xFF
        return 0

    def _bit(self) -> int:
        if self.nbits == 0:
            self.cur = self._byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def decode(self, st: bytearray, i: int) -> int:
        """Decode one binary decision in statistics bin ``st[i]`` (low 7
        bits: Table D.3 state index; high bit: current MPS sense)."""
        sv = st[i]
        packed = _ARITH_TAB[sv & 0x7F]
        qe = packed >> 16
        nm = (packed >> 8) & 0xFF
        nl = packed & 0xFF  # (Switch << 7) | NLPS — XOR flips MPS on switch
        mps = sv >> 7
        a = self.a - qe
        if self.c < a:
            if a & 0x8000:  # fast path: no renorm, no state update
                self.a = a
                return mps
            # conditional exchange: the smaller subinterval is the LPS
            if a < qe:
                d = mps ^ 1
                st[i] = (sv & 0x80) ^ nl
            else:
                d = mps
                st[i] = (sv & 0x80) ^ nm
            self.a = a
        else:
            self.c -= a
            if a < qe:
                d = mps
                st[i] = (sv & 0x80) ^ nm
            else:
                d = mps ^ 1
                st[i] = (sv & 0x80) ^ nl
            self.a = qe
        while self.a < 0x8000:
            self.a <<= 1
            self.c = (self.c << 1) | self._bit()
        return d


class _ArithEncoder:
    """T.81 Annex D arithmetic encoder (the jcarith-equivalent software
    shape: 3 spacer bits, pending-byte carry resolution over stacked
    0xFF bytes, FF 00 byte stuffing). Byte-exact against libjpeg's own
    arithmetic output in the crosscheck suite."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending output byte (carry may still bump it)
        self.sc = 0  # stacked 0xFF bytes awaiting carry resolution
        self.zc = 0  # pending zero bytes (trailing zeros elide at flush)
        self.out = bytearray()

    def _flush_pending(self) -> None:
        if self.zc:
            self.out += b"\x00" * self.zc
            self.zc = 0

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry propagates through the pending byte and stacked FFs
            if self.buffer >= 0:
                self._flush_pending()
                self.out.append((self.buffer + 1) & 0xFF)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc  # carry turns stacked FFs into 00s
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_pending()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_pending()
                for _ in range(self.sc):
                    self.out += b"\xff\x00"
                self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, st: bytearray, i: int, val: int) -> None:
        sv = st[i]
        packed = _ARITH_TAB[sv & 0x7F]
        qe = packed >> 16
        nm = (packed >> 8) & 0xFF
        nl = packed & 0xFF
        self.a -= qe
        if val != (sv >> 7):
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) ^ nl
        else:
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) ^ nm
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                break

    def finish(self) -> bytes:
        """D.1.8 termination: pick the code point with the most trailing
        zeros inside the final interval, push the remaining bytes."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._flush_pending()
                self.out.append((self.buffer + 1) & 0xFF)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_pending()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_pending()
                for _ in range(self.sc):
                    self.out += b"\xff\x00"
                self.sc = 0
        if self.c & 0x7FFF800:
            self._flush_pending()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        return bytes(self.out)


def _arith_decode_block(dec, dc_stats, ac_stats, fixed, dc_state, ci,
                        dc_L, dc_U, ac_K):
    """One 8x8 block's coefficients (zigzag order) per T.81 F.2.4 —
    the decode-side twin of :func:`_arith_encode_block`. ``dc_state``
    holds [last_dc, dc_context] for component slot ``ci``."""
    blk = np.zeros(64, np.int64)
    last_dc, dc_context = dc_state[ci]
    si = dc_context
    if dec.decode(dc_stats, si):
        sign = dec.decode(dc_stats, si + 1)
        si += 2 + sign
        m = dec.decode(dc_stats, si)
        if m:
            si = 20  # Table F.4: X1
            while dec.decode(dc_stats, si):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arithmetic DC magnitude overflow")
                si += 1
        if m < ((1 << dc_L) >> 1):
            dc_context = 0
        elif m > ((1 << dc_U) >> 1):
            dc_context = 12 + sign * 4
        else:
            dc_context = 4 + sign * 4
        v = m
        si += 14  # magnitude bit-pattern bins
        mm = m
        while True:
            mm >>= 1
            if not mm:
                break
            if dec.decode(dc_stats, si):
                v |= mm
        v += 1
        last_dc += -v if sign else v
    else:
        dc_context = 0
    dc_state[ci] = (last_dc, dc_context)
    blk[0] = last_dc
    k = 1
    while k <= 63:
        si = 3 * (k - 1)
        if dec.decode(ac_stats, si):
            break  # EOB
        while dec.decode(ac_stats, si + 1) == 0:
            si += 3
            k += 1
            if k > 63:
                raise ValueError("arithmetic AC index overran block")
        sign = dec.decode(fixed, 0)
        si += 2
        m = dec.decode(ac_stats, si)
        if m:
            if dec.decode(ac_stats, si):
                m <<= 1
                si = 189 if k <= ac_K else 217  # Table F.5: X2 / X3
                while dec.decode(ac_stats, si):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    si += 1
        v = m
        si += 14
        mm = m
        while True:
            mm >>= 1
            if not mm:
                break
            if dec.decode(ac_stats, si):
                v |= mm
        v += 1
        blk[k] = -v if sign else v
        k += 1
    return blk


def _arith_encode_block(enc, blk, dc_stats, ac_stats, fixed, dc_state, ci,
                        dc_L, dc_U, ac_K):
    """One 8x8 block's coefficients (zigzag order) per T.81 F.1.4 —
    kept structurally parallel to the decoder above so the context
    walks cannot drift apart."""
    last_dc, dc_context = dc_state[ci]
    si = dc_context
    v = int(blk[0]) - last_dc
    if v == 0:
        enc.encode(dc_stats, si, 0)
        dc_context = 0
    else:
        last_dc = int(blk[0])
        enc.encode(dc_stats, si, 1)
        if v > 0:
            enc.encode(dc_stats, si + 1, 0)
            si += 2
            sign = 0
        else:
            v = -v
            enc.encode(dc_stats, si + 1, 1)
            si += 3
            sign = 1
        m = 0
        v1 = v - 1
        if v1:
            enc.encode(dc_stats, si, 1)
            m = 1
            si = 20
            v2 = v1 >> 1
            while v2:
                enc.encode(dc_stats, si, 1)
                m <<= 1
                si += 1
                v2 >>= 1
        enc.encode(dc_stats, si, 0)
        if m < ((1 << dc_L) >> 1):
            dc_context = 0
        elif m > ((1 << dc_U) >> 1):
            dc_context = 12 + sign * 4
        else:
            dc_context = 4 + sign * 4
        si += 14
        mm = m
        while True:
            mm >>= 1
            if not mm:
                break
            enc.encode(dc_stats, si, 1 if (mm & v1) else 0)
    dc_state[ci] = (last_dc, dc_context)
    ke = 63
    while ke > 0 and blk[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        si = 3 * (k - 1)
        enc.encode(ac_stats, si, 0)  # not EOB yet
        while blk[k] == 0:
            enc.encode(ac_stats, si + 1, 0)
            si += 3
            k += 1
        enc.encode(ac_stats, si + 1, 1)
        v = int(blk[k])
        if v > 0:
            enc.encode(fixed, 0, 0)
            sign = 0
        else:
            v = -v
            enc.encode(fixed, 0, 1)
            sign = 1
        si += 2
        m = 0
        v1 = v - 1
        if v1:
            enc.encode(ac_stats, si, 1)
            m = 1
            v2 = v1 >> 1
            if v2:
                enc.encode(ac_stats, si, 1)
                m <<= 1
                si = 189 if k <= ac_K else 217
                v2 >>= 1
                while v2:
                    enc.encode(ac_stats, si, 1)
                    m <<= 1
                    si += 1
                    v2 >>= 1
        enc.encode(ac_stats, si, 0)
        si += 14
        mm = m
        while True:
            mm >>= 1
            if not mm:
                break
            enc.encode(ac_stats, si, 1 if (mm & v1) else 0)
        k += 1
    if k <= 63:
        si = 3 * (k - 1)
        enc.encode(ac_stats, si, 1)  # EOB


def _decode_scan_arith(d, data_pos, frame, scan, quant, dc_cond, ac_cond,
                       restart_interval, differential=False):
    """Sequential arithmetic scan (SOF9; SOF13 differential with
    ``differential=True`` — round 14): same MCU walk as
    :func:`_decode_scan`, with the QM-coder entropy stage. DAC
    conditioning defaults are T.81's (L=0, U=1, Kx=5). Restart markers
    reset the coder, the statistics areas, and the DC predictors.
    Differential frames skip the level shift and return the raw signed
    difference plane (the hierarchical walk clamps ref+diff)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    y_comp = scan[0][0]
    y_bw = mcus_x * y_comp["h"]
    y_bh = mcus_y * y_comp["v"]
    y_coeffs = np.zeros((y_bh * y_bw, 64), dtype=np.float64)

    def fresh_stats():
        return ({t: bytearray(64) for _, t, _ in scan},
                {t: bytearray(256) for _, _, t in scan},
                bytearray([113]),
                {c["id"]: (0, 0) for c, _, _ in scan})

    dec = _ArithDecoder(d, data_pos)
    dc_stats, ac_stats, fixed, dc_state = fresh_stats()
    rst = 0
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            # locate the RSTn marker at/after the coder's byte position
            p = dec.pos
            while p + 1 < len(d) and not (
                d[p] == 0xFF and d[p + 1] != 0x00
            ):
                p += 1
            while p + 1 < len(d) and d[p + 1] == 0xFF:
                p += 1  # FF fill bytes before the marker
            if p + 1 >= len(d) or d[p + 1] != 0xD0 + rst:
                raise ValueError("expected restart marker in arithmetic scan")
            rst = (rst + 1) & 7
            dec = _ArithDecoder(d, p + 2)
            dc_stats, ac_stats, fixed, dc_state = fresh_stats()
        my, mx = divmod(mcu, mcus_x)
        for comp, td, ta in scan:
            dc_L, dc_U = dc_cond.get(td, (0, 1))
            ac_K = ac_cond.get(ta, 5)
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    blk = _arith_decode_block(
                        dec, dc_stats[td], ac_stats[ta], fixed, dc_state,
                        comp["id"], dc_L, dc_U, ac_K,
                    )
                    if comp is y_comp:
                        q = quant[comp["tq"]]
                        deq = np.zeros(64)
                        deq[ZIGZAG] = blk * q
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        y_coeffs[row * y_bw + col] = deq

    prec = frame.get("prec", 8)
    level, maxval = float(1 << (prec - 1)), float((1 << prec) - 1)
    blocks = y_coeffs.reshape(-1, 8, 8)
    if differential:
        # SOF13 (Annex J): IDCT output IS the signed difference image —
        # no level shift/clamp; the hierarchical walk adds and clamps
        pix = np.einsum("ki,nkl,lj->nij", _T, blocks, _T)
    else:
        pix = np.einsum("ki,nkl,lj->nij", _T, blocks, _T) + level
        pix = np.clip(pix, 0.0, maxval) * (255.0 / maxval)
    plane = (
        pix.reshape(y_bh, y_bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(y_bh * 8, y_bw * 8)
    )
    y_w = -(-w * y_comp["h"] // hmax)
    y_h = -(-h * y_comp["v"] // vmax)
    return w, h, len(comps), plane[:y_h, :y_w]


def _decode_prog_scan_arith(d, data_pos, frame, scan, ss, se, ah, al,
                            dc_cond, ac_cond, restart_interval, state):
    """Decode ONE arithmetic progressive scan (SOF10, T.81 G.2) into
    the persistent coefficient grid. Mirrors :func:`_decode_prog_scan`'s
    control flow with the QM-coder entropy stage: DC first scans are
    diff-coded in the point-transformed domain with the sequential
    conditioning contexts; DC refinements are one fixed-bin decision
    per block; AC first scans reuse the sequential AC procedure over
    [Ss, Se]; AC refinements walk previously-nonzero coefficients with
    the st+2 correction bin and code new coefficients via st+1 + the
    fixed sign bin (there is no Huffman-style EOB run — EOB is a
    per-block decision for k past the previous stage's end). Statistics
    reset per scan and at restarts, like libjpeg's jdarith."""
    zz = state["zz"]
    y_comp = frame["comps"][0]
    p1 = 1 << al
    m1 = -p1

    def fresh(comps):
        return (_ArithDecoder(d, data_pos),
                {t: bytearray(64) for _, t, _ in comps},
                {t: bytearray(256) for _, _, t in comps},
                bytearray([113]),
                {c["id"]: (0, 0) for c, _, _ in comps})

    dec, dc_stats, ac_stats, fixed, dc_state = fresh(scan)
    rst = 0

    def restart(mark_pos_from: int):
        nonlocal dec, dc_stats, ac_stats, fixed, dc_state, rst
        p = dec.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        while p + 1 < len(d) and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= len(d) or d[p + 1] != 0xD0 + rst:
            raise ValueError("expected restart marker in arithmetic scan")
        rst = (rst + 1) & 7
        dec = _ArithDecoder(d, p + 2)
        dc_stats = {t: bytearray(64) for _, t, _ in scan}
        ac_stats = {t: bytearray(256) for _, _, t in scan}
        dc_state = {c["id"]: (0, 0) for c, _, _ in scan}

    if ss == 0:  # ---- DC scan (first or refinement); may interleave
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")

        def dc_block(comp, td, idx):
            if ah == 0:  # G.2: first scan — the sequential DC procedure
                dc_L, dc_U = dc_cond.get(td, (0, 1))
                st = dc_stats[td]
                last_dc, ctx = dc_state[comp["id"]]
                si = ctx
                if dec.decode(st, si):
                    sign = dec.decode(st, si + 1)
                    si += 2 + sign
                    m = dec.decode(st, si)
                    if m:
                        si = 20
                        while dec.decode(st, si):
                            m <<= 1
                            if m == 0x8000:
                                raise ValueError(
                                    "arithmetic DC magnitude overflow"
                                )
                            si += 1
                    if m < ((1 << dc_L) >> 1):
                        ctx = 0
                    elif m > ((1 << dc_U) >> 1):
                        ctx = 12 + sign * 4
                    else:
                        ctx = 4 + sign * 4
                    v = m
                    si += 14
                    mm = m
                    while True:
                        mm >>= 1
                        if not mm:
                            break
                        if dec.decode(st, si):
                            v |= mm
                    v += 1
                    last_dc += -v if sign else v
                else:
                    ctx = 0
                dc_state[comp["id"]] = (last_dc, ctx)
                if idx is not None:
                    zz[idx, 0] = last_dc << al
            else:  # refinement — one fixed-bin decision per block
                if dec.decode(fixed, 0) and idx is not None:
                    zz[idx, 0] |= p1

        interleaved = len(scan) > 1
        if interleaved:
            mcus_x = state["mcus_x"]
            n_units = mcus_x * state["mcus_y"]
        else:
            bw_n, bh_n = _comp_block_dims(frame, scan[0][0], state)
            n_units = bw_n * bh_n
        for unit in range(n_units):
            if restart_interval and unit and unit % restart_interval == 0:
                restart(unit)
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for comp, td, _ta in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            idx = None
                            if comp is y_comp:
                                row = my * comp["v"] + by
                                col = mx * comp["h"] + bx
                                idx = row * state["bw"] + col
                            dc_block(comp, td, idx)
            else:
                comp, td, _ta = scan[0]
                by, bx = divmod(unit, bw_n)
                idx = by * state["bw"] + bx if comp is y_comp else None
                dc_block(comp, td, idx)
        return

    # ---- AC scan: single component by spec
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    comp, _td, ta = scan[0]
    ac_K = ac_cond.get(ta, 5)
    bw_n, bh_n = _comp_block_dims(frame, comp, state)
    store_bw = state["bw"]
    st_all = ac_stats[ta]
    for unit in range(bw_n * bh_n):
        if restart_interval and unit and unit % restart_interval == 0:
            restart(unit)
            st_all = ac_stats[ta]
        by, bx = divmod(unit, bw_n)
        blk = zz[by * store_bw + bx]
        if ah == 0:  # -- first scan of this band: sequential AC over it
            k = ss
            while k <= se:
                si = 3 * (k - 1)
                if dec.decode(st_all, si):
                    break  # EOB
                while dec.decode(st_all, si + 1) == 0:
                    si += 3
                    k += 1
                    if k > se:
                        raise ValueError("AC index overran spectral band")
                sign = dec.decode(fixed, 0)
                si += 2
                m = dec.decode(st_all, si)
                if m:
                    if dec.decode(st_all, si):
                        m <<= 1
                        si = 189 if k <= ac_K else 217
                        while dec.decode(st_all, si):
                            m <<= 1
                            if m == 0x8000:
                                raise ValueError(
                                    "arithmetic AC magnitude overflow"
                                )
                            si += 1
                v = m
                si += 14
                mm = m
                while True:
                    mm >>= 1
                    if not mm:
                        break
                    if dec.decode(st_all, si):
                        v |= mm
                v += 1
                blk[k] = (-v if sign else v) << al
                k += 1
        else:  # -- refinement (G.2.3 / jdarith decode_mcu_AC_refine)
            kex = se
            while kex > 0 and blk[kex] == 0:
                kex -= 1
            k = ss
            while k <= se:
                si = 3 * (k - 1)
                if k > kex:
                    if dec.decode(st_all, si):
                        break  # EOB
                while True:
                    c = int(blk[k])
                    if c:  # previously nonzero: one correction decision
                        if dec.decode(st_all, si + 2):
                            blk[k] = c + (p1 if c > 0 else m1)
                        break
                    if dec.decode(st_all, si + 1):  # newly nonzero
                        blk[k] = m1 if dec.decode(fixed, 0) else p1
                        break
                    si += 3
                    k += 1
                    if k > se:
                        raise ValueError(
                            "AC refinement overran spectral band"
                        )
                k += 1


# ---------------------------------------------------------------------------
# ARITHMETIC LOSSLESS (SOF11), T.81 Annex H.1.2 (round 14 — the last
# non-differential JPEG mode off the boundary). The entropy stage is the
# already-validated Annex D QM coder; the statistical model is the DC
# difference model of F.1.4.4.1 with the conditioning of H.1.2.2: each
# difference is coded in a context selected by the CLASSIFICATIONS of
# the neighbouring differences Da (left) and Db (above) — five classes
# each (zero, ±small, ±large per the DAC table's L/U exactly as in the
# DC model's context update) — giving 25 four-bin contexts, plus two
# X/M magnitude ladders selected by whether Db's class is large
# (H.1.2.3), for a 158-bin statistics area per conditioning table.
# Layout note (documented interpretation): no implementation of SOF11
# ships in this container (libjpeg never implemented it), so the bin
# ORDERING below — context base = 4*(5*ca + cb) over (Da class ca,
# Db class cb in {0:zero, 1:+S, 2:-S, 3:+L, 4:-L}), ladders at bins
# 100/129 — is this codec's self-consistent realization of H.1.2; the
# encoder and decoder are kept structurally parallel, and an
# independent from-scratch C decoder crosschecks the full stream in
# tests/test_codec_crosscheck.py (the FLAC/GSM validation precedent).


def _arith_ll_cat(zero: bool, m: int, sign: int, L: int, U: int) -> int:
    """Classify a coded difference for Da/Db conditioning — the exact
    expressions of the DC model's context update (F.1.4.4.1.1), on the
    magnitude-category base ``m`` (v-1's leading power of two)."""
    if zero or m < ((1 << L) >> 1):
        return 0
    if m > ((1 << U) >> 1):
        return 3 + sign  # large +/-
    return 1 + sign  # small +/-


def _arith_ll_decode_diff(dec, st, ca: int, cb: int) -> tuple[int, int, int, bool]:
    """Decode one difference: returns (diff, sign, m, zero)."""
    base = 4 * (5 * ca + cb)
    if not dec.decode(st, base):
        return 0, 0, 0, True
    sign = dec.decode(st, base + 1)
    si = base + 2 + sign
    m = dec.decode(st, si)
    if m:
        si = 129 if cb >= 3 else 100  # X1 of the Db-conditioned ladder
        while dec.decode(st, si):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic lossless magnitude overflow")
            si += 1
    v = m
    si += 14
    mm = m
    while True:
        mm >>= 1
        if not mm:
            break
        if dec.decode(st, si):
            v |= mm
    v += 1
    return (-v if sign else v), sign, m, False


def _arith_ll_encode_diff(enc, st, ca: int, cb: int, diff: int) -> tuple[int, int, bool]:
    """Encode one difference (the structural mirror of the decoder
    above): returns (sign, m, zero) for the caller's classification."""
    base = 4 * (5 * ca + cb)
    if diff == 0:
        enc.encode(st, base, 0)
        return 0, 0, True
    enc.encode(st, base, 1)
    if diff > 0:
        enc.encode(st, base + 1, 0)
        sign = 0
        v = diff
    else:
        enc.encode(st, base + 1, 1)
        sign = 1
        v = -diff
    si = base + 2 + sign
    m = 0
    v1 = v - 1
    if v1:
        enc.encode(st, si, 1)
        m = 1
        si = 129 if cb >= 3 else 100
        v2 = v1 >> 1
        while v2:
            enc.encode(st, si, 1)
            m <<= 1
            si += 1
            v2 >>= 1
    enc.encode(st, si, 0)
    si += 14
    mm = m
    while True:
        mm >>= 1
        if not mm:
            break
        enc.encode(st, si, 1 if (mm & v1) else 0)
    return sign, m, False


def _decode_scan_lossless_arith(d, data_pos, frame, scan, sel, pt,
                                dc_cond, restart_interval, planes) -> int:
    """Decode ONE arithmetic lossless scan (SOF11) into ``planes`` —
    the QM-coder twin of :func:`_decode_scan_lossless`: identical MCU
    walk, prediction, restart and mod-2^16 reconstruction; only the
    entropy stage and its H.1.2 conditioning differ. Per-sample
    classifications live in a per-component plane so Da/Db lookups are
    O(1); restarts reset the coder, the statistics and the
    classification plane (fresh intervals condition on zero
    neighbours, mirrored by the encoder)."""
    if sel == 0 and not frame.get("diff"):
        raise ValueError(
            "lossless predictor selector 0 is only valid in hierarchical"
            " differential frames (T.81 J.1.1.3)"
        )
    if not 0 <= sel <= 7:
        raise ValueError(f"lossless predictor selector {sel} out of [0, 7]")
    prec = frame["prec"]
    if pt >= prec:
        raise ValueError(f"point transform {pt} >= precision {prec}")
    default = 1 << (prec - pt - 1)
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    interleaved = len(scan) > 1
    st = []
    for comp, td in scan:
        L, U = dc_cond.get(td, (0, 1))
        cw = -(-frame["w"] * comp["h"] // hmax)
        ch = -(-frame["h"] * comp["v"] // vmax)
        if interleaved:
            pw = comp["h"] * -(-cw // comp["h"])
            ph = comp["v"] * -(-ch // comp["v"])
        else:
            pw, ph = cw, ch
        st.append({
            "comp": comp, "td": td, "L": L, "U": U,
            "plane": np.zeros((ph, pw), np.uint16),
            "cats": np.zeros((ph, pw), np.int8),
            "cw": cw, "ch": ch, "x": 0, "y": 0,
            "fresh": True, "line0": 0,
        })
    if interleaved:
        mcus_x = -(-frame["w"] // hmax)
        mcus_y = -(-frame["h"] // vmax)
        n_mcus = mcus_x * mcus_y
    else:
        n_mcus = st[0]["plane"].size
    stats = {s["td"]: bytearray(158) for s in st}
    dec = _ArithDecoder(d, data_pos)
    rst = 0
    for m_i in range(n_mcus):
        if restart_interval and m_i and m_i % restart_interval == 0:
            p = dec.pos
            while p + 1 < len(d) and not (
                d[p] == 0xFF and d[p + 1] != 0x00
            ):
                p += 1
            while p + 1 < len(d) and d[p + 1] == 0xFF:
                p += 1
            if p + 1 >= len(d) or d[p + 1] != 0xD0 + rst:
                raise ValueError("expected restart marker in arithmetic scan")
            rst = (rst + 1) & 7
            dec = _ArithDecoder(d, p + 2)
            stats = {s["td"]: bytearray(158) for s in st}
            for s in st:
                s["fresh"] = True
                s["line0"] = s["y"]
                s["cats"][:] = 0  # fresh interval: zero-class neighbours
        for s in st:
            comp, plane, cats = s["comp"], s["plane"], s["cats"]
            tstats = stats[s["td"]]
            nh = comp["h"] if interleaved else 1
            nv = comp["v"] if interleaved else 1
            if interleaved:
                mrow, mcol = divmod(m_i, mcus_x)
                ys, xs = mrow * nv, mcol * nh
            else:
                ys, xs = s["y"], s["x"]
            for dy in range(nv):
                for dx in range(nh):
                    y, x = ys + dy, xs + dx
                    ca = int(cats[y, x - 1]) if x > 0 else 0
                    cb = int(cats[y - 1, x]) if y > 0 else 0
                    diff, sign, mcat, zero = _arith_ll_decode_diff(
                        dec, tstats, ca, cb
                    )
                    cats[y, x] = _arith_ll_cat(
                        zero, mcat, sign, s["L"], s["U"]
                    )
                    if sel == 0:
                        px = 0
                    elif s["fresh"]:
                        px = default
                        s["fresh"] = False
                        s["line0"] = y
                    else:
                        px = _lossless_predict(
                            plane, x, y, sel, default, s["line0"])
                    plane[y, x] = (px + diff) & 0xFFFF
            if not interleaved:
                s["x"] += 1
                if s["x"] == plane.shape[1]:
                    s["x"] = 0
                    s["y"] += 1
    for s in st:
        planes[s["comp"]["id"]] = (
            s["plane"][:s["ch"], :s["cw"]], pt)
    return _entropy_end(d, dec.pos)


def encode_jpeg_gray_arith(pixels: np.ndarray, quality: int = 90,
                           restart_interval: int = 0) -> bytes:
    """Encode an (H, W) uint8 grayscale array as a SEQUENTIAL
    ARITHMETIC JPEG (SOF9, T.81 Annexes D/F, default conditioning
    spelled out in a DAC marker like libjpeg does). Entropy coding is
    lossless over the same quantized coefficients as
    :func:`encode_jpeg_gray`, so the two variants decode to identical
    pixels — the property the crosscheck and driver oracles lean on."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) grayscale array")
    h, w = arr.shape
    if quality < 1 or quality > 100:
        raise ValueError("quality in [1, 100]")
    blocks, q, _bw = _quantize_zigzag(arr, quality)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in q)
    out += b"\xff\xc9" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    # DAC: DC table 0 -> (U=1)<<4 | (L=0); AC table 0 -> Kx=5
    out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 0x05])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])

    def fresh():
        return (_ArithEncoder(), bytearray(64), bytearray(256),
                bytearray([113]), {1: (0, 0)})

    enc, dc_stats, ac_stats, fixed, dc_state = fresh()
    rst = 0
    for n, blk in enumerate(blocks):
        if restart_interval and n and n % restart_interval == 0:
            out += enc.finish()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            enc, dc_stats, ac_stats, fixed, dc_state = fresh()
        _arith_encode_block(enc, blk, dc_stats, ac_stats, fixed, dc_state,
                            1, 0, 1, 5)
    out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray_arith_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    scans: tuple = DEFAULT_PROG_SCANS,
) -> bytes:
    """Encode an (H, W) uint8 grayscale array as an ARITHMETIC
    PROGRESSIVE (SOF10) JPEG — the QM-coder twin of
    :func:`encode_jpeg_gray_progressive`, written as the exact inverse
    of :func:`_decode_prog_scan_arith` (per-scan coder + statistics,
    T.81 G.2 procedures; AC point transform truncates the MAGNITUDE
    toward zero, DC uses the arithmetic shift). Coefficients equal the
    baseline encoder's, so every variant decodes to identical pixels."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) grayscale array")
    h, w = arr.shape
    if quality < 1 or quality > 100:
        raise ValueError("quality in [1, 100]")
    zzq, q, _bw = _quantize_zigzag(arr, quality)
    blocks = list(zzq)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in q)
    out += b"\xff\xca" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 0x05])

    for ss, se, ah, al in scans:
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes(
            [1, 1, 0x00, ss, se, (ah << 4) | al]
        )
        enc = _ArithEncoder()
        dc_stats = bytearray(64)
        ac_stats = bytearray(256)
        fixed = bytearray([113])
        if ss == 0:
            if ah == 0:  # DC first: sequential DC over block0 >> Al
                last_dc = 0
                ctx = 0
                for blk in blocks:
                    cur = int(blk[0]) >> al  # arithmetic shift per G.1.2.1
                    si = ctx
                    v = cur - last_dc
                    if v == 0:
                        enc.encode(dc_stats, si, 0)
                        ctx = 0
                    else:
                        last_dc = cur
                        enc.encode(dc_stats, si, 1)
                        if v > 0:
                            enc.encode(dc_stats, si + 1, 0)
                            si += 2
                            sign = 0
                        else:
                            v = -v
                            enc.encode(dc_stats, si + 1, 1)
                            si += 3
                            sign = 1
                        m = 0
                        v1 = v - 1
                        if v1:
                            enc.encode(dc_stats, si, 1)
                            m = 1
                            si = 20
                            v2 = v1 >> 1
                            while v2:
                                enc.encode(dc_stats, si, 1)
                                m <<= 1
                                si += 1
                                v2 >>= 1
                        enc.encode(dc_stats, si, 0)
                        # default conditioning L=0, U=1
                        if m < ((1 << 0) >> 1):
                            ctx = 0
                        elif m > ((1 << 1) >> 1):
                            ctx = 12 + sign * 4
                        else:
                            ctx = 4 + sign * 4
                        si += 14
                        mm = m
                        while True:
                            mm >>= 1
                            if not mm:
                                break
                            enc.encode(dc_stats, si, 1 if (mm & v1) else 0)
            else:  # DC refinement: one fixed-bin decision per block
                for blk in blocks:
                    enc.encode(fixed, 0, (int(blk[0]) >> al) & 1)
        else:
            for blk in blocks:
                def mag(k: int, shift: int) -> int:
                    t = int(blk[k])
                    return (t if t >= 0 else -t) >> shift
                ke = se
                while ke >= ss and mag(ke, al) == 0:
                    ke -= 1
                if ah == 0:  # AC first: sequential AC over the band
                    k = ss
                    while k <= ke:
                        si = 3 * (k - 1)
                        enc.encode(ac_stats, si, 0)  # not EOB
                        while mag(k, al) == 0:
                            enc.encode(ac_stats, si + 1, 0)
                            si += 3
                            k += 1
                        enc.encode(ac_stats, si + 1, 1)
                        enc.encode(fixed, 0, 0 if int(blk[k]) > 0 else 1)
                        si += 2
                        v = mag(k, al)
                        m = 0
                        v1 = v - 1
                        if v1:
                            enc.encode(ac_stats, si, 1)
                            m = 1
                            v2 = v1 >> 1
                            if v2:
                                enc.encode(ac_stats, si, 1)
                                m <<= 1
                                si = 189 if k <= 5 else 217
                                v2 >>= 1
                                while v2:
                                    enc.encode(ac_stats, si, 1)
                                    m <<= 1
                                    si += 1
                                    v2 >>= 1
                        enc.encode(ac_stats, si, 0)
                        si += 14
                        mm = m
                        while True:
                            mm >>= 1
                            if not mm:
                                break
                            enc.encode(ac_stats, si, 1 if (mm & v1) else 0)
                        k += 1
                    if k <= se:
                        enc.encode(ac_stats, 3 * (k - 1), 1)  # EOB
                else:  # AC refinement (G.2.3, jcarith shape)
                    kex = ke
                    while kex >= ss and mag(kex, ah) == 0:
                        kex -= 1
                    k = ss
                    while k <= ke:
                        si = 3 * (k - 1)
                        if k > kex:
                            enc.encode(ac_stats, si, 0)  # not EOB yet
                        while True:
                            t = mag(k, al)
                            if t:
                                if t >> 1:  # previously nonzero
                                    enc.encode(ac_stats, si + 2, t & 1)
                                else:  # newly nonzero
                                    enc.encode(ac_stats, si + 1, 1)
                                    enc.encode(
                                        fixed, 0,
                                        0 if int(blk[k]) > 0 else 1,
                                    )
                                break
                            enc.encode(ac_stats, si + 1, 0)
                            si += 3
                            k += 1
                        k += 1
                    if k <= se:
                        enc.encode(ac_stats, 3 * (k - 1), 1)  # EOB
        out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray12(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) uint16 array of 12-bit samples (0..4095) as an
    extended-sequential (SOF1) 12-bit grayscale JPEG — the golden-byte
    source for the precision-12 decode path. Level shift 2048; magnitude
    categories reach 15 (DC) / 14 (AC), which the flat wide tables
    cover."""
    arr = np.asarray(pixels, dtype=np.uint16)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) 12-bit gray array")
    if arr.size and int(arr.max()) > 4095:
        raise ValueError("samples exceed 12 bits")
    h, w = arr.shape
    if quality < 1 or quality > 100:
        raise ValueError("quality in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((QUANT_LUMA_K1 * scale + 50) // 100, 1, 255).astype(np.int64)
    q_nat = np.zeros(64, dtype=np.int64)
    q_nat[ZIGZAG] = q
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, bh - h), (0, bw - w)), mode="edge").astype(
        np.float64
    )
    blocks = (
        padded.reshape(bh // 8, 8, bw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coeff = np.einsum("ik,nkl,jl->nij", _T, blocks - 2048.0, _T)
    qz = np.round(coeff.reshape(-1, 64) / q_nat).astype(np.int64)

    dc_codes = _encode_huffman_lengths(DC12_BITS, DC12_VALS)
    ac_codes = _encode_huffman_lengths(AC12_BITS, AC12_VALS)
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in q)
    out += b"\xff\xc1" + struct.pack(">HBHHB", 11, 12, h, w, 1) + bytes([1, 0x11, 0])
    out += _dht(0x00, DC12_BITS, DC12_VALS)
    out += _dht(0x10, AC12_BITS, AC12_VALS)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])

    wtr = _BitWriter()

    def magnitude(v: int) -> tuple[int, int]:
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        if v < 0:
            v = v + (1 << t) - 1
        return t, v

    pred = 0
    for blk in qz:
        zz = blk[ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t, mv = magnitude(diff)
        ln, code = dc_codes[t]
        wtr.emit(code, ln)
        if t:
            wtr.emit(mv & ((1 << t) - 1), t)
        nz = np.nonzero(zz[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        run = 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                wtr.emit(code, ln)
                run -= 16
            t, mv = magnitude(v)
            ln, code = ac_codes[(run << 4) | t]
            wtr.emit(code, ln)
            wtr.emit(mv & ((1 << t) - 1), t)
            run = 0
        if last_nz < 63:
            ln, code = ac_codes[0x00]
            wtr.emit(code, ln)
    wtr.flush()
    out += wtr.body
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_ycbcr420_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Progressive twin of :func:`encode_jpeg_ycbcr420`: 3 components
    (Y 2x2, flat neutral chroma 1x1), interleaved DC first + refinement
    scans, per-component AC band scans — exercises the decoder's
    interleaved-MCU DC paths and the chroma-scan skip."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) luma array")
    h, w = arr.shape
    zzq, q, bw16 = _quantize_zigzag(arr, quality, mcu=16)
    dc_codes = _encode_huffman_lengths(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_lengths(PROG_AC_BITS, PROG_AC_VALS)
    mcus_x, mcus_y = bw16 // 2, -(-h // 16)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in q)
    out += (
        b"\xff\xc2"
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    out += _dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(0x10, PROG_AC_BITS, PROG_AC_VALS)

    def dc_seq():
        """Interleaved MCU order: 4 Y blocks then Cb then Cr (flat chroma
        = all-zero coefficients)."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(2):
                    for bx in range(2):
                        yield 1, zzq[(my * 2 + by) * bw16 + (mx * 2 + bx), 0]
                yield 2, 0
                yield 3, 0

    def y_ac_blocks():
        """Non-interleaved Y scan: the component's TRUE block grid
        (ceil(w/8) x ceil(h/8)), strided into the MCU-padded storage."""
        bw_n, bh_n = -(-w // 8), -(-h // 8)
        for by in range(bh_n):
            for bx in range(bw_n):
                yield zzq[by * bw16 + bx]

    zero_blk = np.zeros(64, dtype=np.int64)
    cw, ch = -(-w // 2), -(-h // 2)  # chroma sample extent (1x1 vs hmax 2)
    n_chroma = -(-cw // 8) * -(-ch // 8)

    # DC first (interleaved, Al=1)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]
    )
    wtr = _BitWriter()
    _emit_dc_first(wtr, dc_seq(), dc_codes, 1, {1: 0, 2: 0, 3: 0})
    wtr.flush()
    out += wtr.body
    # Y AC full band, two approximation levels
    for ss, se, ah, al in ((1, 63, 0, 1), (1, 63, 1, 0)):
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes(
            [1, 1, 0x00, ss, se, (ah << 4) | al]
        )
        wtr = _BitWriter()
        if ah == 0:
            _emit_ac_first(wtr, y_ac_blocks(), ac_codes, ss, se, al)
        else:
            _emit_ac_refine(wtr, y_ac_blocks(), ac_codes, ss, se, al)
        wtr.flush()
        out += wtr.body
    # chroma AC scans: all-zero bands collapse to one EOB run each
    for cid in (2, 3):
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes(
            [1, cid, 0x00, 1, 63, 0x00]
        )
        wtr = _BitWriter()
        _emit_ac_first(
            wtr, (zero_blk for _ in range(n_chroma)), ac_codes, 1, 63, 0
        )
        wtr.flush()
        out += wtr.body
    # DC refinement (interleaved, Ah=1 -> Al=0)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]
    )
    wtr = _BitWriter()
    _emit_dc_refine(wtr, dc_seq(), 0)
    wtr.flush()
    out += wtr.body
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_ycbcr420(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) uint8 LUMA array as a 3-component 4:2:0 baseline
    JPEG with neutral (flat 128) chroma — i.e. a grayscale image in the
    byte layout real-world color JPEGs use. Exists to exercise the
    decoder's interleaved-MCU / sampling-factor / multi-table paths with
    standard-conformant bytes; the visual content equals the gray input."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("expected an (H, W) luma array")
    h, w = arr.shape
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((QUANT_LUMA_K1 * scale + 50) // 100, 1, 255).astype(np.int64)
    q_nat = np.zeros(64, dtype=np.int64)
    q_nat[ZIGZAG] = q

    dc_codes = _encode_huffman_lengths(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_lengths(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in q)
    # SOF0: 3 components, Y 2x2 sampling, Cb/Cr 1x1, all quant table 0
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 3 + 16 + len(DC_LUMA_VALS))
        + bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 3 + 16 + len(AC_LUMA_VALS))
        + bytes([0x10] + AC_LUMA_BITS + AC_LUMA_VALS)
    )
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]
    )

    mcus_x, mcus_y = -(-w // 16), -(-h // 16)
    padded = np.pad(
        arr, ((0, mcus_y * 16 - h), (0, mcus_x * 16 - w)), mode="edge"
    ).astype(np.float64)

    bitbuf = 0
    nbits = 0
    body = bytearray()

    def emit(code: int, length: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << length) | (code & ((1 << length) - 1))
        nbits += length
        while nbits >= 8:
            nbits -= 8
            byte = (bitbuf >> nbits) & 0xFF
            body.append(byte)
            if byte == 0xFF:
                body.append(0x00)

    def magnitude(v: int) -> tuple[int, int]:
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        if v < 0:
            v = v + (1 << t) - 1
        return t, v

    def emit_block(zz: np.ndarray, pred: int) -> int:
        diff = int(zz[0]) - pred
        t, mv = magnitude(diff)
        ln, code = dc_codes[t]
        emit(code, ln)
        if t:
            emit(mv, t)
        nz = np.nonzero(zz[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        run = 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                emit(code, ln)
                run -= 16
            t, mv = magnitude(v)
            ln, code = ac_codes[(run << 4) | t]
            emit(code, ln)
            emit(mv, t)
            run = 0
        if last_nz < 63:
            ln, code = ac_codes[0x00]
            emit(code, ln)
        return int(zz[0])

    pred = {1: 0, 2: 0, 3: 0}
    zero_zz = np.zeros(64, dtype=np.int64)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(2):  # 4 Y blocks per MCU
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    blk = padded[y0 : y0 + 8, x0 : x0 + 8]
                    coeff = _T @ (blk - 128.0) @ _T.T
                    qz = np.round(coeff.reshape(64) / q_nat).astype(np.int64)
                    pred[1] = emit_block(qz[ZIGZAG], pred[1])
            for cid in (2, 3):  # flat chroma: DC diff 0 + EOB
                pred[cid] = emit_block(zero_zz, pred[cid])
    while nbits:
        emit(1, 1)
    out += body
    out += b"\xff\xd9"
    return bytes(out)
