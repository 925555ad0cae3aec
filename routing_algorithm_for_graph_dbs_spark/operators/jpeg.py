"""Pure-Python/numpy baseline JPEG codec for the multimodal pipeline.

The multimodal boundary contract (``operators/multimodal.py``): formats we
can decode natively are decoded for REAL; everything else is a marked stub.
Round 7 moves baseline JPEG from the stub side to the real side — a
training-data pipeline meets JPEG before any other binary format, and the
luma statistics the pipeline derives (quality filters, near-dup pHash)
only need the Y channel.

``decode_jpeg``: baseline sequential DCT (SOF0), 8-bit, Huffman entropy
coding, grayscale or YCbCr with any sampling factors (4:4:4 / 4:2:0 /
4:2:2 ...), restart intervals. It entropy-decodes EVERY component's
coefficients (the MCU stream interleaves them — skipping requires
decoding), but only the Y component is inverse-transformed; chroma
upsampling never runs because the returned statistic is Rec.601 luma and
JPEG's Y channel IS that luma. Progressive (SOF2), arithmetic coding,
12-bit precision and hierarchical modes raise ``NotImplementedError`` —
the honest remaining boundary (a real deployment plugs libjpeg there).

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
    frame = None
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
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline / extended sequential
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0/1) is decoded here "
                f"(got SOF marker 0x{marker:02X}) — progressive/arithmetic/"
                "hierarchical modes need a real image lib"
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
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 15))
            return _decode_scan(
                d, pos + 2 + seg_len, frame, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn/COM/other: skip
        pos += 2 + seg_len
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
            dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    # -- DC
                    t = reader.decode_symbol(dc_tbl)
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

    # vectorized exact IDCT over every Y block at once
    blocks = y_coeffs.reshape(-1, 8, 8)
    pix = np.einsum("ki,nkl,lj->nij", _T, blocks, _T) + 128.0
    pix = np.clip(pix, 0.0, 255.0)
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
