"""REAL CCITT fax codecs (round 12) — ITU T.4 Modified Huffman and
T.6 Group 4 (MMR), pure Python, no codec library.

Scanned documents — the TIFF payloads a 100 TB crawl actually carries —
are overwhelmingly G4-compressed bilevel rasters; T.4 MH (TIFF
compression 2) and T.6 G4 (compression 4) move OFF the declared decode
boundary here. The run-length code tables below are ITU-T T.4 Tables
2/3 (terminating + make-up codes, with the extended make-ups shared by
both colors), DERIVED EMPIRICALLY from libtiff-minted streams by
common-prefix isolation — the same method that pinned the VP8L
distance table against libwebp and the TIFF-LZW early-change rule
against libtiff — then verified prefix-free and spot-checked against
the published table values (W0=00110101, B0=0000110111, the shared
1792..2560 make-ups). tests/test_codec_crosscheck.py re-validates
both codecs bidirectionally against libtiff on every run where the
library is present.

T.6 coding state per T.4 §4.2.1.3 / T.6 §2.2: changing elements a0/a1/
a2 on the coding line, b1/b2 on the reference line (b1 = first
changing element right of a0 whose color differs from the current
coding color), pass / vertical(±3) / horizontal modes; the reference
line for the first row is an imaginary all-white line, and each strip
restarts it. MH-RLE (compression 2) codes every row independently,
byte-aligned, starting with a (possibly zero-length) white run.
"""

from __future__ import annotations

import numpy as np

_T4_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000",
    21: "0010111", 22: "0000011", 23: "0000100", 24: "0101000",
    25: "0101011", 26: "0010011", 27: "0100100", 28: "0011000",
    29: "00000010", 30: "00000011", 31: "00011010", 32: "00011011",
    33: "00010010", 34: "00010011", 35: "00010100", 36: "00010101",
    37: "00010110", 38: "00010111", 39: "00101000", 40: "00101001",
    41: "00101010", 42: "00101011", 43: "00101100", 44: "00101101",
    45: "00000100", 46: "00000101", 47: "00001010", 48: "00001011",
    49: "01010010", 50: "01010011", 51: "01010100", 52: "01010101",
    53: "00100100", 54: "00100101", 55: "01011000", 56: "01011001",
    57: "01011010", 58: "01011011", 59: "01001010", 60: "01001011",
    61: "00110010", 62: "00110011", 63: "00110100"
}

_T4_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111"
}

_T4_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111"
}

_T4_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111"
}

# extended make-ups (1792..2560) are color-shared per T.4 Table 3b —
# asserted during derivation and at import
for _k in range(1792, 2561, 64):
    assert _T4_WHITE_MAKEUP[_k] == _T4_BLACK_MAKEUP[_k]

_W_DEC = {v: (k, False) for k, v in _T4_WHITE_TERM.items()}
_W_DEC.update({v: (k, True) for k, v in _T4_WHITE_MAKEUP.items()})
_B_DEC = {v: (k, False) for k, v in _T4_BLACK_TERM.items()}
_B_DEC.update({v: (k, True) for k, v in _T4_BLACK_MAKEUP.items()})

_V_CODES = {0: "1", 1: "011", 2: "000011", 3: "0000011",
            -1: "010", -2: "000010", -3: "0000010"}


class _FaxBits:
    """MSB-first bit reader over one strip."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("fax stream truncated")
        b = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(bits: _FaxBits, white: bool) -> int:
    """One complete run length: make-up codes accumulate until a
    terminating code lands (T.4 §4.1.3). Raises on any non-code."""
    cmap = _W_DEC if white else _B_DEC
    total = 0
    while True:
        code = ""
        while True:
            if len(code) > 13:
                raise ValueError(f"bad T.4 run code {code!r}")
            code += str(bits.bit())
            hit = cmap.get(code)
            if hit is not None:
                val, is_makeup = hit
                total += val
                if not is_makeup:
                    return total
                code = ""
                break


def _transitions(row: np.ndarray) -> np.ndarray:
    """Changing-element positions (first pixel of each new run),
    relative to the imaginary WHITE pixel before the line — a row
    starting black has a changing element at 0 (T.4 §4.2.1.3.1)."""
    padded = np.concatenate((np.zeros(1, row.dtype), row))
    return np.flatnonzero(padded[1:] != padded[:-1])


def _emit_run(out: list, run: int, white: bool) -> None:
    term, makeup = ((_T4_WHITE_TERM, _T4_WHITE_MAKEUP) if white
                    else (_T4_BLACK_TERM, _T4_BLACK_MAKEUP))
    while run >= 64:
        chunk = min((run // 64) * 64, 2560)
        out.append(makeup[chunk])
        run -= chunk
    out.append(term[run])


def _pack_bits(bits: list) -> bytes:
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def decode_mh(data: bytes, width: int, height: int) -> np.ndarray:
    """TIFF compression 2 (T.4 one-dimensional MH, byte-aligned rows)
    -> (H, W) uint8 of 0 (white) / 1 (black)."""
    bits = _FaxBits(data)
    rows = np.zeros((height, width), np.uint8)
    for r in range(height):
        bits.align()
        rows[r] = _decode_1d_row(bits, width)
    return rows


def encode_mh(img: np.ndarray) -> bytes:
    """The write twin of :func:`decode_mh` (rows byte-aligned, leading
    white run, make-up + terminating split per T.4)."""
    h, w = img.shape
    out = bytearray()
    for r in range(h):
        bits: list = []
        row = img[r]
        x = 0
        white = True
        while x < w:
            want = 0 if white else 1
            run = 0
            while x + run < w and row[x + run] == want:
                run += 1
            _emit_run(bits, run, white)
            x += run
            white = not white
        out += _pack_bits(bits)
    return bytes(out)


def _b1_b2(ref_tr: np.ndarray, a0: int, color: int, width: int) -> tuple:
    """(b1, b2) via binary search: transitions alternate colors starting
    black (the imaginary pixel before the line is white), so the first
    opposite-color changing element right of a0 is the parity-adjusted
    ``searchsorted`` hit — O(log n) per lookup instead of the O(n)
    rescan flagged by ADVICE r12 (dense rows were O(width^2))."""
    i = int(np.searchsorted(ref_tr, a0, side="right"))
    # transition index parity == color it flips TO: even -> black(1),
    # odd -> white(0). Want ref[t] != color.
    if (i & 1) != (0 if color == 0 else 1):
        i += 1
    n = len(ref_tr)
    b1 = int(ref_tr[i]) if i < n else width
    b2 = int(ref_tr[i + 1]) if i + 1 < n else width
    return b1, b2


def _decode_2d_row(bits: _FaxBits, ref: np.ndarray, width: int) -> np.ndarray:
    """One 2D-coded line against ``ref`` (T.4 §4.2.1 / T.6 §2.2) —
    shared by G4 and the 2D lines of G3."""
    cur = np.zeros(width, np.uint8)
    ref_tr = _transitions(ref)
    a0 = -1
    color = 0
    while a0 < width:
            b1, b2 = _b1_b2(ref_tr, a0, color, width)
            # mode code (prefix-free: 1 / 011 / 010 / 001 / 0001 /
            # 000011 / 000010 / 0000011 / 0000010)
            code = ""
            while True:
                if len(code) > 7:
                    raise ValueError(f"bad T.6 mode code {code!r}")
                code += str(bits.bit())
                if code == "1":
                    a1 = b1
                    break
                if code in ("011", "010"):
                    a1 = b1 + (1 if code == "011" else -1)
                    break
                if code == "001":  # horizontal: two MH runs
                    start = a0 if a0 > 0 else 0
                    r1 = _read_run(bits, color == 0)
                    r2 = _read_run(bits, color != 0)
                    a1 = start + r1
                    a2 = a1 + r2
                    if a2 > width:
                        raise ValueError("T.6 horizontal runs overflow row")
                    if color == 0:
                        cur[a1:a2] = 1
                    else:
                        cur[start:a1] = 1
                    a0 = a2
                    a1 = None
                    break
                if code == "0001":  # pass
                    start = a0 if a0 > 0 else 0
                    if color == 1:
                        cur[start:b2] = 1
                    a0 = b2
                    a1 = None
                    break
                if code in ("000011", "000010"):
                    a1 = b1 + (2 if code == "000011" else -2)
                    break
                if code in ("0000011", "0000010"):
                    a1 = b1 + (3 if code == "0000011" else -3)
                    break
            if a1 is None:
                continue
            if not -1 <= a1 <= width:
                raise ValueError("T.6 vertical mode leaves the row")
            start = a0 if a0 > 0 else 0
            if color == 1:
                cur[start:min(a1, width)] = 1
            a0 = a1
            color ^= 1
    return cur


def _decode_1d_row(bits: _FaxBits, width: int) -> np.ndarray:
    """One MH-coded line (alternating runs starting white)."""
    row = np.zeros(width, np.uint8)
    x = 0
    white = True
    while x < width:
        run = _read_run(bits, white)
        if x + run > width:
            raise ValueError("MH run overflows the row")
        if not white:
            row[x:x + run] = 1
        x += run
        white = not white
    return row


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """TIFF compression 4 (T.6 Group 4 / MMR) -> (H, W) uint8 of
    0 (white) / 1 (black). The reference line starts all-white."""
    bits = _FaxBits(data)
    rows = np.zeros((height, width), np.uint8)
    ref = np.zeros(width, np.uint8)
    for r in range(height):
        cur = _decode_2d_row(bits, ref, width)
        rows[r] = cur
        ref = cur
    return rows


def _expect_eol(bits: _FaxBits) -> None:
    """Consume an EOL (>=11 zero bits then a 1 — any extra zeros are
    T.4 fill bits, accepted unconditionally)."""
    zeros = 0
    while True:
        b = bits.bit()
        if b == 0:
            zeros += 1
            continue
        if zeros < 11:
            raise ValueError(f"expected T.4 EOL, got 1 after {zeros} zeros")
        return


def decode_g3(data: bytes, width: int, height: int,
              two_d: bool = False) -> np.ndarray:
    """TIFF compression 3 (T.4 Group 3): an EOL precedes every line
    (fill bits tolerated); with ``two_d`` (T4Options bit 0) each EOL
    carries a tag bit selecting a 1D (MH) or 2D (against the previous
    line) coding for the next row. -> (H, W) uint8 of 0/1."""
    bits = _FaxBits(data)
    rows = np.zeros((height, width), np.uint8)
    ref = np.zeros(width, np.uint8)
    for r in range(height):
        _expect_eol(bits)
        one_d = True
        if two_d:
            one_d = bits.bit() == 1
        cur = (_decode_1d_row(bits, width) if one_d
               else _decode_2d_row(bits, ref, width))
        rows[r] = cur
        ref = cur
    return rows


def encode_g3(img: np.ndarray) -> bytes:
    """The write twin of :func:`decode_g3` (1D lines only — the form
    libtiff writes by default for compression 3): EOL + MH runs per
    row, no fill."""
    h, w = img.shape
    bits: list = []
    for r in range(h):
        bits.append("000000000001")  # EOL
        row = img[r]
        x = 0
        white = True
        while x < w:
            want = 0 if white else 1
            run = 0
            while x + run < w and row[x + run] == want:
                run += 1
            _emit_run(bits, run, white)
            x += run
            white = not white
    return _pack_bits(bits)


def encode_g4(img: np.ndarray) -> bytes:
    """The write twin of :func:`decode_g4`: greedy pass / vertical /
    horizontal selection per T.6 §2.2.3 (pass when b2 < a1, vertical
    when |a1 - b1| <= 3, horizontal otherwise)."""
    h, w = img.shape
    bits: list = []
    ref = np.zeros(w, np.uint8)
    for r in range(h):
        cur = np.ascontiguousarray(img[r])
        cur_tr = _transitions(cur)
        ref_tr = _transitions(ref)
        a0 = -1
        color = 0
        n_cur = len(cur_tr)
        while a0 < w:
            # a1 = next changing element right of a0 on the coding line;
            # the run cur[a0..a1) is all `color`, so the first transition
            # after a0 flips to !color — plain searchsorted suffices.
            ia = int(np.searchsorted(cur_tr, a0, side="right"))
            a1 = int(cur_tr[ia]) if ia < n_cur else w
            b1, b2 = _b1_b2(ref_tr, a0, color, w)
            if b2 < a1:
                bits.append("0001")
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                bits.append(_V_CODES[d])
                a0 = a1
                color ^= 1
                continue
            a2 = int(cur_tr[ia + 1]) if ia + 1 < n_cur else w
            bits.append("001")
            start = a0 if a0 > 0 else 0
            _emit_run(bits, a1 - start, color == 0)
            _emit_run(bits, a2 - a1, color != 0)
            a0 = a2
        ref = cur
    return _pack_bits(bits)
