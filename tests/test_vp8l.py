"""VP8L (lossless WebP) codec tests.

Self-contained tests always run; the cross-codec checks against the
system libwebp (both directions: libwebp decodes our streams, we decode
libwebp's transform-rich streams) run whenever the shared library is
loadable — which pins the bit conventions, the canonical prefix coding,
and the empirically-derived 120-entry distance table against the
reference implementation rather than against our own mirror image.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from routing_algorithm_for_graph_dbs_spark.operators import vp8l


def _libwebp():
    for name in ("libwebp.so.7", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lw = ctypes.CDLL(name)
        except OSError:
            continue
        lw.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lw.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
        lw.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        return lw
    return None


_LW = _libwebp()
needs_libwebp = pytest.mark.skipif(
    _LW is None, reason="system libwebp not available"
)


def _lw_encode(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    out = ctypes.c_void_p()
    n = _LW.WebPEncodeLosslessRGBA(img.tobytes(), w, h, w * 4,
                                   ctypes.byref(out))
    assert n > 0
    buf = ctypes.string_at(out, n)
    _LW.WebPFree(out)
    return buf


def _lw_decode(buf: bytes) -> np.ndarray:
    w, h = ctypes.c_int(), ctypes.c_int()
    ptr = _LW.WebPDecodeRGBA(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    assert ptr
    dec = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()
    _LW.WebPFree(ptr)
    return dec


def test_vp8l_self_roundtrip():
    """Our encoder -> our decoder, across channel counts, shapes, and
    the code-length corner cases (single-symbol zero-bit codes, simple
    two-symbol codes, deep skewed Huffman trees)."""
    rng = np.random.RandomState(5)
    cases = [
        rng.randint(0, 256, (7, 11, 4), dtype=np.uint8),
        rng.randint(0, 256, (1, 1, 3), dtype=np.uint8),
        np.full((4, 9, 3), 201, dtype=np.uint8),          # all single-symbol
        rng.randint(0, 2, (6, 6, 4), dtype=np.uint8) * 200,  # simple codes
        rng.randint(0, 256, (33, 17, 4), dtype=np.uint8),
    ]
    # pathological skew forces the length-limit repair path
    skew = np.zeros((64, 64, 3), dtype=np.uint8)
    flat = skew[..., 1].reshape(-1)
    v, i, k = 0, 0, 1
    while i < flat.size:
        flat[i:i + k] = v % 256
        i += k
        v += 1
        k *= 2
    cases.append(skew)
    for img in cases:
        dec = vp8l.decode_webp_lossless(vp8l.encode_webp_lossless(img))
        exp = (img if img.shape[2] == 4 else
               np.dstack([img, np.full(img.shape[:2], 255, np.uint8)]))
        assert (dec == exp).all()


def test_vp8l_encoder_pathological_alphabets():
    """Round-11 self-review regressions: (a) depth-limited Huffman must
    repair Kraft to EXACTLY 1 (Fibonacci-skewed frequencies drove the
    old one-phase repair below 1 — undecodable streams); (b) a plane
    whose 256 values are all equally frequent yields a single-symbol
    code-length code, which transmits ZERO bits per symbol."""
    vals = []
    a, b, v = 1, 1, 0
    while len(vals) < 3000:
        vals.extend([v % 256] * a)
        a, b = b, a + b
        v += 1
    img = np.zeros((50, 60, 4), np.uint8)
    img[..., 3] = 255
    img[..., 1].reshape(-1)[:3000] = vals[:3000]
    p = vp8l.encode_webp_lossless(img)
    assert (vp8l.decode_webp_lossless(p) == img).all()

    img2 = np.zeros((16, 16, 4), np.uint8)
    img2[..., 3] = 255
    img2[..., 0].reshape(-1)[:] = np.arange(256)
    p2 = vp8l.encode_webp_lossless(img2)
    assert (vp8l.decode_webp_lossless(p2) == img2).all()

    # Kraft exactness across random skew profiles
    rng = np.random.RandomState(0)
    for _ in range(100):
        n = rng.randint(2, 300)
        freqs = [0] * 300
        for s in range(n):
            freqs[s] = int(2 ** rng.uniform(0, 30))
        lens = vp8l._huffman_lengths(freqs)
        if len(lens) > 1:
            assert sum(1 << (15 - ln) for ln in lens.values()) == 1 << 15


@needs_libwebp
def test_vp8l_pathological_alphabets_vs_libwebp():
    vals = []
    a, b, v = 1, 1, 0
    while len(vals) < 3000:
        vals.extend([v % 256] * a)
        a, b = b, a + b
        v += 1
    img = np.zeros((50, 60, 4), np.uint8)
    img[..., 3] = 255
    img[..., 1].reshape(-1)[:3000] = vals[:3000]
    assert (_lw_decode(vp8l.encode_webp_lossless(img)) == img).all()
    img2 = np.zeros((16, 16, 4), np.uint8)
    img2[..., 3] = 255
    img2[..., 0].reshape(-1)[:] = np.arange(256)
    assert (_lw_decode(vp8l.encode_webp_lossless(img2)) == img2).all()


def test_vp8l_golden_bits():
    """Hand-derivable golden: a 1x1 constant pixel stream is exactly the
    header (8+14+14+1+3 bits) + 3 zero flag bits + five simple
    prefix-code headers + zero per-pixel bits (single-symbol codes
    transmit nothing)."""
    img = np.zeros((1, 1, 4), dtype=np.uint8)
    img[0, 0] = (7, 9, 11, 255)
    p = vp8l.encode_webp_lossless(img)
    assert p[:4] == b"RIFF" and p[8:12] == b"WEBP" and p[12:16] == b"VP8L"
    body = p[20:]
    br = vp8l._LsbReader(body)
    assert br.read(8) == 0x2F
    assert br.read(14) + 1 == 1 and br.read(14) + 1 == 1
    assert br.read(1) == 0 and br.read(3) == 0  # alpha hint, version
    assert br.read(3) == 0  # no transform, no cache, no meta
    for expected in (9, 7, 11, 255, 0):  # green, red, blue, alpha, dist
        assert br.read(1) == 1  # simple
        assert br.read(1) == 0  # one symbol
        wide = br.read(1)
        assert br.read(8 if wide else 1) == expected
    assert (dec := vp8l.decode_webp_lossless(p)).shape == (1, 1, 4)
    assert dec[0, 0].tolist() == [7, 9, 11, 255]


def test_vp8l_reject_paths():
    with pytest.raises(ValueError, match="RIFF"):
        vp8l.decode_webp_lossless(b"not a webp at all")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    p = bytearray(vp8l.encode_webp_lossless(img))
    p[20] ^= 0xFF  # VP8L signature byte
    with pytest.raises(ValueError, match="signature"):
        vp8l.decode_webp_lossless(bytes(p))
    # truncation inside the entropy stream
    q = vp8l.encode_webp_lossless(
        np.arange(2 * 300 * 4, dtype=np.uint8).reshape(2, 300, 4) % 251
    )
    with pytest.raises(ValueError, match="truncated"):
        vp8l.decode_vp8l(q[20:len(q) - 8])
    # lossy VP8 stays the boundary
    from routing_algorithm_for_graph_dbs_spark.operators.webp import build_webp

    with pytest.raises(NotImplementedError, match="lossy"):
        vp8l.decode_webp_lossless(build_webp(16, 16, flavor="lossy"))


def test_vp8l_distance_table_invariants():
    """The embedded plane-code table: 120 unique in-scanline-order
    offsets (dy > 0, or dy == 0 and dx > 0), |dx| <= 8, dy <= 7 except
    the pure-left codes, first entries per the spec's near-neighbor
    intent."""
    t = vp8l._DIST_TABLE
    assert len(t) == 120 and len(set(t)) == 120
    for dx, dy in t:
        assert (dy > 0 or dx > 0) and abs(dx) <= 8 and 0 <= dy <= 8
    assert t[0] == (0, 1) and t[1] == (1, 0) and t[2] == (1, 1)
    # mapping: code > 120 is a plain distance; near codes clamp to >= 1
    assert vp8l._plane_code_to_distance(10, 121) == 1
    assert vp8l._plane_code_to_distance(10, 1) == 10   # (0,1) -> one row
    assert vp8l._plane_code_to_distance(10, 2) == 1    # (1,0) -> one px
    assert vp8l._plane_code_to_distance(10, 4) == 9    # (-1,1) -> w-1


@needs_libwebp
def test_vp8l_libwebp_decodes_our_streams():
    rng = np.random.RandomState(42)
    for t in range(40):
        h, w = rng.randint(1, 20), rng.randint(1, 20)
        nvals = rng.randint(1, 50)
        img = (rng.randint(0, nvals, (h, w, 4))
               * max(1, 255 // max(1, nvals - 1))).astype(np.uint8)
        if t % 3 == 0:
            img[..., 3] = 255
        dec = _lw_decode(_lw_encode(img))  # warm sanity for the ABI
        assert dec.shape[:2] == (h, w)
        ours = vp8l.encode_webp_lossless(img)
        assert (_lw_decode(ours) == img).all(), (h, w, nvals)


@needs_libwebp
def test_vp8l_we_decode_libwebp_streams():
    """The decisive direction: libwebp's default encoder output uses the
    full spec — subtract-green, predictor blocks, cross-color, palette
    indexing with sub-byte packing, color cache, meta prefix groups,
    and LZ77 over the 2-D distance table. Our decode must match
    libwebp's own decode bit-exactly on every family."""
    rng = np.random.RandomState(9)
    imgs = []
    for _ in range(4):
        h, w = rng.randint(1, 60), rng.randint(1, 60)
        imgs.append(rng.randint(0, 256, (h, w, 4), dtype=np.uint8))
    for t in range(3):
        h, w = rng.randint(8, 70), rng.randint(8, 70)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.zeros((h, w, 4), np.uint8)
        img[..., 0] = (xx * 3 + t) % 256
        img[..., 1] = (yy * 5) % 256
        img[..., 2] = (xx + yy) % 256
        img[..., 3] = 255
        imgs.append(img)
    for npal in (2, 3, 4, 9, 16, 17, 200):  # every packing width
        pal = rng.randint(0, 256, (npal, 4), dtype=np.uint8)
        pal[:, 3] = 255
        imgs.append(pal[rng.randint(0, npal, (30, 41))])
    tile = rng.randint(0, 256, (4, 6, 4), dtype=np.uint8)
    imgs.append(np.tile(tile, (8, 7, 1)))
    h, w = 160, 200
    yy, xx = np.mgrid[0:h, 0:w]
    photo = np.zeros((h, w, 4), np.uint8)
    photo[..., 0] = (128 + 60 * np.sin(xx / 17) + 40 * np.cos(yy / 11)
                     ).astype(np.uint8)
    photo[..., 1] = (128 + 50 * np.sin((xx + yy) / 23)).astype(np.uint8)
    photo[..., 2] = (xx * yy % 251).astype(np.uint8)
    photo[..., 3] = 255
    imgs.append(photo)
    base = rng.randint(80, 170, (40, 50, 1)).astype(np.int16)
    smooth = np.clip(
        np.concatenate(
            [base + rng.randint(-20, 20, (40, 50, 1)) for _ in range(3)]
            + [np.full((40, 50, 1), 255)], -1,
        ), 0, 255,
    ).astype(np.uint8)
    imgs.append(smooth)
    for img in imgs:
        buf = _lw_encode(img)
        ref = _lw_decode(buf)  # the encoder may zero RGB under alpha=0
        assert (vp8l.decode_webp_lossless(buf) == ref).all(), img.shape


def _single(w, sym):
    w.write(1, 1)
    w.write(0, 1)
    if sym <= 1:
        w.write(0, 1)
        w.write(sym, 1)
    else:
        w.write(1, 1)
        w.write(sym, 8)


def _hand_stream_with_transform(ttype, cte_pixel, W_, H_, rng):
    """Raw VP8L stream: one whole-image transform block whose element
    pixel is ``cte_pixel`` (green = predictor mode for type 0; B/G/R =
    the three cross-color deltas for type 1), then literal random
    residuals — lets a test drive EVERY per-mode branch instead of the
    subset libwebp's encoder happens to pick."""
    import struct

    w = vp8l._LsbWriter()
    w.write(0x2F, 8)
    w.write(W_ - 1, 14)
    w.write(H_ - 1, 14)
    w.write(0, 4)
    w.write(1, 1)
    w.write(ttype, 2)
    w.write(7, 3)                    # size_bits 9 -> one 512-px block
    w.write(0, 1)                    # sub-image: no color cache
    a, r, g, b = ((cte_pixel >> s) & 0xFF for s in (24, 16, 8, 0))
    _single(w, g)
    _single(w, r)
    _single(w, b)
    _single(w, a)
    _single(w, 0)                    # distance
    w.write(0, 1)                    # end of transforms
    w.write(0, 1)                    # no cache
    w.write(0, 1)                    # no meta
    planes = [rng.randint(0, 256, W_ * H_) for _ in range(4)]
    codes = []
    for plane, size in zip(planes, (280, 256, 256, 256)):
        freqs = [0] * size
        for v in plane:
            freqs[v] += 1
        lens = vp8l._huffman_lengths(freqs)
        vp8l._write_prefix_code(w, lens, size)
        if len(lens) == 1:
            codes.append({next(iter(lens)): (0, 0)})
        else:
            codes.append(vp8l._canonical_codes(
                [lens.get(i, 0) for i in range(size)]))
    _single(w, 0)                    # distance code for the main image
    for i in range(W_ * H_):
        for plane, tbl in zip(planes, codes):
            c, ln = tbl[int(plane[i])]
            w.write_code(c, ln)
    body = w.getvalue()
    pad = b"\x00" if len(body) & 1 else b""
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body + pad
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


@needs_libwebp
def test_vp8l_every_predictor_mode_vs_libwebp():
    """libwebp's encoder only picks winning modes, so the roundtrip fuzz
    cannot guarantee coverage of all 14 — drive each one explicitly
    over random residuals and compare bit-exactly."""
    rng = np.random.RandomState(77)
    for mode in range(14):
        p = _hand_stream_with_transform(0, mode << 8, 9, 7, rng)
        assert (vp8l.decode_webp_lossless(p) == _lw_decode(p)).all(), mode


@needs_libwebp
def test_vp8l_cross_color_deltas_vs_libwebp():
    """Random signed 3.5-fixed-point cross-color elements (green_to_red
    in B, green_to_blue in G, red_to_blue in R) over random residuals —
    pins the arithmetic-shift fixed-point semantics against libwebp."""
    rng = np.random.RandomState(78)
    for _ in range(12):
        g2r, g2b, r2b = (int(v) for v in rng.randint(0, 256, 3))
        cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        p = _hand_stream_with_transform(1, cte, 11, 5, rng)
        assert (vp8l.decode_webp_lossless(p) == _lw_decode(p)).all(), (
            g2r, g2b, r2b)


def _write_entropy_literals(w, pixels):
    """No-cache literal entropy image over uint32 ARGB pixels (the
    sub-image body shared by the combo builder)."""
    w.write(0, 1)  # no color cache
    planes = [[(p >> 8) & 0xFF for p in pixels],
              [(p >> 16) & 0xFF for p in pixels],
              [p & 0xFF for p in pixels],
              [(p >> 24) & 0xFF for p in pixels]]
    codes = []
    for plane, size in zip(planes, (280, 256, 256, 256)):
        freqs = [0] * size
        for v in plane:
            freqs[v] += 1
        lens = vp8l._huffman_lengths(freqs)
        vp8l._write_prefix_code(w, lens, size)
        if len(lens) == 1:
            codes.append({next(iter(lens)): (0, 0)})
        else:
            codes.append(vp8l._canonical_codes(
                [lens.get(i, 0) for i in range(size)]))
    _single(w, 0)  # distance
    for i in range(len(pixels)):
        for plane, tbl in zip(planes, codes):
            c, ln = tbl[plane[i]]
            w.write_code(c, ln)


def _hand_stream_with_combo(transform_specs, W_, H_, rng):
    """Raw VP8L stream with an ARBITRARY transform list — spec-legal
    combinations libwebp's encoder never emits (it picks at most
    pred+xcolor or palette or subgreen), so only a hand build can pin
    the decoder's inverse ORDERING and the packed-width bookkeeping."""
    import struct

    w = vp8l._LsbWriter()
    w.write(0x2F, 8)
    w.write(W_ - 1, 14)
    w.write(H_ - 1, 14)
    w.write(0, 4)
    w_cur = W_
    max_green = 256
    for spec in transform_specs:
        w.write(1, 1)
        t = spec[0]
        w.write(t, 2)
        if t in (0, 1):
            w.write(7, 3)  # 512-px blocks: one block per sub-image here
            bw = (w_cur + 511) // 512
            bh = (H_ + 511) // 512
            _write_entropy_literals(w, [spec[1]] * (bw * bh))
        elif t == 3:
            n_colors = spec[1]
            w.write(n_colors - 1, 8)
            deltas = [int(x) for x in
                      rng.randint(0, 2**32, n_colors, dtype=np.uint64)]
            _write_entropy_literals(w, deltas)
            if n_colors <= 2:
                pb, max_green = 3, 256
            elif n_colors <= 4:
                pb, max_green = 2, 256
            elif n_colors <= 16:
                pb, max_green = 1, 256
            else:
                pb, max_green = 0, n_colors
            if pb:
                w_cur = (w_cur + (1 << pb) - 1) >> pb
    w.write(0, 1)  # end of transforms
    w.write(0, 1)  # no color cache (main image)
    w.write(0, 1)  # no meta prefix image
    n = w_cur * H_
    pixels = [
        (255 << 24)
        | (int(rng.randint(0, 256)) << 16)
        | (int(rng.randint(0, max_green)) << 8)
        | int(rng.randint(0, 256))
        for _ in range(n)
    ]
    planes = [[(p >> 8) & 0xFF for p in pixels],
              [(p >> 16) & 0xFF for p in pixels],
              [p & 0xFF for p in pixels],
              [(p >> 24) & 0xFF for p in pixels]]
    codes = []
    for plane, size in zip(planes, (280, 256, 256, 256)):
        freqs = [0] * size
        for v in plane:
            freqs[v] += 1
        lens = vp8l._huffman_lengths(freqs)
        vp8l._write_prefix_code(w, lens, size)
        if len(lens) == 1:
            codes.append({next(iter(lens)): (0, 0)})
        else:
            codes.append(vp8l._canonical_codes(
                [lens.get(i, 0) for i in range(size)]))
    _single(w, 0)
    for i in range(n):
        for plane, tbl in zip(planes, codes):
            c, ln = tbl[plane[i]]
            w.write_code(c, ln)
    body = w.getvalue()
    pad = b"\x00" if len(body) & 1 else b""
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body + pad
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


@needs_libwebp
def test_vp8l_transform_combos_vs_libwebp():
    """Spec-legal multi-transform combinations (incl. all-three chains
    and palette packing under other transforms) decode bit-identically
    to libwebp — pins inverse ordering and the per-transform effective
    width, which the encoder-driven fuzz can never reach."""
    rng = np.random.RandomState(99)
    xcolor = (0xFF << 24) | (0x55 << 16) | (0xAA << 8) | 0x33
    combos = [
        [(2, None), (0, 11 << 8)],
        [(0, 13 << 8), (2, None)],
        [(2, None), (1, xcolor)],
        [(0, 5 << 8), (1, (0xFF << 24) | (17 << 16) | (200 << 8) | 99),
         (2, None)],
        [(2, None), (3, 16)],
        [(0, 7 << 8), (3, 4)],
        [(1, (0xFF << 24) | (1 << 16) | (2 << 8) | 3), (3, 200)],
        [(2, None), (0, 12 << 8), (3, 2)],
    ]
    for combo in combos:
        p = _hand_stream_with_combo(combo, 21, 9, rng)
        assert (vp8l.decode_webp_lossless(p) == _lw_decode(p)).all(), combo


@needs_libwebp
def test_vp8l_distance_table_rederived():
    """Re-derive every (dx, dy) entry with single-back-reference probe
    streams decoded by libwebp — the embedded constant must match the
    reference implementation exactly."""
    import struct

    W_, H_ = 17, 10
    PRE = 9 * W_ + 9

    def dist_sym(c):
        if c <= 4:
            return c - 1, 0, 0
        for sym in range(4, 40):
            extra = (sym - 2) >> 1
            lo = ((2 + (sym & 1)) << extra) + 1
            if lo <= c < lo + (1 << extra):
                return sym, extra, c - lo
        raise AssertionError

    def probe(code):
        w = vp8l._LsbWriter()
        w.write(0x2F, 8)
        w.write(W_ - 1, 14)
        w.write(H_ - 1, 14)
        w.write(0, 4)
        w.write(0, 3)  # no transform/cache/meta
        n = W_ * H_
        greens = [i % 256 for i in range(n)]
        reds = [i // 256 for i in range(n)]
        gfreq = [0] * 280
        for i in list(range(PRE)) + list(range(PRE + 1, n)):
            gfreq[greens[i]] += 1
        gfreq[256] += 1
        glen = vp8l._huffman_lengths(gfreq)
        vp8l._write_prefix_code(w, glen, 280)
        gcodes = vp8l._canonical_codes([glen.get(s, 0) for s in range(280)])
        rfreq = [0] * 256
        for i in list(range(PRE)) + list(range(PRE + 1, n)):
            rfreq[reds[i]] += 1
        rlen = vp8l._huffman_lengths(rfreq)
        vp8l._write_prefix_code(w, rlen, 256)
        rcodes = ({next(iter(rlen)): (0, 0)} if len(rlen) == 1 else
                  vp8l._canonical_codes([rlen.get(s, 0) for s in range(256)]))
        for sym in (0, 255):
            vp8l._write_prefix_code(w, {sym: 1}, 256)
        dsym, dextra, dval = dist_sym(code)
        vp8l._write_prefix_code(w, {dsym: 1}, 40)
        for i in range(n):
            if i == PRE:
                c, ln = gcodes[256]
                w.write_code(c, ln)
                if dextra:
                    w.write(dval, dextra)
                continue
            c, ln = gcodes[greens[i]]
            w.write_code(c, ln)
            c, ln = rcodes[reds[i]]
            w.write_code(c, ln)
        body = w.getvalue()
        pad = b"\x00" if len(body) & 1 else b""
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body + pad
        p = (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk)
        dec = _lw_decode(p)
        y, x = divmod(PRE, W_)
        src = int(dec[y, x, 0]) * 256 + int(dec[y, x, 1])
        dist = PRE - src
        dy = (dist + 8) // W_
        return dist - W_ * dy, dy

    derived = [probe(c) for c in range(1, 121)]
    assert derived == vp8l._DIST_TABLE
