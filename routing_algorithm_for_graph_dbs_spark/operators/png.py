"""REAL pure-Python PNG codec (stdlib ``zlib`` + numpy) — no image lib.

Closes most of the remaining image-codec boundary in
``operators/multimodal.py``: a training-data pipeline's image corpus is
overwhelmingly JPEG + PNG, and this container ships neither PIL nor
libvips. Everything a PNG needs is implementable from the public spec
(RFC 2083 / W3C PNG) with stdlib zlib for the DEFLATE stream:

- chunk framing with CRC-32 verification (``zlib.crc32``),
- IHDR/PLTE/tRNS/IDAT/IEND parsing (ancillary chunks skipped),
- scanline unfiltering for all five filter types (None/Sub/Up/
  Average/Paeth), vectorized per row — Sub is a per-byte-lane modular
  prefix sum, Up a previous-row add; Average/Paeth carry a true
  sequential dependency along x and run as a bounded per-pixel loop,
- color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA) at every legal bit depth (round 8: 16-bit — filtering is
  byte-oriented per the spec, so the unfilter core is shared, and
  samples downconvert to their high byte; 1/2/4-bit gray and palette —
  MSB-first bit unpacking, gray scaled by the exact 255/(2^d - 1)
  factor).

- Adam7 interlacing (round 8): seven independently-filtered
  sub-images through the same unfilter core, scattered back onto the
  full grid.

Every legal bit depth / color type / interlace combination decodes
(round 8 closed the boundary); only malformed payloads raise
(``ValueError``).

The encoder exists to mint REAL golden bytes for tests and the sink
path — it can emit every filter type so the decoder's unfiltering is
exercised against ground-truth pixels, not just filter-0 output.

Scale shape: one payload decodes independently inside an Arrow batch
(``multimodal.image_features`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> raw channels per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass origins and strides: (x0, y0, dx, dy) — spec 8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunks(payload: bytes):
    """Yield (type, data) for each chunk, verifying length and CRC."""
    pos = len(PNG_SIGNATURE)
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data_end = pos + 8 + length
        if data_end + 4 > n:
            raise ValueError("PNG chunk truncated")
        data = payload[pos + 8 : data_end]
        (crc,) = struct.unpack_from(">I", payload, data_end)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos = data_end + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND chunk")


def _unfilter(raw: bytes, stride: int, height: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering -> (height, stride) uint8 bytes.

    ``stride`` = filtered bytes per row; ``bpp`` = the filter's
    left-neighbor offset in bytes (max(1, channels * depth // 8) per the
    spec — sub-byte depths filter with a one-byte offset)."""
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG pixel stream truncated after inflate")
    lines = np.frombuffer(
        raw, dtype=np.uint8, count=height * (stride + 1)
    ).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(lines[y, 0])
        row = lines[y, 1:].copy()
        if ftype == 0:  # None
            cur = row
        elif ftype == 1:  # Sub: modular prefix sum per byte lane
            cur = (
                np.cumsum(row.reshape(-1, bpp).astype(np.uint64), axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ftype == 2:  # Up
            cur = row + prev
        elif ftype == 3:  # Average — sequential in x
            cur = row
            cur[:bpp] += (prev[:bpp] // 2).astype(np.uint8)
            for x in range(bpp, stride, bpp):
                left = cur[x - bpp : x].astype(np.uint16)
                up = prev[x : x + bpp].astype(np.uint16)
                cur[x : x + bpp] += ((left + up) // 2).astype(np.uint8)
        elif ftype == 4:  # Paeth — sequential in x
            cur = row
            cur[:bpp] += prev[:bpp]  # a=c=0 -> predictor = b
            for x in range(bpp, stride, bpp):
                a = cur[x - bpp : x].astype(np.int16)
                b = prev[x : x + bpp].astype(np.int16)
                c = prev[x - bpp : x].astype(np.int16)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                ).astype(np.uint8)
                cur[x : x + bpp] += pred
        else:
            raise ValueError(f"PNG filter type {ftype} is invalid")
        out[y] = cur
        prev = cur
    return out


def decode_png_pixels(payload: bytes) -> np.ndarray:
    """Decode a PNG of any legal bit depth / color type / interlace
    combination to an (H, W, C) uint8 array (palette expanded to RGB;
    C = 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA; 16-bit samples keep their
    high byte, sub-byte gray scales to the full 8-bit range) — the
    pixel-level entry the real pHash / resize operators build on."""
    if len(payload) < 8 or payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if comp != 0 or filt != 0:
                raise ValueError("unknown PNG compression/filter method")
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise ValueError("bad PLTE length")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if width == 0 or height == 0:
        raise ValueError(f"bad PNG dimensions {width}x{height}")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG color type {color_type} is invalid")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} is invalid")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG bit depth {bit_depth} is invalid")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"bit depth {bit_depth} with color type {color_type} is not a"
            " legal combination"
        )
    if bit_depth == 16 and color_type == 3:
        raise ValueError("16-bit palette PNG is not a legal combination")
    if not idat:
        raise ValueError("PNG missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc

    nch = _CHANNELS[color_type]
    # filtering is BYTE-oriented (spec 6.2): the left-neighbor offset
    # floors to one byte at sub-byte depths
    fbpp = max(1, nch * bit_depth // 8)

    def rows_to_px(rows: np.ndarray, pw: int, ph: int) -> np.ndarray:
        """Unfiltered byte rows -> (ph, pw, nch) uint8 raw samples."""
        if bit_depth == 16:
            # big-endian sample pairs -> high byte = floor(v / 256), the
            # standard 16->8 downconversion; output contract stays uint8
            return np.ascontiguousarray(rows.reshape(ph, pw, nch, 2)[..., 0])
        if bit_depth == 8:
            return rows.reshape(ph, pw, nch)
        # sub-byte gray/palette samples, MSB-first packing (spec 7.2)
        bits = np.unpackbits(rows, axis=1)[:, : pw * bit_depth]
        groups = bits.reshape(ph, pw, bit_depth).astype(np.uint8)
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        return (groups * weights).sum(axis=2).astype(np.uint8)[..., None]

    def consume(pos: int, pw: int, ph: int):
        row_bytes = (pw * nch * bit_depth + 7) // 8
        n_bytes = ph * (row_bytes + 1)
        rows = _unfilter(raw[pos : pos + n_bytes], row_bytes, ph, fbpp)
        return rows_to_px(rows, pw, ph), pos + n_bytes

    if interlace:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the full grid (empty passes contribute no bytes at all)
        px = np.zeros((height, width, nch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(width - x0) // dx))
            ph = max(0, -(-(height - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            sub, pos = consume(pos, pw, ph)
            px[y0::dy, x0::dx] = sub
    else:
        px, _ = consume(0, width, height)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        if int(px.max()) >= len(palette):
            raise ValueError("palette index out of range")
        px = palette[px[..., 0]]  # -> (h, w, 3)
    elif bit_depth < 8:
        # scale gray samples to the full 8-bit range: 255/(2^d - 1) is
        # an exact integer for d in {1, 2, 4} (255, 85, 17)
        px = px * np.uint8(255 // ((1 << bit_depth) - 1))
    return px


def decode_png(payload: bytes):
    """Decode a PNG (any legal depth/color/interlace combination) to
    ``(width, height, n_channels, mean_luma)`` — the same contract as
    ``multimodal.decode_bmp`` (mean_luma = Rec.601 over RGB, gray value
    for grayscale, normalized to [0, 1], rounded to 6; alpha ignored).
    """
    px = decode_png_pixels(payload)
    height, width, n_channels = px.shape
    if n_channels >= 3:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        luma = float((0.299 * r + 0.587 * g + 0.114 * b).mean() / 255.0)
    else:  # gray / gray+alpha
        luma = float(px[..., 0].astype(np.float64).mean() / 255.0)
    return width, height, n_channels, round(luma, 6)


def _filter_row(
    ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Forward-filter one reconstructed scanline (encoder side)."""
    c16 = cur.astype(np.int16)
    stride = cur.shape[0]
    left = np.zeros(stride, dtype=np.int16)
    left[bpp:] = c16[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros(stride, dtype=np.int16)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        return cur.copy()
    if ftype == 1:
        return (c16 - left).astype(np.uint8)
    if ftype == 2:
        return (c16 - up).astype(np.uint8)
    if ftype == 3:
        return (c16 - (left + up) // 2).astype(np.uint8)
    if ftype == 4:
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        return (c16 - pred).astype(np.uint8)
    raise ValueError(f"filter type {ftype}")


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: "np.ndarray",
    filter_mode: str = "cycle",
    bit_depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """Encode an array as an 8- or 16-bit PNG, sequential or Adam7.

    Accepts (H, W) gray, (H, W, 2) gray+alpha, (H, W, 3) RGB or
    (H, W, 4) RGBA — uint8 at ``bit_depth=8``, uint16 at 16 (big-endian
    samples per the spec). ``filter_mode``: ``"none"`` emits filter 0
    rows; ``"cycle"`` cycles filter types 0-4 by row so decoding golden
    bytes exercises every unfilter path against ground-truth pixels.
    ``interlace=True`` emits the seven Adam7 passes, each independently
    filtered.
    """
    if bit_depth not in (8, 16):
        raise ValueError("bit_depth must be 8 or 16")
    arr = np.asarray(pixels, dtype=np.uint8 if bit_depth == 8 else np.uint16)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError("expected (H, W[, 1|2|3|4]) pixels")
    h, w, nch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def to_rows(sub: "np.ndarray"):
        sh, sw = sub.shape[:2]
        if bit_depth == 16:
            rows = np.ascontiguousarray(sub.astype(">u2")).view(np.uint8)
            return rows.reshape(sh, sw * nch * 2)
        return np.ascontiguousarray(sub).reshape(sh, sw * nch)

    bpp = nch * (bit_depth // 8)
    body = bytearray()
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in passes:
        sub = arr[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        flat = to_rows(sub)
        prev = np.zeros(flat.shape[1], dtype=np.uint8)
        for y in range(flat.shape[0]):
            ftype = 0 if filter_mode == "none" else y % 5
            body.append(ftype)
            body.extend(_filter_row(ftype, flat[y], prev, bpp).tobytes())
            prev = flat[y]
    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, int(interlace)
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + _chunk(b"IEND", b"")
    )
