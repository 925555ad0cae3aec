"""REAL DCT perceptual hash over decoded pixels (numpy) — no image lib.

The production pHash recipe (public: Zauner's pHash / the classic
ImageHash algorithm): grayscale -> resize to 32x32 -> 2-D DCT-II ->
keep the low-frequency 8x8 block -> threshold each coefficient against
the median (DC excluded from the median so a bright image doesn't bias
it) -> 64-bit hash. Every step is implementable from the public
definition with numpy; the decoders this builds on are the repo's own
real codecs (``operators/jpeg.py``, ``operators/png.py``,
``multimodal.decode_bmp_pixels``).

Near-duplicate pairing over these hashes stays the existing scale
component (``operators.dedup.simhash_near_pairs`` 16-bit-chunk
pigeonhole blocking) — hashes meet in an equi-join, never all-pairs.

Scale shape: one payload hashes independently inside an Arrow batch;
nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from routing_algorithm_for_graph_dbs_spark.operators.png import PNG_SIGNATURE


def to_gray(px: "np.ndarray") -> np.ndarray:
    """(H, W[, C]) uint8 -> float64 grayscale (Rec.601 for >=3 channels,
    channel 0 for gray / gray+alpha)."""
    if px.ndim == 2:
        return px.astype(np.float64)
    if px.shape[2] >= 3:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        return 0.299 * r + 0.587 * g + 0.114 * b
    return px[..., 0].astype(np.float64)


def resize_bilinear(px: "np.ndarray", tw: int, th: int) -> np.ndarray:
    """Deterministic bilinear resample to (th, tw); channels preserved.
    Sample points sit at target-pixel centers mapped into the source's
    pixel-center grid (the standard align-corners=False convention)."""
    arr = px.astype(np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[..., None]
    h, w, c = arr.shape
    ys = (np.arange(th) + 0.5) * (h / th) - 0.5
    xs = (np.arange(tw) + 0.5) * (w / tw) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = arr[y0][:, x0] * (1 - fx) + arr[y0][:, x1] * fx
    bot = arr[y1][:, x0] * (1 - fx) + arr[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return out[..., 0] if squeeze else out


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, norm='ortho')."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    t = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    t[0] /= np.sqrt(2.0)
    return t


_T32 = _dct_matrix(32)


def phash64(px: "np.ndarray") -> int:
    """64-bit DCT perceptual hash of a decoded pixel array.

    Bit k (row-major over the 8x8 low-frequency block) is set iff that
    DCT coefficient exceeds the median of the block's 63 non-DC
    coefficients; the DC bit compares against the same median. Fully
    deterministic — same pixels, same hash, any platform.
    """
    g = resize_bilinear(to_gray(px), 32, 32)
    d = _T32 @ g @ _T32.T
    block = d[:8, :8].reshape(64)
    med = float(np.median(block[1:]))
    bits = block > med
    out = 0
    for k in range(64):
        if bits[k]:
            out |= 1 << k
    # signed 64-bit: the pairing join stores hashes in a Spark LongType
    # (operators.dedup.simhash_near_pairs), same convention as SimHash
    return out - (1 << 64) if out >= 1 << 63 else out


# Exceptions a real codec may raise on a payload that PASSES the cheap
# signature sniff but is not actually decodable: arithmetic-coded/
# truncated JPEG (NotImplementedError/ValueError),
# CRC-corrupt PNG (ValueError/zlib.error), truncated BMP (ValueError/
# struct.error). IndexError covers byte-indexing past the end of a
# truncated stream — with untrusted training-data payloads that is a data
# error, not a code bug.
DECODE_ERRORS = (
    ValueError,
    NotImplementedError,
    IndexError,
    zlib.error,
    struct.error,
)


def sniff_decode(payload: bytes, strict: bool = False) -> "np.ndarray | None":
    """Signature-sniffed pixel decode through the repo's real codecs:
    BMP (24/32-bit, palette, RLE) / baseline+progressive JPEG / PNG
    (every legal depth/color/interlace combination) / GIF (LZW, incl.
    interlaced) / lossless WebP (full VP8L — round 11). Returns
    None for unrecognized payloads (the caller decides fake vs strict).

    A payload that passes the signature sniff but fails to decode (e.g.
    an arithmetic-coded JPEG, a CRC-corrupt PNG, a truncated stream) returns
    None too unless ``strict=True``, which lets the codec's error
    propagate — a mislabeled payload must fall to the caller's
    fake/skip path, never crash the stage (module contract)."""
    # "BM" alone is weak magic (ordinary text can start with it); a real
    # BMP also has the four reserved zero bytes at offset 6
    decode = None
    if (
        len(payload) >= 54
        and payload[:2] == b"BM"
        and payload[6:10] == b"\x00\x00\x00\x00"
    ):
        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            decode_bmp_pixels,
        )

        decode = decode_bmp_pixels
    elif payload[:8] == PNG_SIGNATURE:
        from routing_algorithm_for_graph_dbs_spark.operators.png import (
            decode_png_pixels,
        )

        decode = decode_png_pixels
    elif payload[:2] == b"\xff\xd8":
        from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
            decode_jpeg_luma,
        )

        decode = decode_jpeg_luma
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        from routing_algorithm_for_graph_dbs_spark.operators.gif import (
            decode_gif_rgb,
        )

        decode = decode_gif_rgb
    elif (
        len(payload) >= 16
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    ):
        # lossless VP8L decodes for real; lossy VP8 raises inside
        # (NotImplementedError -> fake path unless strict)
        from routing_algorithm_for_graph_dbs_spark.operators.vp8l import (
            decode_webp_lossless,
        )

        decode = decode_webp_lossless
    if decode is None:
        return None
    if strict:
        return decode(payload)
    try:
        return decode(payload)
    except DECODE_ERRORS:
        return None


def payload_phash(payload: bytes, strict: bool = False) -> "int | None":
    """Real pHash for decodable payloads, None otherwise (decode errors
    propagate only with ``strict=True``)."""
    px = sniff_decode(payload, strict=strict)
    return None if px is None else phash64(px)
