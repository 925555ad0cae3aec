"""Multimodal column plumbing (beyond-reference surface).

Images/audio/video ride through the engine as opaque ``binary`` columns with
a typed metadata struct. The Spark-side machinery — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing — is real and tested. Codecs:
**BMP decode is REAL for 24/32-bit, 1/4/8-bit palette and RLE8/RLE4** (pure Python + numpy,
``decode_bmp``/``encode_bmp`` below), **baseline, progressive AND 12-bit JPEG
decode is REAL** (``operators/jpeg.py`` — Huffman entropy decode, SOF2
multi-scan accumulation, precision-scaled level shift, exact IDCT of
the luma channel),
**PNG decode is REAL and boundary-complete** (``operators/png.py``
— stdlib-zlib inflate + all five scanline unfilters, every legal
depth/color/interlace combination), and **WAV decode is REAL for every PCM/ADPCM/companded dialect**
(``operators/wav.py`` — RIFF parse; 8/16/24/32-bit integer, 32/64-bit
IEEE-float, MS + IMA ADPCM residual blocks, G.711 A-law/mu-law; real
RMS/zero-crossing features). **Video METADATA parsing is REAL**
(``operators/mp4.py`` — ISO-BMFF box walk: ftyp brand, mvhd duration,
tkhd dimensions, track count; frame decode stays the boundary), **GIF
and TIFF pixel decode are REAL** (``operators/gif.py`` LZW,
``operators/tiff.py`` raw/PackBits strips), **FLAC sample decode
is REAL** (``operators/flac.py`` — Rice/fixed/LPC frames with
CRC-8/CRC-16/MD5 verification; round 11), and **lossless-WebP (VP8L)
pixel decode is REAL** (``operators/vp8l.py`` — full spec including
all four transforms, validated bit-exactly against libwebp; round 11).
Everything else is a deterministic sha256-derived fake, clearly marked,
with ``strict=True`` raising ``NotImplementedError`` where a real
deployment would plug PIL/libvips/ffmpeg (video frames, perceptual
compressed audio — MP3/AAC/Opus).

Scale notes: binary payloads dominate row size, so these pipelines must
(a) never shuffle the binary column (all derivation is map-side),
(b) bound Arrow batch memory via ``maxRecordsPerBatch``, and
(c) project metadata-only when downstream doesn't need bytes — enforced
here by splitting metadata derivation from payload transforms.

The ``# arrow-stage:`` comments at every mapInPandas call are the
exemption marker for tests/test_plan_hygiene.py's Arrow-partitioning
gate: these stages deliberately do NOT spread_for_compute — a
repartition would push payload bytes over a shuffle, violating (a);
their scale parallelism comes from scan splits (files.maxPartitionBytes).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from routing_algorithm_for_graph_dbs_spark.operators.phash import DECODE_ERRORS

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_channels", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("decoder", T.StringType(), False),  # bmp|jpeg|png|fake
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC FAKE decode — stands in for a real image codec.

    Derives pseudo width/height/luma from the payload digest so tests are
    reproducible. A real deployment replaces this body with PIL/libvips.
    """
    d = hashlib.sha256(payload or b"").digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    luma = round(d[2] / 255.0, 6)
    return width, height, luma


def decode_bmp(payload: bytes) -> tuple[int, int, int, float]:
    """REAL pure-Python decode of a Windows BMP — uncompressed 24/32-bit
    BGR(X), palette-indexed 1/4/8-bit, RLE8/RLE4-compressed (round 11;
    the RLE modes are the spec's run/absolute/EOL/EOD/delta escapes,
    MSDN BITMAPINFOHEADER docs), and 16-bit RGB555 / BI_BITFIELDS
    masked modes at 16 or 32 bpp (round 12 — pure bit-mask
    arithmetic).

    Returns ``(width, height, n_channels, mean_luma)`` where mean_luma is
    the Rec.601 luma (0.299 R + 0.587 G + 0.114 B) averaged over all
    pixels, normalized to [0, 1] and rounded to 6. The 12-byte OS/2
    BITMAPCOREHEADER decodes too (round 12: u16 dims, BGR palette
    triples). Raises ``ValueError`` on malformed headers/streams and
    ``NotImplementedError`` for modes outside that set (JPEG/PNG
    passthrough, unknown headers) — the honest remaining boundary."""
    rows = decode_bmp_pixels(payload)
    h, w = rows.shape[:2]
    r, g, b = (rows[..., i].astype(np.float64) for i in range(3))
    luma = float((0.299 * r + 0.587 * g + 0.114 * b).mean() / 255.0)
    return w, h, 3, round(luma, 6)


def _bmp_unpack_indexed_row(raw: "np.ndarray", width: int, bpp: int):
    if bpp == 8:
        return raw[:width]
    if bpp == 4:
        nib = np.repeat(raw, 2)
        nib[0::2] >>= 4
        nib[1::2] &= 0x0F
        return nib[:width]
    return np.unpackbits(raw)[:width]  # bpp == 1, MSB first


def _bmp_decode_rle(data: bytes, width: int, n_rows: int, bpp: int):
    """RLE8/RLE4 escape walk -> (n_rows, width) index array, bottom-up
    rows (the spec forbids top-down RLE). Undefined gaps (after deltas)
    are index 0, matching common decoders."""
    idx = np.zeros((n_rows, width), dtype=np.uint8)
    x = y = 0
    pos = 0
    while True:
        if pos + 2 > len(data):
            raise ValueError("BMP RLE stream ended without end-of-data")
        count, value = data[pos], data[pos + 1]
        pos += 2
        if count > 0:  # encoded run
            if y >= n_rows or x + count > width:
                raise ValueError("BMP RLE run overflows the bitmap")
            if bpp == 8:
                idx[y, x:x + count] = value
            else:
                pair = np.array([value >> 4, value & 0x0F], dtype=np.uint8)
                idx[y, x:x + count] = np.tile(pair, count // 2 + 1)[:count]
            x += count
        elif value == 0:  # end of line
            x, y = 0, y + 1
        elif value == 1:  # end of data
            break
        elif value == 2:  # delta
            if pos + 2 > len(data):
                raise ValueError("BMP RLE delta truncated")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > width or y > n_rows:
                raise ValueError("BMP RLE delta jumps outside the bitmap")
        else:  # absolute mode: `value` literal indices follow
            k = value
            nbytes = k if bpp == 8 else (k + 1) // 2
            nbytes += nbytes & 1  # pad to a 2-byte boundary
            if pos + nbytes > len(data):
                raise ValueError("BMP RLE absolute run truncated")
            if y >= n_rows or x + k > width:
                raise ValueError("BMP RLE absolute run overflows the bitmap")
            raw = np.frombuffer(data, np.uint8, count=nbytes, offset=pos)
            idx[y, x:x + k] = _bmp_unpack_indexed_row(raw.copy(), k, bpp)
            x += k
            pos += nbytes
    return idx[::-1]  # bottom-up -> top-down


def decode_bmp_pixels(payload: bytes) -> "np.ndarray":
    """Pixel-level BMP decode: (H, W, 3) uint8 RGB, top-down row order —
    the entry the real pHash / resize operators build on. Same format
    support and error contract as :func:`decode_bmp`: BI_RGB 24/32-bit,
    palette 1/4/8-bit, RLE8/RLE4, 16-bit RGB555, and BI_BITFIELDS
    16/32-bit with arbitrary contiguous non-overlapping masks."""
    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic or header)")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    info_size = struct.unpack_from("<I", payload, 14)[0]
    if info_size == 12:
        # 12-byte OS/2 BITMAPCOREHEADER (round 12): u16 dimensions,
        # always BI_RGB bottom-up, 3-byte BGR palette TRIPLES instead
        # of quads — pure field-width differences, no codec.
        width, height, _planes, bpp = struct.unpack_from("<HHHH", payload, 18)
        if width == 0 or height == 0:
            raise ValueError(f"bad BMP core dimensions {width}x{height}")
        if bpp == 24:
            row_bytes = (width * 3 + 3) & ~3
            if len(payload) < data_off + row_bytes * height:
                raise ValueError("BMP payload truncated")
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=row_bytes * height,
                offset=data_off,
            ).reshape(height, row_bytes)[:, : width * 3]
            rows = rows.reshape(height, width, 3)[::-1]
            return rows[..., ::-1].copy()  # bottom-up BGR -> RGB
        if bpp not in (1, 4, 8):
            raise NotImplementedError(
                f"BMP core header bpp={bpp} needs a real image lib"
            )
        n_pal = 1 << bpp
        pal_at = 14 + 12
        if pal_at + 3 * n_pal > data_off or data_off > len(payload):
            raise ValueError("BMP core palette runs past the pixel data")
        triples = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n_pal, offset=pal_at
        ).reshape(n_pal, 3)
        palette = triples[:, ::-1].copy()  # BGR triples -> RGB
        row_bytes = ((width * bpp + 31) // 32) * 4
        if len(payload) < data_off + row_bytes * height:
            raise ValueError("BMP payload truncated")
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height,
            offset=data_off,
        ).reshape(height, row_bytes)
        idx = np.stack(
            [_bmp_unpack_indexed_row(raw[r].copy(), width, bpp)
             for r in range(height)]
        )[::-1]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("BMP pixel index outside the palette")
        return palette[idx]
    if len(payload) < 54:
        raise ValueError("BMP info header truncated")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    clr_used = struct.unpack_from("<I", payload, 46)[0]
    if info_size not in (40, 52, 56, 64, 108, 124):
        # BITMAPINFOHEADER and its supersets (V2/V3/V4/V5) share the
        # first 40 bytes' field layout, so they all decode; the 12-byte
        # BITMAPCOREHEADER takes its own branch above. (The round-11
        # self-review caught a 40-only check regressing V4/V5 files the
        # pre-palette code handled via data_off.)
        raise NotImplementedError(
            f"BMP info header size {info_size} (unknown) needs a real"
            " image lib"
        )
    ok = (
        (bpp in (24, 32) and compression == 0)
        or (bpp in (1, 4, 8) and compression == 0)
        or (bpp == 8 and compression == 1)   # BI_RLE8
        or (bpp == 4 and compression == 2)   # BI_RLE4
        or (bpp == 16 and compression in (0, 3))  # RGB555 / BI_BITFIELDS
        or (bpp == 32 and compression == 3)       # BI_BITFIELDS
    )
    if not ok:
        raise NotImplementedError(
            f"BMP mode bpp={bpp}, compression={compression}"
            " (mismatched RLE / JPEG-or-PNG passthrough) needs a real"
            " image lib"
        )
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    top_down, n_rows = height < 0, abs(height)
    if bpp == 16 or compression == 3:
        # round-12 widening: masked pixel modes are pure bit arithmetic.
        # BI_RGB 16-bit defaults to RGB555; BI_BITFIELDS carries explicit
        # R/G/B DWORD masks which, for BITMAPINFOHEADER, follow the
        # header, and for V2+/V4/V5 live in the header's first mask
        # fields — both land at file offset 54.
        if compression == 3:
            if len(payload) < 66:
                raise ValueError("BMP bitfields masks truncated")
            masks = struct.unpack_from("<III", payload, 54)
        else:
            masks = (0x7C00, 0x03E0, 0x001F)
        limit = (1 << bpp) - 1
        taken = 0
        for m in masks:
            if m == 0 or m > limit:
                raise ValueError(f"BMP bitfields mask {m:#x} invalid for bpp={bpp}")
            if m & taken:
                raise ValueError("BMP bitfields masks overlap")
            lsb = (m & -m).bit_length() - 1
            if (m >> lsb) & ((m >> lsb) + 1):
                raise ValueError(f"BMP bitfields mask {m:#x} not contiguous")
            taken |= m
        row_bytes = (width * (bpp // 8) + 3) & ~3
        if len(payload) < data_off + row_bytes * n_rows:
            raise ValueError("BMP payload truncated")
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * n_rows,
            offset=data_off,
        ).reshape(n_rows, row_bytes)[:, : width * (bpp // 8)]
        words = (
            raw.reshape(n_rows, width, bpp // 8)
            .astype(np.uint32)
        )
        vals = sum(words[:, :, i] << (8 * i) for i in range(bpp // 8))
        chans = []
        for m in masks:
            lsb = (m & -m).bit_length() - 1
            top = m >> lsb  # 2^n - 1 for an n-bit channel
            v = (vals & m) >> lsb
            # n-bit -> 8-bit by rounding (== bit replication at 5/6 bits)
            chans.append(((v * 255 + top // 2) // top).astype(np.uint8))
        rows = np.stack(chans, axis=-1)
        if not top_down:
            rows = rows[::-1]
        return rows.copy()
    if bpp in (24, 32):
        px = bpp // 8
        row_bytes = (width * px + 3) & ~3
        if len(payload) < data_off + row_bytes * n_rows:
            raise ValueError("BMP payload truncated")
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * n_rows,
            offset=data_off,
        ).reshape(n_rows, row_bytes)[:, : width * px]
        rows = rows.reshape(n_rows, width, px)[:, :, :3]
        if not top_down:
            rows = rows[::-1]
        return rows[..., ::-1].copy()  # BGR(X) -> RGB
    # palette modes: quads sit between the info header and the pixel data
    n_pal = clr_used or (1 << bpp)
    pal_at = 14 + info_size
    if pal_at + 4 * n_pal > data_off or data_off > len(payload):
        raise ValueError("BMP palette runs past the pixel data offset")
    quads = np.frombuffer(
        payload, dtype=np.uint8, count=4 * n_pal, offset=pal_at
    ).reshape(n_pal, 4)
    palette = quads[:, [2, 1, 0]].copy()  # BGRA quads -> RGB
    if compression:
        if top_down:
            raise ValueError("top-down BMP cannot be RLE-compressed")
        idx = _bmp_decode_rle(payload[data_off:], width, n_rows, bpp)
    else:
        row_bytes = ((width * bpp + 31) // 32) * 4
        if len(payload) < data_off + row_bytes * n_rows:
            raise ValueError("BMP payload truncated")
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * n_rows,
            offset=data_off,
        ).reshape(n_rows, row_bytes)
        idx = np.stack(
            [_bmp_unpack_indexed_row(raw[r].copy(), width, bpp)
             for r in range(n_rows)]
        )
        if not top_down:
            idx = idx[::-1]
    if int(idx.max(initial=0)) >= n_pal:
        raise ValueError("BMP pixel index outside the palette")
    return palette[idx]


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (bottom-up, BI_RGB) — the write half of the codec, used by the sink
    path and to generate real test bytes for :func:`decode_bmp`."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected an (H, W, 3) RGB array")
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def encode_bmp_indexed(
    indices: "np.ndarray", palette, bpp: int = 8, rle: bool = False
) -> bytes:
    """Encode an (H, W) index array + RGB palette as a palette BMP
    (bottom-up): raw BI_RGB at 1/4/8 bpp, or REAL RLE8/RLE4 compression
    (encoded runs + end-of-line + end-of-data escapes) at 8/4 bpp — the
    write half :func:`decode_bmp_pixels` round-trips, used to mint
    golden test bytes for every palette mode."""
    idx = np.asarray(indices, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("expected an (H, W) index array")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > (1 << bpp):
        raise ValueError("palette must be (n<=2^bpp, 3) RGB")
    if idx.size and int(idx.max()) >= len(pal):
        raise ValueError("index outside the palette")
    if bpp not in (1, 4, 8) or (rle and bpp == 1):
        raise ValueError("bpp must be 1/4/8 (RLE: 4/8)")
    h, w = idx.shape
    if rle:
        out = bytearray()
        for r in range(h - 1, -1, -1):  # bottom-up
            x = 0
            row = idx[r]
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                if bpp == 8:
                    out += bytes([run, int(row[x])])
                else:
                    v = int(row[x])
                    out += bytes([run, (v << 4) | v])
                x += run
            if r:
                out += b"\x00\x00"  # end of line
        out += b"\x00\x01"  # end of data
        data = bytes(out)
        compression = 1 if bpp == 8 else 2
    else:
        row_bytes = ((w * bpp + 31) // 32) * 4
        body = np.zeros((h, row_bytes), dtype=np.uint8)
        for r in range(h):
            row = idx[h - 1 - r]  # bottom-up
            if bpp == 8:
                body[r, :w] = row
            elif bpp == 4:
                padded = np.zeros((w + 1) // 2 * 2, dtype=np.uint8)
                padded[:w] = row
                body[r, : len(padded) // 2] = (padded[0::2] << 4) | padded[1::2]
            else:
                body[r, : (w + 7) // 8] = np.packbits(row)
        data = body.tobytes()
        compression = 0
    quads = np.zeros((len(pal), 4), dtype=np.uint8)
    quads[:, :3] = pal[:, ::-1]  # RGB -> BGR0
    pal_bytes = quads.tobytes()
    data_off = 14 + 40 + len(pal_bytes)
    header = struct.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(data),
        2835, 2835, len(pal), 0,
    )
    return header + info + pal_bytes + data


def encode_bmp_core(
    pixels: "np.ndarray", palette=None, bpp: int = 24
) -> bytes:
    """Encode an OS/2 BITMAPCOREHEADER BMP (round 12) — the write half
    :func:`decode_bmp_pixels`'s core-header branch round-trips. 24-bit
    takes an (H, W, 3) RGB array; palette modes take an (H, W) index
    array plus an RGB palette written as the core format's 3-byte BGR
    TRIPLES."""
    if bpp == 24:
        arr = np.asarray(pixels, dtype=np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("expected an (H, W, 3) RGB array")
        h, w = arr.shape[:2]
        row_bytes = (w * 3 + 3) & ~3
        body = np.zeros((h, row_bytes), dtype=np.uint8)
        body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
        data = body.tobytes()
        pal_bytes = b""
    elif bpp in (1, 4, 8):
        idx = np.asarray(pixels, dtype=np.uint8)
        pal = np.asarray(palette, dtype=np.uint8)
        if idx.ndim != 2 or pal.shape != (1 << bpp, 3):
            raise ValueError("expected (H, W) indices + full 2^bpp palette")
        if idx.size and int(idx.max()) >= len(pal):
            raise ValueError("index outside the palette")
        h, w = idx.shape
        row_bytes = ((w * bpp + 31) // 32) * 4
        body = np.zeros((h, row_bytes), dtype=np.uint8)
        for r in range(h):
            row = idx[h - 1 - r]  # bottom-up
            if bpp == 8:
                body[r, :w] = row
            elif bpp == 4:
                padded = np.zeros((w + 1) // 2 * 2, dtype=np.uint8)
                padded[:w] = row
                body[r, : len(padded) // 2] = (padded[0::2] << 4) | padded[1::2]
            else:
                body[r, : (w + 7) // 8] = np.packbits(row)
        data = body.tobytes()
        pal_bytes = pal[:, ::-1].tobytes()  # RGB -> BGR triples
    else:
        raise ValueError("core BMPs are 1/4/8/24 bpp")
    data_off = 14 + 12 + len(pal_bytes)
    header = struct.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off)
    core = struct.pack("<IHHHH", 12, w, h, 1, bpp)
    return header + core + pal_bytes + data


def encode_bmp_bitfields(
    raw_channels: "np.ndarray",
    bpp: int = 16,
    masks: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode an (H, W, 3) array of RAW mask-domain channel values as a
    16- or 32-bit masked BMP (bottom-up) — the write half
    :func:`decode_bmp_pixels` round-trips for the round-12 bitfields
    widening. ``masks=None`` emits BI_RGB 16-bit (implicit RGB555);
    explicit masks emit BI_BITFIELDS with the three DWORD masks at
    their spec position straight after BITMAPINFOHEADER. Each value
    must already fit its mask's bit width (this encoder does NOT
    quantize 8-bit input — mint in mask domain so oracles can state
    the decoded expansion ``(v*255 + top//2) // top`` in closed
    form)."""
    arr = np.asarray(raw_channels, dtype=np.uint32)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected an (H, W, 3) raw-channel array")
    if bpp not in (16, 32):
        raise ValueError("bitfields BMPs are 16 or 32 bpp")
    implicit = masks is None
    use = (0x7C00, 0x03E0, 0x001F) if implicit else tuple(masks)
    if implicit and bpp != 16:
        raise ValueError("implicit RGB555 is 16-bpp only")
    h, w = arr.shape[:2]
    vals = np.zeros((h, w), dtype=np.uint32)
    for i, m in enumerate(use):
        lsb = (m & -m).bit_length() - 1
        top = m >> lsb
        chan = arr[:, :, i]
        if int(chan.max(initial=0)) > top:
            raise ValueError(f"channel {i} value exceeds mask {m:#x}")
        vals |= chan << lsb
    n_bytes = bpp // 8
    row_bytes = (w * n_bytes + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    flipped = vals[::-1]  # bottom-up
    for i in range(n_bytes):
        body[:, i : w * n_bytes : n_bytes] = (flipped >> (8 * i)).astype(
            np.uint8
        )
    data = body.tobytes()
    compression = 0 if implicit else 3
    mask_bytes = b"" if implicit else struct.pack("<III", *use)
    data_off = 14 + 40 + len(mask_bytes)
    header = struct.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(data),
        2835, 2835, 0, 0,
    )
    return header + info + mask_bytes + data


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table.

    Stands in for a real binary ingest (no media fixtures ship with the
    testdata): payload = UTF-8 bytes of the text, kind cycles
    image/audio/video by key, typed metadata derived from n_chars. Pure
    column expressions, so an external engine can construct the identical
    table for oracle checks — which lets even the mapInPandas feature
    extractor be value-checked cross-engine.
    """
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, (F.col("doc_id") % 3 + 1).cast("int"))
    is_image = F.col("doc_id") % 3 == 0
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(is_image, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        F.struct(
            F.when(is_image, (F.col("n_chars") % 512 + 1).cast("int")).alias("width"),
            F.when(is_image, ((F.col("n_chars") * 7) % 512 + 1).cast("int")).alias(
                "height"
            ),
            F.when(is_image, F.lit(3)).cast("int").alias("n_channels"),
            F.when(~is_image, (F.col("n_chars") * 10).cast("long")).alias(
                "duration_ms"
            ),
            F.when(F.col("doc_id") % 3 == 1, F.lit(16000)).cast("int").alias(
                "sample_rate"
            ),
        ).alias("meta"),
    )


def image_features(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over image payloads.

    ``mapInPandas`` so each Python batch sees a bounded number of binary
    payloads (batch memory = batch_size x payload size, independent of
    partition size). Dispatch is per row on the ``mime`` column:
    ``image/bmp`` payloads get the REAL pure-Python decoder
    (:func:`decode_bmp`), ``image/jpeg`` the REAL baseline-JPEG decoder
    (``operators/jpeg.py decode_jpeg`` — full Huffman entropy decode,
    baseline, extended-sequential 12-bit, and progressive, exact IDCT of
    the Y channel, ARITHMETIC streams — sequential SOF9 AND progressive
    SOF10 — via the round-12 QM-coder, plus LOSSLESS SOF3 — the round-13
    Annex H DPCM path, plus HIERARCHICAL DHP/EXP/SOF5-7 — the round-14
    Annex J path; only the arithmetic-lossless/-differential modes raise
    there), and ``image/png`` payloads carrying a real PNG signature the
    REAL PNG decoder (``operators/png.py decode_png`` — stdlib-zlib
    inflate + scanline unfiltering, every legal depth/color/interlace
    combination). The
    ``image/webp`` payloads decode for real in BOTH flavors: lossless
    VP8L (``operators/vp8l.py``, round 11) and — round 13 — lossy VP8
    key frames (``operators/vp8.py``, the full RFC 6386 pipeline,
    sample-exact against WebPDecodeYUV; luma comes straight off the Y
    plane). The signature sniff matters: synthetic media tables label
    text payloads ``image/png``, and those must keep taking the
    deterministic sha256 fake (or, with ``strict=True``,
    NotImplementedError) — the remaining codec boundary.
    """
    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import decode_jpeg
    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        PNG_SIGNATURE,
        decode_png,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.vp8l import (
        decode_webp_lossless,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.webp import (
        decode_webp_lossy,
        is_webp,
    )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                b = bytes(payload) if payload is not None else b""
                # signature guard + decode-error guard: a payload that is
                # mislabeled, or that passes the cheap signature sniff but
                # is not decodable by the real codecs (arithmetic-lossless/
                # truncated JPEG, corrupt PNG), must
                # fall to the fake path, not crash the stage — unless
                # strict=True, where the codec's error propagates.
                dec = None
                try:
                    if mime == "image/bmp":
                        w, h, _nc, luma = decode_bmp(b)
                        dec = "bmp"
                    elif mime == "image/jpeg" and b.startswith(b"\xff\xd8"):
                        w, h, _nc, luma = decode_jpeg(b)
                        dec = "jpeg"
                    elif mime == "image/png" and b.startswith(PNG_SIGNATURE):
                        w, h, _nc, luma = decode_png(b)
                        dec = "png"
                    elif mime == "image/webp" and is_webp(b):
                        # REAL VP8L decode (round 11): lossless WebP is
                        # pure prefix-code/LZ77/transform arithmetic —
                        # validated against libwebp itself in tests.
                        # REAL lossy VP8 decode (round 13): the full
                        # RFC 6386 key-frame pipeline, sample-exact
                        # against WebPDecodeYUV; its Y plane IS the
                        # Rec.601 luma (same contract as the JPEG path).
                        try:
                            rgba = decode_webp_lossless(b)
                        except NotImplementedError:
                            yp, _u, _v = decode_webp_lossy(b)
                            h, w = yp.shape
                            luma = round(float(yp.mean() / 255.0), 6)
                            dec = "webp"
                        else:
                            h, w = rgba.shape[:2]
                            rr, gg, bb = (
                                rgba[..., i].astype(np.float64)
                                for i in range(3)
                            )
                            luma = round(float(
                                (0.299 * rr + 0.587 * gg + 0.114 * bb).mean()
                                / 255.0
                            ), 6)
                            dec = "webp"
                except DECODE_ERRORS:
                    if strict:
                        raise
                    dec = None
                if dec is None:
                    if strict:
                        raise NotImplementedError(
                            f"real decode of {mime!r} requires PIL/libvips —"
                            " not in this container (BMP/JPEG/PNG/WebP"
                            " decode natively; this payload matched"
                            " none)"
                        )
                    w, h, luma = _fake_decode(b)
                    dec = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        w,
                        h,
                        luma,
                        dec,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sha256",
                    "n_bytes",
                    "width",
                    "height",
                    "mean_luma",
                    "decoder",
                ],
            )

    # project ONLY the columns the extractor needs — the binary column stays
    # out of any shuffle and un-needed metadata is pruned at the scan.
    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload", "mime").mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), True),  # null on mp3-meta
        T.StructField("mean_amplitude", T.DoubleType(), True),  # sign-
        # sensitive (round 9): the one feature that catches a companding
        # sign-convention bug RMS/zc/centroid are invariant to
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # wav/mp3 paths
        T.StructField("sample_rate", T.IntegerType(), True),  # wav/mp3
        T.StructField("spectral_centroid_hz", T.DoubleType(), True),  # wav
        T.StructField("decoder", T.StringType(), False),
        # wav | flac (both REAL sample decode) | mp3-meta | aac-meta |
        # flac-meta | opus-meta | fake
    ]
)


def audio_features(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched audio feature extraction (same plumbing contract as
    ``image_features``). Payloads carrying a real RIFF/WAVE signature get
    the REAL integer-PCM decoder (``operators/wav.py decode_wav``) —
    true RMS, zero-crossing count, duration and sample rate (the full
    PCM family: int/float PCM, IMA/MS ADPCM, G.711). Payloads sniffing
    as MPEG audio get a REAL frame-header metadata walk
    (``operators/mp3.py``, round 9): duration and sample rate are real,
    sample-derived stats are null, decoder='mp3-meta' — sample decode of
    compressed audio is the honest boundary for PERCEPTUAL codecs. ADTS-
    AAC payloads (with or without a leading ID3v2 tag) get the same
    treatment via the ADTS header walk (decoder='aac-meta'), and
    Ogg/Opus via the CRC-checked page walk (decoder='opus-meta',
    granule-derived duration). FLAC gets the REAL sample decode (round
    11 — Rice/fixed/LPC frames are pure integer arithmetic per RFC
    9639, ``operators/flac.py decode_flac_pcm``, with CRC-8/CRC-16/MD5
    verified): full sample-derived stats, decoder='flac'; a stream
    whose metadata chain is valid but whose frames do not decode falls
    back to the STREAMINFO walk NON-STRICT only (decoder='flac-meta' —
    duration there is exact, not estimated), while ``strict=True``
    propagates the codec error. Other payloads use the deterministic
    sha256 fake (nulls for duration/rate), and with ``strict=True``
    raise NotImplementedError instead (a real deployment plugs
    librosa/ffmpeg)."""
    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        decode_flac_samples,
        is_flac,
        parse_flac_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import (
        _post_id3_offset,
        is_adts,
        is_mp3,
        parse_adts_metadata,
        parse_mp3_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.opus import (
        is_ogg_opus,
        parse_opus_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        decode_wav_samples,
        is_wav,
        spectral_centroid,
        wav_audio_format,
    )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                hx = hashlib.sha256(b).hexdigest()
                decoded = None
                decoded_tag = "wav"
                mp3_meta = None
                if is_wav(b):
                    # decode ONCE; derive every feature from the samples
                    # (decode_wav's scalar stats re-parse the payload).
                    # is_wav is a cheap RIFF sniff — an ADPCM/compressed
                    # WAV passes it but decode raises; without strict
                    # that payload falls to the fake path below.
                    try:
                        decoded = decode_wav_samples(b)
                        if wav_audio_format(b) == 0x31:
                            decoded_tag = "gsm"  # REAL 06.10 decode (r14)
                    except DECODE_ERRORS:
                        if strict:
                            raise
                elif is_mp3(b):
                    # MPEG audio: sample decode needs a codec library
                    # (the honest boundary), but the frame-header walk
                    # gives REAL duration and sample rate — the fields a
                    # pipeline plans on for the dominant crawl format.
                    try:
                        _p = parse_mp3_metadata(b)
                        mp3_meta = (_p[2], _p[5], "mp3-meta")
                    except DECODE_ERRORS:
                        if strict:
                            raise
                elif is_adts(b):
                    try:
                        _p = parse_adts_metadata(b)
                        mp3_meta = (_p[1], _p[4], "aac-meta")
                    except DECODE_ERRORS:
                        if strict:
                            raise
                elif is_flac(b) or (
                    (_off := _post_id3_offset(b)) and is_flac(b[_off:])
                ):
                    # REAL sample decode (round 11): Rice/fixed/LPC
                    # frames are pure integer arithmetic, so FLAC moved
                    # OFF the perceptual-codec boundary. A leading
                    # ID3v2 tag (crawl FLACs carry them like MP3/AAC
                    # do) is skipped before the sniff, same as the ADTS
                    # route. Frames that do not decode (CRC/MD5
                    # mismatch, truncation) fall back to the STREAMINFO
                    # walk NON-STRICT only — still real metadata (the
                    # EXACT sample count); under strict=True the codec
                    # error PROPAGATES like every other strict path
                    # (round-12 ADVICE fix: a silent downgrade hid
                    # decode failures from strict callers).
                    bf = b if is_flac(b) else b[_off:]
                    try:
                        decoded = decode_flac_samples(bf)
                        decoded_tag = "flac"
                    except DECODE_ERRORS:
                        if strict:
                            raise
                        try:
                            _p = parse_flac_metadata(bf)
                            mp3_meta = (_p[0], _p[4], "flac-meta")
                        except DECODE_ERRORS:
                            pass
                elif is_ogg_opus(b):
                    # granule arithmetic on the CRC-checked page walk;
                    # sample_rate reports OpusHead's input rate (granules
                    # are always 48 kHz)
                    try:
                        _p = parse_opus_metadata(b)
                        mp3_meta = (_p[2], _p[4], "opus-meta")
                    except DECODE_ERRORS:
                        if strict:
                            raise
                if decoded is not None:
                    x, rate = decoded
                    nf = x.shape[0]
                    dur = int(round(nf * 1000.0 / rate))
                    if nf == 0:
                        rms, mean_amp, zc, sc = 0.0, 0.0, 0, 0.0
                    else:
                        rms = round(float(np.sqrt(np.mean(np.square(x)))), 6)
                        mean_amp = round(float(np.mean(x)), 6)
                        mono = x.mean(axis=1)
                        zc = int(np.count_nonzero(mono[1:] * mono[:-1] < 0))
                        sc = spectral_centroid(x, rate)
                    # floor-rounded for cross-engine-exact comparisons
                    sc = float(np.floor(sc * 1e6 + 0.5) / 1e6)
                    rows.append(
                        (int(mid), hx, len(b), rms, mean_amp, zc, dur, rate,
                         sc, decoded_tag)
                    )
                elif mp3_meta is not None:
                    rate, dur, tag = mp3_meta
                    rows.append(
                        (int(mid), hx, len(b), None, None, None, dur, rate,
                         None, tag)
                    )
                elif strict:
                    raise NotImplementedError(
                        "real decode of non-WAV audio requires"
                        " librosa/ffmpeg — not in this container"
                    )
                else:
                    d = hashlib.sha256(b).digest()
                    rows.append(
                        (
                            int(mid),
                            hx,
                            len(b),
                            round(d[3] / 255.0, 6),
                            round(d[6] / 255.0 - 0.5, 6),
                            int.from_bytes(d[4:6], "big"),
                            None,
                            None,
                            None,
                            "fake",
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sha256",
                    "n_bytes",
                    "rms",
                    "mean_amplitude",
                    "zero_crossings",
                    "duration_ms",
                    "sample_rate",
                    "spectral_centroid_hz",
                    "decoder",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract, schema=AUDIO_FEATURES_SCHEMA
    )


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL WAV payloads derived from the documents table.

    Each audio-kind doc becomes a mono square wave (alternating +/-amp,
    1 kHz sample rate, ``(n_chars % 50) + 2`` frames) encoded to real
    RIFF/PCM bytes by ``operators.wav.encode_wav`` inside an
    Arrow-batched ``mapInPandas``. The parameters are closed-form column
    expressions, so an external engine can predict the DECODED features
    analytically (RMS = round(amp*32767)/32768, zero crossings = n-1,
    duration = n ms, n_bytes = 44 + 2n) — which makes the full
    encode -> decode -> feature pipeline value-checkable cross-engine
    without the oracle ever touching a codec. Amplitudes are chosen so
    no feature lands on a rounding tie (margins >> double error).
    """
    from routing_algorithm_for_graph_dbs_spark.operators.wav import encode_wav

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        ((F.col("n_chars") % 50) + 2).cast("int").alias("n_frames"),
        (((F.col("doc_id") % 9) + 1) / 20.0).alias("amp"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for n, a in zip(pdf["n_frames"], pdf["amp"]):
                wave = np.full(int(n), float(a))
                wave[1::2] *= -1.0
                payloads.append(encode_wav(wave, 1000))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_wav_tones(docs: DataFrame) -> DataFrame:
    """REAL WAV payloads whose SPECTRUM is known in closed form.

    Each audio-kind doc becomes a square tone of period 2 (alternating
    +/-amp — all energy at Nyquist = rate/2) or period 4
    ((a, a, -a, -a) — a single bin at rate/4), length a multiple of 4
    frames so the tone has integer periods and the FFT is single-bin
    EXACT up to float noise (~1e-11 Hz, far under the 1e-6 rounding).
    Lets the oracle predict the decoded spectral centroid analytically.
    """
    from routing_algorithm_for_graph_dbs_spark.operators.wav import encode_wav

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (4 * ((F.col("n_chars") % 12) + 2)).cast("int").alias("n_frames"),
        (((F.col("doc_id") % 9) + 1) / 20.0).alias("amp"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(2))
        .otherwise(F.lit(4))
        .alias("period"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for n, a, p in zip(pdf["n_frames"], pdf["amp"], pdf["period"]):
                pat = [a, -a] if int(p) == 2 else [a, a, -a, -a]
                wave = np.tile(np.array(pat, dtype=np.float64), int(n) // int(p))
                payloads.append(encode_wav(wave, 1000))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_g711_media(docs: DataFrame) -> DataFrame:
    """REAL G.711-companded WAV payloads with closed-form decoded stats.

    Each audio-kind doc becomes a mono 8 kHz G.711 stream — mu-law
    (format 7) for even doc_ids, A-law (format 6) for odd — of k
    period-8 cycles of 5 full-scale-positive then 3 full-scale-negative
    samples. Full scale decodes to exactly +-32124 (mu) / +-32256 (A) by
    the published expansions, so RMS = amp/32768, mean = amp/131072
    (sign-SENSITIVE: a companding sign bug flips it — the round-9 A-law
    regression guard), zero crossings = 2k-1, duration = k ms — all
    closed-form for the cross-engine oracle, no value on a rounding tie.
    Positive bytes: 0x80 (mu: complement 0x7F, sign clear), 0xAA (A:
    ^0x55 = 0xFF, sign SET — the inverted-vs-mu convention)."""
    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (2 + F.col("n_chars") % 30).cast("int").alias("k"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, k in zip(pdf["media_id"], pdf["k"]):
                mu = int(mid) % 2 == 0
                pos, neg = (0x80, 0x00) if mu else (0xAA, 0x2A)
                data = bytes([pos] * 5 + [neg] * 3) * int(k)
                fmt = struct.pack(
                    "<HHIIHH", 7 if mu else 6, 1, 8000, 8000, 1, 8
                )
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
                payloads.append(
                    b"RIFF" + struct.pack("<I", len(body)) + body
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_png_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL PNG payloads derived from the documents table.

    Each image-kind doc becomes an 8x8 grayscale gradient
    (pixel_i = (i * ((doc_id % 7) + 1)) % 256) encoded to real
    zlib-deflated PNG bytes (every scanline filter type, via
    ``encode_png(..., 'cycle')``). Mean luma is an analytic function of
    (doc_id) an external engine can reproduce with a generated series —
    cross-engine value-checking the inflate + unfilter + luma path.
    """
    from routing_algorithm_for_graph_dbs_spark.operators.png import encode_png

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
        ((F.col("doc_id") % 7) + 1).cast("int").alias("mult"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(64, dtype=np.int64)
        for pdf in batches:
            payloads = [
                encode_png(
                    ((idx * int(m)) % 256).astype(np.uint8).reshape(8, 8),
                    "cycle",
                )
                for m in pdf["mult"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/png",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_jpeg_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL JPEG payloads derived from the documents table.

    Each image-kind doc becomes a FLAT gray image (g = 16 + (doc_id % 14)
    * 16, dims (8 + doc_id % 9) x (8 + doc_id % 7)) encoded at quality 90
    through one of FIVE real encoder variants chosen by (doc_id // 3) %
    5: baseline grayscale, progressive grayscale (the full successive-
    approximation scan script), progressive YCbCr 4:2:0 (interleaved DC
    scans; chroma AC scans the decoder skips), and — round 12 — the two
    ARITHMETIC modes (sequential SOF9 and progressive SOF10, the T.81
    QM-coder; the entropy stage is lossless over the same quantized
    coefficients, so the closed form is unchanged). Flat images make the
    decoded mean closed-form — the only nonzero coefficient is the block
    DC, so every decoded pixel is 128 + round(8*(g-128)/q0) * q0/8 with
    q0 = 3 (Annex K luma table at quality 90) — reproducible in SQL
    (see mm_jpeg_roundtrip's oracle)."""
    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        encode_jpeg_gray,
        encode_jpeg_gray_arith,
        encode_jpeg_gray_arith_progressive,
        encode_jpeg_gray_progressive,
        encode_jpeg_ycbcr420_progressive,
    )

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (16 + (F.col("doc_id") % 14) * 16).cast("int").alias("g"),
        (8 + F.col("doc_id") % 9).cast("int").alias("w"),
        (8 + F.col("doc_id") % 7).cast("int").alias("h"),
        # image docs all have doc_id % 3 == 0, so cycle on doc_id // 3
        ((F.col("doc_id") / 3).cast("long") % 5).cast("int").alias("variant"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for g, w, h, v in zip(
                pdf["g"], pdf["w"], pdf["h"], pdf["variant"]
            ):
                img = np.full((int(h), int(w)), int(g), np.uint8)
                if v == 0:
                    payloads.append(encode_jpeg_gray(img, 90))
                elif v == 1:
                    payloads.append(encode_jpeg_gray_progressive(img, 90))
                elif v == 2:
                    payloads.append(encode_jpeg_ycbcr420_progressive(img, 90))
                elif v == 3:
                    payloads.append(encode_jpeg_gray_arith(img, 90))
                else:
                    payloads.append(encode_jpeg_gray_arith_progressive(img, 90))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/jpeg",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_jpeg_lossless_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL LOSSLESS (SOF3 + SOF11) JPEG payloads (round
    13; arithmetic flavor round 14).

    Each image-kind doc becomes a diagonal RAMP image (pixel[y, x] =
    g + x + y, never clipping: g <= 224, x + y <= 28) encoded through
    the T.81 Annex H DPCM encoder with the predictor cycling 1..7 on
    doc_id // 3 and a 4-row restart interval on every other doc (the
    H.1.1 per-interval predictor reset — restarts change the stream,
    never the pixels). Every third image doc encodes ARITHMETIC
    lossless (SOF11, the H.1.2 QM-coded statistical model) instead of
    Huffman — the entropy stage changes, the pixels do not, so the
    closed-form oracle covers both flavors. Lossless decode is EXACT,
    so the oracle states the decoded mean in closed form:
    g + (w-1)/2 + (h-1)/2 (see mm_jpeg_lossless). A ramp, unlike the
    flat DCT images, exercises every predictor's Ra/Rb/Rc arithmetic
    on every sample."""
    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        encode_jpeg_gray_lossless,
    )

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (16 + (F.col("doc_id") % 14) * 16).cast("int").alias("g"),
        (8 + F.col("doc_id") % 9).cast("int").alias("w"),
        (8 + F.col("doc_id") % 7).cast("int").alias("h"),
        (1 + (F.col("doc_id") / 3).cast("long") % 7).cast("int").alias("pred"),
        (F.when((F.col("doc_id") / 3).cast("long") % 2 == 0, 4)
         .otherwise(0)).cast("int").alias("rst"),
        ((F.col("doc_id") / 3).cast("long") % 3 == 1).alias("ar"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for g, w, h, pred, rst, ar in zip(
                pdf["g"], pdf["w"], pdf["h"], pdf["pred"], pdf["rst"],
                pdf["ar"],
            ):
                img = (
                    int(g)
                    + np.add.outer(np.arange(int(h)), np.arange(int(w)))
                ).astype(np.uint8)
                payloads.append(encode_jpeg_gray_lossless(
                    img, predictor=int(pred), restart_rows=int(rst),
                    arith=bool(ar)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/jpeg",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_jpeg_hierarchical_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL HIERARCHICAL (Annex J) JPEG payloads (round
    14). Each image-kind doc becomes the same diagonal RAMP image as the
    SOF3 row (pixel[y, x] = g + x + y), encoded as a DHP/EXP pyramid —
    SOF3 initial frame + SOF7 lossless differential frames, or on every
    third image doc the QM-coded twins (SOF11 initial + SOF15
    differentials — the pixels are identical, only the entropy stage
    changes) — with the level count cycling 1..3 on doc_id // 3 (level
    1 degenerates to a single non-differential frame; 2 and 3 exercise
    EXP expansion and mod-2^16 differential reconstruction on every
    sample). The lossless pyramid decodes EXACTLY, so the oracle states
    the decoded mean in the same closed form as mm_jpeg_lossless:
    g + (w-1)/2 + (h-1)/2."""
    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        encode_jpeg_gray_hierarchical,
    )

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (16 + (F.col("doc_id") % 14) * 16).cast("int").alias("g"),
        (8 + F.col("doc_id") % 9).cast("int").alias("w"),
        (8 + F.col("doc_id") % 7).cast("int").alias("h"),
        (1 + (F.col("doc_id") / 3).cast("long") % 3).cast("int").alias("lv"),
        ((F.col("doc_id") / 3).cast("long") % 3 == 2).alias("ar"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for g, w, h, lv, ar in zip(
                pdf["g"], pdf["w"], pdf["h"], pdf["lv"], pdf["ar"]
            ):
                img = (
                    int(g)
                    + np.add.outer(np.arange(int(h)), np.arange(int(w)))
                ).astype(np.uint8)
                payloads.append(
                    encode_jpeg_gray_hierarchical(
                        img, levels=int(lv), arith=bool(ar))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/jpeg",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_webp_lossy_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL LOSSY-WebP payloads (round 13 — the VP8
    key-frame codec). Each image-kind doc becomes a flat gray frame
    (Y = g, chroma 128) through ``operators/vp8.py
    encode_vp8_gray_flat``: with qindex 0 the minted Y2-carried DC
    reconstructs EXACTLY g (the (8c+4)>>3 / (8L+3)>>3 ladder is
    remainder-free), so the decoded mean is closed-form g/255 —
    libwebp reads the same payloads bit-exact (crosschecked)."""
    from routing_algorithm_for_graph_dbs_spark.operators.vp8 import (
        build_webp_lossy_flat,
    )

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (16 + (F.col("doc_id") % 14) * 16).cast("int").alias("g"),
        (8 + F.col("doc_id") % 9).cast("int").alias("w"),
        (8 + F.col("doc_id") % 7).cast("int").alias("h"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_webp_lossy_flat(int(g), int(w), int(h))
                for g, w, h in zip(pdf["g"], pdf["w"], pdf["h"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/webp",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_mp4_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL MP4 payloads derived from the documents table.

    Each video-kind doc becomes a minimal standard-conformant ISO-BMFF
    file (``operators/mp4.py build_mp4``): duration n_chars * 10 ms (the
    same convention the synthetic metadata column uses), dimensions and
    audio-track count cycling on doc_id — all closed-form for the
    cross-engine oracle (mm_mp4_metadata)."""
    from routing_algorithm_for_graph_dbs_spark.operators.mp4 import build_mp4

    base = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (F.col("n_chars") * 10).cast("long").alias("dur"),
        (320 + (F.col("doc_id") % 5) * 64).cast("int").alias("w"),
        (180 + (F.col("doc_id") % 5) * 36).cast("int").alias("h"),
        (F.col("doc_id") % 2).cast("int").alias("n_audio"),
        # round 9: real sample tables — frame count and fps cycle in
        # closed form for the oracle (fps from {24, 25, 30}; the index
        # uses doc_id//3 because doc_id % 3 is pinned to 2 by the filter)
        (24 + (F.col("doc_id") % 7) * 12).cast("int").alias("nf"),
    )

    _FPS = (24.0, 25.0, 30.0)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_mp4(
                    int(d),
                    int(w),
                    int(h),
                    n_audio_tracks=int(a),
                    n_frames=int(nf),
                    fps=_FPS[(int(mid) // 3) % 3],
                )
                for mid, d, w, h, a, nf in zip(
                    pdf["media_id"],
                    pdf["dur"],
                    pdf["w"],
                    pdf["h"],
                    pdf["n_audio"],
                    pdf["nf"],
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "video/mp4",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def video_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched video METADATA extraction over binary payloads.

    Frame decode genuinely needs an av library (the honest boundary),
    but the fields a pipeline filters and plans on — duration,
    dimensions, track count, brand — live in the public ISO-BMFF box
    structure, parsed for REAL by ``operators/mp4.py`` when the payload
    carries an ftyp signature (parser='mp4'). Payloads without it (the
    synthetic tables label text payloads video/mp4) take the
    deterministic sha256 fake, or raise under ``strict=True``; a payload
    that sniffs mp4 but has corrupt framing falls to the fake the same
    way (module contract: mislabeled payloads must not crash the stage).
    Map-side only — the payload column never crosses a shuffle."""
    from routing_algorithm_for_graph_dbs_spark.operators.mp4 import (
        is_mp4,
        parse_mp4_metadata,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_mp4(b):
                        parsed = parse_mp4_metadata(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    brand, dur, w, h, n_trk, n_frames, fps = parsed
                    parser = "mp4"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real video metadata needs ISO-BMFF framing —"
                            " this payload has none (frame decode itself"
                            " needs ffmpeg, not in this container)"
                        )
                    d = hashlib.sha256(b).digest()
                    brand = None
                    dur = (d[3] * 256 + d[4]) * 10
                    w, h = 64 + d[0] % 192, 64 + d[1] % 192
                    n_trk = 1 + d[5] % 3
                    n_frames = 1 + d[6]
                    fps = float((24, 25, 30)[d[7] % 3])
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        brand,
                        int(dur),
                        int(w),
                        int(h),
                        int(n_trk),
                        int(n_frames),
                        float(fps),
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "brand", "duration_ms",
                    "width", "height", "n_tracks", "n_frames", "fps",
                    "parser",
                ],
            )

    # callers pre-filter kind (like image_features' callers do) — synth
    # tables carry no kind column
    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, brand string,"
            " duration_ms long, width int, height int, n_tracks int,"
            " n_frames int, fps double, parser string"
        ),
    )


def synth_mp3_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL MPEG-audio payloads from the documents table.

    Each audio-kind doc becomes a CBR MPEG-1 Layer III stream
    (``operators/mp3.py build_mp3``: conformant frame headers, zeroed
    payloads) whose bitrate / sample rate / channel mode / frame count
    cycle in closed form on doc_id, with ID3v2 and ID3v1 tags toggling
    on sub-cycles to exercise the skip paths. Every parsed field —
    including total n_bytes via the frame-length formula
    floor(144*bitrate/rate)*n_frames — is SQL-predictable, so the
    cross-engine oracle checks the real header walk end-to-end."""
    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import build_mp3

    _BR = (64, 96, 128, 160, 192, 256, 320)
    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (8 + F.col("n_chars") % 40).cast("int").alias("nf"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, nf in zip(pdf["media_id"], pdf["nf"]):
                mid = int(mid)
                payloads.append(
                    build_mp3(
                        int(nf),
                        bitrate_kbps=_BR[(mid // 3) % 7],
                        sample_rate=(44100, 48000, 32000)[(mid % 9) // 3],
                        mode="stereo" if mid % 2 == 0 else "mono",
                        id3v2_bytes=32 if mid % 2 == 1 else 0,
                        id3v1=mid % 5 == 0,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/mpeg",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def mp3_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched MPEG-audio METADATA extraction (same plumbing
    contract as ``video_metadata`` — the audio analog of the ISO-BMFF
    split). Payloads that sniff as MPEG audio (valid frame sync at byte
    0 or after a leading ID3v2 tag — an ID3 tag alone does not commit,
    so ID3-tagged ADTS-AAC routes to the AAC walk instead) get the REAL
    frame-header walk (``operators/mp3.py``,
    parser='mp3'): version, layer, sample rate, average bitrate, frame
    count, duration, VBR flag, channel mode — the fields an audio
    pipeline filters and plans on. Sample DECODE stays the honest
    boundary. Non-MPEG payloads take the deterministic sha256 fake, or
    raise under ``strict=True``; a payload that sniffs MPEG but has
    corrupt framing falls to the fake the same way. Map-side only — the
    payload column never crosses a shuffle."""
    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import (
        is_mp3,
        parse_mp3_metadata,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_mp3(b):
                        parsed = parse_mp3_metadata(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    ver, layer, rate, kbps, n_frames, dur, vbr, mode = parsed
                    parser = "mp3"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real audio metadata needs MPEG framing — this"
                            " payload has none (sample decode itself needs"
                            " a codec library, not in this container)"
                        )
                    d = hashlib.sha256(b).digest()
                    ver, layer = "1", 3
                    rate = (44100, 48000, 32000)[d[0] % 3]
                    kbps = (64, 128, 192, 320)[d[1] % 4]
                    n_frames = 1 + d[2]
                    dur = int(round(n_frames * 1152 * 1000.0 / rate))
                    vbr = False
                    mode = ("stereo", "mono")[d[4] % 2]
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        ver,
                        int(layer),
                        int(rate),
                        int(kbps),
                        int(n_frames),
                        int(dur),
                        bool(vbr),
                        mode,
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "mpeg_version", "layer",
                    "sample_rate", "bitrate_kbps", "n_frames", "duration_ms",
                    "vbr", "channel_mode", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, mpeg_version"
            " string, layer int, sample_rate int, bitrate_kbps int,"
            " n_frames int, duration_ms long, vbr boolean, channel_mode"
            " string, parser string"
        ),
    )


def synth_aac_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL ADTS-AAC framing from the documents table:
    per audio-kind doc, ``nf`` frames of ``fb`` bytes at a cycling
    rate/channel config — total bytes (nf*fb) and duration
    (nf*1024/rate) closed-form for the cross-engine oracle."""
    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import build_adts

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (6 + F.col("n_chars") % 50).cast("int").alias("nf"),
        (100 + F.col("doc_id") % 30).cast("int").alias("fb"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, nf, fb in zip(pdf["media_id"], pdf["nf"], pdf["fb"]):
                mid = int(mid)
                payloads.append(
                    build_adts(
                        int(nf),
                        frame_bytes=int(fb),
                        sample_rate=(48000, 44100, 32000)[(mid % 9) // 3],
                        n_channels=1 + mid % 2,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/aac",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def aac_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched ADTS-AAC METADATA extraction (same plumbing contract
    as ``mp3_metadata``/``video_metadata``): payloads that sniff as ADTS
    get the REAL frame-header walk (``operators/mp3.py
    parse_adts_metadata``, parser='aac') — profile, sample rate,
    channels, frame count, duration, average bitrate. Raw-block DECODE
    stays the honest boundary. Non-ADTS payloads take the deterministic
    sha256 fake, or raise under ``strict=True``. Map-side only."""
    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import (
        is_adts,
        parse_adts_metadata,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_adts(b):
                        parsed = parse_adts_metadata(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    profile, rate, ch, n_frames, dur, kbps = parsed
                    parser = "aac"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real AAC metadata needs ADTS framing — this"
                            " payload has none (raw-block decode itself"
                            " needs a codec library, not in this container)"
                        )
                    d = hashlib.sha256(b).digest()
                    profile = ("Main", "LC", "SSR", "LTP")[d[0] % 4]
                    rate = (48000, 44100, 32000)[d[1] % 3]
                    ch = 1 + d[2] % 2
                    n_frames = 1 + d[3]
                    dur = int(round(n_frames * 1024 * 1000.0 / rate))
                    kbps = (64, 128, 192)[d[4] % 3]
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        profile,
                        int(rate),
                        int(ch),
                        int(n_frames),
                        int(dur),
                        int(kbps),
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "profile",
                    "sample_rate", "n_channels", "n_frames", "duration_ms",
                    "bitrate_kbps", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, profile string,"
            " sample_rate int, n_channels int, n_frames int,"
            " duration_ms long, bitrate_kbps int, parser string"
        ),
    )


def synth_flac_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL FLAC containers from the documents table: per
    audio-kind doc, a STREAMINFO declaring ``96 * (10 + n_chars % 200)``
    total samples at a cycling rate/channel/bit-depth config, an
    optional PADDING block, and a synced frame region — every size and
    the exact duration closed-form for the cross-engine oracle (rates
    48000/32000/24000 divide 96 * 1000 exactly: durations are integer
    milliseconds with no rounding ties)."""
    from routing_algorithm_for_graph_dbs_spark.operators.flac import build_flac

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (96 * (10 + F.col("n_chars") % 200)).cast("long").alias("ts"),
        ((F.col("doc_id") % 5) * 7).cast("int").alias("pad"),
        (32 + F.col("doc_id") % 40).cast("int").alias("fb"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, ts, pad, fb in zip(
                pdf["media_id"], pdf["ts"], pdf["pad"], pdf["fb"]
            ):
                mid = int(mid)
                payloads.append(
                    build_flac(
                        int(ts),
                        sample_rate=(48000, 32000, 24000)[(mid % 9) // 3],
                        n_channels=1 + mid % 2,
                        bits_per_sample=(16, 24)[(mid // 3) % 2],
                        padding_bytes=int(pad),
                        frame_bytes=int(fb),
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/flac",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def flac_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched FLAC METADATA extraction (same plumbing contract as
    ``mp3_metadata``/``aac_metadata``): payloads that sniff as FLAC get
    the REAL metadata-block walk (``operators/flac.py``, parser='flac')
    — sample rate, channels, bit depth, the EXACT total-sample count and
    duration from STREAMINFO, plus the block count the chain walk
    visited — no frame decode needed for these fields (for REAL sample
    decode, ``audio_features`` routes decodable FLAC through
    ``decode_flac_pcm`` since round 11). Non-FLAC payloads take the
    deterministic sha256 fake, or raise under ``strict=True``.
    Map-side only — the payload never crosses a shuffle."""
    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        is_flac,
        parse_flac_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import (
        _post_id3_offset,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_flac(b):
                        parsed = parse_flac_metadata(b)
                    else:
                        # skip a leading ID3v2 tag before the sniff,
                        # same as the ADTS route (round 11)
                        off = _post_id3_offset(b)
                        if off and is_flac(b[off:]):
                            parsed = parse_flac_metadata(b[off:])
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    rate, ch, bps, ts, dur, n_blocks, _ab = parsed
                    parser = "flac"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real FLAC metadata needs a STREAMINFO chain —"
                            " this payload has none"
                        )
                    d = hashlib.sha256(b).digest()
                    rate = (48000, 44100, 32000)[d[0] % 3]
                    ch = 1 + d[1] % 2
                    bps = (16, 24)[d[2] % 2]
                    ts = 1000 + int.from_bytes(d[3:5], "big")
                    dur = int(round(ts * 1000.0 / rate))
                    n_blocks = 1
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        int(rate),
                        int(ch),
                        int(bps),
                        int(ts),
                        int(dur),
                        int(n_blocks),
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "sample_rate",
                    "n_channels", "bits_per_sample", "total_samples",
                    "duration_ms", "n_blocks", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, sample_rate int,"
            " n_channels int, bits_per_sample int, total_samples long,"
            " duration_ms long, n_blocks int, parser string"
        ),
    )


def synth_opus_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL Ogg/Opus streams from the documents table: per
    audio-kind doc, an OpusHead + OpusTags + ``5 + n_chars % 60`` audio
    pages (real page CRCs, 960 granule ticks per page = 20 ms each) at a
    cycling pre-skip/rate/channel config — total bytes and duration
    closed-form for the cross-engine oracle."""
    from routing_algorithm_for_graph_dbs_spark.operators.opus import build_opus

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (5 + F.col("n_chars") % 60).cast("int").alias("nf"),
        (40 + F.col("doc_id") % 50).cast("int").alias("pb"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, nf, pb in zip(pdf["media_id"], pdf["nf"], pdf["pb"]):
                mid = int(mid)
                payloads.append(
                    build_opus(
                        int(nf),
                        packet_bytes=int(pb),
                        pre_skip=312 + mid % 100,
                        input_sample_rate=(48000, 24000, 16000)[(mid % 9) // 3],
                        n_channels=1 + mid % 2,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/ogg",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def opus_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched Ogg/Opus METADATA extraction (same plumbing contract
    as ``flac_metadata``): payloads that sniff as Ogg-encapsulated Opus
    get the REAL page walk (``operators/opus.py``, parser='opus') — every
    page's CRC verified, channels/pre-skip/input rate from OpusHead,
    page count, and granule-derived duration. CELT/SILK packet DECODE
    stays the honest boundary. Non-Opus payloads take the deterministic
    sha256 fake, or raise under ``strict=True``. Map-side only."""
    from routing_algorithm_for_graph_dbs_spark.operators.opus import (
        is_ogg_opus,
        parse_opus_metadata,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_ogg_opus(b):
                        parsed = parse_opus_metadata(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    ch, pre_skip, rate, n_pages, dur = parsed
                    parser = "opus"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real Opus metadata needs Ogg/OpusHead framing"
                            " — this payload has none (packet decode itself"
                            " needs a codec library, not in this container)"
                        )
                    d = hashlib.sha256(b).digest()
                    ch = 1 + d[0] % 2
                    pre_skip = 312
                    rate = (48000, 24000, 16000)[d[1] % 3]
                    n_pages = 2 + d[2] % 60
                    dur = (n_pages - 2) * 20
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        int(ch),
                        int(pre_skip),
                        int(rate),
                        int(n_pages),
                        int(dur),
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "n_channels",
                    "pre_skip", "input_sample_rate", "n_pages",
                    "duration_ms", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, n_channels int,"
            " pre_skip int, input_sample_rate int, n_pages int,"
            " duration_ms long, parser string"
        ),
    )


def synth_webm_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL WebM/Matroska containers from the documents
    table: per video-kind doc, an EBML header + Segment{Info, one video
    + one audio track, ``1 + doc_id % 4`` Clusters of ``2000 + n_chars
    % 3000`` pad bytes} at cycling dimension/rate/doctype configs —
    every size and field closed-form for the cross-engine oracle
    (fixed 8-byte size VINTs, see ``operators/ebml.py``)."""
    from routing_algorithm_for_graph_dbs_spark.operators.ebml import build_webm

    base = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (20000 + (F.col("doc_id") % 500) * 16).cast("long").alias("dur"),
        (1 + F.col("doc_id") % 4).cast("int").alias("nc"),
        (2000 + F.col("n_chars") % 3000).cast("int").alias("pad"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, dur, nc, pad in zip(
                pdf["media_id"], pdf["dur"], pdf["nc"], pdf["pad"]
            ):
                mid = int(mid)
                w, h = ((1280, 720), (1920, 1080), (640, 360))[(mid // 3) % 3]
                payloads.append(
                    build_webm(
                        int(dur),
                        width=w,
                        height=h,
                        sample_rate=(48000, 44100, 32000)[(mid % 9) // 3],
                        n_channels=1 + mid % 2,
                        n_clusters=int(nc),
                        cluster_pad=int(pad),
                        doctype="matroska" if mid % 5 == 0 else "webm",
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "video/webm",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_webm_vp8_media(docs: DataFrame) -> DataFrame:
    """Deterministic WebM containers with REAL VP8 video frames (round
    14 — video FRAME decode off the boundary by composition): per
    video-kind doc, ``1 + doc_id % 3`` flat-gray key frames at
    ``g = 16 + (doc_id % 14) * 16 + 7 * k`` for frame k (the +7 walks
    successive frames through different token-tree branches, including
    the small-level DCT_4/cat1/cat2 paths), width/height on the same
    cycles as the WebP lossy row, packed as SimpleBlocks on a V_VP8
    track (``operators/ebml.py build_webm``)."""
    from routing_algorithm_for_graph_dbs_spark.operators.ebml import (
        build_webm,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.vp8 import (
        encode_vp8_gray_flat,
    )

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (16 + (F.col("doc_id") % 14) * 16).cast("int").alias("g"),
        (8 + F.col("doc_id") % 9).cast("int").alias("w"),
        (8 + F.col("doc_id") % 7).cast("int").alias("h"),
        (1 + F.col("doc_id") % 3).cast("int").alias("nf"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for g, w, h, nf in zip(
                pdf["g"], pdf["w"], pdf["h"], pdf["nf"]
            ):
                frames = [
                    encode_vp8_gray_flat(int(g) + 7 * k, int(w), int(h))
                    for k in range(int(nf))
                ]
                payloads.append(build_webm(
                    33 * int(nf), width=int(w), height=int(h),
                    vp8_frames=frames,
                ))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "video/webm",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def webm_frame_features(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched WebM VIDEO-FRAME feature extraction (round 14):
    payloads that sniff as EBML get the SimpleBlock walk
    (``operators/ebml.py extract_vp8_keyframes``) and every VP8 key
    frame REALLY decodes through the RFC 6386 pipeline
    (``operators/vp8.py``, the codec libwebp validates sample-exact in
    the crosscheck suite). Emits the key-frame count, the first key
    frame's dimensions and mean luma (floor-rounded to 6, the decoded-Y
    contract shared with image_features), and the mean luma over ALL
    key frames — the frame-sampling signal a video curation pipeline
    filters on. A VP8-less or frameless WebM yields n_keyframes=0 with
    null frame stats; non-EBML payloads raise under ``strict=True`` and
    take the sha256 fake otherwise. Map-side only; payloads never
    shuffle."""
    from routing_algorithm_for_graph_dbs_spark.operators.ebml import (
        extract_vp8_keyframes,
        is_webm,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.vp8 import (
        decode_vp8_keyframe,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                frames = None
                try:
                    if is_webm(b):
                        frames = extract_vp8_keyframes(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                if frames is None:
                    if strict:
                        raise NotImplementedError(
                            "real WebM frame decode needs EBML framing —"
                            " this payload has none"
                        )
                    d = hashlib.sha256(b).digest()
                    rows.append((int(mid), len(b), int(d[0]), None, None,
                                 None, None, "fake"))
                    continue
                if not frames:
                    rows.append((int(mid), len(b), 0, None, None, None,
                                 None, "webm-vp8"))
                    continue
                lumas = []
                w0 = h0 = None
                for _tc, fr in frames:
                    y, _u, _v = decode_vp8_keyframe(bytes(fr))
                    if w0 is None:
                        h0, w0 = y.shape
                    lumas.append(float(y.mean()) / 255.0)
                first = float(np.floor(lumas[0] * 1e6 + 0.5) / 1e6)
                allm = float(np.floor(
                    (sum(lumas) / len(lumas)) * 1e6 + 0.5) / 1e6)
                rows.append((int(mid), len(b), len(frames), int(w0),
                             int(h0), first, allm, "webm-vp8"))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "n_keyframes", "width",
                         "height", "first_luma", "mean_luma", "decoder"],
            )

    # arrow-stage: map-side by design; payloads never shuffle
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=("media_id long, n_bytes long, n_keyframes int, "
                "width int, height int, first_luma double, "
                "mean_luma double, decoder string"),
    )


def webm_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched WebM/Matroska METADATA extraction (same plumbing
    contract as ``video_metadata``, the EBML sibling of the ISO-BMFF
    walk): payloads that sniff as EBML get the REAL element walk
    (``operators/ebml.py``, parser='webm') — DocType, TimecodeScale x
    Duration -> exact milliseconds, track counts, the video track's
    dimensions, the audio track's rate/channels, and the Cluster count
    (cluster BODIES are hopped by size — frame decode stays the honest
    boundary). Non-EBML payloads take the deterministic sha256 fake, or
    raise under ``strict=True``. Map-side only."""
    from routing_algorithm_for_graph_dbs_spark.operators.ebml import (
        is_webm,
        parse_webm_metadata,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_webm(b):
                        parsed = parse_webm_metadata(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    dt, dur, nv, na, w, h, rate, ch, nclu = parsed
                    parser = "webm"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real WebM metadata needs EBML framing — this"
                            " payload has none (frame decode itself needs"
                            " a codec library, not in this container)"
                        )
                    d = hashlib.sha256(b).digest()
                    dt = "webm"
                    dur = 1000 * (1 + d[0])
                    nv, na = 1, d[1] % 2
                    w, h = (1280, 640)[d[2] % 2], (720, 360)[d[2] % 2]
                    rate = (48000, 44100)[d[3] % 2] if na else None
                    ch = 1 + d[4] % 2 if na else None
                    nclu = 1 + d[5] % 4
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        dt,
                        int(dur),
                        int(nv),
                        int(na),
                        None if w is None else int(w),
                        None if h is None else int(h),
                        None if rate is None else int(rate),
                        None if ch is None else int(ch),
                        int(nclu),
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "doctype",
                    "duration_ms", "n_video", "n_audio", "width", "height",
                    "sample_rate", "n_channels", "n_clusters", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, doctype string,"
            " duration_ms long, n_video int, n_audio int, width int,"
            " height int, sample_rate int, n_channels int, n_clusters int,"
            " parser string"
        ),
    )


def synth_gif_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL GIF containers from the documents table: per
    image-kind doc, a GIF87a still or a GIF89a animation at cycling
    dimension/palette configs with ``1 + doc_id % 5`` frames of
    ``10 + n_chars % 100`` filler bytes — every size and field
    closed-form for the cross-engine oracle (``operators/gif.py``).
    87a files (every sixth doc) carry no Graphic Control Extensions —
    the extension block postdates 87a — so their parsed duration is 0."""
    from routing_algorithm_for_graph_dbs_spark.operators.gif import build_gif

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (1 + F.col("doc_id") % 5).cast("int").alias("nf"),
        (10 + F.col("n_chars") % 100).cast("int").alias("pad"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, nf, pad in zip(pdf["media_id"], pdf["nf"], pdf["pad"]):
                mid = int(mid)
                w, h = ((320, 200), (640, 400), (128, 96))[(mid // 3) % 3]
                old87 = mid % 6 == 0
                payloads.append(
                    build_gif(
                        w,
                        h,
                        n_frames=int(nf),
                        delay_cs=0 if old87 else 3 + mid % 8,
                        gct_bits=(0, 3, 5, 8)[mid % 4],
                        bg_index=mid % 7,
                        frame_pad=int(pad),
                        version="87a" if old87 else "89a",
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/gif",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def gif_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched GIF METADATA extraction (same plumbing contract as
    ``image_features``): payloads that sniff as GIF get the REAL block
    walk (``operators/gif.py``, parser='gif') — version, canvas
    dimensions, Global Color Table size, frame count, and the exact
    animation duration from summed Graphic Control Extension delays
    (image data sub-blocks are hopped by length here; pixel decode is
    REAL in gif_pixel_features / gif_frame_samples since round 11).
    Non-GIF payloads take the deterministic
    sha256 fake, or raise under ``strict=True``. Map-side only."""
    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        is_gif,
        parse_gif_metadata,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_gif(b):
                        parsed = parse_gif_metadata(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    ver, w, h, gct, bg, nf, dur = parsed
                    parser = "gif"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real GIF metadata needs the GIF87a/89a block"
                            " structure — this payload has none (LZW pixel"
                            " decode itself needs a codec library, not in"
                            " this container)"
                        )
                    d = hashlib.sha256(b).digest()
                    ver = ("87a", "89a")[d[0] % 2]
                    w, h = 16 * (1 + d[1] % 40), 16 * (1 + d[2] % 30)
                    gct = (0, 8, 32, 256)[d[3] % 4]
                    bg, nf = d[4] % 8, 1 + d[5] % 5
                    dur = nf * (d[6] % 90) * 10
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        ver,
                        int(w),
                        int(h),
                        int(gct),
                        int(bg),
                        int(nf),
                        int(dur),
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "version", "width",
                    "height", "gct_colors", "bg_index", "n_frames",
                    "duration_ms", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, version string,"
            " width int, height int, gct_colors int, bg_index int,"
            " n_frames int, duration_ms long, parser string"
        ),
    )


def synth_tiff_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL TIFF files from the documents table: per doc,
    a single- or multi-page TIFF (``1 + doc_id % 4`` IFDs) in cycling
    byte orders, bit depths, and compression tags, each page pointing
    at a ``2 * (20 + n_chars % 200)``-byte strip — every size and field
    closed-form for the cross-engine oracle (``operators/tiff.py``)."""
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import build_tiff

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (100 + F.col("doc_id") % 900).cast("int").alias("w"),
        (80 + F.col("n_chars") % 600).cast("int").alias("h"),
        (2 * (20 + F.col("n_chars") % 200)).cast("int").alias("pad"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, w, h, pad in zip(
                pdf["media_id"], pdf["w"], pdf["h"], pdf["pad"]
            ):
                mid = int(mid)
                payloads.append(
                    build_tiff(
                        int(w),
                        int(h),
                        bits_per_sample=(1, 8, 16)[(mid // 2) % 3],
                        compression=(1, 1, 5, 7, 32773)[mid % 5],
                        photometric=(mid // 5) % 3,
                        n_ifds=1 + mid % 4,
                        strip_pad=int(pad),
                        byte_order="II" if mid % 2 == 0 else "MM",
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/tiff",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def tiff_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched TIFF METADATA extraction: payloads that sniff as
    TIFF get the REAL IFD-chain walk (``operators/tiff.py``,
    parser='tiff') in either byte order — dimensions, bit depth,
    compression and photometric tags from the first IFD, page count
    from the chain (strip PIXEL data is referenced by offset and never
    read here; raw/PackBits raster decode is REAL in
    tiff_pixel_features since round 11 — LZW/JPEG strips stay the
    boundary). Non-TIFF payloads
    take the deterministic sha256 fake, or raise under ``strict=True``.
    Map-side only."""
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        is_tiff,
        parse_tiff_metadata,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_tiff(b):
                        parsed = parse_tiff_metadata(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    bo, w, h, bits, comp, photo, _spp, nifd = parsed
                    parser = "tiff"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real TIFF metadata needs the II/MM IFD"
                            " structure — this payload has none (raster"
                            " decode itself needs a codec library, not in"
                            " this container)"
                        )
                    d = hashlib.sha256(b).digest()
                    bo = ("II", "MM")[d[0] % 2]
                    w, h = 100 + d[1] * 4, 80 + d[2] * 3
                    bits = (1, 8, 16)[d[3] % 3]
                    comp = (1, 5, 7)[d[4] % 3]
                    photo, nifd = d[5] % 3, 1 + d[6] % 4
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        bo,
                        int(w),
                        int(h),
                        int(bits),
                        int(comp),
                        int(photo),
                        int(nifd),
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "byte_order", "width",
                    "height", "bits_per_sample", "compression",
                    "photometric", "n_ifds", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, byte_order string,"
            " width int, height int, bits_per_sample int, compression int,"
            " photometric int, n_ifds int, parser string"
        ),
    )


def synth_gif_pixel_media(docs: DataFrame) -> DataFrame:
    """Deterministic GIFs with REAL LZW-encoded pixel payloads: per doc,
    a 256-gray single-frame image whose rows are constant values
    ``(doc_id % 16) + 16k (mod 256)`` over a height that is a multiple
    of 16 — so the decoded mean luma is EXACTLY ``(doc_id % 16) + 120``
    (an integer; no float hazard) and the cross-engine oracle states it
    in closed form without running LZW."""
    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_pixels,
    )

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (8 * (1 + F.col("doc_id") % 5)).cast("int").alias("w"),
        (16 * (1 + F.col("doc_id") % 6)).cast("int").alias("h"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                mid, w, h = int(mid), int(w), int(h)
                b = mid % 16
                px = bytes(
                    v
                    for y in range(h)
                    for v in [(b + 16 * (y % 16)) % 256] * w
                )
                payloads.append(build_gif_pixels(w, h, px, gct_bits=8))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/gif",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def gif_pixel_features(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """REAL GIF pixel decode (round 11 — LZW is a pure table-driven
    algorithm, spec Appendix F; no codec library involved, so it moves
    OFF the declared boundary): payloads that sniff as GIF get the full
    LZW inflate of the first frame plus the palette luma mean
    (``operators/gif.py decode_gif_pixels``, parser='gif'). Non-GIF
    payloads take the deterministic sha256 fake, or raise under
    ``strict=True``. Map-side only."""
    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        decode_gif_pixels,
        is_gif,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_gif(b):
                        parsed = decode_gif_pixels(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    w, h, luma = parsed
                    parser = "gif"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real GIF pixel decode needs the GIF87a/89a"
                            " container + a valid LZW stream — this"
                            " payload has neither"
                        )
                    d = hashlib.sha256(b).digest()
                    w, h = 16 * (1 + d[0] % 40), 16 * (1 + d[1] % 30)
                    luma = float(d[2])
                    parser = "fake"
                rows.append(
                    (int(mid), hashlib.sha256(b).hexdigest(), len(b),
                     int(w), int(h), float(luma), parser)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "width", "height",
                    "mean_luma", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, width int,"
            " height int, mean_luma double, parser string"
        ),
    )


def synth_tiff_pixel_media(docs: DataFrame) -> DataFrame:
    """Deterministic grayscale TIFFs with REAL sample strips cycling
    all six strip codecs by ``doc_id % 6`` — raw, PackBits, LZW,
    LZW + horizontal-differencing predictor, Deflate, Deflate +
    predictor (round 12) — with II/MM byte orders cycling on
    ``doc_id // 6`` and the strip LAYOUT cycling whole-image /
    4-row / single-row strips on ``doc_id // 2`` (multi-strip is how
    real scanned TIFFs arrive), carrying the same row-constant
    pattern as :func:`synth_gif_pixel_media` — the decoded mean is
    exactly ``(doc_id % 16) + 120``."""
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_gray,
    )

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (8 * (1 + F.col("doc_id") % 5)).cast("int").alias("w"),
        (16 * (1 + F.col("doc_id") % 6)).cast("int").alias("h"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                mid, w, h = int(mid), int(w), int(h)
                b = mid % 16
                px = bytes(
                    v
                    for y in range(h)
                    for v in [(b + 16 * (y % 16)) % 256] * w
                )
                comp, pred = [
                    (1, 1), (32773, 1), (5, 1), (5, 2), (8, 1), (8, 2),
                ][mid % 6]
                rps = (None, 4, 1)[(mid // 2) % 3]
                payloads.append(
                    build_tiff_gray(
                        w, h, px,
                        compression=comp,
                        byte_order="II" if (mid // 6) % 2 == 0 else "MM",
                        predictor=pred,
                        rows_per_strip=rps,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/tiff",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def tiff_pixel_features(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """REAL TIFF strip decode (rounds 11-12): raw (compression 1),
    PackBits (32773), LZW (5), Deflate (8/32946), JPEG (7, TechNote-2
    JPEGTables honored), and CCITT bilevel fax (2 = T.4 MH-RLE, 4 =
    T.6 G4) strips — with or without the predictor-2 horizontal
    differencing where it applies, single- or multi-strip — inflate
    for real in either byte order (``operators/tiff.py
    decode_tiff_gray``, parser='tiff'); remaining layouts raise and
    strict surfaces it. Non-TIFF payloads take the deterministic
    sha256 fake, or raise under ``strict=True``. Map-side only."""
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        decode_tiff_gray,
        is_tiff,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_tiff(b):
                        parsed = decode_tiff_gray(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    w, h, luma = parsed
                    parser = "tiff"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real TIFF strip decode covers raw/PackBits/"
                            "LZW/Deflate/JPEG 8-bit grayscale and CCITT"
                            " MH/G4 bilevel — exotic layouts (JBIG,"
                            " old-style JPEG) stay the codec boundary"
                        )
                    d = hashlib.sha256(b).digest()
                    w, h = 100 + d[0] * 4, 80 + d[1] * 3
                    luma = float(d[2])
                    parser = "fake"
                rows.append(
                    (int(mid), hashlib.sha256(b).hexdigest(), len(b),
                     int(w), int(h), float(luma), parser)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "width", "height",
                    "mean_luma", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, width int,"
            " height int, mean_luma double, parser string"
        ),
    )


def synth_flac_pcm_media(docs: DataFrame) -> DataFrame:
    """Deterministic FLAC streams with REAL encoded audio frames (round
    11 — ``operators/flac.py encode_flac_pcm``): per doc, a square wave
    at Nyquist (samples alternate ``+k, -k`` with ``k = 100 * (3 +
    doc_id % 13)``; docs with ``doc_id % 11 == 0`` are the constant
    ``+k`` signal instead, exercising the constant subframe), ``n =
    160 * (1 + doc_id % 4)`` frames at 8/16/32 kHz, mono or stereo
    (identical channels — the side channel is constant zero). Stereo
    docs cycle left/right/mid-side decorrelation; ``doc_id % 5 == 0``
    forces verbatim subframes and ``doc_id % 7 == 0`` forces the LPC
    bitstream path, so the driver row walks every subframe type. The
    block size of 192 splits most docs into multiple frames (common
    blocksize code + an uncommon 16/8-bit trailing size). Closed forms
    the oracle states without decoding: rms = k/32768 (every sample has
    magnitude k; k = 100j with j in 3..15 never rounds to a 6-decimal
    tie — j = 64 (mod 128) would be needed), mean = 0 for the square
    wave (exact dyadic cancellation) or k/32768 for the constant docs,
    zero crossings = n-1 or 0, duration exact at the chosen rates."""
    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        encode_flac_pcm,
    )

    base = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (160 * (1 + F.col("doc_id") % 4)).cast("int").alias("n"),
        (100 * (3 + F.col("doc_id") % 13)).cast("int").alias("k"),
        F.when((F.col("doc_id") / 2).cast("long") % 3 == 0, 8000)
        .when((F.col("doc_id") / 2).cast("long") % 3 == 1, 16000)
        .otherwise(32000)
        .cast("int")
        .alias("rate"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, n, k, rate in zip(
                pdf["media_id"], pdf["n"], pdf["k"], pdf["rate"]
            ):
                mid, n, k = int(mid), int(n), int(k)
                sig = np.full(n, k, dtype=np.int64)
                if mid % 11:
                    sig[1::2] = -k
                n_ch = 1 + mid % 2
                x = np.stack([sig] * n_ch, axis=1)
                mode = ["left_side", "right_side", "mid_side"][
                    (mid // 3) % 3
                ] if n_ch == 2 else "auto"
                force = ("verbatim" if mid % 5 == 0
                         else "lpc" if mid % 7 == 0 else None)
                payloads.append(
                    encode_flac_pcm(
                        x,
                        sample_rate=int(rate),
                        block_size=192,
                        stereo_mode=mode,
                        force_subframe=force,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/flac",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


# GSM 6.10 family parameters and their decoded-feature constants
# (round 14). The synth mints ten distinct payloads (f = doc_id % 10);
# each is the REAL 06.10 encode of an integer sawtooth
#   x[k] = (((k*q + 17*f) % 2048) - 1024) * s,
#   n = 320*(1 + f%3), q = 3 + 2*f, s = 4 + 2*(f%4),
# so decode features are per-family constants. The literals below are
# derived from the INDEPENDENT from-scratch C decoder
# (tests/test_codec_crosscheck.py pins them against it, sample-exact
# vs the Python decoder both ways) — the oracle SQL embeds the same
# literals, closing the cross-engine loop without a SQL GSM decoder.
GSM_FAMILY_FEATURES: dict[int, tuple[float, float, int]] = {
    # f: (rms, mean_amplitude, zero_crossings)
    0: (0.084604, -0.060578, 0),
    1: (0.11506, -0.030181, 2),
    2: (0.156093, 0.012776, 8),
    3: (0.186063, -0.016919, 3),
    4: (0.082725, 0.003928, 6),
    5: (0.099134, 0.009564, 12),
    6: (0.128554, 0.013887, 8),
    7: (0.192151, 0.004179, 10),
    8: (0.069994, -0.000437, 17),
    9: (0.102151, -0.007352, 6),
}


def gsm_family_signal(f: int) -> np.ndarray:
    """The family-f test signal (int16 sawtooth) the GSM synth encodes."""
    n = 320 * (1 + f % 3)
    q = 3 + 2 * f
    s = 4 + 2 * (f % 4)
    k = np.arange(n, dtype=np.int64)
    return ((((k * q + 17 * f) % 2048) - 1024) * s).astype(np.int16)


def synth_gsm_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic GSM 6.10 WAV payloads (round 14 —
    ``operators/gsm610.py``): per doc, the REAL full-rate RPE-LTP
    encode of the family sawtooth ``gsm_family_signal(doc_id % 10)``
    wrapped in a RIFF container (format tag 0x31, 65-byte wav49
    blocks, ``fact`` chunk). Only ten distinct payloads exist, so the
    encode is memoized per family; the DECODE side
    (``audio_features``) still runs per payload — that is the codec
    under test. Payload sizes are closed-form: 60 header bytes + 65
    per block, n/320 blocks."""
    base = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").cast("long").alias("media_id"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from routing_algorithm_for_graph_dbs_spark.operators.gsm610 import (
            encode_wav_gsm,
        )

        cache: dict[int, bytes] = {}
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                f = int(mid) % 10
                if f not in cache:
                    cache[f] = encode_wav_gsm(gsm_family_signal(f))
                payloads.append(cache[f])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "audio/x-gsm-wav",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_webp_pixel_media(docs: DataFrame) -> DataFrame:
    """Deterministic lossless WebPs with REAL VP8L pixel payloads
    (round 11 — ``operators/vp8l.py encode_webp_lossless``): per doc, a
    constant gray ``v = (doc_id * 53 + 60) % 216 + 20`` at power-of-two
    dimensions ``w = 2^(3 + doc_id % 3)``, ``h = 2^(4 + doc_id % 2)``
    (exact float mean, same argument as synth_bmp_palette_media), RGB
    on even docs and RGBA on odd (the alpha plane exercises the
    four-plane literal path). The decoded mean luma is the same closed
    form as mm_bmp_palette — one pattern, two containers, two codecs
    cross-checked against each other and the oracle."""
    from routing_algorithm_for_graph_dbs_spark.operators.vp8l import (
        encode_webp_lossless,
    )

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                v = (mid * 53 + 60) % 216 + 20
                w, h = 1 << (3 + mid % 3), 1 << (4 + mid % 2)
                nc = 3 + mid % 2
                img = np.full((h, w, nc), v, dtype=np.uint8)
                if nc == 4:
                    img[..., 3] = 255
                payloads.append(encode_webp_lossless(img))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/webp",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_bmp_palette_media(docs: DataFrame) -> DataFrame:
    """Deterministic palette BMPs with REAL indexed/RLE pixel payloads
    (round 11 widened ``decode_bmp`` beyond 24-bit): per doc, a
    constant-color image whose gray value ``v = (doc_id*37 + 40) % 216
    + 20`` sits at palette slot ``doc_id % 2^bpp`` amid deterministic
    junk entries (so a palette-indexing bug changes the answer), at
    power-of-two dimensions ``w = 2^(3 + doc_id%3)``, ``h = 2^(4 +
    doc_id%2)`` (power-of-two pixel counts keep the numpy mean of
    identical per-pixel lumas EXACT — pairwise summation of equal
    doubles never rounds). bpp cycles 8/4/1 by ``(doc_id//3) % 3``;
    8-bpp even docs use REAL RLE8 runs, 4-bpp odd docs REAL RLE4;
    raw-row docs divisible by 7 arrive in the OS/2 BITMAPCOREHEADER
    container (round 12 — u16 dims, BGR palette triples), same
    decoded pixels through the second header dialect."""
    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                v = (mid * 37 + 40) % 216 + 20
                w, h = 1 << (3 + mid % 3), 1 << (4 + mid % 2)
                bpp = (8, 4, 1)[(mid // 3) % 3]
                npal = 1 << bpp
                slot = mid % npal
                pal = np.array(
                    [[(i * 41 + mid) % 256] * 3 for i in range(npal)],
                    dtype=np.uint8,
                )
                pal[slot] = (v, v, v)
                rle = (bpp == 8 and mid % 2 == 0) or (
                    bpp == 4 and mid % 2 == 1
                )
                if not rle and mid % 7 == 0:
                    # round 12: some raw-row docs arrive in the OS/2
                    # BITMAPCOREHEADER container (u16 dims, BGR palette
                    # TRIPLES) — same pixels, second header dialect
                    payloads.append(
                        encode_bmp_core(
                            np.full((h, w), slot, dtype=np.uint8), pal,
                            bpp=bpp,
                        )
                    )
                else:
                    payloads.append(
                        encode_bmp_indexed(
                            np.full((h, w), slot, dtype=np.uint8), pal,
                            bpp=bpp, rle=rle,
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/bmp",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_tiff_jpeg_media(docs: DataFrame) -> DataFrame:
    """Deterministic JPEG-in-TIFF payloads (round 12 — compression 7
    moved off the boundary: the entropy machinery already lived in
    ``operators/jpeg.py``): per doc, a FLAT gray ``g = 16 + 16 *
    (doc_id % 14)`` image — flat blocks make the lossy roundtrip
    closed-form (DC-only, Annex K luma q0=3 at quality 90; see
    mm_jpeg_roundtrip) — cycling abbreviated-with-JPEGTables vs full
    interchange strips on ``doc_id % 2``, strip layout whole/4-row/
    8-row on ``doc_id // 2``, and byte order on ``doc_id // 6``."""
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_gray,
    )

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (8 + F.col("doc_id") % 9).cast("int").alias("w"),
        (8 + F.col("doc_id") % 7).cast("int").alias("h"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                mid, w, h = int(mid), int(w), int(h)
                g = 16 + 16 * (mid % 14)
                rps = (None, 4, 8)[(mid // 2) % 3]
                payloads.append(
                    build_tiff_gray(
                        w, h, bytes([g]) * (w * h),
                        compression=7,
                        byte_order="II" if (mid // 6) % 2 == 0 else "MM",
                        rows_per_strip=min(rps, h) if rps else None,
                        jpeg_tables=mid % 2 == 1,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/tiff",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_tiff_fax_media(docs: DataFrame) -> DataFrame:
    """Deterministic CCITT bilevel TIFFs (round 12 — T.4 MH-RLE and
    T.6 G4 moved off the boundary): per doc, a stripe raster with
    ``k = 1 + doc_id % 7`` black columns per 8-column period at
    ``w = 8*(2 + doc_id % 5)``, ``h = 4*(1 + doc_id % 6)`` — every
    period complete, so the black fraction is exactly ``k/8`` and the
    decoded MinIsWhite mean luma is the closed form ``255*(8-k)/8``.
    Rows shift by ``doc_id % 3`` columns per row (0 exercises
    V0/pass-heavy coding, 1/2 the VL/VR vertical modes; np.roll keeps
    the per-row count). Compression cycles MH-RLE / G3-with-EOLs / G4
    on ``(doc_id // 3) % 3``, strip layout whole/4-row on
    ``doc_id // 2``, byte order on ``doc_id // 4``."""
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_fax,
    )

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                k = 1 + mid % 7
                w, h = 8 * (2 + mid % 5), 4 * (1 + mid % 6)
                period = np.zeros(8, np.uint8)
                period[:k] = 1
                row = np.tile(period, w // 8)
                shift = mid % 3
                img = np.stack(
                    [np.roll(row, r * shift) for r in range(h)]
                )
                payloads.append(
                    build_tiff_fax(
                        img,
                        compression=(2, 3, 4)[(mid // 3) % 3],
                        byte_order="II" if (mid // 4) % 2 == 0 else "MM",
                        rows_per_strip=(None, 4)[(mid // 2) % 2],
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/tiff",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_bmp_bitfields_media(docs: DataFrame) -> DataFrame:
    """Deterministic masked-mode BMPs with REAL 16/32-bit payloads
    (round 12 — ``decode_bmp`` widened to RGB555/BI_BITFIELDS): per
    doc, a constant-color image minted in MASK DOMAIN, cycling four
    mask layouts by ``doc_id % 4`` —

    0. 16-bit BI_RGB (implicit RGB555, 5-5-5),
    1. 16-bit BI_BITFIELDS RGB565 (5-6-5),
    2. 32-bit BI_BITFIELDS 10-10-10,
    3. 16-bit BI_BITFIELDS with explicit RGB555 masks

    — at power-of-two dimensions ``w = 2^(3 + doc_id%3)``, ``h =
    2^(4 + doc_id%2)`` (exact numpy means, as in
    :func:`synth_bmp_palette_media`). Raw channel values are
    ``qr = doc_id % (top_r+1)``, ``qg = (doc_id*7) % (top_g+1)``,
    ``qb = (doc_id*13) % (top_b+1)`` so each channel exercises its own
    mask width; the decoded 8-bit channels are the closed form
    ``(q*255 + top//2) // top`` the oracle states without decoding."""
    base = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").cast("long").alias("media_id"),
    )

    _LAYOUTS = [
        (16, None, (31, 31, 31)),
        (16, (0xF800, 0x07E0, 0x001F), (31, 63, 31)),
        (32, (0x3FF00000, 0x000FFC00, 0x000003FF), (1023, 1023, 1023)),
        (16, (0x7C00, 0x03E0, 0x001F), (31, 31, 31)),
    ]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                bpp, masks, tops = _LAYOUTS[mid % 4]
                w, h = 1 << (3 + mid % 3), 1 << (4 + mid % 2)
                q = (mid % (tops[0] + 1), (mid * 7) % (tops[1] + 1),
                     (mid * 13) % (tops[2] + 1))
                raw = np.empty((h, w, 3), dtype=np.uint32)
                raw[..., 0], raw[..., 1], raw[..., 2] = q
                payloads.append(encode_bmp_bitfields(raw, bpp=bpp, masks=masks))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/bmp",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def synth_gif_anim_media(docs: DataFrame) -> DataFrame:
    """Deterministic animated GIFs with REAL multi-frame LZW payloads
    (round 11): per doc, a 32x32 canvas and three frames whose
    COMPOSITED means are closed-form —

    - frame 0: the full-canvas row-gray pattern (interlaced on odd
      docs), mean exactly ``b + 120`` with ``b = doc_id % 16``;
    - frame 1: a 16x16 rectangle at (0, 0) of constant ``v1 = 40 +
      doc_id % 180`` — composited mean ``(3*(b+120) + v1) / 4`` (any 16
      consecutive base rows sum to a full gray cycle); disposal is KEEP
      on even docs and RESTORE-TO-BACKGROUND on odd docs;
    - frame 2: a 16x16 rectangle at (16, 16) of constant ``v2 = 30 +
      doc_id % 200``: kept frame-1 gives mean ``(2*(b+120)+v1+v2)/4``;
      disposed frame-1 reverts its quarter to the background gray
      ``bg = doc_id % 256`` first, giving ``(2*(b+120)+bg+v2)/4``.

    All denominators are powers of two and all numerators integers, so
    every mean is an exact double and the oracle states it in closed
    form without running LZW or the compositor. Per-frame delays are
    ``10 * (1 + doc_id % 9)`` cs."""
    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_animation,
    )

    base = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").cast("long").alias("media_id"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                b = mid % 16
                rows = np.array(
                    [(b + 16 * (y % 16)) % 256 for y in range(32)],
                    dtype=np.uint8,
                )
                base_idx = np.repeat(rows[:, None], 32, axis=1)
                v1 = 40 + mid % 180
                v2 = 30 + mid % 200
                disposal1 = 2 if mid % 2 == 1 else 1
                frames = [
                    {
                        "indices": bytes(base_idx.reshape(-1)),
                        "delay_cs": 10 * (1 + mid % 9),
                        "disposal": 1,
                        "interlace": mid % 2 == 1,
                    },
                    {
                        "left": 0, "top": 0, "fw": 16, "fh": 16,
                        "indices": bytes([v1] * 256),
                        "delay_cs": 10 * (1 + mid % 9),
                        "disposal": disposal1,
                    },
                    {
                        "left": 16, "top": 16, "fw": 16, "fh": 16,
                        "indices": bytes([v2] * 256),
                        "delay_cs": 10 * (1 + mid % 9),
                        "disposal": 0,
                    },
                ]
                payloads.append(
                    build_gif_animation(
                        32, 32, frames, gct_bits=8, bg_index=mid % 256
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/gif",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def gif_frame_samples(
    media: DataFrame, strict: bool = False, batch_size: int = 64,
    max_frames: int = None,
) -> DataFrame:
    """REAL animated-GIF frame extraction (round 11): each payload's
    frames are LZW-decoded AND composited per the GIF89a spec
    (disposal methods, transparency, interlace, sub-rectangles —
    ``operators/gif.py decode_gif_frames``), yielding one row per
    frame with the composited canvas's mean luma and the GCE delay —
    the REAL execution half of the frame-sampling story that
    ``frame_sample_plan`` plans metadata-only for other containers.
    Non-GIF payloads take the deterministic sha256 fake (3 frames), or
    raise under ``strict=True``. Map-side; only per-frame scalars leave
    the stage."""
    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        decode_gif_frames,
        is_gif,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                decoded = None
                try:
                    if is_gif(b):
                        decoded = decode_gif_frames(b, max_frames=max_frames)
                except DECODE_ERRORS:
                    if strict:
                        raise
                    decoded = None
                if decoded is not None:
                    frames, delays = decoded
                    for fi, (canvas, delay) in enumerate(
                        zip(frames, delays)
                    ):
                        h, w = canvas.shape[:2]
                        rr, gg, bb = (
                            canvas[..., i].astype(np.float64)
                            for i in range(3)
                        )
                        luma = round(float(
                            (0.299 * rr + 0.587 * gg + 0.114 * bb).mean()
                            / 255.0
                        ), 6)
                        rows.append(
                            (int(mid), fi, int(w), int(h), luma,
                             int(delay), "gif")
                        )
                else:
                    if strict:
                        raise NotImplementedError(
                            "real frame extraction needs a GIF89a stream"
                            " — other video containers need a codec"
                            " library, not in this container"
                        )
                    d = hashlib.sha256(b).digest()
                    for fi in range(3):
                        rows.append(
                            (int(mid), fi, 16 * (1 + d[0] % 40),
                             16 * (1 + d[1] % 30),
                             round(d[2 + fi] / 255.0, 6),
                             10 * d[5], "fake")
                        )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_index", "width", "height",
                         "mean_luma", "delay_ms", "parser"],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, frame_index int, width int, height int,"
            " mean_luma double, delay_ms long, parser string"
        ),
    )


def synth_crossformat_media(docs: DataFrame) -> DataFrame:
    """THREE containers of the IDENTICAL image per doc — palette BMP
    (raw or RLE8), GIF (LZW), and lossless WebP (VP8L) — carrying the
    mm_gif_pixels row-gray pattern through gray-ramp palettes, so all
    three decode to the same (H, W, 3) pixels and the REAL perceptual
    hash must agree across formats (the cross-format dedup story: the
    same crawl image stored under different containers lands in the
    same pHash bucket). Three rows per doc: (media_id, fmt, payload)."""
    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_pixels,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.vp8l import (
        encode_webp_lossless,
    )

    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (8 * (1 + F.col("doc_id") % 5)).cast("int").alias("w"),
        (16 * (1 + F.col("doc_id") % 6)).cast("int").alias("h"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ramp = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        for pdf in batches:
            recs = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                mid, w, h = int(mid), int(w), int(h)
                b = mid % 16
                rows = np.array(
                    [(b + 16 * (y % 16)) % 256 for y in range(h)],
                    dtype=np.uint8,
                )
                idx = np.repeat(rows[:, None], w, axis=1)
                gif = build_gif_pixels(w, h, bytes(idx.reshape(-1)),
                                       gct_bits=8)
                bmp = encode_bmp_indexed(idx, ramp, bpp=8, rle=mid % 2 == 0)
                rgb = ramp[idx]
                webp = encode_webp_lossless(rgb)
                recs += [
                    (mid, "gif", gif, "image/gif"),
                    (mid, "bmp", bmp, "image/bmp"),
                    (mid, "webp", webp, "image/webp"),
                ]
            yield pd.DataFrame(
                recs, columns=["media_id", "fmt", "payload", "mime"]
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build,
        schema="media_id long, fmt string, payload binary, mime string",
    )


def payload_phashes(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """(media_id, phash) over signature-sniffed REAL pixel decode
    (BMP/JPEG/PNG/GIF/lossless-WebP — ``operators/phash.py
    sniff_decode``); undecodable payloads hash to null (dropped by
    filter downstream) or raise under ``strict=True``. The per-payload
    building block ``phash_near_dup_pairs`` pairs on; exposed for
    queries that aggregate hashes directly (cross-format dedup)."""
    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from routing_algorithm_for_graph_dbs_spark.operators.phash import (
            payload_phash,
        )

        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = payload_phash(bytes(payload), strict=strict)
                recs.append((int(mid), h))
            yield pd.DataFrame(recs, columns=["media_id", "phash"])

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        hashes, schema="media_id long, phash long"
    )


def synth_webp_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL WebP containers from the documents table: per
    doc, a lossy, lossless, or extended-animated file (selector
    ``(doc_id // 3) % 3``) at closed-form dimensions, with
    ``2 + doc_id % 6`` animation frames of ``20 + doc_id % 80`` ms each
    on the extended flavor — every size and field closed-form for the
    cross-engine oracle (``operators/webp.py``)."""
    from routing_algorithm_for_graph_dbs_spark.operators.webp import build_webp

    base = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").cast("long").alias("media_id"),
        (16 + F.col("doc_id") % 2000).cast("int").alias("w"),
        (16 + F.col("n_chars") % 1500).cast("int").alias("h"),
        (2 * (10 + F.col("n_chars") % 120)).cast("int").alias("pad"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, w, h, pad in zip(
                pdf["media_id"], pdf["w"], pdf["h"], pdf["pad"]
            ):
                mid = int(mid)
                payloads.append(
                    build_webp(
                        int(w),
                        int(h),
                        flavor=("lossy", "lossless", "extended")[
                            (mid // 3) % 3
                        ],
                        alpha=mid % 2 == 1,
                        n_frames=2 + mid % 6,
                        frame_duration_ms=20 + mid % 80,
                        pixel_pad=int(pad),
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/webp",
                }
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return base.mapInPandas(
        build, schema="media_id long, payload binary, mime string"
    )


def webp_metadata(
    media: DataFrame, strict: bool = False, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched WebP METADATA extraction: payloads that sniff as
    RIFF/WEBP get the REAL chunk walk (``operators/webp.py``,
    parser='webp') — flavor from the VP8/VP8L/VP8X chunk, dimensions
    from the 14-bit frame fields or the 24-bit VP8X canvas, the alpha
    feature bit, ANMF frame count and the exact animation duration
    (entropy-coded pixel regions are hopped by chunk size here;
    LOSSLESS VP8L pixel decode is REAL via operators/vp8l.py since
    round 11 — lossy VP8 stays the boundary). Non-WebP payloads take the
    deterministic sha256 fake, or raise under ``strict=True``.
    Map-side only."""
    from routing_algorithm_for_graph_dbs_spark.operators.webp import (
        is_webp,
        parse_webp_metadata,
    )

    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                parsed = None
                try:
                    if is_webp(b):
                        parsed = parse_webp_metadata(b)
                except (ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    parsed = None
                if parsed is not None:
                    flavor, w, h, alpha, nf, dur, nchunks = parsed
                    parser = "webp"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real WebP metadata needs RIFF/WEBP framing —"
                            " this payload has none (VP8 entropy decode"
                            " itself needs a codec library, not in this"
                            " container)"
                        )
                    d = hashlib.sha256(b).digest()
                    flavor = ("lossy", "lossless", "extended")[d[0] % 3]
                    w, h = 16 + d[1] * 8, 16 + d[2] * 6
                    alpha = d[3] % 2 == 1
                    nf = 1 if flavor != "extended" else 2 + d[4] % 6
                    dur = 0 if flavor != "extended" else nf * (20 + d[5] % 80)
                    nchunks = 1 if flavor != "extended" else 2 + nf
                    parser = "fake"
                rows.append(
                    (
                        int(mid),
                        hashlib.sha256(b).hexdigest(),
                        len(b),
                        flavor,
                        int(w),
                        int(h),
                        int(bool(alpha)),
                        int(nf),
                        int(dur),
                        int(nchunks),
                        parser,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sha256", "n_bytes", "flavor", "width",
                    "height", "has_alpha", "n_frames", "duration_ms",
                    "n_chunks", "parser",
                ],
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, sha256 string, n_bytes long, flavor string,"
            " width int, height int, has_alpha int, n_frames int,"
            " duration_ms long, n_chunks int, parser string"
        ),
    )


def resize_plan(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Image resize *plan*: target dimensions from metadata only, preserving
    aspect ratio — pure column math, payload untouched (the actual pixel
    resample is the stubbed codec boundary). Emits (media_id, target_w,
    target_h, scale)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_dim, F.lit(max_dim) / F.greatest(w, h)
    ).otherwise(F.lit(1.0))
    return (
        media.filter(F.col("kind") == "image")
        .select(
            "media_id",
            F.round(scale, 6).alias("scale"),
            F.greatest((w * scale).cast("int"), F.lit(1)).alias("target_w"),
            F.greatest((h * scale).cast("int"), F.lit(1)).alias("target_h"),
        )
    )


def resize_images(
    media: DataFrame, max_dim: int = 256, strict: bool = False,
    batch_size: int = 64,
) -> DataFrame:
    """REAL pixel resample for decodable payloads — the execution half of
    :func:`resize_plan` (which stays the metadata-only planner).

    Arrow-batched ``mapInPandas``: signature-sniffed decode through the
    repo's real codecs (BMP/baseline JPEG/PNG), deterministic bilinear
    resample preserving aspect ratio (same target-dim formula as
    ``resize_plan``), re-encode as PNG. Non-decodable payloads are
    SKIPPED (emitting them unresized would lie about the column's
    contract) unless ``strict=True``, which raises — the remaining codec
    boundary. Output: (media_id, payload PNG, width, height) at the
    target size. The batch size bounds Arrow memory: decoded pixel
    arrays, not the input payloads, dominate here.
    """
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from routing_algorithm_for_graph_dbs_spark.operators.phash import (
            resize_bilinear,
            sniff_decode,
        )
        from routing_algorithm_for_graph_dbs_spark.operators.png import (
            encode_png,
        )

        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # strict lets codec errors propagate; otherwise a payload
                # that sniffs decodable but fails to decode returns None
                # and is skipped like any other undecodable payload
                px = sniff_decode(bytes(payload), strict=strict)
                if px is None:
                    if strict:
                        raise NotImplementedError(
                            "real resize of undecodable payloads requires"
                            " PIL/libvips — not in this container"
                        )
                    continue
                h, w = px.shape[:2]
                scale = max_dim / max(w, h) if max(w, h) > max_dim else 1.0
                tw = max(int(w * scale), 1)
                th = max(int(h * scale), 1)
                out = np.clip(
                    np.rint(resize_bilinear(px, tw, th)), 0, 255
                ).astype(np.uint8)
                recs.append((int(mid), encode_png(out, "none"), tw, th))
            yield pd.DataFrame(
                recs, columns=["media_id", "payload", "width", "height"]
            )

    # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
    return media.select("media_id", "payload").mapInPandas(
        resize, schema="media_id long, payload binary, width int, height int"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts).

    The timestamp grid is computed JVM-side from metadata only (no payload
    touched); the actual frame extraction is the stubbed decode boundary.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup. Deliberately avoids the payload column so the
    parquet scan prunes it (ReadSchema excludes ``payload``) — at 100 TB
    this is the difference between scanning kilobytes and terabytes."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.duration_ms").alias("avg_duration_ms"),
    )


def phash_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, strict: bool = False
) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over media payloads —
    multimodal dedup's analogue of text SimHash.

    Payloads carrying a real image signature (BMP / baseline JPEG /
    PNG / GIF / WebP — the last two decode for real since round 11) get
    the REAL DCT perceptual hash over decoded pixels
    (``operators/phash.py``: gray -> bilinear 32x32 -> 2-D DCT-II ->
    8x8 low-frequency block thresholded at the non-DC median). Other
    payloads keep the deterministic md5-SimHash-over-text stand-in —
    bit-reproducible by the DuckDB oracle, so that pipeline stays
    value-checked — or, with ``strict=True``, raise at execution (video
    frames and compressed formats remain the codec boundary). The
    pairing is hash-source-agnostic and is the scale component:
    16-bit-chunk pigeonhole blocking (operators.dedup.simhash_near_pairs)
    — candidates meet in an equi-join on (chunk_id, chunk), never
    all-pairs.
    """
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        simhash,
        simhash_near_pairs,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.png import PNG_SIGNATURE

    # column-level signature sniff (binary substring compares): the real
    # branch must see only actually-decodable payloads. "BM" alone is weak
    # magic — require the BMP header's four reserved zero bytes too.
    is_dec = (
        (
            (F.substring("payload", 1, 2) == F.lit(b"BM"))
            & (F.length("payload") >= 54)
            & (F.substring("payload", 7, 4) == F.lit(b"\x00\x00\x00\x00"))
        )
        | (F.substring("payload", 1, 2) == F.lit(b"\xff\xd8"))
        | (F.substring("payload", 1, 8) == F.lit(bytes(PNG_SIGNATURE)))
        | (F.substring("payload", 1, 6) == F.lit(b"GIF87a"))
        | (F.substring("payload", 1, 6) == F.lit(b"GIF89a"))
        | (
            (F.substring("payload", 1, 4) == F.lit(b"RIFF"))
            & (F.substring("payload", 9, 4) == F.lit(b"WEBP"))
        )
    )

    def hash_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from routing_algorithm_for_graph_dbs_spark.operators.phash import (
            payload_phash,
        )

        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # strict propagates codec errors; otherwise a payload that
                # passes the JVM-side signature filter but fails the real
                # decode (progressive JPEG, corrupt PNG, ...) hashes to
                # null and is dropped below — it simply doesn't take part
                # in near-dup pairing rather than crashing the stage
                h = payload_phash(bytes(payload), strict=strict)
                recs.append((int(mid), h))
            yield pd.DataFrame(recs, columns=["media_id", "simhash"])

    real = (
        media.filter(is_dec)
        .select("media_id", "payload")
        # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
        .mapInPandas(hash_real, schema="media_id long, simhash long")
        .filter(F.col("simhash").isNotNull())
    )
    rest = media.filter(~is_dec)
    if strict:

        def refuse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    raise NotImplementedError(
                        "real perceptual hashing of non-image payloads"
                        " requires a video/audio decoder — not in this"
                        " container"
                    )
                yield pd.DataFrame(columns=["media_id", "simhash"])

        # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
        fake = rest.select("media_id", "payload").mapInPandas(
            refuse, schema="media_id long, simhash long"
        )
    else:

        def lenient_text(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            # JVM-side decode(payload, 'UTF-8') ANSI-raises on arbitrary
            # binary (a non-UTF-8 non-image payload would crash the
            # stage); replacement-char decoding is identical for valid
            # UTF-8 (the synthetic tables) and total for everything else
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "text": [
                            bytes(p).decode("utf-8", errors="replace")
                            for p in pdf["payload"]
                        ],
                    }
                )

        # arrow-stage: map-side by design; payloads never shuffle (scan splits scale)
        decoded = rest.select("media_id", "payload").mapInPandas(
            lenient_text, schema="media_id long, text string"
        )
        fake = simhash(
            decoded, text_col="text", key_col="media_id", hash_fn="md5"
        )
    sims = real.unionByName(fake)
    return simhash_near_pairs(sims, key_col="media_id", max_hamming=max_hamming)
