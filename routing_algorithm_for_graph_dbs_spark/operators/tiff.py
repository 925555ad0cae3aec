"""REAL TIFF metadata parser (pure struct) — no codec lib.

TIFF carries scans, geospatial rasters, and camera originals through
crawls and data lakes; the fields a pipeline filters on — dimensions,
bit depth, compression scheme, photometric interpretation, page count —
live entirely in the Image File Directory structure of the public
TIFF 6.0 specification (Adobe 1992): an 8-byte header (``II``/``MM``
byte-order mark, the magic 42, offset of the first IFD), then a chain
of IFDs — each a u16 entry count, that many 12-byte entries
(u16 tag, u16 type, u32 count, 4-byte value-or-offset, the value
LEFT-JUSTIFIED in its field when it fits), and a u32 next-IFD offset
(0 terminates). Strip/tile PIXEL data is referenced by offset and
never touched: raster decode (PackBits/LZW/JPEG-in-TIFF) stays the
honest boundary (parse-not-decode split per ``operators/mp3.py``;
reference boundary analog main.py:1 — the reference delegates media
handling entirely).

``parse_tiff_metadata`` honors BOTH byte orders, walks the whole IFD
chain (counting pages), reads the classification tags from the FIRST
IFD, and raises loudly on truncation, a bad magic, an entry count of
zero, or a cyclic chain. ``build_tiff`` mints conformant single- or
multi-IFD files with closed-form sizes for golden tests and
cross-engine oracles.

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct

_WIDTH = 256
_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279

_SHORT = 3
_LONG = 4

# a real file has a handful of IFDs; 4096 only trips on a corrupt or
# adversarial chain that is not already cyclic
_MAX_IFDS = 4096


def is_tiff(payload: bytes) -> bool:
    """Cheap sniff: ``II*\\0`` (little-endian) or ``MM\\0*`` (big)."""
    return len(payload) >= 4 and payload[:4] in (b"II*\x00", b"MM\x00*")


def _entry_value(payload: bytes, fmt: str, pos: int):
    """One inline SHORT/LONG entry value. TIFF left-justifies a value
    that fits in the 4-byte field, so a SHORT sits in the FIRST two
    bytes under either byte order."""
    _tag, etype, count = struct.unpack_from(fmt + "HHI", payload, pos)
    if count != 1 or etype not in (_SHORT, _LONG):
        return None  # offset-valued or multi-count: not a field we read
    if etype == _SHORT:
        return struct.unpack_from(fmt + "H", payload, pos + 8)[0]
    return struct.unpack_from(fmt + "I", payload, pos + 8)[0]


def parse_tiff_metadata(payload: bytes):
    """Parse ``(byte_order, width, height, bits_per_sample, compression,
    photometric, samples_per_pixel, n_ifds)`` from the IFD chain.

    Classification fields come from the FIRST IFD (the primary image;
    later IFDs are pages/thumbnails); ``n_ifds`` counts the whole chain.
    Missing optional tags fall back to the spec defaults
    (bits_per_sample 1, compression 1 = none, samples_per_pixel 1);
    a missing width/length raises — a baseline TIFF without them is
    corrupt."""
    if not is_tiff(payload):
        raise ValueError("not a TIFF (bad byte-order mark / magic 42)")
    fmt = "<" if payload[:2] == b"II" else ">"
    byte_order = payload[:2].decode("ascii")
    (next_ifd,) = struct.unpack_from(fmt + "I", payload, 4)
    if next_ifd == 0:
        raise ValueError("TIFF has no IFD")
    width = height = None
    bits = compression = photometric = spp = None
    n_ifds = 0
    seen = set()
    while next_ifd:
        if next_ifd in seen:
            raise ValueError("cyclic TIFF IFD chain")
        seen.add(next_ifd)
        if len(seen) > _MAX_IFDS:
            raise ValueError("TIFF IFD chain too long")
        if next_ifd + 2 > len(payload):
            raise ValueError("TIFF IFD offset runs past payload")
        (n_entries,) = struct.unpack_from(fmt + "H", payload, next_ifd)
        if n_entries == 0:
            raise ValueError("TIFF IFD with zero entries")
        end = next_ifd + 2 + 12 * n_entries
        if end + 4 > len(payload):
            raise ValueError("TIFF IFD entries run past payload")
        if n_ifds == 0:
            for i in range(n_entries):
                pos = next_ifd + 2 + 12 * i
                (tag,) = struct.unpack_from(fmt + "H", payload, pos)
                if tag == _WIDTH:
                    width = _entry_value(payload, fmt, pos)
                elif tag == _LENGTH:
                    height = _entry_value(payload, fmt, pos)
                elif tag == _BITS_PER_SAMPLE:
                    bits = _entry_value(payload, fmt, pos)
                elif tag == _COMPRESSION:
                    compression = _entry_value(payload, fmt, pos)
                elif tag == _PHOTOMETRIC:
                    photometric = _entry_value(payload, fmt, pos)
                elif tag == _SAMPLES_PER_PIXEL:
                    spp = _entry_value(payload, fmt, pos)
        n_ifds += 1
        (next_ifd,) = struct.unpack_from(fmt + "I", payload, end)
    if width is None or height is None:
        raise ValueError("TIFF first IFD lacks ImageWidth/ImageLength")
    return (
        byte_order,
        width,
        height,
        1 if bits is None else bits,  # spec default: bilevel
        1 if compression is None else compression,  # spec default: none
        0 if photometric is None else photometric,
        1 if spp is None else spp,
        n_ifds,
    )


# ---------------------------------------------------------------------------
# REAL strip decode (round 11): TIFF's baseline grayscale payloads are
# either UNCOMPRESSED samples (compression 1) or PackBits RLE
# (compression 32773, spec §9) — both pure byte transforms, no codec
# library, so neither belongs on the declared decode boundary. LZW/JPEG-
# in-TIFF strips stay there.
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF PackBits (spec §9): control byte n in 0..127 copies n+1
    literals; n in 129..255 repeats the next byte 257-n times; 128 is a
    no-op. Raises on truncation or output-size mismatch."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            if pos + n + 1 > len(data):
                raise ValueError("PackBits literal run truncated")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("PackBits repeat run truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"PackBits decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Real PackBits encoder (runs >= 3 become repeat packets) — the
    golden twin for :func:`packbits_decode`."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and data[j] == data[i] and j - i < 128:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal stretch: until a >=3 run starts, max 128
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + data[i:k]
        i = k
    return bytes(out)


def build_tiff_gray(
    width: int,
    height: int,
    pixels: bytes,
    compression: int = 1,
    byte_order: str = "II",
) -> bytes:
    """Mint a single-IFD 8-bit grayscale TIFF whose strip holds the REAL
    encoding of ``pixels`` (row-major, len == width*height): raw samples
    (compression 1) or PackBits (32773). PackBits packs EACH ROW
    SEPARATELY per the TIFF6 spec section 9 rule "never cross row
    boundaries when packing" (the round-11 libtiff cross-check caught a
    whole-strip packing here: libtiff restarts its scanline decoder at
    every row, so a literal run spanning rows shifted every subsequent
    row by a byte). The decode twin is :func:`decode_tiff_gray` — the
    concatenated per-row streams decode identically as one stream."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height samples")
    if compression == 1:
        strip = pixels
    elif compression == 32773:
        strip = b"".join(
            packbits_encode(pixels[r * width:(r + 1) * width])
            for r in range(height)
        )
    else:
        raise ValueError("build_tiff_gray supports compression 1 and 32773")
    if len(strip) % 2:
        strip += b"\x00"  # keep the IFD word-aligned (decoders use counts)
    fmt = "<" if byte_order == "II" else ">"
    out = bytearray()
    out += byte_order.encode("ascii")
    out += struct.pack(fmt + "H", 42)
    out += struct.pack(fmt + "I", 8 + len(strip))

    def entry(tag: int, etype: int, value: int) -> bytes:
        e = struct.pack(fmt + "HHI", tag, etype, 1)
        if etype == _SHORT:
            return e + struct.pack(fmt + "H", value) + b"\x00\x00"
        return e + struct.pack(fmt + "I", value)

    out += strip
    out += struct.pack(fmt + "H", _N_ENTRIES)
    out += entry(_WIDTH, _LONG, width)
    out += entry(_LENGTH, _LONG, height)
    out += entry(_BITS_PER_SAMPLE, _SHORT, 8)
    out += entry(_COMPRESSION, _SHORT, compression)
    out += entry(_PHOTOMETRIC, _SHORT, 1)  # BlackIsZero
    out += entry(_STRIP_OFFSETS, _LONG, 8)
    out += entry(_SAMPLES_PER_PIXEL, _SHORT, 1)
    out += entry(_ROWS_PER_STRIP, _LONG, height)
    out += entry(_STRIP_BYTE_COUNTS, _LONG, len(strip))
    out += struct.pack(fmt + "I", 0)
    return bytes(out)


def decode_tiff_gray(payload: bytes):
    """REAL pixel decode of the first IFD's grayscale strips: dereference
    StripOffsets/StripByteCounts, inflate raw or PackBits strips, and
    return ``(width, height, mean_luma)`` — the exact float mean of the
    8-bit samples. Raises on unsupported layouts (bits != 8, samples !=
    1, LZW/JPEG strips — the remaining boundary) and on any structural
    error."""
    if not is_tiff(payload):
        raise ValueError("not a TIFF (bad byte-order mark / magic 42)")
    fmt = "<" if payload[:2] == b"II" else ">"
    (ifd_at,) = struct.unpack_from(fmt + "I", payload, 4)
    if ifd_at == 0:
        raise ValueError("TIFF has no IFD")
    if ifd_at + 2 > len(payload):
        raise ValueError("TIFF IFD offset runs past payload")
    (n_entries,) = struct.unpack_from(fmt + "H", payload, ifd_at)
    fields: dict[int, tuple[int, int, int]] = {}
    for i in range(n_entries):
        pos = ifd_at + 2 + 12 * i
        if pos + 12 > len(payload):
            raise ValueError("TIFF IFD entries run past payload")
        tag, etype, count = struct.unpack_from(fmt + "HHI", payload, pos)
        fields[tag] = (etype, count, pos + 8)

    def val(tag: int, default: int | None = None) -> int:
        if tag not in fields:
            if default is None:
                raise ValueError(f"TIFF lacks required tag {tag}")
            return default
        etype, count, at = fields[tag]
        if count != 1 or etype not in (_SHORT, _LONG):
            raise ValueError(
                f"TIFF tag {tag}: multi-count/offset values not supported"
            )
        f = "H" if etype == _SHORT else "I"
        return struct.unpack_from(fmt + f, payload, at)[0]

    width, height = val(_WIDTH), val(_LENGTH)
    if val(_BITS_PER_SAMPLE, 1) != 8 or val(_SAMPLES_PER_PIXEL, 1) != 1:
        raise ValueError("decode_tiff_gray handles 8-bit single-sample only")
    comp = val(_COMPRESSION, 1)
    if comp not in (1, 32773):
        raise ValueError(
            f"TIFF compression {comp} needs a codec — the decode boundary"
        )
    off, cnt = val(_STRIP_OFFSETS), val(_STRIP_BYTE_COUNTS)
    if off + cnt > len(payload):
        raise ValueError("TIFF strip runs past payload")
    strip = payload[off : off + cnt]
    n_px = width * height
    px = strip[:n_px] if comp == 1 else packbits_decode(strip, n_px)
    if len(px) < n_px:
        raise ValueError("TIFF strip shorter than width*height")
    return (width, height, sum(px[:n_px]) / n_px)


_N_ENTRIES = 9
_IFD_BYTES = 2 + 12 * _N_ENTRIES + 4  # 114


def build_tiff(
    width: int,
    height: int,
    bits_per_sample: int = 8,
    compression: int = 1,
    photometric: int = 1,
    n_ifds: int = 1,
    strip_pad: int = 64,
    byte_order: str = "II",
) -> bytes:
    """Mint a conformant TIFF with a CLOSED-FORM layout:
    ``8 + n_ifds * (strip_pad + 114)`` bytes.

    Each IFD carries the same 9 entries (width, length, bits/sample,
    compression, photometric, strip offset, samples/pixel, rows/strip,
    strip byte count) and points at its own ``strip_pad``-byte strip of
    deterministic filler laid down immediately before it — spec-shaped
    but deliberately not a valid raster, pinning the parser to the
    never-dereference-strip-data contract. Both byte orders supported;
    values that fit 4 bytes are left-justified per the spec."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if strip_pad % 2:
        raise ValueError("strip_pad must be even (IFD offsets are word-aligned)")
    fmt = "<" if byte_order == "II" else ">"
    out = bytearray()
    out += byte_order.encode("ascii")
    out += struct.pack(fmt + "H", 42)
    out += struct.pack(fmt + "I", 8 + strip_pad)  # first IFD after strip 0

    def entry(tag: int, etype: int, value: int) -> bytes:
        e = struct.pack(fmt + "HHI", tag, etype, 1)
        if etype == _SHORT:
            return e + struct.pack(fmt + "H", value) + b"\x00\x00"
        return e + struct.pack(fmt + "I", value)

    for i in range(n_ifds):
        strip_at = 8 + i * (strip_pad + _IFD_BYTES)
        out += bytes((strip_at + j) % 256 for j in range(strip_pad))
        out += struct.pack(fmt + "H", _N_ENTRIES)
        out += entry(_WIDTH, _LONG, width)
        out += entry(_LENGTH, _LONG, height)
        out += entry(_BITS_PER_SAMPLE, _SHORT, bits_per_sample)
        out += entry(_COMPRESSION, _SHORT, compression)
        out += entry(_PHOTOMETRIC, _SHORT, photometric)
        out += entry(_STRIP_OFFSETS, _LONG, strip_at)
        out += entry(_SAMPLES_PER_PIXEL, _SHORT, 1)
        out += entry(_ROWS_PER_STRIP, _LONG, height)
        out += entry(_STRIP_BYTE_COUNTS, _LONG, strip_pad)
        next_at = 8 + (i + 1) * (strip_pad + _IFD_BYTES) + strip_pad
        out += struct.pack(fmt + "I", 0 if i == n_ifds - 1 else next_at)
    return bytes(out)
