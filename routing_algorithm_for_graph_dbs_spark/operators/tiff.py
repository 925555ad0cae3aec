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
(0 terminates). The metadata walk never dereferences strip data;
REAL raster decode lives below it for raw, PackBits (§9), LZW (§13,
incl. predictor 2), Deflate, JPEG (TechNote-2 JPEGTables), and CCITT
fax (T.4 MH/G3 + T.6 G4 via ``operators/fax.py``) strips — only
exotic codecs (JBIG, old-style JPEG) remain the declared boundary
(reference boundary analog main.py:1 — the reference delegates media
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
# REAL strip decode (rounds 11-12): TIFF's common payloads are
# UNCOMPRESSED samples (compression 1), PackBits RLE (32773, spec §9),
# LZW (5, spec §13), Deflate (8 / legacy 32946, zlib streams per the
# Adobe technotes), new-style JPEG (7, via operators/jpeg.py incl. the
# round-12 arithmetic decoder), and CCITT bilevel fax (2/3/4, via
# operators/fax.py) — none belongs on the declared decode boundary.
# Exotic codecs (JBIG, old-style JPEG 6) stay there.
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


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """Decode a TIFF §13 LZW strip to exactly ``expected`` bytes.

    TIFF's LZW differs from GIF's (``operators/gif.py lzw_decode``) in
    three pinned-down ways: codes are packed MSB-FIRST; the alphabet is
    fixed at 8 bits (Clear 256, EOI 257, first dynamic code 258); and
    the "early change" — the code width widens one code EARLIER, when
    the table reaches ``2^width - 1`` entries rather than ``2^width``.
    Both rules were derived empirically against libtiff-minted streams
    (widen-at-``2^w`` mis-decodes at code 513; see
    tests/test_codec_crosscheck.py) and cross-checked bidirectionally.
    Raises on truncation, a code beyond the table, or a stream that
    ends before ``expected`` bytes arrive."""
    clear, end = 256, 257
    out = bytearray()
    bitpos = 0
    width = 9
    nbits_total = len(data) * 8

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh_table()
    prev: bytes | None = None
    while len(out) < expected:
        if bitpos + width > nbits_total:
            raise ValueError(
                f"TIFF LZW stream truncated at {len(out)}/{expected} bytes"
            )
        v = 0
        need = width
        byte, bit = bitpos >> 3, bitpos & 7
        while need:
            take = min(8 - bit, need)
            v = (v << take) | ((data[byte] >> (8 - bit - take)) & ((1 << take) - 1))
            need -= take
            bit += take
            if bit == 8:
                bit = 0
                byte += 1
        bitpos += width
        if v == end:
            break
        if v == clear:
            table = fresh_table()
            width = 9
            prev = None
            continue
        if v < len(table) and v not in (clear, end):
            entry = table[v]
        elif v == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"TIFF LZW code {v} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        # EARLY change: widen when the table holds 2^width - 1 entries
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError(
            f"TIFF LZW stream ended at {len(out)}/{expected} bytes"
        )
    return bytes(out[:expected])


def tiff_lzw_encode(data: bytes) -> bytes:
    """Real (greedy longest-match) TIFF §13 LZW encoder — the golden
    twin for :func:`tiff_lzw_decode`. MSB-first packing; leads with
    Clear; widens when ``next_code`` reaches ``2^width`` (one code
    ahead of the decoder's lagged table, same early-change convention);
    emits Clear at 4094 like libtiff, whose scanline reader verifies
    this encoder bit-for-bit in the crosscheck suite."""
    clear, end = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(clear)
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # libtiff's reset point (CODE_MAX-1)
            emit(clear)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def horizontal_diff(pixels: bytes, width: int) -> bytes:
    """TIFF predictor 2 (tag 317, spec §14): per-row horizontal
    differencing mod 256, applied BEFORE LZW on the encode side. Resets
    at every row boundary like libtiff's scanline codec."""
    out = bytearray()
    for r in range(0, len(pixels), width):
        row = pixels[r : r + width]
        out.append(row[0])
        out += bytes((row[i] - row[i - 1]) & 0xFF for i in range(1, len(row)))
    return bytes(out)


def horizontal_undiff(pixels: bytes, width: int) -> bytes:
    """Inverse of :func:`horizontal_diff`: per-row prefix sum mod 256."""
    out = bytearray()
    for r in range(0, len(pixels), width):
        row = pixels[r : r + width]
        acc = 0
        for v in row:
            acc = (acc + v) & 0xFF
            out.append(acc)
    return bytes(out)


_PREDICTOR = 317
_T4_OPTIONS = 292
_JPEG_TABLES = 346 + 1  # tag 347, TIFF TechNote 2
_UNDEFINED = 7


def split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG interchange stream into the (JPEGTables tag
    payload, abbreviated strip stream) pair of TIFF TechNote 2: DQT and
    DHT segments move to a tables stream (SOI + tables + EOI); the
    strip keeps SOI, the frame/scan segments, the entropy data, and
    EOI. The inverse is :func:`join_jpeg_tables`."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    tables = bytearray(b"\xff\xd8")
    strip = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG segment marker")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows to EOI
            strip += stream[pos:]
            tables += b"\xff\xd9"
            return bytes(tables), bytes(strip)
        (seglen,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            strip += seg
        pos += 2 + seglen
    raise ValueError("JPEG stream ended before SOS")


def join_jpeg_tables(tables: bytes, strip: bytes) -> bytes:
    """Rebuild a full interchange stream from a JPEGTables tag payload
    and an abbreviated strip (both SOI...EOI per TechNote 2)."""
    if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
        raise ValueError("JPEGTables payload is not SOI...EOI framed")
    if strip[:2] != b"\xff\xd8":
        raise ValueError("JPEG strip missing SOI")
    return tables[:-2] + strip[2:]


def build_tiff_gray(
    width: int,
    height: int,
    pixels: bytes,
    compression: int = 1,
    byte_order: str = "II",
    predictor: int = 1,
    rows_per_strip: int | None = None,
    jpeg_quality: int = 90,
    jpeg_tables: bool = False,
) -> bytes:
    """Mint a single-IFD 8-bit grayscale TIFF whose strips hold the
    REAL encoding of ``pixels`` (row-major, len == width*height): raw
    samples (compression 1), PackBits (32773), LZW (5), Deflate (8) —
    the latter two optionally with the horizontal-differencing
    predictor 2 — or new-style JPEG (7, real baseline streams from
    ``operators/jpeg.py``, optionally abbreviated with the shared
    tables in a JPEGTables tag per TIFF TechNote 2). PackBits packs
    EACH ROW SEPARATELY per the TIFF6 spec section 9 rule "never cross
    row boundaries when packing" (the round-11 libtiff cross-check
    caught a whole-strip packing here: libtiff restarts its scanline
    decoder at every row, so a literal run spanning rows shifted every
    subsequent row by a byte); LZW and Deflate compress each strip as
    ONE stream restarting per strip, with the predictor still
    differencing per row. ``rows_per_strip`` defaults to one strip for
    the whole image; smaller values mint the multi-strip layout real
    scanned TIFFs use (offset/count LONG arrays stored out-of-line
    before the IFD). The decode twin is :func:`decode_tiff_gray`."""
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height samples")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if predictor == 2 and compression not in (5, 8):
        raise ValueError("predictor 2 is only minted with LZW/Deflate strips")
    rps = height if rows_per_strip is None else rows_per_strip
    if not 1 <= rps <= height:
        raise ValueError("rows_per_strip out of range")
    strips: list[bytes] = []
    tables_payload: bytes | None = None
    for top in range(0, height, rps):
        rows = pixels[top * width:(top + rps) * width]
        if compression == 1:
            strip = rows
        elif compression == 32773:
            strip = b"".join(
                packbits_encode(rows[r * width:(r + 1) * width])
                for r in range(len(rows) // width)
            )
        elif compression in (5, 8):
            plane = horizontal_diff(rows, width) if predictor == 2 else rows
            strip = (tiff_lzw_encode(plane) if compression == 5
                     else zlib.compress(plane))
        elif compression == 7:
            import numpy as _np

            from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
                encode_jpeg_gray,
            )

            arr = _np.frombuffer(rows, dtype=_np.uint8).reshape(-1, width)
            strip = encode_jpeg_gray(arr, quality=jpeg_quality)
            if jpeg_tables:
                tables, strip = split_jpeg_tables(strip)
                # every strip is decoded with the shared JPEGTables tag,
                # so per-strip tables must be identical (they depend only
                # on quality today — assert so a future divergence fails
                # loudly instead of silently corrupting, ADVICE r12)
                if tables_payload is not None and tables != tables_payload:
                    raise AssertionError(
                        "per-strip JPEG tables diverged; JPEGTables "
                        "container requires identical DQT/DHT per strip"
                    )
                tables_payload = tables
        else:
            raise ValueError(
                "build_tiff_gray supports compression 1, 5, 7, 8, 32773"
            )
        strips.append(strip)
    fmt = "<" if byte_order == "II" else ">"
    out = bytearray()
    out += byte_order.encode("ascii")
    out += struct.pack(fmt + "H", 42)
    out += struct.pack(fmt + "I", 0)  # first-IFD offset patched below
    offsets: list[int] = []
    counts: list[int] = []
    for strip in strips:
        offsets.append(len(out))
        counts.append(len(strip))
        out += strip
        if len(out) % 2:
            out += b"\x00"  # keep everything word-aligned
    n = len(strips)
    if n == 1:
        off_val, cnt_val = offsets[0], counts[0]
    else:
        off_val = len(out)
        out += struct.pack(fmt + f"{n}I", *offsets)
        cnt_val = len(out)
        out += struct.pack(fmt + f"{n}I", *counts)
    tables_at = None
    if tables_payload is not None:
        tables_at = len(out)
        out += tables_payload
        if len(out) % 2:
            out += b"\x00"

    def entry(tag: int, etype: int, value: int, count: int = 1) -> bytes:
        e = struct.pack(fmt + "HHI", tag, etype, count)
        if etype == _SHORT:
            return e + struct.pack(fmt + "H", value) + b"\x00\x00"
        return e + struct.pack(fmt + "I", value)

    struct.pack_into(fmt + "I", out, 4, len(out))  # IFD starts here
    n_entries = _N_ENTRIES + (predictor == 2) + (tables_at is not None)
    out += struct.pack(fmt + "H", n_entries)
    out += entry(_WIDTH, _LONG, width)
    out += entry(_LENGTH, _LONG, height)
    out += entry(_BITS_PER_SAMPLE, _SHORT, 8)
    out += entry(_COMPRESSION, _SHORT, compression)
    out += entry(_PHOTOMETRIC, _SHORT, 1)  # BlackIsZero
    out += entry(_STRIP_OFFSETS, _LONG, off_val, n)
    out += entry(_SAMPLES_PER_PIXEL, _SHORT, 1)
    out += entry(_ROWS_PER_STRIP, _LONG, rps)
    out += entry(_STRIP_BYTE_COUNTS, _LONG, cnt_val, n)
    if predictor == 2:
        out += entry(_PREDICTOR, _SHORT, 2)  # ascending tag order: 317
    if tables_at is not None:
        out += entry(_JPEG_TABLES, _UNDEFINED, tables_at,
                     len(tables_payload))  # ...then 347
    out += struct.pack(fmt + "I", 0)
    return bytes(out)


def decode_tiff_gray(payload: bytes):
    """REAL pixel decode of the first IFD's grayscale strips: dereference
    StripOffsets/StripByteCounts (inline scalars or out-of-line
    SHORT/LONG arrays — the multi-strip layout real scanned TIFFs
    use), inflate raw, PackBits, LZW, or Deflate strips (honoring the
    horizontal-differencing predictor, which resets per row; LZW and
    Deflate streams restart per strip), and return ``(width, height,
    mean_luma)`` — the exact float mean of the 8-bit samples. Raises
    on unsupported layouts (bits != 8, samples != 1, JPEG strips — the
    remaining entropy-coded boundary) and on any structural error."""
    import zlib

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
                f"TIFF tag {tag}: expected a single SHORT/LONG value"
            )
        f = "H" if etype == _SHORT else "I"
        return struct.unpack_from(fmt + f, payload, at)[0]

    def vals(tag: int) -> list[int]:
        """SHORT/LONG value list: inline when it fits the 4-byte field,
        dereferenced otherwise (TIFF6 value/offset rule)."""
        if tag not in fields:
            raise ValueError(f"TIFF lacks required tag {tag}")
        etype, count, at = fields[tag]
        if etype not in (_SHORT, _LONG):
            raise ValueError(f"TIFF tag {tag}: expected SHORT/LONG values")
        f = "H" if etype == _SHORT else "I"
        size = 2 if etype == _SHORT else 4
        if count * size > 4:
            (at,) = struct.unpack_from(fmt + "I", payload, at)
        if at + count * size > len(payload):
            raise ValueError(f"TIFF tag {tag} value array runs past payload")
        return list(struct.unpack_from(fmt + f"{count}{f}", payload, at))

    def raw(tag: int) -> bytes:
        """Byte payload of an UNDEFINED/BYTE tag (inline or offset)."""
        etype, count, at = fields[tag]
        if etype not in (_UNDEFINED, 1):
            raise ValueError(f"TIFF tag {tag}: expected BYTE/UNDEFINED data")
        if count > 4:
            (at,) = struct.unpack_from(fmt + "I", payload, at)
        if at + count > len(payload):
            raise ValueError(f"TIFF tag {tag} data runs past payload")
        return payload[at : at + count]

    width, height = val(_WIDTH), val(_LENGTH)
    if width < 1 or height < 1:
        raise ValueError(f"bad TIFF dimensions {width}x{height}")
    bits_ps = val(_BITS_PER_SAMPLE, 1)
    comp = val(_COMPRESSION, 1)
    if bits_ps == 1 and val(_SAMPLES_PER_PIXEL, 1) == 1 and comp in (2, 3, 4):
        # round 12: CCITT bilevel fax — T.4 MH-RLE (2) / G3 with EOLs
        # incl. the 2D T4Options variant (3) / T.6 G4 (4) — decodes
        # for real (operators/fax.py; tables derived from libtiff
        # streams, crosschecked bidirectionally)
        from routing_algorithm_for_graph_dbs_spark.operators.fax import (
            decode_g3,
            decode_g4,
            decode_mh,
        )

        if width * height > 100_000_000:
            # a crafted IFD claiming a gigapixel bilevel page must not
            # balloon a worker (legit scans top out around A0@600dpi)
            raise ValueError(
                f"bilevel raster {width}x{height} exceeds the 100MP cap"
            )
        t4_opts = val(_T4_OPTIONS, 0)  # T4Options (default 0 = 1D)
        photometric = val(_PHOTOMETRIC, 0)
        offs, cnts = vals(_STRIP_OFFSETS), vals(_STRIP_BYTE_COUNTS)
        if len(offs) != len(cnts):
            raise ValueError(
                "TIFF StripOffsets/StripByteCounts length mismatch"
            )
        rps = val(_ROWS_PER_STRIP, height)
        if rps < 1 or (height + rps - 1) // rps != len(offs):
            raise ValueError(
                f"TIFF strip count {len(offs)} does not cover {height}"
                f" rows at {rps} rows/strip"
            )
        black = 0
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            if off + cnt > len(payload):
                raise ValueError("TIFF strip runs past payload")
            n_rows = min(rps, height - i * rps)
            strip_b = payload[off : off + cnt]
            if comp == 2:
                img = decode_mh(strip_b, width, n_rows)
            elif comp == 3:
                img = decode_g3(strip_b, width, n_rows,
                                two_d=bool(t4_opts & 1))
            else:
                img = decode_g4(strip_b, width, n_rows)
            black += int(img.sum())
        n_px = width * height
        # photometric 0 (MinIsWhite, the fax default): bit 1 = black;
        # photometric 1 flips the sense
        lit = (n_px - black) if photometric == 0 else black
        return (width, height, 255.0 * lit / n_px)
    if bits_ps != 8 or val(_SAMPLES_PER_PIXEL, 1) != 1:
        raise ValueError(
            "decode_tiff_gray handles 8-bit grayscale and 1-bit fax only"
        )
    if comp not in (1, 5, 7, 8, 32773, 32946):
        raise ValueError(
            f"TIFF compression {comp} needs a codec — the decode boundary"
        )
    predictor = val(_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} not supported")
    if predictor == 2 and comp not in (5, 8, 32946):
        raise ValueError("TIFF predictor 2 outside an LZW/Deflate strip")
    jpeg_tables = raw(_JPEG_TABLES) if _JPEG_TABLES in fields else None
    if jpeg_tables is not None and comp != 7:
        raise ValueError("TIFF JPEGTables outside a JPEG strip")
    offs, cnts = vals(_STRIP_OFFSETS), vals(_STRIP_BYTE_COUNTS)
    if len(offs) != len(cnts):
        raise ValueError("TIFF StripOffsets/StripByteCounts length mismatch")
    rps = val(_ROWS_PER_STRIP, height)
    if rps < 1 or (height + rps - 1) // rps != len(offs):
        raise ValueError(
            f"TIFF strip count {len(offs)} does not cover {height} rows"
            f" at {rps} rows/strip"
        )
    out = bytearray()
    for i, (off, cnt) in enumerate(zip(offs, cnts)):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip runs past payload")
        strip = payload[off : off + cnt]
        n_rows = min(rps, height - i * rps)
        n_strip_px = n_rows * width
        if comp == 1:
            px = strip[:n_strip_px]
        elif comp == 5:
            px = tiff_lzw_decode(strip, n_strip_px)
        elif comp == 7:
            from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
                decode_jpeg_luma,
            )

            stream = (join_jpeg_tables(jpeg_tables, strip)
                      if jpeg_tables is not None else strip)
            plane = decode_jpeg_luma(stream)
            if plane.shape != (n_rows, width):
                raise ValueError(
                    f"TIFF JPEG strip decodes to {plane.shape}, expected"
                    f" {(n_rows, width)}"
                )
            px = plane.tobytes()
        elif comp in (8, 32946):
            try:
                # bounded inflate: a crafted strip claiming a huge
                # output must not balloon worker memory past the
                # declared raster size (+1 byte to detect overrun)
                dec = zlib.decompressobj()
                px = dec.decompress(strip, n_strip_px + 1)
            except zlib.error as exc:
                raise ValueError(f"TIFF Deflate strip: {exc}") from exc
            if len(px) != n_strip_px or not dec.eof:
                raise ValueError(
                    f"TIFF Deflate strip inflated to {len(px)}+ bytes,"
                    f" expected exactly {n_strip_px}"
                )
        else:
            px = packbits_decode(strip, n_strip_px)
        if len(px) < n_strip_px:
            raise ValueError("TIFF strip shorter than its row span")
        if predictor == 2:
            px = horizontal_undiff(px[:n_strip_px], width)
        out += px[:n_strip_px]
    n_px = width * height
    if len(out) < n_px:
        raise ValueError("TIFF strips shorter than width*height")
    return (width, height, sum(out[:n_px]) / n_px)


def build_tiff_fax(
    img,
    compression: int = 4,
    byte_order: str = "II",
    rows_per_strip: int | None = None,
) -> bytes:
    """Mint a single-IFD 1-bit bilevel TIFF whose strips hold the REAL
    CCITT encoding of ``img`` ((H, W) of 0=white / 1=black): T.4 MH-RLE
    (compression 2), G3 1D with per-row EOLs (compression 3), or T.6
    G4 (compression 4), photometric MinIsWhite (the fax default). Strips restart the coder (G4's reference line
    resets to all-white per strip). The decode twin is the fax path of
    :func:`decode_tiff_gray`."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.fax import (
        encode_g3,
        encode_g4,
        encode_mh,
    )

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 2 or arr.size == 0:
        raise ValueError("expected a nonempty (H, W) bilevel array")
    if int(arr.max(initial=0)) > 1:
        raise ValueError("bilevel pixels must be 0 or 1")
    if compression not in (2, 3, 4):
        raise ValueError("build_tiff_fax supports compression 2, 3, 4")
    height, width = arr.shape
    rps = height if rows_per_strip is None else rows_per_strip
    if not 1 <= rps <= height:
        raise ValueError("rows_per_strip out of range")
    enc = {2: encode_mh, 3: encode_g3, 4: encode_g4}[compression]
    strips = [enc(arr[top:top + rps]) for top in range(0, height, rps)]
    fmt = "<" if byte_order == "II" else ">"
    out = bytearray()
    out += byte_order.encode("ascii")
    out += struct.pack(fmt + "H", 42)
    out += struct.pack(fmt + "I", 0)
    offsets: list[int] = []
    counts: list[int] = []
    for strip in strips:
        offsets.append(len(out))
        counts.append(len(strip))
        out += strip
        if len(out) % 2:
            out += b"\x00"
    n = len(strips)
    if n == 1:
        off_val, cnt_val = offsets[0], counts[0]
    else:
        off_val = len(out)
        out += struct.pack(fmt + f"{n}I", *offsets)
        cnt_val = len(out)
        out += struct.pack(fmt + f"{n}I", *counts)

    def entry(tag: int, etype: int, value: int, count: int = 1) -> bytes:
        e = struct.pack(fmt + "HHI", tag, etype, count)
        if etype == _SHORT:
            return e + struct.pack(fmt + "H", value) + b"\x00\x00"
        return e + struct.pack(fmt + "I", value)

    struct.pack_into(fmt + "I", out, 4, len(out))
    out += struct.pack(fmt + "H", _N_ENTRIES)
    out += entry(_WIDTH, _LONG, width)
    out += entry(_LENGTH, _LONG, height)
    out += entry(_BITS_PER_SAMPLE, _SHORT, 1)
    out += entry(_COMPRESSION, _SHORT, compression)
    out += entry(_PHOTOMETRIC, _SHORT, 0)  # MinIsWhite (fax default)
    out += entry(_STRIP_OFFSETS, _LONG, off_val, n)
    out += entry(_SAMPLES_PER_PIXEL, _SHORT, 1)
    out += entry(_ROWS_PER_STRIP, _LONG, rps)
    out += entry(_STRIP_BYTE_COUNTS, _LONG, cnt_val, n)
    out += struct.pack(fmt + "I", 0)
    return bytes(out)


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
