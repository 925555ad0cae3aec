"""REAL GIF metadata parser (pure struct) — no codec lib.

GIF is still everywhere in web crawls (memes, UI assets, ad creatives);
the fields a filtering pipeline thresholds on — canvas dimensions,
frame count, animation length, palette size — live in the pure-struct
container layer of the public GIF89a specification (CompuServe 1990 /
W3C mirror): a 6-byte ``GIF87a``/``GIF89a`` header, a 7-byte Logical
Screen Descriptor (width/height as little-endian u16, a packed byte
whose bit 7 flags a Global Color Table of ``2^(N+1)`` RGB triples),
then a block stream — ``0x21`` extensions (label + length-prefixed
data sub-blocks), ``0x2C`` image descriptors (9-byte geometry +
optional Local Color Table + LZW minimum code size + data sub-blocks),
``0x3B`` trailer. Every variable-length region is length-prefixed, so
the walk hops image data by size and never inflates it: LZW pixel
DECODE stays the honest boundary, exactly like the JPEG arithmetic /
audio-sample boundaries (parse-not-decode split per ``operators/
mp3.py``; reference boundary analog main.py:1 — the reference delegates
media handling entirely).

``parse_gif_metadata`` walks EVERY block to the trailer, counting
frames (image descriptors) and summing Graphic Control Extension
delays into the exact animation duration; any unknown introducer,
truncation, or missing trailer raises loudly. ``build_gif`` mints
conformant single- or multi-frame GIFs with closed-form sizes for
golden tests and cross-engine oracles.

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct

_EXTENSION = 0x21
_IMAGE = 0x2C
_TRAILER = 0x3B
_GCE_LABEL = 0xF9


def is_gif(payload: bytes) -> bool:
    """Cheap sniff: the ``GIF8`` signature prefix."""
    return len(payload) >= 6 and payload[:4] == b"GIF8"


def _skip_subblocks(payload: bytes, pos: int) -> int:
    """Hop a chain of length-prefixed data sub-blocks; returns the
    offset just past the 0x00 terminator."""
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-block chain truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        if pos + n > len(payload):
            raise ValueError("GIF sub-block runs past payload")
        pos += n


def parse_gif_metadata(payload: bytes):
    """Parse ``(version, width, height, gct_colors, bg_index, n_frames,
    duration_ms)`` from the block walk.

    ``gct_colors`` is ``2^(N+1)`` when the Logical Screen Descriptor
    flags a Global Color Table, else 0 (and ``bg_index`` is only
    meaningful with a table — it is returned raw either way, as the
    spec stores it unconditionally). ``duration_ms`` sums every Graphic
    Control Extension's centisecond delay times 10 — 0 for a still GIF
    with no GCE. Image data sub-blocks are hopped by length, never LZW-
    decoded — the pixel-decode boundary."""
    if not is_gif(payload):
        raise ValueError("not a GIF (missing 'GIF8' signature)")
    version = payload[3:6].decode("ascii", "strict")
    if version not in ("87a", "89a"):
        raise ValueError(f"unknown GIF version {version!r}")
    if len(payload) < 13:
        raise ValueError("GIF truncated before Logical Screen Descriptor")
    width, height, packed, bg_index, _aspect = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    gct_colors = 0
    pos = 13
    if packed & 0x80:
        gct_colors = 2 << (packed & 0x07)
        pos += 3 * gct_colors
        if pos > len(payload):
            raise ValueError("GIF Global Color Table runs past payload")
    n_frames = 0
    delay_cs = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF block stream truncated (no trailer)")
        introducer = payload[pos]
        pos += 1
        if introducer == _TRAILER:
            break
        if introducer == _EXTENSION:
            if pos >= len(payload):
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            if label == _GCE_LABEL:
                # GCE body: size(=4) packed delay_lo delay_hi transparent
                if pos + 5 > len(payload) or payload[pos] != 4:
                    raise ValueError("malformed Graphic Control Extension")
                delay_cs += struct.unpack_from("<H", payload, pos + 2)[0]
            pos = _skip_subblocks(payload, pos)
        elif introducer == _IMAGE:
            if pos + 9 > len(payload):
                raise ValueError("GIF Image Descriptor truncated")
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:  # Local Color Table
                pos += 3 * (2 << (ipacked & 0x07))
            if pos >= len(payload):
                raise ValueError("GIF image data truncated")
            pos += 1  # LZW minimum code size — data stays encoded
            pos = _skip_subblocks(payload, pos)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block introducer 0x{introducer:02X}")
    return (version, width, height, gct_colors, bg_index, n_frames, delay_cs * 10)


def build_gif(
    width: int,
    height: int,
    n_frames: int = 1,
    delay_cs: int = 0,
    gct_bits: int = 0,
    bg_index: int = 0,
    frame_pad: int = 16,
    version: str = "89a",
) -> bytes:
    """Mint a conformant GIF with a CLOSED-FORM layout:

    ``13 + (gct_bits ? 3 * 2^gct_bits : 0)
    + n_frames * ((delay_cs ? 8 : 0) + 13 + frame_pad) + 1`` bytes.

    ``gct_bits`` is the table's color-count exponent (2..8 -> 4..256
    colors; 0 = no table). When ``delay_cs`` > 0 each frame gets a
    Graphic Control Extension, so the parsed duration is exactly
    ``n_frames * delay_cs * 10`` ms. Frame pixel data is ONE sub-block
    of ``frame_pad`` filler bytes (1..255) behind a fixed LZW minimum
    code size of 7 — spec-shaped but deliberately not a valid LZW
    stream, pinning the parser to the hop-by-length contract."""
    if not (1 <= frame_pad <= 255):
        raise ValueError("frame_pad must fit one data sub-block (1..255)")
    if gct_bits and not 2 <= gct_bits <= 8:
        raise ValueError("gct_bits must be 0 or 2..8")
    packed = 0x70  # color resolution 8 bits/primary, no GCT
    out = bytearray(b"GIF" + version.encode("ascii"))
    if gct_bits:
        packed |= 0x80 | (gct_bits - 1)
    out += struct.pack("<HHBBB", width, height, packed, bg_index, 0)
    if gct_bits:
        n = 1 << gct_bits
        out += bytes(v for i in range(n) for v in (i * 255 // (n - 1),) * 3)
    for f in range(n_frames):
        if delay_cs:
            out += bytes([_EXTENSION, _GCE_LABEL, 4, 0])
            out += struct.pack("<H", delay_cs) + bytes([0, 0])
        out += bytes([_IMAGE]) + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([7, frame_pad]) + bytes(
            (f + i) % 256 for i in range(frame_pad)
        ) + b"\x00"
    out += bytes([_TRAILER])
    return bytes(out)
