"""REAL WebP metadata parser (pure struct) — no codec lib.

WebP has displaced JPEG/PNG across large parts of the modern web, so a
crawl pipeline sees it constantly; the fields it filters on — canvas
dimensions, lossy/lossless/extended flavor, alpha, animation frame
count and length — live in the RIFF container layer of the public WebP
container specification (Google) plus the first few STRUCTURAL bytes
of the VP8/VP8L bitstreams: a 12-byte ``RIFF <size> WEBP`` header,
then fourcc+u32le-size chunks padded to even offsets. A simple file is
one ``VP8 `` chunk (lossy: 3-byte frame tag, the ``9D 01 2A`` start
code, 14-bit width/height) or one ``VP8L`` chunk (lossless: the 0x2F
signature byte, then width-1/height-1 as 14-bit fields of a packed
u32le plus the alpha bit); an extended file opens with ``VP8X``
(feature flags, 24-bit canvas width-1/height-1) and, when animated,
an ``ANIM`` chunk plus one 16-byte-headed ``ANMF`` chunk per frame
(24-bit duration each). This module hops PIXEL data by chunk size —
it is the metadata half; since round 11 the LOSSLESS (VP8L) pixel
stream decodes for real in ``operators/vp8l.py`` (validated against
libwebp itself), and since round 13 LOSSY VP8 key frames decode for
real too (``operators/vp8.py`` — the full RFC 6386 keyframe pipeline,
sample-exact against WebPDecodeYUV; ``decode_webp_lossy`` below is
the container-level entry). Only VP8 interframes (never present in
still WebP) remain out of scope (reference boundary analog main.py:1
— the reference delegates media handling entirely).

``parse_webp_metadata`` walks every chunk with RIFF even-padding,
cross-checks the outer size, and raises loudly on truncation, a bad
signature, or a malformed bitstream prefix. ``build_webp`` mints all
three flavors with closed-form sizes for golden tests and cross-engine
oracles.

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct

_VP8_START_CODE = b"\x9d\x01\x2a"
_VP8L_SIGNATURE = 0x2F
_FLAG_ALPHA = 0x10  # VP8X feature byte, MSB-first: Rsv2 I L E X A R
_FLAG_ANIM = 0x02


def is_webp(payload: bytes) -> bool:
    """Cheap sniff: RIFF fourcc + WEBP form type."""
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    )


def _chunks(payload: bytes):
    """Yield (fourcc, body_start, body_size) over the RIFF body with
    even-offset padding; validates the outer size field."""
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = 8 + riff_size
    if end > len(payload):
        raise ValueError("RIFF size runs past payload")
    pos = 12
    while pos < end:
        if pos + 8 > end:
            raise ValueError("WebP chunk header truncated")
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("WebP chunk runs past RIFF size")
        yield fourcc, body, size
        pos = body + size + (size & 1)  # chunks start on even offsets


def parse_webp_metadata(payload: bytes):
    """Parse ``(flavor, width, height, has_alpha, n_frames, duration_ms,
    n_chunks)`` from the chunk walk.

    ``flavor`` is ``lossy``/``lossless``/``extended`` from the first
    pixel-bearing or VP8X chunk. Dimensions: VP8 key-frame 14-bit
    fields, VP8L packed bits, or the VP8X 24-bit canvas. ``n_frames``
    counts ANMF chunks (1 for a still); ``duration_ms`` sums ANMF
    24-bit frame durations (0 for a still). ``has_alpha`` is the VP8X
    alpha feature bit or the VP8L alpha bit (lossy-simple files have
    none). Pixel payloads beyond the structural prefix are hopped by
    chunk size — the entropy-decode boundary."""
    if not is_webp(payload):
        raise ValueError("not a WebP (missing RIFF/WEBP signature)")
    flavor = None
    width = height = None
    has_alpha = False
    n_frames = 0
    duration_ms = 0
    n_chunks = 0
    for fourcc, body, size in _chunks(payload):
        n_chunks += 1
        if fourcc == b"VP8 " and width is None:
            if flavor is None:
                flavor = "lossy"
            if size < 10:
                raise ValueError("VP8 chunk too short for a key frame")
            tag = int.from_bytes(payload[body : body + 3], "little")
            if tag & 0x1:
                raise ValueError("VP8 first frame is not a key frame")
            if payload[body + 3 : body + 6] != _VP8_START_CODE:
                raise ValueError("VP8 key-frame start code missing")
            w, h = struct.unpack_from("<HH", payload, body + 6)
            width, height = w & 0x3FFF, h & 0x3FFF
        elif fourcc == b"VP8L" and width is None:
            if flavor is None:
                flavor = "lossless"
            if size < 5:
                raise ValueError("VP8L chunk too short for its header")
            if payload[body] != _VP8L_SIGNATURE:
                raise ValueError("VP8L signature byte missing")
            (bits,) = struct.unpack_from("<I", payload, body + 1)
            width = (bits & 0x3FFF) + 1
            height = ((bits >> 14) & 0x3FFF) + 1
            has_alpha = has_alpha or bool((bits >> 28) & 0x1)
        elif fourcc == b"VP8X":
            flavor = "extended"
            if size < 10:
                raise ValueError("VP8X chunk must be 10 bytes")
            flags = payload[body]
            has_alpha = bool(flags & _FLAG_ALPHA)
            width = int.from_bytes(payload[body + 4 : body + 7], "little") + 1
            height = int.from_bytes(payload[body + 7 : body + 10], "little") + 1
        elif fourcc == b"ANMF":
            if size < 16:
                raise ValueError("ANMF chunk too short for its header")
            n_frames += 1
            duration_ms += int.from_bytes(
                payload[body + 12 : body + 15], "little"
            )
    if flavor is None or width is None:
        raise ValueError("WebP carries no VP8/VP8L/VP8X chunk")
    return (flavor, width, height, has_alpha, max(n_frames, 1), duration_ms, n_chunks)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))


def build_webp(
    width: int,
    height: int,
    flavor: str = "lossy",
    alpha: bool = False,
    n_frames: int = 1,
    frame_duration_ms: int = 40,
    pixel_pad: int = 32,
) -> bytes:
    """Mint a conformant WebP with a CLOSED-FORM layout (``pixel_pad``
    EVEN so no RIFF padding perturbs the arithmetic):

    - ``lossy``:    ``30 + pixel_pad`` bytes (12 RIFF + 8 + 10 + pad)
    - ``lossless``: ``26 + pixel_pad`` bytes (12 + 8 + 5 + pad + 1 RIFF
      pad byte — the 5-byte VP8L prefix makes the chunk odd)
    - ``extended`` (animated): ``44 + n_frames * (42 + pixel_pad)``
      bytes (12 + 18 VP8X + 14 ANIM + per frame: 8 ANMF header,
      16 frame header, 8 + 10 + pad embedded VP8 chunk)

    Pixel regions after the structural prefix are deterministic filler
    — spec-shaped but deliberately not a valid entropy stream, pinning
    the parser to the hop-by-size contract. Extended files animate:
    VP8X (+alpha flag) + ANIM + ``n_frames`` ANMF chunks, each carrying
    an embedded lossy key-frame prefix and a ``frame_duration_ms``
    24-bit duration, so the parsed total is exactly
    ``n_frames * frame_duration_ms``. ``alpha`` is honored by the
    lossless bit and the VP8X flag (plain lossy has no alpha)."""
    if pixel_pad % 2:
        raise ValueError("pixel_pad must be even (keeps sizes closed-form)")
    if not (1 <= width <= 0x3FFF and 1 <= height <= 0x3FFF):
        raise ValueError("WebP dimensions must fit 14 bits")
    pad = bytes((width + height + i) % 256 for i in range(pixel_pad))

    def vp8_body() -> bytes:
        # key frame (bit0=0), show_frame, plausible first-partition size
        tag = (0x123 << 5) | (1 << 4) | 0
        return (
            tag.to_bytes(3, "little")
            + _VP8_START_CODE
            + struct.pack("<HH", width, height)
            + pad
        )

    if flavor == "lossy":
        body = _chunk(b"VP8 ", vp8_body())
    elif flavor == "lossless":
        bits = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28)
        body = _chunk(
            b"VP8L", bytes([_VP8L_SIGNATURE]) + struct.pack("<I", bits) + pad
        )
    elif flavor == "extended":
        flags = _FLAG_ANIM | (_FLAG_ALPHA if alpha else 0)
        vp8x = (
            bytes([flags, 0, 0, 0])
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        anim = struct.pack("<IH", 0xFFFFFFFF, 0)  # white bg, loop forever
        frames = b""
        for _ in range(n_frames):
            hdr = (
                (0).to_bytes(3, "little")  # x/2
                + (0).to_bytes(3, "little")  # y/2
                + (width - 1).to_bytes(3, "little")
                + (height - 1).to_bytes(3, "little")
                + frame_duration_ms.to_bytes(3, "little")
                + b"\x00"  # no blend, dispose none
            )
            frames += _chunk(b"ANMF", hdr + _chunk(b"VP8 ", vp8_body()))
        body = _chunk(b"VP8X", vp8x) + _chunk(b"ANIM", anim) + frames
    else:
        raise ValueError(f"unknown WebP flavor {flavor!r}")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def decode_webp_lossy(payload: bytes):
    """REAL lossy-WebP pixel decode (round 13): find the ``VP8 `` chunk
    and run the full RFC 6386 key-frame pipeline
    (``operators/vp8.py``). Returns (Y, U, V) uint8 planes — Y at
    frame resolution, chroma at the 4:2:0 half resolution. Y IS the
    Rec.601 luma the feature extractors want (same contract as
    ``decode_jpeg_luma``); chroma upsampling/RGB conversion stays
    outside the codec, like the JPEG path. Raises ValueError on a
    malformed container and NotImplementedError only for VP8
    interframes (impossible in still WebP)."""
    from routing_algorithm_for_graph_dbs_spark.operators.vp8 import (
        decode_vp8_keyframe,
    )

    if not is_webp(payload):
        raise ValueError("not a WebP payload")
    for fourcc, body, size in _chunks(payload):
        if fourcc == b"VP8 ":
            return decode_vp8_keyframe(payload[body : body + size])
    raise ValueError("WebP payload has no lossy VP8 chunk")
