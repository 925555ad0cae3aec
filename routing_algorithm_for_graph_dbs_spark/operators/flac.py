"""REAL FLAC metadata parser (pure struct) — no codec lib.

FLAC is the dominant lossless crawl-audio format; the fields a
training-data pipeline filters and plans on — exact duration, sample
rate, channel count, bit depth — live in the mandatory STREAMINFO
metadata block (the public xiph.org FLAC format spec): a 4-byte
``fLaC`` magic, then a chain of metadata blocks (1-byte header = last
flag + 7-bit type, 24-bit big-endian length), of which the FIRST must
be STREAMINFO (type 0, 34 bytes) carrying ``<20>`` sample rate,
``<3>`` channels-1, ``<5>`` bits-per-sample-1 and ``<36>`` total
samples — so duration is EXACT (total_samples / sample_rate), better
than the frame-walk estimate MP3 needs. Audio-frame DECODE (rice/LPC)
genuinely needs a codec and stays the honest boundary; this module is
the parse-not-decode analog of ``operators/mp3.py`` (MPEG audio) and
``operators/mp4.py`` (ISO-BMFF) for the lossless half of crawl audio.

``parse_flac_metadata`` walks EVERY metadata block and verifies the
first audio frame's 14-bit sync code, so a corrupt container fails
loudly instead of extrapolating. ``build_flac`` mints conformant
containers (STREAMINFO + optional PADDING + synced frame region) with
closed-form sizes for golden tests and cross-engine oracles.

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct

_STREAMINFO = 0
_PADDING = 1
_LAST_VALID_TYPE = 6  # 7..126 reserved, 127 invalid per spec


def is_flac(payload: bytes) -> bool:
    """Cheap sniff: the 4-byte ``fLaC`` stream marker."""
    return len(payload) >= 4 and payload[:4] == b"fLaC"


def parse_flac_metadata(payload: bytes):
    """Parse ``(sample_rate, n_channels, bits_per_sample, total_samples,
    duration_ms, n_blocks, audio_bytes)`` from the metadata-block chain.

    Loud-failure contract (same as the MPEG walk): bad magic, a first
    block that is not a 34-byte STREAMINFO, a reserved/invalid block
    type, a block running past the payload, a zero sample rate, or a
    frame region whose first two bytes lack the 14-bit frame sync
    (0b11111111_111110xx) all raise ValueError. ``duration_ms`` is
    exact — STREAMINFO's 36-bit total-sample count over the rate."""
    if not is_flac(payload):
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    n_blocks = 0
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata block header truncated")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if btype > _LAST_VALID_TYPE:
            raise ValueError(f"reserved/invalid FLAC block type {btype}")
        if n_blocks == 0 and (btype != _STREAMINFO or length != 34):
            raise ValueError("first FLAC block must be a 34-byte STREAMINFO")
        body_at = pos + 4
        if body_at + length > len(payload):
            raise ValueError("FLAC metadata block runs past payload")
        if n_blocks == 0:
            body = payload[body_at : body_at + 34]
            packed = int.from_bytes(body[10:18], "big")  # 64 bits
            sample_rate = packed >> 44
            n_channels = ((packed >> 41) & 0x7) + 1
            bits_per_sample = ((packed >> 36) & 0x1F) + 1
            total_samples = packed & ((1 << 36) - 1)
            if sample_rate == 0:
                raise ValueError("STREAMINFO sample rate is zero")
            info = (sample_rate, n_channels, bits_per_sample, total_samples)
        n_blocks += 1
        pos = body_at + length
        if last:
            break
    sample_rate, n_channels, bits_per_sample, total_samples = info
    audio_bytes = len(payload) - pos
    if total_samples > 0:
        if audio_bytes < 2:
            raise ValueError("STREAMINFO declares samples but no frame data")
        if not (payload[pos] == 0xFF and payload[pos + 1] & 0xFC == 0xF8):
            raise ValueError("first FLAC frame lacks the 14-bit sync code")
    duration_ms = int(round(total_samples * 1000.0 / sample_rate))
    return (
        sample_rate,
        n_channels,
        bits_per_sample,
        total_samples,
        duration_ms,
        n_blocks,
        audio_bytes,
    )


def build_flac(
    total_samples: int,
    sample_rate: int = 48000,
    n_channels: int = 2,
    bits_per_sample: int = 16,
    padding_bytes: int = 0,
    frame_bytes: int = 64,
) -> bytes:
    """Mint a conformant FLAC container: ``fLaC`` + STREAMINFO (+ an
    optional PADDING block exercising the chain walk) + a synced frame
    region of ``frame_bytes`` (sync code + zeros — any demuxer stops at
    the metadata boundary; frame CONTENT is the decode boundary). Total
    size is closed-form for the cross-engine oracle:
    ``42 + (4 + padding_bytes if padding_bytes else 0) + frame_bytes``.
    """
    if not 0 < sample_rate < (1 << 20):
        raise ValueError("sample rate must fit STREAMINFO's 20 bits")
    if total_samples >= (1 << 36):
        raise ValueError("total samples must fit STREAMINFO's 36 bits")
    packed = (
        (sample_rate << 44)
        | ((n_channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    body = (
        struct.pack(">HH", 4096, 4096)  # min/max block size
        + b"\x00\x00\x00" * 2  # min/max frame size unknown
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # MD5 unset
    )
    assert len(body) == 34
    last_flag = 0x00 if padding_bytes else 0x80
    out = bytearray(b"fLaC")
    out += bytes([last_flag | _STREAMINFO]) + (34).to_bytes(3, "big") + body
    if padding_bytes:
        out += bytes([0x80 | _PADDING]) + padding_bytes.to_bytes(3, "big")
        out += b"\x00" * padding_bytes
    if total_samples > 0:
        if frame_bytes < 2:
            raise ValueError("frame region needs at least the sync bytes")
        out += b"\xff\xf8" + b"\x00" * (frame_bytes - 2)
    return bytes(out)
