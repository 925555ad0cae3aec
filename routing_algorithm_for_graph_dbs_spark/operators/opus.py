"""REAL Ogg/Opus metadata parser (pure struct) — no codec lib.

Opus-in-Ogg is the dominant modern voice/crawl-audio codec; the fields
a pipeline filters on — duration, channel count, pre-skip, input
sample rate — live in the public container layout (RFC 3533 Ogg
framing + RFC 7845 Opus encapsulation): fixed 27-byte page headers
(``OggS`` magic, 64-bit granule position, page sequence, CRC, lacing
table) with the first page's payload an ``OpusHead`` identification
header. Duration is granule arithmetic — the final page's granule
position counts 48 kHz samples including the declared pre-skip — so no
packet DECODE is needed; Opus sample decode (CELT/SILK) genuinely
needs a codec library and stays the honest boundary, exactly the
parse-not-decode split of ``operators/mp3.py`` / ``operators/flac.py``.

``parse_opus_metadata`` walks EVERY page, verifies the magic, version,
strictly-increasing page sequence AND each page's CRC (the Ogg CRC-32:
polynomial 0x04c11db7, zero init, unreflected — computed with the CRC
field zeroed), so corruption fails loudly instead of extrapolating.
``build_opus`` mints conformant streams (OpusHead + OpusTags + audio
pages with real CRCs) with closed-form sizes and durations for golden
tests and cross-engine oracles.

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct


def _make_crc_table():
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
        table.append(r & 0xFFFFFFFF)
    return tuple(table)


_CRC_TABLE = _make_crc_table()


def ogg_crc(data: bytes) -> int:
    """The Ogg page CRC-32 (RFC 3533 A.1): poly 0x04c11db7, init 0,
    unreflected, no final xor — NOT the zlib CRC."""
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) & 0xFF) ^ b]
    return r


def is_ogg_opus(payload: bytes) -> bool:
    """Cheap sniff: an ``OggS`` version-0 first page whose payload
    starts with the ``OpusHead`` magic (payload begins right after the
    27-byte header + lacing table)."""
    if len(payload) < 28 or payload[:4] != b"OggS" or payload[4] != 0:
        return False
    n_segs = payload[26]
    body_at = 27 + n_segs
    return payload[body_at : body_at + 8] == b"OpusHead"


def parse_opus_metadata(payload: bytes):
    """Parse ``(n_channels, pre_skip, input_sample_rate, n_pages,
    duration_ms)`` by walking every Ogg page.

    Validation per page: magic, version 0, CRC (recomputed over the
    page with the CRC field zeroed), monotonically +1 page sequence,
    lacing table inside the payload. The first page must carry the BOS
    flag and an RFC 7845 OpusHead (version 1); the last page must carry
    EOS. Duration = (final granule - pre_skip) / 48000 — granules are
    ALWAYS 48 kHz for Opus regardless of the input rate."""
    if len(payload) < 28 or payload[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    pos = 0
    n_pages = 0
    head = None
    last_granule = None
    prev_seq = None
    saw_eos = False
    while pos < len(payload):
        if saw_eos:
            raise ValueError("Ogg pages continue after the EOS page")
        if pos + 27 > len(payload):
            raise ValueError("Ogg page header truncated")
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("lost Ogg page sync")
        if payload[pos + 4] != 0:
            raise ValueError("unsupported Ogg stream structure version")
        htype = payload[pos + 5]
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        seq = struct.unpack_from("<I", payload, pos + 18)[0]
        crc = struct.unpack_from("<I", payload, pos + 22)[0]
        n_segs = payload[pos + 26]
        body_at = pos + 27 + n_segs
        if body_at > len(payload):
            raise ValueError("Ogg lacing table truncated")
        body_len = sum(payload[pos + 27 : pos + 27 + n_segs])
        page_end = body_at + body_len
        if page_end > len(payload):
            raise ValueError("Ogg page body truncated")
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page {n_pages} CRC mismatch")
        if prev_seq is not None and seq != prev_seq + 1:
            raise ValueError("Ogg page sequence not monotonic")
        prev_seq = seq
        if n_pages == 0:
            if not htype & 0x02:
                raise ValueError("first Ogg page lacks the BOS flag")
            body = payload[body_at:page_end]
            if body[:8] != b"OpusHead":
                raise ValueError("first Ogg packet is not an OpusHead")
            if body[8] != 1:
                raise ValueError("unsupported OpusHead version")
            n_channels = body[9]
            pre_skip = struct.unpack_from("<H", body, 10)[0]
            input_rate = struct.unpack_from("<I", body, 12)[0]
            head = (n_channels, pre_skip, input_rate)
        if granule >= 0:
            last_granule = granule
        if htype & 0x04:
            saw_eos = True
        n_pages += 1
        pos = page_end
    if not saw_eos:
        raise ValueError("Ogg stream has no EOS page")
    n_channels, pre_skip, input_rate = head
    samples = max((last_granule or 0) - pre_skip, 0)
    duration_ms = int(round(samples * 1000.0 / 48000.0))
    return n_channels, pre_skip, input_rate, n_pages, duration_ms


def _page(
    body: bytes, htype: int, granule: int, seq: int, serial: int = 0x5061
) -> bytes:
    """One Ogg page holding ``body`` as a single packet (body < 255*255;
    lacing = full 255-byte values + one terminating short value)."""
    lacing = b"\xff" * (len(body) // 255) + bytes([len(body) % 255])
    hdr = (
        b"OggS"
        + bytes([0, htype])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(lacing)])
        + lacing
    )
    crc = ogg_crc(hdr + body)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body


def build_opus(
    n_audio_pages: int,
    packet_bytes: int = 50,
    samples_per_page: int = 960,
    pre_skip: int = 312,
    input_sample_rate: int = 48000,
    n_channels: int = 2,
) -> bytes:
    """Mint a conformant Ogg/Opus stream: OpusHead BOS page + OpusTags
    page + ``n_audio_pages`` single-packet audio pages (zeroed packets
    of ``packet_bytes`` — any demuxer hops them by the lacing table;
    packet CONTENT is the decode boundary), granules advancing
    ``samples_per_page`` per page from ``pre_skip``, EOS on the last.
    Closed-form for the oracle (``packet_bytes`` < 255):
    total bytes = 47 + 44 + n_audio_pages * (28 + packet_bytes),
    duration_ms = n_audio_pages * samples_per_page / 48."""
    if n_audio_pages < 1:
        raise ValueError("an Ogg/Opus stream needs >= 1 audio page (EOS)")
    head = (
        b"OpusHead"
        + bytes([1, n_channels])
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", input_sample_rate)
        + struct.pack("<h", 0)  # output gain
        + bytes([0])  # mapping family 0
    )
    tags = b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 0)
    out = bytearray()
    out += _page(head, htype=0x02, granule=0, seq=0)
    out += _page(tags, htype=0x00, granule=0, seq=1)
    for i in range(n_audio_pages):
        eos = 0x04 if i == n_audio_pages - 1 else 0x00
        granule = pre_skip + (i + 1) * samples_per_page
        out += _page(
            b"\x00" * packet_bytes, htype=eos, granule=granule, seq=2 + i
        )
    return bytes(out)
