"""REAL MPEG-audio (MP3) metadata parser (pure struct) — no codec lib.

The dominant real-crawl audio format is MP3/AAC, not WAV; for a
training-data pipeline the fields it filters and plans on — duration,
sample rate, bitrate, channel mode, VBR-ness — live in the public
MPEG-1/2/2.5 frame-header layout (ISO/IEC 11172-3 / 13818-3): 4-byte
big-endian headers hoppable by the closed-form frame-length formula,
plus the de-facto Xing/Info and VBRI headers for VBR duration. Sample
DECODE (subband synthesis / MDCT) genuinely needs a codec library and
stays the honest ``NotImplementedError`` boundary in
``multimodal.audio_features``; this module makes the metadata half real
(reference boundary analog: `operators/mp4.py:54` does the same split
for ISO-BMFF video).

``parse_mp3_metadata`` walks EVERY frame header (sync check per hop, so
a corrupt stream fails loudly instead of extrapolating) — O(n_frames)
byte hops, no entropy decode, cost ~µs/MB. ``build_mp3`` mints
standard-conformant frames (correct lengths, padding bits, optional
Xing header) for golden tests and closed-form cross-engine oracles.

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct

# bitrate tables in kbps, index 1..14 (0 = free-format, 15 = bad)
_BITRATES = {
    # (version_group, layer): MPEG1 vs MPEG2/2.5 share the version group
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

# sample rates in Hz by version ID bits (00=2.5, 10=2, 11=1), index 0..2
_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}

_VERSION_BITS = {0: "2.5", 2: "2", 3: "1"}  # 1 is reserved
_LAYER_BITS = {1: 3, 2: 2, 3: 1}  # header layer bits -> layer number

_CHANNEL_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _id3v2_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none): header is
    'ID3' + version u16 + flags u8 + 28-bit syncsafe size (excl. the
    10-byte header, plus another 10 if the footer flag is set)."""
    if len(payload) < 10 or payload[:3] != b"ID3":
        return 0
    sz = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size bytes must be syncsafe (<0x80)")
        sz = (sz << 7) | b
    return 10 + sz + (10 if payload[5] & 0x10 else 0)


def _parse_header(hdr: int):
    """Decode one 32-bit frame header into
    (version, layer, bitrate_kbps, sample_rate, padding, channel_mode,
    frame_bytes, samples_per_frame). Raises ValueError on reserved or
    free-format combinations."""
    if hdr >> 21 != 0x7FF:
        raise ValueError("lost MPEG frame sync")
    vbits = (hdr >> 19) & 3
    if vbits not in _VERSION_BITS:
        raise ValueError("reserved MPEG version ID")
    version = _VERSION_BITS[vbits]
    lbits = (hdr >> 17) & 3
    if lbits not in _LAYER_BITS:
        raise ValueError("reserved MPEG layer")
    layer = _LAYER_BITS[lbits]
    bidx = (hdr >> 12) & 0xF
    if bidx == 0xF:
        raise ValueError("bad bitrate index 15")
    if bidx == 0:
        raise ValueError("free-format bitrate not supported")
    vgroup = 1 if version == "1" else 2
    bitrate = _BITRATES[(vgroup, layer)][bidx]
    ridx = (hdr >> 10) & 3
    if ridx == 3:
        raise ValueError("reserved sample-rate index")
    rate = _RATES[version][ridx]
    padding = (hdr >> 9) & 1
    mode = _CHANNEL_MODES[(hdr >> 6) & 3]
    if layer == 1:
        samples = 384
        frame_bytes = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        samples = 1152 if (vgroup == 1 or layer == 2) else 576
        coeff = 144 if (vgroup == 1 or layer == 2) else 72
        frame_bytes = coeff * bitrate * 1000 // rate + padding
    return version, layer, bitrate, rate, padding, mode, frame_bytes, samples


def _side_info_bytes(version: str, mode: str) -> int:
    """Layer III side-info size — the Xing header sits right after it."""
    if version == "1":
        return 17 if mode == "mono" else 32
    return 9 if mode == "mono" else 17


def _post_id3_offset(payload: bytes) -> int:
    """Offset of the first post-ID3v2 byte, 0 if no tag or the tag is
    malformed (the strict parsers re-raise on malformation; the sniffs
    just need a best-effort skip so an ID3-tagged ADTS-AAC file — common
    in the wild — is not mis-routed to the MPEG walk)."""
    try:
        return _id3v2_size(payload)
    except ValueError:
        return 0


def is_mp3(payload: bytes) -> bool:
    """Cheap sniff: a valid MPEG frame header (11-bit sync +
    non-reserved version/layer) at byte 0 or right after a leading ID3v2
    tag. An ID3 tag alone does NOT qualify — ID3 is a container-agnostic
    prefix (ADTS-AAC files carry it too), so the sniff commits only on
    the actual frame sync that follows it."""
    pos = _post_id3_offset(payload)
    if len(payload) < pos + 4:
        return False
    hdr = struct.unpack_from(">I", payload, pos)[0]
    return (
        hdr >> 21 == 0x7FF
        and (hdr >> 19) & 3 in _VERSION_BITS
        and (hdr >> 17) & 3 in _LAYER_BITS
    )


def parse_mp3_metadata(payload: bytes):
    """Parse ``(version, layer, sample_rate, bitrate_kbps, n_frames,
    duration_ms, vbr, channel_mode)`` by hopping every frame header.

    ``bitrate_kbps`` is the stream average — the header bitrate for CBR,
    total audio bytes over duration for VBR (matching what ffprobe
    reports). ``vbr`` is True when a Xing/VBRI header is present or the
    per-frame header bitrates differ. A trailing ID3v1 tag (128 bytes,
    'TAG') is tolerated; any other trailing garbage or mid-stream sync
    loss raises ValueError — a metadata parser that extrapolates over
    corruption would mis-plan the pipeline it feeds."""
    pos = _id3v2_size(payload)
    end = len(payload)
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    if pos + 4 > end:
        raise ValueError("no MPEG audio frames")
    first = _parse_header(struct.unpack_from(">I", payload, pos)[0])
    version, layer, _, rate, _, mode, first_len, samples = first
    audio_start = pos

    # Xing/Info (LAME) lives after the Layer III side info of frame 0;
    # VBRI (Fraunhofer) at a fixed 32-byte offset past the header. The
    # tagged frame is a metadata placeholder, not audio, even when the
    # tag's flags omit the frame-count field — track its presence
    # independently of whether we got a count out of it.
    xing_frames = None
    vbr_tagged = False
    has_placeholder = False
    if layer == 3:
        xoff = pos + 4 + _side_info_bytes(version, mode)
        tag = payload[xoff : xoff + 4]
        if tag in (b"Xing", b"Info"):
            has_placeholder = True
            vbr_tagged = tag == b"Xing"
            flags = struct.unpack_from(">I", payload, xoff + 4)[0]
            if flags & 1:
                xing_frames = struct.unpack_from(">I", payload, xoff + 8)[0]
    vboff = pos + 4 + 32
    if payload[vboff : vboff + 4] == b"VBRI":
        has_placeholder = True
        vbr_tagged = True
        xing_frames = struct.unpack_from(">I", payload, vboff + 14)[0]

    n_frames = 0
    bitrates = set()
    while pos + 4 <= end:
        hdr = struct.unpack_from(">I", payload, pos)[0]
        v, l, br, r, _, _, flen, _ = _parse_header(hdr)
        if (v, l, r) != (version, layer, rate):
            raise ValueError("MPEG version/layer/rate changed mid-stream")
        if pos + flen > end:
            raise ValueError("final MPEG frame truncated")
        bitrates.add(br)
        n_frames += 1
        pos += flen
    if pos != end:
        raise ValueError(f"{end - pos} trailing bytes after last frame")

    # A Xing/Info/VBRI frame is a metadata placeholder, not audio
    audio_frames = n_frames - (1 if has_placeholder else 0)
    counted = xing_frames if xing_frames is not None else audio_frames
    if counted <= 0:
        raise ValueError("MPEG stream has zero audio frames")
    duration_ms = int(round(counted * samples * 1000.0 / rate))
    vbr = vbr_tagged or len(bitrates) > 1
    if vbr:
        audio_bytes = end - audio_start - (first_len if has_placeholder else 0)
        bitrate_kbps = int(round(audio_bytes * 8.0 / duration_ms))
    else:
        bitrate_kbps = next(iter(bitrates))
    return version, layer, rate, bitrate_kbps, counted, duration_ms, vbr, mode


_ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)
_AAC_PROFILES = ("Main", "LC", "SSR", "LTP")


def is_adts(payload: bytes) -> bool:
    """Cheap sniff for ADTS AAC: 12-bit sync 0xFFF with layer bits 00
    (which in an MPEG-audio header would be the reserved layer, so the
    two sniffs are disjoint) and a legal sampling-frequency index — at
    byte 0 or right after a leading ID3v2 tag (same skip as
    :func:`is_mp3`, so tagged AAC routes here, not to the MPEG walk)."""
    pos = _post_id3_offset(payload)
    if len(payload) < pos + 7:
        return False
    return (
        payload[pos] == 0xFF
        and payload[pos + 1] & 0xF6 == 0xF0  # sync high nibble + layer 00
        and ((payload[pos + 2] >> 2) & 0xF) < len(_ADTS_RATES)
    )


def parse_adts_metadata(payload: bytes):
    """Parse ``(profile, sample_rate, n_channels, n_frames, duration_ms,
    bitrate_kbps)`` by hopping every ADTS frame header (ISO/IEC 14496-3
    1.A.2): each 7/9-byte header carries an EXPLICIT 13-bit frame length
    and a raw-data-block count (each block = 1024 samples). A leading
    ID3v2 tag is skipped (tagged AAC is common in the wild). Like the
    MPEG walk, corruption fails loudly. Raw AAC DECODE stays the honest
    boundary; the fields a pipeline filters on are real."""
    pos, end = _id3v2_size(payload), len(payload)
    if not is_adts(payload):
        raise ValueError("not an ADTS stream")
    audio_start = pos
    profile = rate = channels = None
    n_frames = 0
    total_samples = 0
    while pos + 7 <= end:
        h = payload[pos : pos + 7]
        if not (h[0] == 0xFF and h[1] & 0xF6 == 0xF0):
            raise ValueError("lost ADTS frame sync")
        p = (h[2] >> 6) & 3
        ridx = (h[2] >> 2) & 0xF
        if ridx >= len(_ADTS_RATES):
            raise ValueError("reserved ADTS sampling-frequency index")
        ch = ((h[2] & 1) << 2) | (h[3] >> 6)
        flen = ((h[3] & 3) << 11) | (h[4] << 3) | (h[5] >> 5)
        blocks = (h[6] & 3) + 1
        if flen < 7:
            raise ValueError("ADTS frame length below header size")
        if pos + flen > end:
            raise ValueError("final ADTS frame truncated")
        if n_frames == 0:
            profile, rate, channels = _AAC_PROFILES[p], _ADTS_RATES[ridx], ch
        elif (rate, channels) != (_ADTS_RATES[ridx], ch):
            raise ValueError("ADTS rate/channels changed mid-stream")
        total_samples += blocks * 1024
        n_frames += 1
        pos += flen
    if pos != end:
        raise ValueError(f"{end - pos} trailing bytes after last ADTS frame")
    if n_frames == 0:
        raise ValueError("ADTS stream has zero frames")
    duration_ms = int(round(total_samples * 1000.0 / rate))
    bitrate_kbps = int(round((end - audio_start) * 8.0 / duration_ms))
    return profile, rate, channels, n_frames, duration_ms, bitrate_kbps


def build_adts(
    n_frames: int,
    frame_bytes: int = 256,
    sample_rate: int = 44100,
    n_channels: int = 2,
    profile: str = "LC",
) -> bytes:
    """Mint standard-conformant ADTS AAC framing: ``n_frames`` frames of
    ``frame_bytes`` each (header + zeroed raw block), one 1024-sample
    block per frame — total size and duration are closed-form for the
    cross-engine oracle."""
    ridx = _ADTS_RATES.index(sample_rate)
    p = _AAC_PROFILES.index(profile)
    hdr = bytearray(7)
    hdr[0] = 0xFF
    hdr[1] = 0xF1  # sync + MPEG-4 + layer 00 + no CRC
    hdr[2] = (p << 6) | (ridx << 2) | (n_channels >> 2)
    hdr[3] = ((n_channels & 3) << 6) | (frame_bytes >> 11)
    hdr[4] = (frame_bytes >> 3) & 0xFF
    hdr[5] = ((frame_bytes & 7) << 5) | 0x1F  # buffer fullness high
    hdr[6] = 0xFC  # fullness low + 1 raw block (field stores blocks-1)
    frame = bytes(hdr) + b"\x00" * (frame_bytes - 7)
    return frame * n_frames


def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mode: str = "stereo",
    version: str = "1",
    layer: int = 3,
    xing: bool = False,
    id3v2_bytes: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Mint standard-conformant MPEG audio bytes: ``n_frames`` frames of
    the requested version/layer/bitrate/rate (payloads zeroed — any
    demuxer hops them by the header length formula), alternating the
    padding bit off/on is NOT done (padding=0 throughout, so frame
    length and therefore total size are closed-form: the cross-engine
    oracle leans on it). ``xing`` prepends a Xing frame declaring
    ``n_frames`` audio frames (VBR convention). Optional leading ID3v2
    (zero-filled, syncsafe size) and trailing ID3v1 tags exercise the
    skip paths."""
    vgroup = 1 if version == "1" else 2
    bidx = _BITRATES[(vgroup, layer)].index(bitrate_kbps)
    ridx = _RATES[version].index(sample_rate)
    vbits = {"1": 3, "2": 2, "2.5": 0}[version]
    lbits = {3: 1, 2: 2, 1: 3}[layer]
    mbits = _CHANNEL_MODES.index(mode)
    hdr = (
        (0x7FF << 21)
        | (vbits << 19)
        | (lbits << 17)
        | (1 << 16)  # no CRC
        | (bidx << 12)
        | (ridx << 10)
        | (0 << 9)  # padding
        | (mbits << 6)
    )
    hdr_bytes = struct.pack(">I", hdr)
    if layer == 1:
        flen = (12 * bitrate_kbps * 1000 // sample_rate) * 4
    else:
        coeff = 144 if (vgroup == 1 or layer == 2) else 72
        flen = coeff * bitrate_kbps * 1000 // sample_rate
    frame = hdr_bytes + b"\x00" * (flen - 4)
    out = bytearray()
    if id3v2_bytes:
        body = bytearray(id3v2_bytes)
        sz = id3v2_bytes
        out += b"ID3\x03\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        out += body
    if xing:
        xf = bytearray(frame)
        xoff = 4 + _side_info_bytes(version, mode)
        xf[xoff : xoff + 4] = b"Xing"
        xf[xoff + 4 : xoff + 8] = struct.pack(">I", 1)  # frames flag
        xf[xoff + 8 : xoff + 12] = struct.pack(">I", n_frames)
        out += xf
    out += frame * n_frames
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)
