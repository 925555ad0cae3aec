"""REAL Matroska/WebM (EBML) metadata parser (pure struct) — no codec.

WebM is the dominant crawl VIDEO container after MP4; the fields a
pipeline filters on — duration, track layout, dimensions, audio
rate/channels — live in the public EBML framing (RFC 8794) and the
Matroska element registry: every element is ``VINT id + VINT size +
payload``, so the whole file walks by length hops exactly like the
ISO-BMFF box walk in ``operators/mp4.py``. Cluster payloads (the VP8/
VP9/Vorbis/Opus frames) are skipped by their declared size — frame
DECODE stays the honest codec boundary; the metadata half is real.

``parse_webm_metadata`` walks the EBML header (DocType), the Segment's
Info (TimecodeScale x Duration -> exact milliseconds), every TrackEntry
(type, video dimensions, audio rate/channels) and counts Clusters,
failing loudly on malformed VINTs, truncated elements, or a missing
header. Non-minimal VINT size encodings are accepted (spec-legal) and
the unknown-size Segment convention (all-ones VINT) extends to EOF.

``build_webm`` mints conformant containers with FIXED-WIDTH (8-byte)
size VINTs on the variable-size elements, so every size is closed-form
for golden tests and cross-engine oracles:

    total bytes = 106 + len(doctype) + n_clusters * (cluster_pad + 24)

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_CLUSTER = 0x1F43B675
_DOCTYPE = 0x4282
_TIMECODESCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKENTRY = 0xAE
_TRACKTYPE = 0x83
_VIDEO = 0xE0
_AUDIO = 0xE1
_PIXELW = 0xB0
_PIXELH = 0xBA
_SAMPLERATE = 0xB5
_CHANNELS = 0x9F


def _read_vint(payload: bytes, pos: int, keep_marker: bool):
    """One VINT at ``pos`` -> (value, new_pos, is_all_ones). Element IDs
    keep the length-marker bit (the registry lists them that way);
    sizes strip it. Raises on a zero lead byte or truncation."""
    if pos >= len(payload):
        raise ValueError("EBML VINT truncated")
    lead = payload[pos]
    if lead == 0:
        raise ValueError("invalid EBML VINT lead byte 0x00")
    length = 8 - lead.bit_length() + 1
    if pos + length > len(payload):
        raise ValueError("EBML VINT runs past payload")
    raw = int.from_bytes(payload[pos : pos + length], "big")
    marker_stripped = raw - (1 << (7 * length))
    all_ones = marker_stripped == (1 << (7 * length)) - 1
    return (raw if keep_marker else marker_stripped), pos + length, all_ones


def _walk(payload: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) over [pos, end); an
    unknown-size SEGMENT extends to ``end``. Any other unknown-size
    element raises: RFC 8794 §6.2 ends such an element only at the next
    sibling/parent ID, and silently extending it to the parent's end
    would swallow the siblings — an unknown-size Cluster (standard in
    live-streamed Matroska) would collapse every following Cluster into
    one and report n_clusters=1. Raising loudly routes such files to the
    strict/fake dispatch like any other unsupported shape."""
    while pos < end:
        eid, pos, _ = _read_vint(payload, pos, keep_marker=True)
        size, pos, unknown = _read_vint(payload, pos, keep_marker=False)
        if unknown and eid != _SEGMENT:
            raise ValueError(
                f"unknown-size EBML element 0x{eid:X} (only Segment is"
                " supported; sibling-terminated unknown-size elements are"
                " not implemented)"
            )
        body_end = end if unknown else pos + size
        if body_end > end:
            raise ValueError("EBML element runs past its parent")
        yield eid, pos, body_end
        pos = body_end


def _uint(payload: bytes, s: int, e: int) -> int:
    return int.from_bytes(payload[s:e], "big")


def _float(payload: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", payload[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", payload[s:e])[0]
    raise ValueError("EBML float must be 4 or 8 bytes")


def is_webm(payload: bytes) -> bool:
    """Cheap sniff: the 4-byte EBML magic 0x1A45DFA3."""
    return len(payload) >= 4 and payload[:4] == b"\x1a\x45\xdf\xa3"


def parse_webm_metadata(payload: bytes):
    """Parse ``(doctype, duration_ms, n_video, n_audio, width, height,
    sample_rate, n_channels, n_clusters)`` from the EBML walk.

    ``duration_ms`` = Info.Duration (timecode units) x TimecodeScale
    (ns/unit, default 1,000,000) / 1e6, rounded to int — exact for the
    canonical ms-unit scale. Dimensions come from the FIRST video
    track, rate/channels from the FIRST audio track (SamplingFrequency
    default 8000, Channels default 1 per the Matroska registry); either
    is None when no such track exists. Cluster bodies are hopped by
    size, never parsed — the frame-decode boundary."""
    if not is_webm(payload):
        raise ValueError("not an EBML stream (missing 0x1A45DFA3 magic)")
    doctype = None
    seg_at = None
    for eid, s, e in _walk(payload, 0, len(payload)):
        if eid == _EBML:
            for fid, fs, fe in _walk(payload, s, e):
                if fid == _DOCTYPE:
                    doctype = payload[fs:fe].decode("ascii", "strict")
        elif eid == _SEGMENT:
            seg_at = (s, e)
            break
    if doctype is None:
        raise ValueError("EBML header carries no DocType")
    if seg_at is None:
        raise ValueError("EBML stream has no Segment")
    scale = 1_000_000
    duration_units = None
    n_video = n_audio = n_clusters = 0
    width = height = sample_rate = n_channels = None
    video_dims_done = audio_fields_done = False
    for eid, s, e in _walk(payload, *seg_at):
        if eid == _INFO:
            for fid, fs, fe in _walk(payload, s, e):
                if fid == _TIMECODESCALE:
                    scale = _uint(payload, fs, fe)
                elif fid == _DURATION:
                    duration_units = _float(payload, fs, fe)
        elif eid == _TRACKS:
            for tid, ts, te in _walk(payload, s, e):
                if tid != _TRACKENTRY:
                    continue
                ttype = None
                video = audio = None
                for fid, fs, fe in _walk(payload, ts, te):
                    if fid == _TRACKTYPE:
                        ttype = _uint(payload, fs, fe)
                    elif fid == _VIDEO:
                        video = (fs, fe)
                    elif fid == _AUDIO:
                        audio = (fs, fe)
                # fields come from the FIRST track of each type ONLY —
                # a per-track done flag, not per-field None checks, so a
                # first track missing one field can't mix with a later
                # track's values
                if ttype == 1:
                    n_video += 1
                    if video is not None and not video_dims_done:
                        video_dims_done = True
                        for fid, fs, fe in _walk(payload, *video):
                            if fid == _PIXELW:
                                width = _uint(payload, fs, fe)
                            elif fid == _PIXELH:
                                height = _uint(payload, fs, fe)
                elif ttype == 2:
                    n_audio += 1
                    if audio is not None and not audio_fields_done:
                        audio_fields_done = True
                        sample_rate, n_channels = 8000, 1  # registry defaults
                        for fid, fs, fe in _walk(payload, *audio):
                            if fid == _SAMPLERATE:
                                sample_rate = int(round(_float(payload, fs, fe)))
                            elif fid == _CHANNELS:
                                n_channels = _uint(payload, fs, fe)
        elif eid == _CLUSTER:
            n_clusters += 1
    if duration_units is None:
        raise ValueError("Segment Info carries no Duration")
    duration_ms = int(round(duration_units * scale / 1e6))
    return (
        doctype,
        duration_ms,
        n_video,
        n_audio,
        width,
        height,
        sample_rate,
        n_channels,
        n_clusters,
    )


def extract_vp8_keyframes(payload: bytes, limit: int | None = None):
    """Pull the VP8 KEY frames out of a WebM container (round 14 —
    video frame decode comes off the boundary by composition: the RFC
    6386 key-frame decoder already exists in ``operators/vp8.py``;
    this walk hands it the cluster payloads the metadata parser used
    to hop over).

    Walks Tracks for the first video TrackEntry whose CodecID is
    "V_VP8" (or, when no CodecID is present, the first video track —
    legacy self-minted containers), then every Cluster's SimpleBlocks
    (0xA3): frames on that track with the keyframe flag (bit 7 of the
    flags byte) are returned as ``[(timecode_units, bytes), ...]`` in
    stream order, up to ``limit``. Lacing is not parsed (flags lacing
    bits must be 0 — raises otherwise); BlockGroups are skipped (VP8
    keyframes in WebM are SimpleBlocks in practice). Returns [] for a
    VP8-less file; malformed EBML raises ValueError like the metadata
    parser."""
    if not is_webm(payload):
        raise ValueError("not an EBML stream (missing 0x1A45DFA3 magic)")
    video_track = None
    codec_ok = False
    frames: list = []
    for eid, s, e in _walk(payload, 0, len(payload)):
        if eid != _SEGMENT:
            continue
        for sid, ss, se in _walk(payload, s, e):
            if sid == _TRACKS and video_track is None:
                for tid, ts, te in _walk(payload, ss, se):
                    if tid != _TRACKENTRY:
                        continue
                    num, ttype, codec = None, None, None
                    for fid, fs, fe in _walk(payload, ts, te):
                        if fid == 0xD7:
                            num = _uint(payload, fs, fe)
                        elif fid == _TRACKTYPE:
                            ttype = _uint(payload, fs, fe)
                        elif fid == 0x86:
                            codec = payload[fs:fe]
                    if ttype == 1 and (codec in (None, b"V_VP8")):
                        video_track = num
                        codec_ok = codec == b"V_VP8"
                        break
            elif sid == _CLUSTER and video_track is not None and codec_ok:
                for cid, cs, ce in _walk(payload, ss, se):
                    if cid != 0xA3:  # SimpleBlock
                        continue
                    tnum, p, _ = _read_vint(payload, cs, keep_marker=False)
                    if p + 3 > ce:
                        raise ValueError("SimpleBlock header truncated")
                    tcode = struct.unpack(">h", payload[p : p + 2])[0]
                    flags = payload[p + 2]
                    if flags & 0x06:
                        raise ValueError(
                            "laced SimpleBlocks are not supported"
                        )
                    if tnum == video_track and flags & 0x80:
                        frames.append((tcode, payload[p + 3 : ce]))
                        if limit is not None and len(frames) >= limit:
                            return frames
    return frames


def _vint_size8(n: int) -> bytes:
    """A FIXED 8-byte size VINT (marker 0x01 lead) — spec-legal
    non-minimal encoding that makes builder layouts closed-form."""
    if n >= (1 << 56) - 1:
        raise ValueError("size too large for an 8-byte VINT")
    return (n | (1 << 56)).to_bytes(8, "big")


def _el(eid: int, body: bytes, id_len: int, fixed8: bool = False) -> bytes:
    head = eid.to_bytes(id_len, "big")
    if fixed8:
        return head + _vint_size8(len(body)) + body
    if len(body) > 126:
        raise ValueError("short-form builder element body exceeds 126 bytes")
    return head + bytes([0x80 | len(body)]) + body


def build_webm(
    duration_ms: int,
    width: int = 1280,
    height: int = 720,
    sample_rate: int = 48000,
    n_channels: int = 2,
    n_clusters: int = 1,
    cluster_pad: int = 4096,
    doctype: str = "webm",
    vp8_frames: list | None = None,
) -> bytes:
    """Mint a conformant WebM/Matroska container: EBML header (DocType)
    + Segment{Info{TimecodeScale=1e6, Duration f32}, Tracks{one video +
    one audio TrackEntry}, ``n_clusters`` Clusters each holding a
    Timecode and a Void of ``cluster_pad`` bytes}. Segment, Cluster and
    Void sizes use fixed 8-byte VINTs, so the total is closed-form:
    ``106 + len(doctype) + n_clusters * (cluster_pad + 24)`` bytes.
    ``duration_ms`` must be f32-exact (an integer < 2**24).

    ``vp8_frames`` (round 14): REAL VP8 key-frame payloads — the video
    TrackEntry gains CodecID "V_VP8" and the FIRST cluster carries one
    SimpleBlock per frame (track 1, timecode i*33 ms, keyframe flag)
    instead of Void padding; later clusters keep the padded shape. The
    default (None) emits the historical layout, so the metadata
    oracle's byte closed-form is unchanged."""
    if not 0 <= duration_ms < (1 << 24):
        raise ValueError("duration_ms must be f32-exact (< 2**24)")
    header = _el(
        _EBML,
        _el(0x4286, b"\x01", 2)
        + _el(0x42F7, b"\x01", 2)
        + _el(0x42F2, b"\x04", 2)
        + _el(0x42F3, b"\x08", 2)
        + _el(_DOCTYPE, doctype.encode("ascii"), 2)
        + _el(0x4287, b"\x02", 2)
        + _el(0x4285, b"\x02", 2),
        4,
    )
    info = _el(
        _INFO,
        _el(_TIMECODESCALE, (1_000_000).to_bytes(4, "big"), 3)
        + _el(_DURATION, struct.pack(">f", float(duration_ms)), 2),
        4,
    )
    video_entry = _el(
        _TRACKENTRY,
        _el(0xD7, b"\x01", 1)
        + _el(_TRACKTYPE, b"\x01", 1)
        + (_el(0x86, b"V_VP8", 1) if vp8_frames else b"")
        + _el(
            _VIDEO,
            _el(_PIXELW, width.to_bytes(2, "big"), 1)
            + _el(_PIXELH, height.to_bytes(2, "big"), 1),
            1,
        ),
        1,
    )
    audio_entry = _el(
        _TRACKENTRY,
        _el(0xD7, b"\x02", 1)
        + _el(_TRACKTYPE, b"\x02", 1)
        + _el(
            _AUDIO,
            _el(_SAMPLERATE, struct.pack(">f", float(sample_rate)), 1)
            + _el(_CHANNELS, bytes([n_channels]), 1),
            1,
        ),
        1,
    )
    tracks = _el(_TRACKS, video_entry + audio_entry, 4)
    cluster_body = (
        _el(0xE7, b"\x00", 1)
        + b"\xec" + _vint_size8(cluster_pad) + b"\x00" * cluster_pad
    )
    bodies = [cluster_body] * n_clusters
    if vp8_frames:
        blocks = b"".join(
            b"\xa3"
            + _vint_size8(4 + len(fr))  # track VINT + i16 + flags + frame
            + b"\x81"  # track 1 VINT
            + struct.pack(">h", i * 33)
            + b"\x80"  # keyframe flag
            + bytes(fr)
            for i, fr in enumerate(vp8_frames)
        )
        bodies[0] = _el(0xE7, b"\x00", 1) + blocks
    clusters = b"".join(
        _CLUSTER.to_bytes(4, "big") + _vint_size8(len(body)) + body
        for body in bodies
    )
    segment_body = info + tracks + clusters
    return (
        header
        + _SEGMENT.to_bytes(4, "big")
        + _vint_size8(len(segment_body))
        + segment_body
    )
