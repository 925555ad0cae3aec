"""REAL ISO-BMFF (MP4/MOV) metadata parser (pure struct) — no av lib.

The video third of the multimodal boundary: frame DECODE genuinely needs
a codec library (H.264/VP9/AV1 — the honest ``NotImplementedError``
boundary), but the metadata a training-data pipeline filters and plans
on — duration, dimensions, track count, brand — lives in the public
ISO/IEC 14496-12 box structure: plain big-endian framing walkable with
``struct``. Round 8 makes that half real: ``parse_mp4_metadata`` reads
ftyp + moov/mvhd (timescale-scaled duration) + trak/tkhd (16.16
fixed-point width/height, first visual track wins), both FullBox
versions (u32 v0 / u64 v1 times).

``build_mp4``: the write half — mints standard-conformant minimal MP4
bytes (ftyp + moov{mvhd, trak{tkhd}...} + mdat) for golden tests and
closed-form cross-engine oracles; any MP4 demuxer reads its headers.

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal.video_metadata`` mapInPandas); nothing here touches Spark.
Parsing touches only the first-level boxes plus moov's children — mdat
(the bulk of a real file) is skipped by its size field, so the cost is
O(header bytes), not O(payload).
"""

from __future__ import annotations

import struct


def is_mp4(payload: bytes) -> bool:
    """Cheap signature sniff: an ISO-BMFF file starts with a box whose
    type is ``ftyp`` (size u32 at 0, type at 4)."""
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _boxes(payload: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            if pos + 16 > end:
                raise ValueError("MP4 largesize box truncated")
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} overruns its container")
        yield btype, body, pos + size
        pos += size


def _parse_stbl(payload: bytes, tbody: int, tend: int):
    """Walk one trak's mdia for (media_timescale, stts entries, stsz
    sample count). Returns (timescale, n_frames, total_ticks) or None if
    the trak carries no sample table (the round-8 minimal traks)."""
    for mtype, mbody, mend in _boxes(payload, tbody, tend):
        if mtype != b"mdia":
            continue
        timescale = None
        n_stts = total_ticks = None
        n_stsz = None
        for ctype, cbody, cend in _boxes(payload, mbody, mend):
            if ctype == b"mdhd":
                ver = payload[cbody]
                if ver == 1:
                    (timescale,) = struct.unpack_from(">I", payload, cbody + 4 + 16)
                else:
                    (timescale,) = struct.unpack_from(">I", payload, cbody + 4 + 8)
            elif ctype == b"minf":
                for stype, sbody, send in _boxes(payload, cbody, cend):
                    if stype != b"stbl":
                        continue
                    for xtype, xbody, _xend in _boxes(payload, sbody, send):
                        if xtype == b"stts":
                            (n_ent,) = struct.unpack_from(">I", payload, xbody + 4)
                            n_stts = total_ticks = 0
                            for i in range(n_ent):
                                cnt, delta = struct.unpack_from(
                                    ">II", payload, xbody + 8 + 8 * i
                                )
                                n_stts += cnt
                                total_ticks += cnt * delta
                        elif xtype == b"stsz":
                            # sample_size u32 (0 = per-sample table),
                            # sample_count u32
                            _ss, n_stsz = struct.unpack_from(
                                ">II", payload, xbody + 4
                            )
        if n_stts is None and n_stsz is None:
            return None
        if n_stts is not None and n_stsz is not None and n_stts != n_stsz:
            raise ValueError(
                f"stts sample count {n_stts} != stsz sample count {n_stsz}"
            )
        if timescale in (None, 0):
            raise ValueError("sample table without a usable mdhd timescale")
        return timescale, (n_stts if n_stts is not None else n_stsz), total_ticks
    return None


def parse_mp4_metadata(payload: bytes):
    """Parse ``(brand, duration_ms, width, height, n_tracks, n_frames,
    fps)`` from the ISO-BMFF box structure. Width/height come from the
    first track whose tkhd carries nonzero dimensions (visual tracks;
    audio tracks store zero) and are 16.16 fixed-point, returned rounded
    to int. ``duration_ms`` is mvhd duration scaled by its timescale,
    rounded. ``n_frames``/``fps`` (round 9) come from the visual track's
    sample tables — frame count as the stts entry-count sum
    (cross-checked against stsz's sample_count when both exist), fps as
    count over stts total ticks scaled by the mdhd media timescale — the
    fields a video-filtering pipeline actually thresholds on. Tracks
    without sample tables (metadata-only files) report ``(0, 0.0)``.
    Raises ``ValueError`` on malformed framing or a missing moov."""
    if not is_mp4(payload):
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    brand = None
    duration_ms = None
    width = height = 0
    n_tracks = 0
    n_frames, fps = 0, 0.0
    for btype, body, bend in _boxes(payload, 0, len(payload)):
        if btype == b"ftyp":
            brand = payload[body : body + 4].decode("latin-1")
        elif btype == b"moov":
            for ctype, cbody, cend in _boxes(payload, body, bend):
                if ctype == b"mvhd":
                    ver = payload[cbody]
                    if ver == 1:
                        timescale, duration = struct.unpack_from(
                            ">IQ", payload, cbody + 4 + 16
                        )
                    else:
                        timescale, duration = struct.unpack_from(
                            ">II", payload, cbody + 4 + 8
                        )
                    if timescale == 0:
                        raise ValueError("mvhd timescale is zero")
                    duration_ms = int(round(duration * 1000.0 / timescale))
                elif ctype == b"trak":
                    n_tracks += 1
                    visual = False
                    for ttype, tbody, _tend in _boxes(payload, cbody, cend):
                        if ttype != b"tkhd":
                            continue
                        ver = payload[tbody]
                        # tail: reserved u32[2] (8) + layer/alt/volume/
                        # reserved (8) + matrix (36) + width/height
                        # (16.16 fixed)
                        off = tbody + 4 + (32 if ver == 1 else 20) + 16 + 36
                        w_fx, h_fx = struct.unpack_from(">II", payload, off)
                        if (width, height) == (0, 0) and (w_fx or h_fx):
                            width = int(round(w_fx / 65536.0))
                            height = int(round(h_fx / 65536.0))
                            visual = True
                    if visual:
                        stbl = _parse_stbl(payload, cbody, cend)
                        if stbl is not None:
                            mts, n_frames, ticks = stbl
                            if ticks:
                                fps = n_frames * mts / ticks
    if duration_ms is None:
        raise ValueError("MP4 missing moov/mvhd")
    return brand, duration_ms, width, height, n_tracks, n_frames, fps


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4(
    duration_ms: int,
    width: int,
    height: int,
    n_audio_tracks: int = 0,
    brand: str = "isom",
    mdat_bytes: int = 16,
    n_frames: int = 0,
    fps: float = 0.0,
    frame_bytes: int = 256,
) -> bytes:
    """Mint minimal standard-conformant MP4 bytes: ftyp + moov{mvhd,
    one visual trak, ``n_audio_tracks`` dimensionless traks} + mdat.
    Timescale is fixed at 1000, so ``duration_ms`` roundtrips exactly —
    the closed form the cross-engine oracle leans on. With ``n_frames``
    > 0 the visual trak also carries mdia{mdhd, minf{stbl{stts, stsz}}}:
    media timescale = round(fps * 1000), one stts entry of ``n_frames``
    samples at delta 1000 ticks (so the parsed fps roundtrips exactly
    for fps values with ≤3 decimals) and a constant-size stsz declaring
    the same count."""
    mvhd = _box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, 1000, int(duration_ms))
        + struct.pack(">IHHQ", 0x00010000, 0x0100, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2 + n_audio_tracks),  # next_track_ID
    )

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return _box(
            b"tkhd",
            struct.pack(">BxxxIIIxxxxI", 0, 0, 0, track_id, int(duration_ms))
            + b"\x00" * 8  # reserved
            + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/alt/volume/reserved
            + struct.pack(
                ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            + struct.pack(">II", w << 16, h << 16),
        )

    visual = tkhd(1, width, height)
    if n_frames > 0:
        mts = int(round(fps * 1000))
        mdhd = _box(
            b"mdhd",
            struct.pack(">BxxxIIII", 0, 0, 0, mts, n_frames * 1000)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und', pre_defined
        )
        stts = _box(
            b"stts", struct.pack(">BxxxI", 0, 1) + struct.pack(">II", n_frames, 1000)
        )
        stsz = _box(
            b"stsz", struct.pack(">BxxxII", 0, frame_bytes, n_frames)
        )
        stbl = _box(b"stbl", stts + stsz)
        visual += _box(b"mdia", mdhd + _box(b"minf", stbl))
    traks = _box(b"trak", visual)
    for i in range(n_audio_tracks):
        traks += _box(b"trak", tkhd(2 + i, 0, 0))
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0x200))
    mdat = _box(b"mdat", b"\x00" * mdat_bytes)
    return ftyp + moov + mdat
