"""REAL pure-Python WAV/PCM audio codec (struct + numpy) — no audio lib.

The audio half of the multimodal codec boundary: RIFF/WAVE framing and
integer-PCM sample decode are fully specified public formats, so the
features a training-data pipeline filters on (duration, sample rate,
RMS level, zero-crossing rate) are computable here without
librosa/ffmpeg. Genuinely compressed codecs still on the boundary
(MP3/AAC... in WAV) are the marked ``NotImplementedError`` sites.

Supported: RIFF little-endian WAVE, ``fmt `` audio format 1 (integer
PCM: 8-bit unsigned / 16-bit / 24-bit / 32-bit signed), format 3 (IEEE
float, 32/64-bit), format 2 (MS ADPCM), format 0x11 (IMA/DVI ADPCM),
formats 6/7 (G.711 A-law / mu-law), format 0x31 (GSM 6.10 full-rate
RPE-LTP — REAL sample decode via ``operators/gsm610.py``, round 14),
or 0xFFFE (WAVE_FORMAT_EXTENSIBLE wrapping the PCM/float subformats),
any channel count — every PCM/ADPCM/companded dialect, rounds 7-8.
Malformed framing raises ``ValueError``.

Scale shape: one payload decodes independently inside an Arrow batch
(``multimodal.audio_features`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_SUBFORMAT = (
    b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)
_FLOAT_SUBFORMAT = (  # KSDATAFORMAT_SUBTYPE_IEEE_FLOAT
    b"\x03\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)

# IMA/DVI ADPCM quantizer tables (public spec constants — IMA "Recommended
# Practices for Enhancing Digital Audio Compatibility", also RFC 3551 app.)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (new predictor, new step index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJUST[nibble]))
    return pred, index


def _decode_ima_adpcm(
    data: bytes, n_channels: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM (WAV format 0x11) -> float64 (frames, channels) in
    [-1, 1]. Block layout per the spec: a 4-byte per-channel header
    (int16 predictor, step index, reserved), then channel-interleaved
    4-byte nibble groups, low nibble first."""
    if block_align < 4 * n_channels or (block_align - 4 * n_channels) % (
        4 * n_channels
    ):
        raise ValueError(f"bad IMA ADPCM block align {block_align}")
    out: list[list[int]] = []
    for bstart in range(0, len(data) - block_align + 1, block_align):
        block = data[bstart : bstart + block_align]
        preds, idxs = [], []
        chans: list[list[int]] = []
        for c in range(n_channels):
            pred, idx = struct.unpack_from("<hB", block, 4 * c)
            idx = min(88, idx)
            preds.append(pred)
            idxs.append(idx)
            chans.append([pred])  # header predictor IS the first sample
        pos = 4 * n_channels
        while pos < block_align:
            for c in range(n_channels):
                for b in block[pos : pos + 4]:
                    for nib in (b & 0xF, b >> 4):  # low nibble first
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
                pos += 4
        n = min(len(ch) for ch in chans)
        out.extend([ch[i] for ch in chans] for i in range(n))
    x = np.asarray(out, dtype=np.float64) / 32768.0
    return x.reshape(-1, n_channels) if len(out) else np.zeros((0, n_channels))


# MS ADPCM (WAV format 2) tables — public spec constants (Microsoft
# multimedia registration / RIFF WAVE documentation)
_MS_COEFFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
              (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def _decode_ms_adpcm(
    data: bytes, n_channels: int, block_align: int
) -> np.ndarray:
    """MS ADPCM (WAV format 2) -> float64 (frames, channels) in [-1, 1].

    Block layout per the public spec: per-channel predictor index (1 B),
    then per-channel idelta (i16), sample1 (i16), sample2 (i16) — the
    two seed samples are emitted oldest-first — then 4-bit signed
    residuals, channels alternating nibbles (high nibble first)."""
    hdr = 7 * n_channels
    if block_align <= hdr:
        raise ValueError(f"bad MS ADPCM block align {block_align}")
    out: list[list[int]] = []
    for bstart in range(0, len(data) - block_align + 1, block_align):
        block = data[bstart : bstart + block_align]
        c1, c2, idelta, s1, s2 = [], [], [], [], []
        for c in range(n_channels):
            pidx = block[c]
            if pidx >= len(_MS_COEFFS):
                raise ValueError(f"MS ADPCM predictor index {pidx}")
            c1.append(_MS_COEFFS[pidx][0])
            c2.append(_MS_COEFFS[pidx][1])
        for c in range(n_channels):
            (d,) = struct.unpack_from("<h", block, n_channels + 2 * c)
            idelta.append(d)
        for c in range(n_channels):
            (v,) = struct.unpack_from("<h", block, 3 * n_channels + 2 * c)
            s1.append(v)
        for c in range(n_channels):
            (v,) = struct.unpack_from("<h", block, 5 * n_channels + 2 * c)
            s2.append(v)
        frames = [list(s2), list(s1)]  # seeds, oldest first
        chan = 0
        cur: list[int] = [0] * n_channels
        filled = 0
        for byte in block[hdr:]:
            for nib in (byte >> 4, byte & 0xF):
                signed = nib - 16 if nib >= 8 else nib
                pred = (s1[chan] * c1[chan] + s2[chan] * c2[chan]) // 256
                pred += signed * idelta[chan]
                pred = max(-32768, min(32767, pred))
                s2[chan] = s1[chan]
                s1[chan] = pred
                idelta[chan] = max(16, (_MS_ADAPT[nib] * idelta[chan]) // 256)
                cur[chan] = pred
                filled += 1
                chan = (chan + 1) % n_channels
                if filled == n_channels:
                    frames.append(list(cur))
                    filled = 0
        out.extend(frames)
    x = np.asarray(out, dtype=np.float64) / 32768.0
    return x.reshape(-1, n_channels) if len(out) else np.zeros((0, n_channels))


def encode_wav_ms_adpcm(
    samples: "np.ndarray", sample_rate: int, block_frames: int = 500
) -> bytes:
    """Encode float samples as MS ADPCM WAV (format 2, predictor 0) —
    the golden-byte source for the decode path. The encoder quantizes
    each residual with the decoder's own state update, so decode is
    deterministic; the two seed samples per block are exact."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    if block_frames < 3 or (block_frames - 2) % 2:
        raise ValueError("block_frames must be 2 + an even count")
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype(np.int64)
    block_align = 7 * n_channels + (block_frames - 2) * n_channels // 2

    body = bytearray()
    pos = 0
    while pos < n_frames:
        frames = pcm[pos : pos + block_frames]
        if frames.shape[0] < block_frames:
            frames = np.vstack(
                [frames, np.repeat(frames[-1:], block_frames - frames.shape[0], 0)]
            )
        c1, c2 = _MS_COEFFS[0]
        idelta = [256] * n_channels
        s2 = [int(frames[0, c]) for c in range(n_channels)]
        s1 = [int(frames[1, c]) for c in range(n_channels)]
        body += bytes([0] * n_channels)  # predictor 0 per channel
        for c in range(n_channels):
            body += struct.pack("<h", idelta[c])
        for c in range(n_channels):
            body += struct.pack("<h", s1[c])
        for c in range(n_channels):
            body += struct.pack("<h", s2[c])
        nibbles: list[int] = []
        for i in range(2, block_frames):
            for c in range(n_channels):
                pred = (s1[c] * c1 + s2[c] * c2) // 256
                err = int(frames[i, c]) - pred
                nib = max(-8, min(7, int(round(err / idelta[c]))))
                nibu = nib + 16 if nib < 0 else nib
                val = max(-32768, min(32767, pred + nib * idelta[c]))
                s2[c] = s1[c]
                s1[c] = val
                idelta[c] = max(16, (_MS_ADAPT[nibu] * idelta[c]) // 256)
                nibbles.append(nibu)
        for k in range(0, len(nibbles), 2):
            body.append((nibbles[k] << 4) | nibbles[k + 1])
        pos += block_frames

    byte_rate = sample_rate * block_align // block_frames
    fmt = struct.pack(
        "<HHIIHHHH",
        2, n_channels, sample_rate, byte_rate, block_align, 4,
        2, block_frames,
    )
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + bytes(body)
        + (b"\x00" if len(body) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _decode_g711(data: bytes, n_channels: int, mu: bool) -> np.ndarray:
    """G.711 companded 8-bit samples -> float64 (frames, channels).

    mu-law: invert bits, then ((mantissa*8 + 0x84) << exponent) - 0x84 —
    the G.711 reference expansion, which lands directly in the 16-bit
    range (max +-32124, the audioop convention). A-law: XOR 0x55,
    (mantissa*16 + 0x108) << (exponent-1) (or +8 at exponent 0) — max
    +-32256, same convention."""
    u = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    if mu:
        u = 255 - u  # complement
        sign = np.where(u & 0x80, -1, 1)
        exp = (u >> 4) & 7
        mant = u & 0xF
        x = sign * ((((mant << 3) + 0x84) << exp) - 0x84)
    else:
        a = u ^ 0x55
        # A-law sign convention is INVERTED vs mu-law: after ^0x55, bit7
        # SET means positive (Sun g711.c / audioop: 0x55 -> -8, 0xD5 -> +8).
        sign = np.where(a & 0x80, 1, -1)
        exp = (a >> 4) & 7
        mant = a & 0xF
        x = sign * np.where(
            exp == 0,
            (mant << 4) + 8,
            ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
        )
    x = x.astype(np.float64) / 32768.0
    n = x.shape[0] // n_channels
    return x[: n * n_channels].reshape(n, n_channels)


def is_wav(payload: bytes) -> bool:
    """Cheap signature sniff — dispatch guard for mixed-mime batches."""
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def _iter_chunks(payload: bytes):
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) < size:
            raise ValueError(f"WAV chunk {cid!r} truncated")
        yield cid, data
        pos += 8 + size + (size & 1)  # chunks pad to even offsets


def wav_audio_format(payload: bytes) -> int | None:
    """The fmt chunk's audio-format tag (1=PCM, 0x31=GSM 6.10, ...), or
    None when the payload has no parseable fmt chunk — a cheap sniff
    for callers that label decode provenance."""
    if not is_wav(payload):
        return None
    try:
        for cid, chunk in _iter_chunks(payload):
            if cid == b"fmt " and len(chunk) >= 2:
                return struct.unpack_from("<H", chunk, 0)[0]
    except ValueError:
        return None
    return None


def decode_wav_samples(payload: bytes):
    """Sample-level decode: ``(x, sample_rate)`` with ``x`` a float64
    (frames, channels) array normalized to [-1, 1] — the entry the DSP
    features (RMS, zero crossings, spectral centroid) build on."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    fmt = None
    data = None
    fact_frames = None
    for cid, chunk in _iter_chunks(payload):
        if cid == b"fact" and len(chunk) >= 4 and fact_frames is None:
            (fact_frames,) = struct.unpack_from("<I", chunk, 0)
        if cid == b"fmt " and fmt is None:
            if len(chunk) < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if len(chunk) >= 40 and chunk[24:40] == _PCM_SUBFORMAT:
                    fmt = (1,) + fmt[1:]
                elif len(chunk) >= 40 and chunk[24:40] == _FLOAT_SUBFORMAT:
                    fmt = (3,) + fmt[1:]
                else:
                    raise NotImplementedError(
                        "extensible WAV with a non-PCM/non-float subformat"
                        " needs a real audio lib"
                    )
        elif cid == b"data" and data is None:
            data = chunk
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _brate, balign, bits = fmt
    if audio_format not in (1, 2, 3, 6, 7, 0x11, 0x31):
        raise NotImplementedError(
            f"WAV audio format {audio_format} (compressed codec) needs a"
            " real audio lib"
        )
    if audio_format == 0x31:  # GSM 6.10 full-rate (round 14)
        from routing_algorithm_for_graph_dbs_spark.operators.gsm610 import (
            decode_gsm_frames,
            decode_gsm_wav49,
        )

        if n_channels != 1:
            raise ValueError("GSM 6.10 WAV must be mono")
        if balign == 65:
            pcm = decode_gsm_wav49(data[: len(data) // 65 * 65])
        elif balign == 33:
            pcm = decode_gsm_frames(data[: len(data) // 33 * 33])
        else:
            raise ValueError(f"bad GSM 6.10 block align {balign}")
        if fact_frames is not None:  # trim the encoder's pad-to-block tail
            pcm = pcm[:fact_frames]
        x = pcm.astype(np.float64) / 32768.0
        return x.reshape(-1, 1), sample_rate
    if n_channels < 1 or sample_rate < 1:
        raise ValueError(f"bad WAV fmt: channels={n_channels}, rate={sample_rate}")
    if audio_format == 2:  # MS ADPCM (round 8)
        if bits != 4:
            raise ValueError(f"MS ADPCM with {bits}-bit samples is invalid")
        return _decode_ms_adpcm(data, n_channels, balign), sample_rate
    if audio_format in (6, 7):  # G.711 A-law / mu-law (round 8)
        if bits != 8:
            raise ValueError(f"G.711 with {bits}-bit samples is invalid")
        return _decode_g711(data, n_channels, mu=audio_format == 7), sample_rate
    if audio_format == 0x11:  # IMA/DVI ADPCM (round 8)
        if bits != 4:
            raise ValueError(f"IMA ADPCM with {bits}-bit samples is invalid")
        return _decode_ima_adpcm(data, n_channels, balign), sample_rate
    if audio_format == 3:  # IEEE float — samples are already normalized
        if bits == 32:
            x = np.frombuffer(
                data[: len(data) // 4 * 4], dtype="<f4"
            ).astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data[: len(data) // 8 * 8], dtype="<f8").copy()
        else:
            raise NotImplementedError(
                f"float WAV bit depth {bits} is outside this decoder (32/64)"
            )
    elif bits == 8:  # unsigned, midpoint 128
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(
            data[: len(data) // 2 * 2], dtype="<i2"
        ).astype(np.float64) / 32768.0
    elif bits == 24:
        b = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
        b = b.reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        x = np.frombuffer(
            data[: len(data) // 4 * 4], dtype="<i4"
        ).astype(np.float64) / float(1 << 31)
    else:
        raise NotImplementedError(
            f"WAV bit depth {bits} is outside this decoder (8/16/24/32)"
        )
    n_frames = x.shape[0] // n_channels
    x = x[: n_frames * n_channels].reshape(n_frames, n_channels)
    return x, sample_rate


def decode_wav(payload: bytes):
    """Decode integer- or float-PCM WAV to
    ``(n_channels, sample_rate, n_samples, duration_ms, rms,
    zero_crossings)``.

    ``n_samples`` counts frames (per channel). ``rms`` is over all
    samples in [-1, 1] (integer PCM normalized; float PCM taken as
    stored — nominally already in range), rounded to 6.
    ``zero_crossings``
    counts strict sign flips of the channel-averaged signal — the
    classic voiced/unvoiced & noisiness signal a quality filter uses.
    """
    x, sample_rate = decode_wav_samples(payload)
    n_frames, n_channels = x.shape
    duration_ms = int(round(n_frames * 1000.0 / sample_rate))
    if n_frames == 0:
        return n_channels, sample_rate, 0, 0, 0.0, 0
    rms = float(np.sqrt(np.mean(np.square(x))))
    mono = x.mean(axis=1)
    zc = int(np.count_nonzero(mono[1:] * mono[:-1] < 0))
    return n_channels, sample_rate, n_frames, duration_ms, round(rms, 6), zc


def encode_wav_ima_adpcm(
    samples: "np.ndarray", sample_rate: int, block_frames: int = 505
) -> bytes:
    """Encode float samples in [-1, 1] as IMA/DVI ADPCM WAV (format
    0x11) — the golden-byte source for the ADPCM decode path. Lossy by
    construction (4-bit residuals), but the encoder updates its state
    with the DECODER's own step function, so the decoded stream is the
    deterministic quantization of the input (first sample of each block
    is exact — it rides the block header)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    if (block_frames - 1) % 8:
        raise ValueError("block_frames must be 1 + a multiple of 8")
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype(np.int64)
    groups_per_block = (block_frames - 1) // 8  # 4-byte groups per channel
    block_align = 4 * n_channels * (1 + groups_per_block)

    body = bytearray()
    idxs = [0] * n_channels
    pos = 0
    while pos < n_frames:
        frames = pcm[pos : pos + block_frames]
        if frames.shape[0] < block_frames:  # pad the tail block by edge
            frames = np.vstack(
                [frames, np.repeat(frames[-1:], block_frames - frames.shape[0], 0)]
            )
        preds = [int(frames[0, c]) for c in range(n_channels)]
        nibbles: list[list[int]] = [[] for _ in range(n_channels)]
        for c in range(n_channels):
            body += struct.pack("<hBB", preds[c], idxs[c], 0)
        for i in range(1, block_frames):
            for c in range(n_channels):
                step = _IMA_STEPS[idxs[c]]
                diff = int(frames[i, c]) - preds[c]
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                nibbles[c].append(nib)
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
        # channel-interleaved 4-byte groups, low nibble first
        for g in range(groups_per_block):
            for c in range(n_channels):
                for k in range(4):
                    lo = nibbles[c][8 * g + 2 * k]
                    hi = nibbles[c][8 * g + 2 * k + 1]
                    body.append(lo | (hi << 4))
        pos += block_frames

    byte_rate = sample_rate * block_align // block_frames
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, n_channels, sample_rate, byte_rate, block_align, 4,
        2, block_frames,  # cbSize + wSamplesPerBlock extension
    )
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + bytes(body)
        + (b"\x00" if len(body) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def spectral_centroid(x: "np.ndarray", sample_rate: int) -> float:
    """Magnitude-weighted mean frequency of the channel-averaged signal
    (DC excluded) in Hz — the classic brightness feature an audio
    quality filter uses. Pure numpy rfft; 0.0 for silence. Exact on
    single-bin tones: an alternating +/-a signal (period 2) is all
    Nyquist -> rate/2; an (a, a, -a, -a) tone (period 4, length a
    multiple of 4) is a single bin at rate/4 — the closed forms the
    oracle-checked driver query leans on."""
    mono = x.mean(axis=1) if x.ndim == 2 else np.asarray(x, dtype=np.float64)
    n = mono.shape[0]
    if n < 2:
        return 0.0
    mags = np.abs(np.fft.rfft(mono))[1:]  # drop DC
    total = float(mags.sum())
    if total <= 0.0:
        return 0.0
    freqs = np.arange(1, mags.shape[0] + 1) * (sample_rate / n)
    return float((freqs * mags).sum() / total)


def encode_wav(
    samples: "np.ndarray", sample_rate: int, bits: int = 16
) -> bytes:
    """Encode float samples in [-1, 1] (frames x channels, or 1-D mono)
    as WAV — integer PCM at 8/16 bits, IEEE float (format 3) at 32 —
    minting REAL golden bytes for decoder tests and the sink path."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("expected (frames[, channels]) samples")
    n_frames, n_channels = arr.shape
    audio_format = 1
    if bits == 16:
        pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
        data = pcm.reshape(-1).tobytes()
    elif bits == 8:
        pcm = np.clip(np.round(arr * 127.0) + 128, 0, 255).astype(np.uint8)
        data = pcm.reshape(-1).tobytes()
    elif bits == 32:  # IEEE float (format 3) — lossless for f32 inputs
        audio_format = 3
        data = arr.astype("<f4").reshape(-1).tobytes()
    else:
        raise ValueError("encoder emits 8/16-bit integer or 32-bit float PCM")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        audio_format,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
