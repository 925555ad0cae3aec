"""REAL pure-Python WAV/PCM audio codec (struct + numpy) — no audio lib.

The audio half of the multimodal codec boundary: RIFF/WAVE framing and
integer-PCM sample decode are fully specified public formats, so the
features a training-data pipeline filters on (duration, sample rate,
RMS level, zero-crossing rate) are computable here without
librosa/ffmpeg. Compressed codecs (MP3/AAC/Opus...) and ADPCM remain
the marked ``NotImplementedError`` boundary.

Supported: RIFF little-endian WAVE, ``fmt `` audio format 1 (integer
PCM: 8-bit unsigned / 16-bit / 24-bit / 32-bit signed), audio format 3
(IEEE float, 32- or 64-bit — round 8), or 0xFFFE
(WAVE_FORMAT_EXTENSIBLE wrapping either subformat), any channel count.
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


def decode_wav_samples(payload: bytes):
    """Sample-level decode: ``(x, sample_rate)`` with ``x`` a float64
    (frames, channels) array normalized to [-1, 1] — the entry the DSP
    features (RMS, zero crossings, spectral centroid) build on."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    fmt = None
    data = None
    for cid, chunk in _iter_chunks(payload):
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
    audio_format, n_channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format not in (1, 3):
        raise NotImplementedError(
            f"WAV audio format {audio_format} (non-PCM) needs a real"
            " audio lib"
        )
    if n_channels < 1 or sample_rate < 1:
        raise ValueError(f"bad WAV fmt: channels={n_channels}, rate={sample_rate}")
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
