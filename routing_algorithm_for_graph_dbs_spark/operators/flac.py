"""REAL FLAC metadata parser AND audio-frame codec — no codec lib.

FLAC is the dominant lossless crawl-audio format; the fields a
training-data pipeline filters and plans on — exact duration, sample
rate, channel count, bit depth — live in the mandatory STREAMINFO
metadata block (the public xiph.org FLAC format spec / RFC 9639): a
4-byte ``fLaC`` magic, then a chain of metadata blocks (1-byte header
= last flag + 7-bit type, 24-bit big-endian length), of which the
FIRST must be STREAMINFO (type 0, 34 bytes) carrying ``<20>`` sample
rate, ``<3>`` channels-1, ``<5>`` bits-per-sample-1 and ``<36>`` total
samples — so duration is EXACT (total_samples / sample_rate), better
than the frame-walk estimate MP3 needs.

Round 11 moves FLAC *sample decode* OFF the declared codec boundary:
unlike MP3/AAC/Opus (whose sample decode needs DSP codebooks and a
real codec library), FLAC's audio frames are pure integer arithmetic —
Rice-coded residuals under fixed polynomial or quantized-LPC
predictors, optional stereo decorrelation, CRC-8/CRC-16 framing — all
fully specified in RFC 9639 and implementable exactly, the same way
``operators/gif.py`` implements LZW. ``decode_flac_pcm`` decodes every
frame bit-exactly, verifies the per-frame CRC-8/CRC-16 AND the
stream-level STREAMINFO MD5 of the raw PCM (so a single wrong sample
anywhere fails loudly), and ``encode_flac_pcm`` mints REAL, spec-
conformant FLAC streams (constant / verbatim / fixed / LPC subframes,
Rice partitions with escape codes, left/right/mid-side stereo) for
golden tests and cross-engine oracles.

``parse_flac_metadata`` walks EVERY metadata block and verifies the
first audio frame's 14-bit sync code, so a corrupt container fails
loudly instead of extrapolating. ``build_flac`` mints conformant
containers (STREAMINFO + optional PADDING + synced frame region) with
closed-form sizes for golden tests and cross-engine oracles.

Scale shape: one payload parses independently inside an Arrow batch
(``multimodal`` mapInPandas); nothing here touches Spark.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

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


# ---------------------------------------------------------------------------
# Audio-frame codec (RFC 9639 sections 9-10) — round 11.
# Everything below is integer arithmetic on bitstreams; no codec library.
# ---------------------------------------------------------------------------

def _crc_table(poly: int, width: int):
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)      # x^8 + x^2 + x + 1, init 0
_CRC16_TABLE = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1, init 0


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


class _BitWriter:
    """MSB-first bit accumulator (FLAC frames are big-endian bitstreams,
    unlike GIF's LSB-first LZW — hence a separate writer here)."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # RFC 9639 section 9.2.7.1: quotient = q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned frame"
        return bytes(self.buf)


class _MsbBitReader:
    """MSB-first bit reader over a bytes buffer, starting at a byte
    offset; tracks the byte position for CRC spans."""

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.byte_pos = byte_pos
        self._acc = 0
        self._nbits = 0

    def read(self, nbits: int) -> int:
        while self._nbits < nbits:
            if self.byte_pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated mid-frame")
            self._acc = (self._acc << 8) | self.data[self.byte_pos]
            self.byte_pos += 1
            self._nbits += 8
        self._nbits -= nbits
        out = (self._acc >> self._nbits) & ((1 << nbits) - 1)
        self._acc &= (1 << self._nbits) - 1
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code in FLAC residual")
        return q

    def align(self) -> None:
        self._nbits = 0
        self._acc = 0


def _utf8_encode_number(n: int) -> bytes:
    """RFC 9639 section 9.1.5 coded number: UTF-8-style, extended to
    36 bits (7-byte form)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                         (6, 0xFC), (7, 0xFE)):
        payload_bits = 6 * (nbytes - 1) + (7 - nbytes if nbytes < 7 else 0)
        if n < 1 << payload_bits:
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = lead | n
            return bytes(out)
    raise ValueError("coded number exceeds 36 bits")


def _utf8_decode_number(br: _MsbBitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    for i in range(8):
        if not (first >> (7 - i)) & 1:
            nbytes = i
            break
    else:
        raise ValueError("invalid FLAC coded-number lead byte 0xFF")
    if nbytes < 2:
        raise ValueError("invalid FLAC coded-number lead byte (continuation)")
    n = first & (0x7F >> nbytes) if nbytes < 7 else 0
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n


# Fixed-predictor coefficients by order (RFC 9639 section 9.2.5):
# residual = order-th difference of the signal.
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BS_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
             1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
_RATE_BY_CODE = {v: k for k, v in _RATE_CODES.items()}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_BY_CODE = {v: k for k, v in _BPS_CODES.items()}


def _pcm_le_bytes(flat, bps: int) -> bytes:
    """Interleaved samples -> little-endian two's-complement bytes, the
    stream the STREAMINFO MD5 is defined over (RFC 9639 section 8.2) —
    shared by encode (hashing the input) and decode (verifying the
    output), so the two sides cannot drift."""
    width = bps // 8
    u = np.asarray(flat, dtype=np.int64) & ((1 << bps) - 1)
    le = np.zeros((u.size, width), dtype=np.uint8)
    for i in range(width):
        le[:, i] = (u >> (8 * i)) & 0xFF
    return le.tobytes()


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _signed_width(values) -> int:
    """Smallest two's-complement width holding every value (0 if all 0)."""
    w = 0
    for v in values:
        need = v.bit_length() + 1 if v >= 0 else (-v - 1).bit_length() + 1
        if v == 0:
            need = 0
        w = max(w, need)
    return w


def _best_rice_param(folded) -> tuple:
    """(param, bit_cost) minimizing the Rice size for one partition;
    param capped at 14 (15 is the 4-bit escape marker)."""
    best_p, best_cost = 0, None
    total = sum(folded)
    for p in range(15):
        # cost = sum(quotients) + n stop bits + n*p remainder bits
        cost = sum(u >> p for u in folded) + len(folded) * (1 + p)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        if total >> p == 0:
            break  # larger p only adds remainder bits
    return best_p, best_cost


def _write_residual(w: _BitWriter, residual, order: int, blocksize: int):
    """Rice-coded residual, method 0 (4-bit params). Partition order 2
    when the blocksize allows it (exercises the partition walk), else 0;
    per-partition escape-to-raw when that is smaller (RFC 9639 9.2.7.2).
    """
    po = 2 if blocksize % 4 == 0 and (blocksize >> 2) > order else 0
    w.write(0, 2)   # coding method 00: rice, 4-bit params
    w.write(po, 4)
    n_parts = 1 << po
    idx = 0
    for part in range(n_parts):
        count = (blocksize >> po) - (order if part == 0 else 0)
        vals = residual[idx:idx + count]
        idx += count
        folded = [_zigzag(int(v)) for v in vals]
        p, rice_cost = _best_rice_param(folded)
        raw_w = _signed_width(vals)
        if raw_w > 31:
            # the escape width field is 5 bits; residuals this wide
            # (32-bit samples under a differencing predictor) must be
            # caught upstream by the verbatim fallback (self-review)
            raise ValueError("residual width exceeds the 5-bit escape"
                             " field — use a verbatim subframe")
        if 5 + raw_w * count < rice_cost:
            w.write(0xF, 4)          # escape marker
            w.write(raw_w, 5)
            for v in vals:
                w.write_signed(int(v), raw_w)
        else:
            w.write(p, 4)
            for u in folded:
                w.write_unary(u >> p)
                w.write(u & ((1 << p) - 1), p)
    assert idx == len(residual)


def _read_residual(br: _MsbBitReader, order: int, blocksize: int):
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    po = br.read(4)
    if blocksize % (1 << po):
        raise ValueError("FLAC partition order does not divide blocksize")
    out = []
    for part in range(1 << po):
        count = (blocksize >> po) - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        p = br.read(pbits)
        if p == escape:
            raw_w = br.read(5)
            if raw_w == 0:
                out.extend([0] * count)
            else:
                out.extend(br.read_signed(raw_w) for _ in range(count))
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << p) | br.read(p)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _encode_subframe(w: _BitWriter, samples, bps: int, force: str = None):
    """One subframe: constant / verbatim / best fixed order / LPC.
    ``force`` pins the type ('verbatim' | 'lpc' | 'constant') for test
    coverage; LPC here quantizes the order-2 polynomial predictor
    (coefs [2, -1], shift 0) through the real LPC bitstream path."""
    n = len(samples)
    first = samples[0] if n else 0
    is_const = all(s == first for s in samples)
    if force == "constant" and not is_const:
        raise ValueError("constant subframe forced on varying samples")
    if force is None and is_const:
        force = "constant"
    if force == "constant":
        w.write(0, 1)
        w.write(0, 6)   # type 000000
        w.write(0, 1)   # no wasted bits
        w.write_signed(first, bps)
        return
    if force == "verbatim":
        w.write(0, 1)
        w.write(1, 6)   # type 000001
        w.write(0, 1)
        for s in samples:
            w.write_signed(int(s), bps)
        return
    if force == "lpc":
        order = 2
        if n <= order:
            raise ValueError("LPC subframe needs more samples than order")
        coefs, precision, shift = [2, -1], 4, 0
        w.write(0, 1)
        w.write(0x20 | (order - 1), 6)   # type 1xxxxx, order = xxxxx+1
        w.write(0, 1)
        for s in samples[:order]:
            w.write_signed(int(s), bps)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, precision)
        arr = np.asarray(samples, dtype=np.int64)
        pred = (2 * arr[1:-1] - arr[:-2]) >> shift
        residual = (arr[2:] - pred).tolist()
        _write_residual(w, residual, order, n)
        return
    # auto: best fixed order by min total |residual| (the standard
    # estimator); numpy n-th diff IS the fixed-predictor residual
    arr = np.asarray(samples, dtype=np.int64)
    best_order, best_res, best_cost = 0, arr, int(np.abs(arr).sum())
    for order in range(1, 5):
        if n <= order:
            break
        res = np.diff(arr, n=order)
        cost = int(np.abs(res).sum())
        if cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    if _signed_width(best_res.tolist()) > 31:
        # 32-bit samples can difference past the 5-bit escape field's
        # reach (and make Rice quotients explode) — real encoders fall
        # back to verbatim here too (self-review round 11)
        _encode_subframe(w, samples, bps, force="verbatim")
        return
    w.write(0, 1)
    w.write(8 | best_order, 6)   # type 001xxx, fixed order xxx
    w.write(0, 1)
    for s in samples[:best_order]:
        w.write_signed(int(s), bps)
    _write_residual(w, best_res.tolist(), best_order, n)


def _decode_subframe(br: _MsbBitReader, blocksize: int, bps: int):
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        if wasted >= bps:
            raise ValueError("FLAC wasted bits exceed sample depth")
        bps -= wasted
    if stype == 0:
        out = [br.read_signed(bps)] * blocksize
    elif stype == 1:
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:
        order = stype - 8
        if order > blocksize:
            raise ValueError("FLAC fixed order exceeds blocksize")
        out = [br.read_signed(bps) for _ in range(order)]
        residual = _read_residual(br, order, blocksize)
        coefs = _FIXED_COEFS[order]
        for r in residual:
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[-1 - j]
            out.append(r + pred)
    elif stype >= 32:
        order = (stype & 0x1F) + 1
        if order > blocksize:
            raise ValueError("FLAC LPC order exceeds blocksize")
        out = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC coefficient precision 15")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        residual = _read_residual(br, order, blocksize)
        for r in residual:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[-1 - j]
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [s << wasted for s in out]
    return out


def _encode_frame(frame_idx: int, chans, bps: int,
                  assignment: int, force: str = None) -> bytes:
    """One complete frame: header (explicit blocksize when uncommon,
    rate deferred to STREAMINFO, CRC-8), per-channel subframes (the
    side channel of assignments 8-10 carries bps+1 bits per RFC 9639
    section 9.2.2), zero-padding to a byte boundary, CRC-16 footer."""
    blocksize = len(chans[0])
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)                    # reserved
    w.write(0, 1)                    # blocking strategy: fixed
    bs_code = _BS_CODES.get(blocksize)
    uncommon_bs = None
    if bs_code is None:
        if blocksize <= 256:
            bs_code, uncommon_bs = 6, (blocksize - 1, 8)
        else:
            bs_code, uncommon_bs = 7, (blocksize - 1, 16)
    w.write(bs_code, 4)
    w.write(0, 4)                    # sample rate: from STREAMINFO
    w.write(assignment, 4)
    w.write(_BPS_CODES[bps], 3)
    w.write(0, 1)                    # reserved
    for b in _utf8_encode_number(frame_idx):
        w.write(b, 8)
    if uncommon_bs is not None:
        w.write(uncommon_bs[0], uncommon_bs[1])
    header = w.getvalue()
    w.write(_crc8(header), 8)
    for ci, ch in enumerate(chans):
        ch_bps = bps + (1 if (assignment == 8 and ci == 1)
                        or (assignment == 9 and ci == 0)
                        or (assignment == 10 and ci == 1) else 0)
        _encode_subframe(w, ch, ch_bps, force=force)
    w.align()
    body = w.getvalue()
    return body + _crc16(body).to_bytes(2, "big")


def encode_flac_pcm(samples, sample_rate: int = 48000,
                    bits_per_sample: int = 16, block_size: int = 4096,
                    stereo_mode: str = "auto",
                    force_subframe: str = None) -> bytes:
    """Encode integer PCM to a REAL, spec-conformant FLAC stream.

    ``samples``: (frames, channels) int array/list, values in the
    signed ``bits_per_sample`` range (8/16/24/32 — multiples of 8 so
    the STREAMINFO MD5 over the raw little-endian PCM is well-defined
    and always emitted). ``stereo_mode`` picks the channel assignment
    for 2-channel input: 'independent' | 'left_side' | 'right_side' |
    'mid_side' | 'auto' (independent, unless the side channel is
    cheaper — constant zero — in which case left/side). Any FLAC
    decoder can play the result; ``decode_flac_pcm`` recovers the
    samples bit-exactly and verifies CRC-8/CRC-16/MD5.
    """
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    if not 1 <= n_channels <= 8:
        raise ValueError("FLAC supports 1..8 channels")
    if bits_per_sample not in (8, 16, 24, 32):
        raise ValueError("encoder supports 8/16/24/32-bit samples")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if n_frames and (arr.min() < lo or arr.max() > hi):
        raise ValueError("samples exceed the bits_per_sample range")
    if block_size < 16 and n_frames > block_size:
        raise ValueError("FLAC block size must be >= 16")
    if not 0 < sample_rate < (1 << 20):
        raise ValueError("sample rate must fit STREAMINFO's 20 bits")

    md5 = hashlib.md5()
    if n_frames:
        md5.update(_pcm_le_bytes(arr.reshape(-1), bits_per_sample))

    frames = bytearray()
    min_fs = max_fs = None
    for fi, at in enumerate(range(0, n_frames, block_size)):
        block = arr[at:at + block_size]
        if n_channels == 2 and stereo_mode != "independent":
            left = block[:, 0].tolist()
            right = block[:, 1].tolist()
            side = (block[:, 0] - block[:, 1]).tolist()
            mode = stereo_mode
            if mode == "auto":
                mode = "left_side" if not any(side) else "independent"
            if mode == "left_side":
                chans, assignment = (left, side), 8
            elif mode == "right_side":
                chans, assignment = (side, right), 9
            elif mode == "mid_side":
                mid = ((block[:, 0] + block[:, 1]) >> 1).tolist()
                chans, assignment = (mid, side), 10
            elif mode == "independent":
                chans, assignment = (left, right), 1
            else:
                raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
        else:
            chans = tuple(block[:, c].tolist() for c in range(n_channels))
            assignment = n_channels - 1
        fb = _encode_frame(fi, chans, bits_per_sample,
                           assignment, force=force_subframe)
        frames += fb
        min_fs = len(fb) if min_fs is None else min(min_fs, len(fb))
        max_fs = len(fb) if max_fs is None else max(max_fs, len(fb))

    eff_bs = min(block_size, n_frames) if n_frames else block_size
    packed = (
        (sample_rate << 44)
        | ((n_channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | n_frames
    )
    body = (
        struct.pack(">HH", max(16, eff_bs), max(16, eff_bs))
        + (min_fs or 0).to_bytes(3, "big")
        + (max_fs or 0).to_bytes(3, "big")
        + packed.to_bytes(8, "big")
        + md5.digest()
    )
    assert len(body) == 34
    out = bytearray(b"fLaC")
    out += bytes([0x80 | _STREAMINFO]) + (34).to_bytes(3, "big") + body
    out += frames
    return bytes(out)


def decode_flac_pcm(payload: bytes):
    """Decode every audio frame of a FLAC stream bit-exactly.

    Returns ``(samples, sample_rate, bits_per_sample)`` with
    ``samples`` an int64 (frames, channels) array. Verifies, loudly:
    the metadata chain (via :func:`parse_flac_metadata`), each frame's
    sync/reserved bits and header CRC-8, each frame's footer CRC-16,
    inter-frame blocksize/rate/bps consistency with STREAMINFO, and —
    when STREAMINFO carries an MD5 — the MD5 of the decoded PCM, so a
    single wrong sample anywhere raises ValueError instead of
    returning quietly wrong audio."""
    meta = parse_flac_metadata(payload)
    sample_rate, n_channels, bps, total_samples = meta[:4]
    # re-walk the chain for the audio offset and the STREAMINFO MD5
    # (parse_flac_metadata validates but does not expose them)
    pos = 4
    md5_expect = None
    while True:
        hdr = payload[pos]
        length = int.from_bytes(payload[pos + 1: pos + 4], "big")
        if (hdr & 0x7F) == _STREAMINFO and md5_expect is None:
            md5_expect = payload[pos + 22: pos + 38]
        pos += 4 + length
        if hdr & 0x80:
            break
    audio_at = pos

    out = [[] for _ in range(n_channels)]
    n_done = 0
    pos = audio_at
    while n_done < total_samples:
        br = _MsbBitReader(payload, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        if br.read(1):
            raise ValueError("FLAC frame reserved bit set")
        blocking = br.read(1)
        bs_code = br.read(4)
        rate_code = br.read(4)
        assignment = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _utf8_decode_number(br)  # frame/sample number (sequencing only)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if rate_code == 0:
            rate = sample_rate
        elif rate_code in _RATE_BY_CODE:
            rate = _RATE_BY_CODE[rate_code]
        elif rate_code == 12:
            rate = br.read(8) * 1000
        elif rate_code == 13:
            rate = br.read(16)
        elif rate_code == 14:
            rate = br.read(16) * 10
        else:
            raise ValueError("invalid FLAC frame sample rate code 15")
        if rate != sample_rate:
            raise ValueError("FLAC frame sample rate contradicts STREAMINFO")
        if bps_code == 0:
            frame_bps = bps
        elif bps_code in _BPS_BY_CODE:
            frame_bps = _BPS_BY_CODE[bps_code]
        else:
            raise ValueError(f"reserved FLAC bit-depth code {bps_code}")
        if frame_bps != bps:
            raise ValueError("FLAC frame bit depth contradicts STREAMINFO")
        header_end = br.byte_pos
        crc8_got = br.read(8)
        if _crc8(payload[pos:header_end]) != crc8_got:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if assignment <= 7:
            if assignment + 1 != n_channels:
                raise ValueError("FLAC frame channel count contradicts"
                                 " STREAMINFO")
            chans = [
                _decode_subframe(br, blocksize, bps)
                for _ in range(n_channels)
            ]
        elif assignment <= 10:
            if n_channels != 2:
                raise ValueError("FLAC stereo decorrelation in a non-stereo"
                                 " stream")
            bps0 = bps + (1 if assignment == 9 else 0)
            bps1 = bps + (1 if assignment in (8, 10) else 0)
            sub0 = _decode_subframe(br, blocksize, bps0)
            sub1 = _decode_subframe(br, blocksize, bps1)
            if assignment == 8:      # left/side
                left = sub0
                right = [l - s for l, s in zip(sub0, sub1)]
            elif assignment == 9:    # right/side
                right = sub1
                left = [r + s for r, s in zip(sub1, sub0)]
            else:                    # mid/side (lost low bit in side's LSB)
                left, right = [], []
                for m, s in zip(sub0, sub1):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
            chans = [left, right]
        else:
            raise ValueError(f"reserved FLAC channel assignment {assignment}")
        br.align()
        body_end = br.byte_pos
        if body_end + 2 > len(payload):
            raise ValueError("FLAC frame CRC-16 footer truncated")
        crc16_got = int.from_bytes(payload[body_end:body_end + 2], "big")
        if _crc16(payload[pos:body_end]) != crc16_got:
            raise ValueError("FLAC frame CRC-16 mismatch")
        if blocking == 0 and n_done + blocksize < total_samples and \
                blocksize != (meta_bs := struct.unpack_from(
                    ">H", payload, 8)[0]) and meta_bs >= 16:
            raise ValueError("non-final FLAC frame shorter than the fixed"
                             " block size")
        take = min(blocksize, total_samples - n_done)
        for c in range(n_channels):
            out[c].extend(chans[c][:take])
        n_done += take
        pos = body_end + 2
    if pos != len(payload):
        raise ValueError("trailing bytes after the final FLAC frame")
    samples = np.asarray(out, dtype=np.int64).T.reshape(n_done, n_channels)
    if md5_expect and md5_expect != b"\x00" * 16 and bps % 8 == 0:
        if hashlib.md5(
            _pcm_le_bytes(samples.reshape(-1), bps)
        ).digest() != md5_expect:
            raise ValueError("FLAC MD5 mismatch: decoded PCM differs from"
                             " the encoded audio")
    return samples, sample_rate, bps


def decode_flac_samples(payload: bytes):
    """``(x, sample_rate)`` with ``x`` float64 (frames, channels)
    normalized to [-1, 1] — the same contract as
    ``operators/wav.py decode_wav_samples``, so ``audio_features``
    derives RMS / zero crossings / spectral centroid identically."""
    samples, rate, bps = decode_flac_pcm(payload)
    return samples.astype(np.float64) / float(1 << (bps - 1)), rate
