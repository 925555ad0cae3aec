"""GSM 06.10 full-rate codec unit tests (round 14).

The codec is spec-exact integer arithmetic, so the tests pin
hand-derivable pieces (APCM exponent/mantissa, LAR decode, frame
packing) plus end-to-end properties (roundtrip SNR, framing
equivalence, WAV wiring, family-feature constants). The independent
from-scratch C decoder crosscheck lives in test_codec_crosscheck.py.
"""

import numpy as np
import pytest

from routing_algorithm_for_graph_dbs_spark.operators import gsm610 as g
from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
    GSM_FAMILY_FEATURES,
    gsm_family_signal,
)
from routing_algorithm_for_graph_dbs_spark.operators.wav import (
    decode_wav,
    decode_wav_samples,
    wav_audio_format,
)


def test_xmaxc_exp_mant_hand_values():
    # xmaxc = 0: spec's special case exp=-4, mant=7
    assert g._xmaxc_to_exp_mant(0) == (-4, 7)
    # xmaxc = 1: mant normalizes 1 -> 3 -> 7 -> 15 with exp -1,-2,-3
    assert g._xmaxc_to_exp_mant(1) == (-3, 7)
    # xmaxc = 31: exp = 31>>3 - 1 = 2, mant = 31 - 16 = 15 -> (2, 7)
    assert g._xmaxc_to_exp_mant(31) == (2, 7)
    # xmaxc = 40: exp = 4, mant = 8 -> already > 7 -> (4, 0)
    assert g._xmaxc_to_exp_mant(40) == (4, 0)
    # xmaxc = 63 (max): exp = 6, mant = 15 -> (6, 7)
    assert g._xmaxc_to_exp_mant(63) == (6, 7)


def test_apcm_inverse_hand_values():
    # exp=-4, mant=7 (the xmaxc=0 block): code 4 -> +1 level.
    # temp = 1<<12 = 4096; mult_r(32767, 4096) = 4096; + temp3 512;
    # >> 10 = 4.
    assert g._apcm_inverse([4], -4, 7) == [4]
    # code 0 -> -7 level: temp = -7<<12; mult_r(32767,-28672) = -28671;
    # -28671+512 = -28159; >>10 = -28 (floor).
    assert g._apcm_inverse([0], -4, 7) == [-28]
    # exp=6 (largest blocks): temp2 = sub(6,6) = 0, so the spec's
    # "1 << sub(temp2,1)" is 1 << -1 — asl with a negative count
    # shifts RIGHT, giving temp3 = 0. code 7 -> +7 level:
    # temp = 7<<12 = 28672; mult_r(32767, 28672) = 28671; >>0 = 28671.
    assert g._apcm_inverse([7], 6, 7) == [28671]


def test_larc_zero_offsets_decode_to_zero_filter():
    # LARc chosen so LARpp == 0 exactly for the first four
    # coefficients (B<<1 is a multiple of 1024 there): LARc = -MIC + B'/1024
    larc = [32, 32, 20, 11, 8, 6, 4, 3]
    larpp = g._larc_to_larpp(larc)
    assert larpp[:4] == [0, 0, 0, 0]


def test_frame_pack_unpack_roundtrip():
    rng = np.random.default_rng(610)
    widths = g._LARC_BITS + g._SUBFRAME_BITS * 4
    fields = [int(rng.integers(0, 1 << w)) for w in widths]
    packed = g.pack_frame_fields(fields)
    assert len(packed) == 33  # 260 bits + 4 pad bits
    r = g._BitReader(packed, 0)
    f = g.unpack_frame_fields(r)
    flat = list(f["larc"])
    for nc, bc, mc, xmaxc, xmc in f["sub"]:
        flat += [nc, bc, mc, xmaxc] + list(xmc)
    assert flat == fields


def test_raw_and_wav49_framings_agree():
    x = gsm_family_signal(7)
    raw = g.encode_gsm_frames(x)
    w49 = g.encode_gsm_wav49_data(x)
    assert len(raw) == 33 * (len(x) // 160)
    assert len(w49) == 65 * (len(x) // 320)
    a = g.decode_gsm_frames(raw)
    b = g.decode_gsm_wav49(w49)
    assert np.array_equal(a, b)


def test_decoded_samples_are_multiples_of_8():
    # 5.3.4 truncation: srop = srop >> 3 << 3
    y = g.decode_gsm_frames(g.encode_gsm_frames(gsm_family_signal(3)))
    assert np.all(y % 8 == 0)


def test_roundtrip_snr_on_tonal_signal():
    t = np.arange(1600)
    x = (8000 * np.sin(2 * np.pi * 300 * t / 8000)).astype(np.int16)
    y = g.decode_gsm_frames(g.encode_gsm_frames(x))
    a = x[320:1280].astype(np.float64)
    b = y[320:1280].astype(np.float64)
    snr = 10 * np.log10(np.sum(a * a) / np.sum((a - b) ** 2))
    assert snr > 18.0, snr  # full-rate GSM ~20-30 dB on tones


def test_full_scale_input_does_not_overflow():
    # alternating full-scale square — exercises every saturation path
    x = np.tile(np.array([32767, -32768], dtype=np.int16), 800)
    y = g.decode_gsm_frames(g.encode_gsm_frames(x))
    assert y.dtype == np.int16 and len(y) == 1600


def test_wav_container_wiring():
    x = gsm_family_signal(0)
    wav = g.encode_wav_gsm(x)
    assert wav_audio_format(wav) == 0x31
    xs, rate = decode_wav_samples(wav)
    assert rate == 8000 and xs.shape == (len(x), 1)
    n_ch, sr, nf, dur, rms, zc = decode_wav(wav)
    assert (n_ch, sr, nf, dur) == (1, 8000, 320, 40)


def test_wav_fact_chunk_trims_padding():
    x = gsm_family_signal(1)[:500]  # not a block multiple
    wav = g.encode_wav_gsm(x)
    xs, _rate = decode_wav_samples(wav)
    assert xs.shape[0] == 500  # 640-sample pad trimmed by fact


def test_bad_framing_raises():
    with pytest.raises(ValueError):
        g.decode_gsm_frames(b"\x00" * 33)  # wrong magic
    with pytest.raises(ValueError):
        g.decode_gsm_frames(b"\xd0" * 34)  # not a 33-multiple
    with pytest.raises(ValueError):
        g.decode_gsm_wav49(b"\x00" * 64)  # not a 65-multiple


def test_family_feature_constants_match_python_decoder():
    """The literals the mm_gsm_pcm oracle embeds (also pinned against
    the independent C decoder in test_codec_crosscheck.py)."""
    for f, (rms_e, mean_e, zc_e) in GSM_FAMILY_FEATURES.items():
        wav = g.encode_wav_gsm(gsm_family_signal(f))
        xs, _ = decode_wav_samples(wav)
        rms = round(float(np.sqrt(np.mean(np.square(xs)))), 6)
        mean = round(float(np.mean(xs)), 6)
        mono = xs.mean(axis=1)
        zc = int(np.count_nonzero(mono[1:] * mono[:-1] < 0))
        assert (rms, mean, zc) == (rms_e, mean_e, zc_e), f
