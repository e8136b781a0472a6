"""G.711 codec tests (stages/g711.py): the vectorized kernels are
pinned bit-exact against CPython's audioop (the Sun g711.c reference
implementation) over the FULL input domain — all 65536 int16 samples
and all 256 codewords — plus container roundtrips through the standard
WAV dispatch and the requantization-idempotence invariant the gate
relies on."""

import struct

import numpy as np
import pytest

from osm_replication_rust_ray.stages.decode import (
    decode_audio,
    make_audio_bytes,
)
from osm_replication_rust_ray.stages.g711 import (
    ALAW_DECODE_TABLE,
    ULAW_DECODE_TABLE,
    alaw_decode,
    alaw_encode,
    encode_wav_g711,
    ulaw_decode,
    ulaw_encode,
)

try:  # removed in Python 3.13 — interop pin runs where available
    import audioop
except ImportError:  # pragma: no cover
    audioop = None

ALL_PCM = np.arange(-32768, 32768, dtype=np.int16)
ALL_CODES = np.arange(256, dtype=np.uint8)


@pytest.mark.skipif(audioop is None, reason="audioop removed in 3.13")
def test_ulaw_encode_matches_audioop_exhaustive():
    ref = np.frombuffer(audioop.lin2ulaw(ALL_PCM.tobytes(), 2), np.uint8)
    assert np.array_equal(ulaw_encode(ALL_PCM), ref)


@pytest.mark.skipif(audioop is None, reason="audioop removed in 3.13")
def test_alaw_encode_matches_audioop_exhaustive():
    ref = np.frombuffer(audioop.lin2alaw(ALL_PCM.tobytes(), 2), np.uint8)
    assert np.array_equal(alaw_encode(ALL_PCM), ref)


@pytest.mark.skipif(audioop is None, reason="audioop removed in 3.13")
def test_decode_tables_match_audioop():
    ref_u = np.frombuffer(audioop.ulaw2lin(ALL_CODES.tobytes(), 2), "<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(ALL_CODES.tobytes(), 2), "<i2")
    assert np.array_equal(ULAW_DECODE_TABLE, ref_u)
    assert np.array_equal(ALAW_DECODE_TABLE, ref_a)


def test_requantization_idempotent_except_ulaw_negative_zero():
    """encode(decode(code)) == code for every codeword except the
    mu-law negative zero 0x7F (whose reconstruction level 0 re-encodes
    to the positive zero 0xFF).  Since the encoder never EMITS 0x7F,
    requantization of any encoder output is exactly idempotent — the
    structural basis of the gate's requant_ok column."""
    got_u = ulaw_encode(ulaw_decode(ALL_CODES))
    bad = ALL_CODES[got_u != ALL_CODES]
    assert bad.tolist() == [0x7F]
    assert got_u[0x7F] == 0xFF
    assert np.array_equal(alaw_encode(alaw_decode(ALL_CODES)), ALL_CODES)


def test_encoder_never_emits_ulaw_negative_zero():
    assert not np.any(ulaw_encode(ALL_PCM) == 0x7F)


def test_quantization_error_bounded_by_segment_step():
    """|decode(encode(x)) - x| is bounded by half the segment's step
    size: <= 16 in the smallest mu-law segment scaled to 16-bit, and
    grows with |x|; assert the exact worst case over the full domain
    (mu-law clips at +-32124, A-law at +-32640 -> the biggest error is
    at the extremes)."""
    err_u = np.abs(
        ulaw_decode(ulaw_encode(ALL_PCM)).astype(np.int32) - ALL_PCM
    )
    err_a = np.abs(
        alaw_decode(alaw_encode(ALL_PCM)).astype(np.int32) - ALL_PCM
    )
    assert err_u.max() == 32768 - 32124
    assert err_a.max() == 32768 - 32256


def test_wav_container_roundtrip_both_laws():
    pcm = np.frombuffer(make_audio_bytes(7, 3000, 42), "<i2")
    for law, tag in (("ulaw", 7), ("alaw", 6)):
        buf = encode_wav_g711(pcm, law)
        assert len(buf) == 58 + len(pcm)
        assert struct.unpack_from("<H", buf, 20)[0] == tag
        out = decode_audio(buf, "wav")
        assert len(out) == len(pcm)
        snr = 10 * np.log10(
            (pcm.astype(float) ** 2).mean()
            / ((out.astype(float) - pcm) ** 2).mean()
        )
        assert snr >= 30.0, (law, snr)


def test_wav_container_odd_length_pads():
    pcm = np.frombuffer(make_audio_bytes(1, 3001, 42), "<i2")
    buf = encode_wav_g711(pcm, "ulaw")
    assert len(buf) == 58 + 3001 + 1  # word-aligned data chunk
    assert np.array_equal(
        decode_audio(buf, "wav"), ulaw_decode(ulaw_encode(pcm))
    )


def test_wav_g711_rejects_wrong_bits():
    pcm = np.frombuffer(make_audio_bytes(2, 3000, 42), "<i2")
    buf = bytearray(encode_wav_g711(pcm, "alaw"))
    struct.pack_into("<H", buf, 34, 16)  # corrupt wBitsPerSample
    with pytest.raises(ValueError, match="8-bit"):
        decode_audio(bytes(buf), "wav")


def test_unknown_law_raises():
    with pytest.raises(ValueError, match="unknown G.711 law"):
        encode_wav_g711(np.zeros(8, np.int16), "mulaw")
    with pytest.raises(ValueError, match="empty"):
        encode_wav_g711(np.zeros(0, np.int16), "ulaw")
