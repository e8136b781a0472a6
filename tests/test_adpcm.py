"""IMA-ADPCM codec tests (stages/adpcm.py): the lane-parallel kernels
are pinned against a scalar transcription of the published IMA
algorithm, the WAV container roundtrips through the standard dispatch,
and malformed streams raise cleanly."""

import struct

import numpy as np
import pytest

from osm_replication_rust_ray.stages.adpcm import (
    BLOCK_ALIGN,
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    SAMPLES_PER_BLOCK,
    adpcm_decode_blocks,
    adpcm_encode_blocks,
    encode_wav_adpcm,
    pcm_from_adpcm_data,
)
from osm_replication_rust_ray.stages.decode import (
    decode_audio,
    decode_wav,
    make_audio_bytes,
)


def _scalar_decode(pred, idx, nibbles):
    """Straight transcription of the published IMA ADPCM decode loop
    (the spec reference the vectorized kernel must match)."""
    out = [pred]
    for n in nibbles:
        step = int(IMA_STEP_TABLE[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[n & 7])))
        out.append(pred)
    return np.array(out, np.int16)


def test_kernel_matches_scalar_reference():
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, (6, SAMPLES_PER_BLOCK)).astype(
        np.int32
    )
    idx0 = rng.integers(0, 89, 6).astype(np.int32)
    nib = adpcm_encode_blocks(samples, idx0)
    got = adpcm_decode_blocks(samples[:, 0], idx0, nib)
    for b in range(6):
        want = _scalar_decode(
            int(samples[b, 0]), int(idx0[b]), nib[b].tolist()
        )
        assert np.array_equal(got[b], want), b


def test_snr_on_tonal_content():
    """ADPCM is lossy; on the gate corpus (tone + light noise) the SNR
    floor is ~27 dB — assert clear of the gate's 25 dB bar and of a
    sanity ceiling."""
    for i in range(20):
        want = 3000 + (i % 5) * 512
        pcm = np.frombuffer(make_audio_bytes(i, want), "<i2")
        out = decode_audio(encode_wav_adpcm(pcm), "wav")
        assert len(out) == want
        err = (out.astype(np.float64) - pcm) ** 2
        sig = (pcm.astype(np.float64) ** 2).mean()
        snr = 10 * np.log10(sig / err.mean())
        assert 25.0 <= snr <= 60.0, (i, snr)


def test_container_structure_and_size():
    for n in (1, 10, 504, 505, 506, 2048, 4096):
        pcm = np.zeros(n, np.int16)
        pcm[::3] = 1000
        buf = encode_wav_adpcm(pcm, sample_rate=8000)
        nb = -(-n // SAMPLES_PER_BLOCK)
        assert len(buf) == 60 + nb * BLOCK_ALIGN, n
        assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
        out = decode_wav(buf)
        assert len(out) == n
        # fmt fields
        tag, channels = struct.unpack_from("<HH", buf, 20)
        assert tag == 0x11 and channels == 1


def test_constant_and_step_content_near_exact():
    """A constant signal decodes to within the minimum step size, and
    a slow ramp tracks tightly."""
    pcm = np.full(1000, 12345, np.int16)
    out = decode_audio(encode_wav_adpcm(pcm), "wav")
    assert np.abs(out.astype(np.int32) - 12345).max() <= 8
    ramp = np.clip(np.arange(2000) * 3 - 3000, -32768, 32767).astype(np.int16)
    out = decode_audio(encode_wav_adpcm(ramp), "wav")
    assert np.abs(out.astype(np.int32) - ramp).max() <= 16


def test_malformed_streams_raise():
    pcm = np.frombuffer(make_audio_bytes(1, 1024), "<i2")
    buf = bytearray(encode_wav_adpcm(pcm))
    with pytest.raises(ValueError):
        decode_wav(bytes(buf[:30]))
    # fact count larger than decodable samples
    bad = bytearray(buf)
    struct.pack_into("<I", bad, 48, 10**6)
    with pytest.raises(ValueError, match="fact"):
        decode_wav(bytes(bad))
    # non-standard block align -> explicit gate
    bad = bytearray(buf)
    struct.pack_into("<H", bad, 32, 512)
    with pytest.raises(NotImplementedError, match="block align"):
        decode_wav(bytes(bad))
    # stereo ADPCM -> explicit gate
    bad = bytearray(buf)
    struct.pack_into("<H", bad, 22, 2)
    with pytest.raises(NotImplementedError, match="mono"):
        decode_wav(bytes(bad))
    # corrupt header step index in the first block
    bad = bytearray(buf)
    bad[60 + 2] = 200
    with pytest.raises(ValueError, match="index"):
        decode_wav(bytes(bad))
    # raw data length not block-aligned
    with pytest.raises(ValueError, match="multiple"):
        pcm_from_adpcm_data(b"\x00" * 100, 10)


def test_pcm_paths_unaffected():
    """The PCM-16 branch of decode_wav still works after the ADPCM
    dispatch was added (interop with stdlib wave is pinned in
    test_decode.py; this is the regression guard here)."""
    from osm_replication_rust_ray.stages.decode import encode_wav

    pcm = np.frombuffer(make_audio_bytes(2, 2048), "<i2")
    assert np.array_equal(decode_wav(encode_wav(pcm)), pcm)
