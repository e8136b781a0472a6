"""Real baseline JPEG codec (stages/jpeg.py): round-trip PSNR against
quality levels, lossy-invariant margin on the actual payload content,
marker/stream error gating, and decode_image dispatch."""

import numpy as np
import pytest

from osm_replication_rust_ray.sources.synth import make_image_bytes
from osm_replication_rust_ray.stages.decode import decode_image, decode_raw, psnr_db
from osm_replication_rust_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _smooth(h=64, w=64):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    return np.stack(
        np.meshgrid(x, y) + [np.full((h, w), 128.0)], axis=-1
    ).astype(np.uint8)


def test_smooth_content_psnr_by_quality():
    img = _smooth()
    prev = 0.0
    for q in (50, 75, 90, 95):
        p = psnr_db(decode_jpeg(encode_jpeg(img, q)), img)
        assert p > 35.0, (q, p)
        assert p >= prev - 0.5  # monotone-ish in quality
        prev = p
    assert psnr_db(decode_jpeg(encode_jpeg(img, 95)), img) > 50.0


def test_noise_content_matches_quantization_bound():
    """Worst-case content: the codec's PSNR must track the ideal
    quantize-dequantize bound (~35.8 dB at q95) — a deviation means an
    entropy-coder bug (the zigzag/dequantize mismatch this test pinned
    during development read 14 dB here)."""
    rng = np.random.default_rng(0)
    n = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    p = psnr_db(decode_jpeg(encode_jpeg(n, 95)), n)
    assert 34.0 < p < 38.0, p


def test_q100_near_lossless():
    rng = np.random.default_rng(1)
    n = rng.integers(0, 256, (24, 16, 3)).astype(np.uint8)
    assert psnr_db(decode_jpeg(encode_jpeg(n, 100)), n) > 50.0


def test_odd_sizes_roundtrip_shapes():
    rng = np.random.default_rng(2)
    for shape in [(1, 1, 3), (7, 5, 3), (17, 9, 3), (8, 64, 3), (9, 8, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 95))
        assert out.shape == img.shape


def test_payload_invariant_margin():
    """The gate bar: synthetic payload rows at quality 98 must clear the
    north-star 40 dB lossy invariant with margin."""
    for i in range(24):
        w = (16, 32, 64)[i % 3]
        h = (16, 32, 64)[(i + 1) % 3]
        img = decode_raw(make_image_bytes(i, w, h, 42), w, h)
        p = psnr_db(decode_jpeg(encode_jpeg(img, 98)), img)
        assert p >= 41.0, (i, p)


def test_encode_deterministic():
    img = _smooth(16, 16)
    assert encode_jpeg(img, 90) == encode_jpeg(img, 90)


def test_error_gating():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    img = _smooth(8, 8)
    buf = bytearray(encode_jpeg(img, 90))
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be gated
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(buf))
    # subsampling factor 2x2 must be gated
    buf2 = bytearray(encode_jpeg(img, 90))
    j = bytes(buf2).find(b"\xff\xc0")
    buf2[j + 11] = 0x22  # first component sampling byte
    with pytest.raises(NotImplementedError, match="4:4:4"):
        decode_jpeg(bytes(buf2))
    with pytest.raises(ValueError, match="entropy|truncated"):
        decode_jpeg(bytes(encode_jpeg(img, 90))[:-30])


def test_decode_image_dispatch():
    img = _smooth(16, 32)
    buf = encode_jpeg(img, 95)
    out = decode_image(buf, 32, 16, "jpeg")
    assert out.shape == (16, 32, 3)
    assert psnr_db(out, img) > 40.0
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", 1, 1, "webp")


def test_restart_intervals_roundtrip():
    """DRI + RST0-7 markers: every interval produces EXACTLY the same
    pixels as the marker-free stream (resync discards padding bits and
    resets DC predictors; wrap-around past RST7 exercised at ri=1)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=95))
    for ri in (1, 2, 5, 7, 100):
        buf = encode_jpeg(img, quality=95, restart_interval=ri)
        assert (b"\xff\xdd" in buf) and (b"\xff\xd0" in buf or ri > 35)
        assert np.array_equal(decode_jpeg(buf), base), ri
    # a corrupted restart marker must be caught, not misparsed
    buf = bytearray(encode_jpeg(img, quality=95, restart_interval=2))
    j = bytes(buf).find(b"\xff\xd0")
    buf[j + 1] = 0xD6  # wrong RST index
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(bytes(buf))


def test_16bit_quant_tables_decode():
    """A stream whose DQT segments are rewritten in 16-bit (pq=1) form
    with identical values must decode to identical pixels."""
    import struct

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    buf = bytearray(encode_jpeg(img, quality=95))
    base = decode_jpeg(bytes(buf))
    out = bytearray(buf[:2])
    pos = 2
    while pos + 4 <= len(buf):
        marker = buf[pos + 1]
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        seg = bytes(buf[pos + 4 : pos + 2 + length])
        if marker == 0xDB:
            tq = seg[0] & 0xF
            vals = np.frombuffer(seg[1:65], np.uint8).astype(">u2")
            new = bytes([0x10 | tq]) + vals.tobytes()
            out += b"\xff\xdb" + struct.pack(">H", 2 + len(new)) + new
        else:
            out += buf[pos : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDA:
            out += buf[pos:]
            break
    assert np.array_equal(decode_jpeg(bytes(out)), base)
