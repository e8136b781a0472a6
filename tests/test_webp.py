"""WebP VP8L lossless codec (stages/webp.py): bit-exact roundtrips,
LZ77/prefix-code machinery, package-merge optimality bounds, color
cache decode via a hand-built stream, and the explicit feature gates."""
import struct

import numpy as np
import pytest

import osm_replication_rust_ray.stages.webp as W
from osm_replication_rust_ray.stages.webp import (
    decode_vp8l,
    decode_webp,
    encode_vp8l,
    encode_webp,
)


def _rgba(img):
    if img.shape[2] == 4:
        return img
    return np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])


def test_roundtrip_shapes_and_channels():
    rng = np.random.default_rng(2)
    for shape in [(1, 1, 3), (3, 7, 3), (16, 16, 3), (64, 64, 3),
                  (17, 9, 4), (33, 2, 3), (2, 33, 4)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        buf = encode_webp(img)
        assert buf[:4] == b"RIFF" and buf[8:16] == b"WEBPVP8L"
        assert np.array_equal(decode_webp(buf), _rgba(img)), shape


def test_roundtrip_fuzz():
    rng = np.random.default_rng(7)
    for t in range(30):
        sh = (int(rng.integers(1, 40)), int(rng.integers(1, 40)),
              int(rng.choice([3, 4])))
        img = rng.integers(0, 256, sh).astype(np.uint8)
        if rng.random() < 0.5:
            img[..., :3] = img[..., :1]  # correlated channels
        if rng.random() < 0.3 and sh[0] % 2 == 0:
            img[::2] = img[1::2]  # row repetition -> LZ77 back-refs
        assert np.array_equal(decode_webp(encode_webp(img)), _rgba(img)), t


def test_lz77_compresses_repetition():
    rng = np.random.default_rng(3)
    tile = np.tile(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8), (8, 8, 1))
    buf = encode_webp(tile)
    assert len(buf) < tile.nbytes // 4
    assert np.array_equal(decode_webp(buf)[..., :3], tile)
    const = np.full((32, 32, 3), 77, np.uint8)
    assert len(encode_webp(const)) < 64


def test_subtract_green_helps_correlated_channels():
    x = np.linspace(0, 255, 64).astype(np.uint8)
    g = np.dstack([np.tile(x, (64, 1))] * 3)
    with_t = encode_vp8l(g, subtract_green=True)
    without = encode_vp8l(g, subtract_green=False)
    assert np.array_equal(decode_vp8l(with_t)[..., :3], g)
    assert np.array_equal(decode_vp8l(without)[..., :3], g)
    assert len(with_t) < len(without)


def test_package_merge_is_valid_and_near_entropy():
    rng = np.random.RandomState(0)
    freqs = {s: int(f) for s, f in enumerate(rng.zipf(1.5, 300)[:300]) if f}
    lens = W._package_merge(freqs, limit=15)
    assert max(lens.values()) <= 15
    # Kraft sum exactly <= 1 and code constructible
    W._canonical_codes(lens)
    total = sum(freqs.values())
    cost = sum(freqs[s] * l for s, l in lens.items())
    ent = -sum(
        f / total * np.log2(f / total) for f in freqs.values()
    ) * total
    assert cost <= ent * 1.1 + 2 * len(freqs)  # near-optimal


def test_prefix_value_coding_roundtrip():
    bw = W._LsbWriter()
    vals = [1, 2, 3, 4, 5, 7, 8, 9, 13, 100, 4096, 65536]
    for v in vals:
        code, extra, nbits = W._prefix_encode(v)
        assert code < 40 or v > 1 << 20
        bw.write(extra, nbits)
    br = W._LsbReader(bw.tobytes())
    for v in vals:
        code, _e, _n = W._prefix_encode(v)
        assert W._prefix_decode(code, br) == v


def test_color_cache_decode_hand_built_stream():
    """The encoder never emits cache symbols; pin the decoder's cache
    path with a hand-built stream: literal red pixel, then a cache hit
    for the same pixel."""
    bw = W._LsbWriter()
    bw.write(0x2F, 8)
    bw.write(1, 14)  # w-1 -> 2 wide
    bw.write(0, 14)  # h-1 -> 1 tall
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(4, 4)  # 16 entries
    bw.write(0, 1)  # no meta codes
    pixel = (255 << 24) | (200 << 16) | (10 << 8) | 30
    idx = int((np.uint32(pixel) * W._CACHE_MUL) >> np.uint32(28))
    # green code: simple, 2 symbols: literal green 10 and cache idx sym
    cache_sym = 256 + 24 + idx
    assert cache_sym >= 256  # needs the normal-code form (>= 256)
    lens = {10: 1, cache_sym: 1}
    W._write_prefix_code(bw, lens, 256 + 24 + 16)
    for sym in (200, 30, 255):  # r, b, a: single-symbol simple codes
        W._write_prefix_code(bw, {sym: 1}, 256)
    W._write_prefix_code(bw, {0: 1}, 40)  # distance: unused
    codes = W._canonical_codes(lens)
    c, ln = codes[10]
    bw.write_code(c, ln)  # literal pixel (r/b/a cost 0 bits)
    c, ln = codes[cache_sym]
    bw.write_code(c, ln)  # cache hit
    out = decode_vp8l(bw.tobytes())
    assert out.shape == (1, 2, 4)
    assert np.array_equal(out[0, 0], out[0, 1])
    assert tuple(out[0, 0]) == (200, 10, 30, 255)


def test_gates_and_errors():
    img = np.zeros((2, 2, 3), np.uint8)
    buf = bytearray(encode_webp(img))
    with pytest.raises(ValueError, match="WebP"):
        decode_webp(b"RIFFxxxxNOPE" + bytes(buf[12:]))
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(
            buf[:12] + b"VP8 " + struct.pack("<I", 4) + b"\0\0\0\0"
        )
    # a predictor-transform stream is gated, not misdecoded
    bw = W._LsbWriter()
    bw.write(0x2F, 8)
    bw.write(0, 14)
    bw.write(0, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_vp8l(bw.tobytes())
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00\x00\x00")


def test_decode_image_dispatch_webp():
    from osm_replication_rust_ray.stages.decode import decode_image

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 32, 3)).astype(np.uint8)
    buf = encode_webp(img)
    out = decode_image(buf, 32, 16, "webp")
    assert out.shape == (16, 32, 3)  # opaque alpha dropped
    assert np.array_equal(out, img)
    with pytest.raises(ValueError, match="decoded"):
        decode_image(buf, 16, 32, "webp")
