"""QOI codec (stages/qoi.py): roundtrips, full-spec decode paths,
malformed-stream hardening."""

import struct

import numpy as np
import pytest

from osm_replication_rust_ray.stages.qoi import (
    _decode_scalar,
    decode_qoi,
    encode_qoi,
)


def _header(w, h, channels=3):
    return b"qoif" + struct.pack(">IIBB", w, h, channels, 0)


_END = b"\x00" * 7 + b"\x01"


def _stream(w, h, ops, channels=3):
    return _header(w, h, channels) + bytes(ops) + _END


def test_roundtrip_noise_runs_gradients():
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 256, (64, 64, 3), np.uint8),
        np.full((7, 95, 3), 200, np.uint8),
        np.dstack([(np.arange(31 * 13) % 256).astype(np.uint8)
                   .reshape(13, 31)] * 3),
        np.tile(rng.integers(0, 256, (3, 5, 3), np.uint8), (11, 7, 1)),
    ]
    for img in imgs:
        assert np.array_equal(decode_qoi(encode_qoi(img)), img)


def test_run_longer_than_62_chunks():
    img = np.full((1, 200, 3), 9, np.uint8)
    buf = encode_qoi(img)
    # first pixel can't be a run of prev=(0,0,0): expect RGB/LUMA then
    # ceil(199/62)=4 RUN chunks
    assert np.array_equal(decode_qoi(buf), img)
    stream = buf[14:-8]
    assert sum(1 for b in stream if b >> 6 == 3 and b not in (0xFE, 0xFF)) == 4


def test_fuzz_roundtrip():
    rng = np.random.default_rng(2)
    for t in range(120):
        h, w = rng.integers(1, 48, 2)
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        if t % 3 == 0:
            img[: h // 2] = img[0, 0]
        if t % 4 == 1:
            img = (img // 32) * 32
        assert np.array_equal(decode_qoi(encode_qoi(img)), img)


def test_scalar_path_matches_vectorized_on_index_free_stream():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23, 3), np.uint8)
    buf = encode_qoi(img)
    stream = np.frombuffer(buf, np.uint8)[14:-8]
    assert np.array_equal(_decode_scalar(stream, 23, 17, 3), img)


def test_index_op_stream():
    # RGB(10,20,30) | RGB(40,50,60) | INDEX[hash(10,20,30,255)]
    h1 = (3 * 10 + 5 * 20 + 7 * 30 + 11 * 255) % 64
    buf = _stream(3, 1, [0xFE, 10, 20, 30, 0xFE, 40, 50, 60, h1])
    out = decode_qoi(buf)
    assert out.tolist() == [[[10, 20, 30], [40, 50, 60], [10, 20, 30]]]


def test_index_then_run_and_diff():
    # px0 RGB(100,100,100); px1 DIFF(+1,+1,+1); px2 INDEX back to px0;
    # px3-4 RUN(2)
    h0 = (3 * 100 + 5 * 100 + 7 * 100 + 11 * 255) % 64
    diff = 0x40 | (3 << 4) | (3 << 2) | 3  # +1 each
    buf = _stream(5, 1, [0xFE, 100, 100, 100, diff, h0, 0xC0 | 1])
    out = decode_qoi(buf)
    assert out.tolist() == [[[100, 100, 100], [101, 101, 101],
                             [100, 100, 100], [100, 100, 100],
                             [100, 100, 100]]]


def test_rgba_alpha_tracking():
    # channels=4: alpha defaults 255, RGBA changes it mid-stream
    buf = _stream(3, 1, [0xFE, 1, 2, 3, 0xFF, 4, 5, 6, 128, 0xC0 | 0],
                  channels=4)
    out = decode_qoi(buf)
    assert out.tolist() == [[[1, 2, 3, 255], [4, 5, 6, 128],
                             [4, 5, 6, 128]]]


def test_luma_wraparound():
    # LUMA from (0,0,0): dg=-32 wraps to 224
    luma = [0x80 | 0, (8 << 4) | 8]  # dg=-32, dr-dg=0, db-dg=0
    buf = _stream(1, 1, luma)
    assert decode_qoi(buf).tolist() == [[[224, 224, 224]]]


@pytest.mark.parametrize("mutate", [
    lambda b: b[:3] + b"X" + b[4:],             # bad magic
    lambda b: b[:-8] + b"\x00" * 8,             # bad end marker
    lambda b: b[:-9] + b[-8:],                  # truncated op stream
    lambda b: b[:14] + b"\xc0" + b[14:],        # extra run overruns
])
def test_malformed_streams_raise(mutate):
    img = np.random.default_rng(4).integers(0, 256, (8, 8, 3), np.uint8)
    buf = mutate(encode_qoi(img))
    with pytest.raises(ValueError):
        decode_qoi(buf)


def test_pixel_count_mismatch_raises():
    # one RGB op but a 2-pixel header
    buf = _stream(2, 1, [0xFE, 1, 2, 3])
    with pytest.raises(ValueError):
        decode_qoi(buf)
