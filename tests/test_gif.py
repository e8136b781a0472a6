"""GIF codec tests (stages/gif.py): spec-literal golden, LZW width-sync
corners (the giflib `>` bump rule, KwKwK, 4096-entry table reset),
interlace, animation, palette edges, and malformed-stream hardening."""

import struct

import numpy as np
import pytest

from osm_replication_rust_ray.stages.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_frames,
    posterize216,
)


def _rand_img(rng, h, w):
    return posterize216(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_spec_literal_golden():
    """Hand-built 2x2 stream straight from the GIF89a spec: LZW codes
    computed by hand (clear, 1, 1, 0, 0-at-width-4, eoi) and packed
    LSB-first.  Pins the wire format independent of our encoder."""
    buf = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0xF0, 0, 0)
        + bytes([0, 0, 0, 255, 255, 255])  # palette: black, white
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])  # LZW min code size
        + bytes([3, 0x4C, 0x00, 0x05, 0])  # one 3-byte sub-block
        + b"\x3b"
    )
    img = decode_gif(buf)
    expect = np.array(
        [[[255, 255, 255], [255, 255, 255]], [[0, 0, 0], [0, 0, 0]]],
        np.uint8,
    )
    assert np.array_equal(img, expect)
    # our encoder's palette order (sorted packed RGB) matches the
    # hand-built table, so the encode must be byte-identical
    assert encode_gif(expect) == buf


def test_roundtrip_sizes_and_interlace():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (2, 2), (3, 1), (7, 5), (16, 16), (33, 31), (64, 64)]:
        for interlace in (False, True):
            img = _rand_img(rng, h, w)
            assert np.array_equal(
                decode_gif(encode_gif(img, interlace=interlace)), img
            ), (h, w, interlace)


def test_palette_size_edges():
    rng = np.random.default_rng(11)
    for ncol in (1, 2, 3, 4, 5, 17, 128, 255, 256):
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (20, 20))]
        assert np.array_equal(decode_gif(encode_gif(img)), img), ncol


def test_truecolor_refused():
    grad = np.arange(2048, dtype=np.uint32)
    img = (
        np.stack([(grad >> 4) & 255, grad & 255, grad * 0], axis=1)
        .astype(np.uint8)
        .reshape(32, 64, 3)
    )
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(img)
    assert len(np.unique(posterize216(img).reshape(-1, 3), axis=0)) <= 216
    assert np.array_equal(
        decode_gif(encode_gif(posterize216(img))), posterize216(img)
    )


def test_posterize216_matches_sql_expression():
    v = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        posterize216(v.reshape(1, -1, 1).repeat(3, 2)).reshape(-1, 3)[:, 0],
        ((v.astype(np.int64) // 43) * 51).astype(np.uint8),
    )


def test_kwkwk_and_run_content():
    # alternating two-pixel runs force the decoder's code == next_code
    # special case repeatedly
    img = np.zeros((1, 64, 3), np.uint8)
    img[0, ::2] = 51
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    # long constant run (deep prefix chains)
    img = np.full((4, 4096, 3), 102, np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_table_cap_reset():
    # 300x300 posterized noise emits far more than 4096 codes -> at
    # least one mid-stream CLEAR + table reset on both sides
    rng = np.random.default_rng(3)
    img = _rand_img(rng, 300, 300)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    assert np.array_equal(
        decode_gif(encode_gif(img, interlace=True)), img
    )


def test_animation_roundtrip():
    rng = np.random.default_rng(5)
    frames = [_rand_img(rng, 24, 18) for _ in range(5)]
    buf = encode_gif_frames(frames, delay_cs=10, loop=3)
    back = decode_gif_frames(buf)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    # first-frame decode of an animation works too
    assert np.array_equal(decode_gif(buf), frames[0])


def test_gif87a_and_local_color_table():
    """Foreign-stream features our encoder never emits: GIF87a magic
    and a local color table overriding the global one."""
    data = encode_gif(np.full((2, 3, 3), 51, np.uint8))
    buf87 = b"GIF87a" + data[6:]
    assert np.array_equal(decode_gif(buf87), np.full((2, 3, 3), 51))
    # hand-build: global table says red, local table says blue
    stream = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 1, 0xF0, 0, 0)
        + bytes([255, 0, 0, 0, 0, 0])  # global: red, black
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0x80)  # LCT flag
        + bytes([0, 0, 255, 0, 0, 0])  # local: blue, black
        + bytes([2])
        + bytes([2, 0x04, 0x0A, 0])  # clear,0,0,eoi hand-packed
        + b"\x3b"
    )
    img = decode_gif(stream)
    assert np.array_equal(img, [[[0, 0, 255], [0, 0, 255]]])


def test_extensions_skipped_and_trailing_garbage_rejected():
    img = np.full((3, 3, 3), 204, np.uint8)
    data = encode_gif(img)
    # inject a comment extension between LSD+GCT and the image
    head, rest = data[:19], data[19:]
    commented = head + b"\x21\xfe\x05hello\x00" + rest
    assert np.array_equal(decode_gif(commented), img)
    with pytest.raises(ValueError):
        decode_gif_frames(data[:-1] + b"\x00\x3b")  # bogus block tag


def test_malformed_streams_raise_cleanly():
    rng = np.random.default_rng(13)
    img = _rand_img(rng, 16, 16)
    data = bytearray(encode_gif(img))
    # truncations anywhere must raise ValueError, never crash oddly
    # (except stripping only the trailer, which decoders tolerate —
    # the single frame is already complete at that point)
    for cut in range(0, len(data) - 1, 7):
        with pytest.raises(ValueError):
            decode_gif(bytes(data[:cut]))
    assert np.array_equal(decode_gif(bytes(data[:-1])), img)
    # magic corruption
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"JIF89a" + bytes(data[6:]))
    # structural byte flips: acceptable outcomes are a clean error or
    # a decode (GIF has no checksum, so an in-range palette-index flip
    # can legitimately decode to different pixels)
    for pos in range(6, min(len(data), 80)):
        tampered = bytearray(data)
        tampered[pos] ^= 0xFF
        try:
            decode_gif(bytes(tampered))
        except (ValueError, NotImplementedError):
            pass


def test_partial_canvas_and_transparency_gated():
    # frame rect smaller than the screen -> explicit gate
    img = np.full((2, 2, 3), 51, np.uint8)
    data = bytearray(encode_gif(img))
    # widen the logical screen to 3x3 so the 2x2 frame is partial
    struct.pack_into("<HH", data, 6, 3, 3)
    with pytest.raises((NotImplementedError, ValueError)):
        decode_gif(bytes(data))
    # GCE with transparency flag -> explicit gate
    head, rest = bytes(encode_gif(img)[:19]), bytes(encode_gif(img)[19:])
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="transparency"):
        decode_gif(head + gce + rest)
