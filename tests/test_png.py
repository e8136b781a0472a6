"""Real PNG codec (stages/png.py): round-trip across all five scanline
filters and all supported colour types, interop with a foreign encoder,
chunk-level error handling, and the decode_image dispatch."""

import base64
import struct
import zlib

import numpy as np
import pytest

from osm_replication_rust_ray.stages.decode import decode_image
from osm_replication_rust_ray.stages.png import decode_png, encode_png

# the canonical 1x1 transparent PNG (produced by a standard encoder —
# interop evidence that chunk layout / IHDR / zlib framing are right)
_ONE_PX = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_roundtrip_all_filters_and_channel_counts():
    rng = np.random.default_rng(4)
    for shape in [(1, 1, 3), (3, 7, 3), (64, 64, 3), (16, 5, 4), (9, 9), (33, 2, 2)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(img, filter_type=ft))
            assert out.shape == img.shape
            assert np.array_equal(out, img), (shape, ft)


def test_compresses_structured_content():
    g = (np.arange(64 * 64 * 3) % 256).astype(np.uint8).reshape(64, 64, 3)
    b = encode_png(g, filter_type=1)
    assert len(b) < g.nbytes // 10
    assert np.array_equal(decode_png(b), g)


def test_foreign_encoder_interop():
    img = decode_png(_ONE_PX)
    assert img.shape == (1, 1, 4)
    assert img.dtype == np.uint8


def test_encode_deterministic():
    img = np.arange(300, dtype=np.uint8).reshape(10, 10, 3)
    assert encode_png(img, 2) == encode_png(img, 2)


def test_ancillary_chunks_skipped():
    img = np.full((4, 4, 3), 7, np.uint8)
    buf = bytearray(encode_png(img))
    # splice a tEXt chunk between IHDR and IDAT (after sig+IHDR = 8+25)
    text = b"Comment\x00hi"
    chunk = (
        struct.pack(">I", len(text))
        + b"tEXt"
        + text
        + struct.pack(">I", zlib.crc32(b"tEXt" + text) & 0xFFFFFFFF)
    )
    spliced = bytes(buf[:33]) + chunk + bytes(buf[33:])
    assert np.array_equal(decode_png(spliced), img)


def test_bad_crc_raises():
    buf = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    buf[-5] ^= 0xFF  # flip a CRC byte of IEND
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(buf))


def test_truncated_raises():
    buf = encode_png(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(buf[:20])


def test_not_png_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png at all")


def test_adam7_roundtrip():
    """Adam7 interlaced encode -> decode is bit-exact for every filter
    type, odd/even dimensions (incl. sizes where whole passes are
    empty) and all channel counts."""
    rng = np.random.default_rng(11)
    for shape in [(1, 1, 3), (2, 3, 3), (7, 5), (8, 8, 4), (9, 10, 3),
                  (3, 1, 2), (16, 16, 3), (33, 17, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for ft in range(5):
            buf = encode_png(img, filter_type=ft, interlace=True)
            out = decode_png(buf)
            assert out.shape == img.shape
            assert np.array_equal(out, img), (shape, ft)
    # interlaced and sequential encodings of the same image decode equal
    img = rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_png(encode_png(img, interlace=True)), decode_png(encode_png(img))
    )


def test_interlace_flag_payload_mismatch_raises():
    """An interlace flag spliced onto a sequential payload must fail
    the Adam7 pass layout check, not decode garbage."""
    img = np.zeros((2, 2, 3), np.uint8)
    buf = bytearray(encode_png(img))
    # IHDR data spans bytes 16..29; interlace flag is the last byte
    buf[28] = 1
    ihdr = bytes(buf[12:29])
    buf[29:33] = struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="Adam7|trailing"):
        decode_png(bytes(buf))


def test_decode_image_dispatch():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 32, 3)).astype(np.uint8)
    buf = encode_png(img, filter_type=4)
    assert np.array_equal(decode_image(buf, 32, 16, "png"), img)
    with pytest.raises(ValueError, match="decoded"):
        decode_image(buf, 16, 32, "png")  # swapped dims must be caught
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", 1, 1, "avif")


def test_palette_png_roundtrip_all_filters_and_interlace():
    from osm_replication_rust_ray.stages.gif import posterize216

    rng = np.random.default_rng(3)
    for shape in [(1, 1, 3), (7, 5, 3), (33, 17, 3)]:
        img = posterize216(rng.integers(0, 256, shape).astype(np.uint8))
        for ft in range(5):
            for il in (False, True):
                out = decode_png(
                    encode_png(img, filter_type=ft, interlace=il,
                               palette=True)
                )
                assert np.array_equal(out, img), (shape, ft, il)


def test_palette_png_error_gates():
    rng = np.random.default_rng(4)
    with pytest.raises(ValueError, match="256"):
        encode_png(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8),
                   palette=True)
    with pytest.raises(ValueError, match="RGB"):
        encode_png(np.zeros((4, 4), np.uint8), palette=True)


def test_palette_png_missing_plte_raises():
    from osm_replication_rust_ray.stages.gif import posterize216

    img = posterize216(
        np.random.default_rng(5).integers(0, 256, (8, 8, 3)).astype(np.uint8)
    )
    buf = bytearray(encode_png(img, palette=True))
    i = bytes(buf).find(b"PLTE")
    (ln,) = struct.unpack_from(">I", buf, i - 4)
    del buf[i - 4 : i - 4 + 12 + ln]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(buf))


def test_palette_png_index_out_of_range_raises():
    from osm_replication_rust_ray.stages.gif import posterize216

    img = posterize216(
        np.random.default_rng(6).integers(0, 256, (8, 8, 3)).astype(np.uint8)
    )
    buf = bytearray(encode_png(img, palette=True))
    i = bytes(buf).find(b"PLTE")
    (ln,) = struct.unpack_from(">I", buf, i - 4)
    # shrink the palette to 1 entry (fix length + CRC)
    data = bytes(buf[i + 4 : i + 4 + 3])
    new = struct.pack(">I", 3) + b"PLTE" + data + struct.pack(
        ">I", zlib.crc32(b"PLTE" + data) & 0xFFFFFFFF
    )
    out = bytes(buf[: i - 4]) + new + bytes(buf[i - 4 + 12 + ln :])
    with pytest.raises(ValueError, match="index out of range"):
        decode_png(out)
