"""Real BMP/TIFF codecs: round-trips (incl. row-padding widths),
independently hand-packed foreign files (interop + big-endian TIFF +
multi-strip TIFF), error gates, and decode_image dispatch."""

import struct

import numpy as np
import pytest

from osm_replication_rust_ray.stages.bmp import decode_bmp, encode_bmp
from osm_replication_rust_ray.stages.decode import decode_image
from osm_replication_rust_ray.stages.tiff import decode_tiff, encode_tiff


def _rand(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)).astype(np.uint8)


# ---------------------------------------------------------------- BMP

def test_bmp_roundtrip_padding_widths():
    # stride padding kicks in at w % 4 != 0 (w*3 % 4 varies with w)
    for h, w in [(1, 1), (3, 2), (5, 3), (7, 5), (16, 16), (9, 31)]:
        img = _rand(h, w, seed=h * 100 + w)
        out = decode_bmp(encode_bmp(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img), (h, w)


def test_bmp_foreign_file_interop():
    # hand-packed independently of encode_bmp: 2x2 bottom-up BGR,
    # stride 8 (2*3 -> pad to 8).  Bottom row first: (B,G,R)...
    top = [(255, 0, 0), (0, 255, 0)]     # RGB: red, green
    bottom = [(0, 0, 255), (17, 34, 51)]  # RGB: blue, misc
    def row(px):
        b = b"".join(bytes([c[2], c[1], c[0]]) for c in px)
        return b + b"\x00" * (8 - len(b))
    pixels = row(bottom) + row(top)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                       len(pixels), 0, 0, 0, 0)
    img = decode_bmp(hdr + info + pixels)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [17, 34, 51]


def test_bmp_gates():
    img = _rand(4, 4)
    buf = encode_bmp(img)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + buf[2:])
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        decode_bmp(buf[:-5])
    # 32-bit flag -> explicit unsupported, not wrong pixels
    bad = bytearray(buf)
    struct.pack_into("<H", bad, 14 + 14, 32)  # bits field in info hdr
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad))


def test_bmp_encode_deterministic():
    img = _rand(8, 5, seed=3)
    assert encode_bmp(img) == encode_bmp(img)


# --------------------------------------------------------------- TIFF

def test_tiff_roundtrip():
    for h, w in [(1, 1), (3, 2), (16, 16), (9, 31), (33, 7)]:
        img = _rand(h, w, seed=h * 7 + w)
        out = decode_tiff(encode_tiff(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img), (h, w)


def _pack_tiff(endian, strips, w, h, extra_tags=()):
    """Hand-packed TIFF, independent of encode_tiff: strips laid out
    after the header, IFD (with offset-stored BitsPerSample) last."""
    e = endian
    data = bytearray(b"\x00" * 8)
    offsets, counts = [], []
    for s in strips:
        offsets.append(len(data))
        counts.append(len(s))
        data += s
    bps_off = len(data)
    data += struct.pack(e + "3H", 8, 8, 8)
    def arr_tag(tag, typ, values):
        fmt = {3: "H", 4: "I"}[typ]
        if len(values) == 1:
            raw = struct.pack(e + fmt, values[0])
            return (tag, typ, 1, raw + b"\x00" * (4 - len(raw)))
        off = len(data)
        data.extend(struct.pack(e + fmt * len(values), *values))
        return (tag, typ, len(values), struct.pack(e + "I", off))
    entries = [
        arr_tag(256, 4, [w]), arr_tag(257, 4, [h]),
        (258, 3, 3, struct.pack(e + "I", bps_off)),
        arr_tag(259, 3, [1]), arr_tag(262, 3, [2]),
        arr_tag(273, 4, offsets), arr_tag(277, 3, [3]),
        arr_tag(278, 4, [max(1, h // max(1, len(strips)))]),
        arr_tag(279, 4, counts), arr_tag(284, 3, [1]),
    ] + list(extra_tags)
    entries.sort(key=lambda t: t[0])
    ifd_off = len(data)
    data += struct.pack(e + "H", len(entries))
    for tag, typ, count, raw in entries:
        data += struct.pack(e + "HHI", tag, typ, count) + raw
    data += struct.pack(e + "I", 0)
    order = b"II" if e == "<" else b"MM"
    data[0:8] = struct.pack(e + "2sHI", order, 42, ifd_off)
    return bytes(data)


def test_tiff_big_endian_and_multistrip():
    img = _rand(6, 5, seed=11)
    flat = img.tobytes()
    half = len(flat) // 2  # 6 rows -> two 3-row strips
    for endian in ("<", ">"):
        buf = _pack_tiff(endian, [flat[:half], flat[half:]], 5, 6)
        out = decode_tiff(buf)
        assert np.array_equal(out, img), endian


def test_tiff_gates():
    img = _rand(4, 4)
    buf = encode_tiff(img)
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX" + buf[2:])
    flat = img.tobytes()
    lzw = _pack_tiff("<", [flat], 4, 4,
                     extra_tags=())
    # rewrite compression tag via a fresh pack with compression=5
    lzw = bytearray(lzw)
    # find the compression entry (tag 259) in the IFD and patch value
    (n,) = struct.unpack_from("<H", lzw, struct.unpack_from("<I", lzw, 4)[0])
    ifd = struct.unpack_from("<I", lzw, 4)[0]
    for i in range(n):
        base = ifd + 2 + 12 * i
        tag = struct.unpack_from("<H", lzw, base)[0]
        if tag == 259:
            # 32946 (Deflate) is still gated; 5 (LZW) and 32773
            # (PackBits) are real codecs now
            struct.pack_into("<H", lzw, base + 8, 32946)
    with pytest.raises(NotImplementedError, match="compression 32946"):
        decode_tiff(bytes(lzw))
    with pytest.raises(ValueError, match="truncated TIFF"):
        decode_tiff(buf[: len(buf) // 2])


def test_tiff_ancillary_rational_tags_skipped():
    # foreign files carry XResolution/YResolution (type 5 RATIONAL);
    # decode must skip tags it does not use, not die on their type
    img = _rand(5, 4, seed=9)
    xres = (282, 5, 1, struct.pack("<I", 8))  # offset points at pixels; unread
    buf = _pack_tiff("<", [img.tobytes()], 4, 5, extra_tags=[xres])
    assert np.array_equal(decode_tiff(buf), img)


def test_tiff_encode_word_aligned_offsets():
    # odd pixel-byte counts must not produce odd bps/IFD offsets
    img = _rand(1, 3, seed=2)  # 9 pixel bytes
    buf = encode_tiff(img)
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    assert ifd_off % 2 == 0
    assert np.array_equal(decode_tiff(buf), img)


def test_tiff_zero_count_dim_tag():
    img = _rand(4, 4)
    buf = bytearray(encode_tiff(img))
    (ifd,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd)
    for i in range(n):
        base = ifd + 2 + 12 * i
        if struct.unpack_from("<H", buf, base)[0] == 256:  # ImageWidth
            struct.pack_into("<I", buf, base + 4, 0)  # count = 0
    with pytest.raises(ValueError, match="missing image dimensions"):
        decode_tiff(bytes(buf))


def test_bmp_pixel_offset_inside_headers_rejected():
    img = _rand(2, 2)
    buf = bytearray(encode_bmp(img))
    struct.pack_into("<I", buf, 10, 2)  # offset field -> inside headers
    with pytest.raises(ValueError, match="inside headers"):
        decode_bmp(bytes(buf))


def test_tiff_encode_deterministic():
    img = _rand(8, 5, seed=3)
    assert encode_tiff(img) == encode_tiff(img)


# ----------------------------------------------------- dispatch layer

def test_decode_image_dispatch():
    img = _rand(12, 9, seed=5)
    assert np.array_equal(decode_image(encode_bmp(img), 9, 12, "bmp"), img)
    assert np.array_equal(decode_image(encode_tiff(img), 9, 12, "tiff"), img)
    with pytest.raises(ValueError, match="bmp decoded"):
        decode_image(encode_bmp(img), 9, 13, "bmp")
    with pytest.raises(NotImplementedError):
        decode_image(b"", 1, 1, "avif")


# -------------------------------------------- TIFF compression modes

def test_tiff_lzw_roundtrip_and_table_reset():
    """LZW roundtrips bit-exact, including a stream long enough to
    force the 4094-entry table reset, and actually compresses
    repetitive content."""
    from osm_replication_rust_ray.stages.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    img = _rand(200, 200, seed=11)  # random: forces table resets
    assert np.array_equal(decode_tiff(encode_tiff(img, "lzw")), img)
    tiled = np.tile(_rand(8, 8, seed=2), (16, 16, 1))
    buf = encode_tiff(tiled, "lzw")
    assert np.array_equal(decode_tiff(buf), tiled)
    assert len(buf) < tiled.nbytes * 0.25
    flat = bytes(120000)  # constant -> near-max compression
    enc = _lzw_encode_tiff(flat)
    assert _lzw_decode_tiff(enc, len(flat)) == flat
    assert len(enc) < len(flat) * 0.01


def test_tiff_lzw_early_change_boundary():
    """A stream crossing every width boundary (9->10->11->12) decodes
    bit-exact — the early-change rule is where spec-literal
    implementations historically desynced."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (120, 40, 3)).astype(np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(img, "lzw")), img)


def test_tiff_packbits_roundtrip_and_rows():
    from osm_replication_rust_ray.stages.tiff import (
        _packbits_decode,
        _packbits_encode_row,
    )

    for comp_img in (
        _rand(17, 33, seed=4),
        np.zeros((5, 7, 3), np.uint8),
        np.tile(_rand(1, 4, seed=9), (30, 12, 1)),
    ):
        assert np.array_equal(
            decode_tiff(encode_tiff(comp_img, "packbits")), comp_img
        )
    for row in (
        np.array([], np.uint8),
        np.zeros(1, np.uint8),
        np.zeros(300, np.uint8),          # >128 run splits
        np.arange(256).astype(np.uint8),  # pure literal >128 splits
        np.array([5, 5, 6, 6, 6, 7], np.uint8),  # 2-run stays literal
    ):
        enc = _packbits_encode_row(row)
        assert _packbits_decode(enc, len(row)) == row.tobytes()
    with pytest.raises(ValueError, match="truncated PackBits"):
        _packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError, match="truncated PackBits"):
        _packbits_decode(b"\x00a", 2)  # stream ends before 2nd byte
    with pytest.raises(ValueError, match="PackBits decoded"):
        _packbits_decode(b"\x01ab", 1)  # packet overshoots expected


def test_tiff_compression_fuzz_small_shapes():
    for t in range(60):
        rng = np.random.default_rng(t)
        sh = (int(rng.integers(1, 20)), int(rng.integers(1, 20)), 3)
        img = rng.integers(0, 256, sh).astype(np.uint8)
        for comp in ("lzw", "packbits"):
            assert np.array_equal(
                decode_tiff(encode_tiff(img, comp)), img
            ), (t, comp)


def test_tiff_lzw_tampered_stream_raises():
    img = _rand(9, 9, seed=6)
    buf = bytearray(encode_tiff(img, "lzw"))
    buf[20] ^= 0xFF  # inside the strip
    with pytest.raises(ValueError):
        decode_tiff(bytes(buf))


def test_tiff_unknown_compression_tag_still_gated():
    img = _rand(4, 4, seed=8)
    buf = bytearray(encode_tiff(img))
    ifd = struct.unpack_from("<I", buf, 4)[0]
    n = struct.unpack_from("<H", buf, ifd)[0]
    for i in range(n):
        base = ifd + 2 + 12 * i
        if struct.unpack_from("<H", buf, base)[0] == 259:  # Compression
            struct.pack_into("<I", buf, base + 8, 7)  # JPEG-in-TIFF
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(buf))


# ---------------------------------------------- palette + RLE8 BMP

def _posterized(h, w, seed=0):
    from osm_replication_rust_ray.stages.gif import posterize216

    rng = np.random.default_rng(seed)
    return posterize216(rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


def test_bmp_palette_roundtrip_both_layouts():
    from osm_replication_rust_ray.stages.bmp import encode_bmp_palette

    for h, w in [(1, 1), (7, 5), (33, 17), (10, 300)]:
        img = _posterized(h, w, seed=h * 31 + w)
        for rle in (False, True):
            assert np.array_equal(
                decode_bmp(encode_bmp_palette(img, rle=rle)), img
            ), (h, w, rle)


def test_bmp_rle8_compresses_flat_regions():
    from osm_replication_rust_ray.stages.bmp import encode_bmp_palette

    const = np.full((10, 300, 3), 51, np.uint8)
    b_rle = encode_bmp_palette(const, rle=True)
    b_flat = encode_bmp_palette(const)
    assert np.array_equal(decode_bmp(b_rle), const)
    assert len(b_rle) < len(b_flat) * 0.1


def test_bmp_rle8_delta_and_eob_escapes():
    """Hand-built stream exercising encoded mode, the delta escape
    (skipped pixels default to index 0) and end-of-bitmap."""
    from osm_replication_rust_ray.stages.bmp import _rle8_decode

    data = bytes([2, 7, 0, 2, 1, 1, 1, 9, 0, 1])
    idx = _rle8_decode(data, 4, 2)
    assert idx.tolist() == [[7, 7, 0, 0], [0, 0, 0, 9]]
    with pytest.raises(ValueError, match="missing end-of-bitmap"):
        _rle8_decode(bytes([1, 5]), 4, 2)
    with pytest.raises(ValueError, match="overflows row"):
        _rle8_decode(bytes([9, 5, 0, 1]), 4, 2)


def test_bmp_palette_error_gates():
    from osm_replication_rust_ray.stages.bmp import encode_bmp_palette

    rng = np.random.default_rng(9)
    with pytest.raises(ValueError, match="256"):
        encode_bmp_palette(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))
    # palette index beyond biClrUsed rejected
    img = _posterized(4, 4, seed=2)
    buf = bytearray(encode_bmp_palette(img))
    struct.pack_into("<I", buf, 14 + 32, 1)  # biClrUsed -> 1
    with pytest.raises(ValueError, match="index out of range"):
        decode_bmp(bytes(buf))


def test_bmp_palette_fuzz():
    from osm_replication_rust_ray.stages.bmp import encode_bmp_palette

    for t in range(60):
        rng = np.random.default_rng(t)
        img = _posterized(int(rng.integers(1, 16)), int(rng.integers(1, 16)),
                          seed=t)
        for rle in (False, True):
            assert np.array_equal(
                decode_bmp(encode_bmp_palette(img, rle=rle)), img
            ), (t, rle)
