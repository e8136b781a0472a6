"""Real TIFF codec (uncompressed 8-bit RGB), stdlib struct + numpy.

Baseline TIFF 6.0: byte-order header, one IFD, uncompressed
(Compression=1) chunky RGB strips.  The encoder writes little-endian
single-strip files; the decoder walks the IFD of either byte order,
handles inline-vs-offset tag values, multiple strips, and rejects
anything it cannot decode bit-exactly (compressed, paletted,
planar-configuration-2, non-8-bit).  Whole-image numpy ops; no
per-pixel Python.  Part of the real-codec matrix
(`stages/decode.py:decode_image`); no reference analogue — the
multimodal surface is the north-star's extension.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 baseline)
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def encode_tiff(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> little-endian single-strip TIFF bytes."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_tiff needs (h, w, 3) RGB, got {img.shape}")
    h, w = img.shape[:2]
    pixels = img.tobytes()
    strip_len = len(pixels)  # StripByteCounts excludes alignment pad
    if strip_len % 2:  # TIFF 6.0: offsets must be word-aligned
        pixels += b"\x00"
    # layout: 8-byte header | pixel strip | BitsPerSample extra | IFD
    strip_off = 8
    bps_off = strip_off + len(pixels)
    ifd_off = bps_off + 6
    entries = [
        (_IMAGE_WIDTH, 4, 1, w),
        (_IMAGE_LENGTH, 4, 1, h),
        (_BITS_PER_SAMPLE, 3, 3, bps_off),  # 3 SHORTs live past 4 bytes
        (_COMPRESSION, 3, 1, 1),
        (_PHOTOMETRIC, 3, 1, 2),  # RGB
        (_STRIP_OFFSETS, 4, 1, strip_off),
        (_SAMPLES_PER_PIXEL, 3, 1, 3),
        (_ROWS_PER_STRIP, 4, 1, h),
        (_STRIP_BYTE_COUNTS, 4, 1, strip_len),
        (_PLANAR_CONFIG, 3, 1, 1),  # chunky
    ]
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += pixels
    out += struct.pack("<3H", 8, 8, 8)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def _read_tag_values(buf: bytes, endian: str, typ: int, count: int,
                     raw: bytes) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None or typ == 5:
        raise NotImplementedError(f"TIFF tag type {typ} not supported")
    total = size * count
    data = raw[:total] if total <= 4 else None
    if data is None:
        (off,) = struct.unpack(endian + "I", raw)
        data = buf[off:off + total]
        if len(data) != total:
            raise ValueError("truncated TIFF tag data")
    fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
    return list(struct.unpack(endian + fmt * count, data))


def decode_tiff(buf: bytes) -> np.ndarray:
    """Uncompressed chunky 8-bit RGB TIFF (II or MM) -> (h, w, 3)."""
    if len(buf) < 8:
        raise ValueError("truncated TIFF header")
    order = buf[:2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        raise ValueError(f"not a TIFF (byte order {order!r})")
    magic, ifd_off = struct.unpack_from(endian + "HI", buf, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    if ifd_off + 2 > len(buf):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(endian + "H", buf, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(buf):
        raise ValueError("truncated TIFF IFD")
    needed = {
        _IMAGE_WIDTH, _IMAGE_LENGTH, _BITS_PER_SAMPLE, _COMPRESSION,
        _PHOTOMETRIC, _STRIP_OFFSETS, _SAMPLES_PER_PIXEL,
        _ROWS_PER_STRIP, _STRIP_BYTE_COUNTS, _PLANAR_CONFIG,
    }
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(endian + "HHI", buf, base)
        if tag not in needed:
            continue  # skip ancillary tags (XResolution etc.) untyped
        tags[tag] = _read_tag_values(
            buf, endian, typ, count, buf[base + 8:base + 12]
        )
    # empty lists (count=0 tags) fall through to the missing-dims error
    w = (tags.get(_IMAGE_WIDTH) or [0])[0]
    h = (tags.get(_IMAGE_LENGTH) or [0])[0]
    if w <= 0 or h <= 0:
        raise ValueError("TIFF missing image dimensions")
    if tags.get(_COMPRESSION, [1])[0] != 1:
        raise NotImplementedError(
            f"TIFF compression {tags[_COMPRESSION][0]} not supported"
        )
    if tags.get(_SAMPLES_PER_PIXEL, [1])[0] != 3:
        raise NotImplementedError("only 3-sample RGB TIFF supported")
    if tags.get(_BITS_PER_SAMPLE, [8, 8, 8]) != [8, 8, 8]:
        raise NotImplementedError("only 8-bit samples supported")
    if tags.get(_PHOTOMETRIC, [2])[0] != 2:
        raise NotImplementedError("only photometric RGB supported")
    if tags.get(_PLANAR_CONFIG, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not supported")
    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_BYTE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    need = w * h * 3
    parts = []
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(buf):
            raise ValueError("truncated TIFF strip")
        parts.append(np.frombuffer(buf, np.uint8, cnt, off))
    flat = parts[0] if len(parts) == 1 else np.concatenate(parts)
    if len(flat) != need:
        raise ValueError(f"TIFF strip bytes {len(flat)} != {need}")
    return flat.reshape(h, w, 3).copy()
