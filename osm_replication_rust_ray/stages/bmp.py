"""Real BMP codec (24-bit BI_RGB), stdlib struct + numpy only.

Windows-V3 bitmaps: 14-byte BITMAPFILEHEADER + 40-byte
BITMAPINFOHEADER, uncompressed 24-bit pixels stored bottom-up in BGR
order with each row padded to a 4-byte boundary.  Both directions are
whole-image numpy ops (byte reversal + row flip + pad); no per-pixel
Python.  Extends the real-codec matrix (raw/rle/png/jpeg/bmp/tiff)
that `stages/decode.py:decode_image` dispatches on — no reference
analogue (the reference has no image payloads); this is part of the
north-star's multimodal surface.

Unsupported on purpose (explicit errors, not silent wrong pixels):
palette BMPs (bit counts 1/4/8), 16/32-bit, RLE compression
(BI_RLE4/8), top-down images (negative height), and V4/V5 headers are
accepted only insofar as the extra header bytes are skipped via the
pixel-data offset.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB bottom-up BMP bytes."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_bmp needs (h, w, 3) RGB, got {img.shape}")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    # RGB -> BGR, bottom-up row order, zero pad bytes
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    pixels = rows.tobytes()
    offset = _FILE_HDR.size + _INFO_HDR.size
    file_hdr = _FILE_HDR.pack(b"BM", offset + len(pixels), 0, 0, offset)
    info_hdr = _INFO_HDR.pack(
        _INFO_HDR.size, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + pixels


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB."""
    if len(buf) < _FILE_HDR.size + _INFO_HDR.size:
        raise ValueError("truncated BMP header")
    magic, _fsize, _r1, _r2, offset = _FILE_HDR.unpack_from(buf, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (hdr_size, w, h, planes, bits, comp, _isize, _xp, _yp, _ncol, _nimp) = (
        _INFO_HDR.unpack_from(buf, _FILE_HDR.size)
    )
    if hdr_size < _INFO_HDR.size:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or bits != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB supported (planes={planes}, "
            f"bits={bits}, compression={comp})"
        )
    if h <= 0 or w <= 0:
        raise NotImplementedError("top-down / degenerate BMP not supported")
    if offset < _FILE_HDR.size + hdr_size:
        raise ValueError(f"BMP pixel offset {offset} inside headers")
    stride = (w * 3 + 3) & ~3
    end = offset + stride * h
    if end > len(buf):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(buf, np.uint8, stride * h, offset).reshape(h, stride)
    # strip padding, bottom-up -> top-down, BGR -> RGB
    return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()
