"""Real BMP codec (24-bit BI_RGB + 8-bit palette + RLE8), stdlib
struct + numpy only.

Windows-V3 bitmaps: 14-byte BITMAPFILEHEADER + 40-byte
BITMAPINFOHEADER.  Three pixel layouts, both directions:

- 24-bit BI_RGB: uncompressed BGR bottom-up, rows padded to 4 bytes —
  whole-image numpy ops (byte reversal + row flip + pad).
- 8-bit BI_RGB: BGRA-quad palette (deterministic sorted unique
  colours on encode, <= 256 else a clear error) + padded index rows.
- 8-bit BI_RLE8: the Windows run-length layout — encoded-mode
  (count, index) pairs, absolute mode (0, n>=3 literal indices,
  word-aligned), end-of-line (0,0), end-of-bitmap (0,1) and delta
  (0,2,dx,dy) escapes.  Run boundaries are found vectorized per row;
  the packet walks are per-packet loops (reference-grade scope, same
  documented posture as the GIF/TIFF entropy coders).

Extends the real-codec matrix (raw/rle/png/jpeg/bmp/tiff/gif/webp)
that `stages/decode.py:decode_image` dispatches on — no reference
analogue (the reference has no image payloads); this is part of the
north-star's multimodal surface.

Unsupported on purpose (explicit errors, not silent wrong pixels):
1/4-bit palettes, 16/32-bit, BI_RLE4, top-down images (negative
height); V4/V5 headers are accepted only insofar as the extra header
bytes are skipped via the pixel-data offset.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")

_BI_RGB = 0
_BI_RLE8 = 1


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


def _palette_indices(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) -> (sorted palette (n, 3) RGB, (h, w) uint8 index
    plane); errors above 256 colours (callers quantize first)."""
    h, w, _ = img.shape
    packed = (
        img[:, :, 0].astype(np.uint32) << 16
    ) | (img[:, :, 1].astype(np.uint32) << 8) | img[:, :, 2]
    colors, idx = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"palette BMP needs <= 256 colours, image has {len(colors)}"
        )
    pal = np.empty((len(colors), 3), np.uint8)
    pal[:, 0] = (colors >> 16) & 0xFF
    pal[:, 1] = (colors >> 8) & 0xFF
    pal[:, 2] = colors & 0xFF
    return pal, idx.reshape(h, w).astype(np.uint8)


def _rle8_encode_row(row: np.ndarray) -> bytes:
    """One index row -> RLE8 packets: runs >= 3 as encoded-mode pairs,
    literal spans >= 3 as absolute mode (word-aligned), shorter
    leftovers as count-1/2 encoded pairs."""
    n = len(row)
    out = bytearray()
    if n == 0:
        return b""
    change = np.flatnonzero(row[1:] != row[:-1])
    starts = np.concatenate(([0], change + 1))
    lengths = np.diff(np.append(starts, n))
    lit_start = None

    def flush_literal(end: int) -> None:
        nonlocal lit_start
        if lit_start is None:
            return
        i = lit_start
        while i < end:
            m = min(255, end - i)
            if m >= 3:
                out.append(0)
                out.append(m)
                out.extend(row[i : i + m].tobytes())
                if m % 2:
                    out.append(0)  # absolute runs are word-aligned
            else:
                for j in range(m):  # 1-2 leftovers: encoded pairs
                    out.append(1)
                    out.append(int(row[i + j]))
            i += m
        lit_start = None

    for s, ln in zip(starts.tolist(), lengths.tolist()):
        if ln >= 3:
            flush_literal(s)
            i = 0
            while i < ln:
                m = min(255, ln - i)
                out.append(m)
                out.append(int(row[s]))
                i += m
        elif lit_start is None:
            lit_start = s
    flush_literal(n)
    return bytes(out)


def encode_bmp_palette(img: np.ndarray, rle: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB with <= 256 unique colours -> 8-bit palette
    BMP bytes (BI_RGB padded index rows, or BI_RLE8 with ``rle``)."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(
            f"encode_bmp_palette needs (h, w, 3) RGB, got {img.shape}"
        )
    h, w = img.shape[:2]
    pal, idx = _palette_indices(img)
    idx_bu = idx[::-1]  # bottom-up row order
    if rle:
        parts = []
        for y in range(h):
            parts.append(_rle8_encode_row(idx_bu[y]))
            parts.append(b"\x00\x00" if y < h - 1 else b"\x00\x01")  # EOL/EOB
        pixels = b"".join(parts)
        comp = _BI_RLE8
    else:
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = idx_bu
        pixels = rows.tobytes()
        comp = _BI_RGB
    quads = np.zeros((len(pal), 4), np.uint8)
    quads[:, 0] = pal[:, 2]  # B
    quads[:, 1] = pal[:, 1]  # G
    quads[:, 2] = pal[:, 0]  # R
    offset = _FILE_HDR.size + _INFO_HDR.size + 4 * len(pal)
    file_hdr = _FILE_HDR.pack(b"BM", offset + len(pixels), 0, 0, offset)
    info_hdr = _INFO_HDR.pack(
        _INFO_HDR.size, w, h, 1, 8, comp, len(pixels), 2835, 2835,
        len(pal), 0,
    )
    return file_hdr + info_hdr + quads.tobytes() + pixels


def _rle8_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """RLE8 packet walk -> (h, w) bottom-up index plane (top row last);
    unreached pixels (delta skips) are 0, per common practice."""
    idx = np.zeros((h, w), np.uint8)
    x = y = 0
    pos = 0
    while pos + 2 <= len(data):
        c0, c1 = data[pos], data[pos + 1]
        pos += 2
        if c0 > 0:  # encoded mode
            if y >= h or x + c0 > w:
                raise ValueError("RLE8 run overflows row")
            idx[y, x : x + c0] = c1
            x += c0
        elif c1 == 0:  # end of line
            x, y = 0, y + 1
        elif c1 == 1:  # end of bitmap
            return idx
        elif c1 == 2:  # delta
            if pos + 2 > len(data):
                raise ValueError("truncated RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise ValueError("RLE8 delta out of bounds")
        else:  # absolute mode: c1 literal indices, word-aligned
            m = c1
            if y >= h or x + m > w:
                raise ValueError("RLE8 absolute run overflows row")
            if pos + m > len(data):
                raise ValueError("truncated RLE8 absolute run")
            idx[y, x : x + m] = np.frombuffer(data, np.uint8, m, pos)
            x += m
            pos += m + (m % 2)
    raise ValueError("RLE8 stream missing end-of-bitmap")


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
    supported = (bits == 24 and comp == _BI_RGB) or (
        bits == 8 and comp in (_BI_RGB, _BI_RLE8)
    )
    if planes != 1 or not supported:
        raise NotImplementedError(
            f"unsupported BMP layout (planes={planes}, "
            f"bits={bits}, compression={comp})"
        )
    if h <= 0 or w <= 0:
        raise NotImplementedError("top-down / degenerate BMP not supported")
    if offset < _FILE_HDR.size + hdr_size:
        raise ValueError(f"BMP pixel offset {offset} inside headers")
    if bits == 8:
        ncol = _ncol or 256
        pal_off = _FILE_HDR.size + hdr_size
        if pal_off + 4 * ncol > min(offset, len(buf)):
            raise ValueError("truncated BMP palette")
        quads = np.frombuffer(buf, np.uint8, 4 * ncol, pal_off).reshape(-1, 4)
        pal = quads[:, 2::-1]  # BGRx -> RGB
        if comp == _BI_RLE8:
            idx_bu = _rle8_decode(buf[offset:], w, h)
        else:
            stride = (w + 3) & ~3
            if offset + stride * h > len(buf):
                raise ValueError("truncated BMP pixel data")
            idx_bu = np.frombuffer(
                buf, np.uint8, stride * h, offset
            ).reshape(h, stride)[:, :w]
        if idx_bu.size and int(idx_bu.max()) >= ncol:
            raise ValueError("BMP palette index out of range")
        return pal[idx_bu[::-1]].copy()
    stride = (w * 3 + 3) & ~3
    end = offset + stride * h
    if end > len(buf):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(buf, np.uint8, stride * h, offset).reshape(h, stride)
    # strip padding, bottom-up -> top-down, BGR -> RGB
    return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()
