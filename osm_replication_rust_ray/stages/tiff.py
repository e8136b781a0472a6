"""Real TIFF codec (8-bit RGB), stdlib struct + numpy.

Baseline TIFF 6.0: byte-order header, one IFD, chunky RGB strips.
The encoder writes little-endian single-strip files in three
compression modes — Compression=1 (none), Compression=5 (LZW: TIFF's
MSB-first variable-width variant with the "early change" width rule,
ClearCode=256/EOI=257, table reset at 4094 — TIFF 6.0 §13) and
Compression=32773 (PackBits byte RLE, restarted per row per spec).
The decoder walks the IFD of either byte order, handles
inline-vs-offset tag values, multiple strips (decompressed
independently, per spec), all three compressions, and rejects
anything it cannot decode bit-exactly (paletted,
planar-configuration-2, non-8-bit, other compressions).  The pixel
paths are whole-image numpy; the LZW dictionary walk is a per-symbol
loop (reference-grade scope, same documented posture as the GIF/JPEG
entropy coders); PackBits runs are detected vectorized and emitted
per run.  Part of the real-codec matrix
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

# ------------------------------------------------------------------ LZW
# TIFF 6.0 §13: MSB-first bit order, 9..12-bit codes, ClearCode=256,
# EOI=257, first table code 258, and the "early change" rule — the code
# width bumps when the NEXT code to assign equals 2^width - 1 (one
# position earlier than GIF's LSB-first variant in stages/gif.py).

_LZW_CLEAR = 256
_LZW_EOI = 257
_LZW_RESET_AT = 4094  # spec: emit ClearCode when the table reaches 4094
_LZW_TABLE_CAP = 4096


class _MsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-variant LZW over a strip's raw bytes."""
    w = _MsbBitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    w.put(_LZW_CLEAR, width)
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        w.put(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        cur = bytes([b])
        if next_code >= _LZW_RESET_AT:
            w.put(table[cur], width)
            w.put(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
            cur = b""
    if cur:
        w.put(table[cur], width)
    w.put(_LZW_EOI, width)
    return w.finish()


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """Inverse of _lzw_encode_tiff; validates EOI and output length."""
    out = bytearray()
    acc = nbits = pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def next_code() -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        return code

    while True:
        code = next_code()
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("bad first TIFF LZW code after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _LZW_TABLE_CAP:
                table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF LZW code {code} out of range")
        out += entry
        # Early change: the decoder defines entries one code behind the
        # encoder, so it must widen one entry EARLIER than the
        # encoder's (2^w - 1) trigger for the widths to agree at every
        # read position — the documented off-by-one between the TIFF6
        # spec's literal pseudocode and what implementations ship
        # (libtiff's dec_maxcodep is MAXCODE(n) - 1 for this reason).
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError("TIFF LZW output exceeds strip size")
    if len(out) != expected:
        raise ValueError(
            f"TIFF LZW strip decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


# ------------------------------------------------------------- PackBits

def _packbits_encode_row(row: np.ndarray) -> bytes:
    """One row -> PackBits packets: runs >= 3 as replicate packets,
    the rest as literal packets (both capped at 128).  Run boundaries
    are found vectorized; the loop is per packet."""
    n = len(row)
    if n == 0:
        return b""
    # run-length decomposition
    change = np.flatnonzero(row[1:] != row[:-1])
    starts = np.concatenate(([0], change + 1))
    lengths = np.diff(np.append(starts, n))
    out = bytearray()
    lit_start = None  # start of a pending literal span (in row index)

    def flush_literal(end: int) -> None:
        nonlocal lit_start
        if lit_start is None:
            return
        i = lit_start
        while i < end:
            m = min(128, end - i)
            out.append(m - 1)
            out.extend(row[i : i + m].tobytes())
            i += m
        lit_start = None

    for s, ln in zip(starts.tolist(), lengths.tolist()):
        if ln >= 3:
            flush_literal(s)
            i = 0
            while i < ln:
                m = min(128, ln - i)
                if m == 1:  # can't replicate 1; fold into a literal
                    out.append(0)
                    out.append(int(row[s + i]))
                else:
                    out.append((257 - m) & 0xFF)  # -(m-1) two's complement
                    out.append(int(row[s]))
                i += m
        else:
            if lit_start is None:
                lit_start = s
    flush_literal(n)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """PackBits packet walk (self-delimiting, so per-row restarted
    streams decode as one concatenation)."""
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ValueError("truncated PackBits stream")
        ctrl = data[pos]
        pos += 1
        if ctrl < 128:  # literal of ctrl+1 bytes
            m = ctrl + 1
            if pos + m > len(data):
                raise ValueError("truncated PackBits literal")
            out += data[pos : pos + m]
            pos += m
        elif ctrl > 128:  # replicate next byte 257-ctrl times
            if pos >= len(data):
                raise ValueError("truncated PackBits replicate")
            out += bytes([data[pos]]) * (257 - ctrl)
            pos += 1
        # ctrl == 128: no-op, per spec
    if len(out) != expected or pos != len(data):
        raise ValueError(
            f"PackBits decoded {len(out)}/{expected} bytes "
            f"({len(data) - pos} trailing)"
        )
    return bytes(out)


_COMPRESSION_TAGS = {"none": 1, "lzw": 5, "packbits": 32773}


def encode_tiff(img: np.ndarray, compression: str = "none") -> bytes:
    """(h, w, 3) uint8 RGB -> little-endian single-strip TIFF bytes.

    ``compression``: "none" (Compression=1), "lzw" (5, TIFF-variant
    LZW over the strip) or "packbits" (32773, restarted per row per
    TIFF 6.0 §9 — the concatenated packets stay self-delimiting)."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_tiff needs (h, w, 3) RGB, got {img.shape}")
    if compression not in _COMPRESSION_TAGS:
        raise ValueError(f"unknown TIFF compression {compression!r}")
    h, w = img.shape[:2]
    if compression == "lzw":
        pixels = _lzw_encode_tiff(img.tobytes())
    elif compression == "packbits":
        rows = img.reshape(h, w * 3)
        pixels = b"".join(_packbits_encode_row(rows[y]) for y in range(h))
    else:
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
        (_COMPRESSION, 3, 1, _COMPRESSION_TAGS[compression]),
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
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} not supported"
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
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0] or h
    need = w * h * 3
    parts = []
    rows_left = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(buf):
            raise ValueError("truncated TIFF strip")
        raw = buf[off:off + cnt]
        strip_rows = min(rows_per_strip, rows_left)
        rows_left -= strip_rows
        expected = strip_rows * w * 3
        if comp == 5:
            raw = _lzw_decode_tiff(raw, expected)
        elif comp == 32773:
            raw = _packbits_decode(raw, expected)
        parts.append(np.frombuffer(raw, np.uint8))
    flat = parts[0] if len(parts) == 1 else np.concatenate(parts)
    if len(flat) != need:
        raise ValueError(f"TIFF strip bytes {len(flat)} != {need}")
    return flat.reshape(h, w, 3).copy()
