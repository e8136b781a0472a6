"""Real GIF codec (GIF87a/89a), stdlib struct + numpy only.

Implements the complete single-image format plus the animation
extensions our pipelines use: logical screen descriptor, global and
local color tables, variable-width LZW (clear/EOI codes, the 4096-entry
table cap with deferred-clear tolerance on decode, the KwKwK
``code == next_code`` special case), 255-byte data sub-blocks, Adam-less
GIF 4-pass interlace, Graphic Control / NETSCAPE2.0 looping extensions,
and multi-frame streams.  The LZW bit-packer is vectorized (disjoint
bit-range deposits via ``np.add.at``); the dictionary walk itself is a
per-symbol loop — reference-grade scope, same documented posture as the
JPEG/FLAC entropy coders in this package.

GIF is palette-indexed (<= 256 colors per frame).  ``encode_gif``
derives the palette from the image's unique colors (sorted, so the
stream is deterministic) and refuses true-color input with a clear
error; callers quantize first — ``posterize216`` is the deterministic
6-level-per-channel quantizer the gates use, chosen because its SQL
twin is one integer expression (``(v // 43) * 51``).

Unsupported on purpose (explicit errors, not silent wrong pixels):
transparency composition (GCE transparency flag on decode), partial-
canvas frame composition in ``decode_gif_frames`` (every frame must
cover the full screen — what our encoder emits), and the plain-text
extension (skipped like any other extension block).

No reference analogue (the reference has no image payloads); this
extends the lossless-codec matrix (raw/rle/png/bmp/tiff/webp) that
``stages/decode.py:decode_image`` dispatches on — part of the
north-star's multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

_LSD = struct.Struct("<HHBBB")  # width, height, flags, bg index, aspect
_IMG_DESC = struct.Struct("<HHHHB")  # left, top, width, height, flags

_MAX_CODE_WIDTH = 12
_TABLE_CAP = 1 << _MAX_CODE_WIDTH  # 4096


def posterize216(img: np.ndarray) -> np.ndarray:
    """Deterministic 6-level-per-channel quantizer (216-color cube).

    ``v -> (v // 43) * 51`` maps 0..255 onto {0, 51, ..., 255}; the
    result has <= 216 unique colors so it is losslessly GIF-encodable,
    and the map is a single integer expression a SQL oracle can apply
    to regenerated reference bytes.
    """
    img = np.asarray(img, np.uint8)
    return (img // 43) * np.uint8(51)


# ---------------------------------------------------------------- LZW


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF variable-width LZW over a palette-index stream.

    Emits an initial CLEAR, grows the code width when ``next_code``
    reaches ``1 << width`` (the decoder bumps at the same stream
    position because it defines entries one step behind but may read
    the just-defined code), and emits CLEAR + resets when the table
    hits 4096 entries.
    """
    clear = 1 << mcs
    eoi = clear + 1
    codes: list[int] = []
    widths: list[int] = []

    def emit(c: int, w: int) -> None:
        codes.append(c)
        widths.append(w)

    width = mcs + 1
    emit(clear, width)
    table: dict[int, int] = {}
    next_code = eoi + 1
    it = iter(indices.tolist())
    try:
        cur = next(it)
    except StopIteration:
        emit(eoi, width)
        return _pack_codes(codes, widths)
    for sym in it:
        key = (cur << 8) | sym
        hit = table.get(key)
        if hit is not None:
            cur = hit
            continue
        emit(cur, width)
        if next_code == _TABLE_CAP:
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = mcs + 1
        else:
            table[key] = next_code
            next_code += 1
            # the decoder defines its mirror entry only after reading
            # the NEXT code, so the width that next code is read with
            # must already cover next_code - 1: bump when next_code
            # EXCEEDS the width's capacity (giflib's `>` rule)
            if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        cur = sym
    emit(cur, width)
    # the decoder defines an entry on EVERY data-code read after the
    # first since a clear — including this final flush — and may bump
    # its width before reading EOI; mirror that with a virtual define
    if next_code < _TABLE_CAP:
        next_code += 1
        if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    emit(eoi, width)
    return _pack_codes(codes, widths)


def _pack_codes(codes: list[int], widths: list[int]) -> bytes:
    """LSB-first bit packing, vectorized: each code's bits occupy a
    disjoint range, so depositing ``value << (offset & 7)`` into three
    consecutive bytes with ``np.add.at`` never carries."""
    cv = np.asarray(codes, np.uint32)
    wv = np.asarray(widths, np.int64)
    offs = np.zeros(len(wv), np.int64)
    np.cumsum(wv[:-1], out=offs[1:])
    total_bits = int(offs[-1] + wv[-1]) if len(wv) else 0
    nbytes = (total_bits + 7) // 8
    out = np.zeros(nbytes + 3, np.uint32)
    v = cv << (offs & 7).astype(np.uint32)
    bpos = offs >> 3
    np.add.at(out, bpos, v & 0xFF)
    np.add.at(out, bpos + 1, (v >> np.uint32(8)) & 0xFF)
    np.add.at(out, bpos + 2, (v >> np.uint32(16)) & 0xFF)
    return out[:nbytes].astype(np.uint8).tobytes()


def _lzw_decode(data: bytes, mcs: int, expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; tolerates deferred clears (a
    full table simply stops growing until the next CLEAR) and handles
    the ``code == next_code`` KwKwK case."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW min code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table = list(base)
    table.extend((b"", b""))  # clear / eoi placeholders
    width = mcs + 1
    bitpos = 0
    total_bits = len(data) * 8
    out: list[bytes] = []
    out_len = 0
    prev: bytes | None = None
    while True:
        if bitpos + width > total_bits:
            raise ValueError("truncated LZW stream (no EOI)")
        p = bitpos >> 3
        chunk = int.from_bytes(data[p:p + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            table.extend((b"", b""))
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if code < clear:
                pass
            elif not entry:
                raise ValueError(f"LZW code {code} refers to a reserved slot")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range ({len(table)})")
        out.append(entry)
        out_len += len(entry)
        if out_len > expected:
            raise ValueError("LZW output exceeds frame pixel count")
        if prev is not None and len(table) < _TABLE_CAP:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    flat = b"".join(out)
    if len(flat) != expected:
        raise ValueError(
            f"LZW decoded {len(flat)} indices, frame needs {expected}"
        )
    return np.frombuffer(flat, np.uint8)


# ------------------------------------------------------------ palette


def _build_palette(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) -> (palette (n, 3) sorted by packed value, index map
    (h*w,) uint8).  Raises ValueError beyond 256 unique colors."""
    flat = img.reshape(-1, 3).astype(np.uint32)
    packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    uniq, inv = np.unique(packed, return_inverse=True)
    if len(uniq) > 256:
        raise ValueError(
            f"image has {len(uniq)} unique colors; GIF palettes hold 256 "
            "— quantize first (e.g. stages.gif.posterize216)"
        )
    pal = np.stack(
        [(uniq >> 16) & 255, (uniq >> 8) & 255, uniq & 255], axis=1
    ).astype(np.uint8)
    return pal, inv.astype(np.uint8)


def _color_table_bits(n_colors: int) -> int:
    """Smallest b with 2**(b+1) >= n_colors (GIF size field is b)."""
    b = 0
    while (2 << b) < max(n_colors, 2):
        b += 1
    return b


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )


# ------------------------------------------------------------- encode


def _encode_frame_block(
    indices: np.ndarray, w: int, h: int, mcs: int, interlace: bool
) -> bytes:
    rows = indices.reshape(h, w)
    if interlace:
        rows = rows[_interlace_order(h)]
    data = _lzw_encode(rows.reshape(-1), mcs)
    parts = [
        b"\x2c",  # image separator
        _IMG_DESC.pack(0, 0, w, h, 0x40 if interlace else 0),
        bytes([mcs]),
    ]
    for i in range(0, len(data), 255):
        block = data[i:i + 255]
        parts.append(bytes([len(block)]))
        parts.append(block)
    parts.append(b"\x00")
    return b"".join(parts)


def _palette_bytes(pal: np.ndarray, bits: int) -> bytes:
    full = np.zeros((2 << bits, 3), np.uint8)
    full[: len(pal)] = pal
    return full.tobytes()


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB with <= 256 unique colors -> GIF89a bytes."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_gif needs (h, w, 3) RGB, got {img.shape}")
    h, w = img.shape[:2]
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError(f"GIF dimensions out of range: {w}x{h}")
    pal, indices = _build_palette(img)
    bits = _color_table_bits(len(pal))
    mcs = max(2, bits + 1)
    return b"".join(
        (
            b"GIF89a",
            _LSD.pack(w, h, 0x80 | (7 << 4) | bits, 0, 0),
            _palette_bytes(pal, bits),
            _encode_frame_block(indices, w, h, mcs, interlace),
            b"\x3b",
        )
    )


def encode_gif_frames(
    frames: list[np.ndarray], delay_cs: int = 4, loop: int = 0
) -> bytes:
    """Full-screen animation: shared global palette from the union of
    all frames' colors, NETSCAPE2.0 loop extension, one Graphic Control
    Extension (delay, no transparency) per frame."""
    if not frames:
        raise ValueError("need at least one frame")
    arrs = [np.ascontiguousarray(f, np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    for f in arrs:
        if f.shape != arrs[0].shape:
            raise ValueError("all frames must share one shape")
    pal, all_idx = _build_palette(np.concatenate(arrs, axis=0))
    bits = _color_table_bits(len(pal))
    mcs = max(2, bits + 1)
    per = h * w
    parts = [
        b"GIF89a",
        _LSD.pack(w, h, 0x80 | (7 << 4) | bits, 0, 0),
        _palette_bytes(pal, bits),
        # NETSCAPE2.0 application extension: loop count (0 = forever)
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00",
    ]
    for i in range(len(arrs)):
        parts.append(
            b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        )
        parts.append(
            _encode_frame_block(all_idx[i * per:(i + 1) * per], w, h, mcs, False)
        )
    parts.append(b"\x3b")
    return b"".join(parts)


# ------------------------------------------------------------- decode


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated GIF")
        self.pos += n
        return b

    def byte(self) -> int:
        return self.take(1)[0]

    def sub_blocks(self) -> bytes:
        parts = []
        while True:
            n = self.byte()
            if n == 0:
                return b"".join(parts)
            parts.append(self.take(n))

    def skip_sub_blocks(self) -> None:
        while True:
            n = self.byte()
            if n == 0:
                return
            self.pos += n
            if self.pos > len(self.buf):
                raise ValueError("truncated GIF sub-blocks")


def _decode_stream(buf: bytes, max_frames: int | None):
    r = _Reader(buf)
    magic = r.take(6)
    if magic not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF (magic {magic!r})")
    sw, sh, flags, _bg, _aspect = _LSD.unpack(r.take(_LSD.size))
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(r.take(n * 3), np.uint8).reshape(n, 3)
    frames: list[tuple[int, int, np.ndarray]] = []
    transparent = False
    while True:
        tag = r.byte()
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension
            label = r.byte()
            if label == 0xF9:
                gce = r.sub_blocks()
                if len(gce) >= 1 and gce[0] & 1:
                    transparent = True
            else:
                r.skip_sub_blocks()
            continue
        if tag != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{tag:02x}")
        left, top, fw, fh, iflags = _IMG_DESC.unpack(r.take(_IMG_DESC.size))
        if fw == 0 or fh == 0 or left + fw > sw or top + fh > sh:
            raise ValueError("GIF frame rect outside logical screen")
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(r.take(n * 3), np.uint8).reshape(n, 3)
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if transparent:
            raise NotImplementedError(
                "GIF transparency composition not supported"
            )
        mcs = r.byte()
        data = r.sub_blocks()
        idx = _lzw_decode(data, mcs, fw * fh)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF pixel index outside color table")
        rows = idx.reshape(fh, fw)
        if iflags & 0x40:
            inv = np.empty(fh, np.int64)
            inv[_interlace_order(fh)] = np.arange(fh)
            rows = rows[inv]
        frames.append((left, top, pal[rows]))
        transparent = False
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image data")
    return sw, sh, frames


def decode_gif(buf: bytes) -> np.ndarray:
    """First frame of a GIF -> (h, w, 3) uint8 RGB.  The frame must
    cover the full logical screen (what our encoder emits; partial
    first frames imply composition against a background we refuse to
    guess)."""
    sw, sh, frames = _decode_stream(buf, max_frames=1)
    left, top, img = frames[0]
    if left != 0 or top != 0 or img.shape[:2] != (sh, sw):
        raise NotImplementedError(
            "partial-canvas GIF first frame not supported"
        )
    return img


def decode_gif_frames(buf: bytes) -> list[np.ndarray]:
    """All frames of a (full-screen-frame) animated GIF -> list of
    (h, w, 3) arrays.  Partial-canvas frames would need disposal-mode
    composition; explicitly unsupported."""
    sw, sh, frames = _decode_stream(buf, max_frames=None)
    out = []
    for left, top, img in frames:
        if left != 0 or top != 0 or img.shape[:2] != (sh, sw):
            raise NotImplementedError(
                "partial-canvas GIF frames not supported"
            )
        out.append(img)
    return out
