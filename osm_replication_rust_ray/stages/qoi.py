"""QOI ("Quite OK Image") codec — pure numpy, from the public spec
(qoiformat.org, one-page spec, public domain).

Wire format: 14-byte header (magic ``qoif``, BE32 width/height, u8
channels, u8 colorspace), an op stream, and the 8-byte end marker
(seven 0x00 then 0x01).  Ops:

  QOI_OP_RGB   0xFE r g b
  QOI_OP_RGBA  0xFF r g b a
  QOI_OP_INDEX 0b00iiiiii        (64-entry running hash table)
  QOI_OP_DIFF  0b01_dr_dg_db     (2-bit channel diffs, bias 2)
  QOI_OP_LUMA  0b10_dg | drdg<<4 | dbdg  (6-bit dg bias 32, 4-bit
                                  dr-dg / db-dg bias 8, second byte)
  QOI_OP_RUN   0b11_rrrrrr       (run of previous pixel, bias -1,
                                  lengths 1..62)

All diffs are mod-256 wraparound; the hash is (3r+5g+7b+11a) % 64.

Engine posture (same as stages/flac.py / webp.py): the ENCODER is
fully vectorized and never emits QOI_OP_INDEX — the spec allows any
valid op subset, and dropping the sequential hash-table dependency is
exactly what makes encode a batch kernel instead of a per-pixel
Python loop.  The DECODER handles the full spec: streams without
INDEX ops (ours, and any encoder configured likewise) take the
vectorized fast path (boundary chase + segmented mod-256 cumsum);
INDEX-carrying foreign streams fall back to the scalar
reference-semantics loop, kept bit-compatible by the unit tests'
hand-built INDEX streams.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _wrap_i8(d: np.ndarray) -> np.ndarray:
    """mod-256 difference mapped to [-128, 127]."""
    return ((d.astype(np.int64) + 128) % 256) - 128


def encode_qoi(img: np.ndarray) -> bytes:
    """RGB image -> QOI bytes (vectorized; RUN/DIFF/LUMA/RGB ops)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_qoi expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3).astype(np.int64)
    n = len(flat)
    if n == 0:
        raise ValueError("empty image")
    prev = np.vstack([[0, 0, 0], flat[:-1]])

    eq = np.all(flat == prev, axis=1)
    lit = np.flatnonzero(~eq)

    # ---- literal classification (diffs vs previous pixel) ----
    d = _wrap_i8(flat[lit] - prev[lit])          # (L, 3) in [-128, 127]
    dr, dg, db = d[:, 0], d[:, 1], d[:, 2]
    is_diff = np.all((d >= -2) & (d <= 1), axis=1)
    vg_r, vg_b = dr - dg, db - dg
    is_luma = (~is_diff & (dg >= -32) & (dg <= 31)
               & (vg_r >= -8) & (vg_r <= 7) & (vg_b >= -8) & (vg_b <= 7))
    is_rgb = ~is_diff & ~is_luma
    lit_len = np.where(is_diff, 1, np.where(is_luma, 2, 4))

    # ---- run chunking: each maximal eq-run -> ceil(L/62) RUN ops ----
    eq_i = eq.astype(np.int8)
    starts = np.flatnonzero(np.diff(np.r_[0, eq_i]) == 1)
    ends = np.flatnonzero(np.diff(np.r_[eq_i, 0]) == -1) + 1
    run_lens = ends - starts
    chunks = (run_lens + 61) // 62
    run_pos = np.repeat(starts, chunks)
    if len(chunks):
        # offset of each chunk within its run: ragged arange
        first = np.r_[0, np.cumsum(chunks)[:-1]]
        idx = np.arange(int(chunks.sum())) - np.repeat(first, chunks)
        run_pos = run_pos + idx * 62
        chunk_len = np.minimum(
            np.repeat(ends, chunks) - run_pos, 62
        ).astype(np.int64)
    else:
        chunk_len = np.empty(0, np.int64)

    # ---- merge op streams in pixel order ----
    pos = np.concatenate([lit, run_pos])
    blen = np.concatenate([lit_len, np.ones(len(run_pos), np.int64)])
    order = np.argsort(pos, kind="stable")
    pos, blen = pos[order], blen[order]
    off = np.r_[0, np.cumsum(blen)[:-1]]
    total = int(blen.sum())
    out = np.zeros(total, np.uint8)

    # scatter literal bytes (literal op offsets = those whose source
    # index in `order` is < len(lit))
    lit_off = off[np.argsort(order, kind="stable")[: len(lit)]]
    do = lit_off[is_diff]
    out[do] = (0x40 | ((dr[is_diff] + 2) << 4) | ((dg[is_diff] + 2) << 2)
               | (db[is_diff] + 2)).astype(np.uint8)
    lo = lit_off[is_luma]
    out[lo] = (0x80 | (dg[is_luma] + 32)).astype(np.uint8)
    out[lo + 1] = (((vg_r[is_luma] + 8) << 4)
                   | (vg_b[is_luma] + 8)).astype(np.uint8)
    ro = lit_off[is_rgb]
    out[ro] = 0xFE
    out[ro + 1] = flat[lit[is_rgb], 0].astype(np.uint8)
    out[ro + 2] = flat[lit[is_rgb], 1].astype(np.uint8)
    out[ro + 3] = flat[lit[is_rgb], 2].astype(np.uint8)
    # scatter run bytes
    run_off = off[np.argsort(order, kind="stable")[len(lit):]]
    out[run_off] = (0xC0 | (chunk_len - 1)).astype(np.uint8)

    header = _MAGIC + struct.pack(">IIBB", w, h, 3, 0)
    return header + out.tobytes() + _END


def _op_boundaries(stream: np.ndarray) -> np.ndarray:
    """Positions of op starts (index chase over the per-byte length
    table; one scalar jump per OP, payload work stays vectorized —
    the stages/flac.py Rice-decode pattern)."""
    # length keyed by the byte value at an op boundary
    lens = np.ones(len(stream), np.int64)
    top2 = stream >> 6
    lens[top2 == 2] = 2            # LUMA
    lens[stream == 0xFE] = 4       # RGB
    lens[stream == 0xFF] = 5       # RGBA
    nxt = np.arange(len(stream), dtype=np.int64) + lens
    bounds = np.empty(len(stream), np.int64)
    p = 0
    k = 0
    n = len(stream)
    nxt_l = nxt.tolist()           # list indexing is ~3x ndarray scalar
    while p < n:
        bounds[k] = p
        k += 1
        p = nxt_l[p]
    if p != n:
        raise ValueError("qoi: op stream overruns its length")
    return bounds[:k]


def decode_qoi(buf: bytes) -> np.ndarray:
    """QOI bytes -> (h, w, channels) uint8 (full spec)."""
    if len(buf) < 14 + 8 or buf[:4] != _MAGIC:
        raise ValueError("not a QOI stream")
    w, h, channels, colorspace = struct.unpack(">IIBB", buf[4:14])
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(f"qoi: bad header channels={channels} "
                         f"colorspace={colorspace}")
    if buf[-8:] != _END:
        raise ValueError("qoi: missing end marker")
    stream = np.frombuffer(buf, np.uint8)[14:-8]
    n_px = w * h
    if n_px == 0:
        raise ValueError("qoi: zero-pixel image")

    bounds = _op_boundaries(stream)
    op = stream[bounds]
    top2 = op >> 6
    is_rgb = op == 0xFE
    is_rgba = op == 0xFF
    is_run = (top2 == 3) & ~is_rgb & ~is_rgba
    is_index = top2 == 0
    if bool(is_index.any()):
        return _decode_scalar(stream, w, h, channels)

    # ---- vectorized fast path (no INDEX ops) ----
    is_diff = top2 == 1
    is_luma = top2 == 2
    counts = np.where(is_run, (op & 0x3F).astype(np.int64) + 1, 1)
    px_of_op = np.r_[0, np.cumsum(counts)[:-1]]
    if int(counts.sum()) != n_px:
        raise ValueError(f"qoi: decoded {int(counts.sum())} px, "
                         f"expected {n_px}")

    delta = np.zeros((n_px, 3), np.int64)
    b = bounds
    dop = op[is_diff].astype(np.int64)
    delta[px_of_op[is_diff], 0] = ((dop >> 4) & 3) - 2
    delta[px_of_op[is_diff], 1] = ((dop >> 2) & 3) - 2
    delta[px_of_op[is_diff], 2] = (dop & 3) - 2
    lop = op[is_luma].astype(np.int64)
    l2 = stream[b[is_luma] + 1].astype(np.int64)
    dg = (lop & 0x3F) - 32
    delta[px_of_op[is_luma], 0] = ((l2 >> 4) & 0xF) - 8 + dg
    delta[px_of_op[is_luma], 1] = dg
    delta[px_of_op[is_luma], 2] = (l2 & 0xF) - 8 + dg

    # absolute resets (RGB / RGBA both set the rgb channels)
    is_abs = is_rgb | is_rgba
    abs_px = px_of_op[is_abs]
    abs_val = np.stack(
        [stream[b[is_abs] + 1 + c].astype(np.int64) for c in range(3)],
        axis=1,
    )
    cum = np.cumsum(delta, axis=0)
    # base[i] = value_at_latest_abs - cum[latest_abs]; 0 before any
    seg = np.searchsorted(abs_px, np.arange(n_px), side="right")
    base = np.zeros((n_px, 3), np.int64)
    if len(abs_px):
        adj = abs_val - cum[abs_px]
        base_tbl = np.vstack([np.zeros((1, 3), np.int64), adj])
        base = base_tbl[seg]
    rgb = ((base + cum) % 256).astype(np.uint8).reshape(h, w, 3)
    if channels == 3:
        return rgb
    # alpha plane: only RGBA ops change it (default 255)
    alpha = np.full(n_px, 255, np.uint8)
    if bool(is_rgba.any()):
        a_px = px_of_op[is_rgba]
        a_val = stream[b[is_rgba] + 4]
        fill = np.searchsorted(a_px, np.arange(n_px), side="right")
        tbl = np.r_[np.int64(255), a_val.astype(np.int64)]
        alpha = tbl[fill].astype(np.uint8)
    return np.dstack([rgb, alpha.reshape(h, w)])


def _decode_scalar(stream: np.ndarray, w: int, h: int,
                   channels: int) -> np.ndarray:
    """Reference-semantics scalar decode (INDEX-carrying streams)."""
    out = np.zeros((w * h, 4), np.uint8)
    index = np.zeros((64, 4), np.uint8)
    r, g, bch, a = 0, 0, 0, 255
    s = stream.tolist()
    p = 0
    i = 0
    n_px = w * h
    while i < n_px:
        if p >= len(s):
            raise ValueError("qoi: op stream truncated")
        op = s[p]
        if op == 0xFE:
            r, g, bch = s[p + 1], s[p + 2], s[p + 3]
            p += 4
        elif op == 0xFF:
            r, g, bch, a = s[p + 1], s[p + 2], s[p + 3], s[p + 4]
            p += 5
        else:
            top = op >> 6
            if top == 0:                       # INDEX
                r, g, bch, a = index[op & 0x3F]
                p += 1
            elif top == 1:                     # DIFF
                r = (r + ((op >> 4) & 3) - 2) % 256
                g = (g + ((op >> 2) & 3) - 2) % 256
                bch = (bch + (op & 3) - 2) % 256
                p += 1
            elif top == 2:                     # LUMA
                dg = (op & 0x3F) - 32
                b2 = s[p + 1]
                r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                bch = (bch + dg + (b2 & 0xF) - 8) % 256
                p += 2
            else:                              # RUN
                run = (op & 0x3F) + 1
                if i + run > n_px:
                    raise ValueError("qoi: run overruns image")
                out[i:i + run] = (r, g, bch, a)
                i += run
                p += 1
                index[(3 * r + 5 * g + 7 * bch + 11 * a) % 64] = (
                    r, g, bch, a)
                continue
        out[i] = (r, g, bch, a)
        i += 1
        index[(3 * r + 5 * g + 7 * bch + 11 * a) % 64] = (r, g, bch, a)
    if p != len(s):
        raise ValueError("qoi: trailing bytes after last pixel")
    img = out.reshape(h, w, 4)
    return img[..., :3] if channels == 3 else img
