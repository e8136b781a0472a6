"""FLAC codec from scratch (stdlib + numpy only) — no audio libraries.

Engine analogue of the reference's "decode the payload, don't trust
it" posture for media columns (the reference itself has no media
pipeline; this serves the training-data modality requirements the
engine adds on top, like stages/jpeg.py / stages/png.py do for
images).  Implements the FLAC stream format (RFC 9639):

* stream marker + STREAMINFO metadata block (with the MD5 of the raw
  PCM, which the decoder verifies),
* frames with fixed-blocksize numbering, UTF-8-style coded frame
  numbers, CRC-8 header and CRC-16 frame checks,
* subframe types CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC
  (any order; the encoder uses Levinson-Durbin with quantized
  coefficients), wasted-bits handling,
* partitioned Rice residual coding (methods RICE and RICE2, escape
  partitions), any partition order on decode.

Scope gates (explicit, like the image codecs): the encoder is
mono/16-bit (the engine's audio payload shape, stages/decode.py);
the decoder handles 8/12/16/20/24/32-bit, mono, multi-channel
independent and the three stereo decorrelation modes.

Performance shape: Rice encoding, fixed-predictor residuals and
fixed-predictor reconstruction are fully numpy-vectorized (the
fixed-order inverse is a cumsum chain, no Python loop over samples);
per-sample Python survives only in the Rice *decode* cursor walk and
the LPC reconstruction recurrence — the same documented
reference-grade scope as the JPEG entropy coder (stages/jpeg.py).

Interop note: no reference FLAC implementation exists in this
container, so cross-tool decode cannot be pinned here the way WAV is
pinned against stdlib ``wave``; fidelity rests on the spec-exact
structures above plus the decoder's CRC-8/CRC-16/MD5 verification of
every stream it reads (tampering any byte is detected — tested).
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

# ---------------------------------------------------------------- CRCs

def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_T = _crc_table(0x07, 8)       # x^8 + x^2 + x + 1
_CRC16_T = _crc_table(0x8005, 16)   # x^16 + x^15 + x^2 + 1


def _crc8(data: bytes) -> int:
    r = 0
    t = _CRC8_T
    for b in data:
        r = int(t[r ^ b])
    return r


def _crc16_pair_table() -> list:
    """65536-entry table: CRC-16 advance for two message bytes at once
    (halves the Python loop; the integrity check is the decoder's
    second-hottest path after the LPC recurrence)."""
    t1 = _CRC16_T.astype(np.int64)
    hi = np.arange(65536) >> 8
    lo = np.arange(65536) & 0xFF
    r1 = t1[hi]
    r2 = (t1[((r1 >> 8) ^ lo) & 0xFF] ^ (r1 << 8)) & 0xFFFF
    return r2.tolist()


_CRC16_P = _crc16_pair_table()


def _crc16(data: bytes) -> int:
    r = 0
    tp = _CRC16_P
    n2 = len(data) & ~1
    for i in range(0, n2, 2):
        # state XORs into the next two message bytes (GF(2) linearity)
        r = tp[r ^ (data[i] << 8) ^ data[i + 1]]
    if len(data) & 1:
        r = (int(_CRC16_T[((r >> 8) ^ data[-1]) & 0xFF]) ^ (r << 8)) & 0xFFFF
    return r


# ------------------------------------------------------------- bit I/O

_POW2 = [np.zeros(0, np.uint64)] + [
    (np.uint64(1) << np.arange(k - 1, -1, -1, dtype=np.uint64)) for k in range(1, 58)
]


class _BitBuf:
    """Append-only bitstream built from numpy 0/1 chunks; packed once."""

    def __init__(self):
        self.chunks: list[np.ndarray] = []
        self.nbits = 0

    def append(self, value: int, nbits: int):
        if nbits == 0:
            return
        v = np.uint64(value & ((1 << nbits) - 1))
        bits = ((v >> np.arange(nbits - 1, -1, -1, dtype=np.uint64)) & np.uint64(1))
        self.chunks.append(bits.astype(np.uint8))
        self.nbits += nbits

    def append_unary(self, q: int):
        bits = np.zeros(q + 1, np.uint8)
        bits[-1] = 1
        self.chunks.append(bits)
        self.nbits += q + 1

    def append_signed_array(self, vals: np.ndarray, nbits: int):
        """Each value as an nbits-wide two's-complement field (vectorized)."""
        if nbits == 0 or len(vals) == 0:
            return
        u = (vals.astype(np.int64) & ((1 << nbits) - 1)).astype(np.uint64)
        sh = np.arange(nbits - 1, -1, -1, dtype=np.uint64)
        bits = ((u[:, None] >> sh[None, :]) & np.uint64(1)).astype(np.uint8)
        self.chunks.append(bits.ravel())
        self.nbits += nbits * len(vals)

    def append_rice_array(self, res: np.ndarray, k: int):
        """Rice-code signed residuals with parameter k — fully vectorized:
        one zeros array sized to the exact total, terminator ones and low
        bits placed by fancy indexing."""
        n = len(res)
        if n == 0:
            return
        r = res.astype(np.int64)
        u = ((r << 1) ^ (r >> 63)).astype(np.uint64)  # zigzag fold
        q = (u >> np.uint64(k)).astype(np.int64)
        lens = q + 1 + k
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        total = int(starts[-1] + lens[-1])
        bits = np.zeros(total, np.uint8)
        term = starts + q
        bits[term] = 1
        if k:
            sh = np.arange(k - 1, -1, -1, dtype=np.uint64)
            low = ((u[:, None] >> sh[None, :]) & np.uint64(1)).astype(np.uint8)
            pos = (term + 1)[:, None] + np.arange(k)[None, :]
            bits[pos.ravel()] = low.ravel()
        self.chunks.append(bits)
        self.nbits += total

    def tobytes(self) -> bytes:
        pad = (-self.nbits) % 8
        if pad:
            self.chunks.append(np.zeros(pad, np.uint8))
            self.nbits += pad
        return np.packbits(np.concatenate(self.chunks)).tobytes() if self.nbits else b""


class _BitCursor:
    """Reader over an unpacked bit array; unary runs resolved with a
    precomputed ones index + searchsorted (no per-bit Python)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0
        self._nxt: dict[int, list] = {}  # per-k pointer-jump tables

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        end = self.pos + nbits
        if end > len(self.bits):
            raise ValueError("truncated FLAC bitstream")
        if nbits < 58:
            v = int(self.bits[self.pos:end].astype(np.uint64) @ _POW2[nbits])
        else:  # arbitrary width (not hit by spec fields, kept for safety)
            v = 0
            for b in self.bits[self.pos:end]:
                v = (v << 1) | int(b)
        self.pos = end
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        j = np.searchsorted(self.ones, self.pos)
        if j >= len(self.ones):
            raise ValueError("truncated FLAC unary code")
        one = int(self.ones[j])
        q = one - self.pos
        self.pos = one + 1
        return q

    def read_signed_array(self, n: int, nbits: int) -> np.ndarray:
        """n consecutive nbits-wide two's-complement fields (vectorized)."""
        if n == 0:
            return np.zeros(0, np.int64)
        if nbits == 0:
            return np.zeros(n, np.int64)
        end = self.pos + n * nbits
        if end > len(self.bits):
            raise ValueError("truncated FLAC bitstream")
        m = self.bits[self.pos:end].reshape(n, nbits).astype(np.uint64)
        v = (m @ _POW2[nbits]).astype(np.int64)
        sign = np.int64(1) << np.int64(nbits - 1)
        v = np.where(v >= sign, v - (np.int64(1) << np.int64(nbits)), v)
        self.pos = end
        return v

    def read_rice_array(self, n: int, k: int) -> np.ndarray:
        """Vectorized rice decode.  The value boundaries form a pointer
        chase j -> next_j[j] over the ones index (next_j = first one at
        least k+1 bits past each one — ONE vectorized searchsorted,
        cached per k); the chase itself is a trivial int walk, and
        quotients + low bits then come out as array expressions.
        Exactly equivalent to the sequential cursor semantics: the
        walk's invariant is that no 1-bit lies strictly between one
        value's end and the next terminator."""
        if n == 0:
            return np.zeros(0, np.int64)
        ones, bits = self.ones, self.bits
        j0 = int(np.searchsorted(ones, self.pos))
        if k == 0:
            if j0 + n > len(ones):
                raise ValueError("truncated FLAC rice partition")
            term = ones[j0:j0 + n].astype(np.int64)
            u = np.diff(np.concatenate(([self.pos - 1], term))).astype(np.uint64) - np.uint64(1)
            self.pos = int(term[-1]) + 1
        else:
            nxt = self._nxt.get(k)
            if nxt is None:
                nxt = np.searchsorted(ones, ones + 1 + k).tolist()
                self._nxt[k] = nxt
            L = len(ones)
            jpath = np.empty(n, np.int64)
            j = j0
            for i in range(n):
                if j >= L:
                    raise ValueError("truncated FLAC rice partition")
                jpath[i] = j
                j = nxt[j]
            term = ones[jpath].astype(np.int64)
            prev_end = np.concatenate(([self.pos], term[:-1] + 1 + k))
            q = (term - prev_end).astype(np.uint64)
            idx = term[:, None] + 1 + np.arange(k)[None, :]
            if int(term[-1]) + 1 + k > len(bits):
                raise ValueError("truncated FLAC rice partition")
            low = bits[idx].astype(np.uint64) @ _POW2[k]
            u = (q << np.uint64(k)) | low
            self.pos = int(term[-1]) + 1 + k
        return ((u >> np.uint64(1)).astype(np.int64)
                ^ -(u & np.uint64(1)).astype(np.int64))

    def align(self):
        self.pos += (-self.pos) % 8


# ----------------------------------------------------- coded numbers

def _utf8_code(n: int) -> bytes:
    """FLAC frame/sample-number coding: UTF-8 extended to 36 bits.
    ``extra`` continuation bytes carry 6 bits each; the lead byte
    carries ``6 - extra`` bits under an ``extra + 1``-ones prefix."""
    if n < 0x80:
        return bytes([n])
    for extra in range(1, 7):
        if n < 1 << (6 + 5 * extra):
            lead = (0xFF << (7 - extra)) & 0xFF
            out = [lead | ((n >> (6 * extra)) & ((1 << (6 - extra)) - 1))]
            for j in range(extra - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * j)) & 0x3F))
            return bytes(out)
    raise ValueError("coded number exceeds 36 bits")


def _utf8_decode(buf: bytes, pos: int) -> tuple[int, int]:
    b0 = buf[pos]
    if b0 < 0x80:
        return b0, pos + 1
    extra = 7 - (b0 ^ 0xFF).bit_length()  # count of leading 1s, minus 1
    if extra < 1 or extra > 6:
        raise ValueError("invalid FLAC coded number")
    n = b0 & ((1 << (6 - extra)) - 1)
    for j in range(extra):
        c = buf[pos + 1 + j]
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n, pos + 1 + extra


# --------------------------------------------------------- predictors

_FIXED_COEF = {  # s[i] = r[i] + dot(coef, s[i-1], s[i-2], ...)
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    return np.diff(s, n=order) if order else s.copy()


def _fixed_reconstruct(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the o-th difference with a cumsum chain (vectorized)."""
    out = res.astype(np.int64)
    for j in range(order, 0, -1):
        prev = np.diff(warm.astype(np.int64), n=j - 1)[-1]
        out = prev + np.cumsum(out)
    return np.concatenate([warm.astype(np.int64), out]) if order else out


def _lpc_coefs(s: np.ndarray, order: int, precision: int) -> tuple[np.ndarray, int]:
    """Levinson-Durbin on the plain autocorrelation, then quantize to
    ``precision``-bit signed coefficients with a common shift."""
    x = s.astype(np.float64)
    n = len(x)
    ac = np.array([float(x[: n - l] @ x[l:]) for l in range(order + 1)])
    if ac[0] == 0.0:
        return np.zeros(order, np.int64), 0
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - (a[:i] @ ac[i:0:-1][:i] if i else 0.0)
        k = acc / err
        a[:i], a[i] = a[:i] - k * a[i - 1 :: -1][:i], k
        err *= 1.0 - k * k
        if err <= 0:
            break
    cmax = float(np.max(np.abs(a))) or 1.0
    shift = precision - 1 - (int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.clip(np.round(a * (1 << shift)), -lim, lim - 1).astype(np.int64)
    return q, shift


def _lpc_residual(s: np.ndarray, qc: np.ndarray, shift: int) -> np.ndarray:
    order = len(qc)
    w = np.lib.stride_tricks.sliding_window_view(s.astype(np.int64), order)[:-1]
    pred = (w @ qc[::-1]) >> shift
    return s[order:].astype(np.int64) - pred


def _lpc_reconstruct(warm: np.ndarray, res: np.ndarray, qc: np.ndarray,
                     shift: int) -> np.ndarray:
    """Inherently sequential: each prediction is floor-shifted before
    feeding back, so no linear-filter vectorization is exact.  Python
    ints in a plain list keep the loop constant small."""
    order = len(qc)
    cs = [int(c) for c in qc]  # cs[0] multiplies the most recent sample
    rs = res.tolist()
    if order == 8:  # the encoder's default order: rolling registers
        c0, c1, c2, c3, c4, c5, c6, c7 = cs
        s7, s6, s5, s4, s3, s2, s1, s0 = (int(v) for v in warm)
        out = [s7, s6, s5, s4, s3, s2, s1, s0]
        ap = out.append
        for r in rs:
            v = r + ((s0 * c0 + s1 * c1 + s2 * c2 + s3 * c3 + s4 * c4
                      + s5 * c5 + s6 * c6 + s7 * c7) >> shift)
            ap(v)
            s7, s6, s5, s4, s3, s2, s1, s0 = s6, s5, s4, s3, s2, s1, s0, v
        return np.array(out, np.int64)
    out = [int(v) for v in warm] + [0] * len(res)
    csr = cs[::-1]
    rng = range(order)
    for i, r in enumerate(rs):
        acc = 0
        for j in rng:
            acc += out[i + j] * csr[j]
        out[order + i] = r + (acc >> shift)
    return np.array(out, np.int64)


# ----------------------------------------------------------- encoder

_BS_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
            256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
            8192: 13, 16384: 14, 32768: 15}
_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SS_BITS = {0: None, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _best_rice_k(res: np.ndarray) -> tuple[int, int]:
    """(k, total bits) for a single-partition rice coding of res."""
    r = res.astype(np.int64)
    u = ((r << 1) ^ (r >> 63)).astype(np.uint64)
    n = len(u)
    best_k, best = 0, None
    for k in range(15):
        tot = n * (k + 1) + int(np.sum(u >> np.uint64(k)))
        if best is None or tot < best:
            best_k, best = k, tot
        elif tot > best * 2:
            break  # monotone blow-up past the optimum
    return best_k, best


def _encode_residual(bb: _BitBuf, res: np.ndarray, order: int,
                     max_po: int = 6):
    """Partitioned Rice coding: pick the partition order and the
    per-partition parameter (or raw escape) that minimize total bits.
    Per-partition ``sum(u >> k)`` is additive, so the deepest level's
    (partition, k) cost matrix is computed once with ``reduceat`` and
    parents are pairwise sums — no re-scan per level."""
    blocksize = order + len(res)
    r = res.astype(np.int64)
    u = ((r << 1) ^ (r >> 63)).astype(np.uint64)
    po = 0
    while (po < max_po and blocksize % (1 << (po + 1)) == 0
           and (blocksize >> (po + 1)) > order):
        po += 1
    ks = np.arange(15, dtype=np.uint64)
    nparts = 1 << po
    # deepest-level partition boundaries over the residual array
    cnts = np.full(nparts, blocksize >> po, np.int64)
    cnts[0] -= order
    bounds = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    shifted = u[None, :] >> ks[:, None]             # (15, n)
    if len(u):
        sums = np.add.reduceat(shifted, bounds, axis=1).T.astype(np.int64)
        # reduceat quirk: an empty leading slice repeats; zero it
        sums[cnts == 0] = 0
        maxu = np.maximum.reduceat(u, bounds).astype(np.int64)
        maxu[cnts == 0] = 0
    else:
        sums = np.zeros((nparts, 15), np.int64)
        maxu = np.zeros(nparts, np.int64)
    def _signed_width(mx: np.ndarray) -> np.ndarray:
        # bit_length(max zigzag u) == two's-complement width that fits
        # every residual in the partition (exact via frexp, u << 2^53)
        return np.maximum(1, np.frexp(mx.astype(np.float64))[1].astype(np.int64))

    raw_w = _signed_width(maxu)
    best = None
    while True:
        rice = cnts[:, None] * (ks.astype(np.int64)[None, :] + 1) + sums
        per_part_rice = rice.min(axis=1)
        per_part_k = rice.argmin(axis=1)
        esc = 5 + cnts * np.minimum(raw_w, 31)
        use_esc = esc < per_part_rice
        cost = 4 + (1 << po) * 4 + int(np.where(use_esc, esc, per_part_rice).sum())
        if best is None or cost < best[0]:
            best = (cost, po, per_part_k.copy(), use_esc.copy(),
                    np.minimum(raw_w, 31).copy(), cnts.copy(), bounds.copy())
        if po == 0:
            break
        po -= 1
        sums = sums[0::2] + sums[1::2]
        maxu = np.maximum(maxu[0::2], maxu[1::2])
        raw_w = _signed_width(maxu)
        cnts = cnts[0::2] + cnts[1::2]
        bounds = bounds[0::2]
    _cost, po, per_k, use_esc, raw_ws, cnts, bounds = best
    bb.append(0, 2)  # method RICE (all chosen k <= 14 by construction)
    bb.append(po, 4)
    for p in range(1 << po):
        seg = res[bounds[p]:bounds[p] + cnts[p]]
        if use_esc[p]:
            bb.append(0b1111, 4)
            bb.append(int(raw_ws[p]), 5)
            bb.append_signed_array(seg, int(raw_ws[p]))
        else:
            bb.append(int(per_k[p]), 4)
            bb.append_rice_array(seg, int(per_k[p]))


def _subframe_cost_fixed(s: np.ndarray, order: int) -> tuple[int, np.ndarray]:
    res = _fixed_residual(s, order)
    _, bits = _best_rice_k(res)
    return bits + order * 17, res  # warmup approx cost (bps~16 +1 slack)


def _encode_subframe(bb: _BitBuf, s: np.ndarray, bps: int, use_lpc: bool = True):
    n = len(s)
    s = s.astype(np.int64)
    # wasted bits: common low zero bits across the block
    wasted = 0
    if np.any(s):
        orv = int(np.bitwise_or.reduce(s.astype(np.int64)) & ((1 << bps) - 1))
        wasted = (orv & -orv).bit_length() - 1 if orv else 0
    if wasted:
        s = s >> wasted
    eff = bps - wasted

    def header(type_code: int):
        bb.append(0, 1)
        bb.append(type_code, 6)
        if wasted:
            bb.append(1, 1)
            bb.append_unary(wasted - 1)
        else:
            bb.append(0, 1)

    if np.all(s == s[0]):
        header(0)  # CONSTANT
        bb.append(int(s[0]), eff)
        return
    cands: list[tuple[int, tuple]] = []
    for order in range(min(4, n - 1) + 1):
        bits, res = _subframe_cost_fixed(s, order)
        cands.append((bits, ("fixed", order, res)))
    if use_lpc and n > 16:
        order = min(8, n - 1)
        qc, shift = _lpc_coefs(s, order, precision=12)
        if np.any(qc):
            res = _lpc_residual(s, qc, shift)
            _, bits = _best_rice_k(res)
            cands.append((bits + order * (eff + 12) + 9, ("lpc", order, res, qc, shift)))
    bits, plan = min(cands, key=lambda c: c[0])
    if bits >= n * eff:  # rice lost to raw storage: VERBATIM
        header(1)
        bb.append_signed_array(s, eff)
        return
    if plan[0] == "fixed":
        _, order, res = plan
        header(0b001000 | order)
        bb.append_signed_array(s[:order], eff)
        _encode_residual(bb, res, order)
    else:
        _, order, res, qc, shift = plan
        header(0b100000 | (order - 1))
        bb.append_signed_array(s[:order], eff)
        bb.append(12 - 1, 4)   # coefficient precision
        bb.append(shift, 5)    # signed, always >= 0 here
        bb.append_signed_array(qc, 12)
        _encode_residual(bb, res, order)


def _sub_bits(s: np.ndarray, bps: int, use_lpc: bool) -> _BitBuf:
    bb = _BitBuf()
    _encode_subframe(bb, s, bps, use_lpc=use_lpc)
    return bb


def encode_flac(pcm: np.ndarray, sample_rate: int = 16000,
                block_size: int = 4096, use_lpc: bool = True) -> bytes:
    """16-bit PCM -> a complete FLAC stream (STREAMINFO + frames).

    Mono: 1-D int16.  Stereo: (n, 2) int16 — every frame picks the
    cheapest of the four channel assignments (independent, left/side,
    right/side, mid/side) by encoding each candidate's subframes and
    comparing exact bit costs; the side channel carries its 17th bit
    per spec."""
    s = np.asarray(pcm)
    if s.dtype != np.int16:
        raise ValueError("encode_flac takes int16 PCM")
    if s.ndim == 2 and s.shape[1] == 2:
        stereo = True
    elif s.ndim == 1:
        stereo = False
    else:
        raise NotImplementedError("encoder takes mono (n,) or stereo (n, 2)")
    n, bps = len(s), 16
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    frames = []
    fsizes = []
    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        blk = s[start:start + block_size]
        if len(blk) == 0:
            break
        if stereo:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            mid = (left + right) >> 1
            cands = {
                1: (_sub_bits(left, 16, use_lpc), _sub_bits(right, 16, use_lpc)),
                8: (_sub_bits(left, 16, use_lpc), _sub_bits(side, 17, use_lpc)),
                9: (_sub_bits(side, 17, use_lpc), _sub_bits(right, 16, use_lpc)),
                10: (_sub_bits(mid, 16, use_lpc), _sub_bits(side, 17, use_lpc)),
            }
            ch_code, (b0, b1) = min(
                cands.items(), key=lambda kv: kv[1][0].nbits + kv[1][1].nbits
            )
            bb = _BitBuf()
            bb.chunks = b0.chunks + b1.chunks
            bb.nbits = b0.nbits + b1.nbits
        else:
            ch_code = 0
            bb = _sub_bits(blk, bps, use_lpc)
        hdr = bytearray()
        bs_code = _BS_CODE.get(len(blk), 7)  # 7: 16-bit size-1 follows
        hdr += struct.pack(">HBB",
                           (0b11111111111110 << 2) | 0,  # sync+reserved+fixed
                           (bs_code << 4) | 0,           # blocksize | rate(STREAMINFO)
                           (ch_code << 4) | (_SS_CODE[bps] << 1) | 0)
        hdr += _utf8_code(fi)
        if bs_code == 7:
            hdr += struct.pack(">H", len(blk) - 1)
        hdr.append(_crc8(bytes(hdr)))
        frame = bytes(hdr) + bb.tobytes()
        frame += struct.pack(">H", _crc16(frame))
        frames.append(frame)
        fsizes.append(len(frame))
    info = _BitBuf()
    info.append(block_size, 16)
    info.append(block_size, 16)
    info.append(min(fsizes) if fsizes else 0, 24)
    info.append(max(fsizes) if fsizes else 0, 24)
    info.append(sample_rate, 20)
    info.append(1 if stereo else 0, 3)  # channels - 1
    info.append(bps - 1, 5)
    info.append(n, 36)
    body = info.tobytes() + md5
    head = _MAGIC + bytes([0x80]) + len(body).to_bytes(3, "big")  # last block
    return head + body + b"".join(frames)


# ----------------------------------------------------------- decoder

def _decode_residual(cur: _BitCursor, blocksize: int, order: int) -> np.ndarray:
    method = cur.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits, esc = (4, 0b1111) if method == 0 else (5, 0b11111)
    po = cur.read(4)
    nparts = 1 << po
    if blocksize % nparts or blocksize >> po <= order and nparts > 1:
        raise ValueError("invalid FLAC partition order")
    chunks = []
    for p in range(nparts):
        cnt = (blocksize >> po) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("invalid FLAC partition layout")
        k = cur.read(pbits)
        if k == esc:
            raw_w = cur.read(5)
            chunks.append(cur.read_signed_array(cnt, raw_w) if raw_w
                          else np.zeros(cnt, np.int64))
        else:
            chunks.append(cur.read_rice_array(cnt, k))
    return np.concatenate(chunks) if chunks else np.zeros(0, np.int64)


def _decode_subframe(cur: _BitCursor, blocksize: int, bps: int) -> np.ndarray:
    if cur.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = cur.read(6)
    wasted = 0
    if cur.read(1):
        wasted = cur.read_unary() + 1
    eff = bps - wasted
    if t == 0:
        out = np.full(blocksize, cur.read_signed(eff), np.int64)
    elif t == 1:
        out = cur.read_signed_array(blocksize, eff)
    elif 8 <= t <= 12:
        order = t - 8
        warm = cur.read_signed_array(order, eff)
        res = _decode_residual(cur, blocksize, order)
        out = _fixed_reconstruct(warm, res, order)
    elif t >= 32:
        order = (t & 31) + 1
        warm = cur.read_signed_array(order, eff)
        prec = cur.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code")
        shift = cur.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        qc = cur.read_signed_array(order, prec)
        res = _decode_residual(cur, blocksize, order)
        out = _lpc_reconstruct(warm, res, qc, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    return out << wasted if wasted else out


_NAMED_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
                7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def decode_flac(buf: bytes, verify_md5: bool = True,
                return_frames: bool = False,
                all_channels: bool = False):
    """FLAC stream -> int16 samples: channel 0 after stereo
    reconstruction (matching decode_wav's deterministic downmix), or
    the full (n, channels) array with ``all_channels``.  Verifies
    every frame CRC-8/CRC-16 and the STREAMINFO MD5 (interleaved,
    all channels).  ``return_frames`` also returns the frame count."""
    if buf[:4] != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos, info = 4, None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("truncated FLAC metadata")
        last, btype = buf[pos] >> 7, buf[pos] & 0x7F
        blen = int.from_bytes(buf[pos + 1:pos + 4], "big")
        body = buf[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            c = _BitCursor(body)
            info = dict(
                min_bs=c.read(16), max_bs=c.read(16),
                min_fs=c.read(24), max_fs=c.read(24),
                rate=c.read(20), channels=c.read(3) + 1, bps=c.read(5) + 1,
                total=c.read(36), md5=body[18:34],
            )
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    bps, nch = info["bps"], info["channels"]
    if bps not in (8, 12, 16, 20, 24, 32):
        raise NotImplementedError(f"{bps}-bit FLAC not supported")
    out_parts: list[np.ndarray] = []
    while pos < len(buf):
        fstart = pos
        if pos + 5 > len(buf):
            raise ValueError("truncated FLAC frame header")
        sync = (buf[pos] << 6) | (buf[pos + 1] >> 2)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        if (buf[pos + 1] >> 1) & 1:
            raise ValueError("reserved frame-header bit set")
        variable = buf[pos + 1] & 1
        bs_code = buf[pos + 2] >> 4
        sr_code = buf[pos + 2] & 0xF
        ch_code = buf[pos + 3] >> 4
        ss_code = (buf[pos + 3] >> 1) & 0x7
        if buf[pos + 3] & 1:
            raise ValueError("reserved frame-header bit set")
        _num, pos = _utf8_decode(buf, pos + 4)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = buf[pos] + 1
            pos += 1
        elif bs_code == 7:
            blocksize = int.from_bytes(buf[pos:pos + 2], "big") + 1
            pos += 2
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            pos += 1
        elif sr_code in (13, 14):
            pos += 2
        elif sr_code == 15:
            raise ValueError("invalid sample-rate code")
        elif sr_code and sr_code not in _NAMED_RATES:
            raise ValueError("reserved sample-rate code")
        if _crc8(buf[fstart:pos]) != buf[pos]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        pos += 1
        fbps = _SS_BITS.get(ss_code)
        if fbps is None:
            fbps = bps if ss_code == 0 else None
        if fbps is None:
            raise ValueError("reserved sample-size code")
        # bound the per-frame unpack region (else a long stream pays a
        # quadratic re-unpack); 64 bits/sample/channel covers every
        # subframe our scope decodes — retry unbounded if it was short
        def decode_frame_body(region: bytes):
            cur = _BitCursor(region)
            if ch_code < 8:
                if ch_code + 1 != nch:
                    raise ValueError("frame/STREAMINFO channel mismatch")
                chans = [_decode_subframe(cur, blocksize, fbps)
                         for _ in range(nch)]
            elif ch_code in (8, 9, 10):  # left/side, right/side, mid/side
                if nch != 2:
                    raise ValueError("stereo decorrelation in non-stereo stream")
                # the side (difference) channel carries one extra bit
                bps0 = fbps + (1 if ch_code == 9 else 0)
                bps1 = fbps + (1 if ch_code in (8, 10) else 0)
                c0 = _decode_subframe(cur, blocksize, bps0)
                c1 = _decode_subframe(cur, blocksize, bps1)
                if ch_code == 8:      # c0=left, c1=side; right = left - side
                    chans = [c0, c0 - c1]
                elif ch_code == 9:    # c0=side, c1=right; left = right + side
                    chans = [c1 + c0, c1]
                else:                 # c0=mid, c1=side
                    mid = (c0 << 1) | (c1 & 1)
                    chans = [(mid + c1) >> 1, (mid - c1) >> 1]
            else:
                raise ValueError("reserved channel assignment")
            cur.align()
            return chans, cur.pos // 8

        cap = pos + blocksize * nch * 8 + 4096
        try:
            chans, used = decode_frame_body(buf[pos:cap])
        except ValueError:
            if cap >= len(buf):
                raise
            chans, used = decode_frame_body(buf[pos:])
        pos += used
        if _crc16(buf[fstart:pos]) != int.from_bytes(buf[pos:pos + 2], "big"):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos += 2
        out_parts.append(np.stack(chans, axis=-1))  # (blocksize, nch)
    samples = (np.concatenate(out_parts) if out_parts
               else np.zeros((0, nch), np.int64))[: info["total"] or None]
    if info["total"] and len(samples) != info["total"]:
        raise ValueError("FLAC sample count mismatch")
    lim = 1 << (bps - 1)
    if np.any(samples >= lim) or np.any(samples < -lim):
        raise ValueError("FLAC decoded sample out of range")
    if verify_md5 and info["md5"] != b"\0" * 16 and bps == 16:
        # MD5 covers the interleaved LE samples of ALL channels
        if hashlib.md5(samples.astype("<i2").tobytes()).digest() != info["md5"]:
            raise ValueError("FLAC MD5 signature mismatch")
    if not all_channels:
        samples = samples[:, 0]  # deterministic downmix like decode_wav
    out = samples.astype(np.int16) if bps <= 16 else samples
    return (out, len(out_parts)) if return_frames else out
