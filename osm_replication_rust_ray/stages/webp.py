"""WebP lossless (VP8L) codec from scratch — stdlib + numpy only.

Shrinks the engine's last image-format gap (stages/decode.py gated
"webp" as library-bound).  Implements the VP8L bitstream subset whose
wire constants are fully pinned by public, cross-checkable sources
(the format shares DEFLATE's canonical-prefix-code conventions):

* RIFF/WEBP/VP8L container, 0x2F signature, 14-bit dimensions,
  LSB-first bit order with DEFLATE-style MSB-first prefix codes,
* canonical prefix codes: "simple" (1-2 symbol) and "normal" form —
  code-length code in the VP8L transmission order, RLE symbols
  16/17/18, package-merge length-limited (15) code construction,
* LZ77 back-references with the VP8L prefix-coding of lengths and
  scan-line-order distance codes, plus the 32-bit color cache
  (multiplier 0x1e35a7bd) on both sides,
* the subtract-green transform (order-free, exactly invertible).

Explicitly GATED with clear errors (NotImplementedError), not
half-built: predictor / cross-color / color-indexing transforms,
meta prefix-code groups, and 2D distance codes (<= 120) — their wire
tables are order-sensitive lists this sandbox cannot verify against a
reference decoder (no libwebp, no network), and silently-misordered
tables would decode foreign files to wrong pixels.  The encoder never
emits any gated feature, so every stream this module produces uses
only the verified-constant subset.  Same interop posture as
stages/flac.py: structure is spec-exact and self-roundtrip is
bit-exact and fuzz-tested; cross-tool decode cannot be pinned here.
"""
from __future__ import annotations

import struct

import numpy as np

# VP8L code-length-code transmission order
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_CACHE_MUL = np.uint32(0x1E35A7BD)


# ---------------------------------------------------------------- bit I/O

class _LsbWriter:
    """LSB-first bit packer (VP8L/DEFLATE convention): ``write`` packs
    a value least-significant-bit first; ``write_code`` packs a prefix
    code most-significant-bit first."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int):
        rev = 0
        for _ in range(nbits):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.write(rev, nbits)

    def tobytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


class _LsbReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(
            np.frombuffer(data, np.uint8), bitorder="little"
        )
        self.pos = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        end = self.pos + nbits
        if end > len(self.bits):
            raise ValueError("truncated VP8L bitstream")
        v = 0
        for i in range(nbits - 1, -1, -1):
            v = (v << 1) | int(self.bits[self.pos + i])
        self.pos = end
        return v

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated VP8L bitstream")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b


# --------------------------------------------------------- prefix codes

def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, len), canonical (DEFLATE numbering: shorter
    first, then by symbol)."""
    by_len: dict[int, list[int]] = {}
    for sym, ln in lengths.items():
        if ln:
            by_len.setdefault(ln, []).append(sym)
    code, out = 0, {}
    for ln in range(1, max(by_len, default=0) + 1):
        for sym in sorted(by_len.get(ln, [])):
            out[sym] = (code, ln)
            code += 1
        if code > (1 << ln):
            raise ValueError("over-subscribed prefix code")
        code <<= 1
    return out


class _Decoder:
    """Prefix-code decoder over a (len, code) -> symbol map, reading
    code bits MSB-first from an LSB-first bit reader."""

    def __init__(self, lengths: dict[int, int]):
        nonzero = {s: l for s, l in lengths.items() if l}
        if len(nonzero) == 0:
            raise ValueError("empty prefix code")
        if len(nonzero) == 1:
            self.single = next(iter(nonzero))
            return
        self.single = None
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        self.max_len = max(l for l in lengths.values())

    @classmethod
    def simple(cls, symbols: list[int]):
        d = object.__new__(cls)
        if len(symbols) == 1:
            d.single = symbols[0]
        else:
            d.single = None
            d.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
            d.max_len = 1
        return d

    def read(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while ln < self.max_len:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _package_merge(freqs: dict[int, int], limit: int = 15) -> dict[int, int]:
    """Optimal length-limited prefix-code lengths (package-merge)."""
    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) <= 1:
        return {s: 1 for s in syms}
    if len(syms) > (1 << limit):
        raise ValueError("alphabet exceeds length limit capacity")
    lengths = {s: 0 for s in syms}
    items = sorted((freqs[s], s) for s in syms)
    leaves = [(f, [s]) for f, s in items]
    # level walk from depth `limit` up to 1; at each level keep only
    # the first 2(n-1) cheapest items (more can never be chosen), and
    # the final level's kept set IS the solution: each leaf occurrence
    # adds one to its symbol's code length
    chosen: list[tuple[int, list[int]]] = []
    packages: list[tuple[int, list[int]]] = []
    for _level in range(limit):
        merged = sorted(leaves + packages, key=lambda x: x[0])
        chosen = merged[: 2 * (len(syms) - 1)]
        packages = [
            (chosen[i][0] + chosen[i + 1][0], chosen[i][1] + chosen[i + 1][1])
            for i in range(0, len(chosen) - 1, 2)
        ]
    for _f, ss in chosen:
        for s in ss:
            lengths[s] += 1
    if any(v == 0 or v > limit for v in lengths.values()):
        raise AssertionError("package-merge produced invalid lengths")
    return lengths


# LZ77 prefix-coding of lengths / distance codes (both directions)

def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    b = x.bit_length() - 1
    code = 2 * b + ((x >> (b - 1)) & 1)
    return code, x & ((1 << (b - 1)) - 1), b - 1


def _prefix_decode(code: int, br: _LsbReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    base = (2 + (code & 1)) << extra
    return base + br.read(extra) + 1


# -------------------------------------------------------------- encoder

def _write_prefix_code(bw: _LsbWriter, lengths: dict[int, int],
                       alphabet_size: int):
    """Emit one prefix code: SIMPLE form for <= 2 symbols (< 256),
    normal code-length-coded form otherwise."""
    used = sorted(s for s, l in lengths.items() if l)
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        first = used[0]
        if first < 2:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # normal
    lens = [lengths.get(s, 0) for s in range(alphabet_size)]
    while lens and lens[-1] == 0:
        lens.pop()
    # RLE the code lengths into symbols 0-15, 16 (repeat prev 3-6),
    # 17 (zeros 3-10), 18 (zeros 11-138)
    rle: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    while i < len(lens):
        v = lens[i]
        j = i
        while j < len(lens) and lens[j] == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 3:
                take = min(run, 138)
                if take <= 10:
                    rle.append((17, take - 3, 3))
                else:
                    rle.append((18, take - 11, 7))
                run -= take
            rle.extend((0, 0, 0) for _ in range(run))
        else:
            rle.append((v, 0, 0))
            run -= 1
            while run >= 3:
                take = min(run, 6)
                rle.append((16, take - 3, 2))
                run -= take
            rle.extend((v, 0, 0) for _ in range(run))
        i = j
    clc_freq: dict[int, int] = {}
    for sym, _e, _n in rle:
        clc_freq[sym] = clc_freq.get(sym, 0) + 1
    clc_len = _package_merge(clc_freq, limit=7)
    if len(clc_len) == 1:  # single CLC symbol still needs a 1-bit code
        clc_len = {next(iter(clc_len)): 1}
    n_clc = max(
        (i + 1 for i, s in enumerate(_CLC_ORDER) if clc_len.get(s, 0)),
        default=4,
    )
    n_clc = max(n_clc, 4)
    bw.write(n_clc - 4, 4)
    for s in _CLC_ORDER[:n_clc]:
        bw.write(clc_len.get(s, 0), 3)
    # explicit max_symbol: the trailing zero lengths were trimmed, so
    # declare exactly how many symbol lengths the stream carries
    bw.write(1, 1)
    length_nbits = max(2, -(-max(len(lens) - 2, 1).bit_length() // 2) * 2)
    bw.write((length_nbits - 2) // 2, 3)
    bw.write(len(lens) - 2, length_nbits)
    codes = _canonical_codes(clc_len)
    for sym, extra, nbits in rle:
        c, ln = codes[sym]
        bw.write_code(c, ln)
        if nbits:
            bw.write(extra, nbits)


def _lz77(px: np.ndarray, min_len: int = 4, max_len: int = 4096):
    """Greedy scan-line LZ77 over uint32 ARGB pixels: yields
    ("lit", pixel) and ("copy", length, dist) tokens.  Single hash
    chain on pixel pairs, bounded probes."""
    n = len(px)
    tokens = []
    heads: dict[int, int] = {}
    i = 0
    arr = px
    while i < n:
        best_len, best_dist = 0, 0
        if i + 1 < n:
            key = (int(arr[i]) << 32) | int(arr[i + 1])
            j = heads.get(key)
            if j is not None:
                length = 2
                lim = min(max_len, n - i)
                while length < lim and arr[j + length] == arr[i + length]:
                    length += 1
                best_len, best_dist = length, i - j
            heads[key] = i
        if best_len >= min_len:
            tokens.append(("copy", best_len, best_dist))
            for k in range(i + 1, min(i + best_len, n - 1)):
                heads[(int(arr[k]) << 32) | int(arr[k + 1])] = k
            i += best_len
        else:
            tokens.append(("lit", int(arr[i])))
            i += 1
    return tokens


def encode_vp8l(img: np.ndarray, use_lz77: bool = True,
                subtract_green: bool = True) -> bytes:
    """(h, w, 3) or (h, w, 4) uint8 -> VP8L payload bytes (the content
    of the VP8L RIFF chunk)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_vp8l expects (h, w, 3|4) uint8")
    h, w = img.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be in 1..16384")
    r = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    b = img[..., 2].astype(np.uint32)
    a = (img[..., 3] if img.shape[2] == 4
         else np.full((h, w), 255, np.uint8)).astype(np.uint32)
    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if img.shape[2] == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform type: subtract green
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    px = ((a << 24) | (r << 16) | (g << 8) | b).ravel()
    tokens = _lz77(px) if use_lz77 else [("lit", int(p)) for p in px]
    # symbol streams
    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    coded = []
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            gs, rs, bs, as_ = (p >> 8) & 0xFF, (p >> 16) & 0xFF, p & 0xFF, p >> 24
            gfreq[gs] = gfreq.get(gs, 0) + 1
            rfreq[rs] = rfreq.get(rs, 0) + 1
            bfreq[bs] = bfreq.get(bs, 0) + 1
            afreq[as_] = afreq.get(as_, 0) + 1
            coded.append(("lit", gs, rs, bs, as_))
        else:
            _k, length, dist = t
            lc, le, ln = _prefix_encode(length)
            dist_code = dist + 120  # scan-line-order distance code
            dc, de, dn = _prefix_encode(dist_code)
            gfreq[256 + lc] = gfreq.get(256 + lc, 0) + 1
            dfreq[dc] = dfreq.get(dc, 0) + 1
            coded.append(("copy", lc, le, ln, dc, de, dn))
    glen = _package_merge(gfreq)
    rlen = _package_merge(rfreq)
    blen = _package_merge(bfreq)
    alen = _package_merge(afreq)
    dlen = _package_merge(dfreq) if dfreq else {0: 1}
    _write_prefix_code(bw, glen, 256 + 24)
    _write_prefix_code(bw, rlen, 256)
    _write_prefix_code(bw, blen, 256)
    _write_prefix_code(bw, alen, 256)
    _write_prefix_code(bw, dlen, 40)
    gc = _canonical_codes(glen)
    rc = _canonical_codes(rlen)
    bc = _canonical_codes(blen)
    ac = _canonical_codes(alen)
    dc_ = _canonical_codes(dlen)

    def put(codes, sym):
        if len(codes) > 1:  # single-symbol codes cost zero bits
            c, ln = codes[sym]
            bw.write_code(c, ln)

    for t in coded:
        if t[0] == "lit":
            _k, gs, rs, bs, as_ = t
            put(gc, gs)
            put(rc, rs)
            put(bc, bs)
            put(ac, as_)
        else:
            _k, lc, le, ln, dcode, de, dn = t
            put(gc, 256 + lc)
            bw.write(le, ln)
            put(dc_, dcode)
            bw.write(de, dn)
    return bw.tobytes()


def encode_webp(img: np.ndarray) -> bytes:
    """RIFF/WEBP container around a VP8L lossless payload."""
    payload = encode_vp8l(img)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# -------------------------------------------------------------- decoder

def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _Decoder:
    if br.read_bit():  # simple
        n_sym = br.read(1) + 1
        if br.read_bit():
            first = br.read(8)
        else:
            first = br.read(1)
        syms = [first]
        if n_sym == 2:
            syms.append(br.read(8))
        if any(s >= alphabet_size for s in syms):
            raise ValueError("simple-code symbol out of range")
        return _Decoder.simple(syms)
    n_clc = br.read(4) + 4
    clc_len = {}
    for s in _CLC_ORDER[:n_clc]:
        clc_len[s] = br.read(3)
    clc = _Decoder({s: l for s, l in clc_len.items() if l})
    max_symbol = alphabet_size
    if br.read_bit():  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("max_symbol exceeds alphabet")
    lengths: dict[int, int] = {}
    prev = 8
    sym = 0
    while sym < max_symbol:
        cl = clc.read(br)
        if cl < 16:
            if cl:
                lengths[sym] = cl
                prev = cl
            sym += 1
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < max_symbol:
                    lengths[sym] = prev
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    if not lengths:
        raise ValueError("empty normal prefix code")
    return _Decoder(lengths)


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L payload -> (h, w, 4) uint8 RGBA."""
    br = _LsbReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")
    subtract_green = False
    while br.read_bit():  # transforms
        ttype = br.read(2)
        if ttype == 2:
            if subtract_green:
                raise ValueError("duplicate subtract-green transform")
            subtract_green = True
        else:
            raise NotImplementedError(
                "VP8L transform type "
                f"{('predictor', 'cross-color', '', 'color-indexing')[ttype]}"
                " not supported (order-sensitive tables unverifiable in "
                "this sandbox; encoder never emits them)"
            )
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    if br.read_bit():
        raise NotImplementedError("VP8L meta prefix codes not supported")
    n_green = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    gdec = _read_prefix_code(br, n_green)
    rdec = _read_prefix_code(br, 256)
    bdec = _read_prefix_code(br, 256)
    adec = _read_prefix_code(br, 256)
    ddec = _read_prefix_code(br, 40)
    n = w * h
    px = np.zeros(n, np.uint32)
    cache = (np.zeros(1 << cache_bits, np.uint32) if cache_bits else None)
    shift = np.uint32(32 - cache_bits) if cache_bits else None
    i = 0
    while i < n:
        sym = gdec.read(br)
        if sym < 256:  # literal
            g = sym
            r = rdec.read(br)
            b = bdec.read(br)
            a = adec.read(br)
            p = (a << 24) | (r << 16) | (g << 8) | b
            px[i] = p
            if cache_bits:
                cache[int((np.uint32(p) * _CACHE_MUL) >> shift)] = p
            i += 1
        elif sym < 256 + 24:  # back-reference
            length = _prefix_decode(sym - 256, br)
            dcode = _prefix_decode(ddec.read(br), br)
            if dcode <= 120:
                raise NotImplementedError(
                    "VP8L 2D distance codes not supported (unverifiable "
                    "neighbour-ordering table; encoder emits scan-line codes)"
                )
            dist = dcode - 120
            if dist < 1 or dist > i or i + length > n:
                raise ValueError("VP8L back-reference out of range")
            for k in range(length):  # may overlap
                p = px[i - dist + k]
                px[i + k] = p
                if cache_bits:
                    cache[int((np.uint32(p) * _CACHE_MUL) >> shift)] = p
            i += length
        else:  # color-cache hit
            if not cache_bits:
                raise ValueError("cache symbol without color cache")
            px[i] = cache[sym - 256 - 24]
            i += 1
    a = (px >> 24) & 0xFF
    r = (px >> 16) & 0xFF
    g = (px >> 8) & 0xFF
    b = px & 0xFF
    if subtract_green:
        r = (r + g) & 0xFF
        b = (b + g) & 0xFF
    out = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    return out.reshape(h, w, 4)


def decode_webp(buf: bytes) -> np.ndarray:
    """RIFF/WEBP -> (h, w, 4) uint8 RGBA.  Lossless (VP8L) only; lossy
    VP8 chunks are a different codec (DCT-based) and stay gated."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError("lossy VP8 WebP not supported")
        pos += 8 + ln + (ln & 1)
    raise ValueError("WebP file has no VP8L chunk")
