"""Real baseline JPEG codec (stages/jpeg.py): round-trip PSNR against
quality levels, lossy-invariant margin on the actual payload content,
marker/stream error gating, and decode_image dispatch."""

import numpy as np
import pytest

from osm_replication_rust_ray.sources.synth import make_image_bytes
from osm_replication_rust_ray.stages.decode import decode_image, decode_raw, psnr_db
from osm_replication_rust_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _smooth(h=64, w=64):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    return np.stack(
        np.meshgrid(x, y) + [np.full((h, w), 128.0)], axis=-1
    ).astype(np.uint8)


def test_smooth_content_psnr_by_quality():
    img = _smooth()
    prev = 0.0
    for q in (50, 75, 90, 95):
        p = psnr_db(decode_jpeg(encode_jpeg(img, q)), img)
        assert p > 35.0, (q, p)
        assert p >= prev - 0.5  # monotone-ish in quality
        prev = p
    assert psnr_db(decode_jpeg(encode_jpeg(img, 95)), img) > 50.0


def test_noise_content_matches_quantization_bound():
    """Worst-case content: the codec's PSNR must track the ideal
    quantize-dequantize bound (~35.8 dB at q95) — a deviation means an
    entropy-coder bug (the zigzag/dequantize mismatch this test pinned
    during development read 14 dB here)."""
    rng = np.random.default_rng(0)
    n = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    p = psnr_db(decode_jpeg(encode_jpeg(n, 95)), n)
    assert 34.0 < p < 38.0, p


def test_q100_near_lossless():
    rng = np.random.default_rng(1)
    n = rng.integers(0, 256, (24, 16, 3)).astype(np.uint8)
    assert psnr_db(decode_jpeg(encode_jpeg(n, 100)), n) > 50.0


def test_odd_sizes_roundtrip_shapes():
    rng = np.random.default_rng(2)
    for shape in [(1, 1, 3), (7, 5, 3), (17, 9, 3), (8, 64, 3), (9, 8, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 95))
        assert out.shape == img.shape


def test_payload_invariant_margin():
    """The gate bar: synthetic payload rows at quality 98 must clear the
    north-star 40 dB lossy invariant with margin."""
    for i in range(24):
        w = (16, 32, 64)[i % 3]
        h = (16, 32, 64)[(i + 1) % 3]
        img = decode_raw(make_image_bytes(i, w, h, 42), w, h)
        p = psnr_db(decode_jpeg(encode_jpeg(img, 98)), img)
        assert p >= 41.0, (i, p)


def test_encode_deterministic():
    img = _smooth(16, 16)
    assert encode_jpeg(img, 90) == encode_jpeg(img, 90)


def test_error_gating():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    img = _smooth(8, 8)
    buf = bytearray(encode_jpeg(img, 90))
    # flip SOF0 (FFC0) to SOF2: the baseline full-band scan script is
    # ILLEGAL progressive (DC scan with Se=63) and must be rejected,
    # not misdecoded
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se"):
        decode_jpeg(bytes(buf))
    # arithmetic-coded SOF (FFC9) stays gated
    buf3 = bytearray(encode_jpeg(img, 90))
    k = bytes(buf3).find(b"\xff\xc0")
    buf3[k + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="not supported"):
        decode_jpeg(bytes(buf3))
    # sampling factors beyond 2 must be gated
    buf2 = bytearray(encode_jpeg(img, 90))
    j = bytes(buf2).find(b"\xff\xc0")
    buf2[j + 11] = 0x31  # first component sampling byte: 3x1
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg(bytes(buf2))
    # a 4:4:4 entropy stream RELABELED 4:2:0 must fail, not misdecode
    buf4 = bytearray(encode_jpeg(img, 90))
    j = bytes(buf4).find(b"\xff\xc0")
    buf4[j + 11] = 0x22
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf4))
    with pytest.raises(ValueError, match="entropy|truncated"):
        decode_jpeg(bytes(encode_jpeg(img, 90))[:-30])


def test_decode_image_dispatch():
    img = _smooth(16, 32)
    buf = encode_jpeg(img, 95)
    out = decode_image(buf, 32, 16, "jpeg")
    assert out.shape == (16, 32, 3)
    assert psnr_db(out, img) > 40.0
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", 1, 1, "avif")


def test_restart_intervals_roundtrip():
    """DRI + RST0-7 markers: every interval produces EXACTLY the same
    pixels as the marker-free stream (resync discards padding bits and
    resets DC predictors; wrap-around past RST7 exercised at ri=1)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=95))
    for ri in (1, 2, 5, 7, 100):
        buf = encode_jpeg(img, quality=95, restart_interval=ri)
        assert (b"\xff\xdd" in buf) and (b"\xff\xd0" in buf or ri > 35)
        assert np.array_equal(decode_jpeg(buf), base), ri
    # a corrupted restart marker must be caught, not misparsed
    buf = bytearray(encode_jpeg(img, quality=95, restart_interval=2))
    j = bytes(buf).find(b"\xff\xd0")
    buf[j + 1] = 0xD6  # wrong RST index
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(bytes(buf))


def test_16bit_quant_tables_decode():
    """A stream whose DQT segments are rewritten in 16-bit (pq=1) form
    with identical values must decode to identical pixels."""
    import struct

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    buf = bytearray(encode_jpeg(img, quality=95))
    base = decode_jpeg(bytes(buf))
    out = bytearray(buf[:2])
    pos = 2
    while pos + 4 <= len(buf):
        marker = buf[pos + 1]
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        seg = bytes(buf[pos + 4 : pos + 2 + length])
        if marker == 0xDB:
            tq = seg[0] & 0xF
            vals = np.frombuffer(seg[1:65], np.uint8).astype(">u2")
            new = bytes([0x10 | tq]) + vals.tobytes()
            out += b"\xff\xdb" + struct.pack(">H", 2 + len(new)) + new
        else:
            out += buf[pos : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDA:
            out += buf[pos:]
            break
    assert np.array_equal(decode_jpeg(bytes(out)), base)


def test_progressive_pixels_equal_baseline():
    """The successive-approximation scan script (DC first/refine, AC
    first/refine with EOB runs and buffered correction bits) must
    reconstruct EXACTLY the baseline pixels — both encoders quantize
    identically, so any bit of scan-machinery drift shows up here."""
    rng = np.random.default_rng(5)
    from osm_replication_rust_ray.stages.jpeg import encode_jpeg_progressive

    for shape in ((40, 56, 3), (8, 8, 3), (17, 9, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for q in (50, 90, 98):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = encode_jpeg_progressive(img, quality=q)
            assert b"\xff\xc2" in prog and prog.count(b"\xff\xda") == 8
            assert np.array_equal(decode_jpeg(prog), base), (shape, q)
    # smooth gradient -> long EOB runs on the chroma components
    x = np.linspace(0, 255, 64)
    smooth = np.stack([np.tile(x, (64, 1))] * 3, -1).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(smooth, 85)),
        decode_jpeg(encode_jpeg(smooth, 85)),
    )


def test_progressive_restart_intervals():
    from osm_replication_rust_ray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 3, 7):
        buf = encode_jpeg_progressive(img, quality=90, restart_interval=ri)
        assert np.array_equal(decode_jpeg(buf), base), ri


def test_progressive_scan_pair_fuzz():
    """AC first + refinement scan pair over random coefficient blocks
    (the ZRL/EOB-run/correction-bit state machine, independent of the
    DCT): 60 seeded trials, every density regime."""
    import osm_replication_rust_ray.stages.jpeg as J

    enc_ac = J._build_huffman(*J.PROG_AC)
    dec_ac = J._build_huffman(*J.PROG_AC, decode=True)
    htabs = {(1, 0): dec_ac}
    rng = np.random.RandomState(0)
    for trial in range(60):
        blocks = [
            rng.randint(-8, 9, 63) * (rng.rand(63) < rng.choice([0.05, 0.2, 0.5]))
            for _ in range(rng.randint(1, 12))
        ]
        n = len(blocks)
        coefs = {1: np.zeros((n, 64), np.int64)}
        for ah, al in ((0, 1), (1, 0)):
            bw = J._BitWriter()
            w = J._ProgScanWriter(bw, enc_ac)
            emit = J._emit_ac_first if ah == 0 else J._emit_ac_refine
            for m in range(n):
                emit(w, blocks[m], al)
            w.flush_eob()
            bw.flush()
            J._decode_prog_scan(
                bytes(bw.out) + b"\xff\xd9", 0, [(1, 0, 0)],
                (1, 63, ah, al), htabs, coefs,
                (n, 1, {1: (1, 1, n, n, 1)}), 0,
            )
        assert np.array_equal(coefs[1][:, 1:64], np.array(blocks)), trial


def test_chroma_subsampling_roundtrip():
    """4:2:2 and 4:2:0 layouts (the ones real camera/libjpeg files
    use): correct shapes at odd sizes, high PSNR on smooth content,
    and EXACT parity with 4:4:4 on constant-chroma (grayscale-content)
    images — box downsample + replication upsample of a constant is
    the identity."""
    from osm_replication_rust_ray.stages.decode import psnr_db

    rng = np.random.default_rng(3)
    for sub in ("422", "420"):
        for shape in ((64, 64, 3), (17, 9, 3), (8, 8, 3), (9, 23, 3)):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            buf = encode_jpeg(img, 90, subsampling=sub)
            # SOF sampling byte must advertise the layout
            i = buf.find(b"\xff\xc0")
            assert buf[i + 11] == (0x21 if sub == "422" else 0x22)
            out = decode_jpeg(buf)
            assert out.shape == img.shape, (sub, shape)
        s = _smooth()
        assert psnr_db(decode_jpeg(encode_jpeg(s, 95, subsampling=sub)), s) > 42.0
        g = np.repeat(rng.integers(0, 256, (32, 32, 1)), 3, axis=2).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(g, 95))
        got = decode_jpeg(encode_jpeg(g, 95, subsampling=sub))
        assert psnr_db(got, base) > 55.0, sub
    # subsampling composes with restart markers bit-exactly
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
    b = decode_jpeg(encode_jpeg(img, 90, restart_interval=2, subsampling="420"))
    assert np.array_equal(a, b)


def test_optimal_huffman_tables():
    """Annex-K.2 two-pass optimization: identical pixels, strictly
    smaller files on both encoders (the progressive fixed-length AC
    table penalty in particular should mostly vanish), and correct
    composition with subsampling + restarts."""
    from osm_replication_rust_ray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    for shape in ((40, 56, 3), (17, 9, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, 90))
        b0, b1 = encode_jpeg(img, 90), encode_jpeg(img, 90, optimize=True)
        assert len(b1) < len(b0)
        assert np.array_equal(decode_jpeg(b1), base)
        p0 = encode_jpeg_progressive(img, 90)
        p1 = encode_jpeg_progressive(img, 90, optimize=True)
        assert len(p1) < len(p0)
        assert np.array_equal(decode_jpeg(p1), base)
        # composes with restarts (bit-identical pixels again)
        br = encode_jpeg(img, 90, optimize=True, restart_interval=3)
        assert np.array_equal(decode_jpeg(br), base)
        pr = encode_jpeg_progressive(img, 90, optimize=True, restart_interval=3)
        assert np.array_equal(decode_jpeg(pr), base)
    # subsampled + optimized decodes to the subsampled (non-optimized)
    # pixels exactly — tables change bytes, never pixels
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    s0 = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
    s1 = decode_jpeg(encode_jpeg(img, 90, subsampling="420", optimize=True))
    assert np.array_equal(s0, s1)


def test_progressive_subsampled():
    """Progressive + 4:2:0/4:2:2 — the common real-world JPEG shape:
    interleaved DC scans walk the padded MCU lattice while AC scans
    walk each component's TRUE block raster; pixels must be bit-equal
    to the baseline subsampled stream (same quantized coefficients),
    incl. with optimized tables and restart markers."""
    from osm_replication_rust_ray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    for sub in ("420", "422"):
        for shape in ((40, 56, 3), (17, 9, 3), (9, 23, 3)):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(img, 90, subsampling=sub))
            for kw in ({}, dict(optimize=True),
                       dict(optimize=True, restart_interval=2)):
                prog = encode_jpeg_progressive(img, 90, subsampling=sub, **kw)
                assert b"\xff\xc2" in prog
                assert np.array_equal(decode_jpeg(prog), base), (sub, shape, kw)


def test_malformed_streams_raise_value_error():
    """Truncations and random bit flips must surface as the codec
    error contract (ValueError / NotImplementedError / KeyError on a
    missing table id), never raw struct / index / overflow errors."""
    from osm_replication_rust_ray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 17, 3)).astype(np.uint8)
    for buf in (encode_jpeg_progressive(img, 90, subsampling="420",
                                        optimize=True),
                encode_jpeg(img, 90, subsampling="422", restart_interval=2)):
        for k in range(4, len(buf), 9):
            try:
                decode_jpeg(buf[:k])
            except (ValueError, NotImplementedError):
                pass
        for _t in range(120):
            b2 = bytearray(buf)
            b2[int(rng.integers(2, len(buf) - 2))] ^= 1 << int(rng.integers(8))
            try:
                decode_jpeg(bytes(b2))
            except (ValueError, NotImplementedError, KeyError):
                pass


def _encode_prog_noninterleaved_dc(img, quality, subsampling):
    """Alternative LEGAL scan script our encoder never emits:
    per-component DC scans (ns=1 -> the decoder's true-raster DC walk,
    incl. skipping MCU padding block columns) instead of one
    interleaved DC scan."""
    import struct

    import osm_replication_rust_ray.stages.jpeg as J

    factors = J._SUBSAMPLING[subsampling]
    h, w, qy, qc, coefs = J._comp_coefficients(img, quality, subsampling)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    geom = []
    for hs, vs in factors:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        geom.append((mcus_x * hs, -(-cw // 8), -(-ch // 8)))
    enc_dc = [J._build_huffman(*J.DC_LUM), J._build_huffman(*J.DC_CHROM)]
    enc_ac = J._build_huffman(*J.PROG_AC)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            q[J.ZIGZAG].astype(np.uint8)
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for (cid, qid), (hs, vs) in zip(((1, 0), (2, 1), (3, 1)), factors):
        out += bytes((cid, (hs << 4) | vs, qid))
    for cls, tid, spec in ((0, 0, J.DC_LUM), (0, 1, J.DC_CHROM),
                           (1, 0, J.PROG_AC)):
        bits, vals = spec
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)

    def sos(cids, tids, ss, se, ah, al):
        seg = bytearray([len(cids)])
        for c, t in zip(cids, tids):
            seg += bytes((c, t))
        seg += bytes((ss, se, (ah << 4) | al))
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + bytes(seg)

    for refine in (False, True):
        for ci, cid in enumerate((1, 2, 3)):
            t = 0 if ci == 0 else 1
            cols_b, cw_b, ch_b = geom[ci]
            out += sos((cid,), (t << 4,), 0, 0,
                       1 if refine else 0, 0 if refine else 1)
            bw = J._BitWriter()
            pred = 0
            for m in range(cw_b * ch_b):
                bi = (m // cw_b) * cols_b + (m % cw_b)
                c0 = int(coefs[ci][bi][0])
                if refine:
                    bw.write(c0 & 1, 1)
                    continue
                val = c0 >> 1
                diff = val - pred
                pred = val
                cat = J._category(diff)
                code, ln = enc_dc[t][cat]
                bw.write(code, ln)
                if cat:
                    bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
            bw.flush()
            out += bw.out
    for ah, al in ((0, 1), (1, 0)):
        for ci, cid in enumerate((1, 2, 3)):
            cols_b, cw_b, ch_b = geom[ci]
            out += sos((cid,), (0,), 1, 63, ah, al)
            bw = J._BitWriter()
            wtr = J._ProgScanWriter(bw, enc_ac)
            emit = J._emit_ac_first if ah == 0 else J._emit_ac_refine
            for m in range(cw_b * ch_b):
                bi = (m // cw_b) * cols_b + (m % cw_b)
                emit(wtr, coefs[ci][bi][1:64], al)
            wtr.flush_eob()
            bw.flush()
            out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_noninterleaved_dc_scans():
    """Single-component DC scans (the decode branch our encoder never
    emits) reconstruct pixel-identically — including a 4:2:0 size
    whose luma raster (3 block cols) is narrower than its padded MCU
    lattice (4): the walk must skip the padding column."""
    rng = np.random.default_rng(4)
    for sub, shape in (("444", (17, 9, 3)), ("420", (24, 8, 3)),
                       ("420", (40, 56, 3)), ("422", (9, 23, 3))):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        want = decode_jpeg(encode_jpeg(img, 90, subsampling=sub))
        buf = _encode_prog_noninterleaved_dc(img, 90, sub)
        assert np.array_equal(decode_jpeg(buf), want), (sub, shape)
