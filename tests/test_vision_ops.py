"""Unit parity for the classical-vision operators (moments, ordered
dithering, Hough lines): each vectorized kernel vs an independent
brute-force per-pixel reference on real synthetic payloads."""

import numpy as np
import pyarrow as pa

from osm_replication_rust_ray.sources.synth import payload_batch
from osm_replication_rust_ray.stages.decode import (
    BAYER8,
    DitherActor,
    HoughActor,
    MomentsActor,
    decode_image,
    _bayer8,
    _luma_fixed,
)


def _payload(n=9):
    return payload_batch(np.arange(n, dtype=np.int64))


def _images(batch):
    ws = batch["w"].to_numpy(zero_copy_only=False)
    hs = batch["h"].to_numpy(zero_copy_only=False)
    for buf, w, h, fmt in zip(batch["bytes"].to_pylist(), ws, hs,
                              batch["fmt"].to_pylist()):
        yield decode_image(buf, int(w), int(h), fmt)


def test_bayer_matrix_matches_recursive_construction():
    def rec(n):
        if n == 1:
            return np.array([[0]])
        b = rec(n // 2)
        return np.block([[4 * b + 0, 4 * b + 2], [4 * b + 3, 4 * b + 1]])

    assert np.array_equal(_bayer8(), rec(8))
    assert sorted(BAYER8.reshape(-1).tolist()) == list(range(64))


def test_moments_actor_matches_per_pixel_brute():
    batch = _payload()
    out = MomentsActor()(batch)
    for row, img in zip(out.to_pylist(), _images(batch)):
        l = _luma_fixed(img)
        h, w = l.shape
        m00 = m10 = m01 = sxx = syy = sxy = 0
        for y in range(h):
            for x in range(w):
                v = int(l[y, x])
                m00 += v
                m10 += v * x
                m01 += v * y
                sxx += v * x * x
                syy += v * y * y
                sxy += v * x * y
        assert (row["m00"], row["m10"], row["m01"]) == (m00, m10, m01)
        assert (row["sxx"], row["syy"], row["sxy"]) == (sxx, syy, sxy)


def test_dither_actor_matches_per_pixel_brute():
    batch = _payload()
    out = DitherActor()(batch)
    for row, img in zip(out.to_pylist(), _images(batch)):
        h, w, _ = img.shape
        ones = possum = pos = 0
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    pos += 1
                    if int(img[y, x, c]) * 65 > (int(BAYER8[y % 8, x % 8]) + 1) * 255:
                        ones += 1
                        possum += pos
        assert row["n_pix"] == h * w * 3
        assert row["ones"] == ones
        assert row["possum"] == possum


def test_hough_actor_matches_per_pixel_brute():
    cos = [1024, 946, 724, 392, 0, -392, -724, -946]
    sin = [0, 392, 724, 946, 1024, 946, 724, 392]
    batch = _payload()
    out = HoughActor()(batch)
    saw_edges = False
    for row, img in zip(out.to_pylist(), _images(batch)):
        l = _luma_fixed(img)
        votes = {}
        n_edges = 0
        for y in range(l.shape[0]):
            for x in range(l.shape[1]):
                if int(l[y, x]) > 127500:
                    n_edges += 1
                    for k in range(8):
                        b = (x * cos[k] + y * sin[k] + 131072) // 256
                        votes[(k, b)] = votes.get((k, b), 0) + 1
        assert row["n_edges"] == n_edges
        if not votes:
            assert (row["best_k"], row["best_bin"], row["best_votes"]) == (-1, -1, 0)
            continue
        saw_edges = True
        best = min(votes.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        assert row["best_k"] == best[0][0]
        assert row["best_bin"] == best[0][1]
        assert row["best_votes"] == best[1]
    assert saw_edges


def test_hough_zero_edge_sentinel():
    black = np.zeros((8, 8, 3), np.uint8)
    batch = pa.table({
        "image_id": pa.array(["imgX"], pa.string()),
        "bytes": pa.array([black.tobytes()], pa.binary()),
        "w": pa.array([8], pa.int32()),
        "h": pa.array([8], pa.int32()),
        "fmt": pa.array(["raw"], pa.string()),
    })
    row = HoughActor()(batch).to_pylist()[0]
    assert (row["n_edges"], row["best_k"], row["best_bin"], row["best_votes"]) \
        == (0, -1, -1, 0)
