"""Segment x polygon-edge crossing join: kernel parity vs brute-force
shapely-free reference, overflow guards, and the ViT patchify kernel."""

import numpy as np
import pytest

from osm_replication_rust_ray.functions.segclip import (
    SegmentEdgeIndex,
    check_edge_overflow,
    crossing_sql_terms,
)
from osm_replication_rust_ray.stages.decode import patch_grid_stats


def _brute_cross(qx1, qy1, qx2, qy2, ex1, ey1, ex2, ey2):
    """Scalar proper-crossing reference (same algebra, one pair at a
    time with Python ints — immune to any vectorization bug)."""
    dx, dy = ex2 - ex1, ey2 - ey1
    d1 = dx * (qy1 - ey1) - (qx1 - ex1) * dy
    d2 = dx * (qy2 - ey1) - (qx2 - ex1) * dy
    sdx, sdy = qx2 - qx1, qy2 - qy1
    d3 = sdx * (ey1 - qy1) - (ex1 - qx1) * sdy
    d4 = sdx * (ey2 - qy1) - (ex2 - qx1) * sdy
    return ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    )


def test_crossings_match_brute_force():
    rng = np.random.default_rng(7)
    n_edges, n_segs = 40, 300
    ex1 = rng.integers(-1000, 1000, n_edges)
    ey1 = rng.integers(-1000, 1000, n_edges)
    ex2 = ex1 + rng.integers(-300, 300, n_edges)
    ey2 = ey1 + rng.integers(-300, 300, n_edges)
    owner = rng.integers(0, 5, n_edges)
    idx = SegmentEdgeIndex(ex1, ey1, ex2, ey2, owner)
    qx1 = rng.integers(-1000, 1000, n_segs)
    qy1 = rng.integers(-1000, 1000, n_segs)
    qx2 = qx1 + rng.integers(-400, 400, n_segs)
    qy2 = qy1 + rng.integers(-400, 400, n_segs)
    si, ei = idx.crossings(qx1, qy1, qx2, qy2)
    got = set(zip(si.tolist(), ei.tolist()))
    want = {
        (s, e)
        for s in range(n_segs)
        for e in range(n_edges)
        if _brute_cross(
            int(qx1[s]), int(qy1[s]), int(qx2[s]), int(qy2[s]),
            int(ex1[e]), int(ey1[e]), int(ex2[e]), int(ey2[e]),
        )
    }
    assert got == want and len(want) > 50


def test_poly_cross_counts_group_by_owner():
    # two edges of poly 0 and one of poly 1, all crossed by one segment
    idx = SegmentEdgeIndex(
        [0, 10, 20], [-5, -5, -5], [0, 10, 20], [5, 5, 5], [0, 0, 1]
    )
    si, poly, n = idx.poly_cross_counts([-5], [1], [25], [1])
    by_poly = dict(zip(poly.tolist(), n.tolist()))
    assert si.tolist() == [0, 0] and by_poly == {0: 2, 1: 1}


def test_collinear_touch_excluded():
    # segment endpoint ON the edge: d1 == 0 -> not a proper crossing
    idx = SegmentEdgeIndex([0], [-10], [0], [10], [0])
    si, _ = idx.crossings([0], [0], [5], [0])
    assert len(si) == 0
    # overlapping collinear segments: all determinants zero
    si, _ = idx.crossings([0], [-20], [0], [20])
    assert len(si) == 0


def test_overflow_guards():
    with pytest.raises(ValueError, match="overflow"):
        check_edge_overflow([0], [0], [2**31], [2**33])
    idx = SegmentEdgeIndex([0], [-10], [0], [10], [0])
    with pytest.raises(ValueError, match="segment span"):
        idx.crossings([-(2**33)], [0], [2**33], [0])


def test_sql_terms_algebra_matches_kernel():
    # evaluate the emitted SQL for a handful of segments with DuckDB
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(3)
    ex1 = rng.integers(-100, 100, 6)
    ey1 = rng.integers(-100, 100, 6)
    ex2 = ex1 + rng.integers(-80, 80, 6)
    ey2 = ey1 + rng.integers(-80, 80, 6)
    idx = SegmentEdgeIndex(ex1, ey1, ex2, ey2, np.zeros(6, np.int64))
    terms = crossing_sql_terms(ex1, ey1, ex2, ey2, "qx1", "qy1", "qx2", "qy2")
    qx1 = rng.integers(-100, 100, 50)
    qy1 = rng.integers(-100, 100, 50)
    qx2 = qx1 + rng.integers(-120, 120, 50)
    qy2 = qy1 + rng.integers(-120, 120, 50)
    si, _ = idx.crossings(qx1, qy1, qx2, qy2)
    want = np.bincount(si, minlength=50)
    rows = ", ".join(
        f"({a}, {b}, {c}, {d})"
        for a, b, c, d in zip(qx1.tolist(), qy1.tolist(), qx2.tolist(), qy2.tolist())
    )
    got = duckdb.sql(
        f"SELECT {' + '.join(terms)} FROM (VALUES {rows}) t(qx1, qy1, qx2, qy2)"
    ).fetchnumpy()
    assert (next(iter(got.values())) == want).all()


def test_patch_grid_stats_parity_and_guard():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 16, 3), np.uint8)
    psum, pmin, pmax = patch_grid_stats(img, 4)
    for r in range(4):
        for c in range(4):
            blk = img[r * 8 : (r + 1) * 8, c * 4 : (c + 1) * 4]
            assert psum[r, c] == blk.astype(np.int64).sum()
            assert pmin[r, c] == blk.min() and pmax[r, c] == blk.max()
    with pytest.raises(ValueError, match="not divisible"):
        patch_grid_stats(img[:30], 4)


def test_resize_bilinear_fixed():
    from osm_replication_rust_ray.stages.decode import resize_bilinear_fixed

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 16, 3), np.uint8)
    out = resize_bilinear_fixed(img, 8, 8)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    # constant image -> constant output (blend weights sum to 65536)
    flat = np.full((32, 16, 3), 77, np.uint8)
    assert (resize_bilinear_fixed(flat, 8, 8) == 77).all()
    # within 1 of the float bilinear reference (Q8.8 truncation)
    h, w = 32, 16
    ys = (np.arange(8) + 0.5) * h / 8 - 0.5
    xs = (np.arange(8) + 0.5) * w / 8 - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = (ys - np.floor(ys))[:, None, None]
    fx = (xs - np.floor(xs))[None, :, None]
    src = img.astype(np.float64)
    ref = (
        src[np.ix_(y0, x0)] * (1 - fx) * (1 - fy)
        + src[np.ix_(y0, x1)] * fx * (1 - fy)
        + src[np.ix_(y1, x0)] * (1 - fx) * fy
        + src[np.ix_(y1, x1)] * fx * fy
    )
    assert np.abs(out.astype(np.float64) - ref).max() <= 1.5
    # upscale path (negative Q8.8 coords at the border) stays in range
    small = rng.integers(0, 256, (4, 4, 3), np.uint8)
    up = resize_bilinear_fixed(small, 8, 8)
    assert up.shape == (8, 8, 3) and up.min() >= 0
