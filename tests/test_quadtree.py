"""Quadtree leaves: brute recursive-split parity + exact partition."""

import numpy as np
import pyarrow as pa


def brute_leaves(xs, ys, bits, depth, cap):
    def rec(d, cx, cy, idx):
        if len(idx) == 0:
            return []
        if len(idx) <= cap or d == depth:
            return [(d, cx, cy, len(idx))]
        sh = bits - d - 1
        out = []
        for dx in (0, 1):
            for dy in (0, 1):
                sub = [i for i in idx
                       if (xs[i] >> sh) & 1 == dx
                       and (ys[i] >> sh) & 1 == dy]
                out += rec(d + 1, cx * 2 + dx, cy * 2 + dy, sub)
        return out
    return set(rec(0, 0, 0, list(range(len(xs)))))


def run(ray_session, xs, ys, bits, depth, cap, parts=5):
    import ray.data

    from osm_replication_rust_ray.functions.quadtree import (
        quadtree_leaves,
    )

    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64()),
    })).repartition(parts)
    got = quadtree_leaves(ds, bits, depth, cap, len(xs)).to_pandas()
    return {(int(r.depth), int(r.cx), int(r.cy), int(r.n_points))
            for r in got.itertuples()}


def test_quadtree_brute_parity_skewed(ray_session):
    rng = np.random.default_rng(5)
    n, bits = 600, 10
    xs = rng.integers(0, 1 << bits, n).astype(np.int64)
    ys = rng.integers(0, 1 << bits, n).astype(np.int64)
    # hotspot: a quarter of the points in a 16-wide corner box
    hot = np.arange(n) % 4 == 0
    xs[hot] = 700 + (xs[hot] % 16)
    ys[hot] = 700 + (ys[hot] % 16)
    got = run(ray_session, xs, ys, bits, 5, 6)
    exp = brute_leaves(xs, ys, 10, 5, 6)
    assert got == exp
    assert sum(r[3] for r in got) == n  # exact partition
    assert max(r[0] for r in got) == 5  # hotspot forces the cap


def test_quadtree_all_fit_root(ray_session):
    xs = np.array([1, 2, 3], np.int64)
    ys = np.array([4, 5, 6], np.int64)
    assert run(ray_session, xs, ys, 8, 4, 8) == {(0, 0, 0, 3)}
