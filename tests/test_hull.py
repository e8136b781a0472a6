"""Convex hull: prune safety, chain correctness, engineered shapes,
multi-block end-to-end parity."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.hull import (
    _prune,
    convex_hull,
    monotone_chain,
)


def run(ray_session, pids, xs, ys, parts=6):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "pid": pa.array(pids, pa.int64()),
        "x": pa.array(xs, pa.int64()),
        "y": pa.array(ys, pa.int64()),
    })).repartition(parts)
    df = convex_hull(ds).to_pandas().sort_values("seq")
    return list(zip(df["seq"].astype(int), df["pid"].astype(int),
                    df["x"].astype(int), df["y"].astype(int)))


def brute_hull(pids, xs, ys):
    best = {}
    for p, x, y in zip(pids.tolist(), xs.tolist(), ys.tolist()):
        key = (x, y)
        if key not in best or p < best[key]:
            best[key] = p
    hull = monotone_chain([(x, y, p) for (x, y), p in best.items()])
    return [(s, p, x, y) for s, (x, y, p) in enumerate(hull)]


@pytest.mark.parametrize("seed,n", [(1, 500), (6, 3000)])
def test_hull_random_parity(ray_session, seed, n):
    rng = np.random.default_rng(seed)
    pids = np.arange(10, 10 + n, dtype=np.int64)
    xs = rng.integers(0, 1 << 30, n).astype(np.int64)
    ys = rng.integers(0, 1 << 30, n).astype(np.int64)
    assert run(ray_session, pids, xs, ys) == brute_hull(pids, xs, ys)


def test_hull_collinear_and_duplicates(ray_session):
    # all points on one line, duplicate coords with different pids
    xs = np.array([0, 10, 20, 30, 30, 0], np.int64)
    ys = np.array([0, 10, 20, 30, 30, 0], np.int64)
    pids = np.array([5, 4, 3, 2, 9, 8], np.int64)
    got = run(ray_session, pids, xs, ys, parts=3)
    assert got == [(0, 5, 0, 0), (1, 2, 30, 30)]


def test_hull_square_with_interior(ray_session):
    xs = np.array([0, 100, 100, 0, 50, 60, 40], np.int64)
    ys = np.array([0, 0, 100, 100, 50, 30, 70], np.int64)
    pids = np.arange(1, 8, dtype=np.int64)
    got = run(ray_session, pids, xs, ys, parts=2)
    # CCW from lexicographic min (0,0): (0,0) (100,0) (100,100) (0,100)
    assert got == [(0, 1, 0, 0), (1, 2, 100, 0),
                   (2, 3, 100, 100), (3, 4, 0, 100)]
    # collinear mid-edge point must be EXCLUDED (strict hull)
    xs2 = np.append(xs, 50)
    ys2 = np.append(ys, 0)
    pids2 = np.append(pids, 99)
    assert run(ray_session, pids2, xs2, ys2, parts=2) == got


def test_prune_never_drops_hull_vertices():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = rng.integers(5, 400)
        xs = rng.integers(0, 1000, n).astype(np.int64)
        ys = rng.integers(0, 1000, n).astype(np.int64)
        keep = _prune(xs, ys)
        hull = {(x, y) for x, y, _p in monotone_chain(
            [(int(a), int(b), i) for i, (a, b) in enumerate(zip(xs, ys))])}
        kept = set(zip(xs[keep].tolist(), ys[keep].tolist()))
        assert hull <= kept
