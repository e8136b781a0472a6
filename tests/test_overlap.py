"""Interval overlap join: brute parity incl. grid-straddling
intervals and exact-touch (non-)overlaps."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.overlap import (
    interval_overlap_join,
)


def run(ray_session, a, b, grid):
    import ray.data

    def tbl(rows):
        return ray.data.from_arrow(pa.table({
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "s": pa.array([r[1] for r in rows], pa.int64()),
            "e": pa.array([r[2] for r in rows], pa.int64()),
        })).repartition(4)

    got = interval_overlap_join(tbl(a), tbl(b), grid, n_part=4,
                                est_b_rows=len(b)).to_pandas()
    return {(int(r.id_a), int(r.id_b), int(r.overlap_us))
            for r in got.itertuples()}


def brute(a, b):
    out = set()
    for ia, sa, ea in a:
        for ib, sb, eb in b:
            if sa < eb and sb < ea:
                out.add((ia, ib, min(ea, eb) - max(sa, sb)))
    return out


@pytest.mark.parametrize("seed", [0, 4])
def test_overlap_random_parity(ray_session, seed):
    rng = np.random.default_rng(seed)
    grid = 1000

    def mk(n, base):
        s = rng.integers(0, 20000, n)
        d = rng.integers(1, grid, n)  # strictly shorter than the grid
        return [(base + i, int(s[i]), int(s[i] + d[i]))
                for i in range(n)]

    a, b = mk(150, 1000), mk(170, 5000)
    assert run(ray_session, a, b, grid) == brute(a, b)


def test_overlap_touching_is_not_overlap(ray_session):
    a = [(1, 0, 100)]
    b = [(2, 100, 200), (3, 99, 150), (4, 1000, 1001)]
    # half-open: touching at 100 does NOT overlap; (3) overlaps by 1
    assert run(ray_session, a, b, 500) == {(1, 3, 1)}


def test_overlap_rejects_oversized_interval(ray_session):
    a = [(1, 0, 700)]
    b = [(2, 0, 10)]
    with pytest.raises(Exception):
        run(ray_session, a, b, 600)
