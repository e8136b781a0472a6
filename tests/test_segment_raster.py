"""Segment supercover: SAT cell test vs a brute geometric reference,
and adjacent_pair_scatter block-boundary parity (cell counts identical
at any partitioning)."""

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.windows import adjacent_pair_scatter

G = 1000  # small grid for unit tests


def brute_cells(x0, y0, x1, y1):
    """Closed segment-vs-closed-cell intersection by exact rational
    clipping (Liang-Barsky), independent of the SAT formulation."""
    cells = set()
    for cx in range(min(x0, x1) // G, max(x0, x1) // G + 1):
        for cy in range(min(y0, y1) // G, max(y0, y1) // G + 1):
            lo, hi = Fraction(0), Fraction(1)
            dx, dy = x1 - x0, y1 - y0
            ok = True
            for p, q0, q1 in ((dx, cx * G - x0, cx * G + G - x0),
                              (dy, cy * G - y0, cy * G + G - y0)):
                if p == 0:
                    if q0 > 0 or q1 < 0:
                        ok = False
                        break
                else:
                    t0, t1 = Fraction(q0, p), Fraction(q1, p)
                    if t0 > t1:
                        t0, t1 = t1, t0
                    lo, hi = max(lo, t0), min(hi, t1)
            if ok and lo <= hi:
                cells.add((cx, cy))
    return cells


def sat_cells(x0, y0, x1, y1):
    cells = set()
    for cx in range(min(x0, x1) // G, max(x0, x1) // G + 1):
        for cy in range(min(y0, y1) // G, max(y0, y1) // G + 1):
            dx, dy = x1 - x0, y1 - y0
            cs = [dx * (cy * G + oy - y0) - dy * (cx * G + ox - x0)
                  for oy in (0, G) for ox in (0, G)]
            if not (all(c > 0 for c in cs) or all(c < 0 for c in cs)):
                cells.add((cx, cy))
    return cells


@pytest.mark.parametrize("seed", [3, 17])
def test_sat_matches_rational_clipping(seed):
    rng = np.random.default_rng(seed)
    for _ in range(300):
        x0, y0, x1, y1 = rng.integers(0, 8 * G, 4)
        assert sat_cells(int(x0), int(y0), int(x1), int(y1)) == \
            brute_cells(int(x0), int(y0), int(x1), int(y1))


def test_sat_degenerate_and_boundary_segments():
    # point segment
    assert sat_cells(2500, 2500, 2500, 2500) == {(2, 2)}
    # point exactly on a cell corner: floor-range convention keeps
    # only the upper-right cell as candidate
    assert sat_cells(2 * G, 3 * G, 2 * G, 3 * G) == {(2, 3)}
    # axis-aligned segment along a cell edge: both adjacent rows hit
    # within the candidate floor range
    got = sat_cells(100, 2 * G, 2900, 2 * G)
    assert got == {(0, 2), (1, 2), (2, 2)}


@pytest.mark.parametrize("parts", [1, 7, 23])
def test_pair_scatter_partition_invariance(ray_session, parts):
    rng = np.random.default_rng(29)
    n = 400
    keys = rng.integers(0, 5, n).astype(np.int64)
    ts = rng.integers(0, 10_000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    px = rng.integers(0, 6 * G, n).astype(np.int64)
    py = rng.integers(0, 6 * G, n).astype(np.int64)
    pv = (px << 20) | py

    import ray.data

    # defined as a closure so Ray pickles it by value (the test module
    # is not importable inside workers)
    def scatter_counts(k, v0, v1, t0, t1):
        m = (1 << 20) - 1
        out = {}
        for a, b in zip(v0.tolist(), v1.tolist()):
            x0, y0, x1, y1 = a >> 20, a & m, b >> 20, b & m
            for cx in range(min(x0, x1) // G, max(x0, x1) // G + 1):
                for cy in range(min(y0, y1) // G, max(y0, y1) // G + 1):
                    dx, dy = x1 - x0, y1 - y0
                    cs = [dx * (cy * G + oy - y0) - dy * (cx * G + ox - x0)
                          for oy in (0, G) for ox in (0, G)]
                    if not (all(c > 0 for c in cs)
                            or all(c < 0 for c in cs)):
                        key2 = cx * 4096 + cy
                        out[key2] = out.get(key2, 0) + 1
        cells = sorted(out)
        return pa.table({
            "cell": pa.array(cells, pa.int64()),
            "cnt": pa.array([out[c] for c in cells], pa.int64()),
        })

    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
        "event_id": pa.array(ids, pa.int64()),
        "pv": pa.array(pv, pa.int64()),
    })).repartition(parts)
    got = adjacent_pair_scatter(
        ds, "key", "ts", "event_id", "pv", scatter_counts).to_pandas()
    agg = got.groupby("cell")["cnt"].sum().to_dict()

    # brute: sort rows, scatter every same-key pair
    rows = sorted(zip(keys, ts, ids, pv))
    want = {}
    m = (1 << 20) - 1
    for (k0, _t0, _i0, a), (k1, _t1, _i1, b) in zip(rows, rows[1:]):
        if k0 != k1:
            continue
        for cx, cy in sat_cells(int(a) >> 20, int(a) & m,
                                int(b) >> 20, int(b) & m):
            want[cx * 4096 + cy] = want.get(cx * 4096 + cy, 0) + 1
    assert {int(k): int(v) for k, v in agg.items()} == want
