"""Parity for the distributed Klee rectangle-union kernels: strip
sweep and quadtree cell kernel vs the independent O(n^2) cell
decomposition, plus the cell-scatter completeness invariant (per-cell
areas sum to the global measure)."""

import numpy as np

from osm_replication_rust_ray.functions.rectunion import (
    CELL,
    boxes_to_cells,
    brute_union_area,
    cell_union_area,
    strip_union_area,
)


def _rand_boxes(rng, n, lo, hi, wmax):
    x0 = rng.integers(lo, hi - 1, n)
    y0 = rng.integers(lo, hi - 1, n)
    w = rng.integers(1, wmax, n)
    h = rng.integers(1, wmax, n)
    return (x0.astype(np.int64), y0.astype(np.int64),
            np.minimum(x0 + w, hi).astype(np.int64),
            np.minimum(y0 + h, hi).astype(np.int64))


def test_strip_sweep_matches_brute():
    rng = np.random.default_rng(7)
    for n in (1, 2, 5, 20, 60):
        lx, ly, hx, hy = _rand_boxes(rng, n, 0, 500, 120)
        assert strip_union_area(lx, ly, hx, hy) == \
            brute_union_area(lx, ly, hx, hy)


def test_quadtree_split_matches_sweep_on_dense_cell():
    rng = np.random.default_rng(11)
    # dense hot cell: far more boxes than KMAX, heavy overlap
    lx, ly, hx, hy = _rand_boxes(rng, 1500, 0, CELL, 60000)
    got = cell_union_area(lx, ly, hx, hy, 0, 0, CELL, CELL)
    want = strip_union_area(lx, ly, hx, hy)
    assert got == want


def test_full_cover_shortcut():
    lx = np.array([0, 5], np.int64)
    ly = np.array([0, 5], np.int64)
    hx = np.array([100, 9], np.int64)
    hy = np.array([100, 9], np.int64)
    assert cell_union_area(lx, ly, hx, hy, 0, 0, 100, 100) == 10000


def test_cell_scatter_sums_to_global_measure():
    rng = np.random.default_rng(23)
    # boxes spanning several coarse cells, widths < CELL
    lx, ly, hx, hy = _rand_boxes(rng, 300, 0, 4 * CELL, 10_000_000)
    t = boxes_to_cells(lx, ly, hx, hy)
    cells = t["cell"].to_numpy()
    x0 = t["x0"].to_numpy()
    y0 = t["y0"].to_numpy()
    x1 = t["x1"].to_numpy()
    y1 = t["y1"].to_numpy()
    total = 0
    for c in np.unique(cells):
        m = cells == c
        cx, cy = int(c) // 1024, int(c) % 1024
        total += cell_union_area(
            x0[m], y0[m], x1[m], y1[m],
            cx * CELL, cy * CELL, (cx + 1) * CELL, (cy + 1) * CELL)
    # global measure via the strip sweep over the unclipped boxes
    assert total == strip_union_area(lx, ly, hx, hy)
