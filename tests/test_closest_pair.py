"""Closest-pair grid scheme vs brute force: exact answer and exact
candidate census, including duplicate-position and cross-cell pairs."""

import numpy as np

from osm_replication_rust_ray.functions.closest import (
    cell_best_pair,
    points_to_cells,
)

CELL = 1000


def _grid_answer(ids, x, y):
    t = points_to_cells(ids, x, y, cell=CELL)
    cells = t["cell"].to_numpy()
    best, n_cand = None, 0
    for c in np.unique(cells):
        g = t.filter(np.equal(cells, c))
        r = cell_best_pair(g)
        if r is None:
            continue
        n_cand += r[3]
        if best is None or r[:3] < best:
            best = r[:3]
    return best, n_cand


def _brute(ids, x, y):
    best = None
    n_cand = 0
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if (abs(x[i] // CELL - x[j] // CELL) <= 1
                    and abs(y[i] // CELL - y[j] // CELL) <= 1):
                n_cand += 1
            d2 = int(x[i] - x[j]) ** 2 + int(y[i] - y[j]) ** 2
            lo, hi = sorted((int(ids[i]), int(ids[j])))
            cand = (d2, lo, hi)
            if best is None or cand < best:
                best = cand
    return best, n_cand


def test_grid_matches_brute_random():
    rng = np.random.default_rng(13)
    for trial in range(8):
        n = int(rng.integers(5, 120))
        ids = rng.permutation(10_000)[:n].astype(np.int64)
        # dense enough that the min distance is < CELL (scheme's
        # stated precondition, asserted by the engine at runtime)
        x = rng.integers(0, 4 * CELL, n).astype(np.int64)
        y = rng.integers(0, 4 * CELL, n).astype(np.int64)
        gb, gc = _grid_answer(ids, x, y)
        bb, bc = _brute(ids, x, y)
        assert gb[0] < CELL * CELL
        assert gb == bb
        assert gc == bc


def test_grid_duplicate_positions():
    ids = np.array([7, 3, 9], np.int64)
    x = np.array([500, 500, 2500], np.int64)
    y = np.array([500, 500, 900], np.int64)
    best, _ = _grid_answer(ids, x, y)
    assert best == (0, 3, 7)


def test_cross_cell_pair_found_once():
    # two points straddling a cell boundary: exactly one candidate
    ids = np.array([1, 2], np.int64)
    x = np.array([999, 1001], np.int64)
    y = np.array([500, 500], np.int64)
    best, n_cand = _grid_answer(ids, x, y)
    assert best == (4, 1, 2)
    assert n_cand == 1


def test_chunked_sweep_matches_unchunked():
    """Hot-cell row-block chunking (pair_block) must not change the
    best pair or the census."""
    rng = np.random.default_rng(21)
    n = 300
    ids = rng.permutation(10_000)[:n].astype(np.int64)
    x = rng.integers(0, CELL, n).astype(np.int64)  # one hot cell
    y = rng.integers(0, CELL, n).astype(np.int64)
    t = points_to_cells(ids, x, y, cell=CELL)
    cells = t["cell"].to_numpy()
    hot = t.filter(np.equal(cells, cells[0]))
    assert cell_best_pair(hot, pair_block=17) == cell_best_pair(hot)


def test_refinement_round_is_exact_on_sparse_points():
    """No two points share a grid neighborhood at the starting cell:
    round 1's candidate min proves nothing; the rebuilt grid at
    isqrt(cand)+1 must find the true closest pair."""
    import math

    ids = np.array([1, 2, 3], np.int64)
    x = np.array([0, 10 * CELL, 23 * CELL], np.int64)
    y = np.array([0, 0, 0], np.int64)

    def round_at(cell):
        t = points_to_cells(ids, x, y, cell=cell)
        cells = t["cell"].to_numpy()
        best = None
        for c in np.unique(cells):
            r = cell_best_pair(t.filter(np.equal(cells, c)))
            if r is not None and (best is None or r[:3] < best):
                best = r[:3]
        return best

    r1 = round_at(CELL)
    assert r1 is None or r1[0] >= CELL * CELL  # precondition violated
    cand = r1[0] if r1 else (x.max() - x.min()) ** 2 + 1
    r2 = round_at(math.isqrt(int(cand)) + 1)
    assert r2 == ((10 * CELL) ** 2, 1, 2)
