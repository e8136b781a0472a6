"""Exact closest pair of points, distributed by grid neighborhoods.

The classic computational-geometry reduction to a data-parallel shape:
hash points to a fixed coarse grid; every pair at distance < CELL lies
in the same or 8-adjacent cells, so scattering each point to its own
cell plus 4 ghost directions (E, NE, N, NW — each unordered cell pair
exactly once) makes every candidate pair cell-local.  The global
minimum is exact whenever the candidate minimum is < CELL; when it is
not (no two points share a grid neighborhood at the starting cell
size), the query runs ONE refinement round with the grid rebuilt at
cell' = isqrt(candidate_min)+1 — the round-1 candidate is an upper
bound on the true minimum, so every potentially-closer pair is
cell-local under the rebuilt grid and round 2 is exact by
construction (round-4 advice item: this used to be a documented
fallback that actually raised).

Per-cell kernel: vectorized (own-block x all) distance matrices under
the deterministic tie rule (d2, id_lo, id_hi), the own-row sweep
chunked so the in-flight matrix never exceeds ``PAIR_BLOCK`` elements
regardless of how many points land in one (hot) cell; only
(cell, best, count) summaries leave the group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CP_CELL = 1 << 24

# ghost emit directions covering each unordered adjacent-cell pair once
_GHOST_DIRS = ((1, 0), (1, 1), (0, 1), (-1, 1))


def points_to_cells(ids: np.ndarray, x: np.ndarray, y: np.ndarray,
                    cell: int = CP_CELL) -> pa.Table:
    """Scatter points to (own cell, is_ghost=0) + 4 ghost cells."""
    cx, cy = x // cell, y // cell
    out_cell, out_id, out_x, out_y, out_g = [], [], [], [], []
    out_cell.append(cx * (1 << 20) + cy)
    out_id.append(ids)
    out_x.append(x)
    out_y.append(y)
    out_g.append(np.zeros(len(ids), np.int64))
    for dx, dy in _GHOST_DIRS:
        out_cell.append((cx + dx) * (1 << 20) + (cy + dy))
        out_id.append(ids)
        out_x.append(x)
        out_y.append(y)
        out_g.append(np.ones(len(ids), np.int64))
    return pa.table({
        "cell": pa.array(np.concatenate(out_cell), pa.int64()),
        "pid": pa.array(np.concatenate(out_id), pa.int64()),
        "x": pa.array(np.concatenate(out_x), pa.int64()),
        "y": pa.array(np.concatenate(out_y), pa.int64()),
        "ghost": pa.array(np.concatenate(out_g), pa.int64()),
    })


# in-flight distance-matrix element cap for the per-cell sweep: a hot
# cell with h points owns h(h-1)/2 pairs; chunking the own rows keeps
# peak memory at PAIR_BLOCK int64s (~128 MB) instead of h^2 (round-4
# advice item — the unchunked matrix was quadratic in hot-cell
# population and only safe because n_rows was pinned)
PAIR_BLOCK = 1 << 24


def cell_best_pair(g: pa.Table, pair_block: int = PAIR_BLOCK):
    """(d2, id_lo, id_hi, n_cand) for one cell group — own x own pairs
    plus own x ghost pairs, vectorized in bounded row blocks; None
    when no candidate."""
    pid = g["pid"].to_numpy(zero_copy_only=False)
    x = g["x"].to_numpy(zero_copy_only=False)
    y = g["y"].to_numpy(zero_copy_only=False)
    ghost = g["ghost"].to_numpy(zero_copy_only=False).astype(bool)
    ox, oy, oid = x[~ghost], y[~ghost], pid[~ghost]
    n = len(oid)
    if n == 0:
        return None
    best = None
    n_cand = 0

    def consider(d2, a, b):
        nonlocal best
        if len(d2) == 0:
            return
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        j = np.lexsort((hi, lo, d2))[0]
        cand = (int(d2[j]), int(lo[j]), int(hi[j]))
        if best is None or cand < best:
            best = cand

    if n > 1:
        bl = max(1, pair_block // n)
        cols = np.arange(n)
        for i0 in range(0, n - 1, bl):
            i1 = min(i0 + bl, n)
            dx = ox[i0:i1, None] - ox[None, :]
            dy = oy[i0:i1, None] - oy[None, :]
            d2 = dx * dx + dy * dy
            mask = cols[None, :] > np.arange(i0, i1)[:, None]
            a = np.repeat(oid[i0:i1], n)[mask.ravel()]
            b = np.tile(oid, i1 - i0)[mask.ravel()]
            consider(d2[mask], a, b)
        n_cand += n * (n - 1) // 2
    gx, gy, gid = x[ghost], y[ghost], pid[ghost]
    m = len(gid)
    if m and n:
        bl = max(1, pair_block // m)
        for i0 in range(0, n, bl):
            i1 = min(i0 + bl, n)
            dx = ox[i0:i1, None] - gx[None, :]
            dy = oy[i0:i1, None] - gy[None, :]
            d2 = (dx * dx + dy * dy).reshape(-1)
            a = np.repeat(oid[i0:i1], m)
            b = np.tile(gid, i1 - i0)
            consider(d2, a, b)
        n_cand += n * m
    if best is None:
        return None
    return best + (n_cand,)
