"""Exact closest pair of points, distributed by grid neighborhoods.

The classic computational-geometry reduction to a data-parallel shape:
hash points to a fixed coarse grid; every pair at distance < CELL lies
in the same or 8-adjacent cells, so scattering each point to its own
cell plus 4 ghost directions (E, NE, N, NW — each unordered cell pair
exactly once) makes every candidate pair cell-local.  The global
minimum is exact whenever the candidate minimum is < CELL — guaranteed
here by the synthetic hotspot (thousands of points in one cell) and
asserted at runtime; the general fallback is one refinement round with
the grid rebuilt at the candidate minimum.

Per-cell kernel: one vectorized (own x all) distance matrix under the
deterministic tie rule (d2, id_lo, id_hi); only (cell, best, count)
summaries leave the group.
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


def cell_best_pair(g: pa.Table):
    """(d2, id_lo, id_hi, n_cand) for one cell group — own x own pairs
    plus own x ghost pairs, vectorized; None when no candidate."""
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
        dx = ox[:, None] - ox[None, :]
        dy = oy[:, None] - oy[None, :]
        d2 = dx * dx + dy * dy
        iu = np.triu_indices(n, k=1)
        consider(d2[iu], oid[iu[0]], oid[iu[1]])
        n_cand += n * (n - 1) // 2
    gx, gy, gid = x[ghost], y[ghost], pid[ghost]
    m = len(gid)
    if m and n:
        dx = ox[:, None] - gx[None, :]
        dy = oy[:, None] - gy[None, :]
        d2 = (dx * dx + dy * dy).reshape(-1)
        a = np.repeat(oid, m)
        b = np.tile(gid, n)
        consider(d2, a, b)
        n_cand += n * m
    if best is None:
        return None
    return best + (n_cand,)
