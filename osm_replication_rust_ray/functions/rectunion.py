"""Exact rectangle-union area (Klee's measure problem), distributed.

The classic 2-D coverage statistic — "how much ground do these boxes
actually cover" — over the derived extent boxes of the payload table
(the bbox analogue of the reference's per-element extents,
src/osmxml/bbox.rs:85-120).

Distribution shape: the plane is partitioned by a fixed coarse grid
(CELL decimicro on each axis, chosen > the widest derived box so every
box touches at most 2x2 cells).  Boxes scatter keys-only to the cells
they overlap, clipped; each cell's union area is then independent, so
the per-cell sweep runs under ``groupby(cell).map_groups`` with no
cross-cell communication and the per-cell areas are exact summands of
the global measure.  The group domain is bounded by the fixed grid
(<= ~23k cells over the whole world), not by the data.

Per-cell kernel: coordinate-compressed strip sweep, fully vectorized
(one (strips x boxes) mask matrix, running-max islands via
``np.maximum.accumulate``).  Skewed cells (the synthetic hotspot packs
~20% of all boxes into one cell) are handled by a LOCAL recursive
quadtree split: above KMAX boxes the cell splits in four, boxes
re-clip, and any sub-cell fully covered by a single box short-circuits
to its exact area — bounding both the matrix size and the work in
dense regions without any extra shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CELL = 1 << 24          # 16_777_216 decimicro > max box width (1e7)
KMAX = 512              # strip-sweep matrix cap before quadtree split
_NEG = np.int64(-(2**62))


def strip_union_area(lo_x: np.ndarray, lo_y: np.ndarray,
                     hi_x: np.ndarray, hi_y: np.ndarray) -> int:
    """Exact union area of k boxes via coordinate-compressed strips.

    O(k^2) time/space as one vectorized mask matrix — callers bound k
    (see cell_union_area).  Boxes must have positive width/height.
    """
    xs = np.unique(np.concatenate([lo_x, hi_x]))
    if len(xs) < 2:
        return 0
    widths = xs[1:] - xs[:-1]
    order = np.argsort(lo_y, kind="stable")
    ly, hy = lo_y[order], hi_y[order]
    lx, hx = lo_x[order], hi_x[order]
    # mask[s, j]: box j spans strip s = [xs[s], xs[s+1]) entirely
    # (box edges are strip edges, so partial overlap is impossible)
    mask = (lx[None, :] <= xs[:-1, None]) & (hx[None, :] >= xs[1:, None])
    top = np.where(mask, hy[None, :], _NEG)
    cm = np.maximum.accumulate(top, axis=1)
    prev = np.concatenate(
        [np.full((len(widths), 1), _NEG, np.int64), cm[:, :-1]], axis=1)
    # islands: each box (in lo_y order) contributes the part of its
    # y-interval above everything already covered
    contrib = np.where(
        mask, np.maximum(hy[None, :] - np.maximum(ly[None, :], prev), 0), 0)
    return int((contrib.sum(axis=1) * widths).sum())


def cell_union_area(lo_x: np.ndarray, lo_y: np.ndarray,
                    hi_x: np.ndarray, hi_y: np.ndarray,
                    cx0: int, cy0: int, cx1: int, cy1: int) -> int:
    """Union area of boxes clipped to cell [cx0,cx1) x [cy0,cy1).

    Full-cover short-circuit + recursive quadtree split above KMAX —
    dense (hot-cell) inputs cost O(area resolution) instead of O(k^2).
    """
    k = len(lo_x)
    if k == 0 or cx1 <= cx0 or cy1 <= cy0:
        return 0
    full = (lo_x <= cx0) & (hi_x >= cx1) & (lo_y <= cy0) & (hi_y >= cy1)
    if full.any():
        return int(cx1 - cx0) * int(cy1 - cy0)
    if k <= KMAX or (cx1 - cx0 <= 1 and cy1 - cy0 <= 1):
        return strip_union_area(lo_x, lo_y, hi_x, hi_y)
    mx, my = (cx0 + cx1) // 2, (cy0 + cy1) // 2
    total = 0
    for qx0, qx1 in ((cx0, mx), (mx, cx1)):
        if qx1 <= qx0:
            continue
        for qy0, qy1 in ((cy0, my), (my, cy1)):
            if qy1 <= qy0:
                continue
            m = (lo_x < qx1) & (hi_x > qx0) & (lo_y < qy1) & (hi_y > qy0)
            if not m.any():
                continue
            total += cell_union_area(
                np.maximum(lo_x[m], qx0), np.maximum(lo_y[m], qy0),
                np.minimum(hi_x[m], qx1), np.minimum(hi_y[m], qy1),
                qx0, qy0, qx1, qy1)
    return total


def brute_union_area(lo_x, lo_y, hi_x, hi_y) -> int:
    """Independent O(n^2) reference: full-plane cell decomposition."""
    lo_x, lo_y = np.asarray(lo_x, np.int64), np.asarray(lo_y, np.int64)
    hi_x, hi_y = np.asarray(hi_x, np.int64), np.asarray(hi_y, np.int64)
    xs = np.unique(np.concatenate([lo_x, hi_x]))
    ys = np.unique(np.concatenate([lo_y, hi_y]))
    total = 0
    for x0, x1 in zip(xs[:-1], xs[1:]):
        for y0, y1 in zip(ys[:-1], ys[1:]):
            if np.any((lo_x <= x0) & (hi_x >= x1)
                      & (lo_y <= y0) & (hi_y >= y1)):
                total += int(x1 - x0) * int(y1 - y0)
    return total


def boxes_to_cells(lo_x: np.ndarray, lo_y: np.ndarray,
                   hi_x: np.ndarray, hi_y: np.ndarray) -> pa.Table:
    """Scatter SHIFTED (non-negative) boxes to the coarse cells they
    overlap, clipped per cell — keys-only rows (cell, x0, y0, x1, y1).
    Box width/height < CELL means at most 2 cells per axis."""
    out_cell, out = [], {k: [] for k in ("x0", "y0", "x1", "y1")}
    cx_lo, cx_hi = lo_x // CELL, (hi_x - 1) // CELL
    cy_lo, cy_hi = lo_y // CELL, (hi_y - 1) // CELL
    for gx in (0, 1):
        cx = cx_lo + gx
        vx = cx <= cx_hi
        for gy in (0, 1):
            cy = cy_lo + gy
            m = vx & (cy <= cy_hi)
            if not m.any():
                continue
            out_cell.append(cx[m] * 1024 + cy[m])
            out["x0"].append(np.maximum(lo_x[m], cx[m] * CELL))
            out["x1"].append(np.minimum(hi_x[m], (cx[m] + 1) * CELL))
            out["y0"].append(np.maximum(lo_y[m], cy[m] * CELL))
            out["y1"].append(np.minimum(hi_y[m], (cy[m] + 1) * CELL))
    if not out_cell:
        return pa.table({"cell": pa.array([], pa.int64()),
                         **{k: pa.array([], pa.int64()) for k in out}})
    return pa.table({
        "cell": pa.array(np.concatenate(out_cell), pa.int64()),
        **{k: pa.array(np.concatenate(v), pa.int64())
           for k, v in out.items()},
    })
