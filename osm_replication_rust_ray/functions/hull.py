"""Distributed exact convex hull over integer 2-D points.

Shape: the classic two-level reduction —
  per-block VECTORIZED Akl-Toussaint prune (discard points strictly
  inside the octagon of the block's 8 directional extremes; provably
  never discards a hull vertex of the union)
  -> gather the bounded survivor set (expected O(sqrt(block)) for
  uniform data, O(hull) overall)
  -> ONE exact monotone-chain pass (Andrew's algorithm, exact integer
  cross products) over the survivors.

``hull(A u B) = hull(candidates(A) u candidates(B))`` because a point
strictly inside its own block's extreme octagon is strictly inside the
global hull.  Output: STRICT hull vertices (collinear mid-edge points
excluded), CCW order, seq 0 at the lexicographically smallest (x, y)
point — the same total-order convention the gift-wrapping SQL oracle
walks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# CCW angular order (E, NE, N, NW, W, SW, S, SE): the directional
# extremes taken in this order form a convex CCW octagon
_DIRS = np.array([[1, 0], [1, 1], [0, 1], [-1, 1],
                  [-1, 0], [-1, -1], [0, -1], [1, -1]], np.int64)


def _prune(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: False only for points STRICTLY inside the
    octagon spanned by the 8 directional extremes (Akl-Toussaint)."""
    n = len(x)
    if n <= 8:
        return np.ones(n, bool)
    proj = x[:, None] * _DIRS[:, 0][None, :] + y[:, None] * _DIRS[:, 1][None, :]
    ext = proj.argmax(axis=0)
    vx, vy = x[ext], y[ext]
    # order the extreme points CCW by angle bucket (the _DIRS order is
    # already CCW); dedup consecutive equals to avoid zero-length edges
    keep_v = np.ones(8, bool)
    for i in range(8):
        j = (i + 1) % 8
        if vx[i] == vx[j] and vy[i] == vy[j]:
            keep_v[j] = False
    vx, vy = vx[keep_v], vy[keep_v]
    m = len(vx)
    if m < 3:
        inside = np.zeros(n, bool)
    else:
        inside = np.ones(n, bool)
        for i in range(m):
            j = (i + 1) % m
            ex, ey = vx[j] - vx[i], vy[j] - vy[i]
            cr = ex * (y - vy[i]) - ey * (x - vx[i])
            inside &= cr > 0  # strictly left of every CCW octagon edge
    return ~inside


class HullCandidates:
    """map_batches callable: per-block Akl-Toussaint survivors."""

    def __call__(self, b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        keep = _prune(x, y)
        return pa.table({"pid": b["pid"].filter(pa.array(keep)),
                         "x": pa.array(x[keep], pa.int64()),
                         "y": pa.array(y[keep], pa.int64())})


def _cross(o, a, b) -> int:
    return ((a[0] - o[0]) * (b[1] - o[1])
            - (a[1] - o[1]) * (b[0] - o[0]))


def monotone_chain(pts: list[tuple[int, int, int]]):
    """Andrew's monotone chain over (x, y, pid) tuples -> STRICT hull,
    CCW, starting at the lexicographic minimum.  Exact Python ints."""
    pts = sorted(set(pts))
    if len(pts) == 1:
        return pts
    lower: list = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def convex_hull(pts):
    """``pts``: Dataset (pid, x, y) int64 -> Dataset (seq, pid, x, y):
    strict hull vertices CCW from the lexicographic (x, y) minimum.
    The survivor gather is bounded (block count x octagon boundary),
    the exact chain runs once over survivors only."""
    import ray.data as rd

    cands = pts.map_batches(HullCandidates(), batch_format="pyarrow",
                            batch_size=65536)

    def finalize(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        pid = b["pid"].to_numpy(zero_copy_only=False)
        # ties on (x, y): a duplicate coordinate can only yield one
        # hull vertex — keep the smallest pid (deterministic, matches
        # the oracle's argmin walk)
        order = np.lexsort((pid, y, x))
        x, y, pid = x[order], y[order], pid[order]
        first = np.concatenate((
            [True], (x[1:] != x[:-1]) | (y[1:] != y[:-1])))
        trip = list(zip(x[first].tolist(), y[first].tolist(),
                        pid[first].tolist()))
        hull = monotone_chain(trip)
        return pa.table({
            "seq": pa.array(np.arange(len(hull)), pa.int64()),
            "pid": pa.array([p[2] for p in hull], pa.int64()),
            "x": pa.array([p[0] for p in hull], pa.int64()),
            "y": pa.array([p[1] for p in hull], pa.int64()),
        })

    return cands.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
