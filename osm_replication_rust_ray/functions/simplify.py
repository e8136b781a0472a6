"""Douglas-Peucker polyline simplification kernel (exact int64).

Coordinates must live on a domain small enough that cross^2 fits
int64 (|coord| < 2^14 gives cross^2 <= ~2.9e17).  Split rule:
cross^2 > eps^2 * L^2 against the chord (squared point distance vs
eps^2 when the chord endpoints coincide); argmax tie -> smallest
index.  The kept set is the union of interval endpoints across the
recursion — the same invariant the SQL oracle's interval CTE uses.
"""

from __future__ import annotations

import numpy as np


def dp_keep_indices(x: np.ndarray, y: np.ndarray, eps: int) -> set[int]:
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    n = len(x)
    if n == 0:
        return set()
    if n == 1:
        return {0}
    kept = {0, n - 1}
    stack = [(0, n - 1)]
    e2 = eps * eps
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        xs, ys = x[lo + 1:hi], y[lo + 1:hi]
        dx, dy = x[hi] - x[lo], y[hi] - y[lo]
        l2 = dx * dx + dy * dy
        if l2 == 0:
            meas = (xs - x[lo]) ** 2 + (ys - y[lo]) ** 2
            thr = e2
        else:
            cross = dx * (ys - y[lo]) - dy * (xs - x[lo])
            meas = cross * cross
            thr = e2 * l2
        mx = meas.max()
        if mx > thr:
            j = lo + 1 + int(np.argmax(meas))  # first max = min idx
            kept.add(j)
            stack.append((lo, j))
            stack.append((j, hi))
    return kept
