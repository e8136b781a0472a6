"""Douglas-Peucker kernel vs an independent recursive reference,
including collinear runs, duplicate points, and argmax ties."""

import numpy as np
import pytest

from osm_replication_rust_ray.functions.simplify import dp_keep_indices


def ref_dp(pts, eps):
    n = len(pts)
    if n == 0:
        return set()
    if n == 1:
        return {0}
    kept = {0, n - 1}

    def rec(lo, hi):
        if hi - lo < 2:
            return
        ax, ay = pts[lo]
        bx, by = pts[hi]
        l2 = (bx - ax) ** 2 + (by - ay) ** 2
        best_j, best_m = None, None
        for j in range(lo + 1, hi):
            px, py = pts[j]
            if l2 == 0:
                m = (px - ax) ** 2 + (py - ay) ** 2
            else:
                cr = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                m = cr * cr
            if best_m is None or m > best_m:
                best_j, best_m = j, m
        thr = eps * eps * (l2 if l2 else 1)
        if best_m is not None and best_m > thr:
            kept.add(best_j)
            rec(lo, best_j)
            rec(best_j, hi)

    rec(0, n - 1)
    return kept


@pytest.mark.parametrize("seed", [2, 9, 31])
def test_dp_matches_reference_random(seed):
    rng = np.random.default_rng(seed)
    for n in (1, 2, 3, 8, 40, 150):
        x = rng.integers(0, 16384, n).astype(np.int64)
        y = rng.integers(0, 16384, n).astype(np.int64)
        for eps in (0, 100, 600, 4000):
            got = dp_keep_indices(x, y, eps)
            want = ref_dp(list(zip(x.tolist(), y.tolist())), eps)
            assert got == want, (n, eps)


def test_dp_collinear_and_duplicates():
    # perfectly collinear: only the endpoints survive any eps > 0
    x = np.arange(0, 1000, 10, dtype=np.int64)
    y = 2 * x
    assert dp_keep_indices(x, y, 1) == {0, len(x) - 1}
    # closed loop (endpoints coincide): distance-to-point rule kicks in
    x = np.array([100, 100, 5000, 100], np.int64)
    y = np.array([100, 4000, 100, 100], np.int64)
    kept = dp_keep_indices(x, y, 600)
    assert kept == ref_dp(list(zip(x.tolist(), y.tolist())), 600)
    assert len(kept) > 2
    # symmetric tie: two interior points at equal measure -> first wins
    x = np.array([0, 100, 300, 400], np.int64)
    y = np.array([0, 900, 900, 0], np.int64)
    kept = dp_keep_indices(x, y, 5)
    assert kept == ref_dp(list(zip(x.tolist(), y.tolist())), 5)
