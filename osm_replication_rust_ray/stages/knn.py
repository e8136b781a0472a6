"""kNN nearest-feature lookup (north_rule capability; no reference
analogue — SURVEY §2 J4 extension).

Feature set = a point table (feature_id, lon, lat), broadcast once via
``ray.put``; each actor buckets the features by cell id at a chosen
resolution in ``__init__``.  Per query point the search expands k-rings
around the query's cell until a candidate is found, then keeps
expanding until the ring's minimum possible distance exceeds the best
candidate distance (correctness across cell boundaries), and finally
verifies exactly.  Ties break on the smallest feature_id
(deterministic replication requirement, SURVEY §7 "hard parts" #7).

Planar decimicro Euclidean distance, consistent with the engine's
integer geometry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells import LON_OFFSET, LON_SPAN, cell_from_xy, xy_at_res

DEFAULT_KNN_RES = 7


class CellKNNIndex:
    def __init__(self, feature_ids, lons, lats, res: int = DEFAULT_KNN_RES):
        self.res = res
        self.fid = np.asarray(feature_ids, np.int64)
        self.flon = np.asarray(lons, np.int64)
        self.flat = np.asarray(lats, np.int64)
        x, y = xy_at_res(self.flon, self.flat, res)
        self.cell_size = LON_SPAN / (1 << res)  # decimicro per cell edge
        key = (x << np.int64(32)) | y
        order = np.argsort(key, kind="stable")
        self.sorted_key = key[order]
        self.order = order
        self.n_grid = 1 << res

    def _bucket(self, x: int, y: int) -> np.ndarray:
        key = (np.int64(x) << np.int64(32)) | np.int64(y)
        lo = np.searchsorted(self.sorted_key, key, side="left")
        hi = np.searchsorted(self.sorted_key, key, side="right")
        return self.order[lo:hi]

    def query(self, qlon: np.ndarray, qlat: np.ndarray, k: int = 1):
        """-> (ids[n,k], dist2[n,k]) nearest features (id-tiebreak);
        missing neighbors filled with -1/inf.

        Small feature sets (<=1024) take a fully vectorized brute-force
        path (chunked distance matrix); the expanding-ring cell search
        only pays off when the feature set dwarfs the per-query
        candidate neighborhood."""
        qlon = np.asarray(qlon, np.int64)
        qlat = np.asarray(qlat, np.int64)
        n = len(qlon)
        out_ids = np.full((n, k), -1, np.int64)
        out_d2 = np.full((n, k), np.inf)
        if len(self.fid) == 0 or n == 0:
            return out_ids, out_d2
        if len(self.fid) <= 1024:
            order = np.argsort(self.fid, kind="stable")
            fid = self.fid[order]
            flon = self.flon[order].astype(np.float64)
            flat = self.flat[order].astype(np.float64)
            kk = min(k, len(fid))
            for s in range(0, n, 2048):
                e = min(s + 2048, n)
                d2 = (flon[None, :] - qlon[s:e, None].astype(np.float64)) ** 2 + (
                    flat[None, :] - qlat[s:e, None].astype(np.float64)
                ) ** 2
                # id-ascending feature order makes argpartition+stable
                # sort tie-break to the smallest id
                top = np.argsort(d2, axis=1, kind="stable")[:, :kk]
                out_ids[s:e, :kk] = fid[top]
                out_d2[s:e, :kk] = np.take_along_axis(d2, top, axis=1)
            return out_ids, out_d2
        # Large feature set: COHORT ring search (round-3 verdict item
        # #3 — the old version expanded rings per query ROW in Python).
        # All queries in the same grid cell share the exact same ring
        # buckets, so group queries by cell (np.unique boundaries on
        # the sorted cell key), expand rings ONCE per occupied query
        # cell with the cohort-max stopping bound, and batch the final
        # exact verify as one distance matrix per cohort.  Python cost
        # drops from O(query rows) to O(occupied query cells); every
        # inner step is a numpy kernel.
        qx, qy = xy_at_res(qlon, qlat, self.res)
        qkey = (qx.astype(np.int64) << np.int64(32)) | qy.astype(np.int64)
        order_q = np.argsort(qkey, kind="stable")
        skey = qkey[order_q]
        starts = np.flatnonzero(np.concatenate(([True], skey[1:] != skey[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        for s, e in zip(starts, ends):
            qidx = order_q[s:e]
            cand = self._expand_cohort(
                int(qx[qidx[0]]), int(qy[qidx[0]]),
                qlon[qidx], qlat[qidx], k,
            )
            if not len(cand):
                continue
            # id-ascending candidate order makes the stable argsort
            # tie-break to the smallest feature id (same rule as the
            # brute-force path)
            co = np.argsort(self.fid[cand], kind="stable")
            cand = cand[co]
            cfid = self.fid[cand]
            cflon = self.flon[cand].astype(np.float64)
            cflat = self.flat[cand].astype(np.float64)
            kk = min(k, len(cand))
            for cs in range(0, len(qidx), 2048):
                sel = qidx[cs:cs + 2048]
                d2 = (cflon[None, :] - qlon[sel, None].astype(np.float64)) ** 2 + (
                    cflat[None, :] - qlat[sel, None].astype(np.float64)
                ) ** 2
                top = np.argsort(d2, axis=1, kind="stable")[:, :kk]
                out_ids[sel[:, None], np.arange(kk)[None, :]] = cfid[top]
                out_d2[sel[:, None], np.arange(kk)[None, :]] = np.take_along_axis(
                    d2, top, axis=1
                )
        return out_ids, out_d2

    def _expand_cohort(self, cx: int, cy: int, qlon: np.ndarray,
                       qlat: np.ndarray, k: int) -> np.ndarray:
        """Ring expansion for ALL queries sharing cell (cx, cy).

        Stopping bound: a feature in ring R is >= (R-1)*cell_size from
        any point of the center cell, so expanding until
        ``ring > ceil(max_q best_d_q / cell) + 1`` guarantees every
        query's true top-k is inside the candidate set (the cohort max
        only ever widens the search — exactness is preserved, the
        final per-query verify is exact)."""
        found: list[np.ndarray] = []
        count = 0
        bounded = False
        ring = 0
        max_ring = self.n_grid
        while ring <= max_ring:
            # cells at Chebyshev distance exactly `ring`
            idxs = self._ring_buckets(cx, cy, ring)
            if len(idxs):
                found.append(idxs)
                count += len(idxs)
            if not bounded and count >= k:
                bounded = True
                best_d = self._best_d_cohort(found, qlon, qlat, k)
                max_ring = min(max_ring, int(np.ceil(best_d / self.cell_size)) + 1)
            ring += 1
        if not found:
            return np.empty(0, np.int64)
        return np.concatenate(found)

    def _best_d_cohort(self, found, qlon, qlat, k) -> float:
        """max over cohort queries of the kth-smallest candidate
        distance so far (chunked so the matrix stays bounded)."""
        cand = np.concatenate(found)
        cflon = self.flon[cand].astype(np.float64)
        cflat = self.flat[cand].astype(np.float64)
        kk = min(k, len(cand))
        worst = 0.0
        for s in range(0, len(qlon), 2048):
            d2 = (cflon[None, :] - qlon[s:s + 2048, None].astype(np.float64)) ** 2 + (
                cflat[None, :] - qlat[s:s + 2048, None].astype(np.float64)
            ) ** 2
            kth = np.partition(d2, kk - 1, axis=1)[:, kk - 1]
            worst = max(worst, float(kth.max()))
        return float(np.sqrt(worst))

    def _ring_buckets(self, cx: int, cy: int, ring: int) -> np.ndarray:
        hits = []
        if ring == 0:
            b = self._bucket(cx, cy)
            return b
        x0, x1 = cx - ring, cx + ring
        y0, y1 = cy - ring, cy + ring
        for x in range(max(0, x0), min(self.n_grid - 1, x1) + 1):
            for y in (y0, y1):
                if 0 <= y < self.n_grid:
                    b = self._bucket(x, y)
                    if len(b):
                        hits.append(b)
        for y in range(max(0, y0 + 1), min(self.n_grid - 1, y1 - 1) + 1):
            for x in (x0, x1):
                if 0 <= x < self.n_grid:
                    b = self._bucket(x, y)
                    if len(b):
                        hits.append(b)
        return np.concatenate(hits) if hits else np.empty(0, np.int64)


def brute_force_nn(fid, flon, flat, qlon, qlat):
    """Oracle: exact nearest feature per query (id tie-break)."""
    fid = np.asarray(fid, np.int64)
    flon = np.asarray(flon, np.float64)
    flat = np.asarray(flat, np.float64)
    # sort features by id so argmin picks the smallest id on ties
    o = np.argsort(fid, kind="stable")
    fid, flon, flat = fid[o], flon[o], flat[o]
    out_id = np.empty(len(qlon), np.int64)
    out_d2 = np.empty(len(qlon))
    for s in range(0, len(qlon), 1024):
        e = min(s + 1024, len(qlon))
        d2 = (flon[None, :] - np.asarray(qlon)[s:e, None].astype(np.float64)) ** 2 + (
            flat[None, :] - np.asarray(qlat)[s:e, None].astype(np.float64)
        ) ** 2
        j = np.argmin(d2, axis=1)
        out_id[s:e] = fid[j]
        out_d2[s:e] = d2[np.arange(e - s), j]
    return out_id, out_d2


class KNNActor:
    """`map_batches` actor: rows with (id_col, lon, lat) -> nearest
    feature id + squared distance."""

    def __init__(self, features_or_ref, res: int = DEFAULT_KNN_RES, k: int = 1,
                 id_col: str = "image_id",
                 out_cols: tuple[str, str] = ("nearest_feature_id", "nearest_dist2")):
        import ray

        feats = (
            ray.get(features_or_ref)
            if isinstance(features_or_ref, ray.ObjectRef)
            else features_or_ref
        )
        fid, flon, flat = feats
        self.index = CellKNNIndex(fid, flon, flat, res=res)
        self.k = k
        self.id_col = id_col
        self.out_cols = out_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, d2 = self.index.query(
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
            k=self.k,
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                self.out_cols[0]: pa.array(ids[:, 0], pa.int64()),
                self.out_cols[1]: pa.array(d2[:, 0], pa.float64()),
            }
        )
