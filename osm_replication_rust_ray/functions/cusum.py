"""Per-key CUSUM changepoint statistic — the classic sequential
drift / anomaly detector: with deltas ``d_t = cents(v_t) - target`` in
``(ts, id)`` order, ``CUSUM_t = max(0, CUSUM_{t-1} + d_t)``, which
unrolls to ``S_t - min(0, min_{j<=t} S_j)`` over prefix sums ``S`` —
so the WHOLE recurrence is an associative segmented scan, not a
per-row walk.

Per-segment state (T, M, X, D) =
  (total sum, min prefix incl. the empty prefix 0,
   max prefix incl. 0, max drift),
combined left-then-right as
  T' = Tl + Tr
  M' = min(Ml, Tl + Mr)
  X' = max(Xl, Tl + Xr)
  D' = max(Dl, Dr, Tl + Xr - Ml)
(the cross term is a drift peaking in the right part against a
running minimum from the left part).  Associativity makes the whole
operator ONE sort + per-block vectorized run summaries + a bounded
final combine: the final input is one row per (block, key-run) —
output-sized — and the combine itself is a vectorized Hillis-Steele
segmented scan, tree-reducible at extreme key cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .windows import _runs, _ts_int


def _seg_scan_combine(seg: np.ndarray, T, M, X, D):
    """Inclusive segmented scan of the CUSUM combine (associative) —
    Hillis-Steele doubling, ceil(log2 n) vectorized passes."""
    n = len(seg)
    T, M, X, D = (a.copy() for a in (T, M, X, D))
    d = 1
    while d < n:
        same = np.zeros(n, bool)
        same[d:] = seg[d:] == seg[:-d]
        tl = np.zeros(n, np.int64)
        ml = np.zeros(n, np.int64)
        xl = np.zeros(n, np.int64)
        dl = np.zeros(n, np.int64)
        tl[d:], ml[d:], xl[d:], dl[d:] = T[:-d], M[:-d], X[:-d], D[:-d]
        Tn = tl + T
        Mn = np.minimum(ml, tl + M)
        Xn = np.maximum(xl, tl + X)
        Dn = np.maximum(np.maximum(dl, D), tl + X - ml)
        T = np.where(same, Tn, T)
        M = np.where(same, Mn, M)
        X = np.where(same, Xn, X)
        D = np.where(same, Dn, D)
        d *= 2
    return T, M, X, D


def _run_summaries(keys, within, starts, ends):
    """Per-run (T, M, X, D) from within-run inclusive prefix sums."""
    n = len(within)
    run_id = np.zeros(n, np.int64)
    run_id[starts[1:]] = 1
    np.cumsum(run_id, out=run_id)
    # inclusive running min of the prefix within each run (doubling)
    cmin = within.copy()
    d = 1
    while d < n:
        prev = np.empty(n, np.int64)
        prev[:d] = np.iinfo(np.int64).max
        prev[d:] = cmin[:-d]
        same = np.zeros(n, bool)
        same[d:] = run_id[d:] == run_id[:-d]
        np.minimum(cmin, np.where(same, prev, np.iinfo(np.int64).max),
                   out=cmin)
        d *= 2
    drift = within - np.minimum(cmin, 0)
    T = within[ends - 1]
    M = np.minimum(np.minimum.reduceat(within, starts), 0)
    X = np.maximum(np.maximum.reduceat(within, starts), 0)
    D = np.maximum.reduceat(drift, starts)
    return T, M, X, D


def cusum_max(ds, key: str, ts: str, order_id: str, value: str,
              target_cents: int):
    """-> Dataset[key, cusum_max, net_cents]: per-key max CUSUM drift
    and total delta, deltas = round-half-up cents of ``value`` minus
    ``target_cents``, ordered by ``(ts, order_id)``."""
    sorted_ds = ds.sort([key, ts, order_id])

    def per_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({k: pa.array([], pa.int64()) for k in
                             (key, "tag_key", "tag_ts", "tag_id",
                              "t", "m", "x", "d")})
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tsv = _ts_int(batch[ts])
        ids = batch[order_id].to_numpy(zero_copy_only=False)
        v = batch[value].to_numpy(zero_copy_only=False)
        delta = (np.floor(v * 100.0 + 0.5).astype(np.int64)
                 - target_cents)
        starts, ends, run_id = _runs(keys)
        cum = np.cumsum(delta)
        within = cum - (cum - delta)[starts][run_id]
        T, M, X, D = _run_summaries(keys, within, starts, ends)
        nr = len(starts)
        return pa.table({
            key: pa.array(keys[starts], pa.int64()),
            # block tag = the block's FIRST-row sort triple: blocks are
            # globally ordered by (key, ts, id), so a key's chain of
            # summaries orders by the full triple (ts alone is not
            # monotone across key-majority blocks)
            "tag_key": pa.array(np.full(nr, int(keys[0])), pa.int64()),
            "tag_ts": pa.array(np.full(nr, int(tsv[0])), pa.int64()),
            "tag_id": pa.array(np.full(nr, int(ids[0])), pa.int64()),
            "t": pa.array(T, pa.int64()),
            "m": pa.array(M, pa.int64()),
            "x": pa.array(X, pa.int64()),
            "d": pa.array(D, pa.int64()),
        })

    summaries = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None)

    def finalize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "cusum_max": pa.array([], pa.int64()),
                             "net_cents": pa.array([], pa.int64())})
        keys = b[key].to_numpy(zero_copy_only=False)
        tk = b["tag_key"].to_numpy(zero_copy_only=False)
        tt = b["tag_ts"].to_numpy(zero_copy_only=False)
        ti = b["tag_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, tt, tk, keys))
        keys = keys[order]
        T, M, X, D = (b[c].to_numpy(zero_copy_only=False)[order]
                      for c in ("t", "m", "x", "d"))
        T, M, X, D = _seg_scan_combine(keys, T, M, X, D)
        last = np.concatenate((keys[1:] != keys[:-1], [True]))
        return pa.table({
            key: pa.array(keys[last], pa.int64()),
            "cusum_max": pa.array(D[last], pa.int64()),
            "net_cents": pa.array(T[last], pa.int64()),
        })

    # bounded final: one row per (block, key-run) — output-sized; the
    # combine is associative, so at extreme key cardinality this same
    # kernel tree-reduces instead of running in one task
    return summaries.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)
