"""Mergeable sketches — the distributed-aggregate primitive family
(approximate distinct via HyperLogLog).

HLL is the canonical shuffle-friendly sketch: each block folds its
values into a fixed 2^p-byte register array, register arrays merge by
elementwise max (commutative/associative/idempotent), and the estimate
reads out once at the end — so a billion-key distinct-count moves only
kilobytes per group through the shuffle.

Standard HLL with the bias-corrected estimator (Flajolet et al. 2007
constants); deterministic splitmix64 hashing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12  # 4096 registers, ~1.6% standard error
_M = 1 << HLL_P


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_fold(values: np.ndarray, registers: np.ndarray | None = None) -> np.ndarray:
    """Fold int64 values into a (2^p,) uint8 register array."""
    if registers is None:
        registers = np.zeros(_M, np.uint8)
    if len(values) == 0:
        return registers
    h = _mix64(np.asarray(values).view(np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # leading-zero count of the remaining bits + 1
    rho = np.zeros(len(h), np.uint8)
    cur = rest
    bit = np.uint64(1) << np.uint64(63)
    # vectorized: rho = 64 - floor(log2(rest)) when rest>0
    fl = np.floor(np.log2(cur.astype(np.float64) + 1e-300)).astype(np.int64)
    rho = (63 - fl + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rho)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    m = float(_M)
    inv = np.power(2.0, -registers.astype(np.float64))
    e = _alpha(_M) * m * m / inv.sum()
    if e <= 2.5 * m:
        zeros = int((registers == 0).sum())
        if zeros:
            e = m * np.log(m / zeros)
    return float(e)


def approx_distinct(ds, group_col: str, value_col: str):
    """-> Dataset[(group_col, approx_n)] via per-batch HLL fold +
    grouped register merge (numpy max inside map_groups over a SMALL
    group domain; the registers themselves are what shuffles)."""

    def fold(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g = batch[group_col].to_pandas()
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_g, out_r = [], []
        for key, idx in pd.Series(range(len(g))).groupby(g.values).groups.items():
            regs = hll_fold(v[np.asarray(idx)])
            out_g.append(key)
            out_r.append(regs.tobytes())
        return pa.table(
            {
                group_col: pa.array(out_g),
                "__regs": pa.array(out_r, pa.binary()),
            }
        )

    folded = ds.map_batches(fold, batch_format="pyarrow", batch_size=65536)

    def merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(_M, np.uint8)
        for b in group["__regs"].to_pylist():
            regs = hll_merge(regs, np.frombuffer(b, np.uint8))
        return pa.table(
            {
                group_col: group[group_col].slice(0, 1),
                "approx_n": pa.array([hll_estimate(regs)], pa.float64()),
            }
        )

    return folded.groupby(group_col).map_groups(merge, batch_format="pyarrow")


# ---------------- Misra-Gries heavy hitters (mergeable) ----------------
#
# The mergeable-summaries form (Agarwal et al., PODS 2012): a summary
# of k counters over a stream of N items guarantees, for every key,
# c - N/(k+1) <= est <= c — and merging two summaries (add counts,
# subtract the (k+1)-th largest, drop nonpositive) preserves the bound
# for the COMBINED stream regardless of merge tree.  Hence any key
# with true count > N/(k+1) is guaranteed present in the final
# summary: the sketch is a sound candidate filter for exact
# heavy-hitter queries (communication O(blocks x k), never a
# vocab-sized shuffle).


def mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Reduce (keys, counts) — duplicate keys allowed — to <= k
    Misra-Gries counters.  Vectorized: one unique + one partition."""
    if len(keys) == 0:
        return keys, counts.astype(np.int64)
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, counts.astype(np.int64))
    if len(uniq) <= k:
        return uniq, sums
    # subtract the (k+1)-th largest count from all, keep positive
    d = np.partition(sums, len(sums) - (k + 1))[len(sums) - (k + 1)]
    keep = sums > d
    return uniq[keep], (sums[keep] - d)
