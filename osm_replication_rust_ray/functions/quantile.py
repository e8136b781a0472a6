"""Exact distributed quantiles by iterative histogram refinement.

The classic distributed-selection algorithm (the exact-mode ancestor
of Spark's approxQuantile / Greenwald-Khanna): per (group, quantile)
target keep an integer value interval [lo, hi) known to contain the
target rank; each round histograms only rows inside active intervals
(<= _NBUCKETS buckets per target, partial counts combined through the
sorted-segment ladder — no per-group Python), narrows every interval
by ~_NBUCKETS x, and stops when the interval's occupancy is small
enough to collect exactly.  log_{_NBUCKETS}(range) rounds — 2-3 full
column scans for 64-bit ranges; each scan re-reads only the pruned
(group, value) projection, so nothing data-sized is ever pinned or
collected (the driver holds one histogram of <= targets x _NBUCKETS
rows per round and one final bucket of <= _COLLECT_CAP values per
target).

Rank rule (mirrored exactly by the SQL twin): the quantile num/den of
a group of n values is the value at 1-indexed rank
ceil(num * n / den) = (num*n + den - 1) // den of the sorted multiset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NBUCKETS = 4096         # histogram width per active target per round
_COLLECT_CAP = 262_144   # exact-collect when interval occupancy <= cap
_MAX_ROUNDS = 16         # 4096^6 > 2^64: structurally unreachable


class QuantileConvergenceError(RuntimeError):
    pass


def _group_stats(ds, group_col: str, value_col: str, est_groups: int):
    """(group -> (count, min, max)) via one combined pass."""
    from .agg import adaptive_group_aggregate

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "g": batch[group_col],
            "v": batch[value_col],
        })

    agg = adaptive_group_aggregate(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=65536),
        "g",
        {"n": ("v", "count"), "lo": ("v", "min"), "hi": ("v", "max")},
        est_rows=est_groups,
    )
    out = {}
    for row in agg.take_all():
        out[row["g"]] = (int(row["n"]), int(row["lo"]), int(row["hi"]))
    return out


def exact_group_quantiles(
    ds_factory,
    group_col: str,
    value_col: str,
    quantiles: list[tuple[str, int, int]],
    est_groups: int = 64,
) -> pa.Table:
    """Exact per-group quantiles of an int64 column.

    ``ds_factory()`` returns a fresh lazy Dataset projecting
    (group_col, value_col) — each refinement round re-executes the
    pruned read instead of pinning a data-sized materialization.
    ``quantiles`` is [(label, num, den), ...].

    Returns an arrow table (group_col, q_label, value) sorted by
    (group, label).
    """
    from .agg import adaptive_group_aggregate

    stats = _group_stats(ds_factory(), group_col, value_col, est_groups)

    # one target per (group, quantile): [lo, hi) contains the value at
    # group-rank ``rank``; ``below`` = rows of the group < lo
    targets = []
    for g, (n, lo, hi) in sorted(stats.items()):
        for label, num, den in quantiles:
            rank = (num * n + den - 1) // den
            if rank <= 0:
                rank = 1
            targets.append({
                "g": g, "label": label, "rank": rank,
                "lo": lo, "hi": hi + 1, "below": 0, "value": None,
            })

    for _round in range(_MAX_ROUNDS):
        # collapse single-value intervals, then keep the unresolved
        for t in targets:
            if t["value"] is None and t["hi"] - t["lo"] <= 1:
                t["value"] = t["lo"]
            t["collect"] = False
        active = [t for t in targets if t["value"] is None]
        if not active:
            break

        # per-target bucket shift so each interval maps into _NBUCKETS
        plan = []
        for tid, t in enumerate(active):
            span = t["hi"] - t["lo"]
            shift = max(0, int(span - 1).bit_length() - _NBUCKETS.bit_length() + 1)
            plan.append((t["g"], t["lo"], t["hi"], shift))
        plan_arr = plan  # closed over below (tiny: targets count)

        def hist(batch: pa.Table) -> pa.Table:
            g = batch[group_col].to_numpy(zero_copy_only=False)
            v = batch[value_col].to_numpy(zero_copy_only=False)
            tids, buckets, counts = [], [], []
            for tid, (tg, lo, hi, shift) in enumerate(plan_arr):
                m = (g == tg) & (v >= lo) & (v < hi)
                if not m.any():
                    continue
                b = (v[m] - lo) >> shift
                ub, cb = np.unique(b, return_counts=True)
                tids.append(np.full(len(ub), tid, np.int64))
                buckets.append(ub.astype(np.int64))
                counts.append(cb.astype(np.int64))
            if not tids:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            k = np.concatenate(tids) * np.int64(_NBUCKETS) + np.concatenate(buckets)
            return pa.table({"k": pa.array(k, pa.int64()),
                             "n": pa.array(np.concatenate(counts), pa.int64())})

        agg = adaptive_group_aggregate(
            ds_factory().map_batches(hist, batch_format="pyarrow",
                                     batch_size=65536),
            "k", {"n": ("n", "sum")},
            est_rows=len(active) * _NBUCKETS,
        )
        # driver merge bounded by targets x _NBUCKETS rows
        hist_rows = agg.take_all()
        per_tid: dict[int, dict[int, int]] = {}
        for row in hist_rows:
            k = int(row["k"])
            per_tid.setdefault(k // _NBUCKETS, {})[k % _NBUCKETS] = int(row["n"])

        progressed = False
        for tid, t in enumerate(active):
            tg, lo, hi, shift = plan_arr[tid]
            buckets = per_tid.get(tid, {})
            need = t["rank"] - t["below"]
            cum = 0
            for b in sorted(buckets):
                nb = buckets[b]
                if cum + nb >= need:
                    new_lo = lo + (b << shift)
                    new_hi = min(hi, lo + ((b + 1) << shift))
                    if (new_lo, new_hi) != (t["lo"], t["hi"]):
                        progressed = True
                    t["below"] += cum
                    t["lo"], t["hi"] = new_lo, new_hi
                    if nb <= _COLLECT_CAP and new_hi - new_lo > 1:
                        t["collect"] = True
                    break
                cum += nb
            else:
                raise QuantileConvergenceError(
                    f"target {t['g']}/{t['label']}: rank "
                    f"{t['rank']} not found in interval "
                    f"[{t['lo']}, {t['hi']}) — inconsistent input"
                )

        for t in active:
            if t["value"] is None and t["hi"] - t["lo"] <= 1:
                t["value"] = t["lo"]
        collect = [t for t in targets if t["value"] is None and t["collect"]]
        if collect:
            cplan = [(t["g"], t["lo"], t["hi"]) for t in collect]

            def gather(batch: pa.Table) -> pa.Table:
                g = batch[group_col].to_numpy(zero_copy_only=False)
                v = batch[value_col].to_numpy(zero_copy_only=False)
                tids, vals = [], []
                for tid, (tg, lo, hi) in enumerate(cplan):
                    m = (g == tg) & (v >= lo) & (v < hi)
                    if m.any():
                        tids.append(np.full(int(m.sum()), tid, np.int64))
                        vals.append(v[m])
                if not tids:
                    return pa.table({"t": pa.array([], pa.int64()),
                                     "v": pa.array([], pa.int64())})
                return pa.table({
                    "t": pa.array(np.concatenate(tids), pa.int64()),
                    "v": pa.array(np.concatenate(vals), pa.int64()),
                })

            rows = ds_factory().map_batches(
                gather, batch_format="pyarrow", batch_size=65536
            ).take_all()  # bounded: <= len(collect) x _COLLECT_CAP values
            by_tid: dict[int, list[int]] = {}
            for row in rows:
                by_tid.setdefault(int(row["t"]), []).append(int(row["v"]))
            for tid, t in enumerate(collect):
                vs = np.sort(np.asarray(by_tid.get(tid, []), np.int64))
                idx = t["rank"] - t["below"] - 1
                if idx < 0 or idx >= len(vs):
                    raise QuantileConvergenceError(
                        f"target {t['g']}/{t['label']}: residual rank "
                        f"{idx + 1} outside collected bucket of {len(vs)}"
                    )
                t["value"] = int(vs[idx])

        if all(t["value"] is not None for t in targets):
            break
        if not progressed and not collect:
            raise QuantileConvergenceError("no interval narrowed this round")
    else:
        raise QuantileConvergenceError(f"not converged in {_MAX_ROUNDS} rounds")

    targets.sort(key=lambda t: (t["g"], t["label"]))
    return pa.table({
        group_col: pa.array([t["g"] for t in targets], pa.string()),
        "q_label": pa.array([t["label"] for t in targets], pa.string()),
        "value": pa.array([t["value"] for t in targets], pa.int64()),
    })
