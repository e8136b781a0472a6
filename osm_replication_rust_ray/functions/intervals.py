"""Per-key interval-union coverage (merged busy time / coverage length).

The classic temporal operator the reference's diff windows imply but
never name: given per-key half-open intervals ``[s, e)``, compute per
key the LENGTH of their union and the number of merged islands —
session-overlap / sensor-uptime / validity-window coverage.

Exact distributed shape (the running_sum_cents pattern,
functions/windows.py): one range-partition sort by ``(key, s, e, id)``
carries everything; each interval's contribution is

    max(0, e_i - max(s_i, cme_i))          (covered length)
    [cme_i is unset or s_i > cme_i]        (new island)

where ``cme_i`` is the EXCLUSIVE running max of ``e`` over the key's
earlier intervals in sort order — a formulation with a single scalar
of cross-block state per (block, key): the carry cummax.  Interior
runs of a block reduce locally; the block's first run is emitted raw
("pending") and resolved in a second pass once the per-block carry is
known from a bounded driver walk over one summary row per block
(O(n_blocks), same as windows.running_sum_cents).

The exclusive cummax inside a block is a segmented Hillis-Steele
doubling scan — O(n log n) fully-vectorized int64 ops, no per-run
Python, no overflow-prone key packing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .agg import adaptive_group_aggregate
from .windows import _runs

# sentinel for "no earlier interval": smaller than any epoch-us value
_SENT = np.int64(-(1 << 62))


def segmented_cummax_excl(x: np.ndarray, run_id: np.ndarray) -> np.ndarray:
    """Exclusive running max of ``x`` within each run (run starts get
    ``_SENT``).  Hillis-Steele doubling: ceil(log2 n) vectorized passes,
    exact int64 (no float, no packed-key overflow)."""
    n = len(x)
    # shift by one within runs: position i sees values [run_start, i-1]
    excl = np.full(n, _SENT, np.int64)
    if n > 1:
        same = run_id[1:] == run_id[:-1]
        excl[1:][same] = x[:-1][same]
    d = 1
    while d < n:
        prev = np.full(n, _SENT, np.int64)
        prev[d:] = excl[:-d]
        same = np.zeros(n, bool)
        same[d:] = run_id[d:] == run_id[:-d]
        np.maximum(excl, np.where(same, prev, _SENT), out=excl)
        d *= 2
    return excl


def _contrib(s: np.ndarray, e: np.ndarray, cme: np.ndarray):
    """(covered, new_island) per interval given its exclusive cummax."""
    floor = np.maximum(s, cme)
    cov = np.maximum(e - floor, 0)
    isl = (cme == _SENT) | (s > cme)
    return cov.astype(np.int64), isl


def interval_coverage(ds, key: str, s_col: str, e_col: str, id_col: str,
                      est_keys: int | None = None):
    """-> Dataset[key, covered, n_islands] for half-open [s, e) rows."""
    sorted_ds = ds.sort([key, s_col, e_col, id_col])

    def per_block(batch: pa.Table) -> pa.Table:
        schema = {
            "__kind": pa.string(), key: pa.int64(),
            "cov": pa.int64(), "isl": pa.int64(),
            "s_": pa.int64(), "e_": pa.int64(), "excl": pa.int64(),
            "tag_id": pa.int64(),
            "s_s": pa.int64(), "s_e": pa.int64(),
            "s_last_key": pa.int64(), "s_last_maxe": pa.int64(),
        }
        n = len(batch)
        if n == 0:
            return pa.table({c: pa.array([], t) for c, t in schema.items()})
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch[s_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch[e_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends, run_id = _runs(keys)
        cme = segmented_cummax_excl(e, run_id)
        tag = int(ids[0])

        def table(kind, cols):
            m = len(cols[key])
            out = {}
            for c, t in schema.items():
                if c == "__kind":
                    out[c] = pa.array([kind] * m, t)
                elif c in cols:
                    out[c] = pa.array(np.asarray(cols[c], np.int64), t)
                else:
                    out[c] = pa.nulls(m, t)
            return pa.table(out)

        parts = []
        # interior runs (complete: the key changed at the run start)
        first_end = int(ends[0])
        if first_end < n:
            cov, isl = _contrib(s[first_end:], e[first_end:], cme[first_end:])
            i_starts = starts[1:] - first_end
            parts.append(table("f", {
                key: keys[starts[1:]],
                "cov": np.add.reduceat(cov, i_starts),
                "isl": np.add.reduceat(isl.astype(np.int64), i_starts),
            }))
        # first run: pending until the carry cummax is known
        parts.append(table("p", {
            key: keys[:first_end], "s_": s[:first_end],
            "e_": e[:first_end], "excl": cme[:first_end],
            "tag_id": np.full(first_end, tag, np.int64),
        }))
        # one summary row: orders blocks + chains the carry
        last_start = int(starts[-1])
        parts.append(table("s", {
            key: keys[:1], "tag_id": [tag], "s_s": s[:1], "s_e": e[:1],
            "s_last_key": keys[-1:],
            "s_last_maxe": [int(e[last_start:].max())],
        }))
        return pa.concat_tables(parts)

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()  # pins block boundaries (sort re-exec would re-split)

    # bounded driver walk: one summary row per block, in block order
    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow",
    ).take_all()
    summaries.sort(key=lambda r: (r[key], r["s_s"], r["s_e"], r["tag_id"]))
    offsets: dict[int, int] = {}
    carry: dict[int, int] = {}
    for r in summaries:
        fk, lk = r[key], r["s_last_key"]
        m = carry.get(fk)
        if m is not None:
            offsets[r["tag_id"]] = m
        out = r["s_last_maxe"]
        if fk == lk and m is not None:
            out = max(out, m)
        carry = {lk: out}

    def resolve(batch: pa.Table) -> pa.Table:
        """'f' partials pass through; 'p' rows get their block's carry
        folded into the exclusive cummax, then reduce per key."""
        fin = batch.filter(pc.equal(batch["__kind"], "f"))
        out = [pa.table({key: fin[key], "cov": fin["cov"],
                         "isl": fin["isl"]})]
        pend = batch.filter(pc.equal(batch["__kind"], "p"))
        if len(pend):
            ks = pend[key].to_numpy(zero_copy_only=False)
            s = pend["s_"].to_numpy(zero_copy_only=False)
            e = pend["e_"].to_numpy(zero_copy_only=False)
            cme = pend["excl"].to_numpy(zero_copy_only=False).copy()
            tags = pend["tag_id"].to_numpy(zero_copy_only=False)
            # a batch spans few source blocks: O(blocks) loop, vector ops
            for t in np.unique(tags):
                m = offsets.get(int(t))
                if m is not None:
                    sel = tags == t
                    cme[sel] = np.maximum(cme[sel], np.int64(m))
            cov, isl = _contrib(s, e, cme)
            uniq, inv = np.unique(ks, return_inverse=True)
            cov_acc = np.zeros(len(uniq), np.int64)
            np.add.at(cov_acc, inv, cov)
            isl_acc = np.zeros(len(uniq), np.int64)
            np.add.at(isl_acc, inv, isl.astype(np.int64))
            out.append(pa.table({
                key: pa.array(uniq, pa.int64()),
                "cov": pa.array(cov_acc, pa.int64()),
                "isl": pa.array(isl_acc, pa.int64()),
            }))
        return pa.concat_tables(out)

    partials = reduced.map_batches(resolve, batch_format="pyarrow")
    return adaptive_group_aggregate(
        partials, key,
        {"covered_us": ("cov", "sum"), "n_islands": ("isl", "sum")},
        est_rows=est_keys,
    )
