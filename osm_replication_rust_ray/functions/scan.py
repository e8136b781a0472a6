"""Distributed per-key prefix box-union scan.

The diff bbox stage (src/osmxml/bbox.rs:60-85) needs, per element id,
the running union of bounding boxes over that id's diff occurrences in
file-position order — the "modified maps" the reference holds in RAM.
``prefix_box_scan`` computes it over a Ray Dataset with no per-key
Python: one range-partition sort on ``[key, pos]``, a vectorized
per-block segment scan, and a cross-block carry reconstructed from ONE
summary row per block (driver walk bounded by block count — the same
bounded-merge pattern as ``functions/windows.py:running_sum_cents``).

Boxes use int64 SENTINELS instead of nulls: min-columns hold
``SENT_MIN`` (= int64 max) and max-columns ``SENT_MAX`` (= int64 min)
when the row contributes nothing; the running union is then a plain
elementwise min/max, and a no-contribution occurrence automatically
carries the previous occurrence's box (the pandas-cummin-NaN carry bug
class cannot occur).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SENT_MIN = np.iinfo(np.int64).max  # empty value for min-aggregated cols
SENT_MAX = np.iinfo(np.int64).min  # empty value for max-aggregated cols

BOX_COLS = ("minlat", "maxlat", "minlon", "maxlon")
_BOX_OPS = {"minlat": "min", "maxlat": "max", "minlon": "min", "maxlon": "max"}


def box_sentinel_arrays(n: int) -> dict[str, np.ndarray]:
    return {
        "minlat": np.full(n, SENT_MIN),
        "maxlat": np.full(n, SENT_MAX),
        "minlon": np.full(n, SENT_MIN),
        "maxlon": np.full(n, SENT_MAX),
    }


def prefix_box_scan(ds, key: str, pos: str, box_cols=BOX_COLS):
    """-> Dataset: input rows with ``box_cols`` replaced by the per-key
    prefix-INCLUSIVE running union in ``pos`` order (sentinel-encoded).

    Rows must be unique per (key, pos). All other columns pass through.
    """
    sorted_ds = ds.sort([key, pos])

    def per_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        names = [c for c in batch.schema.names]
        if n == 0:
            cols = {c: batch[c] for c in names}
            cols["__kind"] = pa.array([], pa.string())
            cols["__tag_key"] = pa.array([], pa.int64())
            cols["__tag_pos"] = pa.array([], pa.int64())
            cols["__last_key"] = pa.array([], pa.int64())
            return pa.table(cols)
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        run_start = np.concatenate(([True], keys[1:] != keys[:-1]))
        run_id = np.cumsum(run_start) - 1
        cum = {}
        g = pd.DataFrame({"r": run_id})
        for c in box_cols:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
            g[c] = v
        gb = g.groupby("r", sort=False)
        for c in box_cols:
            cum[c] = (
                gb[c].cummin() if _BOX_OPS[c] == "min" else gb[c].cummax()
            ).to_numpy()
        pending = run_id == 0
        tag_k, tag_p = int(keys[0]), int(
            batch[pos].to_numpy(zero_copy_only=False)[0]
        )
        cols = {}
        for c in names:
            cols[c] = pa.array(cum[c]) if c in box_cols else batch[c]
        cols["__kind"] = pa.array(np.where(pending, "p", "f"), pa.string())
        cols["__tag_key"] = pa.array(
            np.where(pending, tag_k, 0).astype(np.int64)
        )
        cols["__tag_pos"] = pa.array(
            np.where(pending, tag_p, 0).astype(np.int64)
        )
        cols["__last_key"] = pa.array(np.zeros(n, np.int64))
        rows = pa.table(cols)
        # summary: last run's final cumulative box + block ordering tag
        scols = {}
        for c in names:
            if c in box_cols:
                scols[c] = pa.array([int(cum[c][-1])], pa.int64())
            elif c == key:
                scols[c] = pa.array([tag_k], pa.int64())
            else:
                scols[c] = pa.nulls(1, rows[c].type)
        scols["__kind"] = pa.array(["s"])
        scols["__tag_key"] = pa.array([tag_k], pa.int64())
        scols["__tag_pos"] = pa.array([tag_p], pa.int64())
        scols["__last_key"] = pa.array([int(keys[-1])], pa.int64())
        return pa.concat_tables(
            [rows, pa.table(scols)], promote_options="permissive"
        )

    # one pinned execution: a lazy second pass could re-split the sort's
    # blocks differently and invalidate the boundary flags
    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow",
    ).take_all()
    # blocks ordered by first-row (key, pos); a key spans a contiguous
    # chain of blocks, so one carry box per chain suffices
    summaries.sort(key=lambda r: (r["__tag_key"], r["__tag_pos"]))
    offsets: dict[tuple[int, int], tuple] = {}
    carry: dict[int, tuple] = {}
    for s in summaries:
        fk, lk = s["__tag_key"], s["__last_key"]
        off = carry.get(fk)
        if off is not None:
            offsets[(fk, s["__tag_pos"])] = off
        last = tuple(int(s[c]) for c in box_cols)
        if fk == lk and off is not None:
            last = _union(off, last, box_cols)
        carry = {lk: last}

    def apply_offsets(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.not_equal(batch["__kind"], "s"))
        out = {c: b[c] for c in b.schema.names
               if not c.startswith("__")}
        if offsets and len(b):
            pend = np.asarray(pc.equal(b["__kind"], "p"))
            if pend.any():
                tk = b["__tag_key"].to_numpy(zero_copy_only=False)
                tp = b["__tag_pos"].to_numpy(zero_copy_only=False)
                vals = {
                    c: b[c].to_numpy(zero_copy_only=False).copy()
                    for c in box_cols
                }
                tags = np.stack([tk, tp], axis=1)
                for tag_row in np.unique(tags[pend], axis=0):
                    off = offsets.get((int(tag_row[0]), int(tag_row[1])))
                    if off is None:
                        continue
                    m = pend & np.all(tags == tag_row, axis=1)
                    for c, o in zip(box_cols, off):
                        if _BOX_OPS[c] == "min":
                            vals[c][m] = np.minimum(vals[c][m], o)
                        else:
                            vals[c][m] = np.maximum(vals[c][m], o)
                for c in box_cols:
                    out[c] = pa.array(vals[c])
        return pa.table(out)

    return reduced.map_batches(apply_offsets, batch_format="pyarrow")


def _union(a: tuple, b: tuple, box_cols) -> tuple:
    return tuple(
        min(x, y) if _BOX_OPS[c] == "min" else max(x, y)
        for c, x, y in zip(box_cols, a, b)
    )
