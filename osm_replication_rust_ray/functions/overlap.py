"""Interval x interval OVERLAP join — the genomics / temporal-overlap
join family (``a.s < b.e AND b.s < a.e``), distinct from the
point-in-range join (`rangejoin.py`) and the as-of join (`asof.py`).

Distributed shape: grid cells of width ``grid_us`` (callers guarantee
every interval is SHORTER than the grid, so each touches at most two
adjacent cells).  Both sides emit one keys-only row per touched cell;
one equi-join on the cell; the exact overlap refine then keeps a pair
ONLY in the cell containing ``max(s_a, s_b)`` — a cell provably
emitted by both sides — so no pair is double-counted and no global
dedup pass is needed (the standard partitioned-spatial-join reporting
rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _cells(ids, s, e, grid: int, tag: str):
    c1 = s // grid
    c2 = e // grid
    two = c2 != c1
    return pa.table({
        "cell": pa.array(np.concatenate([c1, c2[two]]), pa.int64()),
        f"id_{tag}": pa.array(np.concatenate([ids, ids[two]]), pa.int64()),
        f"s_{tag}": pa.array(np.concatenate([s, s[two]]), pa.int64()),
        f"e_{tag}": pa.array(np.concatenate([e, e[two]]), pa.int64()),
    })


def interval_overlap_join(a_ds, b_ds, grid_us: int, n_part: int,
                          est_b_rows: int):
    """``a_ds``/``b_ds``: Datasets (id, s, e) int64 microseconds with
    ``e - s < grid_us``.  -> Dataset (id_a, id_b, overlap_us) for every
    strictly overlapping pair (half-open intervals)."""
    from ..stages.dist import crossover_join

    def emit(tag):
        def fn(b: pa.Table) -> pa.Table:
            ids = b["id"].to_numpy(zero_copy_only=False)
            s = b["s"].to_numpy(zero_copy_only=False)
            e = b["e"].to_numpy(zero_copy_only=False)
            if ((e - s) >= grid_us).any():
                raise ValueError("interval longer than the grid cell")
            return _cells(ids, s, e, grid_us, tag)
        return fn

    a_cells = a_ds.map_batches(emit("a"), batch_format="pyarrow",
                               batch_size=65536)
    b_cells = b_ds.map_batches(emit("b"), batch_format="pyarrow",
                               batch_size=65536)
    joined = crossover_join(
        a_cells, b_cells, on=("cell",), right_on=None,
        num_partitions=n_part, est_rows=est_b_rows * 2,
        est_bytes=est_b_rows * 2 * 32,
    )

    def refine(t: pa.Table) -> pa.Table:
        sa = t["s_a"].to_numpy(zero_copy_only=False)
        ea = t["e_a"].to_numpy(zero_copy_only=False)
        sb = t["s_b"].to_numpy(zero_copy_only=False)
        eb = t["e_b"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        smax = np.maximum(sa, sb)
        keep = (sa < eb) & (sb < ea) & (smax // grid_us == cell)
        return pa.table({
            "id_a": t["id_a"].filter(pa.array(keep)),
            "id_b": t["id_b"].filter(pa.array(keep)),
            "overlap_us": pa.array(
                (np.minimum(ea, eb) - smax)[keep], pa.int64()),
        })

    return joined.map_batches(refine, batch_format="pyarrow",
                              batch_size=65536)
