"""Adaptive quadtree leaf decomposition — the skew-adaptive spatial
partitioning primitive (split any cell holding more than ``cap``
points, down to ``max_depth``): the layout an engine needs when hex /
tile grids of one fixed resolution melt under hotspots.

Key identity: a cell is a LEAF iff it is occupied, its PARENT held
more than ``cap`` points (ancestor counts are supersets, so parent
alone decides), and it either holds <= cap or sits at the depth cap.
That makes the whole tree derivable from per-depth COUNT tables
alone — one grouped count at the deepest level, then ``max_depth``
tiny parent-rollup aggregates (bounded by occupied cells, shrinking
4x per level) and keys-only parent joins.  Points are never touched
a second time; nothing driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PACK = 1 << 17  # cell coords < 2^16 at every depth


def quadtree_leaves(pts, box_bits: int, max_depth: int, cap: int,
                    est_pts: int):
    """``pts``: Dataset (x, y) int64 in ``[0, 2^box_bits)``.
    -> Dataset (depth, cx, cy, n_points), one row per quadtree leaf."""
    import ray.data as rd

    from ..functions.agg import adaptive_group_aggregate
    from ..stages.dist import crossover_join

    shift = box_bits - max_depth

    def deepest(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False) >> shift
        y = b["y"].to_numpy(zero_copy_only=False) >> shift
        return pa.table({"cell": pa.array(x * _PACK + y, pa.int64()),
                         "n": pa.array(np.ones(len(x), np.int64),
                                       pa.int64())})

    counts = [None] * (max_depth + 1)
    counts[max_depth] = adaptive_group_aggregate(
        pts.map_batches(deepest, batch_format="pyarrow",
                        batch_size=65536),
        "cell", {"n": ("n", "sum")}, est_rows=est_pts,
    ).materialize()

    def parent_rollup(b: pa.Table) -> pa.Table:
        c = b["cell"].to_numpy(zero_copy_only=False)
        p = (c // _PACK >> 1) * _PACK + ((c % _PACK) >> 1)
        return pa.table({"cell": pa.array(p, pa.int64()),
                         "n": pc.cast(b["n"], pa.int64())})

    from ..stages.dist import reroot

    for d in range(max_depth - 1, -1, -1):
        counts[d] = reroot(adaptive_group_aggregate(
            counts[d + 1].map_batches(parent_rollup,
                                      batch_format="pyarrow"),
            "cell", {"n": ("n", "sum")}, est_rows=est_pts,
        ))

    def unpack(d: int):
        def fn(b: pa.Table) -> pa.Table:
            c = b["cell"].to_numpy(zero_copy_only=False)
            n = b["n"].to_numpy(zero_copy_only=False)
            return pa.table({
                "depth": pa.array(np.full(len(c), d, np.int64),
                                  pa.int64()),
                "cx": pa.array(c // _PACK, pa.int64()),
                "cy": pa.array(c % _PACK, pa.int64()),
                "n_points": pa.array(n, pa.int64()),
            })
        return fn

    # depth 0: leaf iff the root grid cell already fits (or depth cap 0)
    parts = [counts[0].map_batches(
        lambda b: b.filter(pc.less_equal(b["n"], cap))
        if max_depth > 0 else b,
        batch_format="pyarrow").map_batches(
        unpack(0), batch_format="pyarrow")]
    for d in range(1, max_depth + 1):
        full = (d == max_depth)

        def child_rows(b: pa.Table, full=full) -> pa.Table:
            if not full:
                b = b.filter(pc.less_equal(b["n"], cap))
            c = b["cell"].to_numpy(zero_copy_only=False)
            p = (c // _PACK >> 1) * _PACK + ((c % _PACK) >> 1)
            return pa.table({"cell": b["cell"],
                             "n": pc.cast(b["n"], pa.int64()),
                             "parent": pa.array(p, pa.int64())})

        cand = counts[d].map_batches(child_rows, batch_format="pyarrow")
        # keys-only parent join: keep children whose parent overflowed
        over = counts[d - 1].map_batches(
            lambda b: pa.table(
                {"parent": b.filter(pc.greater(b["n"], cap))["cell"]}),
            batch_format="pyarrow")
        kept = crossover_join(
            cand, over, on=("parent",), right_on=None,
            num_partitions=4, est_rows=est_pts, est_bytes=est_pts * 8,
        )
        parts.append(kept.map_batches(
            lambda b: b.select(["cell", "n"]),
            batch_format="pyarrow").map_batches(
            unpack(d), batch_format="pyarrow"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
