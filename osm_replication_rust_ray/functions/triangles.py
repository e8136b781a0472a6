"""Exact triangle counting on an undirected graph — the third graph
operator next to connected components (`cc.py`) and PageRank
(`pagerank.py`): per-node triangle participation counts via the
DEGREE-ORDERED wedge join (the published MapReduce shape: Suri &
Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
WWW 2011; equivalently Schank-Wagner node-iterator++).

Why degree ordering: orienting every edge from its lower-(deg, id)
endpoint to the higher one bounds each node's out-degree by
O(sqrt(m)), so the wedge self-join emits O(m^1.5) candidates on ANY
degree distribution — a plain a<b orientation explodes on the hub
nodes every power-law graph has.  Each triangle is generated exactly
once, at its lowest-ranked vertex.

Pipeline (all keys-only shuffles):
  degrees (sorted-segment count over both endpoints)
  -> attach degrees to edges (2 crossover joins)
  -> orient by (deg, id)
  -> wedge self-join on the source (crossover join)
  -> adjacency check: join wedge far-pairs against the canonical
     edge table on BOTH key columns
  -> per-node counts (each triangle credits its 3 corners).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def triangle_counts(edges, n_part: int, est_edges: int, est_nodes: int):
    """``edges``: Dataset (a, b) int64, canonical ``a < b``, distinct.
    Returns a Dataset (node, n_tri) over nodes in >= 1 triangle."""
    from ..functions.agg import sorted_segment_aggregate
    from ..stages.dist import crossover_join

    edges = edges.materialize()

    ends = edges.map_batches(
        lambda b: pa.table({"node": pa.array(np.concatenate([
            b["a"].to_numpy(zero_copy_only=False),
            b["b"].to_numpy(zero_copy_only=False)]), pa.int64())}),
        batch_format="pyarrow",
    )
    deg = sorted_segment_aggregate(
        ends, "node", {"deg": ("node", "count")}).materialize()

    def deg_as(key: str, out: str):
        return deg.map_batches(
            lambda b, k=key, o=out: pa.table({k: b["node"], o: b["deg"]}),
            batch_format="pyarrow",
        )

    with_da = crossover_join(edges, deg_as("a", "deg_a"), on=("a",),
                             right_on=None, num_partitions=n_part,
                             est_rows=est_nodes, est_bytes=est_nodes * 16)
    with_db = crossover_join(with_da, deg_as("b", "deg_b"), on=("b",),
                             right_on=None, num_partitions=n_part,
                             est_rows=est_nodes, est_bytes=est_nodes * 16)

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg_b"].to_numpy(zero_copy_only=False)
        a_low = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "src": pa.array(np.where(a_low, a, b), pa.int64()),
            "dst": pa.array(np.where(a_low, b, a), pa.int64()),
            "dd": pa.array(np.where(a_low, db, da), pa.int64()),
        })

    oriented = with_db.map_batches(
        orient, batch_format="pyarrow", batch_size=65536).materialize()

    mate = oriented.map_batches(
        lambda b: pa.table({"src": b["src"], "dst2": b["dst"],
                            "dd2": b["dd"]}),
        batch_format="pyarrow",
    )
    wedges = crossover_join(
        oriented, mate, on=("src",), right_on=None,
        num_partitions=n_part, est_rows=est_edges,
        est_bytes=est_edges * 24,
    )

    def far_pair(t: pa.Table) -> pa.Table:
        """Keep each unordered wedge once (strict (deg, id) rank) and
        emit the far pair in canonical edge order."""
        d1 = t["dst"].to_numpy(zero_copy_only=False)
        d2 = t["dst2"].to_numpy(zero_copy_only=False)
        r1 = t["dd"].to_numpy(zero_copy_only=False)
        r2 = t["dd2"].to_numpy(zero_copy_only=False)
        keep = (r1 < r2) | ((r1 == r2) & (d1 < d2))
        apex = t["src"].to_numpy(zero_copy_only=False)[keep]
        d1, d2 = d1[keep], d2[keep]
        return pa.table({
            "apex": pa.array(apex, pa.int64()),
            "lo": pa.array(np.minimum(d1, d2), pa.int64()),
            "hi": pa.array(np.maximum(d1, d2), pa.int64()),
        })

    cands = wedges.map_batches(far_pair, batch_format="pyarrow",
                               batch_size=65536)
    tris = crossover_join(
        cands, edges, on=("lo", "hi"), right_on=("a", "b"),
        num_partitions=n_part, est_rows=est_edges,
        est_bytes=est_edges * 16,
    )

    corners = tris.map_batches(
        lambda b: pa.table({"node": pa.array(np.concatenate([
            b["apex"].to_numpy(zero_copy_only=False),
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False)]), pa.int64())}),
        batch_format="pyarrow",
    )
    return sorted_segment_aggregate(
        corners, "node", {"n_tri": ("node", "count")}).map_batches(
        lambda b: pa.table({"node": b["node"],
                            "n_tri": pc.cast(b["n_tri"], pa.int64())}),
        batch_format="pyarrow",
    )
