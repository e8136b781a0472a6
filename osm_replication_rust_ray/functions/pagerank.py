"""Integer fixed-point PageRank (link analysis over a derived graph).

The rank update is computed entirely in int64 fixed-point (scale 1e6)
with floor division:

    r_{t+1}(v) = 150000 + (85 * inc(v)) // 100
    inc(v)     = sum over in-edges (u -> v) of  r_t(u) // outdeg(u)

so a fixed iteration count unrolls into an EXACT SQL twin (chained
CTEs) — no float accumulation order to pin.  Damping 0.85 and the
uniform teleport term use the same floor arithmetic on both sides.

Distributed shape (the same iterative-join pattern as
functions/cc.py:connected_components): edges materialize once and are
re-joined every round; each round is one equi-join (ranks on src), a
per-batch floor-divide, and a grouped SUM whose input includes one
explicit zero row per node, so nodes with no in-edges keep a row
without any outer join.  Ranks never leave the cluster; driver state
is O(1).

No reference analogue (the reference has no graph ops); sits beside
connected components in the LLM-pipeline set (e.g. page-quality
weighting of a crawl graph before sampling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.dist import safe_join
from ..tuning import join_partitions

SCALE = 1_000_000
TELEPORT = 150_000  # (SCALE * 15) // 100
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(nodes, edges, n_iter: int = 3, est_nodes: int | None = None):
    """``nodes``: Dataset with int64 column (v); ``edges``: Dataset with
    int64 columns (src, dst, outdeg) where every src is a node and
    outdeg is src's TOTAL out-degree.  Returns a Dataset (v, rank)
    after ``n_iter`` exact fixed-point iterations."""
    edges = edges.materialize()  # static across rounds
    # size the per-round shuffle to the MEASURED edge table (the bigger
    # join side), not the parameterless floor of 2 partitions
    n_edges = edges.count()
    n_part = join_partitions(
        n_rows=n_edges, n_bytes=n_edges * 24
    )

    def zero_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": b["v"],
                "contrib": pa.array(
                    np.zeros(len(b), np.int64), pa.int64()
                ),
            }
        )

    zeros = nodes.map_batches(
        zero_rows, batch_format="pyarrow", batch_size=65536
    ).materialize()

    ranks = nodes.map_batches(
        lambda b: pa.table(
            {
                "v": b["v"],
                "rank": pa.array(np.full(len(b), SCALE, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=65536,
    ).materialize()

    from .agg import adaptive_group_aggregate

    for _ in range(n_iter):
        joined = safe_join(edges, ranks, "inner", n_part,
                           on=("src",), right_on=("v",))

        def contribs(b: pa.Table) -> pa.Table:
            r = b["rank"].to_numpy(zero_copy_only=False)
            d = b["outdeg"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "dst": b["dst"],
                    "contrib": pa.array(r // d, pa.int64()),
                }
            )

        inc = adaptive_group_aggregate(
            joined.map_batches(contribs, batch_format="pyarrow")
            .union(zeros),
            "dst",
            {"inc": ("contrib", "sum")},
            est_rows=est_nodes,
        )

        def update(b: pa.Table) -> pa.Table:
            inc_v = b["inc"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "v": b["dst"],
                    "rank": pa.array(
                        TELEPORT + (DAMP_NUM * inc_v) // DAMP_DEN, pa.int64()
                    ),
                }
            )

        ranks = inc.map_batches(update, batch_format="pyarrow").materialize()
    return ranks
