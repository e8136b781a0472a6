"""Distributed connected components (dedup clustering).

The missing piece between near-dup PAIR finding (minhash/LSH,
`functions/dedup.py`) and actual corpus deduplication at scale: pairs
must be grouped into clusters so one representative per cluster
survives.  Reference analogue: none (the reference has no dedup
surface); this belongs to the LLM-training-data operator set the
engine adds, like MinHash itself.

Algorithm: min-label propagation with pointer doubling, expressed as
Ray Data joins — the MapReduce-style formulation (cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — this is the
simple hash-to-min variant, adequate because near-dup clusters have
tiny diameter; the pointer-doubling step bounds pathological chains at
O(log n) rounds anyway):

  round:  label'(v) = min(label(v), min_{(u,v) in E} label(u))
  then    label''(v) = label'(label'(v))          (pointer doubling)

Scale shape per round: ONE hash join of the static symmetrized edge
table against the labels table, a grouped MIN via the repo's
sorted-segment ladder (no per-group Python — the node domain is
data-sized), one shortcut join, and a single-row checksum aggregate.
Labels only decrease, so sum(label) is strictly decreasing until the
fixpoint — convergence is detected by an unchanged (count, sum)
checksum without a full table compare.  (At >= 2^63 / max_id nodes the
int64 sum could wrap; at that scale switch the checksum to the exact
join-based compare — documented, not silently approximate: a wrap that
EXACTLY aliases the previous sum while labels still changed is the
only failure mode, and the cap error below still bounds the loop.)

Raises FixpointCapError if max_rounds is exhausted before convergence
(same no-silent-truncation policy as stages/dist.py fixpoints).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.dist import FixpointCapError, reroot, safe_join
from ..tuning import join_partitions
from .agg import sorted_distinct, sorted_segment_aggregate


def _partial_min(batch: pa.Table) -> pa.Table:
    """Per-batch (node -> min label) combiner: cuts the sort shuffle to
    one row per distinct node per batch."""
    if len(batch) == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
    node = batch["node"].to_numpy(zero_copy_only=False)
    label = batch["label"].to_numpy(zero_copy_only=False)
    order = np.lexsort((label, node))
    n, l = node[order], label[order]
    first = np.concatenate(([True], n[1:] != n[:-1]))
    return pa.table(
        {
            "node": pa.array(n[first], pa.int64()),
            "label": pa.array(l[first], pa.int64()),
        }
    )


def connected_components(edges, max_rounds: int = 64,
                         shortcut: bool = True):
    """``edges``: Dataset with int64 columns (id_a, id_b), one row per
    undirected edge (self-loops and duplicates tolerated).  Returns a
    Dataset (node, cluster_rep) covering every endpoint, where
    cluster_rep is the minimum node id in the component.
    """
    n_part = join_partitions()

    def symmetrize(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        c = b["id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, c]), pa.int64()),
                "dst": pa.array(np.concatenate([c, a]), pa.int64()),
            }
        )

    edges_sym = edges.map_batches(
        symmetrize, batch_format="pyarrow", batch_size=65536
    ).materialize()  # static across rounds; joined every round
    if edges_sym.count() == 0:  # no pairs at all -> no clustered nodes
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "cluster_rep": pa.array([], pa.int64()),
                }
            )
        )

    labels = sorted_distinct(
        edges_sym.map_batches(
            lambda b: pa.table({"node": b["src"], "label": b["src"]}),
            batch_format="pyarrow",
        ),
        ["node", "label"],
    ).materialize()

    def checksum(ds) -> tuple:
        from ray.data.aggregate import Count, Sum

        agg = ds.aggregate(Count(), Sum("label"))
        return (agg["count()"], agg["sum(label)"])

    prev = checksum(labels)
    for _ in range(max_rounds):
        # neighbor labels: edge (src, dst) contributes label(src) to dst
        prop = safe_join(
            edges_sym, labels, "inner", n_part,
            on=("src",), right_on=("node",),
            payload={"label": pa.int64()},
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        cand = prop.union(labels).map_batches(
            _partial_min, batch_format="pyarrow", batch_size=65536
        )
        new = reroot(sorted_segment_aggregate(
            cand, "node", {"label": ("label", "min")}
        ))
        if shortcut:  # label <- label[label] (path halving)
            new = safe_join(
                new.map_batches(
                    lambda b: pa.table({"node": b["node"], "l1": b["label"]}),
                    batch_format="pyarrow",
                ),
                new, "inner", n_part,
                on=("l1",), right_on=("node",),
                payload={"label": pa.int64()},
            ).map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["label"]}),
                batch_format="pyarrow",
            )
            new = reroot(new)
        cur = checksum(new)
        labels = new
        if cur == prev:
            return labels.map_batches(
                lambda b: pa.table(
                    {"node": b["node"], "cluster_rep": b["label"]}
                ),
                batch_format="pyarrow",
            )
        prev = cur
    raise FixpointCapError(
        f"connected_components did not converge in {max_rounds} rounds"
    )
