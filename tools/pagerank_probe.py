"""Measured scale probe for the integer PageRank operator: synthetic
graph generated inside tasks (no driver materialization), 3 exact
iterations.  Prints one JSON line; results recorded in SCALE.md.

Usage:  python tools/pagerank_probe.py [n_nodes] [num_cpus]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    import pyarrow as pa

    from osm_replication_rust_ray.functions.pagerank import pagerank

    muls = (48_271, 16_807, 69_621)
    adds = (11, 23, 5)

    def as_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["id"]})

    def gen_edges(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = 1 + (v % 3)
        srcs, dsts = [], []
        for k in range(3):
            s = v[deg > k]
            srcs.append(s)
            dsts.append((s * muls[k] + adds[k]) % n)
        src = np.concatenate(srcs)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(np.concatenate(dsts), pa.int64()),
                "outdeg": pa.array(1 + (src % 3), pa.int64()),
            }
        )

    blocks = max(16, cpus * 8)
    nodes = rd.range(n, override_num_blocks=blocks).map_batches(
        as_nodes, batch_format="pyarrow", batch_size=65536
    )
    edges = nodes.map_batches(gen_edges, batch_format="pyarrow",
                              batch_size=65536)
    t0 = time.perf_counter()
    ranks = pagerank(nodes, edges, n_iter=3, est_nodes=n)
    total = ranks.sum("rank")
    dt = time.perf_counter() - t0
    n_edges = n * 2  # E[outdeg] = 2
    print(json.dumps({
        "n_nodes": n,
        "n_edges_approx": n_edges,
        "num_cpus": cpus,
        "sec_3_iters": round(dt, 2),
        "edge_traversals_per_s": int(3 * n_edges / dt),
        "rank_total": int(total),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
