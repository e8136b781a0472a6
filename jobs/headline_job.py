"""Cluster entrypoint for the flagship spatial-join + tiling pipeline.

Submit to a running Ray cluster (the north_rule's fixed N-node / 4N-node
runs; in this sandbox the same file runs in local mode):

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python jobs/headline_job.py \
        --rows 1000000000 --out /mnt/shared/tiles --ckpt /mnt/shared/ckpt

The job connects to the EXISTING cluster (``ray.init(address="auto")``),
streams the payload through extents -> cells -> polygon-tree spatial
join, routes keep-assignments to per-poly-path partitioned parquet with
manifest lineage, and prints one JSON line with rows/sec — the number
the N vs 4N scaling-efficiency comparison uses.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--out", default="/tmp/headline_job_out")
    ap.add_argument("--ckpt", default="/tmp/headline_job_ckpt")
    ap.add_argument("--counts-only", action="store_true",
                    help="skip the byte-routing write (throughput probe)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS")
        if addr and addr != "auto":
            ray.init(address=addr, ignore_reinit_error=True)
        else:
            try:
                # on a cluster: attach to the running head
                ray.init(address="auto", ignore_reinit_error=True)
            except ConnectionError:
                # standalone: address="auto" raises instead of starting
                # a local instance (Ray 2.49) — fall back explicitly
                ray.init(address="local", ignore_reinit_error=True)

    from osm_replication_rust_ray.pipelines.spatial import (
        assignment_counts,
        flagship_assignments,
        route_payload_with_bytes,
    )
    from osm_replication_rust_ray.state.manifest import CheckpointManifest

    t0 = time.perf_counter()
    if args.counts_only:
        ds = flagship_assignments(n_rows=args.rows)
        result = assignment_counts(ds)
        n_parts = len(result)
    else:
        manifest = CheckpointManifest(args.ckpt)
        recs = route_payload_with_bytes(
            args.rows, args.out, manifest
        )
        n_parts = len(recs)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "rows": args.rows,
        "seconds": round(dt, 3),
        "rows_per_s": round(args.rows / dt, 1),
        "partitions": n_parts,
        "cluster_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
