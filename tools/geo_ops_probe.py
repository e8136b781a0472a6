"""Measured scale probe for the round-4 late operators: the segment x
edge crossing join, the Bloom blocklist probe, and the ViT patchify
kernel, at representative row counts on synthetic derived data (no
driver materialization).  Prints one JSON line; results recorded in
SCALE.md.

Usage:  python tools/geo_ops_probe.py [n_rows] [num_cpus]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    import pyarrow as pa

    from osm_replication_rust_ray.functions.bloom import build_bloom
    from osm_replication_rust_ray.pipelines.queries import _SegClipActor
    from osm_replication_rust_ray.tuning import est_tasks, pool_concurrency

    out = {"n_rows": n, "num_cpus": cpus}

    # --- segment_clip: derived segments vs the PIP_POLYS edge set ----
    def gen(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["id"]})

    t0 = time.perf_counter()
    rows = (
        rd.range(n, override_num_blocks=max(16, cpus * 8))
        .map_batches(gen, batch_format="pyarrow", batch_size=65536)
        .map_batches(
            _SegClipActor,
            batch_format="pyarrow",
            batch_size=16384,
            concurrency=pool_concurrency(
                est_tasks(n_rows=n, batch_rows=16384)
            ),
        )
        .count()
    )
    dt = time.perf_counter() - t0
    out["segment_clip"] = {
        "hits": rows, "sec": round(dt, 2), "rows_per_s": int(n / dt)
    }

    # --- bloom probe: 10M-key blocklist, streaming membership --------
    from osm_replication_rust_ray.functions.bloom import bloom_probe
    from osm_replication_rust_ray.sources.synth import _mix64

    bl = _mix64(np.arange(10_000_000, dtype=np.uint64))
    m = 1 << 27  # 10 M keys x ~13 bits/key
    bits = build_bloom(bl, m, 4)
    bits_ref = ray.put(bits)

    class Probe:
        def __init__(self, ref):
            self.bits = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            h = _mix64(
                batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                + np.uint64(1 << 40)
            )
            hit = bloom_probe(self.bits, h, 4)
            return pa.table({"hit": pa.array(hit, pa.bool_())})

    t0 = time.perf_counter()
    hits = (
        rd.range(n, override_num_blocks=max(16, cpus * 8))
        .map_batches(
            Probe,
            fn_constructor_args=(bits_ref,),
            batch_format="pyarrow",
            batch_size=65536,
            concurrency=pool_concurrency(
                est_tasks(n_rows=n, batch_rows=65536)
            ),
        )
        .sum("hit")
    )
    dt = time.perf_counter() - t0
    out["bloom_probe_10m_blocklist"] = {
        "fp_hits": int(hits), "sec": round(dt, 2), "rows_per_s": int(n / dt)
    }

    # --- patchify kernel: single-thread pixel throughput -------------
    from osm_replication_rust_ray.stages.decode import patch_grid_stats

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (512, 512, 3), np.uint8)
    t0 = time.perf_counter()
    reps = 200
    for _ in range(reps):
        patch_grid_stats(img, 4)
    dt = time.perf_counter() - t0
    out["patchify_512x512"] = {
        "mpix_per_s_single_thread": round(reps * 512 * 512 / dt / 1e6, 1)
    }

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
