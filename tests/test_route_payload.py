"""Payload tile-routing with bytes: partitioned parquet per poly path,
lineage in the manifest, and the input_hint per-row invariant (decoded
pixels exact + caption equality) on the routed output."""

import numpy as np
import pyarrow.parquet as pq

from osm_replication_rust_ray.pipelines.spatial import (
    flagship_assignments,
    route_payload_with_bytes,
)
from osm_replication_rust_ray.sources.synth import make_image_bytes, payload_batch
from osm_replication_rust_ray.stages.decode import decode_raw, psnr_db
from osm_replication_rust_ray.state.manifest import CheckpointManifest

N = 2000


def test_route_payload_with_bytes(ray_session, tmp_path):
    out = str(tmp_path / "routed")
    m = CheckpointManifest(str(tmp_path / "ckpt"))
    recs = route_payload_with_bytes(N, out, m)
    assert recs, "no partitions written"
    # lineage totals match the keep-assignments of the pure pipeline
    expected = flagship_assignments(n_rows=N, concurrency=2).to_pandas()
    expected_keep = expected[expected["verdict"] == "keep"]
    assert sum(r.rows for r in recs) == len(expected_keep)
    assert set(r.partition_id for r in recs) == set(expected_keep["poly_path"])
    # every routed row satisfies the per-row invariant: exact pixels
    # vs the deterministic source + caption equality
    rec = max(recs, key=lambda r: r.rows)
    t = pq.read_table(rec.path)
    assert {"image_id", "bytes", "w", "h", "caption", "poly_path"} <= set(
        t.column_names
    )
    idx = np.array([int(s[3:]) for s in t["image_id"].to_pylist()], np.int64)
    want = payload_batch(idx, with_bytes=False)
    assert t["caption"].to_pylist() == want["caption"].to_pylist()
    for i in range(min(25, t.num_rows)):
        w = t["w"][i].as_py()
        h = t["h"][i].as_py()
        got = decode_raw(t["bytes"][i].as_py(), w, h)
        ref = decode_raw(make_image_bytes(int(idx[i]), w, h), w, h)
        assert psnr_db(got, ref) >= 40.0  # exact => sentinel 99 dB
    # resume: a second run writes nothing
    m2 = CheckpointManifest(str(tmp_path / "ckpt"))
    recs2 = route_payload_with_bytes(N, out, m2)
    assert recs2 == []
