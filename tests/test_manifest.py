"""Checkpoint manifest: lineage, atomic commit, resume-without-recompute
(north_rule), and the end-to-end §3.1 update pipeline on the reference's
saint_barthelemy fixtures."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osm_replication_rust_ray.sources.osmxml import parse_osm_xml
from osm_replication_rust_ray.sources.polyfile import read_multipolygon
from osm_replication_rust_ray.sources.store import ElementStore
from osm_replication_rust_ray.state.manifest import (
    CheckpointManifest,
    PartitionRecord,
    write_partitioned,
)

RES = "/root/reference/tests/resources"


def _toy_ds(n=100):
    import ray.data

    keys = ["a" if i % 3 else "b" for i in range(n)]
    return ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(range(n), pa.int64())})
    )


def test_manifest_commit_is_atomic_and_loads(tmp_path):
    m = CheckpointManifest(str(tmp_path / "ckpt"))
    m.stage(PartitionRecord("p1", rows=10, bytes=100))
    assert m.done() == set()  # staged only — nothing visible pre-commit
    m.commit(sequence=7)
    m2 = CheckpointManifest(str(tmp_path / "ckpt"))
    assert m2.sequence == 7
    assert m2.done() == {"p1"}
    assert m2.totals() == (10, 100)


def test_job_lock_excludes_second_writer(tmp_path):
    m1 = CheckpointManifest(str(tmp_path / "ckpt"))
    m1.acquire_lock()
    m2 = CheckpointManifest(str(tmp_path / "ckpt"))
    with pytest.raises(RuntimeError):
        m2.acquire_lock()
    m1.release_lock()
    m2.acquire_lock()
    m2.release_lock()


def test_write_partitioned_resume_skips_done(tmp_path):
    out = str(tmp_path / "out")
    m = CheckpointManifest(str(tmp_path / "ckpt"))
    recs = write_partitioned(_toy_ds(), out, "k", m, sequence=1)
    assert {r.partition_id for r in recs} == {"a", "b"}
    total_rows = sum(r.rows for r in recs)
    assert total_rows == 100
    paths = {r.partition_id: r.path for r in recs}
    mtimes = {p: os.path.getmtime(paths[p]) for p in paths}
    # second run with a fresh manifest object on the same dir: everything
    # already committed -> nothing rewritten
    m2 = CheckpointManifest(str(tmp_path / "ckpt"))
    recs2 = write_partitioned(_toy_ds(), out, "k", m2, sequence=1)
    assert recs2 == []
    for p in paths:
        assert os.path.getmtime(paths[p]) == mtimes[p]


def test_write_partitioned_partial_resume(tmp_path):
    out = str(tmp_path / "out")
    m = CheckpointManifest(str(tmp_path / "ckpt"))
    # simulate a prior run that finished only partition "a"
    m.stage(PartitionRecord("a", rows=67, bytes=1))
    m.commit()
    m2 = CheckpointManifest(str(tmp_path / "ckpt"))
    recs = write_partitioned(_toy_ds(), out, "k", m2, sequence=3)
    assert {r.partition_id for r in recs} == {"b"}  # only the missing one
    t = pq.read_table(recs[0].path)
    assert set(t["k"].to_pylist()) == {"b"}
    assert m2.sequence is None or m2.sequence == 3
    m3 = CheckpointManifest(str(tmp_path / "ckpt"))
    assert m3.done() == {"a", "b"}


def test_update_pipeline_end_to_end(tmp_path):
    from osm_replication_rust_ray.pipelines.update import run_update

    store = ElementStore(str(tmp_path / "db"), n_buckets=16)
    store.import_pbf(f"{RES}/saint_barthelemy.osm.pbf")
    changes = parse_osm_xml(f"{RES}/saint_barthelemy.osc.gz")
    name, mp = read_multipolygon(f"{RES}/saint_barthelemy.poly")
    tree = [("./stb", name, mp)]
    parent = {"./stb": None}
    out = str(tmp_path / "diffs")
    m = CheckpointManifest(str(tmp_path / "ckpt"))
    done = run_update({1: changes}, store, tree, parent, out, m)
    assert done == [1]
    m2 = CheckpointManifest(str(tmp_path / "ckpt"))
    assert m2.sequence == 1
    rows, nbytes = m2.totals()
    assert rows > 0 and nbytes > 0
    # the committed partition parquet exists and has the diff columns
    rec = m2._state["partitions"]["./stb"]
    t = pq.read_table(rec["path"])
    assert set(t.column_names) >= {"pos", "etype", "id", "poly_path", "action"}
    assert t.num_rows == rec["rows"]
    # re-run at the same state: loop body skips (sequence <= cur)
    done2 = run_update({1: changes}, store, tree, parent, out, m2)
    assert done2 == []


def test_manifest_tmp_garbage_is_harmless(tmp_path):
    """Leftover tmp files from a crashed commit never corrupt state."""
    d = str(tmp_path / "ckpt")
    m = CheckpointManifest(d)
    m.stage(PartitionRecord("p1", rows=1, bytes=1))
    m.commit(1)
    # simulate crash debris
    with open(os.path.join(d, "junk.manifest-tmp"), "w") as f:
        f.write("{corrupt")
    m2 = CheckpointManifest(d)
    assert m2.sequence == 1 and m2.done() == {"p1"}
    m2.stage(PartitionRecord("p2", rows=2, bytes=2))
    m2.commit(2)
    m3 = CheckpointManifest(d)
    assert m3.done() == {"p1", "p2"}


def test_atomic_write_parquet_leaves_no_partial_on_success(tmp_path):
    from osm_replication_rust_ray.state.manifest import atomic_write_parquet

    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    path = str(tmp_path / "out" / "part.parquet")
    nbytes = atomic_write_parquet(t, path)
    assert nbytes > 0 and os.path.exists(path)
    leftovers = [p for p in os.listdir(os.path.dirname(path)) if "tmp" in p]
    assert leftovers == []
    assert pq.read_table(path).equals(t)
