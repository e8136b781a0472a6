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
    # (lineage ids are sequence-scoped: the same poly-path key domain
    # is written once per micro-batch)
    rec = m2._state["partitions"]["seq=1/./stb"]
    t = pq.read_table(rec["path"])
    assert set(t.column_names) >= {"pos", "etype", "id", "poly_path", "action"}
    assert t.num_rows == rec["rows"]
    # re-run at the same state: loop body skips (sequence <= cur)
    done2 = run_update({1: changes}, store, tree, parent, out, m2)
    assert done2 == []


def test_update_multi_sequence_writes_every_batch(tmp_path):
    """Sequence-scoped lineage ids: batch N's done-set must not swallow
    batch N+1's rows for the same poly path (regression — unscoped ids
    made every sequence after the first write nothing)."""
    from osm_replication_rust_ray.pipelines.update import run_update

    store = ElementStore(str(tmp_path / "db"), n_buckets=16)
    store.import_pbf(f"{RES}/saint_barthelemy.osm.pbf")
    changes = parse_osm_xml(f"{RES}/saint_barthelemy.osc.gz")
    name, mp = read_multipolygon(f"{RES}/saint_barthelemy.poly")
    tree, parent = [("./stb", name, mp)], {"./stb": None}
    out = str(tmp_path / "diffs")
    m = CheckpointManifest(str(tmp_path / "ckpt"))
    done = run_update({1: changes, 2: changes}, store, tree, parent, out, m)
    assert done == [1, 2]
    m2 = CheckpointManifest(str(tmp_path / "ckpt"))
    assert m2.sequence == 2
    for seq in (1, 2):
        rec = m2._state["partitions"][f"seq={seq}/./stb"]
        assert rec["rows"] > 0
        assert pq.read_table(rec["path"]).num_rows == rec["rows"]


def _snapshot_bytes(root: str) -> dict[str, bytes]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


def _kill_resume_case(tmp_path, kill_point: str):
    """Clean run in-process; crashed run via a SIGKILLed subprocess at
    ``kill_point``; then resume in-process and compare byte-for-byte."""
    import subprocess
    import sys

    import ray

    from osm_replication_rust_ray.pipelines.update import run_update

    changes = parse_osm_xml(f"{RES}/saint_barthelemy.osc.gz")
    name, mp = read_multipolygon(f"{RES}/saint_barthelemy.poly")
    tree, parent = [("./stb", name, mp)], {"./stb": None}

    def setup(work):
        os.makedirs(work)
        store = ElementStore(f"{work}/db", n_buckets=16)
        store.import_pbf(f"{RES}/saint_barthelemy.osm.pbf")
        return store

    clean = str(tmp_path / "clean")
    store_c = setup(clean)
    run_update(
        {1: changes}, store_c, tree, parent, f"{clean}/diffs",
        CheckpointManifest(f"{clean}/ckpt"),
    )
    clean_out = _snapshot_bytes(f"{clean}/diffs")
    clean_db = _snapshot_bytes(f"{clean}/db")
    assert clean_out  # the fixture diff produces output

    crash = str(tmp_path / "crash")
    setup(crash)
    env = dict(
        os.environ,
        RAY_GCS=ray.get_runtime_context().gcs_address,
        WORK_DIR=crash,
        KILL_POINT=kill_point,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "resume_kill_child.py")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == -9, proc.stdout + proc.stderr
    assert "NOT_KILLED" not in proc.stdout
    # the sequence pointer never flipped — the batch is still pending
    m_crashed = CheckpointManifest(f"{crash}/ckpt")
    assert m_crashed.sequence is None
    # outputs that DID land pre-crash are already byte-final
    for rel, data in _snapshot_bytes(f"{crash}/diffs").items():
        assert data == clean_out[rel]

    # resume: reopen everything fresh (a new process would) and re-run
    pre_mtimes = {
        rel: os.path.getmtime(os.path.join(crash, "diffs", rel))
        for rel in _snapshot_bytes(f"{crash}/diffs")
    }
    store_r = ElementStore(f"{crash}/db")
    done = run_update(
        {1: changes}, store_r, tree, parent, f"{crash}/diffs",
        CheckpointManifest(f"{crash}/ckpt"),
    )
    assert done == [1]
    assert CheckpointManifest(f"{crash}/ckpt").sequence == 1
    got_out = _snapshot_bytes(f"{crash}/diffs")
    assert got_out == clean_out  # byte-for-byte vs the crash-free run
    assert _snapshot_bytes(f"{crash}/db") == clean_db
    # finished partitions were SKIPPED, not rewritten (recompute-free)
    for rel, mt in pre_mtimes.items():
        assert os.path.getmtime(os.path.join(crash, "diffs", rel)) == mt


def test_resume_after_kill_between_write_and_apply(ray_session, tmp_path):
    """SIGKILL after the partition write committed but before the store
    mutation: resume is byte-for-byte idempotent and recompute-free."""
    _kill_resume_case(tmp_path, "after_write")


def test_resume_after_kill_between_apply_and_commit(ray_session, tmp_path):
    """SIGKILL after the store mutation but before the sequence-pointer
    commit: apply_changes re-runs as an idempotent LWW upsert and the
    resumed state (outputs AND store buckets) is byte-identical."""
    _kill_resume_case(tmp_path, "after_apply")


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
