"""Arrow IPC custom Datasource/Datasink (sources/ipc.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc
import pytest


@pytest.fixture
def tmp_ipc_dir(tmp_path):
    return str(tmp_path / "ipc")


def test_ipc_roundtrip_and_pruning(ray_session, tmp_ipc_dir):
    import ray.data as rd

    from osm_replication_rust_ray.sources.ipc import read_ipc, write_ipc

    t = pa.table(
        {
            "a": pa.array(np.arange(1000), pa.int64()),
            "b": pa.array([f"s{i}" for i in range(1000)], pa.string()),
            "c": pa.array(np.arange(1000) * 2.5, pa.float64()),
        }
    )
    write_ipc(rd.from_arrow(t).repartition(4), tmp_ipc_dir)

    back = read_ipc(tmp_ipc_dir).sort("a").take_all()
    assert len(back) == 1000
    assert back[5] == {"a": 5, "b": "s5", "c": 12.5}

    pruned = read_ipc(tmp_ipc_dir, columns=["a"])
    assert pruned.schema().names == ["a"]
    assert pruned.count() == 1000


def test_ipc_files_are_random_access(ray_session, tmp_ipc_dir):
    """The sink writes footer-addressed IPC files (one per block):
    open_file must succeed and expose O(1) batch addressing."""
    import glob

    import ray.data as rd

    from osm_replication_rust_ray.sources.ipc import write_ipc

    t = pa.table({"x": pa.array(np.arange(100), pa.int64())})
    write_ipc(rd.from_arrow(t).repartition(2), tmp_ipc_dir)
    files = sorted(glob.glob(f"{tmp_ipc_dir}/*"))
    assert len(files) == 2
    total = 0
    for f in files:
        r = ipc.open_file(f)
        assert r.num_record_batches >= 1
        total += sum(
            r.get_batch(i).num_rows for i in range(r.num_record_batches)
        )
    assert total == 100
