"""The replication loop's distributed branch (update._run_sequence_dist)
must write the SAME rows as the sequential parity path — same
partitions, same (pos, etype, id, action, poly_path) row set, same
manifest lineage counts — with the diff flowing through ray.data
blocks.  Verdict-level equality of the underlying machinery is pinned
separately (tests/test_bbox_dist.py, tests/test_filter_dist.py); this
is the end-to-end wiring check, fixture-sized so the suite stays fast.
"""

import os

import pandas as pd
import pyarrow.parquet as pq

from osm_replication_rust_ray.pipelines.update import run_sequence
from osm_replication_rust_ray.sources.osmxml import parse_osm_xml
from osm_replication_rust_ray.sources.polyfile import read_multipolygon
from osm_replication_rust_ray.sources.store import ElementStore
from osm_replication_rust_ray.state.manifest import CheckpointManifest

RES = "/root/reference/tests/resources"
COLS = ["pos", "etype", "id", "action", "poly_path"]


def _read_all(out_dir: str) -> pd.DataFrame:
    frames = []
    for dirpath, _d, files in os.walk(out_dir):
        frames += [
            pq.read_table(os.path.join(dirpath, f)).to_pandas()
            for f in files if f.endswith(".parquet")
        ]
    return (
        pd.concat(frames)[COLS].sort_values(COLS).reset_index(drop=True)
        if frames else pd.DataFrame(columns=COLS)
    )


def test_run_sequence_dist_matches_sequential(ray_session, tmp_path):
    changes = parse_osm_xml(f"{RES}/saint_barthelemy.osc.gz")
    name, mp = read_multipolygon(f"{RES}/saint_barthelemy.poly")
    tree, parent = [("./stb", name, mp)], {"./stb": None}

    outs = {}
    for mode, distributed in (("seq", False), ("dist", True)):
        work = str(tmp_path / mode)
        store = ElementStore(f"{work}/db", n_buckets=16)
        store.import_pbf(f"{RES}/saint_barthelemy.osm.pbf")
        m = CheckpointManifest(f"{work}/ckpt")
        run_sequence(
            changes, store, tree, parent, f"{work}/diffs", m, 1,
            distributed=distributed,
        )
        m2 = CheckpointManifest(f"{work}/ckpt")
        assert m2.sequence == 1
        outs[mode] = (_read_all(f"{work}/diffs"), m2.totals())

    (seq_rows, seq_tot), (dist_rows, dist_tot) = outs["seq"], outs["dist"]
    assert len(seq_rows) > 0
    assert seq_rows.equals(dist_rows)
    assert seq_tot[0] == dist_tot[0]  # same lineage row counts
