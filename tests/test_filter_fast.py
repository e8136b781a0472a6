"""Fast (vectorized-node) filter path and Ray-parallel tree walk must
produce byte-identical verdicts/assignments to the reference-parity
sequential implementations — on the reference fixtures AND larger
synthetic diffs."""

import numpy as np
import pyarrow as pa

from osm_replication_rust_ray.geom import MultiPolygon
from osm_replication_rust_ray.sources.osmxml import parse_osm_xml
from osm_replication_rust_ray.sources.polyfile import read_multipolygon
from osm_replication_rust_ray.sources.store import Resolver
from osm_replication_rust_ray.sources.synth import synth_changes
from osm_replication_rust_ray.stages.bbox import annotate_bbox, needed_ids
from osm_replication_rust_ray.stages.filter import (
    filter_tree,
    filter_tree_parallel,
    filter_verdicts,
    filter_verdicts_fast,
    precompute_membership,
)

RES = "/root/reference/tests/resources"


def _verdict_pair(elements, mp, node_ids):
    m1 = precompute_membership(elements, mp, Resolver(None, None, None), node_ids)
    v1 = filter_verdicts(elements, m1, Resolver(None, None, None))
    m2 = precompute_membership(elements, mp, Resolver(None, None, None), node_ids)
    v2 = filter_verdicts_fast(elements, m2, Resolver(None, None, None))
    return v1, v2


def test_fast_verdicts_match_on_reference_fixture():
    elements = parse_osm_xml(f"{RES}/saint_barthelemy.bbox.osc.gz")
    _, mp = read_multipolygon(f"{RES}/saint_barthelemy.poly")
    nid, _, _ = needed_ids(elements, Resolver(None, None, None))
    v1, v2 = _verdict_pair(elements, mp, np.array(sorted(nid), np.int64))
    assert v1.tolist() == v2.tolist()


def test_fast_verdicts_match_on_synth_diff():
    changes = annotate_bbox(synth_changes(6000), Resolver(None, None, None))
    mp = MultiPolygon.from_rings(
        [(
            np.array([-900_000_000, 900_000_000, 900_000_000, -900_000_000]),
            np.array([-450_000_000, -450_000_000, 450_000_000, 450_000_000]),
        )]
    )
    nid, _, _ = needed_ids(changes, Resolver(None, None, None))
    v1, v2 = _verdict_pair(changes, mp, np.array(sorted(nid), np.int64))
    assert v1.tolist() == v2.tolist()


def test_parallel_tree_matches_sequential(ray_session):
    changes = annotate_bbox(synth_changes(4000), Resolver(None, None, None))
    nid, _, _ = needed_ids(changes, Resolver(None, None, None))
    nid_arr = np.array(sorted(nid), np.int64)

    def rect(cx, cy, half):
        return MultiPolygon.from_rings(
            [(
                np.array([cx - half, cx + half, cx + half, cx - half]),
                np.array([cy - half, cy - half, cy + half, cy + half]),
            )]
        )

    tree = [
        ("./a", "a", rect(0, 0, 900_000_000)),
        ("./a/inner", "inner", rect(0, 0, 300_000_000)),
        ("./b", "b", rect(1_200_000_000, 0, 400_000_000)),
    ]
    parent = {"./a": None, "./a/inner": "./a", "./b": None}
    seq = filter_tree(changes, tree, parent, Resolver(None, None, None), nid_arr)
    par = filter_tree_parallel(
        changes, tree, parent, Resolver(None, None, None), nid_arr
    )
    cols = ["pos", "etype", "id", "poly_path", "action"]
    a = seq.to_pandas().sort_values(cols).reset_index(drop=True)
    b = par.to_pandas().sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
