"""Distributed polygon filter (stages/filter_dist.py) parity.

The sequential automaton (`stages/filter.py:filter_verdicts`) is the
reference-parity oracle (pinned to the reference's fixtures and the
33/7/9 + 50/7/2 lookup-count invariants); the distributed join/fixpoint
formulation must produce IDENTICAL verdicts with the diff flowing
through ``ray.data`` blocks, and the tree driver must chain children on
parent outputs exactly like `filter_tree` (src/diffs.rs:174-185).
"""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.geom import MultiPolygon
from osm_replication_rust_ray.sources.store import Resolver
from osm_replication_rust_ray.sources.synth import synth_changes, synth_store
from osm_replication_rust_ray.stages.bbox import annotate_bbox, closure_node_ids
from osm_replication_rust_ray.stages.bbox_dist import annotate_bbox_dist
from osm_replication_rust_ray.stages.dist import build_diff_plan, flat_store_from_tables
from osm_replication_rust_ray.stages.filter import (
    filter_tree,
    filter_verdicts,
    precompute_membership,
)
from osm_replication_rust_ray.stages.filter_dist import (
    VERDICT_NAMES,
    filter_tree_dist,
    filter_verdicts_dist,
)


def _rect(cx, cy, half):
    return (
        np.array([cx - half, cx + half, cx + half, cx - half]),
        np.array([cy - half, cy - half, cy + half, cy + half]),
    )


def _setup(n):
    import ray.data

    elements = synth_changes(n)
    nodes, ways, rels = synth_store(n)
    resolver = Resolver(nodes, ways, rels)
    annotated = annotate_bbox(elements, resolver)
    nid_arr = closure_node_ids(annotated, resolver)
    flat = flat_store_from_tables(nodes, ways, rels)
    plan = build_diff_plan(ray.data.from_arrow(elements).repartition(4), flat)
    boxes = annotate_bbox_dist(plan).materialize()
    return annotated, resolver, nid_arr, plan, boxes


@pytest.mark.parametrize("n,mode", [(100, "chordal"), (60, "euclidean")])
def test_filter_dist_matches_sequential(ray_session, n, mode):
    annotated, resolver, nid_arr, plan, boxes = _setup(n)
    # quadrant polygon with a hole -> mixes keep/delete/drop
    mp = MultiPolygon.from_rings(
        [
            _rect(400_000_000, 200_000_000, 900_000_000),
            _rect(300_000_000, 100_000_000, 150_000_000),
        ]
    )
    memb = precompute_membership(
        annotated, mp, resolver, nid_arr, buffer_mode=mode
    )
    seq = filter_verdicts(annotated, memb, resolver)
    got = (
        filter_verdicts_dist(plan, boxes, mp, buffer_mode=mode)
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    got_v = VERDICT_NAMES[got["verdict"].to_numpy()]
    assert got_v.tolist() == seq.tolist()


def test_filter_tree_dist_matches_sequential(ray_session):
    """Parent->child chaining (incl. the parent-delete action carry);
    the wider sibling matrix runs in the /tmp parity harness — this
    keeps the suite's fixed Ray-overhead cost bounded."""
    annotated, resolver, nid_arr, plan, boxes = _setup(100)
    tree = [
        ("./a", "a", MultiPolygon.from_rings([_rect(0, 0, 900_000_000)])),
        ("./a/inner", "inner", MultiPolygon.from_rings([_rect(0, 0, 300_000_000)])),
    ]
    parent = {"./a": None, "./a/inner": "./a"}
    seq = filter_tree(annotated, tree, parent, resolver, nid_arr)
    got = filter_tree_dist(plan, boxes, tree, parent).to_pandas()
    cols = ["pos", "etype", "id", "poly_path", "action"]
    a = seq.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    b = got[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
