"""Targeted pathological shapes for the block-boundary logic in the
sorted-segment aggregate, the as-of join, and the tree verdict chain."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_segment_aggregate_single_key_spans_every_block(ray_session):
    import ray.data

    from osm_replication_rust_ray.functions.agg import sorted_segment_aggregate

    n = 20000
    vals = np.random.RandomState(1).randint(-(10**9), 10**9, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(np.zeros(n, np.int64)), "v": pa.array(vals)})
    ).repartition(10)
    out = sorted_segment_aggregate(
        ds, "k", {"mn": ("v", "min"), "mx": ("v", "max"), "n": ("v", "count")}
    ).to_pandas()
    assert len(out) == 1
    assert out["mn"][0] == vals.min()
    assert out["mx"][0] == vals.max()
    assert out["n"][0] == n


def test_asof_single_key_states_across_many_blocks(ray_session):
    import ray.data

    from osm_replication_rust_ray.functions.asof import asof_join

    # one key; states at t=0,100,200,...; probes hit between states;
    # many partitions force cross-block resolution through summaries
    st = np.arange(0, 2000, 100, dtype=np.int64)
    states = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(np.zeros(len(st), np.int64)),
                "t": pa.array(st),
                "v": pa.array(st * 10),
            }
        )
    ).repartition(6)
    pt = np.arange(5, 2005, 10, dtype=np.int64)
    probes = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(np.zeros(len(pt), np.int64)),
                "t": pa.array(pt),
                "pid": pa.array(np.arange(len(pt), dtype=np.int64)),
            }
        )
    ).repartition(8)
    got = (
        asof_join(probes, states, by="k", on="t", state_cols=["v"])
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    want = (pt // 100) * 1000  # latest state at-or-before each probe
    assert (got["v"].to_numpy() == want).all()


def test_tree_chain_delete_action_rewrite():
    """Point in the child's exact polygon but only in the parent's
    buffer: assigned to both with action 'delete' (the rewrite chain of
    src/osmxml/filter.rs:231,256,294 through src/diffs.rs:174-185)."""
    from osm_replication_rust_ray.geom import MultiPolygon
    from osm_replication_rust_ray.stages.spatial_join import PolyTreeIndex

    def rect(x0, y0, x1, y1):
        return MultiPolygon.from_rings(
            [(
                np.array([x0, x1, x1, x0], np.int64),
                np.array([y0, y0, y1, y1], np.int64),
            )]
        )

    # parent exact: x in [0, 100]; buffer 50 -> buffered reach to 150
    # child exact: x in [110, 140] (inside parent's buffer zone only)
    entries = [
        ("./p", rect(0, 0, 100, 1_000_000)),
        ("./p/c", rect(110, 0, 140, 1_000_000)),
    ]
    index = PolyTreeIndex(entries, buffer=50)
    lon = np.array([120], np.int64)  # inside child exact, parent buffer only
    lat = np.array([500_000], np.int64)
    rows, polys, verdicts = index.verdicts(lon, lat, lon, lat)
    got = {(index.paths[p], v) for p, v in zip(polys, verdicts)}
    assert got == {("./p", "delete"), ("./p/c", "delete")}
    # and a point in both exacts -> keep on both
    lon2 = np.array([50], np.int64)
    rows2, polys2, verdicts2 = index.verdicts(lon2, lat, lon2, lat)
    got2 = {(index.paths[p], v) for p, v in zip(polys2, verdicts2)}
    assert ("./p", "keep") in got2
