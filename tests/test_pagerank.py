"""Integer fixed-point PageRank: distributed iterative-join result vs a
single-process numpy reference on a random graph (incl. nodes with no
in-edges and duplicate edges)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osm_replication_rust_ray.functions.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    TELEPORT,
    pagerank,
)


def _reference(n, src, dst, outdeg_of, n_iter):
    r = np.full(n, SCALE, np.int64)
    for _ in range(n_iter):
        inc = np.zeros(n, np.int64)
        np.add.at(inc, dst, r[src] // outdeg_of[src])
        r = TELEPORT + (DAMP_NUM * inc) // DAMP_DEN
    return r


def test_pagerank_matches_reference(ray_session):
    rng = np.random.default_rng(13)
    n, m = 200, 800
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    outdeg_of = np.bincount(src, minlength=n)
    # every src has outdeg >= 1 by construction of bincount; nodes that
    # never appear as src simply contribute nothing (outdeg unused)
    nodes = rd.from_arrow(pa.table({"v": pa.array(np.arange(n), pa.int64())}))
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "outdeg": pa.array(outdeg_of[src], pa.int64()),
            }
        )
    )
    got = (
        pagerank(nodes, edges, n_iter=3, est_nodes=n)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    want = _reference(n, src, dst, outdeg_of, 3)
    assert (got["v"].to_numpy() == np.arange(n)).all()
    assert (got["rank"].to_numpy() == want).all()
    # sanity: teleport floor for in-edge-free nodes
    no_in = np.setdiff1d(np.arange(n), dst)
    if len(no_in):
        assert (got["rank"].to_numpy()[no_in] == TELEPORT).all()
