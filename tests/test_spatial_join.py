"""Spatial join + kNN: cell-index results must equal brute force."""

import numpy as np
import pyarrow as pa

from osm_replication_rust_ray.geom import (
    BUFFER_DECIMICRO,
    boxes_intersect_buffered,
    boxes_intersect_multipolygon,
)
from osm_replication_rust_ray.sources.synth import (
    derive_extents,
    payload_batch,
    synth_polygon_tree,
)
from osm_replication_rust_ray.stages.knn import CellKNNIndex, brute_force_nn
from osm_replication_rust_ray.stages.spatial_join import PolyTreeIndex, parent_path


def _payload_extents(n=3000):
    t = payload_batch(np.arange(n), with_bytes=False)
    ext = derive_extents(t["phash"].to_numpy(zero_copy_only=False))
    return t, ext


def brute_force_assignments(ext, tree):
    paths = [p for p, _ in tree]
    polys = [mp for _, mp in tree]
    def eff_parent(p):
        par = parent_path(p)
        while par is not None and par not in paths:
            par = parent_path(par)
        return par

    parent = {p: eff_parent(p) for p in paths}
    v = {}
    n = len(ext["minlat"])
    for pi, mp in enumerate(polys):
        exact = boxes_intersect_multipolygon(
            ext["minlon"], ext["minlat"], ext["maxlon"], ext["maxlat"], mp
        )
        buf = boxes_intersect_buffered(
            ext["minlon"], ext["minlat"], ext["maxlon"], ext["maxlat"], mp,
            buffer=BUFFER_DECIMICRO,
        )
        for i in range(n):
            if exact[i]:
                v[(i, pi)] = "keep"
            elif buf[i]:
                v[(i, pi)] = "delete"
    idx_of = {p: i for i, p in enumerate(paths)}
    out = set()
    for (i, pi), verd in v.items():
        ok, anydel = True, verd == "delete"
        a = parent[paths[pi]]
        while a is not None:
            pv = v.get((i, idx_of[a]))
            if pv is None:
                ok = False
                break
            anydel |= pv == "delete"
            a = parent[a]
        if ok:
            out.add((i, paths[pi], "delete" if anydel else "keep"))
    return out


def test_spatial_join_matches_brute_force():
    _, ext = _payload_extents(3000)
    tree = [("./" + p[: -len(".poly")], mp) for p, mp in synth_polygon_tree()]
    index = PolyTreeIndex(tree)
    rows, polys, verdicts = index.verdicts(
        ext["minlon"], ext["minlat"], ext["maxlon"], ext["maxlat"]
    )
    got = {
        (int(r), index.paths[int(p)], v)
        for r, p, v in zip(rows, polys, verdicts)
    }
    expected = brute_force_assignments(ext, tree)
    assert got == expected
    assert len(expected) > 50  # fixture actually exercises the tree


def test_hotspot_skew_present():
    _, ext = _payload_extents(5000)
    from osm_replication_rust_ray.cells import encode_cells

    clon = (ext["minlon"] + ext["maxlon"]) // 2
    clat = (ext["minlat"] + ext["maxlat"]) // 2
    cells = encode_cells(clon, clat, 9)
    _, counts = np.unique(cells, return_counts=True)
    assert counts.max() > 0.15 * len(clon)  # the urban hotspot exists


def test_knn_matches_brute_force():
    rng = np.random.default_rng(11)
    fid = np.arange(400, dtype=np.int64)
    flon = rng.integers(-1_700_000_000, 1_700_000_000, 400)
    flat = rng.integers(-850_000_000, 850_000_000, 400)
    # duplicate position to exercise the id tie-break
    flon[101], flat[101] = flon[100], flat[100]
    qlon = rng.integers(-1_800_000_000, 1_800_000_000, 500)
    qlat = rng.integers(-900_000_000, 900_000_000, 500)
    idx = CellKNNIndex(fid, flon, flat, res=6)
    got_id, got_d2 = idx.query(qlon, qlat, k=1)
    exp_id, exp_d2 = brute_force_nn(fid, flon, flat, qlon, qlat)
    np.testing.assert_allclose(got_d2[:, 0], exp_d2, rtol=1e-12)
    assert (got_id[:, 0] == exp_id).all()
