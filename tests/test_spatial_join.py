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


def test_strtree_candidates_match_cells():
    """Forced "strtree" and "cells" candidate sources yield IDENTICAL
    verdicts (both are candidate supersets refined by the same exact
    predicates) — the parity pin behind PolyTreeIndex's auto mode."""
    t, ext = _payload_extents(4000)
    tree = [(p[: -len(".poly")], mp) for p, mp in synth_polygon_tree()]
    args = (ext["minlon"], ext["minlat"], ext["maxlon"], ext["maxlat"])
    cells = PolyTreeIndex(tree, candidates="cells")
    strtree = PolyTreeIndex(tree, candidates="strtree")
    assert cells.cand_mode == "cells" and strtree.cand_mode == "strtree"
    rc, pc_, vc = cells.verdicts(*args)
    rs, ps, vs = strtree.verdicts(*args)
    assert (rc == rs).all() and (pc_ == ps).all() and vc == vs


def test_auto_mode_picks_strtree_at_polygon_load():
    from osm_replication_rust_ray.sources.synth import synth_polygon_grid

    grid = synth_polygon_grid()
    assert len(grid) == 1080
    idx = PolyTreeIndex(grid, buffer=0)
    assert idx.cand_mode == "strtree"
    # rects are pairwise DISJOINT: at most one assignment per point
    rng = np.random.RandomState(7)
    px = rng.randint(-1_800_000_000, 1_800_000_001, 20000).astype(np.int64)
    py = rng.randint(-900_000_000, 900_000_001, 20000).astype(np.int64)
    rows, polys, verd = idx.verdicts(px, py, px, py)
    assert len(np.unique(rows)) == len(rows)
    assert all(v == "keep" for v in verd)  # buffer=0: no delete zone


def test_rect_pip_is_closed_box_test():
    """Boundary-inclusive parity PIP on an axis-aligned rectangle ring
    == the closed box test, INCLUDING points exactly on edges and
    corners — the equivalence sql_strtree_pip's oracle relies on."""
    from osm_replication_rust_ray.geom import points_in_multipolygon
    from osm_replication_rust_ray.geom import MultiPolygon

    xlo, ylo, xhi, yhi = -100, -50, 200, 70
    xs = np.array([xlo, xhi, xhi, xlo], np.int64)
    ys = np.array([ylo, ylo, yhi, yhi], np.int64)
    rng = np.random.RandomState(0)
    px = rng.randint(-150, 250, 50000).astype(np.int64)
    py = rng.randint(-100, 120, 50000).astype(np.int64)
    edges = np.array(
        [[xlo, 0], [xhi, 0], [0, ylo], [0, yhi],
         [xlo, ylo], [xhi, yhi], [xlo, yhi], [xhi, ylo]], np.int64
    )
    px = np.concatenate([px, edges[:, 0]])
    py = np.concatenate([py, edges[:, 1]])
    want = (px >= xlo) & (px <= xhi) & (py >= ylo) & (py <= yhi)
    for ring in [(xs, ys), (xs[::-1].copy(), ys[::-1].copy())]:
        mp = MultiPolygon.from_rings([ring])
        assert (points_in_multipolygon(px, py, mp) == want).all()


def test_all_exact_points_with_buffer():
    """Regression: buffer>0 with EVERY candidate point exactly inside
    (empty buffered-refine remainder) must not crash the segment walk."""
    tree = [(p[: -len(".poly")], mp) for p, mp in synth_polygon_tree()]
    idx = PolyTreeIndex(tree)
    # points at polygon bbox centers: strictly inside their polygon
    px, py = [], []
    for _p, mp in tree[:4]:
        x0, y0, x1, y1 = mp.bbox()
        px.append((x0 + x1) // 2)
        py.append((y0 + y1) // 2)
    px = np.array(px, np.int64)
    py = np.array(py, np.int64)
    rows, polys, verd = idx.verdicts(px, py, px, py)
    assert len(rows) >= 4 and all(v in ("keep", "delete") for v in verd)
