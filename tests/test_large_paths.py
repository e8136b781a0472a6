"""Coverage for the large-input code paths that the fast paths bypass
at fixture scale: the expanding-ring kNN search (>1024 features) and
the multi-word tree bitmask (>64 polygons)."""

import numpy as np

from osm_replication_rust_ray.geom import MultiPolygon
from osm_replication_rust_ray.stages.knn import CellKNNIndex, brute_force_nn
from osm_replication_rust_ray.stages.spatial_join import PolyTreeIndex


def test_knn_ring_search_matches_brute_force():
    rng = np.random.default_rng(5)
    n_feat = 2500  # > the 1024 brute-force fast-path threshold
    fid = np.arange(n_feat, dtype=np.int64)
    flon = rng.integers(-1_700_000_000, 1_700_000_000, n_feat)
    flat = rng.integers(-850_000_000, 850_000_000, n_feat)
    flon[7], flat[7] = flon[3], flat[3]  # id tie-break case
    qlon = rng.integers(-1_800_000_000, 1_800_000_000, 300)
    qlat = rng.integers(-900_000_000, 900_000_000, 300)
    idx = CellKNNIndex(fid, flon, flat, res=6)
    got_id, got_d2 = idx.query(qlon, qlat, k=1)
    exp_id, exp_d2 = brute_force_nn(fid, flon, flat, qlon, qlat)
    np.testing.assert_allclose(got_d2[:, 0], exp_d2, rtol=1e-12)
    assert (got_id[:, 0] == exp_id).all()


def _rect(cx, cy, half):
    return MultiPolygon.from_rings(
        [(
            np.array([cx - half, cx + half, cx + half, cx - half], np.int64),
            np.array([cy - half, cy - half, cy + half, cy + half], np.int64),
        )]
    )


def test_tree_with_more_than_64_polys_multiword_masks():
    # 9 root regions, each with 8 children = 81 polygons -> 2 mask words
    entries = []
    for r in range(9):
        cx = -1_600_000_000 + r * 400_000_000
        entries.append((f"./r{r}", _rect(cx, 0, 150_000_000)))
        for c in range(8):
            entries.append(
                (f"./r{r}/c{c}", _rect(cx - 120_000_000 + c * 34_000_000, 0, 16_000_000))
            )
    index = PolyTreeIndex(entries, buffer=1_000_000)
    assert index._n_words == 2
    rng = np.random.default_rng(9)
    lon = rng.integers(-1_800_000_000, 1_800_000_000, 4000)
    lat = rng.integers(-300_000_000, 300_000_000, 4000)
    rows, polys, verdicts = index.verdicts(lon, lat, lon, lat)
    # brute-force oracle: per point, membership of every polygon with
    # buffered fallback, chained through ancestors
    from osm_replication_rust_ray.geom import points_in_buffered, points_in_multipolygon

    states = {}
    for p, (path, mp) in enumerate(entries):
        ex = points_in_multipolygon(lon, lat, mp)
        bf = points_in_buffered(lon, lat, mp, buffer=1_000_000)
        states[path] = (ex, bf)
    expected = set()
    for i in range(len(lon)):
        for path, mp in entries:
            parts = path.split("/")
            chain = ["/".join(parts[: k + 1]) for k in range(1, len(parts))]
            ok = True
            any_del = False
            for anc in chain:
                ex, bf = states[anc]
                if ex[i]:
                    pass
                elif bf[i]:
                    any_del = True
                else:
                    ok = False
                    break
            if ok:
                expected.add((i, path, "delete" if any_del else "keep"))
    got = {
        (int(r), entries[int(p)][0], v)
        for r, p, v in zip(rows, polys, verdicts)
    }
    assert got == expected
