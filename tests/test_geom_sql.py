"""SQL geometry emitters (functions/geom_sql.py) must be boolean-
equivalent to the exact integer predicates in geom.py — pinned over
random boxes (points / small / large / giant) against every synthetic
tree polygon, plus the generator-arithmetic SQL twins."""

import duckdb
import numpy as np
import pandas as pd

from osm_replication_rust_ray.functions.geom_sql import box_intersect_sql, pip_parity_sql
from osm_replication_rust_ray.geom import (
    boxes_intersect_multipolygon,
    points_in_multipolygon,
)
from osm_replication_rust_ray.sources.synth import (
    _mix64,
    chain_layers_sql,
    mix64_sql_layers,
    seed_hash,
    synth_polygon_tree,
    ubig_to_int64_sql,
)


def _boxes(n=2000, seed=3):
    rng = np.random.RandomState(seed)
    lon = rng.randint(-1_800_000_000, 1_800_000_001, n)
    lat = rng.randint(-900_000_000, 900_000_001, n)
    half = np.array([0, 50_000, 5_000_000, 120_000_000])[rng.randint(0, 4, n)]
    return lon - half, lat - half, lon + half, lat + half


def test_box_intersect_sql_equals_numpy():
    lox, loy, hix, hiy = _boxes()
    con = duckdb.connect()
    con.register(
        "boxes", pd.DataFrame({"lox": lox, "loy": loy, "hix": hix, "hiy": hiy})
    )
    for path, mp in synth_polygon_tree():
        want = boxes_intersect_multipolygon(lox, loy, hix, hiy, mp)
        got = (
            con.execute(
                f"SELECT {box_intersect_sql(mp, 'lox', 'loy', 'hix', 'hiy')} FROM boxes"
            )
            .df()
            .iloc[:, 0]
            .to_numpy()
            .astype(bool)
        )
        assert (got == want).all(), path


def test_pip_parity_sql_equals_numpy_points():
    lox, loy, _hix, _hiy = _boxes(seed=9)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"px": lox, "py": loy}))
    for path, mp in synth_polygon_tree():
        want = points_in_multipolygon(lox, loy, mp)
        got = (
            con.execute(f"SELECT {pip_parity_sql(mp, 'px', 'py')} FROM pts")
            .df()
            .iloc[:, 0]
            .to_numpy()
            .astype(bool)
        )
        # parity-only SQL omits the boundary term: assert no random
        # point landed exactly on an edge (the empirical-margin check
        # that keeps the oracle honest), then exact equality
        assert (got == want).all(), path


def test_mix64_sql_matches_numpy():
    con = duckdb.connect()
    layers = mix64_sql_layers(f"xor(i::UBIGINT, {seed_hash()}::UBIGINT)", "h", "h")
    layers += mix64_sql_layers("h", "ph", "p")
    q = chain_layers_sql("(SELECT unnest(generate_series(0, 4999)) AS i)", layers)
    got = (
        con.execute(
            f"SELECT i, {ubig_to_int64_sql('ph')} AS phash FROM ({q}) ORDER BY i"
        )
        .df()["phash"]
        .to_numpy()
    )
    i = np.arange(5000, dtype=np.int64)
    h = _mix64(i.astype(np.uint64) ^ _mix64(np.full(5000, 42, np.uint64)))
    assert (got == _mix64(h).view(np.int64)).all()


def test_no_derived_point_on_pip_polygon_edge():
    """STRUCTURAL version of _pip_sql_expr's boundary claim (round-3
    verdict item #7): the pip oracle (pipelines/queries.py:_pip_sql_expr)
    omits the boundary-inclusive term on the grounds that derived event
    points never land on a PIP_POLYS edge.  Pin that as an invariant at
    every gate sf — a future polygon-set or derivation edit that puts a
    point exactly on an edge must fail HERE, not silently flip the
    oracle's verdict for that row."""
    import os

    import pyarrow.parquet as pq

    from osm_replication_rust_ray.functions import derive
    from osm_replication_rust_ray.pipelines.queries import PIP_POLYS

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        path = f"{sf}/events.parquet"
        if not os.path.exists(path):
            continue
        ids = pq.read_table(path, columns=["event_id"])[
            "event_id"
        ].to_numpy(zero_copy_only=False)
        px = derive.world_lon(ids)
        py = derive.world_lat(ids)
        for name, mp in PIP_POLYS:
            for x1, y1, x2, y2 in zip(
                mp.ex1.tolist(), mp.ey1.tolist(),
                mp.ex2.tolist(), mp.ey2.tolist(),
            ):
                # int64-exact: |dx*(py-y1)| <= 6e8 * 1.5e9 = 9e17 and
                # |(px-x1)*dy| <= 3.3e9 * 4.8e8 = 1.6e18; the sum stays
                # far below 2**63
                det = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
                on_line = det == 0
                if not on_line.any():
                    continue
                in_span = (
                    (np.minimum(x1, x2) <= px) & (px <= np.maximum(x1, x2))
                    & (np.minimum(y1, y2) <= py) & (py <= np.maximum(y1, y2))
                )
                bad = on_line & in_span
                assert not bad.any(), (
                    f"{sf}: {int(bad.sum())} derived point(s) lie exactly "
                    f"on an edge of PIP_POLYS[{name!r}] — the pip oracle's "
                    f"omitted boundary term is no longer sound"
                )
