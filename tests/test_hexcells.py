"""H3-style hexagonal cells (hexcells.py): aperture-7 hierarchy,
center round-trip, exact ring sizes, parent consistency, and the
DuckDB SQL twin."""

import duckdb
import numpy as np
import pandas as pd

from osm_replication_rust_ray.hexcells import (
    encode_hex,
    hex_center,
    hex_distance,
    hex_encode_sql_layers,
    hex_qr,
    hex_res,
    k_ring_hex,
    parent_hex,
)
from osm_replication_rust_ray.sources.synth import chain_layers_sql


def _pts(n=20000, seed=5):
    rng = np.random.RandomState(seed)
    lon = rng.randint(-1_700_000_000, 1_700_000_001, n)
    lat = rng.randint(-850_000_000, 850_000_001, n)
    return lon, lat


def test_center_roundtrip():
    """encode(center(c), res) == c for every observed cell (the center
    is the cell's defining point)."""
    lon, lat = _pts()
    for res in (5, 7, 9):
        cells = np.unique(encode_hex(lon, lat, res))
        clon, clat = hex_center(cells)
        again = encode_hex(
            np.round(clon).astype(np.int64), np.round(clat).astype(np.int64), res
        )
        assert (again == cells).all()


def test_aperture_seven_growth():
    """Distinct-cell counts grow ~7x per resolution on dense uniform
    points (the defining aperture)."""
    lon, lat = _pts(200000)
    # compare at resolutions where cells << points (no saturation)
    n4 = len(np.unique(encode_hex(lon, lat, 4)))
    n5 = len(np.unique(encode_hex(lon, lat, 5)))
    assert 5.0 < n5 / n4 < 9.0, (n4, n5)


def test_k_ring_sizes_and_distance():
    c = int(encode_hex([100_000_000], [50_000_000], 7)[0])
    for k in (1, 2, 3):
        ring = k_ring_hex(c, k)
        assert len(ring) == 1 + 3 * k * (k + 1)
        assert max(hex_distance(c, int(x)) for x in ring.tolist()) == k
    assert hex_distance(c, c) == 0


def test_parent_consistency():
    """A cell's parent contains (by center distance) the cell: the
    parent's center is within one parent-hex size of the child's
    center, and siblings mostly share the parent (~7 children)."""
    lon, lat = _pts(200000)
    c5 = encode_hex(lon, lat, 5)
    p4 = parent_hex(c5, steps=1)
    assert (hex_res(p4) == 4).all()
    # children per parent averages ~7 on dense data
    n_children = len(np.unique(c5))
    n_parents = len(np.unique(p4))
    assert 5.0 < n_children / n_parents < 9.0
    # a point's own res-4 cell equals its res-5 cell's parent for the
    # overwhelming majority (H3-style hierarchies are approximate on
    # the fringe)
    direct = encode_hex(lon, lat, 4)
    agree = (direct == p4).mean()
    assert agree > 0.85, agree


def test_hex_sql_twin_bit_exact():
    lon, lat = _pts(30000, seed=11)
    want = encode_hex(lon, lat, 7)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"lon": lon, "lat": lat}))
    q = chain_layers_sql(
        "(SELECT lon, lat FROM pts)",
        hex_encode_sql_layers("lon", "lat", 7),
    )
    got = con.execute(f"SELECT hex_cell FROM ({q})").df()["hex_cell"].to_numpy()
    assert (got == want).all()
