"""Property-based checks of the hierarchical cell index contract:
encode/decode round-trip, parent prefix-compatibility, bounds
containment, k-ring membership."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_replication_rust_ray.cells import (
    cell_bounds,
    cell_from_xy,
    cell_res,
    cell_xy,
    encode_cells,
    k_ring,
    parent_cells,
    xy_at_res,
)

LON = st.integers(min_value=-1_800_000_000, max_value=1_800_000_000)
LAT = st.integers(min_value=-900_000_000, max_value=900_000_000)
RES = st.integers(min_value=1, max_value=12)


@settings(max_examples=200, deadline=None)
@given(LON, LAT, RES)
def test_encode_roundtrip_and_bounds(lon, lat, res):
    c = encode_cells(np.array([lon]), np.array([lat]), res)
    assert cell_res(c)[0] == res
    x, y = cell_xy(c)
    x2, y2 = xy_at_res(np.array([lon]), np.array([lat]), res)
    assert x[0] == x2[0] and y[0] == y2[0]
    assert cell_from_xy(x, y, res)[0] == c[0]
    minlon, minlat, maxlon, maxlat = cell_bounds(c)
    assert minlon[0] <= lon <= maxlon[0]
    assert minlat[0] <= lat <= maxlat[0]


@settings(max_examples=200, deadline=None)
@given(LON, LAT, RES, st.integers(min_value=1, max_value=4))
def test_parent_is_prefix_compatible(lon, lat, res, steps):
    if steps >= res:
        steps = res - 1
    if steps == 0:
        return
    child = encode_cells(np.array([lon]), np.array([lat]), res)
    direct = encode_cells(np.array([lon]), np.array([lat]), res - steps)
    assert parent_cells(child, steps)[0] == direct[0]


@settings(max_examples=60, deadline=None)
@given(LON, LAT, st.integers(min_value=2, max_value=8), st.integers(min_value=1, max_value=2))
def test_k_ring_contains_center_and_stays_at_res(lon, lat, res, k):
    c = int(encode_cells(np.array([lon]), np.array([lat]), res)[0])
    ring = k_ring(c, k)
    assert c in set(ring.tolist())
    assert (cell_res(ring) == res).all()
    cx, cy = cell_xy(np.array([c]))
    xs, ys = cell_xy(ring)
    assert (np.abs(xs - cx[0]) <= k).all()
    assert (np.abs(ys - cy[0]) <= k).all()
