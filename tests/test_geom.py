"""Geometry kernel golden tests.

Ports the reference's own unit assertions (values, not code):
- .poly parsing goldens: africa exact coords, canarias ring counts
  (src/osmgeom.rs:80-138)
- the PIP / degenerate-box boundary matrix (src/osmgeom.rs:139-221)
"""

import numpy as np
import pytest

from osm_replication_rust_ray.geom import (
    MultiPolygon,
    boxes_intersect_buffered,
    boxes_intersect_multipolygon,
    coord_to_decimicro,
    points_in_buffered,
    points_in_multipolygon,
    points_on_boundary,
)
from osm_replication_rust_ray.sources.polyfile import read_multipolygon

RES = "/root/reference/tests/resources"


def test_coord_codec_round_half_away():
    assert coord_to_decimicro(1.23456785).tolist() == 12345679  # .5 rounds away
    assert coord_to_decimicro(-1.23456785).tolist() == -12345679
    assert coord_to_decimicro(0.0).tolist() == 0
    assert coord_to_decimicro(33.9987500).tolist() == 339987500


def test_read_africa_exact():
    name, mp = read_multipolygon(f"{RES}/africa.poly")
    assert name == "africa"
    assert mp.n_rings == 1
    xs, ys = mp.ring(0)
    # first / last-kept vertices from the reference golden
    # (closing duplicate removed by our representation: 33 file coords -> 32)
    assert len(xs) == 32
    assert (xs[0], ys[0]) == (116009200, 339987500)
    assert (xs[1], ys[1]) == (116020700, 377781700)
    assert (xs[-1], ys[-1]) == (327062930, 339752580)


def test_read_canarias_ring_counts():
    name, mp = read_multipolygon(f"{RES}/canarias.poly")
    assert name == "polygon"
    assert mp.n_rings == 9
    # reference counts include the closing duplicate vertex; ours do not
    expected_with_dup = [8, 55, 9, 61, 69, 72, 24, 33, 29]
    got = [len(mp.ring(i)[0]) + 1 for i in range(mp.n_rings)]
    assert got == expected_with_dup


@pytest.fixture(scope="module")
def canarias():
    return read_multipolygon(f"{RES}/canarias.poly")[1]


def _box(mp, minlat, maxlat, minlon, maxlon):
    return boxes_intersect_multipolygon(
        np.array([minlon]), np.array([minlat]), np.array([maxlon]), np.array([maxlat]), mp
    )[0]


def test_intersects_canarias_points(canarias):
    assert not points_in_multipolygon([0], [0], canarias)[0]
    assert points_in_multipolygon([-166015000], [281876000], canarias)[0]


def test_intersects_canarias_box_matrix(canarias):
    # bounding-box outside polygon
    assert not _box(canarias, -266015000, 0, -366015000, -266015000)
    # single-point box outside
    assert not _box(canarias, 0, 0, 0, 0)
    # single-line box outside
    assert not _box(canarias, 0, 0, -166015200, -166015100)
    # box overlapping polygon
    assert _box(canarias, 0, 281876000, -166015000, 0)
    assert _box(canarias, 281875000, 281876000, -166015200, -166015100)
    # single-point box ON the polygon
    assert _box(canarias, 281876000, 281876000, -166015100, -166015100)
    # single-line boxes touching the polygon
    assert _box(canarias, 281875000, 281876000, -166015100, -166015100)
    assert _box(canarias, 281876000, 281876000, -166015200, -166015100)


def test_boundary_inclusive_simple_square():
    mp = MultiPolygon.from_rings(
        [(np.array([0, 10, 10, 0]), np.array([0, 0, 10, 10]))]
    )
    px = [5, 0, 10, 5, 0, 11, -1, 10]
    py = [5, 0, 10, 0, 5, 5, -1, 5]
    exp = [True, True, True, True, True, False, False, True]
    assert points_in_multipolygon(px, py, mp).tolist() == exp
    assert points_on_boundary(px, py, mp).tolist() == [
        False,
        True,
        True,
        True,
        True,
        False,
        False,
        True,
    ]


def test_multi_ring_any_semantics():
    mp = MultiPolygon.from_rings(
        [
            (np.array([0, 10, 10, 0]), np.array([0, 0, 10, 10])),
            (np.array([100, 110, 110, 100]), np.array([0, 0, 10, 10])),
        ]
    )
    assert points_in_multipolygon([105], [5], mp)[0]
    assert points_in_multipolygon([5], [5], mp)[0]
    assert not points_in_multipolygon([50], [5], mp)[0]


def test_buffered_membership():
    mp = MultiPolygon.from_rings(
        [(np.array([0, 1000, 1000, 0]), np.array([0, 0, 1000, 1000]))]
    )
    # buffer=100 units: point at distance 100 from the edge is in
    assert points_in_buffered([-100], [500], mp, buffer=100)[0]
    assert not points_in_buffered([-101], [500], mp, buffer=100)[0]
    # corner: Euclidean distance
    assert points_in_buffered([-70], [-70], mp, buffer=100)[0]  # ~98.99
    assert not points_in_buffered([-71], [-71], mp, buffer=100)[0]  # ~100.4
    # inside always
    assert points_in_buffered([500], [500], mp, buffer=100)[0]


def test_box_vs_buffered():
    mp = MultiPolygon.from_rings(
        [(np.array([0, 1000, 1000, 0]), np.array([0, 0, 1000, 1000]))]
    )
    # box 100 away (gap exactly 100) -> within buffer 100
    assert boxes_intersect_buffered([-200], [0], [-100], [1000], mp, buffer=100)[0]
    assert not boxes_intersect_buffered([-250], [0], [-101], [1000], mp, buffer=100)[0]
    # overlapping box
    assert boxes_intersect_buffered([500], [500], [1500], [1500], mp, buffer=100)[0]
    # fully-inside box
    assert boxes_intersect_buffered([400], [400], [600], [600], mp, buffer=100)[0]
    # polygon fully inside huge box
    assert boxes_intersect_buffered([-10**6], [-10**6], [10**6], [10**6], mp, buffer=100)[0]


def test_point_exactly_on_vertex_and_large_coords(canarias):
    # every polygon vertex is on the boundary -> intersects
    xs, ys = canarias.ring(1)
    assert points_in_multipolygon(xs, ys, canarias).all()
    assert points_on_boundary(xs, ys, canarias).all()


def test_africa_point_far_away_no_overflow():
    _, mp = read_multipolygon(f"{RES}/africa.poly")
    # extreme coordinates exercise the exact-fallback path
    assert not points_in_multipolygon([1_800_000_000], [900_000_000], mp)[0]
    assert not points_in_multipolygon([-1_800_000_000], [-900_000_000], mp)[0]
    # centroid-ish point inside africa (lon 20E, lat 5N)
    assert points_in_multipolygon([200_000_000], [50_000_000], mp)[0]
