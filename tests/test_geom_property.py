"""Property-based checks of the integer geometry kernel against a
slow-but-obvious pure-Python reference implementation."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_replication_rust_ray.geom import (
    MultiPolygon,
    boxes_intersect_multipolygon,
    points_in_multipolygon,
    points_on_boundary,
)

COORD = st.integers(min_value=-1_000_000, max_value=1_000_000)


def _naive_point_in_ring(px, py, xs, ys):
    """Textbook even-odd crossing + exact on-segment test (Python ints)."""
    n = len(xs)
    on = False
    cross = 0
    for i in range(n):
        x1, y1 = int(xs[i]), int(ys[i])
        x2, y2 = int(xs[(i + 1) % n]), int(ys[(i + 1) % n])
        # on-segment
        if (
            min(x1, x2) <= px <= max(x1, x2)
            and min(y1, y2) <= py <= max(y1, y2)
            and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) == 0
        ):
            on = True
        # half-open crossing, ray toward +x
        if (y1 > py) != (y2 > py):
            det = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
            if (det > 0) == (y2 > y1):
                cross += 1
    return on or (cross % 2 == 1)


@st.composite
def ring_and_points(draw):
    n_verts = draw(st.integers(min_value=3, max_value=8))
    xs = [draw(COORD) for _ in range(n_verts)]
    ys = [draw(COORD) for _ in range(n_verts)]
    pts = [(draw(COORD), draw(COORD)) for _ in range(8)]
    # include the vertices themselves and edge midpoints as probe points
    pts += list(zip(xs, ys))
    for i in range(n_verts):
        pts.append(
            ((xs[i] + xs[(i + 1) % n_verts]) // 2, (ys[i] + ys[(i + 1) % n_verts]) // 2)
        )
    return np.array(xs, np.int64), np.array(ys, np.int64), pts


@settings(max_examples=120, deadline=None)
@given(ring_and_points())
def test_pip_matches_naive(data):
    xs, ys, pts = data
    mp = MultiPolygon.from_rings([(xs, ys)])
    px = np.array([p[0] for p in pts], np.int64)
    py = np.array([p[1] for p in pts], np.int64)
    got = points_in_multipolygon(px, py, mp)
    want = [_naive_point_in_ring(int(a), int(b), xs, ys) for a, b in pts]
    assert got.tolist() == want


@settings(max_examples=60, deadline=None)
@given(ring_and_points())
def test_degenerate_point_box_equals_pip(data):
    """A zero-size box must intersect the polygon exactly when the point
    does (the degenerate-box matrix of src/osmgeom.rs:139-221)."""
    xs, ys, pts = data
    mp = MultiPolygon.from_rings([(xs, ys)])
    px = np.array([p[0] for p in pts], np.int64)
    py = np.array([p[1] for p in pts], np.int64)
    pip = points_in_multipolygon(px, py, mp)
    boxes = boxes_intersect_multipolygon(px, py, px, py, mp)
    assert boxes.tolist() == pip.tolist()


@settings(max_examples=60, deadline=None)
@given(ring_and_points())
def test_boundary_points_are_inside(data):
    xs, ys, pts = data
    mp = MultiPolygon.from_rings([(xs, ys)])
    px = np.array([p[0] for p in pts], np.int64)
    py = np.array([p[1] for p in pts], np.int64)
    on_b = points_on_boundary(px, py, mp)
    pip = points_in_multipolygon(px, py, mp)
    # boundary-inclusive: everything on an edge is a member
    assert not np.any(on_b & ~pip)
