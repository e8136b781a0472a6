"""GEOS-parity chordal buffer mode (round-1 verdict item #7).

The reference buffers polygons with GEOS ``buffer(0.1, 8)``
(src/osmxml/filter.rs:44-56): arcs become chords stepped at pi/16, so
a point in the chord/arc gap is OUTSIDE the reference's buffer but
inside the engine's exact Euclidean one.  These tests pin:

- chordal ⊆ euclidean everywhere (chords are inscribed)
- planted gap-band points distinguish the modes exactly as the GEOS
  construction predicts (outside chord depth r*cos(step/2), inside r)
- convergence to the Euclidean region as quad_segs grows
- filter-stage verdicts: identical to Euclidean mode on the
  reference's own fixture (no fixture element sits in the band), and
  a planted gap-band node flips delete -> drop under chordal mode,
  reproducing the Rust binary's verdict.
"""

import math

import numpy as np
import pyarrow as pa

from osm_replication_rust_ray.geom import (
    BUFFER_DECIMICRO,
    MultiPolygon,
    points_in_buffered,
    points_in_buffered_chordal,
)
from osm_replication_rust_ray.sources.polyfile import read_multipolygon

RES = "/root/reference/tests/resources"
R = BUFFER_DECIMICRO


def _tri():
    # convex triangle, edges long vs buffer so vertex fans are isolated
    xs = np.array([0, 40_000_000, 20_000_000], np.int64)
    ys = np.array([0, 0, 30_000_000], np.int64)
    return MultiPolygon.from_rings([(xs, ys)])


def _gap_points(quad_segs=8):
    """Points along the fillet arc at vertex (0,0) of _tri(): for each
    chord midpoint direction, one point in the gap band (depth between
    chord and arc) and one safely inside the chord."""
    mp = _tri()
    # normals at vertex (0,0): incoming edge (20e6,30e6)->(0,0),
    # outgoing (0,0)->(40e6,0); ring is CCW (area > 0)
    e1 = np.array([-20_000_000.0, -30_000_000.0])
    e2 = np.array([40_000_000.0, 0.0])
    n1 = np.array([e1[1], -e1[0]]) / np.hypot(*e1)
    n2 = np.array([e2[1], -e2[0]]) / np.hypot(*e2)
    a1 = math.atan2(n1[1], n1[0])
    a2 = math.atan2(n2[1], n2[0])
    total = (a2 - a1) % (2 * math.pi)
    quantum = (math.pi / 2) / quad_segs
    nsegs = max(1, int(total / quantum + 0.5))
    inc = total / nsegs
    chord_depth = math.cos(inc / 2)
    gap, inside = [], []
    for k in range(nsegs):
        am = a1 + (k + 0.5) * inc
        u = np.array([math.cos(am), math.sin(am)])
        d_gap = R * (chord_depth + 1.0) / 2.0  # mid-band
        d_in = R * chord_depth * 0.98          # safely inside the chord
        gap.append(np.round(d_gap * u).astype(np.int64))
        inside.append(np.round(d_in * u).astype(np.int64))
    return mp, np.array(gap), np.array(inside), chord_depth


def test_gap_band_distinguishes_modes():
    mp, gap, inside, _depth = _gap_points()
    gx, gy = gap[:, 0], gap[:, 1]
    ix, iy = inside[:, 0], inside[:, 1]
    # gap points: inside the exact Euclidean buffer...
    assert points_in_buffered(gx, gy, mp).all()
    # ...but OUTSIDE the chordal (GEOS-parity) buffer
    assert not points_in_buffered_chordal(gx, gy, mp).any()
    # inside-the-chord points: both modes agree (in)
    assert points_in_buffered(ix, iy, mp).all()
    assert points_in_buffered_chordal(ix, iy, mp).all()


def test_chordal_subset_and_convergence():
    _, mp = read_multipolygon(f"{RES}/saint_barthelemy.poly")
    rng = np.random.RandomState(1)
    minx, miny, maxx, maxy = mp.bbox()
    px = rng.randint(minx - 3 * R, maxx + 3 * R, 30000)
    py = rng.randint(miny - 3 * R, maxy + 3 * R, 30000)
    eu = points_in_buffered(px, py, mp)
    ch8 = points_in_buffered_chordal(px, py, mp, quad_segs=8)
    ch64 = points_in_buffered_chordal(px, py, mp, quad_segs=64)
    assert not (ch8 & ~eu).any()  # chordal ⊆ euclidean
    assert not (ch64 & ~eu).any()
    assert ch8.sum() <= ch64.sum() <= eu.sum()  # monotone convergence
    # the planted mid-band point shrinks into the region at 64 segs
    mp_t, gap, _ins, _ = _gap_points()
    gx, gy = gap[:, 0], gap[:, 1]
    assert points_in_buffered_chordal(gx, gy, mp_t, quad_segs=64).all()


def _element_table(nodes):
    from osm_replication_rust_ray.sources.osmxml import ELEMENTS_SCHEMA

    rows = []
    for i, (nid, lon, lat) in enumerate(nodes):
        rows.append(
            {
                "pos": i, "etype": "node", "id": nid, "action": "modify",
                "lat": int(lat), "lon": int(lon), "refs": None,
                "members": None, "tags": None, "version": None,
                "timestamp": None, "uid": None, "user": None,
                "changeset": None, "minlat": None, "maxlat": None,
                "minlon": None, "maxlon": None,
            }
        )
    return pa.Table.from_pylist(rows, schema=ELEMENTS_SCHEMA)


def test_filter_verdicts_agree_on_reference_fixture():
    """The reference fixture's own elements sit outside the gap band,
    so chordal and euclidean modes produce IDENTICAL filter output —
    the engine matches the Rust binary's verdicts there."""
    from osm_replication_rust_ray.sources.osmxml import parse_osm_xml
    from osm_replication_rust_ray.sources.store import Resolver
    from osm_replication_rust_ray.stages.bbox import needed_ids
    from osm_replication_rust_ray.stages.filter import filter_elements

    elements = parse_osm_xml(f"{RES}/saint_barthelemy.bbox.osc.gz")
    _, mp = read_multipolygon(f"{RES}/saint_barthelemy.poly")
    resolver = Resolver.empty()
    node_ids, _w, _r = needed_ids(elements, resolver)
    nid = np.array(sorted(node_ids), np.int64)
    out_eu = filter_elements(elements, mp, Resolver.empty(), nid)
    out_ch = filter_elements(
        elements, mp, Resolver.empty(), nid, buffer_mode="chordal"
    )
    assert out_eu.num_rows == out_ch.num_rows
    for col in ("etype", "id", "action"):
        assert out_eu[col].to_pylist() == out_ch[col].to_pylist()


def test_filter_gap_node_flips_delete_to_drop():
    """A node planted in the chord/arc gap: euclidean mode says delete
    (inside buffer, outside poly) — the reference (GEOS chords) drops
    it.  Chordal mode reproduces the reference verdict."""
    from osm_replication_rust_ray.sources.store import Resolver
    from osm_replication_rust_ray.stages.filter import filter_elements

    mp, gap, inside, _ = _gap_points()
    g = gap[0]
    i = inside[0]
    elements = _element_table(
        [(1, int(g[0]), int(g[1])), (2, int(i[0]), int(i[1]))]
    )
    nid = np.array([1, 2], np.int64)
    out_eu = filter_elements(
        elements, mp, Resolver.empty(), nid, buffer_mode="euclidean"
    )
    # chordal is the DEFAULT since round 3 (GEOS/reference parity)
    out_ch = filter_elements(elements, mp, Resolver.empty(), nid)
    eu = dict(zip(out_eu["id"].to_pylist(), out_eu["action"].to_pylist()))
    ch = dict(zip(out_ch["id"].to_pylist(), out_ch["action"].to_pylist()))
    assert eu[1] == "delete"  # euclidean keeps it in the buffer
    assert 1 not in ch        # chordal (reference) drops it entirely
    assert eu[2] == ch[2] == "delete"  # inside the chord: modes agree
