"""Empirical-margin guard for the boundary-term omission in generated
PIP SQL.

`_pip_sql_expr` / `geom_sql.pip_parity_sql` omit the boundary-inclusive
term on the grounds that DERIVED geometry never lands exactly on a
polygon edge (an exact-integer event).  That claim must stay checked in
CI — a generator or polygon-constant change could silently void it and
de-sync the oracles from the boundary-inclusive engine predicates
(round-1 verdict, "what's wrong" #7)."""

import numpy as np

from osm_replication_rust_ray.functions import derive
from osm_replication_rust_ray.geom import points_on_boundary
from osm_replication_rust_ray.pipelines.queries import PIP_POLYS
from osm_replication_rust_ray.sources.synth import derive_extents, payload_batch
from osm_replication_rust_ray.sources.synth import synth_polygon_tree


def test_derived_event_points_never_on_pip_edges():
    # the full event-id domain used at sf0.1 and below
    ids = np.arange(1, 100_001, dtype=np.int64)
    lon = derive.world_lon(ids)
    lat = derive.world_lat(ids)
    for path, mp in PIP_POLYS:
        assert not points_on_boundary(lon, lat, mp).any(), path


def test_payload_extent_corners_never_on_tree_edges():
    # flagship/route oracles test the (minlon, minlat) corner via
    # parity-only SQL; box corners must avoid the tree polygon edges
    t = payload_batch(np.arange(60_000, dtype=np.int64), with_bytes=False)
    ext = derive_extents(t["phash"].to_numpy(zero_copy_only=False))
    corners = [
        (ext["minlon"], ext["minlat"]),
        (ext["minlon"], ext["maxlat"]),
        (ext["maxlon"], ext["minlat"]),
        (ext["maxlon"], ext["maxlat"]),
    ]
    for rel, mp in synth_polygon_tree():
        for cx, cy in corners:
            assert not points_on_boundary(cx, cy, mp).any(), rel
