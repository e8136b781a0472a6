"""Polygon tree discovery golden (src/diffs.rs:291-303).

Sibling ordering compares the .poly path STRING with file-less
directories as "None" (src/diffs.rs:239-246) — so, like the reference
test, we must use the same relative path it used."""

import os

import pytest

from osm_replication_rust_ray.sources.polytree import get_poly_from_dir, load_tree_polys

RES = "/root/reference/tests/resources"


@pytest.fixture()
def ref_cwd():
    old = os.getcwd()
    os.chdir("/root/reference")
    yield
    os.chdir(old)


def test_get_poly_from_dir_structure(ref_cwd):
    poly = get_poly_from_dir("tests/resources/polygons")
    assert poly.name == ""
    assert poly.inners[0].name == "africa"
    assert poly.inners[0].inners[0].name == ""
    assert poly.inners[0].inners[0].inners[0].name == "canarias"
    assert poly.inners[1].name == "europe"
    assert poly.inners[1].inners[0].name == ""
    assert poly.inners[1].inners[0].inners[0].name == "ionian_sea"
    assert poly.inners[1].inners[0].inners[1].name == "north_sea"
    assert poly.inners[1].inners[1].name == "france"


def test_hier_names_and_flatten():
    poly = get_poly_from_dir(f"{RES}/polygons")
    flat = load_tree_polys(poly)
    paths = [p for p, _n, _mp in flat]
    assert "./africa" in paths
    assert "./africa/spain/canarias" in paths or any(
        p.endswith("/canarias") for p in paths
    )
    # pre-order: parents come before children
    for i, p in enumerate(paths):
        for q in paths[:i]:
            assert not q.startswith(p + "/")
