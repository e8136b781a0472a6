"""OSM-XML writer (S4): parse -> serialize -> reparse round-trip on the
reference's own fixtures must be lossless for every column."""

import gzip

from osm_replication_rust_ray.sources.osmxml import elements_to_osc, parse_osm_xml

RES = "/root/reference/tests/resources"


def _roundtrip(path, tmp_path, change):
    table = parse_osm_xml(path)
    text = elements_to_osc(table, change=change)
    out = tmp_path / ("rt.osc.gz" if change else "rt.osm.gz")
    with gzip.open(out, "wt", encoding="utf-8") as f:
        f.write(text)
    again = parse_osm_xml(str(out))
    assert table.num_rows == again.num_rows
    for col in table.column_names:
        assert table[col].to_pylist() == again[col].to_pylist(), col
    return text


def test_osc_roundtrip_diff(tmp_path):
    text = _roundtrip(f"{RES}/saint_barthelemy.osc.gz", tmp_path, change=True)
    # the input is <osmChange>-rooted; the writer mirrors the input root
    # as the reference binaries do (src/osmxml.rs:406-407 dispatches the
    # parsed root into write_start(change), src/osmxml.rs:954-972)
    assert text.startswith('<osmChange version="0.6">')
    assert text.endswith("</osmChange>")
    # action-run grouping: no two consecutive identical action opens
    opens = [ln for ln in text.splitlines() if ln in ("  <create>", "  <modify>", "  <delete>")]
    closes = [ln for ln in text.splitlines() if ln in ("  </create>", "  </modify>", "  </delete>")]
    assert len(opens) == len(closes)


def test_osc_roundtrip_bbox_annotated(tmp_path):
    # bbox child elements survive the round trip (src/osmxml.rs:738-774)
    text = _roundtrip(f"{RES}/saint_barthelemy.bbox.osc.gz", tmp_path, change=True)
    assert "<bbox " in text


def test_writer_byte_identical_to_reference_output():
    """The bbox fixture is the reference WRITER's own output: our
    serializer must reproduce it byte-for-byte (root tag, attr order,
    f64 shortest-roundtrip coords, indentation, no trailing newline —
    src/osmxml.rs:787-1023)."""
    want = gzip.open(
        f"{RES}/saint_barthelemy.bbox.osc.gz", "rt", encoding="utf-8"
    ).read()
    got = elements_to_osc(
        parse_osm_xml(f"{RES}/saint_barthelemy.bbox.osc.gz"), change=True
    )
    assert got == want
