"""Payload IO shim: parquet round-trip with the exact input_hint schema;
lance path gated behind availability."""

import pyarrow as pa


def test_payload_roundtrip_and_schema(ray_session, tmp_path):
    from osm_replication_rust_ray.sources.io import (
        PAYLOAD_SCHEMA,
        read_payload,
        validate_payload_schema,
        write_payload,
    )
    from osm_replication_rust_ray.sources.synth import payload_dataset

    out = str(tmp_path / "payload")
    ds = payload_dataset(300, with_bytes=True)
    write_payload(ds, out)
    back = read_payload(out)
    schema = back.schema()
    arrow_schema = pa.schema(
        [(n, t) for n, t in zip(schema.names, schema.types)]
    )
    assert validate_payload_schema(arrow_schema) == []
    assert back.count() == 300
    # column pruning at the read
    pruned = read_payload(out, columns=["image_id", "phash"])
    assert set(pruned.schema().names) == {"image_id", "phash"}


def test_schema_validator_flags_problems():
    from osm_replication_rust_ray.sources.io import validate_payload_schema

    bad = pa.schema([("image_id", pa.int64()), ("caption", pa.string())])
    problems = validate_payload_schema(bad)
    assert any("image_id" in p for p in problems)
    assert any("missing column bytes" in p for p in problems)
