"""Payload-table IO shim: Lance where available, Parquet fallback.

The input contract (BASELINE.json input_hint) is a Lance table of
image+caption rows. `lance` is not installed in this sandbox, so the
shim probes for it and otherwise uses Parquet with the exact same
schema — swapping the format back in is a one-liner at deploy time.
"""

from __future__ import annotations

import pyarrow as pa

PAYLOAD_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_payload(path: str, columns: list[str] | None = None):
    """-> ray.data.Dataset of payload rows (column-pruned at the read)."""
    import ray.data

    if path.endswith(".lance") or (_have_lance() and not path.endswith(".parquet")):
        try:
            return ray.data.read_lance(path, columns=columns)
        except (ImportError, AttributeError):
            pass
    return ray.data.read_parquet(path, columns=columns)


def write_payload(ds, path: str):
    """Partitioned payload write (directory of parquet/lance files)."""
    if path.endswith(".lance") and _have_lance():
        ds.write_lance(path)
        return
    ds.write_parquet(path)


def validate_payload_schema(schema: pa.Schema) -> list[str]:
    """-> list of schema violations ([] when conformant)."""
    problems = []
    names = set(schema.names)
    for field in PAYLOAD_SCHEMA:
        if field.name not in names:
            problems.append(f"missing column {field.name}")
            continue
        got = schema.field(field.name).type
        if got != field.type:
            problems.append(f"{field.name}: {got} != {field.type}")
    return problems
