"""SQL-expressible deterministic geometry derivation.

The correctness gate runs every Ray pipeline side-by-side with a DuckDB
oracle over the same parquet tables, so the per-row geometry used by the
spatial queries must be derivable bit-identically in BOTH numpy (engine)
and ANSI SQL (oracle).  We therefore derive coordinates from integer key
columns with plain int64 multiply/modulo arithmetic (no bit-mixing
hashes): products stay far below 2**63 for every key range in the test
tables, and DuckDB BIGINT arithmetic matches numpy int64 exactly.

This mirrors the engine's real input contract (payload rows carry
geometry extents, SURVEY.md §1.5) — the derivation is only the sandbox
stand-in for "extent columns present on the row".

Every ``*_sql`` helper returns the SQL expression string for the same
computation its numpy twin performs.
"""

from __future__ import annotations

import numpy as np

# world span in decimicro degrees (matches cells.LON_OFFSET/LAT_OFFSET)
LON_MOD = 3_600_000_001
LAT_MOD = 1_800_000_001
LON_OFF = 1_800_000_000
LAT_OFF = 900_000_000

# multipliers (Knuth / common LCG constants — public domain folklore)
MUL_LON = 2_654_435_761
MUL_LAT = 2_246_822_519

# "city window" for the kNN query: +-2e7 decimicro (+-2 deg) so squared
# distances stay < 2**53 and are exact in float64 AND int64.
CITY_MOD = 40_000_001
CITY_OFF = 20_000_000


def _check_range(ids: np.ndarray, mul: int) -> None:
    # guard the no-overflow precondition (documented above)
    if len(ids) and int(ids.max()) * mul >= 2**62:
        raise ValueError("key range too large for exact int64 derivation")


def world_lon(ids) -> np.ndarray:
    ids = np.asarray(ids, np.int64)
    _check_range(ids, MUL_LON)
    return (ids * MUL_LON) % LON_MOD - LON_OFF


def world_lat(ids) -> np.ndarray:
    ids = np.asarray(ids, np.int64)
    _check_range(ids, MUL_LAT)
    return (ids * MUL_LAT) % LAT_MOD - LAT_OFF


def world_lon_sql(col: str) -> str:
    return f"(({col} * {MUL_LON}) % {LON_MOD} - {LON_OFF})"


def world_lat_sql(col: str) -> str:
    return f"(({col} * {MUL_LAT}) % {LAT_MOD} - {LAT_OFF})"


def city_coord(ids, mul: int, add: int) -> np.ndarray:
    ids = np.asarray(ids, np.int64)
    _check_range(ids, mul)
    return (ids * mul + add) % CITY_MOD - CITY_OFF


def city_coord_sql(col: str, mul: int, add: int) -> str:
    return f"(({col} * {mul} + {add}) % {CITY_MOD} - {CITY_OFF})"


def box_half(ids, mod: int = 100_000) -> np.ndarray:
    """Deterministic box half-width from a key (0 .. mod-1 decimicro)."""
    ids = np.asarray(ids, np.int64)
    return (ids * 7919) % mod


def box_half_sql(col: str, mod: int = 100_000) -> str:
    return f"(({col} * 7919) % {mod})"
