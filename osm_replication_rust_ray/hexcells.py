"""H3-style hexagonal cell index (aperture-7, pure numpy).

The north-star mandates BOTH H3 and S2 cell encodings (BASELINE.json
north_star: "encoded into H3 (res 5-9) and S2 cells").  ``cells.py``
provides the S2-style quadtree (Morton) system; this module provides
the hexagonal one with H3's defining properties, from scratch (the
``h3`` lib is not installable here):

- aperture 7: each resolution has 7x the cells of the previous, with
  the Gosper rotation atan(sqrt(3)/5) ~ 19.1066 deg per level (the
  (2,1) hex-lattice sublattice — exactly how H3 relates consecutive
  resolutions)
- pointy-top axial coordinates on the planar decimicro lon/lat plane
  (matching the engine's planar integer geometry), cube-rounding for
  nearest-hex assignment
- parent(cell) = hex containing the cell's CENTER one level up —
  center-based hierarchy; like real H3, hex hierarchies are never
  exact spatial subsets (a child can poke out of its parent), which is
  why the spatial JOIN uses the square cells while hex cells serve as
  analysis/binning keys
- k_ring: exact hexagonal rings in cube coordinates (6k cells at
  distance k)

Cell id (int64) = res<<56 | (q+OFF)<<28 | (r+OFF), OFF = 2^27.

Every float operation in ``encode_hex`` has an op-for-op SQL twin
(``hex_encode_sql_layers``) so hex binning queries get exact DuckDB
oracles: int->float conversions are exact, each multiply/divide/floor
is a single IEEE op with identical operands on both sides, and the
cube-round uses floor(x + 0.5) (half-up) rather than numpy's
half-even ``round``.
"""

from __future__ import annotations

import math

import numpy as np

RES_SHIFT = 56
OFF = 1 << 27
COORD_MASK = (1 << 28) - 1
SIZE0 = 1_200_000_000.0  # res-0 hex size (decimicro)
ALPHA = math.atan2(math.sqrt(3.0), 5.0)  # aperture-7 Gosper rotation
SQRT3_3 = math.sqrt(3.0) / 3.0
THIRD = 1.0 / 3.0
TWO_THIRDS = 2.0 / 3.0
SQRT7 = math.sqrt(7.0)
MAX_RES = 15


def _level_consts(res: int) -> tuple[float, float, float]:
    """(cos, sin, size) of resolution ``res``."""
    theta = res * ALPHA
    return math.cos(theta), math.sin(theta), SIZE0 / (SQRT7 ** res)


def _cube_round(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest hex via cube rounding; half-up floor(x+0.5) so the SQL
    twin (DuckDB floor) matches bit-for-bit."""
    x = q
    z = r
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx = np.abs(rx - x)
    dy = np.abs(ry - y)
    dz = np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def encode_hex(lon, lat, res: int) -> np.ndarray:
    """Vectorized point -> int64 hex cell id at resolution ``res``."""
    assert 0 <= res <= MAX_RES
    ct, st, size = _level_consts(res)
    X = np.asarray(lon, np.int64).astype(np.float64)
    Y = np.asarray(lat, np.int64).astype(np.float64)
    xr = (X * ct + Y * st) / size
    yr = (Y * ct - X * st) / size
    q = SQRT3_3 * xr - THIRD * yr
    r = TWO_THIRDS * yr
    qi, ri = _cube_round(q, r)
    return (
        (np.int64(res) << RES_SHIFT)
        | ((qi + OFF) << 28)
        | (ri + OFF)
    ).astype(np.int64)


def hex_res(cells) -> np.ndarray:
    return (np.asarray(cells, np.int64) >> RES_SHIFT).astype(np.int64)


def hex_qr(cells) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(cells, np.int64)
    q = ((c >> 28) & COORD_MASK) - OFF
    r = (c & COORD_MASK) - OFF
    return q, r


def hex_center(cells) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) decimicro float centers of hex cells."""
    res = hex_res(cells)
    q, r = hex_qr(cells)
    lon = np.empty(len(np.atleast_1d(q)), np.float64)
    lat = np.empty_like(lon)
    for rv in np.unique(res).tolist():
        ct, st, size = _level_consts(int(rv))
        m = res == rv
        xr = (np.sqrt(3.0) * q[m] + np.sqrt(3.0) / 2.0 * r[m]) * size
        yr = (1.5 * r[m]) * size
        # un-rotate
        lon[m] = xr * ct - yr * st
        lat[m] = xr * st + yr * ct
    return lon, lat


def parent_hex(cells, steps: int = 1) -> np.ndarray:
    """Center-based ancestor ``steps`` levels up (H3-style approximate
    containment)."""
    res = hex_res(cells)
    assert (res >= steps).all()
    lon, lat = hex_center(cells)
    out = np.empty(len(np.atleast_1d(lon)), np.int64)
    for rv in np.unique(res).tolist():
        m = res == rv
        out[m] = encode_hex(
            np.round(lon[m]).astype(np.int64),
            np.round(lat[m]).astype(np.int64),
            int(rv) - steps,
        )
    return out


def k_ring_hex(cell: int, k: int = 1) -> np.ndarray:
    """All hex cells within hex-grid distance k (exact cube-coordinate
    rings: 1 + 3k(k+1) cells)."""
    res = int(hex_res([cell])[0])
    q0, r0 = (int(v[0]) for v in hex_qr([cell]))
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append(
                (res << RES_SHIFT)
                | ((q0 + dq + OFF) << 28)
                | (r0 + dr + OFF)
            )
    return np.asarray(out, np.int64)


def hex_distance(a: int, b: int) -> int:
    """Hex-grid (cube) distance between two same-res cells."""
    qa, ra = (int(v[0]) for v in hex_qr([a]))
    qb, rb = (int(v[0]) for v in hex_qr([b]))
    dq, dr = qa - qb, ra - rb
    return (abs(dq) + abs(dr) + abs(dq + dr)) // 2


# ---------------- SQL twin (oracle emitter) ----------------

def hex_encode_sql_layers(lon_col: str, lat_col: str, res: int,
                          out_col: str = "hex_cell") -> list[tuple[str, str]]:
    """(name, expr) projection layers computing ``encode_hex`` with the
    identical IEEE op sequence in DuckDB (use with
    synth.chain_layers_sql)."""
    ct, st, size = _level_consts(res)

    def f(v: float) -> str:
        # long float literals parse as DECIMAL in DuckDB; force DOUBLE
        return f"({v!r})::DOUBLE"

    return [
        ("__hx", f"(({lon_col})::DOUBLE * {f(ct)} + ({lat_col})::DOUBLE * {f(st)}) / {f(size)}"),
        ("__hy", f"(({lat_col})::DOUBLE * {f(ct)} - ({lon_col})::DOUBLE * {f(st)}) / {f(size)}"),
        ("__hq", f"{f(SQRT3_3)} * __hx - {f(THIRD)} * __hy"),
        ("__hr", f"{f(TWO_THIRDS)} * __hy"),
        ("__hyc", "-__hq - __hr"),
        ("__rx", "floor(__hq + 0.5)"),
        ("__ry", "floor(__hyc + 0.5)"),
        ("__rz", "floor(__hr + 0.5)"),
        ("__dx", "abs(__rx - __hq)"),
        ("__dy", "abs(__ry - __hyc)"),
        ("__dz", "abs(__rz - __hr)"),
        ("__fx", "__dx > __dy AND __dx > __dz"),
        ("__qi", "CAST(CASE WHEN __fx THEN -__ry - __rz ELSE __rx END AS BIGINT)"),
        # fix_z implies NOT fix_x, so rx is still the original there
        ("__ri", (
            "CAST(CASE WHEN (NOT __fx) AND __dz > __dy "
            "THEN -__rx - __ry ELSE __rz END AS BIGINT)"
        )),
        (out_col, (
            f"({res}::BIGINT << {RES_SHIFT}) | ((__qi + {OFF}) << 28) | "
            f"(__ri + {OFF})"
        )),
    ]
