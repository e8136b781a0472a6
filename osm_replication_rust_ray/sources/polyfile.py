"""Osmosis .poly format reader -> (name, MultiPolygon).

Re-implements the published Osmosis Polygon-Filter-File-Format per the
reference's behavior (``src/osmgeom.rs:15-62``):

- line 1: name
- then repeated sections: a ring header line, vertex lines
  "<lon> <lat>" (f64, converted to decimicro int), terminated by "END";
  final "END" (or EOF) closes the file.
- rings whose header starts with ``!`` are SKIPPED entirely (the
  reference drops them rather than treating them as holes,
  src/osmgeom.rs:29-35).
- vertex x=lon, y=lat (decimicro via round-half-away).
"""

from __future__ import annotations

import numpy as np

from ..geom import MultiPolygon, coord_to_decimicro


def parse_poly(text: str) -> tuple[str, MultiPolygon]:
    lines = iter(text.splitlines())
    name = next(lines)
    rings: list[tuple[np.ndarray, np.ndarray]] = []
    while True:
        header = next(lines, None)
        if header is None or header.startswith("END"):
            break
        skip = header.startswith("!")
        xs: list[float] = []
        ys: list[float] = []
        while True:
            line = next(lines, None)
            if line is None:
                raise ValueError("Incomplete .poly file")
            if line.startswith("END"):
                break
            parts = line.split()
            xs.append(float(parts[0]))
            ys.append(float(parts[1]))
        if not skip:
            rings.append(
                (coord_to_decimicro(np.array(xs)), coord_to_decimicro(np.array(ys)))
            )
    return name, MultiPolygon.from_rings(rings)


def read_multipolygon(filename: str) -> tuple[str, MultiPolygon]:
    with open(filename, encoding="utf-8") as f:
        return parse_poly(f.read())


def multipolygon_to_poly_text(name: str, mp: MultiPolygon) -> str:
    """Serialize back to .poly (used by the synthetic fixture writer)."""
    out = [name]
    for i in range(mp.n_rings):
        xs, ys = mp.ring(i)
        out.append(str(i + 1))
        for x, y in zip(xs.tolist(), ys.tolist()):
            out.append(f"   {x * 1e-7:.7E}   {y * 1e-7:.7E}")
        # closing duplicate vertex, as Osmosis files carry it
        out.append(f"   {xs[0] * 1e-7:.7E}   {ys[0] * 1e-7:.7E}")
        out.append("END")
    out.append("END")
    return "\n".join(out) + "\n"
