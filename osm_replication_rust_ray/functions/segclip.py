"""Segment-vs-polygon-edge crossing join (vector clip/overlay primitive).

The reference's geometry layer stops at point-in-polygon and
box-vs-polygon predicates (src/osm/poly.rs:108-178); real vector
overlay additionally needs segment x edge PROPER-crossing detection —
the candidate step of clipping ways against extract boundaries.  This
module provides it Ray-Data-style:

- exact int64 orientation arithmetic (no epsilon, no floats), the same
  algebraic expression emitted verbatim into the DuckDB oracle so both
  sides are op-identical (not merely equivalent) and degenerate inputs
  cannot diverge;
- candidates via the packed STRtree (functions/strtree.py) over edge
  bounding boxes — per-batch cost is O(candidates), not
  O(segments x edges), so a boundary set with 10^5 edges stays cheap;
- the per-batch kernel is pure numpy over candidate-pair index arrays.

Scale shape: edge set broadcast once per actor (ray.put ref), segments
stream through map_batches; no shuffle anywhere.
"""

from __future__ import annotations

import numpy as np

from .strtree import STRtree

# worst-case |coordinate| the crossing determinants may see (world span
# + the largest segment offset the callers derive); used by the
# overflow guard shared with the SQL emitter.
_WORLD = 1_840_000_001
_I64_SAFE = 2**63 - 2**32


def check_edge_overflow(ex1, ey1, ex2, ey2) -> None:
    """Guard: every determinant the kernel/SQL computes stays in int64.

    d_side = dx*(qy - ey1) - (qx - ex1)*dy   with |qx|,|qy| <= WORLD
    d_seg  = sdx*(ey - qy1) - (ex - qx1)*sdy with |sdx|,|sdy| <= 2*WORLD
             and |ex|,|ey| bounded by the edge coordinates.
    """
    ex1 = np.asarray(ex1, np.int64)
    ey1 = np.asarray(ey1, np.int64)
    ex2 = np.asarray(ex2, np.int64)
    ey2 = np.asarray(ey2, np.int64)
    # guard arithmetic in float64 (an int64 guard could itself wrap);
    # the 2**32 headroom under _I64_SAFE dwarfs float64 rounding here
    dx = np.abs(ex2 - ex1).astype(np.float64)
    dy = np.abs(ey2 - ey1).astype(np.float64)
    worst_side = dx * (_WORLD + np.abs(ey1).astype(np.float64)) + (
        _WORLD + np.abs(ex1).astype(np.float64)
    ) * dy
    if len(ex1) and float(worst_side.max()) >= _I64_SAFE:
        raise ValueError("edge set would overflow int64 in crossing det")


class SegmentEdgeIndex:
    """STRtree-backed candidate index over polygon edges.

    Parameters: parallel int64 arrays (one edge per entry) plus an
    ``owner`` array mapping each edge to its polygon index.
    """

    def __init__(self, ex1, ey1, ex2, ey2, owner):
        self.ex1 = np.asarray(ex1, np.int64)
        self.ey1 = np.asarray(ey1, np.int64)
        self.ex2 = np.asarray(ex2, np.int64)
        self.ey2 = np.asarray(ey2, np.int64)
        self.owner = np.asarray(owner, np.int64)
        check_edge_overflow(self.ex1, self.ey1, self.ex2, self.ey2)
        self.tree = STRtree(
            np.minimum(self.ex1, self.ex2),
            np.minimum(self.ey1, self.ey2),
            np.maximum(self.ex1, self.ex2),
            np.maximum(self.ey1, self.ey2),
        )

    def crossings(self, qx1, qy1, qx2, qy2):
        """(segment_idx, edge_idx) pairs that PROPERLY cross.

        Proper crossing = each segment's endpoints strictly straddle
        the other's supporting line (collinear touches excluded) —
        both sides of the gate compute this identical expression.
        """
        qx1 = np.asarray(qx1, np.int64)
        qy1 = np.asarray(qy1, np.int64)
        qx2 = np.asarray(qx2, np.int64)
        qy2 = np.asarray(qy2, np.int64)
        # d_seg guard: sdx*(ey - qy1) must stay in int64; the edge-side
        # guard in __init__ covers d_side, this covers segment length
        if len(qx1):
            span = max(
                int(np.abs(qx2 - qx1).max()), int(np.abs(qy2 - qy1).max())
            )
            if span * 2 * _WORLD >= _I64_SAFE:
                raise ValueError("segment span too large for exact int64 det")
        si, ei = self.tree.query(
            np.minimum(qx1, qx2),
            np.minimum(qy1, qy2),
            np.maximum(qx1, qx2),
            np.maximum(qy1, qy2),
        )
        if not len(si):
            return si, ei
        ex1, ey1 = self.ex1[ei], self.ey1[ei]
        dx, dy = self.ex2[ei] - ex1, self.ey2[ei] - ey1
        a1, b1 = qx1[si], qy1[si]
        a2, b2 = qx2[si], qy2[si]
        d1 = dx * (b1 - ey1) - (a1 - ex1) * dy
        d2 = dx * (b2 - ey1) - (a2 - ex1) * dy
        sdx, sdy = a2 - a1, b2 - b1
        d3 = sdx * (ey1 - b1) - (ex1 - a1) * sdy
        d4 = sdx * (self.ey2[ei] - b1) - (self.ex2[ei] - a1) * sdy
        cross = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
            ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
        )
        return si[cross], ei[cross]

    def poly_cross_counts(self, qx1, qy1, qx2, qy2):
        """(segment_idx, poly_idx, n_cross) — crossings grouped per
        (segment, owning polygon); rows only where n_cross >= 1."""
        si, ei = self.crossings(qx1, qy1, qx2, qy2)
        if not len(si):
            z = np.empty(0, np.int64)
            return z, z, z
        n_poly = int(self.owner.max()) + 1
        key = si * n_poly + self.owner[ei]
        uniq, counts = np.unique(key, return_counts=True)
        return uniq // n_poly, uniq % n_poly, counts.astype(np.int64)


def crossing_sql_terms(ex1, ey1, ex2, ey2, qx1: str, qy1: str,
                       qx2: str, qy2: str) -> list[str]:
    """One ``CASE WHEN <proper crossing> THEN 1 ELSE 0 END`` per edge —
    the verbatim SQL twin of :meth:`SegmentEdgeIndex.crossings`."""
    check_edge_overflow(ex1, ey1, ex2, ey2)
    terms = []
    for x1, y1, x2, y2 in zip(
        np.asarray(ex1).tolist(), np.asarray(ey1).tolist(),
        np.asarray(ex2).tolist(), np.asarray(ey2).tolist(),
    ):
        dx, dy = x2 - x1, y2 - y1
        d1 = f"({dx} * ({qy1} - {y1}) - ({qx1} - {x1}) * {dy})"
        d2 = f"({dx} * ({qy2} - {y1}) - ({qx2} - {x1}) * {dy})"
        sdx = f"({qx2} - {qx1})"
        sdy = f"({qy2} - {qy1})"
        d3 = f"({sdx} * ({y1} - {qy1}) - ({x1} - {qx1}) * {sdy})"
        d4 = f"({sdx} * ({y2} - {qy1}) - ({x2} - {qx1}) * {sdy})"
        straddle_e = f"(({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0))"
        straddle_s = f"(({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0))"
        terms.append(
            f"(CASE WHEN {straddle_e} AND {straddle_s} THEN 1 ELSE 0 END)"
        )
    return terms
