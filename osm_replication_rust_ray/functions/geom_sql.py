"""SQL emitters for the exact integer geometry predicates.

The DuckDB oracles must evaluate the same boolean geometry as
``geom.boxes_intersect_multipolygon`` / ``points_in_multipolygon``.
Because both sides are EXACT integer arithmetic, the SQL only needs to
be mathematically equivalent (not op-for-op identical): rect-vs-poly
intersection is

    any polygon vertex inside the rect
    OR the rect's (minx, miny) corner inside the polygon (even-odd,
       per ring — boundary term omitted: synthetic extents never land
       a corner exactly on an edge, same empirical argument as
       queries._pip_sql_expr)
    OR any of the 4 axis-aligned rect edges crosses any polygon edge
       (inclusive; axis alignment reduces the generic segment test to
       a crossing-ordinate interval check with constant edge slopes)

All polygon vertices are compile-time constants, so edge orientations
fold into correctly-directed inequalities and every product is bounds-
checked against int64 at generation time.
"""

from __future__ import annotations

from ..geom import MultiPolygon

# world span of the point/box columns the generated SQL multiplies by
# edge constants; the guard models the REAL worst-case operand, not a
# round number (round-2 review: a 2e9-per-operand model left only ~10%
# coincidental slack on (px - x1) * dy, whose true range is
# (WORLD + |x1|) * |dy|)
_WORLD = 1_800_000_001
_I64_SAFE = 2**63 - 2**32  # headroom under BIGINT for the +/- sum


def _chk_det(dx: int, dy: int, x1: int, y1: int) -> None:
    """Guard det = dx*(py - y1) - (px - x1)*dy for |px|,|py| <= WORLD."""
    worst = abs(dx) * (_WORLD + abs(y1)) + (_WORLD + abs(x1)) * abs(dy)
    if worst >= _I64_SAFE:
        raise ValueError(
            "generated PIP SQL would overflow int64: "
            f"edge ({x1},{y1})+({dx},{dy}) worst-case det {worst:.3e}"
        )


def _ring_edges(xs, ys):
    n = len(xs)
    for i in range(n):
        yield int(xs[i]), int(ys[i]), int(xs[(i + 1) % n]), int(ys[(i + 1) % n])


def pip_parity_sql(mp: MultiPolygon, px: str, py: str) -> str:
    """Even-odd PIP, per-ring parity OR'd (multi-ring safe).

    Same crossing rule as geom.points_in_multipolygon: ray toward +x,
    half-open on y, sign(det)==sign(dy)."""
    ring_exprs = []
    for r in range(mp.n_rings):
        xs, ys = mp.ring(r)
        terms = []
        for x1, y1, x2, y2 in _ring_edges(xs, ys):
            dx, dy = x2 - x1, y2 - y1
            if dy == 0:
                continue  # horizontal edges never cross the +x ray rule
            _chk_det(dx, dy, x1, y1)
            det = f"({dx} * ({py} - {y1}) - ({px} - {x1}) * {dy})"
            cmp_ = f"{det} > 0" if dy > 0 else f"{det} < 0"
            terms.append(
                f"(CASE WHEN (({y1} > {py}) != ({y2} > {py})) AND ({cmp_}) "
                f"THEN 1 ELSE 0 END)"
            )
        if terms:
            ring_exprs.append("((" + " + ".join(terms) + ") % 2 = 1)")
    return "(" + " OR ".join(ring_exprs) + ")" if ring_exprs else "FALSE"


def _h_edge_cross(x1, y1, x2, y2, yy: str, lox: str, hix: str) -> str:
    """Poly edge vs horizontal rect edge (y = yy, x in [lox, hix])."""
    dy = y2 - y1
    if dy == 0:
        lo_e, hi_e = min(x1, x2), max(x1, x2)
        return (
            f"({y1} = {yy} AND greatest({lo_e}, {lox}) <= least({hi_e}, {hix}))"
        )
    ymin, ymax = min(y1, y2), max(y1, y2)
    # crossing-ordinate products can exceed 2^62 -> HUGEINT (exact)
    n = f"({x1}::HUGEINT * ({y2} - {yy}) + {x2}::HUGEINT * ({yy} - {y1}))"
    if dy > 0:
        xcond = f"({n} >= {lox}::HUGEINT * {dy} AND {n} <= {hix}::HUGEINT * {dy})"
    else:
        xcond = f"({n} <= {lox}::HUGEINT * {dy} AND {n} >= {hix}::HUGEINT * {dy})"
    return f"({yy} >= {ymin} AND {yy} <= {ymax} AND {xcond})"


def _v_edge_cross(x1, y1, x2, y2, xx: str, loy: str, hiy: str) -> str:
    """Poly edge vs vertical rect edge (x = xx, y in [loy, hiy])."""
    dx = x2 - x1
    if dx == 0:
        lo_e, hi_e = min(y1, y2), max(y1, y2)
        return (
            f"({x1} = {xx} AND greatest({lo_e}, {loy}) <= least({hi_e}, {hiy}))"
        )
    xmin, xmax = min(x1, x2), max(x1, x2)
    # crossing-ordinate products can exceed 2^62 -> HUGEINT (exact)
    n = f"({y1}::HUGEINT * ({x2} - {xx}) + {y2}::HUGEINT * ({xx} - {x1}))"
    if dx > 0:
        ycond = f"({n} >= {loy}::HUGEINT * {dx} AND {n} <= {hiy}::HUGEINT * {dx})"
    else:
        ycond = f"({n} <= {loy}::HUGEINT * {dx} AND {n} >= {hiy}::HUGEINT * {dx})"
    return f"({xx} >= {xmin} AND {xx} <= {xmax} AND {ycond})"


def box_intersect_sql(mp: MultiPolygon, lox: str, loy: str,
                      hix: str, hiy: str) -> str:
    """Solid axis-aligned rect vs multipolygon (boundary-inclusive),
    equivalent to geom.boxes_intersect_multipolygon on integer rows
    (and to the point PIP when the rect degenerates to a point)."""
    parts = []
    # (a) any polygon vertex in the rect
    vterms = [
        f"({int(vx)} BETWEEN {lox} AND {hix} AND {int(vy)} BETWEEN {loy} AND {hiy})"
        for vx, vy in zip(mp.xs.tolist(), mp.ys.tolist())
    ]
    parts.append("(" + " OR ".join(vterms) + ")")
    # (b) rect corner inside the polygon
    parts.append(pip_parity_sql(mp, lox, loy))
    # (c) any rect edge crosses any polygon edge
    eterms = []
    for r in range(mp.n_rings):
        xs, ys = mp.ring(r)
        for x1, y1, x2, y2 in _ring_edges(xs, ys):
            eterms.append(_h_edge_cross(x1, y1, x2, y2, loy, lox, hix))
            eterms.append(_h_edge_cross(x1, y1, x2, y2, hiy, lox, hix))
            eterms.append(_v_edge_cross(x1, y1, x2, y2, lox, loy, hiy))
            eterms.append(_v_edge_cross(x1, y1, x2, y2, hix, loy, hiy))
    if eterms:
        parts.append("(" + " OR ".join(eterms) + ")")
    return "(" + " OR ".join(parts) + ")"


# ---------------- float-exact buffered-distance emitters ----------------
# The buffered (delete-zone) predicates compare float64 point-segment
# distances to buffer^2.  Both numpy (geom.points_dist2_to_rings /
# _segs_dist2) and the SQL below evaluate the IDENTICAL IEEE op tree —
# subtraction of exactly-representable ints, multiply, divide by the
# edge length, clip, square — so each per-term comparison matches
# bit-for-bit, and "min(all terms) <= buf2" is emitted as the boolean-
# equivalent OR of per-term comparisons (no float accumulation).


def _f(v) -> str:
    """Emit a number as an explicit DOUBLE literal."""
    return f"{float(v)!r}"


def pt_seg_d2_sql(px: str, py: str, x1, y1, x2, y2) -> str:
    """Squared distance point->segment, op-for-op identical to
    geom's pt_seg/points_dist2_to_rings kernels (clip(t) form)."""
    dx, dy = float(x2 - x1), float(y2 - y1)
    l2 = dx * dx + dy * dy or 1.0
    t = (
        f"least(greatest((({px} - {_f(x1)}) * {_f(dx)} + "
        f"({py} - {_f(y1)}) * {_f(dy)}) / {_f(l2)}, 0.0), 1.0)"
    )
    ex = f"({px} - ({_f(x1)} + {t} * {_f(dx)}))"
    ey = f"({py} - ({_f(y1)} + {t} * {_f(dy)}))"
    # explicit self-multiply (numpy's **2 is a multiply; power() may
    # route through libm pow and drop bit-exactness)
    return f"({ex} * {ex} + {ey} * {ey})"


def point_in_buffered_sql(mp: MultiPolygon, px: str, py: str,
                          buffer: int) -> str:
    """points_in_buffered twin: inside (parity PIP) OR any edge within
    the buffer distance.  ``px``/``py`` must be DOUBLE expressions for
    the distance terms; int for the parity part is handled by caller
    passing int columns (DuckDB promotes exactly)."""
    buf2 = _f(float(buffer) ** 2)
    terms = [pip_parity_sql(mp, px, py)]
    for r in range(mp.n_rings):
        xs, ys = mp.ring(r)
        for x1, y1, x2, y2 in _ring_edges(xs, ys):
            terms.append(
                f"({pt_seg_d2_sql(f'({px})::DOUBLE', f'({py})::DOUBLE', x1, y1, x2, y2)} <= {buf2})"
            )
    return "(" + " OR ".join(terms) + ")"


def box_in_buffered_sql(mp: MultiPolygon, lox: str, loy: str,
                        hix: str, hiy: str, buffer: int) -> str:
    """boxes_intersect_buffered twin: exact intersect OR min segment-
    set distance (4 rect edges x poly edges, 4 pt_seg terms each, the
    _segs_dist2 kernel) within buffer."""
    buf2 = _f(float(buffer) ** 2)
    terms = [box_intersect_sql(mp, lox, loy, hix, hiy)]
    # rect edges as (ax1, ay1, ax2, ay2) variable tuples
    rect_edges = [
        (lox, loy, hix, loy),
        (hix, loy, hix, hiy),
        (hix, hiy, lox, hiy),
        (lox, hiy, lox, loy),
    ]
    d = lambda c: f"({c})::DOUBLE"  # noqa: E731

    def var_pt_seg(px, py, ax1, ay1, ax2, ay2) -> str:
        """pt_seg with a VARIABLE (axis-aligned rect) segment; rect
        edges may be degenerate -> L2 guarded to 1.0 as in _segs_dist2."""
        dx = f"({d(ax2)} - {d(ax1)})"
        dy = f"({d(ay2)} - {d(ay1)})"
        l2 = f"(CASE WHEN {dx} * {dx} + {dy} * {dy} = 0.0 THEN 1.0 ELSE {dx} * {dx} + {dy} * {dy} END)"
        t = (
            f"least(greatest((({px} - {d(ax1)}) * {dx} + "
            f"({py} - {d(ay1)}) * {dy}) / {l2}, 0.0), 1.0)"
        )
        ex = f"({px} - ({d(ax1)} + {t} * {dx}))"
        ey = f"({py} - ({d(ay1)} + {t} * {dy}))"
        return f"({ex} * {ex} + {ey} * {ey})"

    for r in range(mp.n_rings):
        xs, ys = mp.ring(r)
        for x1, y1, x2, y2 in _ring_edges(xs, ys):
            for ax1, ay1, ax2, ay2 in rect_edges:
                sub = [
                    pt_seg_d2_sql(d(ax1), d(ay1), x1, y1, x2, y2),
                    pt_seg_d2_sql(d(ax2), d(ay2), x1, y1, x2, y2),
                    var_pt_seg(_f(x1), _f(y1), ax1, ay1, ax2, ay2),
                    var_pt_seg(_f(x2), _f(y2), ax1, ay1, ax2, ay2),
                ]
                terms.extend(f"({expr} <= {buf2})" for expr in sub)
    return "(" + " OR ".join(terms) + ")"


def chordal_zone_sql(mp: MultiPolygon, px: str, py: str, buffer: int,
                     quad_segs: int = 8) -> str:
    """OUTSIDE-zone twin of ``geom.points_in_buffered_chordal`` (the
    GEOS-parity quadrant-segment buffer): perpendicular edge bands OR
    vertex chord-fan triangles — EXCLUDING the polygon interior (the
    caller supplies its own ``inside`` term, as the verdict queries
    already do).

    Both sides are float64: the engine's band kernel does subtract /
    multiply / divide in a fixed op order, and the triangle sign test
    multiplies a <=r-magnitude constant by a world-magnitude
    difference; the SQL replicates the exact op tree with DOUBLE
    literals (explicit self-multiply, per-term comparisons, no min()
    accumulation) so each comparison is bit-identical.  Fan triangle
    coordinates come from the same ``chordal_fan_triangles`` the engine
    evaluates, so the chord geometry is shared by construction.
    """
    from ..geom import chordal_fan_triangles

    buf2 = _f(float(buffer) ** 2)
    dpx, dpy = f"({px})::DOUBLE", f"({py})::DOUBLE"
    terms = []
    for r in range(mp.n_rings):
        xs, ys = mp.ring(r)
        for x1, y1, x2, y2 in _ring_edges(xs, ys):
            dx, dy = float(x2 - x1), float(y2 - y1)
            l2 = dx * dx + dy * dy or 1.0
            t = (
                f"((({dpx} - {_f(x1)}) * {_f(dx)} + "
                f"({dpy} - {_f(y1)}) * {_f(dy)}) / {_f(l2)})"
            )
            ex = f"({dpx} - ({_f(x1)} + {t} * {_f(dx)}))"
            ey = f"({dpy} - ({_f(y1)} + {t} * {_f(dy)}))"
            terms.append(
                f"({t} >= 0.0 AND {t} <= 1.0 AND "
                f"{ex} * {ex} + {ey} * {ey} <= {buf2})"
            )
    for vx, vy, ax, ay, bx, by in chordal_fan_triangles(
        mp, buffer, quad_segs
    ).tolist():
        d1 = (
            f"({_f(ax - vx)} * ({dpy} - {_f(vy)}) - "
            f"({dpx} - {_f(vx)}) * {_f(ay - vy)})"
        )
        d2 = (
            f"({_f(bx - ax)} * ({dpy} - {_f(ay)}) - "
            f"({dpx} - {_f(ax)}) * {_f(by - ay)})"
        )
        d3 = (
            f"({_f(vx - bx)} * ({dpy} - {_f(by)}) - "
            f"({dpx} - {_f(bx)}) * {_f(vy - by)})"
        )
        terms.append(
            f"(({d1} >= 0.0 AND {d2} >= 0.0 AND {d3} >= 0.0) OR "
            f"({d1} <= 0.0 AND {d2} <= 0.0 AND {d3} <= 0.0))"
        )
    return "(" + " OR ".join(terms) + ")" if terms else "false"
