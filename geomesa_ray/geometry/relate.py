"""Full DE-9IM matrix computation (st_relate / st_relateBool analog,
SpatialRelationFunctions.scala:24-59).

``relate(a, b)`` returns the 9-character matrix string
``[II IB IE  BI BB BE  EI EB EE]`` with entries in {F, 0, 1, 2}, computed
for Point / LineString / Polygon and their multis (cells combine by max
dimension; exterior cells use coverage flags).

``matches(matrix, pattern)`` implements the DE-9IM pattern language
(T = any non-empty, F, 0/1/2 exact, * = anything).
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.geometry.base import (
    Geometry,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)
from geomesa_ray.geometry.predicates import (
    _dim,
    _flatten,
    _im,
    _interior_point_of_polygon,
    _line_boundary,
    _line_poly_samples,
    _point_in_poly_scalar,
    _point_on_line,
    _seg_intersection_points,
    _segments,
)

EMPTY = -1


def _fmt(d: int) -> str:
    return "F" if d < 0 else str(d)


def matches(matrix: str, pattern: str) -> bool:
    """DE-9IM pattern match: T/F/0/1/2/*."""
    if len(matrix) != 9 or len(pattern) != 9:
        raise ValueError("DE-9IM strings are 9 characters")
    for m, p in zip(matrix, pattern.upper()):
        if p == "*":
            continue
        if p == "T":
            if m == "F":
                return False
        elif p != m:
            return False
    return True


# ---------------------------------------------------------------------------
# per-pair cell computations (a-row perspective: I/B/E of a vs I/B/E of b)
# ---------------------------------------------------------------------------


def _loc_point(px, py, g: Geometry) -> str:
    """'interior' | 'boundary' | 'exterior' of a point w.r.t. geometry g."""
    if isinstance(g, Point):
        return "interior" if (px, py) == (g.x, g.y) else "exterior"
    if isinstance(g, LineString):
        if (px, py) in _line_boundary(g):
            return "boundary"
        return "interior" if _point_on_line(px, py, g) else "exterior"
    if isinstance(g, Polygon):
        loc = _point_in_poly_scalar(px, py, g)
        return {"in": "interior", "on": "boundary", "out": "exterior"}[loc]
    # multi: interior wins, then boundary (shared part boundaries may merge
    # into interior — approximation: any-part classification)
    locs = [_loc_point(px, py, p) for p in _flatten(g)]
    if "interior" in locs:
        return "interior"
    if "boundary" in locs:
        return "boundary"
    return "exterior"


def _ring_lines(poly: Polygon) -> list[LineString]:
    return [LineString(r) for r in poly.rings]


def _line_pieces_locations(line: LineString, poly: Polygon) -> set:
    """Locations ('interior'/'boundary'/'exterior' of poly) taken by the
    LINE's interior pieces (midpoint sampling between crossings)."""
    out = set()
    for (sx, sy) in _line_poly_samples(line, poly):
        out.add(
            {"in": "interior", "on": "boundary", "out": "exterior"}[
                _point_in_poly_scalar(sx, sy, poly)
            ]
        )
    return out


def _line_line_cells(a: LineString, b: LineString) -> dict:
    """II, IB, BI, BB plus coverage-ish info for line/line."""
    a_bnd, b_bnd = _line_boundary(a), _line_boundary(b)
    ii = EMPTY
    shared = []
    for sa in _segments(a.coords):
        for sb in _segments(b.coords):
            pts, proper, coll = _seg_intersection_points(sa[0], sa[1], sb[0], sb[1])
            shared.extend(pts)
            if coll:
                ii = max(ii, 1)
            elif proper:
                ii = max(ii, 0)
    for (px, py) in shared:
        if (px, py) not in a_bnd and (px, py) not in b_bnd:
            ii = max(ii, 0)
    ib = EMPTY
    for (px, py) in b_bnd:
        if _point_on_line(px, py, a) and (px, py) not in a_bnd:
            ib = 0
    bi = EMPTY
    for (px, py) in a_bnd:
        if _point_on_line(px, py, b) and (px, py) not in b_bnd:
            bi = 0
    bb = EMPTY
    for (px, py) in a_bnd:
        if (px, py) in b_bnd:
            bb = 0
    be = EMPTY
    for (px, py) in a_bnd:
        if not _point_on_line(px, py, b):
            be = 0
    eb = EMPTY
    for (px, py) in b_bnd:
        if not _point_on_line(px, py, a):
            eb = 0
    return {"II": ii, "IB": ib, "BI": bi, "BB": bb, "BE": be, "EB": eb}


def _relate_simple(a: Geometry, b: Geometry) -> list[int]:
    """9 cells for simple (non-multi) geometries."""
    im = _im(a, b)
    da, db = _dim(a), _dim(b)
    II = IB = IE = BI = BB = BE = EI = EB = EE = EMPTY
    EE = 2

    if isinstance(a, Point) and isinstance(b, Point):
        same = (a.x, a.y) == (b.x, b.y)
        II = 0 if same else EMPTY
        IE = EMPTY if same else 0
        EI = EMPTY if same else 0
    elif isinstance(a, Point):
        loc = _loc_point(a.x, a.y, b)
        II = 0 if loc == "interior" else EMPTY
        IB = 0 if loc == "boundary" else EMPTY
        IE = 0 if loc == "exterior" else EMPTY
        EI = db  # b minus a point still has full-dim interior
        EB = 1 if isinstance(b, Polygon) else (0 if _line_boundary(b) else EMPTY)
    elif isinstance(b, Point):
        cells = _relate_simple(b, a)
        return [cells[0], cells[3], cells[6], cells[1], cells[4], cells[7],
                cells[2], cells[5], cells[8]]
    elif isinstance(a, LineString) and isinstance(b, LineString):
        c = _line_line_cells(a, b)
        II, IB, BI, BB, BE, EB = c["II"], c["IB"], c["BI"], c["BB"], c["BE"], c["EB"]
        IE = EMPTY if im.b_cov_a else 1
        EI = EMPTY if im.a_cov_b else 1
    elif isinstance(a, LineString) and isinstance(b, Polygon):
        locs = _line_pieces_locations(a, b)
        II = 1 if "interior" in locs else EMPTY
        # line pieces lying ON the boundary → dim 1; mere crossings → dim 0
        if "boundary" in locs:
            IB = 1
        else:
            crossings = False
            for sa in _segments(a.coords):
                for ring in b.rings:
                    for sb in _segments(ring):
                        pts, _, _ = _seg_intersection_points(sa[0], sa[1], sb[0], sb[1])
                        if pts:
                            crossings = True
            IB = 0 if crossings else EMPTY
            # endpoint-only touches are boundary(a) cells, not interior:
            if IB == 0:
                # confirm at least one touch point is NOT a line endpoint
                a_bnd = _line_boundary(a)
                pure = False
                for sa in _segments(a.coords):
                    for ring in b.rings:
                        for sb in _segments(ring):
                            pts, _, _ = _seg_intersection_points(sa[0], sa[1], sb[0], sb[1])
                            for p in pts:
                                if p not in a_bnd:
                                    pure = True
                if not pure:
                    IB = EMPTY
        IE = 1 if "exterior" in locs else EMPTY
        for (px, py) in _line_boundary(a):
            loc = _loc_point(px, py, b)
            if loc == "interior":
                BI = 0
            elif loc == "boundary":
                BB = 0
            else:
                BE = 0
        EI = 2
        # polygon boundary fully covered by the line? (closed ring tracing)
        ring_pts = []
        for rl in _ring_lines(b):
            ring_pts.extend(map(tuple, rl.coords))
            mids = (rl.coords[:-1] + rl.coords[1:]) / 2.0
            ring_pts.extend(map(tuple, mids))
        EB = EMPTY if all(_point_on_line(px, py, a) for (px, py) in ring_pts) else 1
    elif isinstance(a, Polygon) and isinstance(b, LineString):
        cells = _relate_simple(b, a)
        return [cells[0], cells[3], cells[6], cells[1], cells[4], cells[7],
                cells[2], cells[5], cells[8]]
    elif isinstance(a, Polygon) and isinstance(b, Polygon):
        II = 2 if im.ii else EMPTY
        # a-boundary pieces vs b (and symmetric)
        a_locs = set()
        for rl in _ring_lines(a):
            a_locs |= _line_pieces_locations(rl, b)
        b_locs = set()
        for rl in _ring_lines(b):
            for ra in [a]:
                b_locs |= _line_pieces_locations(rl, ra)
        BI = 1 if "interior" in a_locs else EMPTY
        BE = 1 if "exterior" in a_locs else EMPTY
        IB = 1 if "interior" in b_locs else EMPTY
        EB = 1 if "exterior" in b_locs else EMPTY
        # boundary ∩ boundary: collinear overlap → 1; isolated touch → 0
        bb = EMPTY
        touch = False
        for ra in a.rings:
            for sa in _segments(ra):
                for rb in b.rings:
                    for sb in _segments(rb):
                        pts, _p, coll = _seg_intersection_points(sa[0], sa[1], sb[0], sb[1])
                        if coll:
                            bb = 1
                        elif pts:
                            touch = True
        BB = bb if bb != EMPTY else (0 if touch else EMPTY)
        IE = EMPTY if im.b_cov_a else 2
        EI = EMPTY if im.a_cov_b else 2
    else:
        raise TypeError(f"unsupported pair {type(a).__name__}/{type(b).__name__}")

    return [II, IB, IE, BI, BB, BE, EI, EB, EE]


def relate(a: Geometry, b: Geometry) -> str:
    """DE-9IM matrix string for (multi)point/line/polygon pairs."""
    pa_, pb_ = _flatten(a), _flatten(b)
    if len(pa_) == 1 and len(pb_) == 1:
        cells = _relate_simple(pa_[0], pb_[0])
        return "".join(_fmt(d) for d in cells)
    # multis: max dim per cell across part pairs, with exterior cells
    # recomputed from whole-geometry coverage
    acc = [EMPTY] * 9
    for x in pa_:
        for y in pb_:
            cells = _relate_simple(x, y)
            for i in range(9):
                acc[i] = max(acc[i], cells[i])
    im = _im(a, b)
    acc[2] = EMPTY if im.b_cov_a else _dim(a)  # IE
    acc[6] = EMPTY if im.a_cov_b else _dim(b)  # EI
    acc[8] = 2
    return "".join(_fmt(d) for d in acc)


def relate_bool(a: Geometry, b: Geometry, pattern: str) -> bool:
    return matches(relate(a, b), pattern)
