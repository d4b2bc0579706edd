"""Spatial predicates: vectorized point-in-polygon + named DE-9IM relations.

The join hot path is :func:`points_in_polygon` / :func:`points_on_boundary`
— O(edges) numpy passes over the whole point batch, no per-row Python.

The named relations (contains, intersects, touches, ...) are scalar
geometry-pair functions used by the ``st_*`` library and tests. Their
semantics follow DE-9IM as exercised by the reference's relation fixtures
(geomesa-spark/.../SparkSQLSpatialRelationshipsTest.scala:31-150): e.g.
``contains(box, point)`` is false for boundary points, ``covers`` is true.
Interior/coverage tests for curved cases use exact segment arithmetic plus
midpoint sampling; exact for points/boxes/simple polygons.
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.geometry.base import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)

_EPS = 0.0  # fixtures use exact doubles; predicates are exact-arithmetic


# ---------------------------------------------------------------------------
# vectorized point-in-polygon (the join kernel)
# ---------------------------------------------------------------------------

def _rings_of(poly) -> list[np.ndarray]:
    if isinstance(poly, Polygon):
        return poly.rings
    if isinstance(poly, MultiPolygon):
        return [r for p in poly.parts for r in p.rings]
    raise TypeError(f"expected (Multi)Polygon, got {type(poly).__name__}")


def points_on_boundary(px: np.ndarray, py: np.ndarray, poly) -> np.ndarray:
    """Bool mask: point lies exactly on a ring segment of the polygon."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    on = np.zeros(px.shape, dtype=bool)
    for ring in _rings_of(poly):
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        for i in range(len(x1)):
            cross = (x2[i] - x1[i]) * (py - y1[i]) - (y2[i] - y1[i]) * (px - x1[i])
            within_x = (px >= min(x1[i], x2[i])) & (px <= max(x1[i], x2[i]))
            within_y = (py >= min(y1[i], y2[i])) & (py <= max(y1[i], y2[i]))
            on |= (cross == 0) & within_x & within_y
    return on


def _even_odd(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Even-odd ray-cast parity; boundary points are resolved separately."""
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        for i in range(len(x1)):
            if y1[i] == y2[i]:
                continue  # horizontal edges never cross the upward half-open ray
            cond = (y1[i] > py) != (y2[i] > py)
            if not cond.any():
                continue
            xint = x1[i] + (py - y1[i]) * (x2[i] - x1[i]) / (y2[i] - y1[i])
            inside ^= cond & (px < xint)
    return inside


def points_in_polygon(px, py, poly, include_boundary: bool = True) -> np.ndarray:
    """Vectorized point-in-polygon over numpy arrays of coordinates.

    ``include_boundary=True`` gives ``covers``/``intersects`` semantics;
    ``False`` gives strict-interior (``contains``) semantics. Holes are
    handled by even-odd parity.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xmin, ymin, xmax, ymax = poly.bounds
    candidates = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
    out = np.zeros(px.shape, dtype=bool)
    if not candidates.any():
        return out
    cpx, cpy = px[candidates], py[candidates]
    parity = _even_odd(cpx, cpy, _rings_of(poly))
    on = points_on_boundary(cpx, cpy, poly)
    res = (parity & ~on) | on if include_boundary else (parity & ~on)
    out[candidates] = res
    return out


# ---------------------------------------------------------------------------
# segment primitives
# ---------------------------------------------------------------------------

def _orient(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_segment(px, py, ax, ay, bx, by) -> bool:
    if _orient(ax, ay, bx, by, px, py) != 0:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _seg_intersection_points(a1, a2, b1, b2):
    """All intersection points of two segments + flags.

    Returns (points, proper, collinear_overlap):
      proper           - interiors cross at a single point
      collinear_overlap- collinear segments sharing a positive-length piece
    """
    (ax1, ay1), (ax2, ay2) = a1, a2
    (bx1, by1), (bx2, by2) = b1, b2
    d1 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _orient(ax1, ay1, ax2, ay2, bx2, by2)

    pts, proper, coll = [], False, False
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0:
        # proper crossing: solve for the point
        denom = (ax2 - ax1) * (by2 - by1) - (ay2 - ay1) * (bx2 - bx1)
        t = ((bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1)) / denom
        pts.append((ax1 + t * (ax2 - ax1), ay1 + t * (ay2 - ay1)))
        proper = True
        return pts, proper, coll
    if d1 == 0 and d2 == 0 and d3 == 0 and d4 == 0:
        # collinear: compare ONLY along the major axis (the dominant
        # coordinate is strictly monotonic along the carrier line, so a
        # single scalar ordering is exact; lexicographic tuple min/max
        # would compare x first even for y-major steep segments and miss
        # negative-slope overlaps)
        key = 0 if abs(ax2 - ax1) >= abs(ay2 - ay1) else 1
        amin, amax = sorted([(ax1, ay1), (ax2, ay2)], key=lambda p: p[key])
        bmin, bmax = sorted([(bx1, by1), (bx2, by2)], key=lambda p: p[key])
        lo = amin if amin[key] >= bmin[key] else bmin
        hi = amax if amax[key] <= bmax[key] else bmax
        if lo[key] < hi[key]:
            pts.extend([lo, hi])
            coll = True
        elif lo[key] == hi[key]:
            pts.append(lo)
        return pts, proper, coll
    # touching at an endpoint / endpoint on interior
    for (px, py) in [(ax1, ay1), (ax2, ay2)]:
        if _on_segment(px, py, bx1, by1, bx2, by2):
            pts.append((px, py))
    for (px, py) in [(bx1, by1), (bx2, by2)]:
        if _on_segment(px, py, ax1, ay1, ax2, ay2):
            pts.append((px, py))
    # dedup
    pts = list(dict.fromkeys(pts))
    return pts, proper, coll


def _segments(coords: np.ndarray):
    return [((coords[i, 0], coords[i, 1]), (coords[i + 1, 0], coords[i + 1, 1])) for i in range(len(coords) - 1)]


def _line_boundary(line: LineString) -> set:
    """Boundary of a linestring: its endpoints (empty for closed rings)."""
    if line.is_closed:
        return set()
    return {(line.coords[0, 0], line.coords[0, 1]), (line.coords[-1, 0], line.coords[-1, 1])}


def _point_on_line(px, py, line: LineString) -> bool:
    return any(_on_segment(px, py, a[0], a[1], b[0], b[1]) for a, b in _segments(line.coords))


def _interior_point_of_polygon(poly: Polygon) -> tuple[float, float]:
    """A point strictly inside the polygon, via a horizontal scanline."""
    xmin, ymin, xmax, ymax = poly.bounds
    for frac in (0.5, 0.37, 0.61, 0.23, 0.79, 0.11, 0.93):
        y = ymin + (ymax - ymin) * frac
        xs = []
        for ring in poly.rings:
            for (x1, y1), (x2, y2) in _segments(ring):
                if y1 == y2:
                    continue
                if (y1 > y) != (y2 > y):
                    xs.append(x1 + (y - y1) * (x2 - x1) / (y2 - y1))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            if xs[i + 1] > xs[i]:
                cx = (xs[i] + xs[i + 1]) / 2.0
                if points_in_polygon(np.array([cx]), np.array([y]), poly, include_boundary=False)[0]:
                    return cx, y
    # degenerate: fall back to first vertex
    return float(poly.shell[0, 0]), float(poly.shell[0, 1])


# ---------------------------------------------------------------------------
# IM summary per type pair: (II, ANY, a_covers_b, b_covers_a, extra)
# ---------------------------------------------------------------------------

def _point_in_poly_scalar(px, py, poly) -> str:
    """'in' | 'on' | 'out'."""
    on = points_on_boundary(np.array([px]), np.array([py]), poly)[0]
    if on:
        return "on"
    if points_in_polygon(np.array([px]), np.array([py]), poly, include_boundary=False)[0]:
        return "in"
    return "out"


def _flatten(g: Geometry) -> list[Geometry]:
    if isinstance(g, (MultiPoint, MultiLineString, MultiPolygon, GeometryCollection)):
        out = []
        for p in g.parts:
            out.extend(_flatten(p))
        return out
    return [g]


def _dim(g: Geometry) -> int:
    if isinstance(g, Point):
        return 0
    if isinstance(g, LineString):
        return 1
    if isinstance(g, Polygon):
        return 2
    return max((_dim(p) for p in _flatten(g)), default=0)


class _IM:
    """Pairwise intersection summary between two simple geometries."""

    __slots__ = ("ii", "any", "a_cov_b", "b_cov_a", "ii_dim")

    def __init__(self, ii, any_, a_cov_b, b_cov_a, ii_dim=-1):
        self.ii = ii
        self.any = any_
        self.a_cov_b = a_cov_b
        self.b_cov_a = b_cov_a
        self.ii_dim = ii_dim  # dimension of interior∩interior (-1 = empty)


def _im_point_point(a: Point, b: Point) -> _IM:
    eq = (a.x, a.y) == (b.x, b.y)
    return _IM(eq, eq, eq, eq, 0 if eq else -1)


def _im_point_line(a: Point, b: LineString) -> _IM:
    on = _point_on_line(a.x, a.y, b)
    at_boundary = (a.x, a.y) in _line_boundary(b)
    ii = on and not at_boundary
    return _IM(ii, on, False, on, 0 if ii else -1)


def _im_point_poly(a: Point, b: Polygon) -> _IM:
    loc = _point_in_poly_scalar(a.x, a.y, b)
    return _IM(loc == "in", loc != "out", False, loc != "out", 0 if loc == "in" else -1)


def _im_line_line(a: LineString, b: LineString) -> _IM:
    a_bnd, b_bnd = _line_boundary(a), _line_boundary(b)
    any_ = False
    ii = False
    ii_dim = -1
    shared_pts = []
    for sa in _segments(a.coords):
        for sb in _segments(b.coords):
            pts, proper, coll = _seg_intersection_points(sa[0], sa[1], sb[0], sb[1])
            if pts:
                any_ = True
            if proper:
                ii = True
                ii_dim = max(ii_dim, 0)
            if coll:
                ii = True
                ii_dim = 1
            shared_pts.extend(pts)
    if not ii:
        for (px, py) in shared_pts:
            if (px, py) not in a_bnd and (px, py) not in b_bnd:
                ii = True
                ii_dim = max(ii_dim, 0)
                break
    # coverage: every vertex + segment midpoint of one lies on the other
    def covered(src: LineString, dst: LineString) -> bool:
        pts = list(src.coords)
        mids = (src.coords[:-1] + src.coords[1:]) / 2.0
        pts.extend(mids)
        return all(_point_on_line(p[0], p[1], dst) for p in pts)

    a_cov_b = any_ and covered(b, a)
    b_cov_a = any_ and covered(a, b)
    return _IM(ii, any_, a_cov_b, b_cov_a, ii_dim)


def _line_poly_samples(line: LineString, poly: Polygon):
    """Sample points of the line's interior between boundary crossings."""
    samples = []
    for (p1, p2) in _segments(line.coords):
        ts = [0.0, 1.0]
        for ring in poly.rings:
            for sb in _segments(ring):
                pts, _, _ = _seg_intersection_points(p1, p2, sb[0], sb[1])
                for (ix, iy) in pts:
                    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
                    t = ((ix - p1[0]) * dx + (iy - p1[1]) * dy) / (dx * dx + dy * dy) if (dx or dy) else 0.0
                    ts.append(min(max(t, 0.0), 1.0))
        ts = sorted(set(ts))
        for t1, t2 in zip(ts[:-1], ts[1:]):
            tm = (t1 + t2) / 2.0
            samples.append((p1[0] + tm * (p2[0] - p1[0]), p1[1] + tm * (p2[1] - p1[1])))
    return samples


def _im_line_poly(a: LineString, b: Polygon) -> _IM:
    samples = _line_poly_samples(a, b)
    locs = [_point_in_poly_scalar(px, py, b) for (px, py) in samples]
    vert_locs = [_point_in_poly_scalar(px, py, b) for (px, py) in a.coords]
    ii = any(l == "in" for l in locs)
    any_ = any(l != "out" for l in locs) or any(l != "out" for l in vert_locs)
    b_cov_a = all(l != "out" for l in locs) and all(l != "out" for l in vert_locs)
    return _IM(ii, any_, False, b_cov_a, 1 if ii else -1)


def _im_poly_poly(a: Polygon, b: Polygon) -> _IM:
    proper = False
    any_ = False
    for ra in a.rings:
        for sa in _segments(ra):
            for rb in b.rings:
                for sb in _segments(rb):
                    pts, p, coll = _seg_intersection_points(sa[0], sa[1], sb[0], sb[1])
                    if pts:
                        any_ = True
                    if p:
                        proper = True
    a_int = _interior_point_of_polygon(a)
    b_int = _interior_point_of_polygon(b)
    a_in_b = _point_in_poly_scalar(a_int[0], a_int[1], b) == "in"
    b_in_a = _point_in_poly_scalar(b_int[0], b_int[1], a) == "in"
    ii = proper or a_in_b or b_in_a
    if not any_:
        any_ = ii

    def covered(src: Polygon, dst: Polygon) -> bool:
        if proper:
            return False
        pts = [tuple(p) for r in src.rings for p in r]
        for r in src.rings:
            mids = (r[:-1] + r[1:]) / 2.0
            pts.extend(tuple(m) for m in mids)
        if not all(_point_in_poly_scalar(px, py, dst) != "out" for (px, py) in pts):
            return False
        return _point_in_poly_scalar(*_interior_point_of_polygon(src), dst) == "in"

    a_cov_b = covered(b, a)
    b_cov_a = covered(a, b)
    return _IM(ii, any_, a_cov_b, b_cov_a, 2 if ii else -1)


def _im_simple(a: Geometry, b: Geometry) -> _IM:
    """Dispatch on simple (non-multi) geometry types; a-covers-b oriented."""
    if isinstance(a, Point) and isinstance(b, Point):
        return _im_point_point(a, b)
    if isinstance(a, Point) and isinstance(b, LineString):
        im = _im_point_line(a, b)
        return _IM(im.ii, im.any, im.a_cov_b, im.b_cov_a, im.ii_dim)
    if isinstance(a, LineString) and isinstance(b, Point):
        im = _im_point_line(b, a)
        return _IM(im.ii, im.any, im.b_cov_a, im.a_cov_b, im.ii_dim)
    if isinstance(a, Point) and isinstance(b, Polygon):
        im = _im_point_poly(a, b)
        return _IM(im.ii, im.any, im.a_cov_b, im.b_cov_a, im.ii_dim)
    if isinstance(a, Polygon) and isinstance(b, Point):
        im = _im_point_poly(b, a)
        return _IM(im.ii, im.any, im.b_cov_a, im.a_cov_b, im.ii_dim)
    if isinstance(a, LineString) and isinstance(b, LineString):
        return _im_line_line(a, b)
    if isinstance(a, LineString) and isinstance(b, Polygon):
        im = _im_line_poly(a, b)
        return _IM(im.ii, im.any, im.a_cov_b, im.b_cov_a, im.ii_dim)
    if isinstance(a, Polygon) and isinstance(b, LineString):
        im = _im_line_poly(b, a)
        return _IM(im.ii, im.any, im.b_cov_a, im.a_cov_b, im.ii_dim)
    if isinstance(a, Polygon) and isinstance(b, Polygon):
        return _im_poly_poly(a, b)
    raise TypeError(f"unsupported pair: {a.geom_type}/{b.geom_type}")


def _im(a: Geometry, b: Geometry) -> _IM:
    """Relate multi-geometries by distributing over parts."""
    pa, pb = _flatten(a), _flatten(b)
    if len(pa) == 1 and len(pb) == 1:
        return _im_simple(pa[0], pb[0])
    ims = [[_im_simple(x, y) for y in pb] for x in pa]
    ii = any(im.ii for row in ims for im in row)
    any_ = any(im.any for row in ims for im in row)
    ii_dim = max((im.ii_dim for row in ims for im in row), default=-1)
    # a covers b: each part of b covered by some part of a (approximation:
    # true multi-part union coverage not supported)
    a_cov_b = all(any(ims[i][j].a_cov_b for i in range(len(pa))) for j in range(len(pb)))
    b_cov_a = all(any(ims[i][j].b_cov_a for j in range(len(pb))) for i in range(len(pa)))
    return _IM(ii, any_, a_cov_b, b_cov_a, ii_dim)


# ---------------------------------------------------------------------------
# named relations
# ---------------------------------------------------------------------------

def intersects(a: Geometry, b: Geometry) -> bool:
    return _im(a, b).any


def disjoint(a: Geometry, b: Geometry) -> bool:
    return not _im(a, b).any


def contains(a: Geometry, b: Geometry) -> bool:
    im = _im(a, b)
    return im.a_cov_b and im.ii


def covers(a: Geometry, b: Geometry) -> bool:
    return _im(a, b).a_cov_b


def within(a: Geometry, b: Geometry) -> bool:
    im = _im(a, b)
    return im.b_cov_a and im.ii


def covered_by(a: Geometry, b: Geometry) -> bool:
    return _im(a, b).b_cov_a


def touches(a: Geometry, b: Geometry) -> bool:
    im = _im(a, b)
    return im.any and not im.ii


def crosses(a: Geometry, b: Geometry) -> bool:
    im = _im(a, b)
    da, db = _dim(a), _dim(b)
    if da == db == 1:
        return im.ii and im.ii_dim == 0
    if da == db:
        return False  # points and polygons never cross same-dim
    return im.ii and not im.a_cov_b and not im.b_cov_a


def overlaps(a: Geometry, b: Geometry) -> bool:
    im = _im(a, b)
    da, db = _dim(a), _dim(b)
    if da != db:
        return False
    if da == 1:
        return im.ii_dim == 1 and not im.a_cov_b and not im.b_cov_a
    return im.ii and not im.a_cov_b and not im.b_cov_a


def equals(a: Geometry, b: Geometry) -> bool:
    im = _im(a, b)
    return im.a_cov_b and im.b_cov_a


def relate_bool(a: Geometry, b: Geometry, pattern: str) -> bool:
    """DE-9IM pattern matching (st_relateBool) — full matrix in relate.py."""
    from geomesa_ray.geometry.relate import relate_bool as _rb

    return _rb(a, b, pattern)
