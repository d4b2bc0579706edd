"""Geometry overlay operations: intersection, difference, make-valid.

Reference surface: ``st_intersection`` / ``st_difference``
(geomesa-spark-sql SpatialRelationFunctions.scala:57,83, delegating to JTS
overlay) and ``st_makeValid``
(GeometricProcessingFunctions.scala:72, JTS buffer(0) analog).

Implementation (from-scratch, no JTS):

* axis-aligned rectangle × rectangle → exact interval arithmetic
  (bit-deterministic, the SQL-oracle path);
* subject × CONVEX clip intersection → Sutherland–Hodgman;
* general simple polygon × simple polygon intersection/difference →
  Greiner–Hormann with entry/exit toggling (handles concave shapes;
  degenerate inputs — shared edges/vertices — are perturbed by a tiny
  jitter on the clip, documented below);
* ``make_valid`` → ring closure, consecutive-duplicate removal, and
  canonical orientation (shell CCW, holes CW) — the deterministic subset
  of JTS buffer(0) repair (self-crossing rings are detected and reported,
  not rebuilt).

Holes: input holes (subject's, and for intersection also the clip's) are
clipped against each result ring and re-attached, so partially
overlapping holes subtract the correct area; a ring fully consumed by
its holes is dropped. Difference by a holed subtrahend raises
NotImplementedError (the hole regions would need to be added back).
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.geometry.base import (
    Geometry,
    LineString,
    MultiPolygon,
    Point,
    Polygon,
)
from geomesa_ray.geometry.measures import _ring_area as ring_area
from geomesa_ray.geometry.predicates import points_in_polygon

_EPS = 1e-12


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def is_axis_rect(poly: Polygon) -> bool:
    """True for a closed 4-edge ring whose edges are axis-parallel."""
    if poly.holes or len(poly.shell) != 5:
        return False
    c = poly.shell
    for k in range(4):
        dx, dy = c[k + 1, 0] - c[k, 0], c[k + 1, 1] - c[k, 1]
        if dx != 0.0 and dy != 0.0:
            return False
    return True


def _rect_from_bounds(xmin, ymin, xmax, ymax) -> Polygon:
    return Polygon([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)])


def is_convex(ring: np.ndarray) -> bool:
    """Convexity of a closed ring (no three-collinear strictness)."""
    c = ring[:-1]
    n = len(c)
    if n < 3:
        return False
    sign = 0
    for k in range(n):
        ax, ay = c[(k + 1) % n] - c[k]
        bx, by = c[(k + 2) % n] - c[(k + 1) % n]
        cr = ax * by - ay * bx
        if abs(cr) < _EPS:
            continue
        s = 1 if cr > 0 else -1
        if sign == 0:
            sign = s
        elif s != sign:
            return False
    return True


def _close(coords) -> np.ndarray:
    c = np.asarray(coords, dtype=np.float64)
    if len(c) and not np.all(c[0] == c[-1]):
        c = np.vstack([c, c[:1]])
    return c


def _dedupe_ring(c: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate vertices (keep closure)."""
    if len(c) < 2:
        return c
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = np.any(c[1:] != c[:-1], axis=1)
    out = c[keep]
    return _close(out)


# ---------------------------------------------------------------------------
# Sutherland–Hodgman (convex clip)
# ---------------------------------------------------------------------------

def sutherland_hodgman(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Clip a (possibly concave) subject ring by a CONVEX clip ring.
    Rings are closed arrays; returns a closed output ring (possibly
    empty). Clip orientation is normalized to CCW internally."""
    if ring_area(clip) < 0:
        clip = clip[::-1]
    out = list(map(tuple, subject[:-1]))
    cc = clip[:-1]
    n = len(cc)
    for k in range(n):
        if not out:
            break
        ex, ey = cc[k]
        fx, fy = cc[(k + 1) % n]
        inp = out
        out = []

        def inside(p):
            return (fx - ex) * (p[1] - ey) - (fy - ey) * (p[0] - ex) >= -_EPS

        def isect(a, b):
            dx1, dy1 = b[0] - a[0], b[1] - a[1]
            dx2, dy2 = fx - ex, fy - ey
            denom = dx1 * dy2 - dy1 * dx2
            t = ((ex - a[0]) * dy2 - (ey - a[1]) * dx2) / denom
            return (a[0] + t * dx1, a[1] + t * dy1)

        for i in range(len(inp)):
            a, b = inp[i - 1], inp[i]
            ain, bin_ = inside(a), inside(b)
            if bin_:
                if not ain:
                    out.append(isect(a, b))
                out.append(b)
            elif ain:
                out.append(isect(a, b))
    if len(out) < 3:
        return np.empty((0, 2))
    return _dedupe_ring(_close(np.asarray(out)))


# ---------------------------------------------------------------------------
# Greiner–Hormann (general simple polygons, no holes)
# ---------------------------------------------------------------------------

class _Node:
    __slots__ = ("x", "y", "nxt", "prv", "neighbor", "intersect", "entry",
                 "alpha", "visited")

    def __init__(self, x, y, alpha=0.0, intersect=False):
        self.x, self.y = x, y
        self.nxt = self.prv = None
        self.neighbor = None
        self.intersect = intersect
        self.entry = True
        self.alpha = alpha
        self.visited = False


def _build_list(ring: np.ndarray) -> _Node:
    first = None
    prev = None
    for x, y in ring[:-1]:
        node = _Node(float(x), float(y))
        if first is None:
            first = node
        else:
            prev.nxt = node
            node.prv = prev
        prev = node
    prev.nxt = first
    first.prv = prev
    return first


def _iter_ring(first: _Node):
    node = first
    while True:
        yield node
        node = node.nxt
        if node is first:
            break


def _insert_sorted(edge_start: _Node, node: _Node):
    """Insert an intersection node after edge_start, ordered by alpha."""
    pos = edge_start
    while pos.nxt.intersect and pos.nxt.alpha < node.alpha:
        pos = pos.nxt
    node.nxt = pos.nxt
    node.prv = pos
    pos.nxt.prv = node
    pos.nxt = node


def _seg_intersect(p1, p2, q1, q2):
    """Proper (interior) intersection of segments; returns (t, u, x, y) or
    None. Endpoint touches are treated as non-intersections (degenerate
    inputs are jittered upstream)."""
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = q2[0] - q1[0], q2[1] - q1[1]
    denom = d1x * d2y - d1y * d2x
    if abs(denom) < _EPS:
        return None
    t = ((q1[0] - p1[0]) * d2y - (q1[1] - p1[1]) * d2x) / denom
    u = ((q1[0] - p1[0]) * d1y - (q1[1] - p1[1]) * d1x) / denom
    if t <= _EPS or t >= 1 - _EPS or u <= _EPS or u >= 1 - _EPS:
        return None
    return t, u, p1[0] + t * d1x, p1[1] + t * d1y


def _gh_rings(subject: np.ndarray, clip: np.ndarray, op: str) -> list[np.ndarray]:
    """Greiner–Hormann core for 'intersection' | 'difference' over simple
    closed rings; returns a list of closed result rings."""
    subj_poly = Polygon(subject)
    clip_poly = Polygon(clip)

    s_first = _build_list(subject)
    c_first = _build_list(clip)

    # phase 1: find and insert intersections (segments run between
    # consecutive ORIGINAL vertices, captured before any insertion)
    found = False
    s_nodes = [n for n in _iter_ring(s_first)]
    c_nodes = [n for n in _iter_ring(c_first)]
    for si, sn in enumerate(s_nodes):
        s2 = s_nodes[(si + 1) % len(s_nodes)]
        for ci, cn in enumerate(c_nodes):
            c2 = c_nodes[(ci + 1) % len(c_nodes)]
            hit = _seg_intersect(
                (sn.x, sn.y), (s2.x, s2.y), (cn.x, cn.y), (c2.x, c2.y)
            )
            if hit is None:
                continue
            t, u, x, y = hit
            a = _Node(x, y, alpha=t, intersect=True)
            b = _Node(x, y, alpha=u, intersect=True)
            a.neighbor, b.neighbor = b, a
            _insert_sorted(sn, a)
            _insert_sorted(cn, b)
            found = True

    if not found:
        # containment / disjoint cases
        s_in_c = bool(points_in_polygon(
            np.array([subject[0, 0]]), np.array([subject[0, 1]]), clip_poly
        )[0])
        c_in_s = bool(points_in_polygon(
            np.array([clip[0, 0]]), np.array([clip[0, 1]]), subj_poly
        )[0])
        if op == "intersection":
            if s_in_c:
                return [subject]
            if c_in_s:
                return [clip]
            return []
        # difference
        if s_in_c:
            return []
        if c_in_s:
            return [subject]  # caller re-attaches clip as a hole
        return [subject]

    # phase 2: entry/exit marking by toggling from the start status
    def mark(first: _Node, other: Polygon, invert: bool):
        status_inside = bool(points_in_polygon(
            np.array([first.x]), np.array([first.y]), other,
            include_boundary=False,
        )[0])
        entry = not status_inside
        if invert:
            entry = not entry
        for node in _iter_ring(first):
            if node.intersect:
                node.entry = entry
                entry = not entry

    # difference = A ∩ complement(B): complementing B flips which A
    # crossings are entries, so the SUBJECT's flags invert (walking B
    # backward from its unchanged flags then traces B reversed)
    mark(s_first, clip_poly, invert=(op == "difference"))
    mark(c_first, subj_poly, invert=False)

    # phase 3: traversal (classic Greiner–Hormann walk: follow the current
    # list forward from an entry / backward from an exit, switch lists at
    # every intersection via the neighbor link)
    results = []
    while True:
        start = None
        for node in _iter_ring(s_first):
            if node.intersect and not node.visited:
                start = node
                break
        if start is None:
            break
        ring = [(start.x, start.y)]
        cur = start
        guard = 0
        max_steps = 4 * (len(s_nodes) + len(c_nodes)) ** 2 + 64
        while True:
            cur.visited = True
            cur.neighbor.visited = True
            if cur.entry:
                while True:
                    cur = cur.nxt
                    ring.append((cur.x, cur.y))
                    if cur.intersect:
                        break
            else:
                while True:
                    cur = cur.prv
                    ring.append((cur.x, cur.y))
                    if cur.intersect:
                        break
            cur = cur.neighbor
            guard += 1
            if cur is start or cur.neighbor is start or guard > max_steps:
                break
        out = _dedupe_ring(_close(np.asarray(ring)))
        if len(out) >= 4 and abs(ring_area(out)) > _EPS:
            results.append(out)
    return results




def _attach_holes(rings: list[np.ndarray], holes) -> list[Polygon]:
    """Re-attach input holes to GH result rings: each hole is clipped
    against each result ring and attached where it overlaps; a ring whose
    holes consume (essentially) all of its area is dropped.

    Attached holes are made PAIRWISE DISJOINT: each new hole piece first
    subsumes any already-attached hole it fully covers, then is
    difference-clipped against the remaining ones — overlapping input
    holes (e.g. coincident holes of both operands in an intersection)
    subtract their union's area once, not twice."""
    polys: list[Polygon] = []
    for r in rings:
        rp = Polygon(r)
        r_area = abs(ring_area(r))
        attached: list[np.ndarray] = []
        for h in holes:
            hc = _close(np.asarray(h, dtype=np.float64))
            if len(hc) < 4:
                continue
            inter = polygon_intersection(Polygon(hc), rp)
            if inter is None:
                continue
            parts = inter.parts if isinstance(inter, MultiPolygon) else [inter]
            for p in parts:
                if abs(ring_area(p.shell)) <= _EPS:
                    continue
                pp = Polygon(p.shell)
                # an existing hole wholly inside the new piece is subsumed
                attached = [
                    e for e in attached
                    if polygon_difference(Polygon(e), pp) is not None
                ]
                # clip the piece against the surviving holes so the
                # attached set stays disjoint (pieces of e ⊄ pp carry no
                # nested holes: e inside a piece would imply e inside pp)
                pieces = [p.shell]
                for e in attached:
                    nxt: list[np.ndarray] = []
                    ep = Polygon(e)
                    for q in pieces:
                        d = polygon_difference(Polygon(q), ep)
                        if d is None:
                            continue
                        dparts = d.parts if isinstance(d, MultiPolygon) else [d]
                        nxt.extend(
                            dp.shell for dp in dparts
                            if abs(ring_area(dp.shell)) > _EPS
                        )
                    pieces = nxt
                attached.extend(pieces)
        if attached:
            net = r_area - sum(abs(ring_area(h)) for h in attached)
            if net <= _EPS:
                continue  # holes cover the whole ring
            polys.append(Polygon(r, holes=attached))
        else:
            polys.append(rp)
    return polys


def _jitter(ring: np.ndarray, mag: float = 1e-9) -> np.ndarray:
    """Deterministic tiny perturbation to break exact-degeneracy (shared
    vertices / collinear overlapping edges) before Greiner–Hormann."""
    rng = np.random.default_rng(12345)
    out = ring[:-1] + rng.uniform(-mag, mag, size=(len(ring) - 1, 2))
    return _close(out)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def polygon_intersection(a: Polygon, b: Polygon) -> Geometry | None:
    """a ∩ b → Polygon / MultiPolygon / None (empty)."""
    if is_axis_rect(a) and is_axis_rect(b):
        ax0, ay0, ax1, ay1 = a.bounds
        bx0, by0, bx1, by1 = b.bounds
        x0, y0 = max(ax0, bx0), max(ay0, by0)
        x1, y1 = min(ax1, bx1), min(ay1, by1)
        if x1 <= x0 or y1 <= y0:
            return None
        return _rect_from_bounds(x0, y0, x1, y1)
    if not a.holes and not b.holes and is_convex(b.shell):
        out = sutherland_hodgman(a.shell, b.shell)
        if len(out) == 0:
            return None
        return Polygon(out)
    rings = _gh_rings(a.shell, _jitter(b.shell), "intersection")
    # holes of EITHER input exclude area from a ∩ b — clip each against
    # the result rings and re-attach
    polys = _attach_holes(rings, list(a.holes) + list(b.holes))
    if not polys:
        return None
    return polys[0] if len(polys) == 1 else MultiPolygon(polys)


def polygon_difference(a: Polygon, b: Polygon) -> Geometry | None:
    """a − b → Polygon / MultiPolygon / None (empty)."""
    if is_axis_rect(a) and is_axis_rect(b):
        inter = polygon_intersection(a, b)
        if inter is None:
            return a
        ix0, iy0, ix1, iy1 = inter.bounds
        ax0, ay0, ax1, ay1 = a.bounds
        if (ix0, iy0, ix1, iy1) == (ax0, ay0, ax1, ay1):
            return None  # fully covered
        if (ix0 > ax0 and ix1 < ax1) and (iy0 > ay0 and iy1 < ay1):
            return Polygon(a.shell, holes=[inter.shell])
        # decompose the L/C/U-shaped remainder into up to 4 rectangles
        parts = []
        if iy0 > ay0:
            parts.append(_rect_from_bounds(ax0, ay0, ax1, iy0))
        if iy1 < ay1:
            parts.append(_rect_from_bounds(ax0, iy1, ax1, ay1))
        if ix0 > ax0:
            parts.append(_rect_from_bounds(ax0, iy0, ix0, iy1))
        if ix1 < ax1:
            parts.append(_rect_from_bounds(ix1, iy0, ax1, iy1))
        return parts[0] if len(parts) == 1 else MultiPolygon(parts)
    if b.holes:
        # a − b where b has holes must ADD BACK a ∩ hole(b) regions as
        # separate result parts — out of v1 scope; fail loudly rather
        # than return an area-deflated answer.
        raise NotImplementedError(
            "polygon_difference by a holed subtrahend is not supported in v1"
        )
    rings = _gh_rings(a.shell, _jitter(b.shell), "difference")
    # b fully inside a (no boundary crossings) → a with b as a hole
    if rings and len(rings) == 1 and np.array_equal(rings[0], a.shell):
        c_in_s = bool(points_in_polygon(
            np.array([b.shell[0, 0]]), np.array([b.shell[0, 1]]), a
        )[0])
        if c_in_s:
            return Polygon(a.shell, holes=[b.shell] + list(a.holes))
    polys = _attach_holes(rings, list(a.holes))
    if not polys:
        return None
    return polys[0] if len(polys) == 1 else MultiPolygon(polys)


def make_valid(geom: Geometry) -> Geometry:
    """Deterministic validity repair (st_makeValid analog,
    GeometricProcessingFunctions.scala:72): close rings, strip consecutive
    duplicate vertices, normalize orientation (shell CCW, holes CW).
    Self-crossing rings raise ValueError — the reference's buffer(0)
    node-and-rebuild is out of v1 scope and silently 'fixing' by dropping
    area would be worse than failing loudly."""
    if isinstance(geom, Polygon):
        shell = _dedupe_ring(_close(geom.shell))
        if _ring_self_intersects(shell):
            raise ValueError("self-intersecting shell: not repairable in v1")
        if ring_area(shell) < 0:
            shell = shell[::-1]
        holes = []
        for h in geom.holes:
            hh = _dedupe_ring(_close(h))
            if ring_area(hh) > 0:
                hh = hh[::-1]
            holes.append(hh)
        return Polygon(shell, holes=holes)
    if isinstance(geom, MultiPolygon):
        return MultiPolygon([make_valid(p) for p in geom.parts])
    if isinstance(geom, LineString):
        c = geom.coords
        keep = np.ones(len(c), dtype=bool)
        if len(c) > 1:
            keep[1:] = np.any(c[1:] != c[:-1], axis=1)
        return LineString(c[keep])
    return geom


def _ring_self_intersects(ring: np.ndarray) -> bool:
    c = ring[:-1]
    n = len(c)
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            if _seg_intersect(c[i], c[(i + 1) % n], c[j], c[(j + 1) % n]):
                return True
    return False
