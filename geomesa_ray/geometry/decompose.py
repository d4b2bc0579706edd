"""Polygon decomposition into covering boxes for tighter scan bounds.

Reference analog: GeohashUtils.decomposeGeometry (geomesa-utils
.../geohash/GeohashUtils.scala) — a polygon query is covered by a bounded
set of geohash cells instead of its single (often mostly-empty) envelope,
so range planning prunes much tighter. Here the cells are quadtree
subdivisions of the envelope (the engine's planners take bboxes directly;
base-32 geohash alignment would only coarsen the cover), classified
exactly against the polygon:

* DISJOINT quads are dropped;
* CONTAINED quads become final cover boxes (no residual cost inside);
* OVERLAPPING quads refine until the box budget is reached, then land in
  the cover as-is (over-covering is always safe — the exact predicate
  remains the residual filter).
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.geometry.base import MultiPolygon, Polygon
from geomesa_ray.geometry.predicates import points_in_polygon
from geomesa_ray.stages.density import _clip_segment


def _corners_in(poly, xmin, ymin, xmax, ymax, include_boundary: bool) -> int:
    cx = np.array([xmin, xmax, xmax, xmin])
    cy = np.array([ymin, ymin, ymax, ymax])
    return int(
        points_in_polygon(cx, cy, poly, include_boundary=include_boundary).sum()
    )


def _any_edge_properly_enters(poly, rect) -> bool:
    """True if a polygon edge intersects the rect in a segment of positive
    length (corner/point touches don't count — a zero-area intersection
    contributes nothing to a covering box)."""
    for ring in poly.rings if isinstance(poly, Polygon) else []:
        for k in range(len(ring) - 1):
            c = _clip_segment(ring[k, 0], ring[k, 1], ring[k + 1, 0],
                              ring[k + 1, 1], rect)
            if c is not None and (c[0] != c[2] or c[1] != c[3]):
                return True
    return False


def _classify(poly, rect) -> str:
    """'disjoint' (zero-area intersection) | 'contained' (rect ⊆ poly) |
    'overlap'. Measure-zero boundary touches classify disjoint — any point
    on that shared edge also lies in an adjacent kept box (inclusive bbox
    pruning), so the cover stays complete."""
    xmin, ymin, xmax, ymax = rect
    pxmin, pymin, pxmax, pymax = poly.bounds
    if xmax < pxmin or xmin > pxmax or ymax < pymin or ymin > pymax:
        return "disjoint"
    edge = _any_edge_properly_enters(poly, rect)
    if not edge and _corners_in(poly, xmin, ymin, xmax, ymax, True) == 4:
        return "contained"
    strict_corners = _corners_in(poly, xmin, ymin, xmax, ymax, False)
    if strict_corners > 0 or edge:
        return "overlap"
    # polygon entirely inside the rect?
    vx, vy = poly.shell[0]
    if xmin <= vx <= xmax and ymin <= vy <= ymax:
        return "overlap"
    return "disjoint"


def decompose_geometry(geom, max_boxes: int = 32) -> list[tuple[float, float, float, float]]:
    """Covering boxes for a Polygon/MultiPolygon: quad-refined to at most
    ``max_boxes`` boxes whose union contains the geometry and is tighter
    than its envelope (GeohashUtils.decomposeGeometry semantics)."""
    if isinstance(geom, MultiPolygon):
        per = max(1, max_boxes // max(len(geom.parts), 1))
        out = []
        for p in geom.parts:
            out.extend(decompose_geometry(p, per))
        return out
    if not isinstance(geom, Polygon):
        return [geom.bounds]
    final: list[tuple[float, float, float, float]] = []
    frontier: list[tuple[float, float, float, float]] = [tuple(map(float, geom.bounds))]
    while frontier:
        # budget: every frontier box could still land in the cover
        if len(final) + len(frontier) * 4 > max_boxes:
            final.extend(frontier)
            break
        rect = frontier.pop(0)
        xmin, ymin, xmax, ymax = rect
        xc, yc = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
        for quad in (
            (xmin, ymin, xc, yc),
            (xc, ymin, xmax, yc),
            (xmin, yc, xc, ymax),
            (xc, yc, xmax, ymax),
        ):
            cls = _classify(geom, quad)
            if cls == "disjoint":
                continue
            if cls == "contained":
                final.append(quad)
            else:
                frontier.append(quad)
    return final or [tuple(map(float, geom.bounds))]
