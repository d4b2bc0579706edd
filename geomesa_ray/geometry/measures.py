"""Measures: planar + spherical/spheroidal distance, area, length, centroid.

Mirrors the reference's measure functions (SpatialRelationFunctions.scala:
st_area/st_length/st_centroid/st_distance/st_distanceSphere;
GeometricDistanceFunctions.scala: st_distanceSpheroid). Planar units are
degrees (like the reference — see the st_area test comment "units of deg^2");
spherical/spheroidal units are meters.
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

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_B = _A * (1.0 - _F)
MEAN_EARTH_RADIUS = 6371008.7714  # IUGG mean radius R1


def haversine_m(lon1, lat1, lon2, lat2, radius: float = MEAN_EARTH_RADIUS):
    """Vectorized great-circle distance in meters (spherical earth)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64)) for v in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * radius * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def vincenty_m(lon1: float, lat1: float, lon2: float, lat2: float, max_iter: int = 200) -> float:
    """Geodesic inverse distance on the WGS84 ellipsoid (Vincenty, meters)."""
    if lon1 == lon2 and lat1 == lat2:
        return 0.0
    L = np.radians(lon2 - lon1)
    u1 = np.arctan((1 - _F) * np.tan(np.radians(lat1)))
    u2 = np.arctan((1 - _F) * np.tan(np.radians(lat2)))
    sin_u1, cos_u1 = np.sin(u1), np.cos(u1)
    sin_u2, cos_u2 = np.sin(u2), np.cos(u2)
    lam = L
    for _ in range(max_iter):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt(
            (cos_u2 * sin_lam) ** 2 + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam) ** 2
        )
        if sin_sigma == 0:
            return 0.0
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        sin_alpha = cos_u1 * cos_u2 * sin_lam / sin_sigma
        cos_sq_alpha = 1 - sin_alpha**2
        cos_2sm = cos_sigma - 2 * sin_u1 * sin_u2 / cos_sq_alpha if cos_sq_alpha != 0 else 0.0
        C = _F / 16 * cos_sq_alpha * (4 + _F * (4 - 3 * cos_sq_alpha))
        lam_prev = lam
        lam = L + (1 - C) * _F * sin_alpha * (
            sigma + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1 + 2 * cos_2sm**2))
        )
        if abs(lam - lam_prev) < 1e-12:
            break
    u_sq = cos_sq_alpha * (_A**2 - _B**2) / _B**2
    A_ = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    B_ = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    delta_sigma = B_ * sin_sigma * (
        cos_2sm
        + B_ / 4 * (
            cos_sigma * (-1 + 2 * cos_2sm**2)
            - B_ / 6 * cos_2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos_2sm**2)
        )
    )
    return float(_B * A_ * (sigma - delta_sigma))


def _ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring (planar degrees^2)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(g: Geometry) -> float:
    """Planar area in squared degrees (st_area semantics)."""
    if isinstance(g, Polygon):
        a = abs(_ring_area(g.shell))
        for h in g.holes:
            a -= abs(_ring_area(h))
        return a
    if isinstance(g, MultiPolygon):
        return sum(area(p) for p in g.parts)
    return 0.0


def length(g: Geometry) -> float:
    """Planar length in degrees (st_length; 0 for points/polygons per JTS? —
    JTS length of polygon is its perimeter, but the reference's st_length
    delegates to JTS Geometry.getLength, so polygons return perimeter)."""
    if isinstance(g, LineString):
        d = np.diff(g.coords, axis=0)
        return float(np.sum(np.hypot(d[:, 0], d[:, 1])))
    if isinstance(g, Polygon):
        return sum(
            float(np.sum(np.hypot(*np.diff(r, axis=0).T))) for r in g.rings
        )
    if isinstance(g, (MultiLineString, MultiPolygon)):
        return sum(length(p) for p in g.parts)
    return 0.0


def centroid(g: Geometry) -> Point:
    """Area/length/point-weighted centroid (JTS Geometry.getCentroid analog)."""
    if isinstance(g, Point):
        return Point(g.x, g.y)
    if isinstance(g, MultiPoint):
        c = np.array([[p.x, p.y] for p in g.parts])
        return Point(c[:, 0].mean(), c[:, 1].mean())
    if isinstance(g, LineString):
        d = np.diff(g.coords, axis=0)
        seg_len = np.hypot(d[:, 0], d[:, 1])
        mids = (g.coords[:-1] + g.coords[1:]) / 2
        w = seg_len.sum()
        if w == 0:
            return Point(*g.coords[0])
        return Point(float((mids[:, 0] * seg_len).sum() / w), float((mids[:, 1] * seg_len).sum() / w))
    if isinstance(g, Polygon):
        cx = cy = a_sum = 0.0
        for sign, ring in [(1.0, g.shell)] + [(-1.0, h) for h in g.holes]:
            x, y = ring[:, 0], ring[:, 1]
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]
            a = 0.5 * float(np.sum(cross))
            if a == 0:
                continue
            cx += sign * abs(a) * float(np.sum((x[:-1] + x[1:]) * cross)) / (6.0 * a)
            cy += sign * abs(a) * float(np.sum((y[:-1] + y[1:]) * cross)) / (6.0 * a)
            a_sum += sign * abs(a)
        if a_sum == 0:
            return Point(*g.shell[0])
        return Point(cx / a_sum, cy / a_sum)
    if isinstance(g, (MultiLineString, MultiPolygon)):
        cs = [centroid(p) for p in g.parts]
        ws = [area(p) if isinstance(p, Polygon) else length(p) for p in g.parts]
        tw = sum(ws)
        if tw == 0:
            return cs[0]
        return Point(sum(c.x * w for c, w in zip(cs, ws)) / tw, sum(c.y * w for c, w in zip(cs, ws)) / tw)
    raise TypeError(f"unsupported geometry: {g.geom_type}")


def distance(a: Geometry, b: Geometry) -> float:
    """Planar (degrees) min distance between two geometries."""
    pa = _all_segments_or_points(a)
    pb = _all_segments_or_points(b)
    from geomesa_ray.geometry.predicates import intersects

    if intersects(a, b):
        return 0.0
    best = np.inf
    for ea in pa:
        for eb in pb:
            best = min(best, _elem_distance(ea, eb))
    return float(best)


def closest_point(a: Geometry, b: Geometry) -> Point:
    """Point on ``a`` closest to ``b`` (st_closestPoint)."""
    pb = _all_segments_or_points(b)
    best, best_pt = np.inf, None
    for ea in _all_segments_or_points(a):
        for eb in pb:
            d, pt = _elem_closest(ea, eb)
            if d < best:
                best, best_pt = d, pt
    return Point(*best_pt)


def _all_segments_or_points(g: Geometry):
    """Decompose into point tuples and segment pairs for distance math."""
    if isinstance(g, Point):
        return [("pt", (g.x, g.y))]
    if isinstance(g, LineString):
        c = g.coords
        return [("seg", ((c[i, 0], c[i, 1]), (c[i + 1, 0], c[i + 1, 1]))) for i in range(len(c) - 1)]
    if isinstance(g, Polygon):
        out = []
        for r in g.rings:
            for i in range(len(r) - 1):
                out.append(("seg", ((r[i, 0], r[i, 1]), (r[i + 1, 0], r[i + 1, 1]))))
        return out
    out = []
    for p in getattr(g, "parts", []):
        out.extend(_all_segments_or_points(p))
    return out


def _pt_seg_closest(p, a, b):
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    if dx == dy == 0:
        qx, qy = ax, ay
    else:
        t = ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)
        t = min(1.0, max(0.0, t))
        qx, qy = ax + t * dx, ay + t * dy
    return np.hypot(px - qx, py - qy), (qx, qy)


def _elem_distance(ea, eb) -> float:
    d, _ = _elem_closest(ea, eb)
    return d


def _elem_closest(ea, eb):
    """(distance, point-on-ea-closest-to-eb)."""
    ta, va = ea
    tb, vb = eb
    if ta == "pt" and tb == "pt":
        return np.hypot(va[0] - vb[0], va[1] - vb[1]), va
    if ta == "pt" and tb == "seg":
        d, _ = _pt_seg_closest(va, vb[0], vb[1])
        return d, va
    if ta == "seg" and tb == "pt":
        return _pt_seg_closest(vb, va[0], va[1])
    # seg/seg: min over endpoint-to-segment in both directions
    best, best_pt = np.inf, None
    for p in vb:
        d, q = _pt_seg_closest(p, va[0], va[1])
        if d < best:
            best, best_pt = d, q
    for p in va:
        d, _ = _pt_seg_closest(p, vb[0], vb[1])
        if d < best:
            best, best_pt = d, p
    return best, best_pt


def points_within_m(px, py, g: Geometry, radius_m: float) -> np.ndarray:
    """Vectorized geodesic DWithin: mask of points within ``radius_m``
    meters of geometry ``g`` (CQL DWITHIN / ProximitySearchProcess
    semantics). Point elements use exact haversine; segments use a local
    equirectangular frame anchored at the segment start (lon wrapped to
    ±180°, scaled by cos(lat)) — relative error ≲1e-3 for segment spans
    under a few degrees. Points inside a polygonal ``g`` are within at
    any radius."""
    from geomesa_ray.geometry.predicates import points_in_polygon

    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    mask = np.zeros(len(px), dtype=bool)
    if getattr(g, "geom_type", "") in ("Polygon", "MultiPolygon"):
        mask |= points_in_polygon(px, py, g, include_boundary=True)
    m_per_deg = MEAN_EARTH_RADIUS * np.pi / 180.0
    for kind, data in _all_segments_or_points(g):
        todo = ~mask
        if not todo.any():
            break
        if kind == "pt":
            x, y = data
            d = haversine_m(px[todo], py[todo], x, y)
        else:
            (x1, y1), (x2, y2) = data
            scale = np.cos(np.radians((y1 + y2) / 2.0))
            ax = (((x2 - x1) + 180.0) % 360.0 - 180.0) * scale * m_per_deg
            ay = (y2 - y1) * m_per_deg
            bx = (((px[todo] - x1) + 180.0) % 360.0 - 180.0) * scale * m_per_deg
            by = (py[todo] - y1) * m_per_deg
            seg2 = ax * ax + ay * ay
            t = np.clip((bx * ax + by * ay) / seg2, 0.0, 1.0) if seg2 > 0 \
                else np.zeros(int(todo.sum()))
            d = np.hypot(bx - t * ax, by - t * ay)
        sub = mask[todo]
        sub |= d <= radius_m
        mask[todo] = sub
    return mask
