"""Vectorized ``st_*`` scalar function library (Spark-SQL-dialect analog).

Mirrors the reference's UDF surface (geomesa-spark/geomesa-spark-jts/.../udf/
GeometricConstructorFunctions.scala:26-51, GeometricAccessorFunctions.scala:
18-77, GeometricCastFunctions.scala, GeometricOutputFunctions.scala:28-32,
SpatialRelationFunctions.scala:24-59, GeometricProcessingFunctions.scala:38-64)
re-expressed as column functions over Arrow arrays: every function takes and
returns pyarrow arrays / Python lists of geometries and is meant to be used
inside ``map_batches``.

Geometry columns are WKB ``binary`` arrays (the engine's at-rest geometry
encoding, SimpleFeatureParquetSchema.scala:181-217 analog); `*_geoms`
variants work on already-parsed geometry lists to avoid re-parsing across
chained calls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomesa_ray.geometry import measures, predicates
from geomesa_ray.geometry.base import (
    Geometry,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    box,
)
from geomesa_ray.geometry.wkb import from_wkb, to_wkb
from geomesa_ray.geometry.wkt import from_wkt, to_wkt

# ---------------------------------------------------------------------------
# column parse/serialize helpers
# ---------------------------------------------------------------------------


def geoms_from_wkb(col) -> list[Geometry | None]:
    return [from_wkb(b) if b is not None else None for b in _pylist(col)]


def geoms_to_wkb(geoms) -> pa.Array:
    return pa.array(
        [to_wkb(g) if g is not None else None for g in geoms], pa.binary()
    )


def _pylist(col):
    return col.to_pylist() if isinstance(col, (pa.Array, pa.ChunkedArray)) else list(col)


# ---------------------------------------------------------------------------
# constructors (GeometricConstructorFunctions.scala:26-51)
# ---------------------------------------------------------------------------


def st_geom_from_wkt(col) -> pa.Array:
    return geoms_to_wkb([from_wkt(s) if s is not None else None for s in _pylist(col)])


def st_geom_from_wkb(col) -> pa.Array:  # identity + validation
    return geoms_to_wkb(geoms_from_wkb(col))


def st_make_point(x_col, y_col) -> pa.Array:
    xs = np.asarray(_np(x_col), dtype=np.float64)
    ys = np.asarray(_np(y_col), dtype=np.float64)
    return geoms_to_wkb([Point(float(x), float(y)) for x, y in zip(xs, ys)])


def st_make_bbox(xmin, ymin, xmax, ymax) -> bytes:
    return to_wkb(box(xmin, ymin, xmax, ymax))


def st_make_line(points_col) -> pa.Array:
    out = []
    for pts in _pylist(points_col):
        coords = [(p["x"], p["y"]) if isinstance(p, dict) else tuple(p) for p in pts]
        out.append(LineString(coords))
    return geoms_to_wkb(out)


def st_point(x, y) -> bytes:
    return to_wkb(Point(x, y))


def _np(col):
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        return col.to_numpy(zero_copy_only=False)
    return np.asarray(col)


# ---------------------------------------------------------------------------
# accessors (GeometricAccessorFunctions.scala:18-77)
# ---------------------------------------------------------------------------


def st_geometry_type(col) -> pa.Array:
    return pa.array(
        [type(g).__name__ if g is not None else None for g in geoms_from_wkb(col)],
        pa.string(),
    )


def st_envelope(col) -> pa.Array:
    out = []
    for g in geoms_from_wkb(col):
        if g is None:
            out.append(None)
        else:
            out.append(box(*g.bounds))
    return geoms_to_wkb(out)


def st_is_empty(col) -> pa.Array:
    return pa.array(
        [g.is_empty if g is not None else None for g in geoms_from_wkb(col)], pa.bool_()
    )


def st_num_points(col) -> pa.Array:
    def npts(g):
        if isinstance(g, Point):
            return 1
        if isinstance(g, LineString):
            return len(g.coords)
        if isinstance(g, Polygon):
            return sum(len(r) for r in g.rings)
        if isinstance(g, (MultiPoint, MultiLineString, MultiPolygon)):
            return sum(npts(p) for p in g.parts)
        return 0

    return pa.array(
        [npts(g) if g is not None else None for g in geoms_from_wkb(col)], pa.int32()
    )


def st_x(col) -> pa.Array:
    return pa.array(
        [g.x if isinstance(g, Point) else None for g in geoms_from_wkb(col)],
        pa.float64(),
    )


def st_y(col) -> pa.Array:
    return pa.array(
        [g.y if isinstance(g, Point) else None for g in geoms_from_wkb(col)],
        pa.float64(),
    )


def st_is_valid(col) -> pa.Array:
    """Light validity: non-empty rings closed with ≥4 points."""

    def valid(g):
        if g is None:
            return None
        if isinstance(g, Polygon):
            return all(
                len(r) >= 4 and (r[0] == r[-1]).all() for r in g.rings
            )
        if isinstance(g, MultiPolygon):
            return all(valid(p) for p in g.parts)
        return True

    return pa.array([valid(g) for g in geoms_from_wkb(col)], pa.bool_())


# ---------------------------------------------------------------------------
# outputs (GeometricOutputFunctions.scala:28-32)
# ---------------------------------------------------------------------------


def st_as_text(col) -> pa.Array:
    return pa.array(
        [to_wkt(g) if g is not None else None for g in geoms_from_wkb(col)], pa.string()
    )


def st_as_binary(col) -> pa.Array:
    return geoms_to_wkb(geoms_from_wkb(col))


def st_as_geojson(col) -> pa.Array:
    import json

    def gj(g):
        if g is None:
            return None
        if isinstance(g, Point):
            return json.dumps({"type": "Point", "coordinates": [g.x, g.y]})
        if isinstance(g, LineString):
            return json.dumps(
                {"type": "LineString", "coordinates": g.coords.tolist()}
            )
        if isinstance(g, Polygon):
            return json.dumps(
                {"type": "Polygon", "coordinates": [r.tolist() for r in g.rings]}
            )
        raise NotImplementedError(type(g).__name__)

    return pa.array([gj(g) for g in geoms_from_wkb(col)], pa.string())


_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: float, lat: float, precision: int = 12) -> str:
    """Standard geohash base-32 encoding (st_geoHash analog)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_BASE32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def geohash_cell(gh: str) -> tuple[float, float, float, float]:
    """Geohash → (lon_lo, lat_lo, lon_hi, lat_hi) cell bounds."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        cd = _BASE32.index(c)
        for b in range(4, -1, -1):
            bit = (cd >> b) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lon_lo, lat_lo, lon_hi, lat_hi)


def geohash_decode(gh: str) -> tuple[float, float]:
    """Geohash → (lon, lat) cell-center."""
    lon_lo, lat_lo, lon_hi, lat_hi = geohash_cell(gh)
    return ((lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2)


def st_geohash(lon_col, lat_col, precision: int = 12) -> pa.Array:
    xs, ys = _np(lon_col), _np(lat_col)
    return pa.array(
        [geohash_encode(float(x), float(y), precision) for x, y in zip(xs, ys)],
        pa.string(),
    )


def st_geom_from_geohash(col, precision: int | None = None) -> pa.Array:
    """Geohash → the cell's BOUNDING-BOX polygon (reference
    st_geomFromGeoHash semantics, GeometricConstructorFunctions — a
    zero-area center point would fail every containment test).
    ``precision`` (chars) truncates the hash before decoding; None uses
    the full hash."""
    from geomesa_ray.geometry.base import box as _box

    out = []
    for gh in _pylist(col):
        if gh is None:
            out.append(None)
            continue
        if precision is not None:
            gh = gh[:precision]
        lon_lo, lat_lo, lon_hi, lat_hi = geohash_cell(gh)
        out.append(_box(lon_lo, lat_lo, lon_hi, lat_hi))
    return geoms_to_wkb(out)


# ---------------------------------------------------------------------------
# relations + measures (SpatialRelationFunctions.scala:24-59)
# ---------------------------------------------------------------------------

_RELATIONS = {
    "st_contains": predicates.contains,
    "st_covers": predicates.covers,
    "st_crosses": predicates.crosses,
    "st_disjoint": predicates.disjoint,
    "st_equals": predicates.equals,
    "st_intersects": predicates.intersects,
    "st_overlaps": predicates.overlaps,
    "st_touches": predicates.touches,
    "st_within": predicates.within,
}


def st_relation(name: str, a_col, b: Geometry | bytes) -> pa.Array:
    """Vector-vs-scalar relation: column of WKB vs one geometry."""
    fn = _RELATIONS[name]
    if isinstance(b, (bytes, bytearray)):
        b = from_wkb(bytes(b))
    return pa.array(
        [fn(g, b) if g is not None else None for g in geoms_from_wkb(a_col)],
        pa.bool_(),
    )


def st_contains(a_col, b):
    return st_relation("st_contains", a_col, b)


def st_intersects(a_col, b):
    return st_relation("st_intersects", a_col, b)


def st_within(a_col, b):
    return st_relation("st_within", a_col, b)


def st_relate_matrix(a_col, b: Geometry | bytes) -> pa.Array:
    """st_relate: DE-9IM matrix string per row vs a fixed geometry."""
    from geomesa_ray.geometry.relate import relate as _relate

    if isinstance(b, (bytes, bytearray)):
        b = from_wkb(bytes(b))
    return pa.array(
        [_relate(g, b) if g is not None else None for g in geoms_from_wkb(a_col)],
        pa.string(),
    )


def st_relate_bool(a_col, b: Geometry | bytes, pattern: str) -> pa.Array:
    from geomesa_ray.geometry.relate import relate_bool as _rb

    if isinstance(b, (bytes, bytearray)):
        b = from_wkb(bytes(b))
    return pa.array(
        [_rb(g, b, pattern) if g is not None else None for g in geoms_from_wkb(a_col)],
        pa.bool_(),
    )


def st_transform(col, src: str, dst: str) -> pa.Array:
    """Reproject geometries between CRSes (st_transform analog,
    GeometricDistanceFunctions.scala:21-41): EPSG:4326 / 3857 / all UTM
    zones, composed through 4326 (geometry/reproject.py)."""
    from geomesa_ray.geometry.base import (
        GeometryCollection,
        LineString,
        MultiLineString,
        MultiPoint,
        MultiPolygon,
        Point,
        Polygon,
    )
    from geomesa_ray.geometry.reproject import transform_fn

    fn = transform_fn(src, dst)

    def tr(g):
        if isinstance(g, Point):
            x, y = fn(np.array([g.x]), np.array([g.y]))
            return Point(float(x[0]), float(y[0]))
        if isinstance(g, LineString):
            x, y = fn(g.coords[:, 0], g.coords[:, 1])
            return LineString(np.column_stack([x, y]))
        if isinstance(g, Polygon):
            sx, sy = fn(g.shell[:, 0], g.shell[:, 1])
            holes = []
            for h in g.holes:
                hx, hy = fn(h[:, 0], h[:, 1])
                holes.append(np.column_stack([hx, hy]))
            return Polygon(np.column_stack([sx, sy]), holes=holes)
        if isinstance(g, (MultiPoint, MultiLineString, MultiPolygon, GeometryCollection)):
            return type(g)([tr(p) for p in g.parts])
        raise TypeError(type(g).__name__)

    out = []
    for g in geoms_from_wkb(col):
        out.append(to_wkb(tr(g)) if g is not None else None)
    return pa.array(out, pa.binary())


def _parse_rect_wkbs(col) -> "np.ndarray | None":
    """(n, 4) bounds array when EVERY blob is a 93-byte axis-rect Polygon
    WKB (the layout rect_wkbs/to_wkb emit); None otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        return None
    blobs = col.to_pylist()
    if not blobs or any(b is None or len(b) != 93 for b in blobs):
        return None
    data = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(-1, 93)
    # header: LE byte order, type=3 (polygon), 1 ring, 5 points
    hdr = np.array([1, 3, 0, 0, 0, 1, 0, 0, 0, 5, 0, 0, 0], dtype=np.uint8)
    if not (data[:, :13] == hdr).all():
        return None
    pts = data[:, 13:].copy().view("<f8").reshape(-1, 5, 2)
    xs, ys = pts[:, :, 0], pts[:, :, 1]
    xmin, xmax = xs.min(axis=1), xs.max(axis=1)
    ymin, ymax = ys.min(axis=1), ys.max(axis=1)
    # axis-aligned check: every vertex sits on a bound in both axes
    on_x = (xs == xmin[:, None]) | (xs == xmax[:, None])
    on_y = (ys == ymin[:, None]) | (ys == ymax[:, None])
    if not (on_x.all() and on_y.all()):
        return None
    return np.column_stack([xmin, ymin, xmax, ymax])


def _overlay_binary(a_col, b, op) -> pa.Array:
    """Shared wrapper for the overlay ops: geometry column × (column or
    single WKB/Geometry) → WKB column (null for empty results).

    Fast path: when the whole column and the clip are axis rectangles, the
    intersection is vectorized interval arithmetic over the raw WKB
    buffers — no per-row geometry objects."""
    from geomesa_ray.geometry.overlay import polygon_difference, polygon_intersection

    fn = polygon_intersection if op == "intersection" else polygon_difference
    if op == "intersection" and isinstance(b, (bytes, bytearray)) and len(b) == 93:
        bounds = _parse_rect_wkbs(a_col)
        clip = _parse_rect_wkbs(pa.array([bytes(b)], pa.binary()))
        if bounds is not None and clip is not None:
            from geomesa_ray.geometry.wkb import rect_wkbs

            cx0, cy0, cx1, cy1 = clip[0]
            x0 = np.maximum(bounds[:, 0], cx0)
            y0 = np.maximum(bounds[:, 1], cy0)
            x1 = np.minimum(bounds[:, 2], cx1)
            y1 = np.minimum(bounds[:, 3], cy1)
            ok = (x1 > x0) & (y1 > y0)
            out = rect_wkbs(x0, y0, x1, y1)
            if ok.all():
                return out
            return pa.array(
                [out[k].as_py() if ok[k] else None for k in range(len(ok))],
                pa.binary(),
            )
    geoms_a = geoms_from_wkb(a_col)
    if isinstance(b, (bytes, bytearray)):
        geoms_b = [from_wkb(bytes(b))] * len(geoms_a)
    elif isinstance(b, Geometry):
        geoms_b = [b] * len(geoms_a)
    else:
        geoms_b = geoms_from_wkb(b)
    out = []
    for g, h in zip(geoms_a, geoms_b):
        if g is None or h is None:
            out.append(None)
            continue
        r = fn(g, h)
        out.append(to_wkb(r) if r is not None else None)
    return pa.array(out, pa.binary())


def st_intersection(a_col, b) -> pa.Array:
    """Polygon overlay intersection (SpatialRelationFunctions.scala:57
    analog; see geometry/overlay.py for the clipping algorithms)."""
    return _overlay_binary(a_col, b, "intersection")


def st_difference(a_col, b) -> pa.Array:
    """Polygon overlay difference (SpatialRelationFunctions.scala:83)."""
    return _overlay_binary(a_col, b, "difference")


def st_make_valid(col) -> pa.Array:
    """Deterministic validity repair (GeometricProcessingFunctions.scala:72
    analog; see overlay.make_valid for scope)."""
    from geomesa_ray.geometry.overlay import make_valid

    out = []
    for g in geoms_from_wkb(col):
        out.append(to_wkb(make_valid(g)) if g is not None else None)
    return pa.array(out, pa.binary())


def st_area(col) -> pa.Array:
    return pa.array(
        [measures.area(g) if g is not None else None for g in geoms_from_wkb(col)],
        pa.float64(),
    )


def st_length(col) -> pa.Array:
    return pa.array(
        [measures.length(g) if g is not None else None for g in geoms_from_wkb(col)],
        pa.float64(),
    )


def st_centroid(col) -> pa.Array:
    return geoms_to_wkb(
        [measures.centroid(g) if g is not None else None for g in geoms_from_wkb(col)]
    )


def st_distance(a_col, b: Geometry | bytes) -> pa.Array:
    if isinstance(b, (bytes, bytearray)):
        b = from_wkb(bytes(b))
    return pa.array(
        [
            measures.distance(g, b) if g is not None else None
            for g in geoms_from_wkb(a_col)
        ],
        pa.float64(),
    )


def st_distance_sphere(lon1, lat1, lon2, lat2) -> pa.Array:
    return pa.array(
        measures.haversine_m(_np(lon1), _np(lat1), _np(lon2), _np(lat2)), pa.float64()
    )


def st_distance_spheroid(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    return measures.vincenty_m(lon1, lat1, lon2, lat2)


def st_length_sphere(col) -> pa.Array:
    """Geodesic (haversine) length in meters of LineString columns
    (st_lengthSphere)."""
    out = []
    for g in geoms_from_wkb(col):
        if g is None:
            out.append(None)
        elif isinstance(g, LineString):
            c = g.coords
            out.append(
                float(
                    np.sum(
                        measures.haversine_m(c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1])
                    )
                )
            )
        else:
            out.append(0.0)
    return pa.array(out, pa.float64())


def st_aggregate_distance_sphere(lons, lats) -> float:
    """Total geodesic path length over an ordered point sequence
    (st_aggregateDistanceSphere)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if len(lons) < 2:
        return 0.0
    return float(
        np.sum(measures.haversine_m(lons[:-1], lats[:-1], lons[1:], lats[1:]))
    )


def st_buffer_point(lon: float, lat: float, radius_m: float, segments: int = 32) -> bytes:
    """Geodesic point buffer (st_bufferPoint analog,
    GeometricProcessingFunctions.scala): polygon whose ``segments`` vertices
    each lie at spherical great-circle distance ``radius_m`` from the center
    (direct geodesic destination per bearing — exact on the sphere at any
    latitude, unlike a planar cos(lat) ellipse)."""
    from geomesa_ray.geometry.measures import MEAN_EARTH_RADIUS

    lat1 = np.radians(lat)
    lon1 = np.radians(lon)
    delta = radius_m / MEAN_EARTH_RADIUS  # angular distance
    theta = np.linspace(0, 2 * np.pi, segments, endpoint=False)  # bearings
    sin_lat2 = np.sin(lat1) * np.cos(delta) + np.cos(lat1) * np.sin(delta) * np.cos(theta)
    lat2 = np.arcsin(np.clip(sin_lat2, -1.0, 1.0))
    lon2 = lon1 + np.arctan2(
        np.sin(theta) * np.sin(delta) * np.cos(lat1),
        np.cos(delta) - np.sin(lat1) * sin_lat2,
    )
    lon2 = (lon2 + np.pi) % (2 * np.pi) - np.pi
    coords = list(zip(np.degrees(lon2), np.degrees(lat2)))
    coords.append(coords[0])
    return to_wkb(Polygon(coords))


def st_translate(col, dx: float, dy: float) -> pa.Array:
    def tr(g):
        if isinstance(g, Point):
            return Point(g.x + dx, g.y + dy)
        if isinstance(g, LineString):
            return LineString(g.coords + np.array([dx, dy]))
        if isinstance(g, Polygon):
            return Polygon(
                g.shell + np.array([dx, dy]), [h + np.array([dx, dy]) for h in g.holes]
            )
        raise NotImplementedError(type(g).__name__)

    return geoms_to_wkb(
        [tr(g) if g is not None else None for g in geoms_from_wkb(col)]
    )


def st_antimeridian_safe_geom(g: Geometry) -> list[Geometry]:
    """Split a bbox-like polygon whose lons exceed ±180 into valid pieces
    (GeometricProcessingFunctions.scala:38-64 analog, bbox subset)."""
    xmin, ymin, xmax, ymax = g.bounds
    if xmin >= -180.0 and xmax <= 180.0:
        return [g]
    parts = []
    if xmin < -180.0:
        parts.append(box(xmin + 360.0, ymin, 180.0, ymax))
        parts.append(box(-180.0, ymin, xmax, ymax))
    elif xmax > 180.0:
        parts.append(box(xmin, ymin, 180.0, ymax))
        parts.append(box(-180.0, ymin, xmax - 360.0, ymax))
    return parts


def convex_hull(geoms) -> Polygon:
    """UDAF ConvexHull analog: hull of all vertices (Andrew monotone chain)."""
    pts = []
    for g in geoms:
        if g is None:
            continue
        if isinstance(g, Point):
            pts.append((g.x, g.y))
        elif isinstance(g, LineString):
            pts.extend(map(tuple, g.coords))
        elif isinstance(g, Polygon):
            for r in g.rings:
                pts.extend(map(tuple, r))
        else:
            for p in getattr(g, "parts", []):
                h = convex_hull([p])
                pts.extend(map(tuple, h.shell))
    pts = sorted(set(pts))
    if len(pts) <= 2:
        raise ValueError("need ≥3 distinct points for a hull")

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower, upper = [], []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    ring = lower[:-1] + upper[:-1]
    ring.append(ring[0])
    return Polygon(ring)
