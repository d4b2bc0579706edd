"""From-scratch vectorized geometry (no GEOS/shapely in this environment).

Covers the subset of geometry the engine needs: WKT/WKB round-trips,
vectorized point-in-polygon with exact boundary semantics, DE-9IM-style
named relations (contains/intersects/within/...), a packed STR-tree plus a
vectorized grid bucket index for join probes, and spherical measures.
"""

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
from geomesa_ray.geometry.wkt import from_wkt, to_wkt
from geomesa_ray.geometry.wkb import from_wkb, to_wkb
from geomesa_ray.geometry.predicates import (
    contains,
    covers,
    crosses,
    disjoint,
    intersects,
    overlaps,
    points_in_polygon,
    points_on_boundary,
    touches,
    within,
)

__all__ = [
    "Geometry", "Point", "LineString", "Polygon",
    "MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection",
    "from_wkt", "to_wkt", "from_wkb", "to_wkb",
    "points_in_polygon", "points_on_boundary",
    "contains", "covers", "crosses", "disjoint", "intersects",
    "overlaps", "touches", "within",
]
