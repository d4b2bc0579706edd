"""Minimal geometry model: numpy coordinate arrays + type tags.

The unit of exchange across the engine is WKB ``binary`` columns; these
classes exist for driver-side planning, tests, and the scalar ``st_*``
function library. Coordinates are always 2D (x=lon, y=lat).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


class Geometry:
    geom_type: str = "Geometry"

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        """(xmin, ymin, xmax, ymax)."""
        raise NotImplementedError

    @property
    def is_empty(self) -> bool:
        raise NotImplementedError

    def __eq__(self, other):
        if not isinstance(other, Geometry):
            return NotImplemented
        from geomesa_ray.geometry.wkt import to_wkt

        return to_wkt(self) == to_wkt(other)

    def __hash__(self):
        from geomesa_ray.geometry.wkt import to_wkt

        return hash(to_wkt(self))

    def __repr__(self):
        from geomesa_ray.geometry.wkt import to_wkt

        return to_wkt(self)


def _coords(seq) -> np.ndarray:
    a = np.asarray(seq, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] != 2:
        a = a.reshape(-1, 2)
    return a


class Point(Geometry):
    geom_type = "Point"

    def __init__(self, x: float, y: float):
        self.x = float(x)
        self.y = float(y)

    @property
    def bounds(self):
        return (self.x, self.y, self.x, self.y)

    @property
    def is_empty(self):
        return np.isnan(self.x)

    @property
    def coords(self):
        return np.array([[self.x, self.y]])


class LineString(Geometry):
    geom_type = "LineString"

    def __init__(self, coords: Sequence):
        self.coords = _coords(coords)

    @property
    def bounds(self):
        c = self.coords
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    @property
    def is_empty(self):
        return len(self.coords) == 0

    @property
    def is_closed(self):
        return len(self.coords) > 0 and bool(np.all(self.coords[0] == self.coords[-1]))


class Polygon(Geometry):
    geom_type = "Polygon"

    def __init__(self, shell: Sequence, holes: Iterable[Sequence] = ()):
        self.shell = _coords(shell)
        # ensure closed rings
        if len(self.shell) and not np.all(self.shell[0] == self.shell[-1]):
            self.shell = np.vstack([self.shell, self.shell[:1]])
        self.holes = []
        for h in holes:
            h = _coords(h)
            if len(h) and not np.all(h[0] == h[-1]):
                h = np.vstack([h, h[:1]])
            self.holes.append(h)

    @property
    def rings(self):
        return [self.shell, *self.holes]

    @property
    def bounds(self):
        c = self.shell
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    @property
    def is_empty(self):
        return len(self.shell) == 0


class _Multi(Geometry):
    part_type: type = Geometry

    def __init__(self, parts: Iterable):
        self.parts = list(parts)

    @property
    def bounds(self):
        bs = np.array([p.bounds for p in self.parts])
        return (bs[:, 0].min(), bs[:, 1].min(), bs[:, 2].max(), bs[:, 3].max())

    @property
    def is_empty(self):
        return len(self.parts) == 0

    def __len__(self):
        return len(self.parts)


class MultiPoint(_Multi):
    geom_type = "MultiPoint"
    part_type = Point


class MultiLineString(_Multi):
    geom_type = "MultiLineString"
    part_type = LineString


class MultiPolygon(_Multi):
    geom_type = "MultiPolygon"
    part_type = Polygon


class GeometryCollection(_Multi):
    geom_type = "GeometryCollection"


def box(xmin: float, ymin: float, xmax: float, ymax: float) -> Polygon:
    """Axis-aligned rectangle polygon (ccw shell)."""
    return Polygon([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)])
