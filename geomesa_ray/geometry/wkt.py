"""WKT parsing/formatting for the closed geometry type universe.

Supports POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING,
MULTIPOLYGON, GEOMETRYCOLLECTION and EMPTY variants — the same set the
reference's schemas allow (SimpleFeatureSpec.scala:252-304 analog).
"""

from __future__ import annotations

import re

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

_TYPE_RE = re.compile(r"\s*([A-Za-z]+)\s*(.*)\s*$", re.S)


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(coords) -> str:
    return ", ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in np.asarray(coords))


def to_wkt(g: Geometry) -> str:
    t = g.geom_type
    if g.is_empty:
        return f"{t.upper()} EMPTY"
    if isinstance(g, Point):
        return f"POINT ({_fmt_num(g.x)} {_fmt_num(g.y)})"
    if isinstance(g, LineString):
        return f"LINESTRING ({_fmt_coords(g.coords)})"
    if isinstance(g, Polygon):
        rings = ", ".join(f"({_fmt_coords(r)})" for r in g.rings)
        return f"POLYGON ({rings})"
    if isinstance(g, MultiPoint):
        pts = ", ".join(f"({_fmt_num(p.x)} {_fmt_num(p.y)})" for p in g.parts)
        return f"MULTIPOINT ({pts})"
    if isinstance(g, MultiLineString):
        ls = ", ".join(f"({_fmt_coords(p.coords)})" for p in g.parts)
        return f"MULTILINESTRING ({ls})"
    if isinstance(g, MultiPolygon):
        ps = ", ".join(
            "(" + ", ".join(f"({_fmt_coords(r)})" for r in p.rings) + ")" for p in g.parts
        )
        return f"MULTIPOLYGON ({ps})"
    if isinstance(g, GeometryCollection):
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(p) for p in g.parts) + ")"
    raise TypeError(f"unsupported geometry: {t}")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def expect(self, ch: str):
        self.skip_ws()
        if self.pos >= len(self.text) or self.text[self.pos] != ch:
            raise ValueError(f"expected {ch!r} at {self.pos} in {self.text!r}")
        self.pos += 1

    def peek(self) -> str:
        self.skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def word(self) -> str:
        self.skip_ws()
        m = re.match(r"[A-Za-z]+", self.text[self.pos:])
        if not m:
            raise ValueError(f"expected word at {self.pos} in {self.text!r}")
        self.pos += m.end()
        return m.group(0).upper()

    def number(self) -> float:
        self.skip_ws()
        m = re.match(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", self.text[self.pos:])
        if not m:
            raise ValueError(f"expected number at {self.pos} in {self.text!r}")
        self.pos += m.end()
        return float(m.group(0))

    def coord_seq(self):
        self.expect("(")
        coords = []
        while True:
            x = self.number()
            y = self.number()
            coords.append((x, y))
            if self.peek() == ",":
                self.pos += 1
            else:
                break
        self.expect(")")
        return coords

    def ring_seq(self):
        self.expect("(")
        rings = [self.coord_seq()]
        while self.peek() == ",":
            self.pos += 1
            rings.append(self.coord_seq())
        self.expect(")")
        return rings

    def maybe_empty(self) -> bool:
        save = self.pos
        try:
            if self.word() == "EMPTY":
                return True
        except ValueError:
            pass
        self.pos = save
        return False

    def geometry(self) -> Geometry:
        t = self.word()
        if t == "POINT":
            if self.maybe_empty():
                return Point(float("nan"), float("nan"))
            c = self.coord_seq()
            return Point(*c[0])
        if t == "LINESTRING":
            if self.maybe_empty():
                return LineString(np.empty((0, 2)))
            return LineString(self.coord_seq())
        if t == "POLYGON":
            if self.maybe_empty():
                return Polygon(np.empty((0, 2)))
            rings = self.ring_seq()
            return Polygon(rings[0], rings[1:])
        if t == "MULTIPOINT":
            if self.maybe_empty():
                return MultiPoint([])
            # both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4)
            self.expect("(")
            pts = []
            while True:
                if self.peek() == "(":
                    c = self.coord_seq()
                    pts.append(Point(*c[0]))
                else:
                    pts.append(Point(self.number(), self.number()))
                if self.peek() == ",":
                    self.pos += 1
                else:
                    break
            self.expect(")")
            return MultiPoint(pts)
        if t == "MULTILINESTRING":
            if self.maybe_empty():
                return MultiLineString([])
            return MultiLineString([LineString(c) for c in self.ring_seq()])
        if t == "MULTIPOLYGON":
            if self.maybe_empty():
                return MultiPolygon([])
            self.expect("(")
            polys = []
            while True:
                rings = self.ring_seq()
                polys.append(Polygon(rings[0], rings[1:]))
                if self.peek() == ",":
                    self.pos += 1
                else:
                    break
            self.expect(")")
            return MultiPolygon(polys)
        if t == "GEOMETRYCOLLECTION":
            if self.maybe_empty():
                return GeometryCollection([])
            self.expect("(")
            parts = [self.geometry()]
            while self.peek() == ",":
                self.pos += 1
                parts.append(self.geometry())
            self.expect(")")
            return GeometryCollection(parts)
        raise ValueError(f"unsupported WKT type: {t}")


def from_wkt(text: str) -> Geometry:
    p = _Parser(text)
    g = p.geometry()
    p.skip_ws()
    if p.pos != len(p.text):
        raise ValueError(f"trailing content in WKT: {text[p.pos:]!r}")
    return g
