"""Geometry layer: WKT/WKB round trips + the reference's DE-9IM fixture matrix.

Expected booleans come from
geomesa-spark/.../SparkSQLSpatialRelationshipsTest.scala:50-340 (reference box
POLYGON((0 0, 0 10, 10 10, 10 0, 0 0)), line LINESTRING(0 10, 0 -10), fixture
points/lines/boxes with pinned results per relation).
"""

import numpy as np
import pytest

from geomesa_ray.geometry import (
    contains,
    covers,
    crosses,
    disjoint,
    from_wkb,
    from_wkt,
    intersects,
    overlaps,
    points_in_polygon,
    points_on_boundary,
    to_wkb,
    to_wkt,
    touches,
    within,
)
from geomesa_ray.geometry.predicates import equals

BOX_REF = "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"
LINE_REF = "LINESTRING(0 10, 0 -10)"

POINTS = {
    "int": "POINT(5 5)",
    "edge": "POINT(0 5)",
    "corner": "POINT(0 0)",
    "ext": "POINT(-5 0)",
}
LINES = {
    "touches": "LINESTRING(0 0, 1 0)",
    "crosses": "LINESTRING(-1 0, 1 0)",
    "disjoint": "LINESTRING(1 0, 2 0)",
}
BOXES = {
    "int": "POLYGON(( 1  1,  1  2,  2  2,  2  1,  1  1))",
    "intEdge": "POLYGON(( 0  1,  0  2,  1  2,  1  1,  0  1))",
    "overlap": "POLYGON((-1  1, -1  2,  1  2,  1  1, -1  1))",
    "extEdge": "POLYGON((-1  1, -1  2,  0  2,  0  1, -1  1))",
    "ext": "POLYGON((-2  1, -2  2, -1  2, -1  1, -2  1))",
    "corner": "POLYGON((-1 -1, -1  0,  0  0,  0 -1, -1 -1))",
}


class TestWkt:
    @pytest.mark.parametrize(
        "wkt",
        [
            "POINT (1 2)",
            "POINT (1.5 -2.25)",
            "LINESTRING (0 10, 0 -10)",
            "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))",
            "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
            "MULTIPOINT ((1 2), (3 4))",
            "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
        ],
    )
    def test_round_trip(self, wkt):
        g = from_wkt(wkt)
        assert to_wkt(g) == wkt
        # and through WKB
        g2 = from_wkb(to_wkb(g))
        assert to_wkt(g2) == wkt

    def test_empty(self):
        assert from_wkt("POINT EMPTY").is_empty
        assert from_wkt("POLYGON EMPTY").is_empty

    def test_bare_multipoint(self):
        g = from_wkt("MULTIPOINT (1 2, 3 4)")
        assert len(g.parts) == 2


class TestPointInPolygon:
    def test_boundary_semantics(self):
        box = from_wkt(BOX_REF)
        px = np.array([5.0, 0.0, 0.0, -5.0])
        py = np.array([5.0, 5.0, 0.0, 0.0])
        cov = points_in_polygon(px, py, box, include_boundary=True)
        cnt = points_in_polygon(px, py, box, include_boundary=False)
        np.testing.assert_array_equal(cov, [True, True, True, False])
        np.testing.assert_array_equal(cnt, [True, False, False, False])
        on = points_on_boundary(px, py, box)
        np.testing.assert_array_equal(on, [False, True, True, False])

    def test_holes(self):
        poly = from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
        px = np.array([3.0, 1.0, 3.0])
        py = np.array([3.0, 1.0, 2.0])  # in hole, in poly, on hole boundary
        res = points_in_polygon(px, py, poly)
        np.testing.assert_array_equal(res, [False, True, True])

    def test_large_vectorized(self):
        box = from_wkt(BOX_REF)
        rng = np.random.default_rng(5)
        px = rng.uniform(-20, 20, 50000)
        py = rng.uniform(-20, 20, 50000)
        res = points_in_polygon(px, py, box)
        expected = (px >= 0) & (px <= 10) & (py >= 0) & (py <= 10)
        np.testing.assert_array_equal(res, expected)

    def test_concave(self):
        # C-shape: point in the notch is outside
        poly = from_wkt("POLYGON ((0 0, 10 0, 10 2, 4 2, 4 8, 10 8, 10 10, 0 10, 0 0))")
        px = np.array([7.0, 2.0, 7.0])
        py = np.array([5.0, 5.0, 1.0])
        np.testing.assert_array_equal(points_in_polygon(px, py, poly), [False, True, True])


def _pinned(relation, fixtures, expectations):
    ref = from_wkt(BOX_REF)
    for name, exp in expectations.items():
        got = relation(ref, from_wkt(fixtures[name]))
        assert got == exp, f"{relation.__name__}(boxRef, {name}) = {got}, want {exp}"


class TestRelationMatrix:
    def test_contains_points(self):
        _pinned(contains, POINTS, {"int": True, "edge": False, "corner": False, "ext": False})

    def test_contains_boxes(self):
        _pinned(
            contains,
            BOXES,
            {"int": True, "intEdge": True, "overlap": False, "extEdge": False, "ext": False, "corner": False},
        )

    def test_covers_points(self):
        _pinned(covers, POINTS, {"int": True, "edge": True, "corner": True, "ext": False})

    def test_covers_boxes(self):
        _pinned(
            covers,
            BOXES,
            {"int": True, "intEdge": True, "overlap": False, "extEdge": False, "ext": False, "corner": False},
        )

    def test_crosses_lines(self):
        ref = from_wkt(LINE_REF)
        assert crosses(ref, from_wkt(LINES["touches"])) is False
        assert crosses(ref, from_wkt(LINES["crosses"])) is True
        assert crosses(ref, from_wkt(LINES["disjoint"])) is False

    def test_disjoint_points(self):
        _pinned(disjoint, POINTS, {"int": False, "edge": False, "corner": False, "ext": True})

    def test_disjoint_boxes(self):
        _pinned(
            disjoint,
            BOXES,
            {"int": False, "intEdge": False, "overlap": False, "extEdge": False, "ext": True, "corner": False},
        )

    def test_intersects_points(self):
        _pinned(intersects, POINTS, {"int": True, "edge": True, "corner": True, "ext": False})

    def test_intersects_boxes(self):
        _pinned(
            intersects,
            BOXES,
            {"int": True, "intEdge": True, "overlap": True, "extEdge": True, "ext": False, "corner": True},
        )

    def test_overlaps_points(self):
        _pinned(overlaps, POINTS, {"int": False, "edge": False, "corner": False, "ext": False})

    def test_overlaps_boxes(self):
        _pinned(
            overlaps,
            BOXES,
            {"int": False, "intEdge": False, "overlap": True, "extEdge": False, "ext": False, "corner": False},
        )

    def test_touches_points(self):
        _pinned(touches, POINTS, {"int": False, "edge": True, "corner": True, "ext": False})

    def test_touches_boxes(self):
        _pinned(
            touches,
            BOXES,
            {"int": False, "intEdge": False, "overlap": False, "extEdge": True, "ext": False, "corner": True},
        )

    def test_within(self):
        ref = from_wkt(BOX_REF)
        exp_pts = {"int": True, "edge": False, "corner": False, "ext": False}
        for name, exp in exp_pts.items():
            assert within(from_wkt(POINTS[name]), ref) == exp
        exp_boxes = {"int": True, "intEdge": True, "overlap": False, "extEdge": False, "ext": False, "corner": False}
        for name, exp in exp_boxes.items():
            assert within(from_wkt(BOXES[name]), ref) == exp

    def test_equals(self):
        assert equals(from_wkt("POINT(0 0)"), from_wkt(POINTS["corner"]))
        assert not equals(from_wkt("POINT(0 0)"), from_wkt(POINTS["edge"]))
        assert equals(from_wkt("LINESTRING(0 0, 1 1)"), from_wkt("LINESTRING(1 1, 0 0)"))
        assert equals(from_wkt(BOX_REF), from_wkt("POLYGON((10 0, 10 10, 0 10, 0 0, 10 0))"))

    def test_line_box_touches(self):
        # lines along the bottom edge (y=0) only touch the box boundary;
        # a line punching through y=0 vertically reaches the interior
        box = from_wkt(BOX_REF)
        assert touches(box, from_wkt(LINES["touches"]))
        assert touches(box, from_wkt(LINES["crosses"]))
        piercing = from_wkt("LINESTRING(5 -1, 5 1)")
        assert intersects(box, piercing)
        assert not touches(box, piercing)
        assert crosses(piercing, box)


def test_collinear_steep_negative_slope_overlap():
    """y-major negative-slope collinear overlaps must be detected — the
    old lexicographic endpoint compare missed them (round-3 review)."""
    from geomesa_ray.geometry.base import LineString
    from geomesa_ray.geometry.predicates import intersects, overlaps

    a = LineString([(0, 0), (-1, 2)])
    b = LineString([(-0.5, 1), (-1.5, 3)])
    assert intersects(a, b)
    assert overlaps(a, b)
    # disjoint collinear stays disjoint
    c = LineString([(-2, 4), (-3, 6)])
    assert not intersects(a, c)


def test_ewkb_srid_flag_and_zm_rejection():
    import struct

    import pytest as _pytest

    from geomesa_ray.geometry.wkb import from_wkb, wkb_envelopes

    ewkb = struct.pack("<BII2d", 1, 0x20000001, 4326, 1.0, 2.0)
    g = from_wkb(ewkb)
    assert (g.x, g.y) == (1.0, 2.0)
    import numpy as _np
    import pyarrow as _pa

    env = wkb_envelopes(_pa.array([ewkb], _pa.binary()))
    assert env.tolist() == [[1.0, 2.0, 1.0, 2.0]]
    for bad in (
        struct.pack("<BI3d", 1, 0x80000001, 1.0, 2.0, 3.0),  # EWKB Z
        struct.pack("<BI3d", 1, 1001, 1.0, 2.0, 3.0),        # ISO Z
    ):
        with _pytest.raises(NotImplementedError):
            from_wkb(bad)
