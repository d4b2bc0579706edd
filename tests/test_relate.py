"""DE-9IM matrices pinned against the canonical JTS values for the
reference's relation fixtures (SparkSQLSpatialRelationshipsTest geometry
set: 10×10 box, interior/edge/corner/exterior points, crossing/touching
lines, int/overlap/edge/disjoint boxes)."""

import pytest

from geomesa_ray.geometry.base import LineString, Point, box
from geomesa_ray.geometry.relate import matches, relate, relate_bool

BOX = box(0, 0, 10, 10)


@pytest.mark.parametrize(
    "a,b,expected",
    [
        # point vs polygon: interior / boundary edge / corner / exterior
        (Point(5, 5), BOX, "0FFFFF212"),
        (Point(0, 5), BOX, "F0FFFF212"),
        (Point(0, 0), BOX, "F0FFFF212"),
        (Point(-5, 0), BOX, "FF0FFF212"),
        # polygon vs polygon
        (BOX, BOX, "2FFF1FFF2"),  # equal
        (box(2, 2, 8, 8), BOX, "2FF1FF212"),  # within (shares no boundary)
        (BOX, box(2, 2, 8, 8), "212FF1FF2"),  # contains
        (box(-5, 2, 5, 8), BOX, "212101212"),  # overlap
        (box(-5, 2, 0, 8), BOX, "FF2F11212"),  # touch along an edge
        (box(-5, -5, 0, 0), BOX, "FF2F01212"),  # touch at a corner point
        (box(-5, -5, -1, -1), BOX, "FF2FF1212"),  # disjoint
        # line vs polygon
        (LineString([(-5, 5), (15, 5)]), BOX, "101FF0212"),  # crosses through
        (LineString([(2, 2), (8, 8)]), BOX, "1FF0FF212"),  # inside (endpoints interior)
        (LineString([(0, 0), (0, 10)]), BOX, "F1FF0F212"),  # runs along the edge
        (LineString([(-5, -5), (-1, -1)]), BOX, "FF1FF0212"),  # disjoint
        # line vs line
        (LineString([(-1, 0), (1, 0)]), LineString([(0, -1), (0, 1)]), "0F1FF0102"),  # proper cross
        (LineString([(0, 0), (2, 0)]), LineString([(1, 0), (3, 0)]), "1010F0102"),  # partial overlap
        (LineString([(0, 0), (1, 0)]), LineString([(1, 0), (2, 0)]), "FF1F00102"),  # touch end-to-end
        # point vs point
        (Point(1, 1), Point(1, 1), "0FFFFFFF2"),
        (Point(1, 1), Point(2, 2), "FF0FFF0F2"),
    ],
)
def test_relate_matrices(a, b, expected):
    assert relate(a, b) == expected


def test_pattern_matching():
    assert matches("212101212", "T*T***T**")
    assert matches("2FFF1FFF2", "T*F**FFF*")  # equals pattern
    assert not matches("212101212", "T*F**FFF*")
    assert relate_bool(Point(5, 5), BOX, "T*F**F***")  # within pattern
    assert not relate_bool(Point(0, 5), BOX, "T*F**F***")  # boundary point not within
    with pytest.raises(ValueError):
        matches("212", "T*T")


def test_relate_consistent_with_named_predicates():
    """Spot-check matrix ↔ named-relation consistency on the fixture set."""
    from geomesa_ray.geometry import predicates as P

    cases = [
        (Point(5, 5), BOX),
        (Point(0, 5), BOX),
        (box(-5, 2, 5, 8), BOX),
        (box(-5, 2, 0, 8), BOX),
        (box(2, 2, 8, 8), BOX),
        (LineString([(-5, 5), (15, 5)]), BOX),
    ]
    for a, b in cases:
        m = relate(a, b)
        assert matches(m, "T********") == bool(P.intersects(a, b) and not P.touches(a, b)) or (
            P.intersects(a, b) == (not matches(m, "FF*FF****"))
        )
        # disjoint pattern
        assert P.disjoint(a, b) == matches(m, "FF*FF****")
        # within: T*F**F***
        assert P.within(a, b) == matches(m, "T*F**F***")
