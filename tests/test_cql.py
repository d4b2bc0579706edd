"""(E)CQL parser → filter algebra: grammar coverage, evaluation parity
with hand-built trees, planner extraction, and loud error modes."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.pipelines.cql import CqlParseError, parse_ecql
from geomesa_ray.pipelines.filters import (
    And,
    AttrCmp,
    AttrEq,
    AttrIn,
    AttrLike,
    BBox,
    During,
    GeomPredicate,
    Not,
    Or,
    evaluate,
    extract_bboxes,
    extract_intervals,
    plan,
)


def test_parse_composite_matches_hand_tree():
    f = parse_ecql(
        "BBOX(geom, -10, 40, 30, 60) AND dtg DURING "
        "2024-01-05T00:00:00Z/2024-01-12T00:00:00Z AND event_type = 'click'"
    )
    assert f == And(
        BBox(-10.0, 40.0, 30.0, 60.0),
        During(1704412800000, 1705017600000),
        AttrEq("event_type", "click"),
    )


def test_parse_precedence_and_grouping():
    f = parse_ecql("a = 1 OR b = 2 AND c = 3")
    # AND binds tighter than OR
    assert f == Or(AttrEq("a", 1), And(AttrEq("b", 2), AttrEq("c", 3)))
    g = parse_ecql("(a = 1 OR b = 2) AND c = 3")
    assert g == And(Or(AttrEq("a", 1), AttrEq("b", 2)), AttrEq("c", 3))


def test_parse_between_in_like_not():
    assert parse_ecql("v BETWEEN 10 AND 20") == And(
        AttrCmp("v", ">=", 10), AttrCmp("v", "<=", 20)
    )
    assert parse_ecql("t IN ('a', 'b''c')") == AttrIn("t", ("a", "b'c"))
    assert parse_ecql("u LIKE 'x%_'") == AttrLike("u", "x%_")
    assert parse_ecql("NOT v > 3") == Not(AttrCmp("v", ">", 3))


def test_parse_intersects_wkt_and_temporal_edges():
    f = parse_ecql("INTERSECTS(geom, POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))")
    assert isinstance(f, GeomPredicate)
    assert f.geometry.bounds == (0.0, 0.0, 4.0, 4.0)
    after = parse_ecql("dtg AFTER 2024-01-15T12:00:00Z")
    assert after.lo_ms == 1705320000001  # strictly after
    before = parse_ecql("dtg BEFORE 2024-01-02")
    assert before.hi_ms == 1704153600000  # exclusive upper


def test_parsed_tree_evaluates_like_sql_semantics():
    batch = pa.table(
        {
            "lon": pa.array([0.0, 20.0, 50.0], pa.float64()),
            "lat": pa.array([50.0, 50.0, 50.0], pa.float64()),
            "event_type": pa.array(["click", "view", "error"], pa.string()),
            "value": pa.array([5.0, 200.0, 100.0], pa.float64()),
            "name": pa.array(["ab1x", "zz19", "none"], pa.string()),
        }
    )
    f = parse_ecql(
        "BBOX(geom, -10, 40, 30, 60) AND "
        "(event_type IN ('click','view') OR NOT value <= 150.0) AND "
        "name LIKE '%1_'"
    )
    mask = evaluate(f, batch)
    # row0: in bbox, click, name ab1x matches %1_ → True
    # row1: in bbox, view, zz19 matches %1_ → True
    # row2: lon 50 outside bbox → False
    assert mask.tolist() == [True, True, False]


def test_planner_extracts_from_parsed_tree():
    f = parse_ecql(
        "BBOX(geom, -10, 40, 30, 60) AND dtg DURING "
        "2024-01-05T00:00:00Z/2024-01-12T00:00:00Z AND NOT a = 1"
    )
    fp = plan(f)
    assert fp.bboxes == [(-10.0, 40.0, 30.0, 60.0)]
    assert fp.intervals == [(1704412800000, 1705017600000)]
    # NOT arms never tighten extraction (conservative over-covering)
    assert extract_bboxes(parse_ecql("NOT BBOX(geom, 0, 0, 1, 1)")) == []
    assert extract_intervals(
        parse_ecql("NOT dtg DURING 2024-01-01T00:00:00Z/2024-01-02T00:00:00Z")
    ) == []


@pytest.mark.parametrize("bad", [
    "BBOX(geom, 1, 2, 3)",
    "a = ",
    "a == 1",
    "INTERSECTS(geom, POLYGON((0 0, 1 1)",
    "a = 1 extra",
    "dtg DURING notadate/2024-01-02",
    "u LIKE unquoted",
])
def test_parse_errors_are_loud(bad):
    with pytest.raises(CqlParseError):
        parse_ecql(bad)


def test_not_and_cmp_null_semantics_three_valued():
    """SQL/ECQL three-valued logic: a NULL attribute makes the comparison
    UNKNOWN, which neither the predicate NOR its negation keeps (Kleene
    NOT swaps true/false and leaves unknown) — advisor finding r4."""
    batch = pa.table({
        "v": pa.array([1.0, None, 9.0], pa.float64()),
        "w": pa.array([1.0, 1.0, 1.0], pa.float64()),
    })
    assert evaluate(parse_ecql("v <= 5"), batch).tolist() == [True, False, False]
    assert evaluate(parse_ecql("NOT v <= 5"), batch).tolist() == [False, False, True]
    # Kleene: FALSE AND UNKNOWN = FALSE, so the NULL-v row is definitely
    # false inside the AND and NOT keeps it...
    assert evaluate(
        parse_ecql("NOT (w > 5 AND v < 0)"), batch
    ).tolist() == [True, True, True]
    # ...while NOT over a conjunct that stays UNKNOWN on the NULL row
    # still excludes it
    assert evaluate(
        parse_ecql("NOT (v > 5 AND v < 8)"), batch
    ).tolist() == [True, False, True]
    # TRUE OR UNKNOWN = TRUE
    assert evaluate(
        parse_ecql("w <= 5 OR v < 0"), batch
    ).tolist() == [True, True, True]


def test_dwithin_beyond_parse_and_eval():
    from geomesa_ray.pipelines.filters import DWithin

    f = parse_ecql("DWITHIN(geom, POINT (2.35 48.85), 300, kilometers)")
    assert isinstance(f, DWithin) and f.radius_m == 300_000.0
    g = parse_ecql("BEYOND(geom, POINT (2.35 48.85), 300, kilometers)")
    assert g == Not(f)
    batch = pa.table({
        "lon": pa.array([2.35, 6.0, 30.0], pa.float64()),
        "lat": pa.array([48.85, 49.0, 49.0], pa.float64()),
    })
    assert evaluate(f, batch).tolist() == [True, True, False]
    assert evaluate(g, batch).tolist() == [False, False, True]
    with pytest.raises(CqlParseError, match="unit"):
        parse_ecql("DWITHIN(geom, POINT (0 0), 10, furlongs)")


def test_dwithin_extraction_overcovers_geodesic_disc():
    from geomesa_ray.geometry.measures import haversine_m

    f = parse_ecql("DWITHIN(geom, POINT (10 60), 200, kilometers)")
    (xmin, ymin, xmax, ymax), = extract_bboxes(f)
    # every point of the geodesic disc must fall inside the box
    ang = np.linspace(0, 2 * np.pi, 720)
    # crude disc boundary sample by radial search
    for a in ang[::37]:
        lo, hi = 0.0, 10.0
        for _ in range(40):
            mid = (lo + hi) / 2
            lon = 10 + mid * np.sin(a)
            lat = 60 + mid * np.cos(a)
            if haversine_m(np.array([lon]), np.array([lat]), 10, 60)[0] <= 200_000:
                lo = mid
            else:
                hi = mid
        lon = 10 + lo * np.sin(a)
        lat = 60 + lo * np.cos(a)
        assert xmin <= lon <= xmax and ymin <= lat <= ymax


def test_dwithin_polygon_segments():
    from geomesa_ray.pipelines.filters import DWithin, evaluate as ev
    from geomesa_ray.geometry.base import Polygon

    poly = Polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
    f = DWithin(poly, 60_000.0)
    batch = pa.table({
        "lon": pa.array([2.0, 5.0, 4.5], pa.float64()),
        "lat": pa.array([2.0, 2.0, 2.0], pa.float64()),
    })
    # inside → within; 1° out (~111 km) → no; 0.5° out (~56 km) → yes
    assert ev(f, batch).tolist() == [True, False, True]


def test_dwithin_dateline_extraction_wraps():
    """A disc crossing ±180° extracts TWO OR'd boxes so planner pruning
    keeps the far-side matches (round-4 review finding)."""
    f = parse_ecql("DWITHIN(geom, POINT (179.9 0), 300, kilometers)")
    boxes = extract_bboxes(f)
    assert len(boxes) == 2
    east = [b for b in boxes if b[0] > 0]
    west = [b for b in boxes if b[0] < 0]
    assert east and west
    assert west[0][0] == -180.0 and east[0][2] == 180.0
    # the true match at lon -179.9 lies inside the wrapped box
    assert west[0][0] <= -179.9 <= west[0][2]


def test_wkt_with_trailing_whitespace_parses():
    f = parse_ecql("INTERSECTS(geom, POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0) ))")
    assert isinstance(f, GeomPredicate)
    assert f.geometry.bounds == (0.0, 0.0, 4.0, 4.0)
