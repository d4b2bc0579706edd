"""st_* function library + converter expressions: fixture-pinned semantics."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.functions import convert as cx
from geomesa_ray.functions.st_functions import (
    convex_hull,
    geohash_decode,
    geohash_encode,
    st_antimeridian_safe_geom,
    st_area,
    st_as_geojson,
    st_as_text,
    st_buffer_point,
    st_centroid,
    st_contains,
    st_distance_sphere,
    st_envelope,
    st_geohash,
    st_geom_from_wkt,
    st_geometry_type,
    st_intersects,
    st_length,
    st_make_point,
    st_num_points,
    st_translate,
    st_within,
    st_x,
    st_y,
)
from geomesa_ray.geometry.base import Point, box
from geomesa_ray.geometry.wkb import from_wkb, to_wkb


def test_constructors_accessors_roundtrip():
    wkts = pa.array(
        ["POINT (1 2)", "LINESTRING (0 0, 3 4)", "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"]
    )
    g = st_geom_from_wkt(wkts)
    assert st_geometry_type(g).to_pylist() == ["Point", "LineString", "Polygon"]
    assert st_as_text(g).to_pylist() == wkts.to_pylist()
    assert st_num_points(g).to_pylist() == [1, 2, 5]
    pts = st_make_point(pa.array([1.5, -3.0]), pa.array([2.5, 4.0]))
    assert st_x(pts).to_pylist() == [1.5, -3.0]
    assert st_y(pts).to_pylist() == [2.5, 4.0]


def test_measures_and_envelope():
    g = st_geom_from_wkt(
        pa.array(["POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))", "LINESTRING (0 0, 3 4)"])
    )
    assert st_area(g).to_pylist() == [100.0, 0.0]
    assert st_length(g).to_pylist() == [40.0, 5.0]
    env = st_envelope(g)
    assert from_wkb(env[0].as_py()).bounds == (0, 0, 10, 10)
    cent = st_centroid(g)
    c0 = from_wkb(cent[0].as_py())
    assert (c0.x, c0.y) == (5.0, 5.0)


def test_relations_vector_vs_scalar():
    """DE-9IM boundary semantics (SparkSQLSpatialRelationshipsTest fixture):
    contains excludes the boundary, intersects includes it."""
    ref = to_wkb(box(0, 0, 10, 10))
    pts = st_make_point(
        pa.array([5.0, 0.0, 0.0, -5.0]), pa.array([5.0, 5.0, 0.0, 0.0])
    )  # int, edge, corner, ext
    assert st_contains(pa.array([ref] * 4, pa.binary()), from_wkb(pts[0].as_py())).to_pylist()[0] is True
    assert st_within(pts, ref).to_pylist() == [True, False, False, False]
    assert st_intersects(pts, ref).to_pylist() == [True, True, True, False]


def test_geohash_roundtrip_and_known_value():
    # public known value: geohash of (-5.6, 42.6) starts with "ezs42"
    assert geohash_encode(-5.6, 42.6, 5) == "ezs42"
    for lon, lat in [(2.35, 48.85), (-74.0, 40.7), (179.9, -89.9)]:
        gh = geohash_encode(lon, lat, 12)
        dlon, dlat = geohash_decode(gh)
        assert abs(dlon - lon) < 1e-6 and abs(dlat - lat) < 1e-6
    arr = st_geohash(pa.array([2.35]), pa.array([48.85]), 6)
    assert len(arr[0].as_py()) == 6


def test_distance_sphere_and_buffer():
    d = st_distance_sphere(
        pa.array([0.0]), pa.array([0.0]), pa.array([1.0]), pa.array([0.0])
    ).to_pylist()[0]
    assert abs(d - 111_195) < 200  # one degree at the equator
    buf = from_wkb(st_buffer_point(2.0, 48.0, 10_000))
    xmin, ymin, xmax, ymax = buf.bounds
    assert xmin < 2.0 < xmax and ymin < 48.0 < ymax
    # buffer must contain its center
    from geomesa_ray.geometry.predicates import points_in_polygon

    assert points_in_polygon(np.array([2.0]), np.array([48.0]), buf)[0]


def test_translate_antimeridian_hull():
    g = st_geom_from_wkt(pa.array(["POINT (1 2)"]))
    t = from_wkb(st_translate(g, 10, -1)[0].as_py())
    assert (t.x, t.y) == (11.0, 1.0)
    parts = st_antimeridian_safe_geom(box(170, -10, 190, 10))
    assert len(parts) == 2
    bounds = sorted(p.bounds for p in parts)
    assert bounds[0] == (-180.0, -10.0, -170.0, 10.0)
    assert bounds[1] == (170.0, -10.0, 180.0, 10.0)
    hull = convex_hull([Point(0, 0), Point(4, 0), Point(2, 3), Point(2, 1)])
    assert from_wkb(to_wkb(hull)).bounds == (0, 0, 4, 3)
    from geomesa_ray.geometry.measures import area

    assert area(hull) == 6.0


def test_geojson():
    g = st_geom_from_wkt(pa.array(["POINT (1 2)"]))
    import json

    assert json.loads(st_as_geojson(g)[0].as_py()) == {
        "type": "Point",
        "coordinates": [1.0, 2.0],
    }


def test_convert_expressions():
    s = pa.array(["  Hello World  ", "foo", ""])
    assert cx.trim(s).to_pylist() == ["Hello World", "foo", ""]
    assert cx.lowercase(s)[1].as_py() == "foo"
    assert cx.empty_to_null(s)[2].as_py() is None
    assert cx.length(pa.array(["abc"])).to_pylist() == [3]
    assert cx.substr(pa.array(["abcdef"]), 1, 4).to_pylist() == ["bcd"]
    assert cx.replace(pa.array(["a-b-c"]), "-", "_").to_pylist() == ["a_b_c"]
    assert cx.regex_replace(pa.array(["a1b22c"]), r"\d+", "#").to_pylist() == ["a#b#c"]
    assert cx.strip_prefix(pa.array(["pre_x", "y"]), "pre_").to_pylist() == ["x", "y"]
    assert cx.strip_suffix(pa.array(["x_suf", "y"]), "_suf").to_pylist() == ["x", "y"]

    ts = cx.secs_to_date(pa.array([86400], pa.int64()))
    assert cx.iso_date(ts).to_pylist() == ["1970-01-02"]
    assert cx.date_to_millis(ts).to_pylist() == [86400000]
    parsed = cx.date_parse(pa.array(["2020-12-31 23:59:59"]), "%Y-%m-%d %H:%M:%S")
    assert cx.iso_datetime(parsed).to_pylist() == ["2020-12-31T23:59:59"]

    assert cx.mean(pa.array([1, 3]), pa.array([3, 5])).to_pylist() == [2.0, 4.0]
    assert cx.max_of(pa.array([1, 9]), pa.array([5, 2])).to_pylist() == [5, 9]

    # deterministic ids: stable across calls
    a = cx.murmur3_64(pa.array(["x", "y"]))
    b = cx.murmur3_64(pa.array(["x", "y"]))
    assert a.to_pylist() == b.to_pylist()
    u = cx.uuid5(pa.array(["https://example.com/p1"]))
    assert u.to_pylist() == cx.uuid5(pa.array(["https://example.com/p1"])).to_pylist()
    assert cx.md5(pa.array(["abc"])).to_pylist() == ["900150983cd24fb0d6963f7d28e17f72"]
    assert cx.base64_decode(cx.base64_encode(pa.array([b"bytes"]))).to_pylist() == [b"bytes"]
    assert cx.int_to_boolean(pa.array([0, 2])).to_pylist() == [False, True]
