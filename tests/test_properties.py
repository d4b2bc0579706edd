"""Property-based invariants (hypothesis) for the curve/index kernels —
randomized complement to the enumerated reference fixtures."""

import numpy as np
from hypothesis import given, settings, strategies as st

from geomesa_ray.curves.binnedtime import (
    TimePeriod,
    bins_and_offsets,
    binned_time_to_millis,
    max_offset,
)
from geomesa_ray.curves.sfc import Z2SFC, Z3SFC
from geomesa_ray.curves.xz import XZ2SFC
from geomesa_ray.curves.zranges import zranges_2d
from geomesa_ray.stages.density import GridSnap

lon = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
# ≤ year 2037: keeps every period's int16 bin in range (reference Short
# bins error beyond max, time_to_binned_time analog)
millis = st.integers(min_value=0, max_value=2_145_916_800_000)


@settings(max_examples=200, deadline=None)
@given(lon, lat)
def test_z2_round_trip_within_bin(x, y):
    sfc = Z2SFC()
    z = sfc.index(np.array([x]), np.array([y]))[0]
    dx, dy = sfc.invert(np.array([z]))
    assert abs(dx[0] - x) <= 360.0 / (1 << 31) + 1e-12
    assert abs(dy[0] - y) <= 180.0 / (1 << 31) + 1e-12


@settings(max_examples=100, deadline=None)
@given(lon, lat, millis)
def test_z3_round_trip_within_bin(x, y, t):
    sfc = Z3SFC(TimePeriod.WEEK)
    bins, z = sfc.index_from_millis(np.array([x]), np.array([y]), np.array([t]))
    dx, dy, dt = sfc.invert(np.array([z]))
    assert abs(dx[0] - x) <= 360.0 / (1 << 21) + 1e-9
    assert abs(dy[0] - y) <= 180.0 / (1 << 21) + 1e-9
    # time offset within one time-bin cell
    mo = max_offset(TimePeriod.WEEK)
    _, off = bins_and_offsets(np.array([t]), TimePeriod.WEEK)
    assert abs(dt[0] - off[0]) <= mo / (1 << 21) + 1


@settings(max_examples=100, deadline=None)
@given(millis, st.sampled_from(list(TimePeriod)))
def test_binned_time_round_trip(t, period):
    bins, offs = bins_and_offsets(np.array([t]), period)
    back = binned_time_to_millis(int(bins[0]), int(offs[0]), period)
    # offsets truncate to the period's unit resolution
    unit = {"day": 1, "week": 1000, "month": 1000, "year": 60_000}[period.value]
    assert 0 <= t - back < unit


@settings(max_examples=50, deadline=None)
@given(lon, lat, st.floats(min_value=0.01, max_value=30.0),
       st.floats(min_value=0.01, max_value=30.0))
def test_zranges_cover_random_point(x, y, w, h):
    """A window containing the point must cover its z2 code."""
    sfc = Z2SFC()
    xmin, xmax = max(x - w, -180.0), min(x + w, 180.0)
    ymin, ymax = max(y - h, -90.0), min(y + h, 90.0)
    z = int(sfc.index(np.array([x]), np.array([y]))[0])
    ranges = zranges_2d(sfc, [(xmin, ymin, xmax, ymax)], max_ranges=64)
    assert any(r.lower <= z <= r.upper for r in ranges)


@settings(max_examples=50, deadline=None)
@given(lon, lat, st.floats(min_value=0.0, max_value=5.0),
       st.floats(min_value=0.0, max_value=5.0),
       st.floats(min_value=0.5, max_value=20.0))
def test_xz2_containing_window_covers(x, y, w, h, pad):
    sfc = XZ2SFC(10)
    xmin, xmax = max(x - w, -180.0), min(x + w, 180.0)
    ymin, ymax = max(y - h, -90.0), min(y + h, 90.0)
    code = int(sfc.index(np.array([xmin]), np.array([ymin]),
                         np.array([xmax]), np.array([ymax]))[0])
    window = (
        max(xmin - pad, -180.0), max(ymin - pad, -90.0),
        min(xmax + pad, 180.0), min(ymax + pad, 90.0),
    )
    ranges = sfc.ranges([window])
    assert any(r.lower <= code <= r.upper for r in ranges)


@settings(max_examples=100, deadline=None)
@given(lon, lat)
def test_gridsnap_cell_contains_point(x, y):
    snap = GridSnap((-180.0, -90.0, 180.0, 90.0), 256, 256)
    i = int(snap.i(np.array([x]))[0])
    j = int(snap.j(np.array([y]))[0])
    assert 0 <= i < 256 and 0 <= j < 256
    cx, cy = float(snap.x(np.array([i]))[0]), float(snap.y(np.array([j]))[0])
    assert abs(cx - x) <= snap.dx / 2 + 1e-9
    assert abs(cy - y) <= snap.dy / 2 + 1e-9


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_match_points_equals_brute_force(seed):
    """The grid-index candidate machinery never changes join results:
    match_points == per-polygon brute force on random rectangles/pentagons
    and random points."""
    import numpy as np

    from geomesa_ray.geometry.base import Polygon, box
    from geomesa_ray.geometry.predicates import points_in_polygon
    from geomesa_ray.geometry.wkb import to_wkb
    import pyarrow as pa

    from geomesa_ray.stages.join import PolygonSet, match_points

    rng = np.random.default_rng(seed)
    polys = []
    for i in range(rng.integers(1, 12)):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        w, h = rng.uniform(0.01, 20), rng.uniform(0.01, 20)
        b = box(max(cx - w, -180), max(cy - h, -90), min(cx + w, 180), min(cy + h, 90))
        if i % 3 == 0:
            xmin, ymin, xmax, ymax = b.bounds
            dx = (xmax - xmin) * 0.4
            b = Polygon([(xmin + dx, ymin), (xmax, ymin), (xmax, ymax),
                         (xmin, ymax), (xmin, ymin + dx), (xmin + dx, ymin)])
        polys.append(b)
    tbl = pa.table(
        {
            "poly_id": pa.array([f"p{i}" for i in range(len(polys))]),
            "geom_wkb": pa.array([to_wkb(g) for g in polys], pa.binary()),
        }
    )
    polyset = PolygonSet(tbl)
    n = int(rng.integers(1, 500))
    px = rng.uniform(-180, 180, n)
    py = rng.uniform(-90, 90, n)
    pt_idx, poly_idx = match_points(polyset, px, py, "intersects")
    got = set(zip(pt_idx.tolist(), poly_idx.tolist()))
    expect = set()
    for j, g in enumerate(polys):
        for i in np.nonzero(points_in_polygon(px, py, g))[0]:
            expect.add((int(i), j))
    assert got == expect


# ---------------------------------------------------------------------------
# round-2 kernels: UTM, avro, FNV, overlay, bresenham
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=0.5, max_value=5.5),
       st.floats(min_value=-80.0, max_value=84.0),
       st.booleans())
def test_utm_round_trip(x, y, south):
    from geomesa_ray.geometry.reproject import lonlat_to_utm, utm_to_lonlat

    e, n = lonlat_to_utm(np.array([x]), np.array([y]), 31, south)
    x2, y2 = utm_to_lonlat(e, n, 31, south)
    assert abs(x2[0] - x) < 1e-9 and abs(y2[0] - y) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=50),
       st.lists(st.text(max_size=40) | st.none(), min_size=1, max_size=50),
       st.sampled_from(["null", "deflate"]))
def test_avro_round_trip_property(ints, strs, codec):
    import pyarrow as pa

    from geomesa_ray.sources.avro import read_avro_file, write_avro_file

    n = min(len(ints), len(strs))
    tbl = pa.table(
        {
            "i": pa.array(ints[:n], pa.int64()),
            "s": pa.array(strs[:n], pa.string()),
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_avro_file(tbl, p, codec=codec)
        back = read_avro_file(p)
    assert back["i"].to_pylist() == tbl["i"].to_pylist()
    assert back["s"].to_pylist() == tbl["s"].to_pylist()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=30))
def test_fnv1a_matches_pure_python(strs):
    import pyarrow as pa

    from geomesa_ray.stages.dedup import fnv1a_utf8

    def ref(s: str) -> int:
        h = 14695981039346656037
        for b in s.encode("utf-8")[:64]:
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        return h

    got = fnv1a_utf8(pa.array(strs, pa.string()))
    assert [int(v) for v in got] == [ref(s) for s in strs]


@settings(max_examples=40, deadline=None)
@given(st.floats(min_value=-170, max_value=160), st.floats(min_value=-80, max_value=70),
       st.floats(min_value=0.5, max_value=20), st.floats(min_value=0.5, max_value=20),
       st.floats(min_value=-170, max_value=160), st.floats(min_value=-80, max_value=70),
       st.floats(min_value=0.5, max_value=20), st.floats(min_value=0.5, max_value=20))
def test_rect_overlay_property(ax, ay, aw, ah, bx, by, bw, bh):
    """Rect∩rect and rect−rect areas satisfy inclusion-exclusion exactly."""
    from geomesa_ray.geometry.base import Polygon
    from geomesa_ray.geometry.measures import area
    from geomesa_ray.geometry.overlay import polygon_difference, polygon_intersection

    a = Polygon([(ax, ay), (ax + aw, ay), (ax + aw, ay + ah), (ax, ay + ah)])
    b = Polygon([(bx, by), (bx + bw, by), (bx + bw, by + bh), (bx, by + bh)])
    inter = polygon_intersection(a, b)
    diff = polygon_difference(a, b)
    ia = area(inter) if inter is not None else 0.0
    da = area(diff) if diff is not None else 0.0
    assert abs((ia + da) - area(a)) < 1e-6 * max(area(a), 1.0)
    # manual interval arithmetic
    w = max(0.0, min(ax + aw, bx + bw) - max(ax, bx))
    h = max(0.0, min(ay + ah, by + bh) - max(ay, by))
    assert abs(ia - w * h) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255),
       st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255))
def test_bresenham_cells_properties(i0, j0, i1, j1):
    from geomesa_ray.stages.density import _bresenham_cells

    ii, jj = _bresenham_cells(i0, j0, i1, j1)
    assert (ii[0], jj[0]) == (i0, j0)
    assert (ii[-1], jj[-1]) == (i1, j1)
    assert len(ii) == max(abs(i1 - i0), abs(j1 - j0)) + 1
    # 8-connected chain
    assert (np.abs(np.diff(ii)) <= 1).all() and (np.abs(np.diff(jj)) <= 1).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=20), st.integers(min_value=1, max_value=20),
       st.sampled_from([1, 3, 4]), st.integers(min_value=0, max_value=2**32 - 1))
def test_png_roundtrip_property(h, w, c, seed):
    from geomesa_ray.sources.codecs import png_decode, png_encode

    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=-180, max_value=180, allow_nan=False),
                min_size=4, max_size=4))
def test_batch_wkb_constructors_match_scalar(vals):
    import pyarrow as pa

    from geomesa_ray.geometry.base import LineString, Polygon
    from geomesa_ray.geometry.wkb import rect_wkbs, segment_wkbs, to_wkb

    x0, y0, x1, y1 = vals
    seg = segment_wkbs(np.array([x0]), np.array([y0]), np.array([x1]), np.array([y1]))
    assert seg[0].as_py() == to_wkb(LineString([(x0, y0), (x1, y1)]))
    xmin, xmax = min(x0, x1), max(x0, x1)
    ymin, ymax = min(y0, y1), max(y0, y1)
    if xmax == xmin or ymax == ymin:
        return  # degenerate rects are outside rect_wkbs' contract
    rect = rect_wkbs(np.array([xmin]), np.array([ymin]), np.array([xmax]), np.array([ymax]))
    assert rect[0].as_py() == to_wkb(
        Polygon([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)])
    )


# --- hex grid (curves/hexgrid.py) -------------------------------------------

hex_res = st.integers(min_value=0, max_value=12)


@settings(max_examples=200, deadline=None)
@given(lon, lat, hex_res)
def test_hex_assignment_voronoi_property(x, y, res):
    """No neighboring lattice center is strictly closer than the assigned
    one (randomized complement of test_hexgrid's grid sweep)."""
    from geomesa_ray.curves import hexgrid as hg

    hw, vv = hg.res_pitches(res)
    px, py = hg.hex_xy(np.array([x]), np.array([y]))
    a, b = hg.hex_cell_ab(px, py, res)
    assigned = (px - a * hw) ** 2 + (py - b * vv) ** 2
    for da in (-2, -1, 0, 1, 2):
        for db in (-2, -1, 0, 1, 2):
            if (da + db) % 2:
                continue
            d2 = (px - (a + da) * hw) ** 2 + (py - (b + db) * vv) ** 2
            assert d2[0] >= assigned[0]


@settings(max_examples=200, deadline=None)
@given(lon, lat, hex_res)
def test_hex_pack_roundtrip_and_center_containment(x, y, res):
    from geomesa_ray.curves import hexgrid as hg

    c = hg.hex_encode(np.array([x]), np.array([y]), res)
    r, a, b = hg.hex_decode(c)
    assert int(r[0]) == res and (int(a[0]) + int(b[0])) % 2 == 0
    assert int(hg.pack_cell(a, b, res)[0]) == int(c[0])
    # the center's own cell is itself (idempotence)
    cx, cy = hg.hex_center_units(c)
    a2, b2 = hg.hex_cell_ab(cx, cy, res)
    assert int(a2[0]) == int(a[0]) and int(b2[0]) == int(b[0])


@settings(max_examples=100, deadline=None)
@given(lon, lat, lon, lat, st.integers(min_value=3, max_value=10))
def test_hex_distance_symmetric_and_triangle(x1, y1, x2, y2, res):
    from geomesa_ray.curves import hexgrid as hg

    c1 = hg.hex_encode(np.array([x1]), np.array([y1]), res)
    c2 = hg.hex_encode(np.array([x2]), np.array([y2]), res)
    d12 = int(hg.hex_distance(c1, c2)[0])
    d21 = int(hg.hex_distance(c2, c1)[0])
    assert d12 == d21 >= 0
    if d12 == 0:
        assert int(c1[0]) == int(c2[0])
    # neighbors returned by k_ring(1) are at distance <= 1
    ring = hg.k_ring(int(c1[0]), 1)
    d = hg.hex_distance(np.full(len(ring), c1[0]), ring)
    assert d.max() <= 1
