"""Measures + spatial index tests (reference expectations where pinned)."""

import numpy as np

from geomesa_ray.geometry import from_wkt
from geomesa_ray.geometry.index import GridIndex, STRtree
from geomesa_ray.geometry.measures import (
    area,
    centroid,
    closest_point,
    distance,
    haversine_m,
    length,
    vincenty_m,
)
from geomesa_ray.geometry.predicates import points_in_polygon


class TestMeasures:
    def test_area(self):
        # SparkSQLSpatialRelationshipsTest "st_area": 100.0 in deg^2
        assert area(from_wkt("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))")) == 100.0
        assert area(from_wkt("POLYGON((0 50, 0 60, 10 60, 10 50, 0 50))")) == 100.0
        # with hole
        g = from_wkt("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
        assert area(g) == 96.0

    def test_centroid(self):
        c = centroid(from_wkt("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"))
        assert (c.x, c.y) == (5.0, 5.0)

    def test_closest_point(self):
        # st_closestpoint(box, POINT(15 5)) == POINT(10 5)
        c = closest_point(
            from_wkt("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"), from_wkt("POINT(15 5)")
        )
        assert (c.x, c.y) == (10.0, 5.0)

    def test_distance(self):
        assert distance(from_wkt("POINT(0 0)"), from_wkt("POINT(10 0)")) == 10.0
        assert distance(from_wkt("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"), from_wkt("POINT(15 5)")) == 5.0
        assert distance(from_wkt("POINT(5 5)"), from_wkt("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))")) == 0.0

    def test_distance_spheroid(self):
        # st_distanceSpheroid(POINT(0 0), POINT(10 0)) ≈ 1113194 ± 1 m
        assert abs(vincenty_m(0, 0, 10, 0) - 1113194.0) <= 1.0

    def test_haversine_symmetry(self):
        d1 = haversine_m(0, 0, 10, 10)
        d2 = haversine_m(10, 10, 0, 0)
        assert abs(d1 - d2) < 1e-6
        assert 1_500_000 < d1 < 1_600_000

    def test_length(self):
        assert length(from_wkt("LINESTRING(0 0, 3 4)")) == 5.0


class TestSTRtree:
    def test_query(self):
        rng = np.random.default_rng(1)
        mins = rng.uniform(-170, 160, (500, 2))
        boxes = np.hstack([mins, mins + rng.uniform(0.1, 5, (500, 2))])
        boxes = boxes[:, [0, 1, 2, 3]]
        tree = STRtree(boxes)
        q = (-10.0, -10.0, 10.0, 10.0)
        got = set(tree.query(*q).tolist())
        expect = {
            i
            for i, b in enumerate(boxes)
            if b[0] <= q[2] and b[2] >= q[0] and b[1] <= q[3] and b[3] >= q[1]
        }
        assert got == expect

    def test_empty(self):
        tree = STRtree(np.empty((0, 4)))
        assert len(tree.query(0, 0, 1, 1)) == 0


class TestGridIndex:
    def test_probe_matches_bruteforce(self):
        rng = np.random.default_rng(2)
        mins = rng.uniform(-60, 50, (200, 2))
        boxes = np.hstack([mins, mins + rng.uniform(0.5, 8, (200, 2))])
        gi = GridIndex(boxes)
        px = rng.uniform(-70, 70, 5000)
        py = rng.uniform(-70, 70, 5000)
        pts, items = gi.probe_points(px, py)
        cand = set(zip(pts.tolist(), items.tolist()))
        # every true bbox-hit must be among the candidates
        for i, b in enumerate(boxes):
            hits = np.flatnonzero((px >= b[0]) & (px <= b[2]) & (py >= b[1]) & (py <= b[3]))
            for h in hits:
                assert (int(h), i) in cand

    def test_join_end_to_end(self):
        # candidates -> exact PIP must equal brute-force PIP
        polys = [
            from_wkt("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"),
            from_wkt("POLYGON((20 20, 20 30, 30 30, 30 20, 20 20))"),
            from_wkt("POLYGON((-50 -50, -50 -40, -40 -40, -40 -50, -50 -50))"),
        ]
        bounds = np.array([p.bounds for p in polys])
        gi = GridIndex(bounds)
        rng = np.random.default_rng(3)
        px = rng.uniform(-60, 40, 10000)
        py = rng.uniform(-60, 40, 10000)
        pts, items = gi.probe_points(px, py)
        matched = set()
        for poly_idx in np.unique(items):
            sel = pts[items == poly_idx]
            ok = points_in_polygon(px[sel], py[sel], polys[poly_idx])
            matched.update(zip(sel[ok].tolist(), [int(poly_idx)] * int(ok.sum())))
        brute = set()
        for i, p in enumerate(polys):
            ok = points_in_polygon(px, py, p)
            brute.update(zip(np.flatnonzero(ok).tolist(), [i] * int(ok.sum())))
        assert matched == brute
