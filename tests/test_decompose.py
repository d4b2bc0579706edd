"""Polygon quad-decomposition (GeohashUtils.decomposeGeometry analog) and
its use in polygon scan planning."""

import numpy as np
import pytest

from geomesa_ray.geometry.base import MultiPolygon, Polygon
from geomesa_ray.geometry.decompose import decompose_geometry
from geomesa_ray.geometry.measures import area
from geomesa_ray.geometry.predicates import points_in_polygon

L_SHAPE = Polygon([(0, 0), (10, 0), (10, 2), (2, 2), (2, 10), (0, 10)])
TRIANGLE = Polygon([(0, 0), (20, 0), (0, 20)])


def _boxes_area(boxes):
    return sum((b[2] - b[0]) * (b[3] - b[1]) for b in boxes)


def _covered(boxes, x, y):
    return any(b[0] <= x <= b[2] and b[1] <= y <= b[3] for b in boxes)


@pytest.mark.parametrize("poly", [L_SHAPE, TRIANGLE])
def test_cover_contains_polygon_and_is_tighter(poly):
    boxes = decompose_geometry(poly, max_boxes=32)
    assert 1 <= len(boxes) <= 32
    # every interior sample point is covered
    rng = np.random.default_rng(9)
    xmin, ymin, xmax, ymax = poly.bounds
    xs = rng.uniform(xmin, xmax, 3000)
    ys = rng.uniform(ymin, ymax, 3000)
    inside = points_in_polygon(xs, ys, poly)
    for x, y in zip(xs[inside], ys[inside]):
        assert _covered(boxes, x, y)
    # the union is materially tighter than the envelope
    env_area = (xmax - xmin) * (ymax - ymin)
    assert _boxes_area(boxes) < 0.9 * env_area
    assert _boxes_area(boxes) >= area(poly) * 0.99  # cover ⊇ polygon


def test_multipolygon_budget_split():
    mp = MultiPolygon([L_SHAPE, Polygon([(50, 50), (60, 50), (60, 60), (50, 60)])])
    boxes = decompose_geometry(mp, max_boxes=16)
    assert _covered(boxes, 1, 1) and _covered(boxes, 55, 55)
    assert not _covered(boxes, 30, 30)


def test_polygon_scan_uses_decomposition(ray_session, tmp_path):
    from geomesa_ray.pipelines.ingest import ingest_pages
    from geomesa_ray.pipelines.scan import Query, scan
    from geomesa_ray.sources.synth import write_pages_parquet

    raw, idx = tmp_path / "raw", tmp_path / "idx"
    raw.mkdir()
    write_pages_parquet(str(raw), 3000, seed=44, shard_rows=750)
    ingest_pages(str(raw), str(idx), n_groups=2, target_rows_per_file=300)
    tri = Polygon([(-20.0, 30.0), (30.0, 30.0), (-20.0, 60.0)])
    got = sorted(scan(str(idx), Query(geometry=tri)).to_pandas()["url"])
    # oracle: bbox scan + exact PIP driver-side
    bb = scan(str(idx), Query(bbox=tri.bounds, loose=True)).to_pandas()
    mask = points_in_polygon(bb["lon"].to_numpy(), bb["lat"].to_numpy(), tri)
    assert got == sorted(bb["url"][mask])
