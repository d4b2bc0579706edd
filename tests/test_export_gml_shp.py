"""GML / Shapefile / Leaflet exporters (ExportFormat.scala:56-112 parity)."""

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.geometry.base import LineString, Point, Polygon
from geomesa_ray.geometry.wkb import from_wkb, to_wkb
from geomesa_ray.stages.export2 import (
    read_shapefile,
    write_gml,
    write_leaflet,
    write_shapefile,
)


def _points_ds(n=25):
    import ray.data

    rng = np.random.default_rng(2)
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "name": pa.array([f"f<{i}>" for i in range(n)]),
                "lon": pa.array(rng.uniform(-170, 170, n), pa.float64()),
                "lat": pa.array(rng.uniform(-80, 80, n), pa.float64()),
            }
        )
    )


@pytest.mark.parametrize("version", [2, 3])
def test_gml_export_well_formed(ray_session, tmp_path, version):
    ds = _points_ds()
    path = str(tmp_path / f"out{version}.gml")
    n = write_gml(ds, path, version=version)
    assert n == 25
    root = ET.parse(path).getroot()
    ns = "http://www.opengis.net/gml" + ("/3.2" if version == 3 else "")
    members = root.findall(f"{{{ns}}}featureMember")
    assert len(members) == 25
    # escaped names survive, coordinates parse back
    feat = members[0].find("feature")
    assert feat.find("name").text.startswith("f<")
    if version == 3:
        pos = feat.find(f"geom/{{{ns}}}Point/{{{ns}}}pos").text
        lat, lon = map(float, pos.split())
    else:
        coords = feat.find(f"geom/{{{ns}}}Point/{{{ns}}}coordinates").text
        lon, lat = map(float, coords.split(","))
    assert -180 <= lon <= 180 and -90 <= lat <= 90


def test_shapefile_point_roundtrip(ray_session, tmp_path):
    import ray.data

    n = 40
    rng = np.random.default_rng(4)
    lon = rng.uniform(-170, 170, n)
    lat = rng.uniform(-80, 80, n)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "score": pa.array(rng.standard_normal(n).round(6), pa.float64()),
            "label": pa.array([f"pt{i}" for i in range(n)]),
            "geom_wkb": pa.array(
                [to_wkb(Point(x, y)) for x, y in zip(lon, lat)], pa.binary()
            ),
        }
    )
    base = str(tmp_path / "pts")
    assert write_shapefile(ray.data.from_arrow(tbl), base) == n
    back = read_shapefile(base)
    assert back["id"].to_pylist() == list(range(n))
    assert back["label"].to_pylist() == [f"pt{i}" for i in range(n)]
    np.testing.assert_allclose(back["score"].to_pylist(), tbl["score"].to_pylist(), atol=1e-9)
    for wkb, x, y in zip(back["geom_wkb"].to_pylist(), lon, lat):
        g = from_wkb(wkb)
        assert abs(g.x - x) < 1e-12 and abs(g.y - y) < 1e-12


def test_shapefile_polygon_and_line_roundtrip(ray_session, tmp_path):
    import ray.data

    poly = Polygon(
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]],
    )
    tbl = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "geom_wkb": pa.array([to_wkb(poly)], pa.binary()),
        }
    )
    base = str(tmp_path / "poly")
    write_shapefile(ray.data.from_arrow(tbl), base)
    g = from_wkb(read_shapefile(base)["geom_wkb"][0].as_py())
    assert isinstance(g, Polygon) and len(g.holes) == 1
    assert g.bounds == poly.bounds
    from geomesa_ray.geometry.measures import area

    assert area(g) == area(poly)

    line = LineString([(0, 0), (5, 5), (10, 0)])
    tbl2 = pa.table(
        {"id": pa.array([1], pa.int64()),
         "geom_wkb": pa.array([to_wkb(line)], pa.binary())}
    )
    base2 = str(tmp_path / "line")
    write_shapefile(ray.data.from_arrow(tbl2), base2)
    g2 = from_wkb(read_shapefile(base2)["geom_wkb"][0].as_py())
    assert isinstance(g2, LineString)
    np.testing.assert_allclose(g2.coords, line.coords)


def test_leaflet_export(ray_session, tmp_path):
    ds = _points_ds(10)
    path = str(tmp_path / "map.html")
    n = write_leaflet(ds, path, title="t<est>")
    assert n == 10
    html = open(path).read()
    assert "L.geoJSON" in html and '"FeatureCollection"' in html
    assert html.count('"Feature"') == 10
    # cap respected
    assert write_leaflet(_points_ds(30), str(tmp_path / "m2.html"), max_features=5) == 5
