"""Property tests for the H3-analog hex grid (curves/hexgrid.py)."""

import numpy as np
import pytest

from geomesa_ray.curves import hexgrid as hg


def _rand(n=2000, seed=42):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_assignment_is_nearest_center():
    """Brute-force Voronoi check: no lattice center within ±3 units is
    strictly closer than the assigned one (exact int64 arithmetic)."""
    lon, lat = _rand(5000)
    for res in (4, 8, 12):
        hw, vv = hg.res_pitches(res)
        x, y = hg.hex_xy(lon, lat)
        a, b = hg.hex_cell_ab(x, y, res)
        assert ((a + b) % 2 == 0).all()
        assigned = (x - a * hw) ** 2 + (y - b * vv) ** 2
        for da in range(-3, 4):
            for db in range(-3, 4):
                if (da + db) % 2:
                    continue
                d2 = (x - (a + da) * hw) ** 2 + (y - (b + db) * vv) ** 2
                assert not (d2 < assigned).any(), (res, da, db)


def test_pack_decode_roundtrip():
    lon, lat = _rand()
    for res in (0, 7, 12):
        c = hg.hex_encode(lon, lat, res)
        r, a, b = hg.hex_decode(c)
        assert (r == res).all()
        assert (hg.pack_cell(a, b, res) == c).all()
        q, rr = hg.ab_to_axial(a, b)
        a2, b2 = hg.axial_to_ab(q, rr)
        assert (a2 == a).all() and (b2 == b).all()


def test_ring_sizes_and_distances():
    for k in range(5):
        dq, dr = hg.ring_offsets(k)
        assert len(dq) == 1 + 3 * k * (k + 1)
    c0 = int(hg.hex_encode(10.0, 20.0, 8))
    ring = hg.k_ring(c0, 2)
    assert len(ring) == 19 and len(set(ring.tolist())) == 19
    d = hg.hex_distance(np.full(len(ring), c0), ring)
    assert sorted(d.tolist()) == [0] + [1] * 6 + [2] * 12
    # vectorized form matches scalar
    many = hg.hex_encode(np.array([10.0, -50.0]), np.array([20.0, 3.0]), 8)
    rings = hg.k_ring(many, 1)
    assert rings.shape == (2, 7)
    assert set(rings[0].tolist()) == set(hg.k_ring(int(many[0]), 1).tolist())


def test_parent_is_containing_coarse_cell():
    lon, lat = _rand()
    c = hg.hex_encode(lon, lat, 10)
    p = hg.hex_parent(c, 8)
    pr, _, _ = hg.hex_decode(p)
    assert (pr == 8).all()
    # parent must be the coarse cell of the child's center point
    cx, cy = hg.hex_center_units(c)
    pa_, pb_ = hg.hex_cell_ab(cx, cy, 8)
    assert (hg.pack_cell(pa_, pb_, 8) == p).all()
    with pytest.raises(ValueError):
        hg.hex_parent(c, 11)


def test_cover_bbox_superset_of_point_cells():
    cells = set(hg.cover_bbox(-10, -5, 10, 5, 6).tolist())
    rng = np.random.default_rng(7)
    lon = rng.uniform(-10, 10, 500)
    lat = rng.uniform(-5, 5, 500)
    assert set(hg.hex_encode(lon, lat, 6).tolist()) <= cells


def test_morton_prefix_locality():
    """Cells of nearby points share high Morton bits more often than
    far-apart points — the shuffle-key locality the id packing buys."""
    c1 = int(hg.hex_encode(10.0, 20.0, 12))
    c2 = int(hg.hex_encode(10.01, 20.01, 12))
    c3 = int(hg.hex_encode(-170.0, -80.0, 12))
    near = (c1 ^ c2).bit_length()
    far = (c1 ^ c3).bit_length()
    assert near < far


def test_hex_distance_res_mismatch_raises():
    a = hg.hex_encode(0.0, 0.0, 8)
    b = hg.hex_encode(0.0, 0.0, 9)
    with pytest.raises(ValueError):
        hg.hex_distance(a, b)


def test_hex_pip_count_matches_broadcast_join(ray_session):
    """Cross-implementation check: the fused hex-keyed aggregate join must
    equal per-polygon counts from the broadcast GridIndex join."""
    import pyarrow as pa
    import ray

    from geomesa_ray.pipelines.queries import events_points, polygons_table
    from geomesa_ray.stages.hexindex import hex_pip_count
    from geomesa_ray.stages.join import pip_join_broadcast

    sf = "/root/testdata/sf0.001"
    got = hex_pip_count(events_points(sf), polygons_table(), res=7)
    got_t = {r["poly_id"]: r["n_points"] for r in got.take_all()}
    ref = pip_join_broadcast(events_points(sf), polygons_table(),
                             predicate="intersects")
    import collections
    cnt = collections.Counter(
        r["poly_id"] for r in ref.select_columns(["poly_id"]).take_all()
    )
    assert got_t == dict(cnt)


def test_hex_indexed_scan_prunes_files(ray_session, tmp_path):
    """Layout round-trip: partitioned write, plan-time dir pruning
    (files_read < files_total), exact residual equals the direct filter."""
    from geomesa_ray.pipelines.queries import events_points
    from geomesa_ray.stages.hexindex import hex_indexed_scan, ingest_hex

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "hexlayout")
    ingest_hex(events_points(sf), out, res=2)
    stats = {}
    bbox = (20.0, 10.0, 60.0, 40.0)
    got = hex_indexed_scan(out, bbox, columns=["event_id"], stats=stats)
    ids = sorted(r["event_id"] for r in got.take_all())
    assert stats["files_total"] > 0
    assert 0 < stats["files_read"] < stats["files_total"]
    exp = sorted(
        r["event_id"]
        for r in events_points(sf).take_all()
        if bbox[0] <= r["lon"] <= bbox[2] and bbox[1] <= r["lat"] <= bbox[3]
    )
    assert ids == exp


def test_knn_hex_matches_brute(ray_session, tmp_path):
    """Hex-ring-expansion kNN equals the exhaustive scan, and its first
    round reads a strict subset of the layout's files."""
    from geomesa_ray.pipelines.knn import knn_brute, knn_hex_search
    from geomesa_ray.pipelines.queries import events_points
    from geomesa_ray.stages.hexindex import ingest_hex

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "hexknn")
    ingest_hex(events_points(sf), out, res=2)
    stats = {}
    got = knn_hex_search(out, [2.35], [48.85], 5, id_col="event_id",
                         start_radius_m=200_000.0, stats=stats).to_pandas()
    exp = knn_brute(events_points(sf), [2.35], [48.85], 5,
                    id_col="event_id").to_pandas()
    got = got.sort_values(["dist_m", "event_id"]).reset_index(drop=True)
    exp = exp.sort_values(["dist_m", "event_id"]).reset_index(drop=True)
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert stats["files_per_round"][0] > 0


def test_hex_pyramid_levels_sum_to_total(ray_session):
    """Every pyramid level preserves total count; level cells are valid
    at their resolution."""
    from geomesa_ray.pipelines.queries import events_points
    from geomesa_ray.stages.hexindex import hex_pyramid

    sf = "/root/testdata/sf0.001"
    rows = hex_pyramid(events_points(sf), 6, 4).take_all()
    import collections
    per_res = collections.defaultdict(int)
    for r in rows:
        per_res[r["res"]] += r["n_events"]
        dec_res, _, _ = hg.hex_decode(r["hex"])
        assert int(dec_res) == r["res"]
    assert set(per_res) == {4, 5, 6}
    assert len(set(per_res.values())) == 1  # same total at every level


def test_encode_keys_optin_s2_hex_columns(ray_session):
    """EncodeKeys with s2_level/hex_res appends the discrete-global-grid
    key columns; default schema unchanged."""
    import pyarrow as pa

    from geomesa_ray.stages.encode import EncodeKeys

    t = pa.table({
        "url": pa.array(["a", "b"]),
        "warc_ts": pa.array([0, 1], pa.int64()).cast(pa.timestamp("ms")),
        "lon": pa.array([2.35, -73.98]),
        "lat": pa.array([48.85, 40.75]),
    })
    base = EncodeKeys()(t)
    assert "s2" not in base.schema.names and "hex" not in base.schema.names
    keyed = EncodeKeys(s2_level=12, hex_res=7)(t)
    from geomesa_ray.curves.hexgrid import hex_encode
    from geomesa_ray.curves.s2 import lonlat_to_cell_id
    import numpy as np
    lon = np.array([2.35, -73.98]); lat = np.array([48.85, 40.75])
    assert keyed["hex"].to_pylist() == hex_encode(lon, lat, 7).tolist()
    assert keyed["s2"].to_pylist() == lonlat_to_cell_id(lon, lat, 12).astype("int64").tolist()


def test_hex_boundary_wkbs():
    """Boundary polygons parse as valid WKB, contain their own center and
    every point assigned to the cell; area matches the analytic hex area."""
    from geomesa_ray.geometry.predicates import points_in_polygon
    from geomesa_ray.geometry.wkb import from_wkb

    rng = np.random.default_rng(11)
    lon = rng.uniform(-170, 170, 300)
    lat = rng.uniform(-80, 80, 300)
    res = 7
    cells = hg.hex_encode(lon, lat, res)
    wkbs = hg.hex_boundary_wkbs(cells)
    hw, vv = hg.res_pitches(res)
    hw_d, vv_d = hw * 1e-5, vv * 1e-5
    # analytic Voronoi-cell area: 2*hw*vv in degree units
    expect_area = 2.0 * hw_d * vv_d
    for i in range(0, 300, 37):
        poly = from_wkb(wkbs[i].as_py())
        assert points_in_polygon(
            np.array([lon[i]]), np.array([lat[i]]), poly,
            include_boundary=True,
        )[0]
        ring = poly.shell if hasattr(poly, "shell") else poly.rings[0]
        xs = np.array([p[0] for p in ring]); ys = np.array([p[1] for p in ring])
        area = 0.5 * abs(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
        assert abs(area - expect_area) / expect_area < 1e-9


def test_k_ring_edge_cells_stay_on_lattice():
    """Ring ids at the world corner are all valid lattice cells (review
    finding: independent clipping used to fabricate odd-parity ids)."""
    c = int(hg.hex_encode(-180.0, -90.0, 8))
    ring = hg.k_ring(c, 2)
    _, a, b = hg.hex_decode(ring)
    assert (((a + b) % 2) == 0).all()
    assert (a >= 0).all() and (b >= 0).all()
    # out-of-lattice offsets collapse to the center cell (duplicates ok)
    assert c in set(ring.tolist())


def test_cli_scan_routes_hex_layout(ray_session, tmp_path):
    # cli.main owns (and shuts down) its OWN Ray session, so it must run
    # in a SUBPROCESS — in-process it would kill the shared test session
    # (test_route_cli.py convention)
    import json as _json
    import os
    import subprocess
    import sys

    from geomesa_ray.pipelines.queries import events_points
    from geomesa_ray.stages.hexindex import ingest_hex

    sf = "/root/testdata/sf0.001"
    layout = str(tmp_path / "hexcli")
    ingest_hex(events_points(sf), layout, res=2)
    env = {**os.environ, "RAY_ADDRESS": "local"}
    proc = subprocess.run(
        [sys.executable, "-m", "geomesa_ray.cli", "--num-cpus", "4",
         "scan", "--index", layout, "--bbox", "20,10,60,40",
         "--out", str(tmp_path / "out")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["layout"] == "hex" and res["rows"] > 0
    assert 0 < res["files_read"] < res["files_total"]
    # --interval on a hex layout must fail loudly, never silently superset
    proc2 = subprocess.run(
        [sys.executable, "-m", "geomesa_ray.cli", "--num-cpus", "4",
         "scan", "--index", layout, "--bbox", "20,10,60,40",
         "--interval", "2024-01-01/2024-01-08",
         "--out", str(tmp_path / "out2")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc2.returncode != 0
    assert "z-indexed" in proc2.stderr


def test_hex_zonal_stats_matches_broadcast_join(ray_session):
    """Zonal stats equals per-polygon aggregates of the broadcast join."""
    import collections

    import numpy as np

    from geomesa_ray.pipelines.queries import events_points, polygons_table
    from geomesa_ray.stages.hexindex import hex_zonal_stats
    from geomesa_ray.stages.join import pip_join_broadcast

    sf = "/root/testdata/sf0.001"
    got = {r["poly_id"]: (r["n_points"], r["sum_floor_value"], r["max_value"])
           for r in hex_zonal_stats(events_points(sf), polygons_table(),
                                    res=7).take_all()}
    ref = pip_join_broadcast(events_points(sf), polygons_table(),
                             predicate="intersects")
    agg = collections.defaultdict(lambda: [0, 0, -np.inf])
    for r in ref.select_columns(["poly_id", "value"]).take_all():
        a = agg[r["poly_id"]]
        a[0] += 1
        a[1] += int(np.floor(r["value"]))
        a[2] = max(a[2], r["value"])
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_hex_density_geojson_cli(ray_session, tmp_path):
    """CLI hexdensity writes a valid FeatureCollection whose per-feature
    counts sum to the input rows and whose hexagons contain... their cell."""
    import json as _json
    import os
    import subprocess
    import sys

    from geomesa_ray.pipelines.queries import events_points

    sf = "/root/testdata/sf0.001"
    src = str(tmp_path / "pts")
    events_points(sf).write_parquet(src)
    out = str(tmp_path / "hex.geojson")
    env = {**os.environ, "RAY_ADDRESS": "local"}
    proc = subprocess.run(
        [sys.executable, "-m", "geomesa_ray.cli", "--num-cpus", "4",
         "hexdensity", "--input", src, "--res", "5", "--out", out],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = _json.loads(proc.stdout.strip().splitlines()[-1])
    gj = _json.load(open(out))
    assert gj["type"] == "FeatureCollection"
    feats = gj["features"]
    assert len(feats) == res["features"] > 0
    assert sum(f["properties"]["n_events"] for f in feats) == 1000
    f0 = feats[0]
    ring = f0["geometry"]["coordinates"][0]
    assert len(ring) == 7 and ring[0] == ring[-1]
