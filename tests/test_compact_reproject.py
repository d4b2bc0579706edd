"""Compaction (scan-equivalence before/after) + reprojection + extract
error modes."""

import glob

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.geometry.reproject import (
    Reproject,
    lonlat_to_webmercator,
    transform_fn,
    webmercator_to_lonlat,
)
from geomesa_ray.pipelines.compact import compact
from geomesa_ray.pipelines.ingest import ingest_pages
from geomesa_ray.pipelines.scan import Query, scan
from geomesa_ray.sources.synth import generate_pages, write_pages_parquet
from geomesa_ray.stages.extract import ExtractGeo


def test_compaction_preserves_scans(ray_session, tmp_path):
    raw, idx = tmp_path / "raw", tmp_path / "idx"
    raw.mkdir()
    write_pages_parquet(str(raw), 4000, seed=88, shard_rows=1000)
    ingest_pages(str(raw), str(idx), n_groups=2, target_rows_per_file=300)
    q = Query(bbox=(-80, 30, 10, 55))
    before = sorted(scan(str(idx), q).to_pandas()["url"])
    n_files_before = len(glob.glob(f"{idx}/group=*/*.parquet"))
    done = compact(str(idx), target_rows_per_file=10_000)
    assert done == [0, 1]
    n_files_after = len(glob.glob(f"{idx}/group=*/*.parquet"))
    assert n_files_after < n_files_before
    after = sorted(scan(str(idx), q).to_pandas()["url"])
    assert after == before
    # second compaction is a no-op
    assert compact(str(idx), target_rows_per_file=10_000) == []


def test_recompacting_multifile_groups_preserves_data(ray_session, tmp_path):
    """Regression: a second compaction pass over a group whose first pass
    produced 2+ files must not clobber/delete live data (generation-unique
    compact file names)."""
    raw, idx = tmp_path / "raw", tmp_path / "idx"
    raw.mkdir()
    write_pages_parquet(str(raw), 3000, seed=99, shard_rows=500)
    ingest_pages(str(raw), str(idx), n_groups=1, target_rows_per_file=200)
    q = Query(bbox=(-180, -90, 180, 90))
    before = sorted(scan(str(idx), q).to_pandas()["url"])
    # first pass: small target → several compact-* files per group
    assert compact(str(idx), target_rows_per_file=700) == [0]
    mid = sorted(scan(str(idx), q).to_pandas()["url"])
    assert mid == before
    # second pass over the multi-file compacted group must keep all rows
    assert compact(str(idx), target_rows_per_file=10_000) == [0]
    after = sorted(scan(str(idx), q).to_pandas()["url"])
    assert after == before


def test_reprojection_roundtrip():
    lon = np.array([-74.0, 0.0, 139.69, 180.0])
    lat = np.array([40.7, 0.0, 35.69, 80.0])
    x, y = lonlat_to_webmercator(lon, lat)
    # known value: origin maps to (0, 0)
    assert x[1] == 0.0 and abs(y[1]) < 1e-9
    lon2, lat2 = webmercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    batch = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    out = Reproject("EPSG:4326", "EPSG:3857", out_x="mx", out_y="my")(batch)
    assert out["mx"].to_numpy().tolist() == x.tolist()
    with pytest.raises(NotImplementedError):
        Reproject("EPSG:4326", "EPSG:21781")  # Swiss oblique: not tabled


def test_utm_transverse_mercator():
    from geomesa_ray.geometry.reproject import (
        lonlat_to_utm,
        transform_fn,
        utm_to_lonlat,
    )

    # central meridian of zone 31N (3°E) at the equator → false easting only
    e, n = lonlat_to_utm(np.array([3.0]), np.array([0.0]), 31, False)
    assert abs(e[0] - 500_000.0) < 1e-6 and abs(n[0]) < 1e-6
    # meridian-arc anchor: 45°N on the central meridian; the WGS84 arc
    # length to 45° is 4984944.378 m (published), scaled by k0
    e2, n2 = lonlat_to_utm(np.array([3.0]), np.array([45.0]), 31, False)
    assert abs(n2[0] - 0.9996 * 4984944.378) < 0.01
    # round-trip precision across the zone band, both hemispheres
    rng = np.random.default_rng(5)
    lon = rng.uniform(0.5, 5.5, 500)
    lat = rng.uniform(-80.0, 84.0, 500)
    for south in (False, True):
        E, N = lonlat_to_utm(lon, lat, 31, south)
        lon2, lat2 = utm_to_lonlat(E, N, 31, south)
        np.testing.assert_allclose(lon2, lon, atol=1e-11)
        np.testing.assert_allclose(lat2, lat, atol=1e-11)
    # composed pair: 3857 → UTM equals 4326 → UTM
    f = transform_fn("EPSG:3857", "EPSG:32631")
    from geomesa_ray.geometry.reproject import lonlat_to_webmercator

    mx, my = lonlat_to_webmercator(np.array([2.2945]), np.array([48.8584]))
    ec, nc = f(mx, my)
    ed, nd = lonlat_to_utm(np.array([2.2945]), np.array([48.8584]), 31, False)
    assert abs(ec[0] - ed[0]) < 1e-6 and abs(nc[0] - nd[0]) < 1e-6


def test_st_transform_geometry():
    import pyarrow as pa

    from geomesa_ray.functions.st_functions import st_transform
    from geomesa_ray.geometry.base import LineString, Point, Polygon
    from geomesa_ray.geometry.reproject import lonlat_to_utm
    from geomesa_ray.geometry.wkb import from_wkb, to_wkb

    pt = Point(2.2945, 48.8584)
    line = LineString([(2.0, 48.0), (3.0, 49.0)])
    poly = Polygon([(2.0, 48.0), (3.0, 48.0), (3.0, 49.0), (2.0, 49.0)])
    col = pa.array([to_wkb(pt), to_wkb(line), to_wkb(poly)], pa.binary())
    out = st_transform(col, "EPSG:4326", "EPSG:32631")
    tp = from_wkb(out[0].as_py())
    e, n = lonlat_to_utm(np.array([pt.x]), np.array([pt.y]), 31, False)
    assert abs(tp.x - e[0]) < 1e-9 and abs(tp.y - n[0]) < 1e-9
    tpoly = from_wkb(out[2].as_py())
    assert tpoly.bounds[0] > 100_000  # meters now, not degrees
    # round-trip back to 4326
    back = st_transform(out, "EPSG:32631", "EPSG:4326")
    bl = from_wkb(back[1].as_py())
    np.testing.assert_allclose(bl.coords, line.coords, atol=1e-9)


def test_extract_error_modes():
    pages = generate_pages(500, seed=123)
    skip = ExtractGeo(error_mode="skip")
    out = skip(pages)
    assert skip.n_ok == len(out)
    assert skip.n_dropped == len(pages) - len(out)
    assert skip.n_dropped > 0  # fixture plants missing/malformed geotags

    ret = ExtractGeo(error_mode="return")
    out2 = ret(pages)
    assert len(out2) == len(pages)
    assert out2["extract_error"].to_numpy(zero_copy_only=False).sum() == skip.n_dropped

    with pytest.raises(ValueError, match="unparsable"):
        ExtractGeo(error_mode="raise")(pages)


# ---------------------------------------------------------------------------
# conic CRSes (LCC 2SP + Albers, Snyder PP 1395)
# ---------------------------------------------------------------------------

_CONIC_DOMAINS = {
    "EPSG:5070": (-125.0, -66.0, 24.0, 49.0),
    "EPSG:2154": (-5.0, 9.0, 41.0, 51.0),
    "EPSG:3083": (-107.0, -93.0, 25.5, 37.0),
    "EPSG:3978": (-141.0, -52.0, 41.0, 84.0),
}


@pytest.mark.parametrize("code", sorted(_CONIC_DOMAINS))
def test_conic_roundtrip_1e9(code):
    from geomesa_ray.geometry.reproject import transform_fn

    w, e, s, n = _CONIC_DOMAINS[code]
    rng = np.random.default_rng(42)
    lon = rng.uniform(w, e, 2000)
    lat = rng.uniform(s, n, 2000)
    fwd = transform_fn("EPSG:4326", code)
    inv = transform_fn(code, "EPSG:4326")
    lo, la = inv(*fwd(lon, lat))
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_conic_origin_maps_to_false_offsets():
    """Exact invariant from the formulas: (lon_0, lat_0) → (x_0, y_0)."""
    from geomesa_ray.geometry.reproject import _CONIC_CRS, transform_fn

    for code, p in _CONIC_CRS.items():
        x, y = transform_fn("EPSG:4326", code)(
            np.array([p["lon_0"]]), np.array([p["lat_0"]])
        )
        assert abs(x[0] - p["x_0"]) < 1e-6, code
        assert abs(y[0] - p["y_0"]) < 1e-6, code


def test_lambert93_published_value():
    """Paris (2.3522 E, 48.8566 N) in RGF93 / Lambert-93 — pinned to the
    published grid value to centimeter precision."""
    from geomesa_ray.geometry.reproject import transform_fn

    x, y = transform_fn("EPSG:4326", "EPSG:2154")(
        np.array([2.3522]), np.array([48.8566])
    )
    assert abs(x[0] - 652469.02) < 0.05
    assert abs(y[0] - 6862035.26) < 0.05


def test_lcc_unit_scale_at_standard_parallels():
    """Conformal scale factor h = k must be 1 on both standard parallels
    (finite-difference along the meridian, ellipsoidal radius M)."""
    from geomesa_ray.geometry.reproject import _CONIC_CRS, lonlat_to_lcc

    p = _CONIC_CRS["EPSG:2154"]
    a, f = p["a"], p["f"]
    e2 = 2 * f - f * f
    for lat in (p["lat_1"], p["lat_2"]):
        d = 1e-6  # degrees
        x1, y1 = lonlat_to_lcc(np.array([3.0]), np.array([lat - d]), p)
        x2, y2 = lonlat_to_lcc(np.array([3.0]), np.array([lat + d]), p)
        ds = np.hypot(x2 - x1, y2 - y1)[0]
        phi = np.radians(lat)
        M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        truth = M * np.radians(2 * d)
        assert abs(ds / truth - 1) < 1e-6


def test_albers_preserves_area_element():
    """Equal-area property: the numerical Jacobian det of (x,y) w.r.t.
    (lam, phi) equals the ellipsoidal area element
    a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2(phi))^2."""
    from geomesa_ray.geometry.reproject import _CONIC_CRS, lonlat_to_aea

    p = _CONIC_CRS["EPSG:5070"]
    a, f = p["a"], p["f"]
    e2 = 2 * f - f * f
    rng = np.random.default_rng(3)
    for lon, lat in zip(rng.uniform(-120, -70, 5), rng.uniform(25, 48, 5)):
        d = 1e-6
        x0, y0 = lonlat_to_aea(np.array([lon]), np.array([lat]), p)
        xl, yl = lonlat_to_aea(np.array([lon + d]), np.array([lat]), p)
        xp, yp = lonlat_to_aea(np.array([lon]), np.array([lat + d]), p)
        dd = np.radians(d)
        J = abs(
            (xl - x0) / dd * (yp - y0) / dd - (xp - x0) / dd * (yl - y0) / dd
        )[0]
        phi = np.radians(lat)
        truth = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
        assert abs(J / truth - 1) < 1e-4, (lon, lat)


def test_register_crs_and_composed_pair():
    from geomesa_ray.geometry.reproject import (
        _CONIC_CRS,
        register_crs,
        transform_fn,
    )

    register_crs(
        "TEST:LCC1SP",
        proj="lcc",
        lat_1=45.0,
        lat_2=45.0,  # degenerate pair → 1SP (n = sin(lat_1))
        lat_0=45.0,
        lon_0=10.0,
        x_0=0.0,
        y_0=0.0,
        a=6378137.0,
        f=1 / 298.257223563,
    )
    try:
        fn = transform_fn("TEST:LCC1SP", "EPSG:4326")
        lon, lat = fn(*transform_fn("EPSG:4326", "TEST:LCC1SP")(
            np.array([11.5]), np.array([46.5])
        ))
        assert abs(lon[0] - 11.5) < 1e-9 and abs(lat[0] - 46.5) < 1e-9
        # composed: UTM zone 31N -> CONUS Albers straight through 4326
        comp = transform_fn("EPSG:32614", "EPSG:5070")
        from geomesa_ray.geometry.reproject import lonlat_to_utm

        e_, n_ = lonlat_to_utm(np.array([-98.0]), np.array([35.0]), 14, False)
        x, y = comp(e_, n_)
        direct = transform_fn("EPSG:4326", "EPSG:5070")(
            np.array([-98.0]), np.array([35.0])
        )
        assert abs(x[0] - direct[0][0]) < 1e-6
        assert abs(y[0] - direct[1][0]) < 1e-6
    finally:
        _CONIC_CRS.pop("TEST:LCC1SP", None)

    with pytest.raises(ValueError):
        register_crs("TEST:BAD", proj="merc")


def test_compact_rerun_after_publish_crash_no_double_count(ray_session, tmp_path):
    """Crash window: a compaction that published its files but died before
    the old-file sweep + manifest write must NOT double-count rows when
    rerun — uncommitted compact files are orphans (round-3 review)."""
    import shutil

    from geomesa_ray.pipelines.compact import compact_group
    from geomesa_ray.state.manifest import load_manifest

    raw, idx = tmp_path / "raw", tmp_path / "idx"
    raw.mkdir()
    write_pages_parquet(str(raw), 2000, seed=77, shard_rows=500)
    ingest_pages(str(raw), str(idx), n_groups=1, target_rows_per_file=300)
    rows_before = load_manifest(str(idx))[0].rows_out
    group_dir = f"{idx}/group=0"
    originals = sorted(glob.glob(f"{group_dir}/*.parquet"))
    # simulate the crashed attempt: published compact files, manifest and
    # originals untouched
    for i, f in enumerate(originals[:2]):
        shutil.copy(f, f"{group_dir}/compact-g000-{i:05d}.parquet")
    entry = compact_group(str(idx), 0, target_rows_per_file=10_000)
    assert entry.rows_out == rows_before
    q = Query(bbox=(-180, -90, 180, 90))
    assert len(scan(str(idx), q).to_pandas()) == rows_before


# --- national TM grids (round 4: built-in EPSG parameter table) -------------


def test_osgb_worked_example_projection_kernel():
    """OS 'A guide to coordinate systems in Great Britain' worked example:
    OSGB36 52°39'27.2531"N, 1°43'4.5177"E → E 651409.903, N 313177.270
    (projection kernel only — the published vector is OSGB36-geodetic)."""
    from geomesa_ray.geometry.reproject import _TM_CRS, lonlat_to_tmerc

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = lonlat_to_tmerc(np.array([lon]), np.array([lat]), _TM_CRS["EPSG:27700"])
    assert abs(x[0] - 651409.903) < 1e-3
    assert abs(y[0] - 313177.270) < 1e-3


def test_nztm_origin_and_roundtrip():
    from geomesa_ray.geometry.reproject import _TM_CRS, lonlat_to_tmerc, tmerc_to_lonlat

    p = _TM_CRS["EPSG:2193"]
    x, y = lonlat_to_tmerc(np.array([173.0]), np.array([0.0]), p)
    assert abs(x[0] - 1_600_000.0) < 1e-6 and abs(y[0] - 10_000_000.0) < 1e-6
    lon = np.linspace(166.0, 179.0, 53)
    lat = np.linspace(-47.5, -34.0, 53)
    lo, la = tmerc_to_lonlat(*lonlat_to_tmerc(lon, lat, p), p)
    assert np.abs(lo - lon).max() < 1e-11 and np.abs(la - lat).max() < 1e-11


def test_etrs89_utm_matches_wgs84_utm_to_sub_mm():
    """GRS80 vs WGS84 flattening differ at 1e-11 — EPSG:25832 must agree
    with the WGS84 UTM-32 fast path to well under a millimeter."""
    from geomesa_ray.geometry.reproject import _TM_CRS, lonlat_to_tmerc, lonlat_to_utm

    lon = np.linspace(6.5, 11.5, 23)
    lat = np.linspace(47.0, 58.0, 23)
    e1, n1 = lonlat_to_utm(lon, lat, 32, False)
    e2, n2 = lonlat_to_tmerc(lon, lat, _TM_CRS["EPSG:25832"])
    assert np.abs(e1 - e2).max() < 1e-3 and np.abs(n1 - n2).max() < 1e-3


@pytest.mark.parametrize("code,lons,lats", [
    ("EPSG:27700", (-6.9, 1.9), (50.1, 58.9)),
    ("EPSG:2193", (166.5, 178.5), (-47.0, -34.5)),
    ("EPSG:25833", (12.0, 18.0), (35.0, 70.0)),
    ("EPSG:28355", (144.0, 150.0), (-43.5, -10.0)),
    ("EPSG:29902", (-10.7, -5.4), (51.3, 55.5)),
])
def test_national_grid_full_roundtrip_1e9(code, lons, lats):
    """4326 → grid → 4326 (incl. the Helmert datum hop for 27700) must
    round-trip ≤1e-9° — the VERDICT r3 item-4 acceptance bar."""
    fwd = transform_fn("EPSG:4326", code)
    inv = transform_fn(code, "EPSG:4326")
    lon = np.linspace(*lons, 101)
    lat = np.linspace(*lats, 101)
    lo, la = inv(*fwd(lon, lat))
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_osgb_full_chain_greenwich_offset():
    """The WGS84 prime meridian lies ~102 m east of the OSGB36 zero
    meridian (the Airy Transit Circle sits at WGS84 lon −0.00148°): the
    full 4326→27700 chain must reproduce that offset, which pins the
    Helmert hop's sign conventions against a public geodetic fact."""
    fwd = transform_fn("EPSG:4326", "EPSG:27700")
    x0, _ = fwd(np.array([0.0]), np.array([51.4779]))
    x1, _ = fwd(np.array([-0.00148]), np.array([51.4779]))
    assert 95.0 < (x0[0] - x1[0]) < 110.0   # ~102.6 m at that latitude
    assert 538_900.0 < x0[0] < 539_100.0    # known grid easting of WGS84 0°


def test_register_crs_tmerc_with_datum_roundtrip():
    """register_crs extension point for proj='tmerc' + towgs84."""
    from geomesa_ray.geometry.reproject import _TM_CRS, register_crs

    register_crs(
        "EPSG:900914", proj="tmerc", lat_0=36.0, lon_0=127.5, k=0.9996,
        x_0=1_000_000.0, y_0=2_000_000.0, a=6377397.155, f=1.0 / 299.1528128,
        towgs84=(-115.8, 474.99, 674.11, 1.16, -2.31, -1.63, 6.43),
    )
    try:
        fwd = transform_fn("EPSG:4326", "EPSG:900914")
        inv = transform_fn("EPSG:900914", "EPSG:4326")
        lon = np.linspace(125.0, 130.0, 31)
        lat = np.linspace(33.0, 39.0, 31)
        lo, la = inv(*fwd(lon, lat))
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9
    finally:
        _TM_CRS.pop("EPSG:900914", None)


def test_register_crs_conic_with_datum_roundtrip():
    """towgs84 composes with the conic arm too (lcc + Helmert)."""
    from geomesa_ray.geometry.reproject import _CONIC_CRS, register_crs

    register_crs(
        "EPSG:900915", proj="lcc", lat_1=51.1666672333, lat_2=49.8333339,
        lat_0=90.0, lon_0=4.3674866667, x_0=150000.013, y_0=5400088.438,
        a=6378388.0, f=1.0 / 297.0,
        towgs84=(-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747),
    )
    try:
        fwd = transform_fn("EPSG:4326", "EPSG:900915")
        inv = transform_fn("EPSG:900915", "EPSG:4326")
        lon = np.linspace(2.6, 6.3, 31)
        lat = np.linspace(49.6, 51.4, 31)
        lo, la = inv(*fwd(lon, lat))
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9
    finally:
        _CONIC_CRS.pop("EPSG:900915", None)


def test_proj_string_registration_matches_builtin_tables():
    """register_crs accepts a published proj4 string (VERDICT r4 next-round
    #5): the parsed EPSG:27700 string must reproduce the built-in
    national-grid entry bit-for-bit, and a proj-string UTM must match the
    built-in UTM kernel."""
    import numpy as np

    from geomesa_ray.geometry.reproject import (parse_proj_string,
                                                register_crs, transform_fn)

    p = parse_proj_string(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +ellps=airy "
        "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 "
        "+units=m +no_defs"
    )
    register_crs("TEST:27700", proj_string=(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +ellps=airy "
        "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 "
        "+units=m +no_defs"
    ))
    assert p["proj"] == "tmerc" and p["k"] == 0.9996012717
    assert p["a"] == 6377563.396 and len(p["towgs84"]) == 7
    lon = np.array([-1.5, 0.5, -5.2])
    lat = np.array([51.2, 52.9, 57.1])
    ours = transform_fn("EPSG:4326", "TEST:27700")(lon, lat)
    builtin = transform_fn("EPSG:4326", "EPSG:27700")(lon, lat)
    np.testing.assert_array_equal(ours[0], builtin[0])
    np.testing.assert_array_equal(ours[1], builtin[1])

    register_crs("TEST:32633", "+proj=utm +zone=33 +datum=WGS84")
    ours = transform_fn("EPSG:4326", "TEST:32633")(lon + 15, lat)
    builtin = transform_fn("EPSG:4326", "EPSG:32633")(lon + 15, lat)
    np.testing.assert_allclose(ours[0], builtin[0], atol=5e-4)  # k-series vs zone kernel
    np.testing.assert_allclose(ours[1], builtin[1], atol=5e-4)


def test_proj_string_roundtrip_1e9_and_longlat_datum():
    """Round-trip contract for proj-string CRS: 4326 → code → 4326 within
    1e-9°, including a conic with a Helmert hop (Belgian Lambert 72, whose
    projection origin sits at the pole) and a datum-shift-only geographic
    CRS (OSGB36 longlat)."""
    import numpy as np

    from geomesa_ray.geometry.reproject import register_crs, transform_fn

    register_crs("TEST:31370", (
        "+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 +lat_0=90 "
        "+lon_0=4.367486666666666 +x_0=150000.013 +y_0=5400088.438 "
        "+ellps=intl +towgs84=-106.8686,52.2978,-103.7239,0.3366,-0.457,"
        "1.8422,-1.2747 +units=m +no_defs"
    ))
    lon = np.array([3.2, 4.4, 5.8])
    lat = np.array([50.5, 50.85, 51.2])
    x, y = transform_fn("EPSG:4326", "TEST:31370")(lon, lat)
    # Belgian eastings/northings live in ~(20k-300k, 20k-250k)
    assert (x > 2e4).all() and (x < 3.1e5).all()
    lon2, lat2 = transform_fn("TEST:31370", "EPSG:4326")(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)

    register_crs("TEST:4277", (
        "+proj=longlat +ellps=airy "
        "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 +no_defs"
    ))
    glon, glat = transform_fn("EPSG:4326", "TEST:4277")(lon, lat)
    # OSGB36-WGS84 offset over Britain is order 1e-3 degrees, not zero
    assert (np.abs(glon - lon) > 1e-5).all()
    back = transform_fn("TEST:4277", "EPSG:4326")(glon, glat)
    np.testing.assert_allclose(back[0], lon, atol=1e-9)
    np.testing.assert_allclose(back[1], lat, atol=1e-9)

    # identity-datum geographic CRS (ETRS89): exact pass-through
    register_crs("TEST:4258", "+proj=longlat +ellps=GRS80 +no_defs")
    same = transform_fn("TEST:4258", "EPSG:4326")(lon, lat)
    np.testing.assert_array_equal(same[0], lon)

    # loud failures: unknown projection, stray parameter, non-metre units
    import pytest

    with pytest.raises(ValueError, match=r"\+proj"):
        register_crs("TEST:BAD1", "+proj=ortho +lat_0=0 +lon_0=0")
    with pytest.raises(ValueError, match="unsupported proj parameters"):
        register_crs("TEST:BAD2", "+proj=tmerc +ellps=WGS84 +pm=paris")
    with pytest.raises(ValueError, match=r"\+units"):
        register_crs("TEST:BAD3", "+proj=tmerc +ellps=WGS84 +units=us-ft")
