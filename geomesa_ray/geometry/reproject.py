"""Coordinate reprojection (index/utils/Reprojection.scala analog).

Implemented without a CRS library (none is available in this environment):

* EPSG:4326 (lon/lat) ↔ EPSG:3857 (spherical Web Mercator), closed form;
* EPSG:4326 ↔ every UTM zone (EPSG:32601-32660 north, 32701-32760 south)
  via the ellipsoidal Transverse Mercator in Krüger's n-series to 6th
  order (Karney 2011 formulation — sub-millimeter within a zone);
* EPSG:4326 ↔ the common national Transverse Mercator grids via a
  parameterized ellipsoidal TM (same Krüger series, arbitrary ellipsoid /
  origin / scale) — built in: EPSG:27700 (OSGB36 British National Grid,
  through a published 7-parameter Helmert datum hop), EPSG:2193
  (NZTM2000), EPSG:25832/25833 (ETRS89 UTM), EPSG:28355 (GDA94 MGA55);
* EPSG:4326 ↔ ellipsoidal Lambert Conformal Conic (2SP) and Albers
  Equal-Area conics (Snyder, *Map Projections — A Working Manual*, USGS
  PP 1395, pp. 98-110), parameterized by proj-style constants; a table of
  common codes ships built in (EPSG:5070 CONUS Albers, EPSG:2154
  Lambert-93, EPSG:3083 Texas Centric Albers, EPSG:3978 Canada Atlas
  Lambert) and :func:`register_crs` adds others. NAD83/RGF93 datums are
  treated as WGS84 (GRS80 ellipsoid constants; the datum shift is < 2 m,
  standard practice without a grid-shift file);
* any supported pair, composed through EPSG:4326.

Unknown CRS codes raise ``NotImplementedError``, keeping the extension
point explicit (reference: arbitrary-CRS reprojection via GeoTools,
index/utils/Reprojection.scala / GeometricDistanceFunctions.scala:21-41).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_R = 6378137.0  # WGS84 semi-major axis (Web Mercator sphere radius)
_MAX_LAT = 85.06  # Web Mercator latitude cutoff

# --- ellipsoidal Transverse Mercator (Krüger series, WGS84) -----------------

_A_WGS = 6378137.0
_F_WGS = 1.0 / 298.257223563
_N = _F_WGS / (2.0 - _F_WGS)
_A_BAR = _A_WGS / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64 + _N**6 / 256)
_K0 = 0.9996

def _kruger_series(n: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(alpha, beta, delta) Krüger 6th-order coefficient arrays for third
    flattening ``n`` (Karney 2011 Tables; same expressions the module-level
    WGS84 constants were built from, so those stay bit-identical)."""
    alpha = np.array([
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
        - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    ])
    # geographic latitude from conformal latitude (series in n)
    delta = np.array([
        2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45 + 26 * n**5 / 45
        - 2854 * n**6 / 675,
        7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45 + 2704 * n**5 / 315
        + 2323 * n**6 / 945,
        56 * n**3 / 15 - 136 * n**4 / 35 - 1262 * n**5 / 105
        + 73814 * n**6 / 2835,
        4279 * n**4 / 630 - 332 * n**5 / 35 - 399572 * n**6 / 14175,
        4174 * n**5 / 315 - 144838 * n**6 / 6237,
        601676 * n**6 / 22275,
    ])
    return alpha, beta, delta


_ALPHA, _BETA, _DELTA = _kruger_series(_N)


def lonlat_to_utm(lon, lat, zone: int, south: bool) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 lon/lat → UTM easting/northing (Krüger n-series forward)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon0 = np.radians(6.0 * zone - 183.0)
    lam = np.radians(lon) - lon0
    phi = np.radians(lat)
    s2n = 2 * np.sqrt(_N) / (1 + _N)
    t = np.sinh(np.arctanh(np.sin(phi)) - s2n * np.arctanh(s2n * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    j = np.arange(1, 7, dtype=np.float64)
    xi = xi_p + np.sum(
        _ALPHA * np.sin(2 * j * xi_p[..., None]) * np.cosh(2 * j * eta_p[..., None]),
        axis=-1,
    )
    eta = eta_p + np.sum(
        _ALPHA * np.cos(2 * j * xi_p[..., None]) * np.sinh(2 * j * eta_p[..., None]),
        axis=-1,
    )
    e = 500_000.0 + _K0 * _A_BAR * eta
    n = _K0 * _A_BAR * xi + (10_000_000.0 if south else 0.0)
    return e, n


def utm_to_lonlat(e, n, zone: int, south: bool) -> tuple[np.ndarray, np.ndarray]:
    """UTM easting/northing → WGS84 lon/lat (Krüger n-series inverse)."""
    e = np.asarray(e, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    xi = (n - (10_000_000.0 if south else 0.0)) / (_K0 * _A_BAR)
    eta = (e - 500_000.0) / (_K0 * _A_BAR)
    j = np.arange(1, 7, dtype=np.float64)
    xi_p = xi - np.sum(
        _BETA * np.sin(2 * j * xi[..., None]) * np.cosh(2 * j * eta[..., None]),
        axis=-1,
    )
    eta_p = eta - np.sum(
        _BETA * np.cos(2 * j * xi[..., None]) * np.sinh(2 * j * eta[..., None]),
        axis=-1,
    )
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi + np.sum(_DELTA * np.sin(2 * j * chi[..., None]), axis=-1)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon0 = 6.0 * zone - 183.0
    return lon0 + np.degrees(lam), np.degrees(phi)


# --- general Transverse Mercator (arbitrary ellipsoid / origin) -------------
# Same Krüger n-series as the UTM fast path above, parameterized by
# proj-style constants (lat_0, lon_0, k, x_0, y_0, a, f) so the common
# national grids (OSGB 27700, NZTM 2193, ETRS89/GDA UTM variants) resolve
# without a CRS library. Reference analog: GeoTools EPSG registry via
# index/utils/Reprojection.scala / GeometricDistanceFunctions.scala:21-41.

_TMERC_CACHE: dict[tuple[float, float], tuple] = {}


def _tmerc_consts(a: float, f: float):
    """Per-ellipsoid Krüger constants, cached by (a, f)."""
    key = (a, f)
    hit = _TMERC_CACHE.get(key)
    if hit is None:
        n = f / (2.0 - f)
        a_bar = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
        hit = (n, a_bar) + _kruger_series(n)
        _TMERC_CACHE[key] = hit
    return hit


def _tmerc_xi_eta(lon_rad, lat_rad, lon0_rad, n, alpha):
    """Conformal-sphere forward: (xi, eta) Gauss-Krüger coordinates."""
    lam = lon_rad - lon0_rad
    s2n = 2 * np.sqrt(n) / (1 + n)
    t = np.sinh(
        np.arctanh(np.sin(lat_rad)) - s2n * np.arctanh(s2n * np.sin(lat_rad))
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    j = np.arange(1, 7, dtype=np.float64)
    xi = xi_p + np.sum(
        alpha * np.sin(2 * j * xi_p[..., None]) * np.cosh(2 * j * eta_p[..., None]),
        axis=-1,
    )
    eta = eta_p + np.sum(
        alpha * np.cos(2 * j * xi_p[..., None]) * np.sinh(2 * j * eta_p[..., None]),
        axis=-1,
    )
    return xi, eta


def _tmerc_m0(p: dict) -> float:
    """Meridian-arc northing of the projection origin (k * A_bar * xi at
    (lat_0, lon_0)) — subtracted so lat_0 maps to northing y_0."""
    if p["lat_0"] == 0.0:
        return 0.0
    n, a_bar, alpha, _beta, _delta = _tmerc_consts(p["a"], p["f"])
    xi0, _ = _tmerc_xi_eta(
        np.float64(np.radians(p["lon_0"])),
        np.float64(np.radians(p["lat_0"])),
        np.radians(p["lon_0"]), n, alpha,
    )
    return float(p["k"] * a_bar * xi0)


def lonlat_to_tmerc(lon, lat, p: dict) -> tuple[np.ndarray, np.ndarray]:
    """Geodetic lon/lat (on p's ellipsoid) → Transverse Mercator x/y."""
    n, a_bar, alpha, _beta, _delta = _tmerc_consts(p["a"], p["f"])
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    xi, eta = _tmerc_xi_eta(
        np.radians(lon), np.radians(lat), np.radians(p["lon_0"]), n, alpha
    )
    x = p["x_0"] + p["k"] * a_bar * eta
    y = p["y_0"] + p["k"] * a_bar * xi - _tmerc_m0(p)
    return x, y


def tmerc_to_lonlat(x, y, p: dict) -> tuple[np.ndarray, np.ndarray]:
    """Transverse Mercator x/y → geodetic lon/lat on p's ellipsoid."""
    n, a_bar, _alpha, beta, delta = _tmerc_consts(p["a"], p["f"])
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xi = (y - p["y_0"] + _tmerc_m0(p)) / (p["k"] * a_bar)
    eta = (x - p["x_0"]) / (p["k"] * a_bar)
    j = np.arange(1, 7, dtype=np.float64)
    xi_p = xi - np.sum(
        beta * np.sin(2 * j * xi[..., None]) * np.cosh(2 * j * eta[..., None]),
        axis=-1,
    )
    eta_p = eta - np.sum(
        beta * np.cos(2 * j * xi[..., None]) * np.sinh(2 * j * eta[..., None]),
        axis=-1,
    )
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi + np.sum(delta * np.sin(2 * j * chi[..., None]), axis=-1)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return p["lon_0"] + np.degrees(lam), np.degrees(phi)


# --- 7-parameter Helmert datum shift (EPSG 9606, position vector) -----------


def _geodetic_to_ecef(lon, lat, a: float, f: float):
    """Geodetic lon/lat (deg, h=0) → geocentric X/Y/Z on the ellipsoid."""
    e2 = 2 * f - f * f
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    cphi = np.cos(phi)
    return nu * cphi * np.cos(lam), nu * cphi * np.sin(lam), nu * (1 - e2) * np.sin(phi)


def _ecef_to_geodetic(X, Y, Z, a: float, f: float):
    """Geocentric X/Y/Z → geodetic lon/lat (deg), fixed-point in tan(phi)
    (converges below 1e-12 rad in <10 rounds for surface points)."""
    e2 = 2 * f - f * f
    lam = np.arctan2(Y, X)
    rho = np.sqrt(X * X + Y * Y)
    phi = np.arctan2(Z, rho * (1 - e2))
    for _ in range(10):
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        phi = np.arctan2(Z + e2 * nu * np.sin(phi), rho)
    return np.degrees(lam), np.degrees(phi)


_ARCSEC = np.pi / (180.0 * 3600.0)


def _helmert_matrix(towgs84) -> tuple[np.ndarray, np.ndarray]:
    """(M, T): local-datum ECEF → WGS84 ECEF as X' = M @ X + T (position-
    vector sign convention; rotations in arcsec, scale in ppm)."""
    dx, dy, dz, rx, ry, rz, ds = towgs84
    rx, ry, rz = rx * _ARCSEC, ry * _ARCSEC, rz * _ARCSEC
    s = 1.0 + ds * 1e-6
    m = s * np.array([[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
    return m, np.array([dx, dy, dz], np.float64)


def _wgs84_to_datum(lon, lat, p: dict):
    m, t = _helmert_matrix(p["towgs84"])
    xyz = np.stack(_geodetic_to_ecef(lon, lat, _A_WGS, _F_WGS))
    # exact inverse of the (small-angle) forward map — solve, don't negate
    # the parameters, so the ECEF hop itself is bit-exactly invertible
    out = np.linalg.solve(m, xyz.reshape(3, -1) - t[:, None])
    return _ecef_to_geodetic(out[0], out[1], out[2], p["a"], p["f"])


def _datum_to_wgs84(lon, lat, p: dict):
    m, t = _helmert_matrix(p["towgs84"])
    xyz = np.stack(_geodetic_to_ecef(lon, lat, p["a"], p["f"]))
    out = m @ xyz.reshape(3, -1) + t[:, None]
    w_lon, w_lat = _ecef_to_geodetic(out[0], out[1], out[2], _A_WGS, _F_WGS)
    # The 2D hop drops ellipsoidal height (projections are planar), so the
    # direct ECEF path is only the inverse of _wgs84_to_datum to ~2 mm
    # (the dropped ±50 m height rides the ~0.5″ Helmert rotation). Two
    # fixed-point refinements against the forward map make this the exact
    # functional inverse (residual < 1e-12°), so 4326→code→4326
    # round-trips meet the 1e-9° contract.
    for _ in range(2):
        d_lon, d_lat = _wgs84_to_datum(w_lon, w_lat, p)
        w_lon = w_lon + (lon - d_lon)
        w_lat = w_lat + (lat - d_lat)
    return w_lon, w_lat


# --- built-in national Transverse Mercator grids -----------------------------

_AIRY_A, _AIRY_F = 6377563.396, 1.0 / 299.3249646         # Airy 1830
_GRS80_A = 6378137.0

# proj-style parameters per EPSG code; towgs84 = published Helmert to
# WGS84 (position vector). ETRS89 / NZGD2000 / GDA94 are WGS84-equivalent
# at this accuracy (no towgs84); OSGB36 ships the standard 7-parameter
# set (~2 m vs the OSTN grid — the accepted grid-free practice).
_TM_CRS: dict[str, dict] = {
    # OSGB36 / British National Grid
    "EPSG:27700": dict(
        proj="tmerc", lat_0=49.0, lon_0=-2.0, k=0.9996012717,
        x_0=400000.0, y_0=-100000.0, a=_AIRY_A, f=_AIRY_F,
        towgs84=(446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.489),
    ),
    # NZGD2000 / New Zealand Transverse Mercator 2000
    "EPSG:2193": dict(
        proj="tmerc", lat_0=0.0, lon_0=173.0, k=0.9996,
        x_0=1600000.0, y_0=10000000.0, a=_GRS80_A, f=1.0 / 298.257222101,
    ),
    # ETRS89 / UTM zones 32N, 33N (GRS80 — differs from WGS84 UTM only in
    # the 1e-10 flattening gap, kept separate for parameter honesty)
    "EPSG:25832": dict(
        proj="tmerc", lat_0=0.0, lon_0=9.0, k=0.9996,
        x_0=500000.0, y_0=0.0, a=_GRS80_A, f=1.0 / 298.257222101,
    ),
    "EPSG:25833": dict(
        proj="tmerc", lat_0=0.0, lon_0=15.0, k=0.9996,
        x_0=500000.0, y_0=0.0, a=_GRS80_A, f=1.0 / 298.257222101,
    ),
    # GDA94 / MGA zone 55 (southeast Australia)
    "EPSG:28355": dict(
        proj="tmerc", lat_0=0.0, lon_0=147.0, k=0.9996,
        x_0=500000.0, y_0=10000000.0, a=_GRS80_A, f=1.0 / 298.257222101,
    ),
    # TM65 / Irish Grid and TM75 / Irish Grid (Airy Modified 1849; both
    # datums ship the same published OSi/OSNI 7-parameter set)
    "EPSG:29902": dict(
        proj="tmerc", lat_0=53.5, lon_0=-8.0, k=1.000035,
        x_0=200000.0, y_0=250000.0, a=6377340.189, f=1.0 / 299.3249646,
        towgs84=(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15),
    ),
    "EPSG:29903": dict(
        proj="tmerc", lat_0=53.5, lon_0=-8.0, k=1.000035,
        x_0=200000.0, y_0=250000.0, a=6377340.189, f=1.0 / 299.3249646,
        towgs84=(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15),
    ),
}


def _tm_fns(code: str):
    """(to_4326, from_4326) for a tabled tmerc code, else None — with the
    Helmert datum hop composed in when the entry carries towgs84."""
    p = _TM_CRS.get(code)
    if p is None:
        return None
    if "towgs84" in p:
        return (
            lambda x, y: _datum_to_wgs84(*tmerc_to_lonlat(x, y, p), p),
            lambda lon, lat: lonlat_to_tmerc(*_wgs84_to_datum(lon, lat, p), p),
        )
    return (
        lambda x, y: tmerc_to_lonlat(x, y, p),
        lambda lon, lat: lonlat_to_tmerc(lon, lat, p),
    )


# --- conic projections (ellipsoidal LCC 2SP + Albers; Snyder PP 1395) -------

_GRS80_F = 1.0 / 298.257222101  # NAD83 / RGF93 ellipsoid flattening

# proj-style parameters per EPSG code; angles in degrees
_CONIC_CRS: dict[str, dict] = {
    # NAD83 / Conus Albers
    "EPSG:5070": dict(proj="aea", lat_1=29.5, lat_2=45.5, lat_0=23.0,
                      lon_0=-96.0, x_0=0.0, y_0=0.0, a=6378137.0, f=_GRS80_F),
    # RGF93 / Lambert-93
    "EPSG:2154": dict(proj="lcc", lat_1=49.0, lat_2=44.0, lat_0=46.5,
                      lon_0=3.0, x_0=700000.0, y_0=6600000.0,
                      a=6378137.0, f=_GRS80_F),
    # NAD83 / Texas Centric Albers Equal Area
    "EPSG:3083": dict(proj="aea", lat_1=27.5, lat_2=35.0, lat_0=18.0,
                      lon_0=-100.0, x_0=1500000.0, y_0=6000000.0,
                      a=6378137.0, f=_GRS80_F),
    # NAD83 / Canada Atlas Lambert
    "EPSG:3978": dict(proj="lcc", lat_1=49.0, lat_2=77.0, lat_0=49.0,
                      lon_0=-95.0, x_0=0.0, y_0=0.0,
                      a=6378137.0, f=_GRS80_F),
}


# named ellipsoids (published proj/EPSG constants): a, inverse flattening
# (or b for the historically b-defined ones)
_ELLPS: dict[str, tuple[float, float]] = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "mod_airy": (6377340.189, 299.3249646),
    "intl": (6378388.0, 297.0),
    "bessel": (6377397.155, 299.1528128),
    "krass": (6378245.0, 298.3),
    "clrk66": (6378206.4, 294.9786982),
    "clrk80ign": (6378249.2, 293.4660213),
    "sphere": (6370997.0, 0.0),
}

# geographic CRS on a non-WGS84 datum (+proj=longlat +towgs84=...):
# no projection, just the Helmert hop
_LONGLAT_CRS: dict[str, dict] = {}


def parse_proj_string(s: str) -> dict:
    """Parse a proj4-style parameter string (``+proj=tmerc +lat_0=49 …``)
    into the params dict used by the projection tables. Supported
    projections: tmerc, utm (lowered to tmerc), lcc, aea, longlat.
    Ellipsoids via ``+a``/``+rf`` (or ``+b``), or named ``+ellps``;
    ``+towgs84`` with 3 or 7 comma-separated values composes the Helmert
    datum hop. Unknown switches that cannot change the math (``+no_defs``,
    ``+units=m``, ``+datum=WGS84``, ``+type=crs``, ``+wktext``) are
    ignored; anything else raises loudly rather than silently mis-project."""
    kv: dict[str, str | bool] = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
        else:
            kv[tok] = True

    proj = kv.pop("proj", None)
    if proj not in ("tmerc", "utm", "lcc", "aea", "longlat", "latlong"):
        raise ValueError(f"unsupported +proj={proj}")

    # ellipsoid
    a = f = None
    if "a" in kv:
        a = float(kv.pop("a"))
        if "rf" in kv:
            rf = float(kv.pop("rf"))
            f = 1.0 / rf if rf else 0.0
        elif "b" in kv:
            b = float(kv.pop("b"))
            f = (a - b) / a
        elif "f" in kv:
            f = float(kv.pop("f"))
        else:
            f = 0.0  # sphere
    else:
        name = kv.pop("ellps", None) or (
            "WGS84" if kv.get("datum") == "WGS84" else None
        )
        if name is None and proj in ("longlat", "latlong"):
            name = "WGS84"
        if name not in _ELLPS:
            raise ValueError(f"unknown +ellps={name} (and no +a given)")
        a, rf = _ELLPS[name]
        f = 1.0 / rf if rf else 0.0
    kv.pop("datum", None)

    params: dict = dict(a=a, f=f)
    if "towgs84" in kv:
        t = tuple(float(v) for v in str(kv.pop("towgs84")).split(","))
        if len(t) == 3:
            t = t + (0.0, 0.0, 0.0, 0.0)
        if len(t) != 7:
            raise ValueError("+towgs84 needs 3 or 7 values")
        if any(t):  # all-zero means WGS84-equivalent: skip the hop
            params["towgs84"] = t

    if proj == "utm":
        zone = int(kv.pop("zone"))
        if not 1 <= zone <= 60:
            raise ValueError(f"bad +zone={zone}")
        params.update(
            proj="tmerc", lat_0=0.0, lon_0=zone * 6.0 - 183.0, k=0.9996,
            x_0=500000.0, y_0=10000000.0 if kv.pop("south", False) else 0.0,
        )
    elif proj == "tmerc":
        params.update(
            proj="tmerc",
            lat_0=float(kv.pop("lat_0", 0.0)),
            lon_0=float(kv.pop("lon_0", 0.0)),
            k=float(kv.pop("k", kv.pop("k_0", 1.0))),
            x_0=float(kv.pop("x_0", 0.0)),
            y_0=float(kv.pop("y_0", 0.0)),
        )
        kv.pop("k_0", None)
    elif proj in ("lcc", "aea"):
        lat_1 = float(kv.pop("lat_1"))
        params.update(
            proj=proj,
            lat_1=lat_1,
            lat_2=float(kv.pop("lat_2", lat_1)),
            lat_0=float(kv.pop("lat_0", 0.0)),
            lon_0=float(kv.pop("lon_0", 0.0)),
            x_0=float(kv.pop("x_0", 0.0)),
            y_0=float(kv.pop("y_0", 0.0)),
        )
    else:  # longlat / latlong
        params["proj"] = "longlat"

    if kv.get("units", "m") != "m":
        raise ValueError(f"unsupported +units={kv['units']}")
    for ignorable in ("units", "no_defs", "type", "wktext", "nadgrids"):
        kv.pop(ignorable, None)
    if kv:
        raise ValueError(f"unsupported proj parameters: {sorted(kv)}")
    return params


def register_crs(code: str, proj_string: str | None = None, **params) -> None:
    """Register a CRS by proj-style constants — the SPI-analog extension
    point for codes outside the built-in tables. Accepts EITHER a proj4
    parameter string (``register_crs("EPSG:31370", "+proj=lcc +lat_1=…")``
    — any published EPSG entry works without code changes) or keyword
    constants: ``proj`` is "lcc" / "aea" (``lat_1``/``lat_2`` standard
    parallels, ``lat_0``/``lon_0`` origin, ``x_0``/``y_0`` false offsets,
    ``a`` semi-major, ``f`` flattening), "tmerc" (``lat_0``/``lon_0``/
    ``k``/``x_0``/``y_0``/``a``/``f``), or "longlat" (datum-shift-only
    geographic CRS). An optional ``towgs84`` 7-tuple (dx, dy, dz, rx″,
    ry″, rz″, ds ppm; EPSG 9606 position-vector) composes a Helmert datum
    hop with the projection."""
    if proj_string is not None:
        if params:
            raise ValueError("pass a proj string OR keyword params, not both")
        params = parse_proj_string(proj_string)
    proj = params.get("proj")
    if proj == "tmerc":
        _TM_CRS[code.upper()] = params
    elif proj in ("lcc", "aea"):
        _CONIC_CRS[code.upper()] = params
    elif proj == "longlat":
        _LONGLAT_CRS[code.upper()] = params
    else:
        raise ValueError("proj must be 'lcc', 'aea', 'tmerc', or 'longlat'")


def _lcc_consts(p: dict):
    e = np.sqrt(2 * p["f"] - p["f"] ** 2)
    phi1, phi2 = np.radians(p["lat_1"]), np.radians(p["lat_2"])
    phi0 = np.radians(p["lat_0"])

    def m(phi):
        return np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)

    def t(phi):
        es = e * np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)

    if abs(phi1 - phi2) < 1e-12:
        n = np.sin(phi1)
    else:
        n = (np.log(m(phi1)) - np.log(m(phi2))) / (np.log(t(phi1)) - np.log(t(phi2)))
    F = m(phi1) / (n * t(phi1) ** n)
    rho0 = p["a"] * F * t(phi0) ** n
    return e, n, F, rho0, t


def lonlat_to_lcc(lon, lat, p: dict) -> tuple[np.ndarray, np.ndarray]:
    """Ellipsoidal Lambert Conformal Conic 2SP forward (Snyder 15-1..15-10)."""
    e, n, F, rho0, t = _lcc_consts(p)
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    rho = p["a"] * F * t(phi) ** n
    theta = n * (lam - np.radians(p["lon_0"]))
    x = rho * np.sin(theta) + p["x_0"]
    y = rho0 - rho * np.cos(theta) + p["y_0"]
    return x, y


def lcc_to_lonlat(x, y, p: dict) -> tuple[np.ndarray, np.ndarray]:
    """LCC 2SP inverse (Snyder 15-11 + iterated 7-9)."""
    e, n, F, rho0, _t = _lcc_consts(p)
    xp = np.asarray(x, np.float64) - p["x_0"]
    yp = rho0 - (np.asarray(y, np.float64) - p["y_0"])
    rho = np.sign(n) * np.sqrt(xp**2 + yp**2)
    theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    t_ = (rho / (p["a"] * F)) ** (1 / n)
    lam = theta / n + np.radians(p["lon_0"])
    phi = np.pi / 2 - 2 * np.arctan(t_)
    for _ in range(8):
        es = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t_ * ((1 - es) / (1 + es)) ** (e / 2))
    return np.degrees(lam), np.degrees(phi)


def _aea_consts(p: dict):
    e = np.sqrt(2 * p["f"] - p["f"] ** 2)
    phi1, phi2 = np.radians(p["lat_1"]), np.radians(p["lat_2"])
    phi0 = np.radians(p["lat_0"])

    def m(phi):
        return np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)

    def q(phi):
        es = e * np.sin(phi)
        return (1 - e**2) * (
            np.sin(phi) / (1 - es**2) - (1 / (2 * e)) * np.log((1 - es) / (1 + es))
        )

    if abs(phi1 - phi2) < 1e-12:
        n = np.sin(phi1)
    else:
        n = (m(phi1) ** 2 - m(phi2) ** 2) / (q(phi2) - q(phi1))
    C = m(phi1) ** 2 + n * q(phi1)
    rho0 = p["a"] * np.sqrt(C - n * q(phi0)) / n
    return e, n, C, rho0, q


def lonlat_to_aea(lon, lat, p: dict) -> tuple[np.ndarray, np.ndarray]:
    """Ellipsoidal Albers Equal-Area forward (Snyder 14-1..14-12)."""
    e, n, C, rho0, q = _aea_consts(p)
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    rho = p["a"] * np.sqrt(C - n * q(phi)) / n
    theta = n * (lam - np.radians(p["lon_0"]))
    x = rho * np.sin(theta) + p["x_0"]
    y = rho0 - rho * np.cos(theta) + p["y_0"]
    return x, y


def aea_to_lonlat(x, y, p: dict) -> tuple[np.ndarray, np.ndarray]:
    """Albers inverse (Snyder 14-19..14-21 + iterated 3-16)."""
    e, n, C, rho0, q_fn = _aea_consts(p)
    xp = np.asarray(x, np.float64) - p["x_0"]
    yp = rho0 - (np.asarray(y, np.float64) - p["y_0"])
    rho = np.sqrt(xp**2 + yp**2)
    theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    q_ = (C - (rho * n / p["a"]) ** 2) / n
    lam = theta / n + np.radians(p["lon_0"])
    # iterate Snyder 3-16 for phi from the authalic q
    phi = np.arcsin(np.clip(q_ / 2, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        es = e * s
        one = 1 - es**2
        phi = phi + one**2 / (2 * np.cos(phi)) * (
            q_ / (1 - e**2) - s / one + (1 / (2 * e)) * np.log((1 - es) / (1 + es))
        )
    return np.degrees(lam), np.degrees(phi)


def _conic_fns(code: str):
    """(to_4326, from_4326) for a registered conic code, else None — with
    the Helmert datum hop composed in when the entry carries towgs84."""
    p = _CONIC_CRS.get(code)
    if p is None:
        return None
    if p["proj"] == "lcc":
        inv, fwd = lcc_to_lonlat, lonlat_to_lcc
    else:
        inv, fwd = aea_to_lonlat, lonlat_to_aea
    if "towgs84" in p:
        return (
            lambda x, y: _datum_to_wgs84(*inv(x, y, p), p),
            lambda lon, lat: fwd(*_wgs84_to_datum(lon, lat, p), p),
        )
    return (
        lambda x, y: inv(x, y, p),
        lambda lon, lat: fwd(lon, lat, p),
    )


def _parse_utm(code: str):
    """EPSG:326xx/327xx → (zone, south) or None."""
    if not code.startswith("EPSG:"):
        return None
    try:
        num = int(code[5:])
    except ValueError:
        return None
    if 32601 <= num <= 32660:
        return num - 32600, False
    if 32701 <= num <= 32760:
        return num - 32700, True
    return None


def lonlat_to_webmercator(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -_MAX_LAT, _MAX_LAT)
    x = _R * np.radians(lon)
    y = _R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmercator_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R)
    lat = np.degrees(2 * np.arctan(np.exp(y / _R)) - np.pi / 2)
    return lon, lat


def _to_4326(code: str):
    """Transform fn <code> → 4326, or None for identity / unknown."""
    if code == "EPSG:4326":
        return None
    if code == "EPSG:3857":
        return webmercator_to_lonlat
    utm = _parse_utm(code)
    if utm is not None:
        zone, south = utm
        return lambda x, y: utm_to_lonlat(x, y, zone, south)
    tm = _tm_fns(code)
    if tm is not None:
        return tm[0]
    conic = _conic_fns(code)
    if conic is not None:
        return conic[0]
    ll = _LONGLAT_CRS.get(code)
    if ll is not None:
        if "towgs84" not in ll:
            return None  # WGS84-equivalent geographic CRS: identity
        return lambda lon, lat: _datum_to_wgs84(lon, lat, ll)
    raise NotImplementedError(f"unsupported CRS {code}")


def _from_4326(code: str):
    if code == "EPSG:4326":
        return None
    if code == "EPSG:3857":
        return lonlat_to_webmercator
    utm = _parse_utm(code)
    if utm is not None:
        zone, south = utm
        return lambda lon, lat: lonlat_to_utm(lon, lat, zone, south)
    tm = _tm_fns(code)
    if tm is not None:
        return tm[1]
    conic = _conic_fns(code)
    if conic is not None:
        return conic[1]
    ll = _LONGLAT_CRS.get(code)
    if ll is not None:
        if "towgs84" not in ll:
            return None
        return lambda lon, lat: _wgs84_to_datum(lon, lat, ll)
    raise NotImplementedError(f"unsupported CRS {code}")


def transform_fn(src: str, dst: str):
    """(x, y) arrays → (x', y') arrays for any supported CRS pair
    (composed through EPSG:4326)."""
    src, dst = src.upper(), dst.upper()
    inv = _to_4326(src)
    fwd = _from_4326(dst)
    if inv is None and fwd is None:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    if inv is None:
        return fwd
    if fwd is None:
        return inv
    return lambda x, y: fwd(*inv(x, y))


class Reproject:
    """map_batches stage: transform (x_col, y_col) between CRSes, writing
    ``out_x``/``out_y`` columns (defaults overwrite in place). Supported:
    EPSG:4326, EPSG:3857, all UTM zones EPSG:326xx/327xx, the built-in +
    :func:`register_crs` national TM grids (27700/2193/25832/25833/28355)
    and conic CRSes (LCC 2SP / Albers), optionally through a Helmert
    datum hop, and any pair of those (composed through 4326)."""

    def __init__(self, src: str, dst: str, x_col: str = "lon", y_col: str = "lat",
                 out_x: str | None = None, out_y: str | None = None):
        self.fn = transform_fn(src, dst)
        self.x_col = x_col
        self.y_col = y_col
        self.out_x = out_x or x_col
        self.out_y = out_y or y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x, y = self.fn(
            batch[self.x_col].to_numpy(zero_copy_only=False),
            batch[self.y_col].to_numpy(zero_copy_only=False),
        )
        for name, arr in ((self.out_x, x), (self.out_y, y)):
            col = pa.array(arr, pa.float64())
            if name in batch.schema.names:
                batch = batch.set_column(batch.schema.get_field_index(name), name, col)
            else:
                batch = batch.append_column(name, col)
        return batch
