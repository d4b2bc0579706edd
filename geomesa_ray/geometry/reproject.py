"""Coordinate reprojection (index/utils/Reprojection.scala analog).

Implemented without a CRS library (none is available in this environment):

* EPSG:4326 (lon/lat) ↔ EPSG:3857 (spherical Web Mercator), closed form;
* EPSG:4326 ↔ every UTM zone (EPSG:32601-32660 north, 32701-32760 south)
  via the ellipsoidal Transverse Mercator in Krüger's n-series to 6th
  order (Karney 2011 formulation — sub-millimeter within a zone);
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

_ALPHA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440 + 281 * _N**5 / 630
    - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
])

_BETA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
    - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
])

# geographic latitude from conformal latitude (series in n)
_DELTA = np.array([
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3 + 116 * _N**4 / 45 + 26 * _N**5 / 45
    - 2854 * _N**6 / 675,
    7 * _N**2 / 3 - 8 * _N**3 / 5 - 227 * _N**4 / 45 + 2704 * _N**5 / 315
    + 2323 * _N**6 / 945,
    56 * _N**3 / 15 - 136 * _N**4 / 35 - 1262 * _N**5 / 105
    + 73814 * _N**6 / 2835,
    4279 * _N**4 / 630 - 332 * _N**5 / 35 - 399572 * _N**6 / 14175,
    4174 * _N**5 / 315 - 144838 * _N**6 / 6237,
    601676 * _N**6 / 22275,
])


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


def register_crs(code: str, **params) -> None:
    """Register a conic CRS by proj-style constants: ``proj`` ("lcc" or
    "aea"), ``lat_1``/``lat_2`` standard parallels, ``lat_0``/``lon_0``
    origin, ``x_0``/``y_0`` false offsets, ``a`` semi-major, ``f``
    flattening — the SPI-analog extension point for CRSes outside the
    built-in table."""
    if params.get("proj") not in ("lcc", "aea"):
        raise ValueError("proj must be 'lcc' or 'aea'")
    _CONIC_CRS[code.upper()] = params


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
    """(to_4326, from_4326) for a registered conic code, else None."""
    p = _CONIC_CRS.get(code)
    if p is None:
        return None
    if p["proj"] == "lcc":
        return (
            lambda x, y: lcc_to_lonlat(x, y, p),
            lambda lon, lat: lonlat_to_lcc(lon, lat, p),
        )
    return (
        lambda x, y: aea_to_lonlat(x, y, p),
        lambda lon, lat: lonlat_to_aea(lon, lat, p),
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
    conic = _conic_fns(code)
    if conic is not None:
        return conic[0]
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
    conic = _conic_fns(code)
    if conic is not None:
        return conic[1]
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
    :func:`register_crs` conic CRSes (LCC 2SP / Albers), and any pair of
    those (composed through 4326)."""

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
