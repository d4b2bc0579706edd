"""Coordinate reprojection (index/utils/Reprojection.scala analog).

Supports the projections expressible in closed form without a CRS library
(none is available in this environment): EPSG:4326 (lon/lat) ↔ EPSG:3857
(spherical Web Mercator). Other CRS codes raise ``NotImplementedError``,
making the extension point explicit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_R = 6378137.0  # WGS84 semi-major axis (Web Mercator sphere radius)
_MAX_LAT = 85.06  # Web Mercator latitude cutoff


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


_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): lonlat_to_webmercator,
    ("EPSG:3857", "EPSG:4326"): webmercator_to_lonlat,
}


class Reproject:
    """map_batches stage: transform (x_col, y_col) between CRSes, writing
    ``out_x``/``out_y`` columns (defaults overwrite in place)."""

    def __init__(self, src: str, dst: str, x_col: str = "lon", y_col: str = "lat",
                 out_x: str | None = None, out_y: str | None = None):
        key = (src.upper(), dst.upper())
        if key not in _TRANSFORMS:
            raise NotImplementedError(
                f"unsupported CRS pair {key}; available: {sorted(_TRANSFORMS)}"
            )
        self.fn = _TRANSFORMS[key]
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
