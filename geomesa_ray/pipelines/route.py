"""Route search: features along a route heading the same way, not just
crossing it (RouteSearchProcess.scala:41-110 analog).

For each point within ``buffer_m`` of the route, the heading of the nearest
route segment is compared with the point's ``heading`` attribute; matches
must differ by ≤ ``heading_threshold_deg`` (mod 180 when ``bidirectional``).
All per-batch work is vectorized: nearest-segment search uses the same
point-to-segment projection as the distance kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_M_PER_DEG = 111_195.0


def _segment_geometry(route_lon: np.ndarray, route_lat: np.ndarray):
    """Per-segment endpoints + forward heading in degrees (0=N, clockwise),
    computed on an equirectangular local projection (adequate for the
    corridor widths routes use)."""
    ax, ay = route_lon[:-1], route_lat[:-1]
    bx, by = route_lon[1:], route_lat[1:]
    midlat = np.radians((ay + by) / 2)
    dx = (bx - ax) * np.cos(midlat)
    dy = by - ay
    heading = (np.degrees(np.arctan2(dx, dy))) % 360.0
    return ax, ay, bx, by, heading


def _angdiff(a: np.ndarray, b: np.ndarray, bidirectional: bool) -> np.ndarray:
    d = np.abs((a - b) % 360.0)
    d = np.minimum(d, 360.0 - d)
    if bidirectional:
        d = np.minimum(d, np.abs(180.0 - d))
    return d


def route_search(
    points: ray.data.Dataset,
    route_lon,
    route_lat,
    buffer_m: float,
    heading_threshold_deg: float,
    heading_col: str = "heading",
    bidirectional: bool = False,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> ray.data.Dataset:
    """Filter to points within the route corridor whose heading matches the
    nearest route segment. Adds ``route_dist_m`` and ``route_heading``."""
    rx = np.asarray(route_lon, dtype=np.float64)
    ry = np.asarray(route_lat, dtype=np.float64)
    if len(rx) < 2:
        raise ValueError("route needs ≥ 2 points")
    ax, ay, bx, by, seg_heading = _segment_geometry(rx, ry)
    coslat = np.cos(np.radians((ay + by) / 2))
    # pre-scaled segment vectors for the projection
    ex = (bx - ax) * coslat
    ey = by - ay
    seg_len2 = ex * ex + ey * ey
    seg_len2[seg_len2 == 0] = 1e-18

    def f(batch: pa.Table) -> pa.Table:
        px = batch[lon_col].to_numpy(zero_copy_only=False)
        py = batch[lat_col].to_numpy(zero_copy_only=False)
        hd = batch[heading_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # (n, S) point-to-segment distances on the local projection
        dxp = (px[:, None] - ax[None, :]) * coslat[None, :]
        dyp = py[:, None] - ay[None, :]
        t = np.clip((dxp * ex[None, :] + dyp * ey[None, :]) / seg_len2[None, :], 0.0, 1.0)
        cx = dxp - t * ex[None, :]
        cy = dyp - t * ey[None, :]
        d2 = cx * cx + cy * cy  # degrees², locally scaled
        nearest = np.argmin(d2, axis=1)
        dist_m = np.sqrt(d2[np.arange(len(px)), nearest]) * _M_PER_DEG
        near_heading = seg_heading[nearest]
        ok = (dist_m <= buffer_m) & (
            _angdiff(hd, near_heading, bidirectional) <= heading_threshold_deg
        )
        out = batch.filter(pa.array(ok))
        return out.append_column(
            "route_dist_m", pa.array(dist_m[ok], pa.float64())
        ).append_column("route_heading", pa.array(near_heading[ok], pa.float64()))

    return points.map_batches(f, batch_format="pyarrow")
