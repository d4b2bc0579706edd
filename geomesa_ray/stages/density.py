"""Density / heatmap tile aggregation (raster↔vector).

Reference semantics: DensityScan snaps each geometry to a W×H grid over a
query envelope and sums weights per cell, emitting sparse partials that a
client reducer merges (geomesa-index-api/.../iterators/DensityScan.scala:29-170,
grid snap geomesa-utils/.../geotools/GridSnap.scala:60-80, defaults 256×256
from conf/QueryHints.scala:34-35, partial batch 100k DensityScan.scala:58).

Ray Data shape: ``map_batches(DensityTiles)`` does the per-batch sparse
partial sum (one output row per *occupied tile per batch*, not per input
row — the combiner that keeps the shuffle small), then
``groupby(tile).aggregate(Sum)`` merges partials. ``decode`` maps tile ids
back to cell-center (x, y, weight) like the reference's client decode
(DensityScan.scala:112-136).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

DEFAULT_WIDTH = 256  # DENSITY_WIDTH default (QueryHints.scala:34)
DEFAULT_HEIGHT = 256  # DENSITY_HEIGHT default (QueryHints.scala:35)
WORLD = (-180.0, -90.0, 180.0, 90.0)


class GridSnap:
    """Vectorized port of the reference grid-snap contract
    (GridSnap.scala:60-80): values outside the envelope map to -1; the
    upper envelope edge maps to the last cell."""

    def __init__(self, envelope=WORLD, width: int = DEFAULT_WIDTH, height: int = DEFAULT_HEIGHT):
        self.xmin, self.ymin, self.xmax, self.ymax = (float(v) for v in envelope)
        self.width = int(width)
        self.height = int(height)
        self.dx = (self.xmax - self.xmin) / self.width
        self.dy = (self.ymax - self.ymin) / self.height

    def i(self, x) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        i = np.floor((x - self.xmin) / self.dx).astype(np.int64)
        i = np.minimum(i, self.width - 1)
        return np.where((x < self.xmin) | (x > self.xmax), -1, i)

    def j(self, y) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        j = np.floor((y - self.ymin) / self.dy).astype(np.int64)
        j = np.minimum(j, self.height - 1)
        return np.where((y < self.ymin) | (y > self.ymax), -1, j)

    def x(self, i) -> np.ndarray:
        return self.xmin + self.dx / 2 + self.dx * np.asarray(i, dtype=np.float64)

    def y(self, j) -> np.ndarray:
        return self.ymin + self.dy / 2 + self.dy * np.asarray(j, dtype=np.float64)


class DensityTiles:
    """map_batches stage: sparse per-batch tile partials.

    Output rows: (tile_x:int32, tile_y:int32, weight:f64) — one per occupied
    tile in the batch. Weight is 1.0/row or a numeric column
    (DensityScan weight options, DensityScan.scala:63-88).
    """

    def __init__(self, envelope=WORLD, width: int = DEFAULT_WIDTH,
                 height: int = DEFAULT_HEIGHT, weight_col: str | None = None,
                 lon_col: str = "lon", lat_col: str = "lat"):
        self.snap = GridSnap(envelope, width, height)
        self.weight_col = weight_col
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch[self.lon_col].to_numpy(zero_copy_only=False)
        y = batch[self.lat_col].to_numpy(zero_copy_only=False)
        i = self.snap.i(x)
        j = self.snap.j(y)
        valid = (i >= 0) & (j >= 0)
        if self.weight_col is None:
            w = np.ones(len(batch), dtype=np.float64)
        else:
            w = batch[self.weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        i, j, w = i[valid], j[valid], w[valid]
        key = i * np.int64(self.snap.height) + j
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, w)
        return pa.table(
            {
                "tile_x": pa.array((uniq // self.snap.height).astype(np.int32), pa.int32()),
                "tile_y": pa.array((uniq % self.snap.height).astype(np.int32), pa.int32()),
                "weight": pa.array(sums, pa.float64()),
            }
        )


def _bresenham_cells(i0: int, j0: int, i1: int, j1: int):
    """Inclusive-endpoint Bresenham pixel walk (GridSnap.bresenhamLine
    semantics, GridSnap.scala:94-126, with both endpoints painted),
    vectorized per segment: the k-th step's minor coordinate is
    floor(k·dminor/dmajor + 1/2), identical to the reference's
    error-accumulator rounding."""
    di, dj = abs(i1 - i0), abs(j1 - j0)
    si = 1 if i1 >= i0 else -1
    sj = 1 if j1 >= j0 else -1
    if di == 0 and dj == 0:
        return np.array([i0]), np.array([j0])
    if di >= dj:
        k = np.arange(di + 1, dtype=np.int64)
        return i0 + si * k, j0 + sj * ((2 * k * dj + di) // (2 * di))
    k = np.arange(dj + 1, dtype=np.int64)
    return i0 + si * ((2 * k * di + dj) // (2 * dj)), j0 + sj * k


def _clip_segment(x0, y0, x1, y1, env):
    """Liang-Barsky segment/rect clip; returns clipped coords or None."""
    xmin, ymin, xmax, ymax = env
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, x0 - xmin),
        (dx, xmax - x0),
        (-dy, y0 - ymin),
        (dy, ymax - y0),
    ):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return None
            if r > t0:
                t0 = r
        else:
            if r < t0:
                return None
            if r < t1:
                t1 = r
    return x0 + t0 * dx, y0 + t0 * dy, x0 + t1 * dx, y0 + t1 * dy


def _line_cells(snap: GridSnap, coords: np.ndarray):
    """Distinct grid cells touched by a line path (per-segment clip + snap
    + Bresenham; RenderingGrid.render(LineString) semantics with a
    distinct-cells-per-geometry contract)."""
    env = (snap.xmin, snap.ymin, snap.xmax, snap.ymax)
    keys = []
    for s in range(len(coords) - 1):
        clipped = _clip_segment(
            coords[s, 0], coords[s, 1], coords[s + 1, 0], coords[s + 1, 1], env
        )
        if clipped is None:
            continue
        cx0, cy0, cx1, cy1 = clipped
        i0, j0 = int(snap.i(cx0)), int(snap.j(cy0))
        i1, j1 = int(snap.i(cx1)), int(snap.j(cy1))
        if min(i0, j0, i1, j1) < 0:
            continue
        ii, jj = _bresenham_cells(i0, j0, i1, j1)
        keys.append(ii * np.int64(snap.height) + jj)
    if len(coords) == 1:  # degenerate single-vertex path
        i0, j0 = int(snap.i(coords[0, 0])), int(snap.j(coords[0, 1]))
        if i0 >= 0 and j0 >= 0:
            keys.append(np.array([i0 * snap.height + j0], dtype=np.int64))
    if not keys:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(keys))


def _polygon_cells(snap: GridSnap, poly) -> np.ndarray:
    """Distinct grid cells covered by a polygon: scanline fill over the
    cell CENTERS of the clipped bbox (even-odd, holes respected via
    points_in_polygon) plus the Bresenham outline of every ring — thin
    polygons still rasterize (RenderingGrid.render(Polygon):164-229
    semantics with a center-in fill rule)."""
    from geomesa_ray.geometry.predicates import points_in_polygon

    xmin, ymin, xmax, ymax = poly.bounds
    xmin, xmax = max(xmin, snap.xmin), min(xmax, snap.xmax)
    ymin, ymax = max(ymin, snap.ymin), min(ymax, snap.ymax)
    if xmin > xmax or ymin > ymax:
        return np.empty(0, np.int64)
    i0, i1 = int(snap.i(xmin)), int(snap.i(xmax))
    j0, j1 = int(snap.j(ymin)), int(snap.j(ymax))
    ii = np.arange(i0, i1 + 1, dtype=np.int64)
    jj = np.arange(j0, j1 + 1, dtype=np.int64)
    cx = snap.x(ii)
    cy = snap.y(jj)
    gx, gy = np.meshgrid(cx, cy, indexing="ij")
    inside = points_in_polygon(gx.ravel(), gy.ravel(), poly)
    gi, gj = np.meshgrid(ii, jj, indexing="ij")
    keys = [gi.ravel()[inside] * np.int64(snap.height) + gj.ravel()[inside]]
    for ring in poly.rings:
        keys.append(_line_cells(snap, ring))
    return np.unique(np.concatenate(keys))


class RasterizeTiles:
    """map_batches stage: geometry rows (WKB column) → sparse per-batch
    tile partials, rasterizing lines (Bresenham) and polygons (scanline +
    outline) onto the grid like the reference's RenderingGrid
    (RenderingGrid.scala:72-244). Each geometry part contributes its
    weight once per distinct cell it touches."""

    def __init__(self, envelope=WORLD, width: int = DEFAULT_WIDTH,
                 height: int = DEFAULT_HEIGHT, geom_col: str = "geom_wkb",
                 weight_col: str | None = None):
        self.snap = GridSnap(envelope, width, height)
        self.geom_col = geom_col
        self.weight_col = weight_col

    def _cells(self, geom) -> np.ndarray:
        from geomesa_ray.geometry.base import (
            GeometryCollection,
            LineString,
            MultiLineString,
            MultiPoint,
            MultiPolygon,
            Point,
            Polygon,
        )

        if isinstance(geom, Point):
            i, j = int(self.snap.i(geom.x)), int(self.snap.j(geom.y))
            if i < 0 or j < 0:
                return np.empty(0, np.int64)
            return np.array([i * self.snap.height + j], dtype=np.int64)
        if isinstance(geom, LineString):
            return _line_cells(self.snap, geom.coords)
        if isinstance(geom, Polygon):
            return _polygon_cells(self.snap, geom)
        if isinstance(geom, (MultiPoint, MultiLineString, MultiPolygon, GeometryCollection)):
            parts = [self._cells(g) for g in geom.parts]
            return np.concatenate(parts) if parts else np.empty(0, np.int64)
        raise TypeError(f"cannot rasterize {type(geom).__name__}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geomesa_ray.geometry.wkb import from_wkb

        if self.weight_col is None:
            w = np.ones(len(batch), dtype=np.float64)
        else:
            w = batch[self.weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        all_keys, all_w = [], []
        for wkb, wt in zip(batch[self.geom_col].to_pylist(), w):
            cells = self._cells(from_wkb(wkb))
            if len(cells):
                all_keys.append(cells)
                all_w.append(np.full(len(cells), wt))
        if not all_keys:
            return pa.table(
                {
                    "tile_x": pa.array([], pa.int32()),
                    "tile_y": pa.array([], pa.int32()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        key = np.concatenate(all_keys)
        wv = np.concatenate(all_w)
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, wv)
        return pa.table(
            {
                "tile_x": pa.array((uniq // self.snap.height).astype(np.int32), pa.int32()),
                "tile_y": pa.array((uniq % self.snap.height).astype(np.int32), pa.int32()),
                "weight": pa.array(sums, pa.float64()),
            }
        )


def _merge_dense_partials(batch: pa.Table, cells: int) -> pa.Table:
    """Merge N packed dense-grid partial rows into one (tree-reduce step)."""
    grids = np.frombuffer(
        b"".join(batch["grid"].to_pylist()), dtype=np.float64
    ).reshape(-1, cells)
    g = grids.sum(axis=0)
    t = np.zeros(cells, dtype=bool)
    for tb in batch["touched"].to_pylist():
        t |= np.unpackbits(np.frombuffer(tb, dtype=np.uint8))[:cells].astype(bool)
    return pa.table(
        {
            "grid": pa.array([g.tobytes()], pa.binary()),
            "touched": pa.array([np.packbits(t).tobytes()], pa.binary()),
        }
    )


def density(
    points: ray.data.Dataset,
    envelope=WORLD,
    width: int = DEFAULT_WIDTH,
    height: int = DEFAULT_HEIGHT,
    weight_col: str | None = None,
    batch_size: int = 100_000,  # geomesa.density.batch.size (DensityScan.scala:58)
    lon_col: str = "lon",
    lat_col: str = "lat",
    reduce_max_cells: int = 1_048_576,
    max_driver_bytes: int = 256 << 20,
    geom_col: str | None = None,
) -> ray.data.Dataset:
    """Tile-aggregation pipeline: sparse partial sums per batch, then either
    a dense-grid tree reduce (grid ≤ ``reduce_max_cells`` — the reference's
    client-reducer semantics, no all-to-all shuffle) or a sparse tile
    groupby.

    The dense arm is bounded at every level: each input batch emits one
    packed ~(cells × 9)-byte grid partial; partial rows are then merged in
    distributed tree rounds of ``fanin`` grids per task until the total
    partial volume fits ``max_driver_bytes``, and only that bounded
    remainder streams to the driver. At 10^12 rows / 10^7 block partials
    the tree is 3-4 rounds; the driver never sees more than
    ``max_driver_bytes`` regardless of input size (SCALE.md §density).
    """
    cells = width * height
    if geom_col is not None:
        # non-point rasterization (lines/polygons): sparse partials per
        # batch through RasterizeTiles, merged by the tile groupby
        from ray.data.aggregate import Sum

        partials = points.map_batches(
            RasterizeTiles(envelope, width, height, geom_col, weight_col).__call__,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        return partials.groupby(["tile_x", "tile_y"]).aggregate(
            Sum("weight", alias_name="weight")
        )
    if cells <= reduce_max_cells:
        import ray.data as rd

        snap = GridSnap(envelope, width, height)

        def dense_partial(batch: pa.Table) -> pa.Table:
            """One packed dense grid + touch mask per batch — the reduce
            then moves ~(cells × 9) bytes per BLOCK, not per tile."""
            x = batch[lon_col].to_numpy(zero_copy_only=False)
            y = batch[lat_col].to_numpy(zero_copy_only=False)
            i = snap.i(x)
            j = snap.j(y)
            valid = (i >= 0) & (j >= 0)
            if weight_col is None:
                w = np.ones(int(valid.sum()), dtype=np.float64)
            else:
                w = batch[weight_col].to_numpy(zero_copy_only=False).astype(
                    np.float64
                )[valid]
            idx = i[valid] * height + j[valid]
            g = np.zeros(cells, dtype=np.float64)
            t = np.zeros(cells, dtype=bool)
            np.add.at(g, idx, w)
            t[idx] = True
            return pa.table(
                {
                    "grid": pa.array([g.tobytes()], pa.binary()),
                    "touched": pa.array([np.packbits(t).tobytes()], pa.binary()),
                }
            )

        grid_bytes = cells * 8 + (cells + 7) // 8
        # fanin: grids merged per tree task — bounded by a ~512 MB task heap
        fanin = int(max(2, min(64, (512 << 20) // grid_bytes)))
        partials = points.map_batches(
            dense_partial, batch_format="pyarrow", batch_size=batch_size
        ).materialize()
        while partials.count() * grid_bytes > max_driver_bytes:
            partials = partials.map_batches(
                _merge_dense_partials,
                fn_kwargs={"cells": cells},
                batch_format="pyarrow",
                batch_size=fanin,
            ).materialize()
        grid = np.zeros(cells, dtype=np.float64)
        touched = np.zeros(cells, dtype=bool)
        for b in partials.iter_batches(batch_format="pyarrow"):
            merged_b = _merge_dense_partials(b, cells)
            grid += np.frombuffer(merged_b["grid"][0].as_py(), dtype=np.float64)
            touched |= np.unpackbits(
                np.frombuffer(merged_b["touched"][0].as_py(), dtype=np.uint8)
            )[:cells].astype(bool)
        occ = np.nonzero(touched)[0]
        merged = pa.table(
            {
                "tile_x": pa.array((occ // height).astype(np.int32), pa.int32()),
                "tile_y": pa.array((occ % height).astype(np.int32), pa.int32()),
                "weight": pa.array(grid[occ], pa.float64()),
            }
        )
        return rd.from_arrow(merged)
    tiler = DensityTiles(envelope, width, height, weight_col, lon_col, lat_col)
    partials = points.map_batches(
        tiler.__call__, batch_format="pyarrow", batch_size=batch_size
    )
    from ray.data.aggregate import Sum

    return partials.groupby(["tile_x", "tile_y"]).aggregate(
        Sum("weight", alias_name="weight")
    )


def decode(tiles: pa.Table, envelope=WORLD, width: int = DEFAULT_WIDTH,
           height: int = DEFAULT_HEIGHT) -> pa.Table:
    """Tile ids → cell-center (x, y, weight) rows (DensityScan.scala:112-136)."""
    snap = GridSnap(envelope, width, height)
    return pa.table(
        {
            "x": pa.array(snap.x(tiles["tile_x"].to_numpy(zero_copy_only=False)), pa.float64()),
            "y": pa.array(snap.y(tiles["tile_y"].to_numpy(zero_copy_only=False)), pa.float64()),
            "weight": tiles["weight"].combine_chunks(),
        }
    )
