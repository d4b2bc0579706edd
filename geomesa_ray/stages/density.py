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


def _parse_wkb_linestrings(blobs):
    """Fast-path WKB parse: all little-endian LineStrings → (coords,
    vertex offsets) or None if any blob is something else."""
    if not blobs:  # empty batch from an upstream filter
        return np.empty((0, 2), np.float64), np.zeros(1, np.int64)
    coords_list, counts = [], []
    for b in blobs:
        if b is None or len(b) < 9 or b[0] != 1 or b[1:5] != b"\x02\x00\x00\x00":
            return None
        n = int.from_bytes(b[5:9], "little")
        if len(b) != 9 + 16 * n or n < 1:
            return None
        coords_list.append(
            np.frombuffer(b, dtype="<f8", count=2 * n, offset=9).reshape(-1, 2)
        )
        counts.append(n)
    return (
        np.concatenate(coords_list),
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int64),
    )


def _line_cells_batch(snap: GridSnap, coords: np.ndarray, offsets: np.ndarray):
    """Vectorized rasterization of MANY line paths at once: one
    Liang-Barsky clip + one Bresenham expansion over all segments of the
    batch, then a per-geometry distinct-cell reduction. Returns (geom_idx,
    cell_key) arrays (deduped within each geometry) — identical cells to
    the per-geometry :func:`_line_cells` path."""
    n_geoms = len(offsets) - 1
    if len(coords) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # segments: consecutive vertex pairs not crossing a geometry boundary
    last_of_geom = np.zeros(len(coords), dtype=bool)
    last_of_geom[offsets[1:] - 1] = True
    seg_mask = ~last_of_geom[:-1]
    x0 = coords[:-1, 0][seg_mask]
    y0 = coords[:-1, 1][seg_mask]
    x1 = coords[1:, 0][seg_mask]
    y1 = coords[1:, 1][seg_mask]
    seg_geom = (np.searchsorted(offsets, np.nonzero(seg_mask)[0], side="right") - 1)
    # single-vertex geometries rasterize their lone point
    single = (offsets[1:] - offsets[:-1]) == 1
    if single.any():
        sx = coords[offsets[:-1][single], 0]
        sy = coords[offsets[:-1][single], 1]
        x0 = np.concatenate([x0, sx]); y0 = np.concatenate([y0, sy])
        x1 = np.concatenate([x1, sx]); y1 = np.concatenate([y1, sy])
        seg_geom = np.concatenate([seg_geom, np.nonzero(single)[0]])

    # vectorized Liang-Barsky: t0 = max(0, entering), t1 = min(1, leaving)
    dx, dy = x1 - x0, y1 - y0
    t0 = np.zeros(len(x0))
    t1 = np.ones(len(x0))
    ok = np.ones(len(x0), dtype=bool)
    for p, q in (
        (-dx, x0 - snap.xmin),
        (dx, snap.xmax - x0),
        (-dy, y0 - snap.ymin),
        (dy, snap.ymax - y0),
    ):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(p != 0, q / np.where(p == 0, 1.0, p), 0.0)
        ok &= ~((p == 0) & (q < 0))
        t0 = np.where((p < 0), np.maximum(t0, r), t0)
        t1 = np.where((p > 0), np.minimum(t1, r), t1)
    ok &= t0 <= t1
    if not ok.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cx0 = (x0 + t0 * dx)[ok]
    cy0 = (y0 + t0 * dy)[ok]
    cx1 = (x0 + t1 * dx)[ok]
    cy1 = (y0 + t1 * dy)[ok]
    seg_geom = seg_geom[ok]
    i0, j0 = snap.i(cx0), snap.j(cy0)
    i1, j1 = snap.i(cx1), snap.j(cy1)
    good = (i0 >= 0) & (j0 >= 0) & (i1 >= 0) & (j1 >= 0)
    i0, j0, i1, j1, seg_geom = i0[good], j0[good], i1[good], j1[good], seg_geom[good]
    if len(i0) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    di = np.abs(i1 - i0)
    dj = np.abs(j1 - j0)
    si = np.where(i1 >= i0, 1, -1)
    sj = np.where(j1 >= j0, 1, -1)
    major = np.maximum(di, dj)
    counts = major + 1
    starts = np.concatenate([[0], np.cumsum(counts)])
    total = int(starts[-1])
    seg_of = np.repeat(np.arange(len(i0)), counts)
    k = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], counts)
    di_s, dj_s = di[seg_of], dj[seg_of]
    imaj = di_s >= dj_s
    den = np.where(imaj, np.maximum(di_s, 1), np.maximum(dj_s, 1))
    minor_step = (2 * k * np.where(imaj, dj_s, di_s) + den) // (2 * den)
    ii = np.where(
        imaj, i0[seg_of] + si[seg_of] * k, i0[seg_of] + si[seg_of] * minor_step
    )
    jj = np.where(
        imaj, j0[seg_of] + sj[seg_of] * minor_step, j0[seg_of] + sj[seg_of] * k
    )
    gid = seg_geom[seg_of]
    cell = ii * np.int64(snap.height) + jj
    # distinct (geometry, cell)
    order = np.lexsort((cell, gid))
    gid, cell = gid[order], cell[order]
    keep = np.ones(len(gid), dtype=bool)
    keep[1:] = (gid[1:] != gid[:-1]) | (cell[1:] != cell[:-1])
    return gid[keep], cell[keep]


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
        blobs = batch[self.geom_col].to_pylist()
        # all-LineString batches take the fully vectorized path (one clip +
        # one Bresenham expansion across every segment of the batch)
        fast = _parse_wkb_linestrings(blobs)
        if fast is not None:
            coords, offsets = fast
            gid, key = _line_cells_batch(self.snap, coords, offsets)
            if len(key) == 0:
                return pa.table(
                    {
                        "tile_x": pa.array([], pa.int32()),
                        "tile_y": pa.array([], pa.int32()),
                        "weight": pa.array([], pa.float64()),
                    }
                )
            wv = w[gid]
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
        all_keys, all_w = [], []
        for wkb, wt in zip(blobs, w):
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
        partials = points.map_batches(
            RasterizeTiles(envelope, width, height, geom_col, weight_col).__call__,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        return _sparse_tile_groupby(partials, height)
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
        # count > 1 guard: a single grid larger than max_driver_bytes can
        # never shrink further — without it the loop would spin forever
        while partials.count() > 1 and partials.count() * grid_bytes > max_driver_bytes:
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
    return _sparse_tile_groupby(partials, height)


def _sparse_tile_groupby(partials: ray.data.Dataset, height: int,
                         fanin_rows: int = 2_000_000,
                         max_rounds: int = 10) -> ray.data.Dataset:
    """Merge sparse (tile_x, tile_y, weight) partials with a shuffle-free
    TREE of vectorized segment-sum tasks (np.unique + np.add.at per merge)
    instead of Ray's sort-based aggregate, whose multi-second fixed cost
    dwarfs the useful work for tile-sized outputs. Each round coalesces up
    to ``fanin_rows`` partial rows per task; the final single merge holds
    ≤ occupied-cells rows — a heatmap-sized table by construction (the
    sparse arm exists for grids whose DENSE form is too big, not for
    unbounded key spaces)."""

    def merge(batch: pa.Table) -> pa.Table:
        tx = batch["tile_x"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch["tile_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["weight"].to_numpy(zero_copy_only=False)
        key = tx * np.int64(height) + ty
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, w)
        return pa.table(
            {
                "tile_x": pa.array((uniq // height).astype(np.int32), pa.int32()),
                "tile_y": pa.array((uniq % height).astype(np.int32), pa.int32()),
                "weight": pa.array(sums, pa.float64()),
            }
        )

    ds = partials.map_batches(
        merge, batch_format="pyarrow", batch_size=fanin_rows
    ).materialize()
    rounds = 0
    while ds.num_blocks() > 1 and rounds < max_rounds:
        ds = ds.repartition(max(1, ds.num_blocks() // 8)).map_batches(
            merge, batch_format="pyarrow", batch_size=fanin_rows
        ).materialize()
        rounds += 1
    if ds.num_blocks() > 1:
        # result larger than fanin_rows × tree depth: fall back to the
        # shuffle aggregate for exactness (pathologically huge heatmaps)
        from ray.data.aggregate import Sum

        return ds.groupby(["tile_x", "tile_y"]).aggregate(
            Sum("weight", alias_name="weight")
        )
    return ds


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


# ---------------------------------------------------------------------------
# raster → vector: connected-component region extraction
# ---------------------------------------------------------------------------


def _region_kernel(t: pa.Table, width: int, height: int,
                   threshold: float) -> pa.Table:
    """One-block kernel: 4-adjacency connected components over grid cells
    with weight ≥ threshold, labeled by the component's MINIMUM cell id
    (``y*width + x`` — deterministic, so a SQL min-label-propagation CTE
    reproduces it exactly). Vectorized label propagation with pointer
    jumping: O(rounds × cells) numpy passes, rounds ≈ log(diameter)."""
    empty = pa.table({
        "region": pa.array([], pa.int64()),
        "n_cells": pa.array([], pa.int64()),
        "total_w": pa.array([], pa.int64()),
        "min_x": pa.array([], pa.int64()),
        "min_y": pa.array([], pa.int64()),
        "max_x": pa.array([], pa.int64()),
        "max_y": pa.array([], pa.int64()),
    })
    if len(t) == 0:
        return empty
    x = t["tile_x"].to_numpy(zero_copy_only=False).astype(np.int64)
    y = t["tile_y"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = t["weight"].to_numpy(zero_copy_only=False)
    keep = w >= threshold
    if not keep.any():
        return empty
    x, y, w = x[keep], y[keep], w[keep]
    ids = y * width + x
    order = np.argsort(ids)
    x, y, w, ids = x[order], y[order], w[order], ids[order]
    k = len(ids)
    # neighbor edges as POSITION pairs (ids sorted → searchsorted lookups)
    pu_parts, pv_parts = [], []
    for nbr, valid in (
        (ids + 1, x + 1 < width),       # right neighbor (never row-wraps)
        (ids + width, y + 1 < height),  # up neighbor
    ):
        pos = np.searchsorted(ids, nbr)
        hit = valid & (pos < k)
        hit[hit] = ids[pos[hit]] == nbr[hit]
        pu_parts.append(np.nonzero(hit)[0])
        pv_parts.append(pos[hit])
    pu = np.concatenate(pu_parts)
    pv = np.concatenate(pv_parts)
    lab = np.arange(k, dtype=np.int64)  # position of the min-id cell seen
    while True:
        new = lab.copy()
        np.minimum.at(new, pu, lab[pv])
        np.minimum.at(new, pv, lab[pu])
        new = new[new]  # pointer jump
        if np.array_equal(new, lab):
            break
        lab = new
    # per-region reduce: lexsort by label, segment boundaries, reduceat
    order2 = np.argsort(lab, kind="stable")
    lab_s = lab[order2]
    starts = np.nonzero(np.concatenate([[True], lab_s[1:] != lab_s[:-1]]))[0]
    def seg(arr, fn):
        return fn(arr[order2], starts)
    return pa.table({
        "region": pa.array(ids[lab_s[starts]], pa.int64()),
        "n_cells": pa.array(np.diff(np.concatenate([starts, [k]])), pa.int64()),
        "total_w": pa.array(
            seg(w.astype(np.int64), np.add.reduceat), pa.int64()
        ),
        "min_x": pa.array(seg(x, np.minimum.reduceat), pa.int64()),
        "min_y": pa.array(seg(y, np.minimum.reduceat), pa.int64()),
        "max_x": pa.array(seg(x, np.maximum.reduceat), pa.int64()),
        "max_y": pa.array(seg(y, np.maximum.reduceat), pa.int64()),
    })


def raster_regions(
    tiles: ray.data.Dataset,
    threshold: float = 1.0,
    width: int = DEFAULT_WIDTH,
    height: int = DEFAULT_HEIGHT,
) -> ray.data.Dataset:
    """Raster → vector: dissolve grid cells with weight ≥ ``threshold``
    into 4-adjacency regions (the inverse of :func:`density`'s
    vector → raster direction). Emits one row per region: min-cell-id
    label, cell count, summed weight, and the region's cell-index bbox —
    all integers, bit-deterministic against a SQL min-label CTE.

    Scale shape: the input is a density grid, already bounded by
    ``width × height`` (the same bound density's tree-reduce relies on) —
    so the component pass runs as ONE vectorized task on the merged grid,
    never a driver loop. Raster inputs beyond the grid bound are a
    different operator (tile-then-dissolve per macro-tile)."""
    merged = tiles.repartition(1)
    return merged.map_batches(
        _region_kernel, batch_format="pyarrow",
        fn_kwargs={"width": width, "height": height, "threshold": threshold},
        batch_size=width * height + 1,
    ).map_batches(
        lambda b: b.sort_by([("region", "ascending")]), batch_format="pyarrow"
    )
