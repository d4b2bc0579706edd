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
