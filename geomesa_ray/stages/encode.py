"""Index-key encoding stage: add (z2, z3_bin, z3, cell, shard) columns.

The row-key-assembly analog (Z3IndexKeySpace.scala:59-95), kept as plain
int columns instead of packed bytes — Ray Data sorts/partitions on columns.

``cell`` is the quadtree cell used for the join shuffle: the top
``2*cell_res`` bits of the z2 code, i.e. a res-``cell_res`` quadtree tile
(the discrete-global-grid analog of the reference's S2 cells,
curve/S2SFC.scala:23-33). ``shard`` is a deterministic hash salt
(ShardStrategy.scala:42-83: idHash % numShards).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomesa_ray.curves.binnedtime import TimePeriod
from geomesa_ray.curves.sfc import Z2SFC, Z3SFC

DEFAULT_CELL_RES = 12  # quadtree level: 360/2^12 ≈ 0.088° ≈ 10 km tiles
DEFAULT_SHARDS = 4  # reference default (index_config.rst:324-331)


def hash_strings(strings, seed: int = 42) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string column.

    Used for shard assignment and dedup keys; stable across runs/processes
    (unlike Python's salted hash()). Backed by polars' Rust hash kernel with
    a pure-Python FNV-1a fallback.
    """
    try:
        import polars as pl

        if isinstance(strings, pa.ChunkedArray):
            strings = strings.combine_chunks()
        if isinstance(strings, pa.Array):
            s = pl.from_arrow(strings)
        else:
            s = pl.Series(list(strings))
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    except ImportError:  # pragma: no cover - polars is available in this env
        if isinstance(strings, (pa.Array, pa.ChunkedArray)):
            strings = strings.to_pylist()
        out = np.empty(len(strings), dtype=np.uint64)
        for i, s in enumerate(strings):
            h = 0xCBF29CE484222325
            for b in s.encode() if isinstance(s, str) else s:
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h
        return out


def cell_of_z2(z2: np.ndarray, cell_res: int = DEFAULT_CELL_RES) -> np.ndarray:
    """Quadtree cell id at resolution ``cell_res`` from a z2 code."""
    shift = np.uint64(2 * (31 - cell_res))
    return (z2.astype(np.uint64) >> shift).astype(np.int64)


def cell_bounds(cell: int, cell_res: int = DEFAULT_CELL_RES):
    """(xmin, ymin, xmax, ymax) of a quadtree cell in lon/lat degrees."""
    from geomesa_ray.curves.zorder import z2_decode

    z = cell << (2 * (31 - cell_res))
    xi, yi = z2_decode(z)
    nx = int(xi) >> (31 - cell_res)
    ny = int(yi) >> (31 - cell_res)
    w = 360.0 / (1 << cell_res)
    h = 180.0 / (1 << cell_res)
    return (-180.0 + nx * w, -90.0 + ny * h, -180.0 + (nx + 1) * w, -90.0 + (ny + 1) * h)


def cells_for_box(
    xmin: float, ymin: float, xmax: float, ymax: float, cell_res: int = DEFAULT_CELL_RES,
    max_cells: int = 4096,
) -> np.ndarray:
    """All quadtree cells intersecting a bbox (the covering for joins/scans).

    Escalates to a coarser resolution if the covering would exceed
    ``max_cells`` — callers must compare cells at equal resolution, so the
    returned resolution accompanies the ids.
    """
    from geomesa_ray.curves.zorder import z2_encode

    res = cell_res
    while True:
        w = 360.0 / (1 << res)
        h = 180.0 / (1 << res)
        ix0 = int((min(max(xmin, -180.0), 180.0) + 180.0) / w)
        ix1 = int((min(max(xmax, -180.0), 180.0) + 180.0) / w)
        iy0 = int((min(max(ymin, -90.0), 90.0) + 90.0) / h)
        iy1 = int((min(max(ymax, -90.0), 90.0) + 90.0) / h)
        nmax = 1 << res
        ix1, iy1 = min(ix1, nmax - 1), min(iy1, nmax - 1)
        count = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        if count <= max_cells or res == 0:
            xs = np.arange(ix0, ix1 + 1, dtype=np.int64) << (31 - res)
            ys = np.arange(iy0, iy1 + 1, dtype=np.int64) << (31 - res)
            gx, gy = np.meshgrid(xs, ys)
            z = z2_encode(gx.ravel(), gy.ravel())
            return cell_of_z2(z, res), res
        res -= 1


class EncodeKeys:
    """map_batches stage: derive index-key columns from (lon, lat, warc_ts).

    Stateful (curve instances built once per actor); pure numpy per batch.
    """

    def __init__(
        self,
        period: TimePeriod = TimePeriod.WEEK,
        cell_res: int = DEFAULT_CELL_RES,
        n_shards: int = DEFAULT_SHARDS,
        id_col: str = "url",
        ts_col: str = "warc_ts",
        s2_level: int | None = None,
        hex_res: int | None = None,
    ):
        self.z2sfc = Z2SFC()
        self.z3sfc = Z3SFC(period)
        self.cell_res = cell_res
        self.n_shards = n_shards
        self.id_col = id_col
        self.ts_col = ts_col
        # opt-in discrete-global-grid key columns (the input hint's
        # "Z2/Z3 keys plus H3/S2 cells"): None keeps the legacy schema
        self.s2_level = s2_level
        self.hex_res = hex_res

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        # null timestamps index at t=0 (Z3IndexKeySpace.scala:71-72);
        # convert to epoch ms via int64 (truncating sub-ms, never erroring)
        col = batch[self.ts_col]
        raw = pc.fill_null(col.cast(pa.int64()), 0).to_numpy()
        unit = getattr(col.type, "unit", "ms")
        if unit == "s":
            ts = raw * 1000
        elif unit == "ms":
            ts = raw
        elif unit == "us":
            ts = raw // 1000
        else:  # ns
            ts = raw // 1_000_000

        z2 = self.z2sfc.index(lon, lat, lenient=True)
        bins, z3 = self.z3sfc.index_from_millis(lon, lat, ts, lenient=True)
        cell = cell_of_z2(z2, self.cell_res)
        shard = (hash_strings(batch[self.id_col]) % np.uint64(self.n_shards)).astype(np.int8)

        out = (
            batch.append_column("z2", pa.array(z2, pa.int64()))
            .append_column("z3_bin", pa.array(bins.astype(np.int16), pa.int16()))
            .append_column("z3", pa.array(z3, pa.int64()))
            .append_column("cell", pa.array(cell, pa.int64()))
            .append_column("shard", pa.array(shard, pa.int8()))
        )
        if self.s2_level is not None:
            from geomesa_ray.curves.s2 import lonlat_to_cell_id

            s2 = lonlat_to_cell_id(lon, lat, self.s2_level).astype(np.int64)
            out = out.append_column("s2", pa.array(s2, pa.int64()))
        if self.hex_res is not None:
            from geomesa_ray.curves.hexgrid import hex_encode

            out = out.append_column(
                "hex", pa.array(hex_encode(lon, lat, self.hex_res), pa.int64())
            )
        return out
