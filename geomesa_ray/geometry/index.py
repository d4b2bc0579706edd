"""Spatial indexes for join probes: packed STR-tree + vectorized grid buckets.

Reference analogs: WrappedSTRtree (geomesa-utils/.../index/WrappedSTRtree.scala)
and BucketIndex (.../index/BucketIndex.scala). The GridIndex is the hot path
for broadcast point-in-polygon joins: candidate generation for a whole point
batch is pure numpy (cell arithmetic + one dict lookup per occupied cell),
with no per-point Python.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Packed Sort-Tile-Recursive R-tree over item bounding boxes.

    Bulk-loaded once; immutable. ``query(bbox)`` returns candidate item
    indices whose bounds intersect the query box.
    """

    def __init__(self, bounds: np.ndarray, node_capacity: int = 10):
        """``bounds``: (n, 4) array of (xmin, ymin, xmax, ymax)."""
        bounds = np.asarray(bounds, dtype=np.float64)
        self.bounds = bounds
        self.n = len(bounds)
        self.node_capacity = node_capacity
        if self.n == 0:
            self._levels = []
            return
        # sort by x center, tile into slices, sort each slice by y center
        cx = (bounds[:, 0] + bounds[:, 2]) / 2
        cy = (bounds[:, 1] + bounds[:, 3]) / 2
        order = np.lexsort((cy, cx))
        nslices = max(1, int(np.ceil(np.sqrt(np.ceil(self.n / node_capacity)))))
        slice_size = int(np.ceil(self.n / nslices))
        idx_sorted = []
        for s in range(0, self.n, slice_size):
            sl = order[s : s + slice_size]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            idx_sorted.append(sl)
        order = np.concatenate(idx_sorted)
        self.item_order = order  # leaf order -> original item index

        # level 0: leaf nodes of up to node_capacity consecutive items
        levels = []
        cur_bounds = bounds[order]
        cur_children = np.arange(self.n).reshape(-1, 1)  # placeholder
        level_bounds = []
        level_child_ranges = []
        n_items = self.n
        while True:
            n_nodes = int(np.ceil(n_items / node_capacity))
            nb = np.empty((n_nodes, 4))
            ranges = np.empty((n_nodes, 2), dtype=np.int64)
            for i in range(n_nodes):
                lo = i * node_capacity
                hi = min((i + 1) * node_capacity, n_items)
                nb[i] = [
                    cur_bounds[lo:hi, 0].min(),
                    cur_bounds[lo:hi, 1].min(),
                    cur_bounds[lo:hi, 2].max(),
                    cur_bounds[lo:hi, 3].max(),
                ]
                ranges[i] = [lo, hi]
            level_bounds.append(nb)
            level_child_ranges.append(ranges)
            if n_nodes == 1:
                break
            cur_bounds = nb
            n_items = n_nodes
        self._levels = list(zip(level_bounds, level_child_ranges))

    def query(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Item indices whose bounds intersect the query box."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        top = len(self._levels) - 1
        nodes = [0]
        for lvl in range(top, -1, -1):
            nb, ranges = self._levels[lvl]
            nodes = np.asarray(nodes, dtype=np.int64)
            b = nb[nodes]
            hit = (b[:, 0] <= xmax) & (b[:, 2] >= xmin) & (b[:, 1] <= ymax) & (b[:, 3] >= ymin)
            nodes = nodes[hit]
            if len(nodes) == 0:
                return np.empty(0, dtype=np.int64)
            if lvl == 0:
                out = np.concatenate([np.arange(*ranges[i]) for i in nodes])
                items = self.item_order[out]
                b = self.bounds[items]
                hit = (b[:, 0] <= xmax) & (b[:, 2] >= xmin) & (b[:, 1] <= ymax) & (b[:, 3] >= ymin)
                return items[hit]
            nodes = np.concatenate([np.arange(*ranges[i]) for i in nodes]).tolist()
        return np.empty(0, dtype=np.int64)


class GridIndex:
    """Uniform grid over lon/lat with vectorized point probes.

    Each item (by bbox) is registered in every grid cell its bbox overlaps;
    a point probe computes cell coordinates for the whole batch at once and
    gathers (point_idx, item_idx) candidate pairs per occupied cell.
    """

    def __init__(
        self,
        bounds: np.ndarray,
        cell_size: float | None = None,
        extent: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
        max_cells_per_item: int = 4096,
    ):
        bounds = np.asarray(bounds, dtype=np.float64)
        self.extent = extent
        if cell_size is None:
            if len(bounds):
                w = np.median(bounds[:, 2] - bounds[:, 0])
                h = np.median(bounds[:, 3] - bounds[:, 1])
                cell_size = max(float(max(w, h)), 1e-6)
            else:
                cell_size = 1.0
        self.cell_size = float(cell_size)
        self.nx = max(1, int(np.ceil((extent[2] - extent[0]) / self.cell_size)))
        self.ny = max(1, int(np.ceil((extent[3] - extent[1]) / self.cell_size)))

        cells: dict[int, list[int]] = {}
        for i, (xmin, ymin, xmax, ymax) in enumerate(bounds):
            ix0, iy0 = self._cell_of(xmin, ymin)
            ix1, iy1 = self._cell_of(xmax, ymax)
            if (ix1 - ix0 + 1) * (iy1 - iy0 + 1) > max_cells_per_item:
                # very large item: coarse registration via a per-item overflow list
                cells.setdefault(-1 - i, [i])
                continue
            for ix in range(ix0, ix1 + 1):
                for iy in range(iy0, iy1 + 1):
                    cells.setdefault(ix * self.ny + iy, []).append(i)
        self._cells = {k: np.asarray(v, dtype=np.int64) for k, v in cells.items()}
        self._overflow = np.asarray(
            [v[0] for k, v in cells.items() if k < 0], dtype=np.int64
        )

    def _cell_of(self, x: float, y: float) -> tuple[int, int]:
        ix = int((x - self.extent[0]) / self.cell_size)
        iy = int((y - self.extent[1]) / self.cell_size)
        return min(max(ix, 0), self.nx - 1), min(max(iy, 0), self.ny - 1)

    def probe_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate (point_idx, item_idx) pairs for a batch of points."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        ix = np.clip(((px - self.extent[0]) / self.cell_size).astype(np.int64), 0, self.nx - 1)
        iy = np.clip(((py - self.extent[1]) / self.cell_size).astype(np.int64), 0, self.ny - 1)
        cell = ix * self.ny + iy
        order = np.argsort(cell, kind="stable")
        sorted_cells = cell[order]
        uniq, starts = np.unique(sorted_cells, return_index=True)
        ends = np.append(starts[1:], len(sorted_cells))
        pt_parts, it_parts = [], []
        for c, s, e in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
            items = self._cells.get(c)
            if items is None:
                continue
            pts = order[s:e]
            pt_parts.append(np.repeat(pts, len(items)))
            it_parts.append(np.tile(items, len(pts)))
        if len(self._overflow):
            all_pts = np.arange(len(px))
            pt_parts.append(np.repeat(all_pts, len(self._overflow)))
            it_parts.append(np.tile(self._overflow, len(px)))
        if not pt_parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(pt_parts), np.concatenate(it_parts)
