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
    """Uniform grid over lon/lat with fully vectorized point probes.

    Each item (by bbox) is registered in every grid cell its bbox overlaps.
    Storage is CSR-style flat arrays (sorted unique cell ids + offsets +
    one contiguous item array) — a handful of large numpy buffers, so
    broadcast deserialization and first-touch cost stay tiny and probes are
    pure vectorized gathers (no Python loop over cells).
    """

    def __init__(
        self,
        bounds: np.ndarray,
        cell_size: float | None = None,
        extent: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
        max_cells_per_item: int = 4096,
    ):
        bounds = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
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

        n = len(bounds)
        ix0 = self._cell_coord(bounds[:, 0], 0)
        iy0 = self._cell_coord(bounds[:, 1], 1)
        ix1 = self._cell_coord(bounds[:, 2], 0)
        iy1 = self._cell_coord(bounds[:, 3], 1)
        ncells = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        over = ncells > max_cells_per_item
        self._overflow = np.nonzero(over)[0].astype(np.int64)

        # expand (item, cell) registrations vectorized-per-item
        reg_cells = []
        reg_items = []
        for i in np.nonzero(~over)[0].tolist():
            xs = np.arange(ix0[i], ix1[i] + 1, dtype=np.int64) * self.ny
            ys = np.arange(iy0[i], iy1[i] + 1, dtype=np.int64)
            cc = (xs[:, None] + ys[None, :]).ravel()
            reg_cells.append(cc)
            reg_items.append(np.full(len(cc), i, dtype=np.int64))
        if reg_cells:
            cells = np.concatenate(reg_cells)
            items = np.concatenate(reg_items)
            order = np.argsort(cells, kind="stable")
            cells, items = cells[order], items[order]
            self._uniq_cells, starts = np.unique(cells, return_index=True)
            self._starts = starts.astype(np.int64)
            self._counts = np.diff(np.append(self._starts, len(cells))).astype(np.int64)
            self._items = items
        else:
            self._uniq_cells = np.empty(0, np.int64)
            self._starts = np.empty(0, np.int64)
            self._counts = np.empty(0, np.int64)
            self._items = np.empty(0, np.int64)

    def _cell_coord(self, v: np.ndarray, axis: int) -> np.ndarray:
        base = self.extent[0] if axis == 0 else self.extent[1]
        hi = (self.nx if axis == 0 else self.ny) - 1
        return np.clip(((np.asarray(v) - base) / self.cell_size).astype(np.int64), 0, hi)

    def probe_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate (point_idx, item_idx) pairs for a batch of points."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = len(px)
        ix = self._cell_coord(px, 0)
        iy = self._cell_coord(py, 1)
        cell = ix * self.ny + iy
        pt_parts, it_parts = [], []
        if len(self._uniq_cells):
            pos = np.searchsorted(self._uniq_cells, cell)
            pos_c = np.minimum(pos, len(self._uniq_cells) - 1)
            hit = self._uniq_cells[pos_c] == cell
            hp = np.nonzero(hit)[0]
            if len(hp):
                u = pos_c[hp]
                counts = self._counts[u]
                total = int(counts.sum())
                if total:
                    pt_idx = np.repeat(hp, counts)
                    out_first = np.cumsum(counts) - counts
                    within = np.arange(total, dtype=np.int64) - np.repeat(out_first, counts)
                    item_pos = np.repeat(self._starts[u], counts) + within
                    pt_parts.append(pt_idx)
                    it_parts.append(self._items[item_pos])
        if len(self._overflow):
            pt_parts.append(np.repeat(np.arange(n, dtype=np.int64), len(self._overflow)))
            it_parts.append(np.tile(self._overflow, n))
        if not pt_parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(pt_parts), np.concatenate(it_parts)
