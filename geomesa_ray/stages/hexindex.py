"""Hex-cell (H3-analog) keying, density and ring-neighborhood stages.

Ray-Data-first counterparts of the reference's cell-keyed aggregation and
expanding-search query classes (Z2SFC keying in geomesa-z3, the kNN
expanding window in geomesa-process/.../KNearestNeighborSearchProcess.scala),
re-expressed over the exact-integer hex tessellation in
:mod:`geomesa_ray.curves.hexgrid`:

* :func:`hex_assign` — vectorized cell-id column (the shuffle key a
  10^12-row pipeline partitions by; Morton-packed ids make sorted ranges
  spatially local, the "H3 cell prefix" pattern).
* :func:`hex_density` — per-cell counts via per-batch combiner + tree
  merge (bounded output ⇒ no sort-shuffle fixed cost, per CLAUDE.md).
* :func:`hex_kring_counts` — counts within hex distance ``k`` of a small
  broadcast anchor set: the cell-ring expansion join (anchors ride the
  closure; each batch computes integer axial distances, no shuffle at all).

All cell arithmetic is int64 and bit-mirrorable in SQL (see the hex_*
oracles in pipelines/queries.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from geomesa_ray.curves import hexgrid as hg
from geomesa_ray.stages.corpus import _group_sum, _tree_merge


def hex_assign(ds: ray.data.Dataset, res: int, lon_col: str = "lon",
               lat_col: str = "lat", out_col: str = "hex") -> ray.data.Dataset:
    """Append the packed hex cell id at ``res`` (zero-copy Arrow batches)."""

    def f(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        cell = hg.hex_encode(lon, lat, res)
        return batch.append_column(out_col, pa.array(cell, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def hex_density(ds: ray.data.Dataset, res: int, lon_col: str = "lon",
                lat_col: str = "lat", out_col: str = "hex",
                fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """Event count per hex cell: per-batch ``np.unique`` combiner then a
    shuffle-free tree merge. Output is bounded by the number of occupied
    cells (≪ rows), so the tree converges in O(log) rounds; the huge-case
    fallback is one groupby over already-combined partials."""
    schema = pa.schema([pa.field(out_col, pa.int64()),
                        pa.field("n_events", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        cells, counts = np.unique(hg.hex_encode(lon, lat, res),
                                  return_counts=True)
        return pa.table({out_col: pa.array(cells, pa.int64()),
                         "n_events": pa.array(counts.astype(np.int64))})

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        return _group_sum(batch.cast(schema), [out_col], ["n_events"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged, converged = _tree_merge(partials, merge, fanin_rows=fanin_rows)
    if converged:
        return merged
    return merged.groupby(out_col).sum("n_events").map_batches(
        lambda b: b.rename_columns([out_col, "n_events"]),
        batch_format="pyarrow",
    )


def hex_kring_counts(ds: ray.data.Dataset, anchors: list[tuple[str, float, float]],
                     res: int, k: int, lon_col: str = "lon",
                     lat_col: str = "lat",
                     fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """For each named anchor point, count rows whose hex cell lies within
    hex (ring) distance ``k`` of the anchor's cell — the kNN/ proximity
    "cell-ring expansion" primitive as a distributed aggregate.

    The anchor side is tiny and rides the task closure (broadcast);
    distances are computed in integer axial coords per batch, so the
    whole operator is one embarrassingly-parallel pass + tree merge."""
    names = [n for n, _, _ in anchors]
    alon = np.array([x for _, x, _ in anchors], np.float64)
    alat = np.array([y for _, _, y in anchors], np.float64)
    ax, ay = hg.hex_xy(alon, alat)
    aa, ab_ = hg.hex_cell_ab(ax, ay, res)
    aq, ar = hg.ab_to_axial(aa, ab_)

    schema = pa.schema([pa.field("anchor_id", pa.string()),
                        pa.field("n_events", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x, y = hg.hex_xy(lon, lat)
        a, b = hg.hex_cell_ab(x, y, res)
        q, r = hg.ab_to_axial(a, b)
        # (n_anchors, n_rows) integer hex distances
        d = hg.hex_distance_axial(q[None, :], r[None, :],
                                  aq[:, None], ar[:, None])
        n = (d <= k).sum(axis=1).astype(np.int64)
        return pa.table({"anchor_id": pa.array(names, pa.string()),
                         "n_events": pa.array(n)})

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        return _group_sum(batch.cast(schema), ["anchor_id"], ["n_events"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged, _ = _tree_merge(partials, merge, fanin_rows=fanin_rows)
    return merged
