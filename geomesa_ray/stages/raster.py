"""Vector → raster attribute burn (exact-integer).

:func:`burn_polygons` paints a table of convex polygons onto a regular
grid, emitting one row per covered cell with order-independent integer
attributions (covering-polygon count, summed integer weight, min polygon
id).  This is the attribute-burn direction of the raster↔vector pair —
the inverse of :func:`geomesa_ray.stages.density.raster_regions` — and
the analog of GeoTools' VectorToRasterProcess carried by the reference's
process chain (geomesa-process VectorToRasterProcess usage;
RenderingGrid.scala:72-244 is the additive-density sibling already
implemented in stages/density.py).

Unlike the density rasterizer (float weights, scanline fill), this stage
is **bit-deterministic**: vertices are int64 micro-degrees, cell centers
are exact half-integer lattice points (doubled micro-degrees), and
containment is a conjunction of integer half-plane cross products — so a
DuckDB oracle can mirror every comparison exactly, the same strategy as
the hex grid (curves/hexgrid.py) and the density tile arithmetic.

Scale shape: one embarrassingly-parallel pass over the polygon table
(each batch expands its polygons' cell bboxes fully vectorized — no
per-cell Python), a per-batch combiner, then the shuffle-free
:func:`~geomesa_ray.stages.corpus._tree_merge`; output is bounded by the
grid (≤ width × height rows), so the tree converges in O(log) rounds and
the sort-based groupby remains only as the huge-case fallback.

Containment contract: polygons must be CONVEX (either winding); the
kernel validates convexity vectorized and raises loudly otherwise.
Boundary cells (center exactly on an edge) are INCLUDED — the inclusive
``>= 0`` half-plane test, mirrored by inclusive comparisons in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.stages.corpus import _tree_merge

#: world envelope in integer micro-degrees (lon_min, lat_min, lon_max, lat_max)
WORLD_U = (-180_000_000, -90_000_000, 180_000_000, 90_000_000)


def _cell_sizes(envelope_u, width: int, height: int) -> tuple[int, int]:
    x0, y0, x1, y1 = (int(v) for v in envelope_u)
    sx, sy = x1 - x0, y1 - y0
    if sx % width or sy % height:
        raise ValueError(
            f"envelope span ({sx}×{sy} µdeg) must divide evenly by the "
            f"grid ({width}×{height}) for exact-integer cell centers"
        )
    return sx // width, sy // height


def _burn_kernel(batch: pa.Table, *, envelope_u, width: int, height: int,
                 id_col: str, weight_col: str | None,
                 vx_col: str, vy_col: str) -> pa.Table:
    """One polygon batch → sparse per-cell partial (combined within the
    batch). Fully vectorized: the only O(n_polys) Python work is ragged
    list flattening; the cell expansion and half-plane tests run over the
    flat (total_cells × max_vertices) arrays."""
    x0, y0, x1, y1 = (np.int64(v) for v in envelope_u)
    wu, hu = _cell_sizes(envelope_u, width, height)
    wu, hu = np.int64(wu), np.int64(hu)
    schema = pa.schema([
        pa.field("cell_x", pa.int64()), pa.field("cell_y", pa.int64()),
        pa.field("n_polys", pa.int64()), pa.field("w_sum", pa.int64()),
        pa.field("min_poly", pa.int64()),
    ])
    if len(batch) == 0:
        return schema.empty_table()

    pid_val = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if weight_col is None:
        w = np.ones(len(batch), dtype=np.int64)
    else:
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vx = batch[vx_col].combine_chunks()
    vy = batch[vy_col].combine_chunks()
    if isinstance(vx, pa.ChunkedArray):  # 0- or 1-chunk ChunkedArray
        vx = vx.chunk(0) if vx.num_chunks else pa.array([], vx.type)
    if isinstance(vy, pa.ChunkedArray):
        vy = vy.chunk(0) if vy.num_chunks else pa.array([], vy.type)
    offs = vx.offsets.to_numpy().astype(np.int64)
    if not np.array_equal(offs, vy.offsets.to_numpy().astype(np.int64)):
        raise ValueError(f"{vx_col}/{vy_col} list lengths differ")
    # sliced list arrays carry absolute offsets into the full child —
    # normalize to a contiguous zero-based view
    flat_x = vx.values.to_numpy().astype(np.int64)[offs[0]:offs[-1]]
    flat_y = vy.values.to_numpy().astype(np.int64)[offs[0]:offs[-1]]
    offs = offs - offs[0]
    n = len(batch)
    nv = np.diff(offs)
    if (nv < 3).any():
        raise ValueError("polygons need >= 3 vertices")

    # padded (n, maxv) vertex matrices in DOUBLED micro-degrees
    maxv = int(nv.max())
    row = np.repeat(np.arange(n), nv)
    col = np.arange(len(flat_x)) - np.repeat(offs[:-1], nv)
    v2x = np.zeros((n, maxv), dtype=np.int64)
    v2y = np.zeros((n, maxv), dtype=np.int64)
    v2x[row, col] = 2 * flat_x
    v2y[row, col] = 2 * flat_y
    rows_n = np.arange(n)
    # orientation + convexity: cross of consecutive edge vectors must not
    # change sign (zeros = collinear vertices are fine)
    sign = np.zeros(n, dtype=np.int64)
    for e in range(maxv):
        live = e < nv
        e1 = (e + 1) % nv
        e2 = (e + 2) % nv
        ux = v2x[rows_n, e1] - v2x[rows_n, e]
        uy = v2y[rows_n, e1] - v2y[rows_n, e]
        tx = v2x[rows_n, e2] - v2x[rows_n, e1]
        ty = v2y[rows_n, e2] - v2y[rows_n, e1]
        c = np.sign(ux * ty - uy * tx)
        bad = live & (sign != 0) & (c != 0) & (c != sign)
        if bad.any():
            raise ValueError(
                f"non-convex polygon(s): ids {pid_val[bad][:5].tolist()}"
            )
        sign = np.where(live & (sign == 0), c, sign)
    if (sign == 0).any():
        raise ValueError("degenerate (zero-area) polygon")

    # cell index ranges from vertex bboxes (numerators clamped
    # non-negative / sub-span BEFORE the floor-div so truncation ==
    # floor on both the numpy and SQL sides)
    starts = offs[:-1]
    minx = np.minimum.reduceat(flat_x, starts)
    maxx = np.maximum.reduceat(flat_x, starts)
    miny = np.minimum.reduceat(flat_y, starts)
    maxy = np.maximum.reduceat(flat_y, starts)
    i0 = np.maximum(minx - x0, 0) // wu
    i1 = np.minimum(maxx - x0, (x1 - x0) - 1) // wu
    j0 = np.maximum(miny - y0, 0) // hu
    j1 = np.minimum(maxy - y0, (y1 - y0) - 1) // hu
    ncol = np.maximum(i1 - i0 + 1, 0)
    nrow = np.maximum(j1 - j0 + 1, 0)
    counts = ncol * nrow
    m = int(counts.sum())
    if m == 0:
        return schema.empty_table()

    pid = np.repeat(np.arange(n), counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(m) - np.repeat(cum, counts)
    nc = ncol[pid]
    ci = i0[pid] + local % nc
    cj = j0[pid] + local // nc
    p2x = 2 * x0 + (2 * ci + 1) * wu
    p2y = 2 * y0 + (2 * cj + 1) * hu

    inside = np.ones(m, dtype=bool)
    sgn = sign[pid]
    for e in range(maxv):
        live = (e < nv)[pid]
        e1 = (e + 1) % nv
        a2x, a2y = v2x[rows_n, e][pid], v2y[rows_n, e][pid]
        b2x = v2x[rows_n, e1][pid]
        b2y = v2y[rows_n, e1][pid]
        cross = (b2x - a2x) * (p2y - a2y) - (b2y - a2y) * (p2x - a2x)
        inside &= ~live | (sgn * cross >= 0)

    ci, cj, pv, wv = ci[inside], cj[inside], pid_val[pid[inside]], w[pid[inside]]
    if len(ci) == 0:
        return schema.empty_table()
    key = ci * np.int64(height) + cj
    order = np.lexsort((pv, key))
    key, ci, cj, pv, wv = key[order], ci[order], cj[order], pv[order], wv[order]
    b = np.concatenate([[True], key[1:] != key[:-1]])
    starts2 = np.nonzero(b)[0]
    seg_n = np.diff(np.concatenate([starts2, [len(key)]]))
    return pa.table({
        "cell_x": pa.array(ci[starts2], pa.int64()),
        "cell_y": pa.array(cj[starts2], pa.int64()),
        "n_polys": pa.array(seg_n.astype(np.int64), pa.int64()),
        "w_sum": pa.array(np.add.reduceat(wv, starts2), pa.int64()),
        "min_poly": pa.array(pv[starts2], pa.int64()),  # lexsort tie-break
    })


def _burn_merge(batch: pa.Table) -> pa.Table:
    """Tree-merge step: combine partial rows per (cell_x, cell_y)."""
    schema = pa.schema([
        pa.field("cell_x", pa.int64()), pa.field("cell_y", pa.int64()),
        pa.field("n_polys", pa.int64()), pa.field("w_sum", pa.int64()),
        pa.field("min_poly", pa.int64()),
    ])
    if len(batch) == 0:
        return schema.empty_table()
    batch = batch.cast(schema)
    cx = batch["cell_x"].to_numpy(zero_copy_only=False)
    cy = batch["cell_y"].to_numpy(zero_copy_only=False)
    np_ = batch["n_polys"].to_numpy(zero_copy_only=False)
    ws = batch["w_sum"].to_numpy(zero_copy_only=False)
    mp = batch["min_poly"].to_numpy(zero_copy_only=False)
    key = cx * np.int64(1 << 32) + cy  # cell_y < 2^32 always (grid bound)
    order = np.lexsort((mp, key))
    key = key[order]
    b = np.concatenate([[True], key[1:] != key[:-1]])
    starts = np.nonzero(b)[0]
    return pa.table({
        "cell_x": pa.array(cx[order][starts], pa.int64()),
        "cell_y": pa.array(cy[order][starts], pa.int64()),
        "n_polys": pa.array(np.add.reduceat(np_[order], starts), pa.int64()),
        "w_sum": pa.array(np.add.reduceat(ws[order], starts), pa.int64()),
        "min_poly": pa.array(mp[order][starts], pa.int64()),
    })


def burn_polygons(
    polys: ray.data.Dataset,
    *,
    envelope_u=WORLD_U,
    width: int = 256,
    height: int = 256,
    id_col: str = "poly_id",
    weight_col: str | None = None,
    vx_col: str = "vxs",
    vy_col: str = "vys",
    fanin_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """Burn convex integer-vertex polygons onto a width × height grid.

    ``polys`` needs ``id_col`` (int64), optional ``weight_col`` (integer),
    and vertex lists ``vx_col`` / ``vy_col`` (``list<int64>``, micro-
    degrees, convex ring without closing duplicate, either winding).
    A cell is covered when its exact center lies inside-or-on the
    polygon.  Emits one row per covered cell: ``cell_x, cell_y, n_polys,
    w_sum, min_poly`` — all int64, bit-deterministic under any
    partitioning (hash-safe for the driver oracle).
    """
    _cell_sizes(envelope_u, width, height)  # validate up front, loudly

    def partial(batch: pa.Table) -> pa.Table:
        return _burn_kernel(
            batch, envelope_u=envelope_u, width=width, height=height,
            id_col=id_col, weight_col=weight_col,
            vx_col=vx_col, vy_col=vy_col,
        )

    partials = polys.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
    merged, converged = _tree_merge(partials, _burn_merge,
                                    fanin_rows=fanin_rows)
    if converged:
        return merged
    # huge-case fallback: partials are already combined per block, so
    # this groupby moves at most (blocks × occupied cells) rows
    agg = merged.groupby(["cell_x", "cell_y"]).aggregate(
        ray.data.aggregate.Sum("n_polys", alias_name="n_polys"),
        ray.data.aggregate.Sum("w_sum", alias_name="w_sum"),
        ray.data.aggregate.Min("min_poly", alias_name="min_poly"),
    )
    return agg
