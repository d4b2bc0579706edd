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

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


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

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
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

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    merged, _ = _tree_merge(partials, merge, fanin_rows=fanin_rows)
    return merged


def _hex_csr_cover(poly_table: pa.Table, res: int, wkb_col: str):
    """Driver-side (small polygon side, broadcast-arm contract): per-polygon
    hex covering cells → CSR arrays (sorted cell ids, offsets, poly idx).
    Few large numpy buffers, the broadcast shape CLAUDE.md requires."""
    from geomesa_ray.geometry.wkb import wkb_envelopes

    envs = wkb_envelopes(poly_table[wkb_col]).reshape(-1, 4)
    cells_list, poly_list = [], []
    for i in range(len(poly_table)):
        cells = hg.cover_bbox(envs[i, 0], envs[i, 1], envs[i, 2], envs[i, 3],
                              res)
        cells_list.append(cells)
        poly_list.append(np.full(len(cells), i, np.int64))
    cells = np.concatenate(cells_list) if cells_list else np.empty(0, np.int64)
    polys = np.concatenate(poly_list) if poly_list else np.empty(0, np.int64)
    order = np.lexsort((polys, cells))
    cells, polys = cells[order], polys[order]
    uniq, starts = np.unique(cells, return_index=True)
    offsets = np.append(starts, len(cells)).astype(np.int64)
    return uniq, offsets, polys


def _csr_candidates(cells_u, offs, cpolys, cell):
    """Vectorized CSR expansion shared by hex_pip_count / hex_zonal_stats:
    candidate (pt_idx, cand_poly) pairs sorted by polygon, or ``None``
    when there are no candidates."""
    if len(cells_u) == 0:
        return None
    pos = np.searchsorted(cells_u, cell)
    pos_c = np.clip(pos, 0, len(cells_u) - 1)
    hit = cells_u[pos_c] == cell
    counts = np.where(hit, offs[pos_c + 1] - offs[pos_c], 0)
    total = int(counts.sum())
    if total == 0:
        return None
    first = np.cumsum(counts) - counts
    pt_idx = np.repeat(np.arange(len(cell), dtype=np.int64), counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(first, counts)
    cand_poly = cpolys[np.repeat(offs[pos_c], counts) + within]
    order = np.argsort(cand_poly, kind="stable")
    return pt_idx[order], cand_poly[order]


def hex_pip_count(points: ray.data.Dataset, polygons: pa.Table, res: int = 6,
                  predicate: str = "intersects", id_col: str = "poly_id",
                  wkb_col: str = "geom_wkb", lon_col: str = "lon",
                  lat_col: str = "lat",
                  fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """Hex-cell-keyed PIP join with the aggregate PUSHED DOWN: per-polygon
    point counts, never the materialized pair set.

    The north-star join shape ("probe side shuffled by H3 cell prefix …
    before a cell-keyed groupby-aggregate join") fused one step further:
    because the output is an aggregate, the cell co-grouping collapses
    into a broadcast CSR lookup — each batch maps its points to hex cells
    (exact integer), gathers candidate polygons from the cell→polygon CSR
    (vectorized expansion), runs the exact PIP residual, and emits
    per-polygon partial counts. No all-to-all shuffle survives, so
    hot-cell salting is unnecessary on this path (skew only shifts work
    *within* embarrassingly-parallel batches); the shuffle+salt arm for
    materialized pairs remains pip_join_shuffle/_sharded (stages/join.py).
    Reference analog: GeoMesaJoinRelation.scala:41-91 grid join +
    aggregate, without the reference's duplicated-pair TODO."""
    from geomesa_ray.geometry.predicates import points_in_polygon
    from geomesa_ray.stages.join import (PREDICATES, PolygonSet,
                                         _resolve_broadcast)

    if predicate not in PREDICATES:
        raise ValueError(f"predicate must be one of {PREDICATES}")
    pset = PolygonSet(polygons, id_col=id_col, wkb_col=wkb_col)
    uniq, offsets, csr_polys = _hex_csr_cover(polygons, res, wkb_col)
    ids = polygons[id_col].to_pylist()
    ref = ray.put((uniq, offsets, csr_polys, pset))
    include_boundary = predicate in ("intersects", "covers")

    schema = pa.schema([pa.field(id_col, pa.string()),
                        pa.field("n_points", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        cells_u, offs, cpolys, ps = _resolve_broadcast(ref)
        if len(batch) == 0 or len(cells_u) == 0:
            return schema.empty_table()
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        cell = hg.hex_encode(lon, lat, res)
        cand = _csr_candidates(cells_u, offs, cpolys, cell)
        if cand is None:
            return schema.empty_table()
        pt_idx, cand_poly = cand
        # exact residual, grouped per candidate polygon (match_points kernel)
        upoly, starts = np.unique(cand_poly, return_index=True)
        ends = np.append(starts[1:], len(cand_poly))
        n_hits = np.zeros(len(ps), np.int64)
        for poly_i, s, e in zip(upoly.tolist(), starts.tolist(), ends.tolist()):
            pts = pt_idx[s:e]
            mask = points_in_polygon(lon[pts], lat[pts], ps.geoms[poly_i],
                                     include_boundary=include_boundary)
            n_hits[poly_i] = int(mask.sum())
        nz = np.nonzero(n_hits)[0]
        return pa.table({
            id_col: pa.array([ids[i] for i in nz.tolist()], pa.string()),
            "n_points": pa.array(n_hits[nz], pa.int64()),
        })

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        return _group_sum(batch.cast(schema), [id_col], ["n_points"])

    partials = points.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)
    merged, _ = _tree_merge(partials, merge, fanin_rows=fanin_rows)
    return merged


def ingest_hex(ds: ray.data.Dataset, out_dir: str, res: int = 2,
               lon_col: str = "lon", lat_col: str = "lat") -> None:
    """Write a hex-prefix-partitioned layout: hive-style
    ``hex_cell=<id>/`` directories keyed by the coarse hex cell — the
    "file layout keyed by H3 prefix so pruning works" plan item
    (SURVEY §scan-parallelism). Streaming write, no driver
    materialization. Rebuild is idempotent BECAUSE stale ``hex_cell=*``
    dirs are deleted first — Ray's write_parquet appends uniquely-named
    files, so rerunning into a populated dir would otherwise duplicate
    every row (the crash-between-write-and-marker case of
    _cached_layout); the sort shuffle itself is not partially
    resumable."""
    import glob
    import json
    import os
    import shutil

    for stale in glob.glob(os.path.join(out_dir, "hex_cell=*")):
        shutil.rmtree(stale)
    keyed = hex_assign(ds, res=res, lon_col=lon_col, lat_col=lat_col,
                       out_col="hex_cell")
    # cluster by cell before the partitioned write: without it every
    # input block writes a sliver into EVERY cell dir (observed 16
    # files/dir — 4,368 tiny files at sf0.1), and scan/kNN walls become
    # per-file open cost. Sorted Morton ids also make the layout a
    # prefix-ordered walk. One-time ingest shuffle, the right trade.
    keyed.sort("hex_cell").write_parquet(out_dir, partition_cols=["hex_cell"])
    meta = os.path.join(out_dir, "_meta")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, "hex.json"), "w") as f:
        json.dump({"res": res, "lon_col": lon_col, "lat_col": lat_col}, f)


def plan_hex_files(out_dir: str, cells) -> tuple[list[str], int]:
    """(files under the given hex cells, total file count in the layout)."""
    import glob as _glob
    import os

    total = len(_glob.glob(os.path.join(out_dir, "hex_cell=*", "*.parquet")))
    files: list[str] = []
    for c in sorted(int(c) for c in set(np.asarray(cells).ravel().tolist())):
        files.extend(sorted(
            _glob.glob(os.path.join(out_dir, f"hex_cell={c}", "*.parquet"))
        ))
    return files, total


def hex_indexed_scan(out_dir: str, bbox: tuple[float, float, float, float],
                     columns: list[str] | None = None,
                     lon_col: str | None = None, lat_col: str | None = None,
                     stats: dict | None = None) -> ray.data.Dataset:
    """bbox scan over a hex-partitioned layout: loose hex covering of the
    box prunes partition directories at plan time (only those FILES are
    read), then the exact bbox residual runs per batch. Covering is a
    proven superset of every in-box point's cell (test_hexgrid), so
    pruning never loses rows."""
    import json
    import os

    import pyarrow.compute as pc

    with open(os.path.join(out_dir, "_meta", "hex.json")) as f:
        meta = json.load(f)
    res = meta["res"]
    # the layout's recorded coordinate columns are authoritative; explicit
    # args override only for layouts written by other tools
    lon_col = lon_col or meta.get("lon_col", "lon")
    lat_col = lat_col or meta.get("lat_col", "lat")
    xmin, ymin, xmax, ymax = bbox
    cells = hg.cover_bbox(xmin, ymin, xmax, ymax, res)
    files, total = plan_hex_files(out_dir, cells)
    if stats is not None:
        stats["files_read"] = len(files)
        stats["files_total"] = total
    read_cols = columns
    if columns is not None:
        read_cols = sorted(set(columns) | {lon_col, lat_col})
    if not files:
        # schema-preserving empty (CLAUDE.md: schema-less empties break
        # downstream joins/compares): borrow the schema from any layout
        # file, projected like a real read
        import glob as _glob

        import pyarrow.parquet as _pq

        any_files = _glob.glob(os.path.join(out_dir, "hex_cell=*", "*.parquet"))
        if not any_files:
            return ray.data.from_items([]).limit(0)
        schema = _pq.read_schema(any_files[0])
        names = columns if columns is not None else [
            n for n in schema.names
        ]
        empty = pa.table(
            {n: pa.array([], schema.field(n).type) for n in names}
        )
        return ray.data.from_arrow(empty)
    ds = ray.data.read_parquet(files, columns=read_cols)

    def residual(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(batch[lon_col], xmin),
                    pc.less_equal(batch[lon_col], xmax)),
            pc.and_(pc.greater_equal(batch[lat_col], ymin),
                    pc.less_equal(batch[lat_col], ymax)),
        )
        out = batch.filter(m)
        return out.select(columns) if columns is not None else out

    return ds.map_batches(residual, batch_format="pyarrow",
                          batch_size=None)


def hex_rollup(density_ds: ray.data.Dataset, from_res: int, to_res: int,
               cell_col: str = "hex", n_col: str = "n_events",
               fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """Roll a per-cell count table up one-or-more resolutions: each fine
    cell's count moves to the coarse cell containing its center
    (aperture-4 parent rule — exact integers). Sum-decomposable, so it is
    per-batch partials + tree merge; no shuffle, no single-block
    assumption on the input."""
    if to_res >= from_res:
        raise ValueError("to_res must be coarser (<) than from_res")
    schema = pa.schema([pa.field(cell_col, pa.int64()),
                        pa.field(n_col, pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        cells = batch[cell_col].to_numpy(zero_copy_only=False)
        parents = hg.hex_parent(cells, to_res)
        n = batch[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(parents, return_inverse=True)
        sums = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table({cell_col: pa.array(uniq, pa.int64()),
                         n_col: pa.array(sums, pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        return _group_sum(batch.cast(schema), [cell_col], [n_col])

    partials = density_ds.map_batches(partial, batch_format="pyarrow",
                                      batch_size=None)
    merged, _ = _tree_merge(partials, merge, fanin_rows=fanin_rows)
    return merged


def hex_pyramid(ds: ray.data.Dataset, res_fine: int, res_coarse: int,
                lon_col: str = "lon", lat_col: str = "lat") -> ray.data.Dataset:
    """Aggregation pyramid: per-cell counts at every resolution from
    ``res_fine`` down to ``res_coarse``, each coarser level rolled up
    from the previous (the map-tile pyramid shape: one pass over the
    rows, then O(levels) passes over bounded cell tables). Output rows:
    ``(res, hex, n_events)``."""
    if res_coarse > res_fine:
        raise ValueError("res_coarse must be <= res_fine")
    levels = []
    dens = hex_density(ds, res_fine, lon_col=lon_col, lat_col=lat_col,
                       out_col="hex")

    def tag(res):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "res": pa.array(np.full(len(batch), res, np.int64)),
                "hex": batch["hex"],
                "n_events": batch["n_events"],
            })
        return f

    levels.append(dens.map_batches(tag(res_fine), batch_format="pyarrow"))
    cur = dens
    for r in range(res_fine - 1, res_coarse - 1, -1):
        cur = hex_rollup(cur, r + 1, r, cell_col="hex", n_col="n_events")
        levels.append(cur.map_batches(tag(r), batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def hex_zonal_stats(points: ray.data.Dataset, polygons: pa.Table,
                    res: int = 6, value_col: str = "value",
                    predicate: str = "intersects", id_col: str = "poly_id",
                    wkb_col: str = "geom_wkb", lon_col: str = "lon",
                    lat_col: str = "lat",
                    fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """Zonal statistics: per polygon, aggregate a measure column over the
    points it contains — the payload-carrying form of the fused
    hex-cell-keyed aggregate join (:func:`hex_pip_count`). Emits
    ``(id_col, n_points, sum_floor_value, max_value)``:

    * ``n_points`` / ``sum_floor_value`` are integers (the floor is
      mirrored in SQL, so reordered partial sums stay bit-exact — raw
      double sums are NOT hash-safe, per the repo's oracle rules);
    * ``max_value`` is an exact double (max is order-independent).

    Same scale shape as hex_pip_count: broadcast cell→polygon CSR,
    per-batch exact PIP residual, per-polygon partials, tree merge —
    no shuffle."""
    from geomesa_ray.geometry.predicates import points_in_polygon
    from geomesa_ray.stages.join import (PREDICATES, PolygonSet,
                                         _resolve_broadcast)

    if predicate not in PREDICATES:
        raise ValueError(f"predicate must be one of {PREDICATES}")
    pset = PolygonSet(polygons, id_col=id_col, wkb_col=wkb_col)
    uniq, offsets, csr_polys = _hex_csr_cover(polygons, res, wkb_col)
    ids = polygons[id_col].to_pylist()
    ref = ray.put((uniq, offsets, csr_polys, pset))
    include_boundary = predicate in ("intersects", "covers")

    schema = pa.schema([
        pa.field(id_col, pa.string()),
        pa.field("n_points", pa.int64()),
        pa.field("sum_floor_value", pa.int64()),
        pa.field("max_value", pa.float64()),
    ])

    def _agg(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .group_by([id_col], maintain_order=False)
            .agg([pl.col("n_points").sum(),
                  pl.col("sum_floor_value").sum(),
                  pl.col("max_value").max()])
            .sort(id_col)
            .to_arrow()
        )
        return out.cast(schema)

    def partial(batch: pa.Table) -> pa.Table:
        cells_u, offs, cpolys, ps = _resolve_broadcast(ref)
        if len(batch) == 0 or len(cells_u) == 0:
            return schema.empty_table()
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        val = batch[value_col].to_numpy(zero_copy_only=False)
        cell = hg.hex_encode(lon, lat, res)
        cand = _csr_candidates(cells_u, offs, cpolys, cell)
        if cand is None:
            return schema.empty_table()
        pt_idx, cand_poly = cand
        upoly, starts = np.unique(cand_poly, return_index=True)
        ends = np.append(starts[1:], len(cand_poly))
        n_hits = np.zeros(len(ps), np.int64)
        sfv = np.zeros(len(ps), np.int64)
        vmax = np.full(len(ps), -np.inf)
        fval = np.floor(val).astype(np.int64)
        for poly_i, s, e in zip(upoly.tolist(), starts.tolist(), ends.tolist()):
            pts = pt_idx[s:e]
            mask = points_in_polygon(lon[pts], lat[pts], ps.geoms[poly_i],
                                     include_boundary=include_boundary)
            inside = pts[mask]
            n_hits[poly_i] = len(inside)
            if len(inside):
                sfv[poly_i] = int(fval[inside].sum())
                vmax[poly_i] = float(val[inside].max())
        nz = np.nonzero(n_hits)[0]
        return pa.table({
            id_col: pa.array([ids[i] for i in nz.tolist()], pa.string()),
            "n_points": pa.array(n_hits[nz], pa.int64()),
            "sum_floor_value": pa.array(sfv[nz], pa.int64()),
            "max_value": pa.array(vmax[nz], pa.float64()),
        })

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        return _agg(batch.cast(schema))

    partials = points.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)
    merged, _ = _tree_merge(partials, merge, fanin_rows=fanin_rows)
    return merged


def hex_density_geojson(ds: ray.data.Dataset, res: int, path: str,
                        lon_col: str = "lon", lat_col: str = "lat") -> int:
    """Raster→vector surface: per-cell counts rendered as GeoJSON hexagon
    polygons (cell boundary from curves/hexgrid.hex_boundary_wkbs).
    Returns the feature count."""
    from geomesa_ray.stages.export import write_geojson_polygons

    dens = hex_density(ds, res, lon_col=lon_col, lat_col=lat_col)

    def boundary(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "hex": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "geom_wkb": pa.array([], pa.binary()),
            })
        cells = batch["hex"].to_numpy(zero_copy_only=False)
        return batch.append_column("geom_wkb", hg.hex_boundary_wkbs(cells))

    with_geom = dens.map_batches(boundary, batch_format="pyarrow",
                                 batch_size=None)
    return write_geojson_polygons(with_geom, path, wkb_col="geom_wkb")
