"""Point-in-polygon spatial join — the headline operator.

Two execution paths sharing one exact predicate kernel, mirroring the
reference's two join strategies:

* **Broadcast** (polygon side fits in memory): the polygon set is packed
  into a :class:`PolygonSet` (WKB-parsed geometries + bounds + a
  :class:`~geomesa_ray.geometry.index.GridIndex`), put in the object store
  ONCE (``ray.put``), and each actor of a ``map_batches`` actor pool
  rebuilds nothing — it reads the shared copy in ``__init__``. Reference
  analog: in-memory spatial index of one side
  (geomesa-utils/.../index/WrappedSTRtree.scala, BucketIndex.scala) used by
  SpatialIndexSupport.

* **Shuffle** (both sides large): polygons are flat-mapped to their
  covering quadtree cells (duplicated per cell — reference
  RelationUtils.scala:39-54), points carry their single ``cell`` key, and a
  ``groupby(cell_salt).map_groups`` runs the local index probe per cell.
  Hot cells (skewed urban tiles) are salted: points spread across
  ``salt = hash(id) % k`` sub-keys and the cell's polygon copies are
  replicated to every salt. **Duplicate contract**: unlike the reference
  (which emits duplicated join rows across grid cells and leaves
  de-duplication as a TODO, RelationUtils.scala:37), our join emits each
  (point, polygon) pair EXACTLY ONCE — a point belongs to exactly one cell,
  so only that cell's polygon copy can produce the pair.

The exact predicate is vectorized point-in-polygon
(:func:`geomesa_ray.geometry.predicates.points_in_polygon`) applied
per-candidate-polygon over numpy slices — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from geomesa_ray.geometry.index import GridIndex
from geomesa_ray.stages.shards import default_shards
from geomesa_ray.geometry.predicates import points_in_polygon
from geomesa_ray.geometry.wkb import from_wkb, parse_wkbs, wkb_envelopes
from geomesa_ray.stages.encode import (
    DEFAULT_CELL_RES,
    cell_of_z2,
    cells_for_box,
    hash_strings,
)

PREDICATES = ("intersects", "contains", "covers", "within")


class PolygonSet:
    """Parsed, indexed polygon side of a join. Built once; broadcast via
    ``ray.put``. Pure function of the polygon table → deterministic rebuild
    on task retry."""

    def __init__(self, table: pa.Table, id_col: str = "poly_id", wkb_col: str = "geom_wkb"):
        self.id_col = id_col
        self.ids = table[id_col].combine_chunks()
        # batch parse: per-ring buffer slices over the Arrow column, no
        # per-row bytes copies or per-coordinate Python
        self.geoms = parse_wkbs(table[wkb_col])
        self.bounds = wkb_envelopes(table[wkb_col]).reshape(-1, 4)
        self.grid = GridIndex(self.bounds)
        # carry-through attribute columns (everything except the wkb payload)
        self.attrs = table.drop_columns([wkb_col])

    def __len__(self):
        return len(self.geoms)


def match_points(
    polyset: PolygonSet,
    px: np.ndarray,
    py: np.ndarray,
    predicate: str = "intersects",
) -> tuple[np.ndarray, np.ndarray]:
    """Exact-match (point_idx, poly_idx) pairs for a batch of points.

    Candidates from the grid index; exact test vectorized per candidate
    polygon. ``intersects``/``covers`` include the boundary; ``contains``/
    ``within`` are strict-interior (DE-9IM point-vs-area semantics, as pinned
    by the reference's relation fixtures
    SparkSQLSpatialRelationshipsTest.scala:75-101).
    """
    if predicate not in PREDICATES:
        raise ValueError(f"predicate must be one of {PREDICATES}, got {predicate!r}")
    include_boundary = predicate in ("intersects", "covers")
    pt_idx, item_idx = polyset.grid.probe_points(px, py)
    if len(pt_idx) == 0:
        return pt_idx, item_idx
    # group candidate pairs by polygon, run the vectorized kernel per polygon
    order = np.argsort(item_idx, kind="stable")
    pt_idx, item_idx = pt_idx[order], item_idx[order]
    uniq, starts = np.unique(item_idx, return_index=True)
    ends = np.append(starts[1:], len(item_idx))
    keep = np.zeros(len(pt_idx), dtype=bool)
    for poly_i, s, e in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
        pts = pt_idx[s:e]
        mask = points_in_polygon(
            px[pts], py[pts], polyset.geoms[poly_i], include_boundary=include_boundary
        )
        keep[s:e] = mask
    return pt_idx[keep], item_idx[keep]


def _emit_pairs(
    batch: pa.Table,
    polyset: PolygonSet,
    pt_idx: np.ndarray,
    poly_idx: np.ndarray,
) -> pa.Table:
    """Join output: point columns + polygon attribute columns."""
    left = batch.take(pa.array(pt_idx, pa.int64()))
    right = polyset.attrs.take(pa.array(poly_idx, pa.int64()))
    for name in right.schema.names:
        col = right[name]
        if name in left.schema.names:
            name = f"poly_{name}"
        left = left.append_column(name, col)
    return left


class PIPJoinBroadcast:
    """Actor-pool ``map_batches`` stage: broadcast PIP join.

    ``polys_ref`` is a ``ray.put`` ObjectRef of a :class:`PolygonSet`;
    resolved once per actor in ``__init__`` (zero-copy within a node).
    """

    def __init__(self, polys_ref, predicate: str = "intersects",
                 lon_col: str = "lon", lat_col: str = "lat"):
        self.polyset: PolygonSet = ray.get(polys_ref) if isinstance(
            polys_ref, ray.ObjectRef) else polys_ref
        self.predicate = predicate
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.lon_col].to_numpy(zero_copy_only=False)
        py = batch[self.lat_col].to_numpy(zero_copy_only=False)
        pt_idx, poly_idx = match_points(self.polyset, px, py, self.predicate)
        return _emit_pairs(batch, self.polyset, pt_idx, poly_idx)


def _pip_join_batch(batch: pa.Table, polys_ref, predicate: str,
                    lon_col: str, lat_col: str) -> pa.Table:
    """Task-based broadcast join kernel: the PolygonSet is deserialized once
    per worker PROCESS (module cache), so elastic tasks pay no per-actor
    startup while still sharing the built index."""
    polyset: PolygonSet = _resolve_broadcast(polys_ref)
    px = batch[lon_col].to_numpy(zero_copy_only=False)
    py = batch[lat_col].to_numpy(zero_copy_only=False)
    pt_idx, poly_idx = match_points(polyset, px, py, predicate)
    return _emit_pairs(batch, polyset, pt_idx, poly_idx)


def pip_join_broadcast(
    points: ray.data.Dataset,
    polygons: pa.Table,
    predicate: str = "intersects",
    concurrency=None,
    batch_size: int = 50_000,
    id_col: str = "poly_id",
    wkb_col: str = "geom_wkb",
    use_actors: bool = False,
) -> ray.data.Dataset:
    """Broadcast PIP join: small polygon table vs a large point Dataset.

    Default is task-based with a per-process broadcast cache (scales
    elastically, no actor-pool startup); pass ``use_actors=True`` +
    ``concurrency`` for a fixed actor pool (heavier state reuse guarantees).
    """
    polyset = PolygonSet(polygons, id_col=id_col, wkb_col=wkb_col)
    ref = ray.put(polyset)
    if use_actors:
        return points.map_batches(
            PIPJoinBroadcast,
            fn_constructor_kwargs={"polys_ref": ref, "predicate": predicate},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or 4,
        )
    return points.map_batches(
        _pip_join_batch,
        fn_kwargs={
            "polys_ref": ref,
            "predicate": predicate,
            "lon_col": "lon",
            "lat_col": "lat",
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        **({"concurrency": concurrency} if concurrency else {}),
    )


# ---------------------------------------------------------------------------
# shuffle path
# ---------------------------------------------------------------------------

_ROLE_POINT = 0
_ROLE_POLY = 1


def covering_cell_count(bounds: np.ndarray, cell_res: int) -> np.ndarray:
    """Number of res-``cell_res`` cells each bbox overlaps (vectorized)."""
    bounds = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
    w = 360.0 / (1 << cell_res)
    h = 180.0 / (1 << cell_res)
    nmax = (1 << cell_res) - 1
    ix0 = np.clip(((np.clip(bounds[:, 0], -180, 180) + 180.0) / w).astype(np.int64), 0, nmax)
    ix1 = np.clip(((np.clip(bounds[:, 2], -180, 180) + 180.0) / w).astype(np.int64), 0, nmax)
    iy0 = np.clip(((np.clip(bounds[:, 1], -90, 90) + 90.0) / h).astype(np.int64), 0, nmax)
    iy1 = np.clip(((np.clip(bounds[:, 3], -90, 90) + 90.0) / h).astype(np.int64), 0, nmax)
    return (ix1 - ix0 + 1) * (iy1 - iy0 + 1)


class _CoverPolygons:
    """map_batches stage: replicate each polygon row to its covering cells
    (× salt replicas for hot cells). Output schema: (cell, salt, role,
    poly_idx) — the polygon payload itself is broadcast separately so the
    shuffle moves 4 ints per copy, not WKB blobs. Polygons whose covering
    exceeds ``max_cover`` cells are skipped here — they travel the overflow
    (broadcast) path and are probed by every cell group."""

    def __init__(self, cell_res: int, hot_cells_ref, n_salt: int, max_cover: int):
        self.cell_res = cell_res
        self.hot = ray.get(hot_cells_ref) if isinstance(hot_cells_ref, ray.ObjectRef) else hot_cells_ref
        self.n_salt = n_salt
        self.max_cover = max_cover

    def __call__(self, batch: pa.Table) -> pa.Table:
        cells_out, salt_out, idx_out = [], [], []
        base = batch["__poly_idx__"].to_numpy()
        # envelopes only — covering needs bounds, never the full geometry
        envs = wkb_envelopes(batch["geom_wkb"])
        covers = covering_cell_count(envs, self.cell_res)
        for i in range(len(batch)):
            if covers[i] > self.max_cover:
                continue  # overflow polygon: handled by broadcast path
            cells, _res = cells_for_box(*envs[i], cell_res=self.cell_res,
                                        max_cells=self.max_cover)
            for c in cells.tolist():
                k = self.n_salt if c in self.hot else 1
                for s in range(k):
                    cells_out.append(c)
                    salt_out.append(s)
                    idx_out.append(base[i])
        return pa.table(
            {
                "cell": pa.array(cells_out, pa.int64()),
                "salt": pa.array(salt_out, pa.int8()),
                "role": pa.array([_ROLE_POLY] * len(cells_out), pa.int8()),
                "poly_idx": pa.array(idx_out, pa.int64()),
            }
        )


def hot_cell_histogram(points: ray.data.Dataset, top_k: int = 64,
                       sample_rows: int = 1_000_000) -> dict[int, int]:
    """Sampled per-cell counts of the point side (skew detection).

    Reads at most ``sample_rows`` rows (hot-cell detection needs only the
    shape of the skew, so a prefix sample is enough and the full pipeline
    is not executed twice); counts are scaled back to the full size only
    in the sense that thresholds should be set per-sample. Result is tiny
    (≤ top_k rows).

    Note: this DOES re-execute the upstream stages of ``points`` for its
    bounded prefix (Ray Datasets are lazy); if the upstream extract is
    expensive, pass a ``points.materialize()``-ed dataset so the sample
    reads cached blocks instead of recomputing them.
    """
    def partial(batch: pa.Table) -> pa.Table:
        cells, counts = np.unique(
            batch["cell"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"cell": pa.array(cells, pa.int64()), "n": pa.array(counts, pa.int64())}
        )

    acc: dict[int, int] = {}
    for row in points.limit(sample_rows).map_batches(
        partial, batch_format="pyarrow"
    ).take_all():
        acc[row["cell"]] = acc.get(row["cell"], 0) + row["n"]
    top = sorted(acc.items(), key=lambda kv: -kv[1])[:top_k]
    return dict(top)


def hot_cells_from_manifest(
    layout_dir: str,
    cell_res: int = DEFAULT_CELL_RES,
    top_k: int = 64,
    span_limit: int = 4096,
) -> dict[int, int]:
    """Hot-cell histogram derived from manifest per-file z2 stats — free
    skew detection for ingested layouts (zero pipeline execution, the
    manifest is a few KB of footer stats collected at ingest).

    Cells at ``cell_res`` are z2 prefixes (encode.cell_of_z2), so each
    file's ``[z2_min, z2_max]`` span maps to a contiguous cell range; the
    file's row count is spread uniformly over that range. Files whose
    span exceeds ``span_limit`` cells contribute nothing: they are
    un-clustered at this resolution (z3-sorted layouts interleave time,
    widening z2 spans), hence not evidence of *concentrated* skew — the
    z2-sorted layout is the one that localizes files to cells. Unlike
    :func:`hot_cell_histogram`'s 1M-row sampled counts, the returned
    counts are full-table totals; size ``hot_threshold`` accordingly.
    """
    from geomesa_ray.state.manifest import load_manifest

    shift = 2 * (31 - cell_res)
    acc: dict[int, float] = {}
    for entry in load_manifest(layout_dir).values():
        for fs in entry.files:
            lo = fs.z2_min >> shift
            hi = fs.z2_max >> shift
            span = hi - lo + 1
            if fs.rows <= 0 or span > span_limit:
                continue
            per = fs.rows / span
            for c in range(lo, hi + 1):
                acc[c] = acc.get(c, 0.0) + per
    top = sorted(acc.items(), key=lambda kv: -kv[1])[:top_k]
    return {int(c): int(round(v)) for c, v in top}


def hot_cells_from_hex_layout(
    layout_dir: str,
    cell_res: int = DEFAULT_CELL_RES,
    top_k: int = 64,
    span_limit: int = 4096,
) -> dict[int, int]:
    """Hot-cell histogram from a hex-partitioned layout
    (:func:`geomesa_ray.stages.hexindex.ingest_hex` — ``hex_cell=<id>/``
    dirs): per-dir row counts come free from parquet footers (no data
    read, no pipeline execution), and each hex cell's count is spread
    uniformly over the quadtree cells covering its bounding box — the
    hex analog of :func:`hot_cells_from_manifest`, so hex layouts feed
    the same z2-cell-salted join skew detection. Hex cells whose cover
    at ``cell_res`` exceeds ``span_limit`` contribute nothing (too
    coarse to evidence concentrated skew), mirroring the z2 span rule."""
    import glob
    import json
    import os

    import pyarrow.parquet as _pq

    from geomesa_ray.curves.hexgrid import hex_center, hex_decode, res_pitches
    from geomesa_ray.stages.encode import cells_for_box

    with open(os.path.join(layout_dir, "_meta", "hex.json")) as f:
        json.load(f)  # validates this IS a hex layout; res rides the ids
    acc: dict[int, float] = {}
    for d in sorted(glob.glob(os.path.join(layout_dir, "hex_cell=*"))):
        cell = int(os.path.basename(d).split("=", 1)[1])
        rows = sum(
            _pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(d, "*.parquet"))
        )
        if rows <= 0:
            continue
        res, _a, _b = hex_decode(np.array([cell], dtype=np.int64))
        hw, vv = res_pitches(int(res[0]))
        clon, clat = hex_center(np.array([cell], dtype=np.int64))
        # Voronoi cell lies within ±hw / ±vv micro-degrees of its center
        # (half the lattice pitches bound the cell; over-covering only
        # smears the histogram, never misses a hot cell)
        cells, eff_res = cells_for_box(
            float(clon[0]) - hw * 1e-5, float(clat[0]) - vv * 1e-5,
            float(clon[0]) + hw * 1e-5, float(clat[0]) + vv * 1e-5,
            cell_res, max_cells=span_limit,
        )
        if eff_res != cell_res:
            continue  # cover escalated: un-clustered at this resolution
        per = rows / len(cells)
        for c in cells:
            acc[int(c)] = acc.get(int(c), 0.0) + per
    top = sorted(acc.items(), key=lambda kv: -kv[1])[:top_k]
    # spread weights under half a row are noise, not skew evidence — drop
    # them rather than emit 0-count entries
    return {int(c): int(round(v)) for c, v in top if round(v) >= 1}


_BROADCAST_CACHE: dict = {}


def _resolve_broadcast(ref):
    """Deserialize a ``ray.put`` object once per worker process."""
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def _join_cell_group(group: pa.Table, polys_ref, predicate: str,
                     overflow: tuple = ()) -> pa.Table:
    """map_groups fn: one (cell, salt) group → joined rows.

    The group holds point rows (role=0) and polygon-copy rows (role=1,
    poly_idx into the broadcast PolygonSet). The polygon payload comes from
    the broadcast set, not the shuffled rows.
    """
    import pyarrow.compute as pc

    polyset: PolygonSet = _resolve_broadcast(polys_ref)

    def out_schema() -> pa.Schema:
        point_schema = group.drop_columns(["role", "poly_idx", "salt"]).schema
        fields = list(point_schema)
        for f in polyset.attrs.schema:
            name = f"poly_{f.name}" if f.name in point_schema.names else f.name
            fields.append(pa.field(name, f.type))
        return pa.schema(fields)

    role = group["role"]
    pts = group.filter(pc.equal(role, _ROLE_POINT))
    poly_rows = group.filter(pc.equal(role, _ROLE_POLY))
    if len(pts) == 0 or (len(poly_rows) == 0 and not overflow):
        return out_schema().empty_table()
    poly_idx = np.unique(
        np.concatenate(
            [
                poly_rows["poly_idx"].to_numpy(zero_copy_only=False),
                np.asarray(overflow, dtype=np.int64),
            ]
        )
    )
    px = pts["lon"].to_numpy(zero_copy_only=False)
    py = pts["lat"].to_numpy(zero_copy_only=False)
    include_boundary = predicate in ("intersects", "covers")
    pt_parts, it_parts = [], []
    for pi in poly_idx.tolist():
        mask = points_in_polygon(
            px, py, polyset.geoms[pi], include_boundary=include_boundary
        )
        hits = np.nonzero(mask)[0]
        if len(hits):
            pt_parts.append(hits)
            it_parts.append(np.full(len(hits), pi, dtype=np.int64))
    if not pt_parts:
        return out_schema().empty_table()
    pt_idx = np.concatenate(pt_parts)
    it_idx = np.concatenate(it_parts)
    pts = pts.drop_columns(["role", "poly_idx", "salt"])
    return _emit_pairs(pts, polyset, pt_idx, it_idx).select(out_schema().names)


def _join_shard_group(group: pa.Table, polys_ref, predicate: str,
                      overflow: tuple = ()) -> pa.Table:
    """map_groups fn: ALL (cell, salt) buckets of one shard → joined rows.

    Vectorized segmentation by (cell, salt); the PIP probe runs only for
    segments that actually contain polygon-copy rows, and the overflow
    (oversized broadcast) polygons are probed ONCE against the whole
    shard's points instead of once per cell — O(shards) group calls
    total, never one per occupied cell."""
    import pyarrow.compute as pc

    polyset: PolygonSet = _resolve_broadcast(polys_ref)
    helper_cols = ["role", "poly_idx", "salt", "__shard__"]

    def out_schema() -> pa.Schema:
        point_schema = group.drop_columns(
            [c for c in helper_cols if c in group.schema.names]
        ).schema
        fields = list(point_schema)
        for f in polyset.attrs.schema:
            name = f"poly_{f.name}" if f.name in point_schema.names else f.name
            fields.append(pa.field(name, f.type))
        return pa.schema(fields)

    if len(group) == 0:
        return out_schema().empty_table()
    cells = group["cell"].to_numpy(zero_copy_only=False)
    salt = group["salt"].to_numpy(zero_copy_only=False)
    order = np.lexsort((salt, cells))
    group = group.take(pa.array(order, pa.int64()))
    cells, salt = cells[order], salt[order]
    role = group["role"].to_numpy(zero_copy_only=False)
    poly_idx_col = group["poly_idx"].to_numpy(zero_copy_only=False)
    px = group["lon"].to_numpy(zero_copy_only=False)
    py = group["lat"].to_numpy(zero_copy_only=False)
    include_boundary = predicate in ("intersects", "covers")

    starts = np.nonzero(
        np.concatenate([[True], (cells[1:] != cells[:-1]) | (salt[1:] != salt[:-1])])
    )[0]
    ends = np.concatenate([starts[1:], [len(cells)]])

    pt_parts, it_parts = [], []
    is_pt = role == _ROLE_POINT
    for s, e in zip(starts, ends):
        seg_pt = np.nonzero(is_pt[s:e])[0] + s
        if len(seg_pt) == 0:
            continue
        seg_poly = poly_idx_col[s:e][~is_pt[s:e]]
        if len(seg_poly) == 0:
            continue
        for pi in np.unique(seg_poly).tolist():
            mask = points_in_polygon(
                px[seg_pt], py[seg_pt], polyset.geoms[pi],
                include_boundary=include_boundary,
            )
            hits = seg_pt[np.nonzero(mask)[0]]
            if len(hits):
                pt_parts.append(hits)
                it_parts.append(np.full(len(hits), pi, dtype=np.int64))
    if overflow:
        all_pts = np.nonzero(is_pt)[0]
        if len(all_pts):
            for pi in overflow:
                mask = points_in_polygon(
                    px[all_pts], py[all_pts], polyset.geoms[pi],
                    include_boundary=include_boundary,
                )
                hits = all_pts[np.nonzero(mask)[0]]
                if len(hits):
                    pt_parts.append(hits)
                    it_parts.append(np.full(len(hits), pi, dtype=np.int64))
    if not pt_parts:
        return out_schema().empty_table()
    pt_idx = np.concatenate(pt_parts)
    it_idx = np.concatenate(it_parts)
    pts = group.drop_columns([c for c in helper_cols if c in group.schema.names])
    # pt_idx indexes the full sorted group table; _emit_pairs takes row
    # indices into the table it's given
    return _emit_pairs(pts, polyset, pt_idx, it_idx).select(out_schema().names)


def choose_join_cell_res(bounds: np.ndarray, target_cells: float = 4.0,
                         max_res: int = DEFAULT_CELL_RES) -> int:
    """Cell resolution matched to the polygon sizes: the median polygon
    should span ~``target_cells`` cells per axis, so replication stays
    small and groups stay coarse enough to amortize per-group cost.
    (The reference picks partition envelopes from a sample for the same
    reason, RelationUtils.scala:107-158.)"""
    bounds = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
    if len(bounds) == 0:
        return max_res
    w = np.maximum(bounds[:, 2] - bounds[:, 0], 1e-9)
    h = np.maximum(bounds[:, 3] - bounds[:, 1], 1e-9)
    per_poly = np.floor(
        np.log2(target_cells * np.minimum(360.0 / w, 180.0 / h))
    )
    res = int(np.median(per_poly))
    return max(0, min(res, max_res))


def _polygons_to_table(ds: ray.data.Dataset) -> pa.Table:
    """Collect a (small, under-the-broadcast-cap) polygon Dataset to one
    driver table."""
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return ds.schema().base_schema.empty_table()
    return pa.concat_tables(tbls).combine_chunks()


def pip_join_shuffle(
    points: ray.data.Dataset,
    polygons: "pa.Table | ray.data.Dataset",
    predicate: str = "intersects",
    cell_res: int | None = None,
    n_salt: int = 8,
    hot_threshold: int = 200_000,
    max_cover: int = 1024,
    id_col: str = "poly_id",
    wkb_col: str = "geom_wkb",
    point_cols: list[str] | None = None,
    n_shards: int | None = None,
    broadcast_limit_bytes: int = 256 * 1024 * 1024,
    stats: dict | None = None,
    hot_cells: dict[int, int] | None = None,
    layout_dir: str | None = None,
) -> ray.data.Dataset:
    """Shuffle PIP join keyed by quadtree cell, with hot-cell salting.

    ``hot_cells`` (cell → sampled count) skips the internal skew probe;
    pass it when the upstream of ``points`` is expensive to recompute
    (the probe re-executes a bounded 1M-row prefix of the lazy pipeline)
    or when skew is known ahead of time. Requires ``cell_res`` to be set
    so the caller's cells and the join's cells agree.

    ``layout_dir``: when the point side comes from an ingested layout,
    pass its directory and the skew histogram is derived for free from
    the manifest's per-file z2 stats (:func:`hot_cells_from_manifest`) —
    or, for a hex-partitioned layout (``_meta/hex.json`` present), from
    the per-dir footer row counts (:func:`hot_cells_from_hex_layout`) —
    instead of re-executing a sampled prefix of the pipeline. Also
    requires ``cell_res``. ``stats['histogram_source']`` records which
    path ran (``'manifest'`` | ``'provided'`` | ``'sample'``).

    ``points`` must carry ``lon``/``lat``. The shuffle cell resolution is
    chosen from the polygon size distribution when ``cell_res`` is None
    (coarse cells for big polygons keep replication AND group counts
    bounded); pass an explicit ``cell_res`` to reuse a precomputed ``cell``
    column from EncodeKeys. Each (point, polygon) output pair is emitted
    exactly once (see module doc).

    **Polygon transport** (reference analog: RelationUtils.scala:30-54
    partitions BOTH RDDs): a polygon side at most ``broadcast_limit_bytes``
    is packed into a :class:`PolygonSet` and broadcast once (``ray.put``),
    so the shuffle moves only (cell, salt, role, poly_idx) int rows for
    the polygon side. Above the cap — or whenever a Dataset's size can't
    be established — the polygon payload RIDES THE SHUFFLE instead: each
    covering-cell replica row carries the WKB + attribute columns, every
    shard batch-parses its own replicas (zero-copy Arrow buffer slices),
    and the driver never materializes or parses the polygon side at all.
    Pass a ``stats`` dict to observe the decision
    (``stats['polygon_transport']`` = ``'broadcast'`` | ``'sharded'``).

    ``point_cols`` projects the point side BEFORE the shuffle (prune-early:
    the all-to-all exchange then moves only the requested columns plus
    lon/lat/cell/url); the join output carries exactly those columns +
    polygon attributes.
    """
    if predicate not in PREDICATES:
        raise ValueError(f"predicate must be one of {PREDICATES}, got {predicate!r}")
    if isinstance(polygons, ray.data.Dataset):
        try:
            size = polygons.size_bytes()
        except Exception:
            size = None
        if size is not None and size <= broadcast_limit_bytes:
            polygons = _polygons_to_table(polygons)
    elif polygons.nbytes > broadcast_limit_bytes:
        polygons = ray.data.from_arrow(polygons)
    sharded = isinstance(polygons, ray.data.Dataset)
    if stats is not None:
        stats["polygon_transport"] = "sharded" if sharded else "broadcast"
    if (hot_cells is not None or layout_dir is not None) and cell_res is None:
        raise ValueError("hot_cells / layout_dir require an explicit cell_res")
    source = "provided" if hot_cells is not None else "sample"
    if hot_cells is None and layout_dir is not None:
        import os as _os

        if _os.path.exists(_os.path.join(layout_dir, "_meta", "hex.json")):
            hot_cells = hot_cells_from_hex_layout(layout_dir, cell_res=cell_res)
        else:
            hot_cells = hot_cells_from_manifest(layout_dir, cell_res=cell_res)
        source = "manifest"
    if stats is not None:
        stats["histogram_source"] = source
    common = dict(
        predicate=predicate, cell_res=cell_res, n_salt=n_salt,
        hot_threshold=hot_threshold, max_cover=max_cover, id_col=id_col,
        wkb_col=wkb_col, point_cols=point_cols, n_shards=n_shards,
        hot_cells=hot_cells,
    )
    if sharded:
        return _pip_join_shuffle_sharded(points, polygons, **common)
    return _pip_join_shuffle_broadcast(points, polygons, **common)


def _pip_join_shuffle_broadcast(
    points: ray.data.Dataset,
    polygons: pa.Table,
    predicate: str,
    cell_res: int | None,
    n_salt: int,
    hot_threshold: int,
    max_cover: int,
    id_col: str,
    wkb_col: str,
    point_cols: list[str] | None,
    n_shards: int | None,
    hot_cells: dict[int, int] | None = None,
) -> ray.data.Dataset:
    """Broadcast-polygon arm: shuffle rows carry 4 ints per polygon copy."""
    polygons = polygons.append_column(
        "__poly_idx__", pa.array(np.arange(len(polygons)), pa.int64())
    )
    polyset = PolygonSet(polygons.drop_columns(["__poly_idx__"]), id_col=id_col, wkb_col=wkb_col)
    polys_ref = ray.put(polyset)
    reuse_cell = cell_res is not None
    if cell_res is None:
        cell_res = choose_join_cell_res(polyset.bounds)
    # oversized polygons (covering > max_cover cells, e.g. whole-world) are
    # probed by every group via broadcast instead of cell replication
    overflow = tuple(
        np.nonzero(covering_cell_count(polyset.bounds, cell_res) > max_cover)[0].tolist()
    )

    def _ensure_cell(batch: pa.Table) -> pa.Table:
        if reuse_cell and "cell" in batch.schema.names:
            return batch
        if "z2" in batch.schema.names:
            z2 = batch["z2"].to_numpy(zero_copy_only=False)
        else:
            from geomesa_ray.curves.sfc import Z2SFC

            z2 = Z2SFC().index(
                batch["lon"].to_numpy(zero_copy_only=False),
                batch["lat"].to_numpy(zero_copy_only=False),
                lenient=True,
            )
        cells = pa.array(cell_of_z2(z2, cell_res), pa.int64())
        if "cell" in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index("cell"), "cell", cells)
        return batch.append_column("cell", cells)

    if point_cols is not None:
        needed = list(dict.fromkeys(point_cols + ["lon", "lat", "url"]))

        def _project(batch: pa.Table) -> pa.Table:
            keep = [c for c in needed + ["cell", "z2"] if c in batch.schema.names]
            return batch.select(keep)

        points = points.map_batches(_project, batch_format="pyarrow")
    points = points.map_batches(_ensure_cell, batch_format="pyarrow")
    hist = hot_cell_histogram(points) if hot_cells is None else hot_cells
    hot = {c: n for c, n in hist.items() if n >= hot_threshold}
    hot_ref = ray.put(set(hot))

    poly_cells = ray.data.from_arrow(polygons.select(["__poly_idx__", wkb_col])).map_batches(
        _CoverPolygons,
        fn_constructor_kwargs={
            "cell_res": cell_res,
            "hot_cells_ref": hot_ref,
            "n_salt": n_salt,
            "max_cover": max_cover,
        },
        batch_format="pyarrow",
        concurrency=2,
    )

    def _key_points(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        hotset = set(hot)
        if hotset:
            salt = (hash_strings(batch["url"]) % np.uint64(n_salt)).astype(np.int8)
            is_hot = np.isin(cells, np.fromiter(hotset, dtype=np.int64))
            salt = np.where(is_hot, salt, np.int8(0))
        else:
            salt = np.zeros(n, dtype=np.int8)
        return (
            batch.append_column("salt", pa.array(salt, pa.int8()))
            .append_column("role", pa.array(np.full(n, _ROLE_POINT), pa.int8()))
            .append_column("poly_idx", pa.array(np.full(n, -1), pa.int64()))
        )

    pts = points.map_batches(_key_points, batch_format="pyarrow")
    # align polygon-copy schema with the point schema (missing cols → null)
    pt_schema = pts.schema().base_schema

    def _align(batch: pa.Table) -> pa.Table:
        arrays = []
        for f in pt_schema:
            if f.name in batch.schema.names:
                arrays.append(batch[f.name].cast(f.type))
            else:
                arrays.append(pa.nulls(len(batch), f.type))
        return pa.Table.from_arrays(arrays, schema=pt_schema)

    poly_cells = poly_cells.map_batches(_align, batch_format="pyarrow")
    both = pts.union(poly_cells)

    if n_shards is None:
        n_shards = default_shards()

    def _add_shard(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        s = batch["salt"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            shard = (
                ((cells * np.uint64(0x9E3779B97F4A7C15)) ^ s) >> np.uint64(32)
            ) % np.uint64(n_shards)
        return batch.append_column(
            "__shard__", pa.array(shard.astype(np.int32), pa.int32())
        )

    # shard-level groups: equal (cell, salt) buckets co-locate, the probe
    # segments them vectorized — O(n_shards) group calls, not one per cell
    return both.map_batches(_add_shard, batch_format="pyarrow").groupby(
        "__shard__"
    ).map_groups(
        _join_shard_group,
        fn_kwargs={"polys_ref": polys_ref, "predicate": predicate, "overflow": overflow},
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# sharded polygon transport (both sides large)
# ---------------------------------------------------------------------------

_ROLE_POLY_ALL = 2  # overflow polygon replica addressed to one explicit shard


def _pip_join_shuffle_sharded(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    predicate: str,
    cell_res: int | None,
    n_salt: int,
    hot_threshold: int,
    max_cover: int,
    id_col: str,
    wkb_col: str,
    point_cols: list[str] | None,
    n_shards: int | None,
    hot_cells: dict[int, int] | None = None,
) -> ray.data.Dataset:
    """Dataset-native polygon arm: WKB + attributes ride the shuffle rows.

    Each covering-cell replica carries its full polygon payload; shards
    batch-parse their own replicas (``parse_wkbs``: zero-copy Arrow buffer
    slices). Replica parse is per-copy (typ. ~4 cells/polygon) — the price
    of never holding the polygon side on the driver or in one broadcast
    object. Oversized polygons (covering > ``max_cover`` cells) are
    addressed to EVERY shard exactly once via an explicit shard override
    and probed against the whole shard, preserving the exactly-once pair
    contract (a point lives in exactly one (cell, salt) group = one shard).
    """
    if n_shards is None:
        n_shards = default_shards()
    reuse_cell = cell_res is not None
    if cell_res is None:
        # bounded sample of polygon envelopes picks the cell resolution
        env_parts = [
            wkb_envelopes(b[wkb_col])
            for b in polygons.limit(50_000).select_columns([wkb_col]).iter_batches(
                batch_format="pyarrow"
            )
            if len(b)
        ]
        benv = np.concatenate(env_parts) if env_parts else np.empty((0, 4))
        cell_res = choose_join_cell_res(benv)

    def _ensure_cell(batch: pa.Table) -> pa.Table:
        if reuse_cell and "cell" in batch.schema.names:
            return batch
        if "z2" in batch.schema.names:
            z2 = batch["z2"].to_numpy(zero_copy_only=False)
        else:
            from geomesa_ray.curves.sfc import Z2SFC

            z2 = Z2SFC().index(
                batch["lon"].to_numpy(zero_copy_only=False),
                batch["lat"].to_numpy(zero_copy_only=False),
                lenient=True,
            )
        cells = pa.array(cell_of_z2(z2, cell_res), pa.int64())
        if "cell" in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index("cell"), "cell", cells)
        return batch.append_column("cell", cells)

    if point_cols is not None:
        needed = list(dict.fromkeys(point_cols + ["lon", "lat", "url"]))

        def _project(batch: pa.Table) -> pa.Table:
            keep = [c for c in needed + ["cell", "z2"] if c in batch.schema.names]
            return batch.select(keep)

        points = points.map_batches(_project, batch_format="pyarrow")
    points = points.map_batches(_ensure_cell, batch_format="pyarrow")
    hist = hot_cell_histogram(points) if hot_cells is None else hot_cells
    hot = {c: n for c, n in hist.items() if n >= hot_threshold}
    hot_ref = ray.put(set(hot))

    def _key_points(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        hotset = _resolve_broadcast(hot_ref)
        if hotset:
            salt = (hash_strings(batch["url"]) % np.uint64(n_salt)).astype(np.int8)
            is_hot = np.isin(cells, np.fromiter(hotset, dtype=np.int64))
            salt = np.where(is_hot, salt, np.int8(0))
        else:
            salt = np.zeros(n, dtype=np.int8)
        return (
            batch.append_column("salt", pa.array(salt, pa.int8()))
            .append_column("role", pa.array(np.full(n, _ROLE_POINT), pa.int8()))
            .append_column("__ovr__", pa.array(np.full(n, -1, np.int32), pa.int32()))
        )

    pts = points.map_batches(_key_points, batch_format="pyarrow")
    pt_schema = pts.schema().base_schema

    poly_schema = polygons.schema().base_schema
    attr_names = [n for n in poly_schema.names if n != wkb_col]
    payload_names = list(poly_schema.names)
    combined = pa.schema(
        list(pt_schema)
        + [pa.field(f"__p_{n}", poly_schema.field(n).type) for n in payload_names]
    )

    def _pts_align(batch: pa.Table) -> pa.Table:
        arrays = [batch[f.name] if f.name in batch.schema.names
                  else pa.nulls(len(batch), f.type) for f in combined]
        return pa.Table.from_arrays(arrays, schema=combined)

    def _cover_payload(batch: pa.Table) -> pa.Table:
        envs = wkb_envelopes(batch[wkb_col])
        covers = covering_cell_count(envs, cell_res)
        hotset = _resolve_broadcast(hot_ref)
        rows, cells_out, salt_out, role_out, ovr_out = [], [], [], [], []
        for i in range(len(batch)):
            if covers[i] > max_cover:
                # one replica per shard, explicitly addressed
                for s in range(n_shards):
                    rows.append(i); cells_out.append(-1); salt_out.append(0)
                    role_out.append(_ROLE_POLY_ALL); ovr_out.append(s)
                continue
            cells, _res = cells_for_box(*envs[i], cell_res=cell_res,
                                        max_cells=max_cover)
            for c in cells.tolist():
                k = n_salt if c in hotset else 1
                for s in range(k):
                    rows.append(i); cells_out.append(c); salt_out.append(s)
                    role_out.append(_ROLE_POLY); ovr_out.append(-1)
        taken = batch.take(pa.array(rows, pa.int64()))
        n = len(rows)
        arrays = []
        for f in combined:
            if f.name == "cell":
                arrays.append(pa.array(cells_out, f.type))
            elif f.name == "salt":
                arrays.append(pa.array(salt_out, f.type))
            elif f.name == "role":
                arrays.append(pa.array(role_out, f.type))
            elif f.name == "__ovr__":
                arrays.append(pa.array(ovr_out, f.type))
            elif f.name.startswith("__p_") and f.name[4:] in taken.schema.names:
                arrays.append(taken[f.name[4:]].cast(f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(arrays, schema=combined)

    poly_rows = polygons.map_batches(_cover_payload, batch_format="pyarrow")
    both = pts.map_batches(_pts_align, batch_format="pyarrow").union(poly_rows)

    def _add_shard(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        s = batch["salt"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ovr = batch["__ovr__"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            shard = (
                ((cells * np.uint64(0x9E3779B97F4A7C15)) ^ s) >> np.uint64(32)
            ) % np.uint64(n_shards)
        shard = np.where(ovr >= 0, ovr, shard.astype(np.int64)).astype(np.int32)
        return batch.append_column("__shard__", pa.array(shard, pa.int32()))

    return both.map_batches(_add_shard, batch_format="pyarrow").groupby(
        "__shard__"
    ).map_groups(
        _join_shard_group_payload,
        fn_kwargs={
            "predicate": predicate,
            "wkb_col": wkb_col,
            "attr_names": attr_names,
        },
        batch_format="pyarrow",
    )


def _join_shard_group_payload(group: pa.Table, predicate: str, wkb_col: str,
                              attr_names: list[str]) -> pa.Table:
    """map_groups fn for the sharded-payload transport: parse this shard's
    polygon replicas (batch, zero-copy), segment by (cell, salt), probe,
    and emit point columns + polygon attribute columns. ``cell`` is a
    POINT column (each point has exactly one) and stays in the output —
    same schema contract as the broadcast arm's _join_shard_group, so the
    auto-selected transport never changes the result schema."""
    helper = ["salt", "role", "__ovr__", "__shard__"]
    payload_cols = [n for n in group.schema.names if n.startswith("__p_")]
    point_names = [
        n for n in group.schema.names if n not in helper and not n.startswith("__p_")
    ]

    def out_schema() -> pa.Schema:
        fields = [group.schema.field(n) for n in point_names]
        for n in attr_names:
            out_name = f"poly_{n}" if n in point_names else n
            fields.append(pa.field(out_name, group.schema.field(f"__p_{n}").type))
        return pa.schema(fields)

    if len(group) == 0:
        return out_schema().empty_table()
    cells = group["cell"].to_numpy(zero_copy_only=False)
    salt = group["salt"].to_numpy(zero_copy_only=False)
    order = np.lexsort((salt, cells))
    group = group.take(pa.array(order, pa.int64()))
    cells, salt = cells[order], salt[order]
    role = group["role"].to_numpy(zero_copy_only=False)
    is_pt = role == _ROLE_POINT
    is_ovr = role == _ROLE_POLY_ALL
    poly_pos = np.nonzero(~is_pt)[0]
    if len(poly_pos) == 0 or not is_pt.any():
        return out_schema().empty_table()
    geoms = parse_wkbs(group[f"__p_{wkb_col}"].take(pa.array(poly_pos, pa.int64())))
    px = group["lon"].to_numpy(zero_copy_only=False)
    py = group["lat"].to_numpy(zero_copy_only=False)
    include_boundary = predicate in ("intersects", "covers")

    starts = np.nonzero(
        np.concatenate([[True], (cells[1:] != cells[:-1]) | (salt[1:] != salt[:-1])])
    )[0]
    ends = np.concatenate([starts[1:], [len(cells)]])

    pt_parts, poly_parts = [], []
    for s, e in zip(starts, ends):
        seg_pt = np.nonzero(is_pt[s:e])[0] + s
        if len(seg_pt) == 0:
            continue
        seg_poly = np.nonzero(~is_pt[s:e] & ~is_ovr[s:e])[0] + s
        for pos in seg_poly.tolist():
            g = geoms[np.searchsorted(poly_pos, pos)]
            mask = points_in_polygon(
                px[seg_pt], py[seg_pt], g, include_boundary=include_boundary
            )
            hits = seg_pt[np.nonzero(mask)[0]]
            if len(hits):
                pt_parts.append(hits)
                poly_parts.append(np.full(len(hits), pos, dtype=np.int64))
    ovr_pos = np.nonzero(is_ovr)[0]
    if len(ovr_pos):
        all_pts = np.nonzero(is_pt)[0]
        for pos in ovr_pos.tolist():
            g = geoms[np.searchsorted(poly_pos, pos)]
            mask = points_in_polygon(
                px[all_pts], py[all_pts], g, include_boundary=include_boundary
            )
            hits = all_pts[np.nonzero(mask)[0]]
            if len(hits):
                pt_parts.append(hits)
                poly_parts.append(np.full(len(hits), pos, dtype=np.int64))
    if not pt_parts:
        return out_schema().empty_table()
    pt_idx = np.concatenate(pt_parts)
    pl_idx = np.concatenate(poly_parts)
    left = group.take(pa.array(pt_idx, pa.int64())).select(point_names)
    right = group.take(pa.array(pl_idx, pa.int64()))
    for n in attr_names:
        out_name = f"poly_{n}" if n in point_names else n
        left = left.append_column(out_name, right[f"__p_{n}"])
    return left.select(out_schema().names)
