"""k-nearest-neighbor search.

Reference algorithm: per query point, an expanding-window bbox search with a
k-heap and an overflow list re-checked on each radius growth
(geomesa-process-vector/.../query/KNearestNeighborSearchProcess.scala:96-260,
expansion loop :160-195). Distances are geodesic.

Ray Data shape — two paths:

* :func:`knn_brute` — ONE streaming ``map_batches`` pass over the dataset:
  each batch computes a (batch × Q) haversine distance matrix against the
  broadcast query points and emits only its per-query top-k rows (a
  combiner), then a tiny ``groupby(query).map_groups`` merges partials.
  Exact; O(N·Q) vectorized flops; never materializes the input.

* :func:`knn_search` — the indexed analog of the reference's expanding
  window: radius-doubling bbox scans against the z-ordered ingested layout
  (file pruning via the manifest), stopping when the k-th nearest neighbor
  is closer than the scan radius (so no closer point can be outside the
  window). Each iteration is a distributed planned scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.curves.binnedtime import TimePeriod
from geomesa_ray.geometry.measures import haversine_m
from geomesa_ray.pipelines.scan import Query, plan_files

_M_PER_DEG_LAT = 111_195.0  # mean earth radius * pi / 180


def _partial_topk(batch: pa.Table, qx: np.ndarray, qy: np.ndarray, k: int,
                  id_col: str, lon_col: str, lat_col: str) -> pa.Table:
    """Per-batch top-k rows for every query point (the combiner)."""
    px = batch[lon_col].to_numpy(zero_copy_only=False)
    py = batch[lat_col].to_numpy(zero_copy_only=False)
    ids = batch[id_col]
    n, q = len(px), len(qx)
    out_q, out_i, out_d = [], [], []
    if n:
        # (n, q) geodesic distance matrix, vectorized
        d = haversine_m(
            px[:, None], py[:, None], qx[None, :], qy[None, :]
        )
        kk = min(k, n)
        idx = np.argpartition(d, kk - 1, axis=0)[:kk]  # (kk, q)
        ids_np = ids.to_numpy(zero_copy_only=False)
        for j in range(q):
            dj = d[:, j]
            # boundary-tie refinement: among candidates tied at the k-th
            # distance, keep the smallest ids (the global tie contract) —
            # a bare argpartition keeps an arbitrary tied subset
            thr = dj[idx[:, j]].max()
            cand = np.nonzero(dj <= thr)[0]
            sel = cand[np.lexsort((ids_np[cand], dj[cand]))[:kk]]
            out_q.append(np.full(kk, j, dtype=np.int32))
            out_i.append(sel)
            out_d.append(dj[sel])
    if not out_q:
        return pa.table(
            {
                "query_idx": pa.array([], pa.int32()),
                id_col: pa.array([], ids.type),
                "dist_m": pa.array([], pa.float64()),
            }
        )
    qi = np.concatenate(out_q)
    pi = np.concatenate(out_i)
    return pa.table(
        {
            "query_idx": pa.array(qi, pa.int32()),
            id_col: ids.take(pa.array(pi, pa.int64())),
            "dist_m": pa.array(np.concatenate(out_d), pa.float64()),
        }
    )


def _final_topk(group: pa.Table, k: int, id_col: str) -> pa.Table:
    # tie-break by ascending id: without it, WHICH of two equidistant
    # candidates survives the k-cut depends on shuffle row order
    order = np.lexsort(
        (
            group[id_col].to_numpy(zero_copy_only=False),
            group["dist_m"].to_numpy(zero_copy_only=False),
        )
    )[:k]
    out = group.take(pa.array(order, pa.int64()))
    return out.append_column(
        "rank", pa.array(np.arange(1, len(out) + 1, dtype=np.int32), pa.int32())
    )


def knn_brute(
    points: ray.data.Dataset,
    query_lon,
    query_lat,
    k: int,
    id_col: str = "url",
    lon_col: str = "lon",
    lat_col: str = "lat",
    batch_size: int = 100_000,
) -> ray.data.Dataset:
    """Exact kNN via streaming per-batch partial top-k + per-query merge.

    Result rows: (query_idx, id, dist_m, rank), k rows per query point.
    """
    qx = np.asarray(query_lon, dtype=np.float64)
    qy = np.asarray(query_lat, dtype=np.float64)
    partials = points.map_batches(
        _partial_topk,
        fn_kwargs={"qx": qx, "qy": qy, "k": k, "id_col": id_col,
                   "lon_col": lon_col, "lat_col": lat_col},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return partials.groupby("query_idx").map_groups(
        _final_topk, fn_kwargs={"k": k, "id_col": id_col}, batch_format="pyarrow"
    )


def _window(qx: float, qy: float, radius_m: float) -> list[tuple[float, float, float, float]]:
    """Geodetic bbox(es) containing the radius disc around a point.

    The lon span uses the cosine at the poleward edge of the window (the
    disc is widest there), and windows crossing the antimeridian split into
    two boxes (antimeridian-safe, st_antimeridianSafeGeom analog).
    """
    dlat = radius_m / _M_PER_DEG_LAT
    ymin, ymax = max(qy - dlat, -90.0), min(qy + dlat, 90.0)
    edge_lat = min(max(abs(ymin), abs(ymax)), 89.9)
    coslat = max(np.cos(np.radians(edge_lat)), 1e-6)
    dlon = radius_m / (_M_PER_DEG_LAT * coslat)
    if dlon >= 180.0:
        return [(-180.0, ymin, 180.0, ymax)]
    lo, hi = qx - dlon, qx + dlon
    if lo < -180.0:
        return [(-180.0, ymin, hi, ymax), (lo + 360.0, ymin, 180.0, ymax)]
    if hi > 180.0:
        return [(lo, ymin, 180.0, ymax), (-180.0, ymin, hi - 360.0, ymax)]
    return [(lo, ymin, hi, ymax)]


def _plan_round_files(out_dir: str, boxes, period: TimePeriod) -> list[str]:
    """Union of the PER-WINDOW planned file lists — each query window
    prunes independently, so two antipodal queries read only the files
    near each point, never a world-spanning union bbox band."""
    files: set[str] = set()
    for b in boxes:
        files.update(plan_files(out_dir, Query(bbox=b, loose=True), period=period))
    return sorted(files)


def knn_search(
    out_dir: str,
    query_lon,
    query_lat,
    k: int,
    start_radius_m: float = 10_000.0,
    max_radius_m: float = 2.1e7,  # > half the earth circumference: full fallback
    id_col: str = "url",
    period: TimePeriod = TimePeriod.WEEK,
    stats: dict | None = None,
) -> pa.Table:
    """Indexed kNN over an ingested z-ordered layout via radius doubling.

    Per round, the file lists planned for each unresolved query window are
    merged and read ONCE (column-pruned, with an OR-of-windows push-down
    filter); the combined candidate stream feeds :func:`knn_brute`'s
    combiner. A query is resolved once its k-th neighbor lies within the
    scan radius (correctness guarantee of the expanding window: any unseen
    point is farther than the window edge; extra candidates from other
    queries' windows can only be farther and never change the result).
    Pass a dict as ``stats`` to receive ``files_per_round``.
    """

    def plan(boxes):
        return _plan_round_files(out_dir, boxes, period)

    return _expanding_knn(plan, query_lon, query_lat, k, start_radius_m,
                          max_radius_m, id_col, stats)


def knn_hex_search(
    out_dir: str,
    query_lon,
    query_lat,
    k: int,
    start_radius_m: float = 10_000.0,
    max_radius_m: float = 2.1e7,
    id_col: str = "url",
    stats: dict | None = None,
) -> pa.Table:
    """kNN via hex cell-ring expansion over a hex-partitioned layout
    (stages/hexindex.ingest_hex): per round each unresolved query's radius
    windows are covered with the layout's coarse hex cells and only those
    partition directories' files are read — the reference kNN's expanding
    search (KNearestNeighborSearchProcess.scala:160-195) keyed by cells,
    with the same window-edge correctness guarantee as :func:`knn_search`
    (the hex covering is a proven superset of every in-window point's
    cell, so no candidate inside the radius is missed)."""
    import json
    import os

    from geomesa_ray.curves.hexgrid import cover_bbox
    from geomesa_ray.stages.hexindex import plan_hex_files

    with open(os.path.join(out_dir, "_meta", "hex.json")) as f:
        res = json.load(f)["res"]

    def plan(boxes):
        cells: set[int] = set()
        for xmin, ymin, xmax, ymax in boxes:
            cells.update(cover_bbox(xmin, ymin, xmax, ymax, res).tolist())
        files, _total = plan_hex_files(out_dir, sorted(cells))
        return files

    return _expanding_knn(plan, query_lon, query_lat, k, start_radius_m,
                          max_radius_m, id_col, stats)


def _expanding_knn(
    plan_fn,
    query_lon,
    query_lat,
    k: int,
    start_radius_m: float,
    max_radius_m: float,
    id_col: str,
    stats: dict | None,
) -> pa.Table:
    """Shared radius-doubling loop: ``plan_fn(boxes) -> files`` supplies
    the layout-specific pruning (z-range planner or hex covering)."""
    import pyarrow.dataset as pads

    qx = np.asarray(query_lon, dtype=np.float64)
    qy = np.asarray(query_lat, dtype=np.float64)
    nq = len(qx)
    radius = np.full(nq, float(start_radius_m))
    resolved = np.zeros(nq, dtype=bool)
    results: dict[int, pa.Table] = {}

    while not resolved.all():
        active = np.nonzero(~resolved)[0]
        boxes = [b for i in active for b in _window(qx[i], qy[i], radius[i])]
        files = plan_fn(boxes)
        if stats is not None:
            stats.setdefault("files_per_round", []).append(len(files))
        if files:
            expr = None
            for xmin, ymin, xmax, ymax in boxes:
                e = (
                    (pads.field("lon") >= xmin)
                    & (pads.field("lon") <= xmax)
                    & (pads.field("lat") >= ymin)
                    & (pads.field("lat") <= ymax)
                )
                expr = e if expr is None else (expr | e)
            ds = ray.data.read_parquet(
                files, columns=[id_col, "lon", "lat"], filter=expr
            )
            got = knn_brute(
                ds, qx[active], qy[active], k, id_col=id_col
            ).to_pandas()
        else:
            import pandas as pd

            got = pd.DataFrame()
        empty_round = len(got) == 0 or "query_idx" not in got.columns
        for pos, i in enumerate(active.tolist()):
            mine = got[got["query_idx"] == pos] if not empty_round else got
            kth = mine["dist_m"].iloc[k - 1] if len(mine) >= k else np.inf
            if kth <= radius[i] or radius[i] >= max_radius_m:
                if empty_round:
                    results[i] = pa.table(
                        {
                            "query_idx": pa.array([], pa.int32()),
                            id_col: pa.array([], pa.string()),
                            "dist_m": pa.array([], pa.float64()),
                            "rank": pa.array([], pa.int32()),
                        }
                    )
                    resolved[i] = True
                    continue
                tbl = pa.Table.from_pandas(mine.head(k), preserve_index=False)
                tbl = tbl.set_column(
                    tbl.schema.get_field_index("query_idx"),
                    "query_idx",
                    pa.array(np.full(len(tbl), i, dtype=np.int32), pa.int32()),
                )
                results[i] = tbl
                resolved[i] = True
            else:
                radius[i] = min(radius[i] * 2.0, max_radius_m)

    return pa.concat_tables([results[i] for i in range(nq)])
