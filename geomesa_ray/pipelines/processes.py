"""Query processes: proximity join, attribute semi-join, tube select.

Reference analogs (geomesa-process/geomesa-process-vector):
* ProximitySearchProcess.scala:1-94 — buffer input geometries by a geodesic
  distance and find features within (DWithin).
* JoinProcess.scala:1-211 — collect distinct attribute values from
  collection A, query B with an OR/IN filter (broadcast semi-join).
* TubeSelectProcess.scala:1-184 / TubeBuilder.scala:30-80 — bin + buffer a
  track into spatio-temporal tube segments; query each segment with
  bbox+interval; union the per-segment scans.

All are compositions of existing engine primitives: broadcast structures,
vectorized distance masks, and the planned-scan bbox/interval path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.geometry.measures import haversine_m


def proximity_join(
    points: ray.data.Dataset,
    targets_lon,
    targets_lat,
    target_ids,
    radius_m: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> ray.data.Dataset:
    """DWithin join: every (point, target) pair within ``radius_m`` geodesic
    meters. Targets are broadcast (small side); the distance mask is one
    vectorized (batch × T) haversine pass with a bbox prefilter."""
    tx = np.asarray(targets_lon, dtype=np.float64)
    ty = np.asarray(targets_lat, dtype=np.float64)
    tids = list(target_ids)
    # prefilter boxes per target (lat-aware lon span, pole-safe); the
    # 111.0 km/deg constant is deliberately SMALLER than the true mean so
    # the box strictly over-covers the geodesic disc — the exact haversine
    # check below decides membership
    dlat = radius_m / 111_000.0
    edge = np.minimum(np.abs(ty) + dlat, 89.9)
    dlon = radius_m / (111_000.0 * np.maximum(np.cos(np.radians(edge)), 1e-6))

    def f(batch: pa.Table) -> pa.Table:
        px = batch[lon_col].to_numpy(zero_copy_only=False)
        py = batch[lat_col].to_numpy(zero_copy_only=False)
        keep_pt, keep_t, keep_d = [], [], []
        for j in range(len(tx)):
            near = (
                (np.abs(py - ty[j]) <= dlat)
                & (np.minimum(np.abs(px - tx[j]), 360.0 - np.abs(px - tx[j])) <= dlon[j])
            )
            cand = np.nonzero(near)[0]
            if not len(cand):
                continue
            d = haversine_m(px[cand], py[cand], tx[j], ty[j])
            hit = d <= radius_m
            if hit.any():
                keep_pt.append(cand[hit])
                keep_t.append(np.full(int(hit.sum()), j, dtype=np.int64))
                keep_d.append(d[hit])
        if not keep_pt:
            out = batch.slice(0, 0)
            return out.append_column("target_id", pa.array([], pa.string())).append_column(
                "dist_m", pa.array([], pa.float64())
            )
        pt = np.concatenate(keep_pt)
        tj = np.concatenate(keep_t)
        out = batch.take(pa.array(pt, pa.int64()))
        return out.append_column(
            "target_id", pa.array([tids[j] for j in tj.tolist()], pa.string())
        ).append_column("dist_m", pa.array(np.concatenate(keep_d), pa.float64()))

    return points.map_batches(f, batch_format="pyarrow")


def attribute_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_col: str,
    right_col: str,
    max_values: int = 1_000_000,
) -> ray.data.Dataset:
    """Broadcast semi-join (JoinProcess analog): distinct values of
    ``left_col`` filter ``right`` via a vectorized is_in mask."""
    import pyarrow.compute as pc
    import ray

    values = left.select_columns([left_col]).unique(left_col)
    if len(values) > max_values:
        raise ValueError(f"join key cardinality {len(values)} exceeds {max_values}")
    vset_ref = ray.put(pa.array(values))

    def f(batch: pa.Table) -> pa.Table:
        vs = ray.get(vset_ref) if isinstance(vset_ref, ray.ObjectRef) else vset_ref
        return batch.filter(pc.is_in(batch[right_col], value_set=vs))

    return right.map_batches(f, batch_format="pyarrow")


def tube_select(
    out_dir: str,
    track_lon,
    track_lat,
    track_ts_ms,
    buffer_m: float,
    time_buffer_ms: int,
    max_bins: int = 64,
) -> ray.data.Dataset:
    """Spatio-temporal corridor join (TubeSelect analog).

    The track is binned into ``≤ max_bins`` time segments; each segment
    becomes a bbox (buffered hull of its points) + time interval scan
    against the indexed layout; per-segment scans union, then an exact
    geodesic distance check against the segment's track points prunes
    corner artifacts.
    """
    from geomesa_ray.pipelines.scan import Query

    tx = np.asarray(track_lon, dtype=np.float64)
    ty = np.asarray(track_lat, dtype=np.float64)
    tt = np.asarray(track_ts_ms, dtype=np.int64)
    order = np.argsort(tt, kind="stable")
    tx, ty, tt = tx[order], ty[order], tt[order]
    nbins = min(max_bins, len(tx))
    edges = np.linspace(0, len(tx), nbins + 1).astype(int)

    dlat = buffer_m / 111_195.0
    segments = []
    for b in range(nbins):
        lo, hi = edges[b], edges[b + 1]
        if hi <= lo:
            continue
        sx, sy, st = tx[lo:hi], ty[lo:hi], tt[lo:hi]
        edge_lat = min(max(abs(sy.min()), abs(sy.max())) + dlat, 89.9)
        dlon = buffer_m / (111_195.0 * max(np.cos(np.radians(edge_lat)), 1e-6))
        segments.append(
            (
                (
                    max(sx.min() - dlon, -180.0),
                    max(sy.min() - dlat, -90.0),
                    min(sx.max() + dlon, 180.0),
                    min(sy.max() + dlat, 90.0),
                ),
                (int(st.min() - time_buffer_ms), int(st.max() + time_buffer_ms)),
                (sx, sy),
            )
        )

    if not segments:
        raise ValueError("empty track")

    # ONE read for all segments: union of the per-segment pruned file
    # lists, with the OR of the per-segment (bbox AND interval) predicates
    # pushed down — the previous 6-scan union paid the read fixed cost
    # per segment and a shuffle dedup on top (the slowest query in the
    # suite at ~40 s); this is a single pruned read + one vectorized
    # residual + a tree-merge dedup (corridor output is bounded).
    import pyarrow.dataset as pads
    import ray.data

    from geomesa_ray.pipelines.scan import _arrow_filter, plan_files

    fset: set[str] = set()
    exprs = []
    for bbox, interval, _pts in segments:
        q = Query(bbox=bbox, interval=interval, loose=True)
        fset.update(plan_files(out_dir, q))
        exprs.append(_arrow_filter(q))
    files = sorted(fset)
    if not files:
        return ray.data.from_items([]).limit(0)
    combined = exprs[0]
    for e in exprs[1:]:
        combined = combined | e
    ds = ray.data.read_parquet(files, filter=combined)

    seg_meta = [
        (iv[0], iv[1], sx, sy) for _bbox, iv, (sx, sy) in segments
    ]

    def exact(batch: pa.Table) -> pa.Table:
        px = batch["lon"].to_numpy(zero_copy_only=False)
        py = batch["lat"].to_numpy(zero_copy_only=False)
        ts = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        unit_scale = {"s": 1000, "ms": 1, "us": 1 / 1000, "ns": 1 / 1_000_000}[
            batch["warc_ts"].type.unit
        ]
        ts_ms = (ts * unit_scale).astype(np.int64) if unit_scale >= 1 \
            else (ts // int(1 / unit_scale)).astype(np.int64)
        mask = np.zeros(len(batch), dtype=bool)
        for lo, hi, sx, sy in seg_meta:
            cand = (~mask) & (ts_ms >= lo) & (ts_ms <= hi)
            idx = np.nonzero(cand)[0]
            if not len(idx):
                continue
            d = haversine_m(
                px[idx][:, None], py[idx][:, None], sx[None, :], sy[None, :]
            ).min(axis=1)
            mask[idx[d <= buffer_m]] = True
        return batch.filter(pa.array(mask))

    out = ds.map_batches(exact, batch_format="pyarrow")

    # the single read emits each row once, but overlapping segment FILE
    # lists could still duplicate via row-group overlap in odd layouts —
    # keep the cheap tree-merge dedup for the exactly-once contract
    from geomesa_ray.stages.corpus import _tree_merge
    from geomesa_ray.stages.dedup import _first_per_key, exact_dedup

    def uniq(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        return _first_per_key(batch, "url", "url")

    merged, converged = _tree_merge(
        out.map_batches(uniq, batch_format="pyarrow"), uniq
    )
    if not converged:  # unbounded corridor: fall back to the shuffle
        return exact_dedup(out, key_col="url", id_col="url")
    return merged
