"""Bbox / spatio-temporal range scans over the indexed layout.

The query-planning lifecycle (QueryPlanner.scala:60-102 →
Z3IndexKeySpace.getRanges → push-down + residual filtering) as a Ray Data
pipeline:

    1. driver-side plan: interval → per-bin z3 offset ranges
       (times_by_bin), bbox → z ranges; prune output files by the
       manifest's per-file (z3_bin, z3, z2, ts) stats
    2. read_parquet(pruned files, filter=<arrow expr on lon/lat/warc_ts>)
       — pyarrow does row-group pruning against the z-ordered files
    3. residual: exact vectorized predicate (polygon PIP / precise time)
       inside map_batches — skipped when the query is a plain rectangle
       and ``loose`` (loose-bbox analog, Z3IndexKeySpace.scala:240-254)

Returns a lazy Dataset; callers compose aggregation/sort/limit on top.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data

from geomesa_ray.curves.binnedtime import TimePeriod
from geomesa_ray.curves.sfc import Z2SFC, Z3SFC
from geomesa_ray.curves.zranges import times_by_bin, zranges_2d, zranges_3d
from geomesa_ray.geometry.base import Geometry, Polygon
from geomesa_ray.geometry.predicates import points_in_polygon
from geomesa_ray.state.manifest import load_manifest, prune_files


@dataclass
class Query:
    """A bbox / polygon / interval query against the pages index."""

    bbox: Optional[tuple[float, float, float, float]] = None
    geometry: Optional[Geometry] = None  # exact predicate (implies bbox from bounds)
    interval: Optional[tuple[int, int]] = None  # epoch millis [lo, hi] inclusive
    loose: bool = False  # skip exact re-check for rectangular queries
    columns: Optional[list[str]] = None
    sort_by: Optional[list[str]] = None  # client-sort (QueryPlanner.scala:76-79)
    limit: Optional[int] = None  # max features (QueryPlanner.scala:81-92)
    sample_nth: Optional[int] = None  # deterministic per-block every-nth (SamplingIterator)

    def effective_bbox(self):
        if self.geometry is not None:
            return self.geometry.bounds
        return self.bbox


def plan_files(out_dir: str, query: Query, period: TimePeriod = TimePeriod.WEEK) -> list[str]:
    """Prune indexed files via the manifest and the z-range planner."""
    manifest = load_manifest(out_dir)
    bbox = query.effective_bbox()
    z2_ranges = None
    z3_ranges = None
    bin_range = None
    if bbox is not None:
        sfc2 = Z2SFC()
        z2_ranges = [(r.lower, r.upper) for r in zranges_2d(sfc2, [bbox], max_ranges=200)]
    if query.interval is not None:
        sfc3 = Z3SFC(period)
        tb = times_by_bin(sfc3, query.interval[0], query.interval[1])
        bins = sorted(tb)
        bin_range = (bins[0], bins[-1])
        # per-epoch z3 fan-out is budgeted like the reference's
        # ScanRangesTarget / #bins split (Z3IndexKeySpace.scala:169-174);
        # with very many bins the per-bin planning cost exceeds its pruning
        # value, so fall back to bin-range + z2 pruning only
        if bbox is not None and len(bins) <= 256:
            all_ranges = []
            for b in bins:
                rs = zranges_3d(sfc3, [bbox], tb[b], max_ranges=max(50 // max(len(bins) // 8, 1), 4))
                all_ranges.extend((r.lower, r.upper) for r in rs)
            z3_ranges = all_ranges
    return prune_files(
        manifest,
        z3_bin=bin_range,
        z3_ranges=z3_ranges,
        z2_ranges=z2_ranges,
        ts=query.interval,
    )


def _arrow_filter(query: Query):
    exprs = []
    bbox = query.effective_bbox()
    if bbox is not None:
        xmin, ymin, xmax, ymax = bbox
        exprs += [
            pads.field("lon") >= xmin,
            pads.field("lon") <= xmax,
            pads.field("lat") >= ymin,
            pads.field("lat") <= ymax,
        ]
    if query.interval is not None:
        import pyarrow as pa

        lo, hi = query.interval
        exprs += [
            pads.field("warc_ts") >= pa.scalar(lo, pa.timestamp("ms")),
            pads.field("warc_ts") <= pa.scalar(hi, pa.timestamp("ms")),
        ]
    if not exprs:
        return None
    out = exprs[0]
    for e in exprs[1:]:
        out = out & e
    return out


class _ResidualFilter:
    """Exact geometry predicate applied per batch (actor-pool friendly)."""

    def __init__(self, geometry: Geometry):
        self.geometry = geometry

    def __call__(self, batch):
        import pyarrow as pa

        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        mask = points_in_polygon(lon, lat, self.geometry)
        return batch.filter(pa.array(mask))


def scan(out_dir: str, query: Query, period: TimePeriod = TimePeriod.WEEK) -> ray.data.Dataset:
    """Execute a planned scan; returns a lazy Dataset of matching rows.

    Non-rectangular polygon queries plan over their quad DECOMPOSITION
    (GeohashUtils.decomposeGeometry analog, geometry/decompose.py): the
    union of the per-box pruned file lists is tighter than the single
    envelope's, while the exact PIP residual keeps results identical."""
    if query.geometry is not None and not (
        isinstance(query.geometry, Polygon) and _is_rectangle(query.geometry)
    ):
        from geomesa_ray.geometry.decompose import decompose_geometry

        fset: set[str] = set()
        for box in decompose_geometry(query.geometry, max_boxes=32):
            fset.update(
                plan_files(out_dir, Query(bbox=box, interval=query.interval),
                           period)
            )
        files = sorted(fset)
    else:
        files = plan_files(out_dir, query, period)
    if not files:
        return ray.data.from_items([]).limit(0)
    ds = ray.data.read_parquet(files, columns=query.columns, filter=_arrow_filter(query))
    needs_exact = query.geometry is not None and not (
        isinstance(query.geometry, Polygon) and _is_rectangle(query.geometry)
    )
    if needs_exact:
        # ``loose`` only relaxes the bbox refinement (rectangular case,
        # reference loose-bbox semantics) — a non-rectangular geometry
        # ALWAYS gets the exact residual, or bbox-only false positives
        # would leak into the result
        ds = ds.map_batches(_ResidualFilter(query.geometry), batch_format="pyarrow")
    if query.sample_nth is not None and query.sample_nth > 1:
        nth = query.sample_nth

        def _sample(batch):
            import numpy as _np
            import pyarrow as _pa

            keep = _np.zeros(len(batch), dtype=bool)
            keep[::nth] = True
            return batch.filter(_pa.array(keep))

        ds = ds.map_batches(_sample, batch_format="pyarrow")
    if query.sort_by:
        ds = ds.sort(query.sort_by)
    if query.limit is not None:
        ds = ds.limit(query.limit)
    return ds


def _is_rectangle(poly: Polygon) -> bool:
    if poly.holes or len(poly.shell) != 5:
        return False
    xs = set(poly.shell[:, 0].tolist())
    ys = set(poly.shell[:, 1].tolist())
    return len(xs) == 2 and len(ys) == 2
