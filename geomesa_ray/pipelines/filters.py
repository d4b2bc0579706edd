"""Filter algebra: And/Or predicate trees → (geometries, intervals, residual).

Reference analog: CQL filter decomposition — `FilterHelper.extractGeometries`
(geomesa-filter/.../FilterHelper.scala:100-135: And intersects, Or unions,
clip to world, empty → whole world) and `extractIntervals` (:146-169 with
typed bounds And=intersect / Or=union), feeding FilterSplitter's
primary/secondary split (planning/FilterSplitter.scala:25-121).

The AST is explicit: predicate leaves are BBox / GeomPredicate / During /
AttrEq / AttrRange / AttrCmp / AttrLike / AttrIn; And / Or / Not combine
them (an (E)CQL string front end lives in :mod:`geomesa_ray.pipelines.cql`
— ``parse_ecql`` produces these trees). ``plan`` extracts the
index-drivable parts (spatial extents as a list of OR'd bboxes; time as a
list of OR'd intervals) plus a residual callable evaluated per batch — the
same primary/secondary contract the reference's planner produces.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geomesa_ray.geometry.base import Geometry, Polygon, box
from geomesa_ray.geometry.predicates import points_in_polygon

WORLD = (-180.0, -90.0, 180.0, 90.0)


class Filter:
    pass


@dataclass(frozen=True)
class BBox(Filter):
    xmin: float
    ymin: float
    xmax: float
    ymax: float


@dataclass(frozen=True)
class GeomPredicate(Filter):
    """Exact geometry predicate (intersects-style, boundary inclusive)."""

    geometry: Geometry


@dataclass(frozen=True)
class During(Filter):
    lo_ms: int
    hi_ms: int  # exclusive upper


@dataclass(frozen=True)
class AttrEq(Filter):
    column: str
    value: object


@dataclass(frozen=True)
class AttrRange(Filter):
    column: str
    lo: object = None
    hi: object = None  # inclusive bounds; None = unbounded


@dataclass(frozen=True)
class AttrCmp(Filter):
    """Single comparison with explicit operator (CQL <, <=, >, >=, <>)."""

    column: str
    op: str  # one of < <= > >= <> =
    value: object


@dataclass(frozen=True)
class AttrLike(Filter):
    """CQL LIKE: ``%`` = any run, ``_`` = any single char."""

    column: str
    pattern: str


@dataclass(frozen=True)
class AttrIn(Filter):
    column: str
    values: tuple

    def __init__(self, column, values):
        object.__setattr__(self, "column", column)
        object.__setattr__(self, "values", tuple(values))


@dataclass(frozen=True)
class DWithin(Filter):
    """Geodesic distance predicate: point rows within ``radius_m`` meters
    of ``geometry`` (CQL DWITHIN; reference ProximitySearchProcess /
    GeometricDistanceFunctions semantics). Point geometries use the exact
    vectorized haversine; line/polygon elements use a per-segment local
    equirectangular frame (relative error ≲1e-3 for segment spans under a
    few degrees — document radii near a boundary accordingly)."""

    geometry: Geometry
    radius_m: float


@dataclass(frozen=True)
class Not(Filter):
    part: Filter


@dataclass(frozen=True)
class And(Filter):
    parts: tuple

    def __init__(self, *parts):
        object.__setattr__(self, "parts", tuple(parts))


@dataclass(frozen=True)
class Or(Filter):
    parts: tuple

    def __init__(self, *parts):
        object.__setattr__(self, "parts", tuple(parts))


# ---------------------------------------------------------------------------
# extraction (FilterHelper semantics)
# ---------------------------------------------------------------------------


def _bbox_intersect(a, b):
    r = (max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3]))
    return r if r[0] <= r[2] and r[1] <= r[3] else None


def extract_bboxes(f: Filter) -> list[tuple]:
    """OR'd list of spatial extents; [] = no spatial bound (whole world).

    And intersects the children's extents pairwise; Or unions the lists
    (FilterHelper.extractGeometries And/Or algebra, clipped to the world).
    """
    if isinstance(f, BBox):
        clipped = _bbox_intersect((f.xmin, f.ymin, f.xmax, f.ymax), WORLD)
        return [clipped] if clipped else []
    if isinstance(f, GeomPredicate):
        clipped = _bbox_intersect(f.geometry.bounds, WORLD)
        return [clipped] if clipped else []
    if isinstance(f, DWithin):
        # geometry bounds expanded by the radius (pole-safe, lon widened
        # by 1/cos at the extreme latitude — strictly over-covering, the
        # exact geodesic residual decides membership). An expansion past
        # ±180° WRAPS: the overflow re-enters from the other side as a
        # second OR'd box, or dateline matches would be silently pruned
        # before the residual ever sees them.
        xmin, ymin, xmax, ymax = f.geometry.bounds
        dlat = f.radius_m / 111_000.0
        edge = min(max(abs(ymin), abs(ymax)) + dlat, 89.9)
        dlon = f.radius_m / (111_000.0 * max(np.cos(np.radians(edge)), 1e-6))
        lo, hi = xmin - dlon, xmax + dlon
        y0, y1 = max(ymin - dlat, -90.0), min(ymax + dlat, 90.0)
        if hi - lo >= 360.0:
            return [(-180.0, y0, 180.0, y1)]
        boxes = []
        main = _bbox_intersect((max(lo, -180.0), y0, min(hi, 180.0), y1), WORLD)
        if main:
            boxes.append(main)
        if lo < -180.0:
            wrap = _bbox_intersect((lo + 360.0, y0, 180.0, y1), WORLD)
            if wrap:
                boxes.append(wrap)
        if hi > 180.0:
            wrap = _bbox_intersect((-180.0, y0, hi - 360.0, y1), WORLD)
            if wrap:
                boxes.append(wrap)
        return boxes
    if isinstance(f, And):
        lists = [extract_bboxes(p) for p in f.parts]
        # [] means UNBOUNDED (e.g. an Or with a non-spatial arm), so an
        # empty child list must be skipped, not intersected — it would
        # annihilate every other arm's perfectly usable extent
        lists = [l for l in lists if l]
        if not lists:
            return []
        acc = lists[0]
        for nxt in lists[1:]:
            acc = [r for a in acc for b in nxt if (r := _bbox_intersect(a, b))]
        return acc
    if isinstance(f, Or):
        if not all(_is_spatial_somewhere(p) for p in f.parts):
            return []  # an un-bounded OR arm defeats spatial pruning
        out = []
        for p in f.parts:
            out.extend(extract_bboxes(p))
        return out
    return []


def _is_spatial(f: Filter) -> bool:
    if isinstance(f, (BBox, GeomPredicate, DWithin)):
        return True
    if isinstance(f, (And, Or)):
        return any(_is_spatial(p) for p in f.parts)
    return False


def _is_spatial_somewhere(f: Filter) -> bool:
    return _is_spatial(f)


def _ivl_intersect(a, b):
    r = (max(a[0], b[0]), min(a[1], b[1]))
    return r if r[0] < r[1] else None


def extract_intervals(f: Filter) -> list[tuple[int, int]]:
    """OR'd list of [lo, hi) epoch-ms intervals; [] = unbounded."""
    if isinstance(f, During):
        return [(f.lo_ms, f.hi_ms)]
    if isinstance(f, And):
        lists = [extract_intervals(p) for p in f.parts]
        lists = [l for l in lists if l]
        if not lists:
            return []
        acc = lists[0]
        for nxt in lists[1:]:
            acc = [r for a in acc for b in nxt if (r := _ivl_intersect(a, b))]
        return acc
    if isinstance(f, Or):
        lists = [extract_intervals(p) for p in f.parts]
        if any(not l for l in lists):
            return []  # unbounded arm
        return [iv for l in lists for iv in l]
    return []


# ---------------------------------------------------------------------------
# residual evaluation (the secondary filter)
# ---------------------------------------------------------------------------


def evaluate(f: Filter, batch: pa.Table, lon_col="lon", lat_col="lat",
             ts_col="warc_ts") -> np.ndarray:
    """Vectorized keep-mask for the FULL predicate over a batch: rows where
    the predicate is TRUE under SQL/ECQL three-valued logic. NULL attribute
    values make comparison leaves UNKNOWN, which ``Not``/``And``/``Or``
    combine by Kleene rules — so ``NOT (value <= 150)`` correctly excludes
    NULL values instead of keeping them (two-valued ``~fill_null(False)``
    would include them; advisor finding r4)."""
    t, _ = _evaluate_tf(f, batch, lon_col, lat_col, ts_col)
    return t


def _leaf_tf(res, col) -> "tuple[np.ndarray, np.ndarray]":
    """(definitely-true, definitely-false) for a single-column comparison
    whose Arrow result ``res`` is null exactly where the input is null."""
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    t = pc.fill_null(res, False).to_numpy(zero_copy_only=False) & valid
    return t, valid & ~t


def _evaluate_tf(f: Filter, batch: pa.Table, lon_col="lon", lat_col="lat",
                 ts_col="warc_ts") -> "tuple[np.ndarray, np.ndarray]":
    """Kleene evaluation: returns (T, F) masks — definitely true /
    definitely false; UNKNOWN is neither. NOT swaps them, AND is
    (all-T, any-F), OR is (any-T, all-F). Geometry/time leaves are
    two-valued (the layout guarantees non-null coordinates)."""
    if isinstance(f, Not):
        t, fm = _evaluate_tf(f.part, batch, lon_col, lat_col, ts_col)
        return fm, t
    if isinstance(f, And):
        t = np.ones(len(batch), dtype=bool)
        fm = np.zeros(len(batch), dtype=bool)
        for p in f.parts:
            pt, pf = _evaluate_tf(p, batch, lon_col, lat_col, ts_col)
            t &= pt
            fm |= pf
        return t, fm
    if isinstance(f, Or):
        t = np.zeros(len(batch), dtype=bool)
        fm = np.ones(len(batch), dtype=bool)
        for p in f.parts:
            pt, pf = _evaluate_tf(p, batch, lon_col, lat_col, ts_col)
            t |= pt
            fm &= pf
        return t, fm
    if isinstance(f, AttrEq):
        return _leaf_tf(pc.equal(batch[f.column], f.value), batch[f.column])
    if isinstance(f, AttrRange):
        ge = (pc.greater_equal(batch[f.column], f.lo)
              if f.lo is not None else pa.array([True] * len(batch)))
        le = (pc.less_equal(batch[f.column], f.hi)
              if f.hi is not None else pa.array([True] * len(batch)))
        return _leaf_tf(pc.and_kleene(ge, le), batch[f.column])
    if isinstance(f, AttrCmp):
        ops = {
            "<": pc.less, "<=": pc.less_equal, ">": pc.greater,
            ">=": pc.greater_equal, "=": pc.equal, "<>": pc.not_equal,
        }
        return _leaf_tf(ops[f.op](batch[f.column], f.value), batch[f.column])
    if isinstance(f, AttrLike):
        import re

        rx = "^" + "".join(
            ".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
            for ch in f.pattern
        ) + "$"
        col = batch[f.column].cast(pa.string())
        return _leaf_tf(pc.match_substring_regex(col, rx), col)
    if isinstance(f, AttrIn):
        return _leaf_tf(
            pc.is_in(batch[f.column], value_set=pa.array(list(f.values))),
            batch[f.column],
        )
    # geometry / time leaves: two-valued
    t = _evaluate2(f, batch, lon_col, lat_col, ts_col)
    return t, ~t


def _evaluate2(f: Filter, batch: pa.Table, lon_col="lon", lat_col="lat",
               ts_col="warc_ts") -> np.ndarray:
    """Two-valued leaves (spatial / temporal; non-null by layout)."""
    if isinstance(f, BBox):
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        return (
            (lon >= f.xmin) & (lon <= f.xmax) & (lat >= f.ymin) & (lat <= f.ymax)
        )
    if isinstance(f, GeomPredicate):
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        return points_in_polygon(lon, lat, f.geometry)
    if isinstance(f, During):
        from geomesa_ray.functions.convert import to_epoch_millis

        ts = to_epoch_millis(batch[ts_col])
        return (ts >= f.lo_ms) & (ts < f.hi_ms)
    if isinstance(f, DWithin):
        from geomesa_ray.geometry.measures import points_within_m

        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        return points_within_m(lon, lat, f.geometry, f.radius_m)
    raise TypeError(type(f).__name__)


@dataclass
class FilterPlan:
    """Primary (index-drivable) + secondary (residual) split."""

    bboxes: list[tuple]  # OR'd spatial extents ([] = full)
    intervals: list[tuple[int, int]]  # OR'd time intervals ([] = unbounded)
    residual: Callable[[pa.Table], np.ndarray]


def plan(f: Filter) -> FilterPlan:
    """Split a predicate tree into scan extents + a residual evaluator.

    The residual is the FULL filter (always correct); the extents are used
    only for pruning, so over-covering is safe — mirroring loose-vs-exact
    (Z3IndexKeySpace.scala:240-254).
    """
    return FilterPlan(
        bboxes=extract_bboxes(f),
        intervals=extract_intervals(f),
        residual=lambda batch: evaluate(f, batch),
    )


def scan_with_filter(out_dir: str, f: Filter):
    """Planned multi-extent scan: union of per-(bbox×interval) planned scans
    with the exact residual applied per batch; results dedup by url when
    extents overlap."""
    import ray.data

    from geomesa_ray.pipelines.scan import Query, scan
    from geomesa_ray.stages.dedup import exact_dedup

    fp = plan(f)
    bboxes = fp.bboxes or [WORLD]
    intervals = fp.intervals or [None]
    parts = []
    for bb in bboxes:
        for iv in intervals:
            ds = scan(out_dir, Query(bbox=bb, interval=iv, loose=True))
            parts.append(ds)
    out = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    def residual(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(fp.residual(batch)))

    out = out.map_batches(residual, batch_format="pyarrow")
    if len(parts) > 1:
        out = exact_dedup(out, key_col="url", id_col="url")
    return out
