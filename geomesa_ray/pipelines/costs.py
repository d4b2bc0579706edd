"""Cost-based strategy selection (StrategyDecider + StatsBasedEstimator
analog, geomesa-index-api planning/StrategyDecider.scala:153-163 and
stats/StatsBasedEstimator).

For a query with spatial and/or attribute components, each candidate
strategy gets an estimated scanned-row count and the cheapest wins:

* ``spatial``  — the z-index planned scan; estimate = Σ rows of the files
  the manifest pruner keeps (the literal cost of the scan that would run);
* ``attribute`` — full layout scan with an attribute push-down; estimate =
  total_rows × selectivity from a value-count sketch (stages/stats.py
  enumeration / top-k output) with the reference's default guess when no
  sketch is available;
* ``full`` — unfiltered scan, always a candidate (its estimate is the
  ceiling the others must beat).

Mirrors the reference's contract: estimation never affects correctness —
the chosen scan always applies the full residual predicate; a bad
estimate costs time, not rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import ray.data

from geomesa_ray.curves.binnedtime import TimePeriod
from geomesa_ray.pipelines.scan import Query, plan_files, scan
from geomesa_ray.state.manifest import load_manifest

# reference default selectivity guess for un-sketched attribute equality
# (StatsBasedEstimator falls back to a fixed fraction when no stats exist)
DEFAULT_ATTR_SELECTIVITY = 0.01


@dataclass
class CostEstimate:
    strategy: str  # "spatial" | "attribute" | "full"
    est_rows: float
    detail: str = ""


def layout_total_rows(out_dir: str) -> int:
    return sum(
        fs.rows for e in load_manifest(out_dir).values() for fs in e.files
    )


def estimate_spatial(out_dir: str, query: Query,
                     period: TimePeriod = TimePeriod.WEEK) -> CostEstimate:
    """Cost of the planned z-index scan = rows of the pruned file list."""
    files = set(plan_files(out_dir, query, period))
    rows = sum(
        fs.rows
        for e in load_manifest(out_dir).values()
        for fs in e.files
        if fs.path in files
    )
    return CostEstimate("spatial", rows, f"{len(files)} files")


def attribute_selectivity(value, counts: Optional[dict], total: int) -> float:
    """Equality selectivity from a value-count sketch ({value: count},
    the enumeration/top-k stat output); reference-style default guess
    when the sketch is missing or the value unseen (unseen values in a
    COMPLETE enumeration are genuinely absent → 0)."""
    if counts is None:
        return DEFAULT_ATTR_SELECTIVITY
    if total <= 0:
        return 0.0
    return counts.get(value, 0) / total


def estimate_attribute(out_dir: str, value, counts: Optional[dict]) -> CostEstimate:
    total = layout_total_rows(out_dir)
    sel = attribute_selectivity(value, counts, total)
    return CostEstimate("attribute", total * sel, f"selectivity={sel:.4f}")


def estimate_attribute_indexed(attr_layout: str, value) -> CostEstimate:
    """Literal cost of the attr-layout scan = rows of the files its
    manifest pruner keeps (same contract as estimate_spatial)."""
    from geomesa_ray.pipelines.attrindex import load_attr_manifest, plan_attr_files

    files = set(plan_attr_files(attr_layout, value=value))
    rows = sum(
        fs.rows
        for e in load_attr_manifest(attr_layout).values()
        for fs in e.files
        if fs.path in files
    )
    return CostEstimate("attribute", rows, f"indexed: {len(files)} files")


def decide(
    out_dir: str,
    query: Optional[Query] = None,
    attr_value=None,
    attr_counts: Optional[dict] = None,
    period: TimePeriod = TimePeriod.WEEK,
    attr_layout: Optional[str] = None,
) -> CostEstimate:
    """Pick the cheapest applicable strategy (StrategyDecider.scala:153-163:
    cost-compare all candidate indices, min wins; ties prefer the more
    selective index family — here spatial, matching the reference's
    priority ordering). With an ``attr_layout`` (pipelines/attrindex.py),
    the attribute candidate is costed from its manifest's pruned files
    instead of a selectivity guess — and scan_decided routes to it."""
    candidates = [CostEstimate("full", float(layout_total_rows(out_dir)))]
    if query is not None and (query.bbox is not None or query.geometry is not None
                              or query.interval is not None):
        candidates.append(estimate_spatial(out_dir, query, period))
    if attr_value is not None:
        if attr_layout is not None:
            candidates.append(estimate_attribute_indexed(attr_layout, attr_value))
        else:
            candidates.append(estimate_attribute(out_dir, attr_value, attr_counts))
    order = {"spatial": 0, "attribute": 1, "full": 2}
    return min(candidates, key=lambda c: (c.est_rows, order[c.strategy]))


def choose_layout(
    layouts: dict[str, str],
    query: Query,
    period: TimePeriod = TimePeriod.WEEK,
) -> tuple[str, CostEstimate]:
    """Pick the cheapest INDEX LAYOUT for a query (the reference's
    cross-index StrategyDecider: z2 vs z3 vs attribute tables hold the
    same rows under different clustering; cost = rows the pruner cannot
    exclude). ``layouts`` maps name → layout dir (e.g. {"z3": ..., "z2":
    ...}); ties break by dict order."""
    best_name, best = None, None
    for name, out_dir in layouts.items():
        est = estimate_spatial(out_dir, query, period)
        if best is None or est.est_rows < best.est_rows:
            best_name, best = name, est
    return best_name, best


def scan_decided(
    out_dir: str,
    query: Optional[Query] = None,
    attr_col: Optional[str] = None,
    attr_value=None,
    attr_counts: Optional[dict] = None,
    period: TimePeriod = TimePeriod.WEEK,
    attr_layout: Optional[str] = None,
) -> tuple[ray.data.Dataset, CostEstimate]:
    """Run the query under the decided strategy; the FULL predicate
    (spatial + attribute) is always applied, so the choice only moves
    cost. Returns (dataset, decision)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    est = decide(out_dir, query, attr_value, attr_counts, period,
                 attr_layout=attr_layout)
    if est.strategy == "spatial":
        ds = scan(out_dir, query, period)
        if attr_col is not None and attr_value is not None:
            ds = ds.map_batches(
                lambda b: b.filter(
                    pc.fill_null(pc.equal(b[attr_col], attr_value), False)
                ),
                batch_format="pyarrow",
            )
        return ds, est
    if est.strategy == "attribute" and attr_layout is not None:
        # the attr-sorted layout: manifest prunes files, reader pushes the
        # equality down; only the spatial residual remains
        from geomesa_ray.pipelines.attrindex import attr_scan

        read_cols = None
        if query is not None and query.columns is not None:
            need = set(query.columns)
            if query.effective_bbox() is not None:
                need.update(("lon", "lat"))
            read_cols = sorted(need)
        ds = attr_scan(attr_layout, value=attr_value, columns=read_cols)
        if query is not None:
            from geomesa_ray.pipelines.filters import BBox, evaluate

            bbox = query.effective_bbox()
            if bbox is not None:
                ds = ds.map_batches(
                    lambda b: b.filter(
                        pa.array(evaluate(BBox(*bbox), b))
                    ),
                    batch_format="pyarrow",
                )
        return ds, est
    # attribute / full: scan everything (attribute equality pushed down to
    # the parquet reader), then the spatial residual
    files = sorted(
        fs.path for e in load_manifest(out_dir).values() for fs in e.files
    )
    import pyarrow.dataset as pads

    flt = None
    if est.strategy == "attribute" and attr_col is not None:
        flt = pads.field(attr_col) == attr_value
    # prune at the read: the query's projection plus what the residual
    # filters need (mirrors scan()'s columns= pushdown)
    read_cols = None
    if query is not None and query.columns is not None:
        need = set(query.columns)
        if attr_col is not None:
            need.add(attr_col)
        if query.effective_bbox() is not None:
            need.update(("lon", "lat"))
        read_cols = sorted(need)
    ds = ray.data.read_parquet(files, columns=read_cols, filter=flt)
    if query is not None:
        from geomesa_ray.pipelines.filters import BBox, evaluate

        bbox = query.effective_bbox()
        if bbox is not None:
            ds = ds.map_batches(
                lambda b: b.filter(
                    pa.array(evaluate(BBox(*bbox), b))
                ),
                batch_format="pyarrow",
            )
    return ds, est
