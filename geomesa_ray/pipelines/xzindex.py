"""XZ-indexed non-point (extent) storage: ingest + scan.

The reference keys polygon/line ENVELOPES with the XZ family
(XZ2SFC.scala:54-77 sequence codes, index layouts geomesa-index-api
.../index/z2/XZ2Index.scala and .../z3/XZ3Index.scala — the entire
non-point index family, exercised by XZ2IndexTest/XZ3IndexTest). This is
its Ray-Data layout:

    read extents (id, xmin, ymin, xmax, ymax[, ts])
      → map_batches(EncodeXZ)        # xz2 [, (xz3_bin, xz3)] key columns
      → sort(xz2)                    # curve-clustered files per group
      → write_parquet(out/group=<k>) # + manifest with per-file key stats

    scan(bbox[, interval])
      → XZ2SFC.ranges(bbox) covering sequence-code ranges
      → prune files via manifest xz2 (and xz3_bin) min/max
      → coarse filter: xz2 ∈ merged ranges (vectorized searchsorted)
      → residual exact filter: envelope intersects bbox, ts ∈ interval

Same resumable-group contract as pipelines/ingest.py: one manifest entry
per completed group, reruns skip finished groups, per-file key ranges make
the scan prune files without touching footers.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.curves.binnedtime import TimePeriod, bins_and_offsets
from geomesa_ray.curves.xz import XZ2SFC, XZ3SFC

DEFAULT_G = 12


class EncodeXZ:
    """map_batches stage: add ``xz2`` (and, with ``ts_col``, ``xz3_bin`` +
    ``xz3``) key columns for extent rows (XZ2SFC.scala:54-77 /
    XZ3SFC.scala:26-82 semantics; out-of-bounds envelopes clamp like the
    reference's lenient mode — the residual filter uses the raw envelope)."""

    def __init__(self, g: int = DEFAULT_G, period: TimePeriod = TimePeriod.WEEK,
                 ts_col: str | None = None,
                 xmin_col: str = "xmin", ymin_col: str = "ymin",
                 xmax_col: str = "xmax", ymax_col: str = "ymax"):
        self.sfc2 = XZ2SFC(g)
        self.sfc3 = XZ3SFC(g, period) if ts_col else None
        self.period = period
        self.ts_col = ts_col
        self.cols = (xmin_col, ymin_col, xmax_col, ymax_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x0, y0, x1, y1 = (
            batch[c].to_numpy(zero_copy_only=False) for c in self.cols
        )
        xz2 = self.sfc2.index(x0, y0, x1, y1, lenient=True)
        batch = batch.append_column("xz2", pa.array(xz2.astype(np.int64), pa.int64()))
        if self.ts_col is not None:
            import pyarrow.compute as pc

            from geomesa_ray.functions.convert import to_epoch_millis

            ms = to_epoch_millis(batch[self.ts_col])
            bins, offs = bins_and_offsets(ms, self.period)
            offs = offs.astype(np.float64)
            xz3 = self.sfc3.index(x0, y0, offs, x1, y1, offs, lenient=True)
            batch = batch.append_column(
                "xz3_bin", pa.array(bins.astype(np.int16), pa.int16())
            ).append_column("xz3", pa.array(xz3.astype(np.int64), pa.int64()))
        return batch


@dataclass
class XZFileStats:
    path: str
    rows: int
    xz2_min: int
    xz2_max: int
    xz3_bin_min: int
    xz3_bin_max: int
    xz3_min: int
    xz3_max: int


@dataclass
class XZGroupEntry:
    group: int
    input_files: list[str]
    rows_in: int
    rows_out: int
    wall_time_s: float
    files: list[XZFileStats] = field(default_factory=list)


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def write_xz_entry(out_dir: str, entry: XZGroupEntry) -> str:
    d = _manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"group-{entry.group:05d}.json")
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(asdict(entry), f)
    os.replace(tmp, final)
    return final


def load_xz_manifest(out_dir: str) -> dict[int, XZGroupEntry]:
    d = _manifest_dir(out_dir)
    out: dict[int, XZGroupEntry] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if not (name.startswith("group-") and name.endswith(".json")):
            continue
        with open(os.path.join(d, name)) as f:
            raw = json.load(f)
        raw["files"] = [XZFileStats(**fs) for fs in raw.get("files", [])]
        entry = XZGroupEntry(**raw)
        out[entry.group] = entry
    return out


def collect_xz_file_stats(files: list[str]) -> list[XZFileStats]:
    """Parquet footer min/max for the xz key columns."""
    import pyarrow.parquet as pq

    out = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        mins: dict[str, int] = {}
        maxs: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in ("xz2", "xz3_bin", "xz3"):
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        out.append(
            XZFileStats(
                path=path,
                rows=md.num_rows,
                xz2_min=mins.get("xz2", 0),
                xz2_max=maxs.get("xz2", (1 << 62)),
                xz3_bin_min=mins.get("xz3_bin", -(1 << 15)),
                xz3_bin_max=maxs.get("xz3_bin", 1 << 15),
                xz3_min=mins.get("xz3", 0),
                xz3_max=maxs.get("xz3", (1 << 62)),
            )
        )
    return out


def ingest_extents(
    input_files: list[str] | str,
    out_dir: str,
    g: int = DEFAULT_G,
    period: TimePeriod = TimePeriod.WEEK,
    ts_col: str | None = None,
    n_groups: int | None = None,
    batch_size: int = 20_000,
    target_rows_per_file: int = 1_000_000,
    resume: bool = True,
    columns: list[str] | None = None,
) -> dict[int, XZGroupEntry]:
    """Resumable XZ ingest of an extent table (columns xmin/ymin/xmax/ymax
    [+ ts_col]); returns the complete manifest."""
    if isinstance(input_files, str):
        if os.path.isdir(input_files):
            input_files = sorted(
                os.path.join(input_files, f)
                for f in os.listdir(input_files)
                if f.endswith(".parquet")
            )
        else:
            input_files = [input_files]
    if n_groups is None:
        n_groups = max(1, min(len(input_files), 16))
    groups: dict[int, list[str]] = {k: [] for k in range(n_groups)}
    for i, f in enumerate(input_files):
        groups[i % n_groups].append(f)

    manifest = load_xz_manifest(out_dir) if resume else {}
    for k, files in groups.items():
        if not files or k in manifest:
            continue
        t0 = time.perf_counter()
        group_dir = os.path.join(out_dir, f"group={k}")
        # manifest entry = commit point: wipe a prior attempt's partial
        # files or the rerun double-counts them (same contract as ingest)
        if os.path.isdir(group_dir):
            import shutil

            shutil.rmtree(group_dir)
        ds = ray.data.read_parquet(files, columns=columns)
        rows_in = ds.count()
        ds = ds.map_batches(
            EncodeXZ(g=g, period=period, ts_col=ts_col),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        ds = ds.sort("xz2")
        n_files = max(2, -(-rows_in // target_rows_per_file))
        ds = ds.repartition(n_files)
        ds.write_parquet(group_dir)
        out_files = sorted(
            os.path.join(group_dir, f)
            for f in os.listdir(group_dir)
            if f.endswith(".parquet")
        )
        stats = collect_xz_file_stats(out_files)
        entry = XZGroupEntry(
            group=k,
            input_files=files,
            rows_in=rows_in,
            rows_out=sum(s.rows for s in stats),
            wall_time_s=time.perf_counter() - t0,
            files=stats,
        )
        write_xz_entry(out_dir, entry)
        manifest[k] = entry
    return manifest


def _merge_ranges(ranges) -> tuple[np.ndarray, np.ndarray]:
    """IndexRange list → sorted non-overlapping (lowers, uppers) arrays."""
    ivs = sorted((r.lower, r.upper) for r in ranges)
    merged: list[list[int]] = []
    for lo, hi in ivs:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    los = np.array([m[0] for m in merged], dtype=np.int64)
    his = np.array([m[1] for m in merged], dtype=np.int64)
    return los, his


def _in_ranges(codes: np.ndarray, los: np.ndarray, his: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(los, codes, side="right") - 1
    ok = pos >= 0
    ok[ok] = codes[ok] <= his[pos[ok]]
    return ok


def plan_xz_files(out_dir: str, bbox, interval=None, g: int = DEFAULT_G,
                  period: TimePeriod = TimePeriod.WEEK) -> list[str]:
    """Prune the layout's files via the manifest stats and the XZ planners
    (XZ2IndexKeySpace/XZ3IndexKeySpace.getRanges analog): xz2 covering
    ranges for the bbox, the time-bin range, and — for files that hold a
    SINGLE time bin — per-bin XZ3 covering ranges over (bbox × the
    interval's offset window in that bin)."""
    from geomesa_ray.curves.binnedtime import max_offset

    manifest = load_xz_manifest(out_dir)
    los = his = None
    if bbox is not None:
        los, his = _merge_ranges(XZ2SFC(g).ranges([tuple(bbox)]))
    bin_range = None
    xz3_by_bin: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    if interval is not None:
        bins, offs = bins_and_offsets(
            np.array([interval[0], interval[1]], dtype=np.int64), period
        )
        bin_range = (int(bins[0]), int(bins[1]))
        if bbox is not None and bin_range[1] - bin_range[0] <= 64:
            sfc3 = XZ3SFC(g, period)
            mo = float(max_offset(period))
            for b in range(bin_range[0], bin_range[1] + 1):
                zlo = float(offs[0]) if b == bin_range[0] else 0.0
                zhi = float(offs[1]) if b == bin_range[1] else mo
                xz3_by_bin[b] = _merge_ranges(
                    sfc3.ranges(
                        [(bbox[0], bbox[1], zlo, bbox[2], bbox[3], zhi)],
                        max_ranges=200,
                    )
                )
    keep = []
    for entry in manifest.values():
        for fs in entry.files:
            if bin_range is not None and (
                fs.xz3_bin_max < bin_range[0] or fs.xz3_bin_min > bin_range[1]
            ):
                continue
            if los is not None and not np.any(
                (los <= fs.xz2_max) & (his >= fs.xz2_min)
            ):
                continue
            # single-bin files additionally prune on xz3 covering ranges
            if (
                xz3_by_bin
                and fs.xz3_bin_min == fs.xz3_bin_max
                and fs.xz3_bin_min in xz3_by_bin
            ):
                l3, h3 = xz3_by_bin[fs.xz3_bin_min]
                if len(l3) and not np.any((l3 <= fs.xz3_max) & (h3 >= fs.xz3_min)):
                    continue
            keep.append(fs.path)
    return keep


def xz_scan(
    out_dir: str,
    bbox=None,
    interval=None,
    columns: list[str] | None = None,
    g: int = DEFAULT_G,
    period: TimePeriod = TimePeriod.WEEK,
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Scan the XZ layout: planner ranges prune files, a vectorized
    range-membership pass drops non-candidate rows (the reference's index
    scan), and the exact envelope/interval predicate is the residual
    filter (XZ is an over-covering curve — candidates ⊇ hits always)."""
    files = plan_xz_files(out_dir, bbox, interval, g, period)
    if not files:
        return ray.data.from_items([])
    read_cols = columns
    if read_cols is not None:
        need = {"xz2", "xmin", "ymin", "xmax", "ymax"}
        if interval is not None:
            need.add(ts_col)
        read_cols = sorted(set(read_cols) | need)
    ds = ray.data.read_parquet(files, columns=read_cols)
    los = his = None
    if bbox is not None:
        los, his = _merge_ranges(XZ2SFC(g).ranges([tuple(bbox)]))

    def residual(batch: pa.Table) -> pa.Table:
        mask = np.ones(len(batch), dtype=bool)
        if bbox is not None:
            codes = batch["xz2"].to_numpy(zero_copy_only=False)
            mask &= _in_ranges(codes, los, his)  # coarse: curve ranges
            x0 = batch["xmin"].to_numpy(zero_copy_only=False)
            y0 = batch["ymin"].to_numpy(zero_copy_only=False)
            x1 = batch["xmax"].to_numpy(zero_copy_only=False)
            y1 = batch["ymax"].to_numpy(zero_copy_only=False)
            qx0, qy0, qx1, qy1 = bbox
            mask &= (x0 <= qx1) & (x1 >= qx0) & (y0 <= qy1) & (y1 >= qy0)
        if interval is not None:
            from geomesa_ray.functions.convert import to_epoch_millis

            ms = to_epoch_millis(batch[ts_col])
            mask &= (ms >= interval[0]) & (ms <= interval[1])
        out = batch.filter(pa.array(mask))
        if columns is not None:
            out = out.select(columns)
        return out

    return ds.map_batches(residual, batch_format="pyarrow")
