"""Per-partition lineage manifest for resumable ingest.

The FS-storage-metadata analog (fs/storage/api/StorageMetadata.scala:94-179):
each completed partition group records its input files, row counts, output
files with their (z3_bin, z3, z2, cell, ts) min/max stats, and wall time.
A rerun skips groups whose manifest entry exists; the scan planner prunes
output files by the recorded key ranges without touching parquet footers.

Layout:  <out_dir>/manifest/group-<k>.json   (atomic: tmp + rename)
         <out_dir>/group=<k>/*.parquet
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from typing import Optional


@dataclass
class FileStats:
    path: str
    rows: int
    z3_bin_min: int
    z3_bin_max: int
    z3_min: int
    z3_max: int
    z2_min: int
    z2_max: int
    cell_min: int
    cell_max: int
    ts_min: int
    ts_max: int


@dataclass
class GroupEntry:
    group: int
    input_files: list[str]
    rows_in: int
    rows_out: int
    wall_time_s: float
    files: list[FileStats] = field(default_factory=list)


def _ts_to_ms(v) -> int:
    """Parquet timestamp stat → epoch ms. Parquet naive timestamps are
    UTC by convention; ``datetime.timestamp()`` on a naive value would
    apply the HOST timezone and shift every stat by the UTC offset, so
    naive values are stamped UTC first."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1000)
    return int(v)


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def write_entry(out_dir: str, entry: GroupEntry) -> str:
    d = _manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"group-{entry.group:05d}.json")
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(asdict(entry), f)
    os.replace(tmp, final)
    return final


def load_manifest(out_dir: str) -> dict[int, GroupEntry]:
    d = _manifest_dir(out_dir)
    out: dict[int, GroupEntry] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if not (name.startswith("group-") and name.endswith(".json")):
            continue
        with open(os.path.join(d, name)) as f:
            raw = json.load(f)
        raw["files"] = [FileStats(**fs) for fs in raw.get("files", [])]
        entry = GroupEntry(**raw)
        out[entry.group] = entry
    return out


def prune_files(
    manifest: dict[int, GroupEntry],
    z3_bin: Optional[tuple[int, int]] = None,
    z3_ranges: Optional[list[tuple[int, int]]] = None,
    z2_ranges: Optional[list[tuple[int, int]]] = None,
    ts: Optional[tuple[int, int]] = None,
) -> list[str]:
    """Output files whose stat ranges may intersect the query ranges."""
    keep = []
    for entry in manifest.values():
        for fs in entry.files:
            if z3_bin is not None and (fs.z3_bin_max < z3_bin[0] or fs.z3_bin_min > z3_bin[1]):
                continue
            if ts is not None and (fs.ts_max < ts[0] or fs.ts_min > ts[1]):
                continue
            if z3_ranges is not None and not any(
                fs.z3_min <= hi and fs.z3_max >= lo for lo, hi in z3_ranges
            ):
                continue
            if z2_ranges is not None and not any(
                fs.z2_min <= hi and fs.z2_max >= lo for lo, hi in z2_ranges
            ):
                continue
            keep.append(fs.path)
    return keep


def collect_file_stats(files: list[str]) -> list[FileStats]:
    """Read parquet footer stats for the indexed key columns."""
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
                if name not in ("z3_bin", "z3", "z2", "cell", "warc_ts"):
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                lo, hi = st.min, st.max
                if name == "warc_ts":
                    lo = _ts_to_ms(lo)
                    hi = _ts_to_ms(hi)
                mins[name] = min(mins.get(name, lo), lo)
                maxs[name] = max(maxs.get(name, hi), hi)
        out.append(
            FileStats(
                path=path,
                rows=md.num_rows,
                z3_bin_min=mins.get("z3_bin", -(1 << 15)),
                z3_bin_max=maxs.get("z3_bin", 1 << 15),
                z3_min=mins.get("z3", 0),
                z3_max=maxs.get("z3", (1 << 63) - 1),
                z2_min=mins.get("z2", 0),
                z2_max=maxs.get("z2", (1 << 62) - 1),
                cell_min=mins.get("cell", 0),
                cell_max=maxs.get("cell", (1 << 62) - 1),
                ts_min=mins.get("warc_ts", 0),
                ts_max=maxs.get("warc_ts", 1 << 62),
            )
        )
    return out
