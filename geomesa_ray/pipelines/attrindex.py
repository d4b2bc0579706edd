"""Attribute-index layout: attr-sorted resumable groups with per-file
min/max manifest stats.

Reference parity: the attribute index keys rows by attribute value with a
tiered Z3 suffix so equality/range scans over one attribute touch a
contiguous key range (geomesa-index-api
index/attribute/AttributeIndexKeySpace.scala:1-361). Re-expressed for the
parquet-file world: each resume group is sorted by
``(attr, z3_bin, z3)`` (the z columns are the tier suffix when present),
split into order-preserving files, and the manifest records each file's
attribute min/max — so an equality or range query plans a FILE LIST the
way the z layouts do, instead of full-scanning with a row filter.

Layout:  <out_dir>/manifest/group-<k>.json
         <out_dir>/group=<k>/*.parquet
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field

import pyarrow.parquet as pq
import ray.data


@dataclass
class AttrFileStats:
    path: str
    rows: int
    attr_min: object
    attr_max: object


@dataclass
class AttrGroupEntry:
    group: int
    attr_col: str
    input_files: list[str]
    rows_in: int
    rows_out: int
    wall_time_s: float
    files: list[AttrFileStats] = field(default_factory=list)


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def _enc_stat(v):
    """Type-preserving JSON encoding for attr min/max: JSON natives pass
    through; datetime/date/bytes get a type tag so a reloaded manifest
    compares against typed query values (str vs datetime would raise)."""
    import base64
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return {"$t": "datetime", "v": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"$t": "date", "v": v.isoformat()}
    if isinstance(v, (bytes, bytearray)):
        return {"$t": "bytes", "v": base64.b64encode(bytes(v)).decode()}
    return v


def _dec_stat(v):
    import base64
    import datetime as _dt

    if isinstance(v, dict) and "$t" in v:
        if v["$t"] == "datetime":
            return _dt.datetime.fromisoformat(v["v"])
        if v["$t"] == "date":
            return _dt.date.fromisoformat(v["v"])
        if v["$t"] == "bytes":
            return base64.b64decode(v["v"])
    return v


def _write_entry(out_dir: str, entry: AttrGroupEntry) -> None:
    d = _manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"group-{entry.group:05d}.json")
    raw = asdict(entry)
    for fs in raw["files"]:
        fs["attr_min"] = _enc_stat(fs["attr_min"])
        fs["attr_max"] = _enc_stat(fs["attr_max"])
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(raw, f, default=str)
    os.replace(tmp, final)


def load_attr_manifest(out_dir: str) -> dict[int, AttrGroupEntry]:
    d = _manifest_dir(out_dir)
    out: dict[int, AttrGroupEntry] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if not (name.startswith("group-") and name.endswith(".json")):
            continue
        with open(os.path.join(d, name)) as f:
            raw = json.load(f)
        for fs in raw.get("files", []):
            fs["attr_min"] = _dec_stat(fs["attr_min"])
            fs["attr_max"] = _dec_stat(fs["attr_max"])
        raw["files"] = [AttrFileStats(**fs) for fs in raw.get("files", [])]
        entry = AttrGroupEntry(**raw)
        out[entry.group] = entry
    return out


def collect_attr_stats(files: list[str], attr_col: str) -> list[AttrFileStats]:
    """Per-file attribute min/max from the parquet footers (no data read)."""
    out: list[AttrFileStats] = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().get_field_index(attr_col)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                # footer stats absent: fall back to reading the column
                col = pq.read_table(path, columns=[attr_col])[attr_col]
                import pyarrow.compute as pc

                lo, hi = pc.min(col).as_py(), pc.max(col).as_py()
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append(AttrFileStats(path=path, rows=md.num_rows, attr_min=lo, attr_max=hi))
    return out


def ingest_attr(
    input_files: list[str] | str,
    out_dir: str,
    attr_col: str,
    n_groups: int | None = None,
    target_rows_per_file: int = 1_000_000,
    resume: bool = True,
    columns: list[str] | None = None,
) -> dict[int, AttrGroupEntry]:
    """Resumable attr-sorted ingest; returns the complete manifest.

    Rows are sorted by ``(attr_col [, z3_bin, z3])`` — the z columns act
    as the reference's tiered Z3 suffix when the input already carries
    them — then split into order-preserving files whose attr min/max land
    in the manifest for query-time file pruning.
    """
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

    manifest = load_attr_manifest(out_dir) if resume else {}
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
        schema_names = ds.schema().base_schema.names
        sort_keys = [attr_col] + [c for c in ("z3_bin", "z3") if c in schema_names]
        ds = ds.sort(sort_keys)
        n_files = max(2, -(-rows_in // target_rows_per_file))
        ds = ds.repartition(n_files)
        ds.write_parquet(group_dir)
        out_files = sorted(
            os.path.join(group_dir, f)
            for f in os.listdir(group_dir)
            if f.endswith(".parquet")
        )
        entry = AttrGroupEntry(
            group=k,
            attr_col=attr_col,
            input_files=files,
            rows_in=rows_in,
            rows_out=sum(
                pq.ParquetFile(f).metadata.num_rows for f in out_files
            ),
            wall_time_s=time.perf_counter() - t0,
            files=collect_attr_stats(out_files, attr_col),
        )
        _write_entry(out_dir, entry)
        manifest[k] = entry
    return manifest


def plan_attr_files(out_dir: str, value=None, lo=None, hi=None) -> list[str]:
    """Prune the layout's files by attribute equality (``value``) or
    range (``[lo, hi]``, either end open) via the manifest min/max."""
    if value is not None:
        lo = hi = value
    keep: list[str] = []
    for entry in load_attr_manifest(out_dir).values():
        for fs in entry.files:
            if lo is not None and fs.attr_max is not None and fs.attr_max < lo:
                continue
            if hi is not None and fs.attr_min is not None and fs.attr_min > hi:
                continue
            keep.append(fs.path)
    return sorted(keep)


def attr_scan(
    out_dir: str,
    value=None,
    lo=None,
    hi=None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Scan the attribute layout: manifest prunes files, the parquet
    reader pushes the exact predicate down into the remaining files."""
    import pyarrow.dataset as pads

    manifest = load_attr_manifest(out_dir)
    if not manifest:
        raise FileNotFoundError(f"no attribute manifest under {out_dir}")
    attr_col = next(iter(manifest.values())).attr_col
    files = plan_attr_files(out_dir, value=value, lo=lo, hi=hi)
    if not files:
        return ray.data.from_items([]).limit(0)
    flt = None
    if value is not None:
        flt = pads.field(attr_col) == value
    else:
        if lo is not None:
            flt = pads.field(attr_col) >= lo
        if hi is not None:
            f2 = pads.field(attr_col) <= hi
            flt = f2 if flt is None else (flt & f2)
    read_cols = columns
    if read_cols is not None and attr_col not in read_cols:
        read_cols = list(read_cols) + [attr_col]
    ds = ray.data.read_parquet(files, columns=read_cols, filter=flt)
    if columns is not None and read_cols != columns:
        ds = ds.map_batches(
            lambda b, _c=list(columns): b.select(_c), batch_format="pyarrow"
        )
    return ds
