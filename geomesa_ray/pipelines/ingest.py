"""Ingest: raw pages parquet -> indexed, z-ordered, resumable parquet layout.

Pipeline (the reference ingest lifecycle, IngestCommand.scala:58-104 →
AbstractConverter.process → toIndexKey, re-expressed Ray-Data-first):

    read_parquet(shard group)                # column-pruned at the read
      → map_batches(ExtractGeo)              # html → lon/lat, text passthrough
      → map_batches(EncodeKeys)              # z2 / (z3_bin, z3) / cell / shard
      → sort(z3_bin, z3)                     # z-order files (range shuffle)
      → write_parquet(out/group=<k>/)        # spatially clustered files
      → manifest entry                       # lineage + per-file key stats

Input files are split into resume groups; each group is one Dataset
execution whose completion is recorded atomically in the manifest, so a
killed run reprocesses only unfinished groups. At cluster scale a group is
the unit of failure replay AND the unit of output compaction; the sort is
scoped to the group so no global all-to-all is ever required.

``html`` is dropped by the extract stage (project early — it dominates
bytes); ``text`` is carried through byte-identical per the row invariant.
"""

from __future__ import annotations

import os
import time

import ray.data

from geomesa_ray.curves.binnedtime import TimePeriod
from geomesa_ray.stages.encode import DEFAULT_CELL_RES, DEFAULT_SHARDS, EncodeKeys
from geomesa_ray.stages.extract import ExtractGeo
from geomesa_ray.state.manifest import GroupEntry, collect_file_stats, load_manifest, write_entry

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def ingest_pages(
    input_files: list[str] | str,
    out_dir: str,
    period: TimePeriod = TimePeriod.WEEK,
    cell_res: int = DEFAULT_CELL_RES,
    n_shards: int = DEFAULT_SHARDS,
    n_groups: int | None = None,
    batch_size: int = 20_000,  # reference local ingest flush (IngestCommand.scala:187)
    target_rows_per_file: int = 1_000_000,
    resume: bool = True,
    extract: bool = True,
    columns: list[str] | None = None,
    id_col: str = "url",
    ts_col: str = "warc_ts",
    sort_by: str = "z3",
) -> dict[int, GroupEntry]:
    """Run the resumable ingest; returns the complete manifest.

    ``extract=False`` indexes tables that already carry lon/lat (skips the
    html extraction stage — the converter-free ingest path); ``columns``
    overrides the read projection in that case.

    ``sort_by`` selects the layout's clustering key — ``"z3"`` (default:
    ``(z3_bin, z3)``, the spatio-temporal index) or ``"z2"`` (pure-spatial
    clustering, so per-file z2 stats stay tight and bbox-only queries
    prune hard). The reference keeps SEPARATE z2/z3 index tables for the
    same reason (geomesa-index-api z2/Z2Index vs z3/Z3Index); ingest each
    layout into its own ``out_dir`` and let the cost decider
    (pipelines/costs.py choose_layout) pick per query.
    """
    if sort_by not in ("z3", "z2"):
        raise ValueError(f"sort_by must be 'z3' or 'z2', got {sort_by!r}")
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

    manifest = load_manifest(out_dir) if resume else {}
    for k, files in groups.items():
        if not files:
            continue
        if k in manifest:
            continue  # already completed: skip (resume)
        t0 = time.perf_counter()
        group_dir = os.path.join(out_dir, f"group={k}")
        # the manifest entry is the COMMIT point: a group dir without one
        # is a prior attempt that died mid-write — its partial files would
        # otherwise sit next to the rerun's output and double-count rows
        if os.path.isdir(group_dir):
            import shutil

            shutil.rmtree(group_dir)
        read_cols = columns if columns is not None else (PAGE_COLUMNS if extract else None)
        ds = ray.data.read_parquet(files, columns=read_cols)
        rows_in = ds.count()
        if extract:
            ds = ds.map_batches(ExtractGeo(), batch_format="pyarrow", batch_size=batch_size)
        ds = ds.map_batches(
            EncodeKeys(period=period, cell_res=cell_res, n_shards=n_shards,
                       id_col=id_col, ts_col=ts_col),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        ds = ds.sort(["z3_bin", "z3"] if sort_by == "z3" else ["z2"])
        # split into several order-preserving files so the manifest's
        # per-file key ranges stay tight enough for query-time pruning
        n_files = max(2, -(-rows_in // target_rows_per_file))
        ds = ds.repartition(n_files)
        ds.write_parquet(group_dir)
        out_files = sorted(
            os.path.join(group_dir, f) for f in os.listdir(group_dir) if f.endswith(".parquet")
        )
        stats = collect_file_stats(out_files)
        entry = GroupEntry(
            group=k,
            input_files=files,
            rows_in=rows_in,
            rows_out=sum(s.rows for s in stats),
            wall_time_s=time.perf_counter() - t0,
            files=stats,
        )
        write_entry(out_dir, entry)
        manifest[k] = entry
    return manifest
