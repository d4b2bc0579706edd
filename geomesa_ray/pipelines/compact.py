"""Compaction: merge a group's small z-ordered files into target-size files.

Reference analog: per-partition file merge with target size, threaded
(geomesa-fs/.../AbstractFileSystemStorage.scala:152-190). Here a group is
re-read, re-sorted by ``(z3_bin, z3)`` (the layout's clustering key), and
rewritten as ~``target_rows_per_file``-row files; the manifest entry is
rewritten atomically so scans before/after see a consistent group.
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from geomesa_ray.state.manifest import (
    GroupEntry,
    collect_file_stats,
    load_manifest,
    write_entry,
)


def compact_group(out_dir: str, group: int, target_rows_per_file: int = 1_000_000) -> GroupEntry:
    """Compact one group's files; returns the updated manifest entry."""
    manifest = load_manifest(out_dir)
    if group not in manifest:
        raise KeyError(f"group {group} not in manifest")
    entry = manifest[group]
    group_dir = os.path.join(out_dir, f"group={group}")
    # The manifest entry is the committed file list. Any parquet in the
    # dir NOT in it is an orphan of an uncommitted prior attempt (crash
    # after publish, before the sweep + manifest write) — remove it first,
    # or a rerun would concat both generations and double-count rows.
    committed = {os.path.basename(fs.path) for fs in entry.files}
    all_parquet = sorted(glob.glob(os.path.join(group_dir, "*.parquet")))
    old_files = []
    for f in all_parquet:
        if os.path.basename(f) in committed:
            old_files.append(f)
        else:
            os.remove(f)
    for tmp in glob.glob(os.path.join(group_dir, "*.parquet.tmp")):
        os.remove(tmp)
    if len(old_files) <= 1:
        return entry
    t0 = time.perf_counter()
    table = pa.concat_tables(pq.read_table(f) for f in old_files)
    # restore the clustering order (files concatenate out of order)
    import numpy as np

    order = np.lexsort(
        (
            table["z3"].to_numpy(zero_copy_only=False),
            table["z3_bin"].to_numpy(zero_copy_only=False),
        )
    )
    table = table.take(pa.array(order, pa.int64()))
    # Generation-unique output names: a group compacted twice must never
    # reuse a prior pass's file names, or os.replace would clobber live
    # files before the old-file sweep deletes the fresh ones.
    gen = 0
    for f in old_files:
        base = os.path.basename(f)
        if base.startswith("compact-g"):
            try:
                gen = max(gen, int(base.split("-")[1][1:]) + 1)
            except (IndexError, ValueError):
                gen = max(gen, 1)
    new_files = []
    idx = 0
    for lo in range(0, len(table), target_rows_per_file):
        chunk = table.slice(lo, target_rows_per_file)
        path = os.path.join(group_dir, f"compact-g{gen:03d}-{idx:05d}.parquet.tmp")
        pq.write_table(chunk, path)
        new_files.append(path)
        idx += 1
    finals = []
    for tmp in new_files:
        final = tmp[: -len(".tmp")]
        os.replace(tmp, final)
        finals.append(final)
    final_set = set(finals)
    for f in old_files:
        if f not in final_set:
            os.remove(f)
    updated = GroupEntry(
        group=group,
        input_files=entry.input_files,
        rows_in=entry.rows_in,
        rows_out=len(table),
        wall_time_s=entry.wall_time_s + (time.perf_counter() - t0),
        files=collect_file_stats(finals),
    )
    write_entry(out_dir, updated)
    return updated


def compact(out_dir: str, target_rows_per_file: int = 1_000_000,
            max_files_per_group: int = 1) -> list[int]:
    """Compact every group with more than ``max_files_per_group`` files."""
    done = []
    for group, entry in sorted(load_manifest(out_dir).items()):
        if len(entry.files) > max_files_per_group:
            compact_group(out_dir, group, target_rows_per_file)
            done.append(group)
    return done
