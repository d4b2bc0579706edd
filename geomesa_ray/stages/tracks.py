"""Per-entity track aggregation (the batch face of the reference's
track/BIN machinery: BinConversion orders each track's observations by
time for the BIN export, Query-time tube-select consumes one track —
this operator AGGREGATES per-track statistics across every entity in one
distributed pass).

For each entity (``user_col``) the operator orders its observations by
``(ts, id)`` — the id tie-break makes equal-timestamp ordering total, so
the path sum is partitioning-invariant — and emits one row per entity:

- ``n_points``         observation count
- ``duration_us``      last ts − first ts (int64 epoch-us)
- ``path_l1``          Σ |Δx| + |Δy| over consecutive points, in the
                       caller's INTEGER coordinate unit (exact, hash-safe
                       — the reason this takes integer coordinate columns
                       rather than float lon/lat)
- ``min_x/max_x/min_y/max_y``  the track's coordinate bbox

Scale shape (per CLAUDE.md): ONE bounded-fan-out shuffle keyed by
``user % n_shards`` (an entity's whole track must fit one shard's heap —
the sessionize contract), then a single lexsort + boundary-mask +
``reduceat`` pass per shard. Never a per-entity ``map_groups``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.stages.asof import _ts_to_us
from geomesa_ray.stages.shards import default_shards

_SCHEMA = pa.schema([
    pa.field("user_id", pa.int64()), pa.field("n_points", pa.int64()),
    pa.field("duration_us", pa.int64()), pa.field("path_l1", pa.int64()),
    pa.field("min_x", pa.int64()), pa.field("max_x", pa.int64()),
    pa.field("min_y", pa.int64()), pa.field("max_y", pa.int64()),
])


def _track_shard(group: pa.Table) -> pa.Table:
    if len(group) == 0:
        return _SCHEMA.empty_table()
    u = group["__user__"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = group["__us__"].to_numpy(zero_copy_only=False).astype(np.int64)
    i = group["__id__"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = group["__x__"].to_numpy(zero_copy_only=False).astype(np.int64)
    y = group["__y__"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((i, t, u))
    u, t, x, y = u[order], t[order], x[order], y[order]
    new = np.empty(len(u), dtype=bool)
    new[0] = True
    new[1:] = u[1:] != u[:-1]
    starts = np.nonzero(new)[0]
    ends = np.concatenate([starts[1:], [len(u)]])
    d = np.zeros(len(u), dtype=np.int64)
    d[1:] = np.abs(np.diff(x)) + np.abs(np.diff(y))
    d[new] = 0  # no step across entity boundaries
    return pa.table({
        "user_id": pa.array(u[starts], pa.int64()),
        "n_points": pa.array((ends - starts).astype(np.int64), pa.int64()),
        "duration_us": pa.array(t[ends - 1] - t[starts], pa.int64()),
        "path_l1": pa.array(np.add.reduceat(d, starts), pa.int64()),
        "min_x": pa.array(np.minimum.reduceat(x, starts), pa.int64()),
        "max_x": pa.array(np.maximum.reduceat(x, starts), pa.int64()),
        "min_y": pa.array(np.minimum.reduceat(y, starts), pa.int64()),
        "max_y": pa.array(np.maximum.reduceat(y, starts), pa.int64()),
    })


def track_stats(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    x_col: str = "ix",
    y_col: str = "iy",
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Per-entity track statistics (see module docstring). ``x_col`` /
    ``y_col`` must be INTEGER coordinates (e.g. micro-degrees)."""
    if n_shards is None:
        n_shards = default_shards()

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].cast(pa.int64())
        un = uid.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__user__": uid,
            "__us__": pa.array(_ts_to_us(batch[ts_col]), pa.int64()),
            "__id__": batch[id_col].cast(pa.int64()),
            "__x__": batch[x_col].cast(pa.int64()),
            "__y__": batch[y_col].cast(pa.int64()),
            "__shard__": pa.array(un % n_shards, pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(
            lambda g: _track_shard(g.drop_columns(["__shard__"])),
            batch_format="pyarrow",
        )
    )
