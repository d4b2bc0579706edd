"""Live-view semantics: upsert-by-id with event-time ordering + TTL expiry.

Reference: the Kafka DataStore maintains an in-memory upsert-by-feature-id
view with expiry policies — never / ingest-time TTL / event-time TTL with
``ordered=true`` dropping late records whose event time is older than the
current one (geomesa-kafka/.../data/KafkaDataStore.scala:598-614, state
machinery index/FeatureStateFactory.scala:33-162).

Ray Data analog (batch micro-refresh, SURVEY §2.10): a keyed dataset is the
view; each refresh unions the new micro-batch and reduces to
latest-by-event-time per id; TTL is a filter against the event-time horizon.
All operators are streaming (groupby + map_groups); the view is only as big
as the live key set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _latest_per_id(group: pa.Table, time_col: str, seq_col: str | None) -> pa.Table:
    """One row per group: max event time; ties broken by ``seq_col`` (ingest
    sequence, 'last write wins') when present, else by position."""
    ts = group[time_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    if seq_col is not None and seq_col in group.schema.names:
        seq = group[seq_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    else:
        seq = np.arange(len(group), dtype=np.int64)
    best = int(np.lexsort((seq, ts))[-1])
    return group.slice(best, 1)


def _latest_per_shard(group: pa.Table, id_col: str, time_col: str,
                      seq_col: str | None) -> pa.Table:
    """Latest row per id for ALL ids of one shard, vectorized: factorize
    ids, lexsort by (id, ts, seq), take each id segment's last row."""
    n = len(group)
    if n == 0:
        return group.drop_columns(["__shard__"])
    ids = group[id_col].to_numpy(zero_copy_only=False)
    ts = group[time_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    if seq_col is not None and seq_col in group.schema.names:
        seq = group[seq_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    else:
        seq = np.arange(n, dtype=np.int64)
    _, codes = np.unique(ids, return_inverse=True)
    order = np.lexsort((seq, ts, codes))
    codes_s = codes[order]
    last = np.nonzero(np.concatenate([codes_s[1:] != codes_s[:-1], [True]]))[0]
    return group.take(pa.array(order[last], pa.int64())).drop_columns(["__shard__"])


def latest_view(
    updates: ray.data.Dataset,
    id_col: str = "fid",
    time_col: str = "event_ts",
    seq_col: str | None = None,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Reduce an update stream to the latest record per id (ordered=true
    semantics: an older event time never replaces a newer one).

    Shuffle shape: ids route by ``hash(id) % n_shards`` and each shard
    reduces ALL of its ids in one vectorized pass — O(n_shards) group
    calls, never one per distinct id."""
    from geomesa_ray.stages.encode import hash_strings
    from geomesa_ray.stages.shards import default_shards

    if n_shards is None:
        n_shards = default_shards()

    def add_shard(batch: pa.Table) -> pa.Table:
        col = batch[id_col]
        if pa.types.is_integer(col.type):
            with np.errstate(over="ignore"):
                h = (
                    col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                ) >> np.uint64(32)
        else:
            h = hash_strings(col)
        return batch.append_column(
            "__shard__",
            pa.array((h % np.uint64(n_shards)).astype(np.int32), pa.int32()),
        )

    return updates.map_batches(add_shard, batch_format="pyarrow").groupby(
        "__shard__"
    ).map_groups(
        _latest_per_shard,
        fn_kwargs={"id_col": id_col, "time_col": time_col, "seq_col": seq_col},
        batch_format="pyarrow",
    )


def merge_updates(
    view: ray.data.Dataset,
    updates: ray.data.Dataset,
    id_col: str = "fid",
    time_col: str = "event_ts",
    seq_col: str | None = None,
) -> ray.data.Dataset:
    """Micro-batch refresh: new view = latest over (current view ∪ updates)."""
    return latest_view(view.union(updates), id_col, time_col, seq_col)


def expire(
    view: ray.data.Dataset,
    now_ms: int,
    ttl_ms: int,
    time_col: str = "event_ts",
) -> ray.data.Dataset:
    """Event-time TTL: drop records older than the horizon
    (KafkaDataStore event-time expiry analog). ``now_ms`` is supplied by the
    caller for determinism. Timestamp-typed columns are compared in their
    own unit (int64 + scale, never a truncating cast); plain int columns
    are treated as epoch ms."""
    horizon_ms = now_ms - ttl_ms

    def f(batch: pa.Table) -> pa.Table:
        col = batch[time_col]
        ts = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        unit = col.type.unit if pa.types.is_timestamp(col.type) else "ms"
        if unit == "s":
            ts_ms = ts * 1_000
        elif unit == "ms":
            ts_ms = ts
        elif unit == "us":
            ts_ms = ts // 1_000
        else:  # ns
            ts_ms = ts // 1_000_000
        return batch.filter(pa.array(ts_ms >= horizon_ms))

    return view.map_batches(f, batch_format="pyarrow")
