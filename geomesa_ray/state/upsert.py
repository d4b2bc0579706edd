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


def latest_view(
    updates: ray.data.Dataset,
    id_col: str = "fid",
    time_col: str = "event_ts",
    seq_col: str | None = None,
) -> ray.data.Dataset:
    """Reduce an update stream to the latest record per id (ordered=true
    semantics: an older event time never replaces a newer one)."""
    return updates.groupby(id_col).map_groups(
        _latest_per_id,
        fn_kwargs={"time_col": time_col, "seq_col": seq_col},
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
    caller for determinism."""
    horizon = now_ms - ttl_ms

    def f(batch: pa.Table) -> pa.Table:
        ts = batch[time_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ts >= horizon))

    return view.map_batches(f, batch_format="pyarrow")
