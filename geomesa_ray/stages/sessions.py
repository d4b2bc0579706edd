"""Event-time sessionization: split each user's event stream into
sessions wherever the gap between consecutive events exceeds a timeout.

The classic first step of web-log / clickstream processing (the reference
covers the storage-and-query side of event streams — KafkaDataStore's
event-time semantics, geomesa-kafka/.../KafkaDataStore.scala — but has no
session operator; this is a training-data-pipeline addition like
stages/corpus.py).

Scale shape (per CLAUDE.md constraints):
- ONE bounded-fan-out shuffle keyed by ``user_id % n_shards`` — never a
  per-user ``map_groups`` (Ray fires one Python call per distinct key);
- the in-shard kernel is fully vectorized: one lexsort per shard, then
  boundary masks + ``np.add.reduceat`` over session segments;
- timestamps ride as int64 epoch-microseconds end to end (us-precision
  testdata; no truncating casts).

Determinism: session membership depends only on the (user, ts) multiset
— events with equal timestamps always share a session (gap 0 ≤ any
timeout), so per-session aggregates are partitioning- and
tie-order-invariant, making the operator SQL-hash-verifiable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.stages.shards import default_shards


def _sessionize_shard(group: pa.Table, user_col: str, gap_us: int) -> pa.Table:
    """In-shard kernel: one sorted pass over every user in the shard."""
    users = group[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
    us = group["__us__"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(users) == 0:
        return pa.table(
            {
                user_col: pa.array([], pa.int64()),
                "session_no": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
            }
        )
    order = np.lexsort((us, users))
    users, us = users[order], us[order]
    new_user = np.empty(len(users), dtype=bool)
    new_user[0] = True
    new_user[1:] = users[1:] != users[:-1]
    brk = new_user.copy()
    brk[1:] |= (us[1:] - us[:-1]) > gap_us
    # global session segment ids, then 1-based per-user numbering
    seg = np.cumsum(brk) - 1
    user_start_seg = seg[new_user]  # first segment id of each user run
    session_no = seg - np.repeat(user_start_seg, np.diff(
        np.append(np.nonzero(new_user)[0], len(users))
    )) + 1
    starts = np.nonzero(brk)[0]
    n_events = np.diff(np.append(starts, len(users)))
    ends = starts + n_events - 1
    return pa.table(
        {
            user_col: pa.array(users[starts], pa.int64()),
            "session_no": pa.array(session_no[starts], pa.int64()),
            "n_events": pa.array(n_events.astype(np.int64), pa.int64()),
            "start_us": pa.array(us[starts], pa.int64()),
            "end_us": pa.array(us[ends], pa.int64()),
        }
    )


def sessionize(ds: ray.data.Dataset, user_col: str = "user_id",
               ts_col: str = "ts", gap_s: int = 30_000,
               n_shards: int | None = None) -> ray.data.Dataset:
    """Per-user event-time sessions: a new session starts when the gap to
    the user's previous event exceeds ``gap_s``. Emits one row per session
    with ``(user_id, session_no, n_events, start_us, end_us)`` —
    ``session_no`` is 1-based in time order, timestamps are int64 epoch
    microseconds.

    A user's whole stream must land in one shard (the shuffle key is the
    user), so the operator assumes no single user exceeds a worker's heap
    — the standard sessionization partitioning contract.
    """
    if n_shards is None:
        n_shards = default_shards()
    gap_us = int(gap_s) * 1_000_000

    def key(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].cast(pa.int64())
        # unit-aware int64 epoch-us (never a truncating timestamp cast)
        t = batch[ts_col]
        unit = t.type.unit if pa.types.is_timestamp(t.type) else "us"
        ints = t.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]
        us = ints // 1_000 if scale is None else ints * scale
        shard = uid.to_numpy(zero_copy_only=False).astype(np.int64) % n_shards
        return pa.table(
            {
                user_col: uid,
                "__us__": pa.array(us, pa.int64()),
                "__shard__": pa.array(shard, pa.int64()),
            }
        )

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(
            lambda g: _sessionize_shard(
                g.drop_columns(["__shard__"]), user_col, gap_us
            ),
            batch_format="pyarrow",
        )
    )


def tumbling_counts(ds: ray.data.Dataset, ts_col: str = "ts",
                    key_col: str | None = "event_type",
                    window_s: int = 86_400,
                    fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """Tumbling-window aggregate: events bucketed into fixed windows of
    ``window_s`` (``window_start_us = floor(us / w) * w``), counted per
    ``(window, key)``. The batch-analytics face of the streaming window
    operator (sessionize is the gap-based face).

    Scale shape: per-batch partial counts (combiner) tree-merged — the
    output is bounded by #windows × #keys, so no shuffle aggregate is
    needed until that product is huge (then the fallback shuffle runs).
    """
    import pyarrow.compute as pc

    from geomesa_ray.stages.corpus import _group_sum, _tree_merge

    w_us = int(window_s) * 1_000_000
    key_cols = ["window_start_us"] + ([key_col] if key_col else [])
    schema = pa.schema(
        [pa.field("window_start_us", pa.int64())]
        + ([pa.field(key_col, pa.string())] if key_col else [])
        + [pa.field("n_events", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch[ts_col]
        unit = t.type.unit if pa.types.is_timestamp(t.type) else "us"
        ints = t.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]
        us = ints // 1_000 if scale is None else ints * scale
        win = (us // w_us) * w_us
        cols = {"window_start_us": pa.array(win, pa.int64())}
        if key_col:
            cols[key_col] = batch[key_col].cast(pa.string())
        cols["n_events"] = pa.array(np.ones(len(batch), np.int64), pa.int64())
        return _group_sum(pa.table(cols), key_cols, ["n_events"])

    def merge(batch: pa.Table) -> pa.Table:
        return _group_sum(batch.cast(schema), key_cols, ["n_events"])

    merged, converged = _tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), merge,
        fanin_rows=fanin_rows,
    )
    if not converged:  # huge window×key product: exact shuffle aggregate
        from ray.data.aggregate import Sum

        merged = merged.groupby(key_cols).aggregate(
            Sum("n_events", alias_name="n_events")
        )
    return merged


def sliding_counts(ds: ray.data.Dataset, ts_col: str = "ts",
                   key_col: str | None = "event_type",
                   window_s: int = 86_400, hop_s: int = 21_600,
                   fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """Sliding (hopping) window aggregate: windows of ``window_s`` start
    at every multiple of ``hop_s`` (``window_s`` must divide evenly), so
    each event counts toward ``k = window_s/hop_s`` consecutive windows —
    the overlapping-window face of :func:`tumbling_counts`.

    Scale shape: the k-fold expansion happens INSIDE the per-batch
    combiner (k is small and fixed), partials tree-merge shuffle-free,
    and output stays bounded by #hops × #keys; the SQL mirror is the
    same arithmetic cross-joined with ``generate_series(0, k-1)``.
    """
    from geomesa_ray.stages.corpus import _group_sum, _tree_merge

    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s
    h_us = int(hop_s) * 1_000_000
    key_cols = ["window_start_us"] + ([key_col] if key_col else [])
    schema = pa.schema(
        [pa.field("window_start_us", pa.int64())]
        + ([pa.field(key_col, pa.string())] if key_col else [])
        + [pa.field("n_events", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        t = batch[ts_col]
        unit = t.type.unit if pa.types.is_timestamp(t.type) else "us"
        ints = t.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]
        us = ints // 1_000 if scale is None else ints * scale
        base = (us // h_us) * h_us
        win = (base[:, None] - np.arange(k, dtype=np.int64)[None, :] * h_us
               ).ravel()
        cols = {"window_start_us": pa.array(win, pa.int64())}
        if key_col:
            cols[key_col] = batch[key_col].cast(pa.string()).take(
                pa.array(np.repeat(np.arange(len(batch)), k))
            )
        cols["n_events"] = pa.array(np.ones(len(batch) * k, np.int64),
                                    pa.int64())
        return _group_sum(pa.table(cols), key_cols, ["n_events"])

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        return _group_sum(batch.cast(schema), key_cols, ["n_events"])

    merged, converged = _tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge, fanin_rows=fanin_rows,
    )
    if not converged:
        from ray.data.aggregate import Sum

        merged = merged.groupby(key_cols).aggregate(
            Sum("n_events", alias_name="n_events")
        )
    return merged
