"""Distributed temporal joins: as-of join and keyed interval (range) join.

For every left row ``(key, ts)`` find the right row with the same key
and the greatest ``ts`` that is ≤ the left ``ts`` (inclusive backward
match — the semantics of DuckDB/kdb ``ASOF JOIN``, which the oracle
mirrors natively). The classic enrichment step for event streams —
"join each event to the state that was current when it happened" — and
one of the custom operators the Ray Data surface lacks; the reference's
closest analog is the Kafka feature-state lookup at read time
(geomesa-kafka KafkaDataStore.scala:598-614 joins live features to
their latest state), which this generalizes to historical batch data.

Scale shape (per CLAUDE.md constraints):
- ONE bounded-fan-out shuffle: both sides route by ``key % n_shards``
  (union with a side tag, then a per-shard vectorized kernel) — never a
  per-key ``map_groups``;
- the in-shard kernel is two lexsorts + rank-composite ``searchsorted``
  (ranks keep the composite within int64 for any key/timestamp range);
- a key's rows must fit one shard's heap — the standard as-of
  partitioning contract (same as sessionize's).

Determinism: right-side ties on ``(key, ts)`` are resolved to the MAX
value row before matching, so the output is partitioning- and
tie-order-invariant (hash-safe); the oracle mirrors the tie rule with a
``GROUP BY key, ts → MAX(value)`` pre-aggregate. Unmatched left rows
emit ``-1`` sentinels (keeps the output columns non-null int64 — a
nullable int64 would reach pandas as float64 and break dtype parity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.stages.shards import default_shards


def _ts_to_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Unit-aware int64 epoch-us (never a truncating timestamp cast)."""
    t = col
    unit = t.type.unit if pa.types.is_timestamp(t.type) else "us"
    ints = t.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
    scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]
    return ints // 1_000 if scale is None else ints * scale


def _asof_shard(group: pa.Table, tol_us: int | None) -> pa.Table:
    """In-shard kernel: dedup right ties, then one rank-composite
    searchsorted over the lexicographically sorted right side."""
    schema = pa.schema([
        pa.field("left_id", pa.int64()), pa.field("key", pa.int64()),
        pa.field("ts_us", pa.int64()), pa.field("match_ts_us", pa.int64()),
        pa.field("match_val", pa.int64()),
    ])
    if len(group) == 0:
        return schema.empty_table()
    side = group["__side__"].to_numpy(zero_copy_only=False)
    k = group["__key__"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = group["__us__"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = group["__val__"].to_numpy(zero_copy_only=False).astype(np.int64)
    L = side == 1
    lk, lt, lid = k[L], t[L], v[L]
    if not len(lk):
        return schema.empty_table()
    rk, rt, rv = k[~L], t[~L], v[~L]
    mts = np.full(len(lk), -1, dtype=np.int64)
    mv = np.full(len(lk), -1, dtype=np.int64)
    if len(rk):
        # right ties on (key, ts) → keep the max-value row (deterministic)
        order = np.lexsort((rv, rt, rk))
        rk, rt, rv = rk[order], rt[order], rv[order]
        last = np.concatenate(
            [(rk[1:] != rk[:-1]) | (rt[1:] != rt[:-1]), [True]]
        )
        rk, rt, rv = rk[last], rt[last], rv[last]
        # dense ranks keep key*m + ts_rank inside int64 for any range
        tu = np.unique(np.concatenate([rt, lt]))
        ku = np.unique(np.concatenate([rk, lk]))
        m = np.int64(len(tu) + 1)
        rcomp = np.searchsorted(ku, rk).astype(np.int64) * m \
            + np.searchsorted(tu, rt)
        lki = np.searchsorted(ku, lk).astype(np.int64)
        lcomp = lki * m + np.searchsorted(tu, lt)
        pos = np.searchsorted(rcomp, lcomp, side="right") - 1
        ok = pos >= 0
        safe = np.maximum(pos, 0)
        ok &= rcomp[safe] // m == lki  # match must be the SAME key
        if tol_us is not None:
            ok &= (lt - rt[safe]) <= tol_us
        mts[ok] = rt[safe][ok]
        mv[ok] = rv[safe][ok]
    return pa.table({
        "left_id": pa.array(lid, pa.int64()),
        "key": pa.array(lk, pa.int64()),
        "ts_us": pa.array(lt, pa.int64()),
        "match_ts_us": pa.array(mts, pa.int64()),
        "match_val": pa.array(mv, pa.int64()),
    })


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id_col: str = "event_id",
    right_val_col: str = "event_id",
    tolerance_s: int | None = None,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Backward-inclusive as-of join: each left row picks the right row
    with equal ``key_col`` and the greatest ``ts_col`` ≤ its own
    (optionally within ``tolerance_s`` seconds). Emits one row per left
    row: ``left_id, key, ts_us, match_ts_us, match_val`` — int64
    throughout, ``-1`` for unmatched."""
    if n_shards is None:
        n_shards = default_shards()
    tol_us = None if tolerance_s is None else int(tolerance_s) * 1_000_000

    def tag(side: int, id_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[key_col].cast(pa.int64())
            kn = key.to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "__side__": pa.array(
                    np.full(len(batch), side, dtype=np.int64), pa.int64()
                ),
                "__key__": key,
                "__us__": pa.array(_ts_to_us(batch[ts_col]), pa.int64()),
                "__val__": batch[id_col].cast(pa.int64()),
                "__shard__": pa.array(kn % n_shards, pa.int64()),
            })
        return fn

    tagged = left.map_batches(
        tag(1, left_id_col), batch_format="pyarrow"
    ).union(right.map_batches(tag(0, right_val_col), batch_format="pyarrow"))
    return tagged.groupby("__shard__").map_groups(
        lambda g: _asof_shard(g.drop_columns(["__shard__"]), tol_us),
        batch_format="pyarrow",
    )


def _interval_shard(group: pa.Table) -> pa.Table:
    """In-shard kernel for the keyed interval join: one sort of the event
    side by (key, ts) rank composite, then per-interval [start, end)
    positions via two searchsorted calls and a fully vectorized pair
    expansion (the same repeat/arange trick as the raster cell burn)."""
    schema = pa.schema([
        pa.field("interval_id", pa.int64()), pa.field("event_id", pa.int64()),
        pa.field("lag_us", pa.int64()),
    ])
    if len(group) == 0:
        return schema.empty_table()
    side = group["__side__"].to_numpy(zero_copy_only=False)
    k = group["__key__"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = group["__us__"].to_numpy(zero_copy_only=False).astype(np.int64)
    t2 = group["__us2__"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = group["__val__"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = side == 1
    ek, et, eid = k[E], t[E], v[E]
    ik, lo, hi, iid = k[~E], t[~E], t2[~E], v[~E]
    if not len(ek) or not len(ik):
        return schema.empty_table()
    tu = np.unique(np.concatenate([et, lo, hi]))
    ku = np.unique(np.concatenate([ek, ik]))
    m = np.int64(len(tu) + 1)
    ecomp = np.searchsorted(ku, ek).astype(np.int64) * m \
        + np.searchsorted(tu, et)
    order = np.argsort(ecomp, kind="stable")
    ecomp, et, eid = ecomp[order], et[order], eid[order]
    iki = np.searchsorted(ku, ik).astype(np.int64)
    start = np.searchsorted(ecomp, iki * m + np.searchsorted(tu, lo), "left")
    end = np.searchsorted(ecomp, iki * m + np.searchsorted(tu, hi), "right")
    counts = np.maximum(end - start, 0)
    total = int(counts.sum())
    if total == 0:
        return schema.empty_table()
    pid = np.repeat(np.arange(len(ik)), counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    idx = np.arange(total) - np.repeat(cum, counts) + start[pid]
    return pa.table({
        "interval_id": pa.array(iid[pid], pa.int64()),
        "event_id": pa.array(eid[idx], pa.int64()),
        "lag_us": pa.array(et[idx] - lo[pid], pa.int64()),
    })


def interval_join(
    events: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    interval_id_col: str = "interval_id",
    lo_col: str = "lo_us",
    hi_col: str = "hi_us",
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Keyed interval (range) join: emit one pair per (interval, event)
    with equal ``key_col`` and ``lo_us ≤ ts ≤ hi_us`` (both bounds
    inclusive — mirrored by SQL ``BETWEEN``). Output rows are
    ``(interval_id, event_id, lag_us)`` with ``lag_us = ts − lo`` —
    int64 throughout; the pair SET is partitioning-invariant.

    Scale shape: the same single key-sharded shuffle as :func:`asof_join`
    (a key's rows must fit one shard); within a shard the pair expansion
    is fully vectorized, so cost is O(rows·log rows + output pairs).
    ``lo_us``/``hi_us`` are int64 epoch-microseconds (derive them from a
    timestamp with the caller's arithmetic so the oracle can mirror it
    exactly)."""
    if n_shards is None:
        n_shards = default_shards()

    def tag_events(batch: pa.Table) -> pa.Table:
        key = batch[key_col].cast(pa.int64())
        kn = key.to_numpy(zero_copy_only=False).astype(np.int64)
        us = _ts_to_us(batch[ts_col])
        return pa.table({
            "__side__": pa.array(np.ones(len(batch), np.int64), pa.int64()),
            "__key__": key,
            "__us__": pa.array(us, pa.int64()),
            "__us2__": pa.array(us, pa.int64()),
            "__val__": batch[event_id_col].cast(pa.int64()),
            "__shard__": pa.array(kn % n_shards, pa.int64()),
        })

    def tag_intervals(batch: pa.Table) -> pa.Table:
        key = batch[key_col].cast(pa.int64())
        kn = key.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__side__": pa.array(np.zeros(len(batch), np.int64), pa.int64()),
            "__key__": key,
            "__us__": batch[lo_col].cast(pa.int64()),
            "__us2__": batch[hi_col].cast(pa.int64()),
            "__val__": batch[interval_id_col].cast(pa.int64()),
            "__shard__": pa.array(kn % n_shards, pa.int64()),
        })

    tagged = events.map_batches(
        tag_events, batch_format="pyarrow"
    ).union(intervals.map_batches(tag_intervals, batch_format="pyarrow"))
    return tagged.groupby("__shard__").map_groups(
        lambda g: _interval_shard(g.drop_columns(["__shard__"])),
        batch_format="pyarrow",
    )
