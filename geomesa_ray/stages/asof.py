"""Distributed as-of join (event → latest state at event time).

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
