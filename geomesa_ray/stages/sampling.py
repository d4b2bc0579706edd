"""Deterministic sampling (FeatureSampler/SamplingIterator analog:
index/utils/FeatureSampler.scala:21-35 — keep every nth record, optionally
per key; deterministic, NOT random)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def sample_every_nth(ds: ray.data.Dataset, n: int,
                     order_col: str) -> ray.data.Dataset:
    """Keep every nth record PER BLOCK of the ``order_col``-sorted
    dataset (the reference's per-thread sampler semantics: each worker
    thread samples its own stream independently, so the kept COUNT
    depends on partition boundaries — only the per-partition stride is
    contractual). For an exact global stride use :func:`sample_per_key`
    with a constant key."""
    ds = ds.sort(order_col)

    def _filter(batch: pa.Table) -> pa.Table:
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        keep = (np.argsort(np.argsort(vals, kind="stable"), kind="stable") % n) == 0
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow")


def sample_per_key(ds: ray.data.Dataset, key_col: str, n: int,
                   order_col: str, n_shards: int = 64) -> ray.data.Dataset:
    """Keep every nth record per key, ordered by ``order_col`` within the
    key group (deterministic; rows keep their original columns).

    Keys route by ``hash(key) % n_shards`` and each shard samples ALL of
    its keys in one vectorized pass (factorize + lexsort + segmented
    position modulo) — O(n_shards) group calls, never one per distinct
    key."""
    from geomesa_ray.stages.encode import hash_strings

    def add_shard(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
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

    def _sample_shard(group: pa.Table) -> pa.Table:
        m = len(group)
        if m == 0:
            return group.drop_columns(["__shard__"])
        keys = group[key_col].to_numpy(zero_copy_only=False)
        vals = group[order_col].to_numpy(zero_copy_only=False)
        _, codes = np.unique(keys, return_inverse=True)
        order = np.lexsort((vals, codes))
        codes_s = codes[order]
        starts = np.nonzero(np.concatenate([[True], codes_s[1:] != codes_s[:-1]]))[0]
        pos = np.arange(m) - np.repeat(starts, np.diff(np.concatenate([starts, [m]])))
        keep_sorted = order[pos % n == 0]
        return group.take(
            pa.array(np.sort(keep_sorted), pa.int64())
        ).drop_columns(["__shard__"])

    return ds.map_batches(add_shard, batch_format="pyarrow").groupby(
        "__shard__"
    ).map_groups(_sample_shard, batch_format="pyarrow")
