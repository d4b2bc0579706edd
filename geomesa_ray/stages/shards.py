"""Reduce-side fan-out sizing shared by the pair/join shuffle stages.

Every bucketed shuffle here routes rows by ``hash(key) % n_shards`` and
reduces each shard in one vectorized pass, so ``n_shards`` bounds the
reduce-side parallelism. A fixed 64 caps a big cluster: default to
~4× the cluster's CPU count (the classic reduce-slot oversubscription
that absorbs skewed shard sizes) with a floor that keeps single-node
runs at their measured sweet spot and a cap that bounds tiny-group
overhead (each shard still costs one Python group call).
"""

from __future__ import annotations

import os


def default_shards(mult: int = 4, floor: int = 64, cap: int = 4096) -> int:
    """~``mult``× the cluster CPU count, clamped to [floor, cap]."""
    cpus: float | None = None
    try:
        import ray

        if ray.is_initialized():
            cpus = ray.cluster_resources().get("CPU")
    except Exception:
        cpus = None
    if not cpus:
        cpus = os.cpu_count() or 16
    return int(max(floor, min(cap, mult * int(cpus))))
