"""Query guards / interceptors (planning/QueryInterceptor.scala:1-131 and
planning/guard/*.scala analogs): pluggable pre-execution validation of a
:class:`~geomesa_ray.pipelines.scan.Query`.

Built-ins mirror the reference's guards: block full-table scans, require a
temporal bound, graduated size limits (the larger the spatial extent, the
tighter the temporal bound must be).
"""

from __future__ import annotations

from dataclasses import dataclass

from geomesa_ray.pipelines.scan import Query


class QueryRejected(Exception):
    pass


class Guard:
    def check(self, query: Query) -> None:  # raises QueryRejected
        raise NotImplementedError


class FullTableScanGuard(Guard):
    """Reject queries with neither a spatial nor a temporal predicate
    (guard/FullTableScanQueryGuard analog)."""

    def check(self, query: Query) -> None:
        if query.effective_bbox() is None and query.interval is None:
            raise QueryRejected("full-table scan blocked: no spatial or temporal bound")


class TemporalBoundGuard(Guard):
    """Require a bounded time interval ≤ ``max_span_ms``
    (guard/TemporalQueryGuard analog)."""

    def __init__(self, max_span_ms: int):
        self.max_span_ms = max_span_ms

    def check(self, query: Query) -> None:
        if query.interval is None:
            raise QueryRejected("temporal bound required")
        lo, hi = query.interval
        if hi - lo > self.max_span_ms:
            raise QueryRejected(
                f"temporal span {hi - lo} ms exceeds limit {self.max_span_ms} ms"
            )


@dataclass
class SizeTier:
    max_area_deg2: float  # spatial extent this tier applies up to
    max_span_ms: int  # allowed temporal span at that extent


class GraduatedSizeGuard(Guard):
    """Graduated limits (guard/GraduatedQueryGuard analog): bigger boxes
    must come with tighter time bounds. Tiers sorted by area; the first
    tier whose area bound covers the query applies."""

    def __init__(self, tiers: list[SizeTier]):
        self.tiers = sorted(tiers, key=lambda t: t.max_area_deg2)

    def check(self, query: Query) -> None:
        bbox = query.effective_bbox()
        if bbox is None:
            area = 360.0 * 180.0
        else:
            area = max(bbox[2] - bbox[0], 0.0) * max(bbox[3] - bbox[1], 0.0)
        for tier in self.tiers:
            if area <= tier.max_area_deg2:
                if query.interval is None:
                    raise QueryRejected("graduated guard: temporal bound required")
                lo, hi = query.interval
                if hi - lo > tier.max_span_ms:
                    raise QueryRejected(
                        f"graduated guard: area {area:.1f} deg² allows ≤ "
                        f"{tier.max_span_ms} ms span, got {hi - lo}"
                    )
                return
        raise QueryRejected(f"query area {area:.1f} deg² exceeds all guard tiers")


def check_guards(query: Query, guards: list[Guard]) -> None:
    for g in guards:
        g.check(query)


class EnrichmentCache:
    """Per-worker broadcast lookup table (convert/EnrichmentCache.scala:20-55
    analog): a dict shipped once via ``ray.put``, resolved once per worker
    process, used inside ``map_batches`` for key → attributes joins."""

    def __init__(self, mapping: dict):
        import ray

        self._ref = ray.put(mapping)

    def lookup_stage(self, key_col: str, out_cols: dict[str, "pa.DataType"]):
        """Returns a map_batches fn adding ``out_cols`` from the cache."""
        import pyarrow as pa

        from geomesa_ray.stages.join import _resolve_broadcast

        ref = self._ref

        def f(batch: pa.Table) -> pa.Table:
            table = _resolve_broadcast(ref)
            keys = batch[key_col].to_pylist()
            for col, typ in out_cols.items():
                vals = [
                    (table.get(k) or {}).get(col) for k in keys
                ]
                batch = batch.append_column(col, pa.array(vals, typ))
            return batch

        return f
