"""Composable distributed stats sketches (GeoMesa "stats" analog).

Reference model: a ``Stat`` observes features, supports ``+=`` merge, and
serializes to JSON (geomesa-utils/.../stats/Stat.scala:28-315); scans emit
per-partition partials that a client reducer merges
(iterators/StatsScan.scala:94-106, reducer :148-183).

Ray Data shape: one ``map_batches`` pass produces ONE pickled partial row
per block (vectorized observe, bounded state); the tiny partial dataset is
merged on the driver. ``group_by`` stats nest any sub-stat per group value
(stats/GroupBy.scala analog).

Sketches: count, min_max, enumeration, top_k, histogram (fixed bins,
Histogram.scala), frequency (count-min sketch, Frequency.scala),
descriptive (multivariate running moments, DescriptiveStats.scala),
z3_histogram (Z3Histogram.scala: counts per (time bin, z3 prefix)).
"""

from __future__ import annotations

import math
import pickle
from typing import Any

import numpy as np
import pyarrow as pa
import ray.data

# ---------------------------------------------------------------------------
# sketch objects: observe(numpy values) / merge / result
# ---------------------------------------------------------------------------


class Stat:
    def observe(self, values: np.ndarray) -> None:
        raise NotImplementedError

    def unobserve(self, values: np.ndarray) -> None:
        """Remove previously-observed values (Stat.scala:56 delete path).
        Exact for additive sketches (Count/Enumeration/Histogram/
        Frequency/Z3*); bounds/register sketches (MinMax, HLL, TopK)
        cannot shrink — they raise, mirroring the reference's imprecise
        deletion caveat."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support exact deletion"
        )

    def merge(self, other: "Stat") -> None:
        raise NotImplementedError

    def result(self) -> Any:
        raise NotImplementedError


class Count(Stat):
    """Stat.scala Count: number of observed (non-null counted too)."""

    def __init__(self):
        self.n = 0

    def observe(self, values):
        self.n += len(values)

    def unobserve(self, values):
        self.n = max(0, self.n - len(values))

    def merge(self, other):
        self.n += other.n

    def result(self):
        return {"count": self.n}


class MinMax(Stat):
    """Min/max + HLL distinct estimate — the reference MinMax carries a
    clearspring HyperLogLog and reports its estimate as ``cardinality``
    (MinMax.scala:33-49); ``count`` is the observed (non-null) row count."""

    def __init__(self):
        self.min: Any = None
        self.max: Any = None
        self.n = 0
        self.hll = HyperLogLog()

    def observe(self, values):
        values = values[~pa.compute.is_null(pa.array(values)).to_numpy(zero_copy_only=False)] if values.dtype == object else values
        if len(values) == 0:
            return
        lo, hi = values.min(), values.max()
        self.min = lo if self.min is None else min(self.min, lo)
        self.max = hi if self.max is None else max(self.max, hi)
        self.n += len(values)
        self.hll.observe(values)

    def merge(self, other):
        if other.min is not None:
            self.min = other.min if self.min is None else min(self.min, other.min)
            self.max = other.max if self.max is None else max(self.max, other.max)
        self.n += other.n
        self.hll.merge(other.hll)

    def result(self):
        return {"min": self.min, "max": self.max, "count": self.n,
                "cardinality": self.hll.cardinality()}


class Enumeration(Stat):
    """Exact value→count map (Enumeration stat); bounded by caller's domain."""

    def __init__(self, max_size: int = 100_000):
        self.counts: dict = {}
        self.max_size = max_size
        self.overflowed = False

    def observe(self, values):
        values = _drop_none(values)  # np.unique sorts, and None < str raises
        uniq, cnt = np.unique(values, return_counts=True)
        for v, c in zip(uniq.tolist(), cnt.tolist()):
            if v is None:
                continue
            if v in self.counts or len(self.counts) < self.max_size:
                self.counts[v] = self.counts.get(v, 0) + c
            else:
                self.overflowed = True

    def unobserve(self, values):
        values = _drop_none(values)
        uniq, cnt = np.unique(values, return_counts=True)
        for v, c in zip(uniq.tolist(), cnt.tolist()):
            if v in self.counts:
                left = self.counts[v] - c
                if left > 0:
                    self.counts[v] = left
                else:
                    del self.counts[v]

    def merge(self, other):
        for v, c in other.counts.items():
            if v in self.counts or len(self.counts) < self.max_size:
                self.counts[v] = self.counts.get(v, 0) + c
            else:
                self.overflowed = True
        self.overflowed |= other.overflowed

    def result(self):
        return dict(self.counts)


class TopK(Stat):
    """TopK.scala analog: heavy hitters via a bounded counter (space-saving
    style — exact when the per-block distinct count fits the bound)."""

    def __init__(self, k: int = 10, capacity: int = 10_000):
        self.k = k
        self.enum = Enumeration(max_size=capacity)

    def observe(self, values):
        self.enum.observe(values)

    def merge(self, other):
        self.enum.merge(other.enum)

    def result(self):
        items = sorted(self.enum.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return items[: self.k]


class Histogram(Stat):
    """Fixed-width binned counts over [lo, hi] (Histogram.scala / BinnedArray):
    values are clamped into the end bins like the reference's binned array."""

    def __init__(self, bins: int, lo: float, hi: float):
        self.bins = bins
        self.lo = float(lo)
        self.hi = float(hi)
        self.counts = np.zeros(bins, dtype=np.int64)

    def observe(self, values):
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        idx = np.floor((v - self.lo) * self.bins / (self.hi - self.lo)).astype(np.int64)
        idx = np.clip(idx, 0, self.bins - 1)
        self.counts += np.bincount(idx, minlength=self.bins)

    def unobserve(self, values):
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        idx = np.floor((v - self.lo) * self.bins / (self.hi - self.lo)).astype(np.int64)
        idx = np.clip(idx, 0, self.bins - 1)
        self.counts = np.maximum(
            self.counts - np.bincount(idx, minlength=self.bins), 0
        )

    def merge(self, other):
        self.counts += other.counts

    def result(self):
        return {"lo": self.lo, "hi": self.hi, "counts": self.counts.tolist()}


class Frequency(Stat):
    """Count-min sketch (Frequency.scala / CountMinSketch): conservative
    point-frequency estimates with mergeable counters."""

    def __init__(self, depth: int = 4, width: int = 2048, seed: int = 42):
        self.depth = depth
        self.width = width
        self.seed = seed
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _hashes(self, values) -> np.ndarray:
        from geomesa_ray.stages.encode import hash_strings

        strs = [str(v) for v in values]
        out = np.empty((self.depth, len(strs)), dtype=np.int64)
        for d in range(self.depth):
            h = hash_strings(strs, seed=self.seed + d)
            out[d] = (h % np.uint64(self.width)).astype(np.int64)
        return out

    def observe(self, values):
        vals = np.asarray(values)
        hs = self._hashes(vals.tolist())
        for d in range(self.depth):
            self.table[d] += np.bincount(hs[d], minlength=self.width)

    def unobserve(self, values):
        vals = np.asarray(values)
        hs = self._hashes(vals.tolist())
        for d in range(self.depth):
            self.table[d] = np.maximum(
                self.table[d] - np.bincount(hs[d], minlength=self.width), 0
            )

    def merge(self, other):
        self.table += other.table

    def estimate(self, value) -> int:
        hs = self._hashes([value])
        return int(min(self.table[d, hs[d, 0]] for d in range(self.depth)))

    def result(self):
        return self

    def __getstate__(self):
        return {"depth": self.depth, "width": self.width, "seed": self.seed, "table": self.table}

    def __setstate__(self, st):
        self.__dict__.update(st)


class Z3Frequency(Stat):
    """Z3Frequency.scala analog: a count-min sketch keyed by
    (time bin, z3 prefix) — point-frequency estimates for spatio-temporal
    keys. Observe takes the engine's 2-col (z3_bin, z3) stack, like
    Z3Histogram."""

    def __init__(self, prefix_bits: int = 12, depth: int = 4,
                 width: int = 2048, seed: int = 42):
        self.prefix_bits = prefix_bits
        self.shift = np.uint64(63 - prefix_bits)
        self.freq = Frequency(depth=depth, width=width, seed=seed)

    def _keys(self, bins, z) -> np.ndarray:
        z = np.asarray(z, dtype=np.uint64) >> self.shift
        return (np.asarray(bins, dtype=np.int64) << np.int64(24)) | z.astype(
            np.int64
        )

    def observe(self, values):
        self.freq.observe(self._keys(values[:, 0], values[:, 1]))

    def unobserve(self, values):
        self.freq.unobserve(self._keys(values[:, 0], values[:, 1]))

    def merge(self, other):
        self.freq.merge(other.freq)

    def estimate(self, z3_bin: int, z3: int) -> int:
        return self.freq.estimate(
            int(self._keys(np.array([z3_bin]), np.array([z3]))[0])
        )

    def result(self):
        return self


class DescriptiveStats(Stat):
    """Running count/mean/M2 (+min/max) merged via Chan's parallel update —
    DescriptiveStats.scala analog (univariate)."""

    def __init__(self):
        self.n = 0
        self.mean = 0.0
        self.m2 = 0.0
        self.min = math.inf
        self.max = -math.inf

    def observe(self, values):
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        other = DescriptiveStats()
        other.n = len(v)
        other.mean = float(v.mean())
        other.m2 = float(((v - v.mean()) ** 2).sum())
        other.min = float(v.min())
        other.max = float(v.max())
        self.merge(other)

    def merge(self, other):
        if other.n == 0:
            return
        if self.n == 0:
            self.n, self.mean, self.m2 = other.n, other.mean, other.m2
            self.min, self.max = other.min, other.max
            return
        n = self.n + other.n
        delta = other.mean - self.mean
        self.m2 = self.m2 + other.m2 + delta * delta * self.n * other.n / n
        self.mean = self.mean + delta * other.n / n
        self.n = n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)

    def result(self):
        var = self.m2 / (self.n - 1) if self.n > 1 else 0.0
        return {
            "count": self.n,
            "mean": self.mean,
            "stddev": math.sqrt(var),
            "min": self.min if self.n else None,
            "max": self.max if self.n else None,
        }


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (no float log — ints
    above 2^53 would round)."""
    w = w.astype(np.uint64).copy()
    n = np.zeros(w.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(s))
        n[big] += s
        w[big] >>= np.uint64(s)
    return n + (w > 0)


class HyperLogLog(Stat):
    """HLL distinct-count sketch — clearspring analog (reference
    utils/clearspring/HyperLogLog.scala:85-130, carried by MinMax.scala:33-48
    as its ``cardinality``): register ``j`` = top ``log2m`` hash bits,
    ``rho`` = leading-zero count of the remaining bits + 1 (the guard-bit
    convention of HyperLogLog.scala:92-97), registers merge by max.

    The hash is splitmix64 (ints / float bit patterns) or the engine's
    string hash — NOT murmur, so register values differ from clearspring
    bit-for-bit while the estimator behavior is identical. Register state
    is all-integer and (for int columns) mirrors into SQL exactly:
    ``register = z >> (64-log2m)``,
    ``rho = 57 - length(bin(z & mask))`` (DuckDB) — see the hll_users
    oracle."""

    def __init__(self, log2m: int = 8):
        if not 4 <= log2m <= 16:
            raise ValueError("log2m must be in [4, 16]")
        self.log2m = log2m
        # rho <= 61 fits uint8; every MinMax carries one of these, so the
        # register footprint matters under GroupBy(high-card key, MinMax)
        self.registers = np.zeros(1 << log2m, np.uint8)

    def _hash(self, values: np.ndarray) -> np.ndarray:
        from geomesa_ray.stages.corpus import _splitmix64
        from geomesa_ray.stages.encode import hash_strings

        if values.dtype == object or values.dtype.kind in "US":
            return hash_strings(pa.array([v for v in values if v is not None]))
        if values.dtype.kind == "f":
            return _splitmix64(values.astype(np.float64).view(np.uint64))
        return _splitmix64(values.astype(np.int64).astype(np.uint64))

    def observe(self, values):
        values = _drop_none(np.asarray(values))
        if len(values) == 0:
            return
        h = self._hash(values).astype(np.uint64)
        shift = np.uint64(64 - self.log2m)
        j = (h >> shift).astype(np.int64)
        w = h & ((np.uint64(1) << shift) - np.uint64(1))
        rho = np.where(w == 0, 64 - self.log2m + 1,
                       64 - self.log2m + 1 - _bit_length_u64(w)).astype(np.uint8)
        np.maximum.at(self.registers, j, rho)

    def merge(self, other):
        np.maximum(self.registers, other.registers, out=self.registers)

    def cardinality(self) -> float:
        """clearspring estimator: raw harmonic mean + linear counting
        under 2.5m (HyperLogLog.scala cardinality())."""
        m = float(len(self.registers))
        alpha_mm = 0.7213 / (1.0 + 1.079 / m) * m * m
        if m == 16:
            alpha_mm = 0.673 * m * m
        elif m == 32:
            alpha_mm = 0.697 * m * m
        elif m == 64:
            alpha_mm = 0.709 * m * m
        est = alpha_mm / np.power(2.0, -self.registers.astype(np.float64)).sum()
        if est <= 2.5 * m:
            v = int((self.registers == 0).sum())
            if v > 0:
                est = m * math.log(m / v)
        return float(est)

    def result(self):
        return {
            "log2m": self.log2m,
            "registers": self.registers.tolist(),
            "cardinality": self.cardinality(),
        }


class Z3Histogram(Stat):
    """Counts per (time bin, z3 prefix) — Z3Histogram.scala analog. Expects
    the engine's ``z3_bin``/``z3`` columns (observe takes a 2-col stack)."""

    def __init__(self, prefix_bits: int = 12):
        self.shift = np.uint64(63 - prefix_bits)
        self.counts: dict[tuple[int, int], int] = {}

    def observe(self, values):
        bins = values[:, 0].astype(np.int64)
        z = values[:, 1].astype(np.uint64) >> self.shift
        key = bins * (1 << 24) + z.astype(np.int64)
        uniq, cnt = np.unique(key, return_counts=True)
        for k, c in zip(uniq.tolist(), cnt.tolist()):
            kk = (k >> 24, k & ((1 << 24) - 1))
            self.counts[kk] = self.counts.get(kk, 0) + c

    def unobserve(self, values):
        bins = values[:, 0].astype(np.int64)
        z = values[:, 1].astype(np.uint64) >> self.shift
        key = bins * (1 << 24) + z.astype(np.int64)
        uniq, cnt = np.unique(key, return_counts=True)
        for k, c in zip(uniq.tolist(), cnt.tolist()):
            kk = (k >> 24, k & ((1 << 24) - 1))
            left = self.counts.get(kk, 0) - c
            if left > 0:
                self.counts[kk] = left
            elif kk in self.counts:
                del self.counts[kk]

    def merge(self, other):
        for k, c in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + c

    def result(self):
        return dict(self.counts)


# ---------------------------------------------------------------------------
# spec + distributed execution
# ---------------------------------------------------------------------------

_FACTORIES = {
    "count": Count,
    "min_max": MinMax,
    "enumeration": Enumeration,
    "top_k": TopK,
    "histogram": Histogram,
    "frequency": Frequency,
    "descriptive": DescriptiveStats,
    "z3_histogram": Z3Histogram,
    "hyperloglog": HyperLogLog,
    "z3_frequency": Z3Frequency,
}


def make_stat(kind: str, **kwargs) -> Stat:
    """Stat-spec-string analog (Stat.scala:28-80 parser → factory map)."""
    return _FACTORIES[kind](**kwargs)


class StatSpec:
    """(name, column(s), sketch factory args)."""

    def __init__(self, name: str, kind: str, column, group_by: str | None = None, **kwargs):
        self.name = name
        self.kind = kind
        self.column = column
        self.group_by = group_by
        self.kwargs = kwargs

    def build(self) -> Stat:
        return make_stat(self.kind, **self.kwargs)


def _drop_none(values) -> np.ndarray:
    """Strip None entries from an object array (nullable string columns)
    before sort-based kernels; numeric arrays pass through untouched."""
    values = np.asarray(values)
    if values.dtype == object:
        mask = np.fromiter((v is not None for v in values), bool, len(values))
        if not mask.all():
            return values[mask]
    return values


def _column_values(batch: pa.Table, column) -> np.ndarray:
    if column is None:  # Count() — row count only, no column read
        return np.empty(batch.num_rows, np.bool_)
    if isinstance(column, (list, tuple)):
        return np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in column], axis=1
        )
    col = batch[column]
    try:
        return col.to_numpy(zero_copy_only=False)
    except pa.ArrowInvalid:
        return np.asarray(col.to_pylist(), dtype=object)


class _StatsPartial:
    """map_batches stage: batch → one pickled partial row (all specs)."""

    def __init__(self, specs: list[StatSpec]):
        self.specs = specs

    def __call__(self, batch: pa.Table) -> pa.Table:
        partial: dict[str, Any] = {}
        for spec in self.specs:
            if spec.group_by is None:
                st = spec.build()
                st.observe(_column_values(batch, spec.column))
                partial[spec.name] = st
            else:
                groups: dict[Any, Stat] = {}
                keys = batch[spec.group_by].to_numpy(zero_copy_only=False)
                vals = _column_values(batch, spec.column)
                if keys.dtype == object:
                    # null group keys would break the sort (None < str);
                    # collect them under the None group explicitly
                    null_mask = np.fromiter(
                        (k is None for k in keys), bool, len(keys)
                    )
                    if null_mask.any():
                        st = spec.build()
                        st.observe(vals[null_mask])
                        groups[None] = st
                        keys, vals = keys[~null_mask], vals[~null_mask]
                order = np.argsort(keys, kind="stable")
                skeys = keys[order]
                uniq, starts = np.unique(skeys, return_index=True)
                ends = np.append(starts[1:], len(skeys))
                for k, s, e in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
                    st = spec.build()
                    st.observe(vals[order[s:e]])
                    groups[k] = st
                partial[spec.name] = groups
        return pa.table({"partial": pa.array([pickle.dumps(partial)], pa.binary())})


def _merge_partial_into(merged: dict, p: dict) -> None:
    for name, st in p.items():
        if name not in merged:
            merged[name] = st
        elif isinstance(st, dict):  # group_by partial
            for k, sub in st.items():
                if k in merged[name]:
                    merged[name][k].merge(sub)
                else:
                    merged[name][k] = sub
        else:
            merged[name].merge(st)


def _merge_partial_rows(batch: pa.Table) -> pa.Table:
    """Tree-reduce step: N pickled partial rows → one merged partial row."""
    merged: dict[str, Any] = {}
    for blob in batch["partial"].to_pylist():
        _merge_partial_into(merged, pickle.loads(blob))
    return pa.table({"partial": pa.array([pickle.dumps(merged)], pa.binary())})


def compute_stats(ds: ray.data.Dataset, specs: list[StatSpec],
                  batch_size: int = 100_000, fanin: int = 64,
                  max_driver_partials: int = 256) -> dict[str, Any]:
    """Distributed partial-sketch pass (StatsScan shape) with a TREE of
    merge tasks bounding the driver tail: each round merges up to
    ``fanin`` pickled partials per task, and the driver only ever
    deserializes ≤ ``max_driver_partials`` rows — at 10^7 input blocks a
    flat take_all() would stream every sketch (CMS tables are ~64 KB each)
    through one process."""
    partials = ds.map_batches(
        _StatsPartial(specs).__call__,
        batch_format="pyarrow",
        batch_size=batch_size,
    ).materialize()
    rounds = 0
    while partials.count() > max_driver_partials and rounds < 10:
        partials = partials.map_batches(
            _merge_partial_rows, batch_format="pyarrow", batch_size=fanin
        ).materialize()
        rounds += 1
    merged: dict[str, Any] = {}
    for row in partials.take_all():
        _merge_partial_into(merged, pickle.loads(row["partial"]))
    out: dict[str, Any] = {}
    for name, st in merged.items():
        if isinstance(st, dict):
            out[name] = {k: s.result() for k, s in st.items()}
        else:
            out[name] = st.result()
    return out


# ---------------------------------------------------------------------------
# stat-spec string parser (Stat.scala:28-188 / StatParser analog)
# ---------------------------------------------------------------------------

def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside parentheses (GroupBy nests a sub-spec)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur or not parts:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_one_spec(text: str, name: str) -> StatSpec:
    import re

    m = re.fullmatch(r"\s*([A-Za-z0-9_]+)\s*\((.*)\)\s*", text, re.DOTALL)
    if not m:
        raise ValueError(f"bad stat spec {text!r}: expected Name(args)")
    kind_name, argstr = m.group(1), m.group(2)
    args = _split_top_level(argstr, ",") if argstr.strip() else []
    k = kind_name.lower()
    _ARITY = {"minmax": 1, "enumeration": 1, "topk": 1, "histogram": 4,
              "rangehistogram": 4, "frequency": 1, "descriptivestats": 1,
              "hyperloglog": 1, "cardinality": 1, "groupby": 2}
    if len(args) < _ARITY.get(k, 0):
        raise ValueError(
            f"bad stat spec {text!r}: {kind_name} needs at least "
            f"{_ARITY[k]} argument(s), got {len(args)}"
        )
    if k == "count" or k == "iteratorstackcount":
        return StatSpec(name, "count", args[0] if args else None)
    if k == "minmax":
        return StatSpec(name, "min_max", args[0])
    if k == "enumeration":
        return StatSpec(name, "enumeration", args[0])
    if k == "topk":
        kw = {"k": int(args[1])} if len(args) > 1 else {}
        return StatSpec(name, "top_k", args[0], **kw)
    if k in ("histogram", "rangehistogram"):
        return StatSpec(name, "histogram", args[0], bins=int(args[1]),
                        lo=float(args[2]), hi=float(args[3]))
    if k == "frequency":
        kw = {"width": 1 << int(args[1])} if len(args) > 1 else {}
        return StatSpec(name, "frequency", args[0], **kw)
    if k == "descriptivestats":
        col = args[0] if len(args) == 1 else list(args)
        return StatSpec(name, "descriptive", col)
    if k in ("hyperloglog", "cardinality"):
        kw = {"log2m": int(args[1])} if len(args) > 1 else {}
        return StatSpec(name, "hyperloglog", args[0], **kw)
    if k == "z3histogram":
        # reference signature (geom, dtg, period, length): the engine's
        # precomputed z3_bin/z3 columns stand in for geom+dtg+period;
        # length → prefix bits
        length = int(args[3]) if len(args) > 3 else 4096
        return StatSpec(name, "z3_histogram", ["z3_bin", "z3"],
                        prefix_bits=max(1, (length - 1).bit_length()))
    if k == "z3frequency":
        precision = int(args[3]) if len(args) > 3 else 12
        return StatSpec(name, "z3_frequency", ["z3_bin", "z3"],
                        prefix_bits=precision)
    if k == "groupby":
        sub = _parse_one_spec(",".join(args[1:]), name)
        sub.group_by = args[0]
        return sub
    raise ValueError(f"unknown stat {kind_name!r} in spec {text!r}")


def parse_stat_specs(spec: str) -> list[StatSpec]:
    """Parse a reference-style stat-spec string, e.g.
    ``"MinMax(value);Count();Histogram(lat,10,-90,90)"`` or
    ``"GroupBy(lang,Count(url))"`` — each entry becomes a
    :class:`StatSpec` named by its own spec text (Stat.scala:134
    semicolon-list semantics)."""
    return [
        _parse_one_spec(part, part)
        for part in _split_top_level(spec, ";")
    ]
