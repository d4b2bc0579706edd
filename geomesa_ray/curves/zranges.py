"""Z-range decomposition: filter boxes -> covering index-key ranges.

Driver-side pure-Python planner matching the reference's breadth-first
quad/oct-tree search over z-prefix quadrants
(geomesa-z3/.../zorder/sfcurve/ZN.scala:110-242): seed at the longest common
binary prefix of the query bounds, emit contained quadrants as covered
ranges, recurse overlapping ones under a ``max_ranges`` budget and
``max_recurse`` depth, then sort + coalesce adjacent ranges. Also implements
litmax/bigmin (Tropf's zdiv, ZN.scala:309-361) for range splitting.

Ranges returned are inclusive [lower, upper]; ``contained`` marks ranges with
no false positives (every z in the range decodes inside the query box).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Optional

from geomesa_ray.curves.zorder import (
    z2_combine,
    z2_decode,
    z2_encode,
    z2_split,
    z3_decode,
    z3_encode,
    z3_split,
)

DEFAULT_RECURSE = 7  # ZN.scala:293
_M64 = (1 << 64) - 1


@dataclass(frozen=True)
class IndexRange:
    lower: int
    upper: int
    contained: bool


class _ZN:
    """Dimension-generic BFS range planner over Morton codes."""

    dims: int
    bits_per_dim: int
    total_bits: int
    max_mask: int

    def decode(self, z: int) -> tuple:
        raise NotImplementedError

    def split(self, v: int) -> int:
        raise NotImplementedError

    def _contains(self, rng: tuple[int, int], v_rng: tuple[int, int]) -> bool:
        rmin, rmax = self.decode(rng[0]), self.decode(rng[1])
        vmin, vmax = self.decode(v_rng[0]), self.decode(v_rng[1])
        for d in range(self.dims):
            if vmin[d] < rmin[d] or vmin[d] > rmax[d] or vmax[d] < rmin[d] or vmax[d] > rmax[d]:
                return False
        return True

    def _overlaps(self, rng: tuple[int, int], v_rng: tuple[int, int]) -> bool:
        rmin, rmax = self.decode(rng[0]), self.decode(rng[1])
        vmin, vmax = self.decode(v_rng[0]), self.decode(v_rng[1])
        for d in range(self.dims):
            if max(rmin[d], vmin[d]) > min(rmax[d], vmax[d]):
                return False
        return True

    def longest_common_prefix(self, *values: int) -> tuple[int, int]:
        """(common prefix value, number of common bits), in dim-aligned steps."""
        bit_shift = self.total_bits - self.dims
        while bit_shift > -1:
            head = values[0] >> bit_shift
            if all((v >> bit_shift) == head for v in values[1:]):
                bit_shift -= self.dims
            else:
                break
        bit_shift += self.dims
        prefix = values[0] & (((1 << 63) - 1) << bit_shift) & _M64
        return prefix, 64 - bit_shift

    def zranges(
        self,
        zbounds: list[tuple[int, int]],
        precision: int = 64,
        max_ranges: Optional[int] = None,
        max_recurse: Optional[int] = DEFAULT_RECURSE,
    ) -> list[IndexRange]:
        """BFS decomposition of one or more z-bound boxes into key ranges."""
        from collections import deque

        ranges: list[IndexRange] = []
        q: deque = deque()  # FIFO of (min, max) quadrant ranges
        terminator = None

        flat = [v for b in zbounds for v in b]
        prefix, common_bits = self.longest_common_prefix(*flat)
        offset = 64 - common_bits

        def is_contained(rng):
            return any(self._contains(b, rng) for b in zbounds)

        def is_overlapped(rng):
            return any(self._overlaps(b, rng) for b in zbounds)

        # initial level: the single quadrant under the common prefix
        lo0 = prefix
        hi0 = lo0 | ((1 << offset) - 1)
        if is_contained((lo0, hi0)) or offset < 64 - precision:
            ranges.append(IndexRange(lo0, hi0, True))
        elif is_overlapped((lo0, hi0)):
            q.append((lo0, hi0))
        q.append(terminator)
        offset -= self.dims

        level = 0
        range_stop = max_ranges if max_ranges is not None else (1 << 62)
        recurse_stop = max_recurse if max_recurse is not None else DEFAULT_RECURSE
        quadrants = 1 << self.dims

        def bottom_out():
            while q:
                mm = q.popleft()
                if mm is not terminator:
                    ranges.append(IndexRange(mm[0], mm[1], False))

        while q:
            nxt = q.popleft()
            if nxt is terminator:
                if q:
                    level += 1
                    offset -= self.dims
                    if level >= recurse_stop or offset < 0:
                        bottom_out()
                    else:
                        q.append(terminator)
            else:
                pfx = nxt[0]
                for quadrant in range(quadrants):
                    lo = pfx | (quadrant << offset)
                    hi = lo | ((1 << offset) - 1)
                    if is_contained((lo, hi)) or offset < 64 - precision:
                        ranges.append(IndexRange(lo, hi, True))
                    elif is_overlapped((lo, hi)):
                        q.append((lo, hi))
                # subtract 1 from len(q) for the terminator
                if len(ranges) + len(q) - 1 >= range_stop:
                    bottom_out()

        return merge_ranges(ranges)

    # --- litmax / bigmin -------------------------------------------------

    def _load(self, target: int, p: int, bits: int, dim: int) -> int:
        mask = ~((self.split(self.max_mask >> (self.bits_per_dim - bits)) << dim)) & _M64
        return (target & mask) | (self.split(p) << dim)

    def zdivide(self, p: int, rmin: int, rmax: int) -> tuple[int, int]:
        """(litmax, bigmin) for point p outside query range [rmin, rmax]."""
        if rmin >= rmax:
            raise ValueError("min must be less than max")
        zmin, zmax = rmin, rmax
        bigmin = litmax = 0

        def bit(x, idx):
            return (x >> idx) & 1

        for i in range(63, -1, -1):
            bits = i // self.dims + 1
            dim = i % self.dims
            over = 1 << (bits - 1)
            under = (1 << (bits - 1)) - 1
            b = (bit(p, i), bit(zmin, i), bit(zmax, i))
            if b == (0, 0, 1):
                zmax = self._load(zmax, under, bits, dim)
                bigmin = self._load(zmin, over, bits, dim)
            elif b == (0, 1, 1):
                return litmax, zmin
            elif b == (1, 0, 0):
                return zmax, bigmin
            elif b == (1, 0, 1):
                litmax = self._load(zmax, under, bits, dim)
                zmin = self._load(zmin, over, bits, dim)
        return litmax, bigmin


class Z2Planner(_ZN):
    dims = 2
    bits_per_dim = 31
    total_bits = 62
    max_mask = 0x7FFFFFFF

    def decode(self, z: int) -> tuple:
        x, y = z2_decode(z)
        return int(x), int(y)

    def split(self, v: int) -> int:
        return int(z2_split(v))


class Z3Planner(_ZN):
    dims = 3
    bits_per_dim = 21
    total_bits = 63
    max_mask = 0x1FFFFF

    def decode(self, z: int) -> tuple:
        x, y, t = z3_decode(z)
        return int(x), int(y), int(t)

    def split(self, v: int) -> int:
        return int(z3_split(v))


def merge_ranges(ranges: Iterable[IndexRange]) -> list[IndexRange]:
    """Sort and coalesce adjacent/overlapping ranges (ZN.scala:218-240)."""
    rs = sorted(ranges, key=lambda r: (r.lower, r.upper))
    if not rs:
        return []
    out = []
    cur = rs[0]
    for r in rs[1:]:
        if r.lower <= cur.upper + 1:
            cur = IndexRange(cur.lower, max(cur.upper, r.upper), cur.contained and r.contained)
        else:
            out.append(cur)
            cur = r
    out.append(cur)
    return out


_Z2_PLANNER = Z2Planner()
_Z3_PLANNER = Z3Planner()


def zranges_2d(
    sfc,
    boxes: list[tuple[float, float, float, float]],
    precision: int = 64,
    max_ranges: Optional[int] = None,
) -> list[IndexRange]:
    """Covering z2 ranges for (xmin, ymin, xmax, ymax) boxes (Z2SFC.ranges)."""
    zbounds = [
        (int(sfc.index(xmin, ymin)), int(sfc.index(xmax, ymax)))
        for (xmin, ymin, xmax, ymax) in boxes
    ]
    return _Z2_PLANNER.zranges(zbounds, precision, max_ranges, DEFAULT_RECURSE)


def zranges_3d(
    sfc,
    boxes: list[tuple[float, float, float, float]],
    time_ranges: list[tuple[int, int]],
    precision: int = 64,
    max_ranges: Optional[int] = None,
) -> list[IndexRange]:
    """Covering z3 ranges for boxes x in-bin time-offset ranges (Z3SFC.ranges).

    ``time_ranges`` are offsets within one time bin; use
    :func:`times_by_bin` to fan an epoch-millis interval out per bin.
    Recursion is unbounded like the reference (Z3SFC.scala:72).
    """
    zbounds = []
    for (xmin, ymin, xmax, ymax) in boxes:
        for (tmin, tmax) in time_ranges:
            zbounds.append((int(sfc.index(xmin, ymin, tmin)), int(sfc.index(xmax, ymax, tmax))))
    return _Z3_PLANNER.zranges(zbounds, precision, max_ranges, max_recurse=1 << 31)


def times_by_bin(sfc, lo_millis: int, hi_millis: int) -> dict[int, list[tuple[int, int]]]:
    """Fan a [lo, hi] epoch-millis interval out into per-bin offset ranges.

    Mirrors Z3IndexKeySpace.getIndexValues (Z3IndexKeySpace.scala:132-158):
    the first/last bins get partial offset ranges; every bin in between gets
    the whole period.
    """
    from geomesa_ray.curves.binnedtime import bounds_to_indexable_millis, time_to_binned_time

    lo_millis, hi_millis = bounds_to_indexable_millis(lo_millis, hi_millis, sfc.period)
    to_binned = time_to_binned_time(sfc.period)
    lo_b = to_binned(lo_millis)
    hi_b = to_binned(hi_millis)
    whole = (int(sfc.time.min), int(sfc.time.max))
    out: dict[int, list[tuple[int, int]]] = {}
    if lo_b.bin == hi_b.bin:
        out[lo_b.bin] = [(lo_b.offset, hi_b.offset)]
    else:
        out[lo_b.bin] = [(lo_b.offset, whole[1])]
        out[hi_b.bin] = [(whole[0], hi_b.offset)]
        for b in range(lo_b.bin + 1, hi_b.bin):
            out[b] = [whole]
    return out
