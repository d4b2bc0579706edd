"""XZ-ordering for extents (non-point geometries).

Implements the XZ index family per Böhm, Klump & Kriegel, "XZ-Ordering: A
Space-Filling Curve for Objects with Spatial Extension" (SSD'99), matching
the reference's behavior (geomesa-z3/.../curve/XZ2SFC.scala:54-77 index,
:146-252 ranges, :264-286 sequence code, :297-306 sequence interval,
XZ3SFC.scala:26-82):

* an object (bbox) is indexed at the resolution where an *enlarged* cell
  (upper bounds extended by the cell's own width/height) still contains it:
  ``l1 = floor(log(maxDim)/log(0.5))``, refined to ``l1+1`` when the object
  fits the doubled cell at the finer level (the reference's ``l1 + 1``
  predicate);
* the sequence code walks quadrants accumulating ``1 + q*(4^(g-i)-1)/3``;
* query ranges BFS the quad tree over *extended* elements, emitting
  contained intervals ``[code, code + (4^(g-level+1)-1)/3]`` (paper lemma 3)
  and partial single codes, then merge adjacent ranges.

``index`` is vectorized over whole bbox arrays (one pass of numpy ops per
level); ``ranges`` is a driver-side planner.

XZ3 is the oct-tree variant with a binned-time third dimension (quadrant
bit order x→1, y→2, t→4; ``8^(g-i)-1)/7`` offsets).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from geomesa_ray.curves.binnedtime import TimePeriod, max_offset
from geomesa_ray.curves.zranges import IndexRange


class XZ2SFC:
    def __init__(self, g: int = 12, x_bounds=(-180.0, 180.0), y_bounds=(-90.0, 90.0)):
        self.g = g
        self.xlo, self.xhi = x_bounds
        self.ylo, self.yhi = y_bounds
        self.xsize = self.xhi - self.xlo
        self.ysize = self.yhi - self.ylo

    # -- indexing -----------------------------------------------------------

    def _normalize(self, xmin, ymin, xmax, ymax, lenient):
        xmin = np.asarray(xmin, dtype=np.float64)
        ymin = np.asarray(ymin, dtype=np.float64)
        xmax = np.asarray(xmax, dtype=np.float64)
        ymax = np.asarray(ymax, dtype=np.float64)
        if lenient:
            xmin = np.clip(xmin, self.xlo, self.xhi)
            xmax = np.clip(xmax, self.xlo, self.xhi)
            ymin = np.clip(ymin, self.ylo, self.yhi)
            ymax = np.clip(ymax, self.ylo, self.yhi)
        else:
            if (np.any(xmin < self.xlo) or np.any(xmax > self.xhi)
                    or np.any(ymin < self.ylo) or np.any(ymax > self.yhi)):
                raise ValueError("bounds out of range")
        return (
            (xmin - self.xlo) / self.xsize,
            (ymin - self.ylo) / self.ysize,
            (xmax - self.xlo) / self.xsize,
            (ymax - self.ylo) / self.ysize,
        )

    def _lengths(self, nxmin, nymin, nxmax, nymax) -> np.ndarray:
        """Per-bbox sequence length: l1, refined to l1+1 when the object
        fits a doubled next-level cell on both axes (XZ2SFC.scala:60-74)."""
        maxdim = np.maximum(nxmax - nxmin, nymax - nymin)
        with np.errstate(divide="ignore"):
            l1 = np.floor(np.log(maxdim) / np.log(0.5))
        l1 = np.where(np.isfinite(l1), l1, self.g).astype(np.int64)
        lengths = np.where(l1 >= self.g, self.g, l1)
        refine = l1 < self.g
        if refine.any():
            w2 = np.power(0.5, l1 + 1)
            px = nxmax <= (np.floor(nxmin / w2) * w2) + 2 * w2
            py = nymax <= (np.floor(nymin / w2) * w2) + 2 * w2
            lengths = np.where(refine & px & py, l1 + 1, lengths)
        return lengths

    def _sequence_code(self, x: np.ndarray, y: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Vectorized quadrant walk (XZ2SFC.scala:264-286)."""
        n = len(x)
        cs = np.zeros(n, dtype=np.int64)
        xmin = np.zeros(n)
        ymin = np.zeros(n)
        xmax = np.ones(n)
        ymax = np.ones(n)
        for i in range(self.g):
            active = i < lengths
            if not active.any():
                break
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            qx = (x >= xc).astype(np.int64)  # 0 if x < center
            qy = (y >= yc).astype(np.int64)
            q = qx + 2 * qy
            step = (4 ** (self.g - i) - 1) // 3
            cs += np.where(active, 1 + q * step, 0)
            xmin = np.where(qx == 1, xc, xmin)
            xmax = np.where(qx == 0, xc, xmax)
            ymin = np.where(qy == 1, yc, ymin)
            ymax = np.where(qy == 0, yc, ymax)
        return cs

    def index(self, xmin, ymin, xmax, ymax, lenient: bool = False) -> np.ndarray:
        """Sequence codes for arrays of bboxes (vectorized)."""
        nxmin, nymin, nxmax, nymax = self._normalize(xmin, ymin, xmax, ymax, lenient)
        lengths = self._lengths(nxmin, nymin, nxmax, nymax)
        return self._sequence_code(
            np.atleast_1d(nxmin), np.atleast_1d(nymin), np.atleast_1d(lengths)
        )

    # -- range planning -----------------------------------------------------

    def _sequence_code_scalar(self, x: float, y: float, length: int) -> int:
        """Pure-scalar quadrant walk for the planner's per-element calls."""
        xmin = ymin = 0.0
        xmax = ymax = 1.0
        cs = 0
        for i in range(length):
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            q = (0 if x < xc else 1) + (0 if y < yc else 2)
            cs += 1 + q * ((4 ** (self.g - i) - 1) // 3)
            if x < xc:
                xmax = xc
            else:
                xmin = xc
            if y < yc:
                ymax = yc
            else:
                ymin = yc
        return cs

    def _interval(self, code_xy, level: int, partial: bool) -> tuple[int, int]:
        x, y = code_xy
        mn = self._sequence_code_scalar(x, y, level)
        if partial:
            return mn, mn
        return mn, mn + (4 ** (self.g - level + 1) - 1) // 3

    def ranges(self, queries, max_ranges: int | None = 2000) -> list[IndexRange]:
        """Covering sequence-code ranges for OR'd query windows
        (XZ2SFC.scala:146-252 BFS over extended quad elements). The default
        budget matches the reference's scan-ranges target; when hit, the
        remaining frontier bottoms out as full (over-covering) intervals."""
        windows = [self._normalize(*q, lenient=False) for q in queries]
        windows = [(float(a), float(b), float(c), float(d)) for a, b, c, d in windows]
        stop = max_ranges if max_ranges is not None else 1 << 62

        out: list[IndexRange] = []
        # element: (xmin, ymin, xmax, ymax, length-of-side)
        remaining: deque = deque()
        root = (0.0, 0.0, 1.0, 1.0, 1.0)
        remaining.extend(_children2(root))
        remaining.append(None)  # level terminator
        level = 1

        def contained(el) -> bool:
            xmin, ymin, xmax, ymax, ln = el
            xext, yext = xmax + ln, ymax + ln
            return any(
                w[0] <= xmin and w[1] <= ymin and w[2] >= xext and w[3] >= yext
                for w in windows
            )

        def overlaps(el) -> bool:
            xmin, ymin, xmax, ymax, ln = el
            xext, yext = xmax + ln, ymax + ln
            return any(
                w[2] >= xmin and w[3] >= ymin and w[0] <= xext and w[1] <= yext
                for w in windows
            )

        while level < self.g and remaining and len(out) < stop:
            el = remaining.popleft()
            if el is None:
                if remaining:
                    level += 1
                    remaining.append(None)
            elif contained(el):
                lo, hi = self._interval((el[0], el[1]), level, partial=False)
                out.append(IndexRange(lo, hi, True))
            elif overlaps(el):
                lo, hi = self._interval((el[0], el[1]), level, partial=True)
                out.append(IndexRange(lo, hi, False))
                remaining.extend(_children2(el))

        # bottom out: unprocessed overlapping elements become full intervals
        while remaining:
            el = remaining.popleft()
            if el is None:
                level += 1
            else:
                lo, hi = self._interval((el[0], el[1]), level, partial=False)
                out.append(IndexRange(lo, hi, False))

        if not out:  # empty query list -> no ranges, not IndexError
            return []
        out.sort(key=lambda r: (r.lower, r.upper))
        merged: list[IndexRange] = []
        cur = out[0]
        for r in out[1:]:
            if r.lower <= cur.upper + 1:
                cur = IndexRange(cur.lower, max(cur.upper, r.upper), cur.contained and r.contained)
            else:
                merged.append(cur)
                cur = r
        merged.append(cur)
        return merged


def _children2(el):
    xmin, ymin, xmax, ymax, ln = el
    xc = (xmin + xmax) / 2.0
    yc = (ymin + ymax) / 2.0
    half = ln / 2.0
    return [
        (xmin, ymin, xc, yc, half),
        (xc, ymin, xmax, yc, half),
        (xmin, yc, xc, ymax, half),
        (xc, yc, xmax, ymax, half),
    ]


def _children3(el):
    x0, y0, z0, x1, y1, z1, ln = el
    xc = (x0 + x1) / 2.0
    yc = (y0 + y1) / 2.0
    zc = (z0 + z1) / 2.0
    half = ln / 2.0
    out = []
    for (a, b) in ((x0, xc), (xc, x1)):
        for (c, d) in ((y0, yc), (yc, y1)):
            for (e, f) in ((z0, zc), (zc, z1)):
                out.append((a, c, e, b, d, f, half))
    return out


class XZ3SFC:
    """Oct-tree XZ for (bbox, binned time). One instance per TimePeriod;
    the time dimension spans [0, max_offset(period)] within each epoch bin
    (XZ3SFC.scala:26-82)."""

    def __init__(self, g: int = 12, period: TimePeriod = TimePeriod.WEEK,
                 x_bounds=(-180.0, 180.0), y_bounds=(-90.0, 90.0)):
        self.g = g
        self.period = period
        self.xlo, self.xhi = x_bounds
        self.ylo, self.yhi = y_bounds
        self.zlo, self.zhi = 0.0, float(max_offset(period))
        self.xsize = self.xhi - self.xlo
        self.ysize = self.yhi - self.ylo
        self.zsize = self.zhi - self.zlo

    def _norm(self, v, lo, size, lenient):
        v = np.asarray(v, dtype=np.float64)
        if lenient:
            v = np.clip(v, lo, lo + size)
        elif np.any(v < lo) or np.any(v > lo + size):
            raise ValueError("bounds out of range")
        return (v - lo) / size

    def index(self, xmin, ymin, zmin, xmax, ymax, zmax, lenient: bool = False) -> np.ndarray:
        nx0 = self._norm(xmin, self.xlo, self.xsize, lenient)
        ny0 = self._norm(ymin, self.ylo, self.ysize, lenient)
        nz0 = self._norm(zmin, self.zlo, self.zsize, lenient)
        nx1 = self._norm(xmax, self.xlo, self.xsize, lenient)
        ny1 = self._norm(ymax, self.ylo, self.ysize, lenient)
        nz1 = self._norm(zmax, self.zlo, self.zsize, lenient)

        maxdim = np.maximum(np.maximum(nx1 - nx0, ny1 - ny0), nz1 - nz0)
        with np.errstate(divide="ignore"):
            l1 = np.floor(np.log(maxdim) / np.log(0.5))
        l1 = np.where(np.isfinite(l1), l1, self.g).astype(np.int64)
        lengths = np.where(l1 >= self.g, self.g, l1)
        refine = l1 < self.g
        if refine.any():
            w2 = np.power(0.5, l1 + 1)

            def fits(mn, mx):
                return mx <= (np.floor(mn / w2) * w2) + 2 * w2

            lengths = np.where(
                refine & fits(nx0, nx1) & fits(ny0, ny1) & fits(nz0, nz1),
                l1 + 1,
                lengths,
            )

        n = len(np.atleast_1d(nx0))
        x, y, z = np.atleast_1d(nx0), np.atleast_1d(ny0), np.atleast_1d(nz0)
        lengths = np.atleast_1d(lengths)
        cs = np.zeros(n, dtype=np.int64)
        x0 = np.zeros(n); y0 = np.zeros(n); z0 = np.zeros(n)
        x1 = np.ones(n); y1 = np.ones(n); z1 = np.ones(n)
        for i in range(self.g):
            active = i < lengths
            if not active.any():
                break
            xc = (x0 + x1) / 2.0
            yc = (y0 + y1) / 2.0
            zc = (z0 + z1) / 2.0
            qx = (x >= xc).astype(np.int64)
            qy = (y >= yc).astype(np.int64)
            qz = (z >= zc).astype(np.int64)
            q = qx + 2 * qy + 4 * qz
            step = (8 ** (self.g - i) - 1) // 7
            cs += np.where(active, 1 + q * step, 0)
            x0 = np.where(qx == 1, xc, x0); x1 = np.where(qx == 0, xc, x1)
            y0 = np.where(qy == 1, yc, y0); y1 = np.where(qy == 0, yc, y1)
            z0 = np.where(qz == 1, zc, z0); z1 = np.where(qz == 0, zc, z1)
        return cs

    def ranges(self, queries, max_ranges: int | None = 2000) -> list[IndexRange]:
        """BFS over extended oct elements; queries are
        (xmin, ymin, zmin, xmax, ymax, zmax) in user space. Budgeted like
        XZ2 (3D boundary surfaces grow quadratically with level)."""
        windows = []
        for (a, b, c, d, e, f) in queries:
            windows.append(
                (
                    float(self._norm(a, self.xlo, self.xsize, False)),
                    float(self._norm(b, self.ylo, self.ysize, False)),
                    float(self._norm(c, self.zlo, self.zsize, False)),
                    float(self._norm(d, self.xlo, self.xsize, False)),
                    float(self._norm(e, self.ylo, self.ysize, False)),
                    float(self._norm(f, self.zlo, self.zsize, False)),
                )
            )
        stop = max_ranges if max_ranges is not None else 1 << 62
        out: list[IndexRange] = []
        remaining: deque = deque()
        remaining.extend(_children3((0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0)))
        remaining.append(None)
        level = 1

        def contained(el) -> bool:
            X0, Y0, Z0, X1, Y1, Z1, ln = el
            return any(
                w[0] <= X0 and w[1] <= Y0 and w[2] <= Z0
                and w[3] >= X1 + ln and w[4] >= Y1 + ln and w[5] >= Z1 + ln
                for w in windows
            )

        def overlaps(el) -> bool:
            X0, Y0, Z0, X1, Y1, Z1, ln = el
            return any(
                w[3] >= X0 and w[4] >= Y0 and w[5] >= Z0
                and w[0] <= X1 + ln and w[1] <= Y1 + ln and w[2] <= Z1 + ln
                for w in windows
            )

        def interval(el, lvl, partial):
            mn = self._sequence_code_scalar(el[0], el[1], el[2], lvl)
            if partial:
                return mn, mn
            return mn, mn + (8 ** (self.g - lvl + 1) - 1) // 7

        while level < self.g and remaining and len(out) < stop:
            el = remaining.popleft()
            if el is None:
                if remaining:
                    level += 1
                    remaining.append(None)
            elif contained(el):
                lo, hi = interval(el, level, False)
                out.append(IndexRange(lo, hi, True))
            elif overlaps(el):
                lo, hi = interval(el, level, True)
                out.append(IndexRange(lo, hi, False))
                remaining.extend(_children3(el))
        while remaining:
            el = remaining.popleft()
            if el is None:
                level += 1
            else:
                lo, hi = interval(el, level, False)
                out.append(IndexRange(lo, hi, False))
        if not out:  # empty query list -> no ranges, not IndexError
            return []
        out.sort(key=lambda r: (r.lower, r.upper))
        merged: list[IndexRange] = []
        cur = out[0]
        for r in out[1:]:
            if r.lower <= cur.upper + 1:
                cur = IndexRange(cur.lower, max(cur.upper, r.upper), cur.contained and r.contained)
            else:
                merged.append(cur)
                cur = r
        merged.append(cur)
        return merged

    def _sequence_code_scalar(self, x: float, y: float, z: float, length: int) -> int:
        x0 = y0 = z0 = 0.0
        x1 = y1 = z1 = 1.0
        cs = 0
        for i in range(length):
            xc = (x0 + x1) / 2.0
            yc = (y0 + y1) / 2.0
            zc = (z0 + z1) / 2.0
            q = (0 if x < xc else 1) + (0 if y < yc else 2) + (0 if z < zc else 4)
            cs += 1 + q * ((8 ** (self.g - i) - 1) // 7)
            if x < xc:
                x1 = xc
            else:
                x0 = xc
            if y < yc:
                y1 = yc
            else:
                y0 = yc
            if z < zc:
                z1 = zc
            else:
                z0 = zc
        return cs

    def index_normalized(self, x, y, z, lengths) -> np.ndarray:
        n = len(x)
        cs = np.zeros(n, dtype=np.int64)
        x0 = np.zeros(n); y0 = np.zeros(n); z0 = np.zeros(n)
        x1 = np.ones(n); y1 = np.ones(n); z1 = np.ones(n)
        for i in range(self.g):
            active = i < lengths
            if not np.any(active):
                break
            xc = (x0 + x1) / 2.0; yc = (y0 + y1) / 2.0; zc = (z0 + z1) / 2.0
            qx = (x >= xc).astype(np.int64)
            qy = (y >= yc).astype(np.int64)
            qz = (z >= zc).astype(np.int64)
            q = qx + 2 * qy + 4 * qz
            step = (8 ** (self.g - i) - 1) // 7
            cs += np.where(active, 1 + q * step, 0)
            x0 = np.where(qx == 1, xc, x0); x1 = np.where(qx == 0, xc, x1)
            y0 = np.where(qy == 1, yc, y0); y1 = np.where(qy == 0, yc, y1)
            z0 = np.where(qz == 1, zc, z0); z1 = np.where(qz == 0, zc, z1)
        return cs
