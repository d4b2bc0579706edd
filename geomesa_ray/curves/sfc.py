"""Z2 / Z3 space-filling curves: normalize + interleave, vectorized.

Semantics match the reference curves (geomesa-z3/.../curve/Z2SFC.scala:26-53,
Z3SFC.scala:37-99): Z2 = 31 bits/dim over (lon, lat); Z3 = 21 bits/dim over
(lon, lat, binned-time offset), one curve instance per time period.
``lenient`` clamps out-of-bounds values instead of raising.
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.curves.binnedtime import TimePeriod, bins_and_offsets, max_offset
from geomesa_ray.curves.normalize import NormalizedLat, NormalizedLon, NormalizedTime
from geomesa_ray.curves.zorder import z2_decode, z2_encode, z3_decode, z3_encode


class Z2SFC:
    """2D curve over (lon, lat); default precision 31 bits per dimension."""

    def __init__(self, precision: int = 31):
        self.precision = precision
        self.lon = NormalizedLon(precision)
        self.lat = NormalizedLat(precision)

    def index(self, x, y, lenient: bool = False):
        """Vectorized: lon/lat arrays -> int64 z2 codes."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if lenient:
            x, y = self.lon.clamp(x), self.lat.clamp(y)
        else:
            bad = (x < self.lon.min) | (x > self.lon.max) | (y < self.lat.min) | (y > self.lat.max)
            if np.any(bad):
                raise ValueError(f"value(s) out of bounds: {np.flatnonzero(bad)[:5]}")
        return z2_encode(self.lon.normalize(x), self.lat.normalize(y))

    def invert(self, z):
        """z2 codes -> (lon, lat) bin centers."""
        xi, yi = z2_decode(z)
        return self.lon.denormalize(xi), self.lat.denormalize(yi)


class Z3SFC:
    """3D curve over (lon, lat, binned time); 21 bits per dimension."""

    def __init__(self, period: TimePeriod = TimePeriod.WEEK, precision: int = 21):
        self.period = TimePeriod(period)
        self.precision = precision
        self.lon = NormalizedLon(precision)
        self.lat = NormalizedLat(precision)
        self.time = NormalizedTime(precision, float(max_offset(self.period)))

    def index(self, x, y, t, lenient: bool = False):
        """Vectorized: lon/lat arrays + time-offset arrays -> int64 z3 codes.

        ``t`` is the offset within a time bin (not epoch millis); pair with
        :func:`index_from_millis` for the common case.
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        t = np.asarray(t, dtype=np.float64)
        if lenient:
            x, y, t = self.lon.clamp(x), self.lat.clamp(y), self.time.clamp(t)
        else:
            bad = (
                (x < self.lon.min) | (x > self.lon.max)
                | (y < self.lat.min) | (y > self.lat.max)
                | (t < self.time.min) | (t > self.time.max)
            )
            if np.any(bad):
                raise ValueError(f"value(s) out of bounds: {np.flatnonzero(bad)[:5]}")
        return z3_encode(self.lon.normalize(x), self.lat.normalize(y), self.time.normalize(t))

    def index_from_millis(self, x, y, millis, lenient: bool = False):
        """Vectorized: lon/lat + epoch millis -> (bin int16, z3 int64).

        Null/absent times index at t=0 like the reference
        (Z3IndexKeySpace.scala:71-72) — pass millis=0 for those rows.
        """
        millis = np.asarray(millis, dtype=np.int64)
        if lenient:
            millis = np.maximum(millis, 0)
        bins, offs = bins_and_offsets(millis, self.period)
        return bins, self.index(x, y, offs, lenient=lenient)

    def invert(self, z):
        """z3 codes -> (lon, lat, time-offset) bin centers."""
        xi, yi, ti = z3_decode(z)
        return self.lon.denormalize(xi), self.lat.denormalize(yi), self.time.denormalize(ti).astype(np.int64)
