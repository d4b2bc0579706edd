"""Dimension normalization: map a double in [min, max] to an int bin in [0, 2^p).

Semantics match the reference's bit-normalized dimension
(geomesa-z3/.../curve/NormalizedDimension.scala:56-78):

    normalize(x) = maxIndex               if x >= max
                 = floor((x - min) * bins / (max - min))   otherwise
    denormalize(i) = min + (min(i, maxIndex) + 0.5) * (max - min) / bins

Note the clamp applies only at the top (x >= max); values below ``min`` are
the caller's responsibility (the SFC layer clamps when ``lenient``).
"""

from __future__ import annotations

import numpy as np


class NormalizedDimension:
    """Maps doubles within [min, max] to ints in [0, 2^precision)."""

    def __init__(self, min_: float, max_: float, precision: int):
        if not (0 < precision < 32):
            raise ValueError("precision (bits) must be in [1,31]")
        self.min = float(min_)
        self.max = float(max_)
        self.precision = precision
        self.bins = 1 << precision
        self.max_index = self.bins - 1
        self._normalizer = self.bins / (self.max - self.min)
        self._denormalizer = (self.max - self.min) / self.bins

    def normalize(self, x):
        """Vectorized normalize. ``x`` may be a scalar or numpy array.

        Returns int64 bin indices in [0, max_index].
        """
        x = np.asarray(x, dtype=np.float64)
        out = np.floor((x - self.min) * self._normalizer).astype(np.int64)
        # clamp: x >= max -> max_index (floor can also exceed due to rounding)
        return np.minimum(out, self.max_index)

    def denormalize(self, i):
        """Vectorized bin-center denormalize; inverse of :meth:`normalize`."""
        i = np.asarray(i, dtype=np.float64)
        i = np.minimum(i, self.max_index)
        return self.min + (i + 0.5) * self._denormalizer

    def clamp(self, x):
        """Clamp values to [min, max] (lenient mode)."""
        return np.clip(np.asarray(x, dtype=np.float64), self.min, self.max)


def NormalizedLat(precision: int) -> NormalizedDimension:
    return NormalizedDimension(-90.0, 90.0, precision)


def NormalizedLon(precision: int) -> NormalizedDimension:
    return NormalizedDimension(-180.0, 180.0, precision)


def NormalizedTime(precision: int, max_: float) -> NormalizedDimension:
    return NormalizedDimension(0.0, max_, precision)
