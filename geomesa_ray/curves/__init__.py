"""Space-filling-curve kernels (pure numpy; no Ray dependency).

Scalar variants exist for the driver-side range planner; vectorized variants
are the ``map_batches`` hot path.
"""

from geomesa_ray.curves.normalize import NormalizedDimension, NormalizedLat, NormalizedLon, NormalizedTime
from geomesa_ray.curves.zorder import (
    z2_combine,
    z2_decode,
    z2_encode,
    z2_split,
    z3_combine,
    z3_decode,
    z3_encode,
    z3_split,
)
from geomesa_ray.curves.binnedtime import BinnedTime, TimePeriod, max_offset, time_to_binned_time
from geomesa_ray.curves.sfc import Z2SFC, Z3SFC
from geomesa_ray.curves.zranges import IndexRange, zranges_2d, zranges_3d

__all__ = [
    "NormalizedDimension", "NormalizedLat", "NormalizedLon", "NormalizedTime",
    "z2_split", "z2_combine", "z2_encode", "z2_decode",
    "z3_split", "z3_combine", "z3_encode", "z3_decode",
    "BinnedTime", "TimePeriod", "max_offset", "time_to_binned_time",
    "Z2SFC", "Z3SFC",
    "IndexRange", "zranges_2d", "zranges_3d",
]
