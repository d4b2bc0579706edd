"""Bit-interleaving for 2D and 3D Morton (Z-order) codes, vectorized.

Semantics match the reference's magic-mask split/combine
(geomesa-z3/.../zorder/sfcurve/Z2.scala:43-78 and Z3.scala:52-90):

* Z2: 31 bits per dimension, 62-bit code, bit layout ``...y1x1y0x0``
  (x occupies the even bits).
* Z3: 21 bits per dimension, 63-bit code, bit layout ``...z0y0x0``.

All functions operate on numpy uint64 arrays (scalars are fine too) and are
branch-free, so they vectorize cleanly inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np

Z2_BITS = 31
Z2_MAX_MASK = np.uint64(0x7FFFFFFF)
Z3_BITS = 21
Z3_MAX_MASK = np.uint64(0x1FFFFF)

_U = np.uint64


def _as_u64(v):
    return np.asarray(v).astype(np.uint64)


def z2_split(value):
    """Insert one 0 between every bit; considers only the low 31 bits."""
    x = _as_u64(value) & Z2_MAX_MASK
    x = (x ^ (x << _U(32))) & _U(0x00000000FFFFFFFF)
    x = (x ^ (x << _U(16))) & _U(0x0000FFFF0000FFFF)
    x = (x ^ (x << _U(8))) & _U(0x00FF00FF00FF00FF)
    x = (x ^ (x << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x ^ (x << _U(2))) & _U(0x3333333333333333)
    x = (x ^ (x << _U(1))) & _U(0x5555555555555555)
    return x


def z2_combine(z):
    """Take every other bit to re-form one dimension (inverse of z2_split)."""
    x = _as_u64(z) & _U(0x5555555555555555)
    x = (x ^ (x >> _U(1))) & _U(0x3333333333333333)
    x = (x ^ (x >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x ^ (x >> _U(4))) & _U(0x00FF00FF00FF00FF)
    x = (x ^ (x >> _U(8))) & _U(0x0000FFFF0000FFFF)
    x = (x ^ (x >> _U(16))) & _U(0x00000000FFFFFFFF)
    return x.astype(np.int64)


def z2_encode(x, y):
    """Interleave two <=31-bit ints into one 62-bit Z2 code (int64)."""
    return (z2_split(x) | (z2_split(y) << _U(1))).astype(np.int64)


def z2_decode(z):
    """Z2 code -> (x, y) int64 arrays."""
    z = _as_u64(z)
    return z2_combine(z), z2_combine(z >> _U(1))


def z3_split(value):
    """Insert two 0s between every bit; considers only the low 21 bits."""
    x = _as_u64(value) & Z3_MAX_MASK
    x = (x | (x << _U(32))) & _U(0x1F00000000FFFF)
    x = (x | (x << _U(16))) & _U(0x1F0000FF0000FF)
    x = (x | (x << _U(8))) & _U(0x100F00F00F00F00F)
    x = (x | (x << _U(4))) & _U(0x10C30C30C30C30C3)
    x = (x | (x << _U(2))) & _U(0x1249249249249249)
    return x


def z3_combine(z):
    """Take every third bit to re-form one dimension (inverse of z3_split)."""
    x = _as_u64(z) & _U(0x1249249249249249)
    x = (x ^ (x >> _U(2))) & _U(0x10C30C30C30C30C3)
    x = (x ^ (x >> _U(4))) & _U(0x100F00F00F00F00F)
    x = (x ^ (x >> _U(8))) & _U(0x1F0000FF0000FF)
    x = (x ^ (x >> _U(16))) & _U(0x1F00000000FFFF)
    x = (x ^ (x >> _U(32))) & Z3_MAX_MASK
    return x.astype(np.int64)


def z3_encode(x, y, t):
    """Interleave three <=21-bit ints into one 63-bit Z3 code (int64)."""
    return (z3_split(x) | (z3_split(y) << _U(1)) | (z3_split(t) << _U(2))).astype(np.int64)


def z3_decode(z):
    """Z3 code -> (x, y, t) int64 arrays."""
    z = _as_u64(z)
    return z3_combine(z), z3_combine(z >> _U(1)), z3_combine(z >> _U(2))
