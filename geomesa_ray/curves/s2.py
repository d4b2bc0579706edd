"""S2 cell ids, from the published s2geometry scheme (s2geometry.io docs).

Implements the real S2 construction — unit-sphere → cube face, quadratic
ST projection, Hilbert-curve position, 64-bit cell id with the trailing
lsb-marker encoding — fully vectorized over numpy arrays. (Round 1 used a
z2-prefix quadtree as the discrete-global-grid analog because no
S2/H3 library ships in this environment; this module replaces that gap
with the actual S2 cell-id structure. Bit-parity with the C++ library
cannot be verified in-environment — correctness is established by the
scheme's invariants: hierarchy containment, round-trips, Hilbert
adjacency — see tests/test_s2.py.)

Reference parity: curve/S2SFC.scala keys point geometries by S2 cell id;
our ids serve the same role (cell keys, covers, hierarchy walks).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_SWAP, _INVERT = 1, 2

# Hilbert sub-cell orderings per orientation (s2geometry's posToIJ) and the
# orientation deltas per curve position
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap + invert
    ],
    dtype=np.int64,
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _lonlat_to_xyz(lon, lat):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ufn()[m]
                v[m] = vfn()[m]
    return face, u, v


def _uv_to_st(u):
    # S2's quadratic projection (S2Coords kQuadratic); np.where evaluates
    # both branches, so silence the out-of-domain sqrt on the unused side
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def _st_to_uv(s):
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s):
    return np.clip(
        np.floor(np.ldexp(np.asarray(s, dtype=np.float64), MAX_LEVEL)),
        0,
        (1 << MAX_LEVEL) - 1,
    ).astype(np.int64)


def _ij_to_pos(face, i, j):
    """Hilbert curve position (2·MAX_LEVEL bits) of leaf (i, j) on face."""
    orientation = face & _SWAP  # face's starting orientation
    pos = np.zeros(len(i), dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        bi = (i >> k) & 1
        bj = (j >> k) & 1
        ij = 2 * bi + bj
        p = _IJ_TO_POS[orientation, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orientation = orientation ^ _POS_TO_ORIENT[p]
    return pos


def _pos_to_ij(face, pos):
    """Inverse of :func:`_ij_to_pos`."""
    orientation = face & _SWAP
    i = np.zeros(len(pos), dtype=np.int64)
    j = np.zeros(len(pos), dtype=np.int64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orientation, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orientation = orientation ^ _POS_TO_ORIENT[p]
    return i, j


def lonlat_to_cell_id(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """lon/lat arrays → uint64 S2 cell ids at ``level`` (0..30). Encoding:
    3 face bits, the curve position truncated to 2·level bits, then the
    standard trailing-1 lsb marker."""
    assert 0 <= level <= MAX_LEVEL
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = _ij_to_pos(face, i, j)
    shift = 2 * (MAX_LEVEL - level)
    pos_l = pos >> np.uint64(shift)
    lsb = np.uint64(1) << np.uint64(shift)
    return (
        (face.astype(np.uint64) << np.uint64(2 * MAX_LEVEL + 1))
        | (pos_l << np.uint64(shift + 1))
        | lsb
    )


def cell_level(ids: np.ndarray) -> np.ndarray:
    """Level of each cell id (from the position of the lsb marker)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    # exact log2 for powers of two via the float64 exponent
    shift = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - shift // 2


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell id at ``level`` (must be ≤ the cells' level): clear
    every bit below the new marker, set the marker."""
    ids = np.asarray(ids, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    clear = ~((new_lsb << np.uint64(1)) - np.uint64(1))
    return (ids & clear) | new_lsb


def contains(ancestor: np.ndarray, descendant: np.ndarray) -> np.ndarray:
    """True where ``ancestor`` contains ``descendant`` (range test on the
    curve: a cell covers [id - lsb + 1, id + lsb - 1])."""
    a = np.asarray(ancestor, dtype=np.uint64)
    d = np.asarray(descendant, dtype=np.uint64)
    lsb = a & (~a + np.uint64(1))
    return (d >= a - lsb + np.uint64(1)) & (d <= a + lsb - np.uint64(1))


def cell_id_to_lonlat(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Center lon/lat of each cell id (any level)."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> np.uint64(2 * MAX_LEVEL + 1)).astype(np.int64)
    lsb = ids & (~ids + np.uint64(1))
    pos_bits = ids & np.uint64((1 << (2 * MAX_LEVEL + 1)) - 1)  # drop face
    sh = np.log2(lsb.astype(np.float64)).astype(np.uint64)  # = 2*(30-level)
    pos_l = pos_bits >> (sh + np.uint64(1))
    # curve position of the center leaf: pos_l·4^(30-level) + half the range
    center = (pos_l << sh) + ((np.uint64(1) << sh) >> np.uint64(1))
    i, j = _pos_to_ij(face, center)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, fn in enumerate(
        [
            lambda u, v: (np.ones_like(u), u, v),
            lambda u, v: (-u, np.ones_like(u), v),
            lambda u, v: (-u, -v, np.ones_like(u)),
            lambda u, v: (-np.ones_like(u), -v, -u),
            lambda u, v: (v, -np.ones_like(u), -u),
            lambda u, v: (v, u, -np.ones_like(u)),
        ]
    ):
        m = face == f
        if m.any():
            xf, yf, zf = fn(u[m], v[m])
            x[m], y[m], z[m] = xf, yf, zf
    norm = np.sqrt(x * x + y * y + z * z)
    x, y, z = x / norm, y / norm, z / norm
    return np.degrees(np.arctan2(y, x)), np.degrees(np.arcsin(np.clip(z, -1, 1)))
