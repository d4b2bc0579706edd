"""Hierarchical hexagonal cell index (H3 analog), exact-integer arithmetic.

The north-star pipeline keys its spatial shuffle by hex-cell prefix (Uber-H3
style). No H3 library ships in this environment and H3's icosahedral scheme
cannot be bit-verified here, so — like :mod:`geomesa_ray.curves.s2` — this
module implements the *published concept* (a hierarchical hexagonal
tessellation with k-ring neighborhoods and parent/child traversal) with a
scheme chosen so every cell assignment is **exact integer arithmetic**,
bit-for-bit mirrorable in SQL for oracle verification:

* Coordinates are micro-degrees: ``x = floor((lon+180)*1e5)``,
  ``y = floor((lat+90)*1e5)`` (the only float ops; both numpy and DuckDB
  evaluate the identical IEEE-754 expression).
* Hex centers at resolution ``r`` form the lattice
  ``{(a*hw, b*vv) : a + b even}`` with ``hw = 866*2^(MAX_RES-r)`` and
  ``vv = 1500*2^(MAX_RES-r)`` micro-units.  ``vv/hw = 1500/866 ≈ √3``, so
  the Voronoi cells of this lattice are (near-regular, pointy-top)
  hexagons.  A point's cell is its nearest center, found by rounding into
  each of the two rectangular sublattices (a,b both even / both odd) and
  comparing *integer* squared distances — no trig, no irrationals, no
  float boundaries.  Ties break to the even sublattice (``<=``), mirrored
  verbatim in SQL.
* Aperture-4 hierarchy: each coarser resolution doubles both pitches
  (areas ×4).  Like H3's aperture-7, hexagons never nest exactly;
  ``hex_parent`` assigns a child to the coarse cell containing its center
  (deterministic, exact).
* Cell ids pack ``(res << RES_SHIFT) | morton(a, b)`` using the Z2
  magic-mask interleave, so sorting ids at one resolution is a Z-order
  walk over hex columns/rows — the "cell prefix" locality used for
  shuffle keys.

Reference behavior analog: the S2/Z2 cell keying used by the reference's
index layer (geomesa-z3/.../Z2SFC.scala, and the S2 scheme in curves/s2.py);
k-ring expansion mirrors the reference kNN's expanding-window search
(geomesa-process/.../KNearestNeighborSearchProcess.scala loop semantics).
"""

from __future__ import annotations

import numpy as np

from .zorder import z2_combine, z2_encode

# Base (finest-resolution) half horizontal pitch / vertical row pitch in
# micro-degree units. 1500/866 ≈ √3 → near-regular pointy-top hexagons.
HW0 = 866
VV0 = 1500
MAX_RES = 12
RES_SHIFT = 50  # morton(a, b) needs ≤ 42 bits (a, b < 2^21)

_U = np.uint64
_I = np.int64


def res_pitches(res: int) -> tuple[int, int]:
    """(hw, vv) micro-unit pitches at ``res`` (aperture-4 scaling)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    s = 1 << (MAX_RES - res)
    return HW0 * s, VV0 * s


def hex_xy(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees → non-negative int64 micro-degree coords."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.floor((lon + 180.0) * 100000.0).astype(np.int64)
    y = np.floor((lat + 90.0) * 100000.0).astype(np.int64)
    return x, y


def hex_cell_ab(x, y, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Micro-unit coords → lattice coords (a, b) of the owning hex.

    Nearest-center-of-two-sublattices; all int64. ``a + b`` is always even.
    """
    hw, vv = res_pitches(res)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    hw_, vv_ = _I(hw), _I(vv)
    two_hw, two_vv = _I(2 * hw), _I(2 * vv)
    # even sublattice (a, b both even): independent per-axis rounding
    aa = _I(2) * ((x + hw_) // two_hw)
    ba = _I(2) * ((y + vv_) // two_vv)
    # odd sublattice (a, b both odd)
    ab = _I(2) * (x // two_hw) + _I(1)
    bb = _I(2) * (y // two_vv) + _I(1)
    dxa = x - aa * hw_
    dya = y - ba * vv_
    dxb = x - ab * hw_
    dyb = y - bb * vv_
    even_wins = dxa * dxa + dya * dya <= dxb * dxb + dyb * dyb
    a = np.where(even_wins, aa, ab)
    b = np.where(even_wins, ba, bb)
    return a, b


def hex_encode(lon, lat, res: int) -> np.ndarray:
    """lon/lat → packed int64 cell id at ``res``."""
    x, y = hex_xy(lon, lat)
    a, b = hex_cell_ab(x, y, res)
    return pack_cell(a, b, res)


def pack_cell(a, b, res: int) -> np.ndarray:
    """(a, b, res) → id = res<<RES_SHIFT | morton(a, b)."""
    m = z2_encode(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64))
    return (np.asarray(m, dtype=np.int64) | _I(res << RES_SHIFT)).astype(np.int64)


def hex_decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """id → (res, a, b) int64 arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> _I(RES_SHIFT)
    m = cell & _I((1 << RES_SHIFT) - 1)
    mu = m.astype(np.uint64)
    a = z2_combine(mu)
    b = z2_combine(mu >> _U(1))
    return res, np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)


def hex_center_units(cell) -> tuple[np.ndarray, np.ndarray]:
    """id → exact integer micro-unit center coords."""
    res, a, b = hex_decode(cell)
    s = np.left_shift(np.int64(1), _I(MAX_RES) - res)
    return a * (_I(HW0) * s), b * (_I(VV0) * s)


def hex_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """id → (lon, lat) degrees of the hex center."""
    cx, cy = hex_center_units(cell)
    return cx * 1e-5 - 180.0, cy * 1e-5 - 90.0


def hex_parent(cell, parent_res: int) -> np.ndarray:
    """Coarser cell containing this cell's center (aperture-4 traversal)."""
    res, _, _ = hex_decode(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be coarser (<=) than the cell's res")
    cx, cy = hex_center_units(cell)
    a, b = hex_cell_ab(cx, cy, parent_res)
    return pack_cell(a, b, parent_res)


# ---------------------------------------------------------------------------
# Axial coordinates + rings (for kNN-style cell-ring expansion)
# ---------------------------------------------------------------------------


def ab_to_axial(a, b) -> tuple[np.ndarray, np.ndarray]:
    """Lattice (a, b) (a+b even) → axial hex coords (q, r)."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    return (a - b) >> _I(1), b.copy()


def axial_to_ab(q, r) -> tuple[np.ndarray, np.ndarray]:
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    return _I(2) * q + r, r.copy()


def hex_distance_axial(q1, r1, q2, r2) -> np.ndarray:
    """Standard axial hex distance (broadcasts)."""
    dq = np.asarray(q1, dtype=np.int64) - np.asarray(q2, dtype=np.int64)
    dr = np.asarray(r1, dtype=np.int64) - np.asarray(r2, dtype=np.int64)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) >> _I(1)


def hex_distance(cell1, cell2) -> np.ndarray:
    """Hex (ring) distance between same-resolution cells."""
    r1, a1, b1 = hex_decode(cell1)
    r2, a2, b2 = hex_decode(cell2)
    if np.any(r1 != r2):
        raise ValueError("hex_distance requires same-resolution cells")
    q1, rr1 = ab_to_axial(a1, b1)
    q2, rr2 = ab_to_axial(a2, b2)
    return hex_distance_axial(q1, rr1, q2, rr2)


def ring_offsets(k: int) -> tuple[np.ndarray, np.ndarray]:
    """Axial offsets (dq, dr) of all cells with hex distance <= k
    (the filled k-ring / "disk": 1 + 3k(k+1) cells)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    dqs, drs = [], []
    for dq in range(-k, k + 1):
        lo, hi = max(-k, -dq - k), min(k, -dq + k)
        for dr in range(lo, hi + 1):
            dqs.append(dq)
            drs.append(dr)
    return np.asarray(dqs, dtype=np.int64), np.asarray(drs, dtype=np.int64)


def k_ring(cell, k: int) -> np.ndarray:
    """All cell ids within hex distance ``k`` of each input cell.

    Vectorized: output shape ``(n_cells, 1 + 3k(k+1))``; scalar input
    returns a flat array. Ring offsets that fall past the lattice edge
    (a or b negative — possible only for cells hugging lon=-180 /
    lat=-90) are replaced by the CENTER cell id, never an out-of-lattice
    coordinate: every returned id is a valid assignable cell, and callers
    joining on ids see the duplicate center entries as harmless repeats.
    """
    cell_arr = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res, a, b = hex_decode(cell_arr)
    r0 = int(res.flat[0]) if res.size else 0
    if res.size and np.any(res != r0):
        raise ValueError("k_ring requires a single resolution per call")
    q, r = ab_to_axial(a, b)
    dq, dr = ring_offsets(k)
    qq = q[:, None] + dq[None, :]
    rr = r[:, None] + dr[None, :]
    na, nb = axial_to_ab(qq, rr)
    invalid = (na < 0) | (nb < 0)
    if invalid.any():
        na = np.where(invalid, a[:, None], na)
        nb = np.where(invalid, b[:, None], nb)
    out = pack_cell(na, nb, r0)
    return out if np.ndim(cell) else out[0]


# ---------------------------------------------------------------------------
# Covering (loose bbox → candidate cells, for scan pruning / PIP keying)
# ---------------------------------------------------------------------------


def cover_bbox(xmin: float, ymin: float, xmax: float, ymax: float,
               res: int) -> np.ndarray:
    """Loose hex covering of a lon/lat bbox: every cell whose hexagon can
    intersect the box (computed by expanding the box by the hex
    circumradius and enumerating lattice centers inside). Exact-integer;
    suitable as a pruning pre-filter with an exact residual test after."""
    hw, vv = res_pitches(res)
    (x0, y0) = hex_xy(xmin, ymin)
    (x1, y1) = hex_xy(xmax, ymax)
    # circumradius of the (near-regular) hex < vv (= 1.5 * side + slack)
    pad_x, pad_y = hw, vv
    a_lo = int((x0 - pad_x) // hw) - 1
    a_hi = int((x1 + pad_x) // hw) + 1
    b_lo = int((y0 - pad_y) // vv) - 1
    b_hi = int((y1 + pad_y) // vv) + 1
    a = np.arange(max(a_lo, 0), a_hi + 1, dtype=np.int64)
    b = np.arange(max(b_lo, 0), b_hi + 1, dtype=np.int64)
    aa, bb = np.meshgrid(a, b, indexing="ij")
    keep = ((aa + bb) & 1) == 0
    return pack_cell(aa[keep], bb[keep], res)


__all__ = [
    "HW0", "VV0", "MAX_RES", "RES_SHIFT",
    "res_pitches", "hex_xy", "hex_cell_ab", "hex_encode", "pack_cell",
    "hex_decode", "hex_center", "hex_center_units", "hex_parent",
    "ab_to_axial", "axial_to_ab", "hex_distance", "hex_distance_axial",
    "ring_offsets", "k_ring", "cover_bbox", "hex_boundary_wkbs",
]


def hex_boundary_wkbs(cell):
    """Vectorized WKB Polygon boundaries of hex cells (the raster→vector
    surface for hex densities: same record-array batch construction as
    geometry/wkb.rect_wkbs). Vertices are the exact Voronoi-cell corners
    of the lattice: (±hw, ±(vv²−hw²)/2vv), (0, ±(hw²+vv²)/2vv) around the
    center, CCW, closed 7-point shell."""
    import pyarrow as pa

    cell_arr = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res, a, b = hex_decode(cell_arr)
    r0 = int(res.flat[0]) if res.size else 0
    if res.size and np.any(res != r0):
        raise ValueError("hex_boundary_wkbs requires a single resolution")
    hw, vv = res_pitches(r0)
    cx, cy = hex_center_units(cell_arr)
    cx = cx.astype(np.float64) * 1e-5 - 180.0
    cy = cy.astype(np.float64) * 1e-5 - 90.0
    hw_d, vv_d = hw * 1e-5, vv * 1e-5
    vy_side = (vv_d * vv_d - hw_d * hw_d) / (2.0 * vv_d)
    vy_top = (hw_d * hw_d + vv_d * vv_d) / (2.0 * vv_d)
    n = len(cell_arr)
    fields = [("bo", "u1"), ("typ", "<u4"), ("nring", "<u4"), ("npt", "<u4")]
    for i in range(7):
        fields += [(f"x{i}", "<f8"), (f"y{i}", "<f8")]
    rec = np.zeros(n, dtype=fields)
    rec["bo"] = 1
    rec["typ"] = 3  # WKB Polygon
    rec["nring"] = 1
    rec["npt"] = 7
    verts = [(hw_d, -vy_side), (hw_d, vy_side), (0.0, vy_top),
             (-hw_d, vy_side), (-hw_d, -vy_side), (0.0, -vy_top),
             (hw_d, -vy_side)]
    for i, (dx, dy) in enumerate(verts):
        rec[f"x{i}"] = cx + dx
        rec[f"y{i}"] = cy + dy
    width = rec.dtype.itemsize
    if (n + 1) * width > 2**31 - 1:
        # pa.binary() offsets are int32; np.arange would silently wrap.
        raise ValueError(
            f"{n} boundaries exceed the 2 GiB Arrow binary offset range; "
            "chunk the cell batch (map_batches already bounds this in "
            "pipelines — only a driver-side call over ~17M+ cells hits it)"
        )
    data = rec.tobytes()
    offsets = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
    )
