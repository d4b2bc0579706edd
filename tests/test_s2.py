"""S2 cell ids (curves/s2.py): structural invariants of the published
scheme — hierarchy, round-trips, Hilbert adjacency, face anchors.
(No S2 library exists in this environment for bit-parity fixtures; these
invariants pin the scheme's required properties instead.)"""

import numpy as np
import pytest

from geomesa_ray.curves.s2 import (
    MAX_LEVEL,
    _ij_to_pos,
    _pos_to_ij,
    cell_id_to_lonlat,
    cell_level,
    contains,
    lonlat_to_cell_id,
    parent,
)


def _rand_lonlat(n, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-179.9, 179.9, n), rng.uniform(-89.9, 89.9, n)


def test_leaf_roundtrip_reencodes_to_same_leaf():
    lon, lat = _rand_lonlat(5000)
    ids = lonlat_to_cell_id(lon, lat)
    clon, clat = cell_id_to_lonlat(ids)
    ids2 = lonlat_to_cell_id(clon, clat)
    assert (ids == ids2).all()
    # centers are close to the original points (leaf cells ≈ cm-scale)
    assert np.abs(clon - lon).max() < 1e-4
    assert np.abs(clat - lat).max() < 1e-4


def test_levels_and_parents():
    lon, lat = _rand_lonlat(2000, seed=2)
    leaf = lonlat_to_cell_id(lon, lat)
    assert (cell_level(leaf) == MAX_LEVEL).all()
    for level in (0, 5, 12, 29):
        p = parent(leaf, level)
        assert (cell_level(p) == level).all()
        assert contains(p, leaf).all()
        # direct encoding at that level equals the parent walk
        direct = lonlat_to_cell_id(lon, lat, level=level)
        assert (p == direct).all()
        # parent center re-encoded at the same level is the same cell
        clon, clat = cell_id_to_lonlat(p)
        assert (lonlat_to_cell_id(clon, clat, level=level) == p).all()


def test_hierarchy_is_nested():
    lon, lat = _rand_lonlat(1000, seed=3)
    leaf = lonlat_to_cell_id(lon, lat)
    for l1, l2 in ((3, 10), (10, 20)):
        assert contains(parent(leaf, l1), parent(leaf, l2)).all()
        # no containment between cells of DIFFERENT points (overwhelmingly)
    a = parent(leaf[:500], 20)
    b = parent(leaf[500:], 20)
    assert contains(a, b).mean() < 0.01


def test_hilbert_curve_is_continuous():
    """Consecutive curve positions map to 4-adjacent (i, j) cells at every
    sampled prefix — the defining Hilbert locality property."""
    face = np.zeros(1, dtype=np.int64)
    # exhaustive at a coarse prefix: positions 0..4^5-1 at level 5 spacing
    n = 4 ** 5
    sh = 2 * (MAX_LEVEL - 5)
    pos = (np.arange(n, dtype=np.uint64) << np.uint64(sh))
    ii = np.empty(n, dtype=np.int64)
    jj = np.empty(n, dtype=np.int64)
    for k in range(n):
        i, j = _pos_to_ij(face, pos[k : k + 1])
        ii[k], jj[k] = i[0] >> (sh // 2), j[0] >> (sh // 2)
    d = np.abs(np.diff(ii)) + np.abs(np.diff(jj))
    assert (d == 1).all()  # Manhattan distance 1 between consecutive cells


def test_ij_pos_inverse():
    rng = np.random.default_rng(4)
    face = rng.integers(0, 6, 500)
    i = rng.integers(0, 1 << MAX_LEVEL, 500)
    j = rng.integers(0, 1 << MAX_LEVEL, 500)
    pos = _ij_to_pos(face, i, j)
    i2, j2 = _pos_to_ij(face, pos)
    assert (i == i2).all() and (j == j2).all()


def test_face_centers():
    # cube-face centers encode to the face's level-0 cell
    centers = [(0.0, 0.0), (90.0, 0.0), (0.0, 90.0), (180.0, 0.0), (-90.0, 0.0), (0.0, -90.0)]
    for f, (lon, lat) in enumerate(centers):
        cid = lonlat_to_cell_id(np.array([lon]), np.array([lat]), level=0)[0]
        assert int(cid) >> 61 == f
        assert cell_level(np.array([cid]))[0] == 0


def test_poles_and_antimeridian():
    lon = np.array([0.0, 180.0, -180.0, 45.0])
    lat = np.array([90.0, 10.0, 10.0, -90.0])
    ids = lonlat_to_cell_id(lon, lat)
    # ±180 sit one float ulp apart across a cell boundary (sin(±π) = ±ε);
    # both must round-trip to real leaves whose centers sit on the meridian
    c1 = cell_id_to_lonlat(ids[1:2])
    c2 = cell_id_to_lonlat(ids[2:3])
    assert abs(abs(c1[0][0]) - 180.0) < 1e-4 and abs(abs(c2[0][0]) - 180.0) < 1e-4
    clon, clat = cell_id_to_lonlat(ids)
    assert abs(clat[0] - 90.0) < 1e-4 and abs(clat[3] + 90.0) < 1e-4
