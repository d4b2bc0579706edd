"""XZ2/XZ3 cover-property fixtures (FIXTURES.md §4, XZ2SFCTest.scala:22-62
pattern): every containing/overlapping window's ranges cover the indexed
code; disjoint windows never do."""

import numpy as np
import pytest

from geomesa_ray.curves.binnedtime import TimePeriod, max_offset
from geomesa_ray.curves.xz import XZ2SFC, XZ3SFC

BOX = (10.0, 10.0, 12.0, 12.0)
POINT = (11.0, 11.0, 11.0, 11.0)

CONTAINING = [
    (9.0, 9.0, 13.0, 13.0),
    (-180.0, -90.0, 180.0, 90.0),
    (0.0, 0.0, 180.0, 90.0),
    (0.0, 0.0, 20.0, 20.0),
]
OVERLAPPING = [
    (11.0, 11.0, 13.0, 13.0),
    (9.0, 9.0, 11.0, 11.0),
    (10.5, 10.5, 11.5, 11.5),
    (11.0, 11.0, 11.0, 11.0),
]
DISJOINT = [
    (-180.0, -90.0, 8.0, 8.0),
    (0.0, 0.0, 8.0, 8.0),
    (9.0, 9.0, 9.5, 9.5),
    (20.0, 20.0, 180.0, 90.0),
]


def covered(code: int, ranges) -> bool:
    return any(r.lower <= code <= r.upper for r in ranges)


@pytest.fixture(scope="module")
def sfc():
    return XZ2SFC(12)


@pytest.mark.parametrize("target", [BOX, POINT])
def test_xz2_cover_properties(sfc, target):
    code = int(sfc.index(*[np.array([v]) for v in target])[0])
    for w in CONTAINING + OVERLAPPING:
        assert covered(code, sfc.ranges([w])), w
    for w in DISJOINT:
        assert not covered(code, sfc.ranges([w])), w


def test_xz2_vectorized_matches_scalar(sfc):
    rng = np.random.default_rng(4)
    xmin = rng.uniform(-170, 160, 200)
    ymin = rng.uniform(-80, 70, 200)
    xmax = xmin + rng.uniform(0, 5, 200)
    ymax = ymin + rng.uniform(0, 5, 200)
    vec = sfc.index(xmin, ymin, xmax, ymax)
    for i in range(0, 200, 17):
        one = sfc.index(
            np.array([xmin[i]]), np.array([ymin[i]]),
            np.array([xmax[i]]), np.array([ymax[i]]),
        )[0]
        assert one == vec[i]


def test_xz2_points_get_full_resolution(sfc):
    """Zero-extent boxes index at g (maxDim=0 → length=g)."""
    code_pt = int(sfc.index(*[np.array([v]) for v in POINT])[0])
    # a world-size box indexes at a very coarse level → much smaller code
    code_world = int(
        sfc.index(
            np.array([-180.0]), np.array([-90.0]), np.array([180.0]), np.array([90.0])
        )[0]
    )
    assert code_world < code_pt


def test_xz2_lenient_clamps(sfc):
    with pytest.raises(ValueError):
        sfc.index(np.array([-200.0]), np.array([0.0]), np.array([0.0]), np.array([1.0]))
    ok = sfc.index(
        np.array([-200.0]), np.array([0.0]), np.array([0.0]), np.array([1.0]),
        lenient=True,
    )
    assert len(ok) == 1


def test_xz3_cover_properties():
    sfc = XZ3SFC(8, TimePeriod.WEEK)
    mo = max_offset(TimePeriod.WEEK)
    t_lo, t_hi = 0.3 * mo, 0.31 * mo
    code = int(
        sfc.index(
            np.array([10.0]), np.array([10.0]), np.array([t_lo]),
            np.array([12.0]), np.array([12.0]), np.array([t_hi]),
        )[0]
    )
    # max_ranges=None → exact BFS (budgeted planning may over-cover, which
    # is allowed for pruning but would fail the exact disjoint assertions)
    for w in CONTAINING + OVERLAPPING:
        win = (w[0], w[1], 0.25 * mo, w[2], w[3], 0.35 * mo)
        assert covered(code, sfc.ranges([win], max_ranges=None)), w
    for w in DISJOINT:
        win = (w[0], w[1], 0.25 * mo, w[2], w[3], 0.35 * mo)
        assert not covered(code, sfc.ranges([win], max_ranges=None)), w
    # time-disjoint windows never cover either
    for w in CONTAINING:
        win = (w[0], w[1], 0.8 * mo, w[2], w[3], 0.9 * mo)
        assert not covered(code, sfc.ranges([win], max_ranges=None)), w


def test_ranges_empty_query_list():
    """ranges([]) returns [] instead of IndexError (round-3 review)."""
    from geomesa_ray.curves.xz import XZ2SFC, XZ3SFC

    assert XZ2SFC(12).ranges([]) == []
    assert XZ3SFC(12).ranges([]) == []
