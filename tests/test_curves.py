"""Curve kernels: pinned values and properties from the reference test suite.

Expected values come from geomesa-z3 tests:
  zorder/sfcurve/Z2Test.scala (interleave, Tropf/wikipedia zdivide, zranges)
  curve/Z2Test.scala (split/combine, index values, range coverage)
  curve/Z3Test.scala, zorder/sfcurve/Z3Test.scala
  curve/BinnedTimeTest.scala
"""

import numpy as np
import pytest

from geomesa_ray.curves import (
    Z2SFC,
    Z3SFC,
    TimePeriod,
    z2_decode,
    z2_encode,
    z3_decode,
    z3_encode,
)
from geomesa_ray.curves.binnedtime import (
    BinnedTime,
    binned_time_to_millis,
    bins_and_offsets,
    max_offset,
    time_to_binned_time,
)
from geomesa_ray.curves.zranges import Z2Planner, Z3Planner, times_by_bin, zranges_2d, zranges_3d

MAX_INT = (1 << 31) - 1


class TestZ2Interleave:
    def test_interlaces_bits(self):
        # Z2Test.scala "interlaces bits"
        assert int(z2_encode(1, 0)) == 1
        assert int(z2_encode(2, 0)) == 4
        assert int(z2_encode(3, 0)) == 5
        assert int(z2_encode(0, 1)) == 2
        assert int(z2_encode(0, 2)) == 8
        assert int(z2_encode(0, 3)) == 10

    def test_deinterlaces_bits(self):
        for x, y in [(23, 13), (MAX_INT, 0), (0, MAX_INT), (MAX_INT, MAX_INT)]:
            zx, zy = z2_decode(z2_encode(x, y))
            assert (int(zx), int(zy)) == (x, y)

    def test_vectorized_round_trip(self):
        rng = np.random.default_rng(574)
        x = rng.integers(0, MAX_INT, 10000, dtype=np.int64)
        y = rng.integers(0, MAX_INT, 10000, dtype=np.int64)
        z = z2_encode(x, y)
        dx, dy = z2_decode(z)
        np.testing.assert_array_equal(dx, x)
        np.testing.assert_array_equal(dy, y)

    def test_tropf_herzog_example(self):
        # Z2Test.scala "replaces example in Tropf, Herzog paper"
        assert int(z2_encode(5, 3)) == 27
        assert int(z2_encode(10, 5)) == 102
        assert int(z2_encode(4, 7)) == 58
        litmax, bigmin = Z2Planner().zdivide(58, 27, 102)
        assert (litmax, bigmin) == (55, 74)

    def test_wikipedia_example(self):
        assert int(z2_encode(2, 2)) == 12
        assert int(z2_encode(3, 6)) == 45
        assert int(z2_encode(5, 1)) == 19
        litmax, bigmin = Z2Planner().zdivide(19, 12, 45)
        assert (litmax, bigmin) == (15, 36)
        x, y = z2_decode(bigmin)
        assert (int(x), int(y)) == (2, 4)

    def test_litmax_decode(self):
        litmax, _ = Z2Planner().zdivide(int(z2_encode(1, 7)), 12, 45)
        x, y = z2_decode(litmax)
        assert (int(x), int(y)) == (3, 5)


class TestZ3Interleave:
    def test_round_trip(self):
        rng = np.random.default_rng(42)
        m = (1 << 21) - 1
        x = rng.integers(0, m, 10000, dtype=np.int64)
        y = rng.integers(0, m, 10000, dtype=np.int64)
        t = rng.integers(0, m, 10000, dtype=np.int64)
        z = z3_encode(x, y, t)
        dx, dy, dt = z3_decode(z)
        np.testing.assert_array_equal(dx, x)
        np.testing.assert_array_equal(dy, y)
        np.testing.assert_array_equal(dt, t)

    def test_max_values(self):
        m = (1 << 21) - 1
        dx, dy, dt = z3_decode(z3_encode(m, m, m))
        assert (int(dx), int(dy), int(dt)) == (m, m, m)
        assert int(z3_encode(m, m, m)) == (1 << 63) - 1


class TestZ2SFC:
    sfc = Z2SFC()

    def test_pinned_index_values(self):
        # constants embedded in zorder/sfcurve/Z2Test.scala "support maxRanges"
        assert int(self.sfc.index(-180, -90)) == 0
        assert int(self.sfc.index(180, 90)) == 4611686018427387903
        assert int(self.sfc.index(35, 65)) == 4105065703422263800
        assert int(self.sfc.index(-90, -45)) == 864691128455135232
        assert int(self.sfc.index(90, 45)) == 4323455642275676160
        assert int(self.sfc.index(45, 75)) == 4261005727442805282
        assert int(self.sfc.index(35, 55)) == 4069591195588206970
        assert int(self.sfc.index(37, 68)) == 4202182393016524625
        assert int(self.sfc.index(40, 70)) == 4203729178335734358
        assert int(self.sfc.index(39.999, 60.999)) == 4097762467352558080
        assert int(self.sfc.index(40.001, 61.001)) == 4097762468106131815
        assert int(self.sfc.index(51.0, 51.0)) == 4117455696967246884

    def test_out_of_bounds_raises(self):
        for x, y in [(-180.1, 0), (0, -90.1), (180.1, 0), (0, 90.1), (-181, -91), (181, 91)]:
            with pytest.raises(ValueError):
                self.sfc.index(x, y)

    def test_lenient_clamps(self):
        assert int(self.sfc.index(-180.1, 0, lenient=True)) == int(self.sfc.index(-180, 0))
        assert int(self.sfc.index(181, 91, lenient=True)) == int(self.sfc.index(180, 90))

    def test_invert_round_trip(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-90, 90, 1000)
        z = self.sfc.index(lon, lat)
        ix, iy = self.sfc.invert(z)
        # bin-center error bounded by half a bin
        assert np.max(np.abs(ix - lon)) <= 360.0 / (1 << 31)
        assert np.max(np.abs(iy - lat)) <= 180.0 / (1 << 31)


class TestZranges:
    def test_small_grid_ranges(self):
        # curve/Z2Test.scala "calculate ranges": box (2,2)-(3,6) -> 3 covered ranges
        planner = Z2Planner()
        ranges = planner.zranges([(int(z2_encode(2, 2)), int(z2_encode(3, 6)))])
        got = {(r.lower, r.upper) for r in ranges}
        assert got == {
            (int(z2_encode(2, 2)), int(z2_encode(3, 3))),
            (int(z2_encode(2, 4)), int(z2_encode(3, 5))),
            (int(z2_encode(2, 6)), int(z2_encode(3, 6))),
        }
        assert all(r.contained for r in ranges)

    @pytest.mark.parametrize(
        "box",
        [
            (-180, -90, 180, 90),
            (-90, -45, 90, 45),
            (35, 65, 45, 75),
            (35, 55, 45, 75),
            (35, 65, 37, 68),
            (35, 65, 40, 70),
            (39.999, 60.999, 40.001, 61.001),
            (51.0, 51.0, 51.1, 51.1),
            (51.0, 51.0, 51.001, 51.001),
            (51.0, 51.0, 51.0000001, 51.0000001),
        ],
    )
    def test_nonempty_bounded_ranges(self, box):
        ranges = zranges_2d(Z2SFC(), [box], max_ranges=1000)
        assert 0 < len(ranges) <= 1000

    def test_cover_property(self):
        # every point inside the box must fall in some range; points outside
        # contained ranges must decode outside the box
        sfc = Z2SFC()
        box = (10.0, 10.0, 12.0, 12.0)
        ranges = zranges_2d(sfc, [box], max_ranges=200)
        rng = np.random.default_rng(3)
        lon = rng.uniform(10, 12, 500)
        lat = rng.uniform(10, 12, 500)
        zs = np.sort(np.asarray(sfc.index(lon, lat)))
        lowers = np.array([r.lower for r in ranges])
        uppers = np.array([r.upper for r in ranges])
        idx = np.searchsorted(uppers, zs)
        assert np.all(idx < len(ranges))
        assert np.all(zs >= lowers[idx])
        # disjoint window must not cover an indexed point
        far = int(sfc.index(50.0, 50.0))
        pos = np.searchsorted(uppers, far)
        assert pos == len(ranges) or far < lowers[pos]


class TestBinnedTime:
    def test_week_binning(self):
        # 1970-01-08T00:00:00Z = 7 days -> week bin 1, offset 0
        bt = time_to_binned_time(TimePeriod.WEEK)(7 * 86400 * 1000)
        assert bt == BinnedTime(1, 0)
        # one second later
        bt = time_to_binned_time(TimePeriod.WEEK)(7 * 86400 * 1000 + 1000)
        assert bt == BinnedTime(1, 1)

    def test_day_binning(self):
        bt = time_to_binned_time(TimePeriod.DAY)(86400000 + 123)
        assert bt == BinnedTime(1, 123)

    def test_month_binning_calendar(self):
        # 2020-03-01T00:00:00Z: (2020-1970)*12 + 2 = 602 months
        ms = int(np.datetime64("2020-03-01T00:00:00", "ms").astype(np.int64))
        bt = time_to_binned_time(TimePeriod.MONTH)(ms)
        assert bt == BinnedTime(602, 0)
        # leap february: 2020-02-29T12:00:00 is in month bin 601
        ms = int(np.datetime64("2020-02-29T12:00:00", "ms").astype(np.int64))
        bt = time_to_binned_time(TimePeriod.MONTH)(ms)
        assert bt.bin == 601
        assert bt.offset == (28 * 86400 + 12 * 3600)

    def test_year_binning(self):
        ms = int(np.datetime64("2020-12-31T23:59:00", "ms").astype(np.int64))
        bt = time_to_binned_time(TimePeriod.YEAR)(ms)
        assert bt.bin == 50
        # minutes into a leap year: 366 days minus 1 minute
        assert bt.offset == 366 * 1440 - 1

    def test_round_trip_all_periods(self):
        for period in TimePeriod:
            for ms in [0, 123456789, 1606780800000, 1609459199999]:
                bt = time_to_binned_time(period)(ms)
                back = binned_time_to_millis(bt.bin, bt.offset, period)
                # offsets truncate sub-unit precision (s for week/month, min for year)
                unit = {"day": 1, "week": 1000, "month": 1000, "year": 60000}[period.value]
                assert back == (ms // unit) * unit

    def test_max_offsets(self):
        assert max_offset(TimePeriod.DAY) == 86400000
        assert max_offset(TimePeriod.WEEK) == 604800
        assert max_offset(TimePeriod.MONTH) == 86400 * 31
        assert max_offset(TimePeriod.YEAR) == 1440 * 366 + 10

    def test_vectorized_matches_scalar(self):
        ms = np.array([0, 1000, 604800000, 1606780800000, 1609459199999], dtype=np.int64)
        for period in TimePeriod:
            bins, offs = bins_and_offsets(ms, period)
            f = time_to_binned_time(period)
            for i, m in enumerate(ms):
                bt = f(int(m))
                assert (int(bins[i]), int(offs[i])) == (bt.bin, bt.offset)


class TestZ3SFC:
    def test_times_by_bin_fan_out(self):
        sfc = Z3SFC(TimePeriod.WEEK)
        # 2020-12-01 .. 2020-12-31 spans several weekly bins
        lo = int(np.datetime64("2020-12-01T00:00:00", "ms").astype(np.int64))
        hi = int(np.datetime64("2020-12-31T23:59:59", "ms").astype(np.int64))
        tb = times_by_bin(sfc, lo, hi)
        bins = sorted(tb)
        assert len(bins) >= 4
        assert bins == list(range(bins[0], bins[-1] + 1))
        # middle bins span the whole period
        for b in bins[1:-1]:
            assert tb[b] == [(0, max_offset(TimePeriod.WEEK))]

    def test_scan_covers_rows(self):
        sfc = Z3SFC(TimePeriod.WEEK)
        rng = np.random.default_rng(11)
        lon = rng.uniform(0, 10, 300)
        lat = rng.uniform(40, 50, 300)
        base = int(np.datetime64("2020-12-01", "ms").astype(np.int64))
        ms = base + rng.integers(0, 30 * 86400000, 300)
        bins, z3 = sfc.index_from_millis(lon, lat, ms)
        # query window containing everything
        tb = times_by_bin(sfc, base, base + 30 * 86400000)
        covered = np.zeros(len(lon), dtype=bool)
        for b, tranges in tb.items():
            sel = bins == b
            if not np.any(sel):
                continue
            ranges = zranges_3d(sfc, [(0, 40, 10, 50)], tranges, max_ranges=500)
            lowers = np.array([r.lower for r in ranges])
            uppers = np.array([r.upper for r in ranges])
            zsel = z3[sel]
            idx = np.searchsorted(uppers, zsel)
            ok = (idx < len(ranges)) & (zsel >= lowers[np.minimum(idx, len(ranges) - 1)])
            covered[np.flatnonzero(sel)[ok]] = True
        assert covered.all()

    def test_null_time_indexes_at_zero(self):
        sfc = Z3SFC(TimePeriod.WEEK)
        bins, z3 = sfc.index_from_millis(np.array([0.0]), np.array([0.0]), np.array([0]))
        assert int(bins[0]) == 0


class TestZ3RangeVectors:
    """Literal 3D cut/contains/overlaps vectors from the reference's
    Z3RangeTest.scala:18-59 (bit-parity pins for the Z3 planner)."""

    def test_z3_cut_out_of_range(self):
        from geomesa_ray.curves.zorder import z3_encode
        from geomesa_ray.curves.zranges import Z3Planner

        zmin = int(z3_encode(2, 2, 0))
        zmax = int(z3_encode(3, 6, 0))
        zcut = int(z3_encode(5, 1, 0))
        litmax, bigmin = Z3Planner().zdivide(zcut, zmin, zmax)
        # cut(range, z) = [(zmin, litmax), (bigmin, zmax)]
        assert litmax == int(z3_encode(3, 3, 0))
        assert bigmin == int(z3_encode(2, 4, 0))

    def test_z3_contains_overlaps_vectors(self):
        from geomesa_ray.curves.zorder import z3_encode
        from geomesa_ray.curves.zranges import Z3Planner

        p = Z3Planner()
        rng = (int(z3_encode(2, 2, 0)), int(z3_encode(3, 6, 0)))

        def r(x0, y0, x1, y1):
            return (int(z3_encode(x0, y0, 0)), int(z3_encode(x1, y1, 0)))

        assert p._overlaps(rng, r(3, 0, 3, 2))
        assert p._overlaps(rng, r(0, 0, 2, 2))
        assert p._overlaps(rng, r(1, 6, 4, 6))
        assert not p._overlaps(rng, r(2, 0, 3, 1))
        assert not p._overlaps(rng, r(4, 6, 6, 7))

        assert p._contains(rng, r(2, 2, 3, 3))
        assert p._contains(rng, r(3, 5, 3, 6))
        assert not p._contains(rng, r(2, 2, 4, 3))
        assert not p._contains(rng, r(2, 1, 3, 3))
        assert not p._contains(rng, r(2, 1, 3, 7))
