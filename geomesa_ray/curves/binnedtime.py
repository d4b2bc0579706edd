"""Epoch-binned time: (bin, offset) pairs per day/week/month/year period.

Semantics match the reference's binned time
(geomesa-z3/.../curve/BinnedTime.scala:46-291):

    Day   : bin = days since epoch,   offset = milliseconds into the day
    Week  : bin = weeks since epoch,  offset = seconds into the week
    Month : bin = calendar months since epoch, offset = seconds into the month
    Year  : bin = calendar years since epoch,  offset = minutes into the year

max_offset (exclusive curve max; BinnedTime.scala:150-160):
    Day   = 86_400_000 ms       Week = 604_800 s
    Month = 86_400 * 31 s       Year = 1440 * 366 + 10 minutes

Month/year use true calendar arithmetic via numpy datetime64 'M'/'Y' casts,
which equal java.time ChronoUnit.MONTHS/YEARS.between(epoch, t) for t >= epoch.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import numpy as np

_DAY_MS = 86_400_000
_WEEK_S = 604_800


class TimePeriod(str, enum.Enum):
    DAY = "day"
    WEEK = "week"
    MONTH = "month"
    YEAR = "year"


@dataclass(frozen=True)
class BinnedTime:
    bin: int
    offset: int


def max_offset(period: TimePeriod) -> int:
    """Exclusive max offset value for a period (curve time-dimension max)."""
    p = TimePeriod(period)
    if p is TimePeriod.DAY:
        return _DAY_MS
    if p is TimePeriod.WEEK:
        return _WEEK_S
    if p is TimePeriod.MONTH:
        return 86_400 * 31
    return 1440 * 366 + 10  # year: minutes, with leap-second fudge


def bins_and_offsets(millis, period: TimePeriod):
    """Vectorized (bin, offset) for epoch-millis int64 arrays.

    Negative (pre-1970) times are not indexable; like the reference we
    expect the caller to have validated/clamped (lenient mode clamps to 0).
    """
    m = np.asarray(millis, dtype=np.int64)
    p = TimePeriod(period)
    if p is TimePeriod.DAY:
        bins = m // _DAY_MS
        offs = m - bins * _DAY_MS
    elif p is TimePeriod.WEEK:
        secs = m // 1000
        bins = secs // _WEEK_S
        offs = secs - bins * _WEEK_S
    elif p is TimePeriod.MONTH:
        dt = m.astype("datetime64[ms]")
        months = dt.astype("datetime64[M]")
        bins = months.astype(np.int64)
        offs = (m // 1000) - (months.astype("datetime64[s]").astype(np.int64))
    else:  # YEAR
        dt = m.astype("datetime64[ms]")
        years = dt.astype("datetime64[Y]")
        bins = years.astype(np.int64)
        offs = ((m // 1000) - years.astype("datetime64[s]").astype(np.int64)) // 60
    return bins.astype(np.int16), offs.astype(np.int64)


def time_to_binned_time(period: TimePeriod):
    """Scalar convenience mirroring the reference's factory signature."""
    p = TimePeriod(period)

    def f(millis: int) -> BinnedTime:
        if millis < 0:
            raise ValueError(f"date exceeds minimum indexable value (epoch): {millis}")
        b, o = bins_and_offsets(np.array([millis], dtype=np.int64), p)
        if b[0] > np.iinfo(np.int16).max:
            raise ValueError(f"date exceeds maximum indexable value: {millis}")
        return BinnedTime(int(b[0]), int(o[0]))

    return f


def binned_time_to_millis(bin_: int, offset: int, period: TimePeriod) -> int:
    """Inverse: (bin, offset) -> epoch millis (bin-start plus offset)."""
    p = TimePeriod(period)
    if p is TimePeriod.DAY:
        return bin_ * _DAY_MS + offset
    if p is TimePeriod.WEEK:
        return (bin_ * _WEEK_S + offset) * 1000
    if p is TimePeriod.MONTH:
        start = np.datetime64(bin_, "M").astype("datetime64[s]").astype(np.int64)
        return int((start + offset) * 1000)
    start = np.datetime64(bin_, "Y").astype("datetime64[s]").astype(np.int64)
    return int((start + offset * 60) * 1000)


def bounds_to_indexable_millis(lo, hi, period: TimePeriod):
    """Clamp an optional [lo, hi] millis interval to the indexable domain.

    Mirrors BinnedTime.boundsToIndexableDates (BinnedTime.scala:180-208):
    min is the epoch; max is (maxDate - 1ms) where maxDate is the first
    instant of bin Short.MaxValue + 1.
    """
    p = TimePeriod(period)
    max_bin = np.iinfo(np.int16).max
    if p is TimePeriod.DAY:
        max_ms = (max_bin + 1) * _DAY_MS - 1
    elif p is TimePeriod.WEEK:
        max_ms = (max_bin + 1) * _WEEK_S * 1000 - 1
    elif p is TimePeriod.MONTH:
        max_ms = int(np.datetime64(max_bin + 1, "M").astype("datetime64[ms]").astype(np.int64)) - 1
    else:
        max_ms = int(np.datetime64(max_bin + 1, "Y").astype("datetime64[ms]").astype(np.int64)) - 1
    lo = 0 if lo is None else min(max(int(lo), 0), max_ms)
    hi = max_ms if hi is None else min(max(int(hi), 0), max_ms)
    return lo, hi
