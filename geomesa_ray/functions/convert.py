"""Converter expression-language analogs (vectorized, Arrow-native).

Reference: geomesa-convert-common/.../transforms/StringFunctionFactory.scala
:23-189 (strip/replace/regexReplace/capitalize/lowercase/uppercase/concat/
mkstring/emptyToNull/length/substr/printf/trim), DateFunctionFactory.scala:
31-198, MathFunctionFactory.scala:17-96, IdFunctionFactory.scala:30-102
(md5/murmur/uuid determinism), EncodingFunctionFactory.scala:20-28,
CastFunctionFactory.scala:17-96 (toInt/toLong/toFloat/toDouble with
default-on-failure), GeometryFunctionFactory.scala:30-103 (point /
geometry-from-WKT → WKB columns).

Each function maps an Arrow array → Arrow array via pyarrow.compute where a
kernel exists; deterministic ids come from the engine's stable hash.
"""

from __future__ import annotations

import hashlib
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geomesa_ray.stages.encode import hash_strings

# --- strings (StringFunctionFactory.scala) ---------------------------------

def lowercase(col):
    return pc.utf8_lower(col)


def uppercase(col):
    return pc.utf8_upper(col)


def capitalize(col):
    return pc.utf8_capitalize(col)


def trim(col):
    return pc.utf8_trim_whitespace(col)


def strip(col, chars: str):
    return pc.utf8_trim(col, chars)


def strip_prefix(col, prefix: str):
    starts = pc.starts_with(col, prefix)
    sliced = pc.utf8_slice_codeunits(col, len(prefix))
    return pc.if_else(starts, sliced, col)


def strip_suffix(col, suffix: str):
    # vectorized: replace the suffix occurrence at position len-|suffix|
    # (utf8_replace_slice is positional, so gate on ends_with)
    if not suffix:
        return col
    ends = pc.ends_with(col, suffix)
    stripped = pc.utf8_replace_slice(
        col, start=-len(suffix), stop=2**31 - 1, replacement=""
    )
    return pc.if_else(ends, stripped, col)


def remove(col, piece: str):
    return pc.replace_substring(col, piece, "")


def replace(col, old: str, new: str):
    return pc.replace_substring(col, old, new)


def regex_replace(col, pattern: str, new: str):
    return pc.replace_substring_regex(col, pattern, new)


def concat(*cols, sep: str = ""):
    return pc.binary_join_element_wise(*cols, sep)


def mkstring(list_col, sep: str = ","):
    return pc.binary_join(list_col, sep)


def empty_to_null(col):
    return pc.if_else(pc.equal(col, ""), pa.nulls(len(col), pa.string()), col)


def length(col):
    return pc.utf8_length(col)


def substr(col, start: int, stop: int | None = None):
    return pc.utf8_slice_codeunits(col, start, stop)


# --- dates (DateFunctionFactory.scala) --------------------------------------

_UNIT_TO_MS_DIV = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}


def to_epoch_millis(col) -> "np.ndarray":
    """Timestamp column (any unit) → int64 epoch-ms numpy array.

    Casts via int64 with unit-aware scaling — never via
    ``cast(pa.timestamp("ms"))``, which raises ArrowInvalid on us/ns data
    with nonzero sub-ms fractions (the driver testdata is us-precision).
    """
    import numpy as np

    raw = pc.fill_null(pc.cast(col, pa.int64()), 0).to_numpy(zero_copy_only=False)
    unit = getattr(getattr(col, "type", None), "unit", "ms")
    if unit == "s":
        return raw * 1000
    div = _UNIT_TO_MS_DIV.get(unit, 1)
    return raw if div == 1 else raw // div


def millis_to_date(col):
    return pc.cast(col, pa.timestamp("ms"))


def secs_to_date(col):
    return pc.cast(pc.multiply(pc.cast(col, pa.int64()), 1000), pa.timestamp("ms"))


def date_to_millis(col):
    """Date/timestamp column of any unit → epoch millis (int64), truncating.

    Null-preserving (unlike :func:`to_epoch_millis`, which fills 0 for
    index-key encoding, Z3IndexKeySpace.scala:71-72).
    """
    vals = pa.array(to_epoch_millis(col), pa.int64())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.if_else(pc.is_null(col), pa.nulls(len(vals), pa.int64()), vals)


def iso_date(col):
    return pc.strftime(col, format="%Y-%m-%d")


def iso_datetime(col):
    # Arrow's %S renders fractional digits for sub-second units; truncate
    # to seconds first for the ISO-seconds format
    return pc.strftime(pc.floor_temporal(col, unit="second").cast(pa.timestamp("s")),
                       format="%Y-%m-%dT%H:%M:%S")


def date_parse(col, fmt: str):
    return pc.strptime(col, format=fmt, unit="ms")


# --- math (MathFunctionFactory.scala) ---------------------------------------

def add(a, b):
    return pc.add(a, b)


def subtract(a, b):
    return pc.subtract(a, b)


def multiply(a, b):
    return pc.multiply(a, b)


def divide(a, b):
    return pc.divide(a, b)


def mean(*cols):
    acc = cols[0]
    for c in cols[1:]:
        acc = pc.add(acc, c)
    return pc.divide(pc.cast(acc, pa.float64()), float(len(cols)))


def min_of(*cols):
    acc = cols[0]
    for c in cols[1:]:
        acc = pc.min_element_wise(acc, c)
    return acc


def max_of(*cols):
    acc = cols[0]
    for c in cols[1:]:
        acc = pc.max_element_wise(acc, c)
    return acc


# --- encodings / ids (Encoding/IdFunctionFactory.scala) ---------------------

def base64_encode(col):
    import base64

    return pa.array(
        [base64.b64encode(b).decode() if b is not None else None for b in col.to_pylist()],
        pa.string(),
    )


def base64_decode(col):
    import base64

    return pa.array(
        [base64.b64decode(s) if s is not None else None for s in col.to_pylist()],
        pa.binary(),
    )


def md5(col):
    return pa.array(
        [
            hashlib.md5(v.encode() if isinstance(v, str) else v).hexdigest()
            if v is not None
            else None
            for v in col.to_pylist()
        ],
        pa.string(),
    )


def murmur3_64(col):
    """Stable 64-bit hash column (murmur3-class determinism)."""
    return pa.array(hash_strings(col).astype(np.int64), pa.int64())


def uuid5(col, namespace: uuid.UUID = uuid.NAMESPACE_URL):
    """Deterministic UUID per value (uuidZ3-style determinism: same input →
    same id across runs/processes)."""
    return pa.array(
        [
            str(uuid.uuid5(namespace, s)) if s is not None else None
            for s in col.to_pylist()
        ],
        pa.string(),
    )


def with_default(col, default):
    return pc.fill_null(col, default)


def int_to_boolean(col):
    return pc.not_equal(col, 0)


def hex_cell(lon, lat, res=9):
    """H3-analog hex cell id for lon/lat columns (curves/hexgrid.py) —
    the cellId-style converter function for pre-keying records at ingest."""
    from geomesa_ray.curves.hexgrid import hex_encode

    def _np(col):
        return (col.to_numpy(zero_copy_only=False)
                if hasattr(col, "to_numpy") else np.asarray(col, np.float64))

    r = res.as_py() if hasattr(res, "as_py") else res
    if hasattr(r, "to_pylist"):  # column of a single literal broadcast
        r = r.to_pylist()[0]
    return pa.array(hex_encode(_np(lon), _np(lat), int(r)), pa.int64())


def _default_of(default):
    return default.as_py() if hasattr(default, "as_py") else default


def _coerce_int(col, default, bits, pa_type):
    """Cast-with-default (CastFunctionFactory.scala:17-60: unparseable,
    out-of-range, non-finite, OR NULL → default). Fast path is Arrow's
    exact safe cast (vectorized, raises on ANY bad value); the fallback is
    per-element exact integer parsing — NEVER a float round-trip, which
    silently rounds >2^53 and wraps on astype (review finding). Null
    semantics are identical on both paths (fill_null after the fast cast),
    so the output never depends on which block a null lands in."""
    import math

    col = pa.array(col) if not isinstance(col, (pa.Array, pa.ChunkedArray)) else col
    d = _default_of(default)
    try:
        out = pc.cast(col, pa_type)
        return pc.fill_null(out, d) if d is not None else out
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    out = []
    for v in col.to_pylist():
        i = None
        if isinstance(v, bool):
            i = int(v)
        elif isinstance(v, int):
            i = v
        elif isinstance(v, float):
            # truncation, Number.intValue semantics; NaN/Inf have no int
            # value → default (int() would raise and kill the Ray task)
            i = int(v) if math.isfinite(v) else None
        elif v is not None:
            try:
                i = int(str(v).strip())
            except (ValueError, TypeError):
                i = None
        if i is None or not lo <= i <= hi:
            i = d
        out.append(i)
    return pa.array(out, pa_type)


def _coerce_float(col, default, pa_type):
    col = pa.array(col) if not isinstance(col, (pa.Array, pa.ChunkedArray)) else col
    d = _default_of(default)
    try:
        out = pc.cast(col, pa_type)
        # same null semantics as the fallback path (null → default)
        return pc.fill_null(out, d) if d is not None else out
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    out = []
    for v in col.to_pylist():
        try:
            f = float(v) if v is not None else None
        except (ValueError, TypeError):
            f = None
        out.append(d if f is None else f)
    return pa.array(out, pa_type)


def to_int(col, default=None):
    return _coerce_int(col, default, 32, pa.int32())


def to_long(col, default=None):
    return _coerce_int(col, default, 64, pa.int64())


def to_float(col, default=None):
    return _coerce_float(col, default, pa.float32())


def to_double(col, default=None):
    return _coerce_float(col, default, pa.float64())


def to_string(col):
    return pc.cast(col, pa.string())


def to_boolean(col):
    """'true'/'false'/'1'/'0' (case-insensitive) → bool, else null."""
    s = pc.utf8_lower(pc.cast(col, pa.string()))
    true = pc.is_in(s, value_set=pa.array(["true", "1", "t", "yes"]))
    false = pc.is_in(s, value_set=pa.array(["false", "0", "f", "no"]))
    return pc.if_else(true, True, pc.if_else(false, False, pa.scalar(None, pa.bool_())))


def point_geom(lon, lat):
    """point(x, y) → WKB Point column (GeometryFunctionFactory.scala:30).
    Null (or NaN) coordinates yield a null geometry — same null contract
    as geom_from_wkt, never a NaN-coordinate WKB blob."""
    from geomesa_ray.geometry.wkb import point_wkbs

    def _np(col):
        return (col.to_numpy(zero_copy_only=False)
                if hasattr(col, "to_numpy") else
                np.atleast_1d(np.asarray(col, np.float64)))

    x, y = _np(lon), _np(lat)
    arr = point_wkbs(x, y)
    bad = np.isnan(np.broadcast_to(x, (len(arr),))) | np.isnan(
        np.broadcast_to(y, (len(arr),))
    )
    if not bad.any():
        return arr
    return pa.array(
        [None if b else v for v, b in zip(arr.to_pylist(), bad.tolist())],
        pa.binary(),
    )


def geom_from_wkt(col):
    """geometry(wkt) → WKB column (GeometryFunctionFactory geometry
    parser; unparseable → null, converter error-mode friendly)."""
    from geomesa_ray.geometry.wkt import from_wkt
    from geomesa_ray.geometry.wkb import to_wkb

    out = []
    for s in col.to_pylist():
        if s is None:
            out.append(None)
            continue
        try:
            out.append(to_wkb(from_wkt(s)))
        except Exception:
            out.append(None)
    return pa.array(out, pa.binary())
