"""WKB (ISO well-known binary) read/write, little-endian by default.

Geometry-at-rest contract: polygon tables carry a ``geom_wkb: binary``
column, mirroring the reference's WKB fallback layout for non-point
geometries (SimpleFeatureParquetSchema.scala:181-217 analog).
"""

from __future__ import annotations

import struct

import numpy as np

from geomesa_ray.geometry.base import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)

_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION = 4, 5, 6, 7


def to_wkb(g: Geometry) -> bytes:
    out = bytearray()
    _write(g, out)
    return bytes(out)


def _write(g: Geometry, out: bytearray):
    out.append(1)  # little endian
    if isinstance(g, Point):
        out += struct.pack("<I2d", _POINT, g.x, g.y)
    elif isinstance(g, LineString):
        out += struct.pack("<II", _LINESTRING, len(g.coords))
        out += np.ascontiguousarray(g.coords, dtype="<f8").tobytes()
    elif isinstance(g, Polygon):
        rings = g.rings
        out += struct.pack("<II", _POLYGON, len(rings))
        for r in rings:
            out += struct.pack("<I", len(r))
            out += np.ascontiguousarray(r, dtype="<f8").tobytes()
    elif isinstance(g, (MultiPoint, MultiLineString, MultiPolygon, GeometryCollection)):
        code = {
            MultiPoint: _MULTIPOINT,
            MultiLineString: _MULTILINESTRING,
            MultiPolygon: _MULTIPOLYGON,
            GeometryCollection: _COLLECTION,
        }[type(g)]
        out += struct.pack("<II", code, len(g.parts))
        for p in g.parts:
            _write(p, out)
    else:
        raise TypeError(f"unsupported geometry: {g.geom_type}")


def from_wkb(data: bytes) -> Geometry:
    g, _ = _read(memoryview(data), 0)
    return g


def _read(buf: memoryview, pos: int):
    endian = "<" if buf[pos] == 1 else ">"
    pos += 1
    (code,) = struct.unpack_from(endian + "I", buf, pos)
    pos += 4
    # EWKB flag bits: SRID payload must be SKIPPED (4 bytes), and Z/M
    # extra coordinates change the stride — reading them as 2-D would
    # silently produce garbage coordinates, so they raise instead
    if code & 0x20000000:  # EWKB SRID flag: consume the srid
        pos += 4
    if code & 0xC0000000 or (code & 0x1FFFFFFF) >= 1000:
        # EWKB Z/M flags or ISO +1000/+2000/+3000 type offsets
        raise NotImplementedError(
            "Z/M-dimensioned WKB is not supported (2-D only)"
        )
    code = code & 0xFF
    if code == _POINT:
        x, y = struct.unpack_from(endian + "2d", buf, pos)
        return Point(x, y), pos + 16
    if code == _LINESTRING:
        coords, pos = _read_coords(buf, pos, endian)
        return LineString(coords), pos
    if code == _POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            r, pos = _read_coords(buf, pos, endian)
            rings.append(r)
        return Polygon(rings[0], rings[1:]) if rings else Polygon(np.empty((0, 2))), pos
    if code in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
        (n,) = struct.unpack_from(endian + "I", buf, pos)
        pos += 4
        parts = []
        for _ in range(n):
            p, pos = _read(buf, pos)
            parts.append(p)
        cls = {
            _MULTIPOINT: MultiPoint,
            _MULTILINESTRING: MultiLineString,
            _MULTIPOLYGON: MultiPolygon,
            _COLLECTION: GeometryCollection,
        }[code]
        return cls(parts), pos
    raise ValueError(f"unsupported WKB geometry code: {code}")


def _read_coords(buf: memoryview, pos: int, endian: str):
    (n,) = struct.unpack_from(endian + "I", buf, pos)
    pos += 4
    arr = np.frombuffer(buf, dtype=endian + "f8", count=2 * n, offset=pos).reshape(n, 2)
    return arr.copy(), pos + 16 * n


def segment_wkbs(x0, y0, x1, y1):
    """Vectorized batch constructor: N two-point LineString WKBs as one
    Arrow binary array (single buffer build — no per-row Python objects).
    Identical bytes to ``to_wkb(LineString([(x0,y0),(x1,y1)]))``."""
    import pyarrow as pa

    n = len(x0)
    rec = np.zeros(
        n,
        dtype=[("bo", "u1"), ("typ", "<u4"), ("npt", "<u4"),
               ("ax", "<f8"), ("ay", "<f8"), ("bx", "<f8"), ("by", "<f8")],
    )
    rec["bo"] = 1
    rec["typ"] = _LINESTRING
    rec["npt"] = 2
    rec["ax"], rec["ay"], rec["bx"], rec["by"] = x0, y0, x1, y1
    data = rec.tobytes()
    width = rec.dtype.itemsize
    offsets = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)]
    )


def rect_wkbs(xmin, ymin, xmax, ymax):
    """Vectorized batch constructor: N axis-rectangle Polygon WKBs (closed
    5-vertex shell, CCW from (xmin,ymin)) as one Arrow binary array.
    Identical bytes to ``to_wkb(Polygon([...]))`` for the same ring."""
    import pyarrow as pa

    n = len(xmin)
    rec = np.zeros(
        n,
        dtype=[("bo", "u1"), ("typ", "<u4"), ("nring", "<u4"), ("npt", "<u4"),
               ("x0", "<f8"), ("y0", "<f8"), ("x1", "<f8"), ("y1", "<f8"),
               ("x2", "<f8"), ("y2", "<f8"), ("x3", "<f8"), ("y3", "<f8"),
               ("x4", "<f8"), ("y4", "<f8")],
    )
    rec["bo"] = 1
    rec["typ"] = _POLYGON
    rec["nring"] = 1
    rec["npt"] = 5
    rec["x0"], rec["y0"] = xmin, ymin
    rec["x1"], rec["y1"] = xmax, ymin
    rec["x2"], rec["y2"] = xmax, ymax
    rec["x3"], rec["y3"] = xmin, ymax
    rec["x4"], rec["y4"] = xmin, ymin
    data = rec.tobytes()
    width = rec.dtype.itemsize
    offsets = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)]
    )


# ---------------------------------------------------------------------------
# batch parse (zero-copy over an Arrow binary column)
# ---------------------------------------------------------------------------

def _wkb_views(arr):
    """Per-row memoryviews over an Arrow binary column's single data
    buffer — no per-row ``bytes`` copies (``to_pylist`` would copy every
    blob). Accepts Array or ChunkedArray."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        chunks = arr.chunks
    else:
        chunks = [arr]
    for chunk in chunks:
        if chunk.null_count:
            raise ValueError("null geometry in WKB column")
        if isinstance(chunk, pa.LargeBinaryArray):
            off_dtype = np.int64
        else:
            off_dtype = np.int32
        bufs = chunk.buffers()
        offsets = np.frombuffer(
            bufs[1], dtype=off_dtype,
            count=len(chunk) + 1, offset=chunk.offset * np.dtype(off_dtype).itemsize,
        )
        data = memoryview(bufs[2])
        for i in range(len(chunk)):
            yield data[offsets[i]:offsets[i + 1]]


def parse_wkbs(arr) -> list[Geometry]:
    """Parse a whole Arrow binary column of WKB blobs; each ring lands as
    one ``np.frombuffer`` slice of the shared buffer (copied once into the
    geometry), with no intermediate Python ``bytes`` objects."""
    return [_read(mv, 0)[0] for mv in _wkb_views(arr)]


def wkb_envelopes(arr) -> np.ndarray:
    """(n, 4) [xmin, ymin, xmax, ymax] envelopes of a WKB binary column
    WITHOUT building geometry objects: for (Multi)Polygon only shell rings
    are scanned (holes cannot extend the envelope); Point/LineString read
    their coords directly. Falls back to a full parse for other types."""
    def env_into(mv, pos, out, depth=0):
        endian = "<" if mv[pos] == 1 else ">"
        pos += 1
        (code,) = struct.unpack_from(endian + "I", mv, pos)
        pos += 4
        if code & 0x20000000:  # EWKB SRID payload (same contract as _read)
            pos += 4
        if code & 0xC0000000 or (code & 0x1FFFFFFF) >= 1000:
            raise NotImplementedError(
                "Z/M-dimensioned WKB is not supported (2-D only)"
            )
        code = code & 0xFF
        if code == _POINT:
            x, y = struct.unpack_from(endian + "2d", mv, pos)
            out[0] = min(out[0], x); out[1] = min(out[1], y)
            out[2] = max(out[2], x); out[3] = max(out[3], y)
            return pos + 16
        if code in (_LINESTRING, _POLYGON):
            nrings = 1
            if code == _POLYGON:
                (nrings,) = struct.unpack_from(endian + "I", mv, pos)
                pos += 4
            for r in range(nrings):
                (npt,) = struct.unpack_from(endian + "I", mv, pos)
                pos += 4
                if r == 0 and npt:  # shell bounds dominate hole bounds
                    c = np.frombuffer(mv, dtype=endian + "f8", count=2 * npt,
                                      offset=pos).reshape(npt, 2)
                    out[0] = min(out[0], c[:, 0].min())
                    out[1] = min(out[1], c[:, 1].min())
                    out[2] = max(out[2], c[:, 0].max())
                    out[3] = max(out[3], c[:, 1].max())
                pos += 16 * npt
            return pos
        if code in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
            (n,) = struct.unpack_from(endian + "I", mv, pos)
            pos += 4
            for _ in range(n):
                pos = env_into(mv, pos, out, depth + 1)
            return pos
        raise ValueError(f"unsupported WKB geometry code: {code}")

    views = list(_wkb_views(arr))
    out = np.empty((len(views), 4), dtype=np.float64)
    for i, mv in enumerate(views):
        acc = [np.inf, np.inf, -np.inf, -np.inf]
        env_into(mv, 0, acc)
        out[i] = acc
    return out


def point_wkbs(x, y):
    """Vectorized batch constructor: N Point WKBs as one Arrow binary
    array (same record-array construction as rect_wkbs). Byte-identical
    to ``to_wkb(Point(x, y))``. Scalars broadcast against arrays;
    mismatched non-scalar lengths raise."""
    import pyarrow as pa

    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    if len(x) != len(y):
        if len(x) == 1:
            x = np.broadcast_to(x, y.shape)
        elif len(y) == 1:
            y = np.broadcast_to(y, x.shape)
        else:
            raise ValueError(f"length mismatch: {len(x)} vs {len(y)}")
    n = len(x)
    if (n + 1) * 21 > 2**31 - 1:
        # pa.binary() offsets are int32; np.arange would silently wrap
        # (same guard as hexgrid.hex_boundary_wkbs)
        raise ValueError(
            f"{n} points exceed the 2 GiB Arrow binary offset range; "
            "chunk the batch"
        )
    rec = np.zeros(n, dtype=[("bo", "u1"), ("typ", "<u4"),
                             ("x", "<f8"), ("y", "<f8")])
    rec["bo"] = 1
    rec["typ"] = _POINT
    rec["x"] = x
    rec["y"] = y
    data = rec.tobytes()
    width = rec.dtype.itemsize
    offsets = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)]
    )
