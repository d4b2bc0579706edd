"""Avro Object Container File reader/writer (from scratch, stdlib only).

Reference parity: the Avro converter family
(geomesa-convert-avro/.../AvroConverter.scala, AvroConverterFactory) parses
Avro container files into SimpleFeatures; here the same format feeds a Ray
Dataset. Implemented directly from the public Avro 1.x specification:

* container layout: magic ``Obj\\x01`` + metadata map (``avro.schema``
  JSON, ``avro.codec``) + 16-byte sync marker, then blocks of
  (row count, byte size, payload, sync);
* binary encoding: zigzag-varint longs/ints, little-endian float/double,
  length-prefixed bytes/strings, 1-byte booleans, union index prefix;
* codecs: ``null`` and ``deflate`` (raw zlib, stdlib);
* schemas: records of primitives (null, boolean, int, long, float,
  double, bytes, string) and nullable unions ``["null", T]`` /
  ``[T, "null"]``, plus ``logicalType: timestamp-millis/micros``.

The reader is exposed Ray-Data-first: one read task per container block
range via ``ray.data.read_datasource`` would need a custom datasource;
files at the reference's scale are many-and-small, so :func:`read_avro`
maps one task per FILE (``from_items(paths).flat_map`` pattern via
``map_batches``), which is the same parallel grain the reference's
converter ingest uses (one converter per input file).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"Obj\x01"

_PRIMS = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def _read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return _zigzag_decode(acc)


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------

def _field_kind(ftype) -> tuple[str, bool]:
    """(primitive-or-logical name, nullable) for a field type spec."""
    nullable = False
    if isinstance(ftype, list):  # union
        non_null = [t for t in ftype if t != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"general unions unsupported: {ftype}")
        nullable = len(non_null) != len(ftype)
        ftype = non_null[0]
    if isinstance(ftype, dict):
        logical = ftype.get("logicalType")
        if logical in ("timestamp-millis", "timestamp-micros"):
            return logical, nullable
        ftype = ftype.get("type")
    if ftype not in _PRIMS:
        raise NotImplementedError(f"unsupported avro type: {ftype}")
    return ftype, nullable


_ARROW_TYPES = {
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bytes": pa.binary(),
    "string": pa.string(),
    "null": pa.null(),
    "timestamp-millis": pa.timestamp("ms"),
    "timestamp-micros": pa.timestamp("us"),
}


def schema_to_arrow(schema: dict) -> pa.Schema:
    fields = []
    for f in schema["fields"]:
        kind, nullable = _field_kind(f["type"])
        fields.append(pa.field(f["name"], _ARROW_TYPES[kind], nullable=True))
    return pa.schema(fields)


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------

def _read_header(buf) -> tuple[dict, str, bytes]:
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # Avro spec: negative count is followed by a varint
            _read_long(buf)  # byte size of the block (unused here)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    return schema, codec, sync


def _decode_value(buf, kind: str):
    if kind == "null":
        return None
    if kind == "boolean":
        return buf.read(1)[0] != 0
    if kind in ("int", "long"):
        return _read_long(buf)
    if kind == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if kind == "bytes":
        return _read_bytes(buf)
    if kind == "string":
        return _read_bytes(buf).decode("utf-8")
    if kind == "timestamp-millis" or kind == "timestamp-micros":
        return _read_long(buf)
    raise NotImplementedError(kind)


def read_avro_file(path: str) -> pa.Table:
    """One Avro container file → Arrow table."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    schema, codec, sync = _read_header(buf)
    kinds = []
    unions = []
    for fld in schema["fields"]:
        kind, nullable = _field_kind(fld["type"])
        kinds.append(kind)
        # union layout mirrors the writer's branch order
        unions.append(fld["type"] if isinstance(fld["type"], list) else None)
    names = [f["name"] for f in schema["fields"]]
    cols: list[list] = [[] for _ in names]
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n_rows = _read_long(buf)
        n_bytes = _read_long(buf)
        payload = buf.read(n_bytes)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec}")
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
        rbuf = io.BytesIO(payload)
        for _ in range(n_rows):
            for ci, kind in enumerate(kinds):
                u = unions[ci]
                if u is not None:
                    branch = _read_long(rbuf)
                    btype = u[branch]
                    bkind, _ = _field_kind([btype] if btype != "null" else ["null"]) if btype != "null" else ("null", True)
                    cols[ci].append(None if btype == "null" else _decode_value(rbuf, bkind))
                else:
                    cols[ci].append(_decode_value(rbuf, kind))
    arrays = []
    for ci, kind in enumerate(kinds):
        arrays.append(pa.array(cols[ci], _ARROW_TYPES[kind]))
    return pa.table(dict(zip(names, arrays)))


def read_avro(paths: str | list[str]) -> "ray.data.Dataset":
    """Avro container files → Ray Dataset (one read task per file, the
    converter-ingest grain; decode is C-speed varint walking per block)."""
    import os

    import ray.data

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(".avro")
            )
        else:
            paths = [paths]

    items = [{"path": p} for p in paths]

    def load(batch: pa.Table) -> pa.Table:
        tables = [read_avro_file(p) for p in batch["path"].to_pylist()]
        return pa.concat_tables(tables)

    return ray.data.from_items(items).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


# ---------------------------------------------------------------------------
# writing
# ---------------------------------------------------------------------------

def _arrow_to_avro_schema(schema: pa.Schema, name: str = "row") -> dict:
    inv = {
        pa.bool_(): "boolean",
        pa.int32(): "int",
        pa.int64(): "long",
        pa.float32(): "float",
        pa.float64(): "double",
        pa.binary(): "bytes",
        pa.string(): "string",
        pa.large_string(): "string",
    }
    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type):
            lt = "timestamp-micros" if f.type.unit in ("us", "ns") else "timestamp-millis"
            t = {"type": "long", "logicalType": lt}
        else:
            t = inv.get(f.type)
            if t is None:
                raise NotImplementedError(f"cannot write {f.type} to avro")
        fields.append({"name": f.name, "type": ["null", t]})
    return {"type": "record", "name": name, "fields": fields}


def _encode_value(buf: io.BytesIO, kind: str, v) -> None:
    if kind == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif kind in ("int", "long", "timestamp-millis", "timestamp-micros"):
        _write_long(buf, int(v))
    elif kind == "float":
        buf.write(struct.pack("<f", v))
    elif kind == "double":
        buf.write(struct.pack("<d", v))
    elif kind == "bytes":
        _write_bytes(buf, bytes(v))
    elif kind == "string":
        _write_bytes(buf, v.encode("utf-8"))
    else:
        raise NotImplementedError(kind)


def write_avro_file(table: pa.Table, path: str, codec: str = "null",
                    rows_per_block: int = 10_000) -> int:
    """Arrow table → Avro container file (nullable-union fields)."""
    import secrets

    schema = _arrow_to_avro_schema(table.schema)
    kinds = [_field_kind(f["type"])[0] for f in schema["fields"]]
    sync = secrets.token_bytes(16)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)

    pydata = []
    for c in table.schema.names:
        col = table[c]
        if pa.types.is_timestamp(col.type):
            # epoch ints in the SOURCE unit, then unit-aware scaling to
            # the declared logical type (s/ms → millis, us/ns → micros).
            # Never .cast(pa.timestamp(...)) across units — it raises on
            # truncation (CLAUDE.md); ns truncates to us by design.
            import pyarrow.compute as _pc

            ints = _pc.fill_null(col.cast(pa.int64()), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)  # int64 throughout — no float round-trip
            unit = col.type.unit
            if unit == "s":
                ints = ints * 1000
            elif unit == "ns":
                ints = ints // 1000
            mask = col.is_null().to_numpy(zero_copy_only=False)
            col = pa.array(ints, pa.int64(), mask=mask)
        pydata.append(col.to_pylist())
    n = len(table)
    for lo in range(0, n, rows_per_block):
        hi = min(lo + rows_per_block, n)
        block = io.BytesIO()
        for r in range(lo, hi):
            for ci, kind in enumerate(kinds):
                v = pydata[ci][r]
                if v is None:
                    _write_long(block, 0)  # union branch: null
                else:
                    _write_long(block, 1)
                    _encode_value(block, kind, v)
        payload = block.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw deflate
        _write_long(out, hi - lo)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return n
