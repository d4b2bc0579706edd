"""SimpleFeatureType (SFT) schema layer: spec-string parser + inference.

Reference: spec strings like ``"name:String,track:String,dtg:Date,
*geom:Point:srid=4326"`` parsed by SimpleFeatureSpecParser.scala /
SimpleFeatureTypes.scala; the closed type universe is
SimpleFeatureSpec.scala:227-304; ingest-time type inference samples values
(geomesa-convert-common/.../TypeInference.scala:52,366).

Here an SFT is a ``pyarrow.schema`` plus metadata: the default-geometry
attribute (the ``*`` marker) and per-attribute options are carried in Arrow
field metadata, so every engine stage interoperates with plain Arrow.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

# SimpleFeatureSpec.scala:252-304 type universe → Arrow
_TYPE_MAP = {
    "string": pa.string(),
    "integer": pa.int32(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "date": pa.timestamp("ms", tz="UTC"),
    "timestamp": pa.timestamp("ms", tz="UTC"),
    "uuid": pa.binary(16),
    "bytes": pa.binary(),
}

# geometry types are stored as WKB binary columns with a type tag
_GEOM_TYPES = {
    "point", "linestring", "polygon", "multipoint", "multilinestring",
    "multipolygon", "geometrycollection", "geometry",
}


@dataclass
class Attribute:
    name: str
    type_name: str
    default_geom: bool = False
    options: dict = field(default_factory=dict)


def parse_spec(spec: str) -> pa.Schema:
    """Parse an SFT spec string into a pa.schema.

    ``List[T]`` → ``pa.list_``, ``Map[K,V]`` → ``pa.map_``; a leading ``*``
    marks the default geometry (recorded in field + schema metadata).
    Geometry attributes become WKB ``binary`` fields tagged with their
    geometry type — except ``Point``, which becomes two float64 fields
    ``<name>_x`` / ``<name>_y`` mirroring the reference's Parquet point
    layout (SimpleFeatureParquetSchema.scala:181-217).
    """
    fields = []
    default_geom = None
    for part in _split_top(spec, ","):
        part = part.strip()
        if not part:
            continue
        is_default = part.startswith("*")
        if is_default:
            part = part[1:]
        pieces = _split_top(part, ":")
        if len(pieces) < 2:
            raise ValueError(f"bad attribute spec: {part!r}")
        name, type_name = pieces[0].strip(), pieces[1].strip()
        options = {}
        for opt in pieces[2:]:
            if "=" in opt:
                k, v = opt.split("=", 1)
                options[k.strip()] = v.strip()
        tl = type_name.lower()
        meta = {k: str(v) for k, v in options.items()}
        if tl in _GEOM_TYPES:
            meta["geometry"] = type_name
            if is_default:
                meta["default_geometry"] = "true"
                default_geom = name
            if tl == "point":
                fields.append(pa.field(f"{name}_x", pa.float64(), metadata=meta))
                fields.append(pa.field(f"{name}_y", pa.float64(), metadata=meta))
            else:
                fields.append(pa.field(name, pa.binary(), metadata={**meta, "encoding": "wkb"}))
        elif tl.startswith("list["):
            inner = type_name[5:-1].strip().lower()
            fields.append(pa.field(name, pa.list_(_TYPE_MAP[inner]), metadata=meta))
        elif tl.startswith("map["):
            k, v = [s.strip().lower() for s in type_name[4:-1].split(",")]
            fields.append(pa.field(name, pa.map_(_TYPE_MAP[k], _TYPE_MAP[v]), metadata=meta))
        else:
            fields.append(pa.field(name, _TYPE_MAP[tl], metadata=meta or None))
    schema_meta = {}
    if default_geom:
        schema_meta["default_geometry"] = default_geom
    return pa.schema(fields, metadata=schema_meta or None)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside brackets (List[..] / Map[..,..])."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def to_spec(schema: pa.Schema) -> str:
    """Schema → spec string round-trip (skips point _x/_y pairing)."""
    parts = []
    default = (schema.metadata or {}).get(b"default_geometry", b"").decode()
    for f in schema:
        meta = {k.decode(): v.decode() for k, v in (f.metadata or {}).items()}
        if "geometry" in meta:
            if f.name.endswith("_y") and meta["geometry"].lower() == "point":
                continue
            name = f.name[:-2] if f.name.endswith("_x") else f.name
            star = "*" if name == default else ""
            parts.append(f"{star}{name}:{meta['geometry']}")
        else:
            inv = _type_name(f.type)
            parts.append(f"{f.name}:{inv}")
    return ",".join(parts)


def _type_name(t: pa.DataType) -> str:
    if pa.types.is_list(t):
        return f"List[{_type_name(t.value_type)}]"
    if pa.types.is_map(t):
        return f"Map[{_type_name(t.key_type)},{_type_name(t.item_type)}]"
    for name, typ in _TYPE_MAP.items():
        if t == typ:
            return {"string": "String", "int": "Integer", "integer": "Integer",
                    "long": "Long", "float": "Float", "double": "Double",
                    "boolean": "Boolean", "date": "Date", "timestamp": "Timestamp",
                    "uuid": "UUID", "bytes": "Bytes"}[name]
    raise ValueError(f"unmappable type {t}")


_DATE_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:?\d{2})?)?$"
)
_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_BOOL = {"true", "false"}
_WKT_RE = re.compile(
    r"^\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|GEOMETRYCOLLECTION)\s*\(",
    re.I,
)


def infer_type(values: list) -> str:
    """Infer an SFT type name from sampled string values
    (TypeInference.scala analog: most-specific type all samples satisfy;
    numeric widening int → long → double)."""
    non_null = [v for v in values if v is not None and v != ""]
    if not non_null:
        return "String"
    strs = [str(v) for v in non_null]
    if all(s.lower() in _BOOL for s in strs):
        return "Boolean"
    if all(_INT_RE.match(s) for s in strs):
        mx = max(abs(int(s)) for s in strs)
        return "Integer" if mx <= 2**31 - 1 else "Long"
    if all(_FLOAT_RE.match(s) for s in strs):
        return "Double"
    if all(_DATE_RE.match(s) for s in strs):
        return "Date"
    if all(_WKT_RE.match(s) for s in strs):
        m = _WKT_RE.match(strs[0]).group(1).upper()
        tag = {
            "POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon",
            "MULTIPOINT": "MultiPoint", "MULTILINESTRING": "MultiLineString",
            "MULTIPOLYGON": "MultiPolygon", "GEOMETRYCOLLECTION": "GeometryCollection",
        }[m]
        first = {_WKT_RE.match(s).group(1).upper() for s in strs}
        return tag if len(first) == 1 else "Geometry"
    return "String"


def infer_spec(rows: dict[str, list], sample: int = 100) -> str:
    """Infer a full spec string from sampled columns of strings."""
    parts = []
    for name, vals in rows.items():
        parts.append(f"{name}:{infer_type(vals[:sample])}")
    return ",".join(parts)
