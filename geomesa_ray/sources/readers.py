"""Input converters: GeoJSON and delimited text → typed Datasets.

Reference analogs: geomesa-convert-json (GeoJsonParsing.scala) and
geomesa-convert-text (DelimitedTextConverter.scala) feeding the converter
pipeline. Here parsing lands directly in Arrow; delimited ingestion can
infer its SFT from a sample (TypeInference analog via
:mod:`geomesa_ray.sources.sft`).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.sources.sft import infer_spec, parse_spec


def read_geojson(path: str) -> ray.data.Dataset:
    """FeatureCollection of Point features → Dataset with lon/lat columns
    plus one column per property (geo-converter analog; non-point
    geometries land as WKT in a ``geometry_wkt`` column)."""
    from geomesa_ray.geometry.base import LineString, Point, Polygon
    from geomesa_ray.geometry.wkt import to_wkt

    with open(path) as f:
        fc = json.load(f)
    feats = fc.get("features", [])
    props_keys: list[str] = []
    for ft in feats:
        for k in (ft.get("properties") or {}):
            if k not in props_keys:
                props_keys.append(k)
    cols: dict[str, list] = {k: [] for k in props_keys}
    lons, lats, wkts = [], [], []
    for ft in feats:
        geom = ft.get("geometry") or {}
        gtype = geom.get("type")
        coords = geom.get("coordinates")
        if gtype == "Point" and coords:
            lons.append(float(coords[0]))
            lats.append(float(coords[1]))
            wkts.append(None)
        else:
            lons.append(None)
            lats.append(None)
            if gtype == "LineString":
                wkts.append(to_wkt(LineString(coords)))
            elif gtype == "Polygon":
                wkts.append(to_wkt(Polygon(coords[0], coords[1:])))
            else:
                wkts.append(None)
        p = ft.get("properties") or {}
        for k in props_keys:
            cols[k].append(p.get(k))
    out = {k: pa.array(v) for k, v in cols.items()}
    out["lon"] = pa.array(lons, pa.float64())
    out["lat"] = pa.array(lats, pa.float64())
    if any(w is not None for w in wkts):
        out["geometry_wkt"] = pa.array(wkts, pa.string())
    return ray.data.from_arrow(pa.table(out))


_CASTS = {
    "Integer": pa.int32(),
    "Long": pa.int64(),
    "Double": pa.float64(),
    "Boolean": pa.bool_(),
    "Date": pa.timestamp("ms", tz="UTC"),
    "String": pa.string(),
}


def read_delimited(
    paths: str | list[str],
    spec: str | None = None,
    infer_sample: int = 100,
    **read_csv_kwargs,
) -> "tuple[ray.data.Dataset, str]":
    """Delimited-text converter: CSV → (Dataset typed by an SFT spec string,
    the spec used). The spec is inferred from a string-valued sample when not
    given (TypeInference.scala analog); all columns are read as strings so
    typing is decided by SFT inference alone, never Arrow's CSV guesser."""
    import pyarrow.compute as pc
    import pyarrow.csv as pacsv

    # grab column names from the header so every column can be forced to
    # string (Arrow CSV needs explicit per-name types to disable inference)
    first = paths[0] if isinstance(paths, list) else paths
    parse_options = read_csv_kwargs.get("parse_options")
    with pacsv.open_csv(
        first,
        read_options=pacsv.ReadOptions(block_size=1 << 16),
        parse_options=parse_options,
    ) as reader:
        names = reader.schema.names

    raw = ray.data.read_csv(
        paths,
        convert_options=pacsv.ConvertOptions(
            column_types={n: pa.string() for n in names},
            strings_can_be_null=True,
        ),
        **read_csv_kwargs,
    )
    if spec is None:
        sample = raw.limit(infer_sample).to_pandas()
        spec = infer_spec({c: [None if v is None else str(v) for v in sample[c]] for c in sample.columns})
    schema = parse_spec(spec)

    def typed(batch: pa.Table) -> pa.Table:
        out = {}
        for field in schema:
            if field.name not in batch.schema.names:
                continue
            col = batch[field.name]
            if pa.types.is_timestamp(field.type):
                # parse as zoneless ISO then assume UTC — the zoneless
                # cast REJECTS explicit offsets, so the common 'Z' /
                # '+00:00' UTC suffixes are stripped first (infer_type
                # accepts them, and jdbc.py strips them the same way).
                # Anchored at end-of-string so an unexpected format fails
                # the cast loudly instead of being silently mangled.
                strs = pc.replace_substring_regex(
                    pc.cast(col, pa.string()), r"(Z|\+00:00)$", ""
                )
                naive = pc.cast(strs, pa.timestamp(field.type.unit))
                out[field.name] = (
                    pc.assume_timezone(naive, field.type.tz)
                    if field.type.tz
                    else naive
                )
            else:
                out[field.name] = pc.cast(col, field.type)
        return pa.table(out)

    return raw.map_batches(typed, batch_format="pyarrow"), spec


def read_fixed_width(
    paths: str | list[str],
    fields: list[tuple[str, int, int]],
    spec: str | None = None,
    skip_lines: int = 0,
) -> "tuple[ray.data.Dataset, str]":
    """Fixed-width text converter (geomesa-convert-fixedwidth analog):
    ``fields`` is [(name, start, width), ...] with 0-based character
    offsets; slicing is a vectorized Arrow kernel per column. Values are
    whitespace-trimmed strings typed by the SFT ``spec`` (inferred from a
    sample when not given, like :func:`read_delimited`). Returns
    (Dataset, spec)."""
    import pyarrow.compute as pc

    raw = ray.data.read_text(paths)
    if skip_lines:
        # deterministic per-file header skip would need file offsets;
        # read_text already splits lines, so drop the first N GLOBAL rows
        # only when reading a single file (multi-file callers pre-strip)
        if isinstance(paths, list) and len(paths) > 1:
            raise ValueError("skip_lines requires a single input file")
        raw = ray.data.from_items(raw.take_all()[skip_lines:])

    def slice_cols(batch: pa.Table) -> pa.Table:
        line = batch["text"]
        out = {}
        for name, start, width in fields:
            col = pc.utf8_trim_whitespace(
                pc.utf8_slice_codeunits(line, start, start + width)
            )
            out[name] = pc.if_else(pc.equal(col, ""), pa.nulls(len(col), pa.string()), col)
        return pa.table(out)

    sliced = raw.map_batches(slice_cols, batch_format="pyarrow")
    if spec is None:
        sample = sliced.limit(100).to_pandas()
        spec = infer_spec(
            {c: [None if v is None else str(v) for v in sample[c]] for c in sample.columns}
        )
    schema = parse_spec(spec)

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = {}
        for field in schema:
            if field.name not in batch.schema.names:
                continue
            col = batch[field.name]
            if pa.types.is_timestamp(field.type):
                strs = pc.replace_substring_regex(
                    pc.cast(col, pa.string()), r"(Z|\+00:00)$", ""
                )  # zoneless cast rejects UTC suffixes; anchored strip
                # (see read_delimited)
                naive = pc.cast(strs, pa.timestamp(field.type.unit))
                out[field.name] = (
                    pc.assume_timezone(naive, field.type.tz) if field.type.tz else naive
                )
            else:
                out[field.name] = pc.cast(col, field.type)
        return pa.table(out)

    return sliced.map_batches(typed, batch_format="pyarrow"), spec


def read_shapefile_ds(base_path: str) -> ray.data.Dataset:
    """Shapefile (.shp/.dbf) → Dataset with a ``geom_wkb`` column
    (geomesa-convert-shp analog; parsing in stages/export2.read_shapefile)."""
    from geomesa_ray.stages.export2 import read_shapefile

    return ray.data.from_arrow(read_shapefile(base_path))


def read_xml(
    path: str,
    record_tag: str,
    fields: dict[str, str],
    spec: str | None = None,
) -> "tuple[ray.data.Dataset, str]":
    """XML converter (geomesa-convert-xml analog): every ``record_tag``
    element becomes a row; ``fields`` maps column name → child-element
    path (``a/b``) or ``@attr`` on the record element. Values land as
    strings and are typed by the SFT ``spec`` (inferred when not given),
    the same contract as the delimited/fixed-width converters."""
    import xml.etree.ElementTree as ET

    import pyarrow.compute as pc

    cols: dict[str, list] = {name: [] for name in fields}
    for _event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag != record_tag:
            continue
        for name, src in fields.items():
            if src.startswith("@"):
                cols[name].append(elem.get(src[1:]))
            else:
                child = elem.find(src)
                cols[name].append(
                    child.text.strip() if child is not None and child.text else None
                )
        elem.clear()
    tbl = pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})
    if spec is None:
        spec = infer_spec(
            {c: [None if v is None else str(v) for v in cols[c][:100]] for c in cols}
        )
    schema = parse_spec(spec)
    out = {}
    for f in schema:
        if f.name not in tbl.schema.names:
            continue
        col = tbl[f.name]
        if pa.types.is_timestamp(f.type):
            naive = pc.cast(col, pa.timestamp(f.type.unit))
            out[f.name] = (
                pc.assume_timezone(naive, f.type.tz) if f.type.tz else naive
            )
        else:
            out[f.name] = pc.cast(col, f.type)
    return ray.data.from_arrow(pa.table(out)), spec


def read_osm(path: str, entity: str = "nodes") -> ray.data.Dataset:
    """OpenStreetMap XML (.osm) converter (geomesa-convert-osm analog).

    The reference ships osm-nodes / osm-ways SFTs
    (geomesa-tools/conf/sfts/osm/reference.conf): nodes become Points with
    ``user``/``tags``(JSON)/``dtg``, ways resolve their ``<nd ref=...>``
    node references into LineStrings. ``entity`` selects "nodes" or
    "ways". Single-file parse resolves way refs against the in-file node
    map (OSM extracts are self-contained); at planet scale the resolve
    step is the nodes⨝refs hash join over Datasets instead.
    """
    import json as _json
    import xml.etree.ElementTree as ET

    import pyarrow.compute as pc

    if entity not in ("nodes", "ways"):
        raise ValueError("entity must be 'nodes' or 'ways'")

    node_ids: list[int] = []
    node_lon: list[float] = []
    node_lat: list[float] = []
    node_user: list = []
    node_ts: list = []
    node_tags: list = []
    coords: dict[int, tuple[float, float]] = {}
    way_rows: list[dict] = []

    for _event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag == "node":
            nid = int(elem.get("id"))
            lon = float(elem.get("lon"))
            lat = float(elem.get("lat"))
            coords[nid] = (lon, lat)
            if entity == "nodes":
                node_ids.append(nid)
                node_lon.append(lon)
                node_lat.append(lat)
                node_user.append(elem.get("user"))
                node_ts.append(elem.get("timestamp"))
                node_tags.append(
                    _json.dumps(
                        {t.get("k"): t.get("v") for t in elem.findall("tag")},
                        sort_keys=True,
                    )
                )
            elem.clear()
        elif elem.tag == "way":
            if entity == "ways":
                tags = {t.get("k"): t.get("v") for t in elem.findall("tag")}
                way_rows.append(
                    {
                        "osm_id": int(elem.get("id")),
                        "user": elem.get("user"),
                        "name": tags.get("name"),
                        "dtg": elem.get("timestamp"),
                        "tags": _json.dumps(tags, sort_keys=True),
                        "refs": [int(nd.get("ref")) for nd in elem.findall("nd")],
                    }
                )
            elem.clear()

    def _ts(col: list) -> pa.Array:
        naive = pc.cast(
            pa.array(
                [None if v is None else v.replace("Z", "") for v in col],
                pa.string(),
            ),
            pa.timestamp("ms"),
        )
        return pc.assume_timezone(naive, "UTC")

    if entity == "nodes":
        tbl = pa.table(
            {
                "osm_id": pa.array(node_ids, pa.int64()),
                "user": pa.array(node_user, pa.string()),
                "tags": pa.array(node_tags, pa.string()),
                "dtg": _ts(node_ts),
                "lon": pa.array(node_lon, pa.float64()),
                "lat": pa.array(node_lat, pa.float64()),
            }
        )
        return ray.data.from_arrow(tbl)

    from geomesa_ray.geometry.base import LineString
    from geomesa_ray.geometry.wkt import to_wkt

    wkts = []
    for row in way_rows:
        pts = [coords[r] for r in row["refs"] if r in coords]
        wkts.append(to_wkt(LineString(pts)) if len(pts) >= 2 else None)
    tbl = pa.table(
        {
            "osm_id": pa.array([r["osm_id"] for r in way_rows], pa.int64()),
            "user": pa.array([r["user"] for r in way_rows], pa.string()),
            "name": pa.array([r["name"] for r in way_rows], pa.string()),
            "tags": pa.array([r["tags"] for r in way_rows], pa.string()),
            "dtg": _ts([r["dtg"] for r in way_rows]),
            "geometry_wkt": pa.array(wkts, pa.string()),
        }
    )
    return ray.data.from_arrow(tbl)
