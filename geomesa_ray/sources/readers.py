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

    if skip_lines:
        # deterministic header skip needs file-relative row positions,
        # which read_text's byte-range tasks don't expose — so read the
        # file per-task with read_binary_files and drop the first N lines
        # inside the task (never on the driver; a fixed-width file can be
        # tens of GB). One block per file enters; Ray's dynamic block
        # splitting re-chunks the output at target_max_block_size.
        if isinstance(paths, list) and len(paths) > 1:
            raise ValueError("skip_lines requires a single input file")

        def split_drop(batch: pa.Table) -> pa.Table:
            out = []
            for blob in batch["bytes"]:
                text = blob.as_py().decode("utf-8")
                lines = text.splitlines()
                out.extend(lines[skip_lines:])
            return pa.table({"text": pa.array(out, pa.string())})

        raw = ray.data.read_binary_files(paths).map_batches(
            split_drop, batch_format="pyarrow"
        )
    else:
        raw = ray.data.read_text(paths)

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


# --- OpenStreetMap XML converter (geomesa-convert-osm analog) ---------------
#
# The reference ships osm-nodes / osm-ways SFTs
# (geomesa-tools/conf/sfts/osm/reference.conf): nodes become Points with
# user/tags(JSON)/dtg, ways resolve their <nd ref=...> node references into
# LineStrings. The XML parse runs INSIDE Ray tasks (one per .osm file) so
# driver RSS stays flat; multi-file extracts resolve way refs through a
# distributed nodes-x-refs path (broadcast lookup under a size cap, hash
# Dataset.join above it) instead of a driver node map.

import re as _re

_OSM_TS_SUFFIX = _re.compile(r"(Z|\+00:00)$")  # anchored UTC-designator strip

_OSM_NODE, _OSM_REF, _OSM_META = 0, 1, 2

_OSM_UNION_SCHEMA = pa.schema([
    ("role", pa.int8()),
    ("way_id", pa.int64()),   # node id for role=NODE rows
    ("seq", pa.int64()),
    ("nid", pa.int64()),
    ("lon", pa.float64()),
    ("lat", pa.float64()),
    ("user", pa.string()),
    ("name", pa.string()),
    ("dtg", pa.string()),
    ("tags", pa.string()),
])

_OSM_WAYS_SCHEMA = pa.schema([
    ("osm_id", pa.int64()),
    ("user", pa.string()),
    ("name", pa.string()),
    ("tags", pa.string()),
    ("dtg", pa.timestamp("ms", tz="UTC")),
    ("geometry_wkt", pa.string()),
])


def _pc_equal_i8(col, v: int):
    import pyarrow.compute as pc

    return pc.equal(col, pa.scalar(v, pa.int8()))


def _osm_ts(col: list) -> pa.Array:
    import pyarrow.compute as pc

    naive = pc.cast(
        pa.array(
            [None if v is None else _OSM_TS_SUFFIX.sub("", v) for v in col],
            pa.string(),
        ),
        pa.timestamp("ms"),
    )
    return pc.assume_timezone(naive, "UTC")


def _osm_paths(path) -> list[str]:
    import os

    if isinstance(path, (list, tuple)):
        return list(path)
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".osm")
        )
    return [path]


def _parse_osm_nodes(path: str) -> pa.Table:
    """One-file streaming parse -> final nodes table (runs in a Ray task)."""
    import json as _json
    import xml.etree.ElementTree as ET

    ids, lons, lats, users, tss, tags = [], [], [], [], [], []
    for _event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag == "node":
            ids.append(int(elem.get("id")))
            lons.append(float(elem.get("lon")))
            lats.append(float(elem.get("lat")))
            users.append(elem.get("user"))
            tss.append(elem.get("timestamp"))
            tags.append(_json.dumps(
                {t.get("k"): t.get("v") for t in elem.findall("tag")},
                sort_keys=True,
            ))
            elem.clear()
        elif elem.tag == "way":
            elem.clear()
    return pa.table({
        "osm_id": pa.array(ids, pa.int64()),
        "user": pa.array(users, pa.string()),
        "tags": pa.array(tags, pa.string()),
        "dtg": _osm_ts(tss),
        "lon": pa.array(lons, pa.float64()),
        "lat": pa.array(lats, pa.float64()),
    })


def _parse_osm_union(path: str) -> pa.Table:
    """One-file streaming parse -> role-tagged union rows (node coords,
    way refs, way metadata) for the distributed ways-resolve arms."""
    import json as _json
    import xml.etree.ElementTree as ET

    role, way_id, seq, nid = [], [], [], []
    lon, lat, user, name, dtg, tags = [], [], [], [], [], []

    def _row(r, w=0, s=-1, n_=0, lo=None, la=None, u=None, nm=None,
             d=None, tg=None):
        role.append(r); way_id.append(w); seq.append(s); nid.append(n_)
        lon.append(lo); lat.append(la); user.append(u); name.append(nm)
        dtg.append(d); tags.append(tg)

    for _event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag == "node":
            _row(_OSM_NODE, n_=int(elem.get("id")),
                 lo=float(elem.get("lon")), la=float(elem.get("lat")))
            elem.clear()
        elif elem.tag == "way":
            wid = int(elem.get("id"))
            tg = {t.get("k"): t.get("v") for t in elem.findall("tag")}
            for i, nd in enumerate(elem.findall("nd")):
                _row(_OSM_REF, w=wid, s=i, n_=int(nd.get("ref")))
            _row(_OSM_META, w=wid, u=elem.get("user"), nm=tg.get("name"),
                 d=elem.get("timestamp"), tg=_json.dumps(tg, sort_keys=True))
            elem.clear()
    return pa.table({
        "role": pa.array(role, pa.int8()),
        "way_id": pa.array(way_id, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "nid": pa.array(nid, pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
        "user": pa.array(user, pa.string()),
        "name": pa.array(name, pa.string()),
        "dtg": pa.array(dtg, pa.string()),
        "tags": pa.array(tags, pa.string()),
    })


def _osm_ways_from_parts(way_ids, seqs, lons, lats, meta: dict) -> pa.Table:
    """Vectorized ways assembly: lexsort refs by (way_id, seq), segment at
    way boundaries, build LineStrings only for ways with >=2 resolved
    points. ``meta``: way_id -> (user, name, dtg, tags)."""
    from geomesa_ray.geometry.base import LineString
    from geomesa_ray.geometry.wkt import to_wkt

    wkts: dict[int, str] = {}
    if len(way_ids):
        order = np.lexsort((seqs, way_ids))
        w, lo, la = way_ids[order], lons[order], lats[order]
        starts = np.nonzero(np.concatenate([[True], w[1:] != w[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(w)]])
        for s, e in zip(starts, ends):
            if e - s >= 2:
                wkts[int(w[s])] = to_wkt(
                    LineString(list(zip(lo[s:e], la[s:e])))
                )
    out_ids = sorted(meta)
    return pa.table({
        "osm_id": pa.array(out_ids, pa.int64()),
        "user": pa.array([meta[i][0] for i in out_ids], pa.string()),
        "name": pa.array([meta[i][1] for i in out_ids], pa.string()),
        "tags": pa.array([meta[i][3] for i in out_ids], pa.string()),
        "dtg": _osm_ts([meta[i][2] for i in out_ids]),
        "geometry_wkt": pa.array(
            [wkts.get(i) for i in out_ids], pa.string()
        ),
    })


def _parse_osm_ways_single(path: str) -> pa.Table:
    """Self-contained one-file ways parse (OSM extracts carry their own
    nodes): resolve refs against the in-task node map, no shuffle."""
    t = _parse_osm_union(path)
    role = t["role"].to_numpy(zero_copy_only=False)
    nids = t["nid"].to_numpy(zero_copy_only=False)
    node_m = role == _OSM_NODE
    ids = nids[node_m]
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order]
    lon_sorted = t["lon"].to_numpy(zero_copy_only=False)[node_m][order]
    lat_sorted = t["lat"].to_numpy(zero_copy_only=False)[node_m][order]

    ref_m = role == _OSM_REF
    if len(ids_sorted) == 0:
        ok = np.zeros(int(ref_m.sum()), dtype=bool)
        pos_c = np.zeros(0, dtype=np.int64)
    else:
        pos = np.searchsorted(ids_sorted, nids[ref_m])
        pos_c = np.minimum(pos, len(ids_sorted) - 1)
        ok = ids_sorted[pos_c] == nids[ref_m]
    mt = t.filter(pa.array(role == _OSM_META))
    meta = {
        int(w): (u, nm, d, tg)
        for w, u, nm, d, tg in zip(
            mt["way_id"].to_pylist(), mt["user"].to_pylist(),
            mt["name"].to_pylist(), mt["dtg"].to_pylist(),
            mt["tags"].to_pylist(),
        )
    }
    if len(ids_sorted) == 0:
        hit = np.zeros(0, dtype=np.int64)
    else:
        hit = pos_c[ok]
    return _osm_ways_from_parts(
        t["way_id"].to_numpy(zero_copy_only=False)[ref_m][ok],
        t["seq"].to_numpy(zero_copy_only=False)[ref_m][ok],
        lon_sorted[hit],
        lat_sorted[hit],
        meta,
    )


class _OsmParse:
    """Actor-style map_batches callable: parse each path in its own task."""

    def __init__(self, mode: str):
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = {
            "nodes": _parse_osm_nodes,
            "union": _parse_osm_union,
            "ways_single": _parse_osm_ways_single,
        }[self.mode]
        tables = [fn(p) for p in batch["path"].to_pylist()]
        return pa.concat_tables(tables)  # batch_size=1 over ≥1 path


def read_osm(
    path,
    entity: str = "nodes",
    broadcast_limit_bytes: int = 64 * 1024 * 1024,
    num_partitions: int = 16,
    n_shards: int = 32,
) -> ray.data.Dataset:
    """OpenStreetMap XML converter (geomesa-convert-osm analog).

    ``path``: one ``.osm`` file, a directory of them, or a list. The XML
    parse runs inside Ray tasks (one per file) — the driver never holds
    node maps or row lists. ``entity`` selects:

    - ``"nodes"``: each file parses independently to Point rows.
    - ``"ways"``: ``<nd ref=...>`` node references resolve to LineStrings.
      A single file resolves in-task (extracts are self-contained); a
      multi-file extract resolves through the distributed nodes⨝refs
      path: node coords broadcast (``ray.put`` once, ``searchsorted`` per
      batch) while they fit ``broadcast_limit_bytes``, else a hash
      ``Dataset.join`` over ``num_partitions``; ways then reassemble in a
      bounded ``way_id % n_shards`` shuffle (vectorized lexsort+segment
      kernel per shard — never one Python call per way).
    """
    if entity not in ("nodes", "ways"):
        raise ValueError("entity must be 'nodes' or 'ways'")
    paths = _osm_paths(path)
    if not paths:
        raise ValueError(f"no .osm files under {path!r}")
    parts = ray.data.from_arrow(
        pa.table({"path": pa.array(paths, pa.string())})
    ).repartition(len(paths))

    if entity == "nodes":
        return parts.map_batches(
            _OsmParse("nodes"), batch_size=1, batch_format="pyarrow"
        )
    if len(paths) == 1:
        return parts.map_batches(
            _OsmParse("ways_single"), batch_size=1, batch_format="pyarrow"
        )
    return _osm_ways_distributed(
        parts, broadcast_limit_bytes, num_partitions, n_shards
    )


def _osm_ways_distributed(
    parts: ray.data.Dataset,
    broadcast_limit_bytes: int,
    num_partitions: int,
    n_shards: int,
) -> ray.data.Dataset:
    """Multi-file ways arm: parse once (materialized union blocks), then
    nodes⨝refs resolve + bounded-shard reassembly."""
    from geomesa_ray.stages.dedup import _drop_empty_blocks

    parsed = parts.map_batches(
        _OsmParse("union"), batch_size=1, batch_format="pyarrow"
    ).materialize()  # parse each file ONCE; blocks spill to plasma

    def _coords(b: pa.Table) -> pa.Table:
        m = _pc_equal_i8(b["role"], _OSM_NODE)
        t = b.filter(m)
        return t.select(["nid", "lon", "lat"])

    def _refs(b: pa.Table) -> pa.Table:
        t = b.filter(_pc_equal_i8(b["role"], _OSM_REF))
        return t.select(["way_id", "seq", "nid"])

    def _meta(b: pa.Table) -> pa.Table:
        t = b.filter(_pc_equal_i8(b["role"], _OSM_META))
        return t.select(["way_id", "user", "name", "dtg", "tags"])

    coords = parsed.map_batches(_coords, batch_format="pyarrow").materialize()
    refs = parsed.map_batches(_refs, batch_format="pyarrow")

    if coords.size_bytes() <= broadcast_limit_bytes:
        # broadcast resolve: assemble the sorted coord arrays in a remote
        # task from block refs (the driver never holds the node table)
        blocks = [
            ref
            for bund in coords.iter_internal_ref_bundles()
            for ref, m in bund.blocks
            if m.num_rows
        ]

        @ray.remote
        def _build(*tbls):
            if not tbls:
                e = np.zeros(0, dtype=np.int64)
                return e, e.astype(np.float64), e.astype(np.float64)
            t = pa.concat_tables(list(tbls))
            ids = t["nid"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            return (
                ids[order],
                t["lon"].to_numpy(zero_copy_only=False)[order],
                t["lat"].to_numpy(zero_copy_only=False)[order],
            )

        lookup_ref = _build.remote(*blocks)

        def _resolve(b: pa.Table) -> pa.Table:
            from geomesa_ray.stages.join import _resolve_broadcast

            ids_s, lon_s, lat_s = _resolve_broadcast(lookup_ref)
            nid = b["nid"].to_numpy(zero_copy_only=False)
            if len(ids_s) == 0:
                ok = np.zeros(len(nid), dtype=bool)
                keep = np.zeros(0, dtype=np.int64)
            else:
                pos = np.searchsorted(ids_s, nid)
                pos_c = np.minimum(pos, len(ids_s) - 1)
                ok = ids_s[pos_c] == nid
                keep = pos_c[ok]
            t = b.filter(pa.array(ok))
            return pa.table({
                "way_id": t["way_id"],
                "seq": t["seq"],
                "lon": pa.array(lon_s[keep], pa.float64()),
                "lat": pa.array(lat_s[keep], pa.float64()),
            })

        resolved = refs.map_batches(_resolve, batch_format="pyarrow")
    else:
        refs_schema = pa.schema([
            ("way_id", pa.int64()), ("seq", pa.int64()), ("nid", pa.int64())
        ])
        coords_schema = pa.schema([
            ("nid", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64())
        ])

        # adjacent extracts repeat boundary nodes: dedup coords by nid
        # BEFORE the join, or each duplicate would emit an extra resolved
        # row per ref (doubled LineString vertices — the broadcast arm's
        # searchsorted picks exactly one, and the two arms must agree)
        def _coord_shard(b: pa.Table) -> pa.Table:
            nid = b["nid"].to_numpy(zero_copy_only=False)
            return b.append_column(
                "__shard__", pa.array(nid % 64, pa.int64())
            )

        def _coord_dedup(group: pa.Table) -> pa.Table:
            from geomesa_ray.stages.dedup import _first_per_key

            return _first_per_key(
                group.drop_columns(["__shard__"]), "nid", "nid"
            )

        coords_uniq = (
            coords.map_batches(_coord_shard, batch_format="pyarrow")
            .groupby("__shard__")
            .map_groups(_coord_dedup, batch_format="pyarrow")
        )
        resolved = _drop_empty_blocks(refs, refs_schema).join(
            _drop_empty_blocks(coords_uniq, coords_schema),
            join_type="inner",
            num_partitions=num_partitions,
            on=("nid",),
        ).map_batches(
            lambda b: b.select(["way_id", "seq", "lon", "lat"]),
            batch_format="pyarrow",
        )

    # bounded-fan-out reassembly: one way_id%n_shards shuffle, vectorized
    # per-shard kernel (never one Python group call per way)
    def _tag_ref(b: pa.Table) -> pa.Table:
        w = b["way_id"].to_numpy(zero_copy_only=False)
        n = len(b)
        return pa.table({
            "shard": pa.array(w % n_shards, pa.int64()),
            "role": pa.array(np.full(n, _OSM_REF, np.int8()), pa.int8()),
            "way_id": b["way_id"],
            "seq": b["seq"],
            "lon": b["lon"],
            "lat": b["lat"],
            "user": pa.nulls(n, pa.string()),
            "name": pa.nulls(n, pa.string()),
            "dtg": pa.nulls(n, pa.string()),
            "tags": pa.nulls(n, pa.string()),
        })

    def _tag_meta(b: pa.Table) -> pa.Table:
        w = b["way_id"].to_numpy(zero_copy_only=False)
        n = len(b)
        return pa.table({
            "shard": pa.array(w % n_shards, pa.int64()),
            "role": pa.array(np.full(n, _OSM_META, np.int8()), pa.int8()),
            "way_id": b["way_id"],
            "seq": pa.array(np.full(n, -1, np.int64()), pa.int64()),
            "lon": pa.nulls(n, pa.float64()),
            "lat": pa.nulls(n, pa.float64()),
            "user": b["user"],
            "name": b["name"],
            "dtg": b["dtg"],
            "tags": b["tags"],
        })

    meta = parsed.map_batches(_meta, batch_format="pyarrow")
    union = resolved.map_batches(_tag_ref, batch_format="pyarrow").union(
        meta.map_batches(_tag_meta, batch_format="pyarrow")
    )

    def _assemble(group: pa.Table) -> pa.Table:
        role = group["role"].to_numpy(zero_copy_only=False)
        rm = role == _OSM_REF
        mt = group.filter(pa.array(role == _OSM_META))
        meta_d = {
            int(w): (u, nm, d, tg)
            for w, u, nm, d, tg in zip(
                mt["way_id"].to_pylist(), mt["user"].to_pylist(),
                mt["name"].to_pylist(), mt["dtg"].to_pylist(),
                mt["tags"].to_pylist(),
            )
        }
        return _osm_ways_from_parts(
            group["way_id"].to_numpy(zero_copy_only=False)[rm],
            group["seq"].to_numpy(zero_copy_only=False)[rm],
            group["lon"].to_numpy(zero_copy_only=False)[rm],
            group["lat"].to_numpy(zero_copy_only=False)[rm],
            meta_d,
        )

    return union.groupby("shard").map_groups(
        _assemble, batch_format="pyarrow"
    )


def read_jsonl(
    paths: str | list[str],
    spec: str | None = None,
    infer_sample: int = 100,
) -> "tuple[ray.data.Dataset, str]":
    """JSON-lines converter (geomesa-convert-json JsonConverter.scala
    analog; jsonl is also the lingua franca of LLM-corpus interchange):
    one JSON object per line → (Dataset typed by an SFT spec, the spec
    used). Ray's arrow-native ``read_json`` does the distributed parse;
    SFT inference then types string-ish columns exactly like
    :func:`read_delimited` (timestamps get the anchored UTC-suffix strip
    before the zoneless cast)."""
    import pyarrow.compute as pc

    raw = ray.data.read_json(paths)
    if spec is None:
        sample = raw.limit(infer_sample).to_pandas()
        spec = infer_spec(
            {c: [None if v is None else str(v) for v in sample[c]]
             for c in sample.columns}
        )
    schema = parse_spec(spec)

    def typed(batch: pa.Table) -> pa.Table:
        out = {}
        for field in schema:
            if field.name not in batch.schema.names:
                out[field.name] = pa.nulls(len(batch), field.type)
                continue
            col = batch[field.name]
            if pa.types.is_timestamp(field.type):
                strs = pc.replace_substring_regex(
                    pc.cast(col, pa.string()), r"(Z|\+00:00)$", ""
                )
                naive = pc.cast(strs, pa.timestamp(field.type.unit))
                out[field.name] = (
                    pc.assume_timezone(naive, field.type.tz)
                    if field.type.tz else naive
                )
            else:
                out[field.name] = pc.cast(col, field.type)
        return pa.table(out)

    return raw.map_batches(typed, batch_format="pyarrow"), spec
