"""Additional exporters: GML 2/3, ESRI Shapefile, Leaflet HTML.

Reference surface: ExportFormat.scala:56-112 enumerates Arrow, Avro, Bin,
CSV/TSV, GeoJSON, GML2/GML3, Leaflet, ORC, Parquet, Shapefile; the
remaining three land here (the rest live in stages/export.py /
sources/avro.py). All writers stream ``iter_batches`` — the driver holds
one batch at a time, never the dataset.

The Shapefile writer/reader implements the public ESRI whitepaper layout
(.shp geometry records + .shx index + dBase-III .dbf attributes) for
Point / PolyLine / Polygon shapes — enough for round-trip parity tests
with the reference's ShapefileExporter.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pyarrow as pa
import ray.data

from geomesa_ray.geometry.base import LineString, Point, Polygon
from geomesa_ray.geometry.wkb import from_wkb


# ---------------------------------------------------------------------------
# GML
# ---------------------------------------------------------------------------

def _xml_escape(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_gml(ds: ray.data.Dataset, path: str, version: int = 3,
              lon_col: str = "lon", lat_col: str = "lat",
              feature_type: str = "feature") -> int:
    """GML 2 or 3 FeatureCollection of point features (GmlExporter analog;
    GML2 uses gml:coordinates "x,y", GML3 gml:pos "y x" per the spec's
    axis order). Returns feature count."""
    assert version in (2, 3)
    ns = "http://www.opengis.net/gml" + ("/3.2" if version == 3 else "")
    n = 0
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write(f'<gml:FeatureCollection xmlns:gml="{ns}">\n')
        for batch in ds.iter_batches(batch_format="pyarrow"):
            cols = [c for c in batch.schema.names if c not in (lon_col, lat_col)]
            lons = batch[lon_col].to_pylist()
            lats = batch[lat_col].to_pylist()
            other = {c: batch[c].to_pylist() for c in cols}
            for i in range(len(batch)):
                f.write(f"  <gml:featureMember><{feature_type}>\n")
                for c in cols:
                    v = other[c][i]
                    if v is not None:
                        f.write(f"    <{c}>{_xml_escape(v)}</{c}>\n")
                if version == 3:
                    f.write(
                        '    <geom><gml:Point srsName="urn:ogc:def:crs:EPSG::4326">'
                        f"<gml:pos>{lats[i]!r} {lons[i]!r}</gml:pos></gml:Point></geom>\n"
                    )
                else:
                    f.write(
                        '    <geom><gml:Point srsName="EPSG:4326">'
                        f"<gml:coordinates>{lons[i]!r},{lats[i]!r}</gml:coordinates>"
                        "</gml:Point></geom>\n"
                    )
                f.write(f"  </{feature_type}></gml:featureMember>\n")
                n += 1
        f.write("</gml:FeatureCollection>\n")
    return n


# ---------------------------------------------------------------------------
# Shapefile
# ---------------------------------------------------------------------------

_SHAPE_TYPES = {"point": 1, "polyline": 3, "polygon": 5}


def _shp_record(geom) -> tuple[int, bytes]:
    """(shape_type, record content bytes) for one geometry."""
    if isinstance(geom, Point):
        return 1, struct.pack("<i2d", 1, geom.x, geom.y)
    if isinstance(geom, LineString):
        rings = [geom.coords]
        stype = 3
    elif isinstance(geom, Polygon):
        # shell must be clockwise, holes counter-clockwise per the spec
        shell = geom.shell if _ring_cw(geom.shell) else geom.shell[::-1]
        rings = [shell] + [h if not _ring_cw(h) else h[::-1] for h in geom.holes]
        stype = 5
    else:
        raise NotImplementedError(f"shapefile: {type(geom).__name__}")
    pts = np.vstack(rings)
    xmin, ymin = pts.min(axis=0)
    xmax, ymax = pts.max(axis=0)
    parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
    body = struct.pack("<i4d", stype, xmin, ymin, xmax, ymax)
    body += struct.pack("<2i", len(rings), len(pts))
    body += parts.tobytes()
    body += pts.astype("<f8").tobytes()
    return stype, body


def _ring_cw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))) > 0


def _dbf_field(defs_entry, v) -> bytes:
    name, typ, ln, dec = defs_entry
    if typ == b"N":
        s = "" if v is None else (f"{v:.{dec}f}" if dec else str(int(v)))
        return s.rjust(ln)[:ln].encode()
    s = "" if v is None else str(v)
    # pad/truncate in BYTES: the header declares a byte width, and
    # multi-byte UTF-8 padded by characters would shift every following
    # record; re-decode the cut so a split codepoint is dropped
    b = s.encode("utf-8", "replace")[:ln]
    b = b.decode("utf-8", "ignore").encode("utf-8")
    return b.ljust(ln)


def write_shapefile(ds: ray.data.Dataset, base_path: str,
                    geom_col: str = "geom_wkb") -> int:
    """Dataset with a WKB geometry column + attribute columns → .shp/.shx/.dbf
    triple at ``base_path`` (no extension). Attributes: int64 → N(18),
    float64 → N(24,9), everything else → C(64). Returns record count.

    Streams: record bodies spool to temp files batch-by-batch (the format
    needs counts/bbox in its headers, a classic two-pass), so the driver
    holds one batch at a time — never the dataset."""
    import shutil
    import tempfile

    shape_type = None
    attr_names: list[str] | None = None
    defs: list[tuple] = []
    n = 0
    offset_words = 50
    xmin = ymin = float("inf")
    xmax = ymax = float("-inf")
    with tempfile.TemporaryFile() as shp_spool, \
            tempfile.TemporaryFile() as shx_spool, \
            tempfile.TemporaryFile() as dbf_spool:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            cols = [c for c in batch.schema.names if c != geom_col]
            if attr_names is None:
                attr_names = cols
                for name, t in zip(cols, (batch.schema.field(c).type for c in cols)):
                    if pa.types.is_integer(t):
                        defs.append((name[:10], b"N", 18, 0))
                    elif pa.types.is_floating(t):
                        defs.append((name[:10], b"N", 24, 9))
                    else:
                        defs.append((name[:10], b"C", 64, 0))
            data = {c: batch[c].to_pylist() for c in cols}
            for i, wkb in enumerate(batch[geom_col].to_pylist()):
                stype, body = _shp_record(from_wkb(wkb))
                if shape_type is None:
                    shape_type = stype
                elif stype != shape_type:
                    raise ValueError("mixed shape types in one shapefile")
                n += 1
                words = len(body) // 2
                shp_spool.write(struct.pack(">2i", n, words) + body)
                shx_spool.write(struct.pack(">2i", offset_words, words))
                offset_words += 4 + words
                if stype == 1:
                    x, y = struct.unpack_from("<2d", body, 4)
                    bx0, by0, bx1, by1 = x, y, x, y
                else:
                    bx0, by0, bx1, by1 = struct.unpack_from("<4d", body, 4)
                xmin, ymin = min(xmin, bx0), min(ymin, by0)
                xmax, ymax = max(xmax, bx1), max(ymax, by1)
                dbf_spool.write(b" ")
                for d, c in zip(defs, cols):
                    dbf_spool.write(_dbf_field(d, data[c][i]))
        if n == 0:
            raise ValueError("no records to write")

        def header(total_words: int) -> bytes:
            return (
                struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, total_words)
                + struct.pack("<2i", 1000, shape_type)
                + struct.pack("<8d", xmin, ymin, xmax, ymax, 0, 0, 0, 0)
            )

        for spool, path, hdr in (
            (shp_spool, base_path + ".shp", header(offset_words)),
            (shx_spool, base_path + ".shx", header(50 + 4 * n)),
        ):
            spool.seek(0)
            with open(path, "wb") as f:
                f.write(hdr)
                shutil.copyfileobj(spool, f)

        rec_len = 1 + sum(d[2] for d in defs)
        hdr_len = 32 + 32 * len(defs) + 1
        dbf_spool.seek(0)
        with open(base_path + ".dbf", "wb") as f:
            f.write(struct.pack("<B3B i 2H 20x", 3, 24, 1, 1, n, hdr_len, rec_len))
            for name, typ, ln, dec in defs:
                f.write(struct.pack("<11s c 4x B B 14x", name.encode(), typ, ln, dec))
            f.write(b"\x0d")
            shutil.copyfileobj(dbf_spool, f)
            f.write(b"\x1a")
    return n


def read_shapefile(base_path: str) -> pa.Table:
    """Round-trip reader: .shp + .dbf → Arrow table with ``geom_wkb``."""
    from geomesa_ray.geometry.wkb import to_wkb

    with open(base_path + ".shp", "rb") as f:
        data = f.read()
    geoms = []
    pos = 100
    while pos < len(data):
        _, words = struct.unpack_from(">2i", data, pos)
        pos += 8
        stype = struct.unpack_from("<i", data, pos)[0]
        if stype == 1:
            x, y = struct.unpack_from("<2d", data, pos + 4)
            geoms.append(Point(x, y))
        elif stype in (3, 5):
            nparts, npts = struct.unpack_from("<2i", data, pos + 36)
            parts = np.frombuffer(data, "<i4", nparts, pos + 44)
            pts = np.frombuffer(
                data, "<f8", npts * 2, pos + 44 + 4 * nparts
            ).reshape(-1, 2)
            bounds = np.concatenate([parts, [npts]])
            rings = [pts[bounds[k]: bounds[k + 1]] for k in range(nparts)]
            if stype == 3:
                geoms.append(LineString(rings[0]))
            else:
                geoms.append(Polygon(rings[0], holes=rings[1:]))
        else:
            raise NotImplementedError(f"shape type {stype}")
        pos += 2 * words

    with open(base_path + ".dbf", "rb") as f:
        dbf = f.read()
    nrec, hdr_len, rec_len = struct.unpack_from("<i2H", dbf, 4)
    defs = []
    p = 32
    while dbf[p] != 0x0D:
        name = dbf[p: p + 11].split(b"\x00")[0].decode()
        typ = chr(dbf[p + 11])
        ln = dbf[p + 16]
        dec = dbf[p + 17]
        defs.append((name, typ, ln, dec))
        p += 32
    cols: dict[str, list] = {d[0]: [] for d in defs}
    for r in range(nrec):
        off = hdr_len + r * rec_len + 1
        for name, typ, ln, dec in defs:
            raw = dbf[off: off + ln].decode("utf-8", "replace").strip()
            off += ln
            if typ == "N":
                if raw == "":
                    cols[name].append(None)
                elif dec:
                    cols[name].append(float(raw))
                else:
                    cols[name].append(int(raw))
            else:
                cols[name].append(raw if raw else None)
    out = {k: pa.array(v) for k, v in cols.items()}
    out["geom_wkb"] = pa.array([to_wkb(g) for g in geoms], pa.binary())
    return pa.table(out)


# ---------------------------------------------------------------------------
# Leaflet
# ---------------------------------------------------------------------------

_LEAFLET_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>html,body,#map{{height:100%;margin:0}}</style></head>
<body><div id="map"></div><script>
var data = {geojson};
var map = L.map('map');
L.tileLayer('https://tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png',
            {{maxZoom: 19}}).addTo(map);
var layer = L.geoJSON(data, {{
  pointToLayer: function (f, ll) {{ return L.circleMarker(ll, {{radius: 4}}); }},
  onEachFeature: function (f, l) {{
    l.bindPopup(Object.entries(f.properties || {{}})
      .map(function (kv) {{ return kv[0] + ': ' + kv[1]; }}).join('<br>'));
  }}
}}).addTo(map);
map.fitBounds(layer.getBounds());
</script></body></html>
"""


def write_leaflet(ds: ray.data.Dataset, path: str, lon_col: str = "lon",
                  lat_col: str = "lat", title: str = "geomesa_ray export",
                  max_features: int = 10_000) -> int:
    """Self-contained Leaflet HTML with the features embedded as GeoJSON
    (LeafletMapExporter analog). Bounded by ``max_features`` — a map page
    is a PREVIEW artifact, not a data sink."""
    feats = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        cols = [c for c in batch.schema.names if c not in (lon_col, lat_col)]
        lons = batch[lon_col].to_pylist()
        lats = batch[lat_col].to_pylist()
        props = {c: batch[c].to_pylist() for c in cols}
        for i in range(len(batch)):
            feats.append(
                {
                    "type": "Feature",
                    "geometry": {"type": "Point", "coordinates": [lons[i], lats[i]]},
                    "properties": {
                        c: (props[c][i] if not isinstance(props[c][i], bytes) else None)
                        for c in cols
                    },
                }
            )
            if len(feats) >= max_features:
                break
        if len(feats) >= max_features:
            break
    fc = {"type": "FeatureCollection", "features": feats}
    with open(path, "w") as f:
        f.write(_LEAFLET_TEMPLATE.format(title=_xml_escape(title),
                                         geojson=json.dumps(fc, default=str)))
    return len(feats)
