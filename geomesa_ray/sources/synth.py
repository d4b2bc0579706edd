"""Deterministic synthetic web-page + polygon tables (seeded; no external data).

Implements the FIXTURES.md schemas: a Common-Crawl-style ``pages`` table
(url, warc_ts, html, text, lang) whose html embeds geotags that the extract
stage must recover exactly, and a ``polygons`` table (poly_id, name,
geom_wkb, category) of admin-cell-like rectangles covering the hotspots plus
the DE-9IM fixture set.

Point distribution (skew by design): ~70% in 5 urban hotspots with one
dominant cell, ~30% uniform, plus pinned edge rows (lon=±180, lat=±90,
normalization bin boundaries, rows with no geotag, malformed rows).

Same seed → byte-identical tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomesa_ray.geometry.base import Polygon, box
from geomesa_ray.geometry.wkb import to_wkb

HOTSPOTS = [
    # (lon, lat, weight) — first hotspot dominates to create a hot cell
    (-74.006, 40.7128, 0.30),
    (2.3522, 48.8566, 0.15),
    (139.6917, 35.6895, 0.10),
    (-0.1276, 51.5072, 0.10),
    (77.209, 28.6139, 0.05),
]
UNIFORM_WEIGHT = 0.30

LANGS = ["en", "de", "fr", "es", "pt", "ja", "zh", "ru"]

_WORDS = (
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore"
).split()

# epoch ms for 2020-12-01T00:00:00Z .. 2021-01-15T00:00:00Z (leap-year span,
# crosses weekly Z3 bins and the year boundary; Z3IndexTest.scala:38-47 analog)
TS_LO = 1606780800000
TS_HI = 1610668800000


def _gen_points(n: int, rng: np.random.Generator):
    """Deterministic skewed lon/lat, rounded to 6 decimals (geotag precision)."""
    kinds = rng.random(n)
    lon = np.empty(n)
    lat = np.empty(n)
    acc = 0.0
    assigned = np.zeros(n, dtype=bool)
    for hx, hy, w in HOTSPOTS:
        sel = (~assigned) & (kinds < acc + w)
        acc += w
        m = int(sel.sum())
        lon[sel] = hx + rng.normal(0, 0.05, m)
        lat[sel] = hy + rng.normal(0, 0.05, m)
        assigned |= sel
    rest = ~assigned
    m = int(rest.sum())
    lon[rest] = rng.uniform(-180, 180, m)
    lat[rest] = rng.uniform(-90, 90, m)
    np.clip(lon, -180, 180, out=lon)
    np.clip(lat, -90, 90, out=lat)
    return np.round(lon, 6), np.round(lat, 6)


def generate_pages(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Build the pages table deterministically.

    ``start`` offsets the row index so sharded generation yields globally
    unique urls (shard k covers rows [start, start+n)).
    """
    rng = np.random.default_rng(seed)
    lon, lat = _gen_points(n, rng)

    # pinned edge rows at the front of the whole table (if n is large enough)
    edges = [
        (180.0, 90.0), (-180.0, -90.0), (180.0, -90.0), (-180.0, 90.0),
        (0.0, 0.0),
        # normalization bin boundary: lon exactly at a bin edge for 31-bit curve
        (360.0 * (1 << 20) / (1 << 31) - 180.0, 0.0),
    ]
    if start == 0:
        for i, (ex, ey) in enumerate(edges):
            if i < n:
                lon[i], lat[i] = ex, ey

    idx = np.arange(start, start + n, dtype=np.int64)
    ts = TS_LO + (idx * 7_654_321) % (TS_HI - TS_LO)
    # pin some rows to 2020-12-31 (leap-year / year-boundary edge)
    dec31 = 1609372800000  # 2020-12-31T00:00:00Z
    sel = (idx % 97) == 7
    ts[sel] = dec31 + (idx[sel] % 86_400_000)
    urls = [f"https://site{i % 1000}.example/page/{i}" for i in idx]
    langs = [LANGS[(i * 31) % len(LANGS)] for i in idx]
    texts = [
        f"page {i} " + " ".join(_WORDS[(i + j) % len(_WORDS)] for j in range((i % 13) + 3))
        for i in idx
    ]

    # geotag format mix (Common-Crawl pages carry several conventions):
    # 0-8 geo.position meta (45%), 9-11 ICBM meta (15%), 12-14 microdata
    # itemprop (15%), 15 og: meta pair (5%), 16 JSON-LD GeoCoordinates (5%),
    # 17-18 none (10%), 19 malformed (5%)
    kind = (idx * 131) % 20
    htmls = []
    for j in range(n):
        k = kind[j]
        body = f"<p>{texts[j]}</p>"
        if k < 9:
            geo = f'<meta name="geo.position" content="{lat[j]:.6f};{lon[j]:.6f}">'
            h = f"<html><head>{geo}</head><body>{body}</body></html>"
        elif k < 12:
            geo = f'<meta name="ICBM" content="{lat[j]:.6f}, {lon[j]:.6f}">'
            h = f"<html><head>{geo}</head><body>{body}</body></html>"
        elif k < 15:
            geo = (
                f'<span itemprop="latitude">{lat[j]:.6f}</span>'
                f'<span itemprop="longitude">{lon[j]:.6f}</span>'
            )
            h = f"<html><head></head><body>{geo}{body}</body></html>"
        elif k < 16:
            geo = (
                f'<meta property="og:latitude" content="{lat[j]:.6f}">'
                f'<meta property="og:longitude" content="{lon[j]:.6f}">'
            )
            h = f"<html><head>{geo}</head><body>{body}</body></html>"
        elif k < 17:
            geo = (
                '<script type="application/ld+json">{"@type":"GeoCoordinates",'
                f'"latitude":{lat[j]:.6f},"longitude":{lon[j]:.6f}}}</script>'
            )
            h = f"<html><head>{geo}</head><body>{body}</body></html>"
        elif k < 19:
            h = f"<html><head></head><body>{body}</body></html>"
        else:
            geo = '<meta name="geo.position" content="not;numbers">'
            h = f"<html><head>{geo}</head><body>{body}</body></html>"
        htmls.append(h.encode())

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("ms")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def expected_geo(table: pa.Table) -> pa.Table:
    """Oracle: the geotag each page's html encodes (None when absent/bad).

    Used only by tests — computed from the same generator parameters, not by
    running the engine.
    """
    import re

    meta = re.compile(rb'geo\.position" content="(-?\d+\.\d+);(-?\d+\.\d+)"')
    icbm = re.compile(rb'ICBM" content="(-?\d+\.\d+), (-?\d+\.\d+)"')
    lat_r = re.compile(rb'itemprop="latitude">(-?\d+\.\d+)<')
    lon_r = re.compile(rb'itemprop="longitude">(-?\d+\.\d+)<')
    og_lat = re.compile(rb'og:latitude" content="(-?\d+\.\d+)"')
    og_lon = re.compile(rb'og:longitude" content="(-?\d+\.\d+)"')
    ld_lat = re.compile(rb'"latitude":(-?\d+\.\d+)')
    ld_lon = re.compile(rb'"longitude":(-?\d+\.\d+)')
    lats, lons = [], []
    for h in table["html"].to_pylist():
        got = None
        m = meta.search(h) or icbm.search(h)
        if m:
            got = (float(m.group(1)), float(m.group(2)))
        else:
            for la, lo in ((lat_r, lon_r), (og_lat, og_lon), (ld_lat, ld_lon)):
                m1, m2 = la.search(h), lo.search(h)
                if m1 and m2:
                    got = (float(m1.group(1)), float(m2.group(1)))
                    break
        lats.append(got[0] if got else None)
        lons.append(got[1] if got else None)
    return table.append_column("lat", pa.array(lats, pa.float64())).append_column(
        "lon", pa.array(lons, pa.float64())
    )


def generate_polygons(n_admin: int = 1000, seed: int = 43) -> pa.Table:
    """Admin-cell-like polygon table covering hotspots + fixture polygons."""
    rng = np.random.default_rng(seed)
    polys: list[tuple[str, str, Polygon, str]] = []

    # DE-9IM fixture polygons (SparkSQLSpatialRelationshipsTest.scala:65-71)
    fixtures = {
        "boxRef": box(0, 0, 10, 10),
        "int": box(1, 1, 2, 2),
        "intEdge": box(0, 1, 1, 2),
        "overlap": box(-1, 1, 1, 2),
        "extEdge": box(-1, 1, 0, 2),
        "ext": box(-2, 1, -1, 2),
        "corner": box(-1, -1, 0, 0),
    }
    for name, g in fixtures.items():
        polys.append((f"fix_{name}", name, g, "fixture"))

    # whole-world polygon (WholeWorldPolygon analog)
    polys.append(("world", "world", box(-180, -90, 180, 90), "world"))

    # antimeridian-spanning pair (represented as a multipolygon-ish two boxes;
    # kept as two rows so PIP stays exact)
    polys.append(("am_east", "antimeridian-east", box(179.0, -10, 180.0, 10), "antimeridian"))
    polys.append(("am_west", "antimeridian-west", box(-180.0, -10, -179.0, 10), "antimeridian"))

    # admin cells: cluster around hotspots (70%) + uniform (30%)
    for i in range(n_admin):
        if rng.random() < 0.7:
            hx, hy, _ = HOTSPOTS[int(rng.integers(0, len(HOTSPOTS)))]
            cx = hx + rng.normal(0, 0.5)
            cy = hy + rng.normal(0, 0.5)
        else:
            cx = rng.uniform(-179, 179)
            cy = rng.uniform(-89, 89)
        w = rng.uniform(0.02, 0.5)
        h = rng.uniform(0.02, 0.5)
        xmin, xmax = max(cx - w, -180.0), min(cx + w, 180.0)
        ymin, ymax = max(cy - h, -90.0), min(cy + h, 90.0)
        # ~10% non-rectangular: clip one corner to make a pentagon
        if i % 10 == 0:
            dx, dy = (xmax - xmin) * 0.4, (ymax - ymin) * 0.4
            g = Polygon(
                [
                    (xmin + dx, ymin), (xmax, ymin), (xmax, ymax),
                    (xmin, ymax), (xmin, ymin + dy), (xmin + dx, ymin),
                ]
            )
        else:
            g = box(xmin, ymin, xmax, ymax)
        polys.append((f"adm_{i}", f"admin cell {i}", g, "admin"))

    return pa.table(
        {
            "poly_id": pa.array([p[0] for p in polys], pa.string()),
            "name": pa.array([p[1] for p in polys], pa.string()),
            "geom_wkb": pa.array([to_wkb(p[2]) for p in polys], pa.binary()),
            "category": pa.array([p[3] for p in polys], pa.string()),
        }
    )


def write_pages_parquet(path: str, n: int, seed: int = 42, shard_rows: int = 250_000):
    """Write a sharded pages table: one file per input shard (resume unit)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    files = []
    for shard, start in enumerate(range(0, n, shard_rows)):
        rows = min(shard_rows, n - start)
        # shard determinism: seed derived from (seed, shard)
        t = generate_pages(rows, seed=seed * 100_003 + shard, start=start)
        f = os.path.join(path, f"pages-{shard:05d}.parquet")
        pq.write_table(t, f)
        files.append(f)
    return files
