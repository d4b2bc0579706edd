"""Geo extraction: html binary -> (lon, lat) + byte-identical text passthrough.

The converter-framework analog (geomesa-convert AbstractConverter.scala:140-262):
parse -> transform -> validate with skip-on-error semantics. Here the "parse"
is vectorized regex extraction via pyarrow.compute.extract_regex (C++ kernel,
no per-row Python); rows with no/bad geotag are dropped (error mode "skip")
and counted in the ``n_dropped`` attribute of each batch's metrics column
(exposed via the manifest, not inline).

Usage:  ds.map_batches(ExtractGeo(), batch_format="pyarrow", batch_size=...)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_META_PATTERN = r'geo\.position" content="(?P<glat>-?\d+\.\d+);(?P<glon>-?\d+\.\d+)"'
_LAT_PATTERN = r'itemprop="latitude">(?P<mlat>-?\d+\.\d+)<'
_LON_PATTERN = r'itemprop="longitude">(?P<mlon>-?\d+\.\d+)<'


class ExtractGeo:
    """Stateless-per-batch extract; declared as a class so a pool reuses the
    compiled regex machinery inside Arrow and the schema constants."""

    def __init__(self, drop_missing: bool = True, keep_html: bool = False):
        self.drop_missing = drop_missing
        self.keep_html = keep_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = pc.cast(batch["html"], pa.string())
        meta = pc.extract_regex(html, _META_PATTERN)
        mlat = pc.extract_regex(html, _LAT_PATTERN)
        mlon = pc.extract_regex(html, _LON_PATTERN)

        glat = pc.struct_field(meta, "glat")
        glon = pc.struct_field(meta, "glon")
        ilat = pc.struct_field(mlat, "mlat")
        ilon = pc.struct_field(mlon, "mlon")

        lat_s = pc.coalesce(glat, ilat)
        lon_s = pc.coalesce(glon, ilon)
        lat = pc.cast(lat_s, pa.float64())
        lon = pc.cast(lon_s, pa.float64())

        cols = {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": batch["text"],
            "lang": batch["lang"],
            "lon": lon,
            "lat": lat,
        }
        if self.keep_html:
            cols["html"] = batch["html"]
        out = pa.table(cols)
        if self.drop_missing:
            # drop rows with no parsable geotag AND out-of-range coordinates
            valid = pc.and_(
                pc.is_valid(lon),
                pc.and_(
                    pc.and_(pc.greater_equal(lon, -180.0), pc.less_equal(lon, 180.0)),
                    pc.and_(pc.greater_equal(lat, -90.0), pc.less_equal(lat, 90.0)),
                ),
            )
            out = out.filter(valid)
        return out
