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
_ICBM_PATTERN = r'ICBM" content="(?P<ilat>-?\d+\.\d+), (?P<ilon>-?\d+\.\d+)"'
_LAT_PATTERN = r'itemprop="latitude">(?P<mlat>-?\d+\.\d+)<'
_LON_PATTERN = r'itemprop="longitude">(?P<mlon>-?\d+\.\d+)<'
_OG_LAT_PATTERN = r'og:latitude" content="(?P<olat>-?\d+\.\d+)"'
_OG_LON_PATTERN = r'og:longitude" content="(?P<olon>-?\d+\.\d+)"'
_LD_LAT_PATTERN = r'"latitude":(?P<jlat>-?\d+\.\d+)'
_LD_LON_PATTERN = r'"longitude":(?P<jlon>-?\d+\.\d+)'


class ExtractGeo:
    """Stateless-per-batch extract; declared as a class so a pool reuses the
    compiled regex machinery inside Arrow and the schema constants.

    ``error_mode`` mirrors the converter framework's modes
    (AbstractConverter.scala:256-262):
      * ``"skip"``  — drop unparsable rows (default); counts accumulate in
        ``self.n_dropped`` / ``self.n_ok`` (per actor — aggregate via the
        manifest or a stats pass);
      * ``"return"`` — keep unparsable rows with null lon/lat plus an
        ``extract_error`` flag column;
      * ``"raise"`` — raise on the first unparsable row.
    """

    def __init__(self, drop_missing: bool = True, keep_html: bool = False,
                 error_mode: str = "skip"):
        if error_mode not in ("skip", "return", "raise"):
            raise ValueError(error_mode)
        self.drop_missing = drop_missing and error_mode == "skip"
        self.keep_html = keep_html
        self.error_mode = error_mode
        self.n_ok = 0
        self.n_dropped = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = pc.cast(batch["html"], pa.string())
        # precedence: geo.position > ICBM > microdata > og: > JSON-LD —
        # most specific/conventional first (all Arrow RE2 kernels)
        meta = pc.extract_regex(html, _META_PATTERN)
        icbm = pc.extract_regex(html, _ICBM_PATTERN)
        mlat = pc.extract_regex(html, _LAT_PATTERN)
        mlon = pc.extract_regex(html, _LON_PATTERN)
        oglat = pc.extract_regex(html, _OG_LAT_PATTERN)
        oglon = pc.extract_regex(html, _OG_LON_PATTERN)
        ldlat = pc.extract_regex(html, _LD_LAT_PATTERN)
        ldlon = pc.extract_regex(html, _LD_LON_PATTERN)

        lat_s = pc.coalesce(
            pc.struct_field(meta, "glat"),
            pc.struct_field(icbm, "ilat"),
            pc.struct_field(mlat, "mlat"),
            pc.struct_field(oglat, "olat"),
            pc.struct_field(ldlat, "jlat"),
        )
        lon_s = pc.coalesce(
            pc.struct_field(meta, "glon"),
            pc.struct_field(icbm, "ilon"),
            pc.struct_field(mlon, "mlon"),
            pc.struct_field(oglon, "olon"),
            pc.struct_field(ldlon, "jlon"),
        )
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
        # rows with no parsable geotag or out-of-range coordinates
        valid = pc.fill_null(
            pc.and_(
                pc.is_valid(lon),
                pc.and_(
                    pc.and_(pc.greater_equal(lon, -180.0), pc.less_equal(lon, 180.0)),
                    pc.and_(pc.greater_equal(lat, -90.0), pc.less_equal(lat, 90.0)),
                ),
            ),
            False,
        )
        # pc.sum of a zero-row array is null, not 0 — guard the empty batch
        n_bad = len(out) - (pc.sum(pc.cast(valid, pa.int64())).as_py() or 0)
        self.n_ok += len(out) - n_bad
        self.n_dropped += n_bad
        if self.error_mode == "raise" and n_bad:
            bad_url = out.filter(pc.invert(valid))["url"][0].as_py()
            raise ValueError(f"unparsable geotag (first bad url: {bad_url})")
        if self.error_mode == "return":
            return out.append_column("extract_error", pc.invert(valid))
        if self.drop_missing:
            out = out.filter(valid)
        return out
