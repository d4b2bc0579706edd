"""Pluggable registries for converters, exporters and partition schemes.

SPI analog (§2.11): the reference discovers SimpleFeatureConverterFactory /
PartitionSchemeFactory / index implementations via Java SPI
(convert2/SimpleFeatureConverterFactory.scala,
fs/storage/api/PartitionSchemeFactory.scala). Python's idiom is a plain
name → callable registry with a ``register`` decorator; the built-in
formats self-register on import, and downstream code resolves by name so
user extensions slot in without touching engine modules.
"""

from __future__ import annotations

from typing import Callable

_CONVERTERS: dict[str, Callable] = {}
_EXPORTERS: dict[str, Callable] = {}
_PARTITION_SCHEMES: dict[str, Callable] = {}


def register_converter(name: str):
    def deco(fn: Callable) -> Callable:
        _CONVERTERS[name] = fn
        return fn

    return deco


def register_exporter(name: str):
    def deco(fn: Callable) -> Callable:
        _EXPORTERS[name] = fn
        return fn

    return deco


def register_partition_scheme(name: str):
    def deco(fn: Callable) -> Callable:
        _PARTITION_SCHEMES[name] = fn
        return fn

    return deco


_builtins_loaded = False


def _ensure_builtins() -> None:
    """Populate the registries with the built-in formats (idempotent).

    Guarded by an explicit flag — keying on ``_CONVERTERS`` being
    non-empty would silently skip every builtin when a user registers a
    custom converter before the first lookup."""
    global _builtins_loaded
    if _builtins_loaded:
        return
    _builtins_loaded = True
    from geomesa_ray.sources import avro as _avro
    from geomesa_ray.sources import jdbc as _jdbc
    from geomesa_ray.sources import readers as _readers
    from geomesa_ray.stages import export as _export
    from geomesa_ray.stages import export2 as _export2

    # setdefault: an earlier USER registration under a builtin name wins
    for k, v in {
        "geojson": _readers.read_geojson,
        "delimited": _readers.read_delimited,
        "fixed-width": _readers.read_fixed_width,
        "xml": _readers.read_xml,
        "shapefile": _readers.read_shapefile_ds,
        "avro": _avro.read_avro,
        "jdbc": _jdbc.read_sqlite,
        "osm": _readers.read_osm,
        "jsonl": _readers.read_jsonl,
    }.items():
        _CONVERTERS.setdefault(k, v)
    for k, v in {
        "bin": _export.write_bin,
        "arrow": _export.write_arrow_ipc,
        "csv": _export.write_csv,
        "orc": _export.write_orc,
        "geojson": _export.write_geojson,
        "gml": _export2.write_gml,
        "shapefile": _export2.write_shapefile,
        "leaflet": _export2.write_leaflet,
        "avro": _avro.write_avro_file,
    }.items():
        _EXPORTERS.setdefault(k, v)
    from geomesa_ray.stages.encode import cell_of_z2

    _PARTITION_SCHEMES.setdefault("z2-cell", cell_of_z2)


def converter(name: str) -> Callable:
    _ensure_builtins()
    try:
        return _CONVERTERS[name]
    except KeyError:
        raise KeyError(
            f"no converter {name!r}; available: {sorted(_CONVERTERS)}"
        ) from None


def exporter(name: str) -> Callable:
    _ensure_builtins()
    try:
        return _EXPORTERS[name]
    except KeyError:
        raise KeyError(
            f"no exporter {name!r}; available: {sorted(_EXPORTERS)}"
        ) from None


def partition_scheme(name: str) -> Callable:
    _ensure_builtins()
    try:
        return _PARTITION_SCHEMES[name]
    except KeyError:
        raise KeyError(
            f"no partition scheme {name!r}; available: {sorted(_PARTITION_SCHEMES)}"
        ) from None


def available() -> dict[str, list[str]]:
    _ensure_builtins()
    return {
        "converters": sorted(_CONVERTERS),
        "exporters": sorted(_EXPORTERS),
        "partition_schemes": sorted(_PARTITION_SCHEMES),
    }
