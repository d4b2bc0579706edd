"""SFT spec parsing/inference + query guards + enrichment cache."""

import pyarrow as pa
import pytest

from geomesa_ray.pipelines.guards import (
    EnrichmentCache,
    FullTableScanGuard,
    GraduatedSizeGuard,
    QueryRejected,
    SizeTier,
    TemporalBoundGuard,
    check_guards,
)
from geomesa_ray.pipelines.scan import Query
from geomesa_ray.sources.sft import infer_spec, infer_type, parse_spec, to_spec


def test_parse_spec_point_layout():
    s = parse_spec("name:String,track:String,dtg:Date,*geom:Point:srid=4326")
    assert s.field("name").type == pa.string()
    assert s.field("dtg").type == pa.timestamp("ms", tz="UTC")
    # reference Parquet point layout: two double columns
    assert s.field("geom_x").type == pa.float64()
    assert s.field("geom_y").type == pa.float64()
    assert s.metadata[b"default_geometry"] == b"geom"


def test_parse_spec_complex_types_roundtrip():
    spec = "tags:List[String],counts:Map[String,Long],n:Integer,*shape:Polygon"
    s = parse_spec(spec)
    assert s.field("tags").type == pa.list_(pa.string())
    assert s.field("counts").type == pa.map_(pa.string(), pa.int64())
    assert s.field("shape").type == pa.binary()  # WKB
    assert s.field("shape").metadata[b"geometry"] == b"Polygon"
    # round-trip
    assert to_spec(s) == "tags:List[String],counts:Map[String,Long],n:Integer,*shape:Polygon"


def test_type_inference():
    assert infer_type(["1", "2", "-3"]) == "Integer"
    assert infer_type(["1", str(2**40)]) == "Long"
    assert infer_type(["1.5", "2"]) == "Double"
    assert infer_type(["true", "False".lower()]) == "Boolean"
    assert infer_type(["2020-12-31", "2021-01-01T10:00:00Z"]) == "Date"
    assert infer_type(["POINT (1 2)", "POINT (3 4)"]) == "Point"
    assert infer_type(["POINT (1 2)", "POLYGON ((0 0, 1 0, 1 1, 0 0))"]) == "Geometry"
    assert infer_type(["abc", "1"]) == "String"
    spec = infer_spec({"a": ["1"], "b": ["x"], "g": ["POINT (0 0)"]})
    assert spec == "a:Integer,b:String,g:Point"


def test_guards():
    empty = Query()
    with pytest.raises(QueryRejected):
        check_guards(empty, [FullTableScanGuard()])
    spatial = Query(bbox=(0, 0, 10, 10))
    check_guards(spatial, [FullTableScanGuard()])  # ok
    with pytest.raises(QueryRejected):
        check_guards(spatial, [TemporalBoundGuard(86400_000)])
    timed = Query(bbox=(0, 0, 10, 10), interval=(0, 3600_000))
    check_guards(timed, [TemporalBoundGuard(86400_000)])

    tiers = [
        SizeTier(max_area_deg2=100.0, max_span_ms=7 * 86400_000),
        SizeTier(max_area_deg2=10_000.0, max_span_ms=86400_000),
    ]
    check_guards(timed, [GraduatedSizeGuard(tiers)])  # 100 deg², 1h
    big = Query(bbox=(-90, -45, 90, 45), interval=(0, 7 * 86400_000))
    with pytest.raises(QueryRejected):  # 16200 deg² beyond all tiers
        check_guards(big, [GraduatedSizeGuard(tiers)])
    mid = Query(bbox=(0, 0, 50, 50), interval=(0, 2 * 86400_000))
    with pytest.raises(QueryRejected):  # 2500 deg² allows only 1 day
        check_guards(mid, [GraduatedSizeGuard(tiers)])


def test_enrichment_cache(ray_session):
    import ray.data

    cache = EnrichmentCache(
        {"en": {"lang_name": "English"}, "de": {"lang_name": "German"}}
    )
    tbl = pa.table({"lang": pa.array(["en", "de", "xx"])})
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            cache.lookup_stage("lang", {"lang_name": pa.string()}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    assert out["lang_name"].tolist() == ["English", "German", None]
