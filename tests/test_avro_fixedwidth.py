"""Avro container reader/writer (from-scratch spec implementation) and
fixed-width text converter (geomesa-convert-avro / -fixedwidth analogs)."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.sources.avro import read_avro, read_avro_file, write_avro_file


def _sample_table(n=500):
    rng = np.random.default_rng(3)
    return pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "name": pa.array([f"row-{i}" if i % 7 else None for i in range(n)], pa.string()),
            "score": pa.array(rng.standard_normal(n), pa.float64()),
            "flag": pa.array((np.arange(n) % 3 == 0), pa.bool_()),
            "payload": pa.array([bytes([i % 256, 255 - i % 256]) for i in range(n)], pa.binary()),
            "ts": pa.array(
                (1704067200_000_000 + np.arange(n) * 1_000_003).astype("int64"),
                pa.timestamp("us"),
            ),
            "small": pa.array(np.arange(n, dtype=np.int32), pa.int32()),
        }
    )


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_roundtrip(tmp_path, codec):
    tbl = _sample_table()
    path = str(tmp_path / f"t_{codec}.avro")
    assert write_avro_file(tbl, path, codec=codec) == len(tbl)
    back = read_avro_file(path)
    assert back.schema.names == tbl.schema.names
    for c in tbl.schema.names:
        assert back[c].to_pylist() == tbl[c].to_pylist(), c


def test_avro_negative_and_large_varints(tmp_path):
    tbl = pa.table(
        {
            "v": pa.array(
                [0, -1, 1, -2, 63, 64, -64, -65, 2**40, -(2**40), 2**62, -(2**62)],
                pa.int64(),
            )
        }
    )
    path = str(tmp_path / "v.avro")
    write_avro_file(tbl, path)
    assert read_avro_file(path)["v"].to_pylist() == tbl["v"].to_pylist()


def test_read_avro_dataset_multi_file(ray_session, tmp_path):
    tbl = _sample_table(300)
    for i in range(3):
        write_avro_file(tbl.slice(i * 100, 100), str(tmp_path / f"p{i}.avro"),
                        codec="deflate")
    ds = read_avro(str(tmp_path))
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 300
    assert out["id"].tolist() == list(range(300))
    assert out["name"].iloc[8] == "row-8"
    assert out["name"].iloc[7] is None or out["name"].isna().iloc[7]


def test_read_xml(ray_session, tmp_path):
    xml = """<?xml version="1.0"?>
    <root>
      <rec id="1"><name>alice</name><m><score>3.5</score></m></rec>
      <rec id="2"><name>bob</name><m><score>1.25</score></m></rec>
      <rec id="3"><name/><m><score>9</score></m></rec>
    </root>"""
    p = tmp_path / "r.xml"
    p.write_text(xml)
    from geomesa_ray.sources.readers import read_xml

    ds, spec = read_xml(
        str(p), "rec",
        {"id": "@id", "name": "name", "score": "m/score"},
    )
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [1, 2, 3]
    assert df["name"].tolist()[:2] == ["alice", "bob"]
    assert df["score"].tolist() == [3.5, 1.25, 9.0]
    assert "id" in spec


def test_read_shapefile_ds(ray_session, tmp_path):
    import ray.data

    from geomesa_ray.geometry.base import Point
    from geomesa_ray.geometry.wkb import from_wkb, to_wkb
    from geomesa_ray.sources.readers import read_shapefile_ds
    from geomesa_ray.stages.export2 import write_shapefile

    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "geom_wkb": pa.array(
                [to_wkb(Point(1.0, 2.0)), to_wkb(Point(3.0, 4.0))], pa.binary()
            ),
        }
    )
    base = str(tmp_path / "pts")
    write_shapefile(ray.data.from_arrow(tbl), base)
    out = read_shapefile_ds(base).to_pandas().sort_values("id")
    assert from_wkb(out["geom_wkb"].iloc[1]).x == 3.0


def test_read_fixed_width(ray_session, tmp_path):
    lines = [
        "alice   25 3.50x",
        "bob     31 1.25 ",
        "carol    7 9.00x",
    ]
    p = tmp_path / "fw.txt"
    p.write_text("\n".join(lines) + "\n")
    from geomesa_ray.sources.readers import read_fixed_width

    ds, spec = read_fixed_width(
        str(p),
        fields=[("name", 0, 8), ("age", 8, 3), ("score", 11, 4), ("tag", 15, 1)],
    )
    df = ds.to_pandas().sort_values("name").reset_index(drop=True)
    assert df["name"].tolist() == ["alice", "bob", "carol"]
    assert df["age"].tolist() == [25, 31, 7]
    assert df["score"].tolist() == [3.5, 1.25, 9.0]
    # blank-padded field → null
    assert df["tag"].tolist()[1] is None or df["tag"].isna().iloc[1]
    assert "name" in spec and "age" in spec


def test_registry(ray_session, tmp_path):
    """SPI-analog registries: built-ins resolve by name, user extensions
    register without touching engine modules."""
    import pyarrow as pa

    from geomesa_ray import registry

    avail = registry.available()
    assert "avro" in avail["converters"] and "shapefile" in avail["exporters"]
    # round-trip through registry-resolved converter/exporter
    tbl = pa.table({"i": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "r.avro")
    registry.exporter("avro")(tbl, p)
    back = registry.converter("avro")(p).to_pandas()
    assert sorted(back["i"]) == [1, 2, 3]
    # user extension
    @registry.register_converter("constant")
    def _const(path):
        import ray.data

        return ray.data.from_items([{"x": 1}])

    assert registry.converter("constant")("ignored").count() == 1
    with pytest.raises(KeyError):
        registry.converter("nope")


def test_avro_negative_metadata_block_count_with_size():
    # Avro spec: a negative map/array block count is followed by a varint
    # byte size; other writers emit this form and it must parse.
    import io as _io
    import json as _json

    from geomesa_ray.sources import avro as _avro

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    meta_items = [(b"avro.schema", _json.dumps(schema).encode()),
                  (b"avro.codec", b"null")]
    body = _io.BytesIO()
    for k, v in meta_items:
        _avro._write_long(body, len(k)); body.write(k)
        _avro._write_long(body, len(v)); body.write(v)
    payload = body.getvalue()

    buf = _io.BytesIO()
    buf.write(_avro.MAGIC)
    _avro._write_long(buf, -len(meta_items))   # negative count form
    _avro._write_long(buf, len(payload))       # varint byte size
    buf.write(payload)
    _avro._write_long(buf, 0)                  # end of map
    sync = bytes(range(16))
    buf.write(sync)
    buf.seek(0)
    got_schema, codec, got_sync = _avro._read_header(buf)
    assert got_schema == schema and codec == "null" and got_sync == sync


# ---------------------------------------------------------------------------
# OSM XML converter
# ---------------------------------------------------------------------------

_OSM_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lat="48.0" lon="2.0" user="alice" timestamp="2020-01-01T10:00:00Z">
    <tag k="amenity" v="cafe"/>
    <tag k="name" v="Chez Test"/>
  </node>
  <node id="2" lat="48.1" lon="2.1" user="bob" timestamp="2020-01-02T11:30:00Z"/>
  <node id="3" lat="48.2" lon="2.2" user="bob" timestamp="2020-01-02T12:00:00Z"/>
  <way id="10" user="carol" timestamp="2020-02-01T00:00:00Z">
    <nd ref="1"/>
    <nd ref="2"/>
    <nd ref="3"/>
    <tag k="highway" v="residential"/>
    <tag k="name" v="Rue du Test"/>
  </way>
  <way id="11" user="carol" timestamp="2020-02-02T00:00:00Z">
    <nd ref="1"/>
    <nd ref="999"/>
  </way>
</osm>
"""


def test_osm_nodes(ray_session, tmp_path):
    import json

    from geomesa_ray.sources.readers import read_osm

    p = tmp_path / "test.osm"
    p.write_text(_OSM_XML)
    tbl = pa.concat_tables(
        read_osm(str(p), entity="nodes").iter_batches(batch_format="pyarrow")
    ).sort_by("osm_id")
    assert tbl["osm_id"].to_pylist() == [1, 2, 3]
    assert tbl["lon"].to_pylist() == [2.0, 2.1, 2.2]
    assert tbl["user"].to_pylist() == ["alice", "bob", "bob"]
    assert json.loads(tbl["tags"][0].as_py()) == {
        "amenity": "cafe",
        "name": "Chez Test",
    }
    assert pa.types.is_timestamp(tbl.schema.field("dtg").type)


def test_osm_ways_resolve_linestrings(ray_session, tmp_path):
    from geomesa_ray.sources.readers import read_osm

    p = tmp_path / "test.osm"
    p.write_text(_OSM_XML)
    tbl = pa.concat_tables(
        read_osm(str(p), entity="ways").iter_batches(batch_format="pyarrow")
    ).sort_by("osm_id")
    assert tbl["osm_id"].to_pylist() == [10, 11]
    assert tbl["name"].to_pylist() == ["Rue du Test", None]
    wkt = tbl["geometry_wkt"][0].as_py()
    assert wkt.startswith("LINESTRING") and "2 48" in wkt and "2.2 48.2" in wkt
    # way 11 has a dangling ref -> only 1 resolvable point -> null geometry
    assert tbl["geometry_wkt"][1].as_py() is None

    from geomesa_ray.registry import converter

    assert converter("osm") is read_osm


def test_registry_user_registration_before_first_lookup():
    """A custom converter registered BEFORE any lookup must not suppress
    (or be clobbered by) the builtin population (round-3 review)."""
    import geomesa_ray.registry as reg

    # simulate a fresh import state
    saved = (dict(reg._CONVERTERS), dict(reg._EXPORTERS),
             dict(reg._PARTITION_SCHEMES), reg._builtins_loaded)
    try:
        reg._CONVERTERS.clear(); reg._EXPORTERS.clear()
        reg._PARTITION_SCHEMES.clear(); reg._builtins_loaded = False

        @reg.register_converter("mine")
        def my_conv(path):  # pragma: no cover - identity stub
            return path

        @reg.register_converter("geojson")
        def my_geojson(path):  # overrides the builtin name
            return ("custom", path)

        assert reg.converter("mine") is my_conv
        assert reg.converter("geojson") is my_geojson  # user wins
        assert reg.converter("avro") is not None  # builtins still loaded
    finally:
        reg._CONVERTERS.clear(); reg._CONVERTERS.update(saved[0])
        reg._EXPORTERS.clear(); reg._EXPORTERS.update(saved[1])
        reg._PARTITION_SCHEMES.clear(); reg._PARTITION_SCHEMES.update(saved[2])
        reg._builtins_loaded = saved[3]


_OSM_XML_F1 = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lat="48.0" lon="2.0" user="alice" timestamp="2020-01-01T10:00:00Z"/>
  <node id="2" lat="48.1" lon="2.1" user="bob" timestamp="2020-01-02T11:30:00Z"/>
  <way id="10" user="carol" timestamp="2020-02-01T00:00:00Z">
    <nd ref="1"/>
    <nd ref="2"/>
    <nd ref="3"/>
    <tag k="name" v="Cross-File Way"/>
  </way>
</osm>
"""

_OSM_XML_F2 = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="3" lat="48.2" lon="2.2" user="bob" timestamp="2020-01-02T12:00:00Z"/>
  <node id="4" lat="48.3" lon="2.3" user="bob" timestamp="2020-01-03T12:00:00Z"/>
  <way id="11" user="dave" timestamp="2020-02-02T00:00:00Z">
    <nd ref="4"/>
    <nd ref="999"/>
  </way>
  <way id="12" user="dave" timestamp="2020-02-03T00:00:00Z">
    <nd ref="4"/>
    <nd ref="1"/>
  </way>
</osm>
"""


def _write_osm_pair(tmp_path):
    (tmp_path / "a.osm").write_text(_OSM_XML_F1)
    (tmp_path / "b.osm").write_text(_OSM_XML_F2)
    return str(tmp_path)


def _check_multifile_ways(tbl):
    tbl = tbl.sort_by("osm_id")
    assert tbl["osm_id"].to_pylist() == [10, 11, 12]
    # way 10 spans files: refs 1,2 live in a.osm, ref 3 in b.osm
    w10 = tbl["geometry_wkt"][0].as_py()
    assert w10.startswith("LINESTRING")
    for frag in ("2 48", "2.1 48.1", "2.2 48.2"):
        assert frag in w10
    # way 11: one dangling ref -> single resolved point -> null geometry
    assert tbl["geometry_wkt"][1].as_py() is None
    # way 12 resolves across files in ref order (4 then 1)
    w12 = tbl["geometry_wkt"][2].as_py()
    assert w12.index("2.3 48.3") < w12.index("2 48")
    assert tbl["name"].to_pylist() == ["Cross-File Way", None, None]


def test_osm_multifile_ways_broadcast_arm(ray_session, tmp_path):
    """Multi-file extract: refs resolve across files via the broadcast
    nodes lookup (driver RSS never holds the node map)."""
    from geomesa_ray.sources.readers import read_osm

    d = _write_osm_pair(tmp_path)
    tbl = pa.concat_tables(
        read_osm(d, entity="ways").iter_batches(batch_format="pyarrow")
    )
    _check_multifile_ways(tbl)


def test_osm_multifile_ways_join_arm(ray_session, tmp_path):
    """Forcing broadcast_limit_bytes=0 routes through the hash
    Dataset.join arm — results identical to the broadcast arm."""
    from geomesa_ray.sources.readers import read_osm

    d = _write_osm_pair(tmp_path)
    tbl = pa.concat_tables(
        read_osm(d, entity="ways", broadcast_limit_bytes=0,
                 num_partitions=4).iter_batches(batch_format="pyarrow")
    )
    _check_multifile_ways(tbl)


def test_osm_multifile_nodes(ray_session, tmp_path):
    from geomesa_ray.sources.readers import read_osm

    d = _write_osm_pair(tmp_path)
    tbl = pa.concat_tables(
        read_osm(d, entity="nodes").iter_batches(batch_format="pyarrow")
    ).sort_by("osm_id")
    assert tbl["osm_id"].to_pylist() == [1, 2, 3, 4]
    assert tbl["lon"].to_pylist() == [2.0, 2.1, 2.2, 2.3]


def test_read_jsonl_inferred_and_typed(ray_session, tmp_path):
    from geomesa_ray.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "dtg": "2024-01-02T03:04:05Z", "v": 1.5}\n'
        '{"id": 2, "name": "b", "dtg": "2024-01-03T00:00:00Z", "v": 2.5}\n'
        '{"id": 3, "name": null, "dtg": "2024-01-04T12:00:00Z", "v": -1.0}\n'
    )
    ds, spec = read_jsonl(str(p))
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("id")
    assert "dtg:Date" in spec
    assert tbl["id"].to_pylist() == [1, 2, 3]
    assert tbl["name"].to_pylist() == ["a", "b", None]
    assert pa.types.is_timestamp(tbl.schema.field("dtg").type)
    assert tbl["v"].to_pylist() == [1.5, 2.5, -1.0]

    from geomesa_ray.registry import converter

    assert converter("jsonl") is read_jsonl


def test_osm_ways_only_file_yields_null_geometries(ray_session, tmp_path):
    """A file with ways but NO nodes must produce null-geometry ways,
    not an IndexError (round-4 review finding)."""
    from geomesa_ray.sources.readers import read_osm

    xml = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <way id="5" user="x" timestamp="2020-01-01T00:00:00Z">
    <nd ref="1"/><nd ref="2"/>
  </way>
</osm>
"""
    p = tmp_path / "waysonly.osm"
    p.write_text(xml)
    tbl = pa.concat_tables(
        read_osm(str(p), entity="ways").iter_batches(batch_format="pyarrow")
    )
    assert tbl["osm_id"].to_pylist() == [5]
    assert tbl["geometry_wkt"][0].as_py() is None
    # multi-file broadcast arm with zero nodes anywhere
    (tmp_path / "waysonly2.osm").write_text(xml.replace('id="5"', 'id="6"'))
    tbl2 = pa.concat_tables(
        read_osm(str(tmp_path), entity="ways").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("osm_id")
    assert tbl2["geometry_wkt"].null_count == 2


def test_osm_join_arm_dedups_boundary_nodes(ray_session, tmp_path):
    """Adjacent extracts repeat boundary nodes: the Dataset.join arm must
    resolve each ref to ONE coord (round-4 review finding: duplicated
    node rows doubled LineString vertices)."""
    from geomesa_ray.sources.readers import read_osm

    a = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="1" lat="48.0" lon="2.0"/>
  <node id="2" lat="48.1" lon="2.1"/>
  <way id="10" user="u" timestamp="2020-01-01T00:00:00Z">
    <nd ref="1"/><nd ref="2"/>
  </way>
</osm>
"""
    b = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="2" lat="48.1" lon="2.1"/>
  <node id="3" lat="48.2" lon="2.2"/>
</osm>
"""
    (tmp_path / "a.osm").write_text(a)
    (tmp_path / "b.osm").write_text(b)
    for kwargs in ({}, {"broadcast_limit_bytes": 0, "num_partitions": 4}):
        tbl = pa.concat_tables(
            read_osm(str(tmp_path), entity="ways", **kwargs).iter_batches(
                batch_format="pyarrow"
            )
        )
        wkt = tbl["geometry_wkt"][0].as_py()
        # exactly two vertices — node 2's duplicate must not double up
        assert wkt.count(",") == 1, (kwargs, wkt)


def test_read_fixed_width_skip_lines(ray_session, tmp_path):
    """Header skip happens task-side (read_binary_files → drop in task),
    never via a driver take_all (VERDICT r4 wrong-list #3)."""
    lines = [
        "REPORT 2024",
        "name    age",
        "alice   25 ",
        "bob     31 ",
    ]
    p = tmp_path / "fw_hdr.txt"
    p.write_text("\n".join(lines) + "\n")
    from geomesa_ray.sources.readers import read_fixed_width

    ds, _ = read_fixed_width(
        str(p), fields=[("name", 0, 8), ("age", 8, 3)], skip_lines=2
    )
    df = ds.to_pandas().sort_values("name").reset_index(drop=True)
    assert df["name"].tolist() == ["alice", "bob"]
    assert df["age"].tolist() == [25, 31]
    import pytest

    with pytest.raises(ValueError, match="single input file"):
        read_fixed_width([str(p), str(p)], fields=[("n", 0, 2)], skip_lines=1)
