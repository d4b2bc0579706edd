"""Merged/routed views + dictionary-encoded Arrow IPC export."""

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from geomesa_ray.pipelines.views import RoutedView, merged_view
from geomesa_ray.stages.export import write_arrow_ipc


def test_merged_and_routed_views(ray_session):
    import ray.data

    a = ray.data.from_arrow(pa.table({"k": ["a1", "a2"], "v": [1, 2]}))
    b = ray.data.from_arrow(pa.table({"k": ["b1"], "v": [3]}))
    merged = merged_view([a, b]).to_pandas()
    assert sorted(merged["k"]) == ["a1", "a2", "b1"]

    rv = RoutedView({"A": a, "B": b}, lambda q: q.get("store"))
    assert sorted(rv.query({"store": "A"}).to_pandas()["k"]) == ["a1", "a2"]
    assert sorted(rv.query({}).to_pandas()["k"]) == ["a1", "a2", "b1"]
    with pytest.raises(KeyError):
        rv.query({"store": "C"})


def test_dictionary_encoded_ipc(ray_session, tmp_path):
    import ray.data

    tbl = pa.table(
        {
            "lang": pa.array(["en", "de", "en", "fr"] * 50),
            "n": pa.array(range(200), pa.int64()),
        }
    )
    path = str(tmp_path / "dict.arrow")
    n = write_arrow_ipc(
        ray.data.from_arrow(tbl).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=37
        ),
        path,
        dictionary_cols=["lang"],
    )
    assert n == 200
    got = ipc.open_stream(path).read_all()
    assert pa.types.is_dictionary(got.schema.field("lang").type)
    assert got.column("lang").to_pylist() == tbl["lang"].to_pylist()
    assert got.column("n").to_pylist() == tbl["n"].to_pylist()


def test_orc_round_trip(ray_session, tmp_path):
    import ray.data

    from geomesa_ray.stages.export import read_orc, write_orc

    tbl = pa.table(
        {
            "k": pa.array([f"r{i}" for i in range(500)]),
            "v": pa.array(range(500), pa.int64()),
        }
    )
    d = str(tmp_path / "orc_out")
    n = write_orc(
        ray.data.from_arrow(tbl).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=123
        ),
        d,
        rows_per_file=200,
    )
    assert n == 500
    back = read_orc(d).to_pandas().sort_values("v")
    assert back["k"].tolist() == tbl["k"].to_pylist()


def test_geojson_reader_round_trip(ray_session, tmp_path):
    import json

    import ray.data

    from geomesa_ray.sources.readers import read_geojson
    from geomesa_ray.stages.export import write_geojson

    tbl = pa.table(
        {
            "name": pa.array(["a", "b"]),
            "lon": pa.array([1.5, -2.25], pa.float64()),
            "lat": pa.array([3.0, 4.5], pa.float64()),
        }
    )
    p = str(tmp_path / "pts.geojson")
    write_geojson(ray.data.from_arrow(tbl), p)
    back = read_geojson(p).to_pandas().sort_values("name")
    assert back["lon"].tolist() == [1.5, -2.25]
    assert back["name"].tolist() == ["a", "b"]


def test_delimited_reader_with_inference(ray_session, tmp_path):
    from geomesa_ray.sources.readers import read_delimited

    p = tmp_path / "data.csv"
    p.write_text(
        "id,score,flag,when,label\n"
        "1,1.5,true,2020-12-31,alpha\n"
        "2,2.25,false,2021-01-01,beta\n"
    )
    ds, spec = read_delimited(str(p))
    assert spec == "id:Integer,score:Double,flag:Boolean,when:Date,label:String"
    df = ds.to_pandas().sort_values("id")
    assert df["score"].tolist() == [1.5, 2.25]
    assert df["flag"].tolist() == [True, False]
    assert str(df["when"].iloc[0])[:10] == "2020-12-31"
