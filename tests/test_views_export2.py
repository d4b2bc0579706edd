"""Merged/routed views + dictionary-encoded Arrow IPC export."""

import numpy as np
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


def test_sorted_ipc_export_merges_without_sort_stage(ray_session, tmp_path):
    """K-way merged export of a z2-sorted layout is byte-equal to the
    ds.sort('z2') path at the same batch size — with NO shuffle
    (VERDICT r3 next-round #8; reference DeltaWriter's priority-queue
    merge of pre-sorted batches)."""
    import glob
    import os

    import ray.data

    from geomesa_ray.pipelines.ingest import ingest_pages
    from geomesa_ray.sources.synth import write_pages_parquet
    from geomesa_ray.stages.export import (
        iter_sorted_layout_batches,
        write_arrow_ipc,
        write_arrow_ipc_sorted,
    )

    pages = tmp_path / "pages"
    layout = tmp_path / "layout"
    write_pages_parquet(str(pages), 3000, seed=5, shard_rows=750)
    ingest_pages(str(pages), str(layout), n_groups=3,
                 target_rows_per_file=300, sort_by="z2")

    files = sorted(glob.glob(os.path.join(str(layout), "group=*", "*.parquet")))
    cols = ["z2", "url", "lon", "lat"]
    ds = ray.data.read_parquet(files, columns=cols)

    # byte-equality needs a total order: assert the keys are unique here
    z2 = ds.to_pandas()["z2"]
    assert z2.is_unique

    p_sorted = tmp_path / "merge.arrow"
    p_shuffle = tmp_path / "sort.arrow"
    n1 = write_arrow_ipc_sorted(str(layout), str(p_sorted), sort_col="z2",
                                columns=cols, batch_rows=500)
    n2 = write_arrow_ipc(ds.sort("z2"), str(p_shuffle), batch_rows=500)
    # extract drops pages without geotags, so the layout holds < 3000
    assert n1 == n2 == len(z2) > 2000
    assert p_sorted.read_bytes() == p_shuffle.read_bytes()

    # merged stream really is globally nondecreasing in z2
    last = -1
    for b in iter_sorted_layout_batches(str(layout), "z2", cols, 256):
        k = b["z2"].to_numpy(zero_copy_only=False)
        assert (np.diff(k) >= 0).all()
        assert k[0] >= last
        last = int(k[-1])
