"""Exporters (BIN/Arrow IPC/GeoJSON) + query processes vs naive oracles."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.geometry.measures import haversine_m
from geomesa_ray.pipelines.ingest import ingest_pages
from geomesa_ray.pipelines.processes import attribute_join, proximity_join, tube_select
from geomesa_ray.sources.synth import generate_pages, write_pages_parquet
from geomesa_ray.stages.encode import EncodeKeys, hash_strings
from geomesa_ray.stages.export import (
    BinEncode,
    bin_decode,
    write_arrow_ipc,
    write_bin,
    write_geojson,
)
from geomesa_ray.stages.extract import ExtractGeo


@pytest.fixture(scope="module")
def geo_table():
    return EncodeKeys()(ExtractGeo()(generate_pages(1500, seed=77)))


def test_bin_roundtrip(geo_table):
    blob = BinEncode()(geo_table)["bin"][0].as_py()
    assert len(blob) == 16 * len(geo_table)
    dec = bin_decode(blob)
    # little-endian field layout (BinaryOutputEncoder.decode)
    t0, s0, la0, lo0 = struct.unpack_from("<IiFf".replace("F", "f"), blob, 0)
    assert dec["track_id"][0].as_py() == t0
    np.testing.assert_allclose(
        dec["lat"].to_numpy(), geo_table["lat"].to_numpy(zero_copy_only=False).astype(np.float32)
    )
    np.testing.assert_allclose(
        dec["lon"].to_numpy(), geo_table["lon"].to_numpy(zero_copy_only=False).astype(np.float32)
    )
    secs = (
        geo_table["warc_ts"].cast(pa.timestamp("ms")).cast(pa.int64()).to_numpy() // 1000
    )
    assert dec["dtg_ms"].to_numpy().tolist() == (secs * 1000).tolist()
    # track id = low 32 bits of the stable hash
    expect_track = (hash_strings(geo_table["url"]) & np.uint64(0xFFFFFFFF)).astype(np.int64)
    assert dec["track_id"].to_numpy().tolist() == expect_track.tolist()


def test_bin_label_and_sort(geo_table):
    enc = BinEncode(label_col="lang", sort_by_time=True)
    blob = enc(geo_table)["bin"][0].as_py()
    assert len(blob) == 24 * len(geo_table)
    dec = bin_decode(blob, has_label=True)
    ts = dec["dtg_ms"].to_numpy()
    assert (np.diff(ts) >= 0).all()  # time-sorted
    # label: first utf-8 bytes little-endian ("en" -> 0x6e65)
    langs = set(geo_table["lang"].to_pylist())
    expected_labels = {
        int.from_bytes(l.encode()[:8], "little") for l in langs
    }
    assert set(dec["label"].to_numpy().tolist()) <= expected_labels


def test_write_bin_and_ipc_and_geojson(ray_session, geo_table, tmp_path):
    import json

    import pyarrow.ipc as ipc
    import ray.data

    ds = ray.data.from_arrow(geo_table)
    n = write_bin(ds, str(tmp_path / "out.bin"))
    assert n == len(geo_table)
    n2 = write_arrow_ipc(ray.data.from_arrow(geo_table), str(tmp_path / "out.arrow"))
    assert n2 == len(geo_table)
    got = ipc.open_stream(str(tmp_path / "out.arrow")).read_all()
    assert got.num_rows == len(geo_table)
    assert sorted(got.schema.names) == sorted(geo_table.schema.names)
    small = ray.data.from_arrow(geo_table.select(["url", "lon", "lat"]).slice(0, 5))
    n3 = write_geojson(small, str(tmp_path / "out.geojson"))
    fc = json.loads((tmp_path / "out.geojson").read_text())
    assert n3 == 5 and len(fc["features"]) == 5
    assert fc["features"][0]["geometry"]["type"] == "Point"


def test_proximity_join_vs_oracle(ray_session, geo_table):
    import ray.data

    targets = [(-74.006, 40.7128), (2.3522, 48.8566)]
    ids = ["nyc", "paris"]
    radius = 25_000.0
    res = proximity_join(
        ray.data.from_arrow(geo_table),
        [t[0] for t in targets],
        [t[1] for t in targets],
        ids,
        radius,
    ).to_pandas()
    px = geo_table["lon"].to_numpy(zero_copy_only=False)
    py = geo_table["lat"].to_numpy(zero_copy_only=False)
    urls = geo_table["url"].to_pylist()
    expect = set()
    for tid, (tx, ty) in zip(ids, targets):
        d = haversine_m(px, py, tx, ty)
        for i in np.nonzero(d <= radius)[0]:
            expect.add((urls[i], tid))
    assert set(zip(res["url"], res["target_id"])) == expect
    assert len(res) == len(expect)
    assert (res["dist_m"] <= radius).all()


def test_attribute_join(ray_session):
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": pa.array(["a", "b", "a"]), "x": pa.array([1, 2, 3])})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array(["a", "c", "b", "d"]), "y": pa.array([10, 20, 30, 40])})
    )
    out = attribute_join(left, right, "k", "k").to_pandas().sort_values("y")
    assert out["k"].tolist() == ["a", "b"]


def test_tube_select(ray_session, tmp_path):
    import ray.data

    raw = tmp_path / "raw"
    idx = tmp_path / "idx"
    raw.mkdir()
    write_pages_parquet(str(raw), 3000, seed=55, shard_rows=1500)
    ingest_pages(str(raw), str(idx), n_groups=2, target_rows_per_file=1000)

    # a track through the Paris hotspot over the data's time span
    track_lon = np.linspace(2.0, 2.7, 8)
    track_lat = np.linspace(48.6, 49.1, 8)
    track_ts = np.linspace(1606780800000, 1610668800000, 8).astype(np.int64)
    res = tube_select(
        str(idx), track_lon, track_lat, track_ts, buffer_m=30_000,
        time_buffer_ms=10**12,  # effectively unbounded time: spatial-only check
    ).to_pandas()
    # oracle: all indexed points within 30km of any track point
    import glob

    import pyarrow.parquet as pq

    allp = pa.concat_tables(
        pq.read_table(f) for f in glob.glob(f"{idx}/group=*/*.parquet")
    )
    px = allp["lon"].to_numpy(zero_copy_only=False)
    py = allp["lat"].to_numpy(zero_copy_only=False)
    d = haversine_m(px[:, None], py[:, None], track_lon[None, :], track_lat[None, :]).min(axis=1)
    expect = {u for u, dd in zip(allp["url"].to_pylist(), d) if dd <= 30_000}
    assert set(res["url"]) == expect
    assert len(expect) > 0

def test_bin_decode_batch_vectorized(geo_table):
    """Batch decode (one np.frombuffer over the blob buffer) matches the
    per-blob decoder, including on sliced arrays with a nonzero offset."""
    from geomesa_ray.stages.export import bin_decode_batch

    enc = BinEncode()
    half = len(geo_table) // 2
    blobs = pa.table({
        "bin": pa.concat_arrays([
            enc(geo_table.slice(0, half))["bin"].combine_chunks(),
            enc(geo_table.slice(half))["bin"].combine_chunks(),
        ])
    })
    got = bin_decode_batch(blobs)
    expect = pa.concat_tables([
        bin_decode(blobs["bin"][0].as_py()),
        bin_decode(blobs["bin"][1].as_py()),
    ])
    assert got.equals(expect)
    # sliced (offset≠0) column decodes only its own blobs
    got2 = bin_decode_batch(blobs.slice(1))
    assert got2.equals(bin_decode(blobs["bin"][1].as_py()))


def test_geojson_polygon_holes(ray_session, tmp_path):
    """Interior rings survive export: GeoJSON Polygon coordinates are
    [shell, *holes] (advisor finding r4)."""
    import json

    import ray

    from geomesa_ray.geometry.base import Polygon
    from geomesa_ray.geometry.wkb import to_wkb
    from geomesa_ray.stages.export import write_geojson_polygons

    poly = Polygon(
        [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        holes=[[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]],
    )
    tbl = pa.table({"id": pa.array([1], pa.int64()),
                    "geom_wkb": pa.array([to_wkb(poly)], pa.binary())})
    path = str(tmp_path / "holes.geojson")
    n = write_geojson_polygons(ray.data.from_arrow(tbl), path)
    assert n == 1
    feat = json.load(open(path))["features"][0]
    rings = feat["geometry"]["coordinates"]
    assert len(rings) == 2
    assert rings[1][0] == [4, 4]
