"""Route search vs naive oracle + CLI end-to-end (the ray-job-submit surface)."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.pipelines.route import _angdiff, route_search


def test_route_search_vs_oracle(ray_session):
    import ray.data

    rng = np.random.default_rng(42)
    n = 2000
    # route: straight east along the equator from 0 to 10
    route_lon = np.array([0.0, 5.0, 10.0])
    route_lat = np.array([0.0, 0.0, 0.0])
    pts = pa.table(
        {
            "pid": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(rng.uniform(-1, 11, n), pa.float64()),
            "lat": pa.array(rng.uniform(-1, 1, n), pa.float64()),
            "heading": pa.array(rng.uniform(0, 360, n), pa.float64()),
        }
    )
    buffer_m = 50_000.0
    tol = 20.0
    out = route_search(
        ray.data.from_arrow(pts), route_lon, route_lat, buffer_m, tol
    ).to_pandas()
    # oracle: route heading is 90° everywhere; corridor = |lat| within buffer
    lat = pts["lat"].to_numpy(zero_copy_only=False)
    lon = pts["lon"].to_numpy(zero_copy_only=False)
    hd = pts["heading"].to_numpy(zero_copy_only=False)
    # distance to the polyline: inside x-range → |lat|; beyond ends → to endpoints
    dx_lo = np.maximum(0.0 - lon, 0.0)
    dx_hi = np.maximum(lon - 10.0, 0.0)
    dx = np.maximum(dx_lo, dx_hi)
    d_deg = np.sqrt(dx**2 + lat**2)
    within = d_deg * 111_195.0 <= buffer_m
    match = _angdiff(hd, np.full(n, 90.0), False) <= tol
    expect = set(np.nonzero(within & match)[0].tolist())
    assert set(out["pid"]) == expect
    assert len(expect) > 0
    # bidirectional also admits ~270° headings
    out2 = route_search(
        ray.data.from_arrow(pts), route_lon, route_lat, buffer_m, tol,
        bidirectional=True,
    ).to_pandas()
    match2 = _angdiff(hd, np.full(n, 90.0), True) <= tol
    assert set(out2["pid"]) == set(np.nonzero(within & match2)[0].tolist())
    assert len(out2) > len(out)


def test_cli_end_to_end(tmp_path):
    """ingest → scan → join → density → compact through the CLI in a fresh
    process (the job-submit surface owns its own Ray session)."""
    from geomesa_ray.sources.synth import generate_polygons, write_pages_parquet
    import pyarrow.parquet as pq

    raw = tmp_path / "raw"
    raw.mkdir()
    write_pages_parquet(str(raw), 2000, seed=31, shard_rows=1000)
    polys = tmp_path / "polys.parquet"
    pq.write_table(generate_polygons(30, seed=3), str(polys))

    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_DEDUP_LOGS": "0"}

    def run(*args):
        proc = subprocess.run(
            [sys.executable, "-m", "geomesa_ray.cli", "--num-cpus", "4", *args],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    idx = tmp_path / "idx"
    r = run("ingest", "--input", str(raw), "--out", str(idx), "--target-rows", "500")
    assert r["rows_out"] > 0
    r2 = run("scan", "--index", str(idx), "--out", str(tmp_path / "scan_out"),
             "--bbox=-80,30,10,55")
    assert r2["rows"] > 0
    r2c = run("scan", "--index", str(idx), "--out", str(tmp_path / "cqlscan"),
              "--cql", "BBOX(geom, -80, 30, 10, 55)")
    assert r2c["rows"] == r2["rows"]  # CQL front end ≡ --bbox path
    r3 = run("join", "--index", str(idx), "--polygons", str(polys),
             "--out", str(tmp_path / "pairs"))
    assert r3["pairs"] > 0
    r4 = run("density", "--index", str(idx), "--out", str(tmp_path / "tiles"))
    assert r4["tiles"] > 0
    r5 = run("compact", "--index", str(idx))
    assert isinstance(r5["compacted_groups"], list)

    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
         "properties": {"name": "a", "v": 1}},
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [3.0, 4.0]},
         "properties": {"name": "b", "v": 2}},
    ]}
    src = tmp_path / "in.geojson"
    src.write_text(json.dumps(gj))
    r6 = run("convert", "--format", "geojson", "--input", str(src),
             "--out", str(tmp_path / "converted"))
    assert r6 == {"rows": 2, "format": "geojson", "wall_sec": r6["wall_sec"]}
    t = pq.read_table(str(tmp_path / "converted"))
    assert t.num_rows == 2 and {"lon", "lat", "name", "v"} <= set(t.schema.names)

    # stats: per-stage execution report for any registered driver query
    r8 = run("stats", "--query", "raster_regions",
             "--sf-dir", "/root/testdata/sf0.001")
    assert r8["rows"] > 0 and any(
        "_region_kernel" in s for s in r8["stages"]
    )

    # --derive: transform-expression DSL columns appended at convert time
    r7 = run("convert", "--format", "geojson", "--input", str(src),
             "--out", str(tmp_path / "converted2"),
             "--derive", "tag=uppercase(concat($name, '-', $name))",
             "--derive", "v10=multiply($v, 10)")
    assert r7["rows"] == 2
    t2 = pq.read_table(str(tmp_path / "converted2"))
    got = t2.sort_by("v")
    assert got["tag"].to_pylist() == ["A-A", "B-B"]
    assert got["v10"].to_pylist() == [10, 20]


def test_cli_corpus_ops(tmp_path):
    """The corpus subcommand round-trips dedup/split/normalize outputs.
    Runs in a SUBPROCESS: cli.main owns (and shuts down) its own Ray
    session, which must never touch the test session."""
    import glob
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "docs.parquet")
    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(
                ["dup text here"] * 10 + [f"unique doc {i} words" for i in range(30)],
                pa.string(),
            ),
        }
    )
    pq.write_table(t, src)
    ops = [("exact-dedup", 31), ("split", 40), ("normalize", 40)]
    outs = {op: str(tmp_path / f"out_{op}") for op, _ in ops}
    # one subprocess runs all three ops (each main() owns its session)
    code = (
        "import geomesa_ray.cli as c\n"
        + "\n".join(
            "assert c.main(['--num-cpus', '4', 'corpus', '--input', %r, "
            "'--out', %r, '--op', %r]) == 0" % (src, outs[op], op)
            for op, _ in ops
        )
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=600)
    for op, expect in ops:
        n = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(f"{outs[op]}/*.parquet")
        )
        assert n == expect, (op, n)
