"""XZ-indexed non-point (extent) storage: ingest, pruning, scan vs oracle.

Reference parity: XZ2IndexTest / XZ3IndexTest exercise the non-point index
family end-to-end (key encode → range plan → scan → exact filter); these
tests mirror that over the Ray layout."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomesa_ray.curves.binnedtime import TimePeriod
from geomesa_ray.pipelines.xzindex import (
    EncodeXZ,
    ingest_extents,
    load_xz_manifest,
    plan_xz_files,
    xz_scan,
)


def _extents_table(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-170, 170, n)
    cy = rng.uniform(-80, 80, n)
    w = rng.uniform(0.01, 3.0, n)
    h = rng.uniform(0.01, 2.0, n)
    ts = rng.integers(1704067200000, 1706745600000, n)  # Jan 2024
    return pa.table(
        {
            "ext_id": pa.array(np.arange(n), pa.int64()),
            "xmin": pa.array(np.maximum(cx - w, -180.0), pa.float64()),
            "ymin": pa.array(np.maximum(cy - h, -90.0), pa.float64()),
            "xmax": pa.array(np.minimum(cx + w, 180.0), pa.float64()),
            "ymax": pa.array(np.minimum(cy + h, 90.0), pa.float64()),
            "ts": pa.array(ts * 1000, pa.timestamp("us")),
        }
    )


@pytest.fixture(scope="module")
def xz_layout(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("xzidx")
    tbl = _extents_table()
    raw_dir = root / "raw"
    raw_dir.mkdir()
    # several input shards → several resume groups
    for i in range(4):
        pq.write_table(tbl.slice(i * 1000, 1000), str(raw_dir / f"part-{i}.parquet"))
    out = str(root / "idx")
    manifest = ingest_extents(
        str(raw_dir), out, ts_col="ts", n_groups=2, target_rows_per_file=500
    )
    return out, tbl, manifest


def _oracle_hits(tbl, bbox, interval=None):
    x0 = tbl["xmin"].to_numpy()
    y0 = tbl["ymin"].to_numpy()
    x1 = tbl["xmax"].to_numpy()
    y1 = tbl["ymax"].to_numpy()
    qx0, qy0, qx1, qy1 = bbox
    m = (x0 <= qx1) & (x1 >= qx0) & (y0 <= qy1) & (y1 >= qy0)
    if interval is not None:
        ms = tbl["ts"].cast(pa.int64()).to_numpy() // 1000
        m &= (ms >= interval[0]) & (ms <= interval[1])
    return sorted(tbl["ext_id"].to_numpy()[m].tolist())


def test_xz_ingest_layout_and_manifest(xz_layout):
    out, tbl, manifest = xz_layout
    assert sorted(manifest) == [0, 1]
    assert sum(e.rows_out for e in manifest.values()) == len(tbl)
    # files are xz2-sorted and carry key stats
    for e in manifest.values():
        for fs in e.files:
            assert fs.xz2_min <= fs.xz2_max
            t = pq.read_table(fs.path, columns=["xz2"])
            v = t["xz2"].to_numpy()
            assert (np.diff(v) >= 0).all()


def test_xz_scan_matches_oracle(ray_session, xz_layout):
    out, tbl, _ = xz_layout
    bbox = (-20.0, 10.0, 15.0, 40.0)
    got = sorted(xz_scan(out, bbox=bbox, columns=["ext_id"]).to_pandas()["ext_id"])
    assert got == _oracle_hits(tbl, bbox)


def test_xz_scan_time_interval(ray_session, xz_layout):
    out, tbl, _ = xz_layout
    bbox = (-60.0, -30.0, 60.0, 30.0)
    interval = (1704672000000, 1705276800000)  # one week of Jan 2024
    got = sorted(
        xz_scan(out, bbox=bbox, interval=interval, columns=["ext_id"]).to_pandas()[
            "ext_id"
        ]
    )
    assert got == _oracle_hits(tbl, bbox, interval)


def test_xz_pruning_reduces_files(xz_layout):
    out, tbl, _ = xz_layout
    total = len(glob.glob(os.path.join(out, "group=*", "*.parquet")))
    pruned = plan_xz_files(out, bbox=(-1.0, -1.0, 1.0, 1.0))
    assert 0 < len(pruned) < total  # a small window must not scan everything


def test_xz_ingest_resume_skips_complete_groups(xz_layout):
    out, tbl, manifest = xz_layout
    # rerun: both groups already in the manifest → no work, same manifest
    before = {k: e.wall_time_s for k, e in load_xz_manifest(out).items()}
    again = ingest_extents(
        [f for e in manifest.values() for f in e.input_files],
        out,
        ts_col="ts",
        n_groups=2,
        target_rows_per_file=500,
    )
    after = {k: e.wall_time_s for k, e in again.items()}
    assert before == after


def test_encode_xz_clamps_out_of_bounds(ray_session):
    enc = EncodeXZ(ts_col=None)
    t = pa.table(
        {
            "xmin": pa.array([-200.0, 10.0], pa.float64()),
            "ymin": pa.array([-95.0, 10.0], pa.float64()),
            "xmax": pa.array([-170.0, 11.0], pa.float64()),
            "ymax": pa.array([-80.0, 11.0], pa.float64()),
        }
    )
    out = enc(t)
    assert out["xz2"].to_numpy().min() >= 0  # lenient clamp, no raise


def test_xz_scan_custom_ts_col(ray_session, tmp_path):
    # a layout ingested with a non-default timestamp column must scan with
    # ts_col= instead of raising KeyError on the literal "ts"
    tbl = _extents_table(n=800, seed=11).rename_columns(
        ["ext_id", "xmin", "ymin", "xmax", "ymax", "when_ts"]
    )
    raw = tmp_path / "raw"
    raw.mkdir()
    pq.write_table(tbl, str(raw / "part-0.parquet"))
    out = str(tmp_path / "idx")
    ingest_extents(str(raw), out, ts_col="when_ts", n_groups=1,
                   target_rows_per_file=400)
    bbox = (-60.0, -30.0, 60.0, 30.0)
    interval = (1704672000000, 1705276800000)
    got = sorted(
        xz_scan(out, bbox=bbox, interval=interval, columns=["ext_id"],
                ts_col="when_ts").to_pandas()["ext_id"]
    )
    oracle = _oracle_hits(tbl.rename_columns(
        ["ext_id", "xmin", "ymin", "xmax", "ymax", "ts"]), bbox, interval)
    assert got == oracle
