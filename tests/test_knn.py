"""kNN: streaming brute-force path + indexed expanding-window path vs a
naive all-pairs geodesic oracle (FIXTURES.md §7)."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.geometry.measures import haversine_m
from geomesa_ray.pipelines.ingest import ingest_pages
from geomesa_ray.pipelines.knn import knn_brute, knn_search
from geomesa_ray.sources.synth import HOTSPOTS, generate_pages, write_pages_parquet
from geomesa_ray.stages.encode import EncodeKeys
from geomesa_ray.stages.extract import ExtractGeo

# hotspot center, sparse mid-ocean point, near the antimeridian
QUERIES = [
    (HOTSPOTS[0][0], HOTSPOTS[0][1]),
    (-35.0, -40.0),
    (179.5, 0.0),
]


@pytest.fixture(scope="module")
def geo_table():
    return EncodeKeys()(ExtractGeo()(generate_pages(4000, seed=21)))


@pytest.fixture(scope="module")
def indexed_dir(tmp_path_factory, ray_session):
    raw = tmp_path_factory.mktemp("knn_raw")
    write_pages_parquet(str(raw), 4000, seed=21, shard_rows=1000)
    out = tmp_path_factory.mktemp("knn_idx")
    ingest_pages(str(raw), str(out), n_groups=2, target_rows_per_file=1000)
    return str(out)


def oracle_knn(tbl: pa.Table, qx: float, qy: float, k: int) -> list[str]:
    px = tbl["lon"].to_numpy(zero_copy_only=False)
    py = tbl["lat"].to_numpy(zero_copy_only=False)
    d = haversine_m(px, py, qx, qy)
    order = np.argsort(d, kind="stable")[:k]
    urls = tbl["url"].to_pylist()
    return [urls[i] for i in order]


@pytest.mark.parametrize("k", [1, 5, 10])
def test_knn_brute_vs_oracle(ray_session, geo_table, k):
    import ray.data

    ds = ray.data.from_arrow(geo_table).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=311
    )
    qx = [q[0] for q in QUERIES]
    qy = [q[1] for q in QUERIES]
    res = knn_brute(ds, qx, qy, k).to_pandas()
    for qi, (x, y) in enumerate(QUERIES):
        mine = res[res["query_idx"] == qi].sort_values("rank")
        assert len(mine) == k
        expect = oracle_knn(geo_table, x, y, k)
        # compare distance multiset (ties can permute equal-distance urls)
        od = sorted(
            haversine_m(
                geo_table["lon"].to_numpy(zero_copy_only=False),
                geo_table["lat"].to_numpy(zero_copy_only=False),
                x, y,
            )
        )[:k]
        assert np.allclose(sorted(mine["dist_m"]), od)
        # non-tied ranks match the oracle exactly
        assert mine["url"].iloc[0] == expect[0] or np.isclose(
            mine["dist_m"].iloc[0], od[0]
        )


def test_knn_search_matches_brute(ray_session, indexed_dir):
    import ray.data

    qx = [q[0] for q in QUERIES]
    qy = [q[1] for q in QUERIES]
    k = 5
    idx = knn_search(indexed_dir, qx, qy, k, start_radius_m=50_000).to_pandas()
    import glob

    data_files = sorted(glob.glob(f"{indexed_dir}/group=*/*.parquet"))
    full = ray.data.read_parquet(data_files)
    brute = knn_brute(full, qx, qy, k).to_pandas()
    for qi in range(len(QUERIES)):
        a = idx[idx["query_idx"] == qi].sort_values("rank")["dist_m"].to_numpy()
        b = brute[brute["query_idx"] == qi].sort_values("rank")["dist_m"].to_numpy()
        assert len(a) == k
        assert np.allclose(a, b)


def test_knn_search_antipodal_windows_prune_independently(ray_session, indexed_dir):
    """Two antipodal query points: per-window file planning must NOT scan a
    world-spanning union-bbox band. Each round's merged file list stays
    bounded by the per-query windows, and results still match brute force."""
    import glob

    import ray.data

    qx = [2.35, -177.65]  # Paris and its antipode longitude
    qy = [48.85, -48.85]
    k = 3
    stats = {}
    idx = knn_search(
        indexed_dir, qx, qy, k, start_radius_m=50_000, stats=stats
    ).to_pandas()
    data_files = sorted(glob.glob(f"{indexed_dir}/group=*/*.parquet"))
    # regression check: per-window planning must beat (or match) planning
    # the union bbox of both antipodal windows, which spans the world band
    from geomesa_ray.pipelines.knn import _plan_round_files, _window
    from geomesa_ray.pipelines.scan import Query, plan_files

    boxes = _window(qx[0], qy[0], 50_000) + _window(qx[1], qy[1], 50_000)
    per_window = _plan_round_files(indexed_dir, boxes, "week")
    union_bbox = (
        min(b[0] for b in boxes),
        min(b[1] for b in boxes),
        max(b[2] for b in boxes),
        max(b[3] for b in boxes),
    )
    union_files = plan_files(indexed_dir, Query(bbox=union_bbox, loose=True))
    assert len(per_window) <= len(union_files)
    # rounds were recorded and never exceed the layout size
    assert stats["files_per_round"] and all(
        n <= len(data_files) for n in stats["files_per_round"]
    )
    full = ray.data.read_parquet(data_files)
    brute = knn_brute(full, qx, qy, k).to_pandas()
    for qi in range(2):
        a = idx[idx["query_idx"] == qi].sort_values("rank")["dist_m"].to_numpy()
        b = brute[brute["query_idx"] == qi].sort_values("rank")["dist_m"].to_numpy()
        assert len(a) == k and np.allclose(a, b)
