"""Tile aggregation (GridSnap semantics) + stats sketches vs naive oracles."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.sources.synth import generate_pages
from geomesa_ray.stages.density import GridSnap, DensityTiles, decode, density
from geomesa_ray.stages.extract import ExtractGeo
from geomesa_ray.stages.stats import (
    Frequency,
    StatSpec,
    compute_stats,
)


@pytest.fixture(scope="module")
def geo_table():
    return ExtractGeo()(generate_pages(3000, seed=3))


# ---------------------------------------------------------------------------
# GridSnap contract (GridSnap.scala:60-80)
# ---------------------------------------------------------------------------


def test_gridsnap_contract():
    snap = GridSnap((0.0, 0.0, 10.0, 10.0), 8, 8)
    # outside → -1
    assert snap.i(np.array([-0.001, 10.001])).tolist() == [-1, -1]
    # upper edge → last cell; floor otherwise
    assert snap.i(np.array([0.0, 1.24, 1.25, 9.99, 10.0])).tolist() == [0, 0, 1, 7, 7]
    assert snap.j(np.array([0.0, 5.0, 10.0])).tolist() == [0, 4, 7]
    # cell centers
    assert snap.x(np.array([0, 7])).tolist() == [0.625, 9.375]


def test_density_tiles_hand_checked():
    """8×8 grid over (0,0,10,10): hand-computed assignments."""
    batch = pa.table(
        {
            "lon": pa.array([0.5, 0.5, 9.9, 20.0], pa.float64()),
            "lat": pa.array([0.5, 0.6, 9.9, 5.0], pa.float64()),
            "v": pa.array([2.0, 3.0, 1.0, 100.0], pa.float64()),
        }
    )
    out = DensityTiles((0, 0, 10, 10), 8, 8)(batch).to_pydict()
    got = {
        (x, y): w for x, y, w in zip(out["tile_x"], out["tile_y"], out["weight"])
    }
    assert got == {(0, 0): 2.0, (7, 7): 1.0}  # 20.0 outside the envelope dropped
    outw = DensityTiles((0, 0, 10, 10), 8, 8, weight_col="v")(batch).to_pydict()
    gotw = {
        (x, y): w for x, y, w in zip(outw["tile_x"], outw["tile_y"], outw["weight"])
    }
    assert gotw == {(0, 0): 5.0, (7, 7): 1.0}


def test_density_pipeline_vs_oracle(ray_session, geo_table):
    import ray.data

    ds = ray.data.from_arrow(geo_table).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=123
    )
    result = density(ds, envelope=(-180, -90, 180, 90), width=256, height=256)
    tbl = result.to_pandas()
    got = {
        (int(r.tile_x), int(r.tile_y)): r.weight for r in tbl.itertuples()
    }
    # oracle: single-pass numpy over the whole table
    snap = GridSnap((-180, -90, 180, 90), 256, 256)
    x = geo_table["lon"].to_numpy(zero_copy_only=False)
    y = geo_table["lat"].to_numpy(zero_copy_only=False)
    i, j = snap.i(x), snap.j(y)
    expect: dict = {}
    for ii, jj in zip(i.tolist(), j.tolist()):
        if ii >= 0 and jj >= 0:
            expect[(ii, jj)] = expect.get((ii, jj), 0.0) + 1.0
    assert got == expect
    # decode round-trip: weights preserved, coordinates are cell centers
    dec = decode(pa.Table.from_pandas(tbl[["tile_x", "tile_y", "weight"]]))
    assert float(pa.compute.sum(dec["weight"]).as_py()) == sum(expect.values())
    # tree-reduce arm: force multiple merge rounds (tiny driver budget) and
    # the sparse-groupby arm; both must agree with the oracle
    tree = density(
        ds, envelope=(-180, -90, 180, 90), width=256, height=256,
        max_driver_bytes=2 * (256 * 256 * 9),  # ≤2 partials reach the driver
    ).to_pandas()
    got_tree = {(int(r.tile_x), int(r.tile_y)): r.weight for r in tree.itertuples()}
    assert got_tree == expect
    sparse = density(
        ds, envelope=(-180, -90, 180, 90), width=256, height=256,
        reduce_max_cells=0,  # force the groupby arm
    ).to_pandas()
    got_sparse = {(int(r.tile_x), int(r.tile_y)): r.weight for r in sparse.itertuples()}
    assert got_sparse == expect


# ---------------------------------------------------------------------------
# stats sketches
# ---------------------------------------------------------------------------


def test_stats_vs_oracle(ray_session, geo_table):
    import ray.data

    ds = ray.data.from_arrow(geo_table).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=257
    )
    specs = [
        StatSpec("n", "count", "url"),
        StatSpec("lon_mm", "min_max", "lon"),
        StatSpec("langs", "enumeration", "lang"),
        StatSpec("top_langs", "top_k", "lang", k=3),
        StatSpec("lat_hist", "histogram", "lat", bins=10, lo=-90.0, hi=90.0),
        StatSpec("lon_desc", "descriptive", "lon"),
        StatSpec("by_lang_count", "count", "url", group_by="lang"),
    ]
    out = compute_stats(ds, specs, batch_size=257)

    lon = geo_table["lon"].to_numpy(zero_copy_only=False)
    lat = geo_table["lat"].to_numpy(zero_copy_only=False)
    langs = geo_table["lang"].to_pylist()

    assert out["n"]["count"] == len(geo_table)
    assert out["lon_mm"]["min"] == lon.min() and out["lon_mm"]["max"] == lon.max()

    from collections import Counter

    c = Counter(langs)
    assert out["langs"] == dict(c)
    expect_top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert out["top_langs"] == expect_top

    idx = np.clip(np.floor((lat + 90.0) * 10 / 180.0).astype(int), 0, 9)
    assert out["lat_hist"]["counts"] == np.bincount(idx, minlength=10).tolist()

    assert out["lon_desc"]["count"] == len(lon)
    assert abs(out["lon_desc"]["mean"] - lon.mean()) < 1e-9
    assert abs(out["lon_desc"]["stddev"] - lon.std(ddof=1)) < 1e-9

    for lg, cnt in c.items():
        assert out["by_lang_count"][lg]["count"] == cnt


def test_frequency_sketch_bounds():
    """CMS overestimates but never underestimates; merge is additive."""
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50, 5000).astype(str)
    f1, f2 = Frequency(), Frequency()
    f1.observe(vals[:2500])
    f2.observe(vals[2500:])
    f1.merge(f2)
    from collections import Counter

    truth = Counter(vals.tolist())
    for v, c in truth.items():
        assert f1.estimate(v) >= c
    assert f1.estimate("never-seen") <= 60  # width 2048 vs 50 keys: tiny collisions
