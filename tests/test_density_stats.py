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
# line / polygon rasterization (RenderingGrid semantics)
# ---------------------------------------------------------------------------


def _raster_cells(geom_wkb, envelope=(-180, -90, 180, 90), w=256, h=256):
    from geomesa_ray.stages.density import RasterizeTiles

    t = RasterizeTiles(envelope, w, h)(
        pa.table({"geom_wkb": pa.array([geom_wkb], pa.binary())})
    )
    return set(zip(t["tile_x"].to_pylist(), t["tile_y"].to_pylist()))


def test_rasterize_axis_aligned_lines():
    from geomesa_ray.geometry.base import LineString
    from geomesa_ray.geometry.wkb import to_wkb
    from geomesa_ray.stages.density import GridSnap

    snap = GridSnap((-180, -90, 180, 90), 256, 256)
    # horizontal: contiguous i run at one j
    got = _raster_cells(to_wkb(LineString([(0.0, 10.0), (10.0, 10.0)])))
    i0, i1 = int(snap.i(0.0)), int(snap.i(10.0))
    j = int(snap.j(10.0))
    assert got == {(i, j) for i in range(i0, i1 + 1)}
    # vertical
    got = _raster_cells(to_wkb(LineString([(5.0, -3.0), (5.0, 4.0)])))
    i = int(snap.i(5.0))
    j0, j1 = int(snap.j(-3.0)), int(snap.j(4.0))
    assert got == {(i, j) for j in range(j0, j1 + 1)}


def test_rasterize_diagonal_line_properties():
    """General Bresenham: cells form a connected chain near the segment,
    both endpoints painted, count == major-axis span + 1."""
    from geomesa_ray.geometry.base import LineString
    from geomesa_ray.geometry.wkb import to_wkb
    from geomesa_ray.stages.density import GridSnap

    snap = GridSnap((-180, -90, 180, 90), 256, 256)
    x0, y0, x1, y1 = -7.3, -2.1, 22.9, 17.8
    got = _raster_cells(to_wkb(LineString([(x0, y0), (x1, y1)])))
    i0, j0 = int(snap.i(x0)), int(snap.j(y0))
    i1, j1 = int(snap.i(x1)), int(snap.j(y1))
    assert (i0, j0) in got and (i1, j1) in got
    assert len(got) == max(abs(i1 - i0), abs(j1 - j0)) + 1
    # connectivity: sorted by i, consecutive cells are 8-adjacent
    cells = sorted(got)
    for a, b in zip(cells, cells[1:]):
        assert abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1


def test_rasterize_line_clips_to_envelope():
    from geomesa_ray.geometry.base import LineString
    from geomesa_ray.geometry.wkb import to_wkb

    # segment mostly outside the world: only the inside part rasterizes
    got = _raster_cells(to_wkb(LineString([(179.0, 0.0), (250.0, 0.0)])))
    assert got and all(x <= 255 for x, _ in got)


def test_rasterize_polygon_fill_and_holes():
    from geomesa_ray.geometry.base import Polygon
    from geomesa_ray.geometry.wkb import to_wkb
    from geomesa_ray.stages.density import GridSnap

    snap = GridSnap((-180, -90, 180, 90), 256, 256)
    # rectangle: every cell whose center is inside + outline
    rect = Polygon([(0.0, 0.0), (14.0, 0.0), (14.0, 7.0), (0.0, 7.0)])
    got = _raster_cells(to_wkb(rect))
    i0, i1 = int(snap.i(0.0)), int(snap.i(14.0))
    j0, j1 = int(snap.j(0.0)), int(snap.j(7.0))
    assert got == {(i, j) for i in range(i0, i1 + 1) for j in range(j0, j1 + 1)}
    # hole: center cells of the hole are excluded (outline cells remain)
    holed = Polygon(
        [(0.0, 0.0), (14.0, 0.0), (14.0, 7.0), (0.0, 7.0)],
        holes=[[(4.0, 2.0), (10.0, 2.0), (10.0, 5.0), (4.0, 5.0)]],
    )
    goth = _raster_cells(to_wkb(holed))
    mid = (int(snap.i(7.0)), int(snap.j(3.5)))
    assert mid in got and mid not in goth
    # thin sliver polygon (sub-cell height) still rasterizes via outline
    sliver = Polygon([(20.0, 20.0), (30.0, 20.0), (30.0, 20.01), (20.0, 20.01)])
    assert _raster_cells(to_wkb(sliver))


def test_vectorized_line_batch_matches_scalar_path():
    """The all-LineString fast path (one batched clip + Bresenham) must
    produce exactly the per-geometry scalar rasterization."""
    import numpy as np

    from geomesa_ray.stages.density import (
        GridSnap,
        _line_cells,
        _line_cells_batch,
        _parse_wkb_linestrings,
    )
    from geomesa_ray.geometry.base import LineString
    from geomesa_ray.geometry.wkb import to_wkb

    rng = np.random.default_rng(11)
    snap = GridSnap((-180, -90, 180, 90), 256, 256)
    blobs, geoms = [], []
    for _ in range(60):
        nseg = rng.integers(1, 6)
        pts = np.column_stack(
            [rng.uniform(-200, 200, nseg + 1), rng.uniform(-100, 100, nseg + 1)]
        )
        g = LineString(pts)
        geoms.append(g)
        blobs.append(to_wkb(g))
    coords, offsets = _parse_wkb_linestrings(blobs)
    gid, key = _line_cells_batch(snap, coords, offsets)
    fast = {}
    for g_, k_ in zip(gid.tolist(), key.tolist()):
        fast.setdefault(g_, set()).add(k_)
    for idx, g in enumerate(geoms):
        expect = set(_line_cells(snap, g.coords).tolist())
        assert fast.get(idx, set()) == expect, idx


def test_rasterize_weight_column(ray_session):
    import ray.data

    from geomesa_ray.geometry.base import LineString
    from geomesa_ray.geometry.wkb import to_wkb
    from geomesa_ray.stages.density import density

    tbl = pa.table(
        {
            "geom_wkb": pa.array(
                [
                    to_wkb(LineString([(0.0, 10.0), (3.0, 10.0)])),
                    to_wkb(LineString([(0.0, 10.0), (3.0, 10.0)])),
                ],
                pa.binary(),
            ),
            "w": pa.array([2.0, 3.0], pa.float64()),
        }
    )
    out = density(
        ray.data.from_arrow(tbl), geom_col="geom_wkb", weight_col="w"
    ).to_pandas()
    assert (out["weight"] == 5.0).all()  # both lines cover the same cells


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


def test_stats_tree_merge_bounded_driver(ray_session, geo_table):
    """compute_stats with a tiny driver budget forces tree-merge rounds;
    results must be identical to the flat merge."""
    import ray.data

    from geomesa_ray.stages.stats import StatSpec, compute_stats

    ds = ray.data.from_arrow(geo_table).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=97
    )
    specs = [
        StatSpec("n", "count", "lon"),
        StatSpec("mm", "min_max", "lat"),
        StatSpec("bylang", "count", "lon", group_by="lang"),
    ]
    flat = compute_stats(ds, specs, batch_size=97, max_driver_partials=10_000)
    tree = compute_stats(ds, specs, batch_size=97, fanin=3, max_driver_partials=2)
    assert flat == tree


def test_enumeration_topk_with_nulls(ray_session):
    """Nullable string columns must not crash the sort-based stat kernels
    (round-3 review finding): nulls are skipped, null group keys get
    their own group."""
    import ray.data

    from geomesa_ray.stages.stats import StatSpec, compute_stats

    t = pa.table({
        "k": pa.array(["a", None, "a", "b", None], pa.string()),
        "v": pa.array(["x", "y", None, "x", "z"], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    res = compute_stats(ds, [StatSpec("e", "enumeration", "v")])
    assert res["e"] == {"x": 2, "y": 1, "z": 1}
    res2 = compute_stats(ds, [StatSpec("g", "enumeration", "v", group_by="k")])
    assert res2["g"]["a"] == {"x": 1}
    assert res2["g"][None] == {"y": 1, "z": 1}


def test_raster_regions_matches_union_find(ray_session):
    """Connected components of a synthetic grid (snake + blob + singleton +
    sub-threshold noise) vs a brute-force union-find oracle."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geomesa_ray.stages.density import raster_regions

    W = H = 32
    cells = (
        # snake: L-shaped 7-cell region
        [(1, 1), (2, 1), (3, 1), (3, 2), (3, 3), (3, 4), (4, 4)]
        # blob: 2x2
        + [(10, 10), (11, 10), (10, 11), (11, 11)]
        # singleton
        + [(20, 20)]
        # diagonal-only neighbors: NOT connected under 4-adjacency
        + [(25, 25), (26, 26)]
        # wrap trap: x=W-1 next to x=0 of the following row (ids adjacent
        # but cells are not)
        + [(31, 5), (0, 6)]
    )
    weights = {c: 3.0 for c in cells}
    weights[(2, 1)] = 9.0
    # sub-threshold noise touching the snake must not join it
    noise = [(1, 2), (4, 1)]
    xs = [c[0] for c in cells] + [c[0] for c in noise]
    ys = [c[1] for c in cells] + [c[1] for c in noise]
    ws = [weights[c] for c in cells] + [1.0] * len(noise)
    t = pa.table({
        "tile_x": pa.array(xs, pa.int64()),
        "tile_y": pa.array(ys, pa.int64()),
        "weight": pa.array(ws, pa.float64()),
    })
    out = raster_regions(
        ray.data.from_arrow(t), threshold=2.0, width=W, height=H
    ).to_pandas()

    # brute-force union-find over the kept cells
    kept = set(cells)
    parent = {c: c for c in kept}
    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c
    for (x, y) in kept:
        for nb in ((x + 1, y), (x, y + 1)):
            if nb in kept:
                ra, rb = find((x, y)), find(nb)
                if ra != rb:
                    parent[ra] = rb
    groups = {}
    for c in kept:
        groups.setdefault(find(c), []).append(c)
    expect = []
    for g in groups.values():
        ids = [y * W + x for x, y in g]
        expect.append({
            "region": min(ids),
            "n_cells": len(g),
            "total_w": int(sum(weights[c] for c in g)),
            "min_x": min(x for x, _ in g), "min_y": min(y for _, y in g),
            "max_x": max(x for x, _ in g), "max_y": max(y for _, y in g),
        })
    expect.sort(key=lambda r: r["region"])
    got = out.to_dict("records")
    assert got == expect
    # structure sanity: snake is one 7-cell region, blob 2x2, etc.
    sizes = sorted(out["n_cells"])
    assert sizes == [1, 1, 1, 1, 1, 4, 7]


def test_raster_regions_empty_and_none_kept(ray_session):
    import pyarrow as pa
    import ray.data

    from geomesa_ray.stages.density import raster_regions

    t = pa.table({
        "tile_x": pa.array([1, 2], pa.int64()),
        "tile_y": pa.array([1, 2], pa.int64()),
        "weight": pa.array([1.0, 1.0], pa.float64()),
    })
    assert raster_regions(
        ray.data.from_arrow(t), threshold=5.0, width=8, height=8
    ).count() == 0
    empty = ray.data.from_arrow(t.slice(0, 0))
    assert raster_regions(empty, threshold=1.0, width=8, height=8).count() == 0


def test_hyperloglog_estimate_and_merge():
    """HLL: ±10% at 100k distinct (log2m=8 → σ≈6.5%), duplicates free,
    merge == single pass, linear counting near-exact at small n."""
    from geomesa_ray.stages.stats import HyperLogLog

    vals = np.arange(100_000, dtype=np.int64)
    h = HyperLogLog(8)
    h.observe(vals)
    assert abs(h.cardinality() - 100_000) / 100_000 < 0.15
    h1, h2 = HyperLogLog(8), HyperLogLog(8)
    h1.observe(vals[:50_000])
    h2.observe(vals[50_000:])
    h1.merge(h2)
    assert (h1.registers == h.registers).all()
    hd = HyperLogLog(8)
    hd.observe(np.repeat(np.arange(1000, dtype=np.int64), 50))
    assert abs(hd.cardinality() - 1000) / 1000 < 0.15
    hs = HyperLogLog(8)
    hs.observe(np.array([f"u{i}" for i in range(5000)], dtype=object))
    assert abs(hs.cardinality() - 5000) / 5000 < 0.15


def test_minmax_carries_hll_cardinality(ray_session):
    """Reference parity: MinMax reports the HLL distinct estimate as
    cardinality (MinMax.scala:33-49), count separately."""
    import ray.data

    from geomesa_ray.stages.stats import StatSpec, compute_stats

    t = pa.table({"v": pa.array(np.repeat(np.arange(500, dtype=np.int64), 4))})
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=97
    )
    out = compute_stats(ds, [StatSpec("mm", "min_max", "v")], batch_size=97)
    r = out["mm"]
    assert r["min"] == 0 and r["max"] == 499 and r["count"] == 2000
    assert abs(r["cardinality"] - 500) / 500 < 0.2


def test_z3_frequency_never_underestimates(ray_session):
    """Z3Frequency (CMS over (bin, z3-prefix) keys): estimates >= truth,
    merge additive, distributed == single-pass."""
    import collections

    import ray.data

    from geomesa_ray.stages.stats import StatSpec, Z3Frequency, compute_stats

    rng = np.random.default_rng(3)
    bins = rng.integers(0, 5, 4000).astype(np.int64)
    z3 = rng.integers(0, 1 << 40, 4000).astype(np.int64)
    t = pa.table({"z3_bin": pa.array(bins), "z3": pa.array(z3)})
    truth = collections.Counter(
        zip(bins.tolist(), (z3 >> (63 - 12)).tolist())
    )
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=333
    )
    out = compute_stats(
        ds, [StatSpec("f", "z3_frequency", ["z3_bin", "z3"], prefix_bits=12)],
        batch_size=333,
    )
    f: Z3Frequency = out["f"]
    for (b, zp), c in truth.items():
        assert f.estimate(int(b), int(zp << (63 - 12))) >= c
    # single-pass equals distributed state
    solo = Z3Frequency(prefix_bits=12)
    solo.observe(np.stack([bins, z3], axis=1))
    assert (solo.freq.table == f.freq.table).all()


def test_parse_stat_specs_and_unobserve():
    from geomesa_ray.stages.stats import (Count, Enumeration, Frequency,
                                          Histogram, HyperLogLog,
                                          parse_stat_specs)

    specs = parse_stat_specs(
        "MinMax(value);Count();Histogram(lat,10,-90,90);"
        "GroupBy(lang,Count(url));Frequency(lang,11);TopK(lang,3)"
    )
    kinds = [(s.kind, s.group_by) for s in specs]
    assert kinds == [("min_max", None), ("count", None), ("histogram", None),
                     ("count", "lang"), ("frequency", None), ("top_k", None)]
    assert specs[2].kwargs == {"bins": 10, "lo": -90.0, "hi": 90.0}
    with pytest.raises(ValueError):
        parse_stat_specs("NoSuchStat(x)")

    # exact deletion round-trips for additive sketches
    c = Count(); c.observe(np.arange(5)); c.unobserve(np.arange(2))
    assert c.result()["count"] == 3
    e = Enumeration()
    e.observe(np.array(["a", "a", "b"], object))
    e.unobserve(np.array(["a", "b"], object))
    assert e.result() == {"a": 1}
    h = Histogram(4, 0.0, 4.0)
    h.observe(np.array([0.5, 1.5, 1.6])); h.unobserve(np.array([1.5]))
    assert h.result()["counts"] == [1, 1, 0, 0]
    f = Frequency()
    f.observe(np.array(["x", "x", "y"])); f.unobserve(np.array(["x"]))
    assert f.estimate("x") == 1 and f.estimate("y") == 1
    # register sketches refuse deletion
    with pytest.raises(NotImplementedError):
        HyperLogLog().unobserve(np.arange(3))


def test_cli_sketch_spec(ray_session):
    # SUBPROCESS: cli.main owns (and shuts down) its own Ray session,
    # which must never touch the shared test session (test_route_cli.py
    # convention — running in-process re-inits later tests at 32 cpus)
    import json as _json
    import os
    import subprocess
    import sys

    env = {**os.environ, "RAY_ADDRESS": "local"}
    proc = subprocess.run(
        [sys.executable, "-m", "geomesa_ray.cli", "--num-cpus", "4",
         "sketch", "--table", "events",
         "--spec", "MinMax(value);Count();GroupBy(event_type,Count(event_id))",
         "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _json.loads(proc.stdout.strip().splitlines()[-1])
    st = out["stats"]
    assert st["Count()"]["count"] == 1000
    assert st["MinMax(value)"]["min"] is not None
    group = st["GroupBy(event_type,Count(event_id))"]
    assert sum(v["count"] for v in group.values()) == 1000
