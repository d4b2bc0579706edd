"""Cost-based strategy selection (StrategyDecider/StatsBasedEstimator
analog): estimates, decisions, and correctness-independence of the choice."""

import numpy as np
import pytest

from geomesa_ray.pipelines.costs import (
    DEFAULT_ATTR_SELECTIVITY,
    attribute_selectivity,
    decide,
    estimate_attribute,
    estimate_spatial,
    layout_total_rows,
    scan_decided,
)
from geomesa_ray.pipelines.ingest import ingest_pages
from geomesa_ray.pipelines.scan import Query
from geomesa_ray.sources.synth import write_pages_parquet


@pytest.fixture(scope="module")
def layout(tmp_path_factory, ray_session):
    raw = tmp_path_factory.mktemp("cost_raw")
    write_pages_parquet(str(raw), 4000, seed=33, shard_rows=1000)
    out = tmp_path_factory.mktemp("cost_idx")
    ingest_pages(str(raw), str(out), n_groups=2, target_rows_per_file=500)
    return str(out)


def test_spatial_estimate_bounds_actual(ray_session, layout):
    q = Query(bbox=(-10.0, 40.0, 10.0, 55.0))
    est = estimate_spatial(layout, q)
    from geomesa_ray.pipelines.scan import scan

    actual = scan(layout, q).count()
    # the estimate is the pruned-file row count: an upper bound on the
    # true result, never below it
    assert est.est_rows >= actual
    assert est.est_rows <= layout_total_rows(layout)


def test_attribute_selectivity_paths():
    counts = {"en": 700, "de": 200, "fr": 100}
    assert attribute_selectivity("en", counts, 1000) == 0.7
    assert attribute_selectivity("zz", counts, 1000) == 0.0
    assert attribute_selectivity("en", None, 1000) == DEFAULT_ATTR_SELECTIVITY


def test_decider_prefers_cheaper_strategy(ray_session, layout):
    total = layout_total_rows(layout)
    # rare attribute + world bbox → attribute strategy
    d = decide(
        layout,
        Query(bbox=(-180, -90, 180, 90)),
        attr_value="mi",
        attr_counts={"mi": 5, "en": total - 5},
    )
    assert d.strategy == "attribute"
    # tiny bbox + common attribute → spatial strategy
    d2 = decide(
        layout,
        Query(bbox=(2.0, 48.0, 3.0, 49.0)),
        attr_value="en",
        attr_counts={"en": total},
    )
    assert d2.strategy in ("spatial",)  # must beat total-row attribute cost
    assert d2.est_rows <= total
    # no predicates at all → full
    assert decide(layout).strategy == "full"


def test_scan_decided_same_rows_under_both_strategies(ray_session, layout):
    """The strategy choice must never change the result set."""
    q = Query(bbox=(-30.0, 30.0, 30.0, 60.0))
    # force both paths via the counts sketch
    total = layout_total_rows(layout)
    ds_attr, est_a = scan_decided(
        layout, q, attr_col="lang", attr_value="en",
        attr_counts={"en": 1},  # lie: makes attribute look free
    )
    ds_spat, est_s = scan_decided(
        layout, q, attr_col="lang", attr_value="en",
        attr_counts={"en": total},  # attribute looks expensive
    )
    assert est_a.strategy == "attribute" and est_s.strategy == "spatial"
    a = sorted(ds_attr.to_pandas()["url"])
    s = sorted(ds_spat.to_pandas()["url"])
    assert a == s and len(a) > 0


@pytest.fixture(scope="module")
def dual_layouts(tmp_path_factory, ray_session):
    """The same rows ingested under z3 (spatio-temporal) and z2 (pure
    spatial) clustering — the reference's separate index tables."""
    raw = tmp_path_factory.mktemp("dual_raw")
    write_pages_parquet(str(raw), 6000, seed=77, shard_rows=1500)
    z3 = tmp_path_factory.mktemp("dual_z3")
    z2 = tmp_path_factory.mktemp("dual_z2")
    ingest_pages(str(raw), str(z3), n_groups=2, target_rows_per_file=300)
    ingest_pages(str(raw), str(z2), n_groups=2, target_rows_per_file=300,
                 sort_by="z2")
    return {"z3": str(z3), "z2": str(z2)}


def test_z2_layout_prunes_spatial_queries_harder(ray_session, dual_layouts):
    from geomesa_ray.pipelines.scan import Query, plan_files, scan

    q = Query(bbox=(0.0, 45.0, 6.0, 52.0))
    f_z3 = plan_files(dual_layouts["z3"], q)
    f_z2 = plan_files(dual_layouts["z2"], q)
    # spatial clustering keeps per-file z2 ranges tight → fewer files
    assert len(f_z2) < len(f_z3)
    # both layouts return identical rows
    a = sorted(scan(dual_layouts["z3"], q).to_pandas()["url"])
    b = sorted(scan(dual_layouts["z2"], q).to_pandas()["url"])
    assert a == b and len(a) > 0


def test_choose_layout_picks_by_cost(ray_session, dual_layouts):
    from geomesa_ray.pipelines.costs import choose_layout
    from geomesa_ray.pipelines.scan import Query

    name, est = choose_layout(dual_layouts, Query(bbox=(0.0, 45.0, 6.0, 52.0)))
    assert name == "z2"  # bbox-only query: the spatial layout is cheaper
    assert est.strategy == "spatial"


# ---------------------------------------------------------------------------
# attribute-index layout (attrindex.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def attr_layout_dir(tmp_path_factory, ray_session, layout):
    """Attr-sorted layout over the SAME rows as the z layout (lang key)."""
    import glob
    import os

    out = tmp_path_factory.mktemp("cost_attr_idx")
    from geomesa_ray.pipelines.attrindex import ingest_attr

    files = sorted(glob.glob(os.path.join(layout, "group=*", "*.parquet")))
    ingest_attr(files, str(out), attr_col="lang", n_groups=2,
                target_rows_per_file=500)
    return str(out)


def test_attr_layout_prunes_files(ray_session, layout, attr_layout_dir):
    import glob
    import os

    from geomesa_ray.pipelines.attrindex import attr_scan, plan_attr_files

    total = len(glob.glob(os.path.join(attr_layout_dir, "group=*", "*.parquet")))
    # a rare language must not scan everything
    import pyarrow.parquet as pq

    langs = pq.read_table(
        glob.glob(os.path.join(layout, "group=*", "*.parquet")),
        columns=["lang"],
    )["lang"].to_pandas().value_counts()
    rare = langs.index[-1]
    pruned = plan_attr_files(attr_layout_dir, value=rare)
    assert 0 < len(pruned) < total
    # results equal a brute filter over the z layout
    got = sorted(attr_scan(attr_layout_dir, value=rare).to_pandas()["url"])
    import ray.data

    brute = ray.data.read_parquet(
        glob.glob(os.path.join(layout, "group=*", "*.parquet"))
    ).filter(lambda r: r["lang"] == rare).to_pandas()
    assert got == sorted(brute["url"]) and len(got) > 0


def test_attr_layout_range_scan(ray_session, attr_layout_dir, layout):
    import glob
    import os

    import ray.data

    from geomesa_ray.pipelines.attrindex import attr_scan

    got = sorted(attr_scan(attr_layout_dir, lo="de", hi="en").to_pandas()["url"])
    brute = ray.data.read_parquet(
        glob.glob(os.path.join(layout, "group=*", "*.parquet"))
    ).filter(lambda r: "de" <= r["lang"] <= "en").to_pandas()
    assert got == sorted(brute["url"])


def test_decider_routes_to_attr_layout(ray_session, layout, attr_layout_dir):
    """With an attr layout, the attribute candidate is costed from pruned
    files and scan_decided runs the pruned path — same rows as spatial."""
    import glob
    import os

    import pyarrow.parquet as pq

    langs = pq.read_table(
        glob.glob(os.path.join(layout, "group=*", "*.parquet")),
        columns=["lang"],
    )["lang"].to_pandas().value_counts()
    rare = langs.index[-1]
    q = Query(bbox=(-180.0, -90.0, 180.0, 90.0))
    ds, est = scan_decided(
        layout, q, attr_col="lang", attr_value=rare, attr_layout=attr_layout_dir
    )
    assert est.strategy == "attribute" and "indexed" in est.detail
    got = sorted(ds.to_pandas()["url"])
    ds_s, est_s = scan_decided(
        layout, Query(bbox=(-180.0, -90.0, 180.0, 90.0)), attr_col="lang",
        attr_value=rare, attr_counts={rare: 10**9},  # force spatial/full path
    )
    assert est_s.strategy != "attribute" or "indexed" not in est_s.detail
    other = sorted(ds_s.to_pandas()["url"])
    assert got == other and len(got) > 0


def test_attr_ingest_resume_skips_complete_groups(ray_session, layout, tmp_path):
    import glob
    import os

    from geomesa_ray.pipelines.attrindex import ingest_attr, load_attr_manifest

    files = sorted(glob.glob(os.path.join(layout, "group=*", "*.parquet")))
    out = str(tmp_path / "attr_resume")
    m1 = ingest_attr(files, out, attr_col="lang", n_groups=2,
                     target_rows_per_file=500)
    t1 = {k: e.wall_time_s for k, e in m1.items()}
    m2 = ingest_attr(files, out, attr_col="lang", n_groups=2,
                     target_rows_per_file=500)
    assert {k: e.wall_time_s for k, e in m2.items()} == t1  # untouched
    assert sorted(load_attr_manifest(out)) == [0, 1]


def test_attr_manifest_timestamp_roundtrip(ray_session, tmp_path):
    """Timestamp attr min/max must survive the manifest's JSON round-trip
    TYPED — a reloaded manifest compared str-vs-datetime used to raise at
    plan time (round-3 review finding)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from geomesa_ray.pipelines.attrindex import (
        ingest_attr,
        load_attr_manifest,
        plan_attr_files,
    )

    ts = [datetime.datetime(2024, 1, d + 1) for d in range(20)]
    tbl = pa.table({
        "event_id": pa.array(range(20), pa.int64()),
        "when": pa.array(ts, pa.timestamp("us")),
    })
    src = tmp_path / "src.parquet"
    pq.write_table(tbl, src)
    out = tmp_path / "ts_attr_idx"
    ingest_attr([str(src)], str(out), attr_col="when", n_groups=2,
                target_rows_per_file=5)
    man = load_attr_manifest(str(out))
    for entry in man.values():
        for fs in entry.files:
            assert isinstance(fs.attr_min, datetime.datetime), fs.attr_min
    # typed range plan: no TypeError, and the window prunes files
    lo = datetime.datetime(2024, 1, 3)
    hi = datetime.datetime(2024, 1, 5)
    files = plan_attr_files(str(out), lo=lo, hi=hi)
    total = sum(len(e.files) for e in man.values())
    assert 0 < len(files) < total
