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
