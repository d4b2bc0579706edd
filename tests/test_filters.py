"""Filter algebra: extraction (And=intersect, Or=union), evaluation, and
planned multi-extent scans vs a naive full-evaluation oracle."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.geometry.base import box
from geomesa_ray.pipelines.filters import (
    And,
    AttrEq,
    AttrRange,
    BBox,
    During,
    GeomPredicate,
    Or,
    evaluate,
    extract_bboxes,
    extract_intervals,
    plan,
    scan_with_filter,
)
from geomesa_ray.pipelines.ingest import ingest_pages
from geomesa_ray.sources.synth import write_pages_parquet


def test_extract_bboxes_and_algebra():
    f = And(BBox(0, 0, 10, 10), BBox(5, 5, 20, 20))
    assert extract_bboxes(f) == [(5, 5, 10, 10)]
    # disjoint And → empty extent list (provably empty result)
    assert extract_bboxes(And(BBox(0, 0, 1, 1), BBox(5, 5, 6, 6))) == []
    f = Or(BBox(0, 0, 1, 1), BBox(5, 5, 6, 6))
    assert extract_bboxes(f) == [(0, 0, 1, 1), (5, 5, 6, 6)]
    # Or with an unbounded arm defeats spatial pruning
    assert extract_bboxes(Or(BBox(0, 0, 1, 1), AttrEq("lang", "en"))) == []
    # And with a non-spatial sibling keeps the spatial extent
    assert extract_bboxes(And(BBox(0, 0, 1, 1), AttrEq("lang", "en"))) == [(0, 0, 1, 1)]
    # geometry clipped to world
    g = GeomPredicate(box(170, -10, 190, 10))
    assert extract_bboxes(g) == [(170, -10, 180, 10)]


def test_extract_intervals():
    a = During(0, 100)
    b = During(50, 200)
    assert extract_intervals(And(a, b)) == [(50, 100)]
    assert extract_intervals(Or(a, b)) == [(0, 100), (50, 200)]
    assert extract_intervals(Or(a, AttrEq("x", 1))) == []
    assert extract_intervals(And(a, AttrEq("x", 1))) == [(0, 100)]


def test_evaluate_matrix():
    batch = pa.table(
        {
            "lon": pa.array([5.0, 15.0, 5.0], pa.float64()),
            "lat": pa.array([5.0, 5.0, 50.0], pa.float64()),
            "warc_ts": pa.array([100, 100, 300], pa.timestamp("ms")),
            "lang": pa.array(["en", "de", "en"]),
            "n": pa.array([1, 5, 10], pa.int64()),
        }
    )
    f = And(BBox(0, 0, 10, 10), During(0, 200), AttrEq("lang", "en"))
    assert evaluate(f, batch).tolist() == [True, False, False]
    f2 = Or(AttrRange("n", lo=6), GeomPredicate(box(14, 4, 16, 6)))
    assert evaluate(f2, batch).tolist() == [False, True, True]


def test_scan_with_filter_vs_oracle(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    raw, idx = tmp_path / "raw", tmp_path / "idx"
    raw.mkdir()
    write_pages_parquet(str(raw), 3000, seed=66, shard_rows=1500)
    ingest_pages(str(raw), str(idx), n_groups=2, target_rows_per_file=1000)

    f = And(
        Or(BBox(-80, 30, -60, 50), BBox(-10, 40, 15, 55)),
        During(1606780800000, 1609459200000),
        AttrEq("lang", "en"),
    )
    got = sorted(scan_with_filter(str(idx), f).to_pandas()["url"])
    allp = pa.concat_tables(
        pq.read_table(p) for p in glob.glob(f"{idx}/group=*/*.parquet")
    )
    mask = evaluate(f, allp)
    expect = sorted(np.asarray(allp["url"].to_pylist())[mask])
    assert got == expect
    assert len(expect) > 0

    # plan() splits: extents present, residual = full filter
    fp = plan(f)
    assert len(fp.bboxes) == 2 and len(fp.intervals) == 1


def test_and_with_unbounded_or_arm_keeps_sibling_bbox():
    """An Or arm containing a non-spatial predicate is UNBOUNDED ([]);
    And must skip it, not intersect-annihilate the sibling's tight bbox
    (round-3 review finding)."""
    f = And(
        BBox(-10, 40, 30, 60),
        Or(BBox(0, 0, 1, 1), AttrEq("t", "x")),
    )
    assert extract_bboxes(f) == [(-10, 40, 30, 60)]
