"""Upsert view semantics: latest-by-event-time, late-record drop, TTL."""

import pyarrow as pa

from geomesa_ray.state.upsert import expire, latest_view, merge_updates


def _tbl(rows):
    return pa.table(
        {
            "fid": pa.array([r[0] for r in rows], pa.string()),
            "event_ts": pa.array([r[1] for r in rows], pa.int64()),
            "val": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_latest_view_ordered_semantics(ray_session):
    import ray.data

    updates = _tbl(
        [
            ("a", 100, "a-old"),
            ("a", 300, "a-new"),
            ("a", 200, "a-late"),  # late record: older event time → dropped
            ("b", 50, "b-only"),
        ]
    )
    view = latest_view(ray.data.from_arrow(updates)).to_pandas().sort_values("fid")
    assert view["val"].tolist() == ["a-new", "b-only"]
    assert view["event_ts"].tolist() == [300, 50]


def test_latest_view_tie_breaks_by_seq(ray_session):
    import ray.data

    updates = _tbl([("a", 100, "first"), ("a", 100, "second")]).append_column(
        "seq", pa.array([1, 2], pa.int64())
    )
    view = latest_view(ray.data.from_arrow(updates), seq_col="seq").to_pandas()
    assert view["val"].tolist() == ["second"]  # same event time: last write wins


def test_merge_updates_and_ttl(ray_session):
    import ray.data

    base = latest_view(ray.data.from_arrow(_tbl([("a", 100, "a1"), ("b", 100, "b1")])))
    upd = ray.data.from_arrow(_tbl([("a", 200, "a2"), ("c", 150, "c1")]))
    merged = merge_updates(base, upd).to_pandas().sort_values("fid")
    assert merged["val"].tolist() == ["a2", "b1", "c1"]
    alive = (
        expire(
            merge_updates(base, upd), now_ms=250, ttl_ms=120
        )
        .to_pandas()
        .sort_values("fid")
    )
    # horizon = 130: only a (200) and c (150) survive
    assert alive["val"].tolist() == ["a2", "c1"]


def test_expire_timestamp_typed_column(ray_session):
    """expire() must compare timestamp-typed columns in their own unit —
    raw us values against a ms horizon would keep everything."""
    import ray.data

    from geomesa_ray.state.upsert import expire

    t = pa.table(
        {
            "fid": pa.array(["a", "b"], pa.string()),
            "event_ts": pa.array([100_000, 200_000], pa.timestamp("us")),
        }
    )
    alive = expire(
        ray.data.from_arrow(t), now_ms=250, ttl_ms=100, time_col="event_ts"
    ).to_pandas()
    assert alive["fid"].tolist() == ["b"]
