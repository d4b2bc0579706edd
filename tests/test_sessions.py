"""Event-time sessionization vs brute-force + window-SQL semantics."""

import numpy as np
import pyarrow as pa
import pytest


def _brute(users, ts_us, gap_us):
    from collections import defaultdict

    per = defaultdict(list)
    for u, t in zip(users, ts_us):
        per[u].append(t)
    out = {}
    for u, ts in per.items():
        ts.sort()
        sno, start, prev, n = 1, ts[0], ts[0], 0
        for t in ts:
            if t - prev > gap_us:
                out[(u, sno)] = (n, start, prev)
                sno, start, n = sno + 1, t, 0
            n += 1
            prev = t
        out[(u, sno)] = (n, start, prev)
    return out


@pytest.mark.parametrize("batch_size", [3, 1000])
def test_sessionize_matches_brute(ray_session, batch_size):
    import ray.data

    from geomesa_ray.stages.sessions import sessionize

    rng = np.random.default_rng(5)
    users = rng.integers(0, 12, 400)
    ts_us = rng.integers(0, 10**9, 400) * 1000
    ts_us[10] = ts_us[11] = 777_000  # equal-timestamp tie
    users[10] = users[11] = 3
    t = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=batch_size
    )
    gap_s = 50_000
    got = sessionize(ds, gap_s=gap_s, n_shards=5).to_pandas()
    exp = _brute(users.tolist(), ts_us.tolist(), gap_s * 1_000_000)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, s, e = exp[(r["user_id"], r["session_no"])]
        assert (r["n_events"], r["start_us"], r["end_us"]) == (n, s, e)


def test_sessionize_gap_boundary_strict(ray_session):
    """gap == timeout stays in the SAME session (break is strictly >)."""
    import ray.data

    from geomesa_ray.stages.sessions import sessionize

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1], pa.int64()),
            # gaps: exactly 10s, then 10s + 1us
            "ts": pa.array([0, 10_000_000, 20_000_001], pa.timestamp("us")),
        }
    )
    got = (
        sessionize(ray.data.from_arrow(t), gap_s=10)
        .to_pandas()
        .sort_values("session_no")
        .reset_index(drop=True)
    )
    assert list(got["n_events"]) == [2, 1]
    assert list(got["session_no"]) == [1, 2]


def test_sessionize_ms_timestamps(ray_session):
    """ms-precision input scales to us without truncating casts."""
    import ray.data

    from geomesa_ray.stages.sessions import sessionize

    t = pa.table(
        {
            "user_id": pa.array([7, 7], pa.int64()),
            "ts": pa.array([1_000, 2_000], pa.timestamp("ms")),
        }
    )
    got = sessionize(ray.data.from_arrow(t), gap_s=10).to_pandas()
    assert list(got["start_us"]) == [1_000_000]
    assert list(got["end_us"]) == [2_000_000]


def test_bpe_token_count_matches_python(ray_session):
    import re

    from geomesa_ray.stages.textstats import BPE_TOKEN_RE, bpe_token_count

    texts = ["I don't think it's 42% true... naïve café #1",
             "hello  world", "", "a'll b've c's", "日本語 text123"]
    got = bpe_token_count(pa.array(texts)).to_pylist()
    # Python's re lacks \p{L}: spot-check via explicit expectations from
    # the RE2 segmentation (verified against DuckDB's RE2 in the oracle)
    assert got == [14, 2, 0, 6, 3]


def test_knn_tie_break_at_k_boundary(ray_session):
    """Equidistant candidates at the k-cut must resolve by ascending id —
    across partial batches too (round-3 review)."""
    import ray.data

    from geomesa_ray.pipelines.knn import knn_brute

    t = pa.table(
        {
            "url": pa.array(["e", "d", "c", "b", "a", "z"], pa.string()),
            "lon": pa.array([1.0] * 5 + [50.0], pa.float64()),
            "lat": pa.array([1.0] * 5 + [50.0], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=2
    )
    got = knn_brute(ds, [0.0], [0.0], 3, id_col="url").to_pandas()
    assert sorted(got["url"]) == ["a", "b", "c"]


def test_ann_tie_break_at_k_boundary(ray_session):
    import ray.data

    from geomesa_ray.stages.similarity import ann_brute

    emb = [[1.0, 0.0]] * 5 + [[0.0, 1.0]]
    t = pa.table(
        {
            "vec_id": pa.array([50, 40, 30, 20, 10, 5], pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=2
    )
    got = ann_brute(ds, np.array([[1.0, 0.0]]), 3).to_pandas()
    assert sorted(got["vec_id"]) == [10, 20, 30]


def test_tumbling_counts_edges(ray_session):
    import ray.data

    from geomesa_ray.stages.sessions import tumbling_counts

    # window boundary: ts == window start belongs to that window
    t = pa.table(
        {
            "ts": pa.array([0, 9_999_999, 10_000_000, 25_000_000], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
        }
    )
    got = (
        tumbling_counts(ray.data.from_arrow(t), window_s=10)
        .to_pandas()
        .sort_values(["window_start_us", "event_type"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [
        [0, "a", 2], [10_000_000, "a", 1], [20_000_000, "b", 1],
    ]
    # keyless mode and the non-converging fallback agree with the default
    total = tumbling_counts(ray.data.from_arrow(t), window_s=10, key_col=None)
    assert sorted(total.to_pandas()["n_events"]) == [1, 1, 2]
    fb = tumbling_counts(
        ray.data.from_arrow(t), window_s=10, fanin_rows=1
    ).to_pandas().sort_values(["window_start_us", "event_type"]).reset_index(drop=True)
    assert fb.values.tolist() == got.values.tolist()


def test_sessionize_property_random(ray_session):
    """Randomized property check vs the brute oracle across shard counts
    and gap sizes (heavy ties and singleton users included)."""
    import ray.data

    from geomesa_ray.stages.sessions import sessionize

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(50, 300))
        users = rng.integers(0, int(rng.integers(2, 20)), n)
        ts_us = rng.integers(0, 10**7, n) * 100  # dense: many ties/gaps
        gap_s = int(rng.integers(1, 100))
        t = pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
            }
        )
        ds = ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=13
        )
        got = sessionize(ds, gap_s=gap_s, n_shards=int(rng.integers(1, 9)))
        exp = _brute(users.tolist(), ts_us.tolist(), gap_s * 1_000_000)
        gdf = got.to_pandas()
        assert len(gdf) == len(exp), trial
        for _, r in gdf.iterrows():
            assert exp[(r["user_id"], r["session_no"])] == (
                r["n_events"], r["start_us"], r["end_us"]
            ), trial


def test_cdf_buckets_invariants_random(ray_session):
    """Buckets are monotone in value, within [0, n_buckets), and the
    strictly-smaller-count formula holds exactly."""
    import ray.data

    from geomesa_ray.stages.corpus import cdf_buckets

    rng = np.random.default_rng(23)
    vals = rng.integers(0, 40, 500)
    t = pa.table(
        {
            "doc_id": pa.array(range(500), pa.int64()),
            "n_chars": pa.array(vals, pa.int64()),
        }
    )
    for nb in (2, 7, 10):
        got = cdf_buckets(
            ray.data.from_arrow(t), n_buckets=nb
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        v = got["n_chars"].to_numpy()
        b = got["bucket"].to_numpy()
        assert b.min() >= 0 and b.max() < nb
        order = np.argsort(v, kind="stable")
        assert (np.diff(b[order]) >= 0).all()  # monotone in value
        for val in np.unique(v):
            smaller = int((v < val).sum())
            assert (b[v == val] == smaller * nb // len(v)).all()


def test_sliding_counts_matches_bruteforce(ray_session):
    """Each event lands in exactly window/hop consecutive windows; counts
    match a per-window brute force (and the hop=window case degenerates to
    tumbling)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geomesa_ray.stages.sessions import sliding_counts, tumbling_counts

    rng = np.random.RandomState(3)
    us = rng.randint(0, 10 * 86_400, 500).astype(np.int64) * 1_000_000
    types = np.array(["a", "b", "c"])[rng.randint(0, 3, 500)]
    t = pa.table({
        "ts": pa.array(us, pa.timestamp("us")),
        "event_type": pa.array(types.tolist(), pa.string()),
    })
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=37
    )
    out = sliding_counts(ds, window_s=86_400, hop_s=21_600).to_pandas()
    h = 21_600 * 1_000_000
    exp = {}
    for u, k in zip(us, types):
        base = (u // h) * h
        for j in range(4):
            exp[(base - j * h, k)] = exp.get((base - j * h, k), 0) + 1
    got = {(r.window_start_us, r.event_type): r.n_events
           for r in out.itertuples()}
    assert got == exp
    # degenerate hop == window: identical to tumbling
    sl = sliding_counts(ds, window_s=86_400, hop_s=86_400).to_pandas()
    tu = tumbling_counts(ds, window_s=86_400).to_pandas()
    key = ["window_start_us", "event_type"]
    assert sl.sort_values(key).reset_index(drop=True).equals(
        tu.sort_values(key).reset_index(drop=True))


def test_sliding_counts_rejects_uneven_hop(ray_session):
    import pytest

    from geomesa_ray.stages.sessions import sliding_counts

    with pytest.raises(ValueError, match="multiple"):
        sliding_counts(None, window_s=100, hop_s=33)
