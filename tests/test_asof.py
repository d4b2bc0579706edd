"""As-of join (stages/asof.py): kernel vs brute force (random data with
ties, unmatched keys, tolerance), then the distributed path vs DuckDB's
native ASOF LEFT JOIN at sf0.001."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.stages.asof import _asof_shard, asof_join


def _group(lk, lt, lid, rk, rt, rv):
    n_l, n_r = len(lk), len(rk)
    return pa.table({
        "__side__": pa.array([1] * n_l + [0] * n_r, pa.int64()),
        "__key__": pa.array(list(lk) + list(rk), pa.int64()),
        "__us__": pa.array(list(lt) + list(rt), pa.int64()),
        "__val__": pa.array(list(lid) + list(rv), pa.int64()),
    })


def _brute(lk, lt, rk, rt, rv, tol_us=None):
    """Reference: max-ts right row per left, ties to max value."""
    out = []
    for k, t in zip(lk, lt):
        best = (-1, -1)
        for k2, t2, v2 in zip(rk, rt, rv):
            if k2 == k and t2 <= t and (tol_us is None or t - t2 <= tol_us):
                if t2 > best[0] or (t2 == best[0] and v2 > best[1]):
                    best = (t2, v2)
        out.append(best)
    return out


def test_kernel_vs_bruteforce_random():
    rng = np.random.RandomState(7)
    lk = rng.randint(0, 8, 200)
    lt = rng.randint(0, 50, 200).astype(np.int64) * 1_000_000
    lid = np.arange(200, dtype=np.int64)
    rk = rng.randint(0, 10, 150)
    rt = rng.randint(0, 50, 150).astype(np.int64) * 1_000_000
    rv = rng.randint(0, 1000, 150).astype(np.int64)
    out = _asof_shard(_group(lk, lt, lid, rk, rt, rv), None).to_pandas()
    out = out.sort_values("left_id").reset_index(drop=True)
    exp = _brute(lk, lt, rk, rt, rv)
    assert out.match_ts_us.tolist() == [e[0] for e in exp]
    assert out.match_val.tolist() == [e[1] for e in exp]


def test_kernel_tolerance():
    lk, lt, lid = [1, 1], [100, 100], [10, 11]
    rk, rt, rv = [1], [40], [5]
    out = _asof_shard(_group(lk, lt, lid, rk, rt, rv), tol_us=59).to_pandas()
    assert (out.match_ts_us == -1).all()
    out = _asof_shard(_group(lk, lt, lid, rk, rt, rv), tol_us=60).to_pandas()
    assert (out.match_ts_us == 40).all()
    assert (out.match_val == 5).all()


def test_kernel_tie_resolves_to_max_value():
    out = _asof_shard(
        _group([1], [10], [0], [1, 1, 1], [10, 10, 3], [7, 9, 100]), None
    ).to_pandas()
    assert out.match_ts_us.tolist() == [10]
    assert out.match_val.tolist() == [9]


def test_kernel_inclusive_and_empty_sides():
    # inclusive: equal timestamps match
    out = _asof_shard(_group([1], [5], [0], [1], [5], [42]), None).to_pandas()
    assert out.match_val.tolist() == [42]
    # empty right: sentinels
    out = _asof_shard(_group([1], [5], [0], [], [], []), None).to_pandas()
    assert out.match_val.tolist() == [-1]
    # empty left / empty group: empty typed table
    assert len(_asof_shard(_group([], [], [], [1], [5], [42]), None)) == 0
    empty = _group([], [], [], [], [], [])
    assert _asof_shard(empty.slice(0, 0), None).schema.names == [
        "left_id", "key", "ts_us", "match_ts_us", "match_val"
    ]


def test_pipeline_matches_duckdb_asof(ray_session):
    import duckdb
    import pandas as pd

    from geomesa_ray.pipelines.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    out = QUERIES["asof_join"](sf).to_pandas()
    exp = con.sql(ORACLE_SQL["asof_join"]).df()

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a, b = norm(out), norm(exp)
    assert len(a) > 0
    assert (a.match_ts_us != -1).any()  # some purchases have a prior view
    assert dict(a.dtypes) == dict(b.dtypes)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# interval (range) join
# ---------------------------------------------------------------------------

def _igroup(ek, et, eid, ik, lo, hi, iid):
    n_e, n_i = len(ek), len(ik)
    return pa.table({
        "__side__": pa.array([1] * n_e + [0] * n_i, pa.int64()),
        "__key__": pa.array(list(ek) + list(ik), pa.int64()),
        "__us__": pa.array(list(et) + list(lo), pa.int64()),
        "__us2__": pa.array(list(et) + list(hi), pa.int64()),
        "__val__": pa.array(list(eid) + list(iid), pa.int64()),
    })


def test_interval_kernel_vs_bruteforce():
    from geomesa_ray.stages.asof import _interval_shard

    rng = np.random.RandomState(11)
    ek = rng.randint(0, 6, 300)
    et = rng.randint(0, 100, 300).astype(np.int64)
    eid = np.arange(300, dtype=np.int64)
    ik = rng.randint(0, 8, 40)
    lo = rng.randint(0, 90, 40).astype(np.int64)
    hi = lo + rng.randint(0, 30, 40)
    iid = np.arange(1000, 1040, dtype=np.int64)
    out = _interval_shard(_igroup(ek, et, eid, ik, lo, hi, iid)).to_pandas()
    got = set(zip(out.interval_id, out.event_id))
    exp = set()
    for a, l, h, i in zip(ik, lo, hi, iid):
        for b, t, e in zip(ek, et, eid):
            if a == b and l <= t <= h:
                exp.add((i, e))
    assert got == exp
    # lag values
    lom = dict(zip(iid, lo))
    etm = dict(zip(eid, et))
    for _, r in out.iterrows():
        assert r.lag_us == etm[r.event_id] - lom[r.interval_id]


def test_interval_kernel_bounds_inclusive_and_empty():
    from geomesa_ray.stages.asof import _interval_shard

    out = _interval_shard(
        _igroup([1, 1, 1], [5, 10, 11], [0, 1, 2], [1], [5], [10], [9])
    ).to_pandas()
    assert set(out.event_id) == {0, 1}  # both bounds inclusive
    assert len(_interval_shard(_igroup([], [], [], [1], [0], [5], [9]))) == 0
    assert len(_interval_shard(_igroup([1], [3], [0], [], [], [], []))) == 0


def test_interval_pipeline_matches_oracle(ray_session):
    import duckdb
    import pandas as pd

    from geomesa_ray.pipelines.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    out = QUERIES["interval_join"](sf).to_pandas()
    exp = con.sql(ORACLE_SQL["interval_join"]).df()

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a, b = norm(out), norm(exp)
    assert len(a) > 0
    assert dict(a.dtypes) == dict(b.dtypes)
    pd.testing.assert_frame_equal(a, b)
