"""Vector → raster attribute burn (stages/raster.burn_polygons).

Kernel tests compare the exact-integer half-plane containment against a
brute-force evaluation over every grid cell; the pipeline test drives the
full Ray chain (derive → partial → tree merge) at sf0.001 against the
DuckDB L1-inequality mirror (the driver-contract sweep covers it again
at the registry level)."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.stages.raster import (
    WORLD_U,
    _burn_kernel,
    _burn_merge,
    burn_polygons,
)

W = H = 256
WU, HU = 360_000_000 // W, 180_000_000 // H


def _mk(polys):
    """polys: list of (poly_id, weight, [(x_u, y_u), ...])"""
    return pa.table({
        "poly_id": pa.array([p[0] for p in polys], pa.int64()),
        "w": pa.array([p[1] for p in polys], pa.int64()),
        "vxs": pa.array([[v[0] for v in p[2]] for p in polys],
                        pa.list_(pa.int64())),
        "vys": pa.array([[v[1] for v in p[2]] for p in polys],
                        pa.list_(pa.int64())),
    })


def _burn(tbl):
    return _burn_kernel(
        tbl, envelope_u=WORLD_U, width=W, height=H,
        id_col="poly_id", weight_col="w", vx_col="vxs", vy_col="vys",
    ).to_pandas()


def _centers():
    ii, jj = np.meshgrid(np.arange(W), np.arange(H), indexing="ij")
    p2x = 2 * np.int64(-180_000_000) + (2 * ii + 1) * WU
    p2y = 2 * np.int64(-90_000_000) + (2 * jj + 1) * HU
    return ii, jj, p2x, p2y


DIAMOND = [(7, 3, [(5_000_000, 0), (0, 5_000_000),
                   (-5_000_000, 0), (0, -5_000_000)])]


def test_diamond_matches_bruteforce():
    df = _burn(_mk(DIAMOND))
    ii, jj, p2x, p2y = _centers()
    inside = (np.abs(p2x) + np.abs(p2y)) <= 2 * 5_000_000
    exp = set(zip(ii[inside].tolist(), jj[inside].tolist()))
    assert set(zip(df.cell_x, df.cell_y)) == exp
    assert (df.n_polys == 1).all()
    assert (df.w_sum == 3).all()
    assert (df.min_poly == 7).all()


def test_overlap_and_clockwise_winding():
    # CW small diamond nested in the CCW big one: winding-agnostic, and
    # the overlap cells attribute both polygons with min-id tie-break
    small = (3, 2, [(2_000_000, 0), (0, -2_000_000),
                    (-2_000_000, 0), (0, 2_000_000)])
    df = _burn(_mk(DIAMOND + [small]))
    _, _, p2x, p2y = _centers()
    n_small = int(((np.abs(p2x) + np.abs(p2y)) <= 2 * 2_000_000).sum())
    both = df[df.n_polys == 2]
    assert len(both) == n_small
    assert (both.w_sum == 5).all()
    assert (both.min_poly == 3).all()


def test_pentagon_matches_bruteforce():
    # non-axis-aligned convex pentagon: the general half-plane path
    verts = [(10_000_000, 0), (14_000_000, 3_000_000),
             (12_000_000, 8_000_000), (8_000_000, 8_000_000),
             (6_000_000, 3_000_000)]
    df = _burn(_mk([(1, 1, verts)]))
    ii, jj, p2x, p2y = _centers()
    inside = np.ones_like(p2x, dtype=bool)
    for k in range(5):
        ax, ay = verts[k]
        bx, by = verts[(k + 1) % 5]
        inside &= ((2 * bx - 2 * ax) * (p2y - 2 * ay)
                   - (2 * by - 2 * ay) * (p2x - 2 * ax)) >= 0
    assert set(zip(df.cell_x, df.cell_y)) == set(
        zip(ii[inside].tolist(), jj[inside].tolist())
    )


def test_domain_clamp():
    # polygon sticking past the world bbox: cells clamp, never wrap
    df = _burn(_mk([(1, 1, [(179_000_000, -1_000_000),
                            (181_000_000, -1_000_000),
                            (181_000_000, 1_000_000),
                            (179_000_000, 1_000_000)])]))
    assert len(df) > 0
    assert (df.cell_x <= W - 1).all()


def test_non_convex_raises():
    bad = [(9, 1, [(0, 0), (4_000_000, 0), (1_000_000, 1_000_000),
                   (0, 4_000_000)])]
    with pytest.raises(ValueError, match="non-convex"):
        _burn(_mk(bad))


def test_degenerate_raises():
    with pytest.raises(ValueError, match="degenerate"):
        _burn(_mk([(1, 1, [(0, 0), (1_000_000, 1_000_000),
                           (2_000_000, 2_000_000)])]))


def test_empty_batch():
    out = _burn_kernel(
        _mk([]), envelope_u=WORLD_U, width=W, height=H,
        id_col="poly_id", weight_col="w", vx_col="vxs", vy_col="vys",
    )
    assert len(out) == 0
    assert out.schema.names == ["cell_x", "cell_y", "n_polys", "w_sum",
                                "min_poly"]
    assert len(_burn_merge(out)) == 0


def test_merge_combines_partials():
    one = _burn_kernel(
        _mk(DIAMOND), envelope_u=WORLD_U, width=W, height=H,
        id_col="poly_id", weight_col="w", vx_col="vxs", vy_col="vys",
    )
    m = _burn_merge(pa.concat_tables([one, one])).to_pandas()
    assert (m.n_polys == 2).all()
    assert (m.w_sum == 6).all()


def test_uneven_envelope_raises():
    with pytest.raises(ValueError, match="divide evenly"):
        burn_polygons(None, envelope_u=WORLD_U, width=7, height=256)


def test_pipeline_matches_oracle(ray_session):
    """Full Ray chain at sf0.001 vs the DuckDB L1 mirror, dtypes included
    (the driver-contract registry sweep re-checks this; here it pins the
    stage in isolation)."""
    import duckdb
    import pandas as pd

    from geomesa_ray.pipelines.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW supplier AS SELECT * FROM "
        f"read_parquet('{sf}/supplier.parquet')"
    )
    out = QUERIES["rasterize_polygons"](sf).to_pandas()
    exp = con.sql(ORACLE_SQL["rasterize_polygons"]).df()

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a, b = norm(out), norm(exp)
    assert len(a) > 0
    assert dict(a.dtypes) == dict(b.dtypes)
    pd.testing.assert_frame_equal(a, b)
