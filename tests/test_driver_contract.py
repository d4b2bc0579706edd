"""In-suite driver-contract check: a representative subset of
``__ray_entry__.queries()`` compared row/value-identical against their
``oracle_sql()`` via DuckDB at sf0.001 — so the north rule's verification
command (`python -m pytest -x -q`) itself demonstrates oracle parity.
(The grading driver runs the FULL set at sf0.01.)"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as _entrymod

# every registered query must stay oracle-parity (values AND dtypes — the
# driver hashes after pandas conversion, so an int64-vs-float64 mismatch is
# a hash fail even when values agree; VERDICT r4 wrong-list #1/#2)
FULL_REGISTRY = sorted(_entrymod.oracle_sql().keys())

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# cheap, architecture-diverse subset (scan, both joins, tiles, knn,
# aggregate, dedup, sampling, upsert, ANN)
SUBSET = [
    "bbox_scan",
    "pip_join",
    "pip_join_shuffle",
    "tile_agg",
    "knn",
    "pricing_summary",
    "sample_per_key",
    "exact_dedup",
    "latest_event_per_user",
    "ann_topk",
    "token_counts",
    "proximity_join",
    "semi_join",
    "langid",
    "quality_scores",
    "line_dedup",
    "repetition_stats",
    "pii_redact",
    "clean_corpus",
    # round-3 additions
    "domain_stats",
    "bigram_coverage",
    "quality_buckets",
    "user_sessions",
    "bpe_token_counts",
    "decontaminate",
    "split_assign",
    "normalize_text",
    "curate_corpus",
    "incremental_dedup",
    "tumbling_counts",
    "stratified_sample",
    # round-4 additions: the three queries that previously carried only
    # pytest-level evidence (VERDICT r3 "Next round" #1); verified at
    # sf0.01 too via the full sweep recorded in BASELINE.md.
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "top_ngram_stats",
    "reproject_osgb",
    "stream_window_counts",
    "cql_scan",
    "dwithin_scan",
    "pack_sequences",
    "mix_epochs",
    "chunk_corpus",
    "ann_filtered_topk",
    "jaccard_pairs",
    "cosine_neardup",
    "convert_expr",
    "raster_regions",
    # round-4 hex-cell (H3-analog) index wave
    "hex_encode",
    "hex_density",
    "hex_kring_counts",
    "hex_pip_count",
    "hex_indexed_scan",
    "knn_hex",
    "hex_pyramid",
    "hll_users",
    "top_domains_per_lang",
    "hex_zonal_stats",
    # round-5 vector→raster attribute burn + as-of join
    "rasterize_polygons",
    "asof_join",
    "interval_join",
    "sliding_counts",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run_pair(con, name):
    import ray.data as rd

    fn = _entrymod.queries()[name]
    sql = _entrymod.oracle_sql()[name]
    out = fn(SF)
    if isinstance(out, rd.Dataset):
        out = out.to_pandas()
    elif not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    expect = con.sql(sql).df()
    return _norm(out), _norm(expect)


def _assert_parity(a: pd.DataFrame, b: pd.DataFrame):
    assert list(a.columns) == list(b.columns)
    assert a.shape == b.shape
    # dtype parity first: the grading driver hashes the pandas values, so a
    # value-identical int64-vs-float64 column still fails its hash
    for c in a.columns:
        assert a[c].dtype == b[c].dtype, (
            f"dtype mismatch on {c}: engine {a[c].dtype} vs oracle {b[c].dtype}"
        )
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (pd.Series(av) == pd.Series(bv)).all(), f"column {c} differs"


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, con, name):
    a, b = _run_pair(con, name)
    _assert_parity(a, b)


@pytest.mark.parametrize("name", [n for n in FULL_REGISTRY if n not in SUBSET])
def test_registry_tail_matches_oracle(ray_session, con, name):
    """The queries the hand-picked SUBSET misses — full-registry sweep so a
    dtype or value defect in ANY oracle is caught in-suite before the
    driver samples it."""
    a, b = _run_pair(con, name)
    _assert_parity(a, b)


def test_entry_smoke(ray_session):
    import ray.data as rd

    import __ray_entry__ as entrymod

    res = entrymod.entry()
    df = res.to_pandas() if isinstance(res, rd.Dataset) else res
    assert len(df) >= 0
    assert "poly_id" in df.columns
