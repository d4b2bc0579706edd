"""duplicated_spans (stages/spans.py): planted exact-duplicate fixtures
vs an in-test DuckDB ground truth, plus edge cases (empty docs, clean
corpus, adjacency merge, within-doc repeats, hash-collision immunity via
the exact string confirm)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from geomesa_ray.stages.spans import duplicated_spans

K = 8


def _fixture() -> pa.Table:
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    docs = [
        " ".join(rng.choice(vocab, int(rng.integers(0, 60))))
        for _ in range(40)
    ]
    span = " ".join(rng.choice(vocab, 12))
    docs[3] = docs[3] + " " + span + " " + docs[3]  # self-repeat + share
    docs[17] = span + " xx " + docs[17]             # cross-doc share
    rep = " ".join(rng.choice(vocab, 9))
    docs[5] = rep + " yy zz " + rep                 # within-doc repeat
    docs[8] = ""                                    # empty doc
    docs[9] = "one two three"                       # shorter than k
    return pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    })


_CTES = f"""
docs AS (
  SELECT doc_id, regexp_extract_all(text, '\\w+') AS toks FROM documents
),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(toks[i:i+{K - 1}], ' ') AS gram
  FROM docs, UNNEST(range(1, len(toks) - {K} + 2)) AS g(i)
),
dupg AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) >= 2),
marked AS (SELECT doc_id, pos FROM wins
           WHERE gram IN (SELECT gram FROM dupg)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                        + {K} THEN 1 ELSE 0 END AS brk
  FROM marked
),
isl2 AS (
  SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        ROWS UNBOUNDED PRECEDING) AS isl_id FROM isl
),
spans AS (
  SELECT doc_id, isl_id, MIN(pos) AS s, MAX(pos) + {K} AS e,
         COUNT(*) AS nw
  FROM isl2 GROUP BY doc_id, isl_id
)
"""


@pytest.fixture(scope="module")
def fixture_con():
    tbl = _fixture()
    con = duckdb.connect()
    con.register("documents", tbl)
    return tbl, con


def test_stats_match_oracle(ray_session, fixture_con):
    tbl, con = fixture_con
    out = (
        duplicated_spans(ray.data.from_arrow(tbl).repartition(5), k=K)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ora = con.sql(f"""
        WITH {_CTES.strip()}
        SELECT d.doc_id,
          CAST(GREATEST(len(d.toks) - {K} + 1, 0) AS BIGINT)
            AS total_windows,
          CAST(COALESCE(p.dup_windows, 0) AS BIGINT) AS dup_windows,
          CAST(COALESCE(p.span_count, 0) AS BIGINT) AS span_count,
          CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
        FROM docs d LEFT JOIN (
          SELECT doc_id, SUM(nw) AS dup_windows, COUNT(*) AS span_count,
                 SUM(e - s) AS dup_tokens FROM spans GROUP BY doc_id
        ) p USING (doc_id) ORDER BY doc_id
    """).df()
    assert out.shape == ora.shape
    for c in out.columns:
        assert out[c].dtype == ora[c].dtype
        assert (out[c] == ora[c]).all(), c
    # the planted duplicates are detected
    hit = out.set_index("doc_id")
    assert hit.loc[5, "span_count"] == 2  # within-doc repeat, 2 islands
    assert hit.loc[17, "dup_windows"] > 0
    assert hit.loc[8, "total_windows"] == 0  # empty doc reports zeros
    assert hit.loc[9, "total_windows"] == 0  # shorter than k


def test_spans_match_oracle(ray_session, fixture_con):
    tbl, con = fixture_con
    out = (
        duplicated_spans(
            ray.data.from_arrow(tbl).repartition(5), k=K, output="spans"
        )
        .to_pandas().sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    ora = con.sql(f"""
        WITH {_CTES.strip()}
        SELECT doc_id, CAST(s AS BIGINT) AS span_start,
               CAST(e AS BIGINT) AS span_end
        FROM spans ORDER BY doc_id, span_start
    """).df()
    assert out.equals(ora)
    # spans are disjoint, non-adjacent (adjacency merged) and k-aligned
    for _, g in out.groupby("doc_id"):
        s = g["span_start"].to_numpy()
        e = g["span_end"].to_numpy()
        assert (e - s >= K).all()
        assert (s[1:] > e[:-1] + 0).all()  # strictly past prev end


def test_clean_mode_matches_oracle(ray_session, fixture_con):
    tbl, con = fixture_con
    out = (
        duplicated_spans(
            ray.data.from_arrow(tbl).repartition(5), k=K, output="clean"
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ora = con.sql(f"""
        WITH {_CTES.strip()},
        tok_rows AS (
          SELECT doc_id, j - 1 AS tp, toks[j] AS tok
          FROM docs, UNNEST(range(1, len(toks) + 1)) AS t(j)
        ),
        kept AS (
          SELECT r.* FROM tok_rows r WHERE NOT EXISTS (
            SELECT 1 FROM spans s WHERE s.doc_id = r.doc_id
              AND r.tp >= s.s AND r.tp < s.e)
        )
        SELECT d.doc_id, COALESCE(a.text_clean, '') AS text_clean,
          CAST(len(d.toks) AS BIGINT) AS n_tokens,
          CAST(len(d.toks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
        FROM docs d LEFT JOIN (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS text_clean,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id) a USING (doc_id)
        ORDER BY doc_id
    """).df()
    assert out.equals(ora)
    hit = out.set_index("doc_id")
    assert hit.loc[3, "n_removed"] == hit.loc[3, "n_tokens"]  # fully dup
    assert hit.loc[8, "text_clean"] == ""                      # empty doc
    assert hit.loc[9, "n_removed"] == 0                        # short doc


def test_clean_corpus_all_zero(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            " ".join(f"a{i}" for i in range(20)),
            " ".join(f"b{i}" for i in range(20)),
            " ".join(f"c{i}" for i in range(20)),
        ]),
    })
    out = duplicated_spans(ray.data.from_arrow(tbl), k=K).to_pandas()
    assert (out["dup_windows"] == 0).all()
    assert (out["total_windows"] == 13).all()
    spans = duplicated_spans(
        ray.data.from_arrow(tbl), k=K, output="spans"
    ).to_pandas()
    assert len(spans) == 0


def test_top_duplicated_grams(ray_session, fixture_con):
    from geomesa_ray.stages.spans import top_duplicated_grams

    tbl, con = fixture_con
    out = (
        top_duplicated_grams(
            ray.data.from_arrow(tbl).repartition(5), k=K, top=10
        )
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    ora = con.sql(f"""
        WITH {_CTES.strip()},
        g AS (
          SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_occ,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM wins GROUP BY gram HAVING COUNT(*) >= 2
        ),
        r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n_occ DESC, gram)
              AS rk FROM g)
        SELECT gram, n_occ, n_docs, CAST(rk AS BIGINT) AS rank
        FROM r WHERE rk <= 10 ORDER BY rank
    """).df()
    assert out[["gram", "n_occ", "n_docs", "rank"]].equals(
        ora[["gram", "n_occ", "n_docs", "rank"]]
    )
    assert (out["n_occ"] >= 2).all()
    assert (out["n_occ"].to_numpy()[:-1] >= out["n_occ"].to_numpy()[1:]).all()


def test_duplicate_doc_id_raises(ray_session):
    txt = " ".join(f"q{i}" for i in range(20))
    tbl = pa.table({
        "doc_id": pa.array([1, 1], pa.int64()),
        "text": pa.array([txt, txt]),
    })
    with pytest.raises(Exception, match="must be unique"):
        duplicated_spans(ray.data.from_arrow(tbl), k=K).materialize()


def test_candidate_cap_raises(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([" ".join(f"t{i}" for i in range(40))] * 2),
    })
    with pytest.raises(ValueError, match="broadcast cap"):
        duplicated_spans(
            ray.data.from_arrow(tbl), k=K, max_candidate_bytes=8
        ).materialize()
