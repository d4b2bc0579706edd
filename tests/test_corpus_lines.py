"""Line-level corpus operators (stages/corpus.py) vs brute-force oracles:
corpus-wide first-occurrence line dedup, within-doc repetition signals,
and RE2 PII redaction (cross-checked against Python re AND DuckDB's RE2)."""

import re

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.stages.corpus import (
    PII_PATTERNS,
    explode_lines,
    line_dedup,
    line_stats,
    redact_pii,
)


def _docs_table():
    """Deterministic multi-line docs with planted cross-doc and
    within-doc duplicate lines."""
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts, ids = [], []
    for i in range(40):
        n = int(rng.integers(1, 8))
        lines = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 4))))
                 for _ in range(n)]
        if i % 5 == 0 and i > 0:
            lines.append("shared refrain line")  # cross-doc duplicate
        if i % 7 == 0 and lines:
            lines.append(lines[0])  # within-doc duplicate
        texts.append("\n".join(lines))
        ids.append(i)
    texts[3] = ""  # empty doc edge case
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_explode_lines_positions():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["x\ny\nx", ""], pa.string())})
    out = explode_lines(t, "text", "doc_id")
    assert out["doc_id"].to_pylist() == [1, 1, 1, 2]
    assert out["line_no"].to_pylist() == [1, 2, 3, 1]  # 1-based, per doc
    assert out["line"].to_pylist() == ["x", "y", "x", ""]


def _brute_line_dedup(table):
    first = {}
    rows = []
    for did, text in zip(table["doc_id"].to_pylist(), table["text"].to_pylist()):
        for no, line in enumerate(text.split("\n"), start=1):
            rows.append((did, no, line))
            if line not in first:
                first[line] = (did, no)
    out = {}
    for did, no, line in rows:
        if first[line] == (did, no):
            out.setdefault(did, []).append((no, line))
    return {d: "\n".join(l for _, l in sorted(v)) for d, v in out.items()}


def test_line_dedup_matches_brute(ray_session):
    import ray.data

    docs = _docs_table()
    ds = ray.data.from_arrow(docs).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=7
    )
    got = {r["doc_id"]: r["text"]
           for r in line_dedup(ds, n_shards=8).take_all()}
    assert got == _brute_line_dedup(docs)


def test_line_dedup_word_sep(ray_session):
    """sep=' ' (the driver query's derivation): only the corpus-wide first
    occurrence of each distinct word survives."""
    import ray.data

    docs = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                     "text": pa.array(["a b a c", "b d"], pa.string())})
    got = {r["doc_id"]: r["text"]
           for r in line_dedup(ray.data.from_arrow(docs), sep=" ",
                               n_shards=4).take_all()}
    assert got == {10: "a b c", 11: "d"}


def test_line_stats_brute(ray_session):
    import ray.data

    docs = _docs_table()
    out = {r["doc_id"]: r for r in line_stats(
        ray.data.from_arrow(docs), sep="\n").take_all()}
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        lines = text.split("\n")
        seen, dup_n, dup_c = set(), 0, 0
        for l in lines:
            if l in seen:
                dup_n += 1
                dup_c += len(l)
            seen.add(l)
        r = out[did]
        assert r["n_lines"] == len(lines)
        assert r["n_dup_lines"] == dup_n
        assert r["dup_line_frac"] == pytest.approx(dup_n / len(lines))
        total_c = sum(len(l) for l in lines)
        assert r["dup_char_frac"] == pytest.approx(
            dup_c / total_c if total_c else 0.0)


def test_null_text_rows(ray_session):
    """NULL text yields zero lines (mirroring SQL unnest of a NULL split)
    instead of crashing the explode (round-3 review finding)."""
    import ray.data

    from geomesa_ray.stages.corpus import line_stats, top_ngram_stats

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b a", None, "c"], pa.string())})
    out = explode_lines(t, "text", "doc_id", " ")
    assert out["doc_id"].to_pylist() == [1, 1, 1, 3]
    stats = {r["doc_id"]: r for r in line_stats(
        ray.data.from_arrow(t), sep=" ").take_all()}
    assert 2 not in stats and stats[1]["n_dup_lines"] == 1
    ng = {r["doc_id"]: r for r in top_ngram_stats(
        ray.data.from_arrow(t), n=2).take_all()}
    assert ng[2]["top_gram"] == "" and ng[2]["gram_count"] == 0
    assert ng[2]["top_gram_char_frac"] == 0.0


def test_top_ngram_stats_brute(ray_session):
    import collections

    import ray.data

    from geomesa_ray.stages.corpus import top_ngram_stats

    texts = [
        "a b a b a b c",          # "a b" x3 beats "b a" x2
        "x y x y",                # tie "x y"(2) vs "y x"(1)
        "p q r",                  # all grams count 1 → lexicographic min
        "solo",                   # < 2 words
        "",                       # empty text
        "z z z z",                # self-repeat "z z" x3
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = {r["doc_id"]: r for r in top_ngram_stats(
        ray.data.from_arrow(t), n=2).take_all()}
    for i, s in enumerate(texts):
        w = s.split(" ")
        if len(w) < 2:
            exp_g, exp_c, exp_f = "", 0, 0.0
        else:
            grams = [w[j] + " " + w[j + 1] for j in range(len(w) - 1)]
            cnt = collections.Counter(grams)
            exp_g = min(cnt, key=lambda g: (-cnt[g], g))
            exp_c = cnt[exp_g]
            exp_f = exp_c * len(exp_g) / len(s)
        r = out[i]
        assert (r["top_gram"], r["gram_count"]) == (exp_g, exp_c), (i, s, r)
        assert r["top_gram_char_frac"] == pytest.approx(exp_f)


PII_SAMPLES = [
    "mail john.doe+x@sub.example.co.uk now",
    "server 10.0.0.1 and 192.168.255.255 up",
    "call +1 555 0100 200 or 555-867-5309",
    "mixed a@b.io 8.8.8.8 +44 20 7946 0958 end",
    "none here", "", "u@192.168.1.1 weird", "1.2.3.4.5 five parts",
]


def test_redact_pii_vs_python_re(ray_session):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(len(PII_SAMPLES)), pa.int64()),
                  "text": pa.array(PII_SAMPLES, pa.string())})
    got = {r["doc_id"]: r
           for r in redact_pii(ray.data.from_arrow(t)).take_all()}
    for i, s in enumerate(PII_SAMPLES):
        cur = s
        for name, pattern, token in PII_PATTERNS:
            assert got[i][f"n_{name}"] == len(re.findall(pattern, cur))
            cur = re.sub(pattern, token, cur)
        assert got[i]["text"] == cur


def test_redact_pii_vs_duckdb():
    """RE2 dialect parity: Arrow kernels and DuckDB regexp_* must agree on
    every sample (the oracle's premise)."""
    import duckdb
    import pyarrow.compute as pc

    con = duckdb.connect()
    for s in PII_SAMPLES:
        cur = s
        for name, pattern, token in PII_PATTERNS:
            n_a = pc.count_substring_regex(pa.array([cur]), pattern)[0].as_py()
            n_d = con.sql("SELECT len(regexp_extract_all(?, ?))",
                          params=[cur, pattern]).fetchone()[0]
            assert n_a == n_d, (s, name)
            rep_a = pc.replace_substring_regex(
                pa.array([cur]), pattern, token)[0].as_py()
            rep_d = con.sql("SELECT regexp_replace(?, ?, ?, 'g')",
                            params=[cur, pattern, token]).fetchone()[0]
            assert rep_a == rep_d, (s, name)
            cur = rep_a
