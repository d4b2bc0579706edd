"""Dedup / text-analysis / similarity / multimodal operators vs naive oracles,
driven over the driver-generated documents + embeddings tables."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents():
    return pq.read_table(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings():
    return pq.read_table(f"{SF}/embeddings.parquet")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def test_exact_dedup(ray_session, documents):
    import ray.data
    from geomesa_ray.stages.dedup import exact_dedup

    # inject duplicates deterministically: copy rows with new ids
    dup = documents.slice(0, 20).set_column(
        documents.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array(
            (documents["doc_id"].to_numpy() .max() + 1 + np.arange(20)), pa.int64()
        ),
    )
    full = pa.concat_tables([documents, dup])
    ds = ray.data.from_arrow(full).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=37
    )
    out = exact_dedup(ds).to_pandas()
    texts = full["text"].to_pylist()
    ids = full["doc_id"].to_numpy()
    expect = {}
    for t, i in zip(texts, ids.tolist()):
        expect[t] = min(expect.get(t, i), i)
    assert sorted(out["doc_id"]) == sorted(expect.values())
    assert set(out.columns) == set(documents.schema.names)


# ---------------------------------------------------------------------------
# minhash / simhash
# ---------------------------------------------------------------------------


def _near_dup_corpus(documents) -> pa.Table:
    """Corpus with planted near-duplicates (small edits of originals)."""
    texts = documents["text"].to_pylist()[:60]
    ids = list(range(len(texts)))
    planted = []
    for j in range(10):
        t = texts[j]
        planted.append(t[: len(t) // 2] + " xyz " + t[len(t) // 2 :])
    all_texts = texts + planted
    all_ids = ids + [1000 + j for j in range(10)]
    return pa.table(
        {"doc_id": pa.array(all_ids, pa.int64()), "text": pa.array(all_texts)}
    )


def test_minhash_lsh_pairs(ray_session, documents):
    import ray.data
    from geomesa_ray.stages.dedup import (
        dedup_keep_ids,
        minhash_lsh_pairs,
        ngram_jaccard,
    )

    corpus = _near_dup_corpus(documents)
    ds = ray.data.from_arrow(corpus).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=17
    )
    stats = {}
    pairs = pa.Table.from_pandas(
        minhash_lsh_pairs(ds, threshold=0.5, stats=stats).to_pandas(),
        preserve_index=False,
    )
    assert stats["mega_buckets"] == 0
    got = set(zip(pairs["left_id"].to_pylist(), pairs["right_id"].to_pylist()))
    # every planted pair must be found (their true jaccard is high)
    texts = dict(zip(corpus["doc_id"].to_pylist(), corpus["text"].to_pylist()))
    for j in range(10):
        assert (j, 1000 + j) in got, f"missing planted pair {j}"
    # no false positives among found pairs: exact jaccard must be substantial
    for l, r in got:
        assert ngram_jaccard(texts[l], texts[r]) > 0.3, (l, r)
    keep = dedup_keep_ids(pairs, corpus["doc_id"].to_numpy())
    for j in range(10):
        assert 1000 + j not in keep  # planted copy dropped
        assert j in keep  # original (min id) kept


def test_minhash_broadcast_arm_matches_and_spares_driver(ray_session, documents):
    """Forced signature-broadcast arm: identical pair set to the
    carry-signature arm, and the (ids, matrix) pair is assembled in a
    remote task — the driver's Python heap never holds the matrix."""
    import tracemalloc

    import ray.data
    from geomesa_ray.stages.dedup import minhash_lsh_pairs

    corpus = _near_dup_corpus(documents)

    def pairset(pairs):
        df = pairs.to_pandas()
        return set(zip(df["left_id"].tolist(), df["right_id"].tolist()))

    ds = ray.data.from_arrow(corpus)
    carry = pairset(minhash_lsh_pairs(ds, threshold=0.5))

    # pad the corpus with unique filler docs so the signature matrix is
    # big enough (~12 MB) that a driver-side build would dominate the
    # tracemalloc peak, without changing the planted pair set
    n_pad = 6_000
    rng = np.random.default_rng(7)
    pad_texts = [
        " ".join(f"w{v:05d}" for v in rng.integers(0, 99_999, size=20))
        for _ in range(n_pad)
    ]
    padded = pa.table(
        {
            "doc_id": pa.array(
                corpus["doc_id"].to_pylist()
                + [10_000 + i for i in range(n_pad)],
                pa.int64(),
            ),
            "text": pa.array(corpus["text"].to_pylist() + pad_texts),
        }
    )
    num_perm = 128
    sig_bytes = len(padded) * num_perm * 8
    tracemalloc.start()
    bcast = pairset(
        minhash_lsh_pairs(
            ray.data.from_arrow(padded),
            threshold=0.5,
            num_perm=num_perm,
            broadcast_min_bytes=0,  # force the broadcast arm
        )
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert carry <= bcast
    # driver-side Python allocations must not include the signature matrix
    # (it is assembled in a remote task); generous slack for Ray
    # bookkeeping churn — the old driver-side build peaked >= 2x sig_bytes.
    assert peak < sig_bytes // 2, (peak, sig_bytes)


def test_simhash_pairs(ray_session, documents):
    import ray.data
    from geomesa_ray.stages.dedup import simhash_pairs

    corpus = _near_dup_corpus(documents)
    ds = ray.data.from_arrow(corpus)
    pairs = simhash_pairs(ds, max_hamming=6).to_pandas()
    got = set(zip(pairs["left_id"].tolist(), pairs["right_id"].tolist()))
    found = sum((j, 1000 + j) in got for j in range(10))
    assert found >= 7  # simhash is approximate; most planted pairs found


def test_distributed_clustering_matches_union_find(ray_session, documents):
    """cluster_pairs_dataset / dedup_keep (distributed min-label
    propagation + anti-join) agree with the driver-side union-find."""
    import ray.data
    from geomesa_ray.stages.dedup import (
        cluster_pairs,
        cluster_pairs_dataset,
        dedup_keep,
        dedup_keep_ids,
        minhash_lsh_pairs,
    )

    corpus = _near_dup_corpus(documents)
    ds = ray.data.from_arrow(corpus)
    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    ptbl = pa.Table.from_pandas(pairs.to_pandas(), preserve_index=False)
    # force the DISTRIBUTED label-propagation arm (small graphs default to
    # the single-task union-find arm)
    labels = cluster_pairs_dataset(pairs, small_graph_rows=0)
    got = dict(
        zip(
            labels.to_pandas()["node"].tolist(),
            labels.to_pandas()["label"].tolist(),
        )
    )
    expect = cluster_pairs(ptbl)
    assert got == expect
    kept = sorted(dedup_keep(ds, labels).to_pandas()["doc_id"])
    assert kept == dedup_keep_ids(ptbl, corpus["doc_id"].to_numpy()).tolist()


def test_chain_clustering_multi_round(ray_session):
    """A long chain forces several label-propagation rounds (depth > 1)."""
    import ray.data
    from geomesa_ray.stages.dedup import cluster_pairs_dataset

    # chain 9-8-7-...-0 plus a separate triangle 20-21-22
    li = list(range(1, 10)) + [20, 21, 20]
    ri = list(range(0, 9)) + [21, 22, 22]
    pairs = pa.table(
        {
            "left_id": pa.array(li, pa.int64()),
            "right_id": pa.array(ri, pa.int64()),
        }
    )
    # both arms must agree on a multi-round chain
    for kwargs in ({"small_graph_rows": 0}, {}):
        labels = cluster_pairs_dataset(
            ray.data.from_arrow(pairs), **kwargs
        ).to_pandas()
        lab = dict(zip(labels["node"], labels["label"]))
        assert all(lab[i] == 0 for i in range(10))
        assert all(lab[i] == 20 for i in (20, 21, 22))


def test_mega_bucket_not_silently_dropped(ray_session):
    """Degenerate corpus (every doc identical → one LSH bucket in every
    band, larger than max_bucket_rows): pairs must still connect every doc
    to the min-id anchor and the mega-bucket count must be surfaced."""
    import ray.data
    from geomesa_ray.stages.dedup import (
        cluster_pairs_dataset,
        dedup_keep,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    n = 120
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["all documents share this exact text body " * 4] * n),
        }
    )
    ds = ray.data.from_arrow(tbl)
    stats = {}
    pairs = minhash_lsh_pairs(
        ds, threshold=0.5, max_bucket_rows=50, stats=stats
    )
    assert stats["mega_buckets"] >= 1
    assert stats["mega_bucket_rows"] >= n
    labels = cluster_pairs_dataset(pairs)
    kept = sorted(dedup_keep(ds, labels).to_pandas()["doc_id"])
    assert kept == [0]  # connectivity preserved: one representative survives
    sstats = {}
    spairs = simhash_pairs(ds, max_hamming=3, max_bucket_rows=50, stats=sstats)
    assert sstats["mega_buckets"] >= 1
    sdf = spairs.to_pandas()
    # anchor-star pairs connect everything to doc 0
    assert set(sdf[sdf["left_id"] == 0]["right_id"]) == set(range(1, n))


# ---------------------------------------------------------------------------
# IVF ANN recall
# ---------------------------------------------------------------------------


def test_ivf_partial_probe_recall(ray_session, embeddings):
    """Approximate-probe IVF must recover most of the exact top-k and
    converge to exact at exhaustive probe (the driver correctness entry
    pins n_probe = n_cells; this covers the approximate regime)."""
    import ray.data
    from geomesa_ray.stages.similarity import (
        ann_brute,
        ann_ivf,
        assign_cells,
        train_centroids,
    )

    ds = ray.data.from_arrow(embeddings)
    q = np.asarray(embeddings["embedding"][0].as_py(), dtype=np.float64)[None, :]
    exact = set(
        ann_brute(ds, q, 10).to_pandas()["vec_id"]
    )
    cent = train_centroids(ds, n_cells=8, sample_rows=2000)
    cells = assign_cells(ds, cent).materialize()
    rec4 = len(set(ann_ivf(cells, q, 10, cent, n_probe=4).to_pandas()["vec_id"]) & exact) / 10
    rec8 = len(set(ann_ivf(cells, q, 10, cent, n_probe=8).to_pandas()["vec_id"]) & exact) / 10
    assert rec4 >= 0.3  # partial probe finds a meaningful fraction
    assert rec8 == 1.0  # exhaustive probe is exact by construction
    assert rec8 >= rec4


# ---------------------------------------------------------------------------
# text stats
# ---------------------------------------------------------------------------


def test_token_count_matches_duckdb(documents):
    import duckdb

    from geomesa_ray.stages.textstats import token_count

    got = token_count(documents["text"]).to_pylist()
    expect = (
        duckdb.sql(
            f"SELECT len(regexp_extract_all(text, '\\w+')) n FROM read_parquet('{SF}/documents.parquet')"
        )
        .df()["n"]
        .tolist()
    )
    assert got == expect


def test_quality_and_langid(ray_session, documents):
    import ray.data
    from geomesa_ray.stages.textstats import LanguageID, QualityScorer

    ds = ray.data.from_arrow(documents)
    out = (
        ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)
        .map_batches(LanguageID, batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    assert ((out["quality_score"] >= 0) & (out["quality_score"] <= 1)).all()
    assert (out["n_chars_q"] == out["text"].str.len()).all()


def test_langid_on_real_language_samples(ray_session):
    """The driver's documents.lang labels are arbitrary (all texts are the
    same English-ish word soup), so language-ID is validated on texts that
    actually carry each language's function words / scripts."""
    import ray.data
    from geomesa_ray.stages.textstats import LanguageID

    samples = [
        ("en", "the cat sat on the mat and it was happy that the sun is out"),
        ("de", "der hund ist nicht mit der katze und das ist ein problem für den mann"),
        ("fr", "le chat est dans la maison et les enfants sont pour une fois dans le jardin"),
        ("es", "el perro es de la casa y los niños están en el jardín para el verano"),
        ("pt", "o gato não é um problema para a casa e as crianças são do jardim"),
        ("zh", "这是一个关于猫和狗的故事它们住在一个小房子里每天一起玩耍"),
        ("ru", "Это история о кошке и собаке которые живут в маленьком доме"),
        ("und", "zzz qqq 12345 @@@@"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(samples)), pa.int64()),
            "text": pa.array([s[1] for s in samples]),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(LanguageID, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["lang_pred"].tolist() == [s[0] for s in samples]


def test_fingerprint_copy_detection(ray_session, documents):
    import ray.data
    from geomesa_ray.stages.textstats import Fingerprinter

    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    documents["text"][0].as_py(),
                    documents["text"][0].as_py(),  # exact copy
                    documents["text"][1].as_py(),
                ]
            ),
        }
    )
    out = ray.data.from_arrow(corpus).map_batches(
        Fingerprinter, batch_format="pyarrow", concurrency=1
    ).to_pandas().sort_values("doc_id")
    fps = out["fingerprint"].tolist()
    assert fps[0] == fps[1] != fps[2]


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def oracle_topk(embeddings, qvec, k):
    m = np.stack(embeddings["embedding"].to_pylist()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = np.asarray(qvec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    sims = m @ q
    ids = embeddings["vec_id"].to_numpy()
    order = np.lexsort((ids, -sims))[:k]
    return [int(ids[i]) for i in order]


def test_ann_brute_vs_oracle(ray_session, embeddings):
    import ray.data
    from geomesa_ray.stages.similarity import ann_brute

    q = np.stack(
        [embeddings["embedding"][0].as_py(), embeddings["embedding"][7].as_py()]
    )
    ds = ray.data.from_arrow(embeddings).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=41
    )
    res = ann_brute(ds, q, 10).to_pandas()
    for qi in range(2):
        mine = res[res["query_idx"] == qi].sort_values("rank")["vec_id"].tolist()
        assert mine == oracle_topk(embeddings, q[qi], 10)


def test_ann_ivf_recall(ray_session, embeddings):
    import ray.data
    from geomesa_ray.stages.similarity import ann_brute, ann_ivf, assign_cells, train_centroids

    ds = ray.data.from_arrow(embeddings)
    cent = train_centroids(ds, n_cells=16, sample_rows=500)
    cells = assign_cells(ds, cent)
    q = np.stack([embeddings["embedding"][3].as_py()])
    approx = ann_ivf(cells, q, 10, cent, n_probe=8).to_pandas()
    exact = oracle_topk(embeddings, q[0], 10)
    recall = len(set(approx["vec_id"]) & set(exact)) / 10
    assert recall >= 0.5, recall  # probing half the cells: decent recall


def test_lsh_cosine_pairs(ray_session, embeddings):
    import ray.data
    from geomesa_ray.stages.similarity import lsh_cosine_pairs

    # plant an exact duplicate embedding with a new id
    dup = embeddings.slice(0, 5).set_column(
        embeddings.schema.get_field_index("vec_id"),
        "vec_id",
        pa.array(embeddings["vec_id"].to_numpy().max() + 1 + np.arange(5), pa.int64()),
    )
    full = pa.concat_tables([embeddings, dup])
    stats = {}
    pairs = lsh_cosine_pairs(
        ray.data.from_arrow(full), threshold=0.99, stats=stats
    ).to_pandas()
    assert stats["mega_buckets"] == 0
    got = set(zip(pairs["left_id"].tolist(), pairs["right_id"].tolist()))
    base = embeddings["vec_id"].to_numpy().max() + 1
    for j in range(5):
        assert (j, base + j) in got


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_multimodal_pipeline(ray_session):
    import ray.data
    from geomesa_ray.stages.multimodal import (
        DecodeImage,
        SampleFrames,
        decode_pipeline,
        synth_media,
    )

    media = synth_media(20, seed=9)
    ds = ray.data.from_arrow(media)
    feats = decode_pipeline(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(feats) == 20
    assert all(len(f) == 14 for f in feats["features"])
    # deterministic: same payload → same features
    feats2 = decode_pipeline(ray.data.from_arrow(media), concurrency=2, batch_size=8).to_pandas()
    a = np.stack(feats.sort_values("media_id")["features"].to_numpy())
    b = np.stack(feats2.sort_values("media_id")["features"].to_numpy())
    assert np.array_equal(a, b)
    # real mode on undecodable (non-PNG) bytes raises cleanly
    with pytest.raises(ValueError):
        DecodeImage(mode="real")(media.select(["payload"]))
    # frame sampling: one row per (media, frame)
    frames = ray.data.from_arrow(media).map_batches(
        SampleFrames, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert len(frames) == 20 * 4
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}
    # audio stage: deterministic 10-dim features, real mode raises
    from geomesa_ray.stages.multimodal import DecodeAudio

    au = ray.data.from_arrow(media).map_batches(
        DecodeAudio, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    au2 = ray.data.from_arrow(media).map_batches(
        DecodeAudio, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    a1 = np.stack(au.sort_values("media_id")["audio_features"].to_numpy())
    a2 = np.stack(au2.sort_values("media_id")["audio_features"].to_numpy())
    assert a1.shape == (20, 10) and np.array_equal(a1, a2)
    with pytest.raises(Exception):  # non-WAV bytes fail in the codec
        DecodeAudio(mode="real")(media.select(["payload"]))


def test_pair_sets_invariant_under_shard_count(ray_session, documents):
    """n_shards only routes reduce work — the pair set must be identical
    at 4 and 256 shards (and default_shards must scale with CPUs)."""
    import ray.data
    from geomesa_ray.stages.dedup import minhash_lsh_pairs, simhash_pairs
    from geomesa_ray.stages.shards import default_shards

    corpus = _near_dup_corpus(documents)
    ds = ray.data.from_arrow(corpus)

    def pairset(result):
        t = pa.Table.from_pandas(result.to_pandas(), preserve_index=False)
        return set(zip(t["left_id"].to_pylist(), t["right_id"].to_pylist()))

    mh = [pairset(minhash_lsh_pairs(ds, threshold=0.5, n_shards=n))
          for n in (4, 256)]
    assert mh[0] == mh[1] and len(mh[0]) > 0
    sh = [pairset(simhash_pairs(ds, n_shards=n)) for n in (4, 256)]
    assert sh[0] == sh[1]
    assert default_shards(mult=4, floor=1, cap=10_000) >= 4
    assert default_shards() <= 4096


def test_ivf_partitioned_layout_prunes_files(ray_session, embeddings, tmp_path):
    """The IVF layout prunes at the FILE level: a partial probe reads
    strictly fewer files than the layout holds, and the exhaustive probe
    over the layout equals exact brute-force search."""
    import ray.data
    from geomesa_ray.stages.similarity import (
        ann_brute,
        ann_ivf_indexed,
        ingest_ivf,
    )

    out = str(tmp_path / "ivf")
    ds = ray.data.from_arrow(embeddings)
    ingest_ivf(ds, out, n_cells=8, sample_rows=2000)
    q = np.asarray(embeddings["embedding"][0].as_py(), dtype=np.float64)[None, :]

    stats = {}
    part = ann_ivf_indexed(out, q, 10, n_probe=2, stats=stats)
    assert 0 < stats["files_read"] < stats["files_total"]
    assert len(part.to_pandas()) == 10

    stats_full = {}
    full = ann_ivf_indexed(out, q, 10, n_probe=8, stats=stats_full)
    assert stats_full["files_read"] == stats_full["files_total"]
    exact = ann_brute(ds, q, 10).to_pandas()
    got = full.to_pandas()
    assert list(got["vec_id"]) == list(exact["vec_id"])
    assert np.allclose(got["cosine"], exact["cosine"])


def test_hashers_tolerate_null_text(ray_session):
    """MinHash/SimHash stages must hash null text like the empty string
    instead of crashing (round-3 review finding)."""
    import pyarrow as pa

    from geomesa_ray.stages.dedup import MinHasher, SimHasher, simhash_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["hello world text here", None, ""], pa.string())})
    out = MinHasher()(t)
    assert len(out) == 3
    sh = simhash_batch(pa.array(["hello world", None, "foo bar"]))
    assert len(sh) == 3 and sh[1] == simhash_batch(pa.array([""]))[0]
    out2 = SimHasher()(t)
    assert len(out2) == 3


# ---------------------------------------------------------------------------
# domain_stats / bigram_coverage / cdf_buckets (round-3 corpus additions)
# ---------------------------------------------------------------------------


def _domain_oracle(tbl):
    import re

    import pandas as pd

    df = tbl.to_pandas()
    df["tok"] = df["text"].fillna("").map(lambda t: len(re.findall(r"\w+", t)))
    g = df.groupby("source")
    return (
        pd.DataFrame(
            {
                "n_docs": g.size(),
                "total_chars": g["n_chars"].sum(),
                "total_tokens": g["tok"].sum(),
                "n_langs": g["lang"].nunique(),
            }
        )
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )


def test_domain_stats_matches_pandas_oracle(ray_session, documents):
    import ray.data

    from geomesa_ray.stages.corpus import domain_stats

    ds = ray.data.from_arrow(documents).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=37
    )
    got = (
        domain_stats(ds).to_pandas().sort_values("source").reset_index(drop=True)
    )
    exp = _domain_oracle(documents)
    assert got[exp.columns].astype("object").equals(exp.astype("object"))


def test_domain_stats_fallback_path(ray_session, documents):
    """fanin_rows=1 can never converge the tree → the exact shuffle
    aggregate fallback must produce the identical rollup."""
    import ray.data

    from geomesa_ray.stages.corpus import domain_stats

    ds = ray.data.from_arrow(documents.slice(0, 60)).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=7
    )
    got = (
        domain_stats(ds, fanin_rows=1)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    exp = _domain_oracle(documents.slice(0, 60))
    assert got[exp.columns].astype("object").equals(exp.astype("object"))


def _bigram_oracle(ids, texts, min_count):
    from collections import Counter

    def pairs(t):
        if t is None:
            return []
        w = t.split(" ")
        return [
            f"{w[i]} {w[i+1]}"
            for i in range(len(w) - 1)
            if w[i] != "" and w[i + 1] != ""
        ]

    counts = Counter(p for t in texts for p in pairs(t))
    model = {p for p, c in counts.items() if c >= min_count}
    out = {}
    for i, t in zip(ids, texts):
        ps = pairs(t)
        out[i] = (len(ps), sum(1 for p in ps if p in model))
    return out


def test_bigram_coverage_edges(ray_session):
    """Double spaces break adjacency; nulls/empties score 0; the model
    threshold is exact."""
    import ray.data

    from geomesa_ray.stages.corpus import bigram_coverage

    ids = list(range(8))
    texts = [
        "a b c", "a b", "a  b", "", None, "x", "a b c a b", "b c b c",
    ]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).map_batches(lambda b: b, batch_format="pyarrow", batch_size=3)
    for mc in (1, 2, 3, 100):
        got = (
            bigram_coverage(ds, min_count=mc)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = _bigram_oracle(ids, texts, mc)
        for _, r in got.iterrows():
            assert (r["n_bigrams"], r["n_known_bigrams"]) == exp[r["doc_id"]], (mc, r["doc_id"])


def test_bigram_coverage_broadcast_cap_raises(ray_session, documents):
    import ray.data

    from geomesa_ray.stages.corpus import bigram_coverage

    ds = ray.data.from_arrow(documents.select(["doc_id", "text"]))
    with pytest.raises(ValueError, match="min_count"):
        bigram_coverage(ds, min_count=1, broadcast_limit_bytes=8)


def test_cdf_buckets_ties_and_invariance(ray_session):
    import ray.data

    from geomesa_ray.stages.corpus import cdf_buckets

    vals = [5] * 10 + [1] * 5 + [9] * 5
    t = pa.table(
        {"doc_id": pa.array(range(20), pa.int64()), "n_chars": pa.array(vals, pa.int64())}
    )
    for bs in (3, 20):
        ds = ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=bs
        )
        got = cdf_buckets(ds, n_buckets=4).to_pandas().set_index("doc_id")["bucket"]
        # strictly-smaller counts: 1→0, 5→5, 9→15 of 20 → buckets 0, 1, 3
        assert set(got[[i for i in range(20) if vals[i] == 1]]) == {0}
        assert set(got[[i for i in range(20) if vals[i] == 5]]) == {1}
        assert set(got[[i for i in range(20) if vals[i] == 9]]) == {3}


def test_cdf_buckets_max_distinct_guard(ray_session, documents):
    import ray.data

    from geomesa_ray.stages.corpus import cdf_buckets

    ds = ray.data.from_arrow(documents.select(["doc_id", "n_chars"]))
    with pytest.raises(ValueError, match="distinct"):
        cdf_buckets(ds, max_distinct=2)


def test_decontaminate_planted_leak(ray_session):
    """A doc quoting a benchmark sentence must flag; position counting
    (not distinct) means a doubled quote scores double."""
    import ray.data

    from geomesa_ray.stages.dedup import decontaminate

    bench = ["the secret benchmark answer is forty-two exactly"]
    leak = "intro text " + bench[0] + " outro"
    double = bench[0] + " and again " + bench[0]
    clean = "completely unrelated content with no overlap whatsoever here"
    short = "tiny"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([leak, double, clean, short], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    got = (
        decontaminate(ds, bench, k=24, threshold_hits=1)
        .to_pandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "contaminated"] == 1 and got.loc[1, "n_hits"] > 0
    assert got.loc[2, "n_hits"] > got.loc[1, "n_hits"]  # doubled quote
    assert got.loc[3, "contaminated"] == 0 and got.loc[3, "n_hits"] == 0
    # shorter than k: zero shingles, never contaminated
    assert got.loc[4, "n_shingles"] == 0 and got.loc[4, "contaminated"] == 0
    # n_shingles is byte-length - k + 1
    assert got.loc[3, "n_shingles"] == len(clean.encode()) - 23
    # Dataset-typed benchmark side takes the same path
    got2 = (
        decontaminate(ds, ray.data.from_arrow(pa.table({"text": pa.array(bench)})),
                      k=24)
        .to_pandas()
        .set_index("doc_id")
    )
    assert got2["n_hits"].equals(got["n_hits"])
    # tiny broadcast cap raises the documented guidance
    with pytest.raises(ValueError, match="MB-scale"):
        decontaminate(ds, bench * 100000, k=24, broadcast_limit_bytes=64)


def test_ann_stages_tolerate_empty_blocks(ray_session, embeddings):
    """Fused pipelines hand downstream fns the empty tables a filter
    emits; every ANN batch fn must pass them through (round-3 review)."""
    import ray.data

    from geomesa_ray.stages.similarity import (
        ann_brute, ann_ivf, assign_cells, encode_pq, lsh_cosine_pairs,
        train_centroids, train_pq,
    )

    q = np.asarray(embeddings["embedding"][0].as_py(), dtype=np.float64)[None, :]
    base = ray.data.from_arrow(embeddings).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=100
    )
    # interleave genuinely empty blocks via a filter that kills whole batches
    holey = base.map_batches(
        lambda b: b.filter(pa.array(
            np.full(len(b), (b["vec_id"][0].as_py() // 100) % 2 == 0)
        )),
        batch_format="pyarrow",
    )
    exact = ann_brute(holey, q, 5).to_pandas().sort_values("rank")
    assert len(exact) == 5
    cent = train_centroids(base, n_cells=4)
    got = ann_ivf(assign_cells(holey, cent), q, 5, cent, n_probe=4)
    assert len(got.to_pandas()) == 5
    coded = encode_pq(holey, train_pq(base, n_sub=4, n_codes=16))
    assert coded.count() == holey.count()
    pairs = lsh_cosine_pairs(holey, threshold=0.99)
    pairs.count()  # must execute without raising


def test_split_assign_deterministic_and_leakage_safe(ray_session):
    import ray.data

    from geomesa_ray.stages.corpus import split_assign

    t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    a = split_assign(ray.data.from_arrow(t)).to_pandas().set_index("doc_id")["split"]
    # partitioning-invariant: tiny batches give the identical assignment
    b = (
        split_assign(
            ray.data.from_arrow(t).map_batches(
                lambda x: x, batch_format="pyarrow", batch_size=7
            )
        )
        .to_pandas()
        .set_index("doc_id")["split"]
    )
    assert a.sort_index().equals(b.sort_index())
    counts = a.value_counts()
    assert counts["train"] > 1900 and counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    with pytest.raises(ValueError):
        split_assign(ray.data.from_arrow(t), train_per_mille=990, val_per_mille=20)


def test_normalize_text_rules(ray_session):
    import ray.data

    from geomesa_ray.stages.corpus import normalize_text

    texts = [
        "café",          # decomposed -> NFC composes
        "a\x01b\x7fc",          # control chars stripped
        "  a \t b\n\nc  ",      # whitespace collapsed + trimmed
        "plain",                 # untouched
        None,                    # null -> empty after cast/fill
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = (
        normalize_text(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.loc[0, "text"] == "caf\xe9" and got.loc[0, "changed"] == 1
    assert got.loc[1, "text"] == "abc" and got.loc[1, "changed"] == 1
    assert got.loc[2, "text"] == "a b c" and got.loc[2, "changed"] == 1
    assert got.loc[3, "text"] == "plain" and got.loc[3, "changed"] == 0


def test_dedup_keep_broadcast_and_join_arms_agree(ray_session, documents):
    import ray.data

    from geomesa_ray.stages.dedup import (
        cluster_pairs_dataset, dedup_keep, minhash_lsh_pairs,
    )

    dup = documents.slice(0, 30).set_column(
        documents.schema.get_field_index("doc_id"), "doc_id",
        pa.array(documents["doc_id"].to_numpy().max() + 1 + np.arange(30), pa.int64()),
    )
    full = pa.concat_tables([documents.select(["doc_id", "text"]),
                             dup.select(["doc_id", "text"])])
    ds = ray.data.from_arrow(full)
    labels = cluster_pairs_dataset(minhash_lsh_pairs(ds, threshold=0.5))
    a = sorted(dedup_keep(ds, labels).to_pandas()["doc_id"])
    b = sorted(
        dedup_keep(ds, labels, broadcast_limit_bytes=0).to_pandas()["doc_id"]
    )
    assert a == b and len(a) < len(full)


def test_exact_dedup_incremental(ray_session, documents, tmp_path):
    """New docs dedup against persisted bucket-partitioned state: seen
    keys drop, unseen keys keep their min-id row, state buckets are read
    per shard (no driver key set)."""
    import ray.data

    from geomesa_ray.stages.dedup import build_dedup_state, exact_dedup_incremental

    docs = documents.select(["doc_id", "text"])
    ids = docs["doc_id"].to_numpy()
    old_mask = ids % 5 == 0
    old = docs.filter(pa.array(old_mask))
    new = docs.filter(pa.array(~old_mask))
    state = str(tmp_path / "state")
    n_keys = build_dedup_state(ray.data.from_arrow(old), state)
    assert n_keys == len(set(old["text"].to_pylist()))
    got = sorted(
        exact_dedup_incremental(ray.data.from_arrow(new), state)
        .to_pandas()["doc_id"]
    )
    # brute-force oracle
    seen = set(old["text"].to_pylist())
    best = {}
    for i, t in zip(new["doc_id"].to_pylist(), new["text"].to_pylist()):
        if t in seen:
            continue
        if t not in best or i < best[t]:
            best[t] = i
    assert got == sorted(best.values())
    # a second incremental pass against updated state drops EVERYTHING
    from geomesa_ray.stages.dedup import build_dedup_state as _b
    state2 = str(tmp_path / "state2")
    _b(ray.data.from_arrow(docs), state2)
    again = exact_dedup_incremental(ray.data.from_arrow(new), state2)
    assert again.count() == 0


def test_stratified_sample_rates_and_defaults(ray_session):
    import ray.data

    from geomesa_ray.stages.corpus import _splitmix64, stratified_sample

    t = pa.table(
        {
            "doc_id": pa.array(range(3000), pa.int64()),
            "source": pa.array((["a", "b", "other"] * 1000), pa.string()),
        }
    )
    got = stratified_sample(
        ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=101
        ),
        {"a": 0, "b": 1000}, default_per_mille=500,
    ).to_pandas()
    # rate 0 keeps nothing; rate 1000 keeps everything; default ~half
    assert (got["source"] == "a").sum() == 0
    assert (got["source"] == "b").sum() == 1000
    n_other = (got["source"] == "other").sum()
    assert 400 < n_other < 600
    # deterministic: same ids kept on a rerun with different batching
    again = stratified_sample(
        ray.data.from_arrow(t), {"a": 0, "b": 1000}, default_per_mille=500
    ).to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    with pytest.raises(ValueError):
        stratified_sample(ray.data.from_arrow(t), {"a": 1001})


def test_tree_merge_final_block_fully_merged(ray_session):
    """A single final block larger than fanin_rows must still come back
    fully merged (the last pass runs whole-block) — the split-batch
    concatenation bug the round-3 code review caught."""
    import ray.data

    from geomesa_ray.stages.corpus import _group_sum, _tree_merge

    def mk(n):
        return pa.table(
            {"k": pa.array([f"key{i % 120}" for i in range(n)], pa.string()),
             "c": pa.array(np.ones(n, np.int64), pa.int64())}
        )

    parts = ray.data.from_arrow([mk(120), mk(120), mk(120)])
    merged, converged = _tree_merge(
        parts, lambda b: _group_sum(b, ["k"], ["c"]), fanin_rows=50
    )
    assert converged
    df = merged.to_pandas()
    assert len(df) == 120  # one row per key, fully merged
    assert (df["c"] == 3).all()


def test_pack_sequences_prefix_sum_exact(ray_session):
    """Distributed ordered prefix sum ≡ a single-threaded cumsum oracle,
    across bucket and shard boundaries."""
    import ray.data

    from geomesa_ray.stages.corpus import pack_sequences
    from geomesa_ray.stages.textstats import token_count

    rng = np.random.default_rng(11)
    n = 1000
    texts = [
        " ".join(f"w{j}" for j in range(int(rng.integers(0, 40))))
        for _ in range(n)
    ]
    ids = rng.permutation(n).astype(np.int64)  # arrival order ≠ id order
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(7)
    out = (
        pack_sequences(ds, ctx_len=100, bucket_size=64, n_shards=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # oracle: sort by id, cumsum
    toks = token_count(tbl["text"]).to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    by_id_start = {int(i): int(s) for i, s in zip(ids[order], np.concatenate([[0], np.cumsum(toks[order])[:-1]]))}
    assert out["start_tok"].tolist() == [by_id_start[int(i)] for i in out["doc_id"]]
    assert (out["chunk_first"] == out["start_tok"] // 100).all()
    assert (out["chunk_off"] == out["start_tok"] % 100).all()
    nt = out["n_tokens"].to_numpy()
    end = out["start_tok"].to_numpy() + nt
    last = np.where(nt > 0, (end - 1) // 100, out["chunk_first"].to_numpy())
    assert (out["chunk_last"].to_numpy() == last).all()
    # total stream length conserved
    assert end.max() == toks.sum()


def test_pack_sequences_empty_and_zero_token_docs(ray_session):
    import ray.data

    from geomesa_ray.stages.corpus import pack_sequences

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["", "one two", "..."], pa.string()),
    })
    out = (
        pack_sequences(ray.data.from_arrow(tbl), ctx_len=4, bucket_size=2)
        .to_pandas().sort_values("doc_id")
    )
    assert out["n_tokens"].tolist() == [0, 2, 0]
    assert out["start_tok"].tolist() == [0, 0, 2]
    assert out["chunk_last"].tolist() == [0, 0, 0]


def test_mix_epochs_deterministic_repeats(ray_session):
    import ray.data

    from geomesa_ray.stages.corpus import _splitmix64, mix_epochs

    n = 400
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array([f"s{i % 4}" for i in range(n)], pa.string()),
    })
    epochs = {"s0": 2.0, "s1": 1.5, "s2": 0.25, "s3": 0.0}
    out = (
        mix_epochs(ray.data.from_arrow(tbl).repartition(5), epochs)
        .to_pandas().sort_values(["doc_id", "rep"]).reset_index(drop=True)
    )
    bucket = (_splitmix64(np.arange(n).astype(np.uint64)) % np.uint64(1000)).astype(int)
    for i in range(n):
        e = epochs[f"s{i % 4}"]
        expect = int(np.floor(e)) + (1 if bucket[i] < round((e % 1) * 1000) else 0)
        got = (out["doc_id"] == i).sum()
        assert got == expect, (i, got, expect)
    # rep numbering 0..k-1 per doc
    sub = out[out["doc_id"] == out[out["source"] == "s0"]["doc_id"].iloc[0]]
    assert sub["rep"].tolist() == [0, 1]
    # partition-invariance: same output regardless of block structure
    out2 = (
        mix_epochs(ray.data.from_arrow(tbl).repartition(17), epochs)
        .to_pandas().sort_values(["doc_id", "rep"]).reset_index(drop=True)
    )
    assert out.equals(out2)


def test_chunk_corpus_exact_stream(ray_session):
    """Materialized chunks ≡ the single-threaded token-stream oracle:
    byte-equal text, exact boundaries, partition-invariant."""
    import re

    import ray.data

    from geomesa_ray.stages.corpus import chunk_corpus

    rng = np.random.default_rng(5)
    n = 300
    texts = [
        " ".join(f"t{int(v)}" for v in rng.integers(0, 500, int(rng.integers(0, 50))))
        for _ in range(n)
    ]
    ids = rng.permutation(n).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = (
        chunk_corpus(ray.data.from_arrow(tbl).repartition(6),
                     ctx_len=64, bucket_size=32, n_shards=4)
        .to_pandas().sort_values("chunk_id").reset_index(drop=True)
    )
    # oracle: concatenate all tokens in id order, chunk by 64
    stream = []
    for i in np.argsort(ids):
        stream.extend(re.findall(r"\w+", texts[i]))
    expect_chunks = [stream[i:i + 64] for i in range(0, len(stream), 64)]
    assert out["chunk_id"].tolist() == list(range(len(expect_chunks)))
    assert out["n_tokens"].tolist() == [len(c) for c in expect_chunks]
    assert out["text"].tolist() == [" ".join(c) for c in expect_chunks]
    # partition invariance
    out2 = (
        chunk_corpus(ray.data.from_arrow(tbl).repartition(13),
                     ctx_len=64, bucket_size=32, n_shards=7)
        .to_pandas().sort_values("chunk_id").reset_index(drop=True)
    )
    assert out.equals(out2)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup
# ---------------------------------------------------------------------------


def test_ngram_jaccard_pairs_matches_bruteforce(ray_session, documents):
    """Exact Jaccard vs a per-pair Python set oracle on a planted corpus."""
    import re

    import ray.data
    from geomesa_ray.stages.dedup import ngram_jaccard_pairs

    corpus = _near_dup_corpus(documents)
    ds = ray.data.from_arrow(corpus).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=17
    )
    out = ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas()

    def shingles(t):
        w = re.findall(r"\w+", t.lower())
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    ids = corpus["doc_id"].to_numpy()
    sets = [shingles(t) for t in corpus["text"].to_pylist()]
    expect = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if 2 * inter >= union and inter > 0:
                a, b = sorted((int(ids[i]), int(ids[j])))
                expect[(a, b)] = (inter, union)
    got = {
        (int(r.left_id), int(r.right_id)): (int(r.inter), int(r.union_cnt))
        for r in out.itertuples()
    }
    assert got == expect
    assert len(expect) >= 10  # every planted near-dup found


def test_ngram_jaccard_edge_cases(ray_session):
    """Short docs (<n words), empty corpus after filter, stop-shingle cap."""
    import pyarrow.compute as pc
    import ray.data
    from geomesa_ray.stages.dedup import ngram_jaccard_pairs

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "one two",  # too short: no shingles
                    "alpha beta gamma delta",
                    "alpha beta gamma delta",  # exact dup of 2
                    "", 
                    "zeta eta theta iota kappa",
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    out = ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas()
    assert [(r.left_id, r.right_id, r.inter, r.union_cnt) for r in out.itertuples()] == [
        (2, 3, 2, 2)
    ]

    # empty after filter: every batch fn must tolerate 0 rows
    empty = ds.map_batches(
        lambda b: b.filter(pc.greater(b["doc_id"], 100)), batch_format="pyarrow"
    )
    assert ngram_jaccard_pairs(empty).count() == 0

    # stop-shingle cap surfaces loud marker counts, never silent drops
    rep = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array(["common stop shingle here"] * 10),
        }
    )
    stats = {}
    out2 = ngram_jaccard_pairs(
        ray.data.from_arrow(rep), threshold=0.5, max_df=5, stats=stats
    ).to_pandas()
    assert len(out2) == 0  # all segments capped
    assert stats["stop_shingles"] >= 1
    assert stats["stop_shingle_rows"] >= 10


def test_cosine_neardup_matches_bruteforce(ray_session, embeddings):
    """Exact all-pairs arm vs a numpy brute-force oracle; LSH arm finds a
    superset-verified subset (recall) of the same pairs at its threshold."""
    import ray.data
    from geomesa_ray.stages.similarity import cosine_neardup_pairs

    ds = ray.data.from_arrow(embeddings).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=64
    )
    tau = 0.45
    out = cosine_neardup_pairs(ds, threshold=tau).to_pandas()
    m = np.array(embeddings["embedding"].to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ids = embeddings["vec_id"].to_numpy()
    sims = m @ m.T
    iu, ju = np.triu_indices(len(m), k=1)
    keep = sims[iu, ju] >= tau
    expect = sorted(
        (min(int(ids[a]), int(ids[b])), max(int(ids[a]), int(ids[b])))
        for a, b in zip(iu[keep], ju[keep])
    )
    got = [(int(r.left_id), int(r.right_id)) for r in out.itertuples()]
    assert got == expect
    assert len(expect) > 0


def test_cosine_neardup_cap_and_guard(ray_session, embeddings):
    import ray.data
    from geomesa_ray.stages.similarity import cosine_neardup_pairs

    ds = ray.data.from_arrow(embeddings)
    # broadcast cap raises loudly with a pointer to the LSH arm
    with pytest.raises(ValueError, match="lsh_cosine_pairs"):
        cosine_neardup_pairs(ds, broadcast_cap_bytes=1024).to_pandas()
    # hash-safety guard: a threshold set ON an existing pairwise cosine
    # must raise, not silently emit a boundary-dependent pair set
    m = np.array(embeddings["embedding"].to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    iu, ju = np.triu_indices(len(m), k=1)
    tau_on_pair = float(sims[iu, ju].max())
    with pytest.raises(Exception, match="hash-unsafe boundary"):
        cosine_neardup_pairs(ds, threshold=tau_on_pair).to_pandas()


def test_topk_per_group_huge_path(ray_session):
    """Force the non-converged shard path (fanin_rows=1) and check it
    matches the single-block path and brute-force truth."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from geomesa_ray.stages.corpus import topk_per_group

    rows = [("en", f"s{i % 7}") for i in range(200)] + \
           [("de", f"s{i % 3}") for i in range(90)] + [("fr", "s0")]
    t = pa.table({"lang": [r[0] for r in rows], "source": [r[1] for r in rows]})
    ds = rd.from_arrow(t).map_batches(lambda b: b, batch_format="pyarrow",
                                      batch_size=37)

    def truth(k):
        c = collections.Counter(rows)
        per = collections.defaultdict(list)
        for (g, s), n in c.items():
            per[g].append((-n, s))
        out = set()
        for g, items in per.items():
            for rank, (negn, s) in enumerate(sorted(items)[:k], 1):
                out.add((g, s, -negn, rank))
        return out

    got_fast = {(r["lang"], r["source"], r["n"], r["rank"])
                for r in topk_per_group(ds, "lang", "source", 2).take_all()}
    assert got_fast == truth(2)

    # the tree merge converges on any test-sized input (it only fails to
    # at >8^rounds blocks), so FORCE the non-converged shard-ranking
    # branch by reporting converged=False
    import geomesa_ray.stages.corpus as corpus_mod

    real_tree_merge = corpus_mod._tree_merge
    try:
        corpus_mod._tree_merge = lambda *a, **kw: (real_tree_merge(*a, **kw)[0], False)
        got_huge = {(r["lang"], r["source"], r["n"], r["rank"])
                    for r in topk_per_group(ds, "lang", "source", 2).take_all()}
    finally:
        corpus_mod._tree_merge = real_tree_merge
    assert got_huge == truth(2)

    # null group/key rows are excluded, not a crash
    tn = pa.table({"lang": ["en", None, "en"], "source": ["s1", "s1", None]})
    got_null = topk_per_group(rd.from_arrow(tn), "lang", "source", 2).take_all()
    assert [(r["lang"], r["source"], r["n"]) for r in got_null] == [("en", "s1", 1)]
