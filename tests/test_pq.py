"""Product-quantization ANN (stages/similarity.py PQ section): codebook
training determinism, code round-trip, exhaustive-candidate exactness vs
brute force, and non-degenerate recall."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


@pytest.fixture(scope="module")
def books(emb_ds):
    from geomesa_ray.stages.similarity import train_pq

    return train_pq(emb_ds, n_sub=8, n_codes=32, iters=5)


def _query_vec():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def test_train_pq_deterministic(emb_ds, books):
    from geomesa_ray.stages.similarity import train_pq

    again = train_pq(emb_ds, n_sub=8, n_codes=32, iters=5)
    assert books.shape == (8, 32, 8)
    np.testing.assert_array_equal(books, again)


def test_encode_pq_codes(emb_ds, books):
    from geomesa_ray.stages.similarity import encode_pq

    t = encode_pq(emb_ds, books).take_batch(50, batch_format="pyarrow")
    assert t["pq_code"].type.byte_width == 8
    codes = np.stack([np.frombuffer(v.as_py(), np.uint8) for v in t["pq_code"]])
    assert codes.max() < 32
    # every code must be the argmin-L2 codebook entry for its subvector
    m = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for s in range(8):
        sub = m[:, s * 8:(s + 1) * 8]
        d = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(codes[:, s], d.argmin(1))


def test_ann_pq_exhaustive_equals_brute(emb_ds, books):
    from geomesa_ray.stages.similarity import ann_brute, ann_pq, encode_pq

    q = _query_vec()[None, :]
    brute = ann_brute(emb_ds, q, 10).to_pandas().sort_values("rank")
    coded = encode_pq(emb_ds, books)
    got = ann_pq(coded, q, 10, books, n_cand=10_000).to_pandas().sort_values("rank")
    assert got["vec_id"].tolist() == brute["vec_id"].tolist()
    np.testing.assert_allclose(
        got["cosine"].to_numpy(), brute["cosine"].to_numpy(), rtol=1e-12
    )


@pytest.fixture(scope="module")
def ivf_pq_dir(emb_ds, tmp_path_factory):
    from geomesa_ray.stages.similarity import ingest_ivf_pq

    out = str(tmp_path_factory.mktemp("ivfpq") / "layout")
    ingest_ivf_pq(emb_ds, out, n_cells=8, n_sub=8, n_codes=32,
                  sample_rows=5000, iters=5)
    return out


def test_ann_ivf_pq_exhaustive_equals_brute(emb_ds, ivf_pq_dir):
    from geomesa_ray.stages.similarity import ann_brute, ann_ivf_pq_indexed

    q = _query_vec()[None, :]
    brute = ann_brute(emb_ds, q, 10).to_pandas().sort_values("rank")
    stats = {}
    got = ann_ivf_pq_indexed(
        ivf_pq_dir, q, 10, n_probe=8, n_cand=10_000, stats=stats
    ).to_pandas().sort_values("rank")
    assert stats["files_read"] == stats["files_total"]  # exhaustive probe
    assert got["vec_id"].tolist() == brute["vec_id"].tolist()
    np.testing.assert_allclose(
        got["cosine"].to_numpy(), brute["cosine"].to_numpy(), rtol=1e-12
    )


def test_ann_ivf_pq_partial_probe_prunes_files(emb_ds, ivf_pq_dir):
    """The scale claim: a partial probe must read strictly fewer files
    than the layout holds, and still recover most of the true top-10."""
    from geomesa_ray.stages.similarity import ann_brute, ann_ivf_pq_indexed

    q = _query_vec()[None, :]
    brute = set(ann_brute(emb_ds, q, 10).to_pandas()["vec_id"])
    stats = {}
    got = ann_ivf_pq_indexed(
        ivf_pq_dir, q, 10, n_probe=3, n_cand=100, stats=stats
    ).to_pandas()
    assert stats["files_read"] < stats["files_total"]
    assert len(set(got["vec_id"]) & brute) >= 6


def test_embedding_dedup_keep(ray_session):
    """Planted near-duplicate vectors (tiny perturbations) must collapse
    to their min-id representative; distant vectors all survive."""
    import pyarrow as pa
    import ray.data

    from geomesa_ray.stages.similarity import embedding_dedup_keep

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [base[i] for i in range(30)]
    # ids 30..39: near-dups of ids 0..9 (cosine ≈ 1)
    for i in range(10):
        vecs.append(base[i] + 1e-4 * rng.standard_normal(64))
    ids = list(range(40))
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = embedding_dedup_keep(
        ray.data.from_arrow(t), threshold=0.999, n_shards=4
    ).to_pandas()
    kept = set(out["vec_id"])
    assert set(range(30)) <= kept          # all originals survive
    assert kept.isdisjoint(range(30, 40))  # every planted dup dropped


def test_ann_pq_recall(emb_ds, books):
    """Non-degenerate config: ADC pre-selection with a bounded candidate
    set still recovers most of the true top-10."""
    from geomesa_ray.stages.similarity import ann_brute, ann_pq, encode_pq

    q = _query_vec()[None, :]
    brute = set(ann_brute(emb_ds, q, 10).to_pandas()["vec_id"])
    coded = encode_pq(emb_ds, books)
    got = set(ann_pq(coded, q, 10, books, n_cand=50).to_pandas()["vec_id"])
    assert len(got & brute) >= 6  # recall@10 ≥ 0.6 with 10% candidates
