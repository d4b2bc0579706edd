"""Approximate-nearest-neighbor search over an embedding column.

* :func:`ann_brute` — exact cosine top-k baseline: each batch computes a
  (batch × Q) float64 matmul against the broadcast query matrix and emits
  only its per-query top-k (combiner), merged per query — the same
  partial-top-k shape as the geo kNN.
* :func:`ann_ivf` — the scale path: a deterministic sampled k-means builds
  coarse centroids; every vector is assigned to its nearest centroid cell
  (one pass); queries probe only ``n_probe`` nearest cells. The centroid
  table is tiny and broadcast; the data pass writes a cell column so the
  probe scan prunes by cell like the geo index prunes by z-range.
* :func:`lsh_cosine_buckets` — random-hyperplane signatures for
  embedding-cosine near-duplicate detection (pairs with high bit agreement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from geomesa_ray.stages.shards import default_shards


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-copy-ish.

    A 0-row batch yields (0, 0) — reshape(0, -1) would raise, and fused
    pipelines DO hand downstream fns the empty tables a filter stage
    emits, so every caller short-circuits on n == 0."""
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _partial_cosine_topk(batch: pa.Table, qmat: np.ndarray, k: int,
                         id_col: str, emb_col: str) -> pa.Table:
    if len(batch) == 0:  # empty block from an upstream filter (fused)
        return pa.table(
            {
                "query_idx": pa.array([], pa.int32()),
                id_col: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    m = _normalize(_emb_matrix(batch, emb_col))
    sims = m @ qmat.T  # (n, Q)
    n, q = sims.shape
    kk = min(k, n)
    out_q, out_i, out_s = [], [], []
    idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
    ids_np = batch[id_col].to_numpy(zero_copy_only=False)
    for j in range(q):
        sj = sims[:, j]
        # boundary-tie refinement: keep the smallest ids among candidates
        # tied at the k-th similarity (the global ascending-id contract)
        thr = sj[idx[:, j]].min()
        cand = np.nonzero(sj >= thr)[0]
        sel = cand[np.lexsort((ids_np[cand], -sj[cand]))[:kk]]
        out_q.append(np.full(kk, j, dtype=np.int32))
        out_i.append(sel)
        out_s.append(sj[sel])
    return pa.table(
        {
            "query_idx": pa.array(np.concatenate(out_q), pa.int32()),
            id_col: batch[id_col].take(pa.array(np.concatenate(out_i), pa.int64())),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        }
    )


def _final_cosine_topk(group: pa.Table, k: int) -> pa.Table:
    sims = group["cosine"].to_numpy(zero_copy_only=False)
    order = np.lexsort((group[group.schema.names[1]].to_numpy(zero_copy_only=False), -sims))[:k]
    out = group.take(pa.array(order, pa.int64()))
    return out.append_column(
        "rank", pa.array(np.arange(1, len(out) + 1, dtype=np.int32), pa.int32())
    )


def ann_brute(
    vectors: ray.data.Dataset,
    query_matrix: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    batch_size: int = 50_000,
) -> ray.data.Dataset:
    """Exact cosine top-k per query row of ``query_matrix`` (Q × d).

    Ties broken by ascending id (deterministic). Result rows:
    (query_idx, id, cosine, rank).
    """
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    partials = vectors.map_batches(
        _partial_cosine_topk,
        fn_kwargs={"qmat": qmat, "k": k, "id_col": id_col, "emb_col": emb_col},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return partials.groupby("query_idx").map_groups(
        _final_cosine_topk, fn_kwargs={"k": k}, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def train_centroids(
    vectors: ray.data.Dataset,
    n_cells: int = 64,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (normalized)."""
    sample = vectors.limit(sample_rows).to_pandas()
    m = _normalize(
        np.stack(sample[emb_col].to_numpy()).astype(np.float64)
    )
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(m))
    cent = m[rng.choice(len(m), n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(n_cells):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def assign_cells(vectors: ray.data.Dataset, centroids: np.ndarray,
                 emb_col: str = "embedding") -> ray.data.Dataset:
    """One streaming pass adding an ``ivf_cell`` column (nearest centroid)."""
    import ray

    cent_ref = ray.put(np.ascontiguousarray(centroids))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        if len(batch) == 0:
            return batch.append_column("ivf_cell", pa.array([], pa.int32()))
        m = _normalize(_emb_matrix(batch, emb_col))
        cells = np.argmax(m @ cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cells, pa.int32()))

    return vectors.map_batches(assign, batch_format="pyarrow")


def ann_ivf(
    vectors: ray.data.Dataset,
    query_matrix: np.ndarray,
    k: int,
    centroids: np.ndarray,
    n_probe: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF ANN: probe only the ``n_probe`` cells nearest each query.

    ``vectors`` must already carry ``ivf_cell`` (from :func:`assign_cells` —
    at scale this is the written partition column, so the filter prunes
    files instead of rows).
    """
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    cq = np.argsort(-(qmat @ _normalize(centroids).T), axis=1)[:, :n_probe]  # (Q, n_probe)
    wanted = np.unique(cq).astype(np.int32)

    def prune(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch["ivf_cell"].to_numpy(zero_copy_only=False), wanted)
        return batch.filter(pa.array(mask))

    pruned = vectors.map_batches(prune, batch_format="pyarrow")
    return ann_brute(pruned, query_matrix, k, id_col=id_col, emb_col=emb_col)


# ---------------------------------------------------------------------------
# cosine LSH (near-dup over embeddings)
# ---------------------------------------------------------------------------

def lsh_cosine_pairs(
    vectors: ray.data.Dataset,
    n_planes: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int | None = None,
    max_bucket_rows: int = 10_000,
    stats: dict | None = None,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Embedding near-dup pairs: random-hyperplane bucket + exact cosine
    verify inside each bucket. Returns a DATASET of (left_id, right_id,
    cosine) sorted by pair — never driver-materialized. Buckets above
    ``max_bucket_rows`` take an O(n) anchor-star pass (all rows verified
    against the min-id row) instead of the quadratic all-pairs, emit a
    ``left_id = -1`` marker, and are surfaced via ``stats`` (same contract
    as the MinHash/SimHash pair pipelines — no silent drops)."""
    if dim is None:
        first = vectors.take(1)[0][emb_col]
        dim = len(first)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    if n_shards is None:
        n_shards = default_shards()

    def bucketize(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "__shard__": pa.array([], pa.int32()),
                    id_col: pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    emb_col: pa.array([], pa.list_(pa.float32())),
                }
            )
        m = _normalize(_emb_matrix(batch, emb_col))
        bits = (m @ planes) > 0  # (n, planes)
        key = np.zeros(len(m), dtype=np.int64)
        for b in range(n_planes):
            key = (key << 1) | bits[:, b].astype(np.int64)
        with np.errstate(over="ignore"):
            shard = (
                (key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(32)
            ) % np.uint64(n_shards)
        return pa.table(
            {
                "__shard__": pa.array(shard.astype(np.int32), pa.int32()),
                id_col: batch[id_col],
                "bucket": pa.array(key, pa.int64()),
                emb_col: batch[emb_col],
            }
        )

    def _one_bucket(ids, m, li, ri, cs):
        if len(ids) > max_bucket_rows:
            anchor = int(np.argmin(ids))
            sims = m @ m[anchor]
            hit = sims >= threshold
            hit[anchor] = False
            for i in np.nonzero(hit)[0].tolist():
                a, b = ids[anchor], ids[i]
                li.append(min(a, b)); ri.append(max(a, b)); cs.append(sims[i])
            li.append(-1); ri.append(len(ids)); cs.append(0.0)  # marker row
            return
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold
        if hit.any():
            li.extend(ids[iu[hit]].tolist())
            ri.extend(ids[ju[hit]].tolist())
            cs.extend(sims[iu[hit], ju[hit]].tolist())

    def shard_pairs(group: pa.Table) -> pa.Table:
        """All buckets of one shard: vectorized segmentation, the pair
        kernel only on multi-row buckets (O(shards) group calls)."""
        ids = group[id_col].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(ids) < 2:
            return empty
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(bucket, kind="stable")
        bucket, ids = bucket[order], ids[order]
        m_all = _normalize(_emb_matrix(group, emb_col))[order]
        starts = np.nonzero(np.concatenate([[True], bucket[1:] != bucket[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(ids)]])
        li: list = []; ri: list = []; cs: list = []
        for s, e in zip(starts, ends):
            if e - s >= 2:
                _one_bucket(ids[s:e], m_all[s:e], li, ri, cs)
        if not li:
            return empty
        return pa.table(
            {
                "left_id": pa.array(li, pa.int64()),
                "right_id": pa.array(ri, pa.int64()),
                "cosine": pa.array(cs, pa.float64()),
            }
        )

    pairs = (
        vectors.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(shard_pairs, batch_format="pyarrow")
    )
    from geomesa_ray.stages.dedup import _finalize_pairs

    return _finalize_pairs(pairs, "cosine", "max", stats)


# ---------------------------------------------------------------------------
# IVF-partitioned layout (file-level pruning for the probe)
# ---------------------------------------------------------------------------

def ingest_ivf(
    vectors: ray.data.Dataset,
    out_dir: str,
    n_cells: int = 64,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    emb_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Write an IVF-partitioned embedding layout: hive-style
    ``ivf_cell=<c>/`` directories (one per coarse cell) plus the trained
    centroids under ``_meta/``. The probe then plans a FILE LIST from the
    probed cells — the scale analog of the geo layouts' manifest pruning
    (every other index here prunes files; the row-level ``ann_ivf``
    filter is only the unindexed fallback)."""
    import os

    if centroids is None:
        centroids = train_centroids(
            vectors, n_cells=n_cells, sample_rows=sample_rows, iters=iters,
            seed=seed, emb_col=emb_col,
        )
    ds = assign_cells(vectors, centroids, emb_col=emb_col)
    # cluster by cell before the partitioned write — otherwise every
    # block writes a sliver into every cell dir (observed ~25 files/dir)
    # and the probe's pruned read pays per-file open cost
    ds.sort("ivf_cell").write_parquet(out_dir, partition_cols=["ivf_cell"])
    meta = os.path.join(out_dir, "_meta")
    os.makedirs(meta, exist_ok=True)
    np.save(os.path.join(meta, "centroids.npy"), centroids)
    return centroids


def load_ivf_centroids(out_dir: str) -> np.ndarray:
    import os

    return np.load(os.path.join(out_dir, "_meta", "centroids.npy"))


def plan_ivf_files(out_dir: str, cells) -> tuple[list[str], int]:
    """(files for the probed cells, total file count in the layout)."""
    import glob as _glob
    import os

    total = len(_glob.glob(os.path.join(out_dir, "ivf_cell=*", "*.parquet")))
    files: list[str] = []
    for c in sorted(int(c) for c in set(np.asarray(cells).ravel().tolist())):
        files.extend(
            sorted(_glob.glob(os.path.join(out_dir, f"ivf_cell={c}", "*.parquet")))
        )
    return files, total


def ann_ivf_indexed(
    out_dir: str,
    query_matrix: np.ndarray,
    k: int,
    n_probe: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    stats: dict | None = None,
) -> ray.data.Dataset:
    """IVF ANN over the partitioned layout: only the probed cells' FILES
    are read (``stats['files_read']`` / ``['files_total']`` expose the
    pruning). Exhaustive probe (``n_probe >= n_cells``) reads everything
    and equals exact search."""
    centroids = load_ivf_centroids(out_dir)
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    cq = np.argsort(-(qmat @ _normalize(centroids).T), axis=1)[:, :n_probe]
    files, total = plan_ivf_files(out_dir, cq)
    if stats is not None:
        stats["files_read"] = len(files)
        stats["files_total"] = total
    if not files:
        return ray.data.from_arrow(
            pa.table({"query_idx": pa.array([], pa.int32()),
                      id_col: pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64()),
                      "rank": pa.array([], pa.int32())})
        )
    ds = ray.data.read_parquet(files, columns=[id_col, emb_col])
    return ann_brute(ds, query_matrix, k, id_col=id_col, emb_col=emb_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the 100-TB memory path for ANN
# ---------------------------------------------------------------------------
#
# At corpus scale the float embeddings don't fit the scan budget: a
# 64-dim float32 vector is 256 B, its PQ code (8 subspaces × uint8) is
# 8 B — a 32× scan-size reduction. The scan stage reads codes only and
# scores them against a per-query ADC lookup table (one (n_sub, n_codes)
# gather + segment sum — no matmul over raw vectors); only the surviving
# candidates are re-ranked with exact cosine. Composes with the IVF
# layout: partition files by coarse cell, store codes in the files, keep
# raw embeddings for the re-rank fetch.

def train_pq(
    vectors: ray.data.Dataset,
    n_sub: int = 8,
    n_codes: int = 256,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Deterministic per-subspace k-means codebooks, shape
    ``(n_sub, n_codes, d // n_sub)``, trained on a driver-side sample of
    the NORMALIZED vectors (so summed sub-dot-products approximate the
    cosine)."""
    sample = vectors.limit(sample_rows).to_pandas()
    m = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    n, d = m.shape
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by n_sub {n_sub}")
    d_sub = d // n_sub
    n_codes = min(n_codes, n)
    rng = np.random.default_rng(seed)
    books = np.empty((n_sub, n_codes, d_sub), dtype=np.float64)
    for s in range(n_sub):
        sub = m[:, s * d_sub:(s + 1) * d_sub]
        cent = sub[rng.choice(n, n_codes, replace=False)]
        for _ in range(iters):
            # nearest centroid by L2 == max (dot - ||c||²/2)
            scores = sub @ cent.T - 0.5 * np.sum(cent * cent, axis=1)
            assign = np.argmax(scores, axis=1)
            for c in range(n_codes):
                sel = sub[assign == c]
                if len(sel):
                    cent[c] = sel.mean(axis=0)
        books[s] = cent
    return books


def encode_pq(vectors: ray.data.Dataset, codebooks: np.ndarray,
              emb_col: str = "embedding") -> ray.data.Dataset:
    """One streaming pass adding a ``pq_code`` fixed-width binary column
    (one uint8 per subspace). The raw embedding column is kept for exact
    re-ranking of candidates."""
    import ray as _ray

    books_ref = _ray.put(np.ascontiguousarray(codebooks))

    def encode(batch: pa.Table) -> pa.Table:
        books = _resolve_ref(books_ref)
        n_sub, n_codes, d_sub = books.shape
        if len(batch) == 0:
            return batch.append_column(
                "pq_code", pa.array([], pa.binary(n_sub))
            )
        m = _normalize(_emb_matrix(batch, emb_col))
        codes = np.empty((len(m), n_sub), dtype=np.uint8)
        for s in range(n_sub):
            sub = m[:, s * d_sub:(s + 1) * d_sub]
            scores = sub @ books[s].T - 0.5 * np.sum(books[s] * books[s], axis=1)
            codes[:, s] = np.argmax(scores, axis=1).astype(np.uint8)
        return batch.append_column(
            "pq_code", pa.Array.from_buffers(
                pa.binary(n_sub), len(m),
                [None, pa.py_buffer(codes.tobytes())],
            )
        )

    return vectors.map_batches(encode, batch_format="pyarrow")


def _resolve_ref(ref):
    import ray as _ray

    return _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref


def _adc_scores(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """(n, Q) approximate dot products: gather each row's per-subspace LUT
    entry and sum — vectorized over the whole batch."""
    n_sub = codes.shape[1]
    # lut: (Q, n_sub, n_codes) → score[n, q] = Σ_s lut[q, s, codes[n, s]]
    out = lut[:, 0, codes[:, 0]]
    for s in range(1, n_sub):
        out = out + lut[:, s, codes[:, s]]
    return out.T  # (n, Q)


def ann_pq(
    vectors: ray.data.Dataset,
    query_matrix: np.ndarray,
    k: int,
    codebooks: np.ndarray,
    n_cand: int = 100,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    batch_size: int = 50_000,
) -> ray.data.Dataset:
    """PQ ANN with exact re-rank: per-batch ADC partial top-``n_cand``
    per query (codes-only scoring), then the per-query group re-ranks its
    ≤ n_cand·n_blocks survivors by exact cosine and keeps top-k (ties by
    ascending id — same contract as :func:`ann_brute`). With
    ``n_cand >= corpus rows`` every row survives to the re-rank, so the
    result equals exact search (the oracle-pinned configuration)."""
    import ray as _ray

    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    n_sub, n_codes, d_sub = codebooks.shape
    # per-query LUT of sub-dot-products against every codebook entry
    lut = np.stack([
        qmat[:, s * d_sub:(s + 1) * d_sub] @ codebooks[s].T
        for s in range(n_sub)
    ], axis=1)  # (Q, n_sub, n_codes)
    lut_ref = _ray.put(np.ascontiguousarray(lut))

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int32()),
                    id_col: pa.array([], pa.int64()),
                    emb_col: pa.array([], pa.list_(pa.float32())),
                }
            )
        lt = _resolve_ref(lut_ref)
        arr = batch["pq_code"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        codes = np.frombuffer(arr.buffers()[1], dtype=np.uint8).reshape(
            -1, n_sub
        )[arr.offset:arr.offset + len(arr)]
        scores = _adc_scores(codes, lt)  # (n, Q)
        n, q = scores.shape
        kk = min(n_cand, n)
        idx = np.argpartition(-scores, kk - 1, axis=0)[:kk]
        qs, rows = [], []
        for j in range(q):
            qs.append(np.full(kk, j, dtype=np.int32))
            rows.append(idx[:, j])
        take = pa.array(np.concatenate(rows), pa.int64())
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(qs), pa.int32()),
                id_col: batch[id_col].take(take),
                emb_col: batch[emb_col].take(take),
            }
        )

    def rerank(group: pa.Table) -> pa.Table:
        qi = int(group["query_idx"][0].as_py())
        m = _normalize(_emb_matrix(group, emb_col))
        sims = m @ qmat[qi]
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "query_idx": pa.array(np.full(len(order), qi, np.int32), pa.int32()),
                id_col: pa.array(ids[order], pa.int64()),
                "cosine": pa.array(sims[order], pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32), pa.int32()),
            }
        )

    partials = vectors.map_batches(partial, batch_format="pyarrow",
                                   batch_size=batch_size)
    return partials.groupby("query_idx").map_groups(
        rerank, batch_format="pyarrow"
    )


def embedding_dedup_keep(
    vectors: ray.data.Dataset,
    threshold: float = 0.9,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    stats: dict | None = None,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup dedup end-to-end: LSH bucket + exact
    cosine verify (:func:`lsh_cosine_pairs`) → distributed connected
    components → anti-join keep filter. Each component survives only at
    its min-id row. Same Dataset-native shape as the MinHash dedup_keep
    chain (stages/dedup.py) — no driver materialization."""
    from geomesa_ray.stages.dedup import cluster_pairs_dataset, dedup_keep

    pairs = lsh_cosine_pairs(
        vectors, n_planes=n_planes, threshold=threshold, seed=seed,
        id_col=id_col, emb_col=emb_col, stats=stats, n_shards=n_shards,
    ).map_batches(
        # strip mega-bucket marker rows (left_id = -1) before clustering
        lambda b: b.filter(pc.greater_equal(b["left_id"], pa.scalar(0))),
        batch_format="pyarrow",
    )
    labels = cluster_pairs_dataset(pairs)

    # Ray's hash join rejects list<float> non-key columns, so the vector
    # rides the anti-join as fixed-width binary and is unpacked after.
    def pack(batch: pa.Table) -> pa.Table:
        arr = batch[emb_col].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        d = len(arr[0]) if len(arr) else 0
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
        packed = pa.Array.from_buffers(
            pa.binary(4 * d), len(arr), [None, pa.py_buffer(flat.tobytes())]
        )
        idx = batch.schema.get_field_index(emb_col)
        return batch.set_column(idx, "__emb_bin__", packed)

    def unpack(batch: pa.Table) -> pa.Table:
        arr = batch["__emb_bin__"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            idx0 = batch.schema.get_field_index("__emb_bin__")
            return batch.set_column(
                idx0, emb_col, pa.array([], pa.list_(pa.float32()))
            )
        d = arr.type.byte_width // 4
        flat = np.frombuffer(arr.buffers()[1], dtype=np.float32)[
            arr.offset * d:(arr.offset + len(arr)) * d
        ]
        lst = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float32()), d
        ).cast(pa.list_(pa.float32()))
        idx = batch.schema.get_field_index("__emb_bin__")
        return batch.set_column(idx, emb_col, lst)

    kept = dedup_keep(
        vectors.map_batches(pack, batch_format="pyarrow"), labels, id_col=id_col
    )
    return kept.map_batches(unpack, batch_format="pyarrow")


def ingest_ivf_pq(
    vectors: ray.data.Dataset,
    out_dir: str,
    n_cells: int = 64,
    n_sub: int = 8,
    n_codes: int = 256,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    emb_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """The composed 100-TB ANN layout: IVF cell partitioning (file-level
    probe pruning) + PQ codes stored next to the raw vectors (codes-only
    scan, 32× smaller than the float column). One training pass on a
    sample, one streaming assign+encode pass, one partitioned write."""
    import os

    centroids = train_centroids(
        vectors, n_cells=n_cells, sample_rows=sample_rows, iters=iters,
        seed=seed, emb_col=emb_col,
    )
    books = train_pq(
        vectors, n_sub=n_sub, n_codes=n_codes, sample_rows=sample_rows,
        iters=iters, seed=seed, emb_col=emb_col,
    )
    ds = encode_pq(assign_cells(vectors, centroids, emb_col=emb_col),
                   books, emb_col=emb_col)
    # cluster by cell before the partitioned write — otherwise every
    # block writes a sliver into every cell dir (observed ~25 files/dir)
    # and the probe's pruned read pays per-file open cost
    ds.sort("ivf_cell").write_parquet(out_dir, partition_cols=["ivf_cell"])
    meta = os.path.join(out_dir, "_meta")
    os.makedirs(meta, exist_ok=True)
    np.save(os.path.join(meta, "centroids.npy"), centroids)
    np.save(os.path.join(meta, "pq_codebooks.npy"), books)
    return centroids, books


def ann_ivf_pq_indexed(
    out_dir: str,
    query_matrix: np.ndarray,
    k: int,
    n_probe: int = 8,
    n_cand: int = 100,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    stats: dict | None = None,
) -> pa.Table:
    """Two-phase indexed ANN over the IVF+PQ layout:

    1. codes-only scan — read ONLY ``(id, pq_code)`` from the probed
       cells' files (file pruning × column pruning), score by ADC, keep
       the global top-``n_cand`` candidates per query;
    2. targeted fetch — re-read just those files' ``(id, embedding)``
       rows for the candidate ids (bounded: ≤ n_cand × Q rows survive)
       and re-rank by exact cosine.

    With ``n_probe >= n_cells`` and ``n_cand >= corpus`` this equals
    exact search (the oracle-pinned configuration)."""
    import os

    centroids = np.load(os.path.join(out_dir, "_meta", "centroids.npy"))
    books = np.load(os.path.join(out_dir, "_meta", "pq_codebooks.npy"))
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    cq = np.argsort(-(qmat @ _normalize(centroids).T), axis=1)[:, :n_probe]
    files, total = plan_ivf_files(out_dir, cq)
    if stats is not None:
        stats["files_read"] = len(files)
        stats["files_total"] = total
    empty = pa.table(
        {"query_idx": pa.array([], pa.int32()), id_col: pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64()), "rank": pa.array([], pa.int32())}
    )
    if not files:
        return empty

    n_sub, n_codes, d_sub = books.shape
    lut = np.stack([
        qmat[:, s * d_sub:(s + 1) * d_sub] @ books[s].T for s in range(n_sub)
    ], axis=1)
    import ray as _ray

    lut_ref = _ray.put(np.ascontiguousarray(lut))

    def adc_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int32()),
                    id_col: pa.array([], pa.int64()),
                    "adc": pa.array([], pa.float64()),
                }
            )
        lt = _resolve_ref(lut_ref)
        arr = batch["pq_code"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        codes = np.frombuffer(arr.buffers()[1], dtype=np.uint8).reshape(
            -1, n_sub
        )[arr.offset:arr.offset + len(arr)]
        scores = _adc_scores(codes, lt)
        n, q = scores.shape
        kk = min(n_cand, n)
        idx = np.argpartition(-scores, kk - 1, axis=0)[:kk]
        qs = np.repeat(np.arange(q, dtype=np.int32), kk)
        rows = idx.T.ravel()
        return pa.table(
            {
                "query_idx": pa.array(qs, pa.int32()),
                id_col: batch[id_col].take(pa.array(rows, pa.int64())),
                "adc": pa.array(scores[rows, np.repeat(np.arange(q), kk)],
                                pa.float64()),
            }
        )

    def cand_topk(group: pa.Table) -> pa.Table:
        sims = group["adc"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:n_cand]
        return group.take(pa.array(order, pa.int64()))

    cands = (
        ray.data.read_parquet(files, columns=[id_col, "pq_code"])
        .map_batches(adc_partial, batch_format="pyarrow")
        .groupby("query_idx")
        .map_groups(cand_topk, batch_format="pyarrow")
        .to_arrow_refs()
    )
    import ray as _ray2

    cand_tables = [t for t in _ray2.get(cands) if t.num_rows]
    if not cand_tables:
        return empty
    cand = pa.concat_tables(cand_tables)
    wanted_ids = np.unique(cand[id_col].to_numpy(zero_copy_only=False))
    wanted_ref = _ray.put(wanted_ids)

    def fetch(batch: pa.Table) -> pa.Table:
        w = _resolve_ref(wanted_ref)
        mask = np.isin(batch[id_col].to_numpy(zero_copy_only=False), w)
        return batch.filter(pa.array(mask))

    fetched = pa.concat_tables(
        _ray2.get(
            ray.data.read_parquet(files, columns=[id_col, emb_col])
            .map_batches(fetch, batch_format="pyarrow")
            .to_arrow_refs()
        )
    )
    # exact re-rank (driver-side: ≤ n_cand × Q candidate rows by contract)
    m = _normalize(_emb_matrix(fetched, emb_col))
    fids = fetched[id_col].to_numpy(zero_copy_only=False)
    pos = {int(v): i for i, v in enumerate(fids)}
    out_q, out_i, out_c, out_r = [], [], [], []
    cq_ids = cand["query_idx"].to_numpy(zero_copy_only=False)
    cd_ids = cand[id_col].to_numpy(zero_copy_only=False)
    for qi in np.unique(cq_ids):
        ids_q = np.unique(cd_ids[cq_ids == qi])
        rows = np.array([pos[int(v)] for v in ids_q], dtype=np.int64)
        sims = m[rows] @ qmat[qi]
        order = np.lexsort((ids_q, -sims))[:k]
        out_q.append(np.full(len(order), qi, np.int32))
        out_i.append(ids_q[order])
        out_c.append(sims[order])
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int32))
    return pa.table(
        {
            "query_idx": pa.array(np.concatenate(out_q), pa.int32()),
            id_col: pa.array(np.concatenate(out_i), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            "rank": pa.array(np.concatenate(out_r), pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# exact all-pairs cosine near-dup (the verifying arm of lsh_cosine_pairs)
# ---------------------------------------------------------------------------


@ray.remote(num_cpus=1)
def _assemble_emb_broadcast(id_col: str, emb_col: str, *tables: pa.Table):
    """Concatenate materialized embedding blocks into the id-sorted
    ``(ids, row-normalized float64 matrix)`` broadcast pair. Runs as a task
    so the matrix is assembled worker-side and lands straight in the object
    store — the driver holds only the ObjectRef (the minhash signature
    broadcast contract, dedup._assemble_sig_broadcast)."""
    id_parts, mat_parts = [], []
    for t in tables:
        if len(t) == 0:
            continue
        id_parts.append(t[id_col].to_numpy(zero_copy_only=False))
        mat_parts.append(_normalize(_emb_matrix(t, emb_col)))
    if not id_parts:
        return (np.empty(0, dtype=np.int64), np.empty((0, 0), dtype=np.float64))
    ids = np.concatenate(id_parts)
    mat = np.concatenate(mat_parts)
    order = np.argsort(ids)
    return ids[order], np.ascontiguousarray(mat[order])


def cosine_neardup_pairs(
    vectors: ray.data.Dataset,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    broadcast_cap_bytes: int = 256 << 20,
    guard_margin: float = 1e-6,
) -> ray.data.Dataset:
    """EXACT embedding-cosine near-dup pairs: every unordered pair with
    cosine ≥ ``threshold``, ids only — the deterministic verifying arm of
    :func:`lsh_cosine_pairs` (which stays the probabilistic scale path,
    exactly as ``ann_brute`` is the verifying arm of the IVF/PQ family).

    Shape: the row-normalized corpus matrix is assembled worker-side and
    broadcast once (``ray.put`` semantics via a task return); each batch
    then computes its rows × matrixᵀ and emits pairs where its id is the
    smaller — every pair surfaces exactly once with no pair-dedup shuffle.
    O(n²/p) flops but streaming and bounded: corpora whose matrix would
    exceed ``broadcast_cap_bytes`` raise loudly with a pointer to the LSH
    arm instead of silently OOMing a worker.

    Hash-safety guard (the reproject_conic contract): any computed cosine
    within ``guard_margin`` of the threshold raises — a numpy-vs-SQL ulp
    divergence could otherwise flip a boundary pair silently.
    """
    mat_ds = vectors.select_columns([id_col, emb_col]).materialize()
    # float32 list → float64 matrix roughly doubles the bytes
    est = mat_ds.size_bytes() * 2
    if est > broadcast_cap_bytes:
        raise ValueError(
            f"cosine_neardup_pairs: corpus matrix ≈{est >> 20} MB exceeds the "
            f"{broadcast_cap_bytes >> 20} MB broadcast cap — use "
            "lsh_cosine_pairs (bucketed, no broadcast) at this scale"
        )
    ref = _assemble_emb_broadcast.remote(
        id_col, emb_col, *mat_ds.to_arrow_refs()
    )

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "left_id": pa.array([], pa.int64()),
            "right_id": pa.array([], pa.int64()),
        })
        if len(batch) == 0:
            return empty
        all_ids, mat = ray.get(ref)
        if len(all_ids) == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = m @ mat.T  # (batch, corpus)
        near = np.abs(sims - threshold) < guard_margin
        if near.any():
            r, c = np.nonzero(near)
            raise ValueError(
                "cosine_neardup_pairs: cosine within "
                f"{guard_margin} of threshold {threshold} for pair "
                f"({ids[r[0]]}, {all_ids[c[0]]}) — hash-unsafe boundary; "
                "adjust the threshold"
            )
        hit = sims >= threshold
        # emit only where this row's id is the SMALLER of the pair
        hit &= ids[:, None] < all_ids[None, :]
        li, ri = np.nonzero(hit)
        return pa.table({
            "left_id": pa.array(ids[li], pa.int64()),
            "right_id": pa.array(all_ids[ri], pa.int64()),
        })

    out = mat_ds.map_batches(pairs, batch_format="pyarrow")
    # pair set ≪ corpus (bounded by the broadcast cap): one block, in-batch
    # sort — Ray's shuffle sort has a multi-second fixed cost this avoids
    return out.repartition(1).map_batches(
        lambda b: b.sort_by([("left_id", "ascending"), ("right_id", "ascending")]),
        batch_format="pyarrow",
    )
