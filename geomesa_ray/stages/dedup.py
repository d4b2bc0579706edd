"""Deduplication operators for large-scale text corpora.

These are first-class engine operators (not in the geo reference, which has
no general dedup — its join-duplication TODO is RelationUtils.scala:37):

* :func:`exact_dedup` — hash-bucketed dedup: per-batch vectorized
  pre-dedup (combiner), shuffle by ``hash % n_buckets`` (O(buckets) group
  calls, not O(distinct keys)), vectorized first-per-key inside each
  bucket via polars' Rust kernels. Collision-safe: the kept row per key is
  decided on the actual key value, the hash only routes the shuffle.
* MinHash + LSH — shingle → minhash signature (vectorized rolling-hash +
  per-permutation segment-min) → banded LSH buckets → candidate pairs
  verified by signature Jaccard. Pairs come back as a DATASET (never
  driver-materialized) deduplicated across bands by a distributed groupby.
* SimHash — 64-bit weighted token fingerprint (RE2 ``\\w+`` tokens,
  seedless FNV-1a token hash — both chosen so the arithmetic is
  bit-reproducible in SQL); near-dups = small Hamming distance, bucketed
  by 16-bit bands.
* n-gram Jaccard — exact pairwise verify kernel.
* :func:`cluster_pairs_dataset` — distributed connected components over
  the pair Dataset (iterated min-label propagation via hash joins);
  :func:`dedup_keep` filters a corpus to cluster representatives with an
  anti-join. Driver-side :func:`cluster_pairs` remains for small pair sets.

All bucketing shuffles move (key, id) ints, never the text payload.
Oversized LSH buckets (> ``max_bucket_rows``) are NOT silently dropped:
they switch from all-pairs (quadratic) to an O(n log n) connectivity-
preserving pass — every row is verified against the bucket's min-id
anchor, and the misses are sorted by signature and verified against their
sorted neighbor (catching duplicate subgroups that differ from the
anchor) — and each such bucket additionally emits a ``left_id = -1``
marker row carrying the bucket size, which the pipeline functions count
and surface via their ``stats`` argument.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from geomesa_ray.stages.encode import hash_strings
from geomesa_ray.stages.shards import default_shards

_MERSENNE = (1 << 61) - 1
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)

# rows above which an LSH bucket switches to the anchor-star pass
DEFAULT_MAX_BUCKET_ROWS = 10_000


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count of a uint64 array."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(
        axis=1, dtype=np.int32
    )


def fnv1a_utf8(arr, max_bytes: int = 64) -> np.ndarray:
    """Vectorized FNV-1a (64-bit) over each string's first ``max_bytes``
    utf-8 bytes. Column-at-a-time over the Arrow string buffer — one numpy
    pass per byte position, not per string. The algorithm (offset basis,
    prime, byte order) is standard FNV-1a so a SQL oracle can reproduce it
    with ``list_reduce`` over the byte list.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr, pa.string())
    arr = arr.cast(pa.string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    starts = offs[:-1]
    lens = np.minimum(offs[1:] - starts, max_bytes)
    h = np.full(len(arr), _FNV_OFFSET, dtype=np.uint64)
    if len(arr) == 0:
        return h
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash design
        for j in range(int(lens.max(initial=0))):
            m = lens > j
            h[m] = (h[m] ^ data[starts[m] + j].astype(np.uint64)) * _FNV_PRIME
    return h


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _first_per_key(table: pa.Table, key_col: str, id_col: str) -> pa.Table:
    """Vectorized min-``id_col`` row per distinct ``key_col`` (polars Rust
    kernels — no per-key Python calls)."""
    import polars as pl

    out = (
        pl.from_arrow(table)
        .sort([key_col, id_col])
        .unique(subset=[key_col], keep="first", maintain_order=True)
        .to_arrow()
    )
    return out.cast(table.schema)


def exact_dedup(ds: ray.data.Dataset, key_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 256) -> ray.data.Dataset:
    """Exact dedup: one row (min ``id_col``) per distinct ``key_col`` value.

    Scale shape: each input batch is pre-deduped locally (combiner) before
    the shuffle, rows are routed by ``hash(key) % n_buckets`` so the
    groupby makes O(n_buckets) group calls — never one per distinct key —
    and the per-bucket dedup is a vectorized sort + unique. ``n_buckets``
    should scale with cluster size (it bounds reduce-side parallelism).
    """

    def local(batch: pa.Table) -> pa.Table:
        batch = _first_per_key(batch, key_col, id_col)
        h = hash_strings(batch[key_col]).astype(np.int64)
        return batch.append_column(
            "__bucket__", pa.array(h % n_buckets, pa.int64())
        )

    def bucket_dedup(group: pa.Table, key_col: str, id_col: str) -> pa.Table:
        return _first_per_key(group, key_col, id_col).drop_columns(["__bucket__"])

    return (
        # whole-block batches: the combiner's dedup ratio collapses on
        # Ray's 1024-row default (CLAUDE.md combiner rule)
        ds.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("__bucket__")
        .map_groups(
            bucket_dedup,
            fn_kwargs={"key_col": key_col, "id_col": id_col},
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# minhash
# ---------------------------------------------------------------------------

def _shingle_hashes(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Base 64-bit hashes of all k-byte shingles, concatenated across docs.

    Returns (hashes, doc_offsets) where doc_offsets[i] is the start of doc
    i's shingles. Vectorized: one rolling polynomial hash over the
    concatenated byte stream, window-crossing positions masked out.
    """
    bufs = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    counts = np.maximum(lens - k + 1, 0)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    if n < k:
        return np.empty(0, np.uint64), offsets
    # polynomial hash of each k-window via prefix products (mod 2^64)
    base = np.uint64(1099511628211)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash design
        pw = np.empty(k, dtype=np.uint64)
        pw[0] = 1
        for i in range(1, k):
            pw[i] = pw[i - 1] * base
        # windowed dot product data[i:i+k] · pw[::-1] — k shifted adds
        h = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            h += data[j : n - k + 1 + j] * pw[k - 1 - j]
    # positions whose window crosses a doc boundary are invalid
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    valid_parts = []
    for d in range(len(bufs)):
        if counts[d] > 0:
            valid_parts.append(h[starts[d] : starts[d] + counts[d]])
    if valid_parts:
        out = np.concatenate(valid_parts)
    else:
        out = np.empty(0, np.uint64)
    # finalize: avalanche mix (splitmix64) for uniformity
    with np.errstate(over="ignore"):
        z = out + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z, offsets


def minhash_signature_batch(texts: list[str], num_perm: int = 128,
                            shingle_k: int = 5, seed: int = 42) -> np.ndarray:
    """(len(texts), num_perm) uint64 minhash signatures, vectorized."""
    hashes, offsets = _shingle_hashes(texts, shingle_k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    n_docs = len(texts)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(hashes) == 0:
        return sig
    nonempty = np.nonzero(np.diff(offsets) > 0)[0]
    starts = offsets[nonempty]
    h61 = hashes % np.uint64(_MERSENNE)
    for p in range(num_perm):
        hp = (a[p] * h61 + b[p]) % np.uint64(_MERSENNE)
        mins = np.minimum.reduceat(hp, starts)
        sig[nonempty, p] = mins
    return sig


def minhash_perm_params(num_perm: int = 128, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) permutation parameters — exposed so the SQL oracle can
    inline the identical constants."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool ``map_batches`` stage: text → (id, band_0..band_{B-1})
    where each band value hashes ``rows`` consecutive signature slots
    (classic LSH banding). Permutation params derived once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 128, bands: int = 16, shingle_k: int = 5,
                 seed: int = 42):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_k = shingle_k
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        # null text hashes like the empty string (real corpora have them)
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        sig = minhash_signature_batch(texts, self.num_perm, self.shingle_k, self.seed)
        out = {self.id_col: batch[self.id_col]}
        # band hash: mix the band's row values into one int64 key
        with np.errstate(over="ignore"):  # uint64 wraparound by design
            for bnd in range(self.bands):
                seg = sig[:, bnd * self.rows : (bnd + 1) * self.rows]
                acc = np.zeros(len(texts), dtype=np.uint64)
                for r in range(self.rows):
                    acc = acc * np.uint64(1099511628211) + seg[:, r]
                out[f"band_{bnd}"] = pa.array(acc.astype(np.int64), pa.int64())
        # keep the full signature for verification (fixed-size binary)
        out["signature"] = pa.array(
            [s.tobytes() for s in sig], pa.binary(self.num_perm * 8)
        )
        return pa.table(out)


_PAIR_SCHEMA = pa.schema(
    [("left_id", pa.int64()), ("right_id", pa.int64()), ("est_jaccard", pa.float64())]
)


def _pair_table(li, ri, js) -> pa.Table:
    return pa.table(
        {
            "left_id": pa.array(li, pa.int64()),
            "right_id": pa.array(ri, pa.int64()),
            "est_jaccard": pa.array(js, pa.float64()),
        }
    )


def _mega_bucket_pass(ids: np.ndarray, sigs: np.ndarray, threshold: float):
    """Connectivity-preserving O(n log n) pass for an oversized bucket:
    anchor-star (all vs min-id row) + sorted-signature adjacency for the
    anchor misses. Returns (li, ri, js) lists."""
    li, ri, js = [], [], []
    anchor = int(np.argmin(ids))
    eq = (sigs == sigs[anchor]).mean(axis=1)
    hit = eq >= threshold
    hit[anchor] = False
    for h in np.nonzero(hit)[0].tolist():
        a, b = ids[anchor], ids[h]
        li.append(min(a, b)); ri.append(max(a, b)); js.append(eq[h])
    # misses: sort by signature bytes, verify sorted neighbors (catches
    # duplicate subgroups that differ from the anchor)
    miss = np.nonzero(~hit)[0]
    miss = miss[miss != anchor]
    if len(miss) >= 2:
        sub = sigs[miss]
        order = np.lexsort(tuple(sub[:, c] for c in range(sub.shape[1] - 1, -1, -1)))
        m_ids, m_sigs = ids[miss][order], sub[order]
        eqn = (m_sigs[1:] == m_sigs[:-1]).mean(axis=1)
        for i in np.nonzero(eqn >= threshold)[0].tolist():
            a, b = m_ids[i], m_ids[i + 1]
            li.append(min(a, b)); ri.append(max(a, b)); js.append(eqn[i])
    return li, ri, js


def _pairs_for_bucket(ids: np.ndarray, sigs: np.ndarray, threshold: float,
                      max_bucket_rows: int, li: list, ri: list, js: list) -> None:
    """Append the verified pairs of ONE LSH bucket to (li, ri, js).
    Buckets above ``max_bucket_rows`` take the anchor-star pass and emit a
    ``left_id = -1`` marker row whose ``right_id`` is the bucket size
    (surfaced by the pipeline — never a silent drop)."""
    if len(ids) > max_bucket_rows:
        mli, mri, mjs = _mega_bucket_pass(ids, sigs, threshold)
        li.extend(mli); ri.extend(mri); js.extend(mjs)
        li.append(-1); ri.append(len(ids)); js.append(0.0)  # marker row
        return
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    for i in range(len(ids) - 1):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        hit = np.nonzero(eq >= threshold)[0]
        for h in hit.tolist():
            li.append(ids[i])
            ri.append(ids[i + 1 + h])
            js.append(eq[h])


def _shard_bucket_pairs(group: pa.Table, id_col: str, threshold: float,
                        num_perm: int, sig_ref=None,
                        max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS) -> pa.Table:
    """Pairs for ALL (band, key) buckets hashed into one shard: the rows
    are sorted by (band, key) vectorized, singleton buckets (the vast
    majority) are dropped in one mask, and only multi-row buckets run the
    per-bucket kernel — O(shards) group calls, never one per distinct key
    (the shape the exact_dedup rework uses; a per-bucket map_groups costs
    ~100 µs × #buckets of pure call overhead).

    Signatures come either from the shuffled rows (``signature`` column) or
    from a broadcast (sorted_ids, sig_matrix) pair when ``sig_ref`` is set
    (the shuffle then carries only ints)."""
    ids_all = group[id_col].to_numpy(zero_copy_only=False)
    if len(ids_all) < 2:
        return _pair_table([], [], [])
    band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = group["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((key, band))
    band, key, ids_all = band[order], key[order], ids_all[order]
    starts = np.nonzero(
        np.concatenate([[True], (band[1:] != band[:-1]) | (key[1:] != key[:-1])])
    )[0]
    ends = np.concatenate([starts[1:], [len(ids_all)]])
    multi = ends - starts >= 2
    if not multi.any():
        return _pair_table([], [], [])
    if sig_ref is not None:
        import ray as _ray

        sorted_ids, sig_matrix = (
            _ray.get(sig_ref) if isinstance(sig_ref, _ray.ObjectRef) else sig_ref
        )
        def sig_of(idx):
            return sig_matrix[np.searchsorted(sorted_ids, ids_all[idx])]
    else:
        blobs = group["signature"].to_pylist()
        blobs = [blobs[i] for i in order]
        def sig_of(idx):
            return np.stack([np.frombuffer(blobs[i], dtype=np.uint64) for i in idx])
    li: list = []; ri: list = []; js: list = []
    for s, e in zip(starts[multi], ends[multi]):
        idx = np.arange(s, e)
        _pairs_for_bucket(ids_all[s:e], sig_of(idx), threshold,
                          max_bucket_rows, li, ri, js)
    return _pair_table(li, ri, js)


def _finalize_pairs(allp: ray.data.Dataset, value_col: str, agg: str,
                    stats: dict | None) -> ray.data.Dataset:
    """Shared pair-pipeline tail: split out mega-bucket marker rows, dedup
    pairs seen in multiple bands with a distributed groupby, restore column
    names, sort. Everything stays a Dataset — nothing lands on the driver.
    The materialize barrier is paid only when ``stats`` is requested (the
    marker count needs a second pass over the pair stream)."""
    if stats is not None:
        allp = allp.materialize()
        markers = allp.map_batches(
            lambda b: b.filter(pc.less(b["left_id"], 0)), batch_format="pyarrow"
        ).materialize()
        stats["mega_buckets"] = markers.count()
        stats["mega_bucket_rows"] = int(
            markers.sum("right_id") or 0
        ) if stats["mega_buckets"] else 0
    pairs = allp.map_batches(
        lambda b: b.filter(pc.greater_equal(b["left_id"], 0)),
        batch_format="pyarrow",
    )
    reduce_fn = np.maximum.reduceat if agg == "max" else np.minimum.reduceat
    val_type = pa.float64() if value_col in ("est_jaccard", "cosine") else pa.int32()

    def merge(batch: pa.Table) -> pa.Table:
        """Vectorized per-batch pair dedup: sort by (left, right), segment
        reduce the value — one tree-merge step (no Ray sort aggregate)."""
        l = batch["left_id"].to_numpy(zero_copy_only=False)
        r = batch["right_id"].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if len(l) == 0:
            return batch
        order = np.lexsort((r, l))
        l, r, v = l[order], r[order], v[order]
        starts = np.nonzero(
            np.concatenate([[True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])])
        )[0]
        return pa.table(
            {
                "left_id": pa.array(l[starts], pa.int64()),
                "right_id": pa.array(r[starts], pa.int64()),
                value_col: pa.array(reduce_fn(v, starts), val_type),
            }
        )

    # tree-merge: the pair set is ≪ corpus-sized; a few vectorized rounds
    # beat Ray's sort-based aggregate (multi-second fixed cost) and the
    # result stays exact because the LAST round sees one block
    ds = pairs.map_batches(
        merge, batch_format="pyarrow", batch_size=4_000_000
    ).materialize()
    rounds = 0
    while ds.num_blocks() > 1 and rounds < 10:
        ds = ds.repartition(max(1, ds.num_blocks() // 8)).map_batches(
            merge, batch_format="pyarrow", batch_size=4_000_000
        ).materialize()
        rounds += 1
    if ds.num_blocks() > 1:
        # gigantic pair set: exact fallback through the shuffle aggregate
        grouped = ds.groupby(["left_id", "right_id"])
        agged = grouped.max(value_col) if agg == "max" else grouped.min(value_col)
        agg_name = f"{agg}({value_col})"
        return agged.map_batches(
            lambda b: b.rename_columns(
                [value_col if c == agg_name else c for c in b.schema.names]
            ).sort_by([("left_id", "ascending"), ("right_id", "ascending")]),
            batch_format="pyarrow",
        )
    return ds


@ray.remote(num_cpus=1)
def _assemble_sig_broadcast(id_col: str, num_perm: int, *tables: pa.Table):
    """Concatenate materialized signature blocks into the id-sorted
    ``(ids, uint64 matrix)`` broadcast pair. Runs as a task so the matrix
    is assembled worker-side and returned straight into the object store;
    the driver never holds it (VERDICT r2 finding 5)."""
    id_parts, sig_parts = [], []
    for t in tables:
        if len(t) == 0:
            continue
        id_parts.append(t[id_col].to_numpy(zero_copy_only=False))
        sig_parts.append(
            np.frombuffer(
                b"".join(t["signature"].to_pylist()), dtype=np.uint64
            ).reshape(-1, num_perm)
        )
    if not id_parts:  # empty / fully-filtered corpus
        return (np.empty(0, dtype=np.int64),
                np.empty((0, num_perm), dtype=np.uint64))
    all_ids = np.concatenate(id_parts)
    mat = np.concatenate(sig_parts)
    order = np.argsort(all_ids)
    return all_ids[order], np.ascontiguousarray(mat[order])


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    concurrency: int = 4,
    broadcast_limit_bytes: int = 512 * 1024 * 1024,
    broadcast_min_bytes: int = 64 * 1024 * 1024,
    max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS,
    stats: dict | None = None,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash-LSH, verified by signature Jaccard
    ≥ ``threshold``. Returns a DATASET of (left_id, right_id, est_jaccard)
    sorted by (left_id, right_id) when the tree-merge converges to one
    block (the normal case); the gigantic-pair-set fallback (> ~4M rows
    per block after merging) is exact and deduplicated but only per-block
    sorted — the pair set never lands on the driver (feed it to
    :func:`cluster_pairs_dataset` / :func:`dedup_keep`, or
    ``write_parquet`` it).

    Signature transport: when the matrix lands between
    ``broadcast_min_bytes`` and ``broadcast_limit_bytes`` it is broadcast
    once and the band shuffle carries ONLY (band, key, id) ints (~16× less
    exchange volume). Below the floor the broadcast's extra
    materialize-and-collect pass costs more than it saves, and above the
    cap it doesn't fit — both carry signatures on the shuffle rows and the
    whole pipeline stays a single streaming pass. Pass a dict as
    ``stats`` to receive ``mega_buckets`` / ``mega_bucket_rows`` counts
    (oversized buckets use the anchor-star pass — see module docstring)."""
    n_docs = ds.count()  # parquet-metadata count for the usual read input
    sig_bytes = n_docs * num_perm * 8
    carry_signature = (
        sig_bytes > broadcast_limit_bytes or sig_bytes < broadcast_min_bytes
    )
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),  # autoscale: a full-size pool can starve upstream reads
    )
    sig_ref = None
    if not carry_signature:
        sigs = sigs.materialize()
        # Build the (ids, matrix) broadcast pair in a REMOTE task fed by the
        # materialized blocks' object refs: the concatenated matrix never
        # transits the driver heap — the driver holds only the ObjectRef and
        # the reduce-side workers read it straight from the object store.
        blk_refs = sigs.select_columns([id_col, "signature"]).to_arrow_refs()
        sig_ref = _assemble_sig_broadcast.remote(id_col, num_perm, *blk_refs)

    if n_shards is None:
        n_shards = default_shards()

    def explode_bands(batch: pa.Table) -> pa.Table:
        """(id, band_0..band_{B-1}, sig) → (shard, band, key, id[, sig])
        rows — ONE shuffle over all bands instead of B pipeline
        executions; ``shard`` routes equal (band, key) buckets together
        with O(n_shards) reduce-side group calls."""
        n = len(batch)
        keys = np.concatenate(
            [batch[f"band_{b}"].to_numpy(zero_copy_only=False) for b in range(bands)]
        )
        band_ids = np.repeat(np.arange(bands, dtype=np.int16), n)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), bands), pa.int64())
        with np.errstate(over="ignore"):
            shard = (
                (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + band_ids.astype(np.uint64)) >> np.uint64(32)
            ) % np.uint64(n_shards)
        cols = {
            "__shard__": pa.array(shard.astype(np.int32), pa.int32()),
            "band": pa.array(band_ids, pa.int16()),
            "key": pa.array(keys, pa.int64()),
            id_col: batch[id_col].take(idx),
        }
        if carry_signature:
            cols["signature"] = batch["signature"].take(idx)
        return pa.table(cols)

    allp = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(
            _shard_bucket_pairs,
            fn_kwargs={
                "id_col": id_col,
                "threshold": threshold,
                "num_perm": num_perm,
                "sig_ref": sig_ref,
                "max_bucket_rows": max_bucket_rows,
            },
            batch_format="pyarrow",
        )
    )
    return _finalize_pairs(allp, "est_jaccard", "max", stats)


# ---------------------------------------------------------------------------
# distributed clustering over a pair Dataset
# ---------------------------------------------------------------------------

def _drop_empty_blocks(ds: ray.data.Dataset, fallback_schema: pa.Schema) -> ray.data.Dataset:
    """Rebuild a dataset without zero-row blocks.

    Ray's hash-shuffle (groupby), sort and repartition stages can emit
    zero-row blocks with an EMPTY schema; ``map_batches`` skips empty
    blocks so they survive every downstream stage, and the join
    aggregator then fails to type them (ArrowInvalid: no match for
    FieldRef on the join key). This pass is metadata-only on the driver —
    block payloads never leave the object store."""
    ds = ds.materialize()
    refs = [
        ref
        for bund in ds.iter_internal_ref_bundles()
        for ref, meta in bund.blocks
        if meta.num_rows
    ]
    if not refs:
        return ray.data.from_arrow(fallback_schema.empty_table())
    return ray.data.from_arrow_refs(refs)


_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def cluster_pairs_dataset(pairs: ray.data.Dataset, *, num_partitions: int | None = None,
                          max_rounds: int = 25,
                          small_graph_rows: int = 5_000_000) -> ray.data.Dataset:
    """Connected components over a (left_id, right_id) pair Dataset →
    Dataset of (node, label) with label = min id of the node's component.

    Two arms, both Dataset-native:

    * pair graphs ≤ ``small_graph_rows`` edges (the common case — the
      near-dup pair set is ≪ corpus-sized) run union-find in ONE remote
      task (O(E·α), bounded memory), avoiding the multi-second fixed cost
      of shuffle rounds;
    * larger graphs use iterated min-label propagation: each round
      hash-joins the static edge list with the current labels and takes
      the per-node min (shuffle moves int pairs only). Near-dup
      components are shallow, so convergence is 2–4 rounds; the label sum
      is monotonically non-increasing and the loop stops at its fixpoint.
    """
    def sym(batch: pa.Table) -> pa.Table:
        l = batch["left_id"].combine_chunks() if isinstance(batch["left_id"], pa.ChunkedArray) else batch["left_id"]
        r = batch["right_id"].combine_chunks() if isinstance(batch["right_id"], pa.ChunkedArray) else batch["right_id"]
        ln = l.to_numpy(zero_copy_only=False)
        rn = r.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([ln, rn]), pa.int64()),
                "nbr": pa.array(np.concatenate([rn, ln]), pa.int64()),
            }
        )

    edges = _drop_empty_blocks(
        pairs.select_columns(["left_id", "right_id"]).map_batches(
            sym, batch_format="pyarrow"
        ),
        pa.schema([("node", pa.int64()), ("nbr", pa.int64())]),
    )
    n_edges = edges.count()
    if 0 < n_edges <= small_graph_rows:
        def unionfind(batch: pa.Table) -> pa.Table:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(
                batch["node"].to_numpy(zero_copy_only=False).tolist(),
                batch["nbr"].to_numpy(zero_copy_only=False).tolist(),
            ):
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            nodes = sorted(parent)
            return pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "label": pa.array([find(x) for x in nodes], pa.int64()),
                }
            )

        return _drop_empty_blocks(
            edges.repartition(1).map_batches(
                unionfind, batch_format="pyarrow", batch_size=None
            ),
            _LABEL_SCHEMA,
        )
    if num_partitions is None:
        # size the join fan-out to the graph: ~50k edges per partition,
        # capped — tiny pair graphs would otherwise pay 16-way shuffle
        # latency per round for empty partitions
        num_partitions = int(min(64, max(2, n_edges // 50_000 + 1)))
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())})
        )

    def initial_label(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        nbr = batch["min(nbr)"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch["node"],
                "label": pa.array(np.minimum(node, nbr), pa.int64()),
            }
        )

    labels = _drop_empty_blocks(
        edges.groupby("node").min("nbr")
        .map_batches(initial_label, batch_format="pyarrow"),
        _LABEL_SCHEMA,
    )
    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        prop = edges.join(
            labels, join_type="inner", num_partitions=num_partitions, on=("node",)
        ).map_batches(
            lambda b: pa.table({"node": b["nbr"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = _drop_empty_blocks(
            labels.union(prop)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda b: b.rename_columns(
                    ["node", "label"]
                ),
                batch_format="pyarrow",
            ),
            _LABEL_SCHEMA,
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_keep(docs: ray.data.Dataset, labels: ray.data.Dataset,
               id_col: str = "doc_id", num_partitions: int = 16,
               broadcast_limit_bytes: int = 64 << 20) -> ray.data.Dataset:
    """Filter ``docs`` to near-dup cluster representatives: drop every row
    whose id carries a label smaller than itself.

    A drop set at most ``broadcast_limit_bytes`` takes a broadcast
    anti-filter (one ``ray.put`` + per-batch ``isin`` — Ray's hash-join
    operator has a multi-second actor-pool fixed cost that dwarfs tiny
    drop sets); a bigger one rides the distributed ``left_anti`` join
    (no driver-side id set at scale)."""
    # _drop_empty_blocks: Ray's join broadcasts each side's schema with the
    # FIRST shuffled block only; a zero-row first block loses the broadcast
    # and untyped empty partitions then fail the Arrow join. drops is small
    # (int ids), so the cleanup materialize is cheap; the docs side streams
    # from its reader and never leads with an empty block.
    drops = _drop_empty_blocks(
        labels.map_batches(
            lambda b: b.filter(pc.less(b["label"], b["node"])).select(["node"]),
            batch_format="pyarrow",
        ),
        pa.schema([("node", pa.int64())]),
    )
    n_drops = drops.count()
    if n_drops == 0:
        return docs  # left_anti with an empty right side is the identity
    if n_drops * 8 <= broadcast_limit_bytes:
        parts = [
            b["node"].to_numpy(zero_copy_only=False)
            for b in drops.iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        drop_ids = np.unique(np.concatenate(parts))
        drop_ref = ray.put(drop_ids)

        def anti(batch: pa.Table) -> pa.Table:
            from geomesa_ray.stages.join import _resolve_broadcast

            ids = batch[id_col].to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, _resolve_broadcast(drop_ref))
            return batch.filter(pa.array(keep))

        return docs.map_batches(anti, batch_format="pyarrow")
    return docs.join(
        drops,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(id_col,),
        right_on=("node",),
    )


def cluster_pairs(pairs: pa.Table, all_ids=None) -> dict[int, int]:
    """Union-find over a verified pair set → {id: cluster_representative}.

    Driver-side convenience for SMALL pair tables (tests, interactive use);
    the scale path is :func:`cluster_pairs_dataset`.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for l, r in zip(pairs["left_id"].to_pylist(), pairs["right_id"].to_pylist()):
        rl, rr = find(l), find(r)
        if rl != rr:
            lo, hi = (rl, rr) if rl < rr else (rr, rl)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def dedup_keep_ids(pairs: pa.Table, all_ids: np.ndarray) -> np.ndarray:
    """Ids to KEEP: cluster representative = min id; singletons kept.
    Driver-side convenience for small pair tables."""
    cl = cluster_pairs(pairs)
    drop = {x for x, rep in cl.items() if rep != x}
    return np.array(sorted(set(all_ids.tolist()) - drop), dtype=np.int64)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_batch(texts, seed: int = 42) -> np.ndarray:
    """64-bit weighted SimHash per text (Charikar): every RE2 ``\\w+``
    token occurrence of the lowercased text votes ±1 per bit of its
    64-bit FNV-1a hash; bit b of the result is set iff the vote sum is
    positive. (Occurrence-summed votes ≡ the count-weighted formulation.)

    Fully vectorized: RE2 split + FNV both run column-at-a-time; the vote
    reduction is a segmented ``np.add.reduceat`` chunked to bound memory.
    Tokenizer (RE2 ASCII ``\\w``) and hash (seedless FNV-1a over ≤64
    bytes) are chosen to be bit-reproducible in the DuckDB oracle;
    ``seed`` is retained for signature compatibility but unused.
    """
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(texts, pa.string())
    arr = arr.cast(pa.string())
    if arr.null_count:  # null text votes like the empty string
        import pyarrow.compute as _pc

        arr = _pc.fill_null(arr, "")
    n_docs = len(arr)
    out = np.zeros(n_docs, dtype=np.uint64)
    if n_docs == 0:
        return out
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), r"\W+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    counts = np.asarray(toks.value_lengths(), dtype=np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    tok_len = np.asarray(pc.binary_length(flat), dtype=np.int64)
    keep = tok_len > 0  # split on \W+ yields boundary empties; drop them
    h = fnv1a_utf8(flat)[keep]
    doc_of = doc_of[keep]
    if len(h) == 0:
        return out
    bitsum = np.zeros((n_docs, 64), dtype=np.int64)
    n_tok = np.bincount(doc_of, minlength=n_docs)
    shift = np.arange(64, dtype=np.uint64)
    chunk = 1 << 18
    for lo in range(0, len(h), chunk):
        hc = h[lo : lo + chunk]
        dc = doc_of[lo : lo + chunk]
        bits = ((hc[:, None] >> shift[None, :]) & np.uint64(1)).astype(np.int64)
        # tokens are doc-ordered: segmented sum within the chunk
        seg = np.nonzero(np.diff(dc, prepend=dc[0] - 1))[0]
        partial = np.add.reduceat(bits, seg, axis=0)
        bitsum[dc[seg]] += partial
    votes_pos = (2 * bitsum) > n_tok[:, None]  # vote sum > 0
    out = (votes_pos.astype(np.uint64) << shift[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


class SimHasher:
    """map_batches stage: (id, simhash, 4×16-bit band keys)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", seed: int = 42):
        self.text_col = text_col
        self.id_col = id_col
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[self.text_col], self.seed)
        out = {
            self.id_col: batch[self.id_col],
            "simhash": pa.array(sh.astype(np.int64), pa.int64()),
        }
        for bnd in range(4):
            out[f"sband_{bnd}"] = pa.array(
                ((sh >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)).astype(np.int32),
                pa.int32(),
            )
        return pa.table(out)


def _simhash_pairs_for_bucket(ids: np.ndarray, sh: np.ndarray, max_hamming: int,
                              max_bucket_rows: int, li: list, ri: list,
                              hd: list) -> None:
    """Append one bucket's Hamming-verified pairs to (li, ri, hd)."""
    if len(ids) > max_bucket_rows:
        # anchor-star + sorted-neighbor pass, plus a marker row (see module
        # docstring — oversized buckets are surfaced, never dropped)
        anchor = int(np.argmin(ids))
        dist = popcount64(sh ^ sh[anchor])
        hit = dist <= max_hamming
        hit[anchor] = False
        for i in np.nonzero(hit)[0].tolist():
            a, b = ids[anchor], ids[i]
            li.append(min(a, b)); ri.append(max(a, b)); hd.append(int(dist[i]))
        miss = np.nonzero(~hit)[0]
        miss = miss[miss != anchor]
        if len(miss) >= 2:
            order = np.argsort(sh[miss], kind="stable")
            m_ids, m_sh = ids[miss][order], sh[miss][order]
            dn = popcount64(m_sh[1:] ^ m_sh[:-1])
            for i in np.nonzero(dn <= max_hamming)[0].tolist():
                a, b = m_ids[i], m_ids[i + 1]
                li.append(min(a, b)); ri.append(max(a, b)); hd.append(int(dn[i]))
        li.append(-1); ri.append(len(ids)); hd.append(0)
        return
    order = np.argsort(ids, kind="stable")
    ids, sh = ids[order], sh[order]
    for i in range(len(ids) - 1):
        dist = popcount64(sh[i + 1 :] ^ sh[i])
        hit = np.nonzero(dist <= max_hamming)[0]
        for h in hit.tolist():
            li.append(ids[i]); ri.append(ids[i + 1 + h]); hd.append(int(dist[h]))


def _shard_simhash_pairs(group: pa.Table, id_col: str, max_hamming: int,
                         max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS) -> pa.Table:
    """All (band, key) buckets of one shard, vectorized segmentation +
    per-multi-bucket kernel (same O(shards) shape as _shard_bucket_pairs)."""
    ids = group[id_col].to_numpy(zero_copy_only=False)
    out_empty = pa.table(
        {
            "left_id": pa.array([], pa.int64()),
            "right_id": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int32()),
        }
    )
    if len(ids) < 2:
        return out_empty
    band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = group["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    sh = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((key, band))
    band, key, ids, sh = band[order], key[order], ids[order], sh[order]
    starts = np.nonzero(
        np.concatenate([[True], (band[1:] != band[:-1]) | (key[1:] != key[:-1])])
    )[0]
    ends = np.concatenate([starts[1:], [len(ids)]])
    li: list = []; ri: list = []; hd: list = []
    for s, e in zip(starts, ends):
        if e - s >= 2:
            _simhash_pairs_for_bucket(ids[s:e], sh[s:e], max_hamming,
                                      max_bucket_rows, li, ri, hd)
    if not li:
        return out_empty
    return pa.table(
        {
            "left_id": pa.array(li, pa.int64()),
            "right_id": pa.array(ri, pa.int64()),
            "hamming": pa.array(hd, pa.int32()),
        }
    )


def simhash_pairs(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  concurrency: int = 4,
                  max_bucket_rows: int = DEFAULT_MAX_BUCKET_ROWS,
                  stats: dict | None = None,
                  n_shards: int | None = None) -> ray.data.Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ k, bucketed by 16-bit bands
    (any pair within Hamming 3 shares at least one of 4 bands exactly).
    Returns a Dataset of (left_id, right_id, hamming) sorted by pair —
    never driver-materialized; ``stats`` surfaces mega-bucket counts."""
    hashed = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, concurrency),  # autoscale: a full-size pool can starve upstream reads
    )

    if n_shards is None:
        n_shards = default_shards()

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        keys = np.concatenate(
            [batch[f"sband_{b}"].to_numpy(zero_copy_only=False) for b in range(4)]
        )
        band_ids = np.repeat(np.arange(4, dtype=np.int16), n)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), 4), pa.int64())
        with np.errstate(over="ignore"):
            shard = (
                (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + band_ids.astype(np.uint64)) >> np.uint64(32)
            ) % np.uint64(n_shards)
        return pa.table(
            {
                "__shard__": pa.array(shard.astype(np.int32), pa.int32()),
                "band": pa.array(band_ids, pa.int16()),
                "key": pa.array(keys.astype(np.int32), pa.int32()),
                id_col: batch[id_col].take(idx),
                "simhash": batch["simhash"].take(idx),
            }
        )

    allp = (
        hashed.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(
            _shard_simhash_pairs,
            fn_kwargs={"id_col": id_col, "max_hamming": max_hamming,
                       "max_bucket_rows": max_bucket_rows},
            batch_format="pyarrow",
        )
    )
    return _finalize_pairs(allp, "hamming", "min", stats)


# ---------------------------------------------------------------------------
# n-gram jaccard (exact verify kernel)
# ---------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact Jaccard similarity of character k-gram sets."""
    sa = {a[i : i + k] for i in range(max(len(a) - k + 1, 0))}
    sb = {b[i : i + k] for i in range(max(len(b) - k + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(ds: ray.data.Dataset, bench,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 8, threshold_hits: int = 1,
                  broadcast_limit_bytes: int = 512 << 20) -> ray.data.Dataset:
    """Benchmark decontamination: per training doc, count k-byte shingle
    positions whose hash appears in the BENCHMARK shingle set — the
    standard pre-training decontamination pass (flag/drop docs that leak
    eval data). Uses the same rolling-hash shingles as MinHash
    (:func:`_shingle_hashes`), so the SQL oracle reuses the mirrored
    shingle CTEs bit-for-bit.

    ``bench`` is a list[str], pyarrow Table/Array, or Dataset of benchmark
    texts. Benchmarks are MB-scale by nature; the DISTINCT hash set is
    broadcast once (``broadcast_limit_bytes`` guards the assumption).

    Emits ``(id, n_shingles, n_hits, contaminated)`` — all integers, so
    hash-verifiable. ``n_hits`` counts positions (not distinct shingles):
    a doc quoting one leaked sentence twice scores twice.
    """
    if isinstance(bench, ray.data.Dataset):
        parts = []
        nbytes = 0
        for b in bench.select_columns([text_col]).iter_batches(batch_format="pyarrow"):
            texts = [t or "" for t in b[text_col].to_pylist()]
            h, _ = _shingle_hashes(texts, k)
            parts.append(np.unique(h))
            nbytes += parts[-1].nbytes
            if nbytes > broadcast_limit_bytes:
                raise ValueError(
                    "benchmark shingle set exceeds broadcast_limit_bytes — "
                    "decontaminate assumes an MB-scale benchmark side"
                )
        bench_hashes = (
            np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        )
    else:
        if isinstance(bench, pa.Table):
            bench = bench[text_col]
        if isinstance(bench, (pa.Array, pa.ChunkedArray)):
            bench = bench.to_pylist()
        h, _ = _shingle_hashes([t or "" for t in bench], k)
        bench_hashes = np.unique(h)
    if bench_hashes.nbytes > broadcast_limit_bytes:
        raise ValueError(
            "benchmark shingle set exceeds broadcast_limit_bytes — "
            "decontaminate assumes an MB-scale benchmark side"
        )
    bench_ref = ray.put(bench_hashes)

    def score(batch: pa.Table) -> pa.Table:
        from geomesa_ray.stages.join import _resolve_broadcast

        bh = _resolve_broadcast(bench_ref)
        texts = [t or "" for t in batch[text_col].to_pylist()]
        hashes, offsets = _shingle_hashes(texts, k)
        n_shingles = np.diff(offsets).astype(np.int64)
        if len(hashes) and len(bh):
            hit = np.isin(hashes, bh)
            cs = np.concatenate([[0], np.cumsum(hit)]).astype(np.int64)
            n_hits = cs[offsets[1:]] - cs[offsets[:-1]]
        else:
            n_hits = np.zeros(len(texts), np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_shingles": pa.array(n_shingles, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(
                    (n_hits >= threshold_hits).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental exact dedup (persisted state)
# ---------------------------------------------------------------------------

def build_dedup_state(docs: ray.data.Dataset, state_dir: str,
                      key_col: str = "text",
                      n_buckets: int = 256) -> int:
    """Persist the corpus's distinct-key set as a bucket-partitioned
    parquet layout (``__bucket__=<b>/``), the state an INCREMENTAL ingest
    dedups against. Distinctness is decided with the same combiner +
    bucketed-shuffle shape as :func:`exact_dedup`; each bucket directory
    holds only its hash range, so the incremental pass reads exactly the
    buckets it routes new keys to. Returns the distinct-key count.

    A pre-existing ``state_dir`` is WIPED first: it has no commit marker,
    so any prior content is either a finished state being rebuilt or a
    dead attempt's partial files — appending next to either would
    double-count keys (same contract as the ingest group dirs)."""
    import os as _os
    import shutil as _shutil

    if _os.path.isdir(state_dir):
        _shutil.rmtree(state_dir)

    def local(batch: pa.Table) -> pa.Table:
        import polars as pl

        keys = (
            pl.from_arrow(batch.select([key_col]))
            .unique(subset=[key_col])
            .to_arrow()
            .cast(pa.schema([pa.field(key_col, pa.string())]))
        )
        h = hash_strings(keys[key_col]).astype(np.int64)
        return keys.append_column(
            "__bucket__", pa.array(h % n_buckets, pa.int64())
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(group)
            .unique(subset=[key_col])
            .sort(key_col)
            .to_arrow()
        )
        return out.cast(group.schema)

    ds = (
        docs.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("__bucket__")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )
    ds.write_parquet(state_dir, partition_cols=["__bucket__"])
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    return sum(
        _pq.ParquetFile(p).metadata.num_rows
        for p in _glob.glob(_os.path.join(state_dir, "**", "*.parquet"),
                            recursive=True)
    )


def exact_dedup_incremental(new_docs: ray.data.Dataset, state_dir: str,
                            key_col: str = "text", id_col: str = "doc_id",
                            n_buckets: int = 256) -> ray.data.Dataset:
    """Incremental exact dedup: keep only rows of ``new_docs`` whose key
    is BOTH unseen in the persisted state (:func:`build_dedup_state`;
    ``n_buckets`` must match) and first (min id) within the new batch.

    Scale shape: the combiner + ``hash(key) % n_buckets`` shuffle of
    :func:`exact_dedup`, then each bucket task reads ONLY its own state
    directory (``__bucket__=<b>/`` — file-level pruning against state
    that may be arbitrarily large) and anti-filters with a vectorized
    ``is_in``. No driver-side key set at any size."""
    import os

    def local(batch: pa.Table) -> pa.Table:
        batch = _first_per_key(batch, key_col, id_col)
        h = hash_strings(batch[key_col]).astype(np.int64)
        return batch.append_column(
            "__bucket__", pa.array(h % n_buckets, pa.int64())
        )

    def bucket_fresh(group: pa.Table) -> pa.Table:
        import glob as _glob

        import pyarrow.parquet as _pq

        out = _first_per_key(group, key_col, id_col)
        b = int(out["__bucket__"][0].as_py()) if len(out) else 0
        files = sorted(
            _glob.glob(os.path.join(state_dir, f"__bucket__={b}", "*.parquet"))
        )
        if files and len(out):
            seen = pa.concat_tables(
                [_pq.read_table(f, columns=[key_col]) for f in files]
            )[key_col]
            if isinstance(seen, pa.ChunkedArray):
                seen = seen.combine_chunks()
            mask = pc.invert(pc.is_in(out[key_col], value_set=seen))
            out = out.filter(pc.fill_null(mask, True))
        return out.drop_columns(["__bucket__"])

    return (
        new_docs.map_batches(local, batch_format="pyarrow")
        .groupby("__bucket__")
        .map_groups(bucket_fresh, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup
# ---------------------------------------------------------------------------
#
# Reference parity: GeoMesa's dedup surface stops at key equality
# (ViewParams / returnSft dedup, geomesa-index-api); the n-gram Jaccard
# operator is part of this repo's LLM-corpus extension wave. Unlike
# minhash_lsh_pairs (an ESTIMATE of Jaccard via banded signatures), this is
# the exact verifying arm: every pair of documents sharing at least one
# word n-gram is scored with its true |A∩B| / |A∪B| over distinct shingles.
# Candidate generation is the classic inverted-index self-join — shingle →
# owning docs — sharded by shingle hash so one Ray group call handles ~1/S
# of the index, segments vectorized (lexsort + boundary mask) exactly like
# _shard_bucket_pairs. Output counts are integers, so the DuckDB oracle
# (a self-join on the shingle string) hash-matches bit-for-bit.


def _jaccard_shingle_stage(batch: pa.Table, text_col: str, id_col: str,
                           n: int, shards: int) -> pa.Table:
    """(doc, text) → distinct (doc_id, shingle, doc_n, shard) rows.

    Fully vectorized: Arrow RE2 split → flatten with parent indices →
    empty-token drop → windowed take + binary_join_element_wise →
    Arrow group-distinct. ``doc_n`` (the doc's distinct-shingle count) rides
    every row so the pair stage never needs a second lookup table. Docs with
    fewer than ``n`` words emit nothing (they cannot pair)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    ndocs = len(ids)
    if ndocs == 0:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "s": pa.array([], pa.string()),
            "doc_n": pa.array([], pa.int64()),
            "shard": pa.array([], pa.int64()),
        })
    words = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), r"\W+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    # flatten() compacts to the slice; rebase offsets so the two agree even
    # if a future caller hands a sliced ListArray (offset-carrying buffers)
    offs = words.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    counts = np.diff(offs)
    parent = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    parent = parent[nonempty]
    m = np.bincount(parent, minlength=ndocs)  # words per doc
    k = np.maximum(m - (n - 1), 0)            # shingles per doc
    total = int(k.sum())
    if total == 0:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "s": pa.array([], pa.string()),
            "doc_n": pa.array([], pa.int64()),
            "shard": pa.array([], pa.int64()),
        })
    new_offs = np.concatenate([[0], np.cumsum(m)])[:-1]
    csum_k = np.cumsum(k)
    starts = (np.repeat(new_offs, k)
              + np.arange(total, dtype=np.int64)
              - np.repeat(csum_k - k, k))
    cols = [pc.take(flat, pa.array(starts + j)) for j in range(n)]
    sh = pc.binary_join_element_wise(*cols, " ")
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), k)
    t = pa.table({
        id_col: pa.array(ids[doc_of], pa.int64()),
        "s": sh,
    })
    # Arrow C++ group-distinct, then per-doc distinct counts
    t = pa.TableGroupBy(t, [id_col, "s"]).aggregate([]).combine_chunks()
    cnt = pa.TableGroupBy(t.select([id_col]), [id_col]).aggregate([([], "count_all")])
    cd = cnt[id_col].to_numpy(zero_copy_only=False)
    cn = cnt["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(cd)
    cd, cn = cd[order], cn[order]
    did = t[id_col].to_numpy(zero_copy_only=False)
    doc_n = cn[np.searchsorted(cd, did)]
    shard = (fnv1a_utf8(t["s"]) % np.uint64(shards)).astype(np.int64)
    return pa.table({
        id_col: t[id_col],
        "s": t["s"],
        "doc_n": pa.array(doc_n, pa.int64()),
        "shard": pa.array(shard, pa.int64()),
    })


def _jaccard_shard_pairs(group: pa.Table, id_col: str,
                         max_df: int | None) -> pa.Table:
    """One shard of the inverted index → candidate pair rows with a unit
    ``inter`` count. Sorted by shingle (Arrow C++ sort), segments found with
    one vectorized boundary mask; only multi-doc segments run the tiny
    per-segment pair loop. Segments wider than ``max_df`` (stop-shingles)
    emit a loud ``left_id = -1`` marker row instead of O(df²) pairs."""
    if len(group) < 2:
        return _jaccard_pair_table([], [], [], [], [])
    group = group.sort_by([("s", "ascending")]).combine_chunks()
    s = group["s"].combine_chunks() if isinstance(group["s"], pa.ChunkedArray) else group["s"]
    ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dn = group["doc_n"].to_numpy(zero_copy_only=False).astype(np.int64)
    neq = pc.not_equal(s.slice(1), s.slice(0, len(s) - 1)).to_numpy(
        zero_copy_only=False)
    starts = np.nonzero(np.concatenate([[True], neq]))[0]
    seg_len = np.diff(np.concatenate([starts, [len(s)]]))
    stop = (seg_len > max_df) if max_df is not None \
        else np.zeros(len(starts), dtype=bool)
    # fully vectorized all-pairs expansion: re-sort so ids ascend WITHIN
    # each shingle segment (seg_of is the primary key and already sorted,
    # so lexsort leaves segment boundaries in place), then each element
    # pairs with every earlier element of its segment — `loc` pairs each
    seg_of = np.repeat(np.arange(len(starts)), seg_len)
    order = np.lexsort((ids, seg_of))
    ids2, dn2 = ids[order], dn[order]
    elem_start = np.repeat(starts, seg_len)
    loc = np.arange(len(ids2)) - elem_start
    cnt = np.where(stop[seg_of] | (seg_len[seg_of] < 2), 0, loc)
    m = int(cnt.sum())
    if m:
        right_idx = np.repeat(np.arange(len(ids2)), cnt)
        cum = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=cum[1:])
        left_idx = (np.arange(m) - np.repeat(cum, cnt)
                    + np.repeat(elem_start, cnt))
        li = ids2[left_idx]
        ri = ids2[right_idx]
        ln = dn2[left_idx]
        rn = dn2[right_idx]
        # in-shard pair aggregation: each surviving pair leaves this shard
        # as ONE row (inter = shared shingles in this shard), so the merge
        # tree moves O(distinct pairs × shards), not O(Σ df²) rows
        o2 = np.lexsort((ri, li))
        li, ri, ln, rn = li[o2], ri[o2], ln[o2], rn[o2]
        b = np.nonzero(np.concatenate(
            [[True], (li[1:] != li[:-1]) | (ri[1:] != ri[:-1])]
        ))[0]
        inter = np.diff(np.concatenate([b, [m]]))
        li, ri, ln, rn = li[b], ri[b], ln[b], rn[b]
    else:
        li = ri = ln = rn = inter = np.empty(0, dtype=np.int64)
    if stop.any():
        # loud stop-shingle marker rows (left_id = -1, right_id = df)
        li = np.concatenate([li, np.full(int(stop.sum()), -1, np.int64)])
        ri = np.concatenate([ri, seg_len[stop]])
        z = np.zeros(int(stop.sum()), dtype=np.int64)
        ln = np.concatenate([ln, z])
        rn = np.concatenate([rn, z])
        inter = np.concatenate([inter, z])
    return _jaccard_pair_table(li, ri, ln, rn, inter)


def _jaccard_pair_table(li, ri, ln, rn, iv) -> pa.Table:
    return pa.table({
        "left_id": pa.array(li, pa.int64()),
        "right_id": pa.array(ri, pa.int64()),
        "left_n": pa.array(ln, pa.int64()),
        "right_n": pa.array(rn, pa.int64()),
        "inter": pa.array(iv, pa.int64()),
    })


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    shards: int = 64,
    max_df: int | None = None,
    stats: dict | None = None,
) -> ray.data.Dataset:
    """Exact word n-gram Jaccard near-duplicate pairs.

    ``(left_id, right_id, inter, union_cnt)`` for every unordered doc pair
    whose distinct-shingle Jaccard ≥ ``threshold`` — all-integer output, so
    the SQL oracle (self-join on the shingle string) matches bit-for-bit.
    The threshold compare is exact rational arithmetic
    (``inter * q >= p * union``), never a float ratio.

    Scale shape: two bounded shuffles (O(shards) group calls each) —
    ``hash(shingle) % shards`` builds the inverted index and generates
    per-shard-aggregated candidate rows, then ``left_id % shards``
    completes the pair sums in one vectorized reduction. ``max_df`` caps
    stop-shingle segments with loud marker rows surfaced via ``stats`` —
    the same contract as minhash mega-buckets; the EXACT (uncapped) arm's
    candidate volume is inherently Σ C(df,2), so run it capped at corpus
    scale (see q_jaccard_pairs_capped)."""
    from fractions import Fraction

    frac = Fraction(threshold)
    p, q = frac.numerator, frac.denominator

    exploded = ds.map_batches(
        _jaccard_shingle_stage, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col,
                   "n": n, "shards": shards},
    )
    pairs = exploded.groupby("shard").map_groups(
        _jaccard_shard_pairs, batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "max_df": max_df},
    )
    if stats is not None:
        pairs = pairs.materialize()
        markers = pairs.map_batches(
            lambda b: b.filter(pc.less(b["left_id"], 0)), batch_format="pyarrow"
        ).materialize()
        stats["stop_shingles"] = markers.count()
        stats["stop_shingle_rows"] = int(
            markers.sum("right_id") or 0) if stats["stop_shingles"] else 0
        pairs = pairs.map_batches(
            lambda b: b.filter(pc.greater_equal(b["left_id"], 0)),
            batch_format="pyarrow",
        )

    def reduce_pairs(batch: pa.Table) -> pa.Table:
        l = batch["left_id"].to_numpy(zero_copy_only=False)
        if len(l) == 0:
            return batch
        r = batch["right_id"].to_numpy(zero_copy_only=False)
        ln = batch["left_n"].to_numpy(zero_copy_only=False)
        rn = batch["right_n"].to_numpy(zero_copy_only=False)
        iv = batch["inter"].to_numpy(zero_copy_only=False)
        order = np.lexsort((r, l))
        l, r, ln, rn, iv = l[order], r[order], ln[order], rn[order], iv[order]
        starts = np.nonzero(
            np.concatenate([[True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])])
        )[0]
        return pa.table({
            "left_id": pa.array(l[starts], pa.int64()),
            "right_id": pa.array(r[starts], pa.int64()),
            "left_n": pa.array(ln[starts], pa.int64()),
            "right_n": pa.array(rn[starts], pa.int64()),
            "inter": pa.array(np.add.reduceat(iv, starts), pa.int64()),
        })

    # ONE bounded shuffle completes the pair aggregation: a pair's rows
    # all carry the same left_id, so routing by left_id % shards puts
    # every partial of a pair in one shard and a single vectorized
    # reduction finishes it. (A tree merge is wrong here: partials of the
    # SAME pair surface in up to `shards` different shard outputs, so
    # tree rounds barely collapse rows while re-shipping the full volume
    # each round — measured 133.6M candidate rows at 10× scale took the
    # tree minutes vs ~one plasma pass for this shuffle.)
    def route(batch: pa.Table) -> pa.Table:
        l = batch["left_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pshard", pa.array((l % shards).astype(np.int64), pa.int64())
        )

    merged = (
        pairs.map_batches(route, batch_format="pyarrow")
        .groupby("pshard")
        .map_groups(
            lambda g: reduce_pairs(g.drop_columns(["pshard"])),
            batch_format="pyarrow",
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        iv = batch["inter"].to_numpy(zero_copy_only=False)
        un = (batch["left_n"].to_numpy(zero_copy_only=False)
              + batch["right_n"].to_numpy(zero_copy_only=False) - iv)
        keep = iv * q >= p * un
        out = pa.table({
            "left_id": batch["left_id"],
            "right_id": batch["right_id"],
            "inter": batch["inter"],
            "union_cnt": pa.array(un, pa.int64()),
        }).filter(pa.array(keep))
        return out.sort_by([("left_id", "ascending"), ("right_id", "ascending")])

    return merged.map_batches(finish, batch_format="pyarrow")
