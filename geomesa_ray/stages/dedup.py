"""Deduplication operators for large-scale text corpora.

These are first-class engine operators (not in the geo reference, which has
no general dedup — its join-duplication TODO is RelationUtils.scala:37):

* :func:`exact_dedup` — hash-partition by content key, keep the min-id row
  per distinct value (collision-safe: groups by 64-bit hash, compares the
  actual value inside the group).
* MinHash + LSH — shingle → minhash signature (vectorized rolling-hash +
  per-permutation segment-min) → banded LSH buckets → candidate pairs
  verified by signature Jaccard. Near-dup pairs come back deterministic.
* SimHash — 64-bit weighted token fingerprint; near-dups = small Hamming
  distance, bucketed by 16-bit bands.
* n-gram Jaccard — exact pairwise verify kernel.
* union-find clustering of the (small) verified pair set → keep list.

All bucketing shuffles move (key, id) ints, never the text payload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from geomesa_ray.stages.encode import hash_strings

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _dedup_group(group: pa.Table, key_col: str, id_col: str) -> pa.Table:
    """Within one hash bucket: keep the min-id row per distinct key value."""
    import pandas as pd

    ids = group[id_col].to_numpy(zero_copy_only=False)
    keys = group[key_col].to_pylist()
    best: dict = {}
    for pos, (k, i) in enumerate(zip(keys, ids.tolist())):
        cur = best.get(k)
        if cur is None or i < ids[cur]:
            best[k] = pos
    take = sorted(best.values())
    return group.take(pa.array(take, pa.int64())).drop_columns(["__key_hash__"])


def exact_dedup(ds: ray.data.Dataset, key_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact dedup: one row (min ``id_col``) per distinct ``key_col`` value."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch[key_col]).astype(np.int64)
        return batch.append_column("__key_hash__", pa.array(h, pa.int64()))

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__key_hash__")
        .map_groups(
            _dedup_group,
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
        texts = batch[self.text_col].to_pylist()
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


def _bucket_pairs(group: pa.Table, id_col: str, threshold: float,
                  num_perm: int, sig_ref=None) -> pa.Table:
    """All id pairs in one LSH bucket whose signature-Jaccard ≥ threshold.

    Signatures come either from the shuffled rows (``signature`` column) or
    from a broadcast (sorted_ids, sig_matrix) pair when ``sig_ref`` is set
    (the shuffle then carries only ints)."""
    ids = group[id_col].to_numpy(zero_copy_only=False)
    empty = pa.table(
        {
            "left_id": pa.array([], pa.int64()),
            "right_id": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )
    if len(ids) < 2 or len(ids) > 10_000:  # degenerate mega-bucket guard
        return empty
    if sig_ref is not None:
        import ray as _ray

        sorted_ids, sig_matrix = (
            _ray.get(sig_ref) if isinstance(sig_ref, _ray.ObjectRef) else sig_ref
        )
        pos = np.searchsorted(sorted_ids, ids)
        sigs = sig_matrix[pos]
    else:
        sigs = np.stack(
            [np.frombuffer(s, dtype=np.uint64) for s in group["signature"].to_pylist()]
        )
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    li, ri, js = [], [], []
    for i in range(len(ids) - 1):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        hit = np.nonzero(eq >= threshold)[0]
        for h in hit.tolist():
            li.append(ids[i])
            ri.append(ids[i + 1 + h])
            js.append(eq[h])
    if not li:
        return empty
    return pa.table(
        {
            "left_id": pa.array(li, pa.int64()),
            "right_id": pa.array(ri, pa.int64()),
            "est_jaccard": pa.array(js, pa.float64()),
        }
    )


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
) -> pa.Table:
    """Near-duplicate candidate pairs via MinHash-LSH, verified by
    signature Jaccard ≥ ``threshold``. Returns a deduplicated driver-side
    pair table sorted by (left_id, right_id).

    When the signature matrix fits ``broadcast_limit_bytes`` it is
    broadcast once and the band shuffle carries ONLY (band, key, id) ints
    (~16× less exchange volume); above the cap, signatures ride the
    shuffle rows instead."""
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
    ).materialize()

    n_docs = sigs.count()
    sig_ref = None
    carry_signature = n_docs * num_perm * 8 > broadcast_limit_bytes
    if not carry_signature:
        id_parts, sig_parts = [], []
        for b in sigs.select_columns([id_col, "signature"]).iter_batches(
            batch_format="pyarrow"
        ):
            id_parts.append(b[id_col].to_numpy(zero_copy_only=False))
            sig_parts.append(
                np.frombuffer(b"".join(b["signature"].to_pylist()), dtype=np.uint64
                              ).reshape(-1, num_perm)
            )
        all_ids = np.concatenate(id_parts)
        mat = np.concatenate(sig_parts)
        order = np.argsort(all_ids)
        sig_ref = ray.put((all_ids[order], np.ascontiguousarray(mat[order])))

    def explode_bands(batch: pa.Table) -> pa.Table:
        """(id, band_0..band_{B-1}, sig) → (band, key, id[, sig]) rows —
        ONE shuffle over all bands instead of B pipeline executions."""
        n = len(batch)
        keys = np.concatenate(
            [batch[f"band_{b}"].to_numpy(zero_copy_only=False) for b in range(bands)]
        )
        band_ids = np.repeat(np.arange(bands, dtype=np.int16), n)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), bands), pa.int64())
        cols = {
            "band": pa.array(band_ids, pa.int16()),
            "key": pa.array(keys, pa.int64()),
            id_col: batch[id_col].take(idx),
        }
        if carry_signature:
            cols["signature"] = batch["signature"].take(idx)
        return pa.table(cols)

    allp = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(
            _bucket_pairs,
            fn_kwargs={
                "id_col": id_col,
                "threshold": threshold,
                "num_perm": num_perm,
                "sig_ref": sig_ref,
            },
            batch_format="pyarrow",
        )
    )
    df = allp.to_pandas()
    if len(df) == 0:
        return pa.Table.from_pandas(df, preserve_index=False)
    # dedup pairs found in multiple bands (keep max estimate, then sort)
    df = df.groupby(["left_id", "right_id"], as_index=False)["est_jaccard"].max()
    df = df.sort_values(["left_id", "right_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def cluster_pairs(pairs: pa.Table, all_ids=None) -> dict[int, int]:
    """Union-find over a verified pair set → {id: cluster_representative}.

    The pair set is small (near-dup pairs, not the corpus); runs driver-side
    like the reference's client-side reducers.
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
    """Ids to KEEP: cluster representative = min id; singletons kept."""
    cl = cluster_pairs(pairs)
    drop = {x for x, rep in cl.items() if rep != x}
    return np.array(sorted(set(all_ids.tolist()) - drop), dtype=np.int64)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_batch(texts: list[str], seed: int = 42) -> np.ndarray:
    """64-bit weighted SimHash per text (Charikar): each distinct \\w+ token
    votes with its term count, so documents sharing a vocabulary but with
    different word multisets still separate (the unweighted variant
    collapses same-vocab corpora into one Hamming ball)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    import re

    tok = re.compile(r"\w+")
    for i, t in enumerate(texts):
        toks = tok.findall(t.lower())
        if not toks:
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        hs = hash_strings(uniq.tolist(), seed=seed)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        signed = 2 * bits.astype(np.int64) - 1  # ±1 per bit
        votes = (signed * counts[:, None]).sum(axis=0)  # (64,)
        word = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            word |= np.uint64(1) << np.uint64(b)
        out[i] = word
    return out


class SimHasher:
    """map_batches stage: (id, simhash, 4×16-bit band keys)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", seed: int = 42):
        self.text_col = text_col
        self.id_col = id_col
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[self.text_col].to_pylist(), self.seed)
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


def _simhash_bucket_pairs(group: pa.Table, id_col: str, max_hamming: int) -> pa.Table:
    ids = group[id_col].to_numpy(zero_copy_only=False)
    empty = pa.table(
        {
            "left_id": pa.array([], pa.int64()),
            "right_id": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int32()),
        }
    )
    if len(ids) < 2 or len(ids) > 10_000:
        return empty
    sh = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(ids, kind="stable")
    ids, sh = ids[order], sh[order]
    li, ri, hd = [], [], []
    for i in range(len(ids) - 1):
        x = sh[i + 1 :] ^ sh[i]
        dist = np.array([bin(int(v)).count("1") for v in x], dtype=np.int32)
        hit = np.nonzero(dist <= max_hamming)[0]
        for h in hit.tolist():
            li.append(ids[i]); ri.append(ids[i + 1 + h]); hd.append(dist[h])
    if not li:
        return empty
    return pa.table(
        {
            "left_id": pa.array(li, pa.int64()),
            "right_id": pa.array(ri, pa.int64()),
            "hamming": pa.array(hd, pa.int32()),
        }
    )


def simhash_pairs(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  concurrency: int = 4) -> pa.Table:
    """Near-dup pairs with Hamming(simhash) ≤ k, bucketed by 16-bit bands
    (any pair within Hamming 3 shares at least one of 4 bands exactly)."""
    hashed = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, concurrency),  # autoscale: a full-size pool can starve upstream reads
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        keys = np.concatenate(
            [batch[f"sband_{b}"].to_numpy(zero_copy_only=False) for b in range(4)]
        )
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), 4), pa.int64())
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(4, dtype=np.int16), n), pa.int16()),
                "key": pa.array(keys.astype(np.int32), pa.int32()),
                id_col: batch[id_col].take(idx),
                "simhash": batch["simhash"].take(idx),
            }
        )

    allp = (
        hashed.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(
            _simhash_bucket_pairs,
            fn_kwargs={"id_col": id_col, "max_hamming": max_hamming},
            batch_format="pyarrow",
        )
    )
    df = allp.to_pandas()
    if len(df) == 0:
        return pa.Table.from_pandas(df, preserve_index=False)
    df = df.groupby(["left_id", "right_id"], as_index=False)["hamming"].min()
    df = df.sort_values(["left_id", "right_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


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
