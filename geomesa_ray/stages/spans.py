"""Exact duplicated-span detection over a document corpus (the
ExactSubstr family: Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022 — published method, re-expressed
Ray-Data-first).

A *window* is ``k`` consecutive ``\\w+`` tokens (the ASCII token kernel
shared with pack_sequences/chunk_corpus so the DuckDB oracle is exact).
A window is *duplicated* when its exact k-token gram occurs ≥ 2 times
anywhere in the corpus (same doc included). Overlapping/adjacent
duplicated windows merge into maximal *spans* per document.

Scale shape (the suffix-array role, shuffled instead of sorted):

1. **hash-count pass** — one map over the corpus computes a 64-bit
   polynomial rolling hash per window (token hashes × wrapping powers;
   splitmix64 finalizer); a per-block combiner (``np.unique`` + counts)
   collapses repeats before ONE bounded ``h % n_shards`` shuffle sums
   counts per shard and keeps hashes seen ≥ 2 times. Only 16 B/window
   partials move — never gram strings.
2. **exact-confirm pass** — the (small) duplicated-hash set broadcasts
   (``ray.put``, capped, loud on overflow); a second map re-extracts the
   gram STRING only for candidate windows and one bounded shuffle groups
   candidates by hash so each shard confirms true string counts ≥ 2 with
   ``np.unique`` — hash collisions can never fabricate or merge a span,
   the hash only routes and prunes.
3. **per-doc merge** — confirmed (doc, pos) pairs plus one totals row
   per doc re-shuffle by doc shard; each shard lexsorts, splits islands
   with a boundary mask (``pos > prev + k`` breaks) and reduces spans /
   covered tokens with ``reduceat`` — no per-key ``map_groups``
   (CLAUDE.md shard rule).

Everything emitted is an exact integer (or the gram-derived span
bounds), so the DuckDB oracle hash-matches bit-for-bit.

Reference parity note: the reference has no span dedup; this is one of
the beyond-reference LLM-pipeline operators the build plan requires
(SURVEY.md §2 "training-data ops"), sharing its token kernel with
geomesa-convert's string transforms analog (stages/textstats.py).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray

from geomesa_ray.stages.corpus import ASCII_TOKEN_RE, _splitmix64
from geomesa_ray.stages.encode import hash_strings
from geomesa_ray.stages.join import _resolve_broadcast
from geomesa_ray.stages.shards import default_shards

# odd multiplier for the wrapping polynomial window hash
_POLY_B = np.uint64(0x9E3779B97F4A7C15)


def _tokenize(texts) -> tuple[pl.Series, np.ndarray]:
    """(list-of-token series, per-doc token counts) for a text column."""
    toks = (
        pl.from_arrow(pa.table({"t": texts}))["t"]
        .fill_null("")
        .str.extract_all(ASCII_TOKEN_RE)
    )
    nt = toks.list.len().to_numpy().astype(np.int64)
    return toks, nt


def _window_hashes(toks: pl.Series, nt: np.ndarray, k: int):
    """Vectorized rolling window hashes for every k-token window.

    Returns (h, doc_idx, pos): uint64 window hash, local doc index and
    0-based token position, concatenated across the batch's docs.
    Windows never cross doc boundaries.
    """
    nw = np.maximum(nt - k + 1, 0)
    total = int(nw.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z.view(np.uint64), z, z
    flat = toks.explode().drop_nulls()
    th = hash_strings(flat.to_arrow())
    doc_start = np.concatenate([[0], np.cumsum(nt)[:-1]])
    doc_idx = np.repeat(np.arange(len(nt), dtype=np.int64), nw)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(nw) - nw, nw
    )
    start = doc_start[doc_idx] + pos
    h = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the design
        p = np.uint64(1)
        for j in range(k - 1, -1, -1):
            h += th[start + j] * p
            p = p * _POLY_B
    return _splitmix64(h), doc_idx, pos


def _gram_strings(toks: pl.Series, nt: np.ndarray, doc_idx: np.ndarray,
                  pos: np.ndarray, k: int) -> pa.Array:
    """Exact k-token gram strings for selected (doc, pos) windows.

    Built from the FLAT exploded token array with k gathers +
    ``concat_str`` — O(windows × k). Gathering each window's whole
    per-doc token list first would be O(windows × doc_len): a 20k-token
    doc duplicated once makes every window a candidate and materializes
    ~3 GB in one task (review finding, round 5).
    """
    if len(doc_idx) == 0:
        return pa.array([], pa.string())
    flat = toks.explode().drop_nulls()
    doc_start = np.concatenate([[0], np.cumsum(nt)[:-1]])
    starts = doc_start[doc_idx] + pos
    cols = {
        f"t{j}": flat.gather(starts + j) for j in range(k)
    }
    out = pl.DataFrame(cols).select(
        pl.concat_str([pl.col(f"t{j}") for j in range(k)],
                      separator=" ").alias("gram")
    )["gram"]
    return out.to_arrow().cast(pa.string())


def _isin_sorted(h: np.ndarray, cand: np.ndarray) -> np.ndarray:
    if len(cand) == 0 or len(h) == 0:
        return np.zeros(len(h), dtype=bool)
    idx = np.searchsorted(cand, h)
    idx = np.minimum(idx, len(cand) - 1)
    return cand[idx] == h


def _candidate_hashes(ds, k: int, text_col: str, n_shards: int,
                      max_candidate_bytes: int) -> np.ndarray:
    """Pass 1: sorted uint64 window hashes seen ≥ 2 times corpus-wide.

    16 B/window partials (per-block ``np.unique`` combiner) through one
    bounded ``h % n_shards`` shuffle; the result is output-sized (only
    duplicated hashes) and broadcast-capped with a loud remediation.
    """

    def hash_partial(batch: pa.Table) -> pa.Table:
        toks, nt = _tokenize(batch[text_col])
        h, _, _ = _window_hashes(toks, nt, k)
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(uh.view(np.int64), pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            "__shard__": pa.array(
                (uh % np.uint64(n_shards)).astype(np.int64), pa.int64()
            ),
        })

    def count_dups(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        if len(h) == 0:  # empty shuffle blocks (CLAUDE.md rule)
            return pa.table({"h": pa.array([], pa.int64())})
        order = np.argsort(h, kind="stable")
        h, cnt = h[order], cnt[order]
        starts = np.nonzero(np.concatenate([[True], h[1:] != h[:-1]]))[0]
        totals = np.add.reduceat(cnt, starts)
        return pa.table({"h": pa.array(h[starts][totals >= 2], pa.int64())})

    cand_batches = list(
        ds.map_batches(hash_partial, batch_format="pyarrow",
                       batch_size=None)
        .groupby("__shard__")
        .map_groups(count_dups, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    if cand_batches:
        cand_tbl = pa.concat_tables(cand_batches)
        cand = np.sort(
            cand_tbl["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        )
    else:  # clean corpus: no duplicated window hash anywhere
        cand = np.zeros(0, dtype=np.uint64)
    if cand.nbytes > max_candidate_bytes:
        raise ValueError(
            f"duplicated_spans: {len(cand)} duplicated window hashes "
            f"({cand.nbytes >> 20} MiB) exceed the broadcast cap "
            f"({max_candidate_bytes >> 20} MiB) — raise k (longer spans "
            "dedupe less) or max_candidate_bytes, or pre-dedup the "
            "corpus (exact_dedup) first"
        )
    return cand


def duplicated_spans(
    ds: ray.data.Dataset,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = None,
    max_candidate_bytes: int = 64 << 20,
    output: str = "stats",
) -> ray.data.Dataset:
    """Detect exact duplicated k-token spans corpus-wide.

    ``output="stats"`` → one row per doc: (id, total_windows,
    dup_windows, span_count, dup_tokens); docs with no duplicated
    windows report zeros. ``output="spans"`` → one row per merged span:
    (id, span_start, span_end) in token positions (end exclusive);
    adjacent windows (``pos == prev + k``) merge. ``output="clean"`` →
    ExactSubstr removal: one row per doc (id, text_clean, n_tokens,
    n_removed) with EVERY occurrence of a duplicated span dropped and
    the remaining tokens re-joined with single spaces (a token-kernel
    rebuild — inter-token whitespace/punctuation is normalized away,
    stated contract, mirrored exactly by the SQL oracle). In clean mode
    the doc text rides the doc-shard route, so text moves exactly twice
    (the chunk_corpus budget).
    """
    if output not in ("stats", "spans", "clean"):
        raise ValueError(f"unknown output mode {output!r}")
    if n_shards is None:
        n_shards = default_shards()
    cand_ref = ray.put(_candidate_hashes(
        ds, k, text_col, n_shards, max_candidate_bytes
    ))

    # ---- pass 2: exact gram confirmation + per-doc totals ----
    def extract_cands(batch: pa.Table) -> pa.Table:
        cand_arr = _resolve_broadcast(cand_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks, nt = _tokenize(batch[text_col])
        h, doc_idx, pos = _window_hashes(toks, nt, k)
        m = _isin_sorted(h, cand_arr)
        doc_idx, pos, h = doc_idx[m], pos[m], h[m]
        grams = _gram_strings(toks, nt, doc_idx, pos, k)
        tw = np.maximum(nt - k + 1, 0)
        return pa.table({
            id_col: pa.array(
                np.concatenate([ids[doc_idx], ids]), pa.int64()
            ),
            "pos": pa.array(
                np.concatenate([pos, np.full(len(ids), -1)]), pa.int64()
            ),
            "tw": pa.array(
                np.concatenate([np.zeros(len(pos), np.int64), tw]),
                pa.int64(),
            ),
            "gram": pa.concat_arrays([
                grams.combine_chunks() if isinstance(grams, pa.ChunkedArray)
                else grams,
                # clean mode: the doc row carries its text to the doc
                # shard; stats/spans move no text at all
                (pc.fill_null(batch[text_col], "").combine_chunks()
                 .cast(pa.string())
                 if output == "clean"
                 else pa.array([""] * len(ids), pa.string())),
            ]),
            "__shard__": pa.array(np.concatenate([
                (h % np.uint64(n_shards)).astype(np.int64),
                # totals rows ride to a doc-spread shard; pass-through
                (ids.astype(np.uint64) % np.uint64(n_shards)).astype(
                    np.int64
                ),
            ]), pa.int64()),
        })

    def confirm(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        pos = group["pos"].to_numpy(zero_copy_only=False)
        tw = group["tw"].to_numpy(zero_copy_only=False)
        win = pos >= 0
        keep = np.zeros(len(ids), dtype=bool)
        keep[~win] = True  # totals rows pass through
        if win.any():
            grams = np.asarray(
                group["gram"].to_pandas(), dtype=object
            )[win]
            _, inv, cnt = np.unique(
                grams, return_inverse=True, return_counts=True
            )
            keep[np.nonzero(win)[0][cnt[inv] >= 2]] = True
        ids, pos, tw = ids[keep], pos[keep], tw[keep]
        cols = {
            id_col: pa.array(ids, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "tw": pa.array(tw, pa.int64()),
            "__shard__": pa.array(
                (ids.astype(np.uint64) % np.uint64(n_shards)).astype(
                    np.int64
                ), pa.int64(),
            ),
        }
        if output == "clean":
            # doc rows keep their text; confirmed window rows only need
            # (id, pos) downstream — blank the gram to keep the second
            # text hop to exactly the doc rows
            gram = pc.fill_null(group["gram"], "").combine_chunks()
            gram = gram.take(pa.array(np.nonzero(keep)[0], pa.int64()))
            cols["gram"] = pc.if_else(
                pa.array(pos >= 0),
                pa.array([""] * len(ids), pa.string()),
                gram.cast(pa.string()),
            )
        return pa.table(cols)

    # ---- pass 3: per-doc island merge ----
    def doc_stats(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        pos = group["pos"].to_numpy(zero_copy_only=False)
        tw = group["tw"].to_numpy(zero_copy_only=False)
        tot_m = pos < 0
        tot_ids, tot_tw = ids[tot_m], tw[tot_m]
        t_order = np.argsort(tot_ids, kind="stable")
        tot_ids, tot_tw = tot_ids[t_order], tot_tw[t_order]
        if len(tot_ids) and (tot_ids[1:] == tot_ids[:-1]).any():
            # a duplicate id would silently interleave two docs' window
            # streams and skew the searchsorted join (review finding)
            raise ValueError(
                "duplicated_spans: id_col values must be unique "
                f"(duplicate {tot_ids[np.nonzero(tot_ids[1:] == tot_ids[:-1])[0][0]]})"
            )
        wids, wpos = ids[~tot_m], pos[~tot_m]
        order = np.lexsort((wpos, wids))
        wids, wpos = wids[order], wpos[order]
        if len(wids):
            new_doc = np.concatenate([[True], wids[1:] != wids[:-1]])
            brk = new_doc | np.concatenate(
                [[True], wpos[1:] > wpos[:-1] + k]
            )
        else:  # empty shuffle blocks / clean shard (CLAUDE.md rule)
            new_doc = brk = np.zeros(0, dtype=bool)
        isl_start = np.nonzero(brk)[0]
        isl_end = (np.concatenate([isl_start[1:], [len(wids)]]) - 1
                   if len(isl_start) else isl_start)
        span_s = wpos[isl_start]
        span_e = wpos[isl_end] + k
        isl_doc = wids[isl_start]
        if output == "spans":
            return pa.table({
                id_col: pa.array(isl_doc, pa.int64()),
                "span_start": pa.array(span_s, pa.int64()),
                "span_end": pa.array(span_e, pa.int64()),
            })
        # per-doc reductions over islands (islands are doc-sorted)
        d_start = np.nonzero(np.concatenate(
            [[True], isl_doc[1:] != isl_doc[:-1]]
        ))[0] if len(isl_doc) else np.zeros(0, np.int64)
        if len(isl_doc):
            doc_of = isl_doc[d_start]
            span_count = np.diff(np.concatenate([d_start, [len(isl_doc)]]))
            dup_tokens = np.add.reduceat(span_e - span_s, d_start)
            # windows per doc: reduceat over the window rows
            w_start = np.nonzero(new_doc)[0]
            dup_windows = np.diff(np.concatenate([w_start, [len(wids)]]))
        else:
            doc_of = np.zeros(0, np.int64)
            span_count = dup_tokens = dup_windows = doc_of
        # left-join onto totals (every doc reports, zeros if clean)
        out_sc = np.zeros(len(tot_ids), np.int64)
        out_dt = np.zeros(len(tot_ids), np.int64)
        out_dw = np.zeros(len(tot_ids), np.int64)
        if len(doc_of):
            at = np.searchsorted(tot_ids, doc_of)
            out_sc[at] = span_count
            out_dt[at] = dup_tokens
            out_dw[at] = dup_windows
        return pa.table({
            id_col: pa.array(tot_ids, pa.int64()),
            "total_windows": pa.array(tot_tw, pa.int64()),
            "dup_windows": pa.array(out_dw, pa.int64()),
            "span_count": pa.array(out_sc, pa.int64()),
            "dup_tokens": pa.array(out_dt, pa.int64()),
        })

    # ---- pass 3 (clean): rebuild token streams without the spans ----
    def doc_clean(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        pos = group["pos"].to_numpy(zero_copy_only=False)
        doc_m = pos < 0
        d_order = np.argsort(ids[doc_m], kind="stable")
        d_ids = ids[doc_m][d_order]
        if len(d_ids) and (d_ids[1:] == d_ids[:-1]).any():
            raise ValueError(
                "duplicated_spans: id_col values must be unique "
                f"(duplicate {d_ids[np.nonzero(d_ids[1:] == d_ids[:-1])[0][0]]})"
            )
        texts = (
            pc.fill_null(group["gram"], "").combine_chunks()
            .take(pa.array(np.nonzero(doc_m)[0], pa.int64()))
            .take(pa.array(d_order, pa.int64()))
        )
        toks, nt = _tokenize(texts)
        wids, wpos = ids[~doc_m], pos[~doc_m]
        order = np.lexsort((wpos, wids))
        wids, wpos = wids[order], wpos[order]
        # merge to islands first so covered ranges never double-count
        if len(wids):
            brk = np.concatenate([[True], wids[1:] != wids[:-1]]) | \
                np.concatenate([[True], wpos[1:] > wpos[:-1] + k])
        else:
            brk = np.zeros(0, dtype=bool)
        isl_start = np.nonzero(brk)[0]
        isl_end = (np.concatenate([isl_start[1:], [len(wids)]]) - 1
                   if len(isl_start) else isl_start)
        s = wpos[isl_start]
        e = wpos[isl_end] + k
        d_at = np.searchsorted(d_ids, wids[isl_start])
        doc_start = np.concatenate([[0], np.cumsum(nt)[:-1]])
        total = int(nt.sum())
        keep_mask = np.ones(total, dtype=bool)
        if len(s):
            lens = e - s
            flat0 = np.repeat(doc_start[d_at] + s, lens)
            off = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(lens) - lens, lens
            )
            keep_mask[flat0 + off] = False
        flat = toks.explode().drop_nulls()
        doc_idx_flat = np.repeat(np.arange(len(nt), dtype=np.int64), nt)
        kept = pl.DataFrame({
            "d": pl.Series(doc_idx_flat[keep_mask]),
            "tok": flat.filter(pl.Series(keep_mask)),
        }).group_by("d", maintain_order=True).agg(
            pl.col("tok").str.join(" ").alias("text_clean")
        )
        clean = np.full(len(d_ids), "", dtype=object)
        clean[kept["d"].to_numpy()] = kept["text_clean"].to_numpy()
        n_removed = np.zeros(len(d_ids), np.int64)
        np.add.at(n_removed, d_at, (e - s).astype(np.int64))
        return pa.table({
            id_col: pa.array(d_ids, pa.int64()),
            "text_clean": pa.array(clean, pa.string()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    final = doc_clean if output == "clean" else doc_stats
    return (
        ds.map_batches(extract_cands, batch_format="pyarrow",
                       batch_size=None)
        .groupby("__shard__")
        .map_groups(confirm, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(final, batch_format="pyarrow")
    )


def top_duplicated_grams(
    ds: ray.data.Dataset,
    k: int = 8,
    top: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = None,
    max_candidate_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Global heavy hitters among exact duplicated k-token grams — the
    contamination-triage report (which boilerplate/benchmark spans
    repeat most). Output: ``top`` rows (rank, gram, n_occ, n_docs),
    rank = ROW_NUMBER under the total order (n_occ desc, gram asc).

    Shares pass 1 with :func:`duplicated_spans`; pass 2 routes candidate
    windows by gram hash so each shard holds EVERY occurrence of its
    grams — per-gram exact counts need no cross-shard merge, and each
    shard pre-trims to its local top-``top`` before a bounded tree
    merge picks the global winners.
    """
    from geomesa_ray.stages.corpus import _tree_merge

    if n_shards is None:
        n_shards = default_shards()
    cand_ref = ray.put(_candidate_hashes(
        ds, k, text_col, n_shards, max_candidate_bytes
    ))

    def extract(batch: pa.Table) -> pa.Table:
        cand_arr = _resolve_broadcast(cand_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks, nt = _tokenize(batch[text_col])
        h, doc_idx, pos = _window_hashes(toks, nt, k)
        m = _isin_sorted(h, cand_arr)
        doc_idx, h = doc_idx[m], h[m]
        grams = _gram_strings(toks, nt, doc_idx, pos[m], k)
        return pa.table({
            "gram": grams,
            id_col: pa.array(ids[doc_idx], pa.int64()),
            "__shard__": pa.array(
                (h % np.uint64(n_shards)).astype(np.int64), pa.int64()
            ),
        })

    def shard_counts(group: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("gram", pa.string()), ("n_occ", pa.int64()),
            ("n_docs", pa.int64()),
        ])
        if group.num_rows == 0:
            return schema.empty_table()
        grams = np.asarray(group["gram"].to_pandas(), dtype=object)
        docs = group[id_col].to_numpy(zero_copy_only=False)
        uniq, inv, n_occ = np.unique(
            grams, return_inverse=True, return_counts=True
        )
        pair_order = np.lexsort((docs, inv))
        gi, di = inv[pair_order], docs[pair_order]
        new_pair = np.concatenate(
            [[True], (gi[1:] != gi[:-1]) | (di[1:] != di[:-1])]
        )
        n_docs = np.bincount(gi[new_pair], minlength=len(uniq))
        keep = n_occ >= 2  # exact count decides; the hash only routed
        uniq, n_occ, n_docs = uniq[keep], n_occ[keep], n_docs[keep]
        # local pre-trim: counts are complete per shard (same gram →
        # same hash → same shard), so the global top-k is a subset of
        # each shard's top-k
        if len(uniq) > top:
            sel = np.lexsort((uniq, -n_occ))[:top]
            uniq, n_occ, n_docs = uniq[sel], n_occ[sel], n_docs[sel]
        return pa.table({
            "gram": pa.array(uniq, pa.string()),
            "n_occ": pa.array(n_occ.astype(np.int64), pa.int64()),
            "n_docs": pa.array(n_docs.astype(np.int64), pa.int64()),
        })

    def merge_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        grams = np.asarray(batch["gram"].to_pandas(), dtype=object)
        n_occ = batch["n_occ"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((grams, -n_occ))[:top]
        return batch.take(pa.array(np.sort(sel), pa.int64()))

    merged, converged = _tree_merge(
        ds.map_batches(extract, batch_format="pyarrow", batch_size=None)
        .groupby("__shard__")
        .map_groups(shard_counts, batch_format="pyarrow"),
        merge_topk,
    )
    if not converged:  # pragma: no cover - bounded by top × n_shards
        raise ValueError("top_duplicated_grams: merge did not converge")

    def rank(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("rank", pa.array([], pa.int64()))
        grams = np.asarray(batch["gram"].to_pandas(), dtype=object)
        n_occ = batch["n_occ"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((grams, -n_occ))[:top]
        out = batch.take(pa.array(sel, pa.int64()))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(sel) + 1), pa.int64())
        )

    return merged.map_batches(rank, batch_format="pyarrow",
                              batch_size=None)
