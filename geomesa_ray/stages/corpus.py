"""Corpus-level text cleaning operators for training-data pipelines:
line-level (paragraph) dedup, within-doc repetition signals, and PII
redaction.

These extend the document-level dedup family (stages/dedup.py) down to
line granularity — the CCNet-style pass a web-scale corpus gets before
model training. Reference analog: the converter framework's per-record
string transforms (geomesa-convert .../transforms/StringFunctionFactory.scala)
operate row-at-a-time; these are corpus-wide and vectorized.

Scale shape (per CLAUDE.md constraints):
- the line explode is one Arrow ``split_pattern`` + ``np.repeat`` per
  batch — no Python row loops;
- cross-corpus first-occurrence is decided inside ``hash(line) % n_shards``
  groups (O(n_shards) reduce calls, never one per distinct line), with the
  in-shard kernel a polars sort+unique;
- doc reassembly is a second bounded-fan-out shuffle keyed by
  ``doc_id % n_shards`` with a vectorized string-join per shard;
- PII redaction is stateless Arrow RE2 — semantics match DuckDB's
  ``regexp_replace(..., 'g')`` (both are RE2) so the oracle is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from geomesa_ray.stages.encode import hash_strings
from geomesa_ray.stages.shards import default_shards

# The ASCII token kernel shared by every token-POSITION operator
# (chunk_corpus, stages/spans.py): explicitly NOT \w+, because polars'
# Rust regex \w is Unicode while the Arrow RE2 count kernel and the
# DuckDB oracles' regexp_extract_all('\w+') are ASCII — a Unicode class
# here would shift every downstream token offset on non-ASCII corpora.
ASCII_TOKEN_RE = r"[0-9A-Za-z_]+"


def explode_lines(batch: pa.Table, text_col: str, id_col: str,
                  sep: str = "\n") -> pa.Table:
    """Vectorized line explode: one output row per line of every doc.

    ``line_no`` is 1-based (matches SQL ``generate_subscripts``).
    Splitting the empty string yields one empty line, matching DuckDB's
    ``string_split('', sep) = ['']``.
    """
    splits = pc.split_pattern(batch[text_col], sep)
    flat = pc.list_flatten(splits)  # (null lists contribute no elements)
    # a NULL text yields a null list → 0 lines, matching the SQL oracle's
    # unnest(string_split(NULL, sep)) emitting no rows for that doc
    lens = pc.fill_null(pc.list_value_length(splits), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    doc_ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), lens)
    # 1-based position within each doc: arange minus each segment's start
    ends = np.cumsum(lens)
    starts = ends - lens
    line_no = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(starts, lens) + 1
    return pa.table(
        {
            id_col: pa.array(doc_ids, pa.int64()),
            "line_no": pa.array(line_no, pa.int64()),
            "line": flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat,
        }
    )


def _keep_first_per_line(group: pa.Table, id_col: str) -> pa.Table:
    """In-shard kernel: keep the globally-first (id, line_no) row per
    distinct line string. Collision-free — segments on the line VALUE,
    not its hash (the hash only routes shards)."""
    import polars as pl

    out = (
        pl.from_arrow(group.drop_columns(["__shard__"]))
        .sort(["line", id_col, "line_no"])
        .unique(subset=["line"], keep="first", maintain_order=True)
        .to_arrow()
    )
    return out.cast(group.drop_columns(["__shard__"]).schema)


def _reassemble_docs(group: pa.Table, id_col: str, text_col: str,
                     sep: str) -> pa.Table:
    """In-shard kernel: join each doc's surviving lines back into text,
    in line order."""
    import polars as pl

    out = (
        pl.from_arrow(group.drop_columns(["__shard__"]))
        .sort([id_col, "line_no"])
        .group_by(id_col, maintain_order=True)
        .agg(pl.col("line").str.join(sep).alias(text_col))
        .to_arrow()
    )
    return out.cast(
        pa.schema([pa.field(id_col, pa.int64()), pa.field(text_col, pa.string())])
    )


def line_dedup(ds: ray.data.Dataset, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n",
               n_shards: int | None = None) -> ray.data.Dataset:
    """Corpus-wide line-level dedup (CCNet-style): every line that appears
    more than once in the corpus survives only at its globally-first
    occurrence (min ``(doc_id, line_no)``); docs are reassembled from
    their surviving lines. Docs whose every line loses vanish.

    Two bounded-fan-out shuffles of line rows: first keyed by
    ``hash(line) % n_shards`` to decide winners, then by
    ``doc_id % n_shards`` to rebuild texts. No driver materialization.
    """
    if n_shards is None:
        n_shards = default_shards()

    def explode(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = explode_lines(batch, text_col, id_col, sep)
        # combiner: only a line's batch-local min (doc_id, line_no) can be
        # the global winner, so drop every other occurrence BEFORE the
        # shuffle — on repetitive corpora this collapses the shuffle volume
        # to ~the distinct-line count per batch.
        t = (
            pl.from_arrow(t)
            .sort(["line", id_col, "line_no"])
            .unique(subset=["line"], keep="first", maintain_order=True)
            .to_arrow()
            .cast(t.schema)
        )
        shard = (hash_strings(t["line"]) % np.uint64(n_shards)).astype(np.int64)
        return t.append_column("__shard__", pa.array(shard, pa.int64()))

    kept = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(_keep_first_per_line, fn_kwargs={"id_col": id_col},
                    batch_format="pyarrow")
    )

    def reshard(batch: pa.Table) -> pa.Table:
        shard = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64) % n_shards
        return batch.append_column("__shard__", pa.array(shard, pa.int64()))

    return (
        kept.map_batches(reshard, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(
            _reassemble_docs,
            fn_kwargs={"id_col": id_col, "text_col": text_col, "sep": sep},
            batch_format="pyarrow",
        )
    )


def line_stats(ds: ray.data.Dataset, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n") -> ray.data.Dataset:
    """Within-doc repetition signals (Gopher-style quality gates):
    ``n_lines``, ``n_dup_lines`` (occurrences beyond the first of an
    identical line inside the same doc), ``dup_line_frac`` and
    ``dup_char_frac`` (character share of those duplicate occurrences).

    Purely per-doc, so a single vectorized map_batches — no shuffle.
    Fractions are single exact-integer divisions (bit-deterministic, so
    SQL-hash-verifiable per the oracle rules).
    """

    def stats(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = explode_lines(batch, text_col, id_col, sep)
        lf = pl.from_arrow(t).with_columns(
            pl.col("line").str.len_chars().cast(pl.Int64).alias("c"),
            (~pl.struct([id_col, "line"]).is_first_distinct()).alias("dup"),
        )
        agg = (
            lf.group_by(id_col, maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n_lines"),
                pl.col("dup").sum().cast(pl.Int64).alias("n_dup_lines"),
                pl.col("c").sum().alias("c_total"),
                (pl.col("c") * pl.col("dup")).sum().alias("c_dup"),
            )
            .to_arrow()
        )
        n_lines = agg["n_lines"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_dup = agg["n_dup_lines"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_total = agg["c_total"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_dup = agg["c_dup"].to_numpy(zero_copy_only=False).astype(np.float64)
        dup_line_frac = np.where(n_lines > 0, n_dup / np.maximum(n_lines, 1.0), 0.0)
        dup_char_frac = np.where(c_total > 0, c_dup / np.maximum(c_total, 1.0), 0.0)
        return pa.table(
            {
                id_col: agg[id_col].cast(pa.int64()),
                "n_lines": agg["n_lines"].cast(pa.int64()),
                "n_dup_lines": agg["n_dup_lines"].cast(pa.int64()),
                "dup_line_frac": pa.array(dup_line_frac, pa.float64()),
                "dup_char_frac": pa.array(dup_char_frac, pa.float64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def top_ngram_stats(ds: ray.data.Dataset, n: int = 2,
                    text_col: str = "text", id_col: str = "doc_id",
                    sep: str = " ") -> ray.data.Dataset:
    """Gopher-style top-n-gram repetition signal: per doc, the most
    frequent contiguous word n-gram (ties broken by lexicographically
    smallest gram) and the character fraction it accounts for
    (``count × len(gram) / len(text)``). Docs with < n words emit
    ``('', 0, 0.0)``.

    Purely per-doc → one vectorized map_batches, no shuffle; the fraction
    is a single exact-integer division (bit-deterministic, so the SQL
    oracle hash-matches)."""
    if n < 2:
        raise ValueError("n must be >= 2")

    def stats(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = explode_lines(batch, text_col, id_col, sep)
        lf = pl.from_arrow(t).sort([id_col, "line_no"])
        gram = pl.col("line")
        for i in range(1, n):
            gram = gram + sep + pl.col("line").shift(-i).over(id_col)
        grams = (
            lf.with_columns(gram.alias("g"))
            .drop_nulls("g")
            .group_by([id_col, "g"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .sort([id_col, "c", "g"], descending=[False, True, False])
            .unique(subset=[id_col], keep="first", maintain_order=True)
        )
        text_len = pc.fill_null(pc.utf8_length(batch[text_col]), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        base = pl.DataFrame(
            {id_col: batch[id_col].to_numpy(zero_copy_only=False),
             "text_len": text_len}
        )
        joined = base.join(grams, on=id_col, how="left").sort(id_col)
        g = joined["g"].fill_null("").to_numpy()
        c = joined["c"].fill_null(0).to_numpy().astype(np.int64)
        tl = joined["text_len"].to_numpy().astype(np.int64)
        glen = np.array([len(x) for x in g], dtype=np.int64)
        frac = np.where((tl > 0) & (c > 0),
                        (c * glen).astype(np.float64) / np.maximum(tl, 1).astype(np.float64),
                        0.0)
        return pa.table(
            {
                id_col: pa.array(joined[id_col].to_numpy(), pa.int64()),
                "top_gram": pa.array(g, pa.string()),
                "gram_count": pa.array(c, pa.int64()),
                "top_gram_char_frac": pa.array(frac, pa.float64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def _tree_merge(partials: ray.data.Dataset, merge_fn,
                fanin_rows: int = 2_000_000,
                max_rounds: int = 10) -> tuple[ray.data.Dataset, bool]:
    """Shuffle-free tree of vectorized merge tasks (the density.py
    ``_sparse_tile_groupby`` pattern): each round coalesces up to
    ``fanin_rows`` partial rows per task. Returns ``(ds, converged)`` —
    when ``converged`` the result is a single block and per-key rows are
    fully merged; callers keep Ray's sort-based shuffle aggregate only as
    the huge-case fallback (its multi-second fixed cost dwarfs bounded
    outputs, per CLAUDE.md)."""
    ds = partials.map_batches(
        merge_fn, batch_format="pyarrow", batch_size=fanin_rows
    ).materialize()
    rounds = 0
    while ds.num_blocks() > 1 and rounds < max_rounds:
        ds = ds.repartition(max(1, ds.num_blocks() // 8)).map_batches(
            merge_fn, batch_format="pyarrow", batch_size=fanin_rows
        ).materialize()
        rounds += 1
    if ds.num_blocks() <= 1:
        # a single block can still hold UNMERGED rows: when its row count
        # exceeds fanin_rows, the last merge ran on split batches whose
        # outputs were concatenated, not combined. One whole-block pass
        # (batch_size=None) finishes the merge — safe, because a single
        # materialized block is bounded by Ray's block-size target.
        ds = ds.map_batches(
            merge_fn, batch_format="pyarrow", batch_size=None
        ).materialize()
        return ds, True
    return ds, False


def _group_sum(t: pa.Table, keys: list[str], sums: list[str]) -> pa.Table:
    """Vectorized in-task group-sum (polars), schema-stable output."""
    import polars as pl

    out = (
        pl.from_arrow(t)
        .group_by(keys, maintain_order=False)
        .agg([pl.col(c).sum() for c in sums])
        .sort(keys)
        .to_arrow()
    )
    return out.cast(t.schema)


def domain_stats(ds: ray.data.Dataset, key_col: str = "source",
                 lang_col: str = "lang", chars_col: str = "n_chars",
                 text_col: str = "text",
                 fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """Per-domain corpus rollup: doc count, total chars, total tokens and
    distinct-language count per ``key_col`` — the at-a-glance table a
    training-data curator reads before weighting sources.

    Scale shape: per-batch partial sums keyed by ``(key, lang)`` (the
    combiner bounds shuffle volume at |domains|×|langs| rows per batch),
    tree-merged; Ray's shuffle aggregate is the fallback only if the
    key space overflows the tree (then a second tiny aggregate folds
    languages per key)."""
    from geomesa_ray.stages.textstats import token_count

    schema = pa.schema(
        [
            pa.field(key_col, pa.string()),
            pa.field(lang_col, pa.string()),
            pa.field("n_docs", pa.int64()),
            pa.field("total_chars", pa.int64()),
            pa.field("total_tokens", pa.int64()),
        ]
    )
    sums = ["n_docs", "total_chars", "total_tokens"]

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key_col: batch[key_col].cast(pa.string()),
                lang_col: batch[lang_col].cast(pa.string()),
                "n_docs": pa.array(np.ones(len(batch), np.int64), pa.int64()),
                "total_chars": batch[chars_col].cast(pa.int64()),
                "total_tokens": token_count(batch[text_col]).cast(pa.int64()),
            }
        )
        return _group_sum(t, [key_col, lang_col], sums)

    def merge(batch: pa.Table) -> pa.Table:
        return _group_sum(batch.cast(schema), [key_col, lang_col], sums)

    merged, converged = _tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), merge,
        fanin_rows=fanin_rows,
    )
    if not converged:  # huge-case fallback: exact shuffle aggregate
        from ray.data.aggregate import Sum

        merged = merged.groupby([key_col, lang_col]).aggregate(
            *[Sum(c, alias_name=c) for c in sums]
        )

    def finish(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .group_by(key_col, maintain_order=False)
            .agg(
                pl.col("n_docs").sum(),
                pl.col("total_chars").sum(),
                pl.col("total_tokens").sum(),
                pl.len().cast(pl.Int64).alias("n_langs"),
            )
            .sort(key_col)
            .to_arrow()
        )
        return out.cast(
            pa.schema(
                [
                    pa.field(key_col, pa.string()),
                    pa.field("n_docs", pa.int64()),
                    pa.field("total_chars", pa.int64()),
                    pa.field("total_tokens", pa.int64()),
                    pa.field("n_langs", pa.int64()),
                ]
            )
        )

    if converged:
        return merged.map_batches(finish, batch_format="pyarrow")
    # fallback path: (key, lang) rows are exact but spread across blocks —
    # one more tiny exact aggregate keyed by key alone
    from ray.data.aggregate import Count, Sum

    final = merged.groupby(key_col).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_chars", alias_name="total_chars"),
        Sum("total_tokens", alias_name="total_tokens"),
        Count(alias_name="n_langs"),
    )
    return final.map_batches(
        lambda b: b.select([key_col, "n_docs", "total_chars", "total_tokens", "n_langs"]).cast(
            pa.schema(
                [
                    pa.field(key_col, pa.string()),
                    pa.field("n_docs", pa.int64()),
                    pa.field("total_chars", pa.int64()),
                    pa.field("total_tokens", pa.int64()),
                    pa.field("n_langs", pa.int64()),
                ]
            )
        ),
        batch_format="pyarrow",
    )


def _adjacent_bigrams(col, sep: str = " ") -> tuple[pa.Array, np.ndarray]:
    """Vectorized adjacent word pairs: split on the LITERAL separator
    (keeping empties), pair neighbours within each doc, then drop pairs
    with an empty side — exactly mirroring the SQL oracle's
    ``string_split(text, sep)`` + ``w[i] <> '' AND w[i+1] <> ''`` (pairing
    BEFORE the empty filter matters: ``'a  b'`` yields no (a, b) pair on
    either side). Null text behaves like the empty string (0 pairs).

    Returns ``(bigram_strings, doc_local_index)``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = pc.fill_null(col.cast(pa.string()), "")
    lists = pc.split_pattern(arr, sep)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(flat)
    if n < 2:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    doc_idx = np.repeat(np.arange(len(lists), dtype=np.int64), lens)
    left = flat.slice(0, n - 1)
    right = flat.slice(1, n - 1)
    same_doc = doc_idx[:-1] == doc_idx[1:]
    nonempty = pc.and_(
        pc.greater(pc.utf8_length(left), 0), pc.greater(pc.utf8_length(right), 0)
    ).to_numpy(zero_copy_only=False)
    keep = same_doc & nonempty
    bigrams = pc.binary_join_element_wise(left, right, sep).filter(pa.array(keep))
    if isinstance(bigrams, pa.ChunkedArray):
        bigrams = bigrams.combine_chunks()
    return bigrams, doc_idx[:-1][keep]


def bigram_coverage(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id", min_count: int = 50,
                    sep: str = " ",
                    fanin_rows: int = 2_000_000,
                    broadcast_limit_bytes: int = 512 << 20) -> ray.data.Dataset:
    """Count-based n-gram LM coverage (the CCNet/KenLM-shaped signal with
    exact integer semantics): the MODEL is the set of adjacent word
    bigrams whose corpus-wide count ≥ ``min_count``; each doc is scored
    with ``n_bigrams`` (its adjacent-pair count) and ``n_known_bigrams``
    (pairs found in the model). Low coverage ⇒ text unlike the corpus
    (gibberish, boilerplate, wrong language) — the bucketing signal a
    perplexity filter provides, without a float LM.

    Scale shape: per-batch partial counts (combiner) → tree-merge, with
    Ray's shuffle aggregate as the huge-vocabulary fallback; the
    thresholded model (the Zipf HEAD — raise ``min_count`` if it doesn't
    fit ``broadcast_limit_bytes``) is broadcast once via ``ray.put`` and
    probed with Arrow's vectorized ``is_in``. ``ds`` is consumed twice
    (model pass + scoring pass): pass a re-readable (parquet-backed) or
    materialized dataset."""
    count_schema = pa.schema([pa.field("bg", pa.string()), pa.field("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        bg, _ = _adjacent_bigrams(batch[text_col], sep)
        if len(bg) == 0:
            return count_schema.empty_table()
        t = pa.table({"bg": bg, "c": pa.array(np.ones(len(bg), np.int64), pa.int64())})
        return _group_sum(t, ["bg"], ["c"])

    def merge(batch: pa.Table) -> pa.Table:
        return _group_sum(batch.cast(count_schema), ["bg"], ["c"])

    merged, converged = _tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), merge,
        fanin_rows=fanin_rows,
    )
    if not converged:  # huge-vocabulary fallback: exact shuffle aggregate
        from ray.data.aggregate import Sum

        merged = merged.groupby("bg").aggregate(Sum("c", alias_name="c"))
    model_parts: list[pa.Array] = []
    model_bytes = 0
    for b in merged.map_batches(
        lambda t: t.filter(pc.greater_equal(t["c"], min_count)).select(["bg"]),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        if len(b) == 0:
            continue
        model_bytes += b.nbytes
        if model_bytes > broadcast_limit_bytes:
            raise ValueError(
                f"bigram model exceeds broadcast_limit_bytes="
                f"{broadcast_limit_bytes}; raise min_count (={min_count}) — "
                "the model is meant to be the Zipf head, not the whole tail"
            )
        model_parts.append(b["bg"].combine_chunks() if isinstance(b["bg"], pa.ChunkedArray) else b["bg"])
    model = (
        pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in model_parts])
        if model_parts else pa.array([], pa.string())
    )
    model_ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        from geomesa_ray.stages.join import _resolve_broadcast

        model_arr = _resolve_broadcast(model_ref)
        n = len(batch)
        n_big = np.zeros(n, np.int64)
        n_known = np.zeros(n, np.int64)
        bg, idx = _adjacent_bigrams(batch[text_col], sep)
        if len(bg):
            np.add.at(n_big, idx, 1)
            if len(model_arr):
                known = pc.is_in(bg, value_set=model_arr).to_numpy(
                    zero_copy_only=False
                )
                np.add.at(n_known, idx[known], 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(n_big, pa.int64()),
                "n_known_bigrams": pa.array(n_known, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def cdf_buckets(ds: ray.data.Dataset, value_col: str = "n_chars",
                id_col: str = "doc_id", n_buckets: int = 10,
                fanin_rows: int = 2_000_000,
                max_distinct: int = 20_000_000) -> ray.data.Dataset:
    """Exact global quantile bucketing for training-mixture sampling:
    ``bucket = (#rows with strictly smaller value) * n_buckets // total``
    — rows sharing a value share a bucket, so the result is deterministic
    under any partitioning/row order (NTILE is not: it splits ties).

    Scale shape: per-batch value histograms tree-merged (one pass, no
    sort); the merged histogram is bounded by the number of DISTINCT
    values (quantize continuous scores first — ``max_distinct`` guards
    the driver), then the value→bucket step table is broadcast and each
    row bucketed via ``searchsorted``. ``ds`` is consumed twice: pass a
    re-readable or materialized dataset."""
    hist_schema = pa.schema([pa.field("v", pa.int64()), pa.field("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(uniq, pa.int64()), "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    def merge(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(v, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, c)
        return pa.table({"v": pa.array(uniq, pa.int64()), "c": pa.array(sums, pa.int64())})

    merged, converged = _tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None).map_batches(
            lambda b: b.cast(hist_schema), batch_format="pyarrow"
        ),
        merge, fanin_rows=fanin_rows,
    )
    if not converged:
        raise ValueError(
            f"histogram tree-merge did not converge: still "
            f"{merged.num_blocks()} blocks of up to {fanin_rows} rows — "
            f"too many distinct {value_col} values; quantize the score "
            "column before bucketing"
        )
    vs_parts, cs_parts = [], []
    total_distinct = 0
    for b in merged.iter_batches(batch_format="pyarrow"):
        total_distinct += len(b)
        if total_distinct > max_distinct:
            raise ValueError(
                f"> {max_distinct} distinct {value_col} values — quantize first"
            )
        vs_parts.append(b["v"].to_numpy(zero_copy_only=False))
        cs_parts.append(b["c"].to_numpy(zero_copy_only=False))
    vs = np.concatenate(vs_parts) if vs_parts else np.empty(0, np.int64)
    cs = np.concatenate(cs_parts) if cs_parts else np.empty(0, np.int64)
    order = np.argsort(vs, kind="stable")
    vs, cs = vs[order], cs[order]
    total = int(cs.sum())
    cum_before = np.concatenate([[0], np.cumsum(cs)[:-1]]).astype(np.int64)
    buckets = (cum_before * np.int64(n_buckets)) // max(total, 1)
    step_ref = ray.put((vs, buckets))

    def assign(batch: pa.Table) -> pa.Table:
        from geomesa_ray.stages.join import _resolve_broadcast

        svs, sbk = _resolve_broadcast(step_ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(svs, v)
        return pa.table(
            {
                id_col: batch[id_col],
                value_col: batch[value_col].cast(pa.int64()),
                "bucket": pa.array(sbk[pos], pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# PII patterns — RE2 syntax, valid verbatim in both Arrow (RE2) and DuckDB
# (also RE2), so Ray and the SQL oracle replace the exact same spans.
# Applied in this order; counts are taken on the text as it stands before
# each replacement (email digits/dots can't be miscounted as IPs).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d \-]{7,}\d", "<PHONE>"),
)


def redact_pii(ds: ray.data.Dataset, text_col: str = "text",
               id_col: str = "doc_id") -> ray.data.Dataset:
    """Redact emails, IPv4 addresses and phone-like digit runs, emitting
    the redacted text plus a per-category match count. Stateless Arrow
    RE2 kernels — one ``map_batches``, no shuffle."""

    def redact(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: batch[id_col]}
        for name, pattern, token in PII_PATTERNS:
            cols[f"n_{name}"] = pc.count_substring_regex(txt, pattern).cast(pa.int64())
            txt = pc.replace_substring_regex(txt, pattern, token)
        cols[text_col] = txt
        return pa.table(cols)

    return ds.map_batches(redact, batch_format="pyarrow")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (same constants as the shingle
    hash in stages/dedup.py, so the SQL mirror in pipelines/oracles.py
    applies verbatim)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def split_labels(ids: np.ndarray, train_per_mille: int = 980,
                 val_per_mille: int = 10) -> np.ndarray:
    """Row-level split labels from splitmix64 per-mille buckets — the one
    source of truth for the train/val/test contract (used by
    :func:`split_assign` and composed pipelines like curate_corpus)."""
    bucket = (_splitmix64(np.asarray(ids, dtype=np.int64).astype(np.uint64))
              % np.uint64(1000)).astype(np.int64)
    return np.where(
        bucket < train_per_mille, "train",
        np.where(bucket < train_per_mille + val_per_mille, "val", "test"),
    )


def split_assign(ds: ray.data.Dataset, id_col: str = "doc_id",
                 train_per_mille: int = 980, val_per_mille: int = 10,
                 out_col: str = "split") -> ray.data.Dataset:
    """Deterministic train/val/test assignment by id hash — the standard
    leakage-safe dataset split (a row's split NEVER depends on
    partitioning, row order, or corpus size; re-runs and incremental
    ingests agree). ``bucket = splitmix64(id) % 1000``; buckets
    [0, train) → train, [train, train+val) → val, rest → test.

    One stateless map_batches — no shuffle, no driver state."""
    if not (0 <= train_per_mille and 0 <= val_per_mille
            and train_per_mille + val_per_mille <= 1000):
        raise ValueError("per-mille shares must be non-negative and sum ≤ 1000")

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        split = split_labels(ids, train_per_mille, val_per_mille)
        return pa.table(
            {
                id_col: batch[id_col],
                out_col: pa.array(split, pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# control chars except \t \n \r (those are whitespace, collapsed next)
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS_RE = r"\s+"


def normalize_text(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id") -> ray.data.Dataset:
    """Canonical text cleanup for corpus ingestion: NFC unicode
    normalization → strip non-whitespace control characters → collapse
    whitespace runs to single spaces → trim. All Arrow kernels (RE2),
    mirrored exactly by DuckDB's ``nfc_normalize`` + ``regexp_replace``
    so the oracle is byte-exact. Emits the cleaned text plus a
    ``changed`` 0/1 flag."""

    def clean(batch: pa.Table) -> pa.Table:
        import unicodedata

        txt = batch[text_col].cast(pa.string())
        orig = txt
        # NFC: pyarrow's utf8_normalize mis-composes in this build (NFC of
        # a composed char returns the DECOMPOSED form), so normalization
        # uses unicodedata on the non-ASCII tail only — pure-ASCII rows
        # (bytes == chars) are NFC-invariant and skip the Python loop,
        # which is the overwhelming majority of a web corpus
        non_ascii = pc.not_equal(
            pc.binary_length(txt), pc.utf8_length(txt)
        )
        mask = pc.fill_null(non_ascii, False).to_numpy(zero_copy_only=False)
        if mask.any():
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            vals = txt.to_pylist()
            for i in np.nonzero(mask)[0].tolist():
                if vals[i] is not None:
                    vals[i] = unicodedata.normalize("NFC", vals[i])
            txt = pa.array(vals, pa.string())
        txt = pc.replace_substring_regex(txt, _CTRL_RE, "")
        txt = pc.replace_substring_regex(txt, _WS_RE, " ")
        txt = pc.utf8_trim_whitespace(txt)
        changed = pc.cast(
            pc.fill_null(pc.not_equal(txt, orig), False), pa.int64()
        )
        return pa.table(
            {id_col: batch[id_col], text_col: txt, "changed": changed}
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, rates_per_mille: dict[str, int],
                      key_col: str = "source", id_col: str = "doc_id",
                      default_per_mille: int = 1000) -> ray.data.Dataset:
    """Deterministic per-stratum downsampling for training-mixture
    reweighting: a row survives iff ``splitmix64(id) % 1000 <
    rate_per_mille[stratum]``. The keep decision depends only on the row's
    id and its stratum's rate — partitioning/order-invariant, stable
    across reruns and incremental ingests (the same guarantees as
    :func:`split_assign`, which this composes with: a row's sample fate
    and its train/val/test split use independent hash streams only if the
    caller salts one of them; by default both read splitmix64(id), so a
    sampled-out row is sampled out of every split consistently).

    The rate table is broadcast via closure (strata are few by
    definition); one stateless map_batches, no shuffle."""
    import pyarrow.compute as pc

    if not (0 <= default_per_mille <= 1000) or any(
        not (0 <= r <= 1000) for r in rates_per_mille.values()
    ):
        raise ValueError("rates are per-mille: 0..1000")
    keys = pa.array(sorted(rates_per_mille), pa.string())
    vals = np.array([rates_per_mille[k] for k in sorted(rates_per_mille)],
                    dtype=np.int64)

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (_splitmix64(ids.astype(np.uint64)) % np.uint64(1000)).astype(np.int64)
        src = batch[key_col].cast(pa.string())
        # index_in yields null for unseen strata → fill -1, default rate
        idx = pc.fill_null(pc.index_in(src, value_set=keys), -1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        rate = np.where(idx < 0, np.int64(default_per_mille), vals[np.maximum(idx, 0)])
        return batch.filter(pa.array(bucket < rate))

    return ds.map_batches(sample, batch_format="pyarrow")


def pack_sequences(
    ds: ray.data.Dataset,
    ctx_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Concat-then-chunk sequence packing (the standard GPT-style
    pretraining layout): documents concatenate in ``id_col`` order into
    one global token stream split into fixed ``ctx_len`` chunks; each doc
    gets its exact global token offset and chunk span. Token counts are
    the RE2 ``\\w+`` kernel (textstats.token_count — mirrorable in SQL as
    ``len(regexp_extract_all(text, '\\w+'))``).

    Scale shape — an **ordered global prefix sum with no global sort**:

    1. combiner pass: per-batch token sums per bucket
       (``id // bucket_size``), tree-merged to one tiny bucket table
       (#buckets = max_id / bucket_size; pick ``bucket_size`` so this
       stays ≤ ~1e6 rows — trivial for the driver);
    2. driver takes the exclusive prefix over the SORTED bucket table and
       broadcasts it as two parallel arrays (``ray.put`` once, CSR-style
       per CLAUDE.md — never a dict of small objects);
    3. one bounded shuffle routes rows by ``bucket % n_shards``; each
       shard lexsorts by (bucket, id), takes a vectorized within-segment
       exclusive cumsum, and adds the broadcast bucket base.

    Output: (id, n_tokens, start_tok, chunk_first, chunk_off,
    chunk_last) — all exact integers. Requires ids unique; id order is
    the packing order (deterministic, resumable).
    """
    import pyarrow.compute as pc

    from geomesa_ray.stages.join import _resolve_broadcast
    from geomesa_ray.stages.textstats import token_count

    if n_shards is None:
        n_shards = default_shards()

    tok_schema = pa.schema([("bucket", pa.int64()), ("toks", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = token_count(batch[text_col]).to_numpy(zero_copy_only=False)
        return _group_sum(
            pa.table({
                "bucket": pa.array(ids // bucket_size, pa.int64()),
                "toks": pa.array(t.astype(np.int64), pa.int64()),
            }),
            ["bucket"], ["toks"],
        )

    def merge(batch: pa.Table) -> pa.Table:
        return _group_sum(batch.cast(tok_schema), ["bucket"], ["toks"])

    merged, converged = _tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), merge
    )
    if not converged:
        raise ValueError(
            "pack_sequences: bucket table did not converge — raise "
            "bucket_size so max_id/bucket_size stays driver-sized"
        )
    bt = pa.concat_tables(merged.iter_batches(batch_format="pyarrow"))
    buckets = bt["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = bt["toks"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    buckets, toks = buckets[order], toks[order]
    bases = np.concatenate([[0], np.cumsum(toks)[:-1]])  # exclusive prefix
    lookup_ref = ray.put((buckets, bases))

    def route(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = token_count(batch[text_col]).to_numpy(zero_copy_only=False)
        b = ids // bucket_size
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(t.astype(np.int64), pa.int64()),
            "bucket": pa.array(b, pa.int64()),
            "__shard__": pa.array(b % n_shards, pa.int64()),
        })

    def assign(group: pa.Table) -> pa.Table:
        bkts, base_arr = _resolve_broadcast(lookup_ref)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False)
        b = group["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, b))
        ids, nt, b = ids[order], nt[order], b[order]
        cs = np.cumsum(nt)
        excl = cs - nt
        # reset the running sum at each bucket-segment start, then add
        # the broadcast global base of that bucket
        starts = np.nonzero(np.concatenate([[True], b[1:] != b[:-1]]))[0]
        seg_of = np.repeat(np.arange(len(starts)), np.diff(
            np.concatenate([starts, [len(b)]])
        ))
        excl = excl - excl[starts][seg_of]
        pos = np.searchsorted(bkts, b)
        start = excl + base_arr[pos]
        end = start + nt
        chunk_first = start // ctx_len
        chunk_last = np.where(nt > 0, (end - 1) // ctx_len, chunk_first)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "chunk_first": pa.array(chunk_first, pa.int64()),
            "chunk_off": pa.array(start % ctx_len, pa.int64()),
            "chunk_last": pa.array(chunk_last, pa.int64()),
        })

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(assign, batch_format="pyarrow")
    )


def mix_epochs(
    ds: ray.data.Dataset,
    epochs: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default_epochs: float = 1.0,
    out_col: str = "rep",
) -> ray.data.Dataset:
    """Deterministic mixture up-sampling (epoch repetition): a stratum
    with weight ``e`` emits each row ``floor(e)`` times plus one more iff
    ``splitmix64(id) % 1000 < round(frac(e)*1000)`` — the standard
    pretraining data-mixing move (repeat high-value sources ~e epochs)
    with :func:`stratified_sample`'s determinism guarantees (a row's
    repeat count depends only on its id and stratum — never partitioning,
    order, or corpus size). Copies carry ``out_col`` = 0..reps-1 so
    downstream keys stay unique as (id, rep).

    One stateless map_batches (np.repeat explode) — no shuffle."""
    import pyarrow.compute as pc

    if any(e < 0 or e > 1000 for e in list(epochs.values()) + [default_epochs]):
        raise ValueError("epochs must be in [0, 1000]")
    keys = pa.array(sorted(epochs), pa.string())
    evals = np.array([epochs[k] for k in sorted(epochs)], dtype=np.float64)
    base_tbl = np.floor(evals).astype(np.int64)
    frac_tbl = np.rint((evals - base_tbl) * 1000).astype(np.int64)
    d_base = np.int64(np.floor(default_epochs))
    d_frac = np.int64(round((default_epochs - np.floor(default_epochs)) * 1000))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (_splitmix64(ids.astype(np.uint64)) % np.uint64(1000)).astype(np.int64)
        idx = pc.fill_null(
            pc.index_in(batch[key_col].cast(pa.string()), value_set=keys), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.where(idx < 0, d_base, base_tbl[np.maximum(idx, 0)])
        frac = np.where(idx < 0, d_frac, frac_tbl[np.maximum(idx, 0)])
        reps = base + (bucket < frac).astype(np.int64)
        take = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        out = batch.take(pa.array(take, pa.int64()))
        ends = np.cumsum(reps)
        rep = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
            - np.repeat(ends - reps, reps)
        return out.append_column(out_col, pa.array(rep, pa.int64()))

    return ds.map_batches(explode, batch_format="pyarrow")


def chunk_corpus(
    ds: ray.data.Dataset,
    ctx_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Materialize the packed chunks :func:`pack_sequences` assigns — the
    training-example emitter: the corpus token stream (RE2 ``\\w+``
    tokens in ``id_col`` order, single-space joined) split into
    ``ctx_len``-token chunks, each emitted as (chunk_id, n_tokens, text).
    The final chunk may be short.

    Scale shape: the same bucket-total + driver-exclusive-prefix trick as
    pack_sequences gives every doc its exact global token offset WITHOUT
    a global sort; the text then moves exactly twice — once into the
    ``bucket % n_shards`` offset shuffle, once as per-chunk SEGMENTS
    (a doc contributes one segment per chunk it touches, so segment count
    ≈ doc count + chunk crossings) into the ``chunk % n_shards``
    reassembly shuffle. Per-shard kernels are polars list ops (extract_all
    / per-row list.slice / join) — no Python token loops.
    """
    import polars as pl

    from geomesa_ray.stages.join import _resolve_broadcast
    from geomesa_ray.stages.textstats import token_count

    if n_shards is None:
        n_shards = default_shards()

    tok_schema = pa.schema([("bucket", pa.int64()), ("toks", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = token_count(batch[text_col]).to_numpy(zero_copy_only=False)
        return _group_sum(
            pa.table({
                "bucket": pa.array(ids // bucket_size, pa.int64()),
                "toks": pa.array(t.astype(np.int64), pa.int64()),
            }),
            ["bucket"], ["toks"],
        )

    def merge(batch: pa.Table) -> pa.Table:
        return _group_sum(batch.cast(tok_schema), ["bucket"], ["toks"])

    merged, converged = _tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), merge
    )
    if not converged:
        raise ValueError("chunk_corpus: raise bucket_size (bucket table "
                         "did not converge)")
    bt = pa.concat_tables(merged.iter_batches(batch_format="pyarrow"))
    buckets = bt["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = bt["toks"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    buckets, toks = buckets[order], toks[order]
    bases = np.concatenate([[0], np.cumsum(toks)[:-1]])
    lookup_ref = ray.put((buckets, bases))

    def route(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ids // bucket_size
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            text_col: batch[text_col],
            "__shard__": pa.array(b % n_shards, pa.int64()),
        })

    def segments(group: pa.Table) -> pa.Table:
        """Per doc: global start via the broadcast bases, then one
        segment row per chunk the doc touches, token list sliced per
        segment — all vectorized polars list ops."""
        bkts, base_arr = _resolve_broadcast(lookup_ref)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        b = ids // bucket_size
        order = np.lexsort((ids, b))
        ids, b = ids[order], b[order]
        texts = group[text_col].take(pa.array(order, pa.int64()))
        lf = pl.from_arrow(pa.table({"text": texts})).with_columns(
            pl.col("text").str.extract_all(ASCII_TOKEN_RE).alias("toks")
        )
        toks_col = lf["toks"]
        nt = toks_col.list.len().to_numpy().astype(np.int64)
        cs = np.cumsum(nt)
        excl = cs - nt
        starts_seg = np.nonzero(np.concatenate([[True], b[1:] != b[:-1]]))[0]
        seg_of = np.repeat(np.arange(len(starts_seg)), np.diff(
            np.concatenate([starts_seg, [len(b)]])
        ))
        excl = excl - excl[starts_seg][seg_of]
        start = excl + base_arr[np.searchsorted(bkts, b)]
        # explode docs into per-chunk segments
        first = start // ctx_len
        end = start + nt
        last = np.where(nt > 0, (end - 1) // ctx_len, first - 1)
        n_seg = np.maximum(last - first + 1, 0)  # 0-token docs vanish
        doc_idx = np.repeat(np.arange(len(ids)), n_seg)
        seg_no = np.arange(int(n_seg.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(n_seg) - n_seg, n_seg
        )
        chunk = first[doc_idx] + seg_no
        lo = np.maximum(chunk * ctx_len - start[doc_idx], 0)
        hi = np.minimum((chunk + 1) * ctx_len - start[doc_idx], nt[doc_idx])
        seg_start_tok = start[doc_idx] + lo
        out = pl.DataFrame({
            "chunk_id": chunk,
            "start_tok": seg_start_tok,
            "lo": lo,
            "n": hi - lo,
            "toks": toks_col.gather(doc_idx),
        }).with_columns(
            pl.col("toks").list.slice(pl.col("lo"), pl.col("n"))
            .list.join(" ").alias("seg")
        ).select(["chunk_id", "start_tok", "n", "seg"])
        t = out.to_arrow()
        shard = t["chunk_id"].to_numpy(zero_copy_only=False) % n_shards
        return t.append_column("__shard__", pa.array(shard, pa.int64()))

    def reassemble(group: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(group.drop_columns(["__shard__"]))
            .sort(["chunk_id", "start_tok"])
            .group_by("chunk_id", maintain_order=True)
            .agg(
                pl.col("n").sum().alias("n_tokens"),
                pl.col("seg").str.join(" ").alias("text"),
            )
            .to_arrow()
        )
        return out.cast(pa.schema([
            ("chunk_id", pa.int64()), ("n_tokens", pa.int64()),
            ("text", pa.string()),
        ]))

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(segments, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(reassemble, batch_format="pyarrow")
    )


def topk_per_group(ds: ray.data.Dataset, group_col: str, key_col: str,
                   k: int, fanin_rows: int = 2_000_000) -> ray.data.Dataset:
    """Grouped top-k by frequency: for each ``group_col`` value, the ``k``
    most frequent ``key_col`` values with deterministic ties
    (count DESC, key ASC) — the per-group heavy-hitter view a curator
    reads per language/domain (reference analog: GroupBy(attr, TopK)
    stats, exact here because the (group, key) space is bounded).

    Scale shape: per-block (group, key) count partials (whole-block
    combiner), tree-merged, then ONE vectorized pass ranks rows inside
    each group (lexsort + segment boundaries — never per-group Python).
    Output: (group, key, n, rank), rank in [1, k]."""
    schema = pa.schema([
        pa.field(group_col, pa.string()),
        pa.field(key_col, pa.string()),
        pa.field("n", pa.int64()),
    ])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        import pyarrow.compute as pc

        # null group/key rows are excluded (the rank kernel's lexsort
        # can't order None; callers wanting a NULL bucket should
        # fill_null upstream — divergence from SQL GROUP BY documented)
        g = batch[group_col].cast(pa.string())
        key = batch[key_col].cast(pa.string())
        valid = pc.and_(pc.is_valid(g), pc.is_valid(key))
        if not pc.all(valid).as_py():
            g, key = g.filter(valid), key.filter(valid)
        if len(g) == 0:
            return schema.empty_table()
        t = pa.table({
            group_col: g,
            key_col: key,
            "n": pa.array(np.ones(len(g), np.int64)),
        })
        return _group_sum(t, [group_col, key_col], ["n"])

    def merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        return _group_sum(batch.cast(schema), [group_col, key_col], ["n"])

    merged, converged = _tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge, fanin_rows=fanin_rows,
    )
    if not converged:
        merged = merged.groupby([group_col, key_col]).sum("n").map_batches(
            lambda b: b.rename_columns([group_col, key_col, "n"]),
            batch_format="pyarrow",
        )

    def rank(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("rank", pa.array([], pa.int64()))
        g = np.asarray(batch[group_col].to_pylist(), dtype=object)
        key = np.asarray(batch[key_col].to_pylist(), dtype=object)
        n = batch["n"].to_numpy(zero_copy_only=False)
        # sort (group ASC, n DESC, key ASC): within each group segment the
        # first k rows are the answer, rank = position
        order = np.lexsort((key, -n, g))
        g, key, n = g[order], key[order], n[order]
        starts = np.nonzero(np.concatenate([[True], g[1:] != g[:-1]]))[0]
        seg = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(g))))
        pos = np.arange(len(g)) - starts[seg]
        keep = pos < k
        return pa.table({
            group_col: pa.array(g[keep].tolist(), pa.string()),
            key_col: pa.array(key[keep].tolist(), pa.string()),
            "n": pa.array(n[keep], pa.int64()),
            "rank": pa.array((pos[keep] + 1).astype(np.int64), pa.int64()),
        })

    if converged:
        # single bounded block: rank in place, no exchange at all
        return merged.map_batches(rank, batch_format="pyarrow",
                                  batch_size=None)
    # huge case: co-locate each group on one shard (O(n_shards) group
    # calls, CLAUDE.md rule), rank vectorized per shard
    from geomesa_ray.stages.encode import hash_strings

    def add_shard(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch[group_col]).astype(np.int64)
        return batch.append_column("__shard__", pa.array(h % 64, pa.int64()))

    def rank_shard(group: pa.Table) -> pa.Table:
        return rank(group.drop_columns(["__shard__"]))

    return (
        merged.map_batches(add_shard, batch_format="pyarrow",
                           batch_size=None)
        .groupby("__shard__")
        .map_groups(rank_shard, batch_format="pyarrow")
    )
