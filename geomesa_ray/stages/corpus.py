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
