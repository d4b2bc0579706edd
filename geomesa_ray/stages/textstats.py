"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All vectorized or bounded-state per batch; heavy
setup (stopword tables, compiled regexes) happens once per actor.

These mirror what a web-scale training-data pipeline needs over the
``documents``/``pages`` tables; the converter-expression analogs of the
reference (geomesa-convert .../transforms/StringFunctionFactory.scala) cover
the plain string ops, these add the corpus-level analyses.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# small built-in stopword profiles (top function words; public knowledge)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "that", "for", "was",
           "on", "with", "as", "are", "this", "at", "be", "by", "have", "not"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "zu", "den", "von", "für", "auf", "im", "des", "sich", "dem", "als"},
    "fr": {"le", "la", "les", "et", "est", "des", "un", "une", "du", "que",
           "pour", "dans", "qui", "par", "sur", "pas", "au", "avec", "ce"},
    "es": {"el", "la", "los", "las", "y", "es", "de", "que", "un", "una",
           "en", "por", "con", "para", "del", "se", "no", "al", "su", "como"},
    "pt": {"o", "a", "os", "as", "e", "é", "de", "que", "um", "uma", "em",
           "por", "com", "para", "do", "da", "não", "se", "ao", "como"},
}

TOKEN_RE = r"\w+"

# GPT-2-style pre-tokenizer, restricted to RE2 (no lookahead): common
# English contraction suffixes, then space-prefixed letter runs, digit
# runs, and punctuation runs. Whitespace itself is not a token. Byte-level
# BPE would split these further, but the COUNT at this granularity is the
# standard "tokens before merges" estimate — and the identical RE2 runs in
# DuckDB, so the count is oracle-verifiable.
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+"


def token_count(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized \\w+ token count (Arrow RE2 kernel — matches DuckDB's
    ``len(regexp_extract_all(text, '\\w+'))`` semantics)."""
    return pc.count_substring_regex(texts, TOKEN_RE)


def bpe_token_count(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized BPE-pre-tokenizer token count (see ``BPE_TOKEN_RE``) —
    the LLM-token budget estimate a data curator filters on."""
    return pc.count_substring_regex(texts, BPE_TOKEN_RE)


class QualityScorer:
    """map_batches stage: per-doc quality signals + a composite score.

    Signals: n_chars, n_tokens, mean token length, alpha ratio, digit
    ratio, punctuation ratio, uppercase ratio, stopword ratio (any
    language), max-line-length share. Score = weighted bounded signals in
    [0, 1] (heuristic, documented; the value is determinism not linguistics).
    """

    def __init__(self, text_col: str = "text"):
        import pyarrow.compute as _pc  # noqa: F401

        self.text_col = text_col
        all_stop = sorted(set().union(*_STOPWORDS.values()))
        self.stop_pattern = r"\b(" + "|".join(all_stop) + r")\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]

        def cnt(pattern, source=None):
            return (
                pc.count_substring_regex(source if source is not None else col, pattern)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )

        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        chars_nz = np.maximum(n_chars, 1).astype(np.float64)
        n_tokens_f = cnt(TOKEN_RE)
        n_tokens = n_tokens_f.astype(np.int64)
        toks_nz = np.maximum(n_tokens_f, 1.0)
        word_chars = cnt(r"\w")
        mean_tok = np.where(n_tokens_f > 0, word_chars / toks_nz, 0.0)
        alpha = cnt(r"[A-Za-z]") / chars_nz
        digit = cnt(r"[0-9]") / chars_nz
        upper = cnt(r"[A-Z]") / chars_nz
        punct = cnt(r"""[.,;:!?'"()\-]""") / chars_nz
        stop = cnt(self.stop_pattern, pc.utf8_lower(col)) / toks_nz
        # composite: reward stopword presence + sane token lengths; penalize
        # digit/punct/upper-heavy text (C4/Gopher-style heuristics)
        score = (
            0.35 * np.clip(stop / 0.4, 0, 1)
            + 0.25 * np.clip(1 - np.abs(mean_tok - 4.5) / 4.5, 0, 1)
            + 0.20 * np.clip(alpha / 0.7, 0, 1)
            + 0.10 * (1 - np.clip(digit / 0.2, 0, 1))
            + 0.10 * (1 - np.clip(punct / 0.25, 0, 1))
        )
        out = batch
        for name, arr, typ in [
            ("n_chars_q", n_chars, pa.int64()),
            ("n_tokens", n_tokens, pa.int64()),
            ("mean_token_len", mean_tok, pa.float64()),
            ("alpha_ratio", alpha, pa.float64()),
            ("digit_ratio", digit, pa.float64()),
            ("punct_ratio", punct, pa.float64()),
            ("upper_ratio", upper, pa.float64()),
            ("stopword_ratio", stop, pa.float64()),
            ("quality_score", score, pa.float64()),
        ]:
            out = out.append_column(name, pa.array(arr, typ))
        return out


class LanguageID:
    """map_batches stage: stopword-profile language guesser, fully
    vectorized — one RE2 count kernel per language over the whole batch
    plus Unicode-block counts for zh/ja/ru. Emits ``lang_pred`` and
    ``lang_conf``. Deterministic, dependency-free. Per-language alternation
    patterns compile once per actor (the stateful-setup contract).
    """

    def __init__(self, text_col: str = "text"):
        import pyarrow.compute as pc  # noqa: F401 (used in __call__)

        self.text_col = text_col
        self.langs = sorted(_STOPWORDS)
        self.patterns = {
            lang: r"\b(" + "|".join(sorted(sw)) + r")\b"
            for lang, sw in _STOPWORDS.items()
        }
        self.script_patterns = {
            "zh": r"[一-鿿]",
            "ja": r"[぀-ヿ]",
            "ru": r"[Ѐ-ӿ]",
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.utf8_lower(batch[self.text_col])
        n_tokens = np.maximum(
            pc.count_substring_regex(texts, TOKEN_RE).to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        n_chars = np.maximum(
            pc.utf8_length(batch[self.text_col]).to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)

        scores = np.stack(
            [
                pc.count_substring_regex(texts, self.patterns[lang])
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                / n_tokens
                for lang in self.langs
            ],
            axis=1,
        )  # (n, L)
        script = {
            name: pc.count_substring_regex(batch[self.text_col], pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            / n_chars
            for name, pat in self.script_patterns.items()
        }

        best_i = np.argmax(scores, axis=1)
        best_score = scores[np.arange(len(scores)), best_i]
        preds = np.where(
            best_score > 0.02, np.asarray(self.langs, dtype=object)[best_i], "und"
        ).astype(object)
        confs = best_score.copy()
        # script votes override stopword profiles (checked most-specific first)
        for name, thresh in (("ja", 0.05), ("zh", 0.15), ("ru", 0.25)):
            hit = script[name] > thresh
            preds[hit] = name
            confs[hit] = 1.0
        return batch.append_column(
            "lang_pred", pa.array(preds.tolist(), pa.string())
        ).append_column("lang_conf", pa.array(confs, pa.float64()))


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> list[int]:
    """Winnowing document fingerprint: min rolling k-gram hash per window
    (Schleimer et al. 2003). Deterministic; used for copy detection."""
    data = text.encode("utf-8", "ignore")
    if len(data) < k:
        return []
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    base = np.uint64(1099511628211)
    n = len(arr)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash design
        pw = np.empty(k, dtype=np.uint64)
        pw[0] = 1
        for i in range(1, k):
            pw[i] = pw[i - 1] * base
        h = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            h += arr[j : n - k + 1 + j] * pw[k - 1 - j]
    if len(h) <= window:
        return [int(h.min())]
    # sliding-window min with positions; dedupe consecutive picks
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(h, window)
    mins = win.min(axis=1)
    out, prev = [], None
    for v in mins.tolist():
        if v != prev:
            out.append(int(v))
            prev = v
    return out


def _sliding_min(h: np.ndarray, w: int) -> np.ndarray:
    """O(n) sliding-window minimum (van Herk / Gil-Werman): block-wise
    forward and backward running minima combined per window."""
    n = len(h)
    nwin = n - w + 1
    if nwin <= 0:
        return np.empty(0, h.dtype)
    pad = (-n) % w
    hp = np.concatenate([h, np.full(pad, np.iinfo(h.dtype).max, h.dtype)])
    blocks = hp.reshape(-1, w)
    fwd = np.minimum.accumulate(blocks, axis=1).ravel()
    bwd = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(bwd[:nwin], fwd[w - 1 : w - 1 + nwin])


class Fingerprinter:
    """map_batches stage: add ``fingerprint`` (uint64 digest of the winnowed
    sketch) — cheap whole-doc copy detector.

    Fully vectorized across the batch: one rolling-hash pass over the
    concatenated byte stream (reusing the dedup shingle kernel), one global
    sliding-window minimum, then a segmented XOR fold of the mixed sketch
    values per document (order-independent digest; equal texts get equal
    fingerprints, which is the contract copy-detection needs).
    """

    def __init__(self, text_col: str = "text", k: int = 8, window: int = 16):
        self.text_col = text_col
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        from numpy.lib.stride_tricks import sliding_window_view

        from geomesa_ray.stages.dedup import _shingle_hashes

        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        hashes, offsets = _shingle_hashes(texts, self.k)
        n = len(texts)
        fps = np.full(n, np.int64(np.uint64(0xCBF29CE484222325).astype(np.int64)))
        if len(hashes):
            w = self.window
            counts = np.diff(offsets)
            m = len(hashes)
            # global sliding min, then a cumsum mask of per-doc valid window
            # start positions (window fully inside the doc's segment)
            if m >= w:
                sw = _sliding_min(hashes, w)
                delta = np.zeros(len(sw) + 1, dtype=np.int32)
                long_docs = counts > w
                starts_l = offsets[:-1][long_docs]
                ends_l = (offsets[1:] - w + 1)[long_docs]
                np.add.at(delta, starts_l, 1)
                np.add.at(delta, ends_l, -1)
                valid = np.cumsum(delta[:-1]) > 0
                pos = np.nonzero(valid)[0]
                segs_v = np.searchsorted(offsets, pos, side="right") - 1
                mins_v = sw[pos]
                # winnowing dedupe: keep segment-firsts and value changes
                keep = np.empty(len(pos), dtype=bool)
                if len(pos):
                    keep[0] = True
                    keep[1:] = (mins_v[1:] != mins_v[:-1]) | (
                        segs_v[1:] != segs_v[:-1]
                    )
                mins_v, segs_v = mins_v[keep], segs_v[keep]
            else:
                mins_v = np.empty(0, np.uint64)
                segs_v = np.empty(0, np.int64)
            # short docs (0 < count ≤ w): single min over the whole segment
            short = (counts > 0) & (counts <= w)
            if short.any():
                segs_s = np.nonzero(short)[0].astype(np.int64)
                mins_s = np.array(
                    [
                        hashes[int(offsets[d]) : int(offsets[d + 1])].min()
                        for d in segs_s
                    ],
                    dtype=np.uint64,
                )
            else:
                mins_s = np.empty(0, np.uint64)
                segs_s = np.empty(0, np.int64)
            allmins = np.concatenate([mins_v, mins_s])
            segs = np.concatenate([segs_v, segs_s])
            order = np.argsort(segs, kind="stable")
            allmins, segs = allmins[order], segs[order]
            if len(allmins):
                # splitmix-style mix, then segmented XOR fold
                with np.errstate(over="ignore"):  # uint64 wraparound by design
                    z = allmins * np.uint64(0x9E3779B97F4A7C15)
                    z ^= z >> np.uint64(29)
                    z = z * np.uint64(0xBF58476D1CE4E5B9)
                    z ^= z >> np.uint64(32)
                starts = np.unique(segs, return_index=True)[1]
                folded = np.bitwise_xor.reduceat(z, starts)
                docs = segs[starts]
                fps[docs] = folded.astype(np.int64)
        return batch.append_column("fingerprint", pa.array(fps, pa.int64()))
