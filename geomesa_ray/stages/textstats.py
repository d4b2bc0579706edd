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


def token_count(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized \\w+ token count (Arrow RE2 kernel — matches DuckDB's
    ``len(regexp_extract_all(text, '\\w+'))`` semantics)."""
    return pc.count_substring_regex(texts, TOKEN_RE)


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


class Fingerprinter:
    """map_batches stage: add ``fingerprint`` (uint64 hash of the winnowed
    sketch) — cheap whole-doc copy detector."""

    def __init__(self, text_col: str = "text", k: int = 8, window: int = 16):
        self.text_col = text_col
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = []
        for t in batch[self.text_col].to_pylist():
            sketch = winnow_fingerprint(t or "", self.k, self.window)
            acc = np.uint64(0xCBF29CE484222325)
            for v in sketch:
                acc = (acc ^ np.uint64(v)) * np.uint64(0x100000001B3)
            fps.append(int(acc.astype(np.int64)))
        return batch.append_column("fingerprint", pa.array(fps, pa.int64()))
