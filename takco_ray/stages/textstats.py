"""Text-analysis operators for training-data pipelines.

Language-ID (n-gram heuristic), quality scoring (length/punct/stopword
ratios), token counting, and rolling-hash document fingerprinting — the
numeric/type detection heuristics of the reference (numeric-column voting,
``takco/cluster/matchers/lsh.py:124-128``; cell typing,
``takco/link/types.py:121-142``) generalized to document scoring. All are
single zero-copy ``map_batches`` passes; the language profiles are built once
per actor (stateful-stage shape).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import tokenize_many

# Tiny per-language stopword profiles (public common-word lists) — enough for
# a deterministic heuristic; NOT a trained model (none are available here).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "this"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "sich", "auf"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pas", "pour", "dans", "que"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "una", "es", "por", "con"},
    "nl": {"de", "het", "een", "en", "van", "ik", "dat", "is", "niet", "op", "te", "met"},
}

_PUNCT_RE = re.compile(r"[^\w\s]")


def token_counts(ds, text_column: str, id_column: str):
    """(id, n_tokens, n_unique_tokens) — whitespace+\\w tokenizer counts."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenize_many(batch.column(text_column).to_pylist())
        n = pa.array([len(t) for t in toks], type=pa.int64())
        nu = pa.array([len(set(t)) for t in toks], type=pa.int64())
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "n_tokens": n,
                "n_unique_tokens": nu,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(ds, text_column: str, id_column: str):
    """(id, n_chars, punct_ratio, mean_token_len, stopword_ratio, quality).

    ``quality`` ∈ [0,1]: long-enough docs with moderate punctuation, natural
    token lengths and some stopwords score high — the usual cheap pre-filter
    in training-data pipelines. Deterministic, vectorized where pyarrow has
    kernels.
    """
    en = _LANG_PROFILES["en"]

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        toks = tokenize_many(texts)
        n_chars = np.array([len(t or "") for t in texts], dtype=np.float64)
        punct = np.array(
            [len(_PUNCT_RE.findall(t or "")) for t in texts], dtype=np.float64
        )
        punct_ratio = punct / np.maximum(n_chars, 1.0)
        mean_tok = np.array(
            [np.mean([len(w) for w in t]) if t else 0.0 for t in toks], dtype=np.float64
        )
        stop_ratio = np.array(
            [sum(1 for w in t if w in en) / len(t) if t else 0.0 for t in toks],
            dtype=np.float64,
        )
        quality = (
            np.clip(n_chars / 200.0, 0, 1) * 0.25
            + np.clip(1.0 - 4.0 * punct_ratio, 0, 1) * 0.25
            + np.clip(1.0 - np.abs(mean_tok - 5.0) / 5.0, 0, 1) * 0.25
            + np.clip(stop_ratio * 4.0, 0, 1) * 0.25
        )
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "n_chars": pa.array(n_chars.astype(np.int64), type=pa.int64()),
                "punct_ratio": pa.array(np.round(punct_ratio, 6), type=pa.float64()),
                "mean_token_len": pa.array(np.round(mean_tok, 6), type=pa.float64()),
                "stopword_ratio": pa.array(np.round(stop_ratio, 6), type=pa.float64()),
                "quality": pa.array(np.round(quality, 6), type=pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class LanguageId:
    """Actor-pool stage: stopword-profile language scoring per document.

    Profiles are tiny frozensets prepared in ``__init__`` (once per actor);
    each batch is one pass over its token lists. Ties break deterministically
    by profile order; docs with no stopword hits → "und" (undetermined).
    """

    def __init__(self, text_column: str, id_column: str):
        self.text_column = text_column
        self.id_column = id_column
        self.profiles = sorted(_LANG_PROFILES.items())

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = tokenize_many(batch.column(self.text_column).to_pylist())
        langs = []
        confs = []
        for t in toks:
            if not t:
                langs.append("und")
                confs.append(0.0)
                continue
            best_lang, best_hits = "und", 0
            for lang, prof in self.profiles:
                hits = sum(1 for w in t if w in prof)
                if hits > best_hits:
                    best_lang, best_hits = lang, hits
            langs.append(best_lang)
            confs.append(round(best_hits / len(t), 6))
        return pa.table(
            {
                "id": batch.column(self.id_column).cast(pa.int64()),
                "lang_pred": pa.array(langs, type=pa.string()),
                "lang_conf": pa.array(confs, type=pa.float64()),
            }
        )


def language_id(ds, text_column: str, id_column: str, concurrency=None):
    from ..util import default_concurrency

    return ds.map_batches(
        LanguageId,
        fn_constructor_kwargs=dict(text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_concurrency(),
    )


def fingerprints(ds, text_column: str, id_column: str, window: int = 16):
    """(id, fingerprint) — winnowed rolling-hash document fingerprint.

    Rolling polynomial hash over the token-hash stream, min-sampled per
    window (winnowing): near-identical docs share fingerprints, any edit
    changes only nearby windows.
    """
    from ..functions.hashing import hash64_strings

    base = np.uint64(0x100000001B3)

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenize_many(batch.column(text_column).to_pylist())
        out = np.zeros(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            if not t:
                continue
            h = hash64_strings(t, seed=3)
            if len(h) >= 4:
                roll = h[:-3] * base + h[1:-2]
                roll = roll * base + h[2:-1]
                roll = roll * base + h[3:]
            else:
                roll = h
            n_win = max(1, len(roll) // window)
            mins = [roll[w * window : (w + 1) * window].min() for w in range(n_win)]
            acc = np.uint64(0)
            for m in mins:
                acc = acc * base + np.uint64(m)
            out[i] = acc
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "fingerprint": pa.array(out, type=pa.uint64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
