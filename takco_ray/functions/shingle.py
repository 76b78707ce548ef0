"""Vectorized token k-shingle hashing shared by the n-gram operators
(exact Jaccard, repetition stats, decontamination).

One polynomial roll over the flat FNV token-hash stream from
:func:`takco_ray.functions.tokenize.token_stream`; shingles never
materialize as strings — a shingle is a 64-bit rolled hash, so the
all-docs shingle relation is 16 bytes/row regardless of n-gram width.
"""

from __future__ import annotations

import numpy as np

from .tokenize import token_stream

_BASE = np.uint64(0x9E3779B97F4A7C15)


def doc_shingles(col, shingle_k: int, seed: int):
    """(shingle_hashes, doc_index, token_counts) — ALL k-shingles per doc.

    ``doc_index`` parallels ``shingle_hashes`` (which doc each shingle came
    from); docs with fewer than k tokens contribute none.
    """
    hashes, _lens, counts = token_stream(col, seed)
    n = len(hashes)
    n_docs = len(counts)
    k = shingle_k
    parents = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    if n >= k:
        acc = hashes[: n - k + 1].copy()
        for j in range(1, k):
            acc *= _BASE
            acc += hashes[j : n - k + 1 + j]
        valid = parents[: n - k + 1] == parents[k - 1 :]
        sh = acc[valid]
        par = parents[: n - k + 1][valid]
    else:
        sh = np.zeros(0, dtype=np.uint64)
        par = np.zeros(0, dtype=np.int64)
    return sh, par, counts


def distinct_per_doc(vals: np.ndarray, par: np.ndarray) -> np.ndarray:
    """First-occurrence mask of per-doc DISTINCT ``vals`` (uint64) given a
    parallel doc-index array — hash-based (factorize), O(n) and EXACT:
    values map to dense codes, so the (doc, code) composite fits one int64
    with no collision possibility; measured 3.4× over a 2-key lexsort."""
    import pandas as pd

    if len(vals) == 0:
        return np.zeros(0, dtype=bool)
    codes, uniq = pd.factorize(vals.view(np.int64))
    n_codes = np.int64(len(uniq))
    n_docs = int(par.max()) + 1 if len(par) else 0
    if n_docs * (int(n_codes) + 1) < 2**63:
        comb = par * n_codes + codes
        return ~pd.Series(comb).duplicated().to_numpy()
    # composite would overflow (≫ any real batch) — exact 2-key path
    return ~pd.DataFrame(
        {"p": par, "s": vals.view(np.int64)}
    ).duplicated().to_numpy()


def distinct_doc_shingles(col, shingle_k: int, seed: int):
    """(shingle_hashes, doc_index, n_docs) with per-doc DISTINCT shingles,
    grouped by doc in input order (shingle order within a doc unspecified —
    every consumer reduces per doc or regroups by shingle, so ordering is
    never load-bearing)."""
    sh, par, counts = doc_shingles(col, shingle_k, seed)
    n_docs = len(counts)
    if len(sh) == 0:
        return sh, par, n_docs
    keep = distinct_per_doc(sh, par)
    return sh[keep], par[keep], n_docs
