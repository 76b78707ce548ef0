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


def distinct_doc_shingles(col, shingle_k: int, seed: int):
    """(shingle_hashes, doc_index, n_docs) with per-doc DISTINCT shingles,
    sorted by (doc, shingle)."""
    sh, par, counts = doc_shingles(col, shingle_k, seed)
    n_docs = len(counts)
    order = np.lexsort((sh, par))
    sh, par = sh[order], par[order]
    if len(sh):
        first = np.concatenate([[True], (par[1:] != par[:-1]) | (sh[1:] != sh[:-1])])
        sh, par = sh[first], par[first]
    return sh, par, n_docs
