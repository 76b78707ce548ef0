"""Deterministic hashed-shingle embeddings + row-wise cosine.

The reference's ``EmbeddingMatcher`` (``takco/cluster/matchers/embedding.py:
222-246``) scores candidate pairs by cosine over fastText vectors and feeds
the score into the matcher-aggregation DSL. No model ships in this
environment, so the embedding here is **signed feature hashing** (Weinberger
et al., ICML 2009) over the SAME shingle-hash stream the MinHash stage
already computes: each k-token shingle lands in bucket ``h mod dim`` with
sign ``±1`` from a high hash bit, and the per-document TF vector is
L2-normalized. That is a real, standard text featurizer — cosine over it is
TF-weighted n-gram similarity, a genuinely different signal from the
MinHash *set* Jaccard (it sees repetition and relative frequency), and it is
deterministic from (seed, shingle_k, dim) alone, so both engines of a test
can recompute it bit-identically.
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Finalizer remix: decorrelates bucket/sign bits from the MinHash use
    of the same shingle hashes."""
    x = x + _MIX1
    x = (x ^ (x >> np.uint64(30))) * _MIX2
    x = (x ^ (x >> np.uint64(27))) * _MIX3
    return x ^ (x >> np.uint64(31))


def hashed_embedding_from_shingles(
    flat_shingles: np.ndarray, counts: np.ndarray, dim: int
) -> np.ndarray:
    """(flat shingle-hash stream, per-doc counts) → (n_docs, dim) float32.

    Vectorized end-to-end: one remix, one ``bincount`` scatter with ±1
    weights, one norm. Documents with zero shingles come out as zero
    vectors (cosine against anything = 0 by convention of
    :func:`cosine_rows`).
    """
    n_docs = len(counts)
    if n_docs == 0:
        return np.empty((0, dim), dtype=np.float32)
    x = _splitmix64(flat_shingles.astype(np.uint64))
    bucket = (x % np.uint64(dim)).astype(np.int64)
    sign = 1.0 - 2.0 * ((x >> np.uint64(63)) & np.uint64(1)).astype(np.float64)
    parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    idx = parent * dim + bucket
    vec = np.bincount(idx, weights=sign, minlength=n_docs * dim).reshape(n_docs, dim)
    norms = np.linalg.norm(vec, axis=1, keepdims=True)
    return (vec / np.maximum(norms, 1e-12)).astype(np.float32)


def cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity of two (n, d) matrices; 0 where either
    row has zero norm. float64 accumulation regardless of input dtype."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / den
    return np.where(den > 0, out, 0.0)
