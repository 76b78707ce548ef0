"""Vectorized MinHash signatures over token shingles + LSH band keys.

Semantics mirror the reference's ``LSHMatcher``
(``takco/cluster/matchers/lsh.py:23-247``): ``num_perm=128`` signatures over
the distinct lowercased token units of a document, LSH banding for blocking,
and the Jaccard *estimator* = mean of positional digest equality
(``lsh.py:244``). The implementation is new: instead of datasketch's
per-object SHA1 MinHash, everything is numpy —

- unique tokens per batch are hashed once (blake2b, C-speed),
- k-token shingles are a vectorized polynomial combine of token hashes,
- the 128 permutations are multiply-add universal hashes over the xor-folded
  32-bit shingle stream (SIMD uint32 multiply; positional equality is all the
  estimator tests), minimized per document in an L2-resident chunk buffer.

Determinism: all coefficients come from a seeded ``RandomState``; the same
(seed, num_perm, shingle_k) always yields identical signatures, which is what
lets the fixture generator compute gold block membership independently
(FIXTURES.md §3).
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64_strings
from .tokenize import tokenize_many

# Polynomial base for shingle combination (odd 64-bit constant).
_SHINGLE_BASE = np.uint64(0x9E3779B97F4A7C15)
# Sentinel signature entry for empty documents.
_EMPTY_TOKEN_HASH = np.uint64(0x27D4EB2F165667C5)


class MinHasher:
    """Stateless-per-call, deterministic MinHash signature computer.

    Constructed once per worker/actor (coefficients ~2 KB); ``signatures``
    is called per batch. Equivalent role to ``LSHMatcher.add``
    (``lsh.py:107-144``) but with no shared mutable index — signatures are
    just a column.
    """

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 41):
        self.num_perm = int(num_perm)
        self.shingle_k = int(shingle_k)
        self.seed = int(seed)
        rs = np.random.RandomState(seed)
        # multiply-add universal hash: h_p(x) = a_p * x + b_p  (mod 2^64), a odd
        self.a = (
            rs.randint(0, 2**63, size=self.num_perm).astype(np.uint64) * np.uint64(2)
            + np.uint64(1)
        )
        self.b = rs.randint(0, 2**63, size=self.num_perm).astype(np.uint64) * np.uint64(
            2
        ) + np.uint64(1)
        # 32-bit permutation family (h_p(x) = a32_p·x + b32_p mod 2³², a odd):
        # uint32 multiplies vectorize (vpmulld — uint64 mul is scalar on
        # x86), the L2 working set halves, and positional-equality testing —
        # all MinHash needs — only requires per-position collision ≪ the
        # estimator's own σ (2⁻³² vs σ≈0.04). Derived from the seeded 64-bit
        # family so determinism still flows from (seed, num_perm) alone.
        self.a32 = ((self.a >> np.uint64(32)).astype(np.uint32) | np.uint32(1))[None, :]
        self.b32 = (self.b >> np.uint64(32)).astype(np.uint32)[None, :]
        # per-instance scratch (one instance per worker process; Ray map
        # tasks in a process run serially): fresh ≥256 KB allocations per
        # chunk would mmap/munmap + page-zero every call — measured as a
        # multi-process scaling killer. 512 rows × 128 perms × 4 B = 256 KB
        # stays L2-resident while quartering the Python-loop iterations of
        # the 256-row version (measured 107 → 92 ms per 512k shingles).
        self._chunk_n = 512
        self._vals = np.empty((self._chunk_n, self.num_perm), dtype=np.uint32)
        self._m = np.empty(self.num_perm, dtype=np.uint32)

    # ---- shingling -------------------------------------------------------

    def _shingle_hashes(self, token_hashes: np.ndarray) -> np.ndarray:
        """uint64 hash per k-shingle (rolling polynomial combine), deduplicated."""
        k = self.shingle_k
        n = len(token_hashes)
        if n == 0:
            return np.array([_EMPTY_TOKEN_HASH], dtype=np.uint64)
        if n < k:
            k = n
        acc = token_hashes[: n - k + 1].copy()
        for j in range(1, k):
            acc *= _SHINGLE_BASE
            acc += token_hashes[j : n - k + 1 + j]
        return np.unique(acc)

    def shingles_for_texts(self, texts) -> list:
        """Deduplicated shingle-hash array per text (used by tests/oracles)."""
        token_lists = tokenize_many(texts)
        return self._shingles_from_tokens(token_lists)

    def _shingles_from_tokens(self, token_lists) -> list:
        # same FNV/splitmix token-hash family as the vectorized Arrow path,
        # so both paths produce identical signatures for identical tokens
        from .tokenize import python_token_hashes

        out = []
        for toks in token_lists:
            if toks:
                enc = [t.encode("utf-8", "surrogatepass") for t in toks]
                lens = np.asarray([len(b) for b in enc], dtype=np.int64)
                flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
                starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
                from .tokenize import hash_token_runs

                th = hash_token_runs(flat, starts, lens, self.seed)
            else:
                th = np.zeros(0, dtype=np.uint64)
            out.append(self._shingle_hashes(th))
        return out

    # ---- signatures ------------------------------------------------------

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) uint32 signature matrix for a batch of texts."""
        import pyarrow as pa

        return self.signatures_arrow(pa.array([t or "" for t in texts], type=pa.large_string()))

    def signatures_arrow(self, col) -> np.ndarray:
        """Vectorized signature path for an Arrow string column.

        ASCII docs (the overwhelming case for code) go through the numpy
        token-run scanner — no per-token Python anywhere; non-ASCII docs fall
        back to regex tokenization per doc with the SAME token-hash family,
        so the two paths agree wherever their tokenizations agree (always,
        for ASCII).
        """
        return self.signatures_and_shingles_arrow(col)[0]

    def signatures_and_shingles_arrow(self, col) -> tuple:
        """Signature matrix PLUS the flat shingle stream it was computed
        from — lets a hashed-TF embedding (``functions.featurize``) reuse
        the tokenize+shingle work instead of re-scanning the content."""
        from .tokenize import token_stream

        stream, _lens, counts = token_stream(col, self.seed)
        if len(counts) == 0:
            return (
                np.empty((0, self.num_perm), dtype=np.uint32),
                np.zeros(0, dtype=np.uint64),
                np.zeros(0, dtype=np.int64),
            )
        flat_sh, sh_counts = self._flat_shingles(stream, counts)
        return self.signatures_from_flat(flat_sh, sh_counts), flat_sh, sh_counts

    def _flat_shingles(self, stream: np.ndarray, counts: np.ndarray) -> tuple:
        """Token-hash stream + per-doc counts → (flat shingles, per-doc counts).

        Windows are computed globally with the polynomial combine and masked
        to stay within one doc; short docs (0 < n < k) collapse to a single
        reduced-k shingle, empty docs to the sentinel — matching
        ``_shingle_hashes`` exactly (dedup is skipped: duplicate shingles
        cannot change a min).
        """
        k = self.shingle_k
        n = len(stream)
        n_docs = len(counts)
        pos_parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        if n >= k:
            acc = stream[: n - k + 1].copy()
            for j in range(1, k):
                acc *= _SHINGLE_BASE
                acc += stream[j : n - k + 1 + j]
            valid = pos_parent[: n - k + 1] == pos_parent[k - 1 :]
            sh_stream = acc[valid]
            sh_parent = pos_parent[: n - k + 1][valid]
            sh_counts = np.bincount(sh_parent, minlength=n_docs).astype(np.int64)
        else:
            sh_stream = np.zeros(0, dtype=np.uint64)
            sh_counts = np.zeros(n_docs, dtype=np.int64)
        short = np.flatnonzero((sh_counts == 0))
        if len(short) == 0:
            return sh_stream, sh_counts
        # rare path: docs with < k tokens (one reduced-k shingle or sentinel)
        ends = np.cumsum(counts)
        begins = ends - counts
        inserts = {}
        for d in short:
            toks = stream[begins[d] : ends[d]]
            inserts[int(d)] = self._shingle_hashes(toks)
        out_parts: list = []
        pos = 0
        cum = np.cumsum(sh_counts)
        for d in range(n_docs):
            if d in inserts:
                out_parts.append(inserts[d])
                sh_counts[d] = len(inserts[d])
            else:
                out_parts.append(sh_stream[cum[d] - sh_counts[d] : cum[d]])
        return np.concatenate(out_parts), sh_counts

    def signatures_from_flat(self, flat: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """Chunked per-doc min-reduce over a flat shingle stream.

        uint32 multiply-add in a PREALLOCATED (chunk × num_perm) ≤128 KB
        temporary: SIMD integer multiply, L2-resident, no per-chunk
        allocation (mmap churn + kernel page-zeroing measured as the
        dominant multi-worker scaling cost of the uint64 version). The
        64-bit shingle stream is xor-folded to 32 bits once per batch.
        """
        from .tokenize import _ARENA

        n_docs = len(counts)
        sig = np.empty((n_docs, self.num_perm), dtype=np.uint32)
        if n_docs == 0:
            return sig
        # xor-fold to 32 bits: view the uint64 stream as interleaved uint32
        # lo/hi words (zero-copy strided views) and xor into ONE arena
        # buffer — the previous shift+astype form allocated two stream-sized
        # temporaries per batch
        n_flat = len(flat)
        flat32 = _ARENA.get("mh_flat32", n_flat * 4, np.uint8).view(np.uint32)
        words = np.ascontiguousarray(flat).view(np.uint32)
        np.bitwise_xor(words[0::2], words[1::2], out=flat32)
        a, b = self.a32, self.b32
        chunk_n = self._chunk_n
        vals_buf = self._vals
        m = self._m
        pos = 0
        for d in range(n_docs):
            c = counts[d]
            s = flat32[pos : pos + c]
            pos += c
            acc = sig[d]
            first = True
            for c0 in range(0, len(s), chunk_n):
                chunk = s[c0 : c0 + chunk_n, None]
                v = vals_buf[: len(chunk)]
                np.multiply(chunk, a, out=v)
                v += b
                v.min(axis=0, out=m)
                if first:
                    acc[:] = m
                    first = False
                else:
                    np.minimum(acc, m, out=acc)
        return sig

    def signatures_from_shingles(self, shingle_lists) -> np.ndarray:
        """Per-doc shingle lists → signatures (delegates to the ONE flat
        kernel so every signature path is bit-identical)."""
        n_docs = len(shingle_lists)
        if n_docs == 0:
            return np.empty((0, self.num_perm), dtype=np.uint32)
        counts = np.asarray([len(s) for s in shingle_lists], dtype=np.int64)
        flat = (
            np.concatenate([np.asarray(s, dtype=np.uint64) for s in shingle_lists])
            if counts.sum()
            else np.zeros(0, dtype=np.uint64)
        )
        return self.signatures_from_flat(flat, counts)


def jaccard_from_signatures(sig1: np.ndarray, sig2: np.ndarray) -> np.ndarray:
    """Estimated Jaccard per pair = mean positional equality of signatures.

    Exactly the reference's estimator (``lsh.py:244``:
    ``(digests1 == digests2).mean(1)``). Inputs: (n_pairs, num_perm) uint
    arrays of matching dtype (full uint32 signatures or uint16 transport).
    """
    return (sig1 == sig2).mean(axis=1)


def band_keys(signatures: np.ndarray, num_bands: int, seed: int = 41) -> np.ndarray:
    """(n_docs, num_bands) uint64 LSH band keys.

    Splits each signature into ``num_bands`` bands of ``num_perm/num_bands``
    rows and hashes each band to one uint64 (polynomial combine + band-index
    salt). Blocking then becomes *data*: explode to ``(band_key, id)`` rows
    and ``groupby(band_key)`` — no central ``MinHashLSH`` index
    (contrast ``lsh.py:64-101``'s shared/Redis index, which cannot scale out).
    """
    n_docs, num_perm = signatures.shape
    if num_perm % num_bands != 0:
        raise ValueError(f"num_perm={num_perm} not divisible by num_bands={num_bands}")
    if signatures.dtype != np.uint64:
        # value-preserving upcast: uint32 kernel output and any uint64
        # staging copy (e.g. the fixture generator's) yield identical keys
        signatures = signatures.astype(np.uint64)
    r = num_perm // num_bands
    rs = np.random.RandomState(seed + 1)
    band_salts = (
        rs.randint(0, 2**63, size=num_bands).astype(np.uint64) * np.uint64(2)
        + np.uint64(1)
    )
    out = np.empty((n_docs, num_bands), dtype=np.uint64)
    for bi in range(num_bands):
        acc = signatures[:, bi * r].copy()
        for j in range(1, r):
            acc *= _SHINGLE_BASE
            acc += signatures[:, bi * r + j]
        acc *= band_salts[bi]
        acc += np.uint64(bi)
        out[:, bi] = acc
    return out
