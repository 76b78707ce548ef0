"""Tokenization.

Mirrors the reference's ``default_tokenize`` — lowercase ``\\W+`` split
(``takco/cluster/matchers/matcher.py:23-26``) — applied to source-code
content instead of table cells. The compiled regex is module-level so worker
processes compile it once on import.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str) -> list:
    """Lowercase word tokens of one string."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokenize_many(texts) -> list:
    """Token lists for a column of strings (hot path: one findall per doc)."""
    findall = _TOKEN_RE.findall
    out = []
    for t in texts:
        out.append(findall(t.lower()) if t else [])
    return out


# ---------------------------------------------------------------------------
# Vectorized ASCII token-run scanner (the signature stage's hot path).
#
# For pure-ASCII content, Python-re tokenization and the per-token dict/vocab
# loop dominate the MinHash stage (~0.85 ms/doc measured). This path lowers
# with Arrow (C), classifies word bytes with a 256-entry LUT, and finds token
# runs with np.diff — no per-token Python. Token SEMANTICS are identical to
# ``tokenize`` for ASCII input (``\w`` == ``[0-9A-Za-z_]`` there); non-ASCII
# docs take the regex fallback in the caller.
# ---------------------------------------------------------------------------

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_LUT = np.zeros(256, dtype=bool)
for _c in range(256):
    _WORD_LUT[_c] = chr(_c).isascii() and (chr(_c).isalnum() or chr(_c) == "_")


def _word_mask_lowered(buf: np.ndarray, out: np.ndarray, scratch: np.ndarray) -> None:
    """Word-byte mask of an ascii_lower'ed buffer, written into ``out``.

    After ``ascii_lower`` the word class is exactly ``[0-9a-z_]``, so three
    vectorized compares replace the 256-entry LUT gather: ``np.take`` on a
    byte-indexed LUT runs ~0.4 GB/s (element-loop path) while the
    wraparound-subtract range tests run ~1.3 GB/s (measured, 36 MB batch) —
    the mask was the single hottest step of the token scanner. Equality
    with the LUT over all 256 byte values is pinned by a unit test.
    """
    np.subtract(buf, np.uint8(ord("a")), out=scratch)
    np.less_equal(scratch, np.uint8(25), out=out)
    np.subtract(buf, np.uint8(ord("0")), out=scratch)
    np.logical_or(out, scratch <= np.uint8(9), out=out)
    np.logical_or(out, buf == np.uint8(ord("_")), out=out)


class _Arena:
    """Grow-only per-process scratch buffers for the hot token path.

    The scanner's multi-MB temporaries (word mask, padded hash buffer, word
    gathers) are reallocated per batch otherwise; glibc serves >128 KB
    blocks with mmap, and the resulting munmap + kernel page-zero traffic
    is serialized across worker processes — measured as a multi-worker
    scaling cost. One instance per process (map tasks in a process run
    serially, like ``MinHasher``'s chunk buffer)."""

    def __init__(self):
        self._bufs: dict = {}

    def get(self, name: str, size: int, dtype) -> np.ndarray:
        buf = self._bufs.get(name)
        if buf is None or buf.dtype != np.dtype(dtype) or len(buf) < size:
            cap = size if buf is None else max(size, int(len(buf) * 3 // 2))
            buf = np.empty(cap, dtype=dtype)
            self._bufs[name] = buf
        return buf[:size]


_ARENA = _Arena()


def _merge_sorted(base: np.ndarray, extra: np.ndarray) -> np.ndarray:
    """Merge a sorted array with a small sorted disjoint addition — O(n)
    insert instead of an O(n log n) re-sort."""
    return np.insert(base, np.searchsorted(base, extra), extra)


def ascii_token_runs(col: pa.Array) -> tuple:
    """Lowercased token runs of an all-ASCII string array.

    Returns ``(buf, starts, lengths, parents, n_docs)``: a uint8 view of the
    lowered concatenated content with one NUL separator between docs (so no
    run spans documents), plus per-token start offset, byte length, and
    parent doc index — everything downstream (hashing, shingling) is numpy.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    low = pc.ascii_lower(col)
    if low.null_count:
        low = pc.fill_null(low, "")
    n_docs = len(low)
    buffers = low.buffers()
    raw = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    off_dtype = np.int64 if pa.types.is_large_string(low.type) else np.int32
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[: n_docs + 1].astype(np.int64)
    buf = raw[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    doc_bounds = offsets[1:-1]

    w = _ARENA.get("word_mask", len(buf), bool)
    _word_mask_lowered(buf, w, _ARENA.get("word_scratch", len(buf), np.uint8))
    # ONE transition scan: word/non-word boundaries strictly alternate, so
    # even/odd slices of the transition list are the starts/ends (half the
    # temporaries and scans of separate d==1 / d==-1 passes)
    neq = _ARENA.get("word_neq", max(len(buf) - 1, 0), bool)
    np.not_equal(w[1:], w[:-1], out=neq)
    trans = np.flatnonzero(neq) + 1
    if len(w) and w[0]:
        starts = np.concatenate([[0], trans[1::2]])
        ends = trans[0::2]
    else:
        starts = trans[0::2]
        ends = trans[1::2]
    if len(w) and w[-1]:
        ends = np.concatenate([ends, [len(w)]])
    # a run spanning a doc boundary (last byte of doc i and first byte of
    # doc i+1 both word-class) is split AT the boundary — no buffer copy
    if n_docs > 1 and len(doc_bounds):
        inner = doc_bounds[(doc_bounds > 0) & (doc_bounds < len(w))]
        # unique: an EMPTY doc between two word-adjacent docs repeats the
        # same boundary value — inserting it twice would fabricate a
        # zero-length token
        crossing = np.unique(inner[w[inner - 1] & w[inner]])
        if len(crossing):
            # both sides stay sorted — O(n) merges, not O(n log n) re-sorts
            starts = _merge_sorted(starts, crossing)
            ends = _merge_sorted(ends, crossing)
    lengths = ends - starts
    # ONE binary search per DOC (not per token): split points of the sorted
    # token starts at each doc boundary → parent ids by run-length repeat
    split = np.searchsorted(starts, doc_bounds, side="left")
    per_doc = np.diff(np.concatenate([[0], split, [len(starts)]]))
    parents = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)
    return (
        buf,
        starts.astype(np.int64, copy=False),
        lengths.astype(np.int64, copy=False),
        parents,
        n_docs,
    )


_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_INIT = np.uint64(0xCBF29CE484222325)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def hash_token_runs(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized FNV-1a + splitmix64-finish uint64 hash per token run.

    Iterates over byte POSITIONS (≤ max token length, ~30) instead of tokens,
    so cost is a handful of full-width numpy passes. Same role as
    ``hash64_strings`` (uniform 64-bit token hashes for MinHash) with a
    different — but equally seeded/deterministic — hash family.
    """
    n = len(starts)
    h = np.full(n, _FNV_INIT ^ np.uint64(seed * 0x9E3779B97F4A7C15 & (1 << 64) - 1), dtype=np.uint64)
    if n == 0:
        return h

    # pad so an 8-byte window never runs off the end; the single 1-pass copy
    # replaces the per-gather (n,8) int64 index matrix (64 B/token of pure
    # DRAM churn) and its clamp pass — windows become one contiguous 8-byte
    # row copy per token via sliding_window_view. All multi-MB temporaries
    # come from the grow-only arena (no per-batch mmap churn).
    bufp = _ARENA.get("hash_bufp", len(buf) + 16, np.uint8)
    bufp[: len(buf)] = buf
    bufp[len(buf) :] = 0
    win = np.lib.stride_tricks.sliding_window_view(bufp, 8)

    def _gather_word(st: np.ndarray, ln_clip: np.ndarray) -> np.ndarray:
        """8 bytes at ``st`` as little-endian uint64, masked to ``ln_clip``.

        The gather itself stays a fancy index — ``np.take(..., out=)`` on a
        strided source routes through a ~5× slower element loop (measured
        31 vs 7 ms per 512k tokens); one fresh (n, 8) gather per chunk is
        the cheaper trade. Masking is in place on the gathered words.
        """
        w = win[st].view(np.uint64).reshape(-1)
        np.bitwise_and(w, _LEN_MASK[ln_clip], out=w)
        return w

    # identifiers are almost always ≤16 bytes: hash them as TWO masked
    # uint64 words (one (n,8)-byte gather each) instead of a per-byte
    # Horner loop — ~6× less memory traffic per token, which is what lets
    # 32 concurrent workers scale instead of saturating DRAM. The rare
    # longer tail continues per-byte on just that subset. All full-width
    # steps run IN PLACE on arena buffers: the naive expression form
    # allocates ~7 chunk-sized temporaries per chunk (~56 MB/1M tokens),
    # and that alloc/free churn is serialized across worker processes.
    chunk_n = 1 << 20
    for c0 in range(0, n, chunk_n):
        c1 = min(c0 + chunk_n, n)
        st = starts[c0:c1]
        ln = lengths[c0:c1]
        n_c = c1 - c0
        tmp = _ARENA.get("hash_tmp", n_c * 8, np.uint8).view(np.uint64)
        hc = _gather_word(st, np.minimum(ln, 8))  # becomes h in place
        np.bitwise_xor(hc, h[c0:c1], out=hc)
        hc *= _FNV_PRIME
        np.right_shift(hc, np.uint64(29), out=tmp)
        hc ^= tmp
        over8 = ln > 8
        if over8.any():
            w1 = _gather_word(st + 8, np.minimum(np.maximum(ln - 8, 0), 8))
            np.bitwise_xor(w1, hc, out=w1)
            w1 *= _FNV_PRIME
            np.copyto(hc, w1, where=over8)
        np.multiply(ln.view(np.uint64), _FNV_PRIME, out=tmp)
        hc ^= tmp  # length breaks prefix aliasing
        long_idx = np.flatnonzero(ln > 16)
        if len(long_idx):
            hl = hc[long_idx]
            st_l = st[long_idx]
            ln_l = ln[long_idx]
            for j in range(16, int(ln_l.max())):
                act = ln_l > j
                pos = np.minimum(st_l + j, len(buf) - 1)
                hb = (hl ^ buf[pos].astype(np.uint64)) * _FNV_PRIME
                hl = np.where(act, hb, hl)
            hc[long_idx] = hl
        h[c0:c1] = hc
    # splitmix64-style avalanche, in place with one arena temp
    tmp = _ARENA.get("hash_tmp", n * 8, np.uint8).view(np.uint64)
    np.right_shift(h, np.uint64(30), out=tmp)
    h ^= tmp
    h *= _MIX1
    np.right_shift(h, np.uint64(27), out=tmp)
    h ^= tmp
    h *= _MIX2
    np.right_shift(h, np.uint64(31), out=tmp)
    h ^= tmp
    return h


# byte-length → little-endian keep-mask for the word gather
_LEN_MASK = np.array(
    [0] + [(1 << (8 * i)) - 1 for i in range(1, 8)] + [0xFFFFFFFFFFFFFFFF],
    dtype=np.uint64,
)


def python_token_hashes(text: str, seed: int) -> np.ndarray:
    """Regex-tokenize ONE (possibly non-ASCII) doc and hash each token's
    UTF-8 bytes with the same FNV/splitmix scheme as :func:`hash_token_runs`
    — the fallback path produces identical hashes for identical tokens."""
    return python_token_hashes_lengths(text, seed)[0]


def python_token_hashes_lengths(text: str, seed: int) -> tuple:
    toks = tokenize(text)
    if not toks:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    enc = [t.encode("utf-8", "surrogatepass") for t in toks]
    lens = np.asarray([len(b) for b in enc], dtype=np.int64)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    char_lens = np.asarray([len(t) for t in toks], dtype=np.int64)
    return hash_token_runs(flat, starts, lens, seed), char_lens


def token_stream(col, seed: int) -> tuple:
    """Column of strings → flat ``(hashes, char_lengths, counts)`` per doc.

    The shared vectorized entry for every token-level operator (MinHash,
    quality scoring, language-ID, fingerprints): pure-ASCII batches take the
    numpy run scanner; non-ASCII docs fall back to regex per doc with the
    same hash family. ``counts[d]`` tokens of doc ``d`` occupy one
    contiguous span of the flat arrays, in doc order.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_docs = len(col)
    if n_docs == 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    filled = pc.fill_null(col, "")
    is_ascii = np.asarray(pc.string_is_ascii(filled))
    if is_ascii.all():
        buf, starts, lengths, parents, _ = ascii_token_runs(filled)
        hashes = hash_token_runs(buf, starts, lengths, seed)
        counts = np.bincount(parents, minlength=n_docs).astype(np.int64)
        return hashes, lengths, counts
    per_h: list = [None] * n_docs
    per_l: list = [None] * n_docs
    idx_ascii = np.flatnonzero(is_ascii)
    if len(idx_ascii):
        sub = filled.take(pa.array(idx_ascii, type=pa.int64()))
        buf, starts, lengths, parents, _ = ascii_token_runs(sub)
        sub_h = hash_token_runs(buf, starts, lengths, seed)
        sub_c = np.bincount(parents, minlength=len(idx_ascii))
        ends = np.cumsum(sub_c)
        begins = ends - sub_c
        for j, d in enumerate(idx_ascii):
            per_h[d] = sub_h[begins[j] : ends[j]]
            per_l[d] = lengths[begins[j] : ends[j]]
    for d in np.flatnonzero(~is_ascii):
        h, l = python_token_hashes_lengths(filled[int(d)].as_py() or "", seed)
        per_h[d] = h
        per_l[d] = l
    counts = np.asarray([len(x) for x in per_h], dtype=np.int64)
    hashes = np.concatenate(per_h) if per_h else np.zeros(0, dtype=np.uint64)
    lens = np.concatenate(per_l) if per_l else np.zeros(0, dtype=np.int64)
    return hashes, lens, counts
