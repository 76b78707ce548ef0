"""HyperLogLog approximate-distinct sketch (Flajolet et al. 2007, with the
small-range linear-counting correction from the HLL++ paper).

The scale path for COUNT(DISTINCT) at 100 TB: exact distinct shuffles every
distinct key; HLL shuffles ``m = 2^p`` one-byte registers per group per
batch (4 KB at p=12, σ ≈ 1.04/√m ≈ 1.6 %), merged with an elementwise max
— associative and idempotent, so partial sketches combine in any order and
re-merging a retried block is harmless (exactly-once not required).
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of an int64/uint64 key array."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * _MIX1
    z = (z ^ (z >> np.uint64(27))) * _MIX2
    return z ^ (z >> np.uint64(31))


def hll_registers(keys: np.ndarray, p: int = 12) -> np.ndarray:
    """Dense uint8 register array (length 2^p) for a key batch.

    Register index = top ``p`` hash bits; rank = leading zeros of the
    remaining ``64-p`` bits + 1. The remainder has ``64-p`` bits, so it fits
    float64's 53-bit mantissa exactly when ``p >= 11`` — below that the
    log2-based rank can round up near powers of two, so p is validated.
    """
    if p < 11 or p > 18:
        # lower bound is correctness (float64-exact rank needs 64-p ≤ 53);
        # upper bound is only memory (2^18 registers = 256 KB per sketch)
        raise ValueError(f"p must be in [11, 18] (float64-exact rank / memory), got {p}")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(keys) == 0:
        return regs
    h = splitmix64(np.asarray(keys))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rank = np.empty(len(h), dtype=np.uint8)
    nz = w > 0
    rank[nz] = ((64 - p) - np.floor(np.log2(w[nz].astype(np.float64)))).astype(np.uint8)
    rank[~nz] = 64 - p + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected cardinality estimate with linear counting for the
    small range (the regime where raw HLL is biased high)."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# Bloom filter — space-bounded set membership (Bloom 1970, double hashing per
# Kirsch & Mitzenmacher 2006: position_i = h1 + i·h2 mod m needs only two
# independent 64-bit hashes for k probe positions).
#
# The scale path for decontamination-style membership when the reference set
# outgrows a broadcast sorted array: at 10 bits/key the filter is ~8× smaller
# than the int64 hash array it replaces (1e9 benchmark shingles: 1.25 GB vs
# 8 GB), with FP rate (1 - e^{-kn/m})^k ≈ 0.9 % at k=7 — and NO false
# negatives, so a Bloom "clean" verdict is exact and only flagged docs would
# ever need an exact recheck.
# ---------------------------------------------------------------------------


def bloom_params(n_keys: int, bits_per_key: int = 10) -> tuple:
    """(n_bits, k) sized for ``n_keys``: m = n·bits_per_key rounded up to a
    64-bit word, k = round(m/n · ln2) clamped to [1, 16]."""
    m = max(64, ((max(n_keys, 1) * bits_per_key + 63) // 64) * 64)
    k = int(round(m / max(n_keys, 1) * 0.6931471805599453))
    return m, min(max(k, 1), 16)


def _bloom_positions(keys: np.ndarray, i: int, n_bits: np.uint64) -> tuple:
    """Word index + bit mask of probe ``i`` for each key (double hashing)."""
    h1 = splitmix64(keys)
    h2 = splitmix64(h1) | np.uint64(1)  # odd → full-period stepping
    pos = (h1 + np.uint64(i) * h2) % n_bits
    return (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63))


def bloom_build(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """uint64 bitmap (length n_bits/64) with ``k`` probes set per key.

    Merging partial filters is a bitwise OR — associative and idempotent,
    so per-partition builds combine in any order (same contract as
    :func:`hll_merge`)."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    bitmap = np.zeros(n_bits // 64, dtype=np.uint64)
    if len(keys) == 0:
        return bitmap
    m = np.uint64(n_bits)
    for i in range(k):
        word, bit = _bloom_positions(keys, i, m)
        # np.bitwise_or.at is an element-loop ufunc: fine on the BUILD side
        # (reference sets are the small side); the probe side stays gathers
        np.bitwise_or.at(bitmap, word, bit)
    return bitmap


def bloom_probe(bitmap: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership per key — vectorized gathers, no per-key loop.

    True may be a false positive (rate set by sizing); False is exact."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    m = np.uint64(len(bitmap) * 64)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(k):
        word, bit = _bloom_positions(keys, i, m)
        np.logical_and(hit, (bitmap[word] & bit) != 0, out=hit)
        if not hit.any():
            break
    return hit


def mg_compress(keys: np.ndarray, counts: np.ndarray, k: int) -> tuple:
    """Misra-Gries compression of an exact (keys, counts) relation to ≤ k
    counters plus the undercount bound it introduces.

    If more than ``k`` keys are present, the (k+1)-th largest count is
    subtracted from every counter and non-positive counters drop — the
    classic space-saving step. Returns ``(keys, residual_counts, err)``:
    every surviving counter undercounts its true frequency by at most
    ``err``, and any key with true frequency > err is guaranteed to
    survive. Sketches MERGE by concatenating (key, count) rows, summing
    per key, adding the ``err`` bounds, and re-compressing — associative,
    so partial sketches combine in any order.
    """
    if len(keys) <= k:
        return keys, counts, 0
    order = np.argsort(counts, kind="stable")[::-1]
    thresh = int(counts[order[k]])
    residual = counts - thresh
    keep = residual > 0
    return keys[keep], residual[keep], thresh


def kll_compress(values: np.ndarray, weights: np.ndarray, cap: int) -> tuple:
    """Deterministic KLL-style compression of a weighted quantile sketch to
    ≤ ``cap`` points.

    Points carry power-of-two weights (level = log2(w)). While too many
    points are held, the lowest populated level is compacted: its points are
    sorted and every other one survives with doubled weight — the offset is
    the level's parity bit instead of KLL's coin flip, trading the
    randomized guarantee's constants for bit-reproducibility (this repo's
    contract: engines and retries must agree). Total weight is conserved up
    to the dropped alternates, whose rank displacement is ≤ half the
    compacted level's weight span — the classic deterministic-GK-style
    bound, validated empirically by the pytest gate.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    while len(values) > cap:
        w_min = weights.min()
        lvl = int(w_min).bit_length() - 1
        sel = weights == w_min
        if sel.sum() < 2:
            # single lightest point: promote it so progress is guaranteed
            weights = weights.copy()
            weights[np.argmax(sel)] *= 2
            continue
        v_lvl, rest_v = values[sel], values[~sel]
        w_lvl, rest_w = weights[sel], weights[~sel]
        order = np.argsort(v_lvl, kind="stable")
        v_lvl = v_lvl[order]
        keep = np.arange(len(v_lvl)) % 2 == (lvl & 1)
        values = np.concatenate([rest_v, v_lvl[keep]])
        weights = np.concatenate([rest_w, np.full(int(keep.sum()), w_min * 2,
                                                  dtype=np.int64)])
    return values, weights


def kll_quantile(values: np.ndarray, weights: np.ndarray, q: float):
    """Weighted quantile of a sketch: smallest value whose cumulative
    weight reaches ``ceil(q * W)`` (quantile_disc semantics on weights)."""
    if len(values) == 0:
        return None
    order = np.argsort(values, kind="stable")
    v, w = values[order], weights[order]
    cum = np.cumsum(w)
    total = cum[-1]
    target = max(1, int(np.ceil(q * total)))
    idx = int(np.searchsorted(cum, target))
    return v[min(idx, len(v) - 1)]
