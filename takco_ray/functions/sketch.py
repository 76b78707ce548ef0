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
    if p < 11 or p > 16:
        raise ValueError(f"p must be in [11, 16] (float64-exact rank), got {p}")
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
