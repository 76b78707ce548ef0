"""Deterministic content hashing.

The reference derives ids from content hashes (``takco/table.py:212,218-225``:
``headerId`` = SHA-224 of the stringified header; ``_id`` = ``hash(head+body)``).
At 10^12-file scale global ordinal ids (the reference's serial cumsum,
``takco/util.py:83-96``) are anti-scalable, so every id here is a
deterministic 64-bit content / key hash (SURVEY.md §2.5 A3).

All hashes are seed-stable across processes (hashlib, not Python ``hash``).
"""

from __future__ import annotations

import hashlib

import numpy as np


def hash64_bytes(data: bytes, seed: int = 0) -> int:
    """Stable 64-bit hash of a byte string (blake2b, 8-byte digest)."""
    h = hashlib.blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash64_strings(values, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash per string. Vector version of :func:`hash64_bytes`.

    Python loop over items, but each call is C-speed hashlib; used only on
    *unique* tokens / short key strings, never per-shingle (shingle hashing is
    the vectorized polynomial combine in :mod:`minhash`).
    """
    salt = seed.to_bytes(8, "little")
    out = np.empty(len(values), dtype=np.uint64)
    blake = hashlib.blake2b
    for i, v in enumerate(values):
        if v is None:
            v = ""
        out[i] = int.from_bytes(
            blake(v.encode("utf-8", "surrogatepass"), digest_size=8, salt=salt).digest(),
            "little",
        )
    return out


def sha256_hex(values) -> list:
    """sha256 hexdigest per string — the per-row content invariant column.

    Matches DuckDB's ``sha256(text)`` so the driver oracle can verify it.
    """
    out = []
    sha = hashlib.sha256
    for v in values:
        if v is None:
            v = ""
        out.append(sha(v.encode("utf-8", "surrogatepass")).hexdigest())
    return out


def stable_file_id(repo, path, commit) -> np.ndarray:
    """Deterministic int64 file id from the (repo, path, commit) key.

    Replaces the reference's global contiguous numbering
    (``takco/__init__.py:210-217``) with an order-independent id so no serial
    pass is ever needed. Collisions are ~n²/2⁶⁵ — negligible below 10^9 rows
    per key-space and checked in tests. int64 (bit-reinterpreted) because
    Ray Data's sort-based shuffle handles signed keys natively.
    """
    keys = [f"{r}\x00{p}\x00{c}" for r, p, c in zip(repo, path, commit)]
    return hash64_strings(keys, seed=0xF11E).view(np.int64)
