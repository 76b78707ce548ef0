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


def sha256_hex_arrow(col) -> list:
    """sha256 hexdigest per row of an Arrow string column, hashed directly
    from the column's UTF-8 value buffer via memoryview slices — no Python
    string materialization or re-encode on the hot path (content is
    multi-KB; ``to_pylist`` would copy every byte twice)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    sha = hashlib.sha256
    empty_digest = sha(b"").hexdigest()
    buffers = col.buffers()
    if n == 0:
        return []
    if buffers[2] is None:
        return [empty_digest] * n
    import numpy as np

    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[col.offset : col.offset + n + 1]
    mv = memoryview(buffers[2])
    if col.null_count == 0:
        return [sha(mv[offsets[i] : offsets[i + 1]]).hexdigest() for i in range(n)]
    valid = np.asarray(col.is_valid())
    return [
        sha(mv[offsets[i] : offsets[i + 1]]).hexdigest() if valid[i] else empty_digest
        for i in range(n)
    ]


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
