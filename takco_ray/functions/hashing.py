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


# ---------------------------------------------------------------------------
# Deterministic epoch-shuffle permutation (Feistel network)
# ---------------------------------------------------------------------------

FEISTEL_BITS = 31
FEISTEL_MASK = (1 << FEISTEL_BITS) - 1
FEISTEL_DOMAIN = 1 << (2 * FEISTEL_BITS)  # bijection domain [0, 2^62)


def feistel_round_constants(rounds: int, seed: int) -> list:
    """Per-round ``(mult, add)`` constants for :func:`feistel_permute`.

    Expanded driver-side with a splitmix64-style generator so the numpy
    kernel and a *generated* SQL oracle inline the SAME literals — the
    engine-independence contract is the constants, not the generator.
    ``mult`` is odd (31-bit), ``add`` 31-bit.
    """
    consts = []
    mask64 = (1 << 64) - 1
    x = (seed * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) & mask64
    for _ in range(int(rounds)):
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask64
        mult = ((x >> 33) | 1) & FEISTEL_MASK
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask64
        add = (x >> 33) & FEISTEL_MASK
        consts.append((int(mult), int(add)))
    return consts


def feistel_permute(ids: np.ndarray, rounds: int = 4, seed: int = 0) -> np.ndarray:
    """Bijective pseudo-random permutation of int64 ids in ``[0, 2^62)``.

    Balanced Feistel network over 31-bit halves — a bijection for ANY round
    function by construction, so a shuffle key never collides for distinct
    ids (unlike a hash): sorting by ``feistel_permute(id)`` is a
    deterministic, seedable, engine-reproducible global shuffle that ships
    no payload bytes. Round function ``F(R) = lo(R·mult + add) XOR
    hi(R·mult + add)`` (31-bit halves of the 62-bit product) — the hi-half
    fold matters: a plain affine ``mod 2^31`` round keeps every low bit
    slice a closed subsystem, making ``key mod 2^k`` a function of
    ``id mod 2^k``. All intermediates fit int64 (operands are 31-bit), so
    numpy int64 and SQL BIGINT agree bit-exactly; the generated-SQL twin
    lives in ``pipelines/queries.py::feistel_sql_cte``.
    """
    v = np.asarray(ids, dtype=np.int64)
    if len(v) and (v.min() < 0 or v.max() >= FEISTEL_DOMAIN):
        raise ValueError("feistel_permute ids must be in [0, 2^62)")
    left = v >> FEISTEL_BITS
    right = v & FEISTEL_MASK
    for mult, add in feistel_round_constants(rounds, seed):
        prod = right * mult + add
        f = (prod & FEISTEL_MASK) ^ (prod >> FEISTEL_BITS)
        left, right = right, left ^ f
    return (left << FEISTEL_BITS) | right
