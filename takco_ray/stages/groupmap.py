"""Partition-level grouped map: vectorized many-groups-per-call.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per group — a
Python call plus an Arrow slice per group, which dominates wall time when
there are millions of tiny groups (LSH blocks, CC adjacency lists). This
utility hashes keys into ``num_partitions`` coarse partitions, makes ONE
``map_groups`` call per partition, and hands ``fn`` the partition's rows
sorted by key so it can process every contained group with numpy segment
operations (``np.flatnonzero(np.diff(keys))`` boundaries, ``reduceat``).

The shuffle cost is identical to the fine-grained groupby (same sort-based
exchange); only the per-group Python overhead disappears.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PK_MIX = np.uint64(0x9E3779B97F4A7C15)
_NULL_KEY_HASH = np.int64(-0x61C8864680B583EB)


def group_key_hash(col) -> np.ndarray:
    """Vectorized int64 hash of an arbitrary-typed key column.

    Dictionary-encodes the column (the per-batch dictionary is small even
    when the batch is wide), hashes only the dictionary values, and gathers
    per row — no per-row Python hashing. Nulls map to a fixed sentinel so
    they co-partition like any other key.
    """
    import pandas as pd

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(arr)
    codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.full(len(codes), _NULL_KEY_HASH, dtype=np.int64)
    if len(enc.dictionary):
        dv = enc.dictionary.to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(dv, categorize=False).astype(np.uint64).view(np.int64)
        m = codes >= 0
        out[m] = h[codes[m]]
    return out


def partitioned_group_map_any(ds, key: str, fn, num_partitions: int = 64):
    """Partition-level grouped map for ARBITRARY key dtypes (strings etc.).

    Routes every row of a key to one hash partition (via
    :func:`group_key_hash`) and applies ``fn`` ONCE per partition, like
    :func:`partitioned_group_map` — the shape that replaces one-Python-call-
    per-group ``map_groups`` in the many-tiny-groups regime. Unlike the
    int64 variant, rows arrive UNSORTED and 64-bit hash collisions between
    distinct keys are possible: ``fn`` must group on the real key column
    (e.g. ``pc.dictionary_encode`` codes or an Arrow sort), never on hash
    value runs.
    """

    def add_pk(t: pa.Table) -> pa.Table:
        hk = group_key_hash(t.column(key)).view(np.uint64)
        pk = ((hk * _PK_MIX) >> np.uint64(33)) % np.uint64(num_partitions)
        return t.append_column("__pk", pa.array(pk.astype(np.int64), type=pa.int64()))

    def per_partition(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["__pk"]))

    return (
        ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pk")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def partitioned_group_map(ds, key: str, fn, num_partitions: int = 64):
    """Apply ``fn(table)`` once per hash partition of ``key``.

    ``fn`` receives a pyarrow.Table sorted ascending by ``key`` (the ``__pk``
    helper column already dropped) holding all rows of every key hashed into
    that partition, and returns a pyarrow.Table.

    Partition count trades task granularity against per-task overhead; keys
    are mixed before the modulo so sequential ids spread evenly.
    """

    def add_pk(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key).combine_chunks(), dtype=np.int64)
        pk = ((k.view(np.uint64) * _PK_MIX) >> np.uint64(33)) % np.uint64(num_partitions)
        return t.append_column("__pk", pa.array(pk.astype(np.int64), type=pa.int64()))

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__pk"])
        k = np.asarray(g.column(key).combine_chunks(), dtype=np.int64)
        order = np.argsort(k, kind="stable")
        if not np.array_equal(order, np.arange(len(k))):
            g = g.take(pa.array(order, type=pa.int64()))
        return fn(g)

    return (
        ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pk")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def segment_boundaries(sorted_keys: np.ndarray) -> np.ndarray:
    """Start offsets of each equal-key run in a sorted key array."""
    if len(sorted_keys) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(
        [[0], np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1]
    ).astype(np.int64)


# triu templates for the most common tiny block sizes are cached; larger
# templates are rebuilt per call (a 512-wide template is ~2 MB — caching
# every size would hold ~350 MB per worker for no measurable win)
_TRIU_CACHE_MAX = 64
_TRIU_CACHE: dict = {}


def _triu_template(m: int) -> tuple:
    tpl = _TRIU_CACHE.get(m)
    if tpl is None:
        li, lj = np.triu_indices(m, k=1)
        tpl = (li.astype(np.int64), lj.astype(np.int64))
        if m <= _TRIU_CACHE_MAX:
            _TRIU_CACHE[m] = tpl
    return tpl


def segment_pairs(
    starts: np.ndarray,
    counts: np.ndarray,
    max_block_size: int | None = None,
    oversize: str = "ring",
) -> tuple:
    """Vectorized i<j pair indices across ALL equal-key segments at once.

    The naive ``for (start, size) in segments`` loop costs one Python
    iteration per block — with millions of 2-member LSH blocks per partition
    that loop IS the hot path. Here same-size segments are batched: segments
    are sorted by size and each distinct size present gets ONE broadcast-add
    of its triu template over all its segment starts, so Python iteration
    count is ≤ number of distinct sizes (≤ max_block_size), independent of
    block count.

    Segments larger than ``max_block_size`` (when given) emit O(m)
    connectivity pairs instead of the O(m²) triangle: ``"ring"`` chains
    consecutive members; ``"ring_spoke"`` adds every-8th spokes to member 0
    (faster transitive collapse for hot blocks). Returns ``(ii, jj)`` int64
    arrays of global row indices with ii < jj within each segment.
    """
    sel = counts >= 2
    st = starts[sel]
    cn = counts[sel]
    if len(st) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    ii_parts: list = []
    jj_parts: list = []
    small = cn <= max_block_size if max_block_size is not None else np.ones(len(cn), dtype=bool)
    st_s, cn_s = st[small], cn[small]
    if len(st_s):
        order = np.argsort(cn_s, kind="stable")
        st_s, cn_s = st_s[order], cn_s[order]
        size_bounds = segment_boundaries(cn_s)
        size_ends = np.append(size_bounds[1:], len(cn_s))
        for b0, b1 in zip(size_bounds, size_ends):
            m = int(cn_s[b0])
            li, lj = _triu_template(m)
            seg = st_s[b0:b1, None]
            ii_parts.append((seg + li[None, :]).reshape(-1))
            jj_parts.append((seg + lj[None, :]).reshape(-1))
    # oversized blocks are rare by construction (hot keys are salted before
    # this point) — a per-block loop over them is fine
    for s, m in zip(st[~small], cn[~small]):
        ring = np.arange(m - 1, dtype=np.int64)
        if oversize == "ring_spoke":
            spokes = np.arange(0, m, 8, dtype=np.int64)[1:]
            li = np.concatenate([ring, np.zeros(len(spokes), dtype=np.int64)])
            lj = np.concatenate([ring + 1, spokes])
        else:
            li, lj = ring, ring + 1
        ii_parts.append(li + s)
        jj_parts.append(lj + s)
    return np.concatenate(ii_parts), np.concatenate(jj_parts)


def segment_cross_pairs(
    a_starts: np.ndarray,
    a_counts: np.ndarray,
    b_starts: np.ndarray,
    b_counts: np.ndarray,
) -> tuple:
    """Vectorized RECTANGULAR (A×B) pair indices across all segments at once
    — the bipartite analog of :func:`segment_pairs` for cross-corpus joins:
    segment ``g`` contributes ``a_counts[g] · b_counts[g]`` pairs, flattened
    with one repeat + one div/mod, no per-segment Python."""
    p = (a_counts * b_counts).astype(np.int64)
    total = int(p.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    seg_of = np.repeat(np.arange(len(p), dtype=np.int64), p)
    off = np.concatenate([[0], np.cumsum(p)[:-1]])
    intra = np.arange(total, dtype=np.int64) - off[seg_of]
    bc = b_counts[seg_of]
    ii = a_starts[seg_of] + intra // bc
    jj = b_starts[seg_of] + intra % bc
    return ii, jj


def budgeted_segment_pair_chunks(starts, counts, budget: int = 1 << 21):
    """Yield ``(ii, jj)`` pair-index arrays for consecutive segment groups
    whose total pair count stays within ``budget`` — so callers can filter
    each chunk before the next materializes and peak memory is
    ``max(budget, largest single segment)`` instead of the sum over all
    segments. A single oversize segment still emits whole (exactness needs
    it); shared by the SimHash Hamming filter and the embedding-LSH cosine
    filter so the chunk-boundary rule lives in one place."""
    pair_counts = counts * (counts - 1) // 2
    s = 0
    while s < len(starts):
        e, tot = s, 0
        while e < len(starts) and (tot == 0 or tot + pair_counts[e] <= budget):
            tot += int(pair_counts[e])
            e += 1
        ii, jj = segment_pairs(starts[s:e], counts[s:e], max_block_size=None)
        s = e
        if len(ii):
            yield ii, jj
