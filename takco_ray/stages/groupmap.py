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

_PK_MIX = np.uint64(0x9E3779B97F4A7C15)


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
