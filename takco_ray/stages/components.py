"""Distributed connected components (transitive clustering).

The reference clusters its similarity graph **on the driver** with igraph
Louvain (``takco/cluster/cluster.py:74-106``) after concatenating all edges
driver-side (``takco/__init__.py:367-374``) — its scaling wall. The north
rule asks for *transitive* clustering, which is exactly connected
components, so this stage implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) as iterated hash-partitioned ``groupby(node).map_groups`` passes
over the edge Dataset — edges never touch the driver.

- **large-star**: for each node u, link every neighbor v > u to the minimum
  of Γ(u) ∪ {u};
- **small-star**: orient edges to (hi → lo), link every neighbor (and u) to
  the minimum;
- converge when the edge multiset is stable (checked by a count + uint64
  checksum aggregate — O(1) driver data per round);
- each round materializes (bounded lineage ≈ a per-round checkpoint);
  O(log n) rounds for worst-case chains, 2-3 in practice for clone clusters.

Output: ``(file_id, cluster_id)`` with ``cluster_id = min(file_id in
component)`` — the same canonical labeling the brute-force oracle uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFn

_CHECK_MIX = np.uint64(0x9E3779B97F4A7C15)


def _edge_table(u: np.ndarray, v: np.ndarray) -> pa.Table:
    return pa.table(
        {"u": pa.array(u, type=pa.int64()), "v": pa.array(v, type=pa.int64())}
    )


def _symmetrize(batch: pa.Table) -> pa.Table:
    u = np.asarray(batch.column("u").combine_chunks(), dtype=np.int64)
    v = np.asarray(batch.column("v").combine_chunks(), dtype=np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    return _edge_table(np.concatenate([u, v]), np.concatenate([v, u]))


def _orient_down(batch: pa.Table) -> pa.Table:
    """(hi → lo) orientation for small-star; drops self-loops."""
    u = np.asarray(batch.column("u").combine_chunks(), dtype=np.int64)
    v = np.asarray(batch.column("v").combine_chunks(), dtype=np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    return _edge_table(hi, lo)


def _large_star_group(group: pa.Table) -> pa.Table:
    u = int(group.column("u")[0].as_py())
    nbrs = np.asarray(group.column("v").combine_chunks(), dtype=np.int64)
    m = min(int(nbrs.min()), u)
    out_v = nbrs[nbrs > u]
    return _edge_table(out_v, np.full(len(out_v), m, dtype=np.int64))


def _small_star_group(group: pa.Table) -> pa.Table:
    u = int(group.column("u")[0].as_py())
    nbrs = np.asarray(group.column("v").combine_chunks(), dtype=np.int64)
    m = min(int(nbrs.min()), u)
    targets = np.unique(np.concatenate([nbrs, np.array([u], dtype=np.int64)]))
    targets = targets[targets != m]
    return _edge_table(targets, np.full(len(targets), m, dtype=np.int64))


def _checksum(ds) -> tuple:
    """(n_edges, uint64 checksum) — order-insensitive fixpoint detector."""

    def add_check(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("u").combine_chunks(), dtype=np.int64)
        v = np.asarray(batch.column("v").combine_chunks(), dtype=np.int64)
        c = (
            u.view(np.uint64) * _CHECK_MIX + v.view(np.uint64)
            if len(u)
            else np.zeros(0, dtype=np.uint64)
        )
        # fold to one scalar per batch, summed mod 2^64 across batches
        return pa.table(
            {
                "n": pa.array([len(u)], type=pa.int64()),
                "c": pa.array([int(c.sum(dtype=np.uint64))], type=pa.uint64()),
            }
        )

    parts = ds.map_batches(add_check, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    c = 0
    for p in parts:
        c = (c + int(p["c"])) % (1 << 64)
    return n, c


def connected_components(edges, max_rounds: int = 50):
    """Edge Dataset (u, v[, score]) → labels Dataset (file_id, cluster_id).

    Nodes appearing only in self-edges (or not at all) keep their own id;
    callers union singleton self-edges first if every input row must be
    labeled (reference's identity edges, ``takco/__init__.py:367-370``).
    """
    cur = edges.map_batches(_orient_down, batch_format="pyarrow", zero_copy_batch=True)
    cur = cur.groupby("u").map_groups(_small_star_group, batch_format="pyarrow")
    prev_sig = None
    for _round in range(max_rounds):
        large = (
            cur.map_batches(_symmetrize, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("u")
            .map_groups(_large_star_group, batch_format="pyarrow")
        )
        small = (
            large.map_batches(_orient_down, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("u")
            .map_groups(_small_star_group, batch_format="pyarrow")
        )
        cur = small.materialize()  # bounded lineage: per-round barrier
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # fixpoint: (child → root) star edges. Roots have no outgoing edge, so
    # union in (root, root) self-labels before the per-node min.
    def as_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "file_id": t.column("u").cast(pa.int64()),
                "cluster_id": t.column("v").cast(pa.int64()),
            }
        )

    def root_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "file_id": t.column("v").cast(pa.int64()),
                "cluster_id": t.column("v").cast(pa.int64()),
            }
        )

    children = cur.map_batches(as_labels, batch_format="pyarrow")
    roots = cur.map_batches(root_labels, batch_format="pyarrow")
    return (
        children.union(roots)
        .groupby("file_id")
        .min("cluster_id")
        .map_batches(
            lambda t: pa.table(
                {
                    "file_id": t.column("file_id").cast(pa.int64()),
                    "cluster_id": t.column("min(cluster_id)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def attach_singletons(labels, all_ids):
    """labels ∪ (id, id) for ids absent from any edge → total labeling.

    ``all_ids``: Dataset with a ``file_id`` column. Equivalent to the
    reference's identity-edge union (``takco/__init__.py:367-370``) but as a
    groupby-min instead of a driver concat.
    """
    self_labels = all_ids.map_batches(
        lambda t: pa.table(
            {
                "file_id": t.column("file_id").cast(pa.int64()),
                "cluster_id": t.column("file_id").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        labels.union(self_labels)
        .groupby("file_id")
        .min("cluster_id")
        .map_batches(
            lambda t: pa.table(
                {
                    "file_id": t.column("file_id").cast(pa.int64()),
                    "cluster_id": t.column("min(cluster_id)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
