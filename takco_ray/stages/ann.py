"""Similarity search over embedding columns.

The reference's ``EmbeddingMatcher`` blocks by FAISS ``IndexFlatIP`` top-100
neighbors at cos ≥ 0.9 (``takco/cluster/matchers/embedding.py:109-137,
180-217``). FAISS is not available here; the same two shapes are provided:

- **brute-force top-k**: the query matrix is broadcast ONCE via ``ray.put``
  and every batch does one numpy matmul against it — the baseline, exact;
- **LSH-bucketed**: random-hyperplane signs bucket the corpus; only
  same-bucket candidates are compared — the scale path (candidates per query
  drop from N to N/2^bits on average).

Both stream: the corpus Dataset is never materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..util import default_concurrency


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-12)


def _emb_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        return np.asarray(col.values).reshape(len(col), col.type.list_size)
    # variable list<float>: offsets are uniform in practice; reshape via flatten
    flat = np.asarray(col.flatten(), dtype=np.float32)
    dim = len(flat) // len(col)
    return flat.reshape(len(col), dim)


class _BruteTopK:
    """Actor-pool stage holding the broadcast, L2-normalized query matrix."""

    def __init__(self, queries_ref, k: int, id_column: str, emb_column: str):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qmat = q
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.id_column = id_column
        self.emb_column = emb_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        cmat = _normalize(_emb_matrix(batch, self.emb_column).astype(np.float64))
        ids = np.asarray(batch.column(self.id_column).combine_chunks(), dtype=np.int64)
        sims = self.qmat @ cmat.T  # (n_queries, n_batch)
        nq, nb = sims.shape
        k = min(self.k, nb)
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi in range(nq):
            for ci in top[qi]:
                rows["query_id"].append(int(self.query_ids[qi]))
                rows["neighbor_id"].append(int(ids[ci]))
                rows["cosine"].append(float(sims[qi, ci]))
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "cosine": pa.array(rows["cosine"], type=pa.float64()),
            }
        )


def brute_topk(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
    concurrency=None,
):
    """Exact cosine top-k of each query against the corpus Dataset.

    Per-batch local top-k then a small ``groupby(query_id)`` final top-k —
    the classic partial+final reduction; only k·n_queries rows shuffle.
    """
    ref = ray.put((np.asarray(query_ids), np.asarray(query_matrix)))
    partial = ds.map_batches(
        _BruteTopK,
        fn_constructor_kwargs=dict(
            queries_ref=ref, k=k, id_column=id_column, emb_column=emb_column
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_concurrency(),
    )

    def final_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[("cosine", "descending"), ("neighbor_id", "ascending")],
        )
        out = group.take(order[:k])
        rank = pa.array(np.arange(1, len(out) + 1), type=pa.int64())
        return out.append_column("rank", rank)

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def cosine_above(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    threshold: float,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
):
    """All (query_id, neighbor_id, cosine ≥ threshold) pairs — SQL-oracle-able
    (threshold sets membership, so no rank tie-breaking enters the compare).
    """
    ref = ray.put(
        (np.asarray(query_ids), _normalize(np.asarray(query_matrix, dtype=np.float64)))
    )

    def fn(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(ref)
        cmat = _normalize(_emb_matrix(batch, emb_column).astype(np.float64))
        ids = np.asarray(batch.column(id_column).combine_chunks(), dtype=np.int64)
        sims = qmat @ cmat.T
        qi, ci = np.nonzero(sims >= threshold)
        return pa.table(
            {
                "query_id": pa.array(qids[qi], type=pa.int64()),
                "neighbor_id": pa.array(ids[ci], type=pa.int64()),
                "cosine": pa.array(np.round(sims[qi, ci], 6), type=pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class _HyperplaneBucketer:
    """Random-hyperplane LSH bucket id per embedding (stateful: planes)."""

    def __init__(self, dim: int, bits: int, seed: int, id_column: str, emb_column: str):
        rs = np.random.RandomState(seed)
        self.planes = rs.normal(size=(dim, bits))
        self.id_column = id_column
        self.emb_column = emb_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, self.emb_column).astype(np.float64)
        signs = (mat @ self.planes) > 0  # (n, bits)
        weights = (1 << np.arange(signs.shape[1], dtype=np.uint64))
        bucket = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pa.table(
            {
                "id": batch.column(self.id_column).cast(pa.int64()),
                "bucket": pa.array(bucket.view(np.int64), type=pa.int64()),
                "embedding": batch.column(self.emb_column),
            }
        )


def lsh_bucket_neighbors(
    ds,
    dim: int,
    bits: int = 8,
    seed: int = 13,
    threshold: float = 0.8,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
    max_bucket: int = 4096,
):
    """Approximate neighbor pairs via hyperplane-LSH bucketing.

    groupby(bucket) → in-bucket exact cosine ≥ threshold. Recall is tunable
    with ``bits`` (fewer bits = bigger buckets = higher recall); the scale
    path when the query set IS the corpus (all-pairs similarity join).
    """
    bucketed = ds.map_batches(
        _HyperplaneBucketer,
        fn_constructor_kwargs=dict(
            dim=dim, bits=bits, seed=seed, id_column=id_column, emb_column=emb_column
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    )

    def in_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id1": pa.array([], type=pa.int64()),
                "id2": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
        m = len(group)
        if m < 2:
            return empty
        if m > max_bucket:
            group = group.slice(0, max_bucket)
            m = max_bucket
        import pyarrow.compute as pc

        order = pc.sort_indices(group.column("id"))
        group = group.take(order)
        mat = _normalize(_emb_matrix(group, "embedding").astype(np.float64))
        ids = np.asarray(group.column("id").combine_chunks(), dtype=np.int64)
        sims = mat @ mat.T
        ii, jj = np.triu_indices(m, k=1)
        keep = sims[ii, jj] >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {
                "id1": pa.array(ids[ii[keep]], type=pa.int64()),
                "id2": pa.array(ids[jj[keep]], type=pa.int64()),
                "cosine": pa.array(np.round(sims[ii[keep], jj[keep]], 6), type=pa.float64()),
            }
        )

    return bucketed.groupby("bucket").map_groups(in_bucket, batch_format="pyarrow")
