"""Similarity search over embedding columns.

The reference's ``EmbeddingMatcher`` blocks by FAISS ``IndexFlatIP`` top-100
neighbors at cos ≥ 0.9 (``takco/cluster/matchers/embedding.py:109-137,
180-217``). FAISS is not available here; three shapes are provided:

- **brute-force top-k**: the query matrix is broadcast ONCE via ``ray.put``
  and every batch does one numpy matmul against it — the baseline, exact;
- **LSH-bucketed**: random-hyperplane signs bucket the corpus; only
  same-bucket candidates are compared — the all-pairs similarity-join scale
  path (candidates per query drop from N to N/2^bits on average);
- **IVF**: seeded k-means cells + n_probe nearest-cell search — the top-k
  scale path (exactly equal to brute force at full probe).

All stream: the corpus Dataset is never materialized.
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
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float32)
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
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]  # (nq, k)
        # vectorized emit: no per-(query, neighbor) Python loop
        qid = np.repeat(np.asarray(self.query_ids, dtype=np.int64), k)
        flat = top.ravel()
        return pa.table(
            {
                "query_id": pa.array(qid, type=pa.int64()),
                "neighbor_id": pa.array(ids[flat], type=pa.int64()),
                "cosine": pa.array(
                    np.take_along_axis(sims, top, axis=1).ravel(), type=pa.float64()
                ),
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

    Buckets over ``max_bucket`` rows are SALTED the way LSH band blocking
    salts hot blocks (``stages/blocking.py``): each member lands in two
    overlapping sub-buckets (``id % ns`` and ``(id+1) % ns``), bounding the
    O(m²) in-bucket cost while chain-connecting the bucket through shared
    members — no rows are silently dropped. Pairs whose endpoints share no
    sub-bucket are missed (logged recall trade, inherent to salting); pairs
    found in both sub-buckets are deduplicated per partition.
    """
    import logging

    log = logging.getLogger(__name__)

    bucketed = ds.map_batches(
        _HyperplaneBucketer,
        fn_constructor_kwargs=dict(
            dim=dim, bits=bits, seed=seed, id_column=id_column, emb_column=emb_column
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    ).materialize()

    # bucket-size pre-pass: ≤ 2^bits buckets, so the count table is tiny
    sizes = {
        int(r["bucket"]): int(r["count()"])
        for r in bucketed.groupby("bucket").count().take_all()
    }
    hot = {b: c for b, c in sizes.items() if c > max_bucket}
    if hot:
        log.warning(
            "lsh_bucket_neighbors: salting %d hot buckets (sizes %s) — "
            "cross-sub-bucket pairs outside the overlap chain are not emitted",
            len(hot),
            sorted(hot.values(), reverse=True)[:5],
        )
    _MIX = np.uint64(0xBF58476D1CE4E5B9)

    def salt_hot(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch.column("bucket").combine_chunks(), dtype=np.int64)
        ids = np.asarray(batch.column("id").combine_chunks(), dtype=np.int64)
        hot_arr = np.sort(np.fromiter(hot.keys(), dtype=np.int64))
        pos = np.minimum(np.searchsorted(hot_arr, b), len(hot_arr) - 1)
        is_hot = hot_arr[pos] == b
        cold_idx = np.flatnonzero(~is_hot)
        hot_idx = np.flatnonzero(is_hot)
        ns = np.asarray(
            [max(2, -(-2 * hot[int(k)] // max_bucket)) for k in b[hot_idx]],
            dtype=np.int64,
        )
        salts = np.concatenate([ids[hot_idx] % ns, (ids[hot_idx] + 1) % ns])
        hk = np.concatenate([b[hot_idx], b[hot_idx]]).view(np.uint64)
        mixed = (hk * _MIX + salts.view(np.uint64) + np.uint64(1)).view(np.int64)
        take = np.concatenate([cold_idx, hot_idx, hot_idx])
        out = batch.take(pa.array(take, type=pa.int64()))
        new_bucket = np.concatenate([b[cold_idx], mixed])
        return out.set_column(
            out.schema.get_field_index("bucket"),
            "bucket",
            pa.array(new_bucket, type=pa.int64()),
        )

    if hot:
        bucketed = bucketed.map_batches(
            salt_hot, batch_format="pyarrow", zero_copy_batch=True
        )

    def in_partition(part: pa.Table) -> pa.Table:
        """All buckets hashed to one partition (sorted by bucket): exact
        in-bucket pair-gen, then (id1, id2) dedup across salted copies."""
        empty = pa.table(
            {
                "id1": pa.array([], type=pa.int64()),
                "id2": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
        from .groupmap import segment_boundaries, segment_pairs

        bkt = np.asarray(part.column("bucket").combine_chunks(), dtype=np.int64)
        ids_all = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids_all, bkt))
        part = part.take(pa.array(order, type=pa.int64()))
        bkt, ids_all = bkt[order], ids_all[order]
        starts = segment_boundaries(bkt)
        counts = np.diff(np.append(starts, len(bkt)))
        mat = _normalize(_emb_matrix(part, "embedding").astype(np.float64))
        # pair generation in BUCKET-CHUNKS bounded by a pair budget, each
        # chunk threshold-filtered before the next materializes — peak
        # memory is max(budget, largest single bucket's pairs), NOT the
        # sum over all buckets (a partition of 100×5k-vector buckets would
        # otherwise hold ~1.2G pair slots before the first filter). Within
        # a chunk the dot products run in fixed-size slices so the gather
        # stays at ~slice × dim × 16 B.
        from .groupmap import budgeted_segment_pair_chunks

        keep_i1, keep_i2, keep_cos = [], [], []
        for ii, jj in budgeted_segment_pair_chunks(starts, counts):
            sims = np.empty(len(ii), dtype=np.float64)
            chunk = 1 << 18
            for c0 in range(0, len(ii), chunk):
                c1 = min(c0 + chunk, len(ii))
                sims[c0:c1] = np.einsum(
                    "ij,ij->i", mat[ii[c0:c1]], mat[jj[c0:c1]]
                )
            keep = sims >= threshold
            if keep.any():
                keep_i1.append(ids_all[ii[keep]])
                keep_i2.append(ids_all[jj[keep]])
                keep_cos.append(np.round(sims[keep], 6))
        if not keep_i1:
            return empty
        id1 = np.concatenate(keep_i1)
        id2 = np.concatenate(keep_i2)
        cos = np.concatenate(keep_cos)
        o = np.lexsort((id2, id1))
        id1, id2, cos = id1[o], id2[o], cos[o]
        first = np.concatenate(
            [[True], (id1[1:] != id1[:-1]) | (id2[1:] != id2[:-1])]
        )
        return pa.table(
            {
                "id1": pa.array(id1[first], type=pa.int64()),
                "id2": pa.array(id2[first], type=pa.int64()),
                "cosine": pa.array(cos[first], type=pa.float64()),
            }
        )

    from .groupmap import partitioned_group_map

    pairs = partitioned_group_map(
        bucketed, "bucket", in_partition, default_concurrency()[1]
    )
    if not hot:
        return pairs

    # a pair co-occurs in two sub-buckets when id1 ≡ id2 (mod ns); those may
    # land in different partitions, so one more tiny grouped pass dedups
    def add_key(t: pa.Table) -> pa.Table:
        i1 = np.asarray(t.column("id1").combine_chunks(), dtype=np.int64)
        i2 = np.asarray(t.column("id2").combine_chunks(), dtype=np.int64)
        pk = (i1.view(np.uint64) * _MIX + i2.view(np.uint64)).view(np.int64)
        return t.append_column("pair_key", pa.array(pk, type=pa.int64()))

    def dedup_part(part: pa.Table) -> pa.Table:
        i1 = np.asarray(part.column("id1").combine_chunks(), dtype=np.int64)
        i2 = np.asarray(part.column("id2").combine_chunks(), dtype=np.int64)
        o = np.lexsort((i2, i1))
        i1s, i2s = i1[o], i2[o]
        first = np.concatenate(
            [[True], (i1s[1:] != i1s[:-1]) | (i2s[1:] != i2s[:-1])]
        ) if len(i1s) else np.zeros(0, dtype=bool)
        return part.take(pa.array(o[first], type=pa.int64())).drop_columns(["pair_key"])

    return partitioned_group_map(
        pairs.map_batches(add_key, batch_format="pyarrow"),
        "pair_key",
        dedup_part,
        default_concurrency()[1],
    )


def _kmeans(sample: np.ndarray, n_centroids: int, seed: int, n_iter: int = 10) -> np.ndarray:
    """Seeded Lloyd's k-means on an L2-normalized sample (driver-side; the
    sample is small by construction). Returns L2-normalized centroids."""
    rs = np.random.RandomState(seed)
    n = len(sample)
    k = min(n_centroids, n)
    cent = sample[rs.choice(n, size=k, replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ cent.T, axis=1)  # cosine on normalized
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    sample_size: int = 10_000,
    seed: int = 17,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
):
    """IVF approximate top-k: coarse k-means cells + per-cell exact search.

    The scale path beyond brute force (reference: FAISS ``IndexFlatIP``
    blocking, ``takco/cluster/matchers/embedding.py:109-137``, re-expressed
    without FAISS):

    1. a corpus SAMPLE trains seeded k-means centroids on the driver;
    2. one map assigns every corpus vector its nearest-centroid cell
       (centroids broadcast once via ``ray.put``);
    3. each query probes its ``n_probe`` nearest cells; per hash partition
       of cells the probing queries run exact cosine against only that
       cell's vectors (candidates drop ~n_probe/n_centroids);
    4. per-batch partial top-k → small ``groupby(query_id)`` final top-k —
       identical final semantics to :func:`brute_topk` (with
       ``n_probe == n_centroids`` the results are exactly equal).
    """
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    sample_tbl = ds.limit(sample_size).to_pandas()
    sample = _normalize(
        np.stack(sample_tbl[emb_column].to_numpy()).astype(np.float64)
    )
    cent = _kmeans(sample, n_centroids, seed)
    # per-query probe cells (tiny driver-side matrix)
    probe_order = np.argsort(-(qmat @ cent.T), axis=1)[:, : min(n_probe, len(cent))]
    probed_by_cell: dict = {}
    for qi in range(len(qids)):
        for c in probe_order[qi]:
            probed_by_cell.setdefault(int(c), []).append(qi)
    ref = ray.put((cent, qids, qmat, {c: np.asarray(v) for c, v in probed_by_cell.items()}))

    def assign(batch: pa.Table) -> pa.Table:
        cent_, _, _, _ = ray.get(ref)
        mat = _normalize(_emb_matrix(batch, emb_column).astype(np.float64))
        cell = np.argmax(mat @ cent_.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(cell, type=pa.int64()),
                "id": batch.column(id_column).cast(pa.int64()),
                "embedding": batch.column(emb_column),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def search_partition(part: pa.Table) -> pa.Table:
        from .groupmap import segment_boundaries

        _, qids_, qmat_, by_cell = ray.get(ref)
        cells = np.asarray(part.column("cell").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        mat = _normalize(_emb_matrix(part, "embedding").astype(np.float64))
        starts = segment_boundaries(cells)
        counts = np.diff(np.append(starts, len(cells)))
        out_q: list = []
        out_n: list = []
        out_c: list = []
        for s, m in zip(starts, counts):
            probers = by_cell.get(int(cells[s]))
            if probers is None or m == 0:
                continue
            sims = qmat_[probers] @ mat[s : s + m].T  # (n_probers, m)
            kk = min(k, m)
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat(qids_[probers], kk))
            out_n.append(ids[s + top.ravel()])
            out_c.append(np.take_along_axis(sims, top, axis=1).ravel())
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    from .groupmap import partitioned_group_map

    partial = partitioned_group_map(
        assigned, "cell", search_partition, default_concurrency()[1]
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


def quantize_embeddings(ds, id_column: str = "vec_id",
                        emb_column: str = "embedding"):
    """(id, q_embedding int8 fixed-list, scale float32) — symmetric per-
    vector int8 quantization of an L2-normalized embedding column.

    The STORAGE/TRANSPORT rung of the ANN ladder: 4× less object-store,
    shuffle and disk traffic than float32 (8× vs float64) for ~1e-2 cosine
    error on normalized vectors (scale = max|x|/127 per vector). Pure
    projection; pair with :func:`quantized_topk` for the scan. (numpy has
    no int8 GEMM, so the scan dequantizes per batch to float32 — on
    hardware with an int8 kernel the same layout feeds it directly.)
    """

    def fn(batch: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(batch, emb_column).astype(np.float32))
        absmax = np.maximum(np.abs(mat).max(axis=1, keepdims=True), 1e-12)
        scale = (absmax / 127.0).astype(np.float32)
        q = np.clip(np.floor(mat / scale + 0.5), -127, 127).astype(np.int8)
        dim = q.shape[1]
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "q_embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(q.reshape(-1), type=pa.int8()), dim
                ),
                "scale": pa.array(scale.reshape(-1), type=pa.float32()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class _QuantTopK:
    """Actor-pool stage: int8 corpus batches vs the broadcast float32 query
    matrix (queries stay full precision — only the big side is quantized)."""

    def __init__(self, queries_ref, k: int):
        self.query_ids, qmat = ray.get(queries_ref)
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float32))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("q_embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = col.type.list_size
        q = np.asarray(col.values, dtype=np.int8).reshape(len(col), dim)
        scale = np.asarray(batch.column("scale").combine_chunks(), dtype=np.float32)
        ids = np.asarray(batch.column("id").combine_chunks(), dtype=np.int64)
        cmat = q.astype(np.float32) * scale[:, None]  # dequantize: one pass
        sims = self.qmat @ cmat.T
        nq, nb = sims.shape
        k = min(self.k, nb)
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        qid = np.repeat(np.asarray(self.query_ids, dtype=np.int64), k)
        flat = top.ravel()
        return pa.table(
            {
                "query_id": pa.array(qid, type=pa.int64()),
                "neighbor_id": pa.array(ids[flat], type=pa.int64()),
                "cosine": pa.array(
                    np.take_along_axis(sims, top, axis=1).ravel().astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )


def quantized_topk(quant_ds, query_ids, query_matrix, k: int = 10,
                   concurrency=None):
    """Approximate cosine top-k over a :func:`quantize_embeddings` Dataset —
    same partial+final reduction as :func:`brute_topk` (only k·n_queries
    rows shuffle); ranks can differ from exact only where true cosines are
    within the ~1e-2 quantization error (pytest gates recall@k)."""
    ref = ray.put((np.asarray(query_ids), np.asarray(query_matrix)))
    partial = quant_ds.map_batches(
        _QuantTopK,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k),
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
