"""LSH band blocking with explicit skew handling.

The reference blocks via a central ``datasketch.MinHashLSH`` bucket index
(``takco/cluster/matchers/lsh.py:156-186, 215-226``) queried per table, with
giant buckets unhandled (its corpus has 492k-row boilerplate unions —
``docs/tutorials/wikitables.ipynb``). Here blocking is *data*:

1. every file explodes into ``num_bands`` ``(block_key, features)`` rows;
2. a cheap count-only pre-pass finds hot band keys (vendored/boilerplate
   files) and broadcasts them — the "small side" pattern, never re-shipped
   per batch;
3. hot keys are **salted**: each member lands in two overlapping sub-blocks
   (``salt = id % ns`` and ``(id+1) % ns``), so sub-blocks chain-connect
   through shared members and transitive clustering still unifies the block
   without any O(m²) pair explosion;
4. ONE ``groupby`` shuffle generates pairs — via
   :func:`groupmap.partitioned_group_map`, so millions of tiny blocks cost
   numpy segment ops, not per-group Python calls. Oversized blocks emit
   O(m) ring+spoke connectivity pairs; a size-ratio prefilter (the
   reference's filter-matcher semi-join J2, ``cluster.py:399-422``) runs
   before any expensive kernel;
5. cross-band duplicate pairs collapse via a second grouped pass on
   ``pair_key`` (the reference dedups its similarity index the same way,
   ``cluster.py:671``) so the scoring actors see each candidate once.

Partitioning assumption: one hash partition of blocks (~1/num_partitions of
all band rows) fits a task's heap — signatures are ~1 KB/row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .groupmap import partitioned_group_map, segment_boundaries
from .minhash import DEFAULT_NUM_BANDS, DEFAULT_SEED, signatures_to_numpy

# Columns carried through blocking into scoring (content stays behind).
FEATURE_COLUMNS = ["file_id", "path", "size", "lang", "sig"]

_SALT_MIX = np.uint64(0xBF58476D1CE4E5B9)


class _BandExploder:
    """map_batches fn: one input row → num_bands (or 2×) block rows."""

    def __init__(
        self,
        hot_sizes: dict | None,
        num_bands: int = DEFAULT_NUM_BANDS,
        seed: int = DEFAULT_SEED,
        salt_target: int = 512,
    ):
        self.hot_sizes = hot_sizes or {}
        self.num_bands = num_bands
        self.seed = seed
        self.salt_target = salt_target

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        bands = signatures_to_numpy(batch.column("bands"))  # (n, B) int64
        flat_keys = bands.T.reshape(-1).copy()  # band-major
        flat_rows = np.tile(np.arange(n, dtype=np.int64), self.num_bands)

        if self.hot_sizes:
            ids = np.asarray(batch.column("file_id").combine_chunks(), dtype=np.int64)
            hot_arr = np.fromiter(self.hot_sizes.keys(), dtype=np.int64)
            is_hot = np.isin(flat_keys, hot_arr).reshape(self.num_bands, n)
            # cold emissions stay vectorized
            cold = ~is_hot.reshape(-1)
            keys_parts = [flat_keys[cold]]
            rows_parts = [flat_rows[cold]]
            # a hot-block member is hot in ~all bands with the SAME sub-block
            # split (salt = fid % ns); one hot band per row carries the full
            # connectivity, so emit only the FIRST hot band → ~num_bands×
            # fewer duplicate hot rows/pairs
            any_hot = is_hot.any(axis=0)
            first_band = np.argmax(is_hot, axis=0)
            h_keys: list = []
            h_rows: list = []
            for i in np.nonzero(any_hot)[0]:
                k = int(flat_keys[first_band[i] * n + i])
                ns = max(2, -(-2 * self.hot_sizes[k] // self.salt_target))
                fid = int(ids[i])
                for salt in (fid % ns, (fid + 1) % ns):
                    h_rows.append(i)
                    mixed = (k * int(_SALT_MIX) + salt + 1) % (1 << 64)
                    h_keys.append(mixed - (1 << 64) if mixed >= (1 << 63) else mixed)
            if h_keys:
                keys_parts.append(np.asarray(h_keys, dtype=np.int64))
                rows_parts.append(np.asarray(h_rows, dtype=np.int64))
            flat_keys = np.concatenate(keys_parts)
            flat_rows = np.concatenate(rows_parts)

        take = batch.select(list(FEATURE_COLUMNS)).take(pa.array(flat_rows, type=pa.int64()))
        return pa.table(
            {
                "block_key": pa.array(flat_keys, type=pa.int64()),
                **{c: take.column(c) for c in FEATURE_COLUMNS},
            }
        )


def hot_band_keys(
    ds,
    num_bands: int = DEFAULT_NUM_BANDS,
    seed: int = DEFAULT_SEED,
    threshold: int = 512,
) -> dict:
    """Count-only pre-pass → ``{band_key: count}`` for blocks above threshold.

    Shuffles only an 8-byte key column (num_bands per file), then the result
    — a handful of boilerplate keys — is collected and broadcast to the
    exploder (SURVEY.md §4 skew row / A9 block-size stats).
    """

    def local_counts(batch: pa.Table) -> pa.Table:
        # map-side partial count, keeping only keys repeated WITHIN the batch:
        # a globally hot key (count ≫ threshold over ~hundreds of blocks)
        # repeats in nearly every batch, so dropping batch-singletons
        # underestimates its count by at most one per batch — irrelevant at
        # the threshold — while shrinking the count shuffle ~10×
        bands = signatures_to_numpy(batch.column("bands"))
        keys, cnts = np.unique(bands.reshape(-1), return_counts=True)
        rep = cnts >= 2
        return pa.table(
            {
                "band_key": pa.array(keys[rep], type=pa.int64()),
                "n": pa.array(cnts[rep], type=pa.int64()),
            }
        )

    partials = ds.select_columns(["bands"]).map_batches(
        local_counts, batch_format="pyarrow", zero_copy_batch=True
    )

    def hot_in_partition(part: pa.Table) -> pa.Table:
        # final sum per key with numpy segments — Ray's fine-grained
        # groupby.sum over millions of distinct keys is ~50× slower than
        # this partitioned reduction (measured: 167s vs 3.6s on 12M rows)
        k = np.asarray(part.column("band_key").combine_chunks(), dtype=np.int64)
        nv = np.asarray(part.column("n").combine_chunks(), dtype=np.int64)
        starts = segment_boundaries(k)
        sums = np.add.reduceat(nv, starts) if len(k) else np.zeros(0, dtype=np.int64)
        hot_mask = sums > threshold
        return pa.table(
            {
                "band_key": pa.array(k[starts[hot_mask]], type=pa.int64()),
                "n": pa.array(sums[hot_mask], type=pa.int64()),
            }
        )

    from ..util import default_concurrency

    hot_rows = partitioned_group_map(
        partials, "band_key", hot_in_partition, default_concurrency()[1]
    )
    # only boilerplate keys survive the filter — a tiny driver-side dict that
    # the caller broadcasts into the exploder (never re-shipped per batch)
    out: dict = {}
    for row in hot_rows.take_all():
        out[int(row["band_key"])] = int(row["n"])
    return out


def block_size_stats(ds) -> dict:
    """Block-size distribution over all band keys (SURVEY §2.5 A9).

    Count/mean/max plus a log2 histogram — the skew detector feeding the
    salting threshold choice; the reference only logs a reduction factor
    (``takco/cluster/cluster.py:385-390, 411-418``).
    """
    import pyarrow.compute as pc

    def keys_only(batch: pa.Table) -> pa.Table:
        bands = signatures_to_numpy(batch.column("bands"))
        return pa.table({"band_key": pa.array(bands.reshape(-1), type=pa.int64())})

    def count_in_partition(part: pa.Table) -> pa.Table:
        k = np.asarray(part.column("band_key").combine_chunks(), dtype=np.int64)
        starts = segment_boundaries(k)
        cnt = np.diff(np.append(starts, len(k)))
        return pa.table(
            {
                "band_key": pa.array(k[starts], type=pa.int64()),
                "count()": pa.array(cnt, type=pa.int64()),
            }
        )

    from ..util import default_concurrency

    counts = partitioned_group_map(
        ds.select_columns(["bands"]).map_batches(
            keys_only, batch_format="pyarrow", zero_copy_batch=True
        ),
        "band_key",
        count_in_partition,
        default_concurrency()[1],
    )

    def summarize(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch.column("count()").combine_chunks(), dtype=np.int64)
        hist = np.bincount(np.log2(np.maximum(c, 1)).astype(np.int64), minlength=24)[:24]
        return pa.table(
            {
                "n_blocks": pa.array([len(c)], type=pa.int64()),
                "n_rows": pa.array([int(c.sum())], type=pa.int64()),
                "max": pa.array([int(c.max()) if len(c) else 0], type=pa.int64()),
                "hist": pa.array([hist.tolist()]),
            }
        )

    parts = counts.map_batches(summarize, batch_format="pyarrow").take_all()
    hist = np.zeros(24, dtype=np.int64)
    n_blocks = n_rows = mx = 0
    for p in parts:
        n_blocks += p["n_blocks"]
        n_rows += p["n_rows"]
        mx = max(mx, p["max"])
        hist += np.asarray(p["hist"], dtype=np.int64)
    return {
        "n_blocks": int(n_blocks),
        "n_rows": int(n_rows),
        "mean": round(n_rows / max(n_blocks, 1), 2),
        "max": int(mx),
        "log2_histogram": hist.tolist(),
    }


class _PartitionPairEmitter:
    """Partition fn: all blocks hashed to one partition → candidate pairs.

    Receives rows sorted by block_key; resorts by (block_key, file_id) and
    walks equal-key segments with numpy. Small blocks emit all i<j pairs;
    blocks over ``max_block_size`` emit O(m) ring+spoke connectivity pairs
    (sufficient for transitive clustering of a coherent LSH block).
    """

    def __init__(
        self,
        max_block_size: int = 64,
        min_size_ratio: float = 0.4,
        scorer_kwargs: dict | None = None,
    ):
        self.max_block_size = max_block_size
        self.min_size_ratio = min_size_ratio
        # fused mode: score pairs HERE, where both sides' features are local,
        # and emit 32-byte edges instead of ~1 KB feature rows. A real match
        # collides in ~num_bands bands, so the pair-row shuffle ships its
        # features ~8× — recomputing the vectorized kernels per band copy is
        # far cheaper than shipping them (reference analog: filter-then-match
        # J2 fused with match, cluster.py:399-431). The scorer instance holds
        # the compiled DSL + kernels, constructed once per task process.
        self.scorer_kwargs = scorer_kwargs
        self._scorer = None

    def _empty(self, sig_type):
        return _empty_edges_keyed() if self.scorer_kwargs is not None else _empty_pairs(sig_type)

    def __call__(self, part: pa.Table) -> pa.Table:
        keys = np.asarray(part.column("block_key").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        sig_type = part.column("sig").type
        n = len(keys)
        if n == 0:
            return self._empty(sig_type)
        order = np.lexsort((ids, keys))
        keys = keys[order]
        starts = segment_boundaries(keys)
        counts = np.diff(np.append(starts, n))

        ii_parts: list = []
        jj_parts: list = []
        for s, m in zip(starts[counts >= 2], counts[counts >= 2]):
            if m <= self.max_block_size:
                li, lj = np.triu_indices(m, k=1)
            else:
                ring = np.arange(m - 1)
                spokes = np.arange(0, m, 8)[1:]
                li = np.concatenate([ring, np.zeros(len(spokes), dtype=np.int64)])
                lj = np.concatenate([ring + 1, spokes])
            ii_parts.append(li + s)
            jj_parts.append(lj + s)
        if not ii_parts:
            return self._empty(sig_type)
        ii = np.concatenate(ii_parts)
        jj = np.concatenate(jj_parts)

        part = part.take(pa.array(order, type=pa.int64()))
        sizes = np.asarray(part.column("size").combine_chunks(), dtype=np.float64)
        s1, s2 = sizes[ii], sizes[jj]
        ratio = np.minimum(s1, s2) / np.maximum(np.maximum(s1, s2), 1.0)
        keep = ratio >= self.min_size_ratio
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return self._empty(sig_type)
        left = part.take(pa.array(ii, type=pa.int64()))
        right = part.take(pa.array(jj, type=pa.int64()))
        id1 = np.asarray(left.column("file_id").combine_chunks(), dtype=np.int64)
        id2 = np.asarray(right.column("file_id").combine_chunks(), dtype=np.int64)
        # canonical id1 < id2 guaranteed by the per-block sort
        pair_key = (
            id1.view(np.uint64) * _SALT_MIX + id2.view(np.uint64)
        ).view(np.int64)  # 64-bit mix; a collision only drops one candidate
        cols = {
            "pair_key": pa.array(pair_key, type=pa.int64()),
            "id1": pa.array(id1, type=pa.int64()),
            "id2": pa.array(id2, type=pa.int64()),
        }
        for c in ("path", "size", "lang", "sig"):
            cols[f"{c}1"] = left.column(c)
            cols[f"{c}2"] = right.column(c)
        pair_table = pa.table(cols)
        if self.scorer_kwargs is None:
            return pair_table
        if self._scorer is None:
            from .scoring import PairScorer

            self._scorer = PairScorer(**self.scorer_kwargs)
        edges = self._scorer(pair_table)  # (u, v, score), thresholded
        u = np.asarray(edges.column("u").combine_chunks(), dtype=np.int64)
        v = np.asarray(edges.column("v").combine_chunks(), dtype=np.int64)
        pk = (u.view(np.uint64) * _SALT_MIX + v.view(np.uint64)).view(np.int64)
        return edges.append_column("pair_key", pa.array(pk, type=pa.int64()))


def _empty_pairs(sig_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "pair_key": pa.array([], type=pa.int64()),
            "id1": pa.array([], type=pa.int64()),
            "id2": pa.array([], type=pa.int64()),
            "path1": pa.array([], type=pa.string()),
            "path2": pa.array([], type=pa.string()),
            "size1": pa.array([], type=pa.int64()),
            "size2": pa.array([], type=pa.int64()),
            "lang1": pa.array([], type=pa.string()),
            "lang2": pa.array([], type=pa.string()),
            "sig1": pa.array([], type=sig_type),
            "sig2": pa.array([], type=sig_type),
        }
    )


def _empty_edges_keyed() -> pa.Table:
    return pa.table(
        {
            "u": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
            "pair_key": pa.array([], type=pa.int64()),
        }
    )


def _dedup_pairs_partition(part: pa.Table) -> pa.Table:
    """First occurrence per pair_key (rows arrive sorted by pair_key)."""
    keys = np.asarray(part.column("pair_key").combine_chunks(), dtype=np.int64)
    firsts = segment_boundaries(keys)
    return part.take(pa.array(firsts, type=pa.int64()))


def emit_band_rows(
    ds,
    hot_sizes: dict | None = None,
    num_bands: int = DEFAULT_NUM_BANDS,
    seed: int = DEFAULT_SEED,
    salt_target: int = 512,
):
    """files-with-sig Dataset → (block_key, features) rows."""
    return ds.map_batches(
        _BandExploder(hot_sizes, num_bands=num_bands, seed=seed, salt_target=salt_target),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def candidate_pairs(
    ds,
    num_bands: int = DEFAULT_NUM_BANDS,
    seed: int = DEFAULT_SEED,
    hot_threshold: int = 512,
    salt_target: int = 512,
    max_block_size: int = 64,
    min_size_ratio: float = 0.4,
    skip_hot_detection: bool = False,
    num_partitions: int = 64,
    scorer_kwargs: dict | None = None,
):
    """Full blocking: hot-key pre-pass → explode → grouped pair-gen → dedup.

    Default mode returns unique canonical candidate pairs with both sides'
    features attached, ready for the standalone scoring actor pool. With
    ``scorer_kwargs`` (fused mode) the pairs are scored inside the band
    partition and the return value is the deduplicated EDGE dataset
    ``(u, v, score)`` — ~30× fewer shuffled bytes, same results.
    """
    hot = {} if skip_hot_detection else hot_band_keys(
        ds, num_bands=num_bands, seed=seed, threshold=hot_threshold
    )
    bands = emit_band_rows(
        ds, hot, num_bands=num_bands, seed=seed, salt_target=salt_target
    )
    pairs = partitioned_group_map(
        bands,
        "block_key",
        _PartitionPairEmitter(
            max_block_size=max_block_size,
            min_size_ratio=min_size_ratio,
            scorer_kwargs=scorer_kwargs,
        ),
        num_partitions=num_partitions,
    )
    deduped = partitioned_group_map(
        pairs, "pair_key", _dedup_pairs_partition, num_partitions=num_partitions
    )
    if scorer_kwargs is not None:
        deduped = deduped.map_batches(
            lambda t: t.drop_columns(["pair_key"]), batch_format="pyarrow"
        )
    return deduped
