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

from .groupmap import partitioned_group_map, segment_boundaries, segment_pairs
from .minhash import DEFAULT_NUM_BANDS, DEFAULT_SEED, signatures_to_numpy

# Columns carried through blocking into scoring (content stays behind).
FEATURE_COLUMNS = ["file_id", "path", "size", "lang", "sig"]

_SALT_MIX = np.uint64(0xBF58476D1CE4E5B9)


def _sorted_member_mask(sorted_arr: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``keys`` in a SORTED int64 array."""
    if len(sorted_arr) == 0:
        return np.zeros(len(keys), dtype=bool)
    pos = np.searchsorted(sorted_arr, keys)
    pos = np.minimum(pos, len(sorted_arr) - 1)
    return sorted_arr[pos] == keys


# ---------------------------------------------------------------------------
# Bloom-filtered active set: the memory-bounded scale path.
#
# Below ``max_active_keys`` the active band-key set broadcasts exactly (8 B
# per key). Above it, a fixed-size Bloom filter over the same keys broadcasts
# instead — capped at 2^33 bits (1 GiB) no matter how many keys exist, so the
# ~2x singleton-row shuffle cut SURVIVES 100-TB corpora instead of silently
# disabling. A false positive only admits a band row whose key heads a
# singleton block, and singleton blocks emit zero pairs in the grouped
# pair-gen — so the candidate-pair output is bit-identical to the exact path
# by construction (tested by forcing ``max_active_keys=1``). This beats the
# naive "semi-join band rows against the >=2-count key set" shape, which
# would either shuffle the ~300 B feature rows a second time or filter inside
# the pair-gen exchange where the shuffle cost has already been paid.
# ---------------------------------------------------------------------------

_BLOOM_HASHES = 4
_BLOOM_MAX_LOG2BITS = 33  # 1 GiB bit array: bounded broadcast at any corpus
_BLOOM_BITS_PER_KEY = 10  # ~1.2% FP at k=4; an FP costs one shuffled row


def _bloom_log2bits(expected_keys: int) -> int:
    bits = max(64, _BLOOM_BITS_PER_KEY * max(1, int(expected_keys)))
    return min(_BLOOM_MAX_LOG2BITS, int(np.ceil(np.log2(bits))))


def _bloom_hash_pair(keys: np.ndarray) -> tuple:
    """splitmix64 finalize → (h1, h2) for double hashing (Kirsch-Mitzenmacher)."""
    x = keys.view(np.uint64) if keys.dtype == np.int64 else keys.astype(np.uint64)
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return x, (x >> np.uint64(32)) | np.uint64(1)


def bloom_from_keys(keys: np.ndarray, log2bits: int) -> np.ndarray:
    """Allocate a bloom (uint64 words) and insert ``keys``."""
    bits = np.zeros(1 << max(0, log2bits - 6), dtype=np.uint64)
    bloom_insert(bits, log2bits, keys)
    return bits


def bloom_insert(bits: np.ndarray, log2bits: int, keys: np.ndarray) -> None:
    if len(keys) == 0:
        return
    mask = np.uint64((1 << log2bits) - 1)
    h1, h2 = _bloom_hash_pair(keys)
    for i in range(_BLOOM_HASHES):
        idx = (h1 + np.uint64(i) * h2) & mask
        word = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (idx & np.uint64(63))
        np.bitwise_or.at(bits, word, bit)


def bloom_contains(bits: np.ndarray, log2bits: int, keys: np.ndarray) -> np.ndarray:
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    mask = np.uint64((1 << log2bits) - 1)
    h1, h2 = _bloom_hash_pair(keys)
    ok = np.ones(len(keys), dtype=bool)
    for i in range(_BLOOM_HASHES):
        idx = (h1 + np.uint64(i) * h2) & mask
        word = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (idx & np.uint64(63))
        ok &= (bits[word] & bit) != 0
    return ok


def _active_member_mask(active, keys: np.ndarray) -> np.ndarray:
    """Membership against either representation of the active-key set."""
    if isinstance(active, tuple) and active and active[0] == "bloom":
        return bloom_contains(active[1], active[2], keys)
    return _sorted_member_mask(active, keys)


class _BandExploder:
    """map_batches fn: one input row → ≤num_bands (+salted) block rows.

    ``active_ref``: ray.put'd SORTED int64 array of band keys with global
    count ≥ 2 (from :func:`band_key_stats`). Keys outside it head singleton
    blocks — they can generate no pairs, so their rows are dropped HERE,
    before the wide shuffle (~2× volume cut on mostly-singleton corpora).
    Broadcast once via the object store, read zero-copy per task.

    Hot keys are salted fully vectorized; a row belonging to several
    *distinct* hot keys emits a salted pair per key (dedup is by (row, key),
    not first-band — membership in two different hot blocks is preserved).
    """

    def __init__(
        self,
        hot_sizes: dict | None,
        num_bands: int = DEFAULT_NUM_BANDS,
        seed: int = DEFAULT_SEED,
        salt_target: int = 512,
        active_ref=None,
        extra_feature_cols: tuple = (),
    ):
        self.hot_sizes = hot_sizes or {}
        self.num_bands = num_bands
        self.seed = seed
        self.salt_target = salt_target
        self.active_ref = active_ref
        # explicit opt-in keeps the wide shuffle pruned: only named extras
        # (e.g. the scorer's optional "emb" channel column) ride along
        self.extra_feature_cols = tuple(extra_feature_cols)
        if self.hot_sizes:
            self._hot_arr = np.sort(np.fromiter(self.hot_sizes.keys(), dtype=np.int64))
            cnts = np.asarray(
                [self.hot_sizes[int(k)] for k in self._hot_arr], dtype=np.int64
            )
            self._hot_ns = np.maximum(2, -(-2 * cnts // self.salt_target))
        else:
            self._hot_arr = np.zeros(0, dtype=np.int64)
            self._hot_ns = np.zeros(0, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        bands = signatures_to_numpy(batch.column("bands"))  # (n, B) int64
        flat_keys = bands.T.reshape(-1).copy()  # band-major
        flat_rows = np.tile(np.arange(n, dtype=np.int64), self.num_bands)

        if self.active_ref is not None:
            import ray as _ray

            active = _ray.get(self.active_ref)  # zero-copy plasma view
            keep = _active_member_mask(active, flat_keys)
            flat_keys, flat_rows = flat_keys[keep], flat_rows[keep]

        if len(self._hot_arr):
            ids = np.asarray(batch.column("file_id").combine_chunks(), dtype=np.int64)
            is_hot = _sorted_member_mask(self._hot_arr, flat_keys)
            hk, hr = flat_keys[is_hot], flat_rows[is_hot]
            flat_keys, flat_rows = flat_keys[~is_hot], flat_rows[~is_hot]
            if len(hk):
                # dedup (row, key): a hot-block member collides in ~all bands
                # under the SAME key — one salted emission per distinct key
                order = np.lexsort((hk, hr))
                hk, hr = hk[order], hr[order]
                first = np.concatenate(
                    [[True], (hr[1:] != hr[:-1]) | (hk[1:] != hk[:-1])]
                )
                hk, hr = hk[first], hr[first]
                ns = self._hot_ns[np.searchsorted(self._hot_arr, hk)]
                fid = ids[hr]
                # two overlapping sub-blocks per member chain-connect the
                # whole hot block through shared members
                salts = np.concatenate([fid % ns, (fid + 1) % ns])
                hk2 = np.concatenate([hk, hk]).view(np.uint64)
                mixed = (hk2 * _SALT_MIX + salts.view(np.uint64) + np.uint64(1)).view(
                    np.int64
                )
                flat_keys = np.concatenate([flat_keys, mixed])
                flat_rows = np.concatenate([flat_rows, np.concatenate([hr, hr])])

        feat_cols = list(FEATURE_COLUMNS) + [
            c for c in self.extra_feature_cols if c in batch.column_names
        ]
        take = batch.select(feat_cols).take(pa.array(flat_rows, type=pa.int64()))
        return pa.table(
            {
                "block_key": pa.array(flat_keys, type=pa.int64()),
                **{c: take.column(c) for c in feat_cols},
            }
        )


def band_key_stats(
    ds,
    num_bands: int = DEFAULT_NUM_BANDS,
    seed: int = DEFAULT_SEED,
    hot_threshold: int = 512,
    max_active_keys: int = 50_000_000,
    driver_merge_threshold: int = 40_000_000,
) -> tuple:
    """ONE count pre-pass → ``(active_keys, {hot_key: count})``.

    - ``active_keys``: sorted int64 array of band keys with EXACT global
      count ≥ 2. A key seen once heads a singleton block — no pairs — so the
      exploder drops its band rows before the wide blocking shuffle. Exact
      (per-batch partial counts summed per key), so pair output is unchanged.
    - ``hot``: keys with count > hot_threshold (boilerplate), for salting.

    The count shuffle moves 16 bytes × num_bands per file; the savings on
    the feature-row shuffle it enables are ~300 bytes per dropped row.
    Driver + broadcast cost is 8 B per active key; above ``max_active_keys``
    (~400 MB) the EXACT set is replaced by a fixed-size Bloom filter over
    the same keys (``("bloom", bits, log2bits, k)``, ≤1 GiB broadcast at any
    corpus size) so the singleton-row cut survives 100-TB inputs. Bloom
    false positives admit only singleton-block rows, which the grouped
    pair-gen drops — pair output is identical to the exact path.
    """

    def local_counts(batch: pa.Table) -> pa.Table:
        # map-side partial: unique-within-batch compresses repeated keys
        # (hot blocks) while keeping exact global counts summable
        bands = signatures_to_numpy(batch.column("bands"))
        keys, cnts = np.unique(bands.reshape(-1), return_counts=True)
        return pa.table(
            {
                "band_key": pa.array(keys, type=pa.int64()),
                "n": pa.array(cnts, type=pa.int64()),
            }
        )

    partials = ds.select_columns(["bands"]).map_batches(
        local_counts, batch_format="pyarrow", zero_copy_batch=True
    )

    # small-corpus fast path: the per-batch partials (≤ num_bands × n_files
    # 16 B rows) stream straight to the driver and merge with one sort —
    # skipping a whole grouped exchange. The threshold is on the PARTIAL
    # row bound, known up front from the materialized row count.
    try:
        n_rows_bound = ds.count() * num_bands
    except Exception:
        n_rows_bound = None
    if n_rows_bound is not None and n_rows_bound <= driver_merge_threshold:
        k_parts: list = []
        n_parts: list = []
        for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
            k_parts.append(np.asarray(b.column("band_key").combine_chunks(), dtype=np.int64))
            n_parts.append(np.asarray(b.column("n").combine_chunks(), dtype=np.int64))
        if k_parts:
            k = np.concatenate(k_parts)
            nv = np.concatenate(n_parts)
            order = np.argsort(k, kind="stable")
            k, nv = k[order], nv[order]
            starts = segment_boundaries(k)
            sums = np.add.reduceat(nv, starts) if len(k) else np.zeros(0, dtype=np.int64)
            act = sums >= 2
            keys, cnts = k[starts[act]], sums[act]
        else:
            keys = np.zeros(0, dtype=np.int64)
            cnts = np.zeros(0, dtype=np.int64)
        hot_mask = cnts > hot_threshold
        hot = {int(kk): int(c) for kk, c in zip(keys[hot_mask], cnts[hot_mask])}
        if len(keys) > max_active_keys:
            log2bits = _bloom_log2bits(len(keys))
            return ("bloom", bloom_from_keys(keys, log2bits), log2bits, _BLOOM_HASHES), hot
        return keys, hot

    def active_in_partition(part: pa.Table) -> pa.Table:
        # final sum per key with numpy segments — Ray's fine-grained
        # groupby.sum over millions of distinct keys is ~50× slower than
        # this partitioned reduction (measured: 167s vs 3.6s on 12M rows)
        k = np.asarray(part.column("band_key").combine_chunks(), dtype=np.int64)
        nv = np.asarray(part.column("n").combine_chunks(), dtype=np.int64)
        starts = segment_boundaries(k)
        sums = np.add.reduceat(nv, starts) if len(k) else np.zeros(0, dtype=np.int64)
        act = sums >= 2
        return pa.table(
            {
                "band_key": pa.array(k[starts[act]], type=pa.int64()),
                "n": pa.array(sums[act], type=pa.int64()),
            }
        )

    from ..util import default_concurrency

    rows = partitioned_group_map(
        partials, "band_key", active_in_partition, default_concurrency()[1]
    )
    keys_parts: list = []
    # iter_batches, not take_all: millions of active keys stream to the
    # driver as Arrow blocks, never as Python row dicts. Hot detection is
    # per batch — ``partitioned_group_map`` co-locates every partial of a
    # key, so each streamed count is already the exact global count.
    # Above ``max_active_keys`` the collected parts spill into a Bloom
    # filter sized from the band-row bound, capping driver memory at the
    # bloom size instead of 8 B x keys.
    hot: dict = {}
    bloom = None
    log2bits = (
        _bloom_log2bits(n_rows_bound)
        if n_rows_bound is not None
        else _BLOOM_MAX_LOG2BITS
    )
    total = 0
    for b in rows.iter_batches(batch_format="pyarrow", batch_size=None):
        k = np.asarray(b.column("band_key").combine_chunks(), dtype=np.int64)
        c = np.asarray(b.column("n").combine_chunks(), dtype=np.int64)
        hm = c > hot_threshold
        if hm.any():
            hot.update(
                (int(kk), int(cc)) for kk, cc in zip(k[hm], c[hm])
            )
        total += len(k)
        if bloom is None and total > max_active_keys:
            bloom = np.zeros(1 << max(0, log2bits - 6), dtype=np.uint64)
            for kp in keys_parts:
                bloom_insert(bloom, log2bits, kp)
            keys_parts = []
        if bloom is not None:
            bloom_insert(bloom, log2bits, k)
        else:
            keys_parts.append(k)
    if bloom is not None:
        return ("bloom", bloom, log2bits, _BLOOM_HASHES), hot
    if keys_parts:
        keys = np.sort(np.concatenate(keys_parts))
    else:
        keys = np.zeros(0, dtype=np.int64)
    return keys, hot


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

    def _empty(self, schema):
        return _empty_edges_keyed() if self.scorer_kwargs is not None else _empty_pairs(schema)

    def __call__(self, part: pa.Table) -> pa.Table:
        keys = np.asarray(part.column("block_key").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        n = len(keys)
        if n == 0:
            return self._empty(part.schema)
        order = np.lexsort((ids, keys))
        keys = keys[order]
        starts = segment_boundaries(keys)
        counts = np.diff(np.append(starts, n))

        # batched by distinct size — no per-block Python iteration for the
        # millions-of-tiny-blocks LSH regime (oversized blocks: O(m) pairs)
        ii, jj = segment_pairs(starts, counts, self.max_block_size, oversize="ring_spoke")
        if len(ii) == 0:
            return self._empty(part.schema)

        part = part.take(pa.array(order, type=pa.int64()))
        sizes = np.asarray(part.column("size").combine_chunks(), dtype=np.float64)
        s1, s2 = sizes[ii], sizes[jj]
        ratio = np.minimum(s1, s2) / np.maximum(np.maximum(s1, s2), 1.0)
        keep = ratio >= self.min_size_ratio
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return self._empty(part.schema)
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
        # feature columns ride pair rows as <name>1/<name>2 — schema-driven,
        # so opt-in extras (e.g. "emb") flow to the scorer automatically
        for c in part.column_names:
            if c in ("block_key", "file_id"):
                continue
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


def _empty_pairs(schema: pa.Schema) -> pa.Table:
    """Empty pair table matching the partition's feature schema (<c>1/<c>2
    per feature column) — schema-stable even when extras like ``emb`` ride."""
    cols = {
        "pair_key": pa.array([], type=pa.int64()),
        "id1": pa.array([], type=pa.int64()),
        "id2": pa.array([], type=pa.int64()),
    }
    for name in schema.names:
        if name in ("block_key", "file_id"):
            continue
        t = schema.field(name).type
        cols[f"{name}1"] = pa.array([], type=t)
        cols[f"{name}2"] = pa.array([], type=t)
    return pa.table(cols)


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
    """One row per distinct (id1, id2) (rows arrive sorted by pair_key).

    Dedup compares the ACTUAL id pair, not just the 64-bit pair_key mix —
    at 10^13 candidate pairs the birthday bound makes key collisions
    expected, and a collision must not silently drop a candidate.
    """
    c1, c2 = ("id1", "id2") if "id1" in part.column_names else ("u", "v")
    keys = np.asarray(part.column("pair_key").combine_chunks(), dtype=np.int64)
    id1 = np.asarray(part.column(c1).combine_chunks(), dtype=np.int64)
    id2 = np.asarray(part.column(c2).combine_chunks(), dtype=np.int64)
    order = np.lexsort((id2, id1, keys))
    k, a, b = keys[order], id1[order], id2[order]
    first = np.concatenate(
        [[True], (k[1:] != k[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    ) if len(k) else np.zeros(0, dtype=bool)
    return part.take(pa.array(order[first], type=pa.int64()))


def emit_band_rows(
    ds,
    hot_sizes: dict | None = None,
    num_bands: int = DEFAULT_NUM_BANDS,
    seed: int = DEFAULT_SEED,
    salt_target: int = 512,
    active_ref=None,
    extra_feature_cols: tuple = (),
):
    """files-with-sig Dataset → (block_key, features) rows."""
    return ds.map_batches(
        _BandExploder(
            hot_sizes,
            num_bands=num_bands,
            seed=seed,
            salt_target=salt_target,
            active_ref=active_ref,
            extra_feature_cols=extra_feature_cols,
        ),
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
    dedup_edges: bool = False,
    max_active_keys: int = 50_000_000,
    extra_feature_cols: tuple = (),
):
    """Full blocking: count pre-pass → explode (active only) → grouped pair-gen.

    Default mode returns unique canonical candidate pairs with both sides'
    features attached, ready for the standalone scoring actor pool (a
    pair-dedup shuffle keeps each candidate's expensive scoring single).

    With ``scorer_kwargs`` (fused mode) the pairs are scored inside the band
    partition and the return value is the EDGE dataset ``(u, v, score)``.
    Cross-band duplicate edges are NOT shuffled away by default: scoring is
    deterministic (duplicates carry identical scores) and connected
    components is idempotent to repeated edges — its first grouped pass
    collapses them — so the extra dedup exchange would buy nothing.
    Set ``dedup_edges=True`` when the edge list itself is the product.
    """
    if skip_hot_detection:
        active, hot = None, {}
    else:
        active, hot = band_key_stats(
            ds, num_bands=num_bands, seed=seed, hot_threshold=hot_threshold,
            max_active_keys=max_active_keys,
        )
    active_ref = None
    is_bloom = isinstance(active, tuple) and active and active[0] == "bloom"
    if active is not None and (is_bloom or len(active)):
        import ray as _ray

        active_ref = _ray.put(active)
    bands = emit_band_rows(
        ds,
        hot,
        num_bands=num_bands,
        seed=seed,
        salt_target=salt_target,
        active_ref=active_ref,
        extra_feature_cols=extra_feature_cols,
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
    if scorer_kwargs is not None and not dedup_edges:
        return pairs.map_batches(
            lambda t: t.drop_columns(["pair_key"]), batch_format="pyarrow"
        )
    deduped = partitioned_group_map(
        pairs, "pair_key", _dedup_pairs_partition, num_partitions=num_partitions
    )
    if scorer_kwargs is not None:
        deduped = deduped.map_batches(
            lambda t: t.drop_columns(["pair_key"]), batch_format="pyarrow"
        )
    return deduped
