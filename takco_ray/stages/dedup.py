"""Deduplication operators (exact + near-dup families).

Exact dedup generalizes the reference's header-union fold — all records with
an identical content key merged into one (``takco/__init__.py:282-291``,
``takco/cluster/headerunions.py:4-9``) — to ``groupby(sha256(content))``
keep-first. The near-dup variants (MinHash-LSH, SimHash, n-gram Jaccard)
generalize its LSH blocking (``takco/cluster/matchers/lsh.py``) into
standalone training-data-pipeline operators over any (id, text) table.

All fine-grained grouping goes through
:func:`groupmap.partitioned_group_map` — Ray's per-group ``map_groups`` and
fine-key aggregates are ~50× slower on millions of tiny groups (measured:
12M rows, 11M keys — groupby.count 167 s vs partitioned reduction 3.6 s at
8 CPUs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_strings, sha256_hex
from ..functions.minhash import MinHasher, band_keys, jaccard_from_signatures
from ..functions.tokenize import tokenize_many
from .components import connected_components, attach_singletons
from .groupmap import (partitioned_group_map, segment_boundaries,
                       segment_cross_pairs, segment_pairs)
from ..util import default_concurrency

_PAIR_MIX = np.uint64(0xBF58476D1CE4E5B9)


def _parts() -> int:
    return default_concurrency()[1]


def exact_dedup(ds, text_column: str, id_column: str):
    """Keep the min-id row per distinct text (deterministic "first").

    One hash shuffle keyed on a 64-bit hash of ``sha256(text)``; a
    per-partition numpy segment walk emits the min-id survivor with a
    ``dup_count`` column (provenance analog of the reference's merged-union
    bodies).
    """

    def add_key(batch: pa.Table) -> pa.Table:
        sha = sha256_hex(batch.column(text_column).to_pylist())
        key = hash64_strings(sha).view(np.int64)
        return batch.append_column("__sha", pa.array(key, type=pa.int64()))

    def keep_first(part: pa.Table) -> pa.Table:
        k = np.asarray(part.column("__sha").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column(id_column).combine_chunks())
        order = np.lexsort((ids, k))
        k = k[order]
        starts = segment_boundaries(k)
        counts = np.diff(np.append(starts, len(k)))
        first = part.take(pa.array(order[starts], type=pa.int64())).drop_columns(
            ["__sha"]
        )
        return first.append_column("dup_count", pa.array(counts, type=pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_group_map(keyed, "__sha", keep_first, _parts())


class _TextSignature:
    """Actor-pool stage: (id, text) batch → (id, band keys, truncated sig)."""

    def __init__(
        self,
        num_perm: int,
        num_bands: int,
        shingle_k: int,
        seed: int,
        text_column: str,
        id_column: str,
    ):
        self.mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)
        self.num_bands = num_bands
        self.seed = seed
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.mh.signatures_arrow(batch.column(self.text_column))
        bands = band_keys(sigs, self.num_bands, seed=self.seed).view(np.int64)
        band_col = pa.FixedSizeListArray.from_arrays(
            pa.array(bands.reshape(-1), type=pa.int64()), bands.shape[1]
        )
        sig16 = sigs.astype(np.uint16)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig16.reshape(-1), type=pa.uint16()), sigs.shape[1]
        )
        return pa.table(
            {
                "id": batch.column(self.id_column).cast(pa.int64()),
                "bands": band_col,
                "sig": sig_col,
            }
        )


def _signature_ds(ds, text_column, id_column, num_perm, num_bands, shingle_k, seed):
    return ds.map_batches(
        _TextSignature,
        fn_constructor_kwargs=dict(
            num_perm=num_perm,
            num_bands=num_bands,
            shingle_k=shingle_k,
            seed=seed,
            text_column=text_column,
            id_column=id_column,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    )


def _explode_bands(sig_ds, num_bands):
    def explode(batch: pa.Table) -> pa.Table:
        from .minhash import signatures_to_numpy

        bands = signatures_to_numpy(batch.column("bands"))
        idx = np.tile(np.arange(len(batch), dtype=np.int64), num_bands)
        take = batch.select(["id", "sig"]).take(pa.array(idx, type=pa.int64()))
        return pa.table(
            {
                "band": pa.array(bands.T.reshape(-1), type=pa.int64()),
                "id": take.column("id"),
                "sig": take.column("sig"),
            }
        )

    return sig_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _band_pairs_partition(threshold, max_block_size, with_score):
    """Partition fn: all band groups → signature-verified pairs (vectorized).

    Oversized groups fall back to sorted-id ring pairs (O(m) connectivity,
    same rationale as the flagship's hot-block path).
    """

    def fn(part: pa.Table) -> pa.Table:
        from .minhash import signatures_to_numpy

        empty_cols = {
            "u": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64()),
        }
        if with_score:
            empty_cols["jaccard_est"] = pa.array([], type=pa.float64())
        k = np.asarray(part.column("band").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        if len(k) == 0:
            return pa.table(empty_cols)
        order = np.lexsort((ids, k))
        k = k[order]
        starts = segment_boundaries(k)
        counts = np.diff(np.append(starts, len(k)))
        ii, jj = segment_pairs(starts, counts, max_block_size, oversize="ring")
        if len(ii) == 0:
            return pa.table(empty_cols)
        part = part.take(pa.array(order, type=pa.int64()))
        sigs = signatures_to_numpy(part.column("sig"))
        est = jaccard_from_signatures(sigs[ii], sigs[jj])
        keep = est >= threshold
        ids_sorted = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        cols = {
            "u": pa.array(ids_sorted[ii[keep]], type=pa.int64()),
            "v": pa.array(ids_sorted[jj[keep]], type=pa.int64()),
        }
        if with_score:
            cols["jaccard_est"] = pa.array(est[keep], type=pa.float64())
        return pa.table(cols)

    return fn


def minhash_dedup_labels(
    ds,
    text_column: str,
    id_column: str,
    num_perm: int = 128,
    num_bands: int = 16,
    shingle_k: int = 5,
    seed: int = 41,
    threshold: float = 0.65,
    max_block_size: int = 512,
):
    """(id, cluster_id) near-dup labels via MinHash → LSH bands → verify → CC.

    The full shape of the flagship ER pipeline applied to a generic text
    table: band groupby for candidates, signature-Jaccard verification at
    ``threshold`` inside the band partition (signatures already local),
    transitive closure, singleton self-labels.
    """
    sig_ds = _signature_ds(
        ds, text_column, id_column, num_perm, num_bands, shingle_k, seed
    )
    edges = partitioned_group_map(
        _explode_bands(sig_ds, num_bands),
        "band",
        _band_pairs_partition(threshold, max_block_size, with_score=False),
        _parts(),
    )
    ids_only = sig_ds.select_columns(["id"]).map_batches(
        lambda t: pa.table({"file_id": t.column("id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    labels = connected_components(edges)
    return attach_singletons(labels, ids_only)


def minhash_dedup(ds, text_column: str, id_column: str, **kwargs):
    """Near-dup dedup: keep the min-id representative of each near-dup cluster.

    Returns (file_id, cluster_id, is_representative) — filter on the flag to
    get the deduplicated corpus; keeping all rows preserves lineage.
    """
    labels = minhash_dedup_labels(ds, text_column, id_column, **kwargs)

    def mark(part: pa.Table) -> pa.Table:
        cid = np.asarray(part.column("cluster_id").combine_chunks(), dtype=np.int64)
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        order = np.lexsort((fid, cid))
        cid_s = cid[order]
        starts = segment_boundaries(cid_s)
        rep = np.zeros(len(cid_s), dtype=bool)
        rep[starts] = True
        part = part.take(pa.array(order, type=pa.int64()))
        return part.append_column("is_representative", pa.array(rep))

    return partitioned_group_map(labels, "cluster_id", mark, _parts())


class _SimHasher:
    """64-bit SimHash over token unigrams (sign-aggregated token hashes).

    Vectorized on the flat token stream: per-doc unique (hash, count) via
    one global lexsort, bit expansion chunked to stay cache-sized, per-doc
    bit sums via ``add.reduceat`` — no per-doc Python loops.
    """

    def __init__(self, text_column: str, id_column: str, seed: int = 7):
        self.text_column = text_column
        self.id_column = id_column
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import token_stream
        from .groupmap import segment_boundaries as _segb

        hashes, _lens, counts = token_stream(batch.column(self.text_column), self.seed)
        n_docs = len(counts)
        out = np.zeros(n_docs, dtype=np.uint64)
        if len(hashes):
            parents = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            order = np.lexsort((hashes, parents))
            hs, ps = hashes[order], parents[order]
            first = np.concatenate([[True], (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])])
            starts = np.flatnonzero(first)
            cnt = np.diff(np.append(starts, len(hs)))  # multiplicity per unique
            hu, pu = hs[starts], ps[starts]
            doc_starts = _segb(pu)
            acc = np.zeros((n_docs, 64), dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)[None, :]
            chunk = 262_144
            for c0 in range(0, len(hu), chunk):
                c1 = min(c0 + chunk, len(hu))
                bits = ((hu[c0:c1, None] >> shifts) & np.uint64(1)).astype(np.int64)
                contrib = (bits * 2 - 1) * cnt[c0:c1, None]
                # sum per doc for this chunk (docs are contiguous in pu)
                sub_p = pu[c0:c1]
                sub_starts = _segb(sub_p)
                sums = np.add.reduceat(contrib, sub_starts, axis=0)
                np.add.at(acc, sub_p[sub_starts], sums)
            weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
            docs_present = pu[doc_starts]
            bitsel = (acc[docs_present] > 0).astype(np.uint64)
            out[docs_present] = (bitsel * weights[::-1][None, :]).sum(axis=1)
        return pa.table(
            {
                "id": batch.column(self.id_column).cast(pa.int64()),
                "simhash": pa.array(out.view(np.int64), type=pa.int64()),
            }
        )


def simhash_dedup(ds, text_column: str, id_column: str, seed: int = 7):
    """(id, simhash, cluster_id) — identical-simhash rows share a cluster.

    The cheap first rung of the near-dup ladder; Hamming-ball variants follow
    the same groupby shape with rotated band keys.
    """
    fp = ds.map_batches(
        _SimHasher,
        fn_constructor_kwargs=dict(
            text_column=text_column, id_column=id_column, seed=seed
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    )

    def label(part: pa.Table) -> pa.Table:
        k = np.asarray(part.column("simhash").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, k))
        k = k[order]
        ids = ids[order]
        starts = segment_boundaries(k)
        counts = np.diff(np.append(starts, len(k)))
        rep = np.repeat(ids[starts], counts)
        return pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(k, type=pa.int64()),
                "cluster_id": pa.array(rep, type=pa.int64()),
            }
        )

    return partitioned_group_map(fp, "simhash", label, _parts())


def ngram_jaccard_pairs(
    ds,
    text_column: str,
    id_column: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    num_perm: int = 128,
    num_bands: int = 32,
    seed: int = 41,
    max_block_size: int = 512,
):
    """Above-threshold near-dup pairs (id1, id2, jaccard_est) via LSH.

    n-gram (token k-shingle) Jaccard with LSH candidate generation — the
    pairwise audit view of :func:`minhash_dedup_labels` (same band groupby,
    emits scored pairs; cross-band duplicates collapsed on a mixed pair key).
    """
    sig_ds = _signature_ds(
        ds, text_column, id_column, num_perm, num_bands, shingle_k, seed
    )
    raw = partitioned_group_map(
        _explode_bands(sig_ds, num_bands),
        "band",
        _band_pairs_partition(threshold, max_block_size, with_score=True),
        _parts(),
    )

    def add_pair_key(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("u").combine_chunks(), dtype=np.int64)
        v = np.asarray(t.column("v").combine_chunks(), dtype=np.int64)
        pk = (u.view(np.uint64) * _PAIR_MIX + v.view(np.uint64)).view(np.int64)
        return t.append_column("__pair", pa.array(pk, type=pa.int64()))

    def first_per_pair(part: pa.Table) -> pa.Table:
        k = np.asarray(part.column("__pair").combine_chunks(), dtype=np.int64)
        starts = segment_boundaries(k)
        out = part.take(pa.array(starts, type=pa.int64())).drop_columns(["__pair"])
        return out.rename_columns(["id1", "id2", "jaccard_est"])

    keyed = raw.map_batches(add_pair_key, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_group_map(keyed, "__pair", first_per_pair, _parts())


def ngram_jaccard_exact(
    ds,
    text_column: str,
    id_column: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """EXACT n-gram Jaccard pairs (id1, id2, jaccard) — SQL-oracle-able.

    Candidates via shared-shingle buckets: any pair with Jaccard > 0 shares
    at least one distinct shingle, so bucketing by shingle hash is exact,
    not probabilistic. Per-bucket pairs are counted per (id1, id2) across
    buckets — each shared distinct shingle contributes one row — giving
    |A∩B| exactly; |A∪B| = n1 + n2 − |A∩B|. Two grouped passes total.

    Partitioning assumption: common-shingle buckets are quadratic in bucket
    size — this is the *audit* operator for moderate corpora; at web scale
    use the LSH-estimated :func:`ngram_jaccard_pairs` (stop-shingles would
    need demotion/caps, which would break exactness).
    """
    from ..functions.shingle import distinct_doc_shingles

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_column).combine_chunks(), dtype=np.int64)
        sh, par, n_docs = distinct_doc_shingles(
            batch.column(text_column), shingle_k, 41
        )
        n_sh = np.bincount(par, minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                "shingle": pa.array(sh.view(np.int64), type=pa.int64()),
                "id": pa.array(ids[par], type=pa.int64()),
                "n_sh": pa.array(n_sh[par], type=pa.int64()),
            }
        )

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)
    return _shared_key_pairs(rows, threshold, sim="jaccard", out_col="jaccard")


def _shared_key_pairs(rows, threshold: float, sim: str, out_col: str,
                      bipartite: bool = False):
    """(id1, id2, ``out_col``) from a (shingle, id, n_sh) relation: bucket by
    shared key, emit every in-bucket pair, count shared keys per pair across
    buckets (= |A∩B| exactly when keys are per-doc distinct), score with
    ``sim`` ∈ {jaccard: c/(n1+n2−c), containment: c/min(n1,n2)} and keep
    ≥ ``threshold``. Two grouped passes; shared tail of
    :func:`ngram_jaccard_exact`, :func:`winnow_neardup` and
    :func:`cross_neardup`.

    ``bipartite``: rows carry a ``side`` column (0/1) and only CROSS-side
    pairs are emitted (id1 from side 0, id2 from side 1) — the within-side
    quadratic term vanishes, which is the point of the cross-corpus join.
    """

    def bucket_pairs(part: pa.Table) -> pa.Table:
        sh = np.asarray(part.column("shingle").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        nsh = np.asarray(part.column("n_sh").combine_chunks(), dtype=np.int64)
        if bipartite:
            side = np.asarray(part.column("side").combine_chunks(), dtype=np.int64)
            order = np.lexsort((ids, side, sh))
            sh, ids, nsh, side = sh[order], ids[order], nsh[order], side[order]
            starts = segment_boundaries(sh)
            cnts = np.diff(np.append(starts, len(sh)))
            # side-0 prefix count per segment via one cumsum
            pref = np.concatenate([[0], np.cumsum(side == 0)])
            a_cnt = pref[starts + cnts] - pref[starts]
            ii, jj = segment_cross_pairs(starts, a_cnt, starts + a_cnt, cnts - a_cnt)
        else:
            order = np.lexsort((ids, sh))
            sh, ids, nsh = sh[order], ids[order], nsh[order]
            starts = segment_boundaries(sh)
            cnts = np.diff(np.append(starts, len(sh)))
            # exactness needs EVERY in-bucket pair: no max_block_size
            # (documented audit-operator quadratic bound), but pair-gen is
            # still batched
            ii, jj = segment_pairs(starts, cnts, max_block_size=None)
        if len(ii) == 0:
            return pa.table(
                {
                    "id1": pa.array([], type=pa.int64()),
                    "id2": pa.array([], type=pa.int64()),
                    "n1": pa.array([], type=pa.int64()),
                    "n2": pa.array([], type=pa.int64()),
                    "pair_key": pa.array([], type=pa.int64()),
                }
            )
        pk = (ids[ii].view(np.uint64) * _PAIR_MIX + ids[jj].view(np.uint64)).view(np.int64)
        return pa.table(
            {
                "id1": pa.array(ids[ii], type=pa.int64()),
                "id2": pa.array(ids[jj], type=pa.int64()),
                "n1": pa.array(nsh[ii], type=pa.int64()),
                "n2": pa.array(nsh[jj], type=pa.int64()),
                "pair_key": pa.array(pk, type=pa.int64()),
            }
        )

    pairs = partitioned_group_map(rows, "shingle", bucket_pairs, _parts())

    def count_pairs(part: pa.Table) -> pa.Table:
        pk = np.asarray(part.column("pair_key").combine_chunks(), dtype=np.int64)
        i1 = np.asarray(part.column("id1").combine_chunks(), dtype=np.int64)
        i2 = np.asarray(part.column("id2").combine_chunks(), dtype=np.int64)
        n1 = np.asarray(part.column("n1").combine_chunks(), dtype=np.int64)
        n2 = np.asarray(part.column("n2").combine_chunks(), dtype=np.int64)
        order = np.lexsort((i2, i1, pk))
        pk, i1, i2, n1, n2 = pk[order], i1[order], i2[order], n1[order], n2[order]
        both = (
            np.concatenate(
                [[True], (pk[1:] != pk[:-1]) | (i1[1:] != i1[:-1]) | (i2[1:] != i2[:-1])]
            )
            if len(pk)
            else np.zeros(0, dtype=bool)
        )
        starts = np.flatnonzero(both)
        c = np.diff(np.append(starts, len(pk)))  # |A∩B|
        i1s, i2s, n1s, n2s = i1[starts], i2[starts], n1[starts], n2[starts]
        if sim == "containment":
            score = c.astype(np.float64) / np.minimum(n1s, n2s).astype(np.float64)
        else:
            score = c.astype(np.float64) / (n1s + n2s - c).astype(np.float64)
        keep = score >= threshold
        return pa.table(
            {
                "id1": pa.array(i1s[keep], type=pa.int64()),
                "id2": pa.array(i2s[keep], type=pa.int64()),
                out_col: pa.array(score[keep], type=pa.float64()),
            }
        )

    return partitioned_group_map(pairs, "pair_key", count_pairs, _parts())


def winnow_neardup(
    ds,
    text_column: str,
    id_column: str,
    window: int = 8,
    threshold: float = 0.5,
):
    """(id1, id2, containment) — shared winnowed-fingerprint near-dup pairs
    (the MOSS scheme, Schleimer et al. 2003: local-min sampling guarantees
    any shared token run ≥ window+roll_k−1 tokens shares a fingerprint).

    Each doc is reduced to its DISTINCT per-window minimum rolling hashes
    (~n_tokens/window values — an 8-16× smaller relation than the full
    shingle set of :func:`ngram_jaccard_exact`), then the same exact
    shared-key bucket → pair-count tail scores
    ``containment = shared / min(|A|, |B|)`` — robust to length-asymmetric
    copies (a file pasted into a larger one scores ~1.0 where Jaccard
    dilutes). Same audit-operator quadratic bucket bound as the exact
    Jaccard rung; the probabilistic scale rung is :func:`minhash_dedup`.
    """
    from ..functions.shingle import distinct_per_doc
    from .textstats import winnow_window_mins

    def winnow_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_column).combine_chunks(), dtype=np.int64)
        mins, n_win, _off, n_docs = winnow_window_mins(batch.column(text_column), window)
        par = np.repeat(np.arange(n_docs, dtype=np.int64), n_win)
        keep = distinct_per_doc(mins, par)
        mins, par = mins[keep], par[keep]
        n_fp = np.bincount(par, minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                "shingle": pa.array(mins.view(np.int64), type=pa.int64()),
                "id": pa.array(ids[par], type=pa.int64()),
                "n_sh": pa.array(n_fp[par], type=pa.int64()),
            }
        )

    rows = ds.map_batches(winnow_rows, batch_format="pyarrow", zero_copy_batch=True)
    return _shared_key_pairs(rows, threshold, sim="containment", out_col="containment")


def text_neardup_clusters(
    ds,
    text_column: str,
    id_column: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    num_partitions: int | None = None,
):
    """(file_id, cluster_id) — transitive closure over EXACT n-gram-Jaccard
    edges ≥ ``threshold``, cluster_id = component-min id, singletons total.

    The end-to-end SQL-oracle-able rung of the text near-dup ladder: the
    pair stage is :func:`ngram_jaccard_exact` (shared-shingle buckets —
    exhaustive for any positive threshold), the clustering is the flagship's
    distributed CC + singleton attach — so ONE recursive-CTE oracle
    hash-verifies blocking, scoring, and transitive clustering together
    (the north rule's shape, on a relation a SQL engine can recompute).
    Inherits the audit-operator quadratic bucket bound; the probabilistic
    scale rung with the same output contract is :func:`minhash_dedup`.
    """
    from .components import attach_singletons, connected_components

    parts = num_partitions or _parts()
    pairs = ngram_jaccard_exact(ds, text_column, id_column, shingle_k, threshold)
    edges = pairs.map_batches(
        lambda t: pa.table({"u": t.column("id1"), "v": t.column("id2")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ids = ds.map_batches(
        lambda t: pa.table({"file_id": t.column(id_column).cast(pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labels = connected_components(edges, num_partitions=parts)
    return attach_singletons(labels, ids)


def cluster_representatives(
    labels,
    signals,
    label_column: str = "cluster_id",
    id_column: str = "file_id",
    signal_id_column: str = "id",
    order_column: str = "quality_u",
    num_partitions: int | None = None,
):
    """(cluster_id, rep_id, <order_column>) — the best-signal member per
    cluster: the "which copy to keep" policy of a dedup pipeline when the
    survivor should be chosen by merit (longest / highest-quality / most
    recently committed), not by min-id.

    ``labels``: (id_column, label_column) from any clustering rung;
    ``signals``: (signal_id_column, order_column) per-doc int64 signal.
    Hash join on id, then :func:`relational.top_n_per_group` ``n=1`` with
    the map-side per-batch pre-trim — the shuffle after the join carries at
    most one row per (cluster × batch). Ties break ascending by id
    (deterministic, SQL ``row_number`` reproducible).
    """
    from .relational import top_n_per_group

    parts = num_partitions
    if parts is None:
        from ..util import default_join_partitions

        parts = default_join_partitions()
    from ..util import join_remote_args

    joined = labels.join(
        signals,
        join_type="inner",
        num_partitions=parts,
        on=(id_column,),
        right_on=(signal_id_column,),
        aggregator_ray_remote_args=join_remote_args(parts),
    )
    top = top_n_per_group(
        joined, label_column, order_column, 1, tiebreak_col=id_column
    )
    return top.map_batches(
        lambda t: pa.table(
            {
                "cluster_id": t.column(label_column).cast(pa.int64()),
                "rep_id": t.column(id_column).cast(pa.int64()),
                order_column: t.column(order_column).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays (byte-LUT popcount)."""
    x = np.bitwise_xor(a, b)
    return _POPCOUNT_LUT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def simhash_neardup(
    ds,
    text_column: str,
    id_column: str,
    seed: int = 7,
    max_hamming: int = 3,
):
    """(id, cluster_id, is_representative) — SimHash Hamming-ball near-dup.

    EXACT-recall banding: the 64-bit simhash splits into ``max_hamming + 1``
    bands — two hashes within Hamming distance d must agree exactly on at
    least one band (pigeonhole), so a ``groupby(band)`` with in-block
    popcount verification finds every qualifying pair. Same wide-op shape as
    the MinHash ladder: band groupby → verified edges → transitive CC →
    singleton attach. Cross-band duplicate edges are collapsed by CC itself.
    """
    from .components import cc_forest, label_rows
    from .groupmap import partitioned_group_map as _pgm

    nb = max_hamming + 1
    width = 64 // nb
    shifts = [np.uint64(i * width) for i in range(nb)]
    masks = [
        np.uint64((1 << (64 - i * width)) - 1) if i == nb - 1 else np.uint64((1 << width) - 1)
        for i in range(nb)
    ]
    _BAND_MIX = np.uint64(0x9E3779B97F4A7C15)

    fp = ds.map_batches(
        _SimHasher,
        fn_constructor_kwargs=dict(
            text_column=text_column, id_column=id_column, seed=seed
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    )

    def explode(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch.column("simhash").combine_chunks(), dtype=np.int64).view(np.uint64)
        ids = np.asarray(batch.column("id").combine_chunks(), dtype=np.int64)
        keys: list = []
        for bi in range(nb):
            bv = (h >> shifts[bi]) & masks[bi]
            keys.append((bv * _BAND_MIX + np.uint64(bi + 1)).view(np.int64))
        n = len(h)
        return pa.table(
            {
                "band": pa.array(np.concatenate(keys), type=pa.int64()),
                "id": pa.array(np.tile(ids, nb), type=pa.int64()),
                "simhash": pa.array(np.tile(h.view(np.int64), nb), type=pa.int64()),
            }
        )

    def block_edges(part: pa.Table) -> pa.Table:
        b = np.asarray(part.column("band").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        h = np.asarray(part.column("simhash").combine_chunks(), dtype=np.int64).view(np.uint64)
        order = np.lexsort((ids, b))
        b, ids, h = b[order], ids[order], h[order]
        starts = segment_boundaries(b)
        cnts = np.diff(np.append(starts, len(b)))
        # bucket-chunked pair generation under a pair budget (each chunk
        # Hamming-filtered before the next materializes): peak memory is
        # max(budget, largest bucket), not the sum over all buckets
        from .groupmap import budgeted_segment_pair_chunks

        us, vs = [], []
        for ii, jj in budgeted_segment_pair_chunks(starts, cnts):
            keep = _hamming64(h[ii], h[jj]) <= max_hamming
            us.append(ids[ii[keep]])
            vs.append(ids[jj[keep]])
        u = np.concatenate(us) if us else np.zeros(0, np.int64)
        v = np.concatenate(vs) if vs else np.zeros(0, np.int64)
        return pa.table(
            {
                "u": pa.array(u, type=pa.int64()),
                "v": pa.array(v, type=pa.int64()),
            }
        )

    edges = _pgm(fp.map_batches(explode, batch_format="pyarrow"), "band", block_edges, _parts())
    star = cc_forest(edges, num_partitions=_parts())
    raw = label_rows(star)
    ids_only = fp.select_columns(["id"]).map_batches(
        lambda t: pa.table({"file_id": t.column("id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    from .components import _min_label_partition

    labels = attach_singletons(
        partitioned_group_map(raw, "file_id", _min_label_partition, _parts()), ids_only
    )

    def mark(part: pa.Table) -> pa.Table:
        cid = np.asarray(part.column("cluster_id").combine_chunks(), dtype=np.int64)
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        order = np.lexsort((fid, cid))
        cid_s = cid[order]
        starts = segment_boundaries(cid_s)
        rep = np.zeros(len(cid_s), dtype=bool)
        rep[starts] = True
        part = part.take(pa.array(order, type=pa.int64()))
        return part.append_column("is_representative", pa.array(rep))

    return partitioned_group_map(labels, "cluster_id", mark, _parts())


def embedding_neardup(
    ds,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
    threshold: float = 0.42,
    corpus_tile: int = 16_384,
    num_partitions: int | None = None,
):
    """Embedding-cosine near-dup labels → (file_id, cluster_id), cluster_id =
    component-min id.

    The exact rung of the vector dedup ladder (reference EmbeddingMatcher
    semantics, ``takco/cluster/matchers/embedding.py:109-217``, minus the
    FAISS index): the L2-normalized corpus matrix is assembled ONCE in the
    object store (a remote task over the materialized block refs — content
    never lands on the driver) and read zero-copy by every worker; each batch
    computes tiled batch×corpus matmuls and emits strict upper-triangle pairs
    with cosine ≥ ``threshold``; transitive closure + singleton attach give a
    total labeling.

    Exactness costs O(n²) dot products distributed over batches. Documented
    assumption: the corpus matrix (n×d float32, ≈2.6 GB at 10M×64) fits the
    object store — this is the ≤10M-vector rung; above that, feed
    :func:`takco_ray.stages.ann.lsh_bucket_neighbors` (salted buckets,
    probabilistic recall) into the same CC tail. Per-task peak extra memory
    is ``batch × corpus_tile × 4`` bytes (tiled), independent of n.
    """
    import ray

    from .ann import _emb_matrix, _normalize

    mat_ds = ds.materialize()

    @ray.remote
    def _assemble(*tables):
        ids = (
            np.concatenate(
                [
                    np.asarray(t.column(id_column).combine_chunks(), dtype=np.int64)
                    for t in tables
                ]
            )
            if tables
            else np.zeros(0, dtype=np.int64)
        )
        mats = [
            _normalize(_emb_matrix(t, emb_column).astype(np.float32)) for t in tables
        ]
        mat = np.vstack(mats) if mats else np.zeros((0, 0), dtype=np.float32)
        return ids, np.ascontiguousarray(mat, dtype=np.float32)

    corpus_ref = _assemble.remote(*mat_ds.to_arrow_refs())

    def edges_fn(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(corpus_ref)
        bids = np.asarray(batch.column(id_column).combine_chunks(), dtype=np.int64)
        bmat = _normalize(_emb_matrix(batch, emb_column).astype(np.float32))
        us: list = []
        vs: list = []
        for t0 in range(0, len(all_ids), corpus_tile):
            t1 = min(t0 + corpus_tile, len(all_ids))
            sims = bmat @ all_mat[t0:t1].T
            tids = all_ids[t0:t1]
            bi, ci = np.nonzero((sims >= threshold) & (bids[:, None] < tids[None, :]))
            us.append(bids[bi])
            vs.append(tids[ci])
        u = np.concatenate(us) if us else np.zeros(0, dtype=np.int64)
        v = np.concatenate(vs) if vs else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "u": pa.array(u, type=pa.int64()),
                "v": pa.array(v, type=pa.int64()),
            }
        )

    edges = mat_ds.map_batches(edges_fn, batch_format="pyarrow", zero_copy_batch=True)
    ids_only = mat_ds.select_columns([id_column]).map_batches(
        lambda t: pa.table({"file_id": t.column(id_column).cast(pa.int64())}),
        batch_format="pyarrow",
    )
    labels = connected_components(edges, num_partitions=num_partitions or _parts())
    return attach_singletons(labels, ids_only)


def group_set_jaccard(
    ds,
    group_column: str,
    text_column: str,
    shingle_k: int = 3,
    threshold_millis: int = 300,
    seed: int = 41,
    num_partitions: int | None = None,
    max_groups: int = 1_000_000,
):
    """EXACT shingle-set Jaccard between GROUPS (repo-level near-dup).

    The Stack-style source/repository dedup signal: each group (repo,
    source, site) is the set of distinct token ``shingle_k``-grams across
    all its documents; emit ``(group_a, group_b, n_common, n_a, n_b)`` for
    every pair whose Jaccard ``n_common / (n_a + n_b - n_common)`` is
    ``>= threshold_millis / 1000``. Integer-only output and an integer
    cross-multiplied threshold test keep the result bit-exact across
    engines (SQL-oracle-able; no float column).

    Shape: per-batch distinct (group, shingle) combiner → one grouped pass
    on shingle (global distinct + per-shingle group pairs, canonical
    ``group_a < group_b`` by string order) → one grouped pass on pair key
    (common counts) → broadcast size lookup. Same exactness/cost contract
    as :func:`ngram_jaccard_exact`: a shingle shared by k groups emits
    O(k²) pair rows, so this is the *audit* operator — at web scale run
    MinHash over the per-group shingle sets (``minhash_dedup`` with group
    as the id) and reserve this for candidate verification. Group sizes
    ride a ``ray.put`` broadcast (one row per group), so group cardinality
    must stay driver-bounded: the op counts groups first and raises above
    ``max_groups`` (default 1e6 ≈ tens of MB broadcast) instead of silently
    collecting an unbounded side — the same contract as ``skew_join``'s
    hot-row guard. Past that, use ``group_minhash_neardup`` (the scale
    rung) or swap the size lookup for a hash join.
    """
    import ray as _ray

    from ..functions.shingle import distinct_doc_shingles

    def shingle_rows(batch: pa.Table) -> pa.Table:
        sh, par, _n = distinct_doc_shingles(batch.column(text_column), shingle_k, seed)
        grp = batch.column(group_column).combine_chunks()
        enc = pc.dictionary_encode(grp)
        codes = np.asarray(enc.indices, dtype=np.int64)
        # batch-local distinct (group, shingle): map-side combiner so the
        # shuffle carries each (group, shingle) once per batch at most
        g = codes[par]
        order = np.lexsort((sh, g))
        g, sh = g[order], sh[order]
        if len(sh):
            first = np.concatenate([[True], (g[1:] != g[:-1]) | (sh[1:] != sh[:-1])])
            g, sh = g[first], sh[first]
        return pa.table(
            {
                "grp": enc.dictionary.take(pa.array(g, type=pa.int64())),
                "shingle": pa.array(sh.view(np.int64), type=pa.int64()),
            }
        )

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)
    parts = num_partitions or _parts()

    def distinct_in_partition(part: pa.Table) -> pa.Table:
        # equal shingles colocate here, so in-partition distinct is GLOBAL
        sh = np.asarray(part.column("shingle").combine_chunks(), dtype=np.int64)
        grp = part.column("grp").combine_chunks()
        enc = pc.dictionary_encode(grp)
        codes = np.asarray(enc.indices, dtype=np.int64)
        vals = enc.dictionary.to_numpy(zero_copy_only=False)
        rank = np.empty(len(vals), dtype=np.int64)
        rank[np.argsort(vals, kind="stable")] = np.arange(len(vals))
        r = rank[codes]
        order = np.lexsort((r, sh))
        sh_s, r_s = sh[order], r[order]
        first = (
            np.concatenate([[True], (sh_s[1:] != sh_s[:-1]) | (r_s[1:] != r_s[:-1])])
            if len(sh_s)
            else np.zeros(0, dtype=bool)
        )
        idx = np.asarray(order)[first]
        return part.take(pa.array(idx, type=pa.int64()))

    gs = partitioned_group_map(rows, "shingle", distinct_in_partition, parts).materialize()

    # per-group distinct-shingle counts — small side (one row per group),
    # guarded: refuse to collect/broadcast an unbounded group universe
    sizes_agg = gs.groupby("grp").count().materialize()
    n_groups = sizes_agg.count()
    if n_groups > max_groups:
        raise ValueError(
            f"group_set_jaccard: {n_groups} groups exceeds max_groups="
            f"{max_groups}; the per-group size broadcast would be unbounded. "
            f"Use group_minhash_neardup (the scale rung) or raise max_groups "
            f"deliberately."
        )
    sizes_tab = pa.Table.from_pylist(sizes_agg.take_all())
    size_keys = sizes_tab.column("grp").combine_chunks()
    size_vals = sizes_tab.column("count()").combine_chunks()
    sizes_ref = _ray.put((size_keys, size_vals))

    def pair_rows(part: pa.Table) -> pa.Table:
        # rows arrive sorted by shingle; members of a shingle segment are
        # ordered by group STRING rank so emitted pairs are canonical a < b
        sh = np.asarray(part.column("shingle").combine_chunks(), dtype=np.int64)
        grp = part.column("grp").combine_chunks()
        enc = pc.dictionary_encode(grp)
        codes = np.asarray(enc.indices, dtype=np.int64)
        vals = enc.dictionary.to_numpy(zero_copy_only=False)
        rank = np.empty(len(vals), dtype=np.int64)
        rank[np.argsort(vals, kind="stable")] = np.arange(len(vals))
        r = rank[codes]
        order = np.lexsort((r, sh))
        sh_s, idx = sh[order], np.asarray(order)
        starts = segment_boundaries(sh_s)
        cnts = np.diff(np.append(starts, len(sh_s)))
        ii, jj = segment_pairs(starts, cnts, max_block_size=None)
        if len(ii) == 0:
            return pa.table(
                {
                    "group_a": pa.array([], type=pa.string()),
                    "group_b": pa.array([], type=pa.string()),
                    "pair_key": pa.array([], type=pa.int64()),
                }
            )
        ga = grp.take(pa.array(idx[ii], type=pa.int64()))
        gb = grp.take(pa.array(idx[jj], type=pa.int64()))
        # pair key from per-UNIQUE-group hashes (one Python-loop hash per
        # distinct group in the partition, numeric combine per pair row)
        hv = hash64_strings(vals)
        pk = (hv[codes[idx[ii]]] * _PAIR_MIX + hv[codes[idx[jj]]]).view(np.int64)
        return pa.table(
            {
                "group_a": ga,
                "group_b": gb,
                "pair_key": pa.array(pk, type=pa.int64()),
            }
        )

    pairs = partitioned_group_map(gs, "shingle", pair_rows, parts)

    def count_filter(part: pa.Table) -> pa.Table:
        ga = part.column("group_a").combine_chunks()
        gb = part.column("group_b").combine_chunks()
        # count identical (a, b) rows; pair_key collisions broken by the
        # strings themselves (shared prologue)
        order, first = _pair_group_runs(part)
        starts = np.flatnonzero(first)
        c = np.diff(np.append(starts, len(order)))
        idx = order[starts]
        ga_u = ga.take(pa.array(idx, type=pa.int64()))
        gb_u = gb.take(pa.array(idx, type=pa.int64()))
        keys, vals = sizes_ref if not isinstance(sizes_ref, _ray.ObjectRef) else _ray.get(sizes_ref)
        na = np.asarray(vals.take(pc.index_in(ga_u, value_set=keys)), dtype=np.int64)
        nb = np.asarray(vals.take(pc.index_in(gb_u, value_set=keys)), dtype=np.int64)
        keep = c * 1000 >= threshold_millis * (na + nb - c)
        sel = pa.array(np.flatnonzero(keep), type=pa.int64())
        return pa.table(
            {
                "group_a": ga_u.take(sel),
                "group_b": gb_u.take(sel),
                "n_common": pa.array(c[keep], type=pa.int64()),
                "n_a": pa.array(na[keep], type=pa.int64()),
                "n_b": pa.array(nb[keep], type=pa.int64()),
            }
        )

    return partitioned_group_map(pairs, "pair_key", count_filter, parts)


class _GroupSignaturePartial:
    """Actor-pool batch stage for :func:`group_minhash_neardup`: per-batch
    doc signatures → per-group elementwise-min partial. MinHash of a set
    union is the elementwise min of the member signatures, so group partials
    combine associatively — the shuffle carries one ``num_perm``-wide row
    per (group, batch), never per doc."""

    def __init__(self, group_column, text_column, num_perm, shingle_k, seed):
        self.mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)
        self.group_column = group_column
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.mh.signatures_arrow(batch.column(self.text_column))
        grp = batch.column(self.group_column).combine_chunks()
        enc = pc.dictionary_encode(grp)
        codes = np.asarray(enc.indices, dtype=np.int64)
        order = np.argsort(codes, kind="stable")
        starts = segment_boundaries(codes[order])
        gmin = np.minimum.reduceat(sigs[order], starts, axis=0)
        g_vals = enc.dictionary.take(pa.array(codes[order][starts], type=pa.int64()))
        gh = hash64_strings(g_vals.to_numpy(zero_copy_only=False))
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(gmin.reshape(-1), type=pa.uint32()), gmin.shape[1]
        )
        return pa.table(
            {
                "gh": pa.array(gh.view(np.int64), type=pa.int64()),
                "grp": g_vals,
                "sig": sig_col,
            }
        )


def group_minhash_neardup(
    ds,
    group_column: str,
    text_column: str,
    shingle_k: int = 3,
    threshold_millis: int = 200,
    num_perm: int = 128,
    num_bands: int = 32,
    seed: int = 41,
    num_partitions: int | None = None,
    max_block_size: int = 512,
):
    """(group_a, group_b, n_match, est_jaccard_millis) — the SCALE rung of
    repo-level near-dup (:func:`group_set_jaccard` is the exact audit rung).

    Estimates shingle-set Jaccard between groups from group-level MinHash
    signatures: because ``minhash(A ∪ B) = elementwise_min(minhash(A),
    minhash(B))``, a group's signature over the union of its documents'
    shingle sets is computed with NO shingle shuffle at all — per-batch
    group-min partials (one ``4·num_perm``-byte row per group per batch)
    reduce to one row per group, then LSH-band like any signature table.
    Cost is linear in corpus bytes + near-linear in groups; contrast the
    exact operator's per-common-shingle pair rows. Short docs (< k tokens)
    contribute a reduced-k shingle here but nothing to the exact operator —
    at web scale that divergence is noise; pin corpora with ≥k-token docs
    when comparing the two.

    Pairs are emitted for band-colliding groups whose positional signature
    agreement ``n_match/num_perm`` clears ``threshold_millis/1000``
    (integer cross-multiplied; ``est_jaccard_millis`` is the floored
    integer estimate). Oversized bands cap at ``max_block_size`` via O(m)
    ring pairs, the same skew policy as the flagship.
    """
    parts = num_partitions or _parts()
    partials = ds.map_batches(
        _GroupSignaturePartial,
        fn_constructor_kwargs=dict(
            group_column=group_column,
            text_column=text_column,
            num_perm=num_perm,
            shingle_k=shingle_k,
            seed=seed,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    )

    def _sig_matrix(part: pa.Table) -> np.ndarray:
        flat = part.column("sig").combine_chunks().flatten()
        return np.asarray(flat, dtype=np.uint32).reshape(len(part), num_perm)

    def final_min_and_bands(part: pa.Table) -> pa.Table:
        # all partials of a group colocate here (keyed by gh); reduce by the
        # STRING itself so a 64-bit gh collision cannot merge two groups
        grp = part.column("grp").combine_chunks()
        enc = pc.dictionary_encode(grp)
        codes = np.asarray(enc.indices, dtype=np.int64)
        sigs = _sig_matrix(part)
        order = np.argsort(codes, kind="stable")
        starts = segment_boundaries(codes[order])
        gmin = np.minimum.reduceat(sigs[order], starts, axis=0)
        g_vals = enc.dictionary.take(pa.array(codes[order][starts], type=pa.int64()))
        bands = band_keys(gmin, num_bands, seed=seed).view(np.int64)
        n_g = len(starts)
        idx = pa.array(np.tile(np.arange(n_g, dtype=np.int64), num_bands), type=pa.int64())
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(gmin.reshape(-1), type=pa.uint32()), num_perm
        )
        return pa.table(
            {
                "band": pa.array(bands.T.reshape(-1), type=pa.int64()),
                "grp": g_vals.take(idx),
                "sig": sig_col.take(idx),
            }
        )

    band_rows = partitioned_group_map(partials, "gh", final_min_and_bands, parts)

    def band_pairs(part: pa.Table) -> pa.Table:
        band = np.asarray(part.column("band").combine_chunks(), dtype=np.int64)
        grp = part.column("grp").combine_chunks()
        enc = pc.dictionary_encode(grp)
        codes = np.asarray(enc.indices, dtype=np.int64)
        vals = enc.dictionary.to_numpy(zero_copy_only=False)
        rank = np.empty(len(vals), dtype=np.int64)
        rank[np.argsort(vals, kind="stable")] = np.arange(len(vals))
        order = np.lexsort((rank[codes], band))
        idx = np.asarray(order)
        starts = segment_boundaries(band[idx])
        cnts = np.diff(np.append(starts, len(idx)))
        ii, jj = segment_pairs(starts, cnts, max_block_size=max_block_size)
        empty = pa.table(
            {
                "group_a": pa.array([], type=pa.string()),
                "group_b": pa.array([], type=pa.string()),
                "n_match": pa.array([], type=pa.int64()),
                "pair_key": pa.array([], type=pa.int64()),
            }
        )
        if len(ii) == 0:
            return empty
        sigs = _sig_matrix(part)
        a_i, b_i = idx[ii], idx[jj]
        matches = (sigs[a_i] == sigs[b_i]).sum(axis=1).astype(np.int64)
        keep = matches * 1000 >= threshold_millis * num_perm
        if not keep.any():
            return empty
        a_i, b_i, matches = a_i[keep], b_i[keep], matches[keep]
        hv = hash64_strings(vals)
        pk = (hv[codes[a_i]] * _PAIR_MIX + hv[codes[b_i]]).view(np.int64)
        sel_a = pa.array(a_i, type=pa.int64())
        sel_b = pa.array(b_i, type=pa.int64())
        return pa.table(
            {
                "group_a": grp.take(sel_a),
                "group_b": grp.take(sel_b),
                "n_match": pa.array(matches, type=pa.int64()),
                "pair_key": pa.array(pk, type=pa.int64()),
            }
        )

    pairs = partitioned_group_map(band_rows, "band", band_pairs, parts)

    def dedup_first(part: pa.Table) -> pa.Table:
        ga = part.column("group_a").combine_chunks()
        gb = part.column("group_b").combine_chunks()
        nm = np.asarray(part.column("n_match").combine_chunks(), dtype=np.int64)
        order, first = _pair_group_runs(part)
        idx = order[first]
        sel = pa.array(idx, type=pa.int64())
        est = nm[idx] * 1000 // num_perm
        return pa.table(
            {
                "group_a": ga.take(sel),
                "group_b": gb.take(sel),
                "n_match": pa.array(nm[idx], type=pa.int64()),
                "est_jaccard_millis": pa.array(est, type=pa.int64()),
            }
        )

    return partitioned_group_map(pairs, "pair_key", dedup_first, parts)


def _pair_group_runs(part: pa.Table):
    """Shared prologue for collision-safe (pair_key, group_a, group_b) run
    detection: rows sorted by (pair_key, a-code, b-code) — the string codes
    break 64-bit pair_key collisions — returning ``(order, first_mask)``
    where ``first_mask`` marks the first row of each identical-pair run.
    Used by both the set-Jaccard count filter and the MinHash pair dedup so
    a collision-handling fix lands in one place."""
    pk = np.asarray(part.column("pair_key").combine_chunks(), dtype=np.int64)
    ga = part.column("group_a").combine_chunks()
    gb = part.column("group_b").combine_chunks()
    ca = np.asarray(pc.dictionary_encode(ga).indices, dtype=np.int64)
    cb = np.asarray(pc.dictionary_encode(gb).indices, dtype=np.int64)
    order = np.lexsort((cb, ca, pk))
    pk_s, ca_s, cb_s = pk[order], ca[order], cb[order]
    first = (
        np.concatenate(
            [[True], (pk_s[1:] != pk_s[:-1]) | (ca_s[1:] != ca_s[:-1]) | (cb_s[1:] != cb_s[:-1])]
        )
        if len(pk_s)
        else np.zeros(0, dtype=bool)
    )
    return np.asarray(order), first



def cluster_size_report(labels, label_column: str = "cluster_id", top_k: int = 20):
    """Cluster-size distribution + largest clusters (SURVEY §2.5 A9 analog;
    the reference re-chunks clusters over ``max_cluster_size``,
    ``takco/__init__.py:385-397`` — this is the audit view that drives that
    decision). Returns a single-row Dataset: n_clusters, n_items, max_size,
    log2 histogram, and the top-k (cluster_id, size) pairs."""

    def sizes_in_partition(part: pa.Table) -> pa.Table:
        c = np.asarray(part.column(label_column).combine_chunks(), dtype=np.int64)
        starts = segment_boundaries(np.sort(c))
        n = np.diff(np.append(starts, len(c)))
        return pa.table(
            {
                "cluster_id": pa.array(np.sort(c)[starts], type=pa.int64()),
                "size": pa.array(n, type=pa.int64()),
            }
        )

    sizes = partitioned_group_map(
        labels.select_columns([label_column]), label_column, sizes_in_partition, _parts()
    )

    def summarize(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("size").combine_chunks(), dtype=np.int64)
        cid = np.asarray(batch.column("cluster_id").combine_chunks(), dtype=np.int64)
        hist = np.bincount(np.log2(np.maximum(s, 1)).astype(np.int64), minlength=24)[:24]
        top = np.argsort(-s)[:top_k]
        return pa.table(
            {
                "n_clusters": pa.array([len(s)], type=pa.int64()),
                "n_items": pa.array([int(s.sum())], type=pa.int64()),
                "max_size": pa.array([int(s.max()) if len(s) else 0], type=pa.int64()),
                "hist": pa.array([hist.tolist()]),
                "top_ids": pa.array([cid[top].tolist()]),
                "top_sizes": pa.array([s[top].tolist()]),
            }
        )

    parts = sizes.map_batches(summarize, batch_format="pyarrow").take_all()
    hist = np.zeros(24, dtype=np.int64)
    n_clusters = n_items = mx = 0
    pairs: list = []
    for p in parts:
        n_clusters += p["n_clusters"]
        n_items += p["n_items"]
        mx = max(mx, p["max_size"])
        hist += np.asarray(p["hist"], dtype=np.int64)
        pairs.extend(zip(p["top_ids"], p["top_sizes"]))
    pairs.sort(key=lambda x: -x[1])
    pairs = pairs[:top_k]
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table(
            {
                "n_clusters": pa.array([n_clusters], type=pa.int64()),
                "n_items": pa.array([n_items], type=pa.int64()),
                "max_size": pa.array([mx], type=pa.int64()),
                "log2_hist": pa.array([hist.tolist()]),
                "top_cluster_ids": pa.array([[int(a) for a, _ in pairs]]),
                "top_cluster_sizes": pa.array([[int(b) for _, b in pairs]]),
            }
        )
    )


def cross_neardup(
    ds_a,
    ds_b,
    text_column: str,
    id_column: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """(id1, id2, jaccard) — EXACT cross-corpus near-dup pairs, id1 from
    ``ds_a`` (e.g. training corpus), id2 from ``ds_b`` (e.g. held-out
    benchmark), the doc-level complement of shingle-level
    :func:`~takco_ray.stages.decontam.decontaminate`.

    Same exhaustive shared-shingle bucketing as :func:`ngram_jaccard_exact`,
    but only CROSS-side pairs are emitted — the within-side quadratic term
    (the expensive part of a self-join over a big corpus) never exists. Ids
    must be disjoint across sides (they key the pair relation).
    SQL-oracle-able: a DuckDB intersect-join over the two slices recomputes
    it bit-for-bit.
    """
    from ..functions.shingle import distinct_doc_shingles

    def side_rows(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_column).combine_chunks(), dtype=np.int64)
            sh, par, n_docs = distinct_doc_shingles(
                batch.column(text_column), shingle_k, 41
            )
            n_sh = np.bincount(par, minlength=n_docs).astype(np.int64)
            return pa.table(
                {
                    "shingle": pa.array(sh.view(np.int64), type=pa.int64()),
                    "id": pa.array(ids[par], type=pa.int64()),
                    "n_sh": pa.array(n_sh[par], type=pa.int64()),
                    "side": pa.array(np.full(len(par), side, dtype=np.int64)),
                }
            )

        return fn

    rows_a = ds_a.map_batches(side_rows(0), batch_format="pyarrow", zero_copy_batch=True)
    rows_b = ds_b.map_batches(side_rows(1), batch_format="pyarrow", zero_copy_batch=True)
    rows = rows_a.union(rows_b)
    return _shared_key_pairs(
        rows, threshold, sim="jaccard", out_col="jaccard", bipartite=True
    )


def cross_doc_dup_spans(
    ds,
    text_column: str,
    id_column: str,
    shingle_k: int = 3,
    min_df: int = 2,
    seed: int = 7,
    num_partitions: int | None = None,
):
    """Per-doc CROSS-corpus duplicated-n-gram span stats (exact).

    For every document: ``n_ngrams`` (token k-shingle instances),
    ``dup_ngrams`` (instances whose shingle occurs in >= ``min_df`` DISTINCT
    documents), and ``max_dup_run`` (longest run of consecutive duplicated
    shingle positions — a shared token span of ``max_dup_run + k - 1``
    tokens). The substring-level dedup signal (suffix-array-style
    training-data hygiene, hash-exact form): complementary to
    :func:`~takco_ray.stages.textstats.ngram_repetition`, which counts
    WITHIN-doc repetition — a shingle repeated a thousand times inside one
    doc but nowhere else scores 0 here.

    Cost model: every shingle instance shuffles once (24 B/row: hash64,
    doc id, position), the duplicated subset a second time — the honest
    price of exactness, same order as the tfidf token shuffle. At web scale
    run it over a hash-sampled slice (:func:`relational.hash_sample`) or
    replace the df pass with a Bloom probe of a known duplicate set
    (:mod:`takco_ray.stages.decontam` pattern); both trades are explicit,
    never a silent cap.

    Reference analog: takco's cell-level Jaccard matcher
    (``takco/cluster/matchers/celljacc.py``) scores per-pair set overlap;
    this scores per-document positional overlap against the whole corpus.
    """
    from ..functions.shingle import doc_shingles
    from ..functions.tokenize import token_stream
    from ..util import default_join_partitions

    parts = num_partitions or _parts()
    k = shingle_k

    def emit_instances(t: pa.Table) -> pa.Table:
        sh, par, _counts = doc_shingles(t.column(text_column), k, seed)
        ids = np.asarray(t.column(id_column).combine_chunks(), dtype=np.int64)
        n_per_doc = np.bincount(par, minlength=len(ids)) if len(par) else np.zeros(len(ids), dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(n_per_doc)[:-1]]).astype(np.int64)
        pos = np.arange(len(sh), dtype=np.int64) - np.repeat(starts, n_per_doc)
        return pa.table(
            {
                "sh": pa.array(sh.view(np.int64), type=pa.int64()),
                "doc": pa.array(ids[par], type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
            }
        )

    inst = ds.map_batches(emit_instances, batch_format="pyarrow", zero_copy_batch=True)

    def dup_instances(g: pa.Table) -> pa.Table:
        # g sorted by sh; order (sh, doc) to count DISTINCT docs per shingle
        sh = np.asarray(g.column("sh").combine_chunks(), dtype=np.int64)
        doc = np.asarray(g.column("doc").combine_chunks(), dtype=np.int64)
        pos = np.asarray(g.column("pos").combine_chunks(), dtype=np.int64)
        order = np.lexsort((doc, sh))
        sh, doc, pos = sh[order], doc[order], pos[order]
        b = segment_boundaries(sh)
        if len(b) == 0:
            return pa.table({"doc": pa.array([], type=pa.int64()), "pos": pa.array([], type=pa.int64())})
        sizes = np.diff(np.concatenate([b, [len(sh)]]))
        new_doc = np.ones(len(sh), dtype=np.int64)
        new_doc[1:] = (doc[1:] != doc[:-1]) | (sh[1:] != sh[:-1])
        distinct = np.add.reduceat(new_doc, b)
        keep = np.repeat(distinct >= min_df, sizes)
        return pa.table(
            {
                "doc": pa.array(doc[keep], type=pa.int64()),
                "pos": pa.array(pos[keep], type=pa.int64()),
            }
        )

    dup = partitioned_group_map(inst, "sh", dup_instances, num_partitions=parts)

    def per_doc(g: pa.Table) -> pa.Table:
        doc = np.asarray(g.column("doc").combine_chunks(), dtype=np.int64)
        pos = np.asarray(g.column("pos").combine_chunks(), dtype=np.int64)
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        b = segment_boundaries(doc)
        if len(b) == 0:
            return pa.table(
                {
                    "doc": pa.array([], type=pa.int64()),
                    "dup_ngrams": pa.array([], type=pa.int64()),
                    "max_dup_run": pa.array([], type=pa.int64()),
                }
            )
        sizes = np.diff(np.concatenate([b, [len(doc)]]))
        new_run = np.ones(len(doc), dtype=bool)
        new_run[1:] = (doc[1:] != doc[:-1]) | (pos[1:] != pos[:-1] + 1)
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        # runs are contiguous per doc (sorted); doc boundary positions in
        # run space are the run ids at each doc's first row
        run_doc_starts = run_id[b]
        max_run = np.maximum.reduceat(run_len, run_doc_starts)
        return pa.table(
            {
                "doc": pa.array(doc[b], type=pa.int64()),
                "dup_ngrams": pa.array(sizes, type=pa.int64()),
                "max_dup_run": pa.array(max_run.astype(np.int64), type=pa.int64()),
            }
        )

    agg = partitioned_group_map(dup, "doc", per_doc, num_partitions=parts)

    def totals(t: pa.Table) -> pa.Table:
        _h, _l, counts = token_stream(t.column(text_column), seed)
        n = np.maximum(counts - k + 1, 0).astype(np.int64)
        return pa.table(
            {
                "id": t.column(id_column).cast(pa.int64()),
                "n_ngrams": pa.array(n, type=pa.int64()),
            }
        )

    from ..util import join_remote_args

    tot = ds.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)
    jparts = default_join_partitions()
    joined = tot.join(
        agg,
        join_type="left_outer",
        num_partitions=jparts,
        on=("id",),
        right_on=("doc",),
        aggregator_ray_remote_args=join_remote_args(jparts),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t.column("id").cast(pa.int64()),
                "n_ngrams": t.column("n_ngrams").cast(pa.int64()),
                "dup_ngrams": pc.fill_null(t.column("dup_ngrams"), 0).cast(pa.int64()),
                "max_dup_run": pc.fill_null(t.column("max_dup_run"), 0).cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def semantic_dedup(
    ds,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 64,
    sample_size: int = 10_000,
    seed: int = 17,
    cell_tile: int = 4096,
    num_partitions: int | None = None,
):
    """SemDeDup-style semantic dedup: k-means cells, exact cosine inside.

    The embedding rung between :func:`embedding_neardup` (exact, O(n²),
    ≤10M vectors) and :func:`takco_ray.stages.ann.lsh_bucket_neighbors`
    (probabilistic recall): a seeded k-means over a corpus sample carves the
    space into ``n_cells`` cells (centroids broadcast once), every vector is
    assigned its nearest cell in one map, and ONLY within-cell pairs are
    compared — exact tiled cosine, transitive grouping by iterated min-label
    propagation, min-id survivor per group. Near-dup pairs that k-means
    separates into different cells are missed by construction; that is the
    SemDeDup trade (quadratic cost drops by ~n_cells×), and the recall knob
    is ``n_cells`` (with ``n_cells=1`` the result equals
    :func:`embedding_neardup` + singleton attach, which the test suite
    asserts).

    Output: ``(file_id, cell, dup_group, is_rep)`` — ``dup_group`` the
    min id of the within-cell component, ``is_rep`` 1 for the survivor.

    Reference analog: the FAISS-blocked EmbeddingMatcher
    (``takco/cluster/matchers/embedding.py:109-217``); cells replace the
    FAISS coarse quantizer this environment doesn't have.
    """
    import ray

    from .ann import _emb_matrix, _kmeans, _normalize
    from .relational import SAMPLE_MIX

    parts = num_partitions or _parts()
    n_total = ds.count()
    if n_total == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "file_id": pa.array([], type=pa.int64()),
                    "cell": pa.array([], type=pa.int64()),
                    "dup_group": pa.array([], type=pa.int64()),
                    "is_rep": pa.array([], type=pa.int64()),
                }
            )
        )
    # k-means seeds come from a HASH-SPREAD sample, not the corpus prefix:
    # curated parquet is typically written ordered by source/topic, and
    # prefix-seeded centroids would all land in the leading region —
    # boundary cells then swallow the rest of the corpus, collapsing the
    # ~n_cells quadratic-cost reduction and splitting far-region near-dups
    # across arbitrary cells. Deterministic (same multiplicative mix as
    # hash_sample), so runs and engines agree on the seed set.
    # ceil, not floor: floor keeps >= sample_size rows and limit() then
    # truncates to the corpus PREFIX again for n_total < 2*sample_size
    modulus = max(1, -(-n_total // sample_size))

    def spread(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_column).combine_chunks(), dtype=np.int64)
        keep = (ids * np.int64(SAMPLE_MIX)) % np.int64(modulus) == 0
        return t.filter(pa.array(keep))

    sample_tbl = (
        ds.map_batches(spread, batch_format="pyarrow", zero_copy_batch=True)
        .limit(sample_size)
        .to_pandas()
    )
    sample = _normalize(np.stack(sample_tbl[emb_column].to_numpy()).astype(np.float64))
    cent_ref = ray.put(
        np.ascontiguousarray(_kmeans(sample, n_cells, seed), dtype=np.float64)
    )

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        mat = _normalize(_emb_matrix(t, emb_column).astype(np.float64))
        cell = np.argmax(mat @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(cell, type=pa.int64()),
                "id": t.column(id_column).cast(pa.int64()),
                "embedding": t.column(emb_column),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def dedup_cells(part: pa.Table) -> pa.Table:
        cells = np.asarray(part.column("cell").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "file_id": pa.array([], type=pa.int64()),
                    "cell": pa.array([], type=pa.int64()),
                    "dup_group": pa.array([], type=pa.int64()),
                    "is_rep": pa.array([], type=pa.int64()),
                }
            )
        mat = _normalize(_emb_matrix(part, "embedding").astype(np.float64))
        starts = segment_boundaries(cells)
        counts = np.diff(np.append(starts, len(cells)))
        group = ids.copy()
        for s, m in zip(starts, counts):
            if m < 2:
                continue
            sub = mat[s : s + m]
            sub_ids = ids[s : s + m]
            ai: list = []
            bi: list = []
            for t0 in range(0, m, cell_tile):
                t1 = min(t0 + cell_tile, m)
                sims = sub[t0:t1] @ sub.T
                r, c = np.nonzero(sims >= threshold)
                keep = (t0 + r) < c  # strict upper triangle, global indices
                ai.append(t0 + r[keep])
                bi.append(c[keep])
            if not ai:
                continue
            a = np.concatenate(ai)
            b = np.concatenate(bi)
            if len(a) == 0:
                continue
            lab = sub_ids.copy()
            while True:
                m1 = np.minimum(lab[a], lab[b])
                before = lab.copy()
                np.minimum.at(lab, a, m1)
                np.minimum.at(lab, b, m1)
                if np.array_equal(before, lab):
                    break
            group[s : s + m] = lab
        return pa.table(
            {
                "file_id": pa.array(ids, type=pa.int64()),
                "cell": pa.array(cells, type=pa.int64()),
                "dup_group": pa.array(group, type=pa.int64()),
                "is_rep": pa.array((ids == group).astype(np.int64), type=pa.int64()),
            }
        )

    return partitioned_group_map(assigned, "cell", dedup_cells, num_partitions=parts)


def cross_doc_dup_lines(
    ds,
    text_column: str,
    id_column: str,
    min_df: int = 2,
    num_partitions: int | None = None,
):
    """Per-doc count of NON-BLANK lines shared with ≥ ``min_df``−1 other
    documents — the line-level cross-corpus boilerplate signal (the
    RefinedWeb/CCNet "duplicated lines across documents" hygiene stat;
    complement of :func:`~takco_ray.stages.textstats.line_stats`, which is
    within-doc only).

    Exact and collision-free with ONE content shuffle:

    1. the explode pass splits each document into lines with one Arrow
       ``split_pattern`` call, trims, drops blanks, and — because a row IS a
       whole document — dedups (doc, line) batch-locally with a factorize,
       so only DISTINCT per-doc lines ever shuffle;
    2. distinct (doc, line) rows hash-partition by a 64-bit line hash via
       ``partitioned_group_map``; inside a partition lines are re-keyed by
       their exact strings (pandas factorize), so hash collisions only
       co-locate rows, never merge counts — document frequency per line is
       exact, and per-doc duplicated-line counts reduce partially in the
       same pass (``np.unique``), leaving a (doc, partial-count) relation;
    3. a zero row per document unions into the partial counts, so the final
       doc-keyed grouped sum attaches zeros without any join.

    At web scale the line text in the shuffle is the cost driver; the scale
    path is the same trade documented on :func:`cross_doc_dup_spans` —
    hash-sample the corpus or Bloom-probe a known boilerplate set.
    """
    from ..functions.hashing import hash64_strings
    from .groupmap import partitioned_group_map

    parts = num_partitions or _parts()

    def explode(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = np.asarray(t.column(id_column).combine_chunks(), dtype=np.int64)
        text = pc.fill_null(t.column(text_column), "")
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.utf8_trim_whitespace(lines.flatten())
        offsets = np.asarray(lines.offsets, dtype=np.int64)
        parent = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
        parent = parent[keep]
        flat_np = np.asarray(flat.to_pandas(), dtype=object)[keep]
        # batch-local (doc, line) distinct: codes pair → unique
        codes, uniq = pd.factorize(flat_np)
        pair = parent * np.int64(len(uniq) + 1) + codes
        _, first_idx = np.unique(pair, return_index=True)
        parent, flat_np = parent[first_idx], flat_np[first_idx]
        line_arr = pa.array(flat_np, type=pa.string())
        h = hash64_strings(flat_np, seed=0x11E5).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[parent], type=pa.int64()),
                "line": line_arr,
                "lh": pa.array(h, type=pa.int64()),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def count_dups(part: pa.Table) -> pa.Table:
        import pandas as pd

        doc = np.asarray(part.column("doc_id").combine_chunks(), dtype=np.int64)
        lines = part.column("line").to_pandas()
        codes, _uniq = pd.factorize(lines)
        df_counts = np.bincount(codes)  # rows are distinct (doc, line) pairs
        dup_docs = doc[df_counts[codes] >= min_df]
        u, c = np.unique(dup_docs, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, type=pa.int64()),
                "n_part": pa.array(c.astype(np.int64), type=pa.int64()),
            }
        )

    partials = partitioned_group_map(pairs, "lh", count_dups, num_partitions=parts)

    def zero_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).cast(pa.int64())
        return pa.table(
            {"doc_id": ids,
             "n_part": pa.array(np.zeros(len(ids), dtype=np.int64), type=pa.int64())}
        )

    zeros = ds.map_batches(zero_rows, batch_format="pyarrow", zero_copy_batch=True)

    def sum_by_doc(part: pa.Table) -> pa.Table:
        from .groupmap import segment_boundaries

        doc = np.asarray(part.column("doc_id").combine_chunks(), dtype=np.int64)
        n = np.asarray(part.column("n_part").combine_chunks(), dtype=np.int64)
        starts = segment_boundaries(doc)
        sums = (
            np.add.reduceat(n, starts)
            if len(starts)
            else np.zeros(0, dtype=np.int64)
        )
        return pa.table(
            {"id": pa.array(doc[starts] if len(starts) else doc, type=pa.int64()),
             "n_dup_lines": pa.array(sums.astype(np.int64), type=pa.int64())}
        )

    return partitioned_group_map(
        partials.union(zeros), "doc_id", sum_by_doc, num_partitions=parts
    )


def remove_dup_lines(
    ds,
    text_column: str,
    id_column: str,
    min_df: int = 2,
    num_partitions: int | None = None,
):
    """REWRITE documents with corpus-duplicated lines removed — the
    actionable form of :func:`cross_doc_dup_lines` (RefinedWeb's "discard
    lines shared across documents" cleanup): a non-blank line is dropped
    when its trimmed form appears in ≥ ``min_df`` distinct documents;
    blank/whitespace-only lines and the line order of the survivors are
    preserved byte-exactly. Output: (id, text).

    Shape — content moves exactly twice, both times as line rows:

    1. explode keeps (doc, idx, raw line) instances; the duplicate decision
       groups instances by a 64-bit hash of the TRIMMED line
       (``partitioned_group_map``) and re-keys by exact strings inside each
       partition, so document frequency is collision-free-exact. Blank
       lines get a per-instance routing hash (they are always kept, and a
       shared hash("") key would funnel every blank line in the corpus into
       one partition — the hot-key trap the blocking stage salts against);
    2. survivors reassemble per document: one grouped pass sorts (doc,
       idx), builds Arrow list offsets from segment boundaries and joins
       with a single vectorized ``binary_join`` — no per-doc Python string
       loop. A sentinel row per document (idx = −1) rides shuffle 2 so a
       fully-boilerplate document still emits ``(id, "")`` instead of
       vanishing.
    """
    from ..functions.hashing import hash64_strings
    from .groupmap import partitioned_group_map, segment_boundaries

    parts = num_partitions or _parts()
    _MIX = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as two's complement

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_column).combine_chunks(), dtype=np.int64)
        text = pc.fill_null(t.column(text_column), "")
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.flatten()
        offsets = np.asarray(lines.offsets, dtype=np.int64)
        n_per = np.diff(offsets)
        parent = np.repeat(np.arange(len(ids), dtype=np.int64), n_per)
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], n_per)
        trimmed = pc.utf8_trim_whitespace(flat)
        blank = pc.equal(trimmed, "").to_numpy(zero_copy_only=False).astype(bool)
        trimmed_np = np.asarray(trimmed.to_pandas(), dtype=object)
        lh = hash64_strings(trimmed_np[~blank], seed=0x11E5).view(np.int64)
        route = np.empty(len(flat), dtype=np.int64)
        route[~blank] = lh
        # blanks: per-instance routing key — always kept, never counted
        route[blank] = (ids[parent[blank]] * _MIX + idx[blank]) ^ _MIX
        doc_rows = ids[parent]
        # sentinel per document so empty survivors still emit (id, "")
        sent_ids = ids
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([doc_rows, sent_ids]), type=pa.int64()
                ),
                "idx": pa.array(
                    np.concatenate([idx, np.full(len(sent_ids), -1, dtype=np.int64)]),
                    type=pa.int64(),
                ),
                "line": pa.concat_arrays(
                    [flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat,
                     pa.array([""] * len(sent_ids), type=flat.type)]
                ),
                "blank": pa.array(
                    np.concatenate([blank, np.ones(len(sent_ids), dtype=bool)]),
                ),
                "lh": pa.array(
                    np.concatenate(
                        [route, (sent_ids * _MIX - np.int64(1)) ^ _MIX]
                    ),
                    type=pa.int64(),
                ),
            }
        )

    inst = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def mark(part: pa.Table) -> pa.Table:
        import pandas as pd

        doc = np.asarray(part.column("doc_id").combine_chunks(), dtype=np.int64)
        idx = np.asarray(part.column("idx").combine_chunks(), dtype=np.int64)
        blank = np.asarray(part.column("blank").combine_chunks(), dtype=bool)
        # One trim definition end-to-end: the routing hash in ``explode``
        # used Arrow utf8_trim_whitespace, so the in-partition DF key must
        # too (pandas str.strip trims a different whitespace set, e.g.
        # \x1c-\x1f, which would split a line's counts across partitions).
        trimmed = pc.utf8_trim_whitespace(
            part.column("line").combine_chunks()
        ).to_pandas()
        codes, _u = pd.factorize(trimmed)
        # df = distinct docs per trimmed line, over non-blank instances only
        nb = ~blank
        pair_codes = codes[nb].astype(np.int64)
        pair_docs = doc[nb]
        order = np.lexsort((pair_docs, pair_codes))
        pc_, pd_ = pair_codes[order], pair_docs[order]
        first = np.ones(len(pc_), dtype=bool)
        first[1:] = (pc_[1:] != pc_[:-1]) | (pd_[1:] != pd_[:-1])
        df = np.bincount(pc_[first], minlength=len(_u)) if len(_u) else np.zeros(0)
        keep = blank | (df[codes] < min_df) if len(_u) else blank
        sel = pa.array(np.flatnonzero(keep), type=pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], type=pa.int64()),
                "idx": pa.array(idx[keep], type=pa.int64()),
                "line": part.column("line").combine_chunks().take(sel),
            }
        )

    kept = partitioned_group_map(inst, "lh", mark, num_partitions=parts)

    def reassemble(part: pa.Table) -> pa.Table:
        doc = np.asarray(part.column("doc_id").combine_chunks(), dtype=np.int64)
        idx = np.asarray(part.column("idx").combine_chunks(), dtype=np.int64)
        order = np.lexsort((idx, doc))
        doc, idx = doc[order], idx[order]
        lines = part.column("line").combine_chunks().take(
            pa.array(order, type=pa.int64())
        )
        starts = segment_boundaries(doc)
        ends = np.append(starts[1:], len(doc))
        # sentinel (idx == -1) sorts first in each doc segment — skip it
        real_starts = starts + (idx[starts] == -1)
        sel = np.concatenate(
            [np.arange(s, e) for s, e in zip(real_starts, ends)]
        ) if len(starts) else np.zeros(0, dtype=np.int64)
        # int64 offsets + large_list: an int32 cumsum would wrap silently if
        # one doc_id hash partition held > 2^31 kept lines (binary_join
        # accepts large_list, so exactness costs nothing).
        offs = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(ends - real_starts, out=offs[1:])
        lst = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()),
            lines.take(pa.array(sel, type=pa.int64())),
        )
        return pa.table(
            {
                "id": pa.array(doc[starts], type=pa.int64()),
                "text": pc.binary_join(lst, "\n"),
            }
        )

    return partitioned_group_map(kept, "doc_id", reassemble, num_partitions=parts)
