"""Deduplication operators (exact + near-dup families).

Exact dedup generalizes the reference's header-union fold — all records with
an identical content key merged into one (``takco/__init__.py:282-291``,
``takco/cluster/headerunions.py:4-9``) — to ``groupby(sha256(content))``
keep-first. The near-dup variants (MinHash-LSH, SimHash, n-gram Jaccard)
generalize its LSH blocking (``takco/cluster/matchers/lsh.py``) into
standalone training-data-pipeline operators over any (id, text) table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_strings, sha256_hex
from ..functions.minhash import MinHasher, band_keys, jaccard_from_signatures
from ..functions.tokenize import tokenize_many
from .components import connected_components, attach_singletons
from ..util import default_concurrency


def exact_dedup(ds, text_column: str, id_column: str):
    """Keep the min-id row per distinct text (deterministic "first").

    One hash shuffle keyed on ``sha256(text)`` — text itself never shuffles
    twice because groups carry only the already-read rows. Returns the
    surviving rows with an extra ``dup_count`` column (provenance analog of
    the reference's merged-union bodies).
    """

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__sha", pa.array(sha256_hex(batch.column(text_column).to_pylist()))
        )

    def keep_first(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column(id_column))
        first = group.take(order[:1]).drop_columns(["__sha"])
        return first.append_column("dup_count", pa.array([len(group)], type=pa.int64()))

    return (
        ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__sha")
        .map_groups(keep_first, batch_format="pyarrow")
    )


class _TextSignature:
    """Actor-pool stage: (id, text) batch → (id, sig rows as numpy list col)."""

    def __init__(self, num_perm: int, shingle_k: int, seed: int, text_column: str, id_column: str):
        self.mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.mh.signatures(batch.column(self.text_column).to_pylist())
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), sigs.shape[1]
        )
        return pa.table(
            {
                "id": batch.column(self.id_column).cast(pa.int64()),
                "sig": sig_col,
            }
        )


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
    ``threshold``, transitive closure. Verification inside the band group
    (signatures are already local) — no separate pair shuffle for this
    lighter operator.
    """

    def explode(batch: pa.Table) -> pa.Table:
        from .minhash import signatures_to_numpy

        sigs = signatures_to_numpy(batch.column("sig"))
        bands = band_keys(sigs, num_bands, seed=seed)
        n = len(batch)
        return pa.table(
            {
                "band": pa.array(bands.T.reshape(-1).view(np.int64), type=pa.int64()),
                "id": pa.concat_arrays(
                    [batch.column("id").combine_chunks()] * num_bands
                ),
                "sig": pa.concat_arrays(
                    [batch.column("sig").combine_chunks()] * num_bands
                ),
            }
        )

    def band_edges(group: pa.Table) -> pa.Table:
        from .minhash import signatures_to_numpy

        m = len(group)
        if m < 2:
            return pa.table(
                {"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
            )
        order = pc.sort_indices(group.column("id"))
        group = group.take(order)
        if m <= max_block_size:
            ii, jj = np.triu_indices(m, k=1)
        else:
            ring = np.arange(m - 1)
            ii, jj = ring, ring + 1
        sigs = signatures_to_numpy(group.column("sig"))
        est = jaccard_from_signatures(sigs[ii], sigs[jj])
        keep = est >= threshold
        ids = np.asarray(group.column("id").combine_chunks(), dtype=np.int64)
        return pa.table(
            {
                "u": pa.array(ids[ii[keep]], type=pa.int64()),
                "v": pa.array(ids[jj[keep]], type=pa.int64()),
            }
        )

    sig_ds = ds.map_batches(
        _TextSignature,
        fn_constructor_kwargs=dict(
            num_perm=num_perm,
            shingle_k=shingle_k,
            seed=seed,
            text_column=text_column,
            id_column=id_column,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    )
    edges = (
        sig_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("band")
        .map_groups(band_edges, batch_format="pyarrow")
    )
    ids_only = sig_ds.select_columns(["id"]).map_batches(
        lambda t: pa.table({"file_id": t.column("id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    labels = connected_components(edges)
    return attach_singletons(labels, ids_only)


def minhash_dedup(ds, text_column: str, id_column: str, **kwargs):
    """Near-dup dedup: keep the min-id representative of each near-dup cluster.

    Returns (id, cluster_id, is_representative) — filter on the flag to get
    the deduplicated corpus; keeping all rows preserves lineage.
    """
    labels = minhash_dedup_labels(ds, text_column, id_column, **kwargs)

    def mark(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("file_id"))
        group = group.take(order)
        rep = np.zeros(len(group), dtype=bool)
        rep[0] = True
        return group.append_column("is_representative", pa.array(rep))

    return labels.groupby("cluster_id").map_groups(mark, batch_format="pyarrow")


class _SimHasher:
    """64-bit SimHash over token unigrams (sign-aggregated token hashes)."""

    def __init__(self, text_column: str, id_column: str, seed: int = 7):
        self.text_column = text_column
        self.id_column = id_column
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        token_lists = tokenize_many(batch.column(self.text_column).to_pylist())
        out = np.zeros(len(token_lists), dtype=np.uint64)
        for i, toks in enumerate(token_lists):
            if not toks:
                continue
            uniq, counts = np.unique(toks, return_counts=True)
            h = hash64_strings(list(uniq), seed=self.seed)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            out[i] = np.packbits((acc > 0)[::-1]).view(">u8")[0]
        return pa.table(
            {
                "id": batch.column(self.id_column).cast(pa.int64()),
                "simhash": pa.array(out.view(np.int64), type=pa.int64()),
            }
        )


def simhash_dedup(ds, text_column: str, id_column: str, seed: int = 7):
    """(id, simhash) fingerprints; exact-simhash duplicates get one cluster.

    Banding by the full 64-bit fingerprint (near-dup = identical simhash) —
    the cheap first rung of the near-dup ladder; Hamming-ball variants
    follow the same groupby shape with rotated band keys.
    """
    fp = ds.map_batches(
        _SimHasher,
        fn_constructor_kwargs=dict(text_column=text_column, id_column=id_column, seed=seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    )

    def label(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("id"))
        group = group.take(order)
        rep = group.column("id")[0].as_py()
        return pa.table(
            {
                "id": group.column("id"),
                "simhash": group.column("simhash"),
                "cluster_id": pa.array([rep] * len(group), type=pa.int64()),
            }
        )

    return fp.groupby("simhash").map_groups(label, batch_format="pyarrow")


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
    emits scored pairs instead of clusters).
    """

    def explode_and_pairs(ds_sig):
        def explode(batch: pa.Table) -> pa.Table:
            from .minhash import signatures_to_numpy

            sigs = signatures_to_numpy(batch.column("sig"))
            bands = band_keys(sigs, num_bands, seed=seed)
            return pa.table(
                {
                    "band": pa.array(bands.T.reshape(-1).view(np.int64), type=pa.int64()),
                    "id": pa.concat_arrays(
                        [batch.column("id").combine_chunks()] * num_bands
                    ),
                    "sig": pa.concat_arrays(
                        [batch.column("sig").combine_chunks()] * num_bands
                    ),
                }
            )

        def pairs(group: pa.Table) -> pa.Table:
            from .minhash import signatures_to_numpy

            m = len(group)
            empty = pa.table(
                {
                    "id1": pa.array([], type=pa.int64()),
                    "id2": pa.array([], type=pa.int64()),
                    "jaccard_est": pa.array([], type=pa.float64()),
                }
            )
            if m < 2:
                return empty
            order = pc.sort_indices(group.column("id"))
            group = group.take(order)
            if m <= max_block_size:
                ii, jj = np.triu_indices(m, k=1)
            else:
                ring = np.arange(m - 1)
                ii, jj = ring, ring + 1
            sigs = signatures_to_numpy(group.column("sig"))
            est = jaccard_from_signatures(sigs[ii], sigs[jj])
            keep = est >= threshold
            if not keep.any():
                return empty
            ids = np.asarray(group.column("id").combine_chunks(), dtype=np.int64)
            return pa.table(
                {
                    "id1": pa.array(ids[ii[keep]], type=pa.uint64()),
                    "id2": pa.array(ids[jj[keep]], type=pa.uint64()),
                    "jaccard_est": pa.array(est[keep], type=pa.float64()),
                }
            )

        return (
            ds_sig.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("band")
            .map_groups(pairs, batch_format="pyarrow")
        )

    sig_ds = ds.map_batches(
        _TextSignature,
        fn_constructor_kwargs=dict(
            num_perm=num_perm,
            shingle_k=shingle_k,
            seed=seed,
            text_column=text_column,
            id_column=id_column,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_concurrency(),
    )
    raw = explode_and_pairs(sig_ds)

    def first_row(g):
        return g.slice(0, 1)

    # cross-band dedup on the (id1, id2) pair
    return raw.groupby(["id1", "id2"]).map_groups(first_row, batch_format="pyarrow")
