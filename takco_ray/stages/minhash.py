"""MinHash signature stage.

Replaces the reference's ``LSHMatcher.add`` index-build
(``takco/cluster/matchers/lsh.py:107-144``): instead of inserting digests
into a central (optionally Redis-backed, ``lsh.py:64-101``) index, each file's
signature is just a column — blocking later becomes a ``groupby`` over band
keys, so there is no shared mutable state anywhere.

Run as an actor pool: ``ds.map_batches(SignatureStage, concurrency=N)``.
The permutation coefficients are built once per actor in ``__init__``
(stateful-stage shape, SURVEY.md §7.3); ``__call__`` is numpy-vectorized per
batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.minhash import MinHasher

DEFAULT_NUM_PERM = 128
DEFAULT_NUM_BANDS = 16
DEFAULT_SHINGLE_K = 5
DEFAULT_SEED = 41

from functools import lru_cache


@lru_cache(maxsize=8)
def _cached_hasher(num_perm: int, shingle_k: int, seed: int) -> MinHasher:
    """One MinHasher per (params) per worker PROCESS.

    Coefficients are ~2 KB, so signature computation doesn't need an actor
    pool to amortize state — plain tasks + this cache scale elastically with
    read blocks (an autoscaling actor pool ramps slower than the task pool
    on a big cluster). The class-based :class:`SignatureStage` remains for
    pipelines that prefer the actor shape.
    """
    return MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)


def make_signature_fn(
    num_perm: int = DEFAULT_NUM_PERM,
    num_bands: int = DEFAULT_NUM_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
    seed: int = DEFAULT_SEED,
    content_column: str = "content",
    drop_content: bool = True,
    emb_dim: int = 0,
    type_hist: bool = False,
):
    """Task-based batch fn computing bands + truncated signature.

    Same output as :class:`SignatureStage`; see its docstring for the
    16-bit truncation rationale. With ``emb_dim > 0`` an ``emb``
    column (``fixed_size_list<float32, emb_dim>``) is appended — a hashed
    shingle-TF embedding computed from the SAME shingle stream as the
    signature (one tokenize pass), feeding the scorer's optional
    ``emb_cos`` channel.
    """
    from ..functions.featurize import hashed_embedding_from_shingles
    from ..functions.minhash import band_keys

    def fn(batch: pa.Table) -> pa.Table:
        hasher = _cached_hasher(num_perm, shingle_k, seed)
        if emb_dim:
            sigs, flat_sh, sh_counts = hasher.signatures_and_shingles_arrow(
                batch.column(content_column)
            )
        else:
            sigs = hasher.signatures_arrow(batch.column(content_column))
        bands = band_keys(sigs, num_bands, seed=seed).view(np.int64)
        band_col = pa.FixedSizeListArray.from_arrays(
            pa.array(bands.reshape(-1), type=pa.int64()), bands.shape[1]
        )
        sig16 = sigs.astype(np.uint16)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig16.reshape(-1), type=pa.uint16()), sigs.shape[1]
        )
        out = batch.append_column("bands", band_col).append_column("sig", sig_col)
        if emb_dim:
            emb = hashed_embedding_from_shingles(flat_sh, sh_counts, emb_dim)
            out = out.append_column(
                "emb",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1), type=pa.float32()), emb_dim
                ),
            )
        if type_hist:
            out = out.append_column(
                "type_hist", char_class_histogram(batch.column(content_column))
            )
        if drop_content:
            out = out.drop_columns([content_column])
        return out

    return fn


_TYPE_CLASS_RES = ("[A-Za-z]", "[0-9]", r"\s", r"[!-/:-@\[-`{-~]")


def char_class_histogram(content) -> pa.FixedSizeListArray:
    """L2-normalized 5-bin character-class distribution per string.

    Bins: alpha, digit, whitespace, ASCII punctuation, other — the file-level
    analog of the reference ``TypeCosMatcher`` column-type distribution
    (``takco/cluster/matchers/typecos.py``): two files whose contents draw
    from different character populations (prose vs code vs data dumps) point
    in different directions even when shingle sets overlap. Four Arrow regex
    count kernels + numpy; no per-row Python.
    """
    import pyarrow.compute as pc

    total = pc.utf8_length(content).to_numpy(zero_copy_only=False).astype(np.float64)
    counts = [
        pc.count_substring_regex(content, p)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
        for p in _TYPE_CLASS_RES
    ]
    other = np.maximum(total - sum(counts), 0.0)
    h = np.stack(counts + [other], axis=1)
    norm = np.sqrt((h * h).sum(axis=1, keepdims=True))
    h = h / np.maximum(norm, 1e-12)
    return pa.FixedSizeListArray.from_arrays(
        pa.array(h.astype(np.float32).reshape(-1), type=pa.float32()), 5
    )


class SignatureStage:
    """Append ``bands: list<int64>[num_bands]`` + ``sig: list<uint16>[num_perm]``.

    Band keys are computed HERE from the full 64-bit signature (identical to
    the fixture generator's gold band membership — same seed, same
    ``band_keys``), then the signature is truncated to its low 16 bits for
    transport: the Jaccard estimator only tests positional equality, so
    truncation adds a ``(1-J)·2⁻¹⁶ ≈ 1.5e-5`` upward bias — noise next to
    the estimator's own σ≈0.04 — while cutting the blocking-shuffle payload
    4× (SURVEY.md §7.5 item 5: keep wide ops lean).
    """

    def __init__(
        self,
        num_perm: int = DEFAULT_NUM_PERM,
        num_bands: int = DEFAULT_NUM_BANDS,
        shingle_k: int = DEFAULT_SHINGLE_K,
        seed: int = DEFAULT_SEED,
        content_column: str = "content",
        drop_content: bool = True,
    ):
        self.hasher = MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)
        self.num_bands = num_bands
        self.seed = seed
        self.content_column = content_column
        # content is multi-KB per row; everything downstream of the signature
        # needs only (file_id, bands, sig, path, size, lang) — dropping it
        # here keeps every wide op content-free
        self.drop_content = drop_content

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.minhash import band_keys

        sigs = self.hasher.signatures_arrow(batch.column(self.content_column))
        bands = band_keys(sigs, self.num_bands, seed=self.seed).view(np.int64)
        band_col = pa.FixedSizeListArray.from_arrays(
            pa.array(bands.reshape(-1), type=pa.int64()), bands.shape[1]
        )
        sig16 = sigs.astype(np.uint16)  # low 16 bits
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig16.reshape(-1), type=pa.uint16()), sigs.shape[1]
        )
        out = batch.append_column("bands", band_col).append_column("sig", sig_col)
        if self.drop_content:
            out = out.drop_columns([self.content_column])
        return out


def signatures_to_numpy(sig_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Zero-copy (n, num_perm) uint64 view of a fixed-size-list sig column."""
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    n = len(sig_col)
    num_perm = sig_col.type.list_size
    flat = sig_col.flatten()
    return np.asarray(flat).reshape(n, num_perm)
