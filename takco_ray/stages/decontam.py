"""Benchmark decontamination: flag training documents that share token
n-grams with a (small) held-out benchmark set.

The standard eval-hygiene pass in training-data pipelines, built on the
broadcast-small-side pattern (reference J3, ``takco/link/base.py:122-136``):
the benchmark's distinct shingle hashes are collected ONCE (the benchmark is
tiny by construction — eval sets, not the corpus), ``ray.put`` into the
object store, and every map task membership-tests its documents with one
``searchsorted`` per batch. The 100 TB side streams; nothing about the
corpus is collected or shuffled — decontamination is a pure projection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.shingle import distinct_doc_shingles

_SEED = 41  # same family as the n-gram Jaccard operators


def collect_benchmark_shingles(ds, text_column: str, shingle_k: int = 3,
                               seed: int = _SEED) -> np.ndarray:
    """Sorted distinct shingle hashes of the (small) benchmark dataset.

    Runs the same per-batch kernel as the corpus side so hashes agree
    exactly; the per-batch outputs are already distinct-per-doc, so the
    driver-side union is one ``np.unique`` over a few thousand hashes.
    """

    def fn(batch: pa.Table) -> pa.Table:
        sh, _par, _n = distinct_doc_shingles(batch.column(text_column), shingle_k, seed)
        return pa.table({"sh": pa.array(np.unique(sh).view(np.int64), type=pa.int64())})

    parts = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.asarray([r["sh"] for r in parts], dtype=np.int64).view(np.uint64))


def decontaminate(ds, text_column: str, id_column: str, benchmark_ref,
                  shingle_k: int = 3, seed: int = _SEED):
    """(id, n_shingles, n_contaminated) per document.

    ``benchmark_ref``: ``ray.ObjectRef`` of the sorted benchmark hash array
    (or the array itself for local use) — read once per task, shared via the
    object store, never re-shipped per batch. ``n_contaminated`` counts the
    doc's DISTINCT shingles that appear in the benchmark; filter on
    ``n_contaminated == 0`` (or a tolerance) downstream.
    """

    def fn(batch: pa.Table) -> pa.Table:
        import ray

        bench = benchmark_ref
        if isinstance(bench, ray.ObjectRef):
            bench = ray.get(bench)
        sh, par, n_docs = distinct_doc_shingles(batch.column(text_column), shingle_k, seed)
        n_sh = np.bincount(par, minlength=n_docs).astype(np.int64)
        if len(bench) and len(sh):
            pos = np.minimum(np.searchsorted(bench, sh), len(bench) - 1)
            hit = (bench[pos] == sh).astype(np.int64)
            n_hit = np.bincount(par, weights=hit, minlength=n_docs).astype(np.int64)
        else:
            n_hit = np.zeros(n_docs, dtype=np.int64)
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "n_shingles": pa.array(n_sh, type=pa.int64()),
                "n_contaminated": pa.array(n_hit, type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def build_benchmark_bloom(ds, text_column: str, n_bits: int, k: int,
                          shingle_k: int = 3, seed: int = _SEED) -> np.ndarray:
    """Bloom bitmap (uint64 words) over the benchmark's shingle hashes —
    the scale path of :func:`collect_benchmark_shingles` for when the
    reference set outgrows a broadcast sorted array (at 10 bits/key the
    filter is ~8× smaller than the int64 hashes it replaces; a "clean"
    verdict stays exact, only flags can be false positives).

    Per-batch partial filters OR-merge (associative/idempotent, like HLL
    registers), streamed one at a time on the driver — memory is bounded by
    TWO bitmaps regardless of partition count; a tree reduce over partials
    is the multi-node escalation if a single OR stream ever dominates.
    """
    from ..functions.sketch import bloom_build

    def fn(batch: pa.Table) -> pa.Table:
        sh, _par, _n = distinct_doc_shingles(batch.column(text_column), shingle_k, seed)
        bm = bloom_build(np.unique(sh), n_bits, k)
        return pa.table({"bm": pa.array([bm.view(np.int64)],
                                        type=pa.list_(pa.int64()))})

    out = np.zeros(n_bits // 64, dtype=np.uint64)
    parts = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    for batch in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in batch.column("bm"):
            out |= np.asarray(row.values, dtype=np.int64).view(np.uint64)
    return out


def decontaminate_bloom(ds, text_column: str, id_column: str, bloom_ref,
                        k: int, shingle_k: int = 3, seed: int = _SEED):
    """(id, n_shingles, n_flagged) — Bloom-probe decontamination.

    Same shape and contract as :func:`decontaminate` with the sorted-array
    membership replaced by :func:`takco_ray.functions.sketch.bloom_probe`:
    ``n_flagged ≥`` the exact ``n_contaminated`` (no false negatives — a doc
    with 0 flagged shingles is PROVABLY clean), overshoot bounded by the
    filter's FP rate. Filter read once per task from the object store.
    """
    from ..functions.sketch import bloom_probe

    def fn(batch: pa.Table) -> pa.Table:
        import ray

        bloom = bloom_ref
        if isinstance(bloom, ray.ObjectRef):
            bloom = ray.get(bloom)
        sh, par, n_docs = distinct_doc_shingles(batch.column(text_column), shingle_k, seed)
        n_sh = np.bincount(par, minlength=n_docs).astype(np.int64)
        if len(sh):
            hit = bloom_probe(bloom, sh, k).astype(np.int64)
            n_hit = np.bincount(par, weights=hit, minlength=n_docs).astype(np.int64)
        else:
            n_hit = np.zeros(n_docs, dtype=np.int64)
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "n_shingles": pa.array(n_sh, type=pa.int64()),
                "n_flagged": pa.array(n_hit, type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
