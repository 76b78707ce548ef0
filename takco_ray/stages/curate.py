"""Fused training-data curation: quality + decontamination + exact-dup
survivor in ONE content pass, keep/drop verdict per document.

The standard curation funnel of an LLM data pipeline (quality pre-filter →
benchmark decontamination → exact dedup) run as a single engine stage
instead of three pipelines over the same corpus: at 100 TB the corpus read
IS the cost, so every per-doc signal that can share the pass must (contrast
the reference, which re-streams all tables per step —
``takco/__init__.py:654-695``).

Plan shape:
1. one ``map_batches`` content pass per batch computes the quality
   composite (``textstats.quality_features``), the distinct-shingle
   contamination count against a broadcast benchmark hash set
   (``decontam``'s searchsorted kernel), and the exact-dup grouping key
   ``hash64(sha256(text))`` — emitting a 40-byte row per doc, never content;
2. one grouped pass by dup key marks the min-id survivor per distinct text
   (same semantics as ``dedup.exact_dedup``) and folds the keep verdict.

Output is the full audit relation (one row per input doc, flags + signals),
not just the survivors — the curation decision stays inspectable and the
kept set is ``filter(keep == 1)`` away.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .groupmap import partitioned_group_map, segment_boundaries
from ..functions.hashing import hash64_strings, sha256_hex_arrow
from ..functions.shingle import distinct_doc_shingles

_SEED = 41  # shingle-hash family shared with decontam / ngram-jaccard


def curate_docs(
    ds,
    text_column: str,
    id_column: str,
    benchmark_ref,
    quality_threshold_u: int = 400_000,
    shingle_k: int = 3,
    seed: int = _SEED,
    num_partitions: int | None = None,
):
    """(doc_id, quality_u, n_contaminated, is_survivor, keep) per input doc.

    ``keep = is_survivor AND n_contaminated == 0 AND quality_u >=
    quality_threshold_u`` (all int64 — engine-exact). ``benchmark_ref`` is a
    ``ray.ObjectRef`` of the sorted benchmark shingle-hash array
    (``decontam.collect_benchmark_shingles``) or the array itself; it is
    read once per task from the object store, never re-shipped per batch.
    ``is_survivor`` marks the min-id row per distinct text — duplicate
    copies are dropped even when they individually pass quality, and a
    contaminated/low-quality text drops ALL its copies (the survivor flag is
    independent of the other signals, so the audit stays interpretable).
    """
    from .textstats import quality_features

    parts = num_partitions
    if parts is None:
        from ..util import default_join_partitions

        parts = default_join_partitions()

    def features(batch: pa.Table) -> pa.Table:
        import ray

        bench = benchmark_ref
        if isinstance(bench, ray.ObjectRef):
            bench = ray.get(bench)
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        *_feat, quality = quality_features(col)
        q_u = np.floor(quality * 1e6 + 0.5).astype(np.int64)
        sh, par, n_docs = distinct_doc_shingles(col, shingle_k, seed)
        if len(bench) and len(sh):
            pos = np.minimum(np.searchsorted(bench, sh), len(bench) - 1)
            hit = (bench[pos] == sh).astype(np.int64)
            n_hit = np.bincount(par, weights=hit, minlength=n_docs).astype(np.int64)
        else:
            n_hit = np.zeros(n_docs, dtype=np.int64)
        dk = hash64_strings(sha256_hex_arrow(col)).view(np.int64)
        return pa.table(
            {
                "doc_id": batch.column(id_column).cast(pa.int64()),
                "quality_u": pa.array(q_u, type=pa.int64()),
                "n_contaminated": pa.array(n_hit, type=pa.int64()),
                "__dk": pa.array(dk, type=pa.int64()),
            }
        )

    keyed = ds.map_batches(features, batch_format="pyarrow", zero_copy_batch=True)

    thr = int(quality_threshold_u)

    def verdict(part: pa.Table) -> pa.Table:
        dk = np.asarray(part.column("__dk").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("doc_id").combine_chunks(), dtype=np.int64)
        q_u = np.asarray(part.column("quality_u").combine_chunks(), dtype=np.int64)
        n_hit = np.asarray(part.column("n_contaminated").combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, dk))
        dk_s, ids_s = dk[order], ids[order]
        starts = segment_boundaries(dk_s)
        counts = np.diff(np.append(starts, len(dk_s)))
        seg_of = np.repeat(np.arange(len(starts)), counts)
        is_surv = (ids_s == ids_s[starts][seg_of]).astype(np.int64)
        q_s, hit_s = q_u[order], n_hit[order]
        keep = is_surv & (hit_s == 0) & (q_s >= thr)
        return pa.table(
            {
                "doc_id": pa.array(ids_s, type=pa.int64()),
                "quality_u": pa.array(q_s, type=pa.int64()),
                "n_contaminated": pa.array(hit_s, type=pa.int64()),
                "is_survivor": pa.array(is_surv, type=pa.int64()),
                "keep": pa.array(keep.astype(np.int64), type=pa.int64()),
            }
        )

    return partitioned_group_map(keyed, "__dk", verdict, parts)
