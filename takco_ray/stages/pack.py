"""Sequence packing — concat-and-chunk documents into fixed-length training
sequences (the GPT-style "pack everything into L-token blocks" step).

A training-data engine's last mile: documents, in a deterministic global
order (ascending id), are conceptually concatenated into one token stream
and cut every ``seq_len`` tokens; the operator emits one row per
(document × sequence) overlap — which sequence(s) each document lands in
and the global token interval it occupies there. Downstream loaders join
content by id and slice. The reference has no packing stage (its unit is
the table, not the token); this extends the beyond-reference LLM tier.

Shape — a distributed prefix scan, never a global sort of content:

1. one content pass computes per-doc token counts (vectorized
   ``token_stream`` scanner) → a 16-byte (id, n) relation; content is
   never shuffled or re-read;
2. the (id, n) relation is RANGE-bucketed by id (order by id == order by
   (bucket, id)), per-bucket token totals reduce to ``num_buckets`` rows
   on the driver where the exclusive prefix is computed — the only
   driver-side state, ≤ a few KB;
3. one grouped pass per bucket: sort by id, local cumsum + the bucket's
   prefix offset, and a vectorized span explode (``np.repeat`` + one
   arange — a doc spanning k sequences emits k rows, k ≤ n/seq_len + 1).

The (id, n) relation materializes once (step 2 needs its min/max id and
step 3 re-reads it); at 16 B/row that is ~1.6 TB per 10¹¹ documents —
object-store-spillable, and 4 orders of magnitude below the content it
indexes. Everything is integer math on an engine-independent contract
(order by id, cut every L), so a SQL window oracle reproduces it
bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .groupmap import partitioned_group_map, segment_boundaries
from ..util import default_concurrency


def pack_sequences(
    ds,
    id_column: str,
    text_column: str,
    seq_len: int = 512,
    num_buckets: int | None = None,
    seed: int = 0,
):
    """(doc_id, seq_id, tok_begin, tok_end) — packing plan rows.

    ``tok_begin``/``tok_end`` are GLOBAL token offsets (end exclusive)
    clipped to sequence ``seq_id``'s window ``[seq_id·L, (seq_id+1)·L)``;
    a document's rows across sequences partition its own token interval.
    Zero-token documents contribute nothing (same as the SQL oracle's
    ``WHERE n > 0``).
    """
    from ..functions.tokenize import token_stream

    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")

    def count_tokens(batch: pa.Table) -> pa.Table:
        _h, _l, counts = token_stream(batch.column(text_column), seed)
        n = counts.astype(np.int64)
        keep = n > 0
        sel = pa.array(np.flatnonzero(keep), type=pa.int64())
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()).take(sel),
                "n": pa.array(n[keep], type=pa.int64()),
            }
        )

    counts = ds.map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # 16 B/row id+count relation; content is NOT retained

    buckets = num_buckets or max(64, default_concurrency()[1])

    # range-bucket boundaries from the id domain (one cheap aggregate over
    # the small relation) — RANGE, not hash: ascending id order must equal
    # ascending (bucket, id) order for the prefix to compose
    from ray.data.aggregate import Max, Min

    stats = counts.aggregate(Min("id"), Max("id"))
    if stats["min(id)"] is None:
        # every document tokenized to zero — the empty plan, not a crash
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "seq_id": pa.array([], type=pa.int64()),
                    "tok_begin": pa.array([], type=pa.int64()),
                    "tok_end": pa.array([], type=pa.int64()),
                }
            )
        )
    lo, hi = int(stats["min(id)"]), int(stats["max(id)"])
    span = max(1, hi - lo + 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("id").combine_chunks(), dtype=np.int64)
        # float64 math, not `(ids-lo)*buckets//span`: the integer product
        # overflows int64 once span > 2^63/buckets (hash-derived ids —
        # stable_file_id, epoch_shuffle keys — have exactly that span) and
        # silently emits negative buckets. int64→float64 and division by a
        # positive constant are monotone, which is all bucketing needs.
        b = ((ids - lo).astype(np.float64) * buckets / span).astype(np.int64)
        b = np.clip(b, 0, buckets - 1)
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    bucketed = counts.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    # per-bucket token totals → driver prefix (num_buckets int64s)
    def bucket_partials(t: pa.Table) -> pa.Table:
        b = np.asarray(t.column("bucket").combine_chunks(), dtype=np.int64)
        n = np.asarray(t.column("n").combine_chunks(), dtype=np.int64)
        # integer scatter-add (bincount's float64 weights lose exactness
        # past 2^53 tokens per bucket)
        tot = np.zeros(buckets, dtype=np.int64)
        np.add.at(tot, b, n)
        return pa.table({"b": pa.array(np.arange(buckets), type=pa.int64()),
                         "tot": pa.array(tot, type=pa.int64())})

    partials = bucketed.map_batches(
        bucket_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = np.zeros(buckets, dtype=np.int64)
    for chunk in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        # add.at, not fancy-index +=: a chunk bundling two partial tables
        # repeats bucket ids, and `a[idx] += v` drops all but the last add
        np.add.at(totals, np.asarray(chunk.column("b")), np.asarray(chunk.column("tot")))
    prefix = np.concatenate([[0], np.cumsum(totals)[:-1]])  # exclusive

    def emit_spans(part: pa.Table) -> pa.Table:
        # partitioned_group_map delivers rows sorted by bucket; finish the
        # order (bucket, id) so local cumsum + prefix == the global scan
        b = np.asarray(part.column("bucket").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("id").combine_chunks(), dtype=np.int64)
        n = np.asarray(part.column("n").combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, b))
        b, ids, n = b[order], ids[order], n[order]
        cum = np.cumsum(n) - n  # local exclusive cumsum
        starts = segment_boundaries(b)
        # rebase each bucket segment: local-prev within bucket + global prefix
        seg_base = cum[starts]
        seg_idx = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(b))))
        prev = cum - seg_base[seg_idx] + prefix[b]
        first = prev // L
        last = (prev + n - 1) // L
        m = last - first + 1
        total = int(m.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "seq_id": pa.array([], type=pa.int64()),
                    "tok_begin": pa.array([], type=pa.int64()),
                    "tok_end": pa.array([], type=pa.int64()),
                }
            )
        doc_idx = np.repeat(np.arange(len(m)), m)
        off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
        seq = first[doc_idx] + off
        beg = np.maximum(prev[doc_idx], seq * L)
        end = np.minimum(prev[doc_idx] + n[doc_idx], (seq + 1) * L)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx], type=pa.int64()),
                "seq_id": pa.array(seq, type=pa.int64()),
                "tok_begin": pa.array(beg, type=pa.int64()),
                "tok_end": pa.array(end, type=pa.int64()),
            }
        )

    parts = default_concurrency()[1]
    return partitioned_group_map(bucketed, "bucket", emit_spans, parts)


def chunk_docs(ds, text_column: str, id_column: str, size: int,
               overlap: int = 0):
    """(id, chunk_idx, chunk) — overlapping character-window chunks of each
    document, the embedding-pipeline pre-step (long docs → fixed windows
    with ``overlap`` chars of shared context between neighbors).

    Windows start every ``stride = size - overlap`` characters; the last
    window is the first one reaching the end (``max_k = 0`` if the doc fits,
    else ``ceil((L - size)/stride)``), so no start runs past the text and
    the tail is never emitted twice. Empty / null docs emit nothing.

    Pure stateless projection — a flat_map in shape, but vectorized per
    CHUNK INDEX, not per row: iteration ``k`` slices every doc with more
    than ``k`` chunks in one ``utf8_slice_codeunits`` call with scalar
    offsets (Arrow's slice kernel takes no per-row offsets), so the loop
    count is the batch's max chunks-per-doc, with the subset shrinking each
    step. Character (codepoint) semantics match SQL ``substr`` exactly, so
    a DuckDB ``UNNEST(range(...))`` oracle reproduces output bit-for-bit.
    At scale: nothing shuffles; output is ~L/stride × input bytes, so size
    the downstream batch accordingly.
    """
    if not (0 <= overlap < size):
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch.column(text_column)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = np.asarray(batch.column(id_column).combine_chunks(), dtype=np.int64)
        L = np.asarray(pc.utf8_length(pc.fill_null(text, "")), dtype=np.int64)
        max_k = np.where(
            L <= size,
            0,
            np.ceil(np.maximum(L - size, 0) / stride).astype(np.int64),
        ).astype(np.int64)
        n_chunks = np.where(L > 0, max_k + 1, 0)
        out_ids: list = []
        out_k: list = []
        out_chunks: list = []
        kmax = int(n_chunks.max()) if len(n_chunks) else 0
        for k in range(kmax):
            sel = np.flatnonzero(n_chunks > k)
            sub = text.take(pa.array(sel, type=pa.int64()))
            out_chunks.append(
                pc.utf8_slice_codeunits(sub, start=k * stride, stop=k * stride + size)
            )
            out_ids.append(ids[sel])
            out_k.append(np.full(len(sel), k, dtype=np.int64))
        if not out_ids:
            return pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "chunk_idx": pa.array([], type=pa.int64()),
                    "chunk": pa.array([], type=pa.string()),
                }
            )
        return pa.table(
            {
                "id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "chunk_idx": pa.array(np.concatenate(out_k), type=pa.int64()),
                "chunk": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in out_chunks]
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
