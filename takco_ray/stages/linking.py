"""Entity-linking analogs: broadcast label lookup + triple novelty.

Re-expresses the reference's KB-side stages Ray-Data-first over a Parquet
KB table (no external services exist in this environment — the KB is data,
not a client):

- :func:`link_cells` — cell-mention → entity-id lookup (SURVEY §2 M14;
  reference ``lookup_hyperlinks`` / label DB lookup,
  ``takco/link/__init__.py:24-74``, ``takco/link/db/sqlite.py``). The label
  index is the SMALL side: built once, shipped via ``ray.put``, read by
  every map task — never re-serialized per batch and never shuffled.
- :func:`novelty_classify` — per-triple KB novelty (SURVEY §2 M20;
  reference ``get_cell_noveltyhashes``, ``takco/evaluate/novelty.py:8-58``):
  a triple (s, p, o) is ``attnovel`` when the KB holds no (s, p),
  ``valnovel`` when (s, p) exists with only different objects, ``existing``
  when (s, p, o) matches. Implemented as ONE left hash join on the (s, p)
  key followed by a per-triple any-match reduction — no KB client, no
  row-wise probing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..util import default_join_partitions

# mirror of the SQL normalization in the oracled queries: lowercase + trim
_WS = " \t\r\n"


def normalize_label(col) -> pa.ChunkedArray:
    """Lowercase + whitespace-trim — the lookup key form on both sides."""
    return pc.utf8_trim(pc.utf8_lower(col), _WS)


def build_label_index(kb_table: pa.Table, label_col: str, id_col: str):
    """label → entity-id map from a small KB table; ambiguous labels keep
    the smallest id (deterministic). Returns an object-store ref holding
    (labels_array, ids_array) sorted by label for binary-search lookup."""
    lbl = normalize_label(kb_table.column(label_col)).combine_chunks()
    ids = kb_table.column(id_col).cast(pa.int64()).combine_chunks()
    order = pc.sort_indices(
        pa.table({"l": lbl, "i": ids}), sort_keys=[("l", "ascending"), ("i", "ascending")]
    )
    lbl_s = lbl.take(order).to_numpy(zero_copy_only=False)
    ids_s = ids.take(order).to_numpy(zero_copy_only=False)
    keep = np.ones(len(lbl_s), dtype=bool)
    keep[1:] = lbl_s[1:] != lbl_s[:-1]  # first (= smallest id) per label wins
    return ray.put((lbl_s[keep], ids_s[keep]))


def link_cells(
    ds,
    mention_col: str,
    index_ref,
    entity_col: str = "entity_id",
    matched_col: str = "matched",
    missing_id: int = -1,
):
    """Annotate rows with the entity id their mention resolves to.

    The label index (from :func:`build_label_index`) is fetched once per
    task from the object store; lookup is a vectorized ``pc.index_in``
    against the dictionary of the batch's mentions (hash probe on distinct
    mentions, gather per row). Unmatched mentions get ``missing_id``.
    """

    def lookup(t: pa.Table) -> pa.Table:
        labels, ids = ray.get(index_ref)
        m = normalize_label(t.column(mention_col)).combine_chunks()
        enc = pc.dictionary_encode(m)
        dict_pos = pc.index_in(enc.dictionary, pa.array(labels, type=pa.string()))
        dict_ids = np.full(len(enc.dictionary), missing_id, dtype=np.int64)
        hit = dict_pos.is_valid().to_numpy(zero_copy_only=False)
        hitpos = pc.fill_null(dict_pos, 0).to_numpy(zero_copy_only=False).astype(np.int64)[hit]
        dict_ids[hit] = ids[hitpos]
        codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        ent = np.full(len(codes), missing_id, dtype=np.int64)
        valid = codes >= 0
        ent[valid] = dict_ids[codes[valid]]
        return t.append_column(
            entity_col, pa.array(ent, type=pa.int64())
        ).append_column(matched_col, pa.array(ent != missing_id, type=pa.bool_()))

    return ds.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)


def novelty_classify(
    triples,
    kb,
    key_cols: list[str],
    val_col: str,
    out_col: str = "novelty",
):
    """Classify each triple row against KB rows sharing its key columns.

    ``triples`` and ``kb`` are Datasets with ``key_cols`` (the (s, p) part)
    and ``val_col`` (the object). One left hash join on the key; a KB key
    may hold several objects, so the join fans out and a per-triple
    reduction ORs the exact-object matches back to one row. Returns the
    triple rows + ``novelty`` ∈ {attnovel, valnovel, existing}.

    At scale both sides shuffle once on the same key; no broadcast is
    assumed (the KB side of novelty checks is typically NOT small).
    """
    key_cols = list(key_cols)
    kb_named = kb.map_batches(
        lambda t: pa.table(
            {f"__kb_{i}": t.column(c) for i, c in enumerate(key_cols)}
            | {
                "__kb_val": t.column(val_col),
                # join coalesces equi-keys away; this flag survives as the
                # unambiguous "KB row present" signal (stays correct even for
                # null KB objects)
                "__kb_has": pa.array(np.ones(t.num_rows, dtype=np.int8), type=pa.int8()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from ..util import join_remote_args

    _jparts = default_join_partitions()
    joined = triples.join(
        kb_named,
        join_type="left_outer",
        num_partitions=_jparts,
        on=tuple(key_cols),
        right_on=tuple(f"__kb_{i}" for i in range(len(key_cols))),
        aggregator_ray_remote_args=join_remote_args(_jparts),
    )

    def classify(t: pa.Table) -> pa.Table:
        has_key = t.column("__kb_has").is_valid()
        eq = pc.and_kleene(
            has_key,
            pc.equal(
                t.column(val_col).cast(pa.string()),
                t.column("__kb_val").cast(pa.string()),
            ),
        )
        return pa.table(
            {
                **{c: t.column(c) for c in key_cols},
                val_col: t.column(val_col),
                "__has_key": pc.cast(has_key, pa.int64()),
                "__eq": pc.cast(pc.fill_null(eq, False), pa.int64()),
            }
        )

    flat = joined.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    # per-triple any-match: max over the fan-out copies
    agg = flat.groupby(key_cols + [val_col]).max(["__has_key", "__eq"])

    def label(t: pa.Table) -> pa.Table:
        has_key = t.column("max(__has_key)").to_numpy(zero_copy_only=False) > 0
        eq = t.column("max(__eq)").to_numpy(zero_copy_only=False) > 0
        nov = np.where(~has_key, "attnovel", np.where(eq, "existing", "valnovel"))
        return pa.table(
            {
                **{c: t.column(c) for c in key_cols},
                val_col: t.column(val_col),
                out_col: pa.array(nov.astype(object), type=pa.string()),
            }
        )

    return agg.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)


def novelty_counts(classified, out_col: str = "novelty"):
    """Tiny rollup: rows per novelty class (reference
    ``count_noveltyhashes`` without the gold/pred P/R arm, which
    ``stages/report.py`` already covers for clusters)."""
    return classified.groupby(out_col).count().rename_columns({"count()": "n"})
