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


def integrate_nary(
    cells,
    facts,
    row_col: str = "row_idx",
    col_col: str = "col_idx",
    text_col: str = "celltext",
    ent_col: str = "entity_uri",
    num_partitions: int | None = None,
):
    """Column-property discovery by n-ary KB fact matching — the reference's
    ``NaryDB.integrate`` loop (``takco/link/integrate.py:33-75``), M17's KB
    arm, re-expressed as two hash joins + one aggregate (no per-row KB
    service calls):

    1. cells carrying a linked entity (``ent_col`` non-null) hash-join
       ``facts`` on entity = subject → candidate (row, from_col, prop,
       object) rows;
    2. candidates and the table's normalized cell texts union into ONE
       grouped pass keyed (row, object-text): inside each hash partition a
       vectorized sorted-merge pairs fact objects with same-row cell texts
       (the reference's literal match, string form) and pre-aggregates
       (from_col, to_col, prop) partial counts — one exchange, same cost
       as a second hash join, and it sidesteps Ray's join-of-join
       empty-partition schema loss;
    3. a small final count-sum per (from_col, to_col, prop) gives the
       reference's ``n`` (with the caller's row count, ``n / nrows`` — the
       column-relation score) as exact integers, SQL-oracle-stable.

    ``cells``: one row per (row, col, celltext[, entity_uri nullable]);
    ``facts``: (s, p, o) with o in surface-text form. Self-matches
    (from_col == to_col) are dropped like the reference's ``c1 == c2``
    guard. Both exchanges shuffle on bounded keys; nothing is broadcast
    (a KB fact table is typically NOT small).
    """
    from ..util import default_join_partitions, join_remote_args

    parts = num_partitions or default_join_partitions()

    def key_side(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t.column(ent_col))
        t = t.filter(keep)
        return pa.table(
            {
                "__row": t.column(row_col),
                "__from_col": t.column(col_col),
                "__ent": pc.cast(t.column(ent_col), pa.string()),
            }
        )

    def fact_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__s": pc.cast(t.column("s"), pa.string()),
                "__p": pc.cast(t.column("p"), pa.string()),
                "__o": normalize_label(pc.cast(t.column("o"), pa.string())),
            }
        )

    keys = cells.map_batches(key_side, batch_format="pyarrow", zero_copy_batch=True)
    kb = facts.map_batches(fact_side, batch_format="pyarrow", zero_copy_batch=True)
    cand = keys.join(
        kb,
        join_type="inner",
        num_partitions=parts,
        on=("__ent",),
        right_on=("__s",),
        aggregator_ray_remote_args=join_remote_args(parts),
    )

    # rows of BOTH relations under one composite (row \x00 text) key;
    # fact rows carry (from_col, prop) with to_col = -1, text rows carry
    # to_col with from_col = -1 — the union shuffles each side once
    _SEP = "\x00"

    def cand_rows(t: pa.Table) -> pa.Table:
        # a hash-join's empty output partitions carry NO columns (Ray
        # emits them schemaless) — re-assert the schema explicitly
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema(
                [("__k", pa.string()), ("from_col", pa.int64()),
                 ("to_col", pa.int64()), ("prop", pa.string())]
            ).empty_table()
        k = pc.binary_join_element_wise(
            pc.cast(t.column("__row"), pa.string()), t.column("__o"), _SEP
        )
        return pa.table(
            {
                "__k": k,
                "from_col": pc.cast(t.column("__from_col"), pa.int64()),
                "to_col": pa.array(
                    np.full(t.num_rows, -1, dtype=np.int64), type=pa.int64()
                ),
                "prop": t.column("__p"),
            }
        )

    def text_rows(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column(row_col), pa.string()),
            normalize_label(pc.cast(t.column(text_col), pa.string())),
            _SEP,
        )
        return pa.table(
            {
                "__k": k,
                "from_col": pa.array(
                    np.full(t.num_rows, -1, dtype=np.int64), type=pa.int64()
                ),
                "to_col": pc.cast(t.column(col_col), pa.int64()),
                "prop": pa.array([""] * t.num_rows, type=pa.string()),
            }
        )

    both = cand.map_batches(
        cand_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        cells.map_batches(text_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    from .groupmap import partitioned_group_map_any

    def match_partition(g: pa.Table) -> pa.Table:
        # vectorized sorted-merge of fact rows × text rows per key
        enc = pc.dictionary_encode(g.column("__k").combine_chunks())
        codes = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
        from_col = np.asarray(g.column("from_col").combine_chunks(), dtype=np.int64)
        to_col = np.asarray(g.column("to_col").combine_chunks(), dtype=np.int64)
        penc = pc.dictionary_encode(g.column("prop").combine_chunks())
        pcodes = np.asarray(pc.fill_null(penc.indices, 0), dtype=np.int64)
        fact = from_col >= 0
        f_codes, f_from, f_prop = codes[fact], from_col[fact], pcodes[fact]
        t_codes, t_to = codes[~fact], to_col[~fact]
        empty = pa.table(
            {
                "from_col": pa.array([], type=pa.int64()),
                "to_col": pa.array([], type=pa.int64()),
                "prop": pa.array([], type=pa.string()),
                "n_partial": pa.array([], type=pa.int64()),
            }
        )
        if len(f_codes) == 0 or len(t_codes) == 0:
            return empty
        t_order = np.argsort(t_codes, kind="stable")
        t_sorted, t_to_sorted = t_codes[t_order], t_to[t_order]
        uniq, starts = np.unique(t_sorted, return_index=True)
        cnts = np.diff(np.append(starts, len(t_sorted)))
        pos = np.searchsorted(uniq, f_codes)
        pos = np.minimum(pos, len(uniq) - 1)
        hit = uniq[pos] == f_codes
        if not hit.any():
            return empty
        fh_from, fh_prop = f_from[hit], f_prop[hit]
        n_text = cnts[pos[hit]]
        total = int(n_text.sum())
        cum0 = np.concatenate([[0], np.cumsum(n_text)[:-1]]).astype(np.int64)
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum0, n_text)
        tidx = np.repeat(starts[pos[hit]], n_text) + intra
        out_from = np.repeat(fh_from, n_text)
        out_prop = np.repeat(fh_prop, n_text)
        out_to = t_to_sorted[tidx]
        keep = out_from != out_to  # the reference's c1 == c2 guard
        out_from, out_to, out_prop = out_from[keep], out_to[keep], out_prop[keep]
        # pre-aggregate partial counts inside the partition
        trip = np.stack([out_from, out_to, out_prop], axis=1)
        utrip, ucnt = np.unique(trip, axis=0, return_counts=True)
        return pa.table(
            {
                "from_col": pa.array(utrip[:, 0], type=pa.int64()),
                "to_col": pa.array(utrip[:, 1], type=pa.int64()),
                "prop": penc.dictionary.take(
                    pa.array(utrip[:, 2], type=pa.int64())
                ),
                "n_partial": pa.array(ucnt.astype(np.int64), type=pa.int64()),
            }
        )

    partials = partitioned_group_map_any(both, "__k", match_partition, parts)
    counts = partials.groupby(["from_col", "to_col", "prop"]).sum("n_partial")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "from_col": t.column("from_col"),
                "to_col": t.column("to_col"),
                "prop": t.column("prop"),
                "n_matches": pc.cast(t.column("sum(n_partial)"), pa.int64()),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
