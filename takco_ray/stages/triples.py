"""Triple emission from annotated tables — the reference's
``yield_triples`` (``takco/evaluate/triples.py:13-133``) re-expressed as
ONE grouped pass.

The reference walks each table dict and yields label / class / property
triples from its nested annotation dicts. Here the four annotation
relations arrive as flat Datasets sharing a table key:

- ``cells``      (table, row, col, text)
- ``entities``   (table, row, col, uri, score)   — cell-entity links
- ``classes``    (table, col, uri, score)        — column classes
- ``properties`` (table, from_col, to_col, uri, score)

All four union into one tagged relation and shuffle ONCE on the table
key; inside each hash partition the per-table kernel reconstructs the
reference's lookup dicts and emits:

- ``label``:    (entity, rdfs:label, cell text) per entity annotation;
- ``class``:    (entity, rdf:type, class uri) per entity × column class;
- ``property``: (from-entity, prop, to-entity) when the to column carries
  entity annotations for that row, else (from-entity, prop, cell literal)
  with the to column's class as datatype when present
  (``triples.py:73-133``).

Partitioning assumption (same as cluster refinement): one table's
annotations ≪ one partition. Triple hashes are deterministic blake2b-64
over the canonical (s, p, o, datatype) serialization — the reference uses
Python's session-random ``hash()`` of rdflib nodes, which cannot survive a
distributed run.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .groupmap import partitioned_group_map_any

TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

_OUT_SCHEMA = pa.schema(
    [
        ("table", pa.string()),
        ("kind", pa.string()),
        ("s", pa.string()),
        ("p", pa.string()),
        ("o", pa.string()),
        ("o_is_literal", pa.bool_()),
        ("o_datatype", pa.string()),
        ("row", pa.int64()),
        ("col", pa.int64()),
        ("s_score", pa.float64()),
        ("o_score", pa.float64()),
        ("hash", pa.int64()),
    ]
)


def triple_hash(s: str, p: str, o: str, datatype: str | None = None) -> int:
    """Deterministic 64-bit triple id (replaces the reference's
    session-random ``hash((URIRef(s), URIRef(p), node))``)."""
    payload = "\x00".join((s, p, o, datatype or ""))
    return int.from_bytes(
        hashlib.blake2b(payload.encode(), digest_size=8).digest(), "little", signed=True
    )


def _tagged(ds, rel: int, table_col, row, c1, c2, text, uri, score):
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        neg = pa.array(np.full(n, -1, dtype=np.int64), type=pa.int64())
        empty = pa.array([""] * n, type=pa.string())
        zero = pa.array(np.zeros(n), type=pa.float64())
        return pa.table(
            {
                "table": pc.cast(t.column(table_col), pa.string()),
                "rel": pa.array(np.full(n, rel, dtype=np.int8), type=pa.int8()),
                "row": pc.cast(t.column(row), pa.int64()) if row else neg,
                "c1": pc.cast(t.column(c1), pa.int64()),
                "c2": pc.cast(t.column(c2), pa.int64()) if c2 else neg,
                "text": pc.cast(t.column(text), pa.string()) if text else empty,
                "uri": pc.cast(t.column(uri), pa.string()) if uri else empty,
                "score": pc.cast(t.column(score), pa.float64()) if score else zero,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def emit_triples(
    cells,
    entities,
    classes=None,
    properties=None,
    table_col: str = "table",
    include_type: bool = True,
    include_label: bool = True,
    num_partitions: int | None = None,
):
    """Annotated-table relations → triples Dataset (schema above)."""
    from ..util import default_join_partitions

    parts = num_partitions or default_join_partitions()
    rels = [
        _tagged(cells, 0, table_col, "row", "col", None, "text", None, None),
        _tagged(entities, 1, table_col, "row", "col", None, None, "uri", "score"),
    ]
    if classes is not None:
        rels.append(_tagged(classes, 2, table_col, None, "col", None, None, "uri", "score"))
    if properties is not None:
        rels.append(
            _tagged(properties, 3, table_col, None, "from_col", "to_col", None, "uri", "score")
        )
    union = rels[0].union(*rels[1:])

    def per_partition(g: pa.Table) -> pa.Table:
        tables = g.column("table").to_pylist()
        rel = np.asarray(g.column("rel").combine_chunks(), dtype=np.int8)
        row = np.asarray(g.column("row").combine_chunks(), dtype=np.int64)
        c1 = np.asarray(g.column("c1").combine_chunks(), dtype=np.int64)
        c2 = np.asarray(g.column("c2").combine_chunks(), dtype=np.int64)
        texts = g.column("text").to_pylist()
        uris = g.column("uri").to_pylist()
        scores = np.asarray(g.column("score").combine_chunks(), dtype=np.float64)

        # per-table lookup dicts (reference's nested annotation shape)
        by_table: dict = {}
        for i, tb in enumerate(tables):
            d = by_table.setdefault(
                tb, {"cells": {}, "ents": {}, "cls": {}, "props": {}}
            )
            if rel[i] == 0:
                d["cells"][(row[i], c1[i])] = texts[i]
            elif rel[i] == 1:
                d["ents"].setdefault(c1[i], {}).setdefault(row[i], {})[uris[i]] = scores[i]
            elif rel[i] == 2:
                d["cls"].setdefault(c1[i], {})[uris[i]] = scores[i]
            else:
                d["props"].setdefault((c1[i], c2[i]), {})[uris[i]] = scores[i]

        out = {name: [] for name in _OUT_SCHEMA.names}

        def emit(tb, kind, s, p, o, lit, dt, ri, ci, ss, os_):
            out["table"].append(tb)
            out["kind"].append(kind)
            out["s"].append(s)
            out["p"].append(p)
            out["o"].append(o)
            out["o_is_literal"].append(lit)
            out["o_datatype"].append(dt or "")
            out["row"].append(int(ri))
            out["col"].append(int(ci))
            out["s_score"].append(float(ss))
            out["o_score"].append(float(os_))
            out["hash"].append(triple_hash(s, p, o, (dt or "") if lit else None))

        for tb in sorted(by_table):
            d = by_table[tb]
            if include_label:  # triples.py:25-45
                for ci, ri_ents in sorted(d["ents"].items()):
                    for ri, ents in sorted(ri_ents.items()):
                        cell = d["cells"].get((ri, ci), "")
                        for e, esc in sorted(ents.items()):
                            emit(tb, "label", e, LABEL, cell, True, None, ri, ci, esc, 0.0)
            if include_type:  # triples.py:47-70
                for ci, clss in sorted(d["cls"].items()):
                    for cls, csc in sorted(clss.items()):
                        for ri, ents in sorted(d["ents"].get(ci, {}).items()):
                            for e, esc in sorted(ents.items()):
                                emit(tb, "class", e, TYPE, cls, False, None, ri, ci, esc, csc)
            for (fci, tci), props in sorted(d["props"].items()):  # :73-133
                to_ents = d["ents"].get(tci, {})
                isentityprop = bool(to_ents)
                for p, psc in sorted(props.items()):
                    for ri, ents in sorted(d["ents"].get(fci, {}).items()):
                        for s, ssc in sorted(ents.items()):
                            if isentityprop:
                                for o, osc in sorted(to_ents.get(ri, {}).items()):
                                    emit(tb, "property", s, p, o, False, None, ri, tci, ssc, osc)
                            else:
                                cell = d["cells"].get((ri, tci), "")
                                if not cell:
                                    continue
                                tocls = d["cls"].get(tci, {})
                                if tocls:
                                    for cls, csc in sorted(tocls.items()):
                                        emit(tb, "property", s, p, cell, True, cls, ri, tci, ssc, csc)
                                else:
                                    emit(tb, "property", s, p, cell, True, None, ri, tci, ssc, 0.0)

        arrays = []
        for field in _OUT_SCHEMA:
            arrays.append(pa.array(out[field.name], type=field.type))
        return pa.Table.from_arrays(arrays, schema=_OUT_SCHEMA)

    return partitioned_group_map_any(union, "table", per_partition, parts)
