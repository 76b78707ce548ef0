"""Gold benchmark dataset loaders (T2D-style) as Ray Datasets.

Re-expresses the reference's evaluation-dataset loaders (SURVEY §2 S4;
reference ``takco/evaluate/dataset/t2d.py``) Ray-Data-first: the directory
listing happens once on the driver, but every file parses inside
``map_batches`` over a Dataset of file paths — a corpus of thousands of
small gold CSVs parses in parallel and streams.

Layout handled (T2D v1, ``t2d.py:40-45``):

- ``tables_instance/*.csv``      — table rows (first N rows = header)
- ``entities_instance/*.csv``    — rows (uri, celltext, rownum); any negative
  rownum in a file means the table has 0 header rows (``t2d.py:186-194``)
- ``classes_instance.csv``       — (table_fname, label, uri[, keys])
- ``attributes_instance/*.csv``  — (uri, header, iskey, colnum); iskey=true
  marks the key column (``t2d.py:121-135``)

URI cleanup mirrors ``fix_uri`` (``t2d.py:87-102``): html-unescape +
percent-decode + the dbpedia host/path normalizations. No gold data ships in
this environment, so tests generate the layout deterministically.
"""

from __future__ import annotations

import csv
import html
import os
import urllib.parse

import pyarrow as pa

import ray.data


def fix_uri(uri: str, fixes: dict[str, str] | None = None) -> str:
    """Reference URI normalization (``t2d.py:87-102``)."""
    uri = html.unescape(urllib.parse.unquote(uri))
    uri = uri.replace("dbpedia_org", "dbpedia.org").replace("/page/", "/resource/")
    if fixes:
        uri = fixes.get(uri, uri)
    if uri.startswith("http://dbpedia.org/resource/"):
        part = uri[len("http://dbpedia.org/resource/"):]
        uri = "http://dbpedia.org/resource/" + urllib.parse.quote_plus(
            part, safe="'()&,!:"
        )
    return uri


def _name(fpath: str) -> str:
    return os.path.basename(fpath).split(".")[0]


def _files_ds(directory: str) -> ray.data.Dataset:
    paths = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if os.path.isfile(os.path.join(directory, f))
    )
    return ray.data.from_items([{"path": p} for p in paths])


def load_t2d_tables(tabledir: str) -> ray.data.Dataset:
    """Table bodies: one output row per (table, row) —
    ``(table, row_idx, cells: list<string>)``. Parsing runs distributed."""

    def parse(t: pa.Table) -> pa.Table:
        names, idxs, cells = [], [], []
        for p in t.column("path").to_pylist():
            raw = open(p, "rb").read().decode("utf-8", errors="ignore")
            for ri, row in enumerate(csv.reader(raw.splitlines())):
                names.append(_name(p))
                idxs.append(ri)
                cells.append(row)
        return pa.table(
            {
                "table": pa.array(names, type=pa.string()),
                "row_idx": pa.array(idxs, type=pa.int64()),
                "cells": pa.array(cells, type=pa.list_(pa.string())),
            }
        )

    return _files_ds(tabledir).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def load_t2d_keycols(propdir: str) -> ray.data.Dataset:
    """Key column per table from the attributes files (iskey=true rows)."""

    def parse(t: pa.Table) -> pa.Table:
        names, keycols = [], []
        for p in t.column("path").to_pylist():
            for row in csv.reader(open(p, encoding="utf-8", errors="ignore")):
                uri, header, iskey, colnum = _attr_row(row)
                if iskey.lower() == "true":
                    names.append(_name(p))
                    keycols.append(int(colnum))
        return pa.table(
            {
                "table": pa.array(names, type=pa.string()),
                "keycol": pa.array(keycols, type=pa.int64()),
            }
        )

    return _files_ds(propdir).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def _attr_row(row: list[str]) -> tuple[str, str, str, str]:
    if len(row) == 4:
        return row[0], row[1], row[2], row[3]
    uri, header, colnum = row
    return uri, header, "", colnum


def load_t2d_properties(propdir: str, keycols: dict[str, int]) -> ray.data.Dataset:
    """Gold property annotations: (table, from_col=keycol, to_col, uri)."""

    def parse(t: pa.Table) -> pa.Table:
        names, fc, tc, uris = [], [], [], []
        for p in t.column("path").to_pylist():
            name = _name(p)
            keycol = keycols.get(name)
            for row in csv.reader(open(p, encoding="utf-8", errors="ignore")):
                uri, header, iskey, colnum = _attr_row(row)
                if str(keycol) != str(colnum):
                    names.append(name)
                    fc.append(-1 if keycol is None else int(keycol))
                    tc.append(int(colnum))
                    uris.append(fix_uri(uri))
        return pa.table(
            {
                "table": pa.array(names, type=pa.string()),
                "from_col": pa.array(fc, type=pa.int64()),
                "to_col": pa.array(tc, type=pa.int64()),
                "uri": pa.array(uris, type=pa.string()),
            }
        )

    return _files_ds(propdir).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def load_t2d_entities(entitydir: str, keycols: dict[str, int]) -> ray.data.Dataset:
    """Gold row→entity annotations: (table, row_idx, col_idx, uri).

    Mirrors the reference's header-offset rule (``t2d.py:186-213``): row
    numbers shift down by one header row unless the file contains a negative
    row number (then the table is headerless and rows keep their index).
    """

    def parse(t: pa.Table) -> pa.Table:
        names, ri_, ci_, uris = [], [], [], []
        for p in t.column("path").to_pylist():
            name = _name(p)
            keycol = keycols.get(name, -1)
            rows = [r for r in csv.reader(open(p, encoding="utf-8", errors="ignore")) if r]
            headerless = any(int(r[-1]) < 0 for r in rows)
            for row in rows:
                if len(row) != 3:
                    continue
                uri, celltext, rownum = row
                ri = int(rownum) if headerless else int(rownum) - 1
                names.append(name)
                ri_.append(ri)
                ci_.append(int(keycol))
                uris.append(fix_uri(uri))
        return pa.table(
            {
                "table": pa.array(names, type=pa.string()),
                "row_idx": pa.array(ri_, type=pa.int64()),
                "col_idx": pa.array(ci_, type=pa.int64()),
                "uri": pa.array(uris, type=pa.string()),
            }
        )

    return _files_ds(entitydir).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def load_t2d_classes(classfile: str, keycols: dict[str, int]) -> pa.Table:
    """Gold class per table (driver-side: ONE small csv): (table, col_idx, uri)."""
    names, cis, uris = [], [], []
    if os.path.exists(classfile):
        for row in csv.reader(open(classfile, encoding="utf-8", errors="ignore")):
            if not row:
                continue
            table_fname, label, uri = row[0], row[1], row[2]
            name = _name(table_fname)
            names.append(name)
            cis.append(int(keycols.get(name, -1)))
            uris.append(fix_uri(uri))
    return pa.table(
        {
            "table": pa.array(names, type=pa.string()),
            "col_idx": pa.array(cis, type=pa.int64()),
            "uri": pa.array(uris, type=pa.string()),
        }
    )


def load_t2d(root: str) -> dict:
    """Load a T2D-v1 layout into Datasets + small driver tables.

    Returns ``{"tables": Dataset, "keycols": dict, "entities": Dataset,
    "properties": Dataset, "classes": pa.Table}`` — the gold side feeds
    ``stages/report.py`` scoring the same way synthetic gold does.
    """
    tabledir = os.path.join(root, "tables_instance")
    entitydir = os.path.join(root, "entities_instance")
    classfile = os.path.join(root, "classes_instance.csv")
    propdir = os.path.join(root, "attributes_instance")
    keycols = {
        r["table"]: int(r["keycol"])
        for r in load_t2d_keycols(propdir).take_all()
    }
    return {
        "tables": load_t2d_tables(tabledir),
        "keycols": keycols,
        "entities": load_t2d_entities(entitydir, keycols),
        "properties": load_t2d_properties(propdir, keycols),
        "classes": load_t2d_classes(classfile, keycols),
    }


# --------------------------------------------------------------------------
# SemTab layout (reference takco/evaluate/dataset/semtab.py:17-45)
# --------------------------------------------------------------------------

_SEMTAB_ISNUMBER = __import__("re").compile(r"^[\d.,\-\+\%]+$")


def load_semtab_tables(root: str) -> ray.data.Dataset:
    """SemTab challenge layout: ``<root>/tables/*.csv``, first row = header.

    One output row per table — ``(table, n_rows, n_cols, header:
    list<string>, rows_json, entcols: list<int64>)``. ``entcols`` mirrors
    the reference's entity-column heuristic (``semtab.py:32-37``): columns
    where fewer than half the cells are numeric. Parsing runs distributed
    over the file list."""
    import json

    def parse(t: pa.Table) -> pa.Table:
        names, n_rows, n_cols, headers, rows_json, entcols = [], [], [], [], [], []
        for p in t.column("path").to_pylist():
            raw = open(p, "rb").read().decode("utf-8", errors="ignore")
            rows = list(csv.reader(raw.splitlines()))
            if not rows:
                continue
            ec = [
                ci
                for ci, col in enumerate(zip(*rows))
                if sum(bool(_SEMTAB_ISNUMBER.match(c)) for c in col) < len(col) / 2
            ]
            names.append(_name(p))
            headers.append(rows[0])
            rows_json.append(json.dumps(rows[1:]))
            n_rows.append(len(rows) - 1)
            n_cols.append(max((len(r) for r in rows), default=0))
            entcols.append(ec)
        return pa.table(
            {
                "table": pa.array(names, type=pa.string()),
                "n_rows": pa.array(n_rows, type=pa.int64()),
                "n_cols": pa.array(n_cols, type=pa.int64()),
                "header": pa.array(headers, type=pa.list_(pa.string())),
                "rows_json": pa.array(rows_json, type=pa.string()),
                "entcols": pa.array(entcols, type=pa.list_(pa.int64())),
            }
        )

    return _files_ds(os.path.join(root, "tables")).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def load_semtab_cea(targetfile: str) -> pa.Table:
    """Cell-Entity-Annotation gold: csv rows ``(table, ri, ci[, uri])``
    (reference CEA target format, ``semtab.py:79-103``; 1-based row index
    counts the header, shifted to 0-based body rows here). Driver-side —
    one small csv."""
    names, ris, cis, uris = [], [], [], []
    with open(targetfile, encoding="utf-8", errors="ignore") as f:
        for row in csv.reader(f):
            if not row:
                continue
            if len(row) < 4:
                row = row + [""] * (4 - len(row))
            table, ri, ci, uri = row[:4]
            names.append(table)
            ris.append(int(ri) - 1)
            cis.append(int(ci))
            uris.append(fix_uri(uri) if uri else "")
    return pa.table(
        {
            "table": pa.array(names, type=pa.string()),
            "row_idx": pa.array(ris, type=pa.int64()),
            "col_idx": pa.array(cis, type=pa.int64()),
            "uri": pa.array(uris, type=pa.string()),
        }
    )


# --------------------------------------------------------------------------
# WebDataCommons layout (reference takco/evaluate/dataset/wdc.py:13-60)
# --------------------------------------------------------------------------

def load_wdc_tables(fnames: list[str]) -> ray.data.Dataset:
    """WDC web-table jsonl: each line one doc with a COLUMN-MAJOR
    ``relation`` matrix; only ``headerPosition == "FIRST_ROW"`` docs
    convert (reference ``WebDataCommons.convert``, ``wdc.py:43-74``):
    the relation transposes to rows, first row becomes the single header
    row, and the page domain comes from the URL.

    One output row per table — ``(table, table_num, url, domain,
    page_title, caption, n_cols, n_rows, header: list<string>,
    rows_json)``. One task per jsonl shard."""
    import json
    import urllib.parse as _url

    ds = ray.data.from_items([{"path": p} for p in sorted(fnames)])

    def parse(t: pa.Table) -> pa.Table:
        cols: dict = {
            k: []
            for k in (
                "table", "table_num", "url", "domain", "page_title",
                "caption", "n_cols", "n_rows", "header", "rows_json",
            )
        }
        for p in t.column("path").to_pylist():
            fname = os.path.basename(p)
            with open(p, encoding="utf-8", errors="ignore") as f:
                for li, line in enumerate(f):
                    if not line.strip():
                        continue
                    try:
                        doc = json.loads(line)
                    except json.JSONDecodeError:
                        # reference drops malformed jsonl records rather
                        # than failing the shard (robust_json_loads_lines,
                        # takco/util.py:12-21)
                        continue
                    if not isinstance(doc, dict):
                        continue
                    if "table" in doc:
                        doc = doc["table"]
                    if doc.get("headerPosition") != "FIRST_ROW":
                        continue
                    rel = doc.get("relation") or []
                    if not rel:
                        continue
                    header, *body = zip(*rel)  # column-major → rows
                    url = doc.get("url", "")
                    cols["table"].append(f"{fname}#{li}")
                    cols["table_num"].append(int(doc.get("tableNum", 0)))
                    cols["url"].append(url)
                    cols["domain"].append(_url.urlparse(url).netloc if url else "")
                    cols["page_title"].append(
                        (doc.get("pageTitle") or "").strip() or url
                    )
                    cols["caption"].append((doc.get("title") or "").strip())
                    cols["n_cols"].append(len(header))
                    cols["n_rows"].append(len(body))
                    cols["header"].append(list(header))
                    cols["rows_json"].append(json.dumps([list(r) for r in body]))
        return pa.table(
            {
                "table": pa.array(cols["table"], type=pa.string()),
                "table_num": pa.array(cols["table_num"], type=pa.int64()),
                "url": pa.array(cols["url"], type=pa.string()),
                "domain": pa.array(cols["domain"], type=pa.string()),
                "page_title": pa.array(cols["page_title"], type=pa.string()),
                "caption": pa.array(cols["caption"], type=pa.string()),
                "n_cols": pa.array(cols["n_cols"], type=pa.int64()),
                "n_rows": pa.array(cols["n_rows"], type=pa.int64()),
                "header": pa.array(cols["header"], type=pa.list_(pa.string())),
                "rows_json": pa.array(cols["rows_json"], type=pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
