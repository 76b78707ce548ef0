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
import io
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
