"""Fingerprint / feature columns for the files corpus.

The reference derives per-table fields lazily on access
(``takco/table.py:164-173``: ``numCols``, ``headerId`` content hash, …).
Here the analogous derived columns — ``sha256(content)`` (the per-row
invariant the driver checks), deterministic ``file_id``, size features — are
materialized ONCE by a single zero-copy ``map_batches`` pass and carried in
the schema, so every later stage can project them without touching
``content`` again (SURVEY.md §7.5: keep MB-sized content out of the
edge/CC path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import sha256_hex_arrow, stable_file_id

FINGERPRINT_COLUMNS = ["file_id", "sha256", "size", "n_lines"]


def add_fingerprint_columns(batch: pa.Table) -> pa.Table:
    """pyarrow batch fn: append file_id / sha256 / size / n_lines.

    ``sha256`` matches DuckDB's ``sha256(text)`` and the generator's
    precomputed ``labels.sha256`` — the end-to-end content invariant.
    ``size``/``n_lines`` come from pyarrow compute kernels (no Python loop);
    sha256 itself is a per-row hashlib call (C-speed, unavoidable).
    """
    content = batch.column("content")
    file_id = stable_file_id(
        batch.column("repo").to_pylist(),
        batch.column("path").to_pylist(),
        batch.column("commit").to_pylist(),
    )
    sha = sha256_hex_arrow(content)
    size = pc.binary_length(content)
    n_lines = pc.count_substring(content, "\n")
    return batch.append_column(
        "file_id", pa.array(file_id, type=pa.int64())
    ).append_column("sha256", pa.array(sha, type=pa.string())).append_column(
        "size", pc.cast(size, pa.int64())
    ).append_column("n_lines", pc.cast(n_lines, pa.int64()))


def fingerprint(ds, **map_kwargs):
    """Dataset → Dataset with fingerprint columns appended."""
    return ds.map_batches(
        add_fingerprint_columns, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )


# comment patterns per language family; conservative (no string-literal
# awareness — normalization feeds similarity, not compilation). Applied with
# Arrow's re2 kernel (`pc.replace_substring_regex`) — the whole normalization
# chain is C-vectorized over the column, no per-row Python. re2 equivalence
# notes: `(?s)` replaces Python's DOTALL for block comments; `//[^\n]*`
# without an anchor equals `(?m)//[^\n]*$` because the greedy `[^\n]*`
# always reaches the line boundary.
_COMMENT_PATTERNS = [r"(?s)/\*.*?\*/", r"//[^\n]*", r"#[^\n]*"]
_WS_PATTERNS = [(r"[ \t]+", " "), (r"(?m)[ \t]+$", ""), (r"\n{2,}", "\n")]


def normalize_content(
    ds,
    content_column: str = "content",
    out_column: str = "content_norm",
    strip_comments: bool = True,
    collapse_whitespace: bool = True,
):
    """Append a normalized-content column (comment + whitespace churn removal).

    The code-corpus analog of the reference's ``reshape.restructure``
    cleaning chain (``takco/reshape/clean.py:18-70``): deterministic textual
    canonicalization before shingling, so cosmetic edits don't perturb
    similarity.
    """

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(content_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = pc.fill_null(col, "")
        if strip_comments:
            for pat in _COMMENT_PATTERNS:
                out = pc.replace_substring_regex(out, pat, "")
        if collapse_whitespace:
            for pat, repl in _WS_PATTERNS:
                out = pc.replace_substring_regex(out, pat, repl)
        out = pc.utf8_trim_whitespace(out)
        return batch.append_column(out_column, out.cast(pa.large_string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class JsonExtract:
    """Actor-pool stage: extract typed top-level fields from a JSON string
    column — the engine's handle on the reference's stringly-typed nested
    document model (every takco table IS a JSON dict,
    ``takco/table.py:149-232``; here the nested payload is a column).

    ``fields``: ``{out_column: (key, "int64" | "float64" | "string")}``.
    Parsing is per row (JSON is inherently row-structured) but in C —
    ``json.loads`` per string with no Python-level field walking beyond one
    dict.get — and the decoder is constructed once per actor. Missing keys
    / null / malformed rows yield null, never an exception: at corpus scale
    a poison row must not kill the stage (the reference's
    ``robust_json_loads_lines`` drops bad lines, ``takco/util.py:12-21``;
    a column engine keeps the row and nulls the field).
    """

    _ARROW = {"int64": pa.int64(), "float64": pa.float64(), "string": pa.string()}
    _CAST = {"int64": int, "float64": float, "string": str}

    def __init__(self, json_column: str, fields: dict):
        import json

        self.json_column = json_column
        self.fields = {
            out: (key, str(typ)) for out, (key, typ) in dict(fields).items()
        }
        for _out, (_key, typ) in self.fields.items():
            if typ not in self._ARROW:
                raise ValueError(f"unsupported type {typ!r}")
        self._loads = json.JSONDecoder().decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.json_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        loads = self._loads
        parsed = []
        for s in col.to_pylist():
            if not s:
                parsed.append(None)
                continue
            try:
                d = loads(s)
            except ValueError:
                d = None
            parsed.append(d if isinstance(d, dict) else None)
        for out, (key, typ) in self.fields.items():
            cast = self._CAST[typ]
            vals = []
            for d in parsed:
                v = None if d is None else d.get(key)
                if v is None:
                    vals.append(None)
                else:
                    try:
                        vals.append(cast(v))
                    except (TypeError, ValueError):
                        vals.append(None)
            batch = batch.append_column(out, pa.array(vals, type=self._ARROW[typ]))
        return batch.drop_columns([self.json_column])


def json_extract(ds, json_column: str, fields: dict, concurrency=None):
    """Dataset wrapper for :class:`JsonExtract` (actor pool — decoder built
    once per actor, SURVEY §2.3 stateful-stage shape)."""
    from ..util import default_concurrency

    return ds.map_batches(
        JsonExtract,
        fn_constructor_kwargs=dict(json_column=json_column, fields=fields),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_concurrency(),
    )


def unnest_list(ds, list_column: str, id_column: str, pos_name: str = "pos",
                value_name: str = "val"):
    """Explode an Arrow list column into (id, pos, value) rows — the SQL
    ``unnest ... WITH ORDINALITY`` as a stateless zero-copy projection
    (offset arithmetic on the ListArray; values are never copied, parents
    come from one ``np.repeat``). The inverse of a ``groupby(id) →
    list_agg``; the flat_map shape of the reference's table→triples emit
    (``takco/evaluate/triples.py:13-133``) applied to a typed column."""
    import numpy as np
    import pyarrow as pa

    def explode(t: pa.Table) -> pa.Table:
        lst = t.column(list_column)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = lst.flatten()  # skips NULL entries; respects slicing
        # lengths, not raw offsets: a sliced ListArray's offsets don't start
        # at 0, and NULL entries may span offset ranges flatten() excludes —
        # per-entry lengths (0 for NULL) keep parent/pos aligned with flat
        offsets = np.asarray(lst.offsets, dtype=np.int64)
        n_per = np.diff(offsets)
        if lst.null_count:
            valid = pc.is_valid(lst).to_numpy(zero_copy_only=False).astype(bool)
            n_per = np.where(valid, n_per, 0)
        starts = np.concatenate([[0], np.cumsum(n_per)[:-1]]).astype(np.int64)
        ids = t.column(id_column).combine_chunks()
        parent = np.repeat(np.arange(len(ids), dtype=np.int64), n_per)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, n_per)
        return pa.table(
            {
                id_column: ids.take(pa.array(parent, type=pa.int64())),
                pos_name: pa.array(pos, type=pa.int64()),
                value_name: flat,
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
