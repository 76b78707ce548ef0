"""Reshape: wide→long unpivot (melt) + pivot-header detection heuristics.

Re-expresses the reference's unpivot stack (SURVEY §2 M9; reference
``takco/reshape/findpivot.py``) Ray-Data-first:

- :func:`melt` is the engine-native unpivot: a pure ``map_batches``
  transform that turns k value columns into k stacked (variable, value)
  row groups per block — no shuffle, no row-wise Python, output blocks are
  k concatenated zero-copy column views of the input block;
- the ``PivotFinder`` heuristics (``RegexFinder``/``NumSuffix``/
  ``NumPrefix``/``SeqPrefix``, ``findpivot.py:280-391``; run selection
  ``longest_seq``, ``findpivot.py:63-81``) are pure header-level functions
  (headers are tiny — detection cost is per table, not per row), usable
  inside a ``map_batches`` over a corpus of serialized tables.

The reference melts via pandas ``stack`` on a driver-side DataFrame
(``findpivot.py:100-158``); here the melt streams block by block.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# reference NumSuffix / NumPrefix patterns (findpivot.py:331-346): a header
# cell is a pivot candidate when a numeric value is glued to a variable name
NUM_SUFFIX = re.compile(r"(?P<var>.*)(?:^|\s)[\W\s]*(?P<val>\d[\W\d]*?)[\W\s]*$")
NUM_PREFIX = re.compile(r"[\W\s]*(?P<val>\d[\W\d]*)(?:$|\s)(?P<var>.*)")


# --------------------------------------------------------------------------
# engine-native melt
# --------------------------------------------------------------------------

def melt(
    ds,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    value_type: pa.DataType | None = None,
):
    """Unpivot ``value_cols`` into stacked (variable, value) rows.

    Each output block is ``k`` concatenated slices of the input block —
    id columns are zero-copy views, only the value column is cast. Output
    rows = input rows × k; the transform is embarrassingly parallel and
    streams (never materializes the wide table).
    """
    id_cols, value_cols = list(id_cols), list(value_cols)
    vt = value_type or pa.float64()

    def melt_batch(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {i: t.column(i) for i in id_cols}
            cols[var_name] = pa.array(
                np.full(t.num_rows, c, dtype=object), type=pa.string()
            )
            cols[value_name] = t.column(c).cast(vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt_batch, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# pivot-cell detection over header matrices (pure functions)
# --------------------------------------------------------------------------

def regex_pivot_cells(headers: list[list[str]], pattern: re.Pattern):
    """(row, col) of header cells matching ``pattern`` (RegexFinder
    ``find_pivot_cells``, findpivot.py:303-308)."""
    out = []
    for ri, hrow in enumerate(headers):
        for ci, cell in enumerate(hrow):
            if cell and pattern.match(cell.strip()):
                out.append((ri, ci))
    return out


def seq_prefix_cells(headers: list[list[str]]):
    """Cells sharing the row's most common first token, excluding the bare
    token itself (SeqPrefix, findpivot.py:349-368)."""
    from collections import Counter

    out = []
    for ri, row in enumerate(headers):
        prefixes = [p[0] for c in row if (p := (c or "").strip().split())]
        if not prefixes:
            continue
        p, pcount = Counter(prefixes).most_common(1)[0]
        if pcount > 1:
            for ci, cell in enumerate(row):
                if str(cell or "").startswith(p) and str(cell) != str(p):
                    out.append((ri, ci))
    return out


def longest_run(cells) -> tuple[int, int, int] | None:
    """Longest same-row consecutive-column run among pivot cells →
    ``(level, colfrom, colto)`` (reference ``longest_seq``,
    findpivot.py:63-81). Ties break to the earliest (row, col)."""
    by_row: dict[int, list[int]] = {}
    for ri, ci in cells:
        by_row.setdefault(ri, []).append(ci)
    best = None
    for ri in sorted(by_row):
        cs = sorted(set(by_row[ri]))
        start = prev = cs[0]
        runs = []
        for c in cs[1:]:
            if c == prev + 1:
                prev = c
                continue
            runs.append((start, prev))
            start = prev = c
        runs.append((start, prev))
        for s, e in runs:
            if best is None or (e - s) > (best[2] - best[1]):
                best = (ri, s, e)
    return best


def split_header_regex(
    header: list[str], colfrom: int, colto: int, pattern: re.Pattern
) -> tuple[list[str], list[str]]:
    """Split one header row into (value-part, variable-part) rows
    (RegexFinder ``split_header``, findpivot.py:310-328): pivot cells in
    [colfrom, colto] split at the pattern's var/val groups; other cells
    repeat unchanged in both rows."""
    vals, vars_ = [], []
    for ci, cell in enumerate(header):
        if colfrom <= ci <= colto and cell:
            m = pattern.match(cell)
            if m and m.groups() and {"val", "var"} <= set(m.groupdict()):
                vals.append(m.group("val"))
                vars_.append(m.group("var"))
                continue
        vals.append(cell)
        vars_.append(cell)
    return vals, vars_


def detect_pivot(headers: list[list[str]]):
    """Best pivot across heuristics: each finder proposes cells, the longest
    consecutive run wins (reference tries finders in order and unpivots the
    heuristic with the longest run). Returns
    ``(finder_name, level, colfrom, colto)`` or None when no finder proposes
    a run wider than one column or spanning the whole row."""
    candidates = [
        ("NumSuffix", regex_pivot_cells(headers, NUM_SUFFIX)),
        ("NumPrefix", regex_pivot_cells(headers, NUM_PREFIX)),
        ("SeqPrefix", seq_prefix_cells(headers)),
    ]
    best = None
    for name, cells in candidates:
        if not cells:
            continue
        run = longest_run(cells)
        if run is None:
            continue
        level, s, e = run
        if e == s:  # single-column run: nothing to melt
            continue
        if s == 0 and e == len(headers[level]) - 1:
            continue  # reference UnpivotException: pivot spans entire head
        if best is None or (e - s) > (best[3] - best[2]):
            best = (name, level, s, e)
    return best


def unpivot_rows(
    headers: list[list[str]],
    body: list[list],
    var_name: str = "_Variable",
    value_name: str = "_Value",
):
    """Detect + melt one small table (header matrix + row-major body) into
    long rows — the per-table unit the reference applies per partition
    (``unpivot_tables``, findpivot.py:215-235). Returns
    ``(id_headers, long_rows)`` or None when no pivot is detected. Pivot
    header cells are split var/val with the winning finder's pattern; the
    val part becomes the variable label (reference keeps the split row as a
    new header level feeding the melt)."""
    hit = detect_pivot(headers)
    if hit is None:
        return None
    name, level, s, e = hit
    pattern = {"NumSuffix": NUM_SUFFIX, "NumPrefix": NUM_PREFIX}.get(name)
    if pattern is not None:
        vals, _vars = split_header_regex(headers[level], s, e, pattern)
    else:  # SeqPrefix: label = suffix after the shared prefix
        from collections import Counter

        prefixes = [p[0] for c in headers[level] if (p := (c or "").strip().split())]
        p = Counter(prefixes).most_common(1)[0][0]
        vals = [
            c[len(p):].strip() if (c or "").strip().startswith(p) and c != p else c
            for c in headers[level]
        ]
    id_idx = [i for i in range(len(headers[level])) if not (s <= i <= e)]
    id_head = [headers[level][i] for i in id_idx]
    out = []
    for row in body:
        base = [row[i] for i in id_idx]
        for ci in range(s, e + 1):
            out.append(base + [vals[ci], row[ci]])
    return id_head + [var_name, value_name], out
