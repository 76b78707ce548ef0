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


def get_colspan_repeats(headers: list[list[str]]):
    """Per row: (colspans, repeat-counts) — runs of equal adjacent cells are
    spans; non-adjacent re-occurrences are repeats (SpannedRepeat
    ``get_colspan_repeats``, findpivot.py:400-429)."""
    header_colspan, header_repeats = [], []
    for row in headers:
        colspan = [1 for _ in row]
        repeats: dict = {}
        c, span = None, 1
        for ci, cell in enumerate(list(row) + [None]):
            cell = str(cell)
            if cell == c:
                span += 1
            elif c:
                for j in range(1, span + 1):
                    colspan[ci - j] = span
                span = 1
                repeats[c] = repeats.get(c, 0) + 1
            c = cell
        header_colspan.append(colspan)
        header_repeats.append([repeats.get(str(cell), 0) for cell in row])
    return header_colspan, header_repeats


def get_colspan_fromto(headers: list[list[str]]):
    """Per row: the (first, last) column index of each cell's equal-adjacent
    span (reference ``get_colspan_fromto``, findpivot.py:38-60)."""
    out = []
    for row in headers:
        fromto: list[tuple[int, int]] = []
        start = 0
        for ci, cell in enumerate(row):
            if ci and str(cell) != str(row[ci - 1]):
                start = ci
            fromto.append((start, ci))
        # extend each run's 'to' to the run end
        for ci in range(len(row) - 2, -1, -1):
            if str(row[ci]) == str(row[ci + 1]):
                fromto[ci] = (fromto[ci][0], fromto[ci + 1][1])
        out.append(fromto)
    return out


def spanned_repeat_cells(headers: list[list[str]]):
    """Cells spanning multiple columns where another header row repeats a
    value inside the span (SpannedRepeat ``find_pivot_cells``,
    findpivot.py:431-447) — the 'Sales | Sales | Sales' over
    'Q1 | Q2 | Q1' shape that the numeric finders miss."""
    header_colspan, header_repeats = get_colspan_repeats(headers)
    header_fromto = get_colspan_fromto(headers)
    out = []
    for ri, row in enumerate(headers):
        colspan = header_colspan[ri]
        fromto = header_fromto[ri]
        for ci, cell in enumerate(row):
            f, t = fromto[ci]
            if cell and colspan[ci] > 1:
                if any(
                    header_repeats[rj][cspan] > 1
                    for rj in range(len(headers))
                    if rj != ri
                    for cspan in range(f, t + 1)
                ):
                    out.append((ri, ci))
    return out


def rule_cells(
    headers: list[list[str]],
    id_vars: list[str] | None = None,
    value_vars: list[str] | None = None,
):
    """User-declared melt rule (reference ``Rule``, findpivot.py:560-579):
    a header row containing all id_vars and all value_vars yields its
    value_vars cells (or every non-id cell when value_vars is empty)."""
    id_vars = list(id_vars or [])
    value_vars = list(value_vars or [])
    out = []
    if not (id_vars or value_vars):
        return out
    for ri, hrow in enumerate(headers):
        if all(v in hrow for v in id_vars) and all(v in hrow for v in value_vars):
            for ci, hcell in enumerate(hrow):
                if value_vars:
                    if hcell in value_vars:
                        out.append((ri, ci))
                elif hcell not in id_vars:
                    out.append((ri, ci))
    return out


def build_attribute_context(ds, att_col: str, headers_col: str) -> list[str]:
    """Corpus-built AttributeContext heuristic (reference ``build``,
    findpivot.py:533-550): header cells whose text equals the table's
    context attribute (case-insensitive, len > 1) are pivot markers.

    The build is the A4/A5 shape: a map-side per-batch set-union over
    ``map_batches`` (headers are JSON list-of-list matrices in
    ``headers_col``), a tiny ``unique`` exchange over the distinct values,
    and a driver-side collect of the (small) marker set — which callers then
    broadcast once with ``ray.put`` for use inside downstream map stages.
    """
    import json

    def collect(t: pa.Table) -> pa.Table:
        values: set[str] = set()
        for att, hj in zip(
            t.column(att_col).to_pylist(), t.column(headers_col).to_pylist()
        ):
            att = str(att or "").lower()
            if not att:
                continue
            for hrow in json.loads(hj or "[]"):
                for cell in hrow:
                    text = cell.get("text", "") if isinstance(cell, dict) else cell
                    if text and len(text) > 1 and att == text.lower():
                        values.add(text)
        return pa.table({"value": pa.array(sorted(values), type=pa.string())})

    partials = ds.map_batches(collect, batch_format="pyarrow", zero_copy_batch=True)
    return sorted(partials.unique("value"))


def attribute_context_cells(headers: list[list[str]], values) -> list:
    """Cells whose text is in the corpus-built marker set
    (AttributeContext ``find_pivot_cells``, findpivot.py:552-557)."""
    values = set(values)
    return [
        (ri, ci)
        for ri, hrow in enumerate(headers)
        for ci, cell in enumerate(hrow)
        if cell in values
    ]


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


def detect_pivot(headers: list[list[str]], extra_candidates=None):
    """Best pivot across heuristics: each finder proposes cells, the longest
    consecutive run wins (reference tries finders in order and unpivots the
    heuristic with the longest run). Returns
    ``(finder_name, level, colfrom, colto)`` or None when no finder proposes
    a run wider than one column or spanning the whole row.

    ``extra_candidates``: optional ``[(name, cells)]`` from the stateful /
    corpus-built finders (:func:`spanned_repeat_cells`,
    :func:`attribute_context_cells` with a broadcast marker set,
    :func:`rule_cells`) — they compete under the same longest-run rule."""
    candidates = [
        ("NumSuffix", regex_pivot_cells(headers, NUM_SUFFIX)),
        ("NumPrefix", regex_pivot_cells(headers, NUM_PREFIX)),
        ("SeqPrefix", seq_prefix_cells(headers)),
        *(extra_candidates or []),
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
