"""HTML page → table extraction on the Python stdlib parser.

Re-expresses the reference's extract stack (SURVEY §2 S5/M2–M5; reference
``takco/extract/htmltables.py``) without bs4 (not in this environment):

- :class:`_TableCollector` — stdlib ``html.parser`` event collector for
  ``<table>/<tr>/<td|th>`` with cell text, span attributes, and contained
  links (the reference's ``get_cell_dict`` text+surfaceLinks shape,
  ``htmltables.py:208-218``);
- :func:`expand_spans` — the rowspan/colspan grid-expansion algorithm
  (reference ``Extractor.parse``, ``htmltables.py:52-150``, itself after
  the published html-table-extractor): each cell is placed at the first
  free grid slot and replicated over its row×col span;
- :func:`split_head_body` — all-``th`` prefix rows become the header
  (reference ``htmlrows_to_dataframe``, ``htmltables.py:238-247``);
- :func:`split_on_subheaders` — vertical split when a header row reappears
  mid-table; uniform single-value header rows are demoted to body
  (reference ``vertically_split_tables_on_subheaders``,
  ``htmltables.py:268-289``);
- :func:`extract_tables_stage` — the Ray stage: a ``map_batches`` over a
  column of HTML strings emitting one row per extracted table. Parsing is
  per-document Python by nature (same as the reference); the distribution,
  batching and streaming are Ray Data's.

Nested tables are flattened into the outer cell's text (documented
difference: the reference recurses via bs4; corpus pages here are flat).
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")


class _TableCollector(HTMLParser):
    """Collect tables as rows of raw cells {tag, text, rowspan, colspan, links}."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[dict]]] = []
        self._depth = 0  # <table> nesting depth; only depth-1 rows collected
        self._rows: list[list[dict]] | None = None
        self._cell: dict | None = None
        self._href: str | None = None
        self._link_text: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "table":
            self._depth += 1
            if self._depth == 1:
                self._rows = []
        elif self._depth != 1 or self._rows is None:
            return
        elif tag == "tr":
            self._rows.append([])
        elif tag in ("td", "th"):
            def _span(v):
                try:
                    return max(1, int(v))
                except (TypeError, ValueError):
                    return 1

            self._cell = {
                "tag": tag,
                "text": [],
                "rowspan": _span(a.get("rowspan")),
                "colspan": _span(a.get("colspan")),
                "links": [],
            }
            if self._rows and self._rows[-1] is not None:
                self._rows[-1].append(self._cell)
        elif tag == "a" and self._cell is not None:
            self._href = a.get("href") or ""
            self._link_text = []

    def handle_endtag(self, tag):
        if tag == "table":
            if self._depth == 1 and self._rows is not None:
                self.tables.append(self._rows)
                self._rows = None
            self._depth = max(0, self._depth - 1)
        elif tag in ("td", "th"):
            self._cell = None
        elif tag == "a" and self._cell is not None and self._href is not None:
            surface = _WS.sub(" ", "".join(self._link_text)).strip()
            self._cell["links"].append({"href": self._href, "surface": surface})
            self._href = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell["text"].append(data)
            if self._href is not None:
                self._link_text.append(data)

    def close(self):
        super().close()
        # flush an unterminated <table> (truncated/malformed page)
        if self._rows is not None:
            self.tables.append(self._rows)
            self._rows = None
            self._depth = 0


def _cell_text(cell: dict) -> str:
    return _WS.sub(" ", " ".join(cell["text"])).strip()


def expand_spans(rows: list[list[dict]]) -> list[list[dict | None]]:
    """Place cells into a dense grid honoring rowspan/colspan (reference
    ``Extractor.parse`` placement rule: next free slot, replicate over the
    span rectangle, advance by the row's smallest rowspan)."""
    grid: list[list[dict | None]] = []

    def free(i, j):
        return i >= len(grid) or j >= len(grid[i]) or grid[i][j] is None

    def put(i, j, val):
        while i >= len(grid):
            grid.append([])
        while j >= len(grid[i]):
            grid[i].append(None)
        if grid[i][j] is None:
            grid[i][j] = val

    ri = 0
    for row in rows:
        ci = 0
        for cell in row:
            while not free(ri, ci):
                ci += 1
            for ii in range(ri, ri + cell["rowspan"]):
                for jj in range(ci, ci + cell["colspan"]):
                    put(ii, jj, cell)
            ci += cell["colspan"]
        # the reference advances one grid row per <tr> (its smallest_row_span
        # is clamped at 1 by construction, htmltables.py:57-72)
        ri += 1
    # pad ragged rows to the max width with empty td cells
    width = max((len(r) for r in grid), default=0)
    empty = {"tag": "td", "text": [], "rowspan": 1, "colspan": 1, "links": []}
    return [r + [empty] * (width - len(r)) for r in grid]


def split_head_body(grid):
    """Leading all-``th`` rows → header matrix; the rest → body matrix.
    Returns (head_texts, body_texts, body_links)."""
    head, body, links = [], [], []
    in_head = True
    for row in grid:
        texts = [_cell_text(c) if c else "" for c in row]
        is_header = bool(row) and all(c is not None and c["tag"] == "th" for c in row)
        if in_head and is_header:
            head.append(texts)
        else:
            in_head = False
            body.append(texts)
            links.append([(c["links"] if c else []) for c in row])
    return head, body, links


def split_on_subheaders(grid):
    """Split one grid into sub-tables wherever an all-``th`` row reappears
    after body rows; uniform multi-cell header rows demote to body."""
    out, sub = [], []
    prev_is_header = True
    for row in grid:
        is_header = bool(row) and all(c is not None and c["tag"] == "th" for c in row)
        if is_header and len(row) > 1:
            texts = {_cell_text(c) for c in row}
            if len(texts) == 1:  # uniform subheader → body row
                is_header = False
        if (not prev_is_header) and is_header:
            if len(sub) > 1:
                out.append(sub)
            sub = []
        sub.append(row)
        prev_is_header = is_header
    out.append(sub)
    return out


def extract_tables(html: str, split_subheaders: bool = False) -> list[dict]:
    """Parse one HTML string into table dicts: head/body matrices + link
    annotations + shape stats."""
    p = _TableCollector()
    p.feed(html)
    p.close()
    out = []
    for rows in p.tables:
        grid = expand_spans(rows)
        grids = split_on_subheaders(grid) if split_subheaders else [grid]
        for g in grids:
            head, body, links = split_head_body(g)
            out.append(
                {
                    "head": head,
                    "body": body,
                    "links": links,
                    "n_head": len(head),
                    "n_rows": len(head) + len(body),
                    "n_cols": max((len(r) for r in head + body), default=0),
                }
            )
    return out


def extract_tables_stage(
    ds,
    html_col: str,
    id_col: str,
    split_subheaders: bool = False,
):
    """Ray stage: one output row per table found in each page's HTML.

    Output: ``(page_id, table_idx, n_head, n_rows, n_cols, head_json,
    body_json)`` — matrices serialize as JSON strings so the schema stays
    flat Arrow (downstream stages re-parse or unnest as needed; the
    reference likewise ships nested table dicts between stages).
    """

    def parse_batch(t: pa.Table) -> pa.Table:
        id_type = t.column(id_col).type  # int ids and string ids both flow
        ids = t.column(id_col).to_pylist()
        htmls = t.column(html_col).to_pylist()
        pid, tidx, nh, nr, nc, hj, bj = [], [], [], [], [], [], []
        for i, html in zip(ids, htmls):
            for k, tab in enumerate(extract_tables(html or "", split_subheaders)):
                pid.append(i)
                tidx.append(k)
                nh.append(tab["n_head"])
                nr.append(tab["n_rows"])
                nc.append(tab["n_cols"])
                hj.append(json.dumps(tab["head"]))
                bj.append(json.dumps(tab["body"]))
        return pa.table(
            {
                "page_id": pa.array(pid, type=id_type),
                "table_idx": pa.array(np.array(tidx, dtype=np.int64), type=pa.int64()),
                "n_head": pa.array(np.array(nh, dtype=np.int64), type=pa.int64()),
                "n_rows": pa.array(np.array(nr, dtype=np.int64), type=pa.int64()),
                "n_cols": pa.array(np.array(nc, dtype=np.int64), type=pa.int64()),
                "head_json": pa.array(hj, type=pa.string()),
                "body_json": pa.array(bj, type=pa.string()),
            }
        )

    return ds.map_batches(parse_batch, batch_format="pyarrow", zero_copy_batch=True)
