"""Heuristic compound splitting for header / identifier strings.

Analog of the reference's ``CompoundSplitter`` ABC (SURVEY §2 M10/ST6;
reference ``takco/reshape/compound.py:90-95`` and the spaCy-based
``SpacyCompoundSplitter``). No language model exists in this environment,
so the splitter is the code-corpus heuristic: camelCase, snake_case,
kebab-case and letter↔digit boundaries — the identifier conventions of the
source-code north star. Fully vectorized: two Arrow regex passes + one
split per batch, no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# boundary insertion: lower→Upper, letter→digit, digit→letter, ALLCAPS→Word
_BOUNDARIES = [
    (r"([a-z])([A-Z])", r"\1 \2"),
    (r"([A-Za-z])([0-9])", r"\1 \2"),
    (r"([0-9])([A-Za-z])", r"\1 \2"),
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),
]
_SEPS = r"[_\-\.\s]+"


def split_compound(col) -> pa.ChunkedArray | pa.Array:
    """Split each string into its compound parts (list<string>, lowercased).

    ``getHTTPResponse2xx`` → [get, http, response, 2, xx];
    ``snake_case-kebab.dots`` → [snake, case, kebab, dots].
    """
    s = col
    for pat, rep in _BOUNDARIES:
        s = pc.replace_substring_regex(s, pat, rep)
    s = pc.utf8_lower(pc.utf8_trim_whitespace(pc.replace_substring_regex(s, _SEPS, " ")))
    return pc.split_pattern(s, " ")


def compound_parts_stage(ds, column: str, out_col: str = "parts", n_col: str = "n_parts"):
    """map_batches stage: append the parts list + part count per row."""

    def fn(t: pa.Table) -> pa.Table:
        parts = split_compound(t.column(column))
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        return t.append_column(out_col, parts).append_column(
            n_col, pc.cast(pc.list_value_length(parts), pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
