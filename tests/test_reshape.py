"""reshape stage: melt + pivot-header detection heuristics.

Heuristic fixtures mirror the reference's doctests and planted cases
(``takco/reshape/findpivot.py``); melt is checked against a pandas melt.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from takco_ray.stages.reshape import (
    NUM_PREFIX,
    NUM_SUFFIX,
    detect_pivot,
    longest_run,
    melt,
    regex_pivot_cells,
    seq_prefix_cells,
    split_header_regex,
    unpivot_rows,
)


@pytest.mark.usefixtures("ray_session")
def test_melt_matches_pandas():
    import ray.data

    t = pa.table(
        {
            "id": [1, 2, 3],
            "k": ["a", "b", "c"],
            "x": [10.0, 20.0, 30.0],
            "y": [1.5, 2.5, 3.5],
        }
    )
    out = (
        melt(ray.data.from_arrow(t), ["id", "k"], ["x", "y"])
        .to_pandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .melt(id_vars=["id", "k"], value_vars=["x", "y"])
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[exp.columns], exp)


def test_num_suffix_prefix_cells():
    # reference RegexFinder doctest shape: 'a 4' is a pivot cell
    assert regex_pivot_cells([["a 4"]], NUM_SUFFIX) == [(0, 0)]
    assert split_header_regex(["a 4"], 0, 0, NUM_SUFFIX) == (["4"], ["a"])
    assert regex_pivot_cells([["2001 sales"]], NUM_PREFIX) == [(0, 0)]
    vals, vars_ = split_header_regex(["2001 sales"], 0, 0, NUM_PREFIX)
    assert vals == ["2001"] and vars_ == ["sales"]


def test_longest_run_and_detect():
    headers = [["country", "pop 1990", "pop 2000", "pop 2010", "area"]]
    cells = regex_pivot_cells(headers, NUM_SUFFIX)
    assert longest_run(cells) == (0, 1, 3)
    name, level, s, e = detect_pivot(headers)
    assert (level, s, e) == (0, 1, 3)
    # full-row pivots are rejected (reference UnpivotException)
    assert detect_pivot([["a 1", "a 2", "a 3"]]) is None
    # single pivot cell: no run to melt
    assert detect_pivot([["country", "pop 1990", "area"]]) is None


def test_seq_prefix_cells():
    headers = [["name", "score round1", "score round2"]]
    cells = seq_prefix_cells(headers)
    assert cells == [(0, 1), (0, 2)]


def test_unpivot_rows_end_to_end():
    headers = [["country", "pop 1990", "pop 2000", "pop 2010"]]
    body = [["nl", 15, 16, 17], ["be", 10, 10, 11]]
    head, rows = unpivot_rows(headers, body)
    assert head == ["country", "_Variable", "_Value"]
    assert ["nl", "1990", 15] in rows and ["be", "2010", 11] in rows
    assert len(rows) == 6
    # no pivot → None
    assert unpivot_rows([["a", "b"]], [[1, 2]]) is None


def test_spanned_repeat_cells_fires_where_numeric_finders_fail():
    """The 'Sales|Sales|Sales' span over repeating 'Q1|Q2|Q1' (reference
    SpannedRepeat, findpivot.py:394-447): no digits glued to names, no
    shared first token across > 1 distinct cells — NumSuffix/NumPrefix
    find nothing meltable and SeqPrefix proposes nothing."""
    from takco_ray.stages.reshape import (
        attribute_context_cells,
        detect_pivot,
        get_colspan_repeats,
        rule_cells,
        spanned_repeat_cells,
    )

    headers = [
        ["team", "Sales", "Sales", "Sales", "Sales"],
        ["team", "Q1", "Q2", "Q1", "Q2"],
    ]
    assert detect_pivot(headers) is None  # built-in finders miss this shape
    cells = spanned_repeat_cells(headers)
    assert cells == [(0, 1), (0, 2), (0, 3), (0, 4)]
    name, level, s, e = detect_pivot(
        headers, extra_candidates=[("SpannedRepeat", cells)]
    )
    assert (name, level, s, e) == ("SpannedRepeat", 0, 1, 4)

    colspan, repeats = get_colspan_repeats(headers)
    assert colspan[0] == [1, 4, 4, 4, 4]
    assert repeats[1] == [1, 2, 2, 2, 2]  # one completed run counts 1

    # a spanning cell with NO repeats under it is not a pivot
    quiet = [["x", "grp", "grp"], ["x", "a", "b"]]
    assert spanned_repeat_cells(quiet) == []


def test_rule_cells_declared_melt():
    from takco_ray.stages.reshape import rule_cells

    headers = [["country", "gold", "silver", "bronze"]]
    assert rule_cells(headers, id_vars=["country"]) == [(0, 1), (0, 2), (0, 3)]
    assert rule_cells(headers, value_vars=["gold", "silver"]) == [(0, 1), (0, 2)]
    # row lacking an id var yields nothing
    assert rule_cells(headers, id_vars=["city"]) == []
    # no declaration: no cells (reference Rule guards on id/value vars)
    assert rule_cells(headers) == []


def test_attribute_context_build_and_find(ray_session):
    """Corpus build (set-union + unique) → marker set → membership finder
    (reference AttributeContext, findpivot.py:528-557)."""
    import json

    import pyarrow as pa
    import ray.data

    from takco_ray.stages.reshape import (
        attribute_context_cells,
        build_attribute_context,
        detect_pivot,
    )

    tables = pa.table(
        {
            "section": ["medals", "Medals", "teams", None, "medals"],
            "headers_json": [
                json.dumps([["country", "Medals", "Medals"]]),
                json.dumps([["country", "medals", "x"]]),
                json.dumps([["club", "city"]]),
                json.dumps([["a", "b"]]),
                json.dumps([["nation", "MEDALS"]]),  # matches case-insensitively
            ],
        }
    )
    values = build_attribute_context(
        ray.data.from_arrow(tables), "section", "headers_json"
    )
    assert values == ["MEDALS", "Medals", "medals"]

    headers = [["country", "Medals", "medals", "area"]]
    cells = attribute_context_cells(headers, values)
    assert cells == [(0, 1), (0, 2)]
    hit = detect_pivot(headers, extra_candidates=[("AttributeContext", cells)])
    assert hit == ("AttributeContext", 0, 1, 2)
