"""htmltables: stdlib parser, span expansion, head/body + subheader splits."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from takco_ray.sources.htmltables import (
    expand_spans,
    extract_tables,
    extract_tables_stage,
)


def test_colspan_rowspan_grid():
    html = """
    <table>
      <tr><th colspan="2">ab</th><th>c</th></tr>
      <tr><td rowspan="2">x</td><td>y1</td><td>z1</td></tr>
      <tr><td>y2</td><td>z2</td></tr>
    </table>"""
    (tab,) = extract_tables(html)
    assert tab["head"] == [["ab", "ab", "c"]]
    assert tab["body"] == [["x", "y1", "z1"], ["x", "y2", "z2"]]
    assert (tab["n_rows"], tab["n_cols"], tab["n_head"]) == (3, 3, 1)


def test_links_and_whitespace():
    html = '<table><tr><td>  see <a href="/foo">the  foo</a> page </td></tr></table>'
    (tab,) = extract_tables(html)
    assert tab["body"] == [["see the foo page"]]
    assert tab["links"][0][0] == [{"href": "/foo", "surface": "the foo"}]


def test_subheader_split_and_uniform_demotion():
    html = """
    <table>
      <tr><th>h1</th><th>h2</th></tr>
      <tr><td>a</td><td>b</td></tr>
      <tr><th>g1</th><th>g2</th></tr>
      <tr><td>c</td><td>d</td></tr>
      <tr><th>same</th><th>same</th></tr>
      <tr><td>e</td><td>f</td></tr>
    </table>"""
    tabs = extract_tables(html, split_subheaders=True)
    assert len(tabs) == 2
    assert tabs[0]["head"] == [["h1", "h2"]]
    assert tabs[0]["body"] == [["a", "b"]]
    # the uniform 'same' row demotes to body, so the second split keeps going
    assert tabs[1]["head"] == [["g1", "g2"]]
    assert tabs[1]["body"] == [["c", "d"], ["same", "same"], ["e", "f"]]


def test_multiple_tables_and_nested_flattening():
    html = (
        "<table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>"
        "<table><tr><td>second</td></tr></table>"
    )
    tabs = extract_tables(html)
    assert len(tabs) == 2
    assert tabs[0]["body"] == [["outer inner"]]
    assert tabs[1]["body"] == [["second"]]


def test_malformed_html_no_crash():
    tabs = extract_tables("<table><tr><td>a<td>b</tr><tr><td colspan='zzz'>c")
    assert tabs and tabs[0]["n_cols"] >= 1


@pytest.mark.usefixtures("ray_session")
def test_extract_stage_rows():
    import ray.data

    pages = pa.table(
        {
            "pid": [1, 2],
            "html": [
                "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>",
                "<p>no tables here</p>",
            ],
        }
    )
    out = extract_tables_stage(ray.data.from_arrow(pages), "html", "pid").to_pandas()
    assert len(out) == 1
    assert int(out.loc[0, "page_id"]) == 1
    assert json.loads(out.loc[0, "head_json"]) == [["h"]]
    assert json.loads(out.loc[0, "body_json"]) == [["v"]]
