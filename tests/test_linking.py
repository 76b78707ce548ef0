"""linking stage: broadcast label lookup + triple novelty classes.

Pure-Python oracles over small planted tables; the SQL-oracle equivalence is
covered by link_customer_nations / novelty_customer_segments.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from takco_ray.stages.linking import (
    build_label_index,
    link_cells,
    novelty_classify,
    novelty_counts,
)


@pytest.mark.usefixtures("ray_session")
def test_link_cells_lookup_and_ambiguity():
    import ray.data

    kb = pa.table(
        {
            "label": ["Alpha", "beta", " Alpha ", "gamma"],
            "eid": [7, 2, 3, 9],
        }
    )
    # "alpha" is ambiguous after normalization → smallest id (3) wins
    ref = build_label_index(kb, "label", "eid")
    ds = ray.data.from_arrow(
        pa.table({"mention": ["ALPHA", "Beta", "delta", "gamma", None]})
    )
    out = link_cells(ds, "mention", ref).to_pandas()
    assert list(out["entity_id"]) == [3, 2, -1, 9, -1]
    assert list(out["matched"]) == [True, True, False, True, False]


@pytest.mark.usefixtures("ray_session")
def test_novelty_classes_multi_object_kb():
    import ray.data

    triples = pa.table(
        {
            "s": [1, 1, 2, 3],
            "o": ["x", "y", "x", "z"],
        }
    )
    # KB: s=1 holds objects {x, w} (multi-object key), s=2 holds {q}; s=3 absent
    kb = pa.table({"s": [1, 1, 2], "o": ["x", "w", "q"]})
    out = (
        novelty_classify(
            ray.data.from_arrow(triples), ray.data.from_arrow(kb), ["s"], "o"
        )
        .to_pandas()
        .set_index(["s", "o"])
    )
    assert out.loc[(1, "x"), "novelty"] == "existing"  # any-match over fan-out
    assert out.loc[(1, "y"), "novelty"] == "valnovel"
    assert out.loc[(2, "x"), "novelty"] == "valnovel"
    assert out.loc[(3, "z"), "novelty"] == "attnovel"

    counts = (
        novelty_counts(
            novelty_classify(
                ray.data.from_arrow(triples), ray.data.from_arrow(kb), ["s"], "o"
            )
        )
        .to_pandas()
        .set_index("novelty")["n"]
    )
    assert int(counts["existing"]) == 1
    assert int(counts["valnovel"]) == 2
    assert int(counts["attnovel"]) == 1


def test_integrate_nary_fact_matching(ray_session):
    """N-ary fact matching (reference NaryDB.integrate,
    takco/link/integrate.py:33-75): entity-linked cells join facts on the
    subject, objects join OTHER cells of the same row by normalized text,
    self-matches drop, counts aggregate per (from_col, to_col, prop)."""
    import pyarrow as pa
    import ray.data

    from takco_ray.stages.linking import integrate_nary

    # rows: 3 table rows of (col0 key cell + col1 city + col2 country)
    cells = ray.data.from_arrow(
        pa.table(
            {
                "row_idx": pa.array([0, 0, 0, 1, 1, 1, 2, 2, 2], type=pa.int64()),
                "col_idx": pa.array([0, 1, 2, 0, 1, 2, 0, 1, 2], type=pa.int64()),
                "celltext": [
                    "Alpha", "  BERLIN ", "Germany",
                    "Beta", "Paris", "France",
                    "Gamma", "Rome", "Italy",
                ],
                # row 2's key cell carries no entity → contributes nothing
                "entity_uri": ["kb:a", None, None, "kb:b", None, None, None, None, None],
            }
        )
    )
    facts = ray.data.from_arrow(
        pa.table(
            {
                "s": ["kb:a", "kb:a", "kb:b", "kb:b", "kb:c"],
                "p": ["in:city", "in:country", "in:city", "in:self", "in:city"],
                # normalization must bridge '  BERLIN ' ↔ 'berlin'
                "o": ["berlin", "GERMANY", "Paris", "Beta", "Rome"],
            }
        )
    )
    out = {
        (r["from_col"], r["to_col"], r["prop"]): r["n_matches"]
        for r in integrate_nary(cells, facts).take_all()
    }
    # kb:c matches row 2's 'Rome' ONLY if some cell links kb:c — none does
    # 'in:self' would match row 1 col 0 itself → dropped by the c1==c2 guard
    assert out == {
        (0, 1, "in:city"): 2,       # berlin (row 0) + paris (row 1)
        (0, 2, "in:country"): 1,    # germany (row 0)
    }
