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
