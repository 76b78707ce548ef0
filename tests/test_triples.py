"""Triple emission from annotated tables (reference ``yield_triples``,
``takco/evaluate/triples.py:13-133``): label/class/property kinds,
entity-object vs literal-object properties, datatype from the to-column's
class, deterministic hashes."""

from __future__ import annotations

import pyarrow as pa
import pytest

from takco_ray.stages.triples import LABEL, TYPE, emit_triples, triple_hash


def _ds(table):
    import ray.data

    return ray.data.from_arrow(table)


@pytest.fixture()
def annotated(ray_session):
    cells = _ds(
        pa.table(
            {
                "table": ["t0"] * 4 + ["t1"] * 2,
                "row": pa.array([0, 0, 1, 1, 0, 0], type=pa.int64()),
                "col": pa.array([0, 1, 0, 1, 0, 1], type=pa.int64()),
                "text": ["Berlin", "3.6M", "Paris", "2.1M", "Rome", "Italy"],
            }
        )
    )
    entities = _ds(
        pa.table(
            {
                # t0: col0 entities both rows; t1: col0 AND col1 entities
                "table": ["t0", "t0", "t1", "t1"],
                "row": pa.array([0, 1, 0, 0], type=pa.int64()),
                "col": pa.array([0, 0, 0, 1], type=pa.int64()),
                "uri": ["kb:B", "kb:P", "kb:R", "kb:IT"],
                "score": [0.9, 0.8, 0.7, 0.6],
            }
        )
    )
    classes = _ds(
        pa.table(
            {
                "table": ["t0", "t0"],
                "col": pa.array([0, 1], type=pa.int64()),
                "uri": ["kb:City", "kb:Population"],
                "score": [1.0, 0.5],
            }
        )
    )
    props = _ds(
        pa.table(
            {
                "table": ["t0", "t1"],
                "from_col": pa.array([0, 0], type=pa.int64()),
                "to_col": pa.array([1, 1], type=pa.int64()),
                "uri": ["kb:pop", "kb:country"],
                "score": [0.7, 0.9],
            }
        )
    )
    return cells, entities, classes, props


def test_emit_triples_kinds_and_objects(annotated):
    cells, entities, classes, props = annotated
    df = emit_triples(cells, entities, classes, props, num_partitions=4).to_pandas()

    labels = df[df.kind == "label"].set_index("s")
    assert set(labels.index) == {"kb:B", "kb:P", "kb:R", "kb:IT"}
    assert labels.loc["kb:B", "o"] == "Berlin" and labels.loc["kb:B", "p"] == LABEL
    assert labels.loc["kb:IT", "o"] == "Italy"  # entity on col 1 labels too

    classes_t = df[df.kind == "class"]
    # t0 col0 class applies to both entities; col1 class has no entities
    assert set(zip(classes_t.s, classes_t.o)) == {
        ("kb:B", "kb:City"), ("kb:P", "kb:City"),
    }
    assert (classes_t.p == TYPE).all()

    prop_t = df[df.kind == "property"]
    by_s = prop_t.set_index("s")
    # t0: to-col has NO entities → literal object with the column class
    # as datatype (triples.py:107-121)
    assert by_s.loc["kb:B", "o"] == "3.6M" and bool(by_s.loc["kb:B", "o_is_literal"])
    assert by_s.loc["kb:B", "o_datatype"] == "kb:Population"
    # t1: to-col HAS an entity for the row → entity object
    assert by_s.loc["kb:R", "o"] == "kb:IT" and not bool(by_s.loc["kb:R", "o_is_literal"])

    # scores ride along; hashes are deterministic and content-derived
    assert by_s.loc["kb:B", "hash"] == triple_hash(
        "kb:B", "kb:pop", "3.6M", "kb:Population"
    )


def test_emit_triples_flags_and_missing_relations(annotated):
    cells, entities, classes, props = annotated
    no_label = emit_triples(
        cells, entities, classes, props, include_label=False, num_partitions=4
    ).to_pandas()
    assert "label" not in set(no_label.kind)
    no_type = emit_triples(
        cells, entities, classes, props, include_type=False, num_partitions=4
    ).to_pandas()
    assert "class" not in set(no_type.kind)
    # classes/properties optional: labels only
    only = emit_triples(cells, entities, num_partitions=4).to_pandas()
    assert set(only.kind) == {"label"}
    assert len(only) == 4
