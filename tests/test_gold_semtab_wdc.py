"""SemTab + WebDataCommons gold-layout loaders (VERDICT r4 item 6) and an
end-to-end linking eval over a synthesized gold set.

Layouts mirror the reference loaders (``takco/evaluate/dataset/semtab.py:
17-45``, ``wdc.py:13-60``); no gold data ships in this environment, so
fixtures are generated deterministically."""

from __future__ import annotations

import csv
import json
import os

import pyarrow as pa
import pytest

from takco_ray.sources.gold import (
    load_semtab_cea,
    load_semtab_tables,
    load_wdc_tables,
)


def _write_semtab_fixture(root):
    os.makedirs(os.path.join(root, "tables"))
    with open(os.path.join(root, "tables", "t0.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["City", "Pop"])
        w.writerow(["Berlin", "3,644,826"])
        w.writerow(["Paris", "2,175,601"])
        w.writerow(["Tokyo", "13,960,000"])
    with open(os.path.join(root, "tables", "t1.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Name", "Country"])
        w.writerow(["Berlin", "Germany"])
        w.writerow(["Rome", "Italy"])


@pytest.mark.usefixtures("ray_session")
def test_load_semtab_layout(tmp_path):
    root = str(tmp_path / "semtab")
    os.makedirs(root)
    _write_semtab_fixture(root)

    df = load_semtab_tables(root).to_pandas().set_index("table").sort_index()
    assert list(df.index) == ["t0", "t1"]
    assert list(df.loc["t0", "header"]) == ["City", "Pop"]
    assert json.loads(df.loc["t0", "rows_json"])[0] == ["Berlin", "3,644,826"]
    assert int(df.loc["t0", "n_rows"]) == 3 and int(df.loc["t0", "n_cols"]) == 2
    # entcols heuristic (semtab.py:32-37): the numeric Pop column is excluded
    assert list(df.loc["t0", "entcols"]) == [0]
    assert list(df.loc["t1", "entcols"]) == [0, 1]


def test_load_semtab_cea(tmp_path):
    tf = str(tmp_path / "cea.csv")
    with open(tf, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["t0", "1", "0", "http://dbpedia.org/page/Berlin"])
        w.writerow(["t0", "2", "0"])  # 3-column row: target without gold uri
    cea = load_semtab_cea(tf).to_pandas()
    assert len(cea) == 2
    # 1-based header-counting row shifts to 0-based body row; /page/ fixes
    assert cea.iloc[0].row_idx == 0
    assert cea.iloc[0].uri == "http://dbpedia.org/resource/Berlin"
    assert cea.iloc[1].uri == ""


@pytest.mark.usefixtures("ray_session")
def test_load_wdc_layout(tmp_path):
    p = str(tmp_path / "shard0.jsonl")
    docs = [
        {  # converts: FIRST_ROW, column-major relation
            "relation": [["City", "Berlin", "Paris"], ["Pop", "3.6M", "2.1M"]],
            "headerPosition": "FIRST_ROW",
            "url": "http://example.org/cities",
            "pageTitle": " Cities ",
            "title": "European cities",
            "tableNum": 2,
        },
        {  # skipped: no header row
            "relation": [["a", "b"], ["c", "d"]],
            "headerPosition": "NONE",
        },
        {  # converts: nested under 'table' (wdc.py:46-49)
            "table": {
                "relation": [["Name", "Rome"]],
                "headerPosition": "FIRST_ROW",
            }
        },
    ]
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    df = load_wdc_tables([p]).to_pandas().sort_values("table").reset_index(drop=True)
    assert len(df) == 2  # NONE-header doc skipped
    first = df.iloc[0]
    assert first.table == "shard0.jsonl#0"
    assert list(first.header) == ["City", "Pop"]
    assert json.loads(first.rows_json) == [["Berlin", "3.6M"], ["Paris", "2.1M"]]
    assert first.domain == "example.org"
    assert first.page_title == "Cities"
    assert first.caption == "European cities"
    assert int(first.table_num) == 2
    assert int(first.n_rows) == 2 and int(first.n_cols) == 2
    assert list(df.iloc[1].header) == ["Name"]


def test_semtab_end_to_end_linking_eval(ray_session, tmp_path):
    """Full loop: load semtab tables → explode entity-column cells → label
    linking against a small KB → score the induced entity partition against
    CEA gold with score_clusters (pairwise P/R/F1)."""
    import ray.data

    from takco_ray.stages.linking import build_label_index, link_cells
    from takco_ray.stages.report import score_clusters

    root = str(tmp_path / "semtab")
    os.makedirs(root)
    _write_semtab_fixture(root)

    kb = pa.table(
        {
            "label": ["Berlin", "Paris", "Rome", "London"],
            "ent": pa.array([1, 2, 3, 4], type=pa.int64()),
        }
    )
    index_ref = build_label_index(kb, "label", "ent")

    tables = load_semtab_tables(root)

    def explode(t: pa.Table) -> pa.Table:
        uid, mention = [], []
        for name, rows_json, entcols in zip(
            t.column("table").to_pylist(),
            t.column("rows_json").to_pylist(),
            t.column("entcols").to_pylist(),
        ):
            ti = int(name.lstrip("t"))
            for ri, row in enumerate(json.loads(rows_json)):
                for ci in entcols:
                    uid.append(ti * 10_000 + ri * 100 + ci)
                    mention.append(row[ci])
        return pa.table(
            {
                "cell_uid": pa.array(uid, type=pa.int64()),
                "mention": pa.array(mention, type=pa.string()),
            }
        )

    cells = tables.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    linked = link_cells(cells, "mention", index_ref)
    got = linked.to_pandas().set_index("cell_uid").sort_index()
    # Tokyo (t0 row 2) and the country cells of t1 have no KB label
    assert not got.loc[200, "matched"]
    assert got.loc[0, "entity_id"] == 1 and got.loc[10_000, "entity_id"] == 1

    # gold CEA for every entity cell that has a KB entity
    uri_of = {
        1: "http://dbpedia.org/resource/Berlin",
        2: "http://dbpedia.org/resource/Paris",
        3: "http://dbpedia.org/resource/Rome",
    }
    gold_rows = {0: 1, 100: 2, 10_000: 1, 10_100: 3}
    gold = ray.data.from_arrow(
        pa.table(
            {
                "file_id": pa.array(sorted(gold_rows), type=pa.int64()),
                "entity_id": pa.array(
                    [gold_rows[k] for k in sorted(gold_rows)], type=pa.int64()
                ),
            }
        )
    )
    labels = linked.filter(expr="matched").map_batches(
        lambda t: pa.table(
            {"file_id": t.column("cell_uid"), "cluster_id": t.column("entity_id")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rep = score_clusters(labels, gold).take_all()[0]
    # both Berlin cells pair up in prediction AND gold: perfect linking
    assert rep["n_items"] == 4
    assert rep["f1"] == pytest.approx(1.0)
    assert rep["precision"] == pytest.approx(1.0)
    assert rep["recall"] == pytest.approx(1.0)


@pytest.mark.usefixtures("ray_session")
def test_load_wdc_drops_malformed_lines(tmp_path):
    """Malformed jsonl records drop instead of failing the shard — the
    reference's robust_json_loads_lines policy (takco/util.py:12-21)."""
    p = str(tmp_path / "bad.jsonl")
    good = {
        "relation": [["City", "Berlin"]],
        "headerPosition": "FIRST_ROW",
        "url": "http://ok.test/x",
    }
    with open(p, "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write("{not json at all\n")
        f.write('"a bare string, not an object"\n')
        f.write(json.dumps(good) + "\n")
    df = load_wdc_tables([p]).to_pandas()
    assert len(df) == 2
    assert set(df["url"]) == {"http://ok.test/x"}
