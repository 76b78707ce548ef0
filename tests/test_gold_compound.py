"""gold dataset loaders (T2D layout fixtures) + compound splitter."""

from __future__ import annotations

import csv
import os

import pyarrow as pa
import pytest

from takco_ray.functions.compound import compound_parts_stage, split_compound
from takco_ray.sources.gold import fix_uri, load_t2d


def _write_t2d_fixture(root):
    os.makedirs(os.path.join(root, "tables_instance"))
    os.makedirs(os.path.join(root, "entities_instance"))
    os.makedirs(os.path.join(root, "attributes_instance"))

    with open(os.path.join(root, "tables_instance", "t1.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["City", "Country"])  # header row
        w.writerow(["Berlin", "Germany"])
        w.writerow(["Paris", "France"])

    # attributes: col 0 is the key column
    with open(os.path.join(root, "attributes_instance", "t1.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["http://dbpedia.org/ontology/name", "City", "True", "0"])
        w.writerow(["http://dbpedia.org/ontology/country", "Country", "False", "1"])

    # entities: rownum is 1-based (header counts), reference shifts by -1
    with open(os.path.join(root, "entities_instance", "t1.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["http://dbpedia.org/page/Berlin", "Berlin", "1"])
        w.writerow(["http://dbpedia.org/resource/Paris%21", "Paris", "2"])

    with open(os.path.join(root, "classes_instance.csv"), "w", newline="") as f:
        csv.writer(f).writerow(["t1.csv", "City", "http://dbpedia.org/ontology/City"])


@pytest.mark.usefixtures("ray_session")
def test_load_t2d_layout(tmp_path):
    root = str(tmp_path / "t2d")
    os.makedirs(root)
    _write_t2d_fixture(root)

    gold = load_t2d(root)
    assert gold["keycols"] == {"t1": 0}

    rows = gold["tables"].to_pandas().sort_values("row_idx")
    assert len(rows) == 3
    assert list(rows.iloc[0]["cells"]) == ["City", "Country"]

    ents = gold["entities"].to_pandas().sort_values("row_idx")
    # /page/ normalizes to /resource/; rownum 1 shifts to row_idx 0
    assert ents.iloc[0]["uri"] == "http://dbpedia.org/resource/Berlin"
    assert int(ents.iloc[0]["row_idx"]) == 0
    assert int(ents.iloc[0]["col_idx"]) == 0
    # percent-decoded then requoted; '!' is in the reference's safe set so
    # %21 stays a literal '!'
    assert ents.iloc[1]["uri"] == "http://dbpedia.org/resource/Paris!"

    props = gold["properties"].to_pandas()
    assert len(props) == 1  # the key column's own attribute row is dropped
    assert int(props.iloc[0]["to_col"]) == 1

    classes = gold["classes"].to_pandas()
    assert classes.iloc[0]["uri"] == "http://dbpedia.org/ontology/City"
    assert int(classes.iloc[0]["col_idx"]) == 0


def test_fix_uri_rules():
    assert fix_uri("http://dbpedia_org/page/X") == "http://dbpedia.org/resource/X"
    # unquote + requote round-trip keeps reference-safe characters
    assert fix_uri("http://dbpedia.org/resource/A_&_B") == (
        "http://dbpedia.org/resource/A_&_B"
    )


def test_split_compound_cases():
    col = pa.array(
        ["getHTTPResponse2xx", "snake_case-kebab.dots", "Simple", "a__b"]
    )
    parts = split_compound(col).to_pylist()
    assert parts[0] == ["get", "http", "response", "2", "xx"]
    assert parts[1] == ["snake", "case", "kebab", "dots"]
    assert parts[2] == ["simple"]
    assert parts[3] == ["a", "b"]


@pytest.mark.usefixtures("ray_session")
def test_compound_parts_stage():
    import ray.data

    ds = ray.data.from_arrow(pa.table({"ident": ["parseHTML", "x_y_z"]}))
    out = compound_parts_stage(ds, "ident").to_pandas()
    assert list(out["n_parts"]) == [2, 3]


def test_corpus_learned_compound_splitting(ray_session):
    """ST6's offline analog: the corpus IS the model. Frequencies from a
    small corpus segment caseless concatenations (requestslogger →
    requests+logger) that the structural splitter cannot; unknown runs
    survive unsplit instead of shattering."""
    import pyarrow as pa
    import ray.data

    from takco_ray.functions.compound import (
        build_split_vocab,
        corpus_split_stage,
        viterbi_split,
    )

    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": [
                    "requests logger handler requests logger",
                    "the logger writes requests to the handler",
                    "requests handler logger requests",
                ]
                * 4
            }
        )
    )
    vocab_ref = build_split_vocab(docs, "text", top_k=100)
    import ray as _ray

    vocab = _ray.get(vocab_ref)
    assert {"requests", "logger", "handler"} <= set(vocab)

    # pure function: DP segmentation
    assert viterbi_split("requestslogger", vocab) == ["requests", "logger"]
    assert viterbi_split("loggerhandlerrequests", vocab) == [
        "logger", "handler", "requests",
    ]
    # unknown material stays one run (merged unknown chars)
    assert viterbi_split("zzqx", vocab) == ["zzqx"]

    idents = ray.data.from_arrow(
        pa.table(
            {
                "ident": [
                    "requestslogger_util",   # snake + caseless compound
                    "getRequestsLogger",     # camel handles it structurally
                    "zzqxblob",              # unknown: unsplit
                ]
            }
        )
    )
    out = corpus_split_stage(idents, "ident", vocab_ref).to_pandas()
    got = {r.ident: list(r.parts) for r in out.itertuples()}
    assert got["requestslogger_util"] == ["requests", "logger", "util"]
    # structural splitter lowercases parts (its established contract)
    assert got["getRequestsLogger"] == ["get", "requests", "logger"]
    assert got["zzqxblob"] == ["zzqxblob"]
