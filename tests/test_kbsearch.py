"""Local SQLite KB searcher (SURVEY §2 ST5; reference ``SQLiteSearcher``,
``takco/link/db/sqlite.py:275-408``): distributed KB build, exact probe,
score-ranked ties, and the part-split fallback."""

from __future__ import annotations

import sqlite3

import pyarrow as pa
import pytest

from takco_ray.stages.kbsearch import build_sqlite_kb, get_parts, search_kb


def test_get_parts_matches_reference_splitter():
    # sqlite.py:334-340 — split at ( [ , : with )] stripped; chars that
    # don't split still yield the )]-stripped whole string when it differs
    got = list(get_parts("Paris (city)"))
    assert got[:2] == ["Paris", "city"]
    assert all(p == "Paris (city" for p in got[2:])
    assert list(get_parts("a, b")) == ["a", "b"]
    assert list(get_parts("k: v")) == ["k", "v"]
    assert list(get_parts("plain")) == []


@pytest.fixture()
def kb_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "uri": ["kb:1", "kb:2", "kb:2", "kb:3", "kb:9"],
                "label": ["Berlin", "Paris", "paris ", "Paris", "Rome"],
                "score": [1.0, 0.5, 1.0, 1.0, 1.0],
            }
        )
    )


def test_build_sqlite_kb_reduces_and_indexes(kb_ds, tmp_path):
    db = str(tmp_path / "kb.sqlite")
    n = build_sqlite_kb(kb_ds, db, "uri", "label", score_col="score")
    con = sqlite3.connect(db)
    rows = sorted(con.execute("SELECT uri, txt, score FROM label"))
    # 'Paris'/'paris ' normalize to one txt; (paris, kb:2) keeps MAX score
    assert ("kb:2", "paris", 1.0) in rows
    assert ("kb:2", "paris", 0.5) not in rows
    assert n == len(rows) == 4
    idx = {r[1] for r in con.execute("PRAGMA index_list(label)")}
    assert {"label_uri", "label_txt"} <= idx
    con.close()


def test_search_kb_exact_ties_and_parts(kb_ds, ray_session, tmp_path):
    import ray.data

    db = str(tmp_path / "kb.sqlite")
    build_sqlite_kb(kb_ds, db, "uri", "label", score_col="score")

    mentions = ray.data.from_arrow(
        pa.table(
            {
                "mid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
                "mention": [
                    "  BERLIN ",        # normalization → exact hit
                    "Paris",            # tie at score 1.0 → smallest uri kb:2
                    "Rome (ancient)",   # exact miss → '(' part 'Rome' hits
                    "Atlantis",         # no hit anywhere
                    None,               # null mention stays null
                ],
            }
        )
    )
    out = (
        search_kb(mentions, "mention", db)
        .to_pandas()
        .set_index("mid")
        .sort_index()
    )
    assert out.loc[0, "kb_uri"] == "kb:1" and out.loc[0, "kb_matched"]
    assert out.loc[1, "kb_uri"] == "kb:2"  # kb:2 < kb:3 at equal score
    assert out.loc[2, "kb_uri"] == "kb:9" and out.loc[2, "kb_via_parts"]
    assert not out.loc[3, "kb_matched"] and out.loc[3, "kb_uri"] is None
    assert not out.loc[4, "kb_matched"]
    assert out.loc[4, "kb_uri"] is None or out.loc[4, "kb_uri"] != out.loc[4, "kb_uri"]


def test_search_kb_parts_disabled(kb_ds, ray_session, tmp_path):
    import ray.data

    db = str(tmp_path / "kb.sqlite")
    build_sqlite_kb(kb_ds, db, "uri", "label", score_col="score")
    mentions = ray.data.from_arrow(
        pa.table({"mention": ["Rome (ancient)"]})
    )
    out = search_kb(mentions, "mention", db, parts=False).to_pandas()
    assert not out.loc[0, "kb_matched"]
