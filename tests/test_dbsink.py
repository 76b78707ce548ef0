"""dbsink: DuckDB catalog/table builders + SQLite label DB round-trips."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from takco_ray.sources.dbsink import (
    build_duckdb,
    build_sqlite_labels,
    lookup_sqlite_labels,
    query_duckdb,
)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["view", "table"])
def test_build_duckdb_round_trip(tmp_path, mode):
    import ray.data

    t = pa.table({"k": [3, 1, 2], "v": ["c", "a", "b"]})
    db = str(tmp_path / f"idx_{mode}.duckdb")
    build_duckdb(ray.data.from_arrow(t), db, "items", mode=mode)
    back = query_duckdb(db, "SELECT k, v FROM items ORDER BY k")
    assert back.column("k").to_pylist() == [1, 2, 3]
    assert back.column("v").to_pylist() == ["a", "b", "c"]
    # view mode depends on the shards; table mode must survive their removal
    if mode == "table":
        import shutil

        shutil.rmtree(db + ".shards")
        back = query_duckdb(db, "SELECT count(*) AS n FROM items")
        assert back.column("n").to_pylist() == [3]


@pytest.mark.usefixtures("ray_session")
def test_build_sqlite_labels_dedup_and_lookup(tmp_path):
    import ray.data

    t = pa.table(
        {
            "name": ["Alpha", " alpha", "Beta", "GAMMA", "beta"],
            "id": [9, 4, 2, 5, 7],
        }
    )
    db = str(tmp_path / "labels.sqlite")
    n = build_sqlite_labels(ray.data.from_arrow(t), db, "name", "id")
    assert n == 3  # alpha, beta, gamma after normalization
    assert os.path.exists(db)
    got = lookup_sqlite_labels(db, ["alpha", "beta", "gamma", "delta"])
    assert got == {"alpha": 4, "beta": 2, "gamma": 5}  # smallest id wins
