"""Driver-contract conformance: every SQL-oracled query matches DuckDB at
sf0.001 (the driver itself re-checks at sf0.01)."""

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_df(x):
    if isinstance(x, pd.DataFrame):
        return x
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    raise TypeError(type(x))


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _oracled_names():
    import __ray_entry__ as E

    return sorted(E.oracle_sql())


@pytest.mark.parametrize("name", _oracled_names())
def test_query_matches_oracle(ray_session, oracle_con, name):
    import __ray_entry__ as E

    got = _canon(_to_df(E.queries()[name](SF_DIR)))
    want = _canon(oracle_con.sql(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    # the driver's value hash is TYPED: an int64 column vs DuckDB HUGEINT→
    # float64 fails it even with equal values, so dtypes must match too
    mismatched = [
        c
        for c in got.columns
        if got[c].dtype != want[c].dtype
        and not (got[c].dtype == object and want[c].dtype == object)
    ]
    assert not mismatched, f"dtype mismatch vs oracle: {mismatched}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as E

    qs = E.queries()
    oracled = set(E.oracle_sql())
    skip = {"er_clusters"}  # covered end-to-end by test_er.py at corpus scale
    for name in set(qs) - oracled - skip:
        df = _to_df(qs[name](SF_DIR))
        assert df.shape[1] >= 2, name


def test_entry_returns_labeled_rows(ray_session):
    import __ray_entry__ as E

    df = _to_df(E.entry())
    assert len(df) > 0
    assert {"file_id", "cluster_id", "sha256"} <= set(df.columns)
