"""profile stage: pFD scores, column profile / heuristic key, coltype votes.

Oracles here are pure-Python reimplementations of the reference formulas
(``takco/link/profile.py``, ``takco/link/__init__.py:96-172``) evaluated on
small in-memory tables; the SQL-oracle equivalence is covered by the driver
queries (pfd_orders, column_profile_customer, coltype_events).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest

from takco_ray.stages.profile import (
    coltype_votes,
    column_profile,
    heuristic_key,
    pfd_scores,
)


def _df(ds):
    return ds.to_pandas()


def _py_pfd(rows: list[tuple], n_ppm: bool = True):
    """Reference formulas, driver-side: perTuple + perValue for det=col0→col1."""
    det_dep = Counter(rows)
    per_det: dict = {}
    for (d, v), c in det_dep.items():
        per_det.setdefault(d, []).append(c)
    n = len(rows)
    sum_max = sum(max(cs) for cs in per_det.values())
    pt = sum_max * 1_000_000 // n
    pv_units = sum((max(cs) * 1_000_000) // sum(cs) for cs in per_det.values())
    pv = pv_units // len(per_det)
    return pt, pv


@pytest.mark.usefixtures("ray_session")
def test_pfd_matches_reference_formula():
    import ray.data

    rows = [
        ("a", "x"), ("a", "x"), ("a", "y"),
        ("b", "y"), ("b", "y"),
        ("c", "z"),
        ("a", "x"), ("c", "w"),
    ] * 3
    ds = ray.data.from_arrow(
        pa.table(
            {
                "det": [r[0] for r in rows],
                "dep": [r[1] for r in rows],
            }
        )
    )
    out = _df(pfd_scores(ds, "det", ["dep"], num_partitions=4))
    pt, pv = _py_pfd(rows)
    assert out.loc[0, "dep_col"] == "dep"
    assert int(out.loc[0, "pfd_ppm"]) == pt
    assert int(out.loc[0, "pfd_pv_ppm"]) == pv


@pytest.mark.usefixtures("ray_session")
def test_pfd_perfect_and_random_deps():
    import ray.data

    n = 200
    t = pa.table(
        {
            "k": [i % 20 for i in range(n)],
            "fdep": [(i % 20) * 7 for i in range(n)],  # function of k → score 1.0
            "spread": list(range(n)),  # every value distinct → max=1 per det
        }
    )
    out = _df(pfd_scores(ray.data.from_arrow(t), "k", ["fdep", "spread"]))
    out = out.set_index("dep_col")
    assert int(out.loc["fdep", "pfd_ppm"]) == 1_000_000
    assert int(out.loc["fdep", "pfd_pv_ppm"]) == 1_000_000
    # spread: max count per det is 1, 20 dets → perTuple = 20/200 = 0.1
    assert int(out.loc["spread", "pfd_ppm"]) == 100_000
    assert int(out.loc["spread", "pfd_pv_ppm"]) == 100_000


@pytest.mark.usefixtures("ray_session")
def test_column_profile_finds_name_key():
    import ray.data

    n = 50
    t = pa.table(
        {
            "id": list(range(n)),  # numeric → not key
            "name": [f"entity {chr(65 + i % 26)}{i}" for i in range(n)],  # unique text
            "cat": ["red" if i % 2 else "blue" for i in range(n)],  # low uniq
        }
    )
    prof_df = _df(column_profile(ray.data.from_arrow(t), ["id", "name", "cat"]))
    prof = prof_df.set_index("col_name")
    assert bool(prof.loc["id", "is_key"]) is False  # numeric
    assert bool(prof.loc["cat", "is_key"]) is False  # uniq too low
    # "entity A0": strip punct+space → digits minority → non-numeric; unique
    assert bool(prof.loc["name", "is_key"]) is True
    assert int(prof.loc["cat", "uniq_ppm"]) == 2 * 1_000_000 // n
    assert heuristic_key(pa.Table.from_pandas(prof_df)) == "name"


@pytest.mark.usefixtures("ray_session")
def test_coltype_votes_majority_and_priority():
    import ray.data

    n = 90
    t = pa.table(
        {
            "ints": [str(i) for i in range(n)],
            "floats": [f"{i}.5" for i in range(n)],
            "dates": [f"20{i % 10:02d}-01-0{1 + i % 9}" for i in range(n)],
            "mixed": [str(i) if i % 2 else "x" for i in range(n)],  # no majority
        }
    )
    out = _df(coltype_votes(ray.data.from_arrow(t), ["ints", "floats", "dates", "mixed"]))
    out = out.set_index("col_name")
    assert out.loc["ints", "coltype"] == "integer"
    assert out.loc["floats", "coltype"] == "number"
    assert out.loc["dates", "coltype"] == "date"
    # 45/90 integer is NOT a strict majority → text
    assert out.loc["mixed", "coltype"] == "text"
    assert int(out.loc["ints", "vote_ppm"]) == 1_000_000
