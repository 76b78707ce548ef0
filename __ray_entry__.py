"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor any ``takco_ray`` code calls ``ray.init``/``ray.shutdown``
(only ``bench.py`` and the pytest session fixture own a Ray session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship ER pipeline (blocking + scoring + transitive clustering) on
    the deterministic synthetic code corpus at test scale (BASELINE.json
    north star): returns the (file_id, cluster_id, sha256, repo, path)
    labels Dataset."""
    from takco_ray.pipelines.queries import q_er_clusters

    return q_er_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from takco_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from takco_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
