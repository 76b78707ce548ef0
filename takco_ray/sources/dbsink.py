"""Offline index builders: Dataset → DuckDB database / SQLite label DB.

Re-expresses the reference's KB-prep builders (SURVEY §2 S9) on Ray Data:

- ``build_duckdb`` — reference TSV → duckdb tables
  (``takco/link/db/duckdb.py:37-72``): here the Dataset streams to
  partitioned Parquet shards (the resumable layout every sink in this repo
  uses) and the DuckDB file is built over them — ``mode="view"`` registers
  a zero-copy view (the 100-TB shape: DuckDB scans the shards lazily),
  ``mode="table"`` bulk-loads for a self-contained artifact.
- ``build_sqlite_labels`` — reference triples → sqlite label DB
  (``takco/link/db/sqlite.py:410-505``): a (normalized label → entity id)
  lookup DB. SQLite is single-writer by design, so the Dataset is reduced
  FIRST (distributed dedup on the normalized label, smallest id wins — the
  same rule as ``linking.build_label_index``) and only the final small
  index streams through the driver via ``iter_batches``.

Both builders are offline prep CLIs in the reference too — the driver-side
step is the *last* mile after distributed reduction, not a compute loop.
"""

from __future__ import annotations

import os
import sqlite3

import pyarrow as pa


def build_duckdb(
    ds,
    db_path: str,
    table_name: str,
    mode: str = "view",
    shard_dir: str | None = None,
) -> str:
    """Materialize ``ds`` as Parquet shards and expose them in a DuckDB file.

    Returns the shard directory. ``mode="view"`` keeps the DB a thin
    catalog over the shards; ``mode="table"`` copies rows into the .duckdb
    file (DuckDB parallel-loads the shard glob itself).
    """
    import duckdb

    if mode not in ("view", "table"):
        raise ValueError(f"mode must be 'view' or 'table', got {mode!r}")
    shard_dir = shard_dir or f"{db_path}.shards"
    ds.write_parquet(shard_dir, mode="overwrite")
    glob = os.path.join(shard_dir, "*.parquet")
    con = duckdb.connect(db_path)
    try:
        kind = "VIEW" if mode == "view" else "TABLE"
        con.sql(
            f"CREATE OR REPLACE {kind} {table_name} AS "
            f"SELECT * FROM read_parquet('{glob}')"
        )
    finally:
        con.close()
    return shard_dir


def query_duckdb(db_path: str, sql: str) -> pa.Table:
    """Read back from a built DuckDB file (test/verification helper)."""
    import duckdb

    con = duckdb.connect(db_path, read_only=True)
    try:
        return con.sql(sql).arrow()
    finally:
        con.close()


def build_sqlite_labels(
    ds,
    db_path: str,
    label_col: str,
    id_col: str,
    table_name: str = "labels",
    batch_size: int = 65536,
) -> int:
    """Build a normalized-label → entity-id SQLite lookup DB.

    The dedup (normalize, group by label, min id) runs DISTRIBUTED; only the
    reduced index rows pass through the driver writer. Returns the number of
    label rows written. Labels are unique post-reduction; the primary key
    enforces it.
    """
    import pyarrow.compute as pc

    from ..stages.linking import normalize_label

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": normalize_label(t.column(label_col)),
                "eid": t.column(id_col).cast(pa.int64()),
            }
        )

    reduced = (
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .min("eid")
    )

    if os.path.exists(db_path):
        os.remove(db_path)
    con = sqlite3.connect(db_path)
    n = 0
    try:
        con.execute(
            f"CREATE TABLE {table_name} (label TEXT PRIMARY KEY, eid INTEGER)"
        )
        for batch in reduced.iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        ):
            rows = list(
                zip(
                    batch.column("label").to_pylist(),
                    batch.column("min(eid)").to_pylist(),
                )
            )
            con.executemany(
                f"INSERT INTO {table_name} (label, eid) VALUES (?, ?)", rows
            )
            n += len(rows)
        con.commit()
    finally:
        con.close()
    return n


def lookup_sqlite_labels(
    db_path: str, labels: list[str], table_name: str = "labels"
) -> dict[str, int]:
    """Point-lookup helper mirroring the reference's label-DB reads."""
    con = sqlite3.connect(db_path)
    try:
        out = {}
        for chunk_start in range(0, len(labels), 500):
            chunk = labels[chunk_start : chunk_start + 500]
            q = ",".join("?" for _ in chunk)
            for label, eid in con.execute(
                f"SELECT label, eid FROM {table_name} WHERE label IN ({q})", chunk
            ):
                out[label] = eid
        return out
    finally:
        con.close()
