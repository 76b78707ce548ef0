"""Parquet readers.

Replaces the reference's ``HashBag.load`` / ``DaskHashBag.load``
(``takco/util.py:125-156, 221-232``): instead of robust jsonl line parsing,
sources are typed Parquet with schema known up front; malformed-row policy
becomes a null-filter stage where needed.
"""

from __future__ import annotations

import os

import ray.data

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Read one testdata table with column pruning.

    ``columns`` prunes at the Parquet reader so unneeded columns never leave
    storage (SURVEY.md §2.1). Extra kwargs pass through to ``read_parquet``
    (e.g. ``override_num_blocks`` for benchmark partitioning control).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_files_corpus(
    corpus_dir: str, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    """Read a files corpus ``(repo, path, commit, lang, content)``.

    The primary input shape per BASELINE.json input_hint. ``corpus_dir`` is a
    directory of Parquet shards (the generator writes one file per shard so a
    resumable run can skip finished partitions).
    """
    return ray.data.read_parquet(corpus_dir, columns=columns, **kwargs)


def read_csv_table(paths, **kwargs) -> ray.data.Dataset:
    """CSV source (reference ``TableSet.csvs``, ``takco/__init__.py:44-62``)."""
    return ray.data.read_csv(paths, **kwargs)


def read_jsonl(paths, **kwargs) -> ray.data.Dataset:
    """jsonl source (reference ``HashBag.load``, ``takco/util.py:125-156``).

    Ray's JSON reader drops nothing silently; malformed-line tolerance (the
    reference's ``robust_json_loads_lines``) belongs in an explicit
    validator ``map_batches`` if the corpus needs it.
    """
    return ray.data.read_json(paths, **kwargs)


def write_dataset(ds, path: str, fmt: str = "parquet"):
    """Sink (reference ``HashBag.dump``, ``takco/util.py:98-123``): one file
    per block — the shard layout resumable runs rely on."""
    if fmt == "parquet":
        # overwrite: dump semantics — the dir holds THIS dataset afterwards
        ds.write_parquet(path, mode="overwrite")
    elif fmt == "json":
        ds.write_json(path)
    elif fmt == "csv":
        ds.write_csv(path)
    else:
        raise ValueError(f"unknown sink format {fmt!r}")
