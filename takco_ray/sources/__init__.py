"""Dataset sources with column pruning (SURVEY.md §2.1 S1-S4).

The reference reads jsonl/csv corpora into table-dict streams
(``takco/util.py:125-156``, ``takco/__init__.py:44-62``). Here every source is
a pruned ``ray.data.read_parquet`` — only the columns a pipeline declares ever
leave storage, which at 100 TB is the single biggest read-side win.
"""

from .readers import (
    read_table,
    read_files_corpus,
    read_csv_table,
    read_jsonl,
    write_dataset,
    TESTDATA_TABLES,
)

__all__ = [
    "read_table",
    "read_files_corpus",
    "read_csv_table",
    "read_jsonl",
    "write_dataset",
    "TESTDATA_TABLES",
]
