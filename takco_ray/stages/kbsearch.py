"""Local SQLite KB searcher — the serviceless rung of the reference's
searcher family (SURVEY §2 ST5; reference ``SQLiteSearcher``,
``takco/link/db/sqlite.py:275-408``). ES/Trident/HTTP searchers need live
services that do not exist in this environment; the SQLite one is a plain
local file, so its semantics port fully:

- a ``label(uri, txt, score)`` table with scored surface forms (the
  reference seeds prefLabel=1.0 / altLabel=0.5, ``sqlite.py:289-294``) and
  indexes on both columns (``sqlite.py:277-285``);
- lookup = lowercase + exact match, results sorted by descending score
  (deterministic here: ties break on ascending uri);
- the part-split fallback (``get_parts``, ``sqlite.py:334-340``): a query
  that misses is split at ``( [ , :`` boundaries and its parts retried.

Ray-side shape: :func:`build_sqlite_kb` reduces the label table
DISTRIBUTED (normalize + per-(txt,uri) max-score groupby) and streams only
the reduced rows through one driver writer; :class:`SqliteKbSearcher` is an
ACTOR-POOL stage — each actor opens the database once in ``__init__`` (the
actor-local cache pattern; a task pool would reopen per batch) and probes
each batch's DISTINCT mentions with chunked ``IN (...)`` queries. At
cluster scale the db file sits on shared storage (or is broadcast to node-
local disk once); probes are read-only so any number of actors share it.
"""

from __future__ import annotations

import sqlite3

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import default_concurrency

_PART_CHARS = "([,:"


def get_parts(query: str):
    """The reference's sub-query splitter (``sqlite.py:334-340``): for each
    split character, each piece (with ``)]`` stripped) that differs from
    the full query is a candidate."""
    for char in _PART_CHARS:
        for qpart in query.split(char):
            qpart = qpart.translate(str.maketrans("", "", ")]")).strip()
            if qpart != query:
                yield qpart


def build_sqlite_kb(
    ds,
    db_path: str,
    uri_col: str,
    label_col: str,
    score_col: str | None = None,
    default_score: float = 1.0,
    batch_size: int = 65536,
) -> int:
    """Distributed-reduce a (uri, label[, score]) Dataset into the
    reference's ``label(uri, txt, score)`` SQLite layout. Dedup keeps the
    MAX score per (txt, uri) — re-asserting a surface form never lowers
    it. Only reduced rows pass through the driver writer."""
    import os

    from .linking import normalize_label

    def norm(t: pa.Table) -> pa.Table:
        score = (
            t.column(score_col).cast(pa.float64())
            if score_col
            else pa.array(
                np.full(t.num_rows, default_score), type=pa.float64()
            )
        )
        return pa.table(
            {
                "txt": normalize_label(t.column(label_col)),
                "uri": pc.cast(t.column(uri_col), pa.string()),
                "score": score,
            }
        )

    reduced = (
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["txt", "uri"])
        .max("score")
    )

    if os.path.exists(db_path):
        os.remove(db_path)
    con = sqlite3.connect(db_path)
    n = 0
    try:
        con.executescript(
            """
            CREATE TABLE label(uri TEXT, txt TEXT, score REAL);
            CREATE INDEX label_uri ON label(uri);
            CREATE INDEX label_txt ON label(txt);
            """
        )
        for batch in reduced.iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        ):
            rows = list(
                zip(
                    batch.column("uri").to_pylist(),
                    batch.column("txt").to_pylist(),
                    batch.column("max(score)").to_pylist(),
                )
            )
            con.executemany(
                "INSERT INTO label(uri, txt, score) VALUES (?,?,?)", rows
            )
            n += len(rows)
        con.commit()
    finally:
        con.close()
    return n


class SqliteKbSearcher:
    """Actor-pool stage: mention batches → best KB entity per mention.

    ``__init__`` opens the read-only connection ONCE per actor;
    ``__call__`` probes the batch's distinct mentions (dictionary-encoded)
    with chunked ``IN`` queries, applies the part-split fallback to
    misses, and appends ``(kb_uri, kb_score, kb_matched, kb_via_parts)``.
    Best = max score, ties to the lexicographically smallest uri
    (deterministic; the reference sorts by score only, ``sqlite.py:398``).
    """

    def __init__(self, db_path: str, parts: bool = True, lower: bool = True):
        # Ray may run __init__ and __call__ on different actor threads;
        # read-only probes are thread-safe with the check disabled
        self.con = sqlite3.connect(
            f"file:{db_path}?mode=ro", uri=True, check_same_thread=False
        )
        self.parts = parts
        self.lower = lower

    def _probe(self, queries: list[str]) -> dict:
        """Exact-match lookup for a list of distinct queries → best row."""
        best: dict = {}
        for lo in range(0, len(queries), 500):
            chunk = queries[lo : lo + 500]
            marks = ",".join("?" for _ in chunk)
            for uri, txt, score in self.con.execute(
                f"SELECT uri, txt, score FROM label WHERE txt IN ({marks})",
                chunk,
            ):
                cur = best.get(txt)
                if cur is None or (-score, uri) < (-cur[1], cur[0]):
                    best[txt] = (uri, score)
        return best

    def __call__(self, batch: pa.Table, mention_col: str = "mention") -> pa.Table:
        col = batch.column(mention_col)
        if self.lower:
            col = pc.utf8_trim_whitespace(pc.utf8_lower(col))
        enc = pc.dictionary_encode(col.combine_chunks())
        distinct = enc.dictionary.to_pylist()
        best = self._probe([q for q in distinct if q])

        via_parts: set = set()
        misses = [q for q in distinct if q and q not in best]
        if self.parts and misses:
            part_lists = {q: [p for p in get_parts(q)] for q in misses}
            all_parts = sorted({p for ps in part_lists.values() for p in ps})
            part_best = self._probe(all_parts) if all_parts else {}
            for q, ps in part_lists.items():
                cands = [part_best[p] for p in ps if p in part_best]
                if cands:
                    best[q] = min(cands, key=lambda c: (-c[1], c[0]))
                    via_parts.add(q)

        uris, scores, matched, viap = [], [], [], []
        for q in distinct:
            hit = best.get(q) if q else None
            uris.append(hit[0] if hit else None)
            scores.append(hit[1] if hit else 0.0)
            matched.append(hit is not None)
            viap.append(q in via_parts)
        codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
        codes = codes.astype(np.int64)

        def gather(values, typ):
            arr = pa.array(values, type=typ)
            out = arr.take(pa.array(np.maximum(codes, 0), type=pa.int64()))
            if (codes < 0).any():  # null mentions stay null/false
                mask = pa.array(codes < 0)
                out = pc.if_else(mask, pa.scalar(None, type=typ), out)
            return out

        return (
            batch.append_column("kb_uri", gather(uris, pa.string()))
            .append_column("kb_score", gather(scores, pa.float64()))
            .append_column(
                "kb_matched", pc.fill_null(gather(matched, pa.bool_()), False)
            )
            .append_column(
                "kb_via_parts", pc.fill_null(gather(viap, pa.bool_()), False)
            )
        )


def search_kb(
    ds,
    mention_col: str,
    db_path: str,
    parts: bool = True,
    concurrency=None,
    batch_size: int = 4096,
):
    """Annotate ``ds`` with the best KB entity per ``mention_col`` value."""

    class _Stage(SqliteKbSearcher):
        def __init__(self):
            super().__init__(db_path, parts=parts)

        def __call__(self, batch):  # bind the mention column
            return super().__call__(batch, mention_col=mention_col)

    return ds.map_batches(
        _Stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
