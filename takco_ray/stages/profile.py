"""Column profiling: probabilistic FDs, key heuristics, column-type voting.

Re-expresses the reference's table-profiling stack Ray-Data-first:

- probabilistic functional dependencies (reference ``PFDProfiler`` /
  ``perTuple_pFDs`` / ``pfd_prob_pervalue``, ``takco/link/profile.py:33-145``,
  after Wang et al., "Functional Dependency Generation and Applications in
  Pay-As-You-Go Data Integration Systems", WebDB 2009) — SURVEY §2 A11;
- numeric-fraction / uniqueness key heuristics (reference ``link.link``
  ``numscore``/``uniqscore``/``heuristic_key``,
  ``takco/link/__init__.py:96-118``) — SURVEY §2 M15;
- majority column-type voting (reference ``coltypes`` + ``Typer.coltype``,
  ``takco/link/__init__.py:152-172``, ``takco/link/types.py:121-142``) —
  SURVEY §2 M16.

The reference computes all three per-table on driver-side Python rows; here
each is a streaming map-side partial (per-batch Arrow/numpy group counts,
tiny rows out) followed by ONE hash shuffle on a composite key and a small
final reduction — the shape that survives 100 TB inputs. All scores are
emitted as integer ppm (parts-per-million, floored) so engine and SQL oracle
hash-match exactly regardless of float summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# string.punctuation + " " as a regex char class (ASCII ranges !-/ :-@ [-` {-~)
_PUNCT_SPACE_RE = r"[!-/:-@\[-`{-~ ]"
_DIGIT_RE = r"[^0-9]"

# cell-type patterns, checked in priority order (first match wins)
_TYPE_PATTERNS = [
    ("integer", r"^[+-]?[0-9]+$"),
    ("number", r"^[+-]?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$"),
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}"),
]


def _as_string(col) -> pa.ChunkedArray:
    """Cast any column to its string cell form (timestamps via ISO format)."""
    if pa.types.is_timestamp(col.type):
        return pc.strftime(col, format="%Y-%m-%d %H:%M:%S")
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col
    return pc.cast(col, pa.string())


# --------------------------------------------------------------------------
# A11: probabilistic functional dependencies
# --------------------------------------------------------------------------

def pfd_scores(ds, det_col: str, dep_cols: list[str], num_partitions: int = 64):
    """Per-tuple and per-value pFD scores ``det_col -> dep`` for each dep.

    perTuple (Wang et al. eq. used by ``perTuple_pFDs``):
        score = sum over distinct det values v of max_b count(v, b) / N
    perValue (``pfd_prob_pervalue``):
        score = mean over distinct det values v of max_b count(v, b) / count(v)

    Plan: map-side partial counts of (det, dep_name, dep_val) — the only
    rows that ever shuffle — then one hash exchange on det so every det
    value's partials co-locate, a per-partition vectorized max/sum, and a
    tiny final groupby(dep_name) sum. Returns one row per dep column:
    ``(dep_col, pfd_ppm, pfd_pv_ppm)`` with both scores floored to ppm.
    """
    from .groupmap import group_key_hash

    dep_cols = list(dep_cols)

    def partial_counts(t: pa.Table) -> pa.Table:
        det = _as_string(t.column(det_col))
        outs = []
        for i, dep in enumerate(dep_cols):
            sub = pa.table({"det": det, "dep_val": _as_string(t.column(dep))})
            cnt = sub.group_by(["det", "dep_val"]).aggregate([([], "count_all")])
            outs.append(
                pa.table(
                    {
                        "det": cnt.column("det"),
                        "dep_idx": pa.array(
                            np.full(len(cnt), i, dtype=np.int32), type=pa.int32()
                        ),
                        "dep_val": cnt.column("dep_val"),
                        "cnt": cnt.column("count_all").cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    def add_pk(t: pa.Table) -> pa.Table:
        hk = group_key_hash(t.column("det")).view(np.uint64)
        pk = ((hk * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(
            num_partitions
        )
        return t.append_column("__pk", pa.array(pk.astype(np.int64), type=pa.int64()))

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__pk"])
        # merge partials: sum cnt per (det, dep_idx, dep_val), then per
        # (det, dep_idx): max over dep_val and total count — all via one
        # dictionary-encode + lexsort + reduceat, no per-group Python.
        merged = g.group_by(["det", "dep_idx", "dep_val"]).aggregate([("cnt", "sum")])
        det_codes = pc.dictionary_encode(merged.column("det").combine_chunks()).indices
        det_codes = det_codes.to_numpy(zero_copy_only=False).astype(np.int64)
        dep_idx = merged.column("dep_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = merged.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        # segment = (dep_idx, det): all dep_vals of one det contiguous
        order = np.lexsort((det_codes, dep_idx))
        di, dc, c = dep_idx[order], det_codes[order], cnt[order]
        new_seg = np.empty(len(di), dtype=bool)
        if len(di):
            new_seg[0] = True
            new_seg[1:] = (di[1:] != di[:-1]) | (dc[1:] != dc[:-1])
        starts = np.flatnonzero(new_seg)
        rows = []
        if len(starts):
            # reduceat over ALL segment starts (segments never span deps
            # because dep_idx is the primary lexsort key), then slice per dep
            mx_all = np.maximum.reduceat(c, starts)
            tot_all = np.add.reduceat(c, starts)
            seg_dep = di[starts]
            for i in range(len(dep_cols)):
                sel = seg_dep == i
                if not np.any(sel):
                    continue
                mx, tot = mx_all[sel], tot_all[sel]
                n_i = int(tot.sum())
                sum_max = int(mx.sum())
                # perValue: sum over dets of floor(1e6 * max/cnt) + ndistinct
                pv_units = int(np.floor_divide(mx * np.int64(1_000_000), tot).sum())
                rows.append((i, sum_max, n_i, pv_units, int(sel.sum())))
        if not rows:
            return pa.table(
                {
                    "dep_idx": pa.array([], type=pa.int32()),
                    "sum_max": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "pv_units": pa.array([], type=pa.int64()),
                    "ndet": pa.array([], type=pa.int64()),
                }
            )
        a = np.array(rows, dtype=np.int64)
        return pa.table(
            {
                "dep_idx": pa.array(a[:, 0].astype(np.int32), type=pa.int32()),
                "sum_max": pa.array(a[:, 1], type=pa.int64()),
                "n": pa.array(a[:, 2], type=pa.int64()),
                "pv_units": pa.array(a[:, 3], type=pa.int64()),
                "ndet": pa.array(a[:, 4], type=pa.int64()),
            }
        )

    partials = (
        ds.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pk")
        .map_groups(per_partition, batch_format="pyarrow")
    )

    def finalize(t: pa.Table) -> pa.Table:
        agg = t.group_by("dep_idx").aggregate(
            [("sum_max", "sum"), ("n", "sum"), ("pv_units", "sum"), ("ndet", "sum")]
        )
        idx = agg.column("dep_idx").to_numpy(zero_copy_only=False)
        sum_max = agg.column("sum_max_sum").to_numpy(zero_copy_only=False)
        n = agg.column("n_sum").to_numpy(zero_copy_only=False)
        pv = agg.column("pv_units_sum").to_numpy(zero_copy_only=False)
        ndet = agg.column("ndet_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(idx)
        return pa.table(
            {
                "dep_col": pa.array([dep_cols[i] for i in idx[order]], type=pa.string()),
                "pfd_ppm": pa.array(
                    sum_max[order] * 1_000_000 // n[order], type=pa.int64()
                ),
                "pfd_pv_ppm": pa.array(pv[order] // ndet[order], type=pa.int64()),
            }
        )

    # the per-dep partial rows number num_partitions × len(dep_cols) — tiny;
    # repartition(1) then finalize keeps it distributed-shaped (no driver loop)
    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    )


# --------------------------------------------------------------------------
# M15: numeric-fraction / uniqueness column profile + heuristic key
# --------------------------------------------------------------------------

def column_profile(ds, cols: list[str]):
    """Per-column ``numscore``/``uniqscore`` profile + heuristic-key flag.

    Reference semantics (``takco/link/__init__.py:96-118``): a cell is
    numeric when, after removing punctuation and spaces, more than half its
    characters are digits (empty → not numeric); ``numscore`` is the numeric
    cell fraction, ``uniqscore`` = distinct/count, and a column is a
    heuristic key when numscore < 0.5 and uniqscore > 0.9.

    One pass emits per-batch (col, value, cnt, isnum) partials; one groupby
    on (col, value) merges them; a per-column reduction derives exact
    integer comparisons (no float thresholds), so oracle hashes match.
    """
    cols = list(cols)

    def partials(t: pa.Table) -> pa.Table:
        outs = []
        for i, c in enumerate(cols):
            s = _as_string(t.column(c))
            sub = pa.table({"value": s}).group_by("value").aggregate([([], "count_all")])
            val = sub.column("value")
            stripped = pc.replace_substring_regex(
                pc.fill_null(val, ""), _PUNCT_SPACE_RE, ""
            )
            digits = pc.replace_substring_regex(stripped, _DIGIT_RE, "")
            ls = pc.utf8_length(stripped).to_numpy(zero_copy_only=False)
            ld = pc.utf8_length(digits).to_numpy(zero_copy_only=False)
            isnum = (ls > 0) & (2 * ld > ls)
            outs.append(
                pa.table(
                    {
                        "col_idx": pa.array(
                            np.full(len(sub), i, dtype=np.int32), type=pa.int32()
                        ),
                        "value": val,
                        "cnt": sub.column("count_all").cast(pa.int64()),
                        "isnum": pa.array(isnum.astype(np.int64), type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    merged = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["col_idx", "value"])
        .sum("cnt")
    )

    def batch_stats(t: pa.Table) -> pa.Table:
        # after the (col, value) groupby each distinct pair appears exactly
        # once globally, so per-batch stats (rows = distinct contribution,
        # sums over cnt) combine additively — the big distinct-value table
        # never reaches a single task.
        idx = t.column("col_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        val = pc.fill_null(t.column("value").combine_chunks(), "")
        stripped = pc.replace_substring_regex(val, _PUNCT_SPACE_RE, "")
        digits = pc.replace_substring_regex(stripped, _DIGIT_RE, "")
        ls = pc.utf8_length(stripped).to_numpy(zero_copy_only=False)
        ld = pc.utf8_length(digits).to_numpy(zero_copy_only=False)
        isnum = ((ls > 0) & (2 * ld > ls)).astype(np.int64)
        rows = []
        for i in range(len(cols)):
            m = idx == i
            if not np.any(m):
                continue
            rows.append(
                (i, int(cnt[m].sum()), int(m.sum()), int((isnum[m] * cnt[m]).sum()))
            )
        a = np.array(rows, dtype=np.int64).reshape(-1, 4)
        return pa.table(
            {
                "col_idx": pa.array(a[:, 0].astype(np.int32), type=pa.int32()),
                "n": pa.array(a[:, 1], type=pa.int64()),
                "ndist": pa.array(a[:, 2], type=pa.int64()),
                "nnum": pa.array(a[:, 3], type=pa.int64()),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        agg = t.group_by("col_idx").aggregate(
            [("n", "sum"), ("ndist", "sum"), ("nnum", "sum")]
        )
        idx = agg.column("col_idx").to_numpy(zero_copy_only=False)
        n = agg.column("n_sum").to_numpy(zero_copy_only=False)
        ndist = agg.column("ndist_sum").to_numpy(zero_copy_only=False)
        nnum = agg.column("nnum_sum").to_numpy(zero_copy_only=False)
        rows = []
        for j in np.argsort(idx):
            i, ni, di, nu = int(idx[j]), int(n[j]), int(ndist[j]), int(nnum[j])
            rows.append(
                (
                    cols[i],
                    nu * 1_000_000 // max(ni, 1),
                    di * 1_000_000 // max(ni, 1),
                    (2 * nu < ni) and (10 * di > 9 * ni),
                )
            )
        return pa.table(
            {
                "col_name": pa.array([r[0] for r in rows], type=pa.string()),
                "num_ppm": pa.array([r[1] for r in rows], type=pa.int64()),
                "uniq_ppm": pa.array([r[2] for r in rows], type=pa.int64()),
                "is_key": pa.array([r[3] for r in rows], type=pa.bool_()),
            }
        )

    return (
        merged.map_batches(batch_stats, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )


def heuristic_key(profile_rows: pa.Table) -> str | None:
    """First profiled column flagged as a heuristic key (reference keeps
    ``heuristic_keys[0]``), or None — mirrors ``link.link``'s selection."""
    for row in profile_rows.to_pylist():
        if row["is_key"]:
            return row["col_name"]
    return None


# --------------------------------------------------------------------------
# M16: majority column-type voting
# --------------------------------------------------------------------------

def coltype_votes(ds, cols: list[str]):
    """Majority-vote column typing over string cell forms.

    Each cell votes for the first matching pattern (integer, number, date)
    or ``text``; a column's type is the plurality vote, demoted to ``text``
    unless it wins a strict majority (> 1/2 of cells — the reference's
    ``coltype`` majority rule, ``takco/link/types.py:121-142``). Returns one
    row per column: ``(col_name, coltype, vote_ppm)``; ``vote_ppm`` is the
    winning type's floored cell fraction. Ties break by the fixed type
    priority order (integer, number, date, text).
    """
    cols = list(cols)
    type_names = [t for t, _ in _TYPE_PATTERNS] + ["text"]

    def partials(t: pa.Table) -> pa.Table:
        outs = []
        for i, c in enumerate(cols):
            s = pc.fill_null(_as_string(t.column(c)), "")
            remaining = np.ones(len(s), dtype=bool)
            counts = []
            for _, pat in _TYPE_PATTERNS:
                m = pc.match_substring_regex(s, pat).to_numpy(zero_copy_only=False)
                m = m & remaining
                counts.append(int(m.sum()))
                remaining &= ~m
            counts.append(int(remaining.sum()))
            outs.append((i, counts))
        n_types = len(type_names)
        col_idx = np.repeat([o[0] for o in outs], n_types).astype(np.int32)
        type_idx = np.tile(np.arange(n_types, dtype=np.int32), len(outs))
        cnt = np.array([c for _, cs in outs for c in cs], dtype=np.int64)
        return pa.table(
            {
                "col_idx": pa.array(col_idx, type=pa.int32()),
                "type_idx": pa.array(type_idx, type=pa.int32()),
                "cnt": pa.array(cnt, type=pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["col_idx", "type_idx"])
        .sum("cnt")
    )

    def finalize(t: pa.Table) -> pa.Table:
        ci = t.column("col_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        ti = t.column("type_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for i, c in enumerate(cols):
            m = ci == i
            per_type = np.zeros(len(type_names), dtype=np.int64)
            per_type[ti[m]] = cnt[m]
            n = int(per_type.sum())
            win = int(np.argmax(per_type))  # ties → lowest index = priority
            wc = int(per_type[win])
            name = type_names[win] if 2 * wc > n else "text"
            wc = wc if 2 * wc > n else int(per_type[-1])
            rows.append((c, name, wc * 1_000_000 // max(n, 1)))
        return pa.table(
            {
                "col_name": pa.array([r[0] for r in rows], type=pa.string()),
                "coltype": pa.array([r[1] for r in rows], type=pa.string()),
                "vote_ppm": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    )
