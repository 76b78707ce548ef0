"""Temporal operators Ray Data lacks natively: as-of join, gap sessionization,
sliding-window (RANGE-frame) aggregate.

The reference engine is strictly batch and has none of these (SURVEY §2.9);
they are the custom-operator tier of the brief — each built as composition
(a): ONE hash shuffle on the entity key (`groupmap.partitioned_group_map`,
the same coarse-partition machinery every dedup stage uses), then fully
vectorized numpy segment work inside each partition. No driver-side
materialization, no per-row or per-key Python loops.

Partitioning assumption (documented per the brief): all history of one key
lands in one partition — per-key history must fit a worker's heap. Skew
bound = max rows per key; for per-user event streams that is naturally
bounded (a user's clickstream, a customer's orders). Keys are mixed before
the modulo, so sequential ids spread evenly; a single pathological key would
need the salting treatment `stages.blocking` applies to hot bands.

Timestamps ride as int64 epoch-microseconds end to end (timestamp[us] is a
bit-cast, zero-copy); only 8-byte columns cross the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .groupmap import partitioned_group_map


def _parts() -> int:
    from ..util import default_concurrency

    return default_concurrency()[1]


def _i64(col: pa.ChunkedArray) -> np.ndarray:
    """Zero-copy-ish int64 view of an int64/timestamp[us] column."""
    return np.asarray(col.cast(pa.int64()).combine_chunks(), dtype=np.int64)


def sessionize(
    ds,
    key_column: str,
    ts_column: str,
    id_column: str,
    gap_us: int = 30 * 60 * 1_000_000,
    session_column: str = "session_id",
    num_partitions: int | None = None,
):
    """Gap-based sessions: within a key, a new session starts when the gap to
    the previous event exceeds ``gap_us`` (strict >). Returns
    ``(id_column, session_column)`` with ``session_column`` = the minimum
    event id of the session (content-free, deterministic, no global counter
    — the same order-free-id rationale as SURVEY A3).

    Semantics match the SQL window formulation exactly (lag → gap flag →
    running sum → min-per-session), tie-broken by ``(ts, id)``.
    """

    def per_partition(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    session_column: pa.array([], type=pa.int64()),
                }
            )
        k = _i64(t.column(key_column))
        ts = _i64(t.column(ts_column))
        ids = _i64(t.column(id_column))
        order = np.lexsort((ids, ts, k))
        k, ts, ids = k[order], ts[order], ids[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = (k[1:] != k[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        sess_min = np.minimum.reduceat(ids, starts)
        return pa.table(
            {
                id_column: pa.array(ids, type=pa.int64()),
                session_column: pa.array(sess_min[seg], type=pa.int64()),
            }
        )

    return partitioned_group_map(
        ds, key_column, per_partition, num_partitions or _parts()
    )


def asof_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
    right_value: str | None = None,
    num_partitions: int | None = None,
):
    """Inner as-of join: each left row matches the right row of the same key
    with the greatest ``right_ts`` ≤ ``left_ts`` (ties → greatest
    ``right_id``). Left rows with no eligible right row are dropped.

    Shape: both sides normalize to a slim shared schema (key, t, rid, side
    [, val]) → ``union`` → one hash shuffle on key → per-partition merge
    scan: rows lexsorted by (key, t, side, rid) with right-before-left at
    equal t, then a single ``np.maximum.accumulate`` of right positions
    gives every left row its most-recent-right index; a key-equality check
    voids carries across key boundaries. O(n log n) per partition, no
    per-key loop, never materializes the cross product the SQL oracle
    scans.
    """
    want_val = right_value is not None

    def norm_left(t: pa.Table) -> pa.Table:
        cols = {
            "__k": t.column(left_key).cast(pa.int64()),
            "__t": t.column(left_ts).cast(pa.int64()),
            "__rid": t.column(left_id).cast(pa.int64()),
            "__side": pa.array(np.ones(len(t), dtype=np.int8), type=pa.int8()),
        }
        if want_val:
            cols["__val"] = pa.array(np.zeros(len(t)), type=pa.float64())
        return pa.table(cols)

    def norm_right(t: pa.Table) -> pa.Table:
        cols = {
            "__k": t.column(right_key).cast(pa.int64()),
            "__t": t.column(right_ts).cast(pa.int64()),
            "__rid": t.column(right_id).cast(pa.int64()),
            "__side": pa.array(np.zeros(len(t), dtype=np.int8), type=pa.int8()),
        }
        if want_val:
            cols["__val"] = t.column(right_value).cast(pa.float64())
        return pa.table(cols)

    both = left.map_batches(norm_left, batch_format="pyarrow").union(
        right.map_batches(norm_right, batch_format="pyarrow")
    )

    def per_partition(t: pa.Table) -> pa.Table:
        out_cols = {
            left_id: pa.array([], type=pa.int64()),
            right_id: pa.array([], type=pa.int64()),
        }
        if want_val:
            out_cols[right_value] = pa.array([], type=pa.float64())
        if len(t) == 0:
            return pa.table(out_cols)
        k = _i64(t.column("__k"))
        ts = _i64(t.column("__t"))
        rid = _i64(t.column("__rid"))
        side = np.asarray(t.column("__side").combine_chunks(), dtype=np.int8)
        val = (
            np.asarray(t.column("__val").combine_chunks(), dtype=np.float64)
            if want_val
            else None
        )
        order = np.lexsort((rid, side, ts, k))
        k, ts, rid, side = k[order], ts[order], rid[order], side[order]
        if want_val:
            val = val[order]
        n = len(k)
        pos = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(side == 0, pos, np.int64(-1)))
        li = np.flatnonzero(side == 1)
        m = last_right[li]
        valid = (m >= 0) & (k[np.maximum(m, 0)] == k[li])
        li, m = li[valid], m[valid]
        out_cols[left_id] = pa.array(rid[li], type=pa.int64())
        out_cols[right_id] = pa.array(rid[m], type=pa.int64())
        if want_val:
            out_cols[right_value] = pa.array(val[m], type=pa.float64())
        return pa.table(out_cols)

    return partitioned_group_map(both, "__k", per_partition, num_partitions or _parts())


def range_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
    before_us: int = 0,
    after_us: int = 0,
    left_id_out: str | None = None,
    right_id_out: str | None = None,
    num_partitions: int | None = None,
):
    """Banded range join: every (left, right) pair of the same key with
    ``right_ts`` in ``[left_ts − before_us, left_ts + after_us]``, both ends
    inclusive. Pass the same dataset twice for a self-join (the identity
    pair ships too — filter it downstream if unwanted). Output columns are
    ``left_id_out``/``right_id_out`` (default: the input id names).

    Same one-shuffle shape as the other temporal operators; per partition
    the right side is lexsorted and lifted onto disjoint per-key int64
    bands, so both window bounds for EVERY left row come from two global
    ``np.searchsorted`` calls, and pair emission is a vectorized
    repeat+offset gather. Output size is the true match count — fanout is
    bounded by window width × per-key event rate; a pathologically dense
    key needs upstream salting like hot LSH bands.
    """
    lo_name = left_id_out or left_id
    ro_name = right_id_out or right_id
    if lo_name == ro_name:
        raise ValueError("left/right output id columns must differ")

    def norm(key, ts, idc, side):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__k": t.column(key).cast(pa.int64()),
                    "__t": t.column(ts).cast(pa.int64()),
                    "__rid": t.column(idc).cast(pa.int64()),
                    "__side": pa.array(
                        np.full(len(t), side, dtype=np.int8), type=pa.int8()
                    ),
                }
            )

        return fn

    both = left.map_batches(
        norm(left_key, left_ts, left_id, 1), batch_format="pyarrow"
    ).union(right.map_batches(norm(right_key, right_ts, right_id, 0), batch_format="pyarrow"))

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                lo_name: pa.array([], type=pa.int64()),
                ro_name: pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        k = _i64(t.column("__k"))
        ts = _i64(t.column("__t"))
        rid = _i64(t.column("__rid"))
        side = np.asarray(t.column("__side").combine_chunks(), dtype=np.int8)
        lmask = side == 1
        lk, lt, lid = k[lmask], ts[lmask], rid[lmask]
        rk, rt, rid_r = k[~lmask], ts[~lmask], rid[~lmask]
        if len(lk) == 0 or len(rk) == 0:
            return empty
        ro = np.lexsort((rid_r, rt, rk))
        rk, rt, rid_r = rk[ro], rt[ro], rid_r[ro]
        uniq = np.unique(np.concatenate([lk, rk]))
        tmin = min(int(lt.min()), int(rt.min()))
        rel_max = max(int(lt.max()), int(rt.max())) - tmin
        big = rel_max + before_us + after_us + 2
        if len(uniq) * big >= (1 << 62):  # pragma: no cover - astronomic spans
            raise OverflowError(
                "range_join band lift overflows int64; reduce partition span"
            )
        adj_r = np.searchsorted(uniq, rk) * big + (rt - tmin)
        seg_l = np.searchsorted(uniq, lk) * big + (lt - tmin)
        lo = np.searchsorted(adj_r, seg_l - before_us, side="left")
        hi = np.searchsorted(adj_r, seg_l + after_us, side="right")
        counts = hi - lo
        out_l = np.repeat(lid, counts)
        starts = np.repeat(lo, counts)
        offs = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        out_r = rid_r[starts + offs]
        return pa.table(
            {
                lo_name: pa.array(out_l, type=pa.int64()),
                ro_name: pa.array(out_r, type=pa.int64()),
            }
        )

    return partitioned_group_map(both, "__k", per_partition, num_partitions or _parts())


def rolling_window_count(
    ds,
    key_column: str,
    ts_column: str,
    id_column: str,
    window_us: int = 60 * 60 * 1_000_000,
    count_column: str = "n_window",
    num_partitions: int | None = None,
):
    """Sliding-window count (SQL RANGE frame): for each row, the number of
    same-key rows with ``ts`` in ``[t − window_us, t]``, both ends
    inclusive, peers (equal ts) included — exactly
    ``count(*) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    window PRECEDING AND CURRENT ROW)``.

    Per partition, both bounds come from TWO global ``np.searchsorted``
    calls: timestamps are made globally monotone by lifting each key
    segment onto its own disjoint band (``seg_id × BIG + ts_rel`` with
    ``BIG > ts_range + window``), so no per-key search loop. Falls back to
    a per-segment scan only if the lift would overflow int64 (≈2^62 —
    billions of keys × decades of span in one partition).
    """

    def per_partition(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    count_column: pa.array([], type=pa.int64()),
                }
            )
        k = _i64(t.column(key_column))
        ts = _i64(t.column(ts_column))
        ids = _i64(t.column(id_column))
        order = np.lexsort((ids, ts, k))
        k, ts, ids = k[order], ts[order], ids[order]
        seg_start = np.concatenate([[True], k[1:] != k[:-1]])
        seg_id = np.cumsum(seg_start) - 1
        ts_rel = ts - ts.min()
        big = int(ts_rel.max()) + window_us + 2
        n_seg = int(seg_id[-1]) + 1
        if n_seg * big < (1 << 62):
            adj = seg_id * big + ts_rel
            lo = np.searchsorted(adj, adj - window_us, side="left")
            hi = np.searchsorted(adj, adj, side="right")
        else:  # pragma: no cover - astronomic spans only
            lo = np.empty(len(k), dtype=np.int64)
            hi = np.empty(len(k), dtype=np.int64)
            starts = np.flatnonzero(seg_start)
            ends = np.append(starts[1:], len(k))
            for s, e in zip(starts, ends):
                lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - window_us, "left")
                hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], "right")
        return pa.table(
            {
                id_column: pa.array(ids, type=pa.int64()),
                count_column: pa.array(hi - lo, type=pa.int64()),
            }
        )

    return partitioned_group_map(
        ds, key_column, per_partition, num_partitions or _parts()
    )


def grouped_running_sum(
    ds,
    key_column: str,
    ts_column: str,
    id_column: str,
    value_column: str,
    out_column: str = "running_sum",
    units: int | None = None,
    num_partitions: int | None = None,
):
    """Per-key running total ordered by ``(ts, id)`` — exactly
    ``sum(value) OVER (PARTITION BY key ORDER BY ts, id
    ROWS UNBOUNDED PRECEDING)``.

    One hash shuffle on the key, then per partition: ONE lexsort + ONE
    global ``np.cumsum`` with the previous segment's total subtracted at
    each segment start (no per-key loop). ``units`` integerizes the value
    (``round(value × units)`` as int64) before summing so the running
    totals are associative and engine-exact; ``None`` keeps float64 (same
    left-to-right accumulation order as the SQL window, but float sums are
    only comparable within one engine).
    """

    def per_partition(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    out_column: pa.array(
                        [], type=pa.int64() if units else pa.float64()
                    ),
                }
            )
        k = _i64(t.column(key_column))
        ts = _i64(t.column(ts_column))
        ids = _i64(t.column(id_column))
        v = np.asarray(
            t.column(value_column).cast(pa.float64()).combine_chunks(),
            dtype=np.float64,
        )
        if units:
            v = np.round(v * units).astype(np.int64)
        order = np.lexsort((ids, ts, k))
        k, ids, v = k[order], ids[order], v[order]
        cum = np.cumsum(v)
        seg_start = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(seg_start)
        seg_id = np.cumsum(seg_start) - 1
        # subtract the total accumulated before each segment; exact on the
        # int64 path, and the float path is cumsum-minus-offset (NOT bit
        # equal to summing each segment alone — use `units` for oracles)
        seg_base = np.concatenate([v[:1] * 0, cum[starts[1:] - 1]])
        run = cum - seg_base[seg_id]
        return pa.table(
            {
                id_column: pa.array(ids, type=pa.int64()),
                out_column: pa.array(
                    run, type=pa.int64() if units else pa.float64()
                ),
            }
        )

    return partitioned_group_map(
        ds, key_column, per_partition, num_partitions or _parts()
    )


def lag_deltas(
    ds,
    key_column: str,
    ts_column: str,
    id_column: str,
    delta_column: str = "delta_us",
    num_partitions: int | None = None,
):
    """Per-key inter-event gaps (SQL ``ts - LAG(ts) OVER (PARTITION BY key
    ORDER BY ts, id)``): one row per event that HAS a predecessor in its
    key, carrying the gap in int64 microseconds. The first event per key is
    omitted — exactly the rows where SQL's LAG is NULL — so the output has
    no null column and stays hash-comparable across engines.

    Same one-shuffle shape as :func:`sessionize`; the per-partition body is
    a lexsort plus one vectorized diff."""

    def per_partition(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    delta_column: pa.array([], type=pa.int64()),
                }
            )
        k = _i64(t.column(key_column))
        ts = _i64(t.column(ts_column))
        ids = _i64(t.column(id_column))
        order = np.lexsort((ids, ts, k))
        k, ts, ids = k[order], ts[order], ids[order]
        same = k[1:] == k[:-1]
        delta = ts[1:] - ts[:-1]
        return pa.table(
            {
                id_column: pa.array(ids[1:][same], type=pa.int64()),
                delta_column: pa.array(delta[same], type=pa.int64()),
            }
        )

    return partitioned_group_map(
        ds, key_column, per_partition, num_partitions or _parts()
    )


def interval_coverage(
    ds,
    key_column: str,
    start_column: str,
    end_column: str,
    num_partitions: int | None = None,
):
    """Per-key merged-interval coverage (the gaps-and-islands union): sort a
    key's intervals by (start, end), merge any interval whose start ≤ the
    running max end (touching merges), and emit one row per key with the
    island count and the total covered span — the "how much wall-clock did
    this user's sessions actually cover" report, the interval-union dual of
    :func:`sessionize`'s point-gap sessions.

    One hash shuffle on the key; inside each partition a vectorized sort +
    per-key running-max scan (the per-key loop is over DISTINCT keys in the
    partition, not rows). Columns must be int64 (µs epochs / integerized).
    Output: (key_column, n_islands, covered).
    """

    def per_partition(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    key_column: pa.array([], type=pa.int64()),
                    "n_islands": pa.array([], type=pa.int64()),
                    "covered": pa.array([], type=pa.int64()),
                }
            )
        k = _i64(t.column(key_column))
        s = _i64(t.column(start_column))
        e = _i64(t.column(end_column))
        if (e < s).any():
            bad = int(np.flatnonzero(e < s)[0])
            raise ValueError(
                f"interval_coverage: end < start (row {bad}: {s[bad]}..{e[bad]})"
                " — malformed intervals would silently corrupt coverage totals"
            )
        order = np.lexsort((e, s, k))
        k, s, e = k[order], s[order], e[order]
        from .groupmap import segment_boundaries

        starts = segment_boundaries(k)
        ends = np.append(starts[1:], len(k))
        keys_out = np.empty(len(starts), dtype=np.int64)
        islands_out = np.empty(len(starts), dtype=np.int64)
        covered_out = np.empty(len(starts), dtype=np.int64)
        for gi, (a, b) in enumerate(zip(starts, ends)):
            ss, ee = s[a:b], e[a:b]
            run_max = np.maximum.accumulate(ee)
            # island starts: first interval, or start strictly past the
            # running max end of everything before it
            new = np.empty(b - a, dtype=bool)
            new[0] = True
            new[1:] = ss[1:] > run_max[:-1]
            isl_starts = np.flatnonzero(new)
            isl_ends = np.append(isl_starts[1:], b - a)
            cov = run_max[isl_ends - 1] - ss[isl_starts]
            keys_out[gi] = k[a]
            islands_out[gi] = len(isl_starts)
            covered_out[gi] = int(cov.sum())
        return pa.table(
            {
                key_column: pa.array(keys_out, type=pa.int64()),
                "n_islands": pa.array(islands_out, type=pa.int64()),
                "covered": pa.array(covered_out, type=pa.int64()),
            }
        )

    return partitioned_group_map(
        ds, key_column, per_partition, num_partitions or _parts()
    )
