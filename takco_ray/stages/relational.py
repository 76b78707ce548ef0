"""Relational extensions: semi/anti joins, per-group top-n, pivot,
exact histogram quantiles, and deterministic hash sampling.

Fills the query-surface gaps around the reference's filter/join family
(filter matchers as a semi-join, ``takco/cluster/__init__.py:520-540``;
novelty/anti patterns, ``takco/evaluate/novelty.py:15-60``; per-group
argmax, ``takco/cluster/__init__.py:371-383``) re-expressed Ray-Data-first:

- semi/anti joins ride Ray's native hash-shuffle join (``left_semi`` /
  ``left_anti``) — one exchange, no driver materialization;
- per-group top-n runs a vectorized PARTIAL top-n inside every batch
  (combiner) so only ``n × groups`` rows per batch reach the shuffle;
- quantiles aggregate a value histogram map-side (exact for bounded-
  cardinality columns — prices, sizes, counts; for unbounded doubles
  compose with a rounding projection, which bounds the error explicitly
  rather than hiding it in a sketch);
- hash sampling is a pure projection (multiplicative mix, no RNG state),
  so every worker agrees on membership without coordination and the
  sample is reproducible across runs and engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Knuth's multiplicative constant — same sample can be drawn in SQL with
# (id * 2654435761) % m, so oracles and downstream engines agree exactly.
SAMPLE_MIX = 2654435761


def semi_join(left, right, on: str, right_on: str | None = None, num_partitions: int | None = None):
    """Rows of ``left`` with ≥1 match in ``right`` (Ray native left_semi).

    Prune ``right`` to its key column before calling — only the key needs
    to shuffle. One hash exchange; output carries only left columns.
    ``num_partitions`` defaults to the cluster CPU count — a fixed constant
    is a straggler factory once the cluster grows.
    """
    from ..util import default_join_partitions, join_remote_args

    parts = num_partitions or default_join_partitions()
    return left.join(
        right,
        join_type="left_semi",
        num_partitions=parts,
        on=(on,),
        right_on=(right_on or on,),
        aggregator_ray_remote_args=join_remote_args(parts),
    )


def anti_join(left, right, on: str, right_on: str | None = None, num_partitions: int | None = None):
    """Rows of ``left`` with NO match in ``right`` (Ray native left_anti)."""
    from ..util import default_join_partitions, join_remote_args

    parts = num_partitions or default_join_partitions()
    return left.join(
        right,
        join_type="left_anti",
        num_partitions=parts,
        on=(on,),
        right_on=(right_on or on,),
        aggregator_ray_remote_args=join_remote_args(parts),
    )


def _topn_partial(t: pa.Table, group_col: str, order_col: str, n: int,
                  descending: bool, tiebreak_col: str) -> pa.Table:
    """Vectorized top-n per group within one table: one lexsort + segment
    rank, no per-group Python. Emits a ``rank`` column (1-based)."""
    if t.num_rows == 0:
        return t.append_column("rank", pa.array([], type=pa.int64()))
    keys = t.column(group_col).combine_chunks()
    codes = pc.dictionary_encode(keys).indices
    g = np.asarray(codes, dtype=np.int64)
    v = np.asarray(t.column(order_col).combine_chunks(), dtype=np.float64)
    tb = np.asarray(t.column(tiebreak_col).combine_chunks(), dtype=np.int64)
    order = np.lexsort((tb, -v if descending else v, g))
    gs = g[order]
    starts = np.concatenate([[0], np.flatnonzero(gs[1:] != gs[:-1]) + 1])
    seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(gs))))
    rank = np.arange(len(gs)) - starts[seg_of]
    keep = rank < n
    out = t.take(pa.array(order[keep], type=pa.int64()))
    return out.append_column("rank", pa.array(rank[keep] + 1, type=pa.int64()))


def top_n_per_group(ds, group_col: str, order_col: str, n: int,
                    tiebreak_col: str, descending: bool = True):
    """Top-``n`` rows per group by ``order_col`` (ties broken ascending by
    ``tiebreak_col`` for determinism), with a 1-based ``rank`` column.

    Map-side combiner first: each batch keeps only its own top-n per group,
    so at most ``n × distinct_groups`` rows per batch enter the shuffle —
    the groupby that follows is over a dataset bounded by
    ``n × groups × num_batches`` regardless of input size.
    """

    def partial(t: pa.Table) -> pa.Table:
        return _topn_partial(t, group_col, order_col, n, descending, tiebreak_col).drop_columns(["rank"])

    def final(t: pa.Table) -> pa.Table:
        return _topn_partial(t, group_col, order_col, n, descending, tiebreak_col)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


def pivot_counts(ds, index_col: str, pivot_col: str, categories: list[str],
                 prefix: str = "n_"):
    """Pivot counts of ``pivot_col`` categories into columns per ``index_col``.

    Expressed as conditional 0/1 projections + Sum aggregates: map-side
    partials make the shuffle carry only ``groups × (1 + categories)``
    integers. Categories must be known up front (compose with a distinct
    pre-pass otherwise); unknown category values are counted in none of the
    output columns by design.
    """
    from ray.data.aggregate import Sum

    names = [prefix + c.lower().replace(" ", "_").replace("-", "_") for c in categories]

    def proj(t: pa.Table) -> pa.Table:
        cols = {index_col: t.column(index_col)}
        piv = t.column(pivot_col)
        for cat, name in zip(categories, names):
            cols[name] = pc.cast(pc.equal(piv, pa.scalar(cat)), pa.int64())
        return pa.table(cols)

    agg = (
        ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(index_col)
        .aggregate(*[Sum(n) for n in names])
    )
    return agg.rename_columns({f"sum({n})": n for n in names})


def value_histogram(ds, col: str):
    """(value, cnt) dataset — per-batch ``np.unique`` partials, then one
    tiny groupby over distinct values only."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(col).combine_chunks(), dtype=np.float64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table(
            {"value": pa.array(vals, type=pa.float64()),
             "cnt": pa.array(cnts.astype(np.int64), type=pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("value")
        .aggregate(Sum("cnt"))
    )
    return agg.rename_columns({"sum(cnt)": "cnt"})


def exact_quantiles(ds, col: str, qs: list[float]):
    """One-row table of exact discrete quantiles of ``col``.

    DuckDB ``quantile_disc`` semantics: the element at 0-based sorted index
    ``ceil(q·n) − 1``. The full sort is avoided: only the value histogram
    shuffles (distinct values, not rows), and the final cumsum walk runs on
    that tiny table. Exact whenever the column's distinct-value count is
    bounded (prices in cents, quantities, sizes); for genuinely continuous
    columns project a rounded copy first so the error bound is explicit.
    """
    hist = value_histogram(ds, col)

    def pick(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("value").combine_chunks(), dtype=np.float64)
        c = np.asarray(t.column("cnt").combine_chunks(), dtype=np.int64)
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = cum[-1] if len(cum) else 0
        cols = {}
        for q in qs:
            idx = max(0, int(np.ceil(q * n)) - 1)
            pos = int(np.searchsorted(cum, idx + 1))
            cols[f"q{int(round(q * 100)):02d}"] = pa.array(
                [v[min(pos, len(v) - 1)]] if n else [None], type=pa.float64()
            )
        return pa.table(cols)

    # histogram is tiny (distinct values); one repartition → single picker task
    return hist.repartition(1).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


def grouped_quantiles(ds, col: str, group_col: str, qs: list[float]):
    """Per-group exact discrete quantiles — one row per group with a
    ``qNN`` column per requested quantile.

    Same histogram route as :func:`exact_quantiles`, keyed by (group,
    value): the shuffle carries one row per DISTINCT (group, value) pair,
    and the per-group cumsum walk runs on each group's tiny histogram.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        grp = t.column(group_col).combine_chunks()
        enc = pc.dictionary_encode(grp)
        codes = np.asarray(enc.indices, dtype=np.int64)
        v = np.asarray(t.column(col).combine_chunks(), dtype=np.float64)
        # unique (group, value) pairs with counts, one lexsort
        order = np.lexsort((v, codes))
        cs, vs = codes[order], v[order]
        first = (
            np.concatenate([[True], (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])])
            if len(cs)
            else np.zeros(0, dtype=bool)
        )
        starts = np.flatnonzero(first)
        cnts = np.diff(np.append(starts, len(cs)))
        return pa.table(
            {
                group_col: pc.take(grp, pa.array(order[starts], type=pa.int64())),
                "value": pa.array(vs[starts], type=pa.float64()),
                "cnt": pa.array(cnts.astype(np.int64), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "value"])
        .aggregate(Sum("cnt"))
        .rename_columns({"sum(cnt)": "cnt"})
    )

    def pick(g: pa.Table) -> pa.Table:
        v = np.asarray(g.column("value").combine_chunks(), dtype=np.float64)
        c = np.asarray(g.column("cnt").combine_chunks(), dtype=np.int64)
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = cum[-1]
        cols = {group_col: g.column(group_col).slice(0, 1)}
        for q in qs:
            idx = max(0, int(np.ceil(q * n)) - 1)
            pos = int(np.searchsorted(cum, idx + 1))
            cols[f"q{int(round(q * 100)):02d}"] = pa.array(
                [v[min(pos, len(v) - 1)]], type=pa.float64()
            )
        return pa.table(cols)

    return hist.groupby(group_col).map_groups(pick, batch_format="pyarrow")


def approx_distinct(ds, key_col: str, group_col: str, p: int = 12):
    """(group, approx_distinct) — HyperLogLog distinct-count per group.

    Map side: ONE register array per group per batch (2^p bytes, 4 KB at
    p=12) regardless of row count; reduce side: elementwise-max merge +
    estimate per group. The shuffle never carries keys — this is the
    COUNT(DISTINCT) that still works when the distinct set itself doesn't
    fit anywhere (σ ≈ 1.04/√2^p ≈ 1.6 % at p=12).
    """
    from ..functions.sketch import hll_registers, hll_estimate

    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        keys = np.asarray(t.column(key_col).combine_chunks(), dtype=np.int64)
        grp = t.column(group_col).combine_chunks()
        codes = np.asarray(pc.dictionary_encode(grp).indices, dtype=np.int64)
        order = np.argsort(codes, kind="stable")
        ks, cs = keys[order], codes[order]
        starts = np.concatenate([[0], np.flatnonzero(cs[1:] != cs[:-1]) + 1]) if len(cs) else np.zeros(0, dtype=np.int64)
        ends = np.append(starts[1:], len(cs))
        groups, regs = [], []
        for s, e in zip(starts, ends):  # one iteration per DISTINCT group, not per row
            groups.append(cs[s])
            regs.append(hll_registers(ks[s:e], p))
        return pa.table(
            {
                group_col: pc.take(grp, pa.array(order[starts], type=pa.int64())),
                "regs": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(regs) if regs else np.zeros(0, dtype=np.uint8), type=pa.uint8()), m
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        regs = np.asarray(g.column("regs").combine_chunks().flatten(), dtype=np.uint8).reshape(-1, m)
        merged = regs.max(axis=0)
        return pa.table(
            {
                group_col: g.column(group_col).slice(0, 1),
                "approx_distinct": pa.array([int(round(hll_estimate(merged)))], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def hash_sample(ds, id_col: str, modulus: int = 1000, keep: int = 100):
    """Deterministic ``keep/modulus`` sample: rows where
    ``(id · SAMPLE_MIX) mod modulus < keep``.

    A pure stateless projection — reproducible across runs, engines
    (``(id * 2654435761) % m`` in SQL) and cluster sizes, and consistent
    for the same id everywhere (so joined tables stay aligned when sampled
    by the same key). int64 math: ids must stay below 2^63 / SAMPLE_MIX
    (~3.5e9) — ENFORCED per batch, because past that bound numpy int64
    multiply wraps (and numpy ``%`` stays non-negative) while DuckDB promotes
    to HUGEINT, silently breaking the cross-engine determinism contract.
    Hash the id into 32 bits first for wider key spaces.
    """
    id_limit = (2**63) // SAMPLE_MIX

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col).combine_chunks(), dtype=np.int64)
        if len(ids) and (ids.max() >= id_limit or ids.min() < 0):
            raise ValueError(
                f"hash_sample ids must be in [0, {id_limit}) for exact int64 "
                "math matching the SQL oracle; pre-hash wider keys into 32 bits"
            )
        mask = (ids * SAMPLE_MIX) % modulus < keep
        return t.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, group_col: str, id_col: str, n: int):
    """Exactly ``min(n, group_size)`` rows per group, deterministic across
    runs, engines and cluster sizes: rows ranked ascending by the mixed id
    hash ``(id · SAMPLE_MIX) mod 2³²`` (ties by id), keep rank ≤ n.

    The per-group analog of :func:`hash_sample` — a stratified downsample
    whose membership a SQL engine reproduces exactly
    (``row_number() OVER (PARTITION BY g ORDER BY (id*2654435761)%4294967296,
    id)``). Built on :func:`top_n_per_group`, so each batch pre-trims to its
    own top-n before the shuffle. Same id-range contract as ``hash_sample``
    (enforced there, re-checked here): ids must stay below 2⁶³/SAMPLE_MIX.
    """
    id_limit = (2**63) // SAMPLE_MIX

    def add_hk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col).combine_chunks(), dtype=np.int64)
        if len(ids) and (ids.max() >= id_limit or ids.min() < 0):
            raise ValueError(
                f"stratified_sample ids must be in [0, {id_limit}) for exact "
                "int64 math matching the SQL oracle"
            )
        hk = (ids * SAMPLE_MIX) % (2**32)
        return t.append_column("__hk", pa.array(hk, type=pa.int64()))

    with_hk = ds.map_batches(add_hk, batch_format="pyarrow", zero_copy_batch=True)
    out = top_n_per_group(
        with_hk, group_col, "__hk", n, tiebreak_col=id_col, descending=False
    )
    return out.map_batches(
        lambda t: t.drop_columns(["__hk"]), batch_format="pyarrow", zero_copy_batch=True
    )


def epoch_shuffle(ds, id_col: str, num_shards: int = 64, rounds: int = 4, seed: int = 0):
    """Append ``shuffle_key`` (bijective Feistel permutation of the id —
    :func:`takco_ray.functions.hashing.feistel_permute`) and ``shard``
    (``shuffle_key mod num_shards``) columns — the deterministic epoch
    shuffle of a training-data loader.

    A pure stateless projection: no payload bytes move. Downstream either
    writes shard-partitioned output (each shard is a uniform pseudo-random
    sample, so readers stream shards in any order) or globally sorts by
    ``shuffle_key`` when a single shuffled sequence is required — the sort
    then shuffles 8-byte keys plus whatever columns the reader kept, and a
    reseed (new epoch) costs one cheap projection, never a re-shuffle of
    content. Bijectivity (vs a hash's collisions) makes the order stable
    under concurrent writers and engine-reproducible: a SQL twin generated
    from the same round constants reproduces every key bit-exactly.
    """
    from ..functions.hashing import feistel_permute

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col).combine_chunks(), dtype=np.int64)
        key = feistel_permute(ids, rounds=rounds, seed=seed)
        t = t.append_column("shuffle_key", pa.array(key, type=pa.int64()))
        return t.append_column(
            "shard", pa.array(key % num_shards, type=pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quantile_filter(ds, col: str, q: float = 0.25, keep: str = "ge"):
    """Filter rows against a GLOBAL exact quantile of ``col``.

    The global-statistic curation gate (drop the bottom-``q`` tail by
    length/quality, or the top tail with ``keep='le'``): one
    :func:`exact_quantiles` pass (only the value histogram shuffles)
    produces the threshold — a single scalar, taken on the driver under the
    small-side rule — and the second pass is a stateless vectorized filter.
    The input is consumed twice; callers holding an expensive upstream
    should checkpoint or ``materialize()`` it first (the TOML runner's
    stage checkpoints do this for free).

    DuckDB equivalence: ``WHERE col >= (SELECT quantile_disc(col, q) ...)``.
    """
    if keep not in ("ge", "le"):
        raise ValueError(f"keep must be 'ge' or 'le', got {keep!r}")
    row = exact_quantiles(ds, col, [q]).take_all()[0]
    thr = row[f"q{int(round(q * 100)):02d}"]

    def fn(t: pa.Table) -> pa.Table:
        c = t.column(col)
        mask = pc.greater_equal(c, thr) if keep == "ge" else pc.less_equal(c, thr)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def rollup_aggregate(ds, keys: list, value_col: str, sum_name: str = "value_sum",
                     total_label: str = "ALL"):
    """SUM + COUNT at every ROLLUP level of ``keys`` (finest → grand total).

    The reference reports per-group AND corpus-global metrics separately
    (``takco/evaluate/__init__.py:77-141``); SQL spells the combined shape
    ``GROUP BY ROLLUP(...)``. Distribution: only the FINEST level runs as a
    cluster-wide hash aggregate (map-side partials, one shuffle of distinct
    key combos); every coarser level is derived from that already-aggregated
    result — bounded by the finest group count (small-side rule), so no
    second pass over the input ever happens. Rolled-up key columns carry
    ``total_label`` (SQL twin: ``coalesce(k, 'ALL')`` over the ROLLUP) —
    a sentinel, not NULL, so sorts/hashes stay total-ordered downstream.

    ``value_col`` must already be integerized (int64) by the caller so sums
    are order-independent. Non-string key columns are cast to string in the
    output (the sentinel needs a total order with real values; SQL twin:
    ``coalesce(CAST(k AS VARCHAR), 'ALL')``).
    """
    from ray.data.aggregate import Count, Sum

    finest = (
        ds.groupby(list(keys))
        .aggregate(Sum(value_col), Count())
        .rename_columns({f"sum({value_col})": sum_name, "count()": "n_rows"})
    )

    def add_levels(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        for k in keys:
            if df[k].dtype != object:
                df[k] = df[k].astype(str)
        out = [df]
        for lvl in range(len(keys) - 1, -1, -1):
            gb = list(keys[:lvl])
            if gb:
                sub = df.groupby(gb, as_index=False, dropna=False)[
                    [sum_name, "n_rows"]
                ].sum()
            else:
                sub = pd.DataFrame(
                    {sum_name: [df[sum_name].sum()], "n_rows": [df["n_rows"].sum()]}
                )
            for k in keys[lvl:]:
                sub[k] = total_label
            out.append(sub[list(keys) + [sum_name, "n_rows"]])
        res = pd.concat(out, ignore_index=True)
        res[sum_name] = res[sum_name].astype("int64")
        res["n_rows"] = res["n_rows"].astype("int64")
        return pa.Table.from_pandas(res, preserve_index=False)

    # finest is distinct-key-combo sized; one task derives all levels
    return finest.repartition(1).map_batches(
        add_levels, batch_format="pyarrow", zero_copy_batch=True
    )


def grouped_mode(ds, group_col: str, value_col: str, num_partitions: int = 64):
    """Per-group most-frequent value, ties broken by smallest value (nulls
    last) — the reference's ``Counter.most_common(1)`` family (header
    voting, ``takco/cluster/cluster.py:692-700``) as a two-stage distributed
    op: a map-side (group, value) partial count shrinks batches to distinct
    pairs, then ONE grouped exchange hashed on the group lands every pair of
    a group in the same partition, where a vectorized segment argmax picks
    the mode for ALL groups at once — no per-group Python calls (the
    ``map_groups``-per-group shape measured ~50x slower at millions of
    groups elsewhere in this repo). Output: (group_col, mode, mode_n)."""
    from .groupmap import partitioned_group_map_any

    def _codes(arr: pa.Array) -> np.ndarray:
        enc = pc.dictionary_encode(arr)
        return (
            pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64),
            enc.dictionary,
        )

    def partial(t: pa.Table) -> pa.Table:
        sub = t.select([group_col, value_col])
        gc, _ = _codes(sub.column(group_col).combine_chunks())
        vc, _ = _codes(sub.column(value_col).combine_chunks())
        order = np.lexsort((vc, gc))
        gs, vs = gc[order], vc[order]
        first = (
            np.concatenate([[True], (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])])
            if len(gs)
            else np.zeros(0, dtype=bool)
        )
        starts = np.flatnonzero(first)
        cnts = np.diff(np.append(starts, len(gs)))
        out = sub.take(pa.array(order[starts], type=pa.int64()))
        return out.append_column("cnt", pa.array(cnts.astype(np.int64), type=pa.int64()))

    def pick_partition(g: pa.Table) -> pa.Table:
        grp = g.column(group_col).combine_chunks()
        val = g.column(value_col).combine_chunks()
        cnt = np.asarray(g.column("cnt").combine_chunks(), dtype=np.int64)
        gc, _gd = _codes(grp)
        vc, vd = _codes(val)
        # tie-break needs VALUE order, not code (first-appearance) order:
        # rank only the partition's small dictionary, gather per row
        if len(vd):
            sidx = pc.sort_indices(vd).to_numpy(zero_copy_only=False).astype(np.int64)
            rank_of = np.empty(len(vd), dtype=np.int64)
            rank_of[sidx] = np.arange(len(vd), dtype=np.int64)
            vrank = np.where(vc >= 0, rank_of[np.maximum(vc, 0)], len(vd))
        else:
            vrank = np.zeros(len(vc), dtype=np.int64)
        # sum duplicate (group, value) partials from different upstream
        # batches, then argmax per group = first row of each group under
        # (count desc, value-rank asc) — all one lexsort + reduceat
        order = np.lexsort((vrank, vc, gc))
        gs, vs, cs = gc[order], vc[order], cnt[order]
        first = (
            np.concatenate([[True], (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])])
            if len(gs)
            else np.zeros(0, dtype=bool)
        )
        pstarts = np.flatnonzero(first)
        psum = np.add.reduceat(cs, pstarts) if len(pstarts) else np.zeros(0, dtype=np.int64)
        pg = gs[pstarts]
        pvr = vrank[order][pstarts]
        prow = order[pstarts]
        order2 = np.lexsort((pvr, -psum, pg))
        g2 = pg[order2]
        gfirst = (
            np.concatenate([[True], g2[1:] != g2[:-1]]) if len(g2) else np.zeros(0, dtype=bool)
        )
        pick = order2[np.flatnonzero(gfirst)]
        sel = pa.array(prow[pick], type=pa.int64())
        return pa.table(
            {
                group_col: pc.take(grp, sel),
                "mode": pc.take(val, sel),
                "mode_n": pa.array(psum[pick], type=pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_group_map_any(partials, group_col, pick_partition, num_partitions)


def string_agg_per_group(ds, group_col: str, value_col: str, sep: str = ","):
    """Per-group sorted string concatenation (SQL ``string_agg(v, sep ORDER
    BY v)``) — the list-assembly aggregate. Sorting inside the group makes
    the result order-independent of block arrival, so it is deterministic
    across engines and cluster sizes. NULL values are skipped (SQL
    ``string_agg`` semantics); ``n_values`` counts the non-null values.
    One grouped exchange hashed on the group; inside each partition ONE
    Arrow sort arranges (group asc, value asc, nulls last) and a
    ``binary_join`` over offset-built list segments concatenates every
    group at once — no per-group Python calls.
    Output: (group_col, n_values, agg)."""
    from .groupmap import partitioned_group_map_any

    def agg_partition(g: pa.Table) -> pa.Table:
        tbl = g.select([group_col, value_col]).sort_by(
            [(group_col, "ascending"), (value_col, "ascending")]
        )
        grp = tbl.column(group_col).combine_chunks()
        val = tbl.column(value_col).combine_chunks()
        # equal groups are contiguous after the sort; boundaries via local
        # dictionary codes (null group = its own trailing segment)
        gc = (
            pc.fill_null(pc.dictionary_encode(grp).indices, -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = (
            np.concatenate([[0], np.flatnonzero(gc[1:] != gc[:-1]) + 1]).astype(np.int64)
            if len(gc)
            else np.zeros(0, dtype=np.int64)
        )
        valid = pc.is_valid(val)
        validn = valid.to_numpy(zero_copy_only=False).astype(np.int64)
        # nulls sort last within each group, so each group's kept values are
        # a contiguous run of the filtered array; offsets = kept-prefix sums
        cum = np.concatenate([[0], np.cumsum(validn)]).astype(np.int64)
        offs = cum[np.append(starts, len(gc))]
        lst = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()), val.filter(valid)
        )
        n_values = np.diff(offs)
        return pa.table(
            {
                group_col: pc.take(grp, pa.array(starts, type=pa.int64())),
                "n_values": pa.array(n_values, type=pa.int64()),
                "agg": pc.binary_join(lst, sep).cast(pa.string()),
            }
        )

    return partitioned_group_map_any(ds.select_columns([group_col, value_col]),
                                     group_col, agg_partition)


def quantile_cont_scaled(ds, col: str, q_num: int, q_den: int, out_name: str):
    """Interpolated (``quantile_cont``-style) quantile in EXACT integer
    arithmetic.

    ``col`` must be an integerized int64 column (e.g. cents). The continuous
    quantile sits at 0-based position ``(n−1)·q`` between order statistics
    ``lo = x[k]`` and ``hi = x[min(k+1, n−1)]`` with ``k = ⌊(n−1)·q⌋``;
    expressing q as ``q_num/q_den`` keeps everything integral:

        out = lo·(q_den − rem) + hi·rem,   rem = (n−1)·q_num mod q_den

    i.e. the quantile scaled by ``q_den`` — bit-exact in both engines, no
    float interpolation to round. Distribution is the histogram route of
    :func:`exact_quantiles`: only distinct values shuffle, the cumsum walk
    runs on that tiny table."""
    if q_den < 1 or not (0 <= q_num <= q_den):
        raise ValueError(f"need 0 <= q_num <= q_den, got {q_num}/{q_den}")
    hist = value_histogram(ds, col)

    def pick(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("value").combine_chunks(), dtype=np.float64)
        c = np.asarray(t.column("cnt").combine_chunks(), dtype=np.int64)
        if len(v) and np.abs(v).max() >= 2.0**53:
            # the histogram route floats the values; beyond float64's exact
            # integer range distinct values can collapse — refuse loudly
            raise ValueError(
                "quantile_cont_scaled requires |values| < 2^53 "
                "(float64-exact); rescale or bucket first"
            )
        order = np.argsort(v, kind="stable")
        v, c = v[order].astype(np.int64), c[order]
        cum = np.cumsum(c)
        n = int(cum[-1]) if len(cum) else 0
        if n == 0:
            return pa.table({out_name: pa.array([None], type=pa.int64())})
        pos = (n - 1) * q_num
        k, rem = pos // q_den, pos % q_den
        lo = int(v[np.searchsorted(cum, k + 1)])
        hi = int(v[np.searchsorted(cum, min(k + 1, n - 1) + 1)])
        return pa.table(
            {out_name: pa.array([lo * (q_den - rem) + hi * rem], type=pa.int64())}
        )

    return hist.repartition(1).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


def dense_rank(ds, col: str, out_col: str = "rank", descending: bool = False,
               num_buckets: int = 256):
    """Global ``dense_rank()`` over ``col`` as a distributed window op.

    No global row sort: (1) the distinct-value relation is built by a hash
    aggregate (shuffles distinct values only); (2) values are RANGE-bucketed
    by fixed-width intervals between the global min/max, and only the
    ``num_buckets`` per-bucket distinct counts reach the driver for an
    exclusive prefix sum (the pack_sequences prefix-scan shape); (3) one
    grouped pass per bucket assigns rank = bucket offset + local sorted
    position; (4) a hash join attaches ranks back to the input rows.
    Value skew concentrates distinct values in few buckets — raise
    ``num_buckets`` (cheap: the driver table stays tiny) if the
    distinct-value distribution is lumpy.

    ``col`` must be int64 (integerize decimals first — cents/micro-units)
    so the rank join key is exact and engine-independent."""
    from .groupmap import partitioned_group_map, segment_boundaries

    sign = -1 if descending else 1
    distinct = value_histogram(ds, col).drop_columns(["cnt"]).materialize()

    from ray.data.aggregate import Count, Max, Min

    mm = distinct.aggregate(Min("value"), Max("value"))
    if max(abs(mm["min(value)"]), abs(mm["max(value)"])) >= 2.0**53:
        # the distinct-value histogram floats the values; beyond float64's
        # exact integer range distinct int64s collapse and the rank join
        # would silently drop rows — refuse loudly instead
        raise ValueError(
            "dense_rank requires |values| < 2^53 (float64-exact); "
            "rescale or bucket first"
        )
    vmin, vmax = sign * mm["min(value)"], sign * mm["max(value)"]
    if descending:
        vmin, vmax = min(vmin, vmax), max(vmin, vmax)
    width = (vmax - vmin) / num_buckets or 1.0

    def add_bucket(t: pa.Table) -> pa.Table:
        v = sign * np.asarray(t.column("value").combine_chunks(), dtype=np.float64)
        b = np.clip(((v - vmin) / width).astype(np.int64), 0, num_buckets - 1)
        return pa.table(
            {"value": pc.cast(t.column("value"), pa.int64()),
             "bucket": pa.array(b, type=pa.int64())}
        )

    bucketed = distinct.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    per_bucket = {
        int(r["bucket"]): int(r["count()"])
        for r in bucketed.groupby("bucket").aggregate(Count()).take_all()
    }
    offsets = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]

    def assign(g: pa.Table) -> pa.Table:
        b = np.asarray(g.column("bucket").combine_chunks(), dtype=np.int64)
        v = np.asarray(g.column("value").combine_chunks(), dtype=np.int64)
        ranks = np.empty(len(v), dtype=np.int64)
        for s in segment_boundaries(b):
            e = int(np.searchsorted(b, b[s], side="right"))
            seg = slice(int(s), e)
            order = np.argsort(sign * v[seg], kind="stable")
            r = np.empty(len(order), dtype=np.int64)
            r[order] = np.arange(len(order))
            ranks[seg] = offsets[int(b[s])] + 1 + r
        return pa.table(
            {"value": pa.array(v, type=pa.int64()),
             out_col: pa.array(ranks, type=pa.int64())}
        )

    ranks = partitioned_group_map(bucketed, "bucket", assign,
                                  num_partitions=min(64, num_buckets))

    from ..util import default_join_partitions, join_remote_args

    jparts = default_join_partitions()
    return ds.join(
        ranks,
        join_type="inner",
        num_partitions=jparts,
        on=(col,),
        right_on=("value",),
        aggregator_ray_remote_args=join_remote_args(jparts),
    )


def comoment_sums(ds, xcol: str, ycol: str):
    """Exact one-pass co-moment aggregation: n, Σx, Σy, Σx², Σy², Σxy as
    int64 — the distributed building block for covariance / Pearson
    correlation. ``xcol``/``ycol`` must be integerized int64 columns small
    enough that the squared sums fit int64 (caller's contract; numpy wraps
    silently). Per-batch partials reduce each block to ONE 48-byte row, so
    the final combine is metadata-sized regardless of input size."""

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t.column(xcol).combine_chunks(), dtype=np.int64)
        y = np.asarray(t.column(ycol).combine_chunks(), dtype=np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sum_x": pa.array([int(x.sum())], type=pa.int64()),
                "sum_y": pa.array([int(y.sum())], type=pa.int64()),
                "sum_xx": pa.array([int((x * x).sum())], type=pa.int64()),
                "sum_yy": pa.array([int((y * y).sum())], type=pa.int64()),
                "sum_xy": pa.array([int((x * y).sum())], type=pa.int64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        cols = {}
        for name in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"):
            arr = np.asarray(t.column(name).combine_chunks(), dtype=np.int64)
            cols[name] = pa.array([int(arr.sum())], type=pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
    )


def heavy_hitters(ds, col: str, k: int = 16, num_sketch: int = 256):
    """Approximate frequent items (Misra-Gries / space-saving): the
    bounded-memory scale path beside the exact groupby top-k
    (``textstats.global_token_topk``).

    Each batch reduces to an exact (value, count) relation, then compresses
    to ≤ ``num_sketch`` counters with :func:`~takco_ray.functions.sketch.
    mg_compress` — so at most ``num_sketch × blocks`` tiny rows ever leave
    the map side, regardless of value cardinality (exact top-k shuffles
    every distinct value). Each batch also emits ONE sentinel row
    (value = NULL) carrying the undercount bound its compression
    introduced. One final task sums counters, sums the sentinel bounds,
    re-compresses, and emits the top ``k``.

    Output: (value, est_count, err_bound) — top ``k`` by est desc, ties by
    value asc. ``est_count`` undercounts the true frequency by at most
    ``err_bound``, and any value with true frequency > ``err_bound`` is
    guaranteed present (the Misra-Gries guarantee, quantified per run
    instead of hidden). When every batch has ≤ ``num_sketch`` distinct
    values the sketch is EXACT (err_bound = 0) — the regime the SQL oracle
    pins; the lossy regime is pytest-bounded against exact counts."""
    from ..functions.sketch import mg_compress

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        vtype = t.schema.field(col).type
        codes, uniq = pd.factorize(t.column(col).to_pandas())
        cnts = np.bincount(codes[codes >= 0]).astype(np.int64)
        keys = np.asarray(uniq, dtype=object)
        keys, cnts, err = mg_compress(keys, cnts, num_sketch)
        return pa.table(
            {
                "value": pa.array(list(keys) + [None], type=vtype),
                "cnt": pa.array(np.append(cnts, 0), type=pa.int64()),
                "batch_err": pa.array(
                    np.append(np.zeros(len(keys), dtype=np.int64), err),
                    type=pa.int64(),
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        vtype = t.schema.field("value").type
        df = t.to_pandas()
        agg = df.dropna(subset=["value"]).groupby("value", as_index=False)["cnt"].sum()
        total_err = int(df.loc[df["value"].isna(), "batch_err"].sum())
        keys = np.asarray(agg["value"], dtype=object)
        cnts = np.asarray(agg["cnt"], dtype=np.int64)
        keys, cnts, extra = mg_compress(keys, cnts, num_sketch)
        total_err += int(extra)
        # est-count ties break by value ASC in the value's native order when
        # the column is numeric (string order would put 10 before 9); only
        # mixed/object keys fall back to lexicographic order.
        if pa.types.is_integer(vtype):
            tie = keys.astype(np.int64)
        elif pa.types.is_floating(vtype):
            tie = keys.astype(np.float64)
        else:
            tie = keys.astype(str)
        order = np.lexsort((tie, -cnts))[:k]
        return pa.table(
            {
                "value": pa.array(list(keys[order]), type=vtype),
                "est_count": pa.array(cnts[order], type=pa.int64()),
                "err_bound": pa.array(
                    np.full(len(order), total_err, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)
    )


def global_row_number(ds, value_col: str, id_col: str, out_col: str = "rn",
                      num_buckets: int = 256):
    """Global 0-based ``row_number() OVER (ORDER BY value, id)`` as a
    distributed window op — no global sort of payload rows.

    Same prefix-scan shape as :func:`dense_rank`, but over the full
    (value, id) relation instead of distinct values: rows range-bucket by
    fixed-width value intervals, only the ``num_buckets`` per-bucket row
    counts reach the driver for an exclusive prefix sum, and one grouped
    pass per bucket sorts (value, id) and assigns rank = bucket offset +
    local position. The (value, id) relation is 16 B/row; join the result
    back by ``id_col`` to attach other columns. Ties are impossible by
    construction (id breaks them), so the rank is engine-reproducible.

    ``value_col`` must be int64 (integerize decimals first)."""
    from .groupmap import partitioned_group_map, segment_boundaries
    from ray.data.aggregate import Count, Max, Min

    mm = ds.aggregate(Min(value_col), Max(value_col))
    vmin, vmax = mm[f"min({value_col})"], mm[f"max({value_col})"]
    span = int(vmax) - int(vmin)  # Python int: never wraps
    width = max(1, (span + num_buckets) // num_buckets)
    # int64 `v - vmin` wraps when the value span exceeds 2^63 (hash-derived
    # ids hit this), producing non-monotone buckets and silently wrong row
    # numbers. Above a conservative threshold, bucket via float64 instead:
    # floor((v - vmin)/width) in float is monotone in v for a fixed positive
    # divisor, which is all correctness needs (final rank sorts exactly by
    # (value, id) inside each bucket).
    wide_span = span >= 2 ** 62

    def add_bucket(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(value_col).combine_chunks(), dtype=np.int64)
        if wide_span:
            bf = (v.astype(np.float64) - float(vmin)) / float(width)
            b = np.clip(bf.astype(np.int64), 0, num_buckets - 1)
        else:
            b = np.clip((v - vmin) // width, 0, num_buckets - 1)
        return pa.table(
            {
                "value": pa.array(v, type=pa.int64()),
                "id": t.column(id_col).cast(pa.int64()),
                "bucket": pa.array(b, type=pa.int64()),
            }
        )

    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    per_bucket = {
        int(r["bucket"]): int(r["count()"])
        for r in bucketed.groupby("bucket").aggregate(Count()).take_all()
    }
    offsets = {}
    acc = 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]

    def assign(g: pa.Table) -> pa.Table:
        b = np.asarray(g.column("bucket").combine_chunks(), dtype=np.int64)
        v = np.asarray(g.column("value").combine_chunks(), dtype=np.int64)
        i = np.asarray(g.column("id").combine_chunks(), dtype=np.int64)
        rn = np.empty(len(v), dtype=np.int64)
        for s in segment_boundaries(b):
            e = int(np.searchsorted(b, b[s], side="right"))
            seg = slice(int(s), e)
            order = np.lexsort((i[seg], v[seg]))
            r = np.empty(len(order), dtype=np.int64)
            r[order] = np.arange(len(order))
            rn[seg] = offsets[int(b[s])] + r
        return pa.table(
            {
                "id": pa.array(i, type=pa.int64()),
                "value": pa.array(v, type=pa.int64()),
                out_col: pa.array(rn, type=pa.int64()),
            }
        )

    return partitioned_group_map(bucketed, "bucket", assign,
                                 num_partitions=min(64, num_buckets))


def ntile_from_rn(rn: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 0-based global row numbers: the first ``n mod k``
    tiles get ``⌈n/k⌉`` rows, the rest ``⌊n/k⌋`` (exact SQL semantics)."""
    small = n // k
    n_big = n % k
    cut = n_big * (small + 1)
    tile = np.where(
        rn < cut,
        rn // (small + 1) if small + 1 > 0 else 0,
        n_big + np.maximum(rn - cut, 0) // max(small, 1),
    )
    return tile.astype(np.int64) + 1


def skew_join(left, right, on: str, right_on: str | None = None,
              hot_threshold: int = 100_000, num_partitions: int | None = None):
    """Skew-aware inner equi-join: HOT keys take a broadcast path, cold
    keys the normal hash-shuffle join — the join-side twin of the blocking
    stage's salted band groupby (north rule: explicit skew handling).

    A plain hash join routes every row of a hot key to ONE partition — a
    single vendored-file key with 10⁸ rows becomes one straggler task no
    matter how many partitions the cluster has. Here:

    1. one count aggregate over the RIGHT side's keys finds keys with
       > ``hot_threshold`` right rows; the hot-key list is bounded by
       ``|right| / hot_threshold`` — driver-safe by construction;
    2. right rows of hot keys are collected and broadcast via ``ray.put``;
       the hot ROW count is checked against ``hot_threshold × 64`` and the
       op raises rather than silently collecting an unbounded side
       (caller raises ``hot_threshold`` or pre-aggregates);
    3. both inputs split by a vectorized broadcast membership probe: cold
       rows flow through the native hash join, hot left rows join against
       the broadcast Arrow table INSIDE map_batches (``pa.Table.join``,
       Acero hash join per batch — no shuffle, no pandas round-trip,
       every worker joins its own slice);
    4. the two streams union under one explicit column projection.
       Same result as a plain join, no straggler task.
    """
    import ray

    from ..util import default_join_partitions
    from ray.data.aggregate import Count

    rk = right_on or on
    parts = num_partitions or default_join_partitions()
    out_cols = list(left.schema().names) + [
        c for c in right.schema().names if c != rk
    ]

    from ray.data.aggregate import Sum

    counts = right.groupby(rk).aggregate(Count()).rename_columns(
        {"count()": "cnt"}
    ).materialize()
    hot_keys = [
        r[rk]
        for r in counts.filter(expr=f"cnt > {int(hot_threshold)}").take_all()
        # a NULL key group stays on the cold path, where the inner hash
        # join drops it (SQL semantics); None would also break np.sort
        if r[rk] is not None
    ]

    if not hot_keys:
        from ..util import join_remote_args

        return left.join(
            right, join_type="inner", num_partitions=parts,
            on=(on,), right_on=(rk,),
            aggregator_ray_remote_args=join_remote_args(parts),
        ).select_columns(out_cols)

    # cold RIGHT row total, from the counts relation already in hand: when
    # every key is hot the cold inner join is provably empty — skip it
    # (joining two fully-empty streams also trips Ray's schema-less-empty-
    # block handling in the hash-shuffle join finalizer)
    cold_sum = counts.filter(expr=f"cnt <= {int(hot_threshold)}").aggregate(Sum("cnt"))
    cold_right_rows = int(cold_sum["sum(cnt)"] or 0)

    hot_arr_ref = ray.put(np.sort(np.asarray(hot_keys)))

    def split(col: str, keep_hot: bool):
        def fn(t: pa.Table):
            keys = np.asarray(t.column(col).combine_chunks())
            mask = np.isin(keys, ray.get(hot_arr_ref))
            return t.filter(pa.array(mask if keep_hot else ~mask))

        return fn

    hot_right = right.map_batches(
        split(rk, True), batch_format="pyarrow", zero_copy_batch=True
    )
    n_hot_rows = hot_right.count()
    if n_hot_rows > hot_threshold * 64:
        raise ValueError(
            f"skew_join hot side has {n_hot_rows} rows (> threshold×64); "
            "raise hot_threshold or pre-aggregate the right side"
        )
    hot_tbl = pa.concat_tables(
        hot_right.iter_batches(batch_format="pyarrow", batch_size=None)
    ).combine_chunks()
    hot_ref = ray.put(hot_tbl)

    cold_joined = None
    if cold_right_rows:
        from ..util import join_remote_args

        cold_joined = left.map_batches(
            split(on, False), batch_format="pyarrow", zero_copy_batch=True
        ).join(
            right.map_batches(split(rk, False), batch_format="pyarrow", zero_copy_batch=True),
            join_type="inner", num_partitions=parts, on=(on,), right_on=(rk,),
            aggregator_ray_remote_args=join_remote_args(parts),
        ).select_columns(out_cols)

    def bcast_join(t: pa.Table) -> pa.Table:
        rt = ray.get(hot_ref)  # zero-copy plasma view
        out = t.join(rt, keys=[on], right_keys=[rk], join_type="inner")
        return out.select(out_cols)

    hot_joined = left.map_batches(
        split(on, True), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(bcast_join, batch_format="pyarrow", zero_copy_batch=True)

    if cold_joined is None:
        return hot_joined
    return cold_joined.union(hot_joined)


def bloom_semi_join(left, right, on: str, right_on: str | None = None,
                    bits_per_key: int = 10, num_partitions: int | None = None,
                    expected_right_keys: int | None = None):
    """EXACT semi-join with a Bloom pre-filter — the shuffle-volume
    optimization for "big probe side, selective build side" (the
    decontamination / novelty shape at corpus scale).

    A plain semi-join shuffles EVERY left row; here the right side's keys
    build a Bloom filter distributed (per-batch partial bitmaps, one
    bitwise-OR merge — associative, so block retries are harmless), the
    ~n·bits_per_key/8-byte bitmap broadcasts once via ``ray.put``, and a
    stateless vectorized probe drops definite non-matches map-side. Bloom
    false positives (~0.8 % at 10 bits/key) survive the probe, so the
    pruned remainder still rides the native hash semi-join — the result is
    exactly the plain semi-join, with only matches + ε of the probe side
    ever entering the exchange.

    The right side is materialized once up front (it is the SMALL side by
    assumption — same rule as every broadcast): its count sizes the filter
    (override with ``expected_right_keys``), the bitmap build reads it, and
    the final semi-join reads it again — one execution of any upstream
    pipeline, not three. An empty right side returns an empty result
    without touching the probe side. Keys must be int64.
    """
    import ray

    from ..functions.sketch import bloom_build, bloom_params, bloom_probe
    from ..util import default_join_partitions

    rk = right_on or on
    parts = num_partitions or default_join_partitions()
    right = right.materialize()
    n_right = right.count()  # metadata-cheap on a materialized dataset
    if n_right == 0:
        return left.limit(0)
    n_keys = expected_right_keys or n_right
    n_bits, k = bloom_params(n_keys, bits_per_key)

    def partial_bitmap(t: pa.Table) -> pa.Table:
        keys = np.asarray(t.column(rk).combine_chunks(), dtype=np.int64)
        bm = bloom_build(keys, n_bits, k)
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.binary())})

    def or_merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_bits // 64, dtype=np.uint64)
        for buf in t.column("bm").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"bm": pa.array([acc.tobytes()], type=pa.binary())})

    merged = (
        right.map_batches(partial_bitmap, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(or_merge, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()[0]["bm"]
    )
    bm_ref = ray.put(np.frombuffer(merged, dtype=np.uint64))

    def probe(t: pa.Table) -> pa.Table:
        keys = np.asarray(t.column(on).combine_chunks(), dtype=np.int64)
        hit = bloom_probe(ray.get(bm_ref), keys, k)
        return t.filter(pa.array(hit))

    pruned = left.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    return semi_join(pruned, right, on=on, right_on=rk, num_partitions=parts)


def sketch_quantiles(ds, col: str, qs: list, cap: int = 4096):
    """Mergeable deterministic quantile sketch (KLL-style, parity
    compaction) — the UNBOUNDED-cardinality companion to
    :func:`exact_quantiles`, completing the sketch family (HLL distincts,
    Bloom membership, Misra-Gries frequencies, KLL quantiles).

    Each batch compresses its values to ≤ ``cap`` weighted points
    (`functions.sketch.kll_compress`); one final task concatenates the
    partial sketches, re-compresses, and reads the requested quantiles off
    the weighted CDF. Shuffle volume is ≤ ``cap × blocks`` 16-byte points
    regardless of value cardinality — where the exact histogram route
    shuffles every distinct value. When no compaction triggers (total
    points ≤ cap) the sketch IS ``quantile_disc`` — the regime the SQL
    oracle pins; the lossy regime's rank error is pytest-bounded.

    Deterministic by construction (parity bit instead of KLL's coin flip):
    engines, retries and cluster sizes agree bit-for-bit on the estimate.
    """
    from ..functions.sketch import kll_compress, kll_quantile

    if cap < 8:
        raise ValueError(f"cap must be >= 8 (got {cap}); tiny caps degrade to noise")

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(col).combine_chunks(), dtype=np.float64)
        v = v[~np.isnan(v)]
        w = np.ones(len(v), dtype=np.int64)
        v, w = kll_compress(v, w, cap)
        return pa.table(
            {"value": pa.array(v, type=pa.float64()),
             "weight": pa.array(w, type=pa.int64())}
        )

    def final(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("value").combine_chunks(), dtype=np.float64)
        w = np.asarray(t.column("weight").combine_chunks(), dtype=np.int64)
        v, w = kll_compress(v, w, cap)
        cols = {}
        for q in qs:
            cols[f"q{int(round(q * 100)):02d}"] = pa.array(
                [kll_quantile(v, w, q)], type=pa.float64()
            )
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
    )


def percent_rank_scaled(ds, value_col: str, id_col: str, scale: int = 1_000_000,
                        num_buckets: int = 256):
    """Global ``percent_rank()`` as exact scaled integers: rank·scale //
    (n−1) over the tie-free order (value, id) — no float division to round
    differently across engines. Built on :func:`global_row_number` (range-
    bucket prefix scan; only per-bucket counts on the driver). Output:
    (id, value, pr_scaled)."""
    rn = global_row_number(ds, value_col, id_col, out_col="rn",
                           num_buckets=num_buckets).materialize()
    n = rn.count()

    def fin(t: pa.Table) -> pa.Table:
        r = np.asarray(t.column("rn").combine_chunks(), dtype=np.int64)
        pr = (r * np.int64(scale)) // max(n - 1, 1)
        return pa.table(
            {
                "id": t.column("id").cast(pa.int64()),
                "value": t.column("value").cast(pa.int64()),
                "pr_scaled": pa.array(pr, type=pa.int64()),
            }
        )

    return rn.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def grouped_quantile_cont(ds, col: str, group_col: str, q_num: int, q_den: int,
                          out_name: str = "qcont_scaled"):
    """Per-group INTERPOLATED quantile in exact integer arithmetic — the
    grouped form of :func:`quantile_cont_scaled` (result scaled by
    ``q_den``). Same (group, value) histogram route as
    :func:`grouped_quantiles`: only distinct pairs shuffle, each group's
    cumsum/interpolation walk runs on its tiny histogram. ``col`` must be
    int64 with |values| < 2^53."""
    from ray.data.aggregate import Sum

    if q_den < 1 or not (0 <= q_num <= q_den):
        raise ValueError(f"need 0 <= q_num <= q_den, got {q_num}/{q_den}")

    def partial(t: pa.Table) -> pa.Table:
        grp = t.column(group_col).combine_chunks()
        enc = pc.dictionary_encode(grp)
        codes = np.asarray(enc.indices, dtype=np.int64)
        v = np.asarray(t.column(col).combine_chunks(), dtype=np.float64)
        order = np.lexsort((v, codes))
        cs, vs = codes[order], v[order]
        first = (
            np.concatenate([[True], (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])])
            if len(cs)
            else np.zeros(0, dtype=bool)
        )
        starts = np.flatnonzero(first)
        cnts = np.diff(np.append(starts, len(cs)))
        return pa.table(
            {
                group_col: pc.take(grp, pa.array(order[starts], type=pa.int64())),
                "value": pa.array(vs[starts], type=pa.float64()),
                "cnt": pa.array(cnts.astype(np.int64), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "value"])
        .aggregate(Sum("cnt"))
        .rename_columns({"sum(cnt)": "cnt"})
    )

    def pick(g: pa.Table) -> pa.Table:
        v = np.asarray(g.column("value").combine_chunks(), dtype=np.float64)
        c = np.asarray(g.column("cnt").combine_chunks(), dtype=np.int64)
        if len(v) and np.abs(v).max() >= 2.0**53:
            raise ValueError(
                "grouped_quantile_cont requires |values| < 2^53 (float64-exact)"
            )
        order = np.argsort(v, kind="stable")
        v, c = v[order].astype(np.int64), c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        pos = (n - 1) * q_num
        k, rem = pos // q_den, pos % q_den
        lo = int(v[np.searchsorted(cum, k + 1)])
        hi = int(v[np.searchsorted(cum, min(k + 1, n - 1) + 1)])
        return pa.table(
            {
                group_col: g.column(group_col).slice(0, 1),
                out_name: pa.array([lo * (q_den - rem) + hi * rem], type=pa.int64()),
            }
        )

    return hist.groupby(group_col).map_groups(pick, batch_format="pyarrow")
