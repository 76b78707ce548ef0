"""Cluster-evaluation report operator.

The reference computes micro P/R/F1 on the driver after collecting all
tables (``takco/evaluate/__init__.py:77-141``, ``score.py:8-40``). Here the
pairwise clustering metrics are computed from CONTINGENCY COUNTS — pairwise
TP = Σ C(n_cg, 2) over (cluster, gold) cells, predicted pairs = Σ C(n_c, 2),
gold pairs = Σ C(n_g, 2) — so no pair set is ever materialized: two grouped
passes over 16-byte label rows, partial-summed per partition, finished on
the driver. Usable as a pipeline stage on any run, not just inside pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .groupmap import partitioned_group_map, segment_boundaries

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _pairs_of(counts: np.ndarray) -> int:
    c = counts.astype(np.float64)
    return int((c * (c - 1) / 2).sum())


def score_clusters(
    labels,
    gold,
    id_column: str = "file_id",
    label_column: str = "cluster_id",
    gold_column: str = "entity_id",
    num_partitions: int | None = None,
):
    """Pairwise precision/recall/F1 of ``labels`` vs ``gold`` → 1-row Dataset.

    ``labels``: Dataset with (id_column, label_column); ``gold``: Dataset
    with (id_column, gold_column). Ids present in only one side are ignored
    (inner join). Output row: n_items, pred_pairs, gold_pairs, tp_pairs,
    precision, recall, f1.
    """
    if num_partitions is None:
        # the hash-join spawns one aggregator actor per partition; more
        # partitions than CPUs deadlocks a small cluster
        import ray as _ray

        num_partitions = max(2, min(16, int(_ray.cluster_resources().get("CPU", 4))))
    from ..util import join_remote_args

    joined = labels.select_columns([id_column, label_column]).join(
        gold.select_columns([id_column, gold_column]),
        join_type="inner",
        num_partitions=num_partitions,
        on=(id_column,),
        aggregator_ray_remote_args=join_remote_args(num_partitions),
    )

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": t.column(label_column).cast(pa.int64()),
                "g": t.column(gold_column).cast(pa.int64()),
            }
        )

    cg = joined.map_batches(slim, batch_format="pyarrow")

    def by_cluster(part: pa.Table) -> pa.Table:
        """Partition groups whole clusters → pred-pair AND tp-pair partials."""
        c = np.asarray(part.column("c").combine_chunks(), dtype=np.int64)
        g = np.asarray(part.column("g").combine_chunks(), dtype=np.int64)
        order = np.lexsort((g, c))
        c, g = c[order], g[order]
        starts_c = segment_boundaries(c)
        n_c = np.diff(np.append(starts_c, len(c)))
        both = np.concatenate([[True], (c[1:] != c[:-1]) | (g[1:] != g[:-1])]) if len(c) else np.zeros(0, bool)
        starts_cg = np.flatnonzero(both)
        n_cg = np.diff(np.append(starts_cg, len(c)))
        return pa.table(
            {
                "n_items": pa.array([len(c)], type=pa.int64()),
                "pred_pairs": pa.array([_pairs_of(n_c)], type=pa.int64()),
                "tp_pairs": pa.array([_pairs_of(n_cg)], type=pa.int64()),
            }
        )

    def by_gold(part: pa.Table) -> pa.Table:
        g = np.asarray(part.column("g").combine_chunks(), dtype=np.int64)
        starts = segment_boundaries(np.sort(g))
        n_g = np.diff(np.append(starts, len(g)))
        return pa.table({"gold_pairs": pa.array([_pairs_of(n_g)], type=pa.int64())})

    part1 = partitioned_group_map(cg, "c", by_cluster, num_partitions)
    part2 = partitioned_group_map(cg, "g", by_gold, num_partitions)

    n_items = pred = tp = 0
    for r in part1.take_all():
        n_items += int(r["n_items"])
        pred += int(r["pred_pairs"])
        tp += int(r["tp_pairs"])
    gold_pairs = sum(int(r["gold_pairs"]) for r in part2.take_all())

    precision = tp / pred if pred else 1.0
    recall = tp / gold_pairs if gold_pairs else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    # Adjusted Rand Index from the same pair counts (Hubert & Arabie 1985):
    # (tp − E[tp]) / (max_index − E[tp]) with E[tp] = pred·gold / C(n,2)
    total_pairs = n_items * (n_items - 1) / 2
    if total_pairs > 0:
        expected = pred * gold_pairs / total_pairs
        max_index = (pred + gold_pairs) / 2
        ari = (tp - expected) / (max_index - expected) if max_index != expected else 1.0
    else:
        ari = 1.0
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n_items], type=pa.int64()),
                "pred_pairs": pa.array([pred], type=pa.int64()),
                "gold_pairs": pa.array([gold_pairs], type=pa.int64()),
                "tp_pairs": pa.array([tp], type=pa.int64()),
                "precision": pa.array([round(precision, 6)], type=pa.float64()),
                "recall": pa.array([round(recall, 6)], type=pa.float64()),
                "f1": pa.array([round(f1, 6)], type=pa.float64()),
                "ari": pa.array([round(ari, 6)], type=pa.float64()),
            }
        )
    )


def score_annotations(
    pred,
    gold,
    target_cols: list[str],
    label_col: str = "uri",
    only_annotated: bool = False,
    any_annotated: bool = False,
    num_partitions: int | None = None,
):
    """Annotation-set P/R/F1 — the reference's ``classification`` scorer
    (``takco/evaluate/score.py:8-40``) over (target..., label) keys,
    distributed.

    ``pred`` and ``gold`` are Datasets of annotation keys: ``target_cols``
    identify the annotated unit (cell = (table, col, row); property =
    (table, from_col, to_col); class = (table, col)) and ``label_col`` the
    asserted URI. Standard mode counts per (target, label) key: TP =
    key in both, FP = pred only, FN = gold only.

    ``only_annotated``: restrict to targets with at least one gold label
    (the reference's unannotated-target exclusion). ``any_annotated``:
    collapse each target to at most one TP ("some prediction is right"),
    one FP ("predictions exist, none right"), and one FN ("no prediction
    at all") — multiple right answers per target count once
    (``score.py:20-26``).

    Shape: one full-outer hash join on the composite key, then a per-target
    grouped reduction (max of three flags) — no annotation set ever sits on
    the driver. Returns a 1-row Dataset (tp, fp, fn, precision, recall,
    f1).
    """
    import pyarrow.compute as pc
    import ray as _ray

    from ..util import default_join_partitions, join_remote_args

    target_cols = list(target_cols)
    key_cols = target_cols + [label_col]
    parts = num_partitions or default_join_partitions()

    def tag(flag_name):
        def fn(t: pa.Table) -> pa.Table:
            cols = {c: t.column(c) for c in key_cols}
            cols[flag_name] = pa.array(
                np.ones(t.num_rows, dtype=np.int8), type=pa.int8()
            )
            return pa.table(cols)

        return fn

    p = pred.map_batches(tag("__p"), batch_format="pyarrow", zero_copy_batch=True)
    g = gold.map_batches(tag("__g"), batch_format="pyarrow", zero_copy_batch=True)

    # one side empty: Ray's hash join cannot build schemaless empty
    # partitions, and the counts are directly computable anyway
    p = p.materialize()
    g = g.materialize()
    n_p, n_g = p.count(), g.count()
    if n_p == 0 or n_g == 0:
        def n_targets(ds, n_rows):
            return ds.groupby(target_cols).count().count() if n_rows else 0

        if n_p == 0 and n_g == 0:
            tp = fp = fn = 0
        elif n_p == 0:  # everything gold is unpredicted
            tp = fp = 0
            fn = n_targets(g, n_g) if any_annotated else n_g
        else:  # no gold: every prediction is wrong, unless sliced away
            tp = fn = 0
            if only_annotated:
                fp = 0
            elif any_annotated:
                fp = n_targets(p, n_p)
            else:
                fp = n_p
        return _annotation_report(tp, fp, fn)

    joined = p.join(
        g,
        join_type="full_outer",
        num_partitions=parts,
        on=tuple(key_cols),
        aggregator_ray_remote_args=join_remote_args(parts),
    )

    def flags(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:  # schemaless empty partition
            return pa.schema(
                [(c, pa.string()) for c in target_cols]
                + [("__isp", pa.int64()), ("__isg", pa.int64()),
                   ("__tp", pa.int64())]
            ).empty_table()
        isp = pc.cast(pc.is_valid(t.column("__p")), pa.int64())
        isg = pc.cast(pc.is_valid(t.column("__g")), pa.int64())
        cols = {c: pc.cast(t.column(c), pa.string()) for c in target_cols}
        cols["__isp"] = isp
        cols["__isg"] = isg
        cols["__tp"] = pc.multiply(isp, isg)
        return pa.table(cols)

    flat = joined.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)

    if not (only_annotated or any_annotated):
        agg = flat.sum(["__isp", "__isg", "__tp"]) or {}
        n_pred = int(agg.get("sum(__isp)") or 0)
        n_gold = int(agg.get("sum(__isg)") or 0)
        tp = int(agg.get("sum(__tp)") or 0)
        fp, fn = n_pred - tp, n_gold - tp
    else:
        per_target = flat.groupby(target_cols).max(["__isp", "__isg", "__tp"])

        def target_counts(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                z = pa.array([0], type=pa.int64())
                return pa.table({"tp": z, "fp": z, "fn": z})
            anyp = np.asarray(t.column("max(__isp)"), dtype=np.int64)
            anyg = np.asarray(t.column("max(__isg)"), dtype=np.int64)
            anytp = np.asarray(t.column("max(__tp)"), dtype=np.int64)
            keep = anyg > 0 if only_annotated else np.ones(len(anyp), dtype=bool)
            anyp, anyg, anytp = anyp[keep], anyg[keep], anytp[keep]
            # reached only in any_annotated mode (score.py:20-26): one
            # tp / fp / fn per target at most
            tp_ = int(anytp.sum())
            fp_ = int(((anyp > 0) & (anytp == 0)).sum())
            fn_ = int((anyp == 0).sum())  # no-pred targets exist via gold keys
            return pa.table(
                {
                    "tp": pa.array([tp_], type=pa.int64()),
                    "fp": pa.array([fp_], type=pa.int64()),
                    "fn": pa.array([fn_], type=pa.int64()),
                }
            )

        if only_annotated and not any_annotated:
            # key-level counts restricted to gold-bearing targets: re-join
            # the per-target gold flag onto the key rows via a grouped pass
            from .groupmap import partitioned_group_map_any

            def key_with_target(t: pa.Table) -> pa.Table:
                k = t.column(target_cols[0]).cast(pa.string())
                for c in target_cols[1:]:
                    k = pc.binary_join_element_wise(
                        k, pc.cast(t.column(c), pa.string()), "\x00"
                    )
                return pa.table(
                    {
                        "__t": k,
                        "__isp": t.column("__isp"),
                        "__isg": t.column("__isg"),
                        "__tp": t.column("__tp"),
                    }
                )

            keyed = flat.map_batches(
                key_with_target, batch_format="pyarrow", zero_copy_batch=True
            )

            def per_partition(gtab: pa.Table) -> pa.Table:
                enc = pc.dictionary_encode(gtab.column("__t").combine_chunks())
                codes = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
                isp = np.asarray(gtab.column("__isp"), dtype=np.int64)
                isg = np.asarray(gtab.column("__isg"), dtype=np.int64)
                istp = np.asarray(gtab.column("__tp"), dtype=np.int64)
                n_t = int(codes.max()) + 1 if len(codes) else 0
                anyg = np.bincount(codes, weights=isg, minlength=n_t) > 0
                keep = anyg[codes]
                z = pa.array(
                    [int(istp[keep].sum())], type=pa.int64()
                )
                return pa.table(
                    {
                        "tp": z,
                        "fp": pa.array(
                            [int((isp[keep] - istp[keep]).sum())], type=pa.int64()
                        ),
                        "fn": pa.array(
                            [int((isg[keep] - istp[keep]).sum())], type=pa.int64()
                        ),
                    }
                )

            partials = partitioned_group_map_any(keyed, "__t", per_partition, parts)
        else:
            partials = per_target.map_batches(
                target_counts, batch_format="pyarrow", zero_copy_batch=True
            )
        agg = partials.sum(["tp", "fp", "fn"]) or {}
        tp = int(agg.get("sum(tp)") or 0)
        fp = int(agg.get("sum(fp)") or 0)
        fn = int(agg.get("sum(fn)") or 0)

    return _annotation_report(tp, fp, fn)


def _annotation_report(tp: int, fp: int, fn: int):
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table(
            {
                "tp": pa.array([tp], type=pa.int64()),
                "fp": pa.array([fp], type=pa.int64()),
                "fn": pa.array([fn], type=pa.int64()),
                "precision": pa.array([round(prec, 6)], type=pa.float64()),
                "recall": pa.array([round(rec, 6)], type=pa.float64()),
                "f1": pa.array([round(f1, 6)], type=pa.float64()),
            }
        )
    )
