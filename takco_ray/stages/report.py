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
