"""Small shared helpers."""

from __future__ import annotations


def default_concurrency(reserve: int = 1, floor: int = 2) -> tuple:
    """Autoscaling actor-pool bounds ``(1, cap)`` from the cluster CPU count.

    The min of 1 matters: a pipeline often runs several actor-pool stages in
    one DAG, and fixed-size pools that each demand ~all CPUs deadlock waiting
    for actors; with (1, cap) every pool makes progress and Ray scales the
    busiest one. On a multi-node cluster ``cluster_resources`` sums all
    nodes, so caps grow with the cluster without config changes.
    """
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        n = 4
    return (1, max(floor, n - reserve))


def default_join_partitions(floor: int = 8) -> int:
    """Hash-join partition count derived from the cluster CPU total.

    A literal constant is a straggler factory at 100× scale — a 256-node
    cluster funneling a join through 8 partitions leaves 97 % of the
    cluster idle. One partition per CPU keeps join tasks at worker
    granularity and grows with the cluster without config changes.
    """
    return max(floor, default_concurrency()[1])


def join_remote_args(num_partitions: int, budget_frac: float = 0.25) -> dict:
    """``aggregator_ray_remote_args`` for ``Dataset.join``: cap ONE join
    operator's aggregator-pool CPU reservation at ``budget_frac`` of the
    cluster.

    Ray's default budget is HALF the cluster per join operator
    (``min(1, CPU/2/num_partitions)`` CPUs × num_partitions aggregator
    actors — hash_shuffle.py ``_get_aggregator_num_cpus_per_partition``).
    A plan with two concurrent join operators therefore reserves 100 % of
    the cluster's CPUs for aggregator ACTORS, and the read/map/shuffle
    TASKS that feed them (1 CPU each) can never schedule — observed as a
    flaky whole-pipeline deadlock on the 4-CPU test cluster (two
    8-partition joins = 16 aggregators × 0.25 CPU = 4.0/4.0 CPU held,
    every operator backpressured, zero tasks running). A quarter budget
    keeps two concurrent joins plus their feeding tasks schedulable at any
    cluster size; aggregators merely oversubscribe cores between finalize
    bursts instead of starving the DAG.

    Ray treats this override as a REPLACEMENT for its default remote-args
    dict (hash_shuffle.py:462), so the memory reservation and SPREAD
    placement that the default provides are mirrored here (memory via
    Ray's own estimator when importable; it only depends on the static
    target block size, not the data).
    """
    try:
        import ray

        cpus = (
            float(ray.cluster_resources().get("CPU", 4.0))
            if ray.is_initialized()
            else 4.0
        )
    except Exception:
        cpus = 4.0
    args: dict = {
        "num_cpus": min(1.0, (cpus * budget_frac) / max(1, num_partitions)),
        "scheduling_strategy": "SPREAD",
    }
    try:
        from ray.data import DataContext
        from ray.data._internal.execution.operators.join import JoinOperator

        target = DataContext.get_current().target_max_block_size
        if target:
            args["memory"] = JoinOperator._estimate_aggregator_memory_allocation(
                num_aggregators=num_partitions,
                num_partitions=num_partitions,
                partition_byte_size_estimate=target,
            )
    except Exception:  # pragma: no cover - private API moved; CPU cap still applies
        pass
    return args
