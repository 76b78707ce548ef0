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
    target block size, not the data). Like Ray's default, the per-actor
    reservation accounts for the aggregator-pool cap
    (``DataContext.max_hash_shuffle_aggregators``): above the cap each actor
    handles ``ceil(partitions/aggregators)`` partitions, so CPU and memory
    scale by that ratio.
    """
    import math

    cpus = 4.0
    try:
        import ray

        # Prefer the cluster-config max (autoscaling-aware, like Ray's own
        # _get_aggregator_num_cpus_per_partition) so the budget is computed
        # against the cluster's eventual size, not the node count at
        # plan-build time; fall back to live resources.
        max_res = None
        try:
            max_res = ray._private.state.state.get_max_resources_from_cluster_config()
        except Exception:
            max_res = None
        if max_res and (max_res.get("CPU") or 0) > 0:
            cpus = float(max_res["CPU"])
        elif ray.is_initialized():
            cpus = float(ray.cluster_resources().get("CPU", 4.0))
    except Exception:
        pass

    # Ray caps the aggregator POOL at DataContext.max_hash_shuffle_aggregators
    # (default 64); above that each actor owns ceil(parts/aggregators)
    # partitions, so both the CPU and memory reservations must scale by that
    # ratio or the pool is under-reserved by ~parts/64 at large clusters.
    num_aggregators = max(1, num_partitions)
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        max_aggs = (
            getattr(ctx, "max_hash_shuffle_aggregators", None)
            or getattr(ctx, "default_hash_shuffle_parallelism", None)
            or num_partitions
        )
        num_aggregators = max(1, min(num_partitions, int(max_aggs)))
    except Exception:  # pragma: no cover - context API moved
        pass
    ratio = math.ceil(max(1, num_partitions) / num_aggregators)

    args: dict = {
        "num_cpus": min(1.0, (cpus * budget_frac) / max(1, num_partitions)) * ratio,
        "scheduling_strategy": "SPREAD",
    }
    try:
        from ray.data import DataContext
        from ray.data._internal.execution.operators.join import JoinOperator

        target = DataContext.get_current().target_max_block_size
        if target:
            args["memory"] = JoinOperator._estimate_aggregator_memory_allocation(
                num_aggregators=num_aggregators,
                num_partitions=num_partitions,
                partition_byte_size_estimate=target,
            )
    except Exception:  # pragma: no cover - private API moved; CPU cap still applies
        pass
    return args
