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
