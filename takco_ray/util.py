"""Small shared helpers."""

from __future__ import annotations


def default_concurrency(reserve: int = 1, floor: int = 2) -> int:
    """Actor-pool size from the cluster's CPU count (leave some headroom).

    Sized once at pipeline build; per-stage overrides take precedence. On a
    multi-node cluster ``cluster_resources`` already sums all nodes, so pools
    scale with the cluster without config changes.
    """
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        n = 4
    return max(floor, n - reserve)
