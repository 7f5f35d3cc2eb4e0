"""Cluster-sized actor-pool bounds for map_batches(Cls, concurrency=...).

Every stateful stage used to hardcode ``concurrency=_pool()`` — on a 32-cpu
node that caps an actor stage at a quarter of the machine, and on a 256-node
cluster at a rounding error. ``actor_pool()`` returns autoscaling bounds
sized to the cluster's CPU count at DAG-build time: pools still START at
``min_actors`` (tiny inputs never pay 32 actor inits) and only scale up
under backlog, so small fixtures behave exactly as before.
"""
from __future__ import annotations


def _pool():
    from .pool import actor_pool
    return actor_pool()


def actor_pool(min_actors: int = 1, cap: int = 64) -> tuple:
    """(min, max) actor bounds: max = CPUs clamped to [8, cap]."""
    import ray

    n = 8
    if ray.is_initialized():
        try:
            n = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            n = 8
    return (min_actors, max(8, min(cap, n)))
