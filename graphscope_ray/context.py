"""Ray Data context tuning for this engine.

Ray 2.49's hash-shuffle aggregate/join defaults assume a large cluster
(200 shuffle partitions, up to 64 aggregator actors, each an actor
startup). On a single node that is ~25 s of fixed overhead per
groupby-aggregate before any data moves. ``tune_for_session`` sizes the
shuffle fan-out to the session's CPU count — on a real multi-node
cluster the defaults (or larger) are appropriate and this function
scales with it.
"""

from __future__ import annotations

import logging


def tune_for_session(quiet: bool = True) -> None:
    import ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    ctx.default_hash_shuffle_parallelism = max(2, min(2 * ncpu, 64))
    ctx.max_hash_shuffle_aggregators = max(2, min(ncpu, 16))
    ctx.min_parallelism = max(2, min(2 * ncpu, 64))
    if quiet:
        ctx.enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.WARNING)


def pool(n: int) -> tuple[int, int]:
    """Actor-pool sizing for ``map_batches(Cls, concurrency=...)``:
    autoscale from 1 up to ``n``. A FIXED pool of n actors each holding
    1 CPU deadlocks streaming execution when n equals the cluster CPU
    count (the pool's reserved actors leave no slot for the upstream
    read/downstream consume tasks — observed as a silent stall at
    ``ray.init(num_cpus=4)`` with ``concurrency=4``); a (1, n) range
    lets the pool start small and grow only while CPUs are free."""
    return (1, max(1, n))
