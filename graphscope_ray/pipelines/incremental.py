"""Ingress-style incremental recompute (PageRank / WCC) on graph deltas.

The reference ships Ingress (docs/analytical_engine/ingress.md;
SIGMOD'21 "Ingress: Automating Incremental Graph Processing") — after
an edge delta it resumes a vertex-centric fixpoint from the PREVIOUS
result instead of cold-starting. This module is that capability
Ray-Data-first over the resident shard pool:

- :func:`wcc_incremental` — hash-min label propagation is monotonic
  (labels only decrease, min is idempotent), so the previous fixpoint
  is a valid warm start for the grown graph: seed the frontier with
  the delta-edge endpoints only and run the standard ``minprop_step``
  loop to the SAME fixpoint a full recompute reaches (exact —
  pytest-pinned), in a fraction of the rounds. Edge ADDITIONS only;
  deletions break monotonicity and fall back to a full recompute
  (Ingress handles retraction via memoization — out of scope, raise).

- :func:`pagerank_incremental` — power iteration converges to the
  unique fixpoint from ANY start vector (α < 1 ⇒ contraction), so the
  previous rank vector warm-starts the new graph: old vertices keep
  their rank, new vertices start at 1/N. Converges in far fewer
  rounds than a cold start to the same tolerance (pytest asserts both
  the 1e-10 agreement and the round-count reduction). Deletions are
  fine here (the contraction argument doesn't need monotonicity) —
  the caller just rebuilds the graph without the deleted arcs.

Previous state arrives as a (vid, value) Dataset — typically
``state_dataset()`` of the prior run or :func:`state_from_checkpoint`
reading a CheckpointManager manifest (the ``--resume``-style wiring:
a nightly job checkpoints its fixpoint, the next ingest warm-starts
from the manifest). Routing into the pool reuses the build path's
grouped delivery: one RPC per shard, no row through the driver.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.sources.readers import read_parquet_clean as _read_parquet
from graphscope_ray.functions.hashing import partition_of
from graphscope_ray.pipelines.algorithms import _metrics
from graphscope_ray.state.graph import ShardedGraph, _route_groups


def _route_state(graph: ShardedGraph, ds: ray.data.Dataset,
                 method: str) -> int:
    """Deliver a (vid, …) Dataset to its owning shards' ``method`` —
    the build path's one-RPC-per-shard grouped routing."""
    P = graph.P

    def add_fid(t: pa.Table) -> pa.Table:
        v = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "_fid", pa.array(partition_of(v, P), pa.int32()))

    return _route_groups(
        ds.map_batches(add_fid, batch_format="pyarrow"),
        graph.shards, "_fid",
        lambda shard, tab: getattr(shard, method).remote(tab),
    )


def _endpoints(delta_edges: ray.data.Dataset) -> ray.data.Dataset:
    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"vid": pa.concat_arrays([
            t.column("src").cast(pa.int64()).combine_chunks(),
            t.column("dst").cast(pa.int64()).combine_chunks()])})

    return delta_edges.map_batches(ends, batch_format="pyarrow")


def state_from_checkpoint(ckpt_dir: str, job: str) -> ray.data.Dataset:
    """The newest complete superstep's per-partition state parquet as
    one (vid, value) Dataset — the cross-graph warm-start source (the
    same files CheckpointManager wrote; no config-hash check because
    an incremental run's graph is by definition NOT the checkpoint's
    graph — stale vids are dropped at ingest, new vids keep the warm
    default)."""
    import json
    import os

    root = os.path.join(ckpt_dir, job)
    best = None
    for name in sorted(os.listdir(root)):
        mf = os.path.join(root, name, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as fh:
                m = json.load(fh)
            if best is None or m["superstep"] > best[0]:
                best = (m["superstep"], os.path.join(root, name))
    if best is None:
        raise FileNotFoundError(f"no complete checkpoint under {root}")
    parts = [os.path.join(best[1], f) for f in sorted(os.listdir(best[1]))
             if f.endswith(".parquet")]
    return _read_parquet(parts)


def wcc_incremental(
    graph: ShardedGraph,
    prev_state: ray.data.Dataset,
    delta_edges: ray.data.Dataset,
    max_iter: int = 10**6,
    deletions: bool = False,
):
    """WCC on ``graph`` (= old graph ∪ ``delta_edges``), warm-started
    from ``prev_state`` (vid, component) — the previous fixpoint.
    Returns ``(state_dataset(vid, component), metrics)`` with metrics
    counting only the incremental rounds; the result is EXACTLY the
    full recompute's (min-propagation reaches the per-component min of
    the initial labels, and each old label is a member vid of its new
    component, so the overall min is preserved)."""
    if deletions:
        raise ValueError(
            "wcc_incremental: edge deletions break min-propagation "
            "monotonicity — run a full wcc() on the new graph "
            "(Ingress-style retraction memoization is out of scope)")
    if graph.directed:
        raise ValueError("wcc_incremental requires an undirected graph")
    graph.call_all("warm_init", "vid")
    _route_state(graph, prev_state, "warm_ingest")
    _route_state(graph, _endpoints(delta_edges), "warm_activate")
    rounds = []
    refs = graph.step_refs("minprop_step")
    for it in range(max_iter):
        t0 = time.perf_counter()
        refs = graph.step_refs("minprop_step", inbox=refs)
        changed = sum(graph.step_scalars(refs))
        rounds.append({"round": it, "changed": changed,
                       "seconds": time.perf_counter() - t0})
        if changed == 0:
            break
    return graph.state_dataset("component"), _metrics(rounds, graph.n_edges)


def pagerank_incremental(
    graph: ShardedGraph,
    prev_state: ray.data.Dataset,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
):
    """PageRank on the delta'd ``graph`` warm-started from
    ``prev_state`` (vid, pagerank): old vertices keep their converged
    rank, new vertices start at 1/N, then the whole vector is
    normalized to sum 1 (networkx ``nstart`` semantics — without it
    the sum-error mode decays at exactly rate α, slower than the
    graph's mixing rate, and the warm start can LOSE rounds). Same
    fused superstep and convergence test as
    :func:`algorithms.pagerank`; ``tol=0`` forces exactly ``max_iter``
    rounds (the SQL-unrolled oracle protocol).
    Returns ``(state_dataset(vid, pagerank), metrics)``."""
    n = graph.n_vertices
    graph.call_all("warm_init", "fill", 1.0 / n)
    _route_state(graph, prev_state, "warm_ingest")
    total = sum(graph.call_all("value_scale", 1.0))
    graph.call_all("value_scale", 1.0 / total)
    dangling = sum(graph.call_all("dangling_partial"))
    rounds = []
    refs = graph.step_refs("pagerank_step", 0.0, alpha)
    for it in range(max_iter):
        t0 = time.perf_counter()
        base = (1.0 - alpha) / n + alpha * dangling / n
        refs = graph.step_refs("pagerank_step", base, alpha, inbox=refs)
        parts = graph.step_scalars(refs)
        delta = sum(p[0] for p in parts)
        dangling = sum(p[1] for p in parts)
        rounds.append({"round": it, "delta": delta,
                       "seconds": time.perf_counter() - t0})
        if tol > 0 and delta < tol * n:
            break
    return graph.state_dataset("pagerank"), _metrics(rounds, graph.n_edges)
