"""GNN training-data assembly: the composed link-prediction dataset.

The reference's learning engine (GLE) prepares GNN training batches
from (a) positive edges, (b) negative samples, and (c) sampled k-hop
neighborhoods around the endpoints. This module composes this repo's
three primitives — edge table, ``sampling.negative_edges`` (resident
pool), ``sampling.neighbor_sample`` (bucketed co-group) — into one
labeled training dataset, all streaming:

- ``link_prediction_dataset``: (src, dst, label) rows — every positive
  edge (label 1) unioned with the pool's deterministic global-uniform
  negatives (label 0). Deterministic at any partitioning; the
  positive:negative ratio is governed by ``neg_k`` and the documented
  one-round drop of true-edge hits.
- ``link_prediction_subgraphs``: the same pairs plus the sampled
  ``fanouts`` neighborhood arcs around all endpoint vertices —
  the message-passing context a GNN consumes, written as one arcs
  table (hop, src, dst) alongside the labeled pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def link_prediction_dataset(
    graph,
    edges: ray.data.Dataset,
    neg_k: int = 1,
    seed: int = 42,
) -> ray.data.Dataset:
    """(src, dst, label) — positives from the edge table (label 1),
    negatives from :func:`stages.sampling.negative_edges` over the
    sealed pool (label 0). ``edges`` must be the same table the pool
    was built from (the pool filters negatives against ITS arcs)."""
    from graphscope_ray.stages.sampling import negative_edges

    def pos(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("src").cast(pa.int64()),
            "dst": t.column("dst").cast(pa.int64()),
            "label": pa.array(np.ones(t.num_rows, np.int8)),
        })

    def neg(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("src").cast(pa.int64()),
            "dst": t.column("neg_dst").cast(pa.int64()),
            "label": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    positives = edges.select_columns(["src", "dst"]).map_batches(
        pos, batch_format="pyarrow")
    negatives = negative_edges(graph, k=neg_k, seed=seed).map_batches(
        neg, batch_format="pyarrow")
    return positives.union(negatives)


def link_prediction_subgraphs(
    graph,
    edges: ray.data.Dataset,
    fanouts: list[int],
    neg_k: int = 1,
    seed: int = 42,
    directed: bool = False,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Returns ``(pairs, context_arcs)``: the labeled pair table plus
    the deterministic ``fanouts``-bounded neighborhood arcs (hop, src,
    dst) sampled around every endpoint vertex — the shared
    message-passing context for a GNN batch over these pairs (GLE's
    sampling surface). Seeds of the neighbor expansion are the distinct
    endpoints of the labeled pairs, extracted distributedly."""
    from graphscope_ray.stages.relational import dedup_first
    from graphscope_ray.stages.sampling import neighbor_sample_pool

    if bool(directed) != bool(graph.directed):
        raise ValueError(
            f"directed={directed} does not match the pool's build "
            f"directedness ({graph.directed}); the resident CSR's own "
            "directedness decides the context arcs — rebuild the graph "
            "or pass the matching flag")
    pairs = link_prediction_dataset(graph, edges, neg_k=neg_k,
                                    seed=seed).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        v = np.concatenate([
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False)])
        return pa.table({"vid": pa.array(v.astype(np.int64))})

    seeds_ds = dedup_first(
        pairs.map_batches(endpoints, batch_format="pyarrow"), ["vid"])
    # bounded driver pull: ONE int64 column of distinct endpoints
    # (the same O(V) contract as the vertex map)
    seeds = np.sort(np.concatenate([
        np.asarray(b["vid"], np.int64)
        for b in seeds_ds.iter_batches(batch_format="numpy")] or
        [np.empty(0, np.int64)]))
    # pool engine: adjacency resident, one actor wave per hop (same
    # samples as the Dataset engine via the shared rank formula; the
    # pool's own directedness applies — `directed` is kept for the
    # signature but the pool decides)
    context = neighbor_sample_pool(graph, seeds, fanouts, seed=seed)
    return pairs, context
