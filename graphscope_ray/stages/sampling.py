"""Neighbor sampling for graph-learning data prep (GraphSAGE-style
k-hop fanout sampling — the data-side primitive of the reference's GLE
subsystem, re-expressed as Dataset operators; the GLE runtime itself
stays out of scope per SURVEY §7.5).

Sampling is DETERMINISTIC: each adjacency row ranks by
``hash64(src, dst, seed)`` and every source keeps its ``fanout``
smallest ranks — re-runs, re-partitionings and resumed jobs sample the
identical subgraph (the same seeded-hash policy as
``paths.sampling_path``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.hashing import hash64_ints, splitmix64


def neighbor_sample(
    edges: ray.data.Dataset,
    seeds,
    fanouts: list[int],
    seed: int = 42,
    directed: bool = True,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Sample a k-hop neighborhood: hop i keeps ≤ ``fanouts[i]``
    deterministic neighbors per frontier vertex. Returns a Dataset of
    sampled arcs ``(hop, src, dst)``; the hop-i frontier is the distinct
    dst set of hop i-1. Undirected mode samples over both arc
    directions. One bucketed co-group per hop (frontier rows ride the
    same shuffle as the adjacency — no driver-side neighbor lists)."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    def arcs_table(t: pa.Table) -> pa.Table:
        s = t.column("src").cast(pa.int64())
        d = t.column("dst").cast(pa.int64())
        if not directed:
            s, d = (pa.concat_arrays([s.combine_chunks(),
                                      d.combine_chunks()]),
                    pa.concat_arrays([d.combine_chunks(),
                                      s.combine_chunks()]))
        return pa.table({"src": s, "dst": d,
                         "_f": pa.nulls(len(s), pa.int8())})

    adj = edges.map_batches(arcs_table, batch_format="pyarrow"
                            ).materialize()
    frontier = np.unique(np.asarray(list(seeds), dtype=np.int64))
    out_parts = []
    for hop, fanout in enumerate(fanouts):
        fr = ray.data.from_arrow(pa.table({
            "src": pa.array(frontier, pa.int64()),
            "dst": pa.nulls(len(frontier), pa.int64()),
            "_f": pa.array(np.ones(len(frontier), np.int8)),
        }))

        def pick(g: pd.DataFrame, fanout=fanout) -> pd.DataFrame:
            want = set(g.loc[g["_f"] == 1, "src"])
            cand = g[g["_f"].isna() & g["src"].isin(want)]
            if cand.empty:
                return pd.DataFrame({"src": np.empty(0, np.int64),
                                     "dst": np.empty(0, np.int64)})
            cand = cand.drop_duplicates(["src", "dst"])
            with np.errstate(over="ignore"):
                r = splitmix64(
                    hash64_ints(cand["src"].to_numpy(np.int64))
                    ^ hash64_ints(cand["dst"].to_numpy(np.int64) + 7)
                    ^ np.uint64(seed))
            cand = cand.assign(_r=r).sort_values(
                ["src", "_r"], kind="mergesort")
            keep = cand.groupby("src", sort=False).head(fanout)
            return keep[["src", "dst"]].astype(np.int64)

        sampled = bucketed_group_apply(adj.union(fr), ["src"], pick,
                                       num_buckets=num_buckets
                                       ).materialize()

        def with_hop(t: pa.Table, hop=hop) -> pa.Table:
            return t.append_column(
                "hop", pa.array(np.full(t.num_rows, hop, np.int64)))

        out_parts.append(sampled.map_batches(with_hop,
                                             batch_format="pyarrow"))
        frontier = np.unique(np.concatenate([
            b["dst"].to_numpy(np.int64)
            for b in sampled.iter_batches(batch_format="pandas")
        ] or [np.empty(0, np.int64)]))
        if not len(frontier):
            break
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out.select_columns(["hop", "src", "dst"])
