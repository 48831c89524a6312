"""Minimum spanning forest (Kruskal-filter + merge reduce).

Reference: ``analytical_engine/apps/flash/measurement/msf.h:47-64`` —
each fragment runs Kruskal over its local edges, then the per-fragment
candidate trees are pairwise merge-reduced with Kruskal again until one
forest remains (the cycle property: an edge outside the MSF of ANY edge
subset it belongs to cannot be in the MSF of the union, so local
filtering never loses a forest edge).

Ray-native shape: ``map_batches`` local Kruskal over each edge block
(keeps ≤ |block vertices|-1 rows), then logarithmic contraction rounds
(repartition into ~1/8 as many blocks, filter again) until one block
holds the final forest. All shuffle payloads are already-filtered
candidate edges — O(V) per block after the first pass, never the raw
edge table. Ties are pinned by global (weight, min-end, max-end)
ordering, so the forest is deterministic and partition-invariant even
with equal weights.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _kruskal_frame(w, u, v):
    """Kruskal over (w, u, v) arrays with (w, min, max) tie order.
    Returns a boolean keep-mask. Union-find with path halving — the
    per-edge loop is the algorithm (same as the reference's kruskal<E>,
    flash_utils.h), bounded by the block's edge count."""
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    order = np.lexsort((hi, lo, w))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    keep = np.zeros(len(w), dtype=bool)
    for i in order:
        ra, rb = find(int(lo[i])), find(int(hi[i]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            keep[i] = True
    return keep


def _local_filter(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "src" not in t.schema.names:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "weight": pa.array([], pa.float64())})
    u = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
    keep = _kruskal_frame(w, u, v)
    return pa.table({"src": pa.array(u[keep]), "dst": pa.array(v[keep]),
                     "weight": pa.array(w[keep])})


def minimum_spanning_forest(
    edges: ray.data.Dataset,
    weight_col: str = "weight",
    contraction: int = 8,
) -> ray.data.Dataset:
    """Kruskal MSF of an undirected weighted edge Dataset → the forest's
    edges ``(src, dst, weight)`` (src < dst, deterministic under ties).

    Missing/absent weight column ⇒ unit weights (nx semantics). Self
    loops never join a forest and are dropped by the union-find.
    """

    def canon(t: pa.Table) -> pa.Table:
        u = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col in t.schema.names:
            w = t.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
        else:
            w = np.ones(t.num_rows, np.float64)
        return pa.table({"src": pa.array(np.minimum(u, v)),
                         "dst": pa.array(np.maximum(u, v)),
                         "weight": pa.array(w)})

    ds = edges.map_batches(canon, batch_format="pyarrow")
    ds = ds.map_batches(_local_filter, batch_format="pyarrow",
                        batch_size=None).materialize()
    # contraction rounds; the LAST pass always runs single-partition so
    # the returned forest is one Kruskal over all surviving candidates
    # (a coalesced-but-unmerged union of local forests is not a forest)
    while True:
        target = max(1, ds.num_blocks() // contraction)
        ds = (ds.repartition(target)
              .map_batches(_local_filter, batch_format="pyarrow",
                           batch_size=None)
              .materialize())
        if target == 1:
            return ds


def msf_weight(edges: ray.data.Dataset, weight_col: str = "weight") -> float:
    """Total forest weight — the reference's GlobalRes (msf.h:45)."""
    import pyarrow.compute as pc

    tot = 0.0
    for b in minimum_spanning_forest(edges, weight_col).iter_batches(
            batch_format="pyarrow"):
        tot += pc.sum(b.column("weight")).as_py() or 0.0
    return float(tot)
