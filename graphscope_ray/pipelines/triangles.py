"""Per-vertex triangle counting — Dataset-native, non-iterative.

Reference semantics: ``gs::Triangles``
(``analytical_engine/apps/clustering/triangles.h:30-159``) — count on
the undirected simple graph, per-vertex counts, via degree-ordered
neighbor intersection (orientation by the total order (degree, id)
bounds every oriented out-degree at O(√E), taming hub skew — the same
trick as the reference's stage-1 filtering ``:70-94``).

Ray Data restatement (3 shuffles, no join operator):
1. canonicalize + distinct undirected edges (groupby dedup);
2. degrees via groupby-count, broadcast once with ``ray.put`` (a
   vertex-scale lookup fetched from the local object store by each
   task — small-side broadcast, not a per-batch reship);
3. orient each edge low→high by (deg, id); per-center wedge emission
   in ``map_groups`` (pairs of oriented out-neighbors);
4. tagged union of wedge rows (x, y, center) and edge rows
   (x, y, -1) → ``groupby(x, y)``: a wedge closes iff its (x, y) group
   contains an edge row — the classic MapReduce triangle join expressed
   without a join operator;
5. per-corner increments → groupby-sum.

Exact integer output: (vid, triangles), including zero rows for every
vertex seen in an edge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

_EDGE_SENTINEL = np.int64(-1)


def _resolve(ref):
    """ray.get an ObjectRef captured in a closure (closure-captured refs
    are not auto-resolved, unlike task arguments)."""
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _canonical_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})

    return (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def triangle_counts(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(src, dst) Dataset → (vid, triangles) Dataset (exact, undirected)."""
    canon = _canonical_edges(edges).materialize()

    # --- degrees (vertex-scale) -> broadcast ---------------------------
    def endpoints(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"vid": pa.array(np.concatenate([u, v]), pa.int64())})

    deg_df = (
        canon.map_batches(endpoints, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Count(alias_name="degree"))
        .to_pandas()
        .sort_values("vid")
    )
    deg_ref = ray.put(
        (deg_df["vid"].to_numpy(np.int64), deg_df["degree"].to_numpy(np.int64))
    )

    def deg_of(arr: np.ndarray) -> np.ndarray:
        vids, degs = _resolve(deg_ref)
        return degs[np.searchsorted(vids, arr)]

    # --- orient low->high by (deg, id) ---------------------------------
    def orient(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du, dv = deg_of(u), deg_of(v)
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        b = np.where(u_first, v, u)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    oriented = canon.map_batches(orient, batch_format="pyarrow").materialize()

    # --- wedges per center ---------------------------------------------
    def wedges_of(g: pd.DataFrame) -> pd.DataFrame:
        nb = g["b"].to_numpy(np.int64)
        if len(nb) < 2:
            return pd.DataFrame(
                {"x": pd.Series([], dtype=np.int64),
                 "y": pd.Series([], dtype=np.int64),
                 "center": pd.Series([], dtype=np.int64)}
            )
        nb = nb[np.lexsort((nb, deg_of(nb)))]  # (deg,id) order: wedge pair
        i, j = np.triu_indices(len(nb), k=1)   # is oriented like the edges
        return pd.DataFrame(
            {"x": nb[i], "y": nb[j],
             "center": np.full(len(i), g["a"].iloc[0], dtype=np.int64)}
        )

    wedges = oriented.groupby("a").map_groups(wedges_of, batch_format="pandas")

    # --- close wedges against the oriented edge set (tagged union) -----
    def as_edge_rows(t: pd.DataFrame) -> pd.DataFrame:
        # pandas out to match the wedge blocks (union requires one block type)
        return pd.DataFrame(
            {"x": t["a"], "y": t["b"],
             "center": np.full(len(t), _EDGE_SENTINEL, dtype=np.int64)}
        )

    edge_rows = oriented.map_batches(as_edge_rows, batch_format="pandas")

    def close(g: pd.DataFrame) -> pd.DataFrame:
        c = g["center"].to_numpy(np.int64)
        centers = c[c != _EDGE_SENTINEL]
        if len(centers) == len(c) or len(centers) == 0:  # no edge row / no wedges
            return pd.DataFrame(
                {"vid": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        n = len(centers)
        vids = np.concatenate([centers, [g["x"].iloc[0], g["y"].iloc[0]]])
        cnts = np.concatenate([np.ones(n, np.int64), [n, n]])
        return pd.DataFrame({"vid": vids.astype(np.int64), "cnt": cnts})

    hits = (
        wedges.union(edge_rows)
        .groupby(["x", "y"])
        .map_groups(close, batch_format="pandas")
    )

    # --- per-vertex sum + zero rows for triangle-free vertices ----------
    zeros = ray.data.from_pandas(
        pd.DataFrame({"vid": deg_df["vid"].to_numpy(np.int64),
                      "cnt": np.zeros(len(deg_df), np.int64)})
    )
    return (
        hits.union(zeros)
        .groupby("vid")
        .aggregate(Sum("cnt", alias_name="triangles"))
    )
