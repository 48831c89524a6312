"""Degree centrality (``gs::DegreeCentrality``,
``analytical_engine/apps/centrality/degree/degree_centrality.h:78``):
centrality(v) = degree(v) / (N-1), with in/out/both variants.

Pure Dataset pipeline: per-batch endpoint emission → groupby-count →
scale. N = number of vertices (caller-supplied when the vertex set is
wider than the edge endpoints, e.g. isolated vertices).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def degree_table(
    edges: ray.data.Dataset, mode: str = "both", src: str = "src", dst: str = "dst"
) -> ray.data.Dataset:
    """(src,dst) → (vid, degree). mode: 'in' | 'out' | 'both'.

    'both' counts each arc at both endpoints (undirected degree when the
    edge table holds one row per undirected edge)."""

    def endpoints(batch: pa.Table) -> pa.Table:
        cols = []
        if mode in ("out", "both"):
            cols.append(batch.column(src).to_numpy(zero_copy_only=False))
        if mode in ("in", "both"):
            cols.append(batch.column(dst).to_numpy(zero_copy_only=False))
        return pa.table({"vid": pa.array(np.concatenate(cols), pa.int64())})

    from graphscope_ray.stages.relational import grouped_agg

    return grouped_agg(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["vid"], {"degree": (None, "size")},
    )


def degree_centrality(
    edges: ray.data.Dataset,
    n_vertices: int,
    mode: str = "both",
    src: str = "src",
    dst: str = "dst",
) -> ray.data.Dataset:
    """(vid, degree, centrality) with centrality = degree/(N-1)."""
    deg = degree_table(edges, mode, src, dst)
    scale = 1.0 / max(1, n_vertices - 1)

    def add(batch: pa.Table) -> pa.Table:
        c = batch.column("degree").to_numpy(zero_copy_only=False) * scale
        return batch.append_column("centrality", pa.array(c, pa.float64()))

    return deg.map_batches(add, batch_format="pyarrow")
