"""Vertex map: string oids ↔ int64 vids, deterministic and distributed.

The role of the reference's ``GlobalVertexMap``
(``analytical_engine/core/vertex_map/global_vertex_map.h:44-120``):
translate arbitrary original ids (oids) into dense-ish int64 vertex ids
(vids) that hash-partition well. Where the reference assigns local ids
in arrival order and all-gathers the maps, we use a *stateless pure
function* — ``vid = siphash64(oid)`` — so every task can translate any
oid with no shuffle, no broadcast table and no arrival-order
nondeterminism (SURVEY §7.4: "vertex map must be deterministic").

Collisions are possible in principle (n²/2⁶⁵ birthday bound); the map
builder verifies ``count_distinct(vid) == count_distinct(oid)`` and
raises, which at the 10^8-repo scale of the north rule is a ~1e-3
probability rerun-with-new-key event, not a silent corruption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.hashing import string_ids_to_vids


def add_vid_columns(ds: ray.data.Dataset, cols: dict[str, str]) -> ray.data.Dataset:
    """Append int64 vid columns computed from string oid columns.

    ``cols`` maps source column → new vid column, e.g.
    ``{"src": "src_vid", "dst": "dst_vid"}``.
    """

    def add(batch: pa.Table) -> pa.Table:
        for src_col, vid_col in cols.items():
            vids = string_ids_to_vids(batch.column(src_col).to_pylist())
            batch = batch.append_column(vid_col, pa.array(vids, pa.int64()))
        return batch

    return ds.map_batches(add, batch_format="pyarrow")


def build_vertex_map(oids: ray.data.Dataset, oid_col: str = "repo",
                     check_collisions: bool = False) -> ray.data.Dataset:
    """Distinct (oid, vid) table from a Dataset containing oids.

    One groupby shuffle over the (much smaller than edges) vertex set.
    Collision safety: with ``check_collisions`` an extra dedup pass
    verifies vid uniqueness here; by default callers verify for free at
    graph build (``graph.n_vertices == vmap.count()`` — a collision
    merges two vertices and shrinks the count).
    """
    from graphscope_ray.stages.relational import dedup_first

    distinct = dedup_first(oids.select_columns([oid_col]), [oid_col])

    def add(batch: pa.Table) -> pa.Table:
        vids = string_ids_to_vids(batch.column(oid_col).to_pylist())
        return batch.append_column("vid", pa.array(vids, pa.int64()))

    vmap = distinct.map_batches(add, batch_format="pyarrow").materialize()
    if check_collisions:
        n_oids = vmap.count()
        n_vids = dedup_first(vmap.select_columns(["vid"]), ["vid"]).count()
        if n_oids != n_vids:
            raise ValueError(
                f"vid hash collision: {n_oids} distinct oids -> {n_vids} "
                "distinct vids; rotate the hash key in functions/hashing.py"
            )
    return vmap


def attach_oids(
    state: ray.data.Dataset,
    vmap: ray.data.Dataset,
    oid_col: str = "repo",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Join an algorithm result (vid, value) back to original ids."""
    return state.join(
        vmap.select_columns([oid_col, "vid"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("vid",),
    )


def canonical_components(
    comp: ray.data.Dataset,
    vmap: ray.data.Dataset,
    oid_col: str = "repo",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Relabel WCC output (vid, component=vid-valued) to the canonical
    ``component = min oid in component`` (exact-match contract of the
    reference's golden files, which identify components by a stable
    member id — SURVEY §5). One vid join + one groupby over the
    vertex-scale (not edge-scale) result.

    Skew note: each component is one ``map_groups`` group; a giant
    component lands on one task, but the work is a single vectorized
    min + column assign (O(|group|) with no blowup)."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    named = attach_oids(comp, vmap, oid_col, num_partitions)  # (vid, component, oid)
    out_col = "component_" + oid_col

    def relabel(g: pd.DataFrame) -> pd.DataFrame:
        rep = g.groupby("component", sort=False)[oid_col].transform("min")
        return pd.DataFrame({oid_col: g[oid_col].to_numpy(),
                             out_col: rep.to_numpy()})

    return bucketed_group_apply(named, ["component"], relabel, num_buckets=64)

