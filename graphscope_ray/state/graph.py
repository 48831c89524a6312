"""ShardedGraph — build hash-partitioned CSR shards from a Ray Dataset.

The Ray-native analogue of the reference's distributed fragment loader
(``analytical_engine/core/loader/arrow_fragment_loader.h:248-612``):
vertices/edges are hash-partitioned by ``splitmix64(vid) % P``
(edge-cut, ``core/utils/partitioner.h:43-54``) and shipped to a pool of
``GraphShard`` actors. The routing runs *inside* a ``map_batches``
stage — each Dataset task splits its Arrow block by owner shard and
pushes sub-tables directly to the owning actor, so no edge ever passes
through the driver (the Dataset streams, the actors accumulate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.functions.hashing import partition_of
from graphscope_ray.state.shard import GraphShard


def _route_groups(ds: ray.data.Dataset, shards, fid_col: str,
                  send) -> int:
    """Shuffle ``ds`` by owner partition and deliver each fid's whole
    group to its shard actor with ONE remote call (the SURVEY §7.1 M2
    design: ``groupby(fid)`` shuffle → actor ingest). Total ingest RPC
    count is P, independent of block count — a per-batch fan-out router
    was measured to anti-scale with P."""

    def deliver(g: pa.Table) -> pa.Table:
        f = int(g.column(fid_col)[0].as_py())
        n = ray.get(send(shards[f], g.drop_columns([fid_col])))
        return pa.table({"routed": pa.array([n], pa.int64())})

    from graphscope_ray.stages.relational import coalesce_blocks

    routed = coalesce_blocks(ds).groupby(fid_col).map_groups(
        deliver, batch_format="pyarrow")
    return int(sum(
        b["routed"].sum() or 0
        for b in routed.iter_batches(batch_format="pandas", batch_size=1024)
    ))


class ShardedGraph:
    """Handle to a built actor-pool graph; owns shard handles + counts."""

    def __init__(self, shards, num_partitions: int, n_vertices: int, n_edges: int,
                 directed: bool, has_reverse: bool = False,
                 build_phases: dict | None = None):
        self.shards = shards
        self.P = num_partitions
        self.n_vertices = n_vertices
        self.n_edges = n_edges
        self.directed = directed
        # bidi graph: mirror arcs tagged dir=1 ride in the same CSR so
        # reverse sweeps (Brandes dependency pass) work on directed graphs
        self.has_reverse = has_reverse
        # per-phase build wall times (route / exchange / verts / seal) —
        # the scaling protocol grades bandwidth-bound and compute-bound
        # phases separately (BASELINE.md)
        self.build_phases = build_phases or {}

    # -- message plumbing ------------------------------------------------
    def scatter_refs(self, method: str, *args):
        """Call `<method>` on every shard with per-destination returns.

        Returns refs[src_fid][dst_fid]. With P>1, ray's num_returns
        splits the P combined message objects so each one travels
        object-store-direct to its destination's apply task."""
        if self.P == 1:
            return [[getattr(s, method).remote(*args)] for s in self.shards]
        return [
            getattr(s, method).options(num_returns=self.P).remote(*args)
            for s in self.shards
        ]

    def step_refs(self, method: str, *args, inbox=None):
        """Issue one fused apply+scatter superstep (shard.<method> with
        ``num_returns=P+1``): refs[f][d] for d<P are f's messages to d,
        refs[f][P] is f's scalar partial. ``inbox`` is the previous
        round's refs (None for the round-0 scatter). One RPC wave per
        round — the merged scatter+apply path."""
        out = []
        for d, s in enumerate(self.shards):
            msgs = [inbox[src][d] for src in range(self.P)] if inbox is not None else []
            out.append(
                getattr(s, method).options(num_returns=self.P + 1).remote(*args, *msgs)
            )
        return out

    def step_scalars(self, refs):
        """Reduce point: fetch each shard's scalar partial (the P+1-th
        return of a fused step)."""
        return ray.get([r[self.P] for r in refs])

    def apply_all(self, method: str, refs, *args):
        """Route refs[src][dst] into each destination shard's apply."""
        out = []
        for d, s in enumerate(self.shards):
            inbox = [refs[src][d] for src in range(self.P)]
            out.append(getattr(s, method).remote(*args, *inbox))
        return ray.get(out)

    def call_all(self, method: str, *args):
        return ray.get([getattr(s, method).remote(*args) for s in self.shards])

    def state_dataset(self, col: str = "value") -> ray.data.Dataset:
        """Per-shard state tables as a Dataset — object-store refs, no
        driver materialization (each block stays where its shard put it)."""
        return ray.data.from_arrow_refs(
            [s.state_table.remote(col) for s in self.shards]
        )

    def state_dataset_with_stash(self, col: str, stash_name: str,
                                 stash_col: str) -> ray.data.Dataset:
        return ray.data.from_arrow_refs([
            s.state_table_with_stash.remote(col, stash_name, stash_col)
            for s in self.shards
        ])

    def degree_dataset(self) -> ray.data.Dataset:
        return ray.data.from_arrow_refs(
            [s.degree_table.remote() for s in self.shards]
        )


def build_graph(
    edges: ray.data.Dataset,
    num_partitions: int = 8,
    directed: bool = True,
    extra_vertices: ray.data.Dataset | None = None,
    dedup_arcs: bool = False,
    with_reverse: bool = False,
) -> ShardedGraph:
    """Partition an (src,dst[,weight]) int64 edge Dataset into GraphShard
    actors and seal per-shard CSRs.

    ``directed=False`` stores both arcs of every edge (so push-only
    scatter covers both directions). ``extra_vertices`` is a Dataset
    with a ``vid`` column for vertices that may not appear in any edge
    (isolated vertices — the reference keeps them via the vertex map,
    ``global_vertex_map.h:44-68``). When given it MUST cover every
    vertex id referenced by the edges — per-block dst registration is
    then skipped entirely (a large routing saving at high P).
    """
    import time

    shards = [GraphShard.remote(f, num_partitions) for f in range(num_partitions)]
    P = num_partitions
    ds = edges
    phases = {}
    t0 = time.perf_counter()

    def add_fid(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "_fid", pa.array(partition_of(src, num_partitions), pa.int32())
        )

    # undirected graphs route each edge ONCE (by fid(src)); the mirror
    # arcs are exchanged shard→shard at seal (reverse_slices /
    # ingest_arrays below) — half the bytes through the generic Dataset
    # shuffle, which is the expensive leg of the build
    _route_groups(
        ds.map_batches(add_fid, batch_format="pyarrow"), shards, "_fid",
        lambda shard, tab: shard.ingest.remote(tab, None),
    )
    phases["route_sec"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    if (not directed) or with_reverse:
        if P == 1:
            refs = [[shards[0].reverse_slices.remote()]]
        else:
            refs = [s.reverse_slices.options(num_returns=P).remote()
                    for s in shards]
        ray.get([
            s.ingest_arrays.remote(*[refs[src][d] for src in range(P)])
            for d, s in enumerate(shards)
        ])
    phases["exchange_sec"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    if extra_vertices is None:
        # register dst-only vertices (dangling sinks) with their owners
        def dst_fid(t: pa.Table) -> pa.Table:
            d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "vid": pa.array(d, pa.int64()),
                "_fid": pa.array(partition_of(d, num_partitions), pa.int32()),
            })

        vsrc = ds.map_batches(dst_fid, batch_format="pyarrow")
    else:
        def vid_fid(t: pa.Table) -> pa.Table:
            v = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "vid": pa.array(v, pa.int64()),
                "_fid": pa.array(partition_of(v, num_partitions), pa.int32()),
            })

        vsrc = extra_vertices.select_columns(["vid"]).map_batches(
            vid_fid, batch_format="pyarrow"
        )
    _route_groups(
        vsrc, shards, "_fid",
        lambda shard, tab: shard.ingest_vertices.remote(tab),
    )
    phases["verts_sec"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    mirror_dir = 1 if (directed and with_reverse) else 0
    stats = ray.get([
        s.build.remote(dedup_arcs, mirror_dir,
                       verts_complete=extra_vertices is not None)
        for s in shards
    ])
    phases["seal_sec"] = time.perf_counter() - t0
    n_vertices = sum(s["vertices"] for s in stats)
    n_edges = sum(s["edges"] for s in stats)
    return ShardedGraph(shards, num_partitions, n_vertices, n_edges, directed,
                        has_reverse=bool(mirror_dir), build_phases=phases)
