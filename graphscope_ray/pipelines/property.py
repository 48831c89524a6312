"""Multi-label property-graph apps — the reference's ``apps/property``
family (``wcc_property.h``, ``sssp_property.h``, ``auto_*_property.h``,
``sssp_property_append.h``) over labeled fragments.

Semantics (wcc_property.h:104-133, sssp_property.h:106-190): the
labeled kernels run over the UNION of every vertex label and every edge
label — state crosses label boundaries freely (``comp_id[u_label][u]``
is relaxed from any label's adjacency list) — while state storage and
output stay per-label (``LabeledVertexDataContext``,
core/context/vertex_data_context.h).

The Ray-native shape: encode ``(label_id, oid)`` into one int64 gid
(``label_id * LABEL_STRIDE + oid``), union the per-label edge Datasets
into ONE edge Dataset, build the ordinary :class:`ShardedGraph`, run
the ordinary BSP kernel, and decode gids back to ``(label, vid)`` on
output.  Per-label state columns fall out of the decode; the kernels
need no changes and the per-label output matches the reference's
``Output`` loops (wcc_property.h:58-67).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.state.graph import ShardedGraph, build_graph

# gid = label_id * LABEL_STRIDE + oid.  A plain multiplicative stride
# (not a bit-pack) so the encoding is expressible in ANSI SQL twins;
# 2^40 leaves room for 8M labels x 1.1e12 ids in int64.
LABEL_STRIDE = 1 << 40


@dataclass
class PropertyGraph:
    """A sealed labeled graph: the flattened ShardedGraph plus the
    label catalog needed to decode gids back to per-label ids."""

    graph: ShardedGraph
    vertex_labels: list[str]
    edge_labels: list[str]
    label_ids: dict[str, int] = field(init=False)

    def __post_init__(self):
        self.label_ids = {l: i for i, l in enumerate(self.vertex_labels)}

    def encode(self, label: str, oid) -> int:
        return self.label_ids[label] * LABEL_STRIDE + int(oid)


def _encode_cols(t: pa.Table, spec: list[tuple[str, int, str]],
                 weight_col: str | None) -> pa.Table:
    """Project ``t`` to encoded int64 columns. ``spec`` is a list of
    (source_col, label_id, out_name); oids must fit under the stride."""
    cols, names = [], []
    for col, lid, out in spec:
        v = np.asarray(t.column(col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        if len(v) and (v.min() < 0 or v.max() >= LABEL_STRIDE):
            raise ValueError(
                f"vertex ids in {col!r} fall outside [0, 2^40) — "
                "re-key before building a property graph")
        cols.append(pa.array(lid * LABEL_STRIDE + v, pa.int64()))
        names.append(out)
    if weight_col is not None:
        # first edge property as the weight, cast to double
        # (sssp_property.h:114: e.get_data<int64_t>(0) -> double)
        w = np.asarray(t.column(weight_col).to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        cols.append(pa.array(w, pa.float64()))
        names.append("weight")
    return pa.table(dict(zip(names, cols)))


def build_property_graph(
    vertex_tables: dict[str, tuple[ray.data.Dataset, str]],
    edge_tables: dict[str, dict],
    num_partitions: int = 8,
    directed: bool = False,
    with_reverse: bool = False,
) -> PropertyGraph:
    """Build a labeled graph from per-label Datasets.

    ``vertex_tables``: label -> (Dataset, id_column); insertion order
    assigns label ids (the reference's schema order,
    arrow_fragment_loader.h:248-612).  ``edge_tables``: edge-label ->
    {"ds": Dataset, "src_label"/"dst_label": vertex label names,
    "src"/"dst": columns, "weight": optional column}.  Every endpoint
    id MUST appear in its label's vertex table (the loader's vertex-map
    contract) — violations fail loudly at seal.
    """
    vlabels = list(vertex_tables)
    lids = {l: i for i, l in enumerate(vlabels)}

    def vert_enc(lid: int, col: str):
        def f(t: pa.Table) -> pa.Table:
            return _encode_cols(t, [(col, lid, "vid")], None)
        return f

    verts = None
    for label, (ds, col) in vertex_tables.items():
        part = ds.map_batches(vert_enc(lids[label], col),
                              batch_format="pyarrow")
        verts = part if verts is None else verts.union(part)

    def edge_enc(s_lid: int, d_lid: int, s_col: str, d_col: str,
                 w_col: str | None):
        def f(t: pa.Table) -> pa.Table:
            return _encode_cols(
                t, [(s_col, s_lid, "src"), (d_col, d_lid, "dst")], w_col)
        return f

    edges = None
    for elabel, spec in edge_tables.items():
        part = spec["ds"].map_batches(
            edge_enc(lids[spec["src_label"]], lids[spec["dst_label"]],
                     spec.get("src", "src"), spec.get("dst", "dst"),
                     spec.get("weight")),
            batch_format="pyarrow",
        )
        edges = part if edges is None else edges.union(part)

    g = build_graph(edges, num_partitions=num_partitions, directed=directed,
                    extra_vertices=verts, with_reverse=with_reverse)
    return PropertyGraph(g, vlabels, list(edge_tables))


def decode_state(pg: PropertyGraph, ds: ray.data.Dataset,
                 col: str) -> ray.data.Dataset:
    """gid-keyed state Dataset -> per-label (label, vid, col) — the
    Output loops of wcc_property.h:58-67 / sssp_property.h:60-70."""
    labels = np.asarray(pg.vertex_labels, dtype=object)

    def f(t: pa.Table) -> pa.Table:
        gid = np.asarray(t.column("vid").to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        lid = gid // LABEL_STRIDE
        return pa.table({
            "label": pa.array(labels[lid], pa.string()),
            "vid": pa.array(gid - lid * LABEL_STRIDE, pa.int64()),
            col: t.column(col),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def wcc_property(pg: PropertyGraph):
    """Labeled WCC (wcc_property.h:25-228): hash-min propagation over
    the union graph; per-label (label, vid, component) output where the
    component id is the minimum member gid (a deterministic relabel of
    the reference's min-GID coloring)."""
    from graphscope_ray.pipelines.algorithms import wcc

    comp, metrics = wcc(pg.graph)
    return decode_state(pg, comp, "component"), metrics


# The reference's auto_* variants swap DefaultMessageManager for
# AutoParallelMessageManager (auto_wcc_property.h:30-150) — same
# fixpoint, different message plumbing; here the plumbing is already
# automatic (step_refs), so the auto twins ARE the base kernels.
auto_wcc_property = wcc_property


def sssp_property(pg: PropertyGraph, source_label: str, source_oid: int,
                  weighted: bool = True, max_iter: int = 10**6):
    """Labeled SSSP (sssp_property.h:43-210): Bellman-Ford frontier
    relaxation from one source over the union graph; weights come from
    the edge tables' declared weight column (the reference reads the
    first edge property, :114).  Output: (label, vid, distance),
    unreached vertices +inf."""
    from graphscope_ray.pipelines.algorithms import _dist_loop

    src = pg.encode(source_label, source_oid)
    dist, metrics = _dist_loop(pg.graph, [src], weighted=weighted,
                               max_iter=max_iter, col="distance")
    return decode_state(pg, dist, "distance"), metrics


auto_sssp_property = sssp_property


def sssp_property_append(
    pg: PropertyGraph,
    prev: ray.data.Dataset,
    appended_edge_tables: dict[str, dict],
    weighted: bool = True,
    max_iter: int = 10**6,
):
    """Incremental SSSP after an edge append (sssp_property_append.h:
    35-210): ``pg`` is the graph ALREADY containing the appended edges,
    ``prev`` the pre-append (label, vid, distance) result.  Distances
    warm-start from ``prev`` and only the appended arcs' source
    endpoints re-enter the frontier — appended edges can only lower
    distances, so monotone relaxation from the old fixpoint reaches the
    new one without re-running from the root (the IncEval-only
    evaluation the reference's append worker performs)."""
    import time as _time

    from graphscope_ray.pipelines.algorithms import _metrics
    from graphscope_ray.state.graph import _route_groups
    from graphscope_ray.functions.hashing import partition_of

    g = pg.graph
    lids = pg.label_ids

    # re-encode prev (decoded per-label output) back to gid keys and
    # route each row to its owner shard's warm-start buffer
    def enc_prev(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_pandas().map(lids).to_numpy(np.int64)
        vid = np.asarray(t.column("vid").to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        gid = lab * LABEL_STRIDE + vid
        return pa.table({
            "vid": pa.array(gid, pa.int64()),
            "dist": t.column("distance").cast(pa.float64()),
            "_fid": pa.array(partition_of(gid, g.P), pa.int64()),
        })

    _route_groups(prev.map_batches(enc_prev, batch_format="pyarrow"),
                  g.shards, "_fid",
                  lambda shard, tab: shard.dist_warm_ingest.remote(tab))

    # appended arcs' (encoded) src endpoints seed the frontier
    def enc_roots(s_lid: int, s_col: str):
        def f(t: pa.Table) -> pa.Table:
            v = np.asarray(t.column(s_col).to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            gid = s_lid * LABEL_STRIDE + np.unique(v)
            return pa.table({
                "vid": pa.array(gid, pa.int64()),
                "_fid": pa.array(partition_of(gid, g.P), pa.int64()),
            })
        return f

    roots = None
    for spec in appended_edge_tables.values():
        part = spec["ds"].map_batches(
            enc_roots(lids[spec["src_label"]], spec.get("src", "src")),
            batch_format="pyarrow")
        roots = part if roots is None else roots.union(part)
    if roots is not None:
        _route_groups(roots, g.shards, "_fid",
                      lambda shard, tab: shard.dist_warm_roots.remote(tab))

    g.call_all("dist_warm_seal")
    rounds = []
    refs = g.step_refs("dist_step", weighted)
    for it in range(max_iter):
        t0 = _time.perf_counter()
        refs = g.step_refs("dist_step", weighted, inbox=refs)
        changed = sum(g.step_scalars(refs))
        rounds.append({"round": it, "changed": changed,
                       "seconds": _time.perf_counter() - t0})
        if changed == 0:
            break
    return decode_state(pg, g.state_dataset("distance"), "distance"), \
        _metrics(rounds, g.n_edges)
