"""Eager-session façade — the reference's primary user path on Ray.

Mirrors ``graphscope.session()`` → ``sess.g().add_vertices(...)
.add_edges(...)`` → ``graphscope.pagerank(g)`` → ``ctx.to_dataframe()``
(reference: python/graphscope/client/session.py:215-586,
framework/graph.py:477-870, framework/app.py:322-415,
analytical/app/*.py) so a reference user can switch with minimal edits.

Ray-native restatement of the lifecycle (SURVEY §3.4): the
client/coordinator/engine/vineyard process boundaries collapse into
driver / shard actors / object store. A :class:`Session` therefore owns
only defaults (partition count, checkpoint dir) and the lifetime of the
shard pools it seals — the Ray runtime itself belongs to the caller
(nothing here calls ``ray.init``; see package docstring).

Node ids: the engine's shard pool keys vertices by int64. Integer node
ids pass through unchanged (identity — exact parity with the gate
pipelines). Non-integer ids (the reference accepts arbitrary oids,
core/vertex_map/global_vertex_map.h:44-120) are relabelled
``vid = hash64(str(oid))`` inside ``map_batches`` — deterministic,
distributed, no driver-side dictionary — and every app result joins the
(vid, node) map back in before it reaches the user. Hash injectivity
over the actual node set is verified at seal time (a bucketed
distinct-count per vid; collisions raise rather than mis-merge).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.sources.readers import read_parquet_clean as _read_parquet


def _as_dataset(data) -> ray.data.Dataset:
    """Accept a Dataset, a pandas DataFrame, or a parquet/CSV path."""
    if isinstance(data, ray.data.Dataset):
        return data
    if isinstance(data, pd.DataFrame):
        return ray.data.from_pandas(data)
    if isinstance(data, str):
        if data.endswith(".csv"):
            return ray.data.read_csv(data)
        return _read_parquet(data)
    raise TypeError(f"unsupported graph input: {type(data)!r}")


def _first_col(ds: ray.data.Dataset, field_: int | str) -> str:
    """Reference add_vertices/add_edges accept positional field indexes
    (framework/graph.py:80-121 defaults vid_field=0, src/dst 0/1)."""
    if isinstance(field_, str):
        return field_
    return ds.schema().names[field_]


def _is_int_type(ds: ray.data.Dataset, col: str):
    t = dict(zip(ds.schema().names, ds.schema().types))[col]
    # Ray reports non-Arrow-convertible (object-dtype) columns as plain
    # Python types; anything that isn't an Arrow integer relabels
    return isinstance(t, pa.DataType) and pa.types.is_integer(t)


@dataclass(frozen=True)
class Graph:
    """Immutable lazy graph definition; ``add_*`` return new Graphs
    (the reference's GraphDAGNode chaining, framework/graph.py:225-870).
    The shard pool seals lazily on the first app run and is cached on
    the owning session."""

    session: "Session"
    directed: bool = True
    _vertex_specs: tuple = field(default_factory=tuple)  # (ds, vid_col)
    _edge_specs: tuple = field(default_factory=tuple)    # (ds, src, dst, w)
    #: optional string-oid → uint64 vectorized hash overriding the
    #: default siphash relabel (e.g. functions.text._md5_lower64 for a
    #: DuckDB-reproducible md5 interchange); must be injective on the
    #: input oids (collisions are detected and raised either way)
    oid_hasher: object = None

    # -- construction -----------------------------------------------------
    def add_vertices(self, vertices, label: str = "_", vid_field=0
                     ) -> "Graph":
        """When any vertices are declared, the union of vertex inputs
        MUST cover every id referenced by the edges (the engine then
        skips per-block endpoint registration — state/graph.py
        build_graph contract; the reference loader imposes the same
        on non-inferred graphs). With no add_vertices calls, the
        vertex set is inferred from edge endpoints."""
        ds = _as_dataset(vertices)
        return replace(self, _vertex_specs=self._vertex_specs
                       + ((ds, _first_col(ds, vid_field)),))

    def add_edges(self, edges, label: str = "_", src_field=0, dst_field=1,
                  weight_field: str | None = None) -> "Graph":
        ds = _as_dataset(edges)
        return replace(self, _edge_specs=self._edge_specs
                       + ((ds, _first_col(ds, src_field),
                           _first_col(ds, dst_field), weight_field),))

    def project(self, weight_field: str | None = None) -> "Graph":
        """Reference ``project`` selects one vertex/edge property for the
        simple-graph apps (framework/graph.py:816). Here: re-tag which
        edge column is the weight."""
        specs = tuple((ds, s, d, weight_field)
                      for ds, s, d, _ in self._edge_specs)
        return replace(self, _edge_specs=specs)

    # -- sealing -----------------------------------------------------------
    @property
    def _needs_relabel(self) -> bool:
        for ds, s, d, _ in self._edge_specs:
            if not (_is_int_type(ds, s) and _is_int_type(ds, d)):
                return True
        for ds, v in self._vertex_specs:
            if not _is_int_type(ds, v):
                return True
        return False

    def _int_edges(self) -> ray.data.Dataset:
        """Union of edge specs normalized to (src, dst[, weight]) int64."""
        relabel = self._needs_relabel
        hasher = self.oid_hasher
        parts = []
        for ds, s, d, w in self._edge_specs:
            cols = [s, d] + ([w] if w else [])
            sub = ds.select_columns(cols)

            def norm(t: pa.Table, s=s, d=d, w=w, relabel=relabel,
                     hasher=hasher) -> pa.Table:
                out = {"src": _vids(t.column(s), relabel, hasher),
                       "dst": _vids(t.column(d), relabel, hasher)}
                if w:
                    out["weight"] = t.column(w).cast(pa.float64())
                return pa.table(out)

            parts.append(sub.map_batches(norm, batch_format="pyarrow"))
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    def _int_vertices(self) -> ray.data.Dataset | None:
        if not self._vertex_specs:
            return None
        relabel = self._needs_relabel
        hasher = self.oid_hasher
        parts = []
        for ds, v in self._vertex_specs:

            def norm(t: pa.Table, v=v, relabel=relabel,
                     hasher=hasher) -> pa.Table:
                return pa.table({"vid": _vids(t.column(v), relabel,
                                              hasher)})

            parts.append(ds.select_columns([v])
                         .map_batches(norm, batch_format="pyarrow"))
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def _node_map(self) -> ray.data.Dataset | None:
        """(vid, node) map for relabelled graphs; None for identity.
        Built (and injectivity-checked) once per Graph, then cached —
        Contexts share the materialized map."""
        if not self._needs_relabel:
            return None
        if hasattr(self, "_node_map_ds"):
            return self._node_map_ds
        parts = []
        hasher = self.oid_hasher
        for ds, s, d, _ in self._edge_specs:
            def ends(t: pa.Table, s=s, d=d, hasher=hasher) -> pa.Table:
                node = pa.concat_arrays([
                    t.column(s).cast(pa.string()).combine_chunks(),
                    t.column(d).cast(pa.string()).combine_chunks()])
                return pa.table({"vid": _vids(node, True, hasher),
                                 "node": node})
            parts.append(ds.select_columns([s, d])
                         .map_batches(ends, batch_format="pyarrow"))
        for ds, v in self._vertex_specs:
            def one(t: pa.Table, v=v, hasher=hasher) -> pa.Table:
                node = t.column(v).cast(pa.string()).combine_chunks()
                return pa.table({"vid": _vids(node, True, hasher),
                                 "node": node})
            parts.append(ds.select_columns([v])
                         .map_batches(one, batch_format="pyarrow"))
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.union(p)
        from graphscope_ray.stages.relational import dedup_first
        m = dedup_first(allp, ["vid"], order_by=["node"]).materialize()
        _check_injective(allp)
        object.__setattr__(self, "_node_map_ds", m)
        return m

    def _pool(self, reverse: bool = False, with_reverse: bool = False):
        key = ("rev" if reverse else "fwd") + ("+bidi" if with_reverse else "")
        if not hasattr(self, "_sealed"):
            object.__setattr__(self, "_sealed", {})  # frozen dataclass
        cached = self._sealed.get(key)
        if cached is not None:
            return cached
        from graphscope_ray.state.graph import build_graph
        edges = self._int_edges()
        if reverse:
            def flip(t: pa.Table) -> pa.Table:
                cols = {"src": t.column("dst"), "dst": t.column("src")}
                if "weight" in t.schema.names:
                    cols["weight"] = t.column("weight")
                return pa.table(cols)
            edges = edges.map_batches(flip, batch_format="pyarrow")
        g = build_graph(edges, num_partitions=self.session.num_partitions,
                        directed=self.directed,
                        with_reverse=with_reverse,
                        extra_vertices=self._int_vertices())
        self._sealed[key] = g
        self.session._pools[(id(g), key)] = g
        return g

    def edges_dataset(self) -> ray.data.Dataset:
        return self._int_edges()


def _vids(col: pa.ChunkedArray | pa.Array, relabel: bool,
          hasher=None) -> pa.Array:
    if not relabel:
        return col.cast(pa.int64()) if isinstance(col, pa.Array) \
            else col.combine_chunks().cast(pa.int64())
    if hasher is None:
        from graphscope_ray.functions.hashing import hash64_strings
        hasher = hash64_strings
    arr = col.cast(pa.string()).to_numpy(zero_copy_only=False)
    return pa.array(hasher(arr.astype(object)).view(np.int64),
                    pa.int64())


def _check_injective(pairs: ray.data.Dataset) -> None:
    """Raise if any vid maps to two distinct nodes (hash collision)."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    def judge(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("vid")["node"].nunique()
        bad = n[n > 1]
        return pd.DataFrame({"vid": bad.index.to_numpy(np.int64)})

    bad = bucketed_group_apply(pairs, ["vid"], judge, num_buckets=16)
    hits = bad.take(1)
    if hits:
        raise ValueError(
            f"node-id hash collision on vid {hits[0]['vid']}; "
            "relabel your nodes to distinct strings/ints")


class Context:
    """App result handle (reference framework/context.py:137-210):
    ``to_dataset`` streams; ``to_dataframe``/``to_numpy`` materialize
    (driver-side by definition — same as the reference's fetch path)."""

    def __init__(self, result: ray.data.Dataset, graph: Graph):
        self._result = result
        self._map = graph._node_map()

    def to_dataset(self) -> ray.data.Dataset:
        # non-vertex-keyed results (e.g. degree-histogram outputs) pass
        # through; vid-keyed ones get the node map joined back in
        if self._map is None or "vid" not in self._result.schema().names:
            return self._result
        from graphscope_ray.stages.relational import cogroup_join
        return cogroup_join(self._result, self._map, on="vid"
                            ).drop_columns(["vid"])

    def to_dataframe(self, selector=None) -> pd.DataFrame:
        df = self.to_dataset().to_pandas()
        key = ("node" if "node" in df.columns
               else "vid" if "vid" in df.columns else df.columns[0])
        df = df.sort_values(key, kind="mergesort").reset_index(drop=True)
        if selector:
            df = df.rename(columns={v: k for k, v in selector.items()
                                    if v in df.columns})
        return df

    def to_numpy(self, selector: str) -> np.ndarray:
        df = self.to_dataframe()
        col = selector.split(".")[-1]
        if col == "id":
            col = "node" if "node" in df.columns else "vid"
        return df[col].to_numpy()

    def to_dict(self, value_col: str | None = None) -> dict:
        df = self.to_dataframe()
        key = "node" if "node" in df.columns else "vid"
        if value_col is None:
            value_col = [c for c in df.columns if c != key][0]
        return dict(zip(df[key], df[value_col]))


class Session:
    """Owns app-run defaults and the shard pools it seals — NOT the Ray
    runtime (the caller's job; reference sessions launch the cluster,
    client/session.py:215, which collapses to ray.init here)."""

    def __init__(self, num_partitions: int = 8, ckpt_dir: str | None = None):
        self.num_partitions = num_partitions
        self.ckpt_dir = ckpt_dir
        self._pools: dict = {}
        self._closed = False

    def g(self, directed: bool = True, oid_hasher=None) -> Graph:
        return Graph(session=self, directed=directed,
                     oid_hasher=oid_hasher)

    def interactive(self, graph: "Graph",
                    vlabels: "tuple[str, ...] | None" = None,
                    elabels: "tuple[str, ...] | None" = None
                    ) -> "InteractiveQuery":
        """``graphscope.interactive(sess, graph)`` analogue
        (python/graphscope/interactive/query.py): a Cypher/Gremlin
        endpoint over the SAME tables the analytical graph was built
        from. ``vlabels``/``elabels`` name the vertex/edge specs in
        declaration order (defaults: ``V``/``E``, indexed when there
        are several). Integer-id graphs only — relabelled string-oid
        graphs query through the analytical surface instead."""
        from graphscope_ray.query.cypher import CypherGraph

        if graph._needs_relabel:
            raise ValueError(
                "interactive() needs integer vertex ids (the Cypher "
                "catalog keys vertices by int64; string-oid graphs "
                "are relabelled only inside the analytical engine)")
        cg = CypherGraph(num_buckets=self.num_partitions)
        nv, ne = len(graph._vertex_specs), len(graph._edge_specs)
        for i, (ds, vid) in enumerate(graph._vertex_specs):
            name = (vlabels[i] if vlabels
                    else ("V" if nv == 1 else f"V{i}"))
            cg.add_vertices(name, ds, vid_col=vid)
        for i, (ds, s, d, _w) in enumerate(graph._edge_specs):
            name = (elabels[i] if elabels
                    else ("E" if ne == 1 else f"E{i}"))
            cg.add_edges(name, ds, src=s, dst=d)
        return InteractiveQuery(cg)

    def close(self) -> None:
        for g in self._pools.values():
            for s in g.shards:
                ray.kill(s, no_restart=True)
        self._pools.clear()
        self._closed = True

    def __enter__(self) -> "Session":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class InteractiveQuery:
    """The reference ``InteractiveQuery`` surface: ``execute(cypher)``
    (reads return a Ray Dataset; writes mutate the catalog and return
    the counter summary) and ``traversal()`` (the Gremlin ``g``)."""

    def __init__(self, cypher_graph):
        self._cg = cypher_graph

    def execute(self, cypher: str):
        return self._cg.query(cypher)

    def traversal(self):
        from graphscope_ray.query.traversal import traversal_source

        return traversal_source(self._cg)


def session(num_partitions: int = 8, ckpt_dir: str | None = None,
            **ignored) -> Session:
    """Reference-compatible constructor; cluster-launch kwargs
    (num_workers, k8s_*) are accepted and ignored — the Ray runtime is
    the cluster here."""
    return Session(num_partitions=num_partitions, ckpt_dir=ckpt_dir)


# ------------------------------------------------------------------ apps
# Signatures mirror python/graphscope/analytical/app/*.py; each returns
# a Context over the engine's Dataset result.

def pagerank(graph: Graph, delta: float = 0.85, max_round: int = 10
             ) -> Context:
    """Fixed-round PageRank (app/pagerank.py:32); networkx-semantics
    kernel with dangling redistribution, tol=0 forces max_round."""
    from graphscope_ray.pipelines.algorithms import pagerank as pr
    ds, _ = pr(graph._pool(), alpha=delta, max_iter=max_round, tol=0.0,
               ckpt_dir=graph.session.ckpt_dir)
    return Context(ds, graph)


def pagerank_nx(graph: Graph, alpha: float = 0.85, max_iter: int = 100,
                tol: float = 1e-6) -> Context:
    """Tolerance-converged PageRank (app/pagerank.py:91)."""
    from graphscope_ray.pipelines.algorithms import pagerank as pr
    ds, _ = pr(graph._pool(), alpha=alpha, max_iter=max_iter, tol=tol,
               ckpt_dir=graph.session.ckpt_dir)
    return Context(ds, graph)


def personalized_pagerank(graph: Graph, seeds, alpha: float = 0.85,
                          max_iter: int = 100, tol: float = 1e-6
                          ) -> Context:
    """Seed-set teleport PPR (FLASH ppr; networkx
    pagerank(personalization=uniform-over-seeds))."""
    from graphscope_ray.pipelines.algorithms import (
        personalized_pagerank as ppr,
    )
    vids = [_src_vid(graph, s) for s in seeds]
    ds, _ = ppr(graph._pool(), vids, alpha=alpha, max_iter=max_iter,
                tol=tol)
    return Context(ds, graph)


def wcc(graph: Graph) -> Context:
    from graphscope_ray.pipelines.algorithms import wcc as _wcc
    ds, _ = _wcc(graph._pool(), ckpt_dir=graph.session.ckpt_dir)
    return Context(ds, graph)


def lpa(graph: Graph, max_round: int = 10) -> Context:
    from graphscope_ray.pipelines.algorithms import cdlp
    ds, _ = cdlp(graph._pool(), max_round=max_round,
                 ckpt_dir=graph.session.ckpt_dir)
    return Context(ds, graph)


cdlp = lpa


def bfs(graph: Graph, src=0) -> Context:
    """(vid, depth); unreached vertices carry +inf like the engine."""
    from graphscope_ray.pipelines.algorithms import bfs as _bfs
    ds, _ = _bfs(graph._pool(), source=_src_vid(graph, src))
    return Context(ds, graph)


def sssp(graph: Graph, src=0, weight: str | None = None) -> Context:
    """(vid, distance). Weighted when the graph's edges carry a weight
    column (app/sssp.py:32 projects the weight property the same way);
    unit weights otherwise."""
    from graphscope_ray.pipelines.algorithms import sssp as _sssp
    ds, _ = _sssp(graph._pool(), source=_src_vid(graph, src))
    return Context(ds, graph)


def sssp_delta_stepping(graph: Graph, src=0,
                        delta: float | None = None) -> Context:
    """(vid, distance) via bucketed delta-stepping relaxation
    (flash/traversal/sssp-dlt-step.h) — same fixpoint as :func:`sssp`,
    Δ defaults to the reference's 2·mean arc weight."""
    from graphscope_ray.pipelines.algorithms import (
        sssp_delta_stepping as _dlt,
    )
    ds, _ = _dlt(graph._pool(), source=_src_vid(graph, src), delta=delta)
    return Context(ds, graph)


def triangles(graph: Graph) -> Context:
    from graphscope_ray.pipelines.triangles import triangle_counts
    return Context(triangle_counts(graph.edges_dataset()), graph)


def scc(graph: Graph) -> Context:
    """Strongly connected components (FLASH fwd-bwd max coloring);
    requires a directed graph — the bidi pool is built on demand."""
    if not graph.directed:
        raise ValueError("scc requires a directed graph")
    from graphscope_ray.pipelines.algorithms import scc as _scc
    return Context(_scc(graph._pool(with_reverse=True)), graph)


def triangle_census(graph: Graph) -> dict:
    """Directed cyclic/transitive triangle counts (flash
    cyclic-/acyclic-triangle); requires a directed graph."""
    if not graph.directed:
        raise ValueError("triangle_census requires a directed graph")
    from graphscope_ray.pipelines.triangles import directed_triangle_census
    return directed_triangle_census(graph.edges_dataset())


def clustering(graph: Graph, degree_threshold: int = 10**9) -> Context:
    """Local clustering coefficient; directed graphs use the
    lcc_directed / Fagiolo semantics (gs::Clustering handles both,
    clustering.h:59/275; registry lcc_directed .gs_conf.yaml:95)."""
    if graph.directed:
        from graphscope_ray.pipelines.motifs import directed_clustering
        return Context(directed_clustering(graph.edges_dataset()), graph)
    from graphscope_ray.pipelines.structure import clustering_coefficient
    return Context(clustering_coefficient(graph.edges_dataset()), graph)


def degree_centrality(graph: Graph, centrality_type: str = "both"
                      ) -> Context:
    from graphscope_ray.pipelines.degree import degree_centrality as dc
    pool = graph._pool()
    return Context(dc(graph.edges_dataset(), pool.n_vertices,
                      mode=centrality_type), graph)


def eigenvector_centrality(graph: Graph, tolerance: float = 1e-6,
                           max_round: int = 100) -> Context:
    from graphscope_ray.pipelines.algorithms import (
        eigenvector_centrality as ec,
    )
    ds, _ = ec(graph._pool(), max_iter=max_round, tol=tolerance)
    return Context(ds, graph)


def katz_centrality(graph: Graph, alpha: float = 0.1, beta: float = 1.0,
                    tolerance: float = 1e-6, max_round: int = 100
                    ) -> Context:
    from graphscope_ray.pipelines.algorithms import katz_centrality as kc
    ds, _ = kc(graph._pool(), alpha=alpha, beta=beta, max_iter=max_round,
               tol=tolerance)
    return Context(ds, graph)


def hits(graph: Graph, tolerance: float = 0.01, max_round: int = 100,
         normalized: bool = True) -> Context:
    """Directed graphs build the reverse pool once (cached); undirected
    A = Aᵀ aliases one pool like the gate query."""
    from graphscope_ray.pipelines.algorithms import hits as _hits
    fwd = graph._pool()
    rev = graph._pool(reverse=True) if graph.directed else fwd
    merged, _, _ = _hits(fwd, rev, max_iter=max_round, tol=tolerance)
    return Context(merged, graph)


def k_core(graph: Graph, k: int = 3) -> Context:
    from graphscope_ray.pipelines.algorithms import kcore_pool
    return Context(kcore_pool(graph._pool(), k), graph)


def k_shell(graph: Graph, k: int = 3) -> Context:
    from graphscope_ray.pipelines.algorithms import kshell_pool
    return Context(kshell_pool(graph._pool(), k), graph)


def voterank(graph: Graph, num_of_nodes: int = 0) -> Context:
    from graphscope_ray.pipelines.algorithms import voterank as vr
    pool = graph._pool()
    n = num_of_nodes or pool.n_vertices
    elected = vr(pool, n)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vid": np.asarray(elected, np.int64),
        "rank": np.arange(len(elected), dtype=np.int64)}))
    return Context(ds, graph)


def louvain(graph: Graph, min_progress: int = 1000, progress_tries: int = 1
            ) -> Context:
    if graph.directed:
        raise ValueError("louvain requires an undirected graph "
                         "(app/louvain.py:31 asserts the same)")
    from graphscope_ray.pipelines.louvain import louvain as lv
    return Context(lv(graph.edges_dataset(),
                      vertices=graph._int_vertices()), graph)


def degree_assortativity_coefficient(graph: Graph, x: str = "out",
                                     y: str = "in",
                                     weight: str | None = None) -> float:
    """Scalar (app/degree_assortativity_coefficient.py:31; the engine
    computes the undirected networkx convention)."""
    from graphscope_ray.pipelines.structure import degree_assortativity
    return degree_assortativity(graph.edges_dataset())


def average_degree_connectivity(graph: Graph) -> Context:
    from graphscope_ray.pipelines.structure import (
        average_degree_connectivity as adc,
    )
    return Context(adc(graph.edges_dataset()), graph)


def attribute_assortativity_coefficient(graph: Graph, attribute: str
                                        ) -> float:
    """``attribute`` names a column of an ``add_vertices`` input
    (app/attribute_assortativity.py:31 selects a vertex property the
    same way)."""
    from graphscope_ray.pipelines.structure import attribute_assortativity
    relabel = graph._needs_relabel
    hasher = graph.oid_hasher
    for ds, vcol in graph._vertex_specs:
        if attribute in ds.schema().names:
            def norm(t: pa.Table, vcol=vcol) -> pa.Table:
                return pa.table({"vid": _vids(t.column(vcol), relabel,
                                              hasher),
                                 attribute: t.column(attribute)})
            attrs = ds.select_columns([vcol, attribute]).map_batches(
                norm, batch_format="pyarrow")
            return attribute_assortativity(graph.edges_dataset(), attrs,
                                           attribute)
    raise KeyError(f"no vertex input carries column {attribute!r}")


def is_simple_path(graph: Graph, nodes: list) -> bool:
    from graphscope_ray.pipelines.paths import is_simple_path as isp
    vids = [_src_vid(graph, n) for n in nodes]
    return isp(graph.edges_dataset(), vids, directed=graph.directed)


def average_shortest_path_length(graph: Graph,
                                 weight: str | None = None) -> float:
    """Unweighted all-pairs mean Σd(s,t)/(n(n-1)) over ordered pairs
    (app/average_shortest_path_length.py:30; networkx definition).
    Raises on disconnected graphs like networkx does. O(V²) work —
    small/medium graphs only, same as the reference app."""
    from graphscope_ray.pipelines.algorithms import (
        all_pairs_shortest_path_length,
    )
    pool = graph._pool()
    n = pool.n_vertices
    ds = all_pairs_shortest_path_length(pool)
    total = ds.sum("length")
    if ds.count() < n * n:
        raise ValueError("graph is not connected")
    return total / (n * (n - 1)) if n > 1 else 0.0


def articlerank(graph: Graph, damping: float = 0.85,
                max_iters: int = 20) -> Context:
    """FLASH articlerank (flash/ranking.py surface)."""
    from graphscope_ray.pipelines.algorithms import articlerank as ar
    ds, _ = ar(graph._pool(), damping=damping, max_iters=max_iters)
    return Context(ds, graph)


def maximal_independent_set(graph: Graph) -> Context:
    """Deterministic greedy MIS members (flash/matching surface)."""
    from graphscope_ray.pipelines.algorithms import (
        maximal_independent_set as mis,
    )
    return Context(mis(graph._pool()), graph)


def closeness_centrality(graph: Graph, wf_improved: bool = True
                         ) -> Context:
    """Exact closeness (flash closeness_centrality; O(V) BFS batches —
    sample via the algorithms layer on huge graphs)."""
    import ray.data

    from graphscope_ray.pipelines.algorithms import (
        closeness_centrality as cc,
    )
    df = cc(graph._pool(), wf_improved=wf_improved)
    return Context(ray.data.from_pandas(df), graph)


def harmonic_centrality(graph: Graph) -> Context:
    import ray.data

    from graphscope_ray.pipelines.algorithms import (
        closeness_centrality as cc,
    )
    df = cc(graph._pool(), harmonic=True)
    return Context(ray.data.from_pandas(df), graph)


def k_center(graph: Graph, k: int = 3):
    """(centers, distance-Context) — FLASH greedy k-center."""
    from graphscope_ray.pipelines.algorithms import k_center as kc
    centers, mind = kc(graph._pool(), k)
    if graph._needs_relabel:
        m = {r["vid"]: r["node"]
             for r in graph._node_map().take_all()}
        centers = [m[c] for c in centers]
    return centers, Context(mind, graph)


def densest_subgraph(graph: Graph):
    """(density, members-Context) — FLASH densest-sub-2-approx: the
    max-core subgraph and its average-degree density."""
    from graphscope_ray.pipelines.structure import densest_subgraph_approx
    density, members = densest_subgraph_approx(graph._pool(),
                                               graph.edges_dataset())
    return density, Context(members, graph)


def kcore_decomposition(graph: Graph) -> Context:
    """Per-vertex core numbers (flash kcore_decomposition /
    networkx core_number)."""
    from graphscope_ray.pipelines.algorithms import core_decomposition
    return Context(core_decomposition(graph._pool()), graph)


def diameter_approximation(graph: Graph, k: int = 16) -> int:
    from graphscope_ray.pipelines.algorithms import (
        diameter_approximation as da,
    )
    return da(graph._pool(), k=k)


def minimum_spanning_forest(graph: Graph) -> ray.data.Dataset:
    """Kruskal minimum spanning forest (flash/measurement/msf.h:47-64 —
    local Kruskal per partition + merge reduce): (src, dst, weight)
    rows, deterministic under weight ties. Unweighted graphs get unit
    weights (nx semantics)."""
    from graphscope_ray.pipelines.msf import minimum_spanning_forest as msf

    return msf(graph.edges_dataset())


def _src_vid(graph: Graph, src) -> int:
    if graph._needs_relabel:
        hasher = graph.oid_hasher
        if hasher is None:
            from graphscope_ray.functions.hashing import hash64_strings
            hasher = hash64_strings
        return int(hasher(np.asarray([str(src)], object))
                   .view(np.int64)[0])
    return int(src)


def maximal_matching(graph: Graph) -> Context:
    """Greedy maximal matching (flash/matching/mm.h): per-vertex mate,
    -1 for unmatched."""
    from graphscope_ray.pipelines.algorithms import maximal_matching as mm
    return Context(mm(graph._pool()), graph)


def min_vertex_cover(graph: Graph) -> Context:
    """(vid, in_cover) per the greedy local-maxima rule
    (flash/matching/min-cover-greedy.h)."""
    from graphscope_ray.pipelines.algorithms import min_vertex_cover as mvc
    return Context(mvc(graph._pool()), graph)


def min_dominating_set(graph: Graph) -> Context:
    """(vid, in_set) per flash/matching/min-dominating-set.h."""
    from graphscope_ray.pipelines.algorithms import min_dominating_set as mds
    return Context(mds(graph._pool()), graph)


def min_edge_cover(graph: Graph) -> tuple[Context, int]:
    """((vid, mate) Context, cover size) per
    flash/matching/min-edge-cover.h."""
    from graphscope_ray.pipelines.algorithms import min_edge_cover as mec
    ds, size = mec(graph._pool())
    return Context(ds, graph), size


def onion_layers(graph: Graph) -> Context:
    """(vid, core, layer) — flash/core/onion-layer-ordering.h
    semantics (NOT networkx.onion_layers: layers advance per peel wave
    inside each core, same-core decrements only)."""
    from graphscope_ray.pipelines.algorithms import onion_layers as ol
    return Context(ol(graph._pool()), graph)


def degeneracy_ordering(graph: Graph) -> Context:
    """(vid, rank) peel-wave ranks, flash/core/degeneracy-ordering.h."""
    from graphscope_ray.pipelines.algorithms import degeneracy_ordering as dg
    return Context(dg(graph._pool()), graph)


def bridges(graph: Graph) -> ray.data.Dataset:
    """(u, v) bridge edges (flash/connectivity/bridge.h semantics via
    the XOR subtree sweep). Integer-vid graphs only return raw vids;
    map through the node table for relabeled graphs."""
    from graphscope_ray.pipelines.algorithms import bridges as br
    return br(graph._pool())


def articulation_points(graph: Graph) -> Context:
    """(vid) cut vertices (flash/connectivity/cut-point.h semantics via
    Tarjan–Vishkin)."""
    from graphscope_ray.pipelines.algorithms import articulation_points as ap
    return Context(ap(graph._pool()), graph)


def biconnected_components(graph: Graph) -> ray.data.Dataset:
    """(u, v, bcc) per-edge biconnected-component labels
    (flash/connectivity/bcc.h semantics, edge-keyed)."""
    from graphscope_ray.pipelines.algorithms import (
        biconnected_components as bcc,
    )
    return bcc(graph._pool())


def rectangle_count(graph: Graph) -> int:
    from graphscope_ray.pipelines.motifs import rectangle_count as rc
    return rc(graph.edges_dataset())


def diamond_count(graph: Graph) -> int:
    from graphscope_ray.pipelines.motifs import diamond_count as dc
    return dc(graph.edges_dataset())


def tailed_triangle_count(graph: Graph) -> int:
    from graphscope_ray.pipelines.motifs import tailed_triangle_count as tc
    return tc(graph.edges_dataset())


def three_path_count(graph: Graph) -> int:
    from graphscope_ray.pipelines.motifs import three_path_count as tp
    return tp(graph.edges_dataset())


def k_clique_count(graph: Graph, k: int) -> int:
    from graphscope_ray.pipelines.motifs import k_clique_count as kc
    return kc(graph.edges_dataset(), k)


def graph_coloring(graph: Graph) -> Context:
    """(vid, color) greedy coloring (flash/clustering/color.h)."""
    from graphscope_ray.pipelines.algorithms import graph_coloring as gc
    return Context(gc(graph._pool()), graph)


def fluid_communities(graph: Graph, k: int = 10) -> Context:
    """(vid, community) fluid communities
    (flash/clustering/fluid-community.h, deterministic seeds)."""
    from graphscope_ray.pipelines.algorithms import fluid_communities as fc
    return Context(fc(graph._pool(), k=k), graph)


def lpa_by_color(graph: Graph) -> Context:
    """(vid, label) color-scheduled label propagation
    (flash/clustering/lpa-by-color.h: Gauss-Seidel sweeps over the
    greedy-coloring's independent sets; deterministic min-tie)."""
    from graphscope_ray.pipelines.algorithms import lpa_by_color as lbc
    ds, _ = lbc(graph._pool())
    return Context(ds, graph)


def random_multi_bfs(graph: Graph, k: int = 64, seed: int = 42,
                     sources=None) -> Context:
    """(vid, res) max-distance-to-a-reaching-source samples
    (flash/traversal/random-multi-bfs.h; deterministic seeding)."""
    from graphscope_ray.pipelines.algorithms import random_multi_bfs as rmb
    return Context(rmb(graph._pool(), k=k, seed=seed, sources=sources), graph)


def k_core_search(graph: Graph, k: int) -> int:
    """|k-core| (flash/core/k-core-search.h GlobalRes)."""
    from graphscope_ray.pipelines.algorithms import k_core_search as kcs
    return kcs(graph._pool(), k)


def random_walks(graph: Graph, walk_length: int, num_walks: int = 1,
                 p: float = 1.0, q: float = 1.0,
                 seed: int = 42) -> ray.data.Dataset:
    """DeepWalk/node2vec walk corpus: (walk, start, path) Dataset with
    deterministic seeded picks (GLE-style embedding data prep). Runs
    on the session's resident shard pool (pipelines/walks.
    random_walks_pool — arcs never re-shuffle; only the frontier moves
    per level). p/q are the node2vec return/in-out parameters; 1,1 =
    uniform DeepWalk."""
    from graphscope_ray.pipelines.walks import random_walks_pool as rwp
    return rwp(graph._pool(), walk_length, num_walks=num_walks,
               p=p, q=q, seed=seed)


def node2vec_embeddings(graph: Graph, dim: int = 32,
                        walk_length: int = 10, num_walks: int = 4,
                        window: int = 2, epochs: int = 10,
                        p: float = 1.0, q: float = 1.0,
                        lr: float = 0.5, negatives: int = 5,
                        seed: int = 42):
    """Graph → node2vec walks → SGNS training, composed: returns a
    (vid, embedding) pandas DataFrame plus the per-epoch loss trace
    (the GLE-style vertex-embedding data product; pipelines/walks.py +
    functions/skipgram.py)."""
    from graphscope_ray.functions.skipgram import train_skipgram
    walks = random_walks(graph, walk_length, num_walks=num_walks,
                         p=p, q=q, seed=seed)   # pool engine
    return train_skipgram(walks, dim=dim, window=window, epochs=epochs,
                          lr=lr, negatives=negatives, seed=seed)


def negative_edges(graph: Graph, k: int = 5,
                   seed: int = 42) -> ray.data.Dataset:
    """Link-prediction negative samples: up to k deterministic
    non-edge (src, neg_dst) rows per vertex, uniform over the global
    vertex set, generated and filtered entirely inside the resident
    shard pool (stages/sampling.negative_edges)."""
    from graphscope_ray.stages.sampling import negative_edges as ne
    return ne(graph._pool(), k=k, seed=seed)


def gnn_node_classification(graph: Graph, features, node_field=0,
                            feat_fields: list | str | None = None,
                            label_field: str = "label",
                            conv: str = "sage", hidden: int = 16,
                            num_classes: int | None = None,
                            iters: int = 60, lr: float = 0.5,
                            weight_decay: float = 5e-4,
                            seed: int = 7) -> tuple[Context, dict]:
    """Full-batch GNN node classification on the session graph (the
    learning-engine full-graph mode, pipelines/gnn_train): train a
    2-layer GCN (``conv="gcn"``, undirected graphs) or GraphSAGE-mean
    classifier from a feature table and return ``(Context, metrics)``
    — the Context yields (node, pred, prob) with string oids mapped
    back like every other app result.

    ``features``: DataFrame/Dataset with the node id column
    (``node_field``), feature columns (``feat_fields`` — a list of
    numeric column names stacked in order, or ONE list-typed column
    name), and an optional integer label column (−1/null =
    unlabeled)."""
    normed, has_label = _gnn_feature_ds(graph, features, node_field,
                                        feat_fields, label_field)
    from graphscope_ray.pipelines.gnn_train import (gnn_predictions,
                                                    train_gnn)
    pool = graph._pool()
    _, metrics = train_gnn(
        pool, normed,
        hidden=hidden, num_classes=num_classes, conv=conv, iters=iters,
        lr=lr, weight_decay=weight_decay, seed=seed,
        label_col="label" if has_label else None)
    preds = gnn_predictions(pool).materialize()
    pool.call_all("gnn_free")
    return Context(preds, graph), metrics


def _gnn_feature_ds(graph: Graph, features, node_field,
                    feat_fields, label_field):
    """Normalize a user feature table to the trainer's (vid, feat
    list<double>[, label]) layout, relabeling string oids like every
    other session input. Returns (Dataset, has_label)."""
    ds = _as_dataset(features)
    node_col = _first_col(ds, node_field)
    if feat_fields is None:
        feat_fields = [c for c in ds.schema().names
                       if c not in (node_col, label_field)]
    relabel = graph._needs_relabel
    hasher = graph.oid_hasher
    has_label = label_field in ds.schema().names
    list_col = feat_fields if isinstance(feat_fields, str) else None

    def norm(t: pa.Table) -> pa.Table:
        out = {"vid": _vids(t.column(node_col), relabel, hasher)}
        if list_col is not None:
            out["feat"] = t.column(list_col)
        else:
            mats = [t.column(c).cast(pa.float64()).to_numpy(
                zero_copy_only=False) for c in feat_fields]
            X = np.stack(mats, axis=1) if mats else np.empty(
                (t.num_rows, 0))
            out["feat"] = pa.array(list(X), pa.list_(pa.float64()))
        if has_label:
            out["label"] = t.column(label_field).cast(pa.int64())
        return pa.table(out)

    return ds.map_batches(norm, batch_format="pyarrow"), has_label


def gnn_node_classification_minibatch(
        graph: Graph, features, node_field=0,
        feat_fields: list | str | None = None,
        label_field: str = "label",
        hidden: int = 16, num_classes: int | None = None,
        fanouts: tuple[int, ...] = (10, 5), batch_size: int = 256,
        epochs: int = 5, lr: float = 0.1,
        weight_decay: float = 5e-4,
        seed: int = 7) -> tuple[Context, dict]:
    """Mini-batch neighbor-sampled GraphSAGE node classification (the
    100-TB-scale GNN path — GLE's sampled-training mode): each SGD
    step touches only the sampled 2-hop frontier of its seed batch;
    inference is one full-neighborhood forward pass. Same feature-
    table contract as :func:`gnn_node_classification`."""
    normed, has_label = _gnn_feature_ds(graph, features, node_field,
                                        feat_fields, label_field)
    if not has_label:
        raise ValueError("minibatch training needs a label column")
    from graphscope_ray.pipelines.gnn_train import (
        sage_minibatch_node_classification,
    )
    pool = graph._pool()
    preds_ds, metrics = sage_minibatch_node_classification(
        pool, normed, hidden=hidden, num_classes=num_classes,
        fanouts=fanouts, batch_size=batch_size, epochs=epochs, lr=lr,
        weight_decay=weight_decay, seed=seed)
    preds = preds_ds.materialize()
    pool.call_all("gnn_free")
    return Context(preds, graph), metrics
