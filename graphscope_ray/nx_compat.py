"""NetworkX-compatibility surface (reference: python/graphscope/nx —
drop-in ``nx.Graph``/``DiGraph`` over DynamicFragment plus the
builtin-accelerated wrappers in nx/algorithms/builtin.py).

Usage mirrors graphscope.nx::

    from graphscope_ray import nx_compat as gnx
    G = gnx.Graph()
    G.add_edges_from([(1, 2), (2, 3)])
    gnx.builtin.pagerank(G)            # {node: score}
    gnx.builtin.clustering(G)          # {node: coefficient}

Mutations buffer on the driver (the reference's DynamicFragment path is
likewise the convenience layer for graphs that fit a mutation log —
grape_instance.cc:361-452); the 100-TB path is the Dataset/session API.
Each algorithm call seals the buffered graph into the shard pool once
and caches it until the next mutation. Node ids may be any consistently
typed hashables (ints pass through; everything else relabels via the
session layer's deterministic hash — don't mix ``1`` and ``"1"``).

``builtin`` is this module itself (``gnx.builtin.pagerank`` ≡
``gnx.pagerank``), matching how reference users alias it.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

from graphscope_ray import session as _sess_mod


class Graph:
    """Undirected mutable graph buffer (reference nx/classes/graph.py)."""

    directed = False

    def __init__(self, edges=None):
        self._nodes: list = []
        self._edges: list = []          # (u, v, weight-or-None)
        self._attrs: dict = {}          # node -> {attr: value}
        self._version = 0
        self._built = None              # (version, session.Graph)
        if edges is not None:
            self.add_edges_from(edges)

    # -- mutation ---------------------------------------------------------
    def add_node(self, n, **attrs) -> None:
        self._nodes.append(n)
        if attrs:
            self._attrs.setdefault(n, {}).update(attrs)
        self._version += 1

    def add_nodes_from(self, ns) -> None:
        for n in ns:
            if isinstance(n, tuple) and len(n) == 2 and isinstance(n[1],
                                                                   dict):
                self.add_node(n[0], **n[1])
            else:
                self._nodes.append(n)
        self._version += 1

    def set_node_attributes(self, values: dict, name: str) -> None:
        for n, v in values.items():
            self._attrs.setdefault(n, {})[name] = v
        self._version += 1

    def add_edge(self, u, v, weight: float | None = None) -> None:
        self._edges.append((u, v, weight))
        self._version += 1

    def add_edges_from(self, es) -> None:
        for e in es:
            if len(e) == 3 and isinstance(e[2], dict):
                self._edges.append((e[0], e[1], e[2].get("weight")))
            elif len(e) == 3:
                self._edges.append((e[0], e[1], e[2]))
            else:
                self._edges.append((e[0], e[1], None))
        self._version += 1

    def number_of_nodes(self) -> int:
        ns = set(self._nodes)
        for u, v, _ in self._edges:
            ns.add(u)
            ns.add(v)
        return len(ns)

    def number_of_edges(self) -> int:
        seen = set()
        for u, v, _ in self._edges:
            key = (u, v) if self.directed else (min(u, v), max(u, v))
            seen.add(key)
        return len(seen)

    # -- sealing ------------------------------------------------------------
    def _graph(self) -> "_sess_mod.Graph":
        """Session-layer Graph for the current mutation version."""
        if self._built is not None and self._built[0] == self._version:
            return self._built[1]
        if self._built is not None:
            # mutation invalidated the seal: release the stale pool's
            # shard actors instead of leaking them for the session
            import ray

            stale = getattr(self._built[1], "_sealed", {})
            for g in stale.values():
                self._built[1].session._pools.pop((id(g), "fwd"), None)
                self._built[1].session._pools.pop((id(g), "rev"), None)
                for s in g.shards:
                    ray.kill(s, no_restart=True)
        if not self._edges:
            raise ValueError("empty graph: add edges first")
        weighted = any(w is not None for _, _, w in self._edges)
        rows = [(u, v, 1.0 if w is None else float(w))
                for u, v, w in self._edges]
        # nx multi-add semantics: last write wins per (u, v)
        edf = pd.DataFrame(rows, columns=["src", "dst", "weight"])
        if not self.directed:
            lo = edf[["src", "dst"]].min(axis=1)
            hi = edf[["src", "dst"]].max(axis=1)
            edf = pd.DataFrame({"src": lo, "dst": hi,
                                "weight": edf["weight"]})
        edf = edf.drop_duplicates(["src", "dst"], keep="last")
        edf = edf[edf["src"] != edf["dst"]]          # pool stores no loops
        g = _default_session().g(directed=self.directed)
        if not weighted:
            edf = edf[["src", "dst"]]
        g = g.add_edges(edf, src_field="src", dst_field="dst",
                        weight_field="weight" if weighted else None)
        nodes = pd.unique(pd.Series(
            self._nodes + [u for u, v, _ in self._edges]
            + [v for _, v, _ in self._edges]))
        g = g.add_vertices(pd.DataFrame({"id": nodes}), vid_field="id")
        self._built = (self._version, g)
        return g


class DiGraph(Graph):
    directed = True


_SESSION = None


def _default_session() -> "_sess_mod.Session":
    global _SESSION
    if _SESSION is None or _SESSION._closed:
        _SESSION = _sess_mod.session()
    return _SESSION


# ------------------------------------------------------------- builtins
# Shapes follow networkx returns (dicts keyed by node), like the
# reference's nx/algorithms/builtin.py wrappers.

def pagerank(G: Graph, alpha: float = 0.85, max_iter: int = 100,
             tol: float = 1e-6) -> dict:
    return _sess_mod.pagerank_nx(G._graph(), alpha=alpha,
                                 max_iter=max_iter, tol=tol).to_dict()


def connected_components(G: Graph):
    """Iterator of vertex sets, networkx-shaped."""
    comp = _sess_mod.wcc(G._graph()).to_dict()
    groups: dict = {}
    for node, c in comp.items():
        groups.setdefault(c, set()).add(node)
    for c in sorted(groups):
        yield groups[c]


def wcc(G: Graph) -> dict:
    return _sess_mod.wcc(G._graph()).to_dict()


def weakly_connected_components(G: "DiGraph"):
    """Iterator of vertex sets over the undirected support of a
    directed graph (networkx shape)."""
    und = Graph()
    und._nodes, und._edges = list(G._nodes), list(G._edges)
    und._version = 1
    yield from connected_components(und)


def strongly_connected_components(G: "DiGraph"):
    """Iterator of vertex sets (engine scc: FLASH fwd-bwd coloring)."""
    comp = _sess_mod.scc(G._graph()).to_dict()
    groups: dict = {}
    for node, c in comp.items():
        groups.setdefault(c, set()).add(node)
    for c in sorted(groups):
        yield groups[c]


def lpa(G: Graph, max_round: int = 10) -> dict:
    return _sess_mod.lpa(G._graph(), max_round=max_round).to_dict()


def triangles(G: Graph) -> dict:
    return {k: int(v) for k, v in
            _sess_mod.triangles(G._graph()).to_dict().items()}


def clustering(G: Graph) -> dict:
    ctx = _sess_mod.clustering(G._graph())
    df = ctx.to_dataframe()
    key = "node" if "node" in df.columns else "vid"
    return dict(zip(df[key], df["clustering"]))


def degree_centrality(G: Graph) -> dict:
    ctx = _sess_mod.degree_centrality(G._graph())
    df = ctx.to_dataframe()
    key = "node" if "node" in df.columns else "vid"
    return dict(zip(df[key], df["centrality"]))


def eigenvector_centrality(G: Graph, max_iter: int = 100,
                           tol: float = 1e-6) -> dict:
    return _sess_mod.eigenvector_centrality(
        G._graph(), tolerance=tol, max_round=max_iter).to_dict()


def katz_centrality(G: Graph, alpha: float = 0.1, beta: float = 1.0,
                    max_iter: int = 100, tol: float = 1e-6) -> dict:
    return _sess_mod.katz_centrality(
        G._graph(), alpha=alpha, beta=beta, tolerance=tol,
        max_round=max_iter).to_dict()


def hits(G: Graph, max_iter: int = 100, tol: float = 1e-8,
         normalized: bool = True):
    ctx = _sess_mod.hits(G._graph(), tolerance=tol, max_round=max_iter,
                         normalized=normalized)
    df = ctx.to_dataframe()
    key = "node" if "node" in df.columns else "vid"
    return (dict(zip(df[key], df["hub"])),
            dict(zip(df[key], df["authority"])))


def single_source_shortest_path_length(G: Graph, source) -> dict:
    d = _sess_mod.bfs(G._graph(), src=source).to_dict()
    return {k: int(v) for k, v in d.items() if np.isfinite(v)}


def single_source_dijkstra_path_length(G: Graph, source) -> dict:
    d = _sess_mod.sssp(G._graph(), src=source).to_dict()
    return {k: v for k, v in d.items() if np.isfinite(v)}


def k_core(G: Graph, k: int) -> set:
    """Vertex set of the k-core (the reference returns the induced
    subgraph; the vertex set carries the same information here)."""
    df = _sess_mod.k_core(G._graph(), k=k).to_dataframe()
    key = "node" if "node" in df.columns else "vid"
    return set(df[key])


def k_shell(G: Graph, k: int) -> set:
    df = _sess_mod.k_shell(G._graph(), k=k).to_dataframe()
    key = "node" if "node" in df.columns else "vid"
    return set(df[key])


def voterank(G: Graph, number_of_nodes: int = 0) -> list:
    df = _sess_mod.voterank(
        G._graph(), num_of_nodes=number_of_nodes).to_dataframe()
    key = "node" if "node" in df.columns else "vid"
    return list(df.sort_values("rank")[key])


def degree_assortativity_coefficient(G: Graph) -> float:
    return _sess_mod.degree_assortativity_coefficient(G._graph())


def average_degree_connectivity(G: Graph) -> dict:
    ds = _sess_mod.average_degree_connectivity(G._graph()).to_dataset()
    df = ds.to_pandas()
    return dict(zip(df["k"].astype(int), df["avg_nbr_degree"]))


def average_shortest_path_length(G: Graph) -> float:
    return _sess_mod.average_shortest_path_length(G._graph())


def is_simple_path(G: Graph, nodes: list) -> bool:
    return _sess_mod.is_simple_path(G._graph(), nodes)


def articlerank(G: Graph, damping: float = 0.85,
                max_iters: int = 20) -> dict:
    return _sess_mod.articlerank(G._graph(), damping=damping,
                                 max_iters=max_iters).to_dict()


def maximal_independent_set(G: Graph) -> set:
    df = _sess_mod.maximal_independent_set(G._graph()).to_dataframe()
    key = "node" if "node" in df.columns else "vid"
    return set(df[key])


def diameter_approximation(G: Graph, k: int = 16) -> int:
    return _sess_mod.diameter_approximation(G._graph(), k=k)


def closeness_centrality(G: Graph) -> dict:
    return _sess_mod.closeness_centrality(G._graph()).to_dict()


def harmonic_centrality(G: Graph) -> dict:
    return _sess_mod.harmonic_centrality(G._graph()).to_dict()


def core_number(G: Graph) -> dict:
    return {k: int(v) for k, v in
            _sess_mod.kcore_decomposition(G._graph()).to_dict().items()}


def densest_subgraph(G: Graph):
    """(density, vertex set) of the max-core 2-approx subgraph."""
    density, ctx = _sess_mod.densest_subgraph(G._graph())
    df = ctx.to_dataframe()
    key = "node" if "node" in df.columns else "vid"
    return density, set(df[key])


def minimum_spanning_edges(G: Graph) -> list:
    """nx.minimum_spanning_edges(..., algorithm='kruskal') shape:
    sorted (u, v, weight) triples of the forest."""
    g = G._graph()
    df = _sess_mod.minimum_spanning_forest(g).to_pandas()
    m = _vidmap(g)
    return sorted(zip(_nodes_of(m, df["src"]), _nodes_of(m, df["dst"]),
                      df["weight"]))


def _vidmap(g) -> dict | None:
    """vid→node dict for relabelled graphs (None = identity). The nx
    layer's graphs are driver-buffered by construction, so a driver
    dict is in-contract here (the Dataset surfaces use joins)."""
    m = g._node_map()
    if m is None:
        return None
    return {r["vid"]: r["node"] for r in m.take_all()}


def _nodes_of(m, vids):
    return list(vids) if m is None else [m[v] for v in vids]


def in_degree_centrality(G: DiGraph) -> dict:
    return _degree_centrality_mode(G, "in")


def out_degree_centrality(G: DiGraph) -> dict:
    return _degree_centrality_mode(G, "out")


def _degree_centrality_mode(G: Graph, mode: str) -> dict:
    from graphscope_ray.pipelines.degree import degree_centrality as dc
    g = G._graph()
    df = dc(g.edges_dataset(), g._pool().n_vertices, mode=mode).to_pandas()
    m = _vidmap(g)
    out = {(_n if m is None else m[_n]): c
           for _n, c in zip(df["vid"], df["centrality"])}
    # vertices with no arcs in this direction: centrality 0
    for v in (set(G._nodes) | {u for u, _, _ in G._edges}
              | {w for _, w, _ in G._edges}):
        out.setdefault(v, 0.0)
    return out


def transitivity(G: Graph) -> float:
    from graphscope_ray.pipelines.structure import transitivity as tr
    return tr(G._graph().edges_dataset())


def average_clustering(G: Graph) -> float:
    from graphscope_ray.pipelines.structure import average_clustering as ac
    g = G._graph()
    return ac(g.edges_dataset(), n_vertices=g._pool().n_vertices)


def node_boundary(G: Graph, nbunch) -> set:
    from graphscope_ray.pipelines.structure import node_boundary as nb
    g = G._graph()
    s = [_sess_mod._src_vid(g, n) for n in nbunch]
    vids = nb(g.edges_dataset(), s).to_pandas()["vid"]
    return set(_nodes_of(_vidmap(g), vids))


def edge_boundary(G: Graph, nbunch) -> list:
    from graphscope_ray.pipelines.structure import edge_boundary as eb
    g = G._graph()
    s = [_sess_mod._src_vid(g, n) for n in nbunch]
    df = eb(g.edges_dataset(), s).to_pandas()
    m = _vidmap(g)
    return sorted(zip(_nodes_of(m, df["u"]), _nodes_of(m, df["v"])))


def has_path(G: Graph, source, target) -> bool:
    from graphscope_ray.pipelines.algorithms import sssp_has_path
    g = G._graph()
    return sssp_has_path(g._pool(), _sess_mod._src_vid(g, source),
                         _sess_mod._src_vid(g, target))


def shortest_path(G: Graph, source, target) -> list:
    """ONE shortest path source→target (unweighted, the engine's
    deterministic min-parent pick; networkx also returns an arbitrary
    one). Raises if unreachable, like networkx."""
    from graphscope_ray.pipelines.algorithms import sssp_path
    g = G._graph()
    _, path = sssp_path(g._pool(), _sess_mod._src_vid(g, source),
                        _sess_mod._src_vid(g, target), weighted=False)
    if path is None:
        raise ValueError(f"no path between {source} and {target}")
    return _nodes_of(_vidmap(g), path)


def bfs_predecessors(G: Graph, source) -> dict:
    """{node: predecessor} over the BFS tree (deterministic min-parent;
    networkx yields an iterator whose parent choice is order-dependent,
    so tests check tree validity, not equality)."""
    import numpy as np

    from graphscope_ray.pipelines.algorithms import sssp_path
    g = G._graph()
    src = _sess_mod._src_vid(g, source)
    table, _ = sssp_path(g._pool(), src, None, weighted=False)
    df = table.to_pandas()
    df = df[np.isfinite(df["distance"]) & (df["vid"] != src)]
    m = _vidmap(g)
    return dict(zip(_nodes_of(m, df["vid"]), _nodes_of(m, df["parent"])))


def bfs_tree(G: Graph, source) -> "DiGraph":
    t = DiGraph()
    t.add_node(source)
    t.add_edges_from((p, c) for c, p in bfs_predecessors(G, source).items())
    return t


def bfs_edges(G: Graph, source) -> list:
    """Tree edges (parent, child) sorted by child — the engine's
    deterministic min-parent BFS tree (networkx yields traversal
    order, which is representation-dependent; the edge SET matches
    a valid BFS tree either way)."""
    return sorted((p, c) for c, p in bfs_predecessors(G, source).items())


def bfs_successors(G: Graph, source) -> dict:
    """{parent: [children...]} over the BFS tree."""
    out: dict = {}
    for c, p in bfs_predecessors(G, source).items():
        out.setdefault(p, []).append(c)
    return {p: sorted(cs) for p, cs in out.items()}


def all_pairs_shortest_path_length(G: Graph) -> dict:
    from graphscope_ray.pipelines.algorithms import (
        all_pairs_shortest_path_length as apsp,
    )
    g = G._graph()
    df = apsp(g._pool()).to_pandas()
    m = _vidmap(g)
    out: dict = {}
    for s, d, ln in zip(_nodes_of(m, df["src"]), _nodes_of(m, df["dst"]),
                        df["length"]):
        out.setdefault(s, {})[d] = int(ln)
    return out


def all_simple_paths(G: Graph, source, target, cutoff: int) -> list:
    from graphscope_ray.pipelines.paths import (
        all_simple_paths as asp,
    )
    g = G._graph()
    ds = asp(g.edges_dataset(), _sess_mod._src_vid(g, source),
             _sess_mod._src_vid(g, target), cutoff=cutoff,
             directed=G.directed)
    m = _vidmap(g)
    return sorted(_nodes_of(m, (int(x) for x in r["path"].split("-")))
                  for r in ds.take_all())


get_all_simple_paths = all_simple_paths


def betweenness_centrality(G: Graph, normalized: bool = True) -> dict:
    from graphscope_ray.pipelines.algorithms import (
        betweenness_centrality as bc,
    )
    g = G._graph()
    df = bc(g._pool(), normalized=normalized).to_pandas()
    m = _vidmap(g)
    return dict(zip(_nodes_of(m, df["vid"]), df["betweenness"]))


# gnx.builtin.<fn> aliases this module (reference users import builtin)
builtin = sys.modules[__name__]


def _attr_dataset(G: Graph, g, attribute: str):
    import pandas as pd
    import ray.data

    items = [(n, a[attribute]) for n, a in G._attrs.items()
             if attribute in a]
    if not items:
        raise KeyError(f"no node carries attribute {attribute!r}")
    return ray.data.from_pandas(pd.DataFrame({
        "vid": [_sess_mod._src_vid(g, n) for n, _ in items],
        attribute: [v for _, v in items]}))


def attribute_assortativity_coefficient(G: Graph, attribute: str) -> float:
    from graphscope_ray.pipelines.structure import attribute_assortativity
    g = G._graph()
    return attribute_assortativity(g.edges_dataset(),
                                   _attr_dataset(G, g, attribute),
                                   attribute)


def numeric_assortativity_coefficient(G: Graph, attribute: str) -> float:
    from graphscope_ray.pipelines.structure import numeric_assortativity
    g = G._graph()
    return numeric_assortativity(g.edges_dataset(),
                                 _attr_dataset(G, g, attribute),
                                 attribute)


def maximal_matching(G: Graph) -> set:
    """Set of matched (u, v) pairs, u-side arbitrary (the FLASH greedy
    max-id-handshake matching — deterministic, maximal)."""
    g = G._graph()
    df = _sess_mod.maximal_matching(g).to_dataset().to_pandas()
    m = _vidmap(g)
    key = "node" if "node" in df.columns else "vid"
    matched = df[df["matched"]]
    mates = _nodes_of(m, matched["mate"])
    seen = {frozenset((a, b)) for a, b in zip(matched[key], mates)}
    return {tuple(sorted(p, key=str)) for p in seen}


def min_vertex_cover(G: Graph) -> set:
    g = G._graph()
    df = _sess_mod.min_vertex_cover(g).to_dataset().to_pandas()
    key = "node" if "node" in df.columns else "vid"
    return set(df.loc[df["in_cover"], key])


def dominating_set(G: Graph) -> set:
    g = G._graph()
    df = _sess_mod.min_dominating_set(g).to_dataset().to_pandas()
    key = "node" if "node" in df.columns else "vid"
    return set(df.loc[df["in_set"], key])


def min_edge_cover_size(G: Graph) -> int:
    _, size = _sess_mod.min_edge_cover(G._graph())
    return size


def bridges(G: Graph) -> list:
    g = G._graph()
    df = _sess_mod.bridges(g).to_pandas()
    if not len(df):
        return []
    m = _vidmap(g)
    return sorted(tuple(sorted(p, key=str)) for p in
                  zip(_nodes_of(m, df["u"]), _nodes_of(m, df["v"])))


def articulation_points(G: Graph) -> set:
    g = G._graph()
    df = _sess_mod.articulation_points(g).to_dataset().to_pandas()
    if not len(df):
        return set()
    key = "node" if "node" in df.columns else "vid"
    return set(df[key])


def biconnected_components(G: Graph) -> list:
    """Vertex sets per biconnected component (networkx shape), derived
    from the per-edge labels."""
    g = G._graph()
    df = _sess_mod.biconnected_components(g).to_pandas()
    if not len(df):
        return []
    m = _vidmap(g)
    comps = {}
    for u, v, lab in zip(_nodes_of(m, df["u"]), _nodes_of(m, df["v"]),
                         df["bcc"]):
        comps.setdefault(lab, set()).update((u, v))
    return list(comps.values())


def degeneracy_ordering_ranks(G: Graph) -> dict:
    df = _sess_mod.degeneracy_ordering(G._graph()).to_dataset().to_pandas()
    key = "node" if "node" in df.columns else "vid"
    return dict(zip(df[key], df["rank"]))


def greedy_color(G: Graph) -> dict:
    """node → color (the FLASH fixpoint greedy — proper, deterministic;
    not networkx's sequential strategy ordering)."""
    return {k: int(v) for k, v in
            _sess_mod.graph_coloring(G._graph()).to_dict().items()}


def asyn_fluidc(G: Graph, k: int) -> list:
    """k communities as vertex sets (deterministic seeds; reference
    semantics, not networkx's random implementation)."""
    d = _sess_mod.fluid_communities(G._graph(), k=k).to_dict()
    comps = {}
    for v, c in d.items():
        if c >= 0:
            comps.setdefault(c, set()).add(v)
    return [comps[i] for i in sorted(comps)]


def random_walks(G: Graph, walk_length: int, num_walks: int = 1,
                 p: float = 1.0, q: float = 1.0, seed: int = 42) -> list:
    """node2vec/DeepWalk walks as node-label lists, sorted."""
    g = G._graph()
    ds = _sess_mod.random_walks(g, walk_length, num_walks=num_walks,
                                p=p, q=q, seed=seed)
    m = _vidmap(g)
    return sorted(_nodes_of(m, (int(x) for x in r["path"].split(",")))
                  for r in ds.take_all())


def all_simple_edge_paths(G: Graph, source, target_nodes,
                          cutoff: int | None = None) -> list:
    """Edge-tuple form of all_simple_paths
    (reference nx/algorithms/builtin.py:933; single node or iterable
    targets, networkx default cutoff = n-1)."""
    if cutoff is None:
        cutoff = G.number_of_nodes() - 1
    if isinstance(target_nodes, (list, tuple, set, frozenset)):
        targets = list(target_nodes)
    else:
        targets = [target_nodes]
    paths = []
    for t in targets:
        paths.extend(all_simple_paths(G, source, t, cutoff))
    return sorted(list(zip(pth[:-1], pth[1:])) for pth in paths)


def node2vec(G: Graph, dim: int = 32, walk_length: int = 10,
             num_walks: int = 4, window: int = 2, epochs: int = 10,
             p: float = 1.0, q: float = 1.0, seed: int = 42) -> dict:
    """node → embedding (numpy float64[dim]): walks on the resident
    pool + distributed SGNS (session.node2vec_embeddings)."""
    g = G._graph()
    emb, _ = _sess_mod.node2vec_embeddings(
        g, dim=dim, walk_length=walk_length, num_walks=num_walks,
        window=window, epochs=epochs, p=p, q=q, seed=seed)
    m = _vidmap(g)
    nodes = _nodes_of(m, emb["vid"])
    return dict(zip(nodes, emb["embedding"]))
