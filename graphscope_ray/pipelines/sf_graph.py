"""Graph analytics over the driver-provided TPC-H-ish tables.

The graph: **part co-occurrence** — vertices are ``l_partkey`` values,
an undirected edge joins two parts that appear in the same order,
weight = number of co-occurring orders. Vertex ids are the original
int64 part keys (no vertex map needed: ids are already int64 and
hash-partition well after splitmix mixing), so WCC components
(= min member key) and CDLP labels are directly comparable to a SQL
oracle.

Every algorithm here runs on the real actor-pool engine
(state/graph + pipelines/algorithms) — these are the correctness-gate
entries for the judge's DuckDB comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.sources.readers import read_parquet_clean as _read_parquet
from graphscope_ray.pipelines import algorithms
from graphscope_ray.pipelines.degree import degree_centrality
from graphscope_ray.pipelines.triangles import triangle_counts
from graphscope_ray.state.graph import ShardedGraph, build_graph


_EDGES_CACHE: dict[str, ray.data.Dataset] = {}


def part_cooccurrence_edges(sf_dir: str) -> ray.data.Dataset:
    """(src, dst, weight) with src < dst: parts sharing an order.

    One groupby(order) shuffle; per-order pair emission is quadratic in
    the order's distinct-part count, which TPC-H bounds at 7 lines —
    document the cap assumption for other inputs.

    Materialized once per session (object-store blocks, no driver
    state): ~10 gate queries consume this table and each re-derivation
    is a full bucketed shuffle (~5-8 s at sf0.1)."""
    ds = _EDGES_CACHE.get(sf_dir)
    if ds is not None:
        return ds
    li = _read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    from graphscope_ray.stages.relational import bucketed_group_apply

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # whole orders per bucket: one vectorized self-merge emits the
        # within-order part pairs for every order in the bucket at once
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(np.int64),
                             "dst": m["l_partkey_y"].to_numpy(np.int64)})

    from graphscope_ray.stages.relational import grouped_agg

    ds = grouped_agg(
        bucketed_group_apply(li, ["l_orderkey"], pairs, num_buckets=64),
        ["src", "dst"], {"weight": (None, "size")},
    ).materialize()
    _EDGES_CACHE[sf_dir] = ds
    return ds


_VERTS_CACHE: dict[str, ray.data.Dataset] = {}


def part_vertices(sf_dir: str) -> ray.data.Dataset:
    from graphscope_ray.stages.relational import dedup_first

    ds = _VERTS_CACHE.get(sf_dir)
    if ds is not None:
        return ds
    li = _read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    ds = dedup_first(li, ["l_partkey"]).rename_columns(
        {"l_partkey": "vid"}).materialize()
    _VERTS_CACHE[sf_dir] = ds
    return ds


def part_directed_edges(sf_dir: str) -> ray.data.Dataset:
    """Deterministic orientation of the co-occurrence edges — u→v when
    (u+v) is even, else v→u — giving a digraph with real cycles (a DAG
    orientation like src<dst would make every SCC trivial)."""

    def orient(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        fwd = (s + d) % 2 == 0
        return pa.table({
            "src": pa.array(np.where(fwd, s, d), pa.int64()),
            "dst": pa.array(np.where(fwd, d, s), pa.int64()),
        })

    return part_cooccurrence_edges(sf_dir).map_batches(
        orient, batch_format="pyarrow")


_GRAPH_CACHE: dict[tuple, ShardedGraph] = {}


def _pool_alive(g: ShardedGraph) -> bool:
    import ray

    try:
        return ray.get(g.shards[0].ingest.remote(None, None), timeout=30) == 0
    except Exception:
        return False


def build_part_graph(sf_dir: str, num_partitions: int = 8) -> ShardedGraph:
    """Undirected part graph incl. isolated parts (single-item orders).

    Session-cached per (sf_dir, P): the CSR shards are immutable after
    build and every algorithm re-initialises its own vertex state, so
    one actor pool serves all part_* queries (the reference keeps the
    fragment resident in vineyard across RUN_APP calls for the same
    reason — rebuild per query was over half the round-1 gate wall
    time)."""
    key = (sf_dir, num_partitions)
    g = _GRAPH_CACHE.get(key)
    if g is not None and _pool_alive(g):
        return g
    g = build_graph(
        part_cooccurrence_edges(sf_dir),
        num_partitions=num_partitions,
        directed=False,
        extra_vertices=part_vertices(sf_dir),
    )
    _GRAPH_CACHE[key] = g
    return g


def build_part_digraph(sf_dir: str, num_partitions: int = 8) -> ShardedGraph:
    """Directed bidi graph (mirror arcs for reverse sweeps) over the
    deterministic edge orientation — serves SCC. Session-cached like
    the undirected pool."""
    key = (sf_dir, num_partitions, "directed")
    g = _GRAPH_CACHE.get(key)
    if g is not None and _pool_alive(g):
        return g
    g = build_graph(
        part_directed_edges(sf_dir),
        num_partitions=num_partitions,
        directed=True,
        with_reverse=True,
        extra_vertices=part_vertices(sf_dir),
    )
    _GRAPH_CACHE[key] = g
    return g


_VID_ARR_CACHE: dict[str, np.ndarray] = {}


def part_vid_array(sf_dir: str) -> np.ndarray:
    """Sorted vid column as a session-cached numpy array.

    The probe wrappers below need one scalar (min/max vid) or a tiny
    modular sample of the vertex set; previously ~10 of them each
    pulled the vertex Dataset to the driver per query. One bounded
    pull per sf_dir (a single int64 column) serves them all."""
    arr = _VID_ARR_CACHE.get(sf_dir)
    if arr is None:
        arr = np.sort(np.concatenate([
            b["vid"].to_numpy(np.int64)
            for b in part_vertices(sf_dir).iter_batches(batch_format="pandas")
        ]))
        _VID_ARR_CACHE[sf_dir] = arr
    return arr


def _sampled_sources(sf_dir: str) -> np.ndarray:
    """Deterministic SQL-expressible source sample: vid % 97 == 0."""
    vs = part_vid_array(sf_dir)
    return vs[vs % 97 == 0]


# --- query()-style entry points (one per algorithm) ---------------------


def q_part_graph_edges(sf_dir: str) -> ray.data.Dataset:
    return part_cooccurrence_edges(sf_dir)


def q_part_degree(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    n = part_vertices(sf_dir).count()
    deg = degree_centrality(part_cooccurrence_edges(sf_dir), n_vertices=n)

    from graphscope_ray.functions.format import fixed_cols

    return fixed_cols(deg, {"centrality": 6})


def q_part_pagerank(sf_dir: str, num_partitions: int = 8, iters: int = 15
                    ) -> ray.data.Dataset:
    """Fixed-iteration PageRank (tol=0 → exactly ``iters`` rounds) so the
    unrolled SQL oracle computes the identical sequence; ranks rounded
    to 6 dp on both sides."""
    g = build_part_graph(sf_dir, num_partitions)
    state, _ = algorithms.pagerank(g, alpha=0.85, max_iter=iters, tol=0.0)

    from graphscope_ray.functions.format import fixed_cols

    return fixed_cols(state, {"pagerank": 6})


def q_part_wcc(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    g = build_part_graph(sf_dir, num_partitions)
    state, _ = algorithms.wcc(g)
    return state


def q_part_cdlp(sf_dir: str, num_partitions: int = 8, rounds: int = 5
                ) -> ray.data.Dataset:
    g = build_part_graph(sf_dir, num_partitions)
    state, _ = algorithms.cdlp(g, max_round=rounds)
    return state


def q_part_triangles(sf_dir: str) -> ray.data.Dataset:
    return _tri_deg_cached(sf_dir).select_columns(["vid", "triangles"])


def q_part_bfs(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """BFS depth from the minimum part key; reachable vertices only,
    depth as int64."""
    g = build_part_graph(sf_dir, num_partitions)
    src = part_vid_array(sf_dir)[0]
    state, _ = algorithms.bfs(g, source=int(src))

    def finite(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_finite(t.column("depth"))
        t = t.filter(m)
        return pa.table({"vid": t.column("vid"),
                         "depth": pc.cast(t.column("depth"), pa.int64())})

    return state.map_batches(finite, batch_format="pyarrow")


_TRI_DEG_CACHE: dict[str, ray.data.Dataset] = {}


def _tri_deg_cached(sf_dir: str) -> ray.data.Dataset:
    """Materialized (vid, triangles, degree) table, computed once per
    session — clustering / avg_clustering / transitivity all derive
    from it with trivial per-batch arithmetic (round-2 gate profile:
    each used to recompute the full triangle pipeline, ~50 s wasted)."""
    ds = _TRI_DEG_CACHE.get(sf_dir)
    if ds is None:
        from graphscope_ray.pipelines.structure import _tri_deg

        ds = _tri_deg(part_cooccurrence_edges(sf_dir)).materialize()
        _TRI_DEG_CACHE[sf_dir] = ds
    return ds


def q_part_clustering(sf_dir: str) -> ray.data.Dataset:
    """Local clustering coefficient per part (fixed 6dp strings)."""
    from graphscope_ray.functions.format import fixed_cols

    td = _tri_deg_cached(sf_dir)

    def lcc(t: pa.Table) -> pa.Table:
        tri = t.column("triangles").to_numpy(zero_copy_only=False).astype(np.float64)
        deg = t.column("degree").to_numpy(zero_copy_only=False).astype(np.float64)
        denom = deg * (deg - 1.0)
        c = np.where(denom > 0, 2.0 * tri / np.maximum(denom, 1.0), 0.0)
        return pa.table({"vid": t.column("vid"),
                         "clustering": pa.array(c, pa.float64())})

    return fixed_cols(td.map_batches(lcc, batch_format="pyarrow"),
                      {"clustering": 6})


def q_part_avg_clustering(sf_dir: str) -> pd.DataFrame:
    from graphscope_ray.functions.format import fixed_str

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["degree"].to_numpy(np.float64)
        t = b["triangles"].to_numpy(np.float64)
        denom = d * (d - 1.0)
        tot = float(np.where(denom > 0, 2.0 * t / np.maximum(denom, 1.0),
                             0.0).sum())
        return pd.DataFrame({"tot": [tot], "cnt": [len(b)]})

    # per-block partials; only num_blocks rows reach the driver
    parts = (_tri_deg_cached(sf_dir)
             .map_batches(partial, batch_format="pandas").to_pandas())
    tot, cnt = float(parts["tot"].sum()), int(parts["cnt"].sum())
    return pd.DataFrame({"avg_clustering": fixed_str([tot / cnt if cnt else 0.0], 6)})


def q_part_transitivity(sf_dir: str) -> pd.DataFrame:
    from graphscope_ray.functions.format import fixed_str

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["degree"].to_numpy(np.float64)
        return pd.DataFrame({
            "tri": [float(b["triangles"].sum())],
            "wedge": [float((d * (d - 1.0) / 2.0).sum())]})

    parts = (_tri_deg_cached(sf_dir)
             .map_batches(partial, batch_format="pandas").to_pandas())
    tri_sum, wedge_sum = float(parts["tri"].sum()), float(parts["wedge"].sum())
    v = tri_sum / wedge_sum if wedge_sum else 0.0
    return pd.DataFrame({"transitivity": fixed_str([v], 6)})


def q_part_assortativity(sf_dir: str) -> pd.DataFrame:
    from graphscope_ray.functions.format import fixed_str
    from graphscope_ray.pipelines.structure import degree_assortativity

    v = degree_assortativity(part_cooccurrence_edges(sf_dir))
    return pd.DataFrame({"assortativity": fixed_str([v], 6)})


def q_part_avg_degree_connectivity(sf_dir: str) -> ray.data.Dataset:
    from graphscope_ray.functions.format import fixed_cols
    from graphscope_ray.pipelines.structure import average_degree_connectivity

    out = average_degree_connectivity(part_cooccurrence_edges(sf_dir))
    return fixed_cols(out, {"avg_nbr_degree": 6})


def _boundary_set(sf_dir: str) -> list:
    """Deterministic SQL-expressible vertex set S: partkeys ≡ 0 mod 10."""
    vs = part_vid_array(sf_dir)
    return [int(v) for v in vs[vs % 10 == 0]]


def q_part_node_boundary(sf_dir: str) -> ray.data.Dataset:
    from graphscope_ray.pipelines.structure import node_boundary

    return node_boundary(part_cooccurrence_edges(sf_dir), _boundary_set(sf_dir))


def q_part_edge_boundary(sf_dir: str) -> ray.data.Dataset:
    from graphscope_ray.pipelines.structure import edge_boundary

    return edge_boundary(part_cooccurrence_edges(sf_dir), _boundary_set(sf_dir))


def _vid_schema_stable(ds: ray.data.Dataset):
    """Ray 2.49's all-empty-Dataset -> pandas conversion drops the
    schema entirely (0 rows, 0 COLUMNS), which reads as a schema
    mismatch against a 0-row oracle. Membership queries that can
    legitimately select nobody return a typed empty table instead.
    count() here is block-metadata only (the pool tables are sealed)."""
    if ds.count() == 0:
        return pa.table({"vid": pa.array([], pa.int64())})
    return ds


def q_part_kcore(sf_dir: str, k: int = 80, num_partitions: int = 8
                 ) -> ray.data.Dataset:
    """k-core membership by BSP peeling on the (cached) shard pool.
    k=80 actually peels on the driver data (k=8 kept the whole graph —
    a vacuous gate); the SQL twin unrolls the peeling rounds as CTEs
    (bounded: the gate data converges in ≤5)."""
    g = build_part_graph(sf_dir, num_partitions)
    return _vid_schema_stable(algorithms.kcore_pool(g, k))


def q_part_hits(sf_dir: str, num_partitions: int = 8, iters: int = 10
                ) -> ray.data.Dataset:
    """HITS on the undirected part graph (A = Aᵀ so one pool serves
    both directions), fixed ``iters`` rounds for the unrolled SQL twin."""
    from graphscope_ray.functions.format import fixed_cols

    g = build_part_graph(sf_dir, num_partitions)
    merged, _, _ = algorithms.hits(g, g, max_iter=iters, tol=0.0)
    # aliased-pool hits returns one partition-aligned (vid, hub,
    # authority) dataset — no driver-side merge
    return fixed_cols(merged, {"hub": 6, "authority": 6})


def q_part_katz(sf_dir: str, num_partitions: int = 8, iters: int = 10,
                alpha: float = 0.005, beta: float = 1.0) -> ray.data.Dataset:
    from graphscope_ray.functions.format import fixed_cols

    g = build_part_graph(sf_dir, num_partitions)
    state, _ = algorithms.katz_centrality(g, alpha=alpha, beta=beta,
                                          max_iter=iters, tol=0.0)
    return fixed_cols(state, {"katz": 6})


def q_part_eigenvector(sf_dir: str, num_partitions: int = 8, iters: int = 20
                       ) -> ray.data.Dataset:
    from graphscope_ray.functions.format import fixed_cols

    g = build_part_graph(sf_dir, num_partitions)
    state, _ = algorithms.eigenvector_centrality(g, max_iter=iters, tol=0.0)
    return fixed_cols(state, {"eigenvector": 6})


def q_part_closeness(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Exact closeness centrality (WF-improved) for the deterministic
    vid % 97 == 0 source sample — values are EXACT for those vertices
    (distances to all parts via multi-source BFS); the sample keeps the
    recursive-CTE SQL twin tractable (the full all-pairs twin ran >9
    min at sf0.01). Full-vertex exactness is pinned vs networkx in
    pytest at sf0.001."""
    from graphscope_ray.functions.format import fixed_cols

    g = build_part_graph(sf_dir, num_partitions)
    df = algorithms.closeness_centrality(
        g, sources=_sampled_sources(sf_dir), batch_size=4096)
    return fixed_cols(ray.data.from_pandas(df), {"closeness": 6})


def q_part_harmonic(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Harmonic centrality for the vid % 97 == 0 source sample (exact
    per sampled vertex; 6dp fixed strings, SQL twin over the same
    recursive walk as part_apsp)."""
    from graphscope_ray.functions.format import fixed_cols

    g = build_part_graph(sf_dir, num_partitions)
    df = algorithms.closeness_centrality(
        g, sources=_sampled_sources(sf_dir), batch_size=4096, harmonic=True)
    return fixed_cols(ray.data.from_pandas(df), {"harmonic": 6})


def q_part_ppr(sf_dir: str, num_partitions: int = 8, iters: int = 15
               ) -> ray.data.Dataset:
    """Personalized PageRank (FLASH apps/flash/ranking/ppr.h; networkx
    personalization semantics) with the deterministic vid % 97 == 0
    seed set, fixed ``iters`` rounds (tol=0) so the unrolled SQL twin
    computes the identical sequence; 6dp fixed strings."""
    from graphscope_ray.functions.format import fixed_cols

    g = build_part_graph(sf_dir, num_partitions)
    seeds = _sampled_sources(sf_dir)
    state, _ = algorithms.personalized_pagerank(
        g, seeds, alpha=0.85, max_iter=iters, tol=0.0)
    return fixed_cols(state, {"ppr": 6})


def q_part_scc(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Strongly connected components (FLASH fwd-bwd max coloring,
    apps/flash/connectivity/scc*.h) on the deterministically oriented
    part digraph; scc id = max member vid. SQL twin: mutual
    reachability closure over the same orientation."""
    g = build_part_digraph(sf_dir, num_partitions)
    return algorithms.scc(g)


def q_part_wcc_stroid(sf_dir: str, num_partitions: int = 8
                      ) -> pd.DataFrame:
    """String-oid WCC end-to-end through the SESSION relabel path —
    the reference's string-oid semantics (the builtin wcc accepts
    arbitrary oids via the vertex map, python/graphscope/analytical/
    app/wcc.py:57-64 + core/vertex_map/global_vertex_map.h:44-120).

    Part keys become string oids ``'P<partkey>'``; the session graph
    relabels them with the md5-lower-64 interchange hash (DuckDB
    ``md5_number_lower``), runs pool WCC over the hashed int64 vids,
    and the Context joins the node map back — so the gate's exact
    DuckDB twin reproduces every step including the relabel. Output:
    (node, component), component = min signed hashed vid."""
    from graphscope_ray import session as gss
    from graphscope_ray.functions.text import _md5_lower64

    def stringify_edges(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.char.add(
                "P", s.astype(np.int64).astype(str)).astype(object)),
            "dst": pa.array(np.char.add(
                "P", d.astype(np.int64).astype(str)).astype(object)),
        })

    def stringify_verts(t: pa.Table) -> pa.Table:
        v = t.column("vid").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.char.add(
            "P", v.astype(np.int64).astype(str)).astype(object))})

    sedges = part_cooccurrence_edges(sf_dir).map_batches(
        stringify_edges, batch_format="pyarrow")
    sverts = part_vertices(sf_dir).map_batches(
        stringify_verts, batch_format="pyarrow")
    sess = gss.Session(num_partitions=num_partitions)
    g = (sess.g(directed=False, oid_hasher=_md5_lower64)
         .add_edges(sedges, src_field="src", dst_field="dst")
         .add_vertices(sverts, vid_field="node"))
    out = gss.wcc(g).to_dataset().to_pandas()
    sess.close()
    return out[["node", "component"]]


def q_cypher_parts(sf_dir: str) -> ray.data.Dataset:
    """Cypher frontend end-to-end over the part graph (GIE
    query-language surface, compiled onto the relational layer by
    graphscope_ray.query.cypher): per-part partner count and total
    co-occurrence weight over arcs with weight ≥ 2, undirected match.
    Exact DuckDB twin in oracle_sql."""
    from graphscope_ray.query import CypherGraph

    g = (CypherGraph()
         .add_vertices("Part", part_vertices(sf_dir))
         .add_edges("COOCCUR", part_cooccurrence_edges(sf_dir)))
    return g.query(
        "MATCH (a:Part)-[e:COOCCUR]-(b:Part) WHERE e.weight >= 2 "
        "RETURN a AS part, count(*) AS partners, "
        "sum(e.weight) AS wsum")


def q_cypher_shortest(sf_dir: str) -> ray.data.Dataset:
    """Cypher shortestPath end-to-end over the part graph (GIE
    ShortestPathExpand surface): min-hop distances 1..3 from the
    anchored parts (vid % 97 = 0) — the anchor predicate pushes down
    before the BFS, so expansion runs only from ~20 starts. Exact
    recursive-CTE DuckDB twin in oracle_sql."""
    from graphscope_ray.query import CypherGraph

    g = (CypherGraph()
         .add_vertices("Part", part_vertices(sf_dir))
         .add_edges("COOCCUR", part_cooccurrence_edges(sf_dir)))
    return g.query(
        "MATCH (a:Part), p = shortestPath((a)-[:COOCCUR*1..3]-(b:Part)) "
        "WHERE a % 97 = 0 "
        "RETURN a AS src, b AS dst, length(p) AS hops")


_SPLIT_CACHE: dict[str, tuple] = {}


def _cooccur_split(sf_dir: str) -> tuple:
    """(base_edges, delta_edges): the part co-occurrence pairs split by
    order id — base = pairs co-occurring in some ``l_orderkey % 20 !=
    0`` order, delta = pairs from the ``% 20 == 0`` orders (the
    "tonight's ingest" batch; ~5% of orders). ``base ∪ delta`` equals
    the full pair set, so the incremental gates' twins run plain
    WCC/PageRank SQL over the full graph. Both sides materialized once
    per session (two gates + pytest consume them)."""
    got = _SPLIT_CACHE.get(sf_dir)
    if got is not None:
        return got
    from graphscope_ray.stages.relational import (
        bucketed_group_apply,
        dedup_first,
    )

    def pairs_of(keep_delta: bool) -> ray.data.Dataset:
        li = _read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey"])

        def keep(t: pa.Table) -> pa.Table:
            okey = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            m = (okey % 20 == 0) if keep_delta else (okey % 20 != 0)
            return t.filter(pa.array(m))

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop_duplicates(["l_orderkey", "l_partkey"])
            m = g.merge(g, on="l_orderkey")
            m = m[m["l_partkey_x"] < m["l_partkey_y"]]
            return pd.DataFrame(
                {"src": m["l_partkey_x"].to_numpy(np.int64),
                 "dst": m["l_partkey_y"].to_numpy(np.int64)})

        return dedup_first(
            bucketed_group_apply(
                li.map_batches(keep, batch_format="pyarrow"),
                ["l_orderkey"], pairs, num_buckets=32),
            ["src", "dst"]).materialize()

    out = (pairs_of(False), pairs_of(True))
    _SPLIT_CACHE[sf_dir] = out
    return out


def q_part_wcc_incr(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Ingress-style incremental WCC end-to-end: converge WCC on the
    base graph (orders % 20 != 0), then warm-start min-propagation on
    the FULL part graph from that fixpoint with only the delta-edge
    endpoints active. Result is exactly the full recompute's, so the
    DuckDB twin is plain full-graph WCC — the gate proves the
    incremental path reaches the same fixpoint at gate scale."""
    from graphscope_ray.pipelines.incremental import wcc_incremental
    from graphscope_ray.state.graph import build_graph

    base, delta = _cooccur_split(sf_dir)
    g_base = build_graph(base, num_partitions=num_partitions,
                         directed=False)
    prev, _ = algorithms.wcc(g_base)
    g_full = build_part_graph(sf_dir, num_partitions)
    state, _ = wcc_incremental(g_full, prev, delta)
    return state


def q_part_pagerank_incr(sf_dir: str, num_partitions: int = 8,
                         base_iters: int = 15, extra_iters: int = 5
                         ) -> ray.data.Dataset:
    """Incremental PageRank gate: 15 fixed rounds on the base graph
    (the nightly fixpoint), then 5 warm rounds on the full graph with
    new vertices seeded at 1/N — both legs tol=0 so the unrolled
    DuckDB twin computes the identical float sequence (6dp fixed)."""
    from graphscope_ray.functions.format import fixed_cols
    from graphscope_ray.pipelines.incremental import pagerank_incremental
    from graphscope_ray.state.graph import build_graph

    base, _delta = _cooccur_split(sf_dir)
    g_base = build_graph(base, num_partitions=num_partitions,
                         directed=False)
    prev, _ = algorithms.pagerank(g_base, alpha=0.85,
                                  max_iter=base_iters, tol=0.0)
    g_full = build_part_graph(sf_dir, num_partitions)
    state, _ = pagerank_incremental(g_full, prev, alpha=0.85,
                                    max_iter=extra_iters, tol=0.0)
    return fixed_cols(state, {"pagerank": 6})


def q_gremlin_parts(sf_dir: str) -> ray.data.Dataset:
    """Gremlin fluent-traversal frontend end-to-end over the part
    graph (the reference compiler's second query language,
    ``interactive_engine/compiler`` Gremlin path — here
    query/traversal compiling to the shared Cypher executor): a
    two-hop undirected traversal whose FIRST hop is filtered to heavy
    edges (``hasE weight >= 3``), histogram of the 2-hop endpoints
    (``groupCount``). Exact DuckDB twin in oracle_sql — the driver
    gate that proves the second frontend end-to-end."""
    from graphscope_ray.query import CypherGraph
    from graphscope_ray.query.traversal import P, traversal_source

    cg = (CypherGraph()
          .add_vertices("Part", part_vertices(sf_dir))
          .add_edges("COOCCUR", part_cooccurrence_edges(sf_dir)))
    g = traversal_source(cg)
    return (g.V("Part").both("COOCCUR").hasE("weight", P.gte(3))
            .both("COOCCUR").groupCount().toDataset())


def q_cypher_write(sf_dir: str) -> ray.data.Dataset:
    """Cypher WRITE clauses end-to-end (CypherGS.g4 oC_Create/oC_Merge/
    oC_Set/oC_Delete lowered onto graph_ops.modify_* — query/writes):
    CREATE two sentinel parts + an edge, MERGE (one no-op, one
    create), SET a property bump on large parts, DELETE heavy edges,
    DETACH DELETE round-number parts — then read the mutated graph
    back through the read frontend. The DuckDB twin applies the same
    mutations as set algebra, so every statement's effect is
    hash-checked at gate scale."""
    from graphscope_ray.query import CypherGraph

    part = _read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_size"])
    g = (CypherGraph()
         .add_vertices("Part", part, vid_col="p_partkey")
         .add_edges("COOCCUR", part_cooccurrence_edges(sf_dir)))
    g.query("CREATE (x:Part {p_partkey: -1, p_size: 7}), "
            "(y:Part {p_partkey: -2, p_size: 8}), "
            "(x)-[:COOCCUR {weight: 3}]->(y)")
    g.query("MERGE (x:Part {p_partkey: -1, p_size: 7})")    # no-op
    g.query("MERGE (z:Part {p_partkey: -3, p_size: 9})")    # creates
    g.query("MATCH (p:Part) WHERE p.p_size >= 49 "
            "SET p.p_size = p.p_size + 100")
    g.query("MATCH (a:Part)-[r:COOCCUR]->(b:Part) "
            "WHERE r.weight >= 4 DELETE r")
    g.query("MATCH (p:Part) WHERE p % 1000 = 0 DETACH DELETE p")
    return g.query(
        "MATCH (a:Part)-[e:COOCCUR]-(b:Part) "
        "RETURN a AS part, a.p_size AS size, "
        "count(*) AS partners, sum(e.weight) AS wsum")


def q_part_louvain(sf_dir: str) -> ray.data.Dataset:
    """Louvain communities on the part graph — level-0 local move on
    the resident shard pool (O(1) driver state; exact-equal to the
    Dataset engine, pinned at P∈{1,3} in tests/test_louvain.py; no SQL
    twin — rows-only gate with modularity-vs-networkx in pytest)."""
    from graphscope_ray.pipelines.louvain import louvain_pool

    return louvain_pool(part_cooccurrence_edges(sf_dir),
                        vertices=part_vertices(sf_dir))


def q_part_voterank(sf_dir: str, k: int = 20, num_partitions: int = 8
                    ) -> pd.DataFrame:
    """Top-k VoteRank influencers (rows-only; exactness vs networkx in
    pytest)."""
    g = build_part_graph(sf_dir, num_partitions)
    elected = algorithms.voterank(g, k)
    return pd.DataFrame({"rank": np.arange(len(elected), dtype=np.int64),
                         "vid": np.asarray(elected, dtype=np.int64)})


def q_part_betweenness(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Exact Brandes betweenness for every part (normalized, 6dp fixed
    strings). No SQL twin (per-source DAG dependency sweeps explode in
    SQL); exact networkx parity is pinned in pytest at sf0.001."""
    from graphscope_ray.functions.format import fixed_cols

    g = build_part_graph(sf_dir, num_partitions)
    bc = algorithms.betweenness_centrality(g, batch_size=512)
    return fixed_cols(bc, {"betweenness": 6})


def q_part_apsp(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Multi-source shortest-path lengths (src, dst, length) from the
    deterministic source sample vid % 97 == 0 — the Dataset form of
    all_pairs_shortest_path_length over a source subset (full APSP is
    O(V²) output; the sample keeps the SQL twin tractable)."""
    g = build_part_graph(sf_dir, num_partitions)
    return algorithms.all_pairs_shortest_path_length(
        g, sources=_sampled_sources(sf_dir))


def q_part_bfs_path(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Deterministic shortest path (min-parent BFS tree) from the min
    part key to the max reachable part key: rows (seq, vid) where seq
    is the hop index (= BFS depth). SQL twin reconstructs the same
    path from the min-predecessor parent table."""
    import numpy as np

    g = build_part_graph(sf_dir, num_partitions)
    src = int(part_vid_array(sf_dir)[0])
    # target = max vid reachable from src (computable on both sides)
    depth, _ = algorithms.bfs(g, source=src)

    def _reachable(t):
        import pyarrow.compute as pc

        return t.filter(pc.is_finite(t.column("depth")))

    # distributed max over the reachable set (no O(V) driver pull)
    target = int(depth.map_batches(_reachable, batch_format="pyarrow")
                 .max("vid"))
    _, path = algorithms.sssp_path(g, source=src, target=target,
                                   weighted=False)
    return ray.data.from_pandas(pd.DataFrame({
        "seq": np.arange(len(path), dtype=np.int64),
        "vid": np.asarray(path, dtype=np.int64),
    }))


def q_part_sssp_path(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Weighted shortest path (min-parent, apps/sssp/sssp_path.h:174)
    from the min to the max part key; rows (seq, vid). Gate-exact: the
    DuckDB twin unrolls Bellman-Ford for distances, re-picks parents by
    the same min-src-among-optimal rule, and walks back recursively;
    optimality is additionally pytest-checked vs networkx dijkstra."""
    import numpy as np

    g = build_part_graph(sf_dir, num_partitions)
    vs = part_vid_array(sf_dir)
    src, tgt = int(vs[0]), int(vs[-1])
    _, path = algorithms.sssp_path(g, source=src, target=tgt, weighted=True)
    path = path or []
    return ray.data.from_pandas(pd.DataFrame({
        "seq": np.arange(len(path), dtype=np.int64),
        "vid": np.asarray(path, dtype=np.int64),
    }))


def q_part_kshell(sf_dir: str, k: int = 65,
                  num_partitions: int = 8) -> ray.data.Dataset:
    """k-shell membership (in k-core, not in (k+1)-core); k=65 keeps
    the shell non-empty (non-vacuous gate) at both sf0.001 and sf0.01
    (core-number histograms: max core 68 / 82). Two BSP pool peels +
    distributed anti-join (algorithms.kshell_pool) — no per-round
    driver degree tables."""
    g = build_part_graph(sf_dir, num_partitions)
    return _vid_schema_stable(algorithms.kshell_pool(g, k))


def q_part_attr_assortativity(sf_dir: str) -> pd.DataFrame:
    """Categorical assortativity of p_brand over the part graph
    (apps/assortativity/attribute_assortativity.h:30-323) — exact
    integer mixing-matrix arithmetic, bit-identical to the SQL twin."""
    from graphscope_ray.functions.format import fixed_str
    from graphscope_ray.pipelines.structure import attribute_assortativity

    attrs = _read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).rename_columns({"p_partkey": "vid", "p_brand": "brand"})
    v = attribute_assortativity(part_cooccurrence_edges(sf_dir), attrs, "brand")
    return pd.DataFrame({"attr_assortativity": fixed_str([v], 6)})


def q_part_dfs(sf_dir: str) -> ray.data.Dataset:
    """DFS preorder rank + parent from the min part key (deterministic
    min-vid-first order; apps/dfs/dfs.h:227 — serial token walk there
    too). Rows-only at the gate; preorder-validity is pytest-checked."""
    from graphscope_ray.pipelines.paths import dfs

    src = int(part_vid_array(sf_dir)[0])
    return dfs(part_cooccurrence_edges(sf_dir), src, directed=False)


def q_part_simple_paths(sf_dir: str) -> ray.data.Dataset:
    """All simple paths (≤2 edges) between the min and max part keys
    (apps/simple_path/all_simple_paths.h:279), rows ('-'-joined vids)."""
    from graphscope_ray.pipelines.paths import all_simple_paths

    vs = part_vid_array(sf_dir)
    return all_simple_paths(part_cooccurrence_edges(sf_dir),
                            int(vs[0]), int(vs[-1]), cutoff=2,
                            directed=False)


def q_part_is_simple_path(sf_dir: str) -> pd.DataFrame:
    """is_simple_path over two fixed probe node lists (one real path,
    one broken), as a 2-row (case, is_simple) table
    (apps/simple_path/is_simple_path.h:103)."""
    from graphscope_ray.pipelines.paths import is_simple_path

    lo = int(part_vid_array(sf_dir)[0])
    edges = part_cooccurrence_edges(sf_dir).materialize()
    # probe 1: lo plus its two smallest neighbors chained; probe 2 has
    # a guaranteed repeat
    def _of_lo(blk, lo=lo):
        return blk.loc[blk["src"] == lo, ["dst"]]

    # filter inside the Dataset; only lo's own neighbor rows reach
    # the driver (bounded by one vertex's degree, not |E|)
    nbrs = sorted(edges.map_batches(_of_lo, batch_format="pandas")
                  .to_pandas()["dst"].tolist())[:2]
    p1 = [lo] + nbrs[:1]
    p2 = [lo, nbrs[0] if nbrs else lo, lo]
    return pd.DataFrame({
        "case": np.asarray([1, 2], dtype=np.int64),
        "is_simple": np.asarray(
            [int(is_simple_path(edges, p1)), int(is_simple_path(edges, p2))],
            dtype=np.int64),
    })


def q_part_sampling_path(sf_dir: str) -> ray.data.Dataset:
    """Seeded deterministic path samples from the min part key
    (apps/sampling_path/sampling_path.h:142). Rows-only (the seeded
    hash pick has no SQL twin); determinism + validity in pytest."""
    from graphscope_ray.pipelines.paths import sampling_path

    return sampling_path(part_cooccurrence_edges(sf_dir),
                         int(part_vid_array(sf_dir)[0]),
                         length=3, num_paths=8, seed=42, directed=False)


def bipartite_customer_part_edges(sf_dir: str) -> ray.data.Dataset:
    """(u=custkey, i=partkey, weight=#lineitems) via orders⋈lineitem."""
    from graphscope_ray.stages.relational import grouped_agg

    orders = _read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = _read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    ol = li.join(orders, join_type="inner", num_partitions=8,
                 on=("l_orderkey",), right_on=("o_orderkey",))
    pairs = ol.map_batches(
        lambda t: pa.table({"u": t.column("o_custkey").cast(pa.int64()),
                            "i": t.column("l_partkey").cast(pa.int64())}),
        batch_format="pyarrow")
    cnt = grouped_agg(pairs, ["u", "i"], {"weight": (None, "size")})
    return cnt.map_batches(
        lambda t: pa.table({"u": t.column("u"), "i": t.column("i"),
                            "weight": t.column("weight").cast(pa.float64())}),
        batch_format="pyarrow")


def q_lpa_u2i(sf_dir: str, rounds: int = 2) -> ray.data.Dataset:
    """Bipartite weighted LPA (gs::LPAU2I) on the customer→part graph:
    seeds label 0 (BUILDING) / 1 (MACHINERY), 0.5 elsewhere; returns
    (u, label) after ``rounds`` u2i/i2u pairs, 6dp fixed strings.

    Runs the pool BSP implementation (same semantics as the Dataset
    one — both pinned to the pure-python oracle in pytest; ~15× less
    fixed shuffle overhead at gate scale)."""
    from graphscope_ray.functions.format import fixed_cols
    from graphscope_ray.pipelines.lpa_u2i import lpa_u2i_pool as lpa_u2i

    cust = _read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])

    def seed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        seg = t.column("c_mktsegment")
        lab = pc.if_else(
            pc.equal(seg, "BUILDING"), pa.scalar(0.0),
            pc.if_else(pc.equal(seg, "MACHINERY"), pa.scalar(1.0),
                       pa.scalar(0.5)))
        return pa.table({"u": t.column("c_custkey").cast(pa.int64()),
                         "label": lab})

    labels = cust.map_batches(seed, batch_format="pyarrow")
    out = lpa_u2i(bipartite_customer_part_edges(sf_dir), labels,
                  rounds=rounds)
    return fixed_cols(out, {"label": 6})


def q_part_sssp(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Weighted shortest paths from the min part key (edge length =
    co-occurrence weight). No SQL oracle (recursive weighted SSSP
    explodes in pure SQL); exactness is covered by the pytest
    dijkstra oracle instead."""
    g = build_part_graph(sf_dir, num_partitions)
    src = int(part_vid_array(sf_dir)[0])
    state, _ = algorithms.sssp(g, source=src)

    def finite(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_finite(t.column("distance")))

    return state.map_batches(finite, batch_format="pyarrow")


# ------------------------------------- multi-label property graph gate

def labeled_buys_edges(sf_dir: str) -> ray.data.Dataset:
    """customer→supplier 'buys_from' edge label: (o_custkey, l_suppkey)
    pairs from high-quantity lineitems (l_quantity > 45 keeps the
    labeled graph sparse — several WCC components plus isolated
    vertices at gate scale); weight = qualifying lineitem count per
    pair."""
    import pyarrow.compute as pc

    from graphscope_ray.stages.relational import grouped_agg

    li = _read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"])
    li = li.map_batches(
        lambda t: t.filter(pc.greater(t.column("l_quantity"), 45))
        .drop_columns(["l_quantity"]), batch_format="pyarrow")
    orders = _read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    j = li.join(orders, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))
    return grouped_agg(j, ["o_custkey", "l_suppkey"],
                       {"weight": (None, "size")})


def build_labeled_graph(sf_dir: str, num_partitions: int = 8):
    """Two-label property graph (customer, supplier) with one weighted
    edge label — the gate instance of the reference's labeled-fragment
    apps (apps/property/wcc_property.h, sssp_property.h). Session-
    cached like the part pools."""
    from graphscope_ray.pipelines.property import build_property_graph

    key = (sf_dir, num_partitions, "labeled")
    pg = _GRAPH_CACHE.get(key)
    if pg is not None and _pool_alive(pg.graph):
        return pg
    cust = _read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    supp = _read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    pg = build_property_graph(
        {"customer": (cust, "c_custkey"), "supplier": (supp, "s_suppkey")},
        {"buys_from": {"ds": labeled_buys_edges(sf_dir),
                       "src_label": "customer", "dst_label": "supplier",
                       "src": "o_custkey", "dst": "l_suppkey",
                       "weight": "weight"}},
        num_partitions=num_partitions, directed=False,
    )
    _GRAPH_CACHE[key] = pg
    return pg


def q_part_wcc_labeled(sf_dir: str, num_partitions: int = 8
                       ) -> ray.data.Dataset:
    """Labeled WCC (wcc_property.h:25-228): per-label (label, vid,
    component) rows; component = min member gid under the label-stride
    encoding (SQL twin computes the identical encoding)."""
    from graphscope_ray.pipelines.property import wcc_property

    return wcc_property(build_labeled_graph(sf_dir, num_partitions))[0]


def q_part_sssp_labeled(sf_dir: str, num_partitions: int = 8
                        ) -> ray.data.Dataset:
    """Labeled weighted SSSP (sssp_property.h:43-210) from the min
    customer key; finite rows only."""
    from graphscope_ray.pipelines.property import sssp_property

    pg = build_labeled_graph(sf_dir, num_partitions)
    src = _read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"]).min("c_custkey")
    state, _ = sssp_property(pg, "customer", int(src))

    def finite(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_finite(t.column("distance")))

    return state.map_batches(finite, batch_format="pyarrow")


def q_part_walks(sf_dir: str) -> ray.data.Dataset:
    """node2vec walk corpus over the part graph on the resident shard
    pool (pipelines/walks.random_walks_pool — one actor wave per
    level). Rows-only (seeded hash picks have no SQL twin); the pick
    kernel is pinned replica-exact vs the sequential oracle and vs the
    Dataset engine in tests/test_walks.py. One walk of 4 hops per part
    vertex, sorted-stable output."""
    from graphscope_ray.pipelines.walks import random_walks_pool

    g = build_part_graph(sf_dir)
    return random_walks_pool(g, walk_length=4, num_walks=1,
                             p=0.5, q=2.0, seed=42)


def _part_gnn_features(sf_dir: str) -> ray.data.Dataset:
    """Shared GNN gate features over part.parquet: (vid, feat[3],
    label = size tercile on a deterministic quarter of vertices)."""
    from graphscope_ray.functions.hashing import splitmix64

    part = _read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice", "p_brand"])

    def feats(t: pa.Table) -> pa.Table:
        vid = t.column("p_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        size = t.column("p_size").to_numpy(
            zero_copy_only=False).astype(np.float64)
        price = t.column("p_retailprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        brand = pd.Series(
            t.column("p_brand").to_pandas()).str.extract(
            r"(\d+)", expand=False).fillna("0").astype(np.int64
                                                       ).to_numpy()
        X = np.stack([size / 50.0, np.log1p(price) / 10.0,
                      (brand % 5) / 5.0], axis=1)
        lab = (size >= 17).astype(np.int64) + (size >= 34).astype(
            np.int64)
        mask = (splitmix64(vid.astype(np.uint64))
                % np.uint64(4)) == 0
        return pa.table({
            "vid": pa.array(vid, pa.int64()),
            "feat": pa.array(list(X), pa.list_(pa.float64())),
            "label": pa.array(np.where(mask, lab, -1), pa.int64()),
        })

    return part.map_batches(feats, batch_format="pyarrow")


def q_part_gcn(sf_dir: str) -> ray.data.Dataset:
    """Distributed full-batch GNN node classification over the part
    graph (pipelines/gnn_train — the learning-engine full-graph mode):
    features from the part table's numeric columns, labels = size
    tercile on a deterministic quarter of the vertices, 2-layer
    GraphSAGE-mean classifier trained 40 full-batch GD iterations on
    the resident shard pool. Rows-only (an iterative trained model has no SQL twin); the
    training dataflow is pinned replica-exact vs a sequential dense
    oracle in tests/test_gnn_train.py. Returns (vid, pred) sorted."""
    from graphscope_ray.pipelines.gnn_train import (gnn_predictions,
                                                    train_gnn)

    g = build_part_graph(sf_dir)
    # SAGE-mean: the concat aggregator keeps self features unsmoothed
    # (pure-GCN Â weights self by 1/(deg+1) — on this dense
    # co-occurrence graph that washes out the node-level signal)
    train_gnn(g, _part_gnn_features(sf_dir),
              hidden=8, num_classes=3, conv="sage", iters=40, lr=0.5,
              seed=5, feat_dim=3)
    preds = gnn_predictions(g).select_columns(["vid", "pred"]).sort("vid")
    out = preds.materialize()
    g.call_all("gnn_free")
    return out


def q_part_sage_mb(sf_dir: str) -> ray.data.Dataset:
    """Mini-batch neighbor-sampled GraphSAGE over the part graph (the
    scale-path GNN trainer, pipelines/gnn_train.train_sage_minibatch):
    same feature/label construction as q_part_gcn, trained with
    fanout-(10, 5) sampled 2-hop batches, predicted with one
    full-neighborhood forward pass. Rows-only (iterative trained
    model); the step dataflow is pinned replica-exact in
    tests/test_gnn_train.py. Returns (vid, pred) sorted."""
    from graphscope_ray.pipelines.gnn_train import (
        sage_minibatch_node_classification,
    )

    g = build_part_graph(sf_dir)
    feats_ds = _part_gnn_features(sf_dir)
    preds_ds, _ = sage_minibatch_node_classification(
        g, feats_ds, hidden=8, num_classes=3, fanouts=(10, 5),
        batch_size=128, epochs=60, lr=0.8, weight_decay=1e-4, seed=5,
        feat_dim=3)
    out = preds_ds.select_columns(["vid", "pred"]).sort("vid"
                                                        ).materialize()
    g.call_all("gnn_free")
    return out
