"""Pure-python / networkx oracles (FIXTURES.md F4).

These mirror the reference's test strategy (SURVEY §5): golden semantics
come from networkx (whose PageRank the reference explicitly follows,
docs/analytical_engine/builtin_algorithms.md § PageRank) and from
30-line direct reimplementations for WCC/CDLP.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import networkx as nx


def nx_graph(edges, directed):
    g = nx.DiGraph() if directed else nx.Graph()
    for s, d in edges:
        g.add_edge(s, d)
    return g


def oracle_pagerank(edges, vertices, directed, alpha=0.85, max_iter=100, tol=1e-6):
    """Pure-python replica of networkx._pagerank_python (scipy isn't
    installed); the reference follows the same formula
    (apps/pagerank/pagerank_networkx.h:117-161)."""
    g = nx_graph(edges, directed)
    g.add_nodes_from(vertices)
    d = g.to_directed() if not directed else g
    n = d.number_of_nodes()
    outdeg = dict(d.out_degree())
    x = {v: 1.0 / n for v in d}
    p = {v: 1.0 / n for v in d}
    dangling = [v for v in d if outdeg[v] == 0]
    for _ in range(max_iter):
        xlast = x
        x = dict.fromkeys(xlast, 0.0)
        danglesum = alpha * sum(xlast[v] for v in dangling)
        for u in d:
            if outdeg[u]:
                share = alpha * xlast[u] / outdeg[u]
                for _, nbr in d.out_edges(u):
                    x[nbr] += share
        for v in d:
            x[v] += danglesum * p[v] + (1.0 - alpha) * p[v]
        err = sum(abs(x[v] - xlast[v]) for v in x)
        if err < n * tol:
            return x
    return x


def oracle_hits(edges, vertices, max_iter=100, tol=1e-8):
    """Pure-python replica of networkx._hits_python (scipy missing):
    a = Aᵀh, h = Aa, max-normalize both each iter, final sum-normalize."""
    g = nx.DiGraph()
    g.add_nodes_from(vertices)
    g.add_edges_from(edges)
    h = {v: 1.0 / g.number_of_nodes() for v in g}
    a = dict.fromkeys(h, 0.0)
    for _ in range(max_iter):
        hlast = h
        h = dict.fromkeys(hlast, 0.0)
        a = dict.fromkeys(hlast, 0.0)
        for n in hlast:
            for nbr in g[n]:
                a[nbr] += hlast[n]
        for n in a:
            for nbr in g[n]:
                h[n] += a[nbr]
        smax = max(h.values()) or 1.0
        h = {k: v / smax for k, v in h.items()}
        smax = max(a.values()) or 1.0
        a = {k: v / smax for k, v in a.items()}
        if sum(abs(h[n] - hlast[n]) for n in h) < tol:
            break
    sh = sum(h.values()) or 1.0
    sa = sum(a.values()) or 1.0
    return {k: v / sh for k, v in h.items()}, {k: v / sa for k, v in a.items()}


def oracle_wcc(edges, vertices):
    """component id = min vertex id in component (exact)."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    comps = defaultdict(list)
    for v in vertices:
        comps[find(v)].append(v)
    out = {}
    for members in comps.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def oracle_cdlp(edges, vertices, directed, max_round=10):
    """Sync LPA, most-frequent incoming label, min tie-break (LDBC CDLP).

    Arc semantics match the engine: each arc delivers src's label to
    dst; undirected graphs contribute both arcs."""
    arcs = list(edges)
    if not directed:
        arcs += [(d, s) for s, d in edges]
    in_nbrs = defaultdict(list)
    for s, d in arcs:
        in_nbrs[d].append(s)
    label = {v: v for v in vertices}
    for _ in range(max_round):
        new = {}
        changed = 0
        for v in vertices:
            nb = in_nbrs.get(v)
            if not nb:
                new[v] = label[v]
                continue
            cnt = Counter(label[u] for u in nb)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            # ties -> min label
            top = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == top)
            changed += new[v] != label[v]
        label = new
        if changed == 0:
            break
    return label


def oracle_triangles(edges, vertices):
    g = nx.Graph()
    g.add_nodes_from(vertices)
    g.add_edges_from(edges)
    return nx.triangles(g)


def oracle_bfs_depth(edges, vertices, source, directed):
    g = nx_graph(edges, directed)
    g.add_nodes_from(vertices)
    return nx.single_source_shortest_path_length(g, source)


def oracle_sssp(weighted_edges, vertices, source, directed):
    g = nx.DiGraph() if directed else nx.Graph()
    g.add_nodes_from(vertices)
    for s, d, w in weighted_edges:
        g.add_edge(s, d, weight=w)
    return nx.single_source_dijkstra_path_length(g, source)


def _undirected_adj(edges, vertices):
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    for v in vertices:
        adj[v]  # touch so isolated vertices exist
    return adj


def oracle_maximal_matching(edges, vertices):
    """Phase-exact pure-python replica of FLASH mm.h:44-77 under BSP
    snapshot semantics: propose max-id active neighbor, mutual ⇒
    matched, drop vertices with no active neighbors."""
    adj = _undirected_adj(edges, vertices)
    mate = {v: -1 for v in vertices}
    active = set(vertices)
    while active:
        p, new_a = {}, set()
        for v in active:
            nbrs = [u for u in adj[v] if u in active]
            if nbrs:
                p[v] = max(nbrs)
                new_a.add(v)
        for v in new_a:
            u = p[v]
            if u in new_a and p[u] == v:
                mate[v] = u
        active = {v for v in new_a if mate[v] == -1}
    return mate


def oracle_min_vertex_cover(edges, vertices):
    """Replica of FLASH min-cover-greedy.h:43-86 (snapshot rounds):
    lexicographic (residual degree, vid) local maxima join the cover."""
    adj = _undirected_adj(edges, vertices)
    c = {v: False for v in vertices}
    d = {v: len(adj[v]) for v in vertices}
    active = {v for v in vertices if d[v] > 0}
    while active:
        sel = [v for v in active
               if not any(not c[u] and (d[u], u) > (d[v], v)
                          for u in adj[v])]
        for v in sel:
            c[v] = True
        dec = Counter()
        for v in sel:
            for u in adj[v]:
                if not c[u]:
                    dec[u] += 1
        for u, k in dec.items():
            d[u] -= k
        active = {v for v in vertices if not c[v] and d[v] > 0}
    return c


def oracle_min_dominating_set(edges, vertices):
    """Replica of FLASH min-dominating-set.h:46-95: 2-hop
    (undominated-neighbor count, vid) maxima join the set."""
    adj = _undirected_adj(edges, vertices)
    dom = {v: False for v in vertices}
    inset = {v: False for v in vertices}
    cnt = {v: len(adj[v]) for v in vertices}
    mid = {v: v for v in vertices}
    while True:
        live = [v for v in vertices if not dom[v]]
        if not live:
            break
        for _ in range(2):  # two synchronized max-propagation hops
            new = {}
            for v in live:
                best = (cnt[v], mid[v])
                for u in adj[v]:
                    if not dom[u] and (cnt[u], mid[u]) > best:
                        best = (cnt[u], mid[u])
                new[v] = best
            for v in live:
                cnt[v], mid[v] = new[v]
        sel = [v for v in live if mid[v] == v]
        for v in sel:
            inset[v] = True
            dom[v] = True
        for v in sel:
            for u in adj[v]:
                dom[u] = True
        for v in vertices:
            if not dom[v]:
                mid[v] = v
                cnt[v] = sum(1 for u in adj[v] if not dom[u])
    return inset


def oracle_min_edge_cover(edges, vertices):
    """Replica of FLASH min-edge-cover.h:44-93: propose to the
    min-(degree, vid) unmatched neighbor; mutual (or stale-proposal
    one-sided) handshakes assign mates; proposals at newly matched
    targets retry. Returns (mate_map, cover_size)."""
    adj = _undirected_adj(edges, vertices)
    deg = {v: len(adj[v]) for v in vertices}
    mate = {v: -1 for v in vertices}
    done = {v: False for v in vertices}
    # None = no proposal (a -1 sentinel would collide with real
    # negative vids — hashed string-node ids use the full int64 range)
    p = {v: None for v in vertices}
    active = set(vertices)
    while active:
        new_a = set()
        for v in active:
            cands = [(deg[u], u) for u in adj[v] if not done[u]]
            p[v] = min(cands)[1] if cands else None
            if p[v] is not None:
                new_a.add(v)
        snap = dict(p)
        matched = set()
        for v in vertices:
            if not done[v] and snap[v] is not None:
                u = snap[v]
                if u in new_a and snap[u] == v:
                    mate[v] = u
                    done[v] = True
                    matched.add(v)
        retry = set()
        for v in vertices:
            if not done[v] and p[v] is not None and p[v] in matched:
                retry.add(v)
                p[v] = None
        active = retry
    size = (sum(1 for v in vertices if done[v]) // 2
            + sum(1 for v in vertices if not done[v] and deg[v] > 0))
    return mate, size


def oracle_onion_layers(edges, vertices):
    """Replica of FLASH onion-layer-ordering.h:44-100 ranking phase on
    exact core numbers: wave i ranks unranked vertices whose count of
    same-or-higher-core neighbors ≤ core; ranked vertices decrement
    same-core unranked neighbors. Returns {vid: (core, layer)}."""
    import networkx as nx

    adj = _undirected_adj(edges, vertices)
    g = nx.Graph()
    g.add_nodes_from(vertices)
    g.add_edges_from((a, b) for a, b in edges if a != b)
    core = nx.core_number(g)
    d = {v: sum(1 for u in adj[v] if core[u] >= core[v]) for v in vertices}
    rank = {v: -1 for v in vertices}
    i = 0
    while True:
        sel = [v for v in vertices if rank[v] == -1 and d[v] <= core[v]]
        if not sel:
            break
        for v in sel:
            rank[v] = i
        for v in sel:
            for u in adj[v]:
                if core[u] == core[v] and rank[u] == -1:
                    d[u] -= 1
        i += 1
    return {v: (core[v], rank[v]) for v in vertices}


def oracle_degeneracy_ordering(edges, vertices):
    """Replica of FLASH degeneracy-ordering.h:43-110: wave i ranks
    unranked vertices with residual degree ≤ degeneracy."""
    import networkx as nx

    adj = _undirected_adj(edges, vertices)
    g = nx.Graph()
    g.add_nodes_from(vertices)
    g.add_edges_from((a, b) for a, b in edges if a != b)
    dg = max(nx.core_number(g).values()) if g.number_of_edges() else 0
    d = {v: len(adj[v]) for v in vertices}
    rank = {v: -1 for v in vertices}
    i = 0
    while True:
        sel = [v for v in vertices if rank[v] == -1 and d[v] <= dg]
        if not sel:
            break
        for v in sel:
            rank[v] = i
        for v in sel:
            for u in adj[v]:
                if rank[u] == -1:
                    d[u] -= 1
        i += 1
    return rank


def oracle_graph_coloring(edges, vertices):
    """Replica of FLASH color.h:43-82: synchronized rounds of
    cc = mex(colors of higher-(deg, vid) neighbors)."""
    adj = _undirected_adj(edges, vertices)
    deg = {v: len(adj[v]) for v in vertices}
    c = {v: 0 for v in vertices}
    while True:
        cc = {}
        for v in vertices:
            used = {c[u] for u in adj[v]
                    if (deg[u], u) > (deg[v], v)}
            i = 0
            while i in used:
                i += 1
            cc[v] = i
        if cc == c:
            return c
        c = cc


def oracle_fluid_communities(edges, vertices, seeds, max_rounds=100):
    """BSP-synchronized replica of FLASH fluid-community.h with the
    engine's deterministic seed list."""
    adj = _undirected_adj(edges, vertices)
    s = len(seeds)
    lab = {v: -1 for v in vertices}
    for i, sd in enumerate(sorted(seeds)):
        lab[sd] = i
    l1 = {v: -2 for v in vertices}
    l2 = {v: -2 for v in vertices}
    cnt = [sum(1 for v in vertices if lab[v] == i) for i in range(s)]
    for _ in range(max_rounds):
        inv = [1.0 / c if c > 0 else 0.0 for c in cnt]
        snapshot = dict(lab)
        new = {}
        for v in vertices:
            d = [0.0] * s
            if snapshot[v] >= 0:
                d[snapshot[v]] += inv[snapshot[v]]
            for u in adj[v]:
                if snapshot[u] >= 0:
                    d[snapshot[u]] += inv[snapshot[u]]
            cur = snapshot[v]
            curd = d[cur] if cur >= 0 else 0.0
            for i in range(s):
                if d[i] > 1e-10 and (cur == -1 or d[i] > curd + 1e-10):
                    cur, curd = i, d[i]
            new[v] = cur
        moving = 0
        for v in vertices:
            if snapshot[v] >= 0:
                l2[v] = l1[v]
                l1[v] = snapshot[v]
            if new[v] != snapshot[v] and new[v] != l2[v]:
                moving += 1
        cnt = [sum(1 for v in vertices if new[v] == i) for i in range(s)]
        lab = new
        if moving == 0:
            break
    return lab
