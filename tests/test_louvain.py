"""Louvain: recovers planted communities; modularity competitive with
networkx's reference implementation (which is randomized — compare
modularity scores, not exact partitions)."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines.louvain import louvain


def _modularity(g, comm_map):
    comms = {}
    for v, c in comm_map.items():
        comms.setdefault(c, set()).add(v)
    return nx.community.modularity(g, comms.values())


def _planted(n_comm=4, size=12, p_in=0.8, p_out=0.02, seed=3):
    rng = np.random.default_rng(seed)
    edges = set()
    n = n_comm * size
    for i in range(n):
        for j in range(i + 1, n):
            same = (i // size) == (j // size)
            if rng.random() < (p_in if same else p_out):
                edges.add((i, j))
    return sorted(edges), n


def test_louvain_planted_communities():
    edges, n = _planted()
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    got = louvain(ds).to_pandas()
    comm_map = dict(zip(got["vid"], got["community"]))
    q_ours = _modularity(g, comm_map)
    nx_comms = nx.community.louvain_communities(g, seed=7)
    q_nx = nx.community.modularity(g, nx_comms)
    # competitive modularity (nx is randomized; ours deterministic)
    assert q_ours >= 0.9 * q_nx, (q_ours, q_nx)
    # planted structure recovered: most vertices share a community with
    # the majority of their planted block
    blocks = {}
    for v, c in comm_map.items():
        blocks.setdefault(v // 12, []).append(c)
    agree = 0
    for b, cs in blocks.items():
        top = max(set(cs), key=cs.count)
        agree += cs.count(top)
    assert agree / len(comm_map) >= 0.9


def _louvain_replica(edge_list, max_levels=5, max_rounds=12,
                     vertices=None):
    """Independent pure-python Louvain with the engines' pinned sweep
    semantics (synchronous rounds, parity gating on vid%2, strict
    +1e-12 margin vs the stay score, ties to the smaller community id,
    two empty parity rounds end a level, contraction by community,
    final min-member relabel). Integer edge weights keep every float
    comparison exact across implementations."""
    from collections import defaultdict

    ew: dict = defaultdict(float)
    for u, v, w in edge_list:
        a, b = (u, v) if u <= v else (v, u)
        ew[(a, b)] += float(w)
    vids0 = sorted({x for e in ew for x in e})
    assign = {v: v for v in vids0}
    level = dict(ew)
    for _ in range(max_levels):
        kv: dict = defaultdict(float)
        for (u, v), w in level.items():
            if u == v:
                kv[u] += 2 * w
            else:
                kv[u] += w
                kv[v] += w
        m2 = sum(kv.values())
        if m2 == 0:
            break
        adj: dict = defaultdict(list)
        for (u, v), w in level.items():
            if u != v:
                adj[u].append((v, w))
                adj[v].append((u, w))
        comm = {v: v for v in kv}
        moves_total = 0
        empty = 0
        for rnd in range(max_rounds):
            parity = rnd % 2
            tot: dict = defaultdict(float)
            for v, c in comm.items():
                tot[c] += kv[v]
            moves = {}
            for v in kv:
                if v % 2 != parity:
                    continue
                wvc: dict = defaultdict(float)
                for n, w in adj[v]:
                    wvc[comm[n]] += w
                cold, k = comm[v], kv[v]
                stay = wvc.get(cold, 0.0) - (tot[cold] - k) * k / m2
                best_s = best_c = None
                for cn in sorted(wvc):
                    te = tot[cn] - (k if cn == cold else 0.0)
                    s = wvc[cn] - te * k / m2
                    if best_s is None or s > best_s:
                        best_s, best_c = s, cn
                if (best_c is not None and best_c != cold
                        and best_s > stay + 1e-12):
                    moves[v] = best_c
            if not moves:
                empty += 1
                if empty >= 2:
                    break
                continue
            empty = 0
            comm.update(moves)
            moves_total += len(moves)
        if moves_total == 0:
            break
        assign = {v: comm[assign[v]] for v in assign}
        nxt: dict = defaultdict(float)
        for (u, v), w in level.items():
            cu, cv = comm[u], comm[v]
            a, b = (cu, cv) if cu <= cv else (cv, cu)
            nxt[(a, b)] += w
        level = dict(nxt)
    groups: dict = defaultdict(list)
    for v, c in assign.items():
        groups[c].append(v)
    out = {}
    for vs in groups.values():
        mn = min(vs)
        for v in vs:
            out[v] = mn
    for v in (vertices or []):
        out.setdefault(v, v)
    return out


@pytest.mark.parametrize("P", [1, 3])
def test_louvain_engines_match_sequential_replica(P):
    """Both engines == the independent pure-python replica, exactly —
    the sequential-replica parity gate the round-3 verdict asked for
    (lpa_by_color precedent)."""
    from graphscope_ray.pipelines.louvain import louvain_pool

    edges, n = _planted(n_comm=3, size=8, seed=11)
    elist = [(a, b, 1.0) for a, b in edges]
    want = _louvain_replica(elist, vertices=range(n))
    df = pd.DataFrame({"src": [a for a, _ in edges],
                       "dst": [b for _, b in edges]})
    verts = pd.DataFrame({"vid": np.arange(n, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(P)
    vds = ray.data.from_pandas(verts)
    got_ds = louvain(ds, vertices=vds).to_pandas()
    assert dict(zip(got_ds["vid"], got_ds["community"])) == want
    got_pool = louvain_pool(ds, num_partitions=P,
                            vertices=vds).to_pandas()
    assert dict(zip(got_pool["vid"], got_pool["community"])) == want


def test_louvain_replica_weighted_and_selfloop_levels():
    """Weighted input (integer weights) with a bridge vertex — checks
    the contraction levels (which create self-loops) against the
    replica end-to-end."""
    elist = [(0, 1, 3.0), (1, 2, 3.0), (0, 2, 3.0),
             (3, 4, 3.0), (4, 5, 3.0), (3, 5, 3.0),
             (2, 3, 1.0), (5, 6, 1.0), (6, 7, 2.0)]
    want = _louvain_replica(elist)
    df = pd.DataFrame({"src": [a for a, _, _ in elist],
                       "dst": [b for _, b, _ in elist],
                       "weight": [w for _, _, w in elist]})
    got = louvain(ray.data.from_pandas(df)).to_pandas()
    assert dict(zip(got["vid"], got["community"])) == want


def test_louvain_deterministic():
    edges, n = _planted(seed=5)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    a = louvain(ds).to_pandas().sort_values("vid").reset_index(drop=True)
    b = louvain(ds).to_pandas().sort_values("vid").reset_index(drop=True)
    assert (a["community"].to_numpy() == b["community"].to_numpy()).all()


def _pairs_ds(rows, weighted=False):
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    df = pd.DataFrame(rows, columns=cols)
    df[["src", "dst"]] = df[["src", "dst"]].astype(np.int64)
    return ray.data.from_pandas(df)


def _as_map(ds):
    out = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    return dict(zip(out["vid"].astype(int), out["community"].astype(int)))


@pytest.mark.parametrize("P", [1, 3])
def test_pool_matches_dataset_engine_exactly(P):
    from graphscope_ray.pipelines.louvain import louvain_pool
    edges, _ = _planted(n_comm=3, size=8, seed=11)
    ds = _pairs_ds(edges)
    want = _as_map(louvain(ds))
    got = _as_map(louvain_pool(ds, num_partitions=P))
    assert got == want


@pytest.mark.parametrize("P", [1, 3])
def test_pool_selfloops_weights_and_isolated(P):
    from graphscope_ray.pipelines.louvain import louvain_pool
    # integer weights + a self-loop + parallel edge (summed by canon)
    rows = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0), (3, 3, 4.0),
            (3, 4, 1.0), (4, 5, 2.0), (5, 3, 1.0), (0, 1, 1.0)]
    ds = _pairs_ds(rows, weighted=True)
    verts = ray.data.from_pandas(pd.DataFrame(
        {"vid": np.arange(9, dtype=np.int64)}))
    want = _as_map(louvain(ds, vertices=verts))
    got = _as_map(louvain_pool(ds, num_partitions=P, vertices=verts))
    assert got == want
    # isolated vertices 6..8 are singletons
    for v in (6, 7, 8):
        assert got[v] == v


def test_pool_no_move_graph():
    # two disconnected vertices joined by nothing that improves
    # modularity: a single edge graph — still must match
    from graphscope_ray.pipelines.louvain import louvain_pool
    ds = _pairs_ds([(10, 20)])
    assert _as_map(louvain_pool(ds, num_partitions=2)) == _as_map(
        louvain(ds))
