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
