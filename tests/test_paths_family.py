"""DFS / simple-path family / sampling_path / lpa_u2i vs oracles."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines.lpa_u2i import lpa_u2i
from graphscope_ray.pipelines.paths import (
    all_simple_paths,
    dfs,
    is_simple_path,
    sampling_path,
)


@pytest.fixture(scope="module")
def pgraph():
    rng = np.random.default_rng(5)
    edges = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, 15, (40, 2)) if a != b})
    G = nx.Graph()
    G.add_edges_from(edges)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
    )).map_batches(lambda t: t.replace_schema_metadata(None),
                   batch_format="pyarrow")
    return G, ds


def _dfs_oracle(G, s):
    """Min-vid-first preorder DFS (the documented deterministic order)."""
    adj = {v: sorted(G.neighbors(v)) for v in G}
    visited, rank, parent = {s}, {s: 0}, {s: -1}
    stack, r = [(s, iter(adj[s]))], 1
    while stack:
        v, it = stack[-1]
        for u in it:
            if u not in visited:
                visited.add(u)
                rank[u], parent[u] = r, v
                r += 1
                stack.append((u, iter(adj[u])))
                break
        else:
            stack.pop()
    return rank, parent


def test_dfs_preorder(pgraph):
    G, ds = pgraph
    got = dfs(ds, 0, directed=False).to_pandas().set_index("vid")
    rank, parent = _dfs_oracle(G, 0)
    assert len(got) == len(rank)
    for v in rank:
        assert got.loc[v, "rank"] == rank[v]
        assert got.loc[v, "parent"] == parent[v]


def test_is_simple_path(pgraph):
    G, ds = pgraph
    p = nx.shortest_path(G, 0, 9)
    assert is_simple_path(ds, p) is True
    assert is_simple_path(ds, p + [p[0]]) is False  # repeat vertex
    assert is_simple_path(ds, [0, 999]) is False    # non-edge
    assert is_simple_path(ds, []) is False
    assert is_simple_path(ds, [0]) is True          # single existing node


def test_all_simple_paths(pgraph):
    G, ds = pgraph
    want = {"-".join(map(str, p))
            for p in nx.all_simple_paths(G, 0, 9, cutoff=4)}
    got = set(all_simple_paths(ds, 0, 9, cutoff=4).to_pandas()["path"])
    assert got == want


def test_sampling_path_deterministic_and_valid(pgraph):
    G, ds = pgraph
    s1 = sampling_path(ds, 0, 3, num_paths=5, seed=7, directed=False
                       ).to_pandas().sort_values("walk")
    s2 = sampling_path(ds, 0, 3, num_paths=5, seed=7, directed=False
                       ).to_pandas().sort_values("walk")
    assert s1["path"].tolist() == s2["path"].tolist()
    for pth in s1["path"]:
        hops = pth.split("-")
        assert len(hops) == 4
        for a, b in zip(hops, hops[1:]):
            assert G.has_edge(int(a), int(b))


def test_lpa_u2i_vs_reference_semantics():
    rng = np.random.default_rng(3)
    us = np.arange(10)
    its = np.arange(100, 120)
    edges = sorted({(int(rng.choice(us)), int(rng.choice(its)))
                    for _ in range(60)})
    w = {e: float(rng.integers(1, 5)) for e in edges}
    lab0 = {u: (0.0 if u % 4 == 0 else 1.0 if u % 4 == 1
                else round(float(rng.random()), 3)) for u in us}

    def oracle(rounds):
        lab = dict(lab0)
        outdeg = {u: sum(1 for a, _ in edges if a == u) for u in us}
        indeg = {i: sum(1 for _, b in edges if b == i) for i in its}
        ond = {u: sum(indeg[b] for a, b in edges if a == u) for u in us}
        for _ in range(rounds):
            ilab = {i: sum(lab[a] * w[(a, b)] for a, b in edges if b == i)
                    for i in its}
            tmp = {u: sum(ilab[b] * w[(a, b)] for a, b in edges if a == u)
                   for u in us}
            new = {}
            for u in us:
                lv = lab[u]
                if lv in (0.0, 1.0):
                    new[u] = lv
                elif ond[u] != outdeg[u]:
                    new[u] = (tmp[u] - outdeg[u] * lv) / (ond[u] - outdeg[u])
                else:
                    new[u] = lv
            lab = new
        return lab

    eds = ray.data.from_pandas(pd.DataFrame({
        "u": [a for a, _ in edges], "i": [b for _, b in edges],
        "weight": [w[e] for e in edges]})).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
    ul = ray.data.from_pandas(pd.DataFrame({
        "u": us, "label": [lab0[u] for u in us]})).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
    got = lpa_u2i(eds, ul, rounds=3).to_pandas().set_index("u")[
        "label"].to_dict()
    want = oracle(3)
    for u in us:
        assert got[u] == pytest.approx(want[u], abs=1e-9), u

    # the pool BSP twin matches the same oracle (and hence the Dataset
    # implementation) at several partition counts
    from graphscope_ray.pipelines.lpa_u2i import lpa_u2i_pool

    for P in (1, 3):
        gotp = lpa_u2i_pool(eds, ul, rounds=3, num_partitions=P
                            ).to_pandas().set_index("u")["label"].to_dict()
        assert set(gotp) == set(want)
        for u in us:
            assert gotp[u] == pytest.approx(want[u], abs=1e-9), (P, u)
