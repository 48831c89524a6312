"""Deterministic k-hop neighbor sampling: fanout bounds, edge
validity, frontier chaining, determinism across re-partitionings."""

import networkx as nx
import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.stages.sampling import neighbor_sample


def _graph():
    G = nx.gnm_random_graph(60, 240, seed=19)
    return G, pd.DataFrame(G.edges(), columns=["src", "dst"])


def test_neighbor_sample_contract():
    G, edf = _graph()
    seeds = [0, 1, 2]
    got = neighbor_sample(ray.data.from_pandas(edf), seeds,
                          fanouts=[3, 2], directed=False).to_pandas()
    adj = set(G.edges()) | {(v, u) for u, v in G.edges()}
    assert set(zip(got["src"], got["dst"])) <= adj
    h0 = got[got["hop"] == 0]
    h1 = got[got["hop"] == 1]
    # fanout bounds per frontier vertex
    assert h0.groupby("src").size().max() <= 3
    assert h1.groupby("src").size().max() <= 2
    # hop-0 sources are the seeds; hop-1 sources come from hop-0 dsts
    assert set(h0["src"]) <= set(seeds)
    assert set(h1["src"]) <= set(h0["dst"])
    # every seed with neighbors is expanded
    for s in seeds:
        if G.degree(s):
            assert s in set(h0["src"])


def test_neighbor_sample_deterministic():
    _, edf = _graph()
    a = neighbor_sample(ray.data.from_pandas(edf), [0, 5],
                        fanouts=[4, 3], directed=False).to_pandas()
    b = neighbor_sample(ray.data.from_pandas(edf).repartition(11),
                        [0, 5], fanouts=[4, 3], directed=False,
                        num_buckets=8).to_pandas()
    key = ["hop", "src", "dst"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True))


def test_neighbor_sample_directed_dead_end():
    edf = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
    got = neighbor_sample(ray.data.from_pandas(edf), [3],
                          fanouts=[2, 2], directed=True).to_pandas()
    assert len(got) == 0  # vertex 3 has no out-arcs; sampler stops
