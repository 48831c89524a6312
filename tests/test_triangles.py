"""Triangle counts: exact match vs networkx on micro + random graphs."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines.triangles import triangle_counts
from graphscope_ray.sources.generator import MICRO_EDGES, micro_edge_table

from .oracles import oracle_triangles


def _got(ds):
    df = ds.to_pandas()
    return dict(zip(df["vid"], df["triangles"]))


def test_triangles_micro():
    got = _got(triangle_counts(ray.data.from_arrow(micro_edge_table())))
    want = oracle_triangles(MICRO_EDGES, [])
    # engine covers every vertex that appears in an edge (11 is isolated)
    want = {v: c for v, c in want.items() if v != 11}
    assert got == want
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


@pytest.mark.parametrize("seed", [0, 1])
def test_triangles_random(seed):
    rng = np.random.default_rng(seed)
    n, m = 60, 400
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, n, (m, 2)) if a != b})
    ds = ray.data.from_pandas(
        pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})
    )
    got = _got(triangle_counts(ds))
    want = oracle_triangles(edges, [])
    want = {v: c for v, c in want.items() if v in got}
    assert got == want


def test_triangles_no_broadcast_matches():
    """The shuffle-join degree path (the >1e8-vertex fallback) must
    produce identical counts to the broadcast path."""
    import networkx as nx
    import pandas as pd

    rng = np.random.default_rng(23)
    edges = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, 60, (300, 2)) if a != b})
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    got_b = triangle_counts(ds, broadcast_degrees=True).to_pandas()
    got_j = triangle_counts(ds, broadcast_degrees=False).to_pandas()
    mb = dict(zip(got_b["vid"], got_b["triangles"]))
    mj = dict(zip(got_j["vid"], got_j["triangles"]))
    assert mb == mj
    g = nx.Graph()
    g.add_edges_from(edges)
    want = nx.triangles(g)
    assert mb == want


def test_directed_triangle_census():
    """Cyclic + transitive directed triangle counts vs a brute-force
    triple oracle (flash cyclic-/acyclic-triangle quantities)."""
    import itertools

    import networkx as nx
    import pandas as pd
    import ray.data

    from graphscope_ray.pipelines.triangles import directed_triangle_census

    G = nx.gnp_random_graph(26, 0.25, seed=8, directed=True)
    arcs = set(G.edges())
    cyc = tri = 0
    for a, b, c in itertools.permutations(G.nodes(), 3):
        if (a, b) in arcs and (b, c) in arcs:
            if (c, a) in arcs and a < b and a < c:
                cyc += 1
            if (a, c) in arcs:
                tri += 1
    edf = pd.DataFrame(G.edges(), columns=["src", "dst"])
    got = directed_triangle_census(ray.data.from_pandas(edf))
    assert got == {"cyclic": cyc, "transitive": tri}
