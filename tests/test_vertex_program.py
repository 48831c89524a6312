"""The §2.7 user-extension surface: user-written VertexPrograms run by
the generic superstep driver must match the builtin engines exactly
(the same parity bar the reference applies to @pregel UDF apps vs
builtin C++ apps)."""

import numpy as np
import pytest
import ray.data

from graphscope_ray.functions.vertex_program import (
    MinLabelProgram,
    PageRankProgram,
    VertexProgram,
)
from graphscope_ray.pipelines.algorithms import (
    pagerank,
    run_vertex_program,
    wcc,
)
from graphscope_ray.sources.generator import MICRO_VERTICES, micro_edge_table
from graphscope_ray.state.graph import build_graph


def _micro_graph(P, directed):
    edges = ray.data.from_arrow(micro_edge_table())
    verts = ray.data.from_items([{"vid": v} for v in MICRO_VERTICES])
    return build_graph(edges, num_partitions=P, directed=directed,
                       extra_vertices=verts)


def _to_map(ds, col):
    df = ds.to_pandas()
    return dict(zip(df["vid"], df[col]))


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("directed", [True, False])
def test_user_pagerank_matches_builtin(P, directed):
    g = _micro_graph(P, directed)
    want = _to_map(pagerank(g)[0], "pagerank")
    got_ds, metrics = run_vertex_program(
        g, PageRankProgram(alpha=0.85, tol=1e-6), col="pagerank")
    got = _to_map(got_ds, "pagerank")
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), f"vertex {v}"
    assert metrics["rounds"] < 100


def test_user_minlabel_matches_wcc():
    g = _micro_graph(3, False)
    want = _to_map(wcc(g)[0], "component")
    got = _to_map(run_vertex_program(g, MinLabelProgram(), col="component")[0],
                  "component")
    assert got == want


def test_user_weighted_max_program():
    """Custom semantics no builtin covers: max-over-in-edges of
    src_state * weight (a one-round 'strongest incoming signal') —
    exercises combine='max', use_weights and identity."""

    class MaxSignal(VertexProgram):
        combine = "max"
        identity = 0.0
        use_weights = True

        def init(self, ctx):
            return ctx.vids.astype(np.float64)

        def emit(self, state, ctx):
            return state

        def apply(self, state, acc, has_msg, g, ctx):
            return acc  # plain max of weighted in-signals

        def converged(self, delta, n_total, round):
            return round >= 0  # single round

    import pandas as pd

    edges = pd.DataFrame({
        "src": [1, 2, 3, 1], "dst": [3, 3, 2, 2],
        "weight": [2.0, 1.5, 1.0, 0.5],
    })
    g = build_graph(ray.data.from_pandas(edges), num_partitions=2,
                    directed=True)
    got = _to_map(run_vertex_program(g, MaxSignal())[0], "value")
    # dst 3: max(1*2.0, 2*1.5) = 3.0 ; dst 2: max(3*1.0, 1*0.5) = 3.0
    assert got[3] == pytest.approx(3.0)
    assert got[2] == pytest.approx(3.0)
    assert got[1] == pytest.approx(0.0)  # no in-edges -> identity
