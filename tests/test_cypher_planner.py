"""Cardinality-ordered pattern planning (GLogue-style, query/cypher
``_order_patterns``): on a planted skewed cyclic pattern the optimizer
must anchor on the selective side and keep intermediate binding rows
bounded, while returning exactly the naive source-order results.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.query import CypherGraph


def _skewed_graph(optimize=True):
    """HOT: a dense hub relation (every u → many v). TINY: 3 arcs.
    The cyclic query joins both; source order starts with HOT (40k
    intermediate rows), the optimizer must start with TINY (3)."""
    n = 200
    rng = np.random.default_rng(11)
    verts = pd.DataFrame({"vid": np.arange(n, dtype=np.int64)})
    hot = pd.DataFrame({
        "src": np.repeat(np.arange(n, dtype=np.int64), 50),
        "dst": rng.integers(0, n, n * 50).astype(np.int64),
    }).drop_duplicates()
    tiny = pd.DataFrame({"src": [0, 1, 2], "dst": [5, 6, 7]},
                        dtype=np.int64)
    g = (CypherGraph(num_buckets=4, optimize=optimize)
         .add_vertices("V", ray.data.from_pandas(verts))
         .add_edges("HOT", ray.data.from_pandas(hot))
         .add_edges("TINY", ray.data.from_pandas(tiny)))
    return g, verts, hot, tiny


CYCLIC = ("MATCH (a:V)-[:HOT]->(b:V), (a)-[:TINY]->(c:V) "
          "RETURN a AS a, b AS b, c AS c")


class TestOrdering:
    def test_tiny_pattern_goes_first(self, ray_session):
        g, *_ = _skewed_graph()
        g.query(CYCLIC).materialize()
        plan = g.last_plan
        assert plan is not None
        # source index 1 is the TINY pattern — it must lead (est[k] is
        # the CONDITIONAL cost of step k given earlier bindings, so
        # only the leading choice is compared across patterns)
        assert plan["order"][0] == 1
        # leading cost ≈ label scan (200) + 3 tiny arcs — far under
        # the ≈10⁴ a HOT-led plan would estimate
        assert plan["est"][0] < 1000

    def test_intermediate_rows_bounded_vs_naive(self, ray_session):
        """The concrete blowup bound: the chosen leading pattern's
        match count is the first intermediate's size. Naive order
        leads with HOT (≈ |HOT| rows); the optimizer's choice must
        stay within the TINY pattern's match count."""
        g, verts, hot, tiny = _skewed_graph()
        g.query(CYCLIC).materialize()
        lead_src = g.last_plan["order"][0]
        pats = ["MATCH (a:V)-[:HOT]->(b:V) RETURN count(*) AS n",
                "MATCH (a:V)-[:TINY]->(c:V) RETURN count(*) AS n"]
        lead_rows = int(g.query(pats[lead_src]).to_pandas()["n"][0])
        naive_rows = int(g.query(pats[0]).to_pandas()["n"][0])
        assert lead_rows <= len(tiny)          # 3
        assert naive_rows >= len(hot) * 0.9    # ≈ 10⁴

    def test_results_equal_naive_order(self, ray_session):
        gopt, *_ = _skewed_graph(optimize=True)
        gnai, *_ = _skewed_graph(optimize=False)
        a = (gopt.query(CYCLIC).to_pandas()
             .sort_values(["a", "b", "c"]).reset_index(drop=True))
        b = (gnai.query(CYCLIC).to_pandas()
             .sort_values(["a", "b", "c"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        assert gnai.last_plan is None or not gnai.optimize

    def test_reversal_anchors_selective_end(self, ray_session):
        """Chain whose RIGHT end carries an equality anchor: the
        planner must reverse the chain so the anchored end scans
        first (anchor-side choice inside one pattern)."""
        g, *_ = _skewed_graph()
        g.query("MATCH (a:V)-[:HOT]->(b:V) WHERE b = 7 "
                "RETURN a AS a, b AS b").materialize()
        assert g.last_plan["reversed"][0] is True

    def test_forward_kept_when_left_end_anchored(self, ray_session):
        g, *_ = _skewed_graph()
        g.query("MATCH (a:V)-[:HOT]->(b:V) WHERE a = 7 "
                "RETURN a AS a, b AS b").materialize()
        assert g.last_plan["reversed"][0] is False

    def test_reversed_chain_results_exact(self, ray_session):
        g, verts, hot, _ = _skewed_graph()
        out = (g.query("MATCH (a:V)-[:HOT]->(b:V) WHERE b = 7 "
                       "RETURN a AS a, b AS b").to_pandas()
               .sort_values("a").reset_index(drop=True))
        want = (hot[hot.dst == 7].rename(columns={"src": "a", "dst": "b"})
                .sort_values("a").reset_index(drop=True))
        pd.testing.assert_frame_equal(out, want)

    def test_shortestpath_keeps_source_order(self, ray_session):
        g, *_ = _skewed_graph()
        out = g.query(
            "MATCH (a:V), p = shortestPath((a)-[:TINY*1..2]->(b:V)) "
            "WHERE a = 0 RETURN a AS a, b AS b, length(p) AS hops")
        assert g.last_plan is None
        assert len(out.to_pandas()) >= 1
