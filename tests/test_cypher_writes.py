"""Cypher write clauses (query/writes) — CREATE/MERGE/SET/DELETE
against pandas-oracle expectations on a small property graph.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.query import CypherGraph
from graphscope_ray.query.writes import parse_write


def _graph():
    verts = pd.DataFrame({"vid": [1, 2, 3, 4], "size": [10, 50, 60, 5]})
    edges = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4],
                          "weight": [1, 5, 2]})
    return (CypherGraph(num_buckets=4)
            .add_vertices("V", ray.data.from_pandas(verts))
            .add_edges("E", ray.data.from_pandas(edges)))


def _vdf(g):
    return (g.query("MATCH (v:V) RETURN v AS vid, v.size AS size")
            .to_pandas().sort_values("vid").reset_index(drop=True))


def _edf(g):
    return (g.query("MATCH (a:V)-[e:E]->(b:V) "
                    "RETURN a AS src, b AS dst, e.weight AS w")
            .to_pandas().sort_values(["src", "dst"])
            .reset_index(drop=True))


class TestParse:
    def test_read_returns_none(self):
        assert parse_write("MATCH (a:V) RETURN a") is None

    def test_create_parses(self):
        s = parse_write("CREATE (x:V {vid: 9}), (y:V {vid: 8}), "
                        "(x)-[:E {weight: 1}]->(y)")
        assert len(s.nodes) == 2 and len(s.rels) == 1

    def test_create_needs_label_and_props(self):
        with pytest.raises(ValueError, match="label and a property"):
            parse_write("CREATE (x)")

    def test_create_rel_must_be_directed(self):
        with pytest.raises(ValueError, match="directed"):
            parse_write("CREATE (x:V {vid: 1}), (y:V {vid: 2}), "
                        "(x)-[:E]-(y)")

    def test_merge_single_node_only(self):
        with pytest.raises(ValueError, match="single"):
            parse_write("MERGE (a:V {vid: 1})-[:E]->(b:V {vid: 2})")

    def test_set_needs_match(self):
        with pytest.raises(ValueError, match="MATCH"):
            parse_write("SET a.x = 1")

    def test_delete_needs_match(self):
        with pytest.raises(ValueError, match="MATCH"):
            parse_write("DELETE a")


class TestCreate:
    def test_nodes_and_edge(self, ray_session):
        g = _graph()
        s = g.query("CREATE (x:V {vid: 10, size: 7}), (y:V {vid: 11}), "
                    "(x)-[:E {weight: 9}]->(y)")
        assert s.nodes_created[0] == 2
        assert s.relationships_created[0] == 1
        v = _vdf(g)
        assert set(v.vid) == {1, 2, 3, 4, 10, 11}
        # missing prop → typed null, not a schema change
        assert v.loc[v.vid == 11, "size"].isna().all()
        e = _edf(g)
        assert (10, 11, 9) in set(map(tuple, e.to_numpy()))

    def test_duplicate_id_raises(self, ray_session):
        g = _graph()
        with pytest.raises(ValueError, match="duplicate existing"):
            g.query("CREATE (x:V {vid: 1, size: 99})")

    def test_unknown_column_raises(self, ray_session):
        g = _graph()
        with pytest.raises(ValueError, match="not in the catalog"):
            g.query("CREATE (x:V {vid: 10, nosuch: 1})")

    def test_bound_create_one_edge_per_row(self, ray_session):
        g = _graph()
        s = g.query("MATCH (a:V)-[:E]->(b:V) WHERE a >= 2 "
                    "CREATE (b)-[:E {weight: 77}]->(a)")
        assert s.relationships_created[0] == 2
        e = _edf(g)
        assert (3, 2, 77) in set(map(tuple, e.to_numpy()))
        assert (4, 3, 77) in set(map(tuple, e.to_numpy()))


class TestMerge:
    def test_noop_when_all_props_match(self, ray_session):
        g = _graph()
        s = g.query("MERGE (x:V {vid: 2, size: 50})")
        assert s.nodes_created[0] == 0
        assert len(_vdf(g)) == 4

    def test_creates_when_absent(self, ray_session):
        g = _graph()
        s = g.query("MERGE (x:V {vid: 9, size: 1})")
        assert s.nodes_created[0] == 1
        assert 9 in set(_vdf(g).vid)

    def test_id_conflict_raises(self, ray_session):
        g = _graph()
        with pytest.raises(ValueError, match="already taken"):
            g.query("MERGE (x:V {vid: 2, size: 999})")


class TestSet:
    def test_vectorized_update(self, ray_session):
        g = _graph()
        s = g.query("MATCH (v:V) WHERE v.size >= 50 "
                    "SET v.size = v.size + 100")
        assert s.properties_set[0] == 2
        v = _vdf(g)
        assert v.set_index("vid")["size"].to_dict() == {
            1: 10, 2: 150, 3: 160, 4: 5}

    def test_expr_can_reference_other_vars(self, ray_session):
        g = _graph()
        g.query("MATCH (a:V)-[e:E]->(b:V) WHERE a = 2 "
                "SET b.size = e.weight")
        v = _vdf(g)
        assert v.loc[v.vid == 3, "size"].iloc[0] == 5


class TestDelete:
    def test_delete_edges(self, ray_session):
        g = _graph()
        s = g.query("MATCH (a:V)-[r:E]->(b:V) WHERE r.weight >= 5 "
                    "DELETE r")
        assert s.relationships_deleted[0] == 1
        assert len(_edf(g)) == 2

    def test_plain_delete_vertex_with_edges_raises(self, ray_session):
        g = _graph()
        with pytest.raises(ValueError, match="DETACH"):
            g.query("MATCH (v:V) WHERE v = 2 DELETE v")

    def test_detach_delete(self, ray_session):
        g = _graph()
        s = g.query("MATCH (v:V) WHERE v = 2 DETACH DELETE v")
        assert s.nodes_deleted[0] == 1
        assert s.relationships_deleted[0] == 2   # 1-2 and 2-3
        assert set(_vdf(g).vid) == {1, 3, 4}
        assert len(_edf(g)) == 1

    def test_plain_delete_isolated_vertex(self, ray_session):
        g = _graph()
        g.query("CREATE (x:V {vid: 42})")
        s = g.query("MATCH (v:V) WHERE v = 42 DELETE v")
        assert s.nodes_deleted[0] == 1
        assert 42 not in set(_vdf(g).vid)

    def test_unbound_target_raises(self, ray_session):
        g = _graph()
        with pytest.raises(ValueError, match="not bound"):
            g.query("MATCH (v:V) DELETE z")


class TestComposition:
    def test_statement_sequence_matches_pandas_oracle(self, ray_session):
        """The gate protocol in miniature, replayed against a pandas
        replica of every mutation."""
        g = _graph()
        g.query("CREATE (x:V {vid: -1, size: 7}), (y:V {vid: -2, size: 8}), "
                "(x)-[:E {weight: 3}]->(y)")
        g.query("MERGE (z:V {vid: -3, size: 9})")
        g.query("MATCH (v:V) WHERE v.size >= 50 SET v.size = v.size + 100")
        g.query("MATCH (a:V)-[r:E]->(b:V) WHERE r.weight >= 4 DELETE r")
        g.query("MATCH (v:V) WHERE v = 4 DETACH DELETE v")
        out = (g.query("MATCH (a:V)-[e:E]-(b:V) RETURN a AS part, "
                       "a.size AS size, count(*) AS partners, "
                       "sum(e.weight) AS wsum")
               .to_pandas().sort_values("part").reset_index(drop=True))
        # pandas replica
        v = pd.DataFrame({"vid": [1, 2, 3, 4, -1, -2, -3],
                          "size": [10, 50, 60, 5, 7, 8, 9]})
        e = pd.DataFrame({"src": [1, 2, 3, -1], "dst": [2, 3, 4, -2],
                          "weight": [1, 5, 2, 3]})
        v.loc[v["size"] >= 50, "size"] += 100
        e = e[e.weight < 4]
        v = v[v.vid != 4]
        e = e[(e.src != 4) & (e.dst != 4)]
        arcs = pd.concat([e, e.rename(columns={"src": "dst", "dst": "src"})])
        exp = (arcs.merge(v, left_on="src", right_on="vid")
               .groupby(["src", "size"], sort=False)
               .agg(partners=("weight", "size"), wsum=("weight", "sum"))
               .reset_index()
               .rename(columns={"src": "part"})
               .sort_values("part").reset_index(drop=True))
        got = out[["part", "size", "partners", "wsum"]].astype(np.int64)
        expd = exp[["part", "size", "partners", "wsum"]].astype(np.int64)
        pd.testing.assert_frame_equal(got, expd)


class TestReviewFixesR5:
    """Regressions for the round-5 review findings."""

    def test_write_words_usable_as_identifiers(self, ray_session):
        import ray.data
        verts = pd.DataFrame({"vid": [1, 2], "set": [10, 20],
                              "delete": [1, 2]})
        g = (CypherGraph(num_buckets=2)
             .add_vertices("V", ray.data.from_pandas(verts)))
        out = (g.query("MATCH (n:V) RETURN n AS vid, n.set AS s, "
                       "n.delete AS d").to_pandas().sort_values("vid"))
        assert list(out["s"]) == [10, 20]
        assert list(out["d"]) == [1, 2]
        # alias named 'merge' also fine
        out2 = g.query("MATCH (n:V) RETURN n.set AS merge").to_pandas()
        assert set(out2["merge"]) == {10, 20}

    def test_delete_varlength_binding_raises(self, ray_session):
        g = _graph()
        with pytest.raises(ValueError, match="variable-length"):
            g.query("MATCH (a:V)-[r:E*2..2]->(b:V) DELETE r")

    def test_set_promotes_int_column_to_float(self, ray_session):
        g = _graph()
        g.query("MATCH (v:V) WHERE v = 2 SET v.size = v.size / 4")
        v = _vdf(g)
        assert v.loc[v.vid == 2, "size"].iloc[0] == 12.5
        # untouched rows keep their values
        assert v.loc[v.vid == 1, "size"].iloc[0] == 10

    def test_set_integral_values_keep_int_column(self, ray_session):
        import numpy as np
        g = _graph()
        g.query("MATCH (v:V) WHERE v.size >= 50 SET v.size = v.size + 100")
        raw = g._v["V"][0].to_pandas()
        assert np.issubdtype(raw["size"].dtype, np.integer)

    def test_stats_invalidated_by_writes(self, ray_session):
        g = _graph()
        g.query("MATCH (a:V) RETURN a AS a, count(*) AS n")
        g._graph_stats()          # populate
        before = g._graph_stats()["v"]["V"]
        g.query("CREATE (x:V {vid: 99, size: 1})")
        after = g._graph_stats()["v"]["V"]
        assert after == before + 1

    def test_pinned_nonexistent_unlabeled_vertex_binds_nothing(
            self, ray_session):
        g = _graph()
        out = g.query("MATCH (a:V)-[:E]->(b:V), (c) "
                      "WHERE c = 424242 "
                      "RETURN a AS a, c AS c").to_pandas()
        assert len(out) == 0

    def test_set_with_empty_match_is_noop(self, ray_session):
        """Wide-seed stress finding: a SET whose WHERE matches nothing
        must be a no-op, not a schema-less-dataset crash."""
        g = _graph()
        s = g.query("MATCH (v:V) WHERE v.size >= 10000 "
                    "SET v.size = v.size + 1")
        assert s.properties_set[0] == 0
        v = _vdf(g)
        assert v.set_index("vid")["size"].to_dict() == {
            1: 10, 2: 50, 3: 60, 4: 5}

    def test_delete_all_edges_then_query(self, ray_session):
        """Stress finding: a DELETE that empties an edge table must
        leave a TYPED empty behind — later matches over it plan and
        return zero rows instead of dying with 'dataset has no
        schema' (Ray drops empty map outputs)."""
        g = _graph()
        s = g.query("MATCH (a:V)-[r:E]->(b:V) WHERE r.weight >= 0 "
                    "DELETE r")
        assert s.relationships_deleted[0] == 3
        out = g.query("MATCH (a:V)-[e:E]->(b:V) "
                      "RETURN a AS a, e.weight AS w").to_pandas()
        assert len(out) == 0
        # a MATCH-CREATE over the empty table is a no-op, not a crash
        s2 = g.query("MATCH (a:V)-[:E]->(b:V) "
                     "CREATE (a)-[:E {weight: 1}]->(b)")
        assert s2.relationships_created[0] == 0
        # and the table can be repopulated via standalone CREATE
        g.query("CREATE (x:V {vid: 7}), (y:V {vid: 8}), "
                "(x)-[:E {weight: 2}]->(y)")
        out2 = g.query("MATCH (a:V)-[e:E]->(b:V) RETURN a AS a, "
                       "b AS b, e.weight AS w").to_pandas()
        assert list(map(tuple, out2.to_numpy())) == [(7, 8, 2)]
