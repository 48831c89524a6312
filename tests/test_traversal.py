"""Gremlin-style fluent traversal: same executor as Cypher, pandas
oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.query import CypherGraph, P, traversal_source

PERSONS = pd.DataFrame({
    "vid": np.array([1, 2, 3, 4, 5], np.int64),
    "name": ["ann", "bob", "cal", "dee", "eve"],
    "age": np.array([30, 25, 35, 28, 40], np.int64),
})
KNOWS = pd.DataFrame({
    "src": np.array([1, 1, 2, 3, 4, 5, 2], np.int64),
    "dst": np.array([2, 3, 3, 4, 5, 1, 5], np.int64),
    "since": np.array([2010, 2012, 2015, 2011, 2018, 2019, 2020],
                      np.int64),
})


@pytest.fixture()
def g():
    cg = (CypherGraph()
          .add_vertices("Person", ray.data.from_pandas(PERSONS))
          .add_edges("KNOWS", ray.data.from_pandas(KNOWS)))
    return traversal_source(cg)


def test_v_has_values(g):
    names = g.V("Person").has("age", P.gt(28)).values("name").toList()
    assert sorted(names) == ["ann", "cal", "eve"]
    ids = g.V("Person").has("name", "bob").id_().toList()
    assert ids == [2]


def test_out_in_both_counts(g):
    assert g.V("Person").out("KNOWS").count().toList() == [len(KNOWS)]
    assert g.V("Person").in_("KNOWS").count().toList() == [len(KNOWS)]
    assert g.V("Person").both("KNOWS").count().toList() == [
        2 * len(KNOWS)]
    # two hops
    m = KNOWS.merge(KNOWS, left_on="dst", right_on="src")
    assert g.V("Person").out("KNOWS", times=2).count().toList() == [
        len(m)]


def test_dedup_order_limit(g):
    got = (g.V("Person").out("KNOWS").id_().dedup()
           .order().by(asc=False).limit(3).toList())
    want = sorted({int(x) for x in KNOWS["dst"]}, reverse=True)[:3]
    assert got == want


def test_as_select_and_path(g):
    rows = (g.V("Person").as_("a").out("KNOWS").as_("b")
            .select("a", "b").toList())
    want = sorted(zip(KNOWS["src"], KNOWS["dst"]))
    assert sorted(rows) == want
    paths = g.V("Person").out("KNOWS").out("KNOWS").path().toList()
    m = KNOWS.merge(KNOWS, left_on="dst", right_on="src",
                    suffixes=("1", "2"))
    assert sorted(paths) == sorted(zip(m["src1"], m["dst1"], m["dst2"]))


def test_has_id(g):
    assert g.V("Person").hasId(3).values("name").toList() == ["cal"]
    got = g.V("Person").hasId(P.within(1, 4)).out("KNOWS").id_().toList()
    want = sorted(int(d) for s, d in zip(KNOWS["src"], KNOWS["dst"])
                  if s in (1, 4))
    assert sorted(got) == want


def test_group_by_key(g):
    rows = g.V("Person").out("KNOWS").group("name", "count").toList()
    m = KNOWS.merge(PERSONS, left_on="dst", right_on="vid")
    assert dict(rows) == m.groupby("name").size().to_dict()
    rows2 = g.V("Person").as_("a").out("KNOWS").group(
        "name", "min", "age").toList()
    w = m.groupby("name")["age"].min().to_dict()
    assert dict(rows2) == w


def test_optional_hop(g):
    # restrict the optional edge to one that only some sources have:
    # optionalOut then has() filters like Gremlin's optional+has
    rows = (g.V("Person").as_("a").optionalOut("KNOWS").toList())
    # every person has an out-edge here, so pair count == |E|
    assert len(rows) == len(KNOWS)
    # a graph where misses exist: filter anchors via hasId first
    cg2 = (CypherGraph()
           .add_vertices("Person", ray.data.from_pandas(PERSONS))
           .add_edges("KNOWS", ray.data.from_pandas(
               KNOWS[KNOWS["src"] == 2])))
    g2 = traversal_source(cg2)
    rows2 = g2.V("Person").as_("a").optionalOut("KNOWS").path().toList()
    matched = [(2, 3), (2, 5)]
    missed = [(v, None) for v in PERSONS["vid"] if v != 2]
    norm = [(a, None if pd.isna(b) else int(b)) for a, b in rows2]
    assert sorted(norm, key=str) == sorted(matched + missed, key=str)
    # mandatory hop after an optional hop must refuse
    with pytest.raises(ValueError, match="optional"):
        g.V("Person").optionalOut("KNOWS").out("KNOWS")


def test_values_multi_and_value_map(g):
    rows = g.V("Person").has("age", P.lt(30)).values(
        "name", "age").toList()
    w = PERSONS[PERSONS["age"] < 30]
    assert sorted(rows) == sorted(zip(w["name"], w["age"]))
    vm = g.V("Person").hasId(2).valueMap("name", "age").toList()
    assert vm == [(2, "bob", 25)]


def test_aggregates_and_groupcount(g):
    assert g.V("Person").sum_("age").toList() == [PERSONS["age"].sum()]
    assert g.V("Person").max_("age").toList() == [40]
    [mean] = g.V("Person").has("age", P.within(25, 35)).mean(
        "age").toList()
    assert abs(mean - 30.0) < 1e-12
    gc = dict(g.V("Person").out("KNOWS").groupCount().toList())
    want = KNOWS.groupby("dst").size().to_dict()
    assert gc == {int(k): int(v) for k, v in want.items()}
    # property histogram on the hop target
    gc2 = dict(g.V("Person").out("KNOWS").groupCount("name").toList())
    m = KNOWS.merge(PERSONS, left_on="dst", right_on="vid")
    assert gc2 == m.groupby("name").size().to_dict()


def test_std_and_percentile(g):
    [sd] = g.V("Person").std("age").toList()
    assert abs(sd - PERSONS["age"].std(ddof=1)) < 1e-12
    [p50] = g.V("Person").percentile("age", 0.5).toList()
    assert abs(p50 - PERSONS["age"].quantile(0.5)) < 1e-12


def test_repeat_emit_variable_length(g):
    # exact k: repeat(out).times(2) == out(times=2)
    a = g.V("Person").repeat_out("KNOWS", 2).id_().toList()
    b = g.V("Person").out("KNOWS", times=2).id_().toList()
    assert sorted(a) == sorted(b)
    # emit: every element within 1..2 hops, one row per path
    got = sorted(g.V("Person").repeat_out("KNOWS", 2, emit=True)
                 .id_().toList())
    m = KNOWS.merge(KNOWS, left_on="dst", right_on="src")
    want = sorted(list(KNOWS["dst"]) + list(m["dst_y"]))
    assert got == want
    # distinct frontier via dedup
    got_d = sorted(g.V("Person").repeat_out("KNOWS", 2, emit=True)
                   .id_().dedup().toList())
    assert got_d == sorted(set(want))
    # repeat_both with emit from a single anchor
    gotb = (g.V("Person").hasId(1).repeat_both("KNOWS", 2, emit=True)
            .id_().dedup().toList())
    und = set(zip(KNOWS["src"], KNOWS["dst"])) | set(
        zip(KNOWS["dst"], KNOWS["src"]))
    one = {b for a, b in und if a == 1}
    two = {c for b in one for (a, c) in und if a == b}
    assert sorted(gotb) == sorted(one | two)


def test_where_tag_comparison(g):
    # 2-hop neighbors that are NOT the start (cycle exclusion)
    rows = (g.V("Person").as_("a").out("KNOWS").out("KNOWS")
            .where(P.neq("a")).as_("c").select("a", "c").toList())
    m = KNOWS.merge(KNOWS, left_on="dst", right_on="src")
    want = sorted((int(s), int(d)) for s, d in
                  zip(m["src_x"], m["dst_y"]) if s != d)
    assert sorted(rows) == want
    # 2-hop cycles: where(P.eq("a"))
    cyc = (g.V("Person").as_("a").out("KNOWS").out("KNOWS")
           .where(P.eq("a")).id_().toList())
    wantc = sorted(int(d) for s, d in zip(m["src_x"], m["dst_y"])
                   if s == d)
    assert sorted(cyc) == wantc
    with pytest.raises(KeyError):
        g.V("Person").out("KNOWS").where(P.neq("nosuch")).toList()


def test_simple_path(g):
    paths = (g.V("Person").out("KNOWS").out("KNOWS").simplePath()
             .path().toList())
    m = KNOWS.merge(KNOWS, left_on="dst", right_on="src",
                    suffixes=("1", "2"))
    want = sorted((int(a), int(b), int(c)) for a, b, c in
                  zip(m["src1"], m["dst1"], m["dst2"])
                  if len({a, b, c}) == 3)
    assert sorted(paths) == want


def test_has_edge_property(g):
    rows = (g.V("Person").out("KNOWS").hasE("since", P.gte(2015))
            .id_().toList())
    want = sorted(int(d) for s, d in
                  zip(KNOWS["src"], KNOWS["dst"])
                  if int(KNOWS[(KNOWS["src"] == s) & (KNOWS["dst"] == d)
                               ]["since"].iloc[0]) >= 2015)
    assert sorted(rows) == want
    with pytest.raises(ValueError, match="variable-length"):
        g.V("Person").repeat_out("KNOWS", 2, emit=True).hasE(
            "since", 2015)
    with pytest.raises(ValueError, match="prior hop"):
        g.V("Person").hasE("since", 2015)


def test_union(g):
    young = g.V("Person").has("age", P.lt(29)).id_()
    old = g.V("Person").has("age", P.gt(34)).id_()
    got = sorted(r["id"] for r in young.union(old).take_all())
    want = sorted(int(v) for v, a in zip(PERSONS["vid"], PERSONS["age"])
                  if a < 29 or a > 34)
    assert got == want
    with pytest.raises(ValueError, match="incompatible"):
        young.union(g.V("Person").values("name"))


class TestStepBreadthR5:
    """Round-5 step breadth: choose / coalesce / project / local /
    mid-traversal V(id)."""

    def _g(self):
        import ray.data
        verts = pd.DataFrame({"vid": [1, 2, 3, 4],
                              "size": [10.0, None, 60.0, 5.0],
                              "alt": [7.0, 8.0, None, None]})
        edges = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4],
                              "weight": [1, 5, 2]})
        from graphscope_ray.query.cypher import CypherGraph
        return (CypherGraph(num_buckets=4)
                .add_vertices("V", ray.data.from_pandas(verts))
                .add_edges("E", ray.data.from_pandas(edges)))

    def test_choose(self, ray_session):
        g = traversal_source(self._g())
        out = (g.V("V").choose("size", P.gte(50), "big", "small")
               .toDataset().to_pandas().sort_values("id"))
        got = dict(zip(out["id"], out["choice"]))
        # null size (vid 2) fails the predicate -> otherwise branch
        assert got == {1: "small", 2: "small", 3: "big", 4: "small"}

    def test_coalesce_values(self, ray_session):
        g = traversal_source(self._g())
        out = (g.V("V").coalesce_values("size", "alt", default=-1.0)
               .toDataset().to_pandas().sort_values("id"))
        got = dict(zip(out["id"], out["value"]))
        assert got == {1: 10.0, 2: 8.0, 3: 60.0, 4: 5.0}

    def test_coalesce_default_branch(self, ray_session):
        g = traversal_source(self._g())
        out = (g.V("V").coalesce_values("alt", default=-1.0)
               .toDataset().to_pandas().sort_values("id"))
        got = dict(zip(out["id"], out["value"]))
        assert got[3] == -1.0 and got[4] == -1.0 and got[1] == 7.0

    def test_project(self, ray_session):
        g = traversal_source(self._g())
        out = (g.V("V").as_("a").out("E")
               .project_(nbr="~id", nsize="size", anchor="@a",
                         asize="@a.size")
               .toDataset().to_pandas().sort_values("nbr"))
        assert list(out.columns) == ["nbr", "nsize", "anchor", "asize"]
        row = out[out["nbr"] == 2].iloc[0]
        assert row["anchor"] == 1 and row["asize"] == 10.0

    def test_local_count_includes_zero(self, ray_session):
        g = traversal_source(self._g())
        out = (g.V("V").localCount("E", direction="out")
               .toDataset().to_pandas().sort_values("id"))
        got = dict(zip(out["id"], out["n"]))
        assert got == {1: 1, 2: 1, 3: 1, 4: 0}

    def test_mid_traversal_V(self, ray_session):
        g = traversal_source(self._g())
        out = (g.V("V").has("size", P.gte(50)).as_("a")
               .V_(1, "V").out("E")
               .project_(big="@a", jumped="~id")
               .toDataset().to_pandas())
        # one source row (vid 3, size 60); jump to 1, out -> 2
        assert len(out) == 1
        assert out.iloc[0]["big"] == 3 and out.iloc[0]["jumped"] == 2

    def test_mid_traversal_V_needs_id(self, ray_session):
        from graphscope_ray.query.cypher import CypherGraph
        import ray.data
        g = self._g()
        with pytest.raises(ValueError, match="pinned|bound"):
            # a second pattern with an UNpinned fresh start must still
            # raise the cartesian-free error
            g.query("MATCH (a:V), (b:V) RETURN a AS a, b AS b")

    def test_pinned_second_pattern_cypher(self, ray_session):
        g = self._g()
        out = (g.query("MATCH (a:V)-[:E]->(b:V), (c:V) "
                       "WHERE c = 4 AND a = 1 "
                       "RETURN a AS a, b AS b, c AS c")
               .to_pandas())
        assert len(out) == 1
        assert tuple(out.iloc[0]) == (1, 2, 4)


def test_v_jump_then_hop_binds_fresh_variable(ray_session):
    """Review fix: a hop AFTER a V_() jump must bind a NEW variable —
    chain-local naming used to collide with pre-jump vars and silently
    become an equality join."""
    import ray.data
    verts = pd.DataFrame({"vid": [1, 2, 3, 4, 5]})
    edges = pd.DataFrame({"src": [1, 5], "dst": [2, 4]})
    from graphscope_ray.query.cypher import CypherGraph
    cg = (CypherGraph(num_buckets=2)
          .add_vertices("V", ray.data.from_pandas(verts))
          .add_edges("E", ray.data.from_pandas(edges)))
    g = traversal_source(cg)
    tr = g.V("V").hasId(1).out("E").V_(5, "V").out("E")
    q = tr._to_query()
    allvars = [n.var for p in q.patterns for n in p.nodes]
    assert len(allvars) == len(set(allvars)), allvars
    out = tr.toDataset().to_pandas()
    # pre-jump anchored to 1 (1->2), jump to 5, out -> 4
    assert len(out) == 1 and out.iloc[0, 0] == 4
