"""random_walks (DeepWalk / node2vec corpus generation): replica-exact
vs the sequential oracle sharing the deterministic pick, partition
invariance, walk validity, node2vec bias direction."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines.walks import (
    random_walks,
    reference_random_walks,
)

TRIANGLE_TAIL = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
STAR = [(0, i) for i in range(1, 6)]
DIR_CHAIN = [(0, 1), (1, 2), (2, 3)]
GRID = [(0, 1), (1, 2), (3, 4), (4, 5), (0, 3), (1, 4), (2, 5)]


def _edges_ds(pairs, nparts=1):
    df = pd.DataFrame(pairs, columns=["src", "dst"]).astype(np.int64)
    ds = ray.data.from_pandas(df)
    if nparts > 1:
        ds = ds.repartition(nparts)
    return ds


def _as_dict(ds):
    out = {}
    for r in ds.take_all():
        out[int(r["walk"])] = [int(x) for x in r["path"].split(",")]
    return out


@pytest.mark.parametrize("pairs,directed", [
    (TRIANGLE_TAIL, False),
    (STAR, False),
    (DIR_CHAIN, True),
    (GRID, False),
])
@pytest.mark.parametrize("nparts", [1, 3])
def test_deepwalk_replica_exact(pairs, directed, nparts):
    got = _as_dict(random_walks(
        _edges_ds(pairs, nparts), walk_length=4, num_walks=2,
        seed=7, directed=directed))
    want = reference_random_walks(
        pairs, walk_length=4, num_walks=2, seed=7, directed=directed)
    assert got == want


@pytest.mark.parametrize("p,q", [(0.25, 2.0), (4.0, 0.5)])
@pytest.mark.parametrize("nparts", [1, 3])
def test_node2vec_replica_exact(p, q, nparts):
    got = _as_dict(random_walks(
        _edges_ds(GRID, nparts), walk_length=5, num_walks=2,
        p=p, q=q, seed=11, directed=False))
    want = reference_random_walks(
        GRID, walk_length=5, num_walks=2, p=p, q=q, seed=11,
        directed=False)
    assert got == want


def test_walks_are_valid_and_complete():
    pairs = TRIANGLE_TAIL
    res = _as_dict(random_walks(_edges_ds(pairs), walk_length=6,
                                num_walks=3, seed=3, directed=False))
    arcs = set()
    for u, v in pairs:
        arcs.add((u, v))
        arcs.add((v, u))
    vids = sorted({x for e in pairs for x in e})
    assert len(res) == len(vids) * 3           # every (start, replica)
    from graphscope_ray.functions.hashing import walk_ids
    expect_ids = {int(walk_ids(np.array([v], np.int64),
                               np.array([r], np.int64))[0])
                  for v in vids for r in range(3)}
    assert set(res) == expect_ids              # id = hash(start, rep)
    for wid, path in res.items():
        # id is derived from this walk's start vid (some replica)
        assert wid in {int(walk_ids(np.array([path[0]], np.int64),
                                    np.array([r], np.int64))[0])
                       for r in range(3)}
        assert len(path) == 7                  # no dead ends here
        for a, b in zip(path, path[1:]):
            assert (a, b) in arcs


def test_directed_dead_end_keeps_short_path():
    res = _as_dict(random_walks(_edges_ds(DIR_CHAIN), walk_length=9,
                                num_walks=1, seed=5, directed=True))
    # vertex 3 is a sink: its walk is just [3]; all walks end at 3
    from graphscope_ray.functions.hashing import walk_ids
    wid3 = int(walk_ids(np.array([3], np.int64),
                        np.array([0], np.int64))[0])
    assert res[wid3] == [3]
    for path in res.values():
        assert path[-1] == 3


def test_node2vec_bias_direction():
    # on an undirected path graph, tiny p (return weight 1/p huge)
    # forces far more immediate backtracks than huge p
    pairs = [(i, i + 1) for i in range(12)]
    def backtracks(p):
        res = _as_dict(random_walks(
            _edges_ds(pairs), walk_length=6, num_walks=4, p=p, q=1.0,
            seed=13, directed=False))
        n = 0
        for path in res.values():
            n += sum(1 for i in range(2, len(path))
                     if path[i] == path[i - 2])
        return n
    assert backtracks(0.01) > backtracks(100.0)


def test_explicit_starts_and_zero_length():
    starts = ray.data.from_pandas(
        pd.DataFrame({"vid": np.array([2, 4], np.int64)}))
    res = _as_dict(random_walks(_edges_ds(TRIANGLE_TAIL), walk_length=0,
                                num_walks=1, starts=starts, seed=1))
    from graphscope_ray.functions.hashing import walk_ids
    w = walk_ids(np.array([2, 4], np.int64), np.array([0, 0], np.int64))
    assert res == {int(w[0]): [2], int(w[1]): [4]}


def test_surfaces_walks_and_edge_paths():
    from graphscope_ray import nx_compat as gnx
    G = gnx.Graph([(1, 2), (2, 3), (3, 1), (3, 4)])
    walks = gnx.random_walks(G, walk_length=3, num_walks=1, seed=9)
    assert len(walks) == 4
    arcs = {(1, 2), (2, 3), (3, 1), (3, 4)}
    arcs |= {(b, a) for a, b in arcs}
    for w in walks:
        for a, b in zip(w, w[1:]):
            assert (a, b) in arcs
    # string nodes relabel round-trip
    Gs = gnx.Graph([("a", "b"), ("b", "c")])
    ws = gnx.random_walks(Gs, walk_length=2, num_walks=1, seed=9)
    assert {w[0] for w in ws} == {"a", "b", "c"}

    import networkx as nx
    ref = nx.Graph([(1, 2), (2, 3), (3, 1), (3, 4)])
    want = sorted(nx.all_simple_edge_paths(ref, 1, 4))
    got = gnx.all_simple_edge_paths(G, 1, 4)
    assert got == want
    # iterable targets + explicit cutoff
    want2 = sorted(list(p) for t in [2, 4]
                   for p in nx.all_simple_edge_paths(ref, 1, t, cutoff=2))
    assert gnx.all_simple_edge_paths(G, 1, [2, 4], cutoff=2) == want2


WEIGHTED = [(0, 1, 1.0), (0, 2, 50.0), (1, 2, 1.0), (2, 3, 2.0),
            (3, 4, 0.5), (1, 4, 3.0)]


def _wedges_ds(rows, nparts=1):
    df = pd.DataFrame(rows, columns=["src", "dst", "weight"])
    df[["src", "dst"]] = df[["src", "dst"]].astype(np.int64)
    ds = ray.data.from_pandas(df)
    return ds.repartition(nparts) if nparts > 1 else ds


@pytest.mark.parametrize("p,q", [(1.0, 1.0), (0.5, 2.0)])
@pytest.mark.parametrize("nparts", [1, 3])
def test_weighted_walks_replica_exact(p, q, nparts):
    got = _as_dict(random_walks(
        _wedges_ds(WEIGHTED, nparts), walk_length=5, num_walks=2,
        p=p, q=q, seed=21, directed=False, weight_col="weight"))
    want = reference_random_walks(
        WEIGHTED, walk_length=5, num_walks=2, p=p, q=q, seed=21,
        directed=False)
    assert got == want


def test_weight_bias_direction():
    # star where one spoke has overwhelming weight: most first hops
    # from the hub should take it; with uniform weights they spread
    hub_rows = [(0, i, 1.0) for i in range(1, 9)] + [(0, 9, 1000.0)]
    def first_hops(weighted):
        ds = _wedges_ds(hub_rows)
        res = _as_dict(random_walks(
            ds, walk_length=1, num_walks=16, seed=2,
            weight_col="weight" if weighted else None,
            starts=ray.data.from_pandas(
                pd.DataFrame({"vid": np.array([0], np.int64)}))))
        return sum(1 for pth in res.values() if pth[1] == 9)
    assert first_hops(True) > first_hops(False)
    assert first_hops(True) >= 12          # 1000:1 odds per draw


def _pool(pairs, P, directed=False, weighted=False):
    from graphscope_ray.state.graph import build_graph
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    df = pd.DataFrame(pairs, columns=cols)
    df[["src", "dst"]] = df[["src", "dst"]].astype(np.int64)
    return build_graph(ray.data.from_pandas(df), num_partitions=P,
                       directed=directed)


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("p,q,directed", [
    (1.0, 1.0, False), (1.0, 1.0, True), (0.25, 2.0, False),
])
def test_pool_walks_replica_exact(P, p, q, directed):
    from graphscope_ray.pipelines.walks import random_walks_pool
    g = _pool(TRIANGLE_TAIL, P, directed=directed)
    got = _as_dict(random_walks_pool(g, 5, num_walks=2, p=p, q=q,
                                     seed=7))
    want = reference_random_walks(TRIANGLE_TAIL, 5, num_walks=2,
                                  p=p, q=q, seed=7, directed=directed)
    assert got == want


def test_pool_walks_weighted_and_engine_parity():
    from graphscope_ray.pipelines.walks import (
        random_walks,
        random_walks_pool,
    )
    g = _pool(WEIGHTED, 3, weighted=True)
    got = _as_dict(random_walks_pool(g, 5, num_walks=2, p=0.5, q=2.0,
                                     seed=21, use_weights=True))
    want = reference_random_walks(WEIGHTED, 5, num_walks=2, p=0.5,
                                  q=2.0, seed=21, directed=False)
    assert got == want
    # the two engines produce IDENTICAL walks (shared pick kernel)
    ds_eng = _as_dict(random_walks(
        _wedges_ds(WEIGHTED), 5, num_walks=2, p=0.5, q=2.0, seed=21,
        directed=False, weight_col="weight"))
    assert got == ds_eng


def test_pool_walks_explicit_starts():
    from graphscope_ray.pipelines.walks import random_walks_pool
    g = _pool(TRIANGLE_TAIL, 3)
    got = _as_dict(random_walks_pool(
        g, 4, num_walks=1, seed=3, starts=np.array([2, 4], np.int64)))
    want = reference_random_walks(TRIANGLE_TAIL, 4, num_walks=1,
                                  seed=3, starts=[2, 4])
    assert got == want


def test_full_range_vids_start_exact():
    # hashed string vids span the full int64 range; the walk-id
    # product wraps — start must still be exact (decoded from the
    # path, not by division) and engines must agree with the oracle
    big = 2**62 + 12345
    pairs = [(big, 1), (1, 2)]
    ds = _edges_ds(pairs)
    res = random_walks(ds, 3, num_walks=2, seed=7, directed=False)
    rows = res.take_all()
    starts = {r["start"] for r in rows}
    assert starts == {big, 1, 2}
    for r in rows:
        assert int(r["path"].split(",")[0]) == r["start"]
    got = _as_dict(res)
    want = reference_random_walks(pairs, 3, num_walks=2, seed=7,
                                  directed=False)
    assert got == want
    # pool engine agrees
    from graphscope_ray.pipelines.walks import random_walks_pool
    g = _pool(pairs, 2)
    assert _as_dict(random_walks_pool(g, 3, num_walks=2, seed=7)) == want


def test_pool_unknown_start_is_single_vertex_path():
    from graphscope_ray.pipelines.walks import random_walks_pool
    g = _pool([(0, 1), (1, 2), (2, 0)], 2)
    got = _as_dict(random_walks_pool(
        g, 3, num_walks=1, seed=5, starts=np.array([999, 1], np.int64)))
    want = reference_random_walks([(0, 1), (1, 2), (2, 0)], 3,
                                  num_walks=1, seed=5, starts=[999, 1])
    assert got == want
    from graphscope_ray.functions.hashing import walk_ids
    w999 = int(walk_ids(np.array([999], np.int64),
                        np.array([0], np.int64))[0])
    assert got[w999] == [999]


def test_pool_empty_shard_start_is_dead_end():
    # P=8 over a 2-vertex graph guarantees shards owning zero
    # vertices; start vids hashing to such a shard must take the
    # single-vertex dead-end path, not IndexError (ADVICE r3)
    from graphscope_ray.pipelines.walks import random_walks_pool
    g = _pool([(0, 1)], 8)
    starts = np.arange(20, dtype=np.int64)  # mostly unknown vids
    got = _as_dict(random_walks_pool(g, 3, num_walks=1, seed=5,
                                     starts=starts))
    want = reference_random_walks([(0, 1)], 3, num_walks=1, seed=5,
                                  starts=list(range(20)))
    assert got == want


def test_nonpositive_weights_raise():
    import pytest as _pytest
    rows = [(0, 1, 1.0), (1, 2, 0.0)]
    with _pytest.raises(Exception, match="> 0"):
        _as_dict(random_walks(_wedges_ds(rows), walk_length=2,
                              num_walks=1, seed=1,
                              weight_col="weight"))


def test_walk_ids_distinct_and_deterministic():
    from graphscope_ray.functions.hashing import walk_ids
    v = np.repeat(np.array([2**62, -2**62, 0, 1], np.int64), 3)
    r = np.tile(np.arange(3, dtype=np.int64), 4)
    a = walk_ids(v, r)
    assert len(set(a.tolist())) == len(a)
    assert a.tolist() == walk_ids(v, r).tolist()
