"""Distributed SGNS (DeepWalk training half): bit-exact vs the
sequential oracle at one block, reduction-order allclose at many,
decreasing loss, community structure, determinism."""

import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.functions.skipgram import (
    skipgram_reference,
    train_skipgram,
)

PATHS = [
    "0,1,2,0,1", "1,2,0,2", "2,0,1,0",
    "3,4,5,3,4", "4,5,3,5", "5,3,4,3",
    "0,3,0,1", "3,0,3,4",
]


def _walks_ds(paths, nparts=1):
    ds = ray.data.from_pandas(pd.DataFrame({"path": paths}))
    return ds.repartition(nparts) if nparts > 1 else ds


def test_single_block_bit_exact():
    emb, losses = train_skipgram(_walks_ds(PATHS), dim=8, window=2,
                                 epochs=4, seed=5)
    ref, rlosses = skipgram_reference(PATHS, dim=8, window=2,
                                      epochs=4, seed=5)
    assert losses == rlosses
    assert list(emb["vid"]) == list(ref["vid"])
    got = np.stack(emb["embedding"].to_numpy())
    want = np.stack(ref["embedding"].to_numpy())
    assert np.array_equal(got, want)


def test_partitioned_allclose_and_deterministic():
    a, la = train_skipgram(_walks_ds(PATHS, 3), dim=8, window=2,
                           epochs=4, seed=5)
    b, lb = train_skipgram(_walks_ds(PATHS, 3), dim=8, window=2,
                           epochs=4, seed=5)
    ref, lr_ = skipgram_reference(PATHS, dim=8, window=2, epochs=4,
                                  seed=5)
    # same partitioning → bit-identical
    assert np.array_equal(np.stack(a["embedding"].to_numpy()),
                          np.stack(b["embedding"].to_numpy()))
    assert la == lb
    # vs the sequential order: float-reduction equal
    assert np.allclose(np.stack(a["embedding"].to_numpy()),
                       np.stack(ref["embedding"].to_numpy()),
                       rtol=1e-9, atol=1e-12)
    assert np.allclose(la, lr_, rtol=1e-9)


def test_loss_decreases():
    _, losses = train_skipgram(_walks_ds(PATHS), dim=8, window=2,
                               epochs=6, lr=0.5, seed=1)
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_walks_to_embeddings_community_structure():
    # two triangles bridged by one edge; walks → SGNS; intra-community
    # cosine must exceed inter-community cosine on average
    from graphscope_ray.pipelines.walks import random_walks
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    edges = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["src", "dst"]).astype(np.int64))
    walks = random_walks(edges, walk_length=8, num_walks=6, seed=11)
    emb, _ = train_skipgram(walks, dim=16, window=2, epochs=60,
                            lr=1.0, seed=11)
    E = np.stack(emb.sort_values("vid")["embedding"].to_numpy())
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    S = E @ E.T
    comm = [0, 0, 0, 1, 1, 1]
    intra, inter = [], []
    for i in range(6):
        for j in range(i + 1, 6):
            (intra if comm[i] == comm[j] else inter).append(S[i, j])
    assert np.mean(intra) > np.mean(inter)


def test_nx_node2vec_surface():
    from graphscope_ray import nx_compat as gnx
    G = gnx.Graph([("a", "b"), ("b", "c"), ("c", "a")])
    emb = gnx.node2vec(G, dim=8, walk_length=4, num_walks=2, epochs=3,
                       seed=3)
    assert set(emb) == {"a", "b", "c"}
    assert all(len(v) == 8 for v in emb.values())
    emb2 = gnx.node2vec(G, dim=8, walk_length=4, num_walks=2, epochs=3,
                        seed=3)
    for k in emb:
        assert np.array_equal(emb[k], emb2[k])   # deterministic


def test_model_cap_dispatches_to_sharded(monkeypatch):
    """Past MODEL_BROADCAST_LIMIT_ELEMS train_skipgram switches to the
    range-sharded parameter-holder engine and the result stays
    BIT-EXACT equal to the broadcast engine."""
    import graphscope_ray.functions.skipgram as sg
    ref, rl = train_skipgram(_walks_ds(PATHS), dim=8, window=2,
                             epochs=3, seed=5)
    monkeypatch.setattr(sg, "MODEL_BROADCAST_LIMIT_ELEMS", 10)
    emb, losses = sg.train_skipgram(_walks_ds(PATHS), dim=8, window=2,
                                    epochs=3, seed=5)
    assert losses == rl
    assert np.array_equal(np.stack(emb["embedding"].to_numpy()),
                          np.stack(ref["embedding"].to_numpy()))


def test_sharded_bit_exact_vs_broadcast():
    """Explicit sharded engine at P∈{1,3} blocks × S∈{2,3} holders:
    embeddings and losses bit-identical to the broadcast engine on the
    same partitioning (per-holder reduce preserves the (bkey, kind,
    row) order)."""
    from graphscope_ray.functions.skipgram import train_skipgram_sharded
    for nparts in (1, 3):
        ref, rl = train_skipgram(_walks_ds(PATHS, nparts), dim=8,
                                 window=2, epochs=3, seed=5)
        for S in (2, 3):
            emb, losses = train_skipgram_sharded(
                _walks_ds(PATHS, nparts), dim=8, window=2, epochs=3,
                seed=5, num_shards=S)
            assert losses == rl, (nparts, S)
            a = np.stack(emb.sort_values("vid")["embedding"].to_numpy())
            b = np.stack(ref.sort_values("vid")["embedding"].to_numpy())
            assert np.array_equal(a, b), (nparts, S)
