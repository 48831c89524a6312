"""Distributed full-batch GNN training (GCN / GraphSAGE-mean) vs a
sequential dense-numpy oracle sharing the same scalar kernels: final
parameters, loss trajectory and predictions must agree at P∈{1,3};
training must actually learn a planted 2-community labeling."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.functions.gnn import (
    dense_ahat,
    dense_mean_nbr,
    init_params,
    masked_output_grad,
    relu,
    softmax_rows,
)
from graphscope_ray.pipelines.gnn_train import (
    gnn_embeddings,
    gnn_predictions,
    train_gnn,
)
from graphscope_ray.state.graph import build_graph

PAIRS = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3),
         (6, 7), (7, 8), (8, 6), (8, 9), (9, 10), (10, 8), (5, 6)]
N = 11


def _features(n, f, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randn(n, f).round(3)  # rounded → exactly representable


def _labels(n):
    y = np.full(n, -1, np.int64)
    # planted: vertices 0..5 class 0, 6..10 class 1; hold out a few
    y[[0, 1, 3, 6, 8, 9]] = [0, 0, 0, 1, 1, 1]
    return y


def _seq_train(edges, n, X, y, conv, hidden, classes, iters, lr, wd,
               seed):
    """Sequential oracle: dense aggregation, same kernels, same
    update rule, same deterministic init."""
    pos_edges = np.array(edges + [(b, a) for a, b in edges], np.int64)
    if conv == "gcn":
        A = dense_ahat(pos_edges, n)
        F1 = A @ X
    else:
        M = dense_mean_nbr(pos_edges, n)
        F1 = np.concatenate([X, M @ X], axis=1)
    in1 = X.shape[1] * (2 if conv == "sage" else 1)
    in2 = hidden * (2 if conv == "sage" else 1)
    params = init_params(seed, [in1, hidden])
    p2 = init_params(seed + 1, [in2, classes])
    params["W2"], params["b2"] = p2["W1"], p2["b1"]
    n_lab = int((y >= 0).sum())
    losses = []
    for _ in range(iters):
        Z1 = F1 @ params["W1"] + params["b1"]
        H1 = relu(Z1)
        G1 = (A @ H1 if conv == "gcn"
              else np.concatenate([H1, M @ H1], axis=1))
        Z2 = G1 @ params["W2"] + params["b2"]
        P = softmax_rows(Z2)
        lab = y >= 0
        losses.append(float(
            -np.log(P[lab, y[lab]]).sum() / n_lab))
        dZ2 = masked_output_grad(P, y, n_lab)
        dW2 = G1.T @ dZ2
        db2 = dZ2.sum(axis=0)
        dH1 = dZ2 @ params["W2"].T
        if conv == "gcn":
            dH1 = A @ dH1  # Âᵀ = Â
        else:
            dH1 = dH1[:, :hidden] + M.T @ dH1[:, hidden:]
        dZ1 = dH1 * (Z1 > 0)
        dW1 = F1.T @ dZ1
        db1 = dZ1.sum(axis=0)
        params = {
            "W1": params["W1"] - lr * (dW1 + wd * params["W1"]),
            "b1": params["b1"] - lr * db1,
            "W2": params["W2"] - lr * (dW2 + wd * params["W2"]),
            "b2": params["b2"] - lr * db2,
        }
    Z1 = F1 @ params["W1"] + params["b1"]
    H1 = relu(Z1)
    G1 = (A @ H1 if conv == "gcn"
          else np.concatenate([H1, M @ H1], axis=1))
    P = softmax_rows(G1 @ params["W2"] + params["b2"])
    return params, losses, P.argmax(axis=1)


def _pool(P):
    df = pd.DataFrame(PAIRS, columns=["src", "dst"]).astype(np.int64)
    return build_graph(ray.data.from_pandas(df), num_partitions=P,
                       directed=False)


def _feature_ds(X, y):
    return ray.data.from_pandas(pd.DataFrame({
        "vid": np.arange(len(X), dtype=np.int64),
        "feat": [row.tolist() for row in X],
        "label": y,
    }))


@pytest.mark.parametrize("conv", ["gcn", "sage"])
@pytest.mark.parametrize("P", [1, 3])
def test_parity_vs_sequential_oracle(conv, P):
    X, y = _features(N, 5), _labels(N)
    g = _pool(P)
    params, metrics = train_gnn(
        g, _feature_ds(X, y), hidden=8, num_classes=2, conv=conv,
        iters=12, lr=0.3, weight_decay=1e-3, seed=11)
    ref_params, ref_losses, ref_pred = _seq_train(
        PAIRS, N, X, y, conv, 8, 2, 12, 0.3, 1e-3, 11)
    for k in ("W1", "b1", "W2", "b2"):
        np.testing.assert_allclose(params[k], ref_params[k],
                                   rtol=1e-9, atol=1e-11)
    got_losses = [m["loss"] for m in metrics["iters"][:-1]]
    np.testing.assert_allclose(got_losses, ref_losses,
                               rtol=1e-9, atol=1e-12)
    pred = gnn_predictions(g).to_pandas().sort_values("vid")
    assert np.array_equal(pred["pred"].to_numpy(), ref_pred)
    g.call_all("gnn_free")


def test_learns_planted_communities_and_is_deterministic():
    X0, y = _features(N, 4, seed=5), _labels(N)
    # make features informative: shift by community
    X = X0 + np.where(np.arange(N) < 6, -1.0, 1.0)[:, None]
    g = _pool(3)
    params1, metrics = train_gnn(
        g, _feature_ds(X, y), hidden=8, num_classes=2, conv="gcn",
        iters=40, lr=0.5, seed=2)
    pred = gnn_predictions(g).to_pandas().sort_values("vid")
    truth = (np.arange(N) >= 6).astype(np.int64)
    assert (pred["pred"].to_numpy() == truth).mean() >= 0.9
    assert metrics["iters"][-1]["loss"] < metrics["iters"][0]["loss"]
    emb = gnn_embeddings(g).to_pandas()
    assert len(emb) == N and len(emb["emb"].iloc[0]) == 8
    g.call_all("gnn_free")
    # bit-identical rerun
    g2 = _pool(3)
    params2, _ = train_gnn(
        g2, _feature_ds(X, y), hidden=8, num_classes=2, conv="gcn",
        iters=40, lr=0.5, seed=2)
    for k in params1:
        assert np.array_equal(params1[k], params2[k])
    g2.call_all("gnn_free")


def test_missing_features_and_unlabeled_default():
    """Vertices without a feature row train as zero rows; num_classes
    inferred from the label max; directed pool rejected for GCN."""
    X, y = _features(N, 3), _labels(N)
    keep = np.arange(N) != 4  # drop vertex 4's row entirely
    ds = ray.data.from_pandas(pd.DataFrame({
        "vid": np.arange(N, dtype=np.int64)[keep],
        "feat": [row.tolist() for row in X[keep]],
        "label": y[keep],
    }))
    g = _pool(3)
    params, metrics = train_gnn(g, ds, hidden=4, conv="gcn",
                                iters=3, lr=0.1, seed=1)
    assert metrics["num_classes"] == 2
    assert metrics["rows_placed"] == N - 1
    # oracle with vertex 4 zeroed
    X2 = X.copy()
    X2[4] = 0.0
    y2 = y.copy()
    y2[4] = -1
    ref_params, _, _ = _seq_train(PAIRS, N, X2, y2, "gcn", 4, 2, 3,
                                  0.1, 5e-4, 1)
    np.testing.assert_allclose(params["W1"], ref_params["W1"],
                               rtol=1e-9, atol=1e-12)
    g.call_all("gnn_free")

    df = pd.DataFrame(PAIRS, columns=["src", "dst"]).astype(np.int64)
    gd = build_graph(ray.data.from_pandas(df), num_partitions=2,
                     directed=True)
    with pytest.raises(ValueError, match="undirected"):
        train_gnn(gd, _feature_ds(X, y), conv="gcn", iters=1)


def test_session_surface_string_oids():
    """gs.gnn_node_classification over a string-keyed session graph:
    the relabel path + node-mapped Context, learning a 2-community
    labeling."""
    import graphscope_ray.session as gs

    names = [f"n{i:02d}" for i in range(N)]
    edges = pd.DataFrame({"u": [names[a] for a, b in PAIRS],
                          "v": [names[b] for a, b in PAIRS]})
    sess = gs.session(num_partitions=3)
    g = sess.g(directed=False).add_edges(edges, src_field="u",
                                         dst_field="v")
    X = _features(N, 4, seed=5) + np.where(
        np.arange(N) < 6, -1.0, 1.0)[:, None]
    y = _labels(N)
    feats = pd.DataFrame({"node": names,
                          "f0": X[:, 0], "f1": X[:, 1],
                          "f2": X[:, 2], "f3": X[:, 3],
                          "label": y})
    ctx, metrics = gs.gnn_node_classification(
        g, feats, node_field="node", feat_fields=["f0", "f1", "f2",
                                                  "f3"],
        conv="sage", hidden=8, iters=40, lr=0.5, seed=2)
    df = ctx.to_dataframe()
    assert sorted(df["node"]) == sorted(names)
    truth = {n: int(i >= 6) for i, n in enumerate(names)}
    acc = np.mean([truth[r.node] == r.pred for r in df.itertuples()])
    assert acc >= 0.9
    assert metrics["num_classes"] == 2


# ------------------------------------------------------------------
# Mini-batch neighbor-sampled GraphSAGE (the scale path)
# ------------------------------------------------------------------

def _adj(pairs, n):
    adj = {u: set() for u in range(n)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def _replica_sample(adj, frontier, fanout, seed):
    """Sequential replica of GraphShard.nbr_sample's deterministic
    rank formula over a dense adjacency dict."""
    from graphscope_ray.functions.hashing import hash64_ints, splitmix64
    src_out, dst_out = [], []
    for u in np.asarray(frontier, np.int64):
        nbrs = np.array(sorted(adj[int(u)]), np.int64)
        if not len(nbrs):
            continue
        with np.errstate(over="ignore"):
            r = splitmix64(
                hash64_ints(np.full(len(nbrs), u, np.int64))
                ^ hash64_ints(nbrs + 7) ^ np.uint64(seed))
        take = nbrs[np.argsort(r, kind="mergesort")][:fanout]
        src_out.extend([int(u)] * len(take))
        dst_out.extend(take.tolist())
    if not src_out:
        return np.empty((0, 2), np.int64)
    src = np.array(src_out, np.int64)
    dst = np.array(dst_out, np.int64)
    order = np.lexsort((dst, src))
    return np.column_stack([src[order], dst[order]])


def _replica_minibatch(pairs, n, X, y, *, hidden, classes, fanouts,
                       batch_size, epochs, lr, wd, seed):
    from graphscope_ray.functions.gnn import (init_params,
                                              sage_minibatch_step)
    from graphscope_ray.functions.hashing import hash64_ints
    from graphscope_ray.pipelines.gnn_train import _step_seed
    adj = _adj(pairs, n)
    labeled = np.sort(np.flatnonzero(y >= 0)).astype(np.int64)
    params = init_params(seed, [2 * X.shape[1], hidden])
    p2 = init_params(seed + 1, [2 * hidden, classes])
    params["W2"], params["b2"] = p2["W1"], p2["b1"]
    step_no = 0
    for ep in range(epochs):
        with np.errstate(over="ignore"):
            shuf = hash64_ints(labeled) ^ np.uint64(
                _step_seed(seed, ep, 0, 3))
        order = np.argsort(shuf, kind="mergesort")
        for lo in range(0, len(labeled), batch_size):
            vb = np.sort(labeled[order[lo:lo + batch_size]])
            arcs1 = _replica_sample(
                adj, vb, fanouts[0], _step_seed(seed, ep, step_no, 0))
            v1 = np.union1d(vb, arcs1[:, 1]) if len(arcs1) else vb
            arcs2 = _replica_sample(
                adj, v1, fanouts[1], _step_seed(seed, ep, step_no, 1))
            v2 = np.union1d(v1, arcs2[:, 1]) if len(arcs2) else v1
            X2 = X[v2]
            yb = y[vb]
            grads, _, _ = sage_minibatch_step(
                params, X2, vb, v1, v2, arcs1, arcs2, yb, wd)
            params = {k: params[k] - lr * grads[k] for k in params}
            step_no += 1
    return params


@pytest.mark.parametrize("P", [1, 3])
def test_minibatch_replica_parity(P):
    from graphscope_ray.pipelines.gnn_train import train_sage_minibatch
    X, y = _features(N, 4), _labels(N)
    g = _pool(P)
    got, metrics = train_sage_minibatch(
        g, _feature_ds(X, y), hidden=6, num_classes=2, fanouts=(3, 2),
        batch_size=4, epochs=3, lr=0.2, weight_decay=1e-3, seed=13)
    want = _replica_minibatch(
        PAIRS, N, X, y, hidden=6, classes=2, fanouts=(3, 2),
        batch_size=4, epochs=3, lr=0.2, wd=1e-3, seed=13)
    for k in ("W1", "b1", "W2", "b2"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-12,
                                   atol=1e-14)
    assert metrics["n_labeled"] == 6
    g.call_all("gnn_free")


def test_minibatch_learns_and_full_forward_inference():
    from graphscope_ray.pipelines.gnn_train import (
        sage_minibatch_node_classification,
    )
    X0, y = _features(N, 4, seed=5), _labels(N)
    X = X0 + np.where(np.arange(N) < 6, -1.5, 1.5)[:, None]
    g = _pool(3)
    preds, metrics = sage_minibatch_node_classification(
        g, _feature_ds(X, y), hidden=8, num_classes=2, fanouts=(5, 3),
        batch_size=3, epochs=25, lr=0.3, seed=4)
    pred = preds.to_pandas().sort_values("vid")
    truth = (np.arange(N) >= 6).astype(np.int64)
    assert len(pred) == N
    assert (pred["pred"].to_numpy() == truth).mean() >= 0.9
    assert (metrics["iters"][-1]["loss"]
            < metrics["iters"][0]["loss"])
    g.call_all("gnn_free")


def test_minibatch_deterministic_across_runs():
    from graphscope_ray.pipelines.gnn_train import train_sage_minibatch
    X, y = _features(N, 3, seed=9), _labels(N)
    outs = []
    for _ in range(2):
        g = _pool(2)
        p, _ = train_sage_minibatch(
            g, _feature_ds(X, y), hidden=4, num_classes=2,
            fanouts=(2, 2), batch_size=4, epochs=2, seed=21)
        outs.append(p)
        g.call_all("gnn_free")
    for k in outs[0]:
        assert np.array_equal(outs[0][k], outs[1][k])


def test_minibatch_session_surface_string_oids():
    """gs.gnn_node_classification_minibatch over a string-keyed
    session graph — relabel path + sampled training + full-forward
    inference end to end."""
    import graphscope_ray.session as gs

    names = [f"n{i:02d}" for i in range(N)]
    edges = pd.DataFrame({"u": [names[a] for a, b in PAIRS],
                          "v": [names[b] for a, b in PAIRS]})
    sess = gs.session(num_partitions=3)
    g = sess.g(directed=False).add_edges(edges, src_field="u",
                                         dst_field="v")
    X = _features(N, 4, seed=5) + np.where(
        np.arange(N) < 6, -1.5, 1.5)[:, None]
    y = _labels(N)
    feats = pd.DataFrame({"node": names,
                          "f0": X[:, 0], "f1": X[:, 1],
                          "f2": X[:, 2], "f3": X[:, 3],
                          "label": y})
    ctx, metrics = gs.gnn_node_classification_minibatch(
        g, feats, node_field="node",
        feat_fields=["f0", "f1", "f2", "f3"],
        hidden=8, fanouts=(5, 3), batch_size=3, epochs=25, lr=0.3,
        seed=4)
    df = ctx.to_dataframe()
    assert sorted(df["node"]) == sorted(names)
    truth = {n: int(i >= 6) for i, n in enumerate(names)}
    acc = np.mean([truth[r.node] == r.pred for r in df.itertuples()])
    assert acc >= 0.9
    assert metrics["conv"] == "sage-minibatch"


def test_minibatch_checkpoint_resume_bitexact(tmp_path):
    """Interrupt-after-2-epochs + resume-to-4 equals an uninterrupted
    4-epoch run bit-for-bit (sampling seeds key on the global step);
    mismatched config refuses to resume."""
    from graphscope_ray.pipelines.gnn_train import train_sage_minibatch
    X, y = _features(N, 3, seed=9), _labels(N)
    ck = str(tmp_path / "ck")

    g = _pool(2)
    p_straight, _ = train_sage_minibatch(
        g, _feature_ds(X, y), hidden=4, num_classes=2,
        fanouts=(2, 2), batch_size=4, epochs=4, seed=21)
    g.call_all("gnn_free")

    g = _pool(2)
    train_sage_minibatch(
        g, _feature_ds(X, y), hidden=4, num_classes=2,
        fanouts=(2, 2), batch_size=4, epochs=2, seed=21, ckpt_dir=ck)
    g.call_all("gnn_free")

    g = _pool(2)
    p_resumed, m = train_sage_minibatch(
        g, _feature_ds(X, y), hidden=4, num_classes=2,
        fanouts=(2, 2), batch_size=4, epochs=4, seed=21, ckpt_dir=ck)
    g.call_all("gnn_free")
    for k in p_straight:
        assert np.array_equal(p_straight[k], p_resumed[k]), k
    assert [mm["epoch"] for mm in m["iters"]] == [0, 1, 2, 3]

    # config mismatch refuses
    g = _pool(2)
    with pytest.raises(ValueError, match="config mismatch"):
        train_sage_minibatch(
            g, _feature_ds(X, y), hidden=4, num_classes=2,
            fanouts=(2, 2), batch_size=4, epochs=4, seed=99,
            ckpt_dir=ck)
    g.call_all("gnn_free")


class TestDataParallelMinibatch:
    """Synchronous data-parallel minibatch SAGE (r5): fixed seed-chunk
    gradient partials + chunk-ordered reduce."""

    def test_one_chunk_equals_sequential_trajectory(self):
        """dp_chunk >= batch_size → one chunk per step: the dp reduce
        degenerates to the monolithic kernel up to the deferred
        weight-decay add — parameters must agree to float-assoc
        tolerance with the sequential-actor trainer."""
        from graphscope_ray.pipelines.gnn_train import train_sage_minibatch
        X, y = _features(N, 4), _labels(N)
        g = _pool(2)
        seq, _ = train_sage_minibatch(
            g, _feature_ds(X, y), hidden=6, num_classes=2,
            fanouts=(3, 2), batch_size=4, epochs=2, lr=0.2,
            weight_decay=1e-3, seed=13)
        g.call_all("gnn_free")
        g2 = _pool(2)
        dp, m = train_sage_minibatch(
            g2, _feature_ds(X, y), hidden=6, num_classes=2,
            fanouts=(3, 2), batch_size=4, epochs=2, lr=0.2,
            weight_decay=1e-3, seed=13, data_parallel=True,
            dp_chunk=64)
        g2.call_all("gnn_free")
        assert m["data_parallel"] is True
        for k in ("W1", "b1", "W2", "b2"):
            np.testing.assert_allclose(dp[k], seq[k], rtol=1e-12,
                                       atol=1e-13)

    def test_chunked_result_independent_of_chunk_launch(self):
        """Same dp_chunk, two runs → bit-identical params (the chunk
        grid, not scheduling, defines the reduce)."""
        from graphscope_ray.pipelines.gnn_train import train_sage_minibatch
        X, y = _features(N, 4), _labels(N)
        outs = []
        for _ in range(2):
            g = _pool(3)
            p, _ = train_sage_minibatch(
                g, _feature_ds(X, y), hidden=6, num_classes=2,
                fanouts=(3, 2), batch_size=6, epochs=2, lr=0.2,
                weight_decay=1e-3, seed=13, data_parallel=True,
                dp_chunk=2)
            g.call_all("gnn_free")
            outs.append(p)
        for k in ("W1", "b1", "W2", "b2"):
            assert np.array_equal(outs[0][k], outs[1][k]), k

    def test_chunked_matches_sequential_replica(self):
        """dp with small chunks vs a driver-side replica that applies
        the SAME chunk decomposition and reduce — replica-exact."""
        from graphscope_ray.functions.gnn import sage_minibatch_step
        from graphscope_ray.functions.hashing import hash64_ints
        from graphscope_ray.pipelines.gnn_train import (
            _chunk_subgraph,
            _gather_rows,
            _sample_arcs,
            _step_seed,
            train_sage_minibatch,
        )
        X, y = _features(N, 4), _labels(N)
        hidden, classes, fanouts = 6, 2, (3, 2)
        batch, epochs, lr, wd, seed = 4, 2, 0.2, 1e-3, 13
        dp_chunk = 2
        g = _pool(2)
        got, _ = train_sage_minibatch(
            g, _feature_ds(X, y), hidden=hidden, num_classes=classes,
            fanouts=fanouts, batch_size=batch, epochs=epochs, lr=lr,
            weight_decay=wd, seed=seed, data_parallel=True,
            dp_chunk=dp_chunk)
        g.call_all("gnn_free")
        # replica: same sampling waves via the pool, same chunk reduce
        g = _pool(2)
        from graphscope_ray.pipelines.gnn_train import (
            init_params,
            load_vertex_features,
        )
        f_dim, _, _ = load_vertex_features(g, _feature_ds(X, y))
        labeled = np.sort(np.concatenate(
            [np.asarray(a, np.int64)
             for a in g.call_all("gnn_labeled_vids")]))
        params = init_params(seed, [2 * f_dim, hidden])
        p2 = init_params(seed + 1, [2 * hidden, classes])
        params["W2"], params["b2"] = p2["W1"], p2["b1"]
        step_no = 0
        for ep in range(epochs):
            with np.errstate(over="ignore"):
                shuf = hash64_ints(labeled) ^ np.uint64(
                    _step_seed(seed, ep, 0, 3))
            order = np.argsort(shuf, kind="mergesort")
            for lo in range(0, len(labeled), batch):
                vb = np.sort(labeled[order[lo:lo + batch]])
                s1 = _step_seed(seed, ep, step_no, 0)
                s2 = _step_seed(seed, ep, step_no, 1)
                arcs1 = _sample_arcs(g.shards, vb, fanouts[0], s1)
                v1 = (np.union1d(vb, arcs1[:, 1])
                      if len(arcs1) else vb)
                arcs2 = _sample_arcs(g.shards, v1, fanouts[1], s2)
                v2 = (np.union1d(v1, arcs2[:, 1])
                      if len(arcs2) else v1)
                X2, y2 = _gather_rows(g.shards, v2)
                yb = y2[np.searchsorted(v2, vb)]
                B = len(vb)
                gsum = {k: np.zeros_like(v) for k, v in params.items()}
                for clo in range(0, B, dp_chunk):
                    chunk = vb[clo:clo + dp_chunk]
                    a1, v1c, a2, v2c, X2c, ybc = _chunk_subgraph(
                        chunk, arcs1, arcs2, v2, X2, yb, clo)
                    grads, _, _ = sage_minibatch_step(
                        params, X2c, chunk, v1c, v2c, a1, a2, ybc,
                        0.0)
                    for k in gsum:
                        gsum[k] += grads[k] * (len(chunk) / B)
                gsum["W1"] = gsum["W1"] + wd * params["W1"]
                gsum["W2"] = gsum["W2"] + wd * params["W2"]
                for k in params:
                    params[k] = params[k] - lr * gsum[k]
                step_no += 1
        g.call_all("gnn_free")
        for k in ("W1", "b1", "W2", "b2"):
            assert np.array_equal(got[k], params[k]), k
