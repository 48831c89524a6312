"""Distributed full-batch GNN training on the shard pool.

The model-training half the reference ships through its learning
engine (``learning_engine/graph-learn`` and GLE-for-PyTorch's
full-graph mode): 2-layer GCN (Kipf & Welling) or GraphSAGE-mean
(Hamilton et al.) node classification, trained full-batch with
deterministic gradient descent — but expressed Ray-natively:

- Feature/label rows route ONCE to their owning ``GraphShard`` (the
  same groupby-fid shuffle the graph build uses) and stay resident as
  per-shard float64 matrices — the corpus never re-shuffles.
- Every sparse aggregate (ÂM for GCN, D⁻¹AM / its transpose for
  SAGE-mean) is ONE add-combined message wave on the already-sealed
  CSR — identical plumbing to PageRank's scatter.
- All dense math (layer matmuls, softmax, gradients) is per-shard
  local numpy over the resident rows; only the tiny parameter dict
  (f·h + h·c floats) broadcasts per iteration, and only the equally
  tiny gradient partials come back (deterministically reduced in
  shard order).
- Training costs exactly TWO message waves per iteration: Â·relu(…)
  forward and Âᵀ·grad backward. The layer-1 input (ÂX or
  [X ‖ meanN(X)]) is constant in the weights, so it's aggregated once
  at seal time.

Scale contract: per-shard memory is n_local × (f + 2h + c) float64 —
the natural full-batch GNN footprint, partitioned. Nothing
vertex-scale ever lives on the driver. Mini-batch (sampled) training
at larger feature widths composes with the existing k-hop sampler
(``stages/sampling.k_hop_subgraph`` / ``pipelines/gnn_data``), which
assembles per-seed subgraph batches for exactly that regime.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray

from graphscope_ray.functions.gnn import init_params
from graphscope_ray.functions.hashing import partition_of
from graphscope_ray.state.graph import ShardedGraph, _route_groups


def _spmm(graph: ShardedGraph, name: str, out: str, pre: str,
          post: str, self_coef: str) -> None:
    """One SpMM wave: out = post·(Σ_arcs pre·name + self term)."""
    refs = graph.scatter_refs("gnn_spmm_scatter", name, pre)
    graph.apply_all("gnn_spmm_apply", refs, out, name, post, self_coef)


def _agg_layer_input(graph: ShardedGraph, src: str, out: str,
                     conv: str) -> None:
    """out = ÂM (gcn) or [M ‖ meanN(M)] (sage) for resident matrix
    ``src``."""
    if conv == "gcn":
        _spmm(graph, src, out, "sym", "sym", "sym")
    else:
        _spmm(graph, src, f"_n{src}", "none", "invdeg", "none")
        graph.call_all("gnn_concat", out, src, f"_n{src}")


def load_vertex_features(graph: ShardedGraph, features: ray.data.Dataset,
                         feat_dim: int | None = None,
                         feat_col: str = "feat",
                         label_col: str | None = "label",
                         ) -> tuple[int, int, int]:
    """Route a (vid, feat list<float>[, label]) Dataset to the owning
    shards and seal the resident feature matrices.

    Returns (feat_dim, n_rows_placed, n_labeled). Rows for vids absent
    from the graph are dropped; graph vertices with no feature row get
    zero features and no label.
    """
    if feat_dim is None:
        first = features.take(1)
        if not first:
            raise ValueError("empty feature dataset")
        feat_dim = len(first[0][feat_col])
    cols = ["vid", feat_col] + (
        [label_col] if label_col and label_col in features.schema().names
        else [])
    ds = features.select_columns(cols)

    def norm(t: pa.Table) -> pa.Table:
        vid = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        out = {"vid": pa.array(vid, pa.int64()),
               "feat": t.column(feat_col)}
        if label_col and label_col in t.column_names:
            out["label"] = t.column(label_col).cast(pa.int64())
        out["_fid"] = pa.array(partition_of(vid, graph.P), pa.int32())
        return pa.table(out)

    routed = _route_groups(
        ds.map_batches(norm, batch_format="pyarrow"), graph.shards, "_fid",
        lambda shard, tab: shard.gnn_ingest.remote(tab))
    seals = graph.call_all("gnn_seal", feat_dim)
    placed = sum(s[0] for s in seals)
    n_labeled = sum(s[1] for s in seals)
    del routed
    return feat_dim, placed, n_labeled


def train_gnn(
    graph: ShardedGraph,
    features: ray.data.Dataset,
    *,
    hidden: int = 16,
    num_classes: int | None = None,
    conv: str = "gcn",
    iters: int = 60,
    lr: float = 0.5,
    weight_decay: float = 5e-4,
    seed: int = 7,
    feat_dim: int | None = None,
    feat_col: str = "feat",
    label_col: str = "label",
):
    """Train a 2-layer GCN / GraphSAGE-mean node classifier full-batch.

    Returns ``(params, metrics)`` — the trained parameter dict (W1, b1,
    W2, b2) and per-iteration (loss, accuracy, seconds). Deterministic:
    weights init from ``seed`` via splitmix64, gradients reduce in
    shard order, every kernel is float64.
    """
    if conv not in ("gcn", "sage"):
        raise ValueError(f"conv must be 'gcn' or 'sage', got {conv!r}")
    if conv == "gcn" and graph.directed:
        raise ValueError(
            "GCN symmetric normalization needs an undirected pool "
            "(build_graph(directed=False)); use conv='sage' on directed "
            "graphs or rebuild undirected")
    f_dim, placed, n_labeled = load_vertex_features(
        graph, features, feat_dim=feat_dim, feat_col=feat_col,
        label_col=label_col)
    if n_labeled == 0:
        raise ValueError("no labeled vertices (label column ≥ 0)")
    if num_classes is None:
        num_classes = int(max(graph.call_all("gnn_label_max"))) + 1

    in2 = hidden * (2 if conv == "sage" else 1)
    in1 = f_dim * (2 if conv == "sage" else 1)
    params = init_params(seed, [in1, hidden])
    p2 = init_params(seed + 1, [in2, num_classes])
    params["W2"], params["b2"] = p2["W1"], p2["b1"]

    # layer-1 input is weight-independent: aggregate once
    _agg_layer_input(graph, "X", "F1", conv)

    metrics = []
    for it in range(iters):
        t0 = time.perf_counter()
        wref = [ray.put(params)]
        graph.call_all("gnn_hidden", wref)
        _agg_layer_input(graph, "H1", "G1", conv)
        parts = graph.call_all("gnn_output", wref)
        loss = sum(p[0] for p in parts) / n_labeled
        acc = sum(p[2] for p in parts) / n_labeled
        g2 = graph.call_all("gnn_grad_out", wref, n_labeled, hidden, conv)
        dW2 = sum(g[0] for g in g2)
        db2 = sum(g[1] for g in g2)
        if conv == "gcn":
            _spmm(graph, "Gn", "AGn", "sym", "sym", "sym")
        else:
            _spmm(graph, "Gn", "AGn", "invdeg", "none", "none")
        g1 = graph.call_all("gnn_grad_hidden", conv)
        dW1 = sum(g[0] for g in g1)
        db1 = sum(g[1] for g in g1)
        params = {
            "W1": params["W1"] - lr * (dW1 + weight_decay * params["W1"]),
            "b1": params["b1"] - lr * db1,
            "W2": params["W2"] - lr * (dW2 + weight_decay * params["W2"]),
            "b2": params["b2"] - lr * db2,
        }
        metrics.append({"iter": it, "loss": float(loss),
                        "accuracy": float(acc),
                        "seconds": time.perf_counter() - t0})
    # final forward so predictions/embeddings reflect the last update
    wref = [ray.put(params)]
    graph.call_all("gnn_hidden", wref)
    _agg_layer_input(graph, "H1", "G1", conv)
    parts = graph.call_all("gnn_output", wref)
    metrics.append({"iter": iters,
                    "loss": float(sum(p[0] for p in parts) / n_labeled),
                    "accuracy": float(sum(p[2] for p in parts) / n_labeled),
                    "seconds": 0.0})
    return params, {
        "conv": conv, "feat_dim": f_dim, "hidden": hidden,
        "num_classes": num_classes, "n_labeled": n_labeled,
        "rows_placed": placed, "iters": metrics,
    }


def gnn_predictions(graph: ShardedGraph) -> ray.data.Dataset:
    """(vid, pred, prob) from the pool's last forward pass — per-shard
    Arrow blocks, no driver materialization."""
    return ray.data.from_arrow_refs(
        [s.gnn_predict_table.remote() for s in graph.shards])


def gnn_embeddings(graph: ShardedGraph,
                   layer: str = "H1") -> ray.data.Dataset:
    """(vid, emb list<double>) — the trained hidden representations."""
    return ray.data.from_arrow_refs(
        [s.gnn_embed_table.remote(layer) for s in graph.shards])


def gnn_node_classification(
    graph: ShardedGraph,
    features: ray.data.Dataset,
    **kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """Train + predict in one call; returns (predictions, metrics)."""
    _, metrics = train_gnn(graph, features, **kwargs)
    return gnn_predictions(graph), metrics
