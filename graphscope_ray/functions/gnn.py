"""Shared numerical kernels for distributed full-batch GNN training.

These are the pure, deterministic building blocks used identically by
the distributed trainer (``pipelines/gnn_train`` driving SpMM waves on
the ``GraphShard`` pool) and by the sequential test oracle — weight
initialization, the ReLU / softmax / cross-entropy math, and the GCN
symmetric normalization. Keeping them here guarantees the replica
parity the tests pin is about the *dataflow*, never about diverging
scalar math.

Semantics follow the public formulations:
- GCN: Kipf & Welling 2017, ``H' = relu(D̃^{-1/2}(A+I)D̃^{-1/2} H W)``.
- GraphSAGE-mean: Hamilton et al. 2017,
  ``H' = relu([H ‖ mean_{u∈N(v)} H_u] W)``.

The reference system ships GNN training through its learning engine
(``learning_engine/graph-learn`` / GLE-for-PyTorch); this module is
the from-scratch numpy equivalent of the *model math* for the
full-batch case, designed so every dense step is per-shard local and
every sparse step is one add-combine message wave.
"""

from __future__ import annotations

import numpy as np

from graphscope_ray.functions.hashing import splitmix64


def glorot_uniform(seed: int, tag: int, fan_in: int,
                   fan_out: int) -> np.ndarray:
    """Deterministic Glorot-uniform (fan_in, fan_out) float64 matrix.

    Entry (i, j) is a pure function of (seed, tag, i, j) — splitmix64
    of the packed index mapped to [-limit, +limit] — so the same call
    yields bit-identical weights in any process, on any partitioning,
    in the driver and in the sequential oracle.
    """
    n = fan_in * fan_out
    idx = (np.arange(n, dtype=np.uint64)
           + np.uint64((seed & 0xFFFF) * 0x1000003) * np.uint64(2**32)
           + np.uint64(tag & 0xFFFF) * np.uint64(2**20))
    u = splitmix64(idx).astype(np.float64) / float(2**64)  # [0, 1)
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return ((u * 2.0 - 1.0) * limit).reshape(fan_in, fan_out)


def init_params(seed: int, dims: list[int]) -> dict[str, np.ndarray]:
    """Weights + zero biases for an MLP-shaped stack ``dims`` (e.g.
    [f, h, c] → W1 (f×h), b1, W2 (h×c), b2). Deterministic in seed."""
    params: dict[str, np.ndarray] = {}
    for layer in range(len(dims) - 1):
        params[f"W{layer + 1}"] = glorot_uniform(
            seed, layer, dims[layer], dims[layer + 1])
        params[f"b{layer + 1}"] = np.zeros(dims[layer + 1], np.float64)
    return params


def relu(z: np.ndarray) -> np.ndarray:
    return np.maximum(z, 0.0)


def softmax_rows(z: np.ndarray) -> np.ndarray:
    """Row-wise stable softmax."""
    m = z.max(axis=1, keepdims=True)
    e = np.exp(z - m)
    return e / e.sum(axis=1, keepdims=True)


def ce_loss_rows(probs: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Per-row cross-entropy −log p[y] (callers mask unlabeled rows)."""
    n = len(y)
    p = probs[np.arange(n), y]
    return -np.log(np.maximum(p, 1e-300))


def masked_output_grad(probs: np.ndarray, y: np.ndarray,
                       n_labeled_total: int) -> np.ndarray:
    """dLoss/dZ_out for mean cross-entropy over the labeled mask:
    (softmax − onehot)/N on labeled rows, 0 elsewhere. ``y`` uses −1
    for unlabeled."""
    dz = np.zeros_like(probs)
    lab = y >= 0
    if lab.any() and n_labeled_total > 0:
        idx = np.flatnonzero(lab)
        dz[idx] = probs[idx]
        dz[idx, y[idx]] -= 1.0
        dz[idx] /= float(n_labeled_total)
    return dz


def sym_norm_scale(deg: np.ndarray) -> np.ndarray:
    """GCN symmetric-normalization scale s = 1/sqrt(deg + 1) (the +1 is
    the renormalization-trick self loop, so s is always finite)."""
    return 1.0 / np.sqrt(deg.astype(np.float64) + 1.0)


def inv_deg_scale(deg: np.ndarray) -> np.ndarray:
    """Mean-aggregator scale 1/deg with 0 for isolated vertices (the
    mean over an empty neighborhood is the zero vector)."""
    d = deg.astype(np.float64)
    out = np.zeros_like(d)
    nz = d > 0
    out[nz] = 1.0 / d[nz]
    return out


def dense_ahat(edges: np.ndarray, n: int) -> np.ndarray:
    """Dense GCN-normalized adjacency D̃^{-1/2}(A+I)D̃^{-1/2} over
    vertex *positions* 0..n−1 — the sequential oracle's aggregation
    operator. ``edges`` is an (m, 2) position array; both arcs of an
    undirected edge must be present (matching the pool's undirected
    CSR)."""
    A = np.zeros((n, n), np.float64)
    if len(edges):
        A[edges[:, 0], edges[:, 1]] = 1.0
    deg = A.sum(axis=1)
    s = sym_norm_scale(deg)
    return (A + np.eye(n)) * s[:, None] * s[None, :]


def dense_mean_nbr(edges: np.ndarray, n: int) -> np.ndarray:
    """Dense row-normalized adjacency D^{-1}A (GraphSAGE mean
    aggregator) over vertex positions, zero rows for isolated
    vertices."""
    A = np.zeros((n, n), np.float64)
    if len(edges):
        A[edges[:, 0], edges[:, 1]] = 1.0
    return inv_deg_scale(A.sum(axis=1))[:, None] * A


def sage_minibatch_step(params: dict, X2: np.ndarray,
                        vb: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                        arcs1: np.ndarray, arcs2: np.ndarray,
                        yb: np.ndarray, weight_decay: float):
    """One GraphSAGE-mean minibatch forward/backward (Hamilton et al.
    2017 Alg. 2): seeds ``vb`` ⊆ hop-1 set ``v1`` ⊆ hop-2 set ``v2``
    (all sorted); ``arcs1`` (src ∈ vb → dst ∈ v1) and ``arcs2``
    (src ∈ v1 → dst ∈ v2) are the SAMPLED neighbor arcs, deduped and
    sorted by (src, dst); ``X2`` holds features row-aligned with v2.

    Returns (grads, loss_sum, n_correct). Pure numpy and fully
    deterministic (sequential ``np.add.at`` scatters, sorted inputs) —
    shared by the distributed trainer and the sequential test oracle.
    Layer means are over the sampled arcs only (the SAGE estimator);
    vertices with no sampled neighbors aggregate the zero vector, the
    same convention as the full-batch ``inv_deg_scale`` path.
    """
    W1, b1 = params["W1"], params["b1"]
    W2, b2 = params["W2"], params["b2"]
    nb, n1 = len(vb), len(v1)
    h = W1.shape[1]

    M1 = np.zeros((n1, X2.shape[1]), np.float64)
    c1 = np.zeros(n1, np.float64)
    if len(arcs2):
        s2i = np.searchsorted(v1, arcs2[:, 0])
        d2i = np.searchsorted(v2, arcs2[:, 1])
        np.add.at(M1, s2i, X2[d2i])
        c1 = np.bincount(s2i, minlength=n1).astype(np.float64)
    cs1 = np.maximum(c1, 1.0)
    M1 /= cs1[:, None]
    b1_in_2 = np.searchsorted(v2, v1)
    C1 = np.concatenate([X2[b1_in_2], M1], axis=1)
    Z1 = C1 @ W1 + b1
    H1 = relu(Z1)

    M0 = np.zeros((nb, h), np.float64)
    c0 = np.zeros(nb, np.float64)
    if len(arcs1):
        s1i = np.searchsorted(vb, arcs1[:, 0])
        d1i = np.searchsorted(v1, arcs1[:, 1])
        np.add.at(M0, s1i, H1[d1i])
        c0 = np.bincount(s1i, minlength=nb).astype(np.float64)
    cs0 = np.maximum(c0, 1.0)
    M0 /= cs0[:, None]
    b_in_1 = np.searchsorted(v1, vb)
    C2 = np.concatenate([H1[b_in_1], M0], axis=1)
    Z2 = C2 @ W2 + b2
    P = softmax_rows(Z2)
    loss_sum = float(ce_loss_rows(P, yb).sum())
    correct = int((P.argmax(axis=1) == yb).sum())

    dZ2 = P.copy()
    dZ2[np.arange(nb), yb] -= 1.0
    dZ2 /= nb
    dW2 = C2.T @ dZ2 + weight_decay * W2
    db2 = dZ2.sum(axis=0)
    dC2 = dZ2 @ W2.T
    dH1 = np.zeros_like(H1)
    dH1[b_in_1] += dC2[:, :h]
    if len(arcs1):
        np.add.at(dH1, d1i, dC2[:, h:][s1i] / cs0[s1i, None])
    dZ1 = dH1 * (Z1 > 0)
    dW1 = C1.T @ dZ1 + weight_decay * W1
    db1 = dZ1.sum(axis=0)
    return ({"W1": dW1, "b1": db1, "W2": dW2, "b2": db2},
            loss_sum, correct)
