"""Distributed skip-gram with negative sampling (SGNS) over a walk
corpus — the training half of DeepWalk / node2vec (Mikolov et al.
2013; Perozzi et al. 2014). Together with
``pipelines/walks.random_walks`` this closes the GLE-style embedding
pipeline: graph → walks → vertex embeddings, all on Ray Data.

Design (the repo's deterministic full-batch-GD-partials pattern, as in
``functions/classifier.train_logreg`` and ``similarity.kmeans``):

- The embedding matrices (V×d input + V×d output) are the broadcast
  model — ``ray.put`` once per epoch, resolved per block. O(V·d)
  driver/worker memory is the documented contract (same as the vertex
  map), ENFORCED by ``MODEL_BROADCAST_LIMIT_ELEMS``: past that,
  ``train_skipgram`` raises with a pointer to parameter-server
  sharding (the multi-node design for 10⁸⁺-vertex vocabularies:
  range-shard (Win, Wout) rows over actors keyed by the same sorted
  vid order, have each block pull only its touched rows, push sparse
  grads back). The vocab lookup itself is a broadcast SORTED vid
  array + searchsorted (8 bytes/vertex), never a Python dict.
- Each epoch is ONE streaming pass over the walk corpus: a block
  parses its paths vectorized, forms (center, context) pairs within
  the window, draws ``negatives`` deterministic negatives per pair
  (hash → uniform → searchsorted on the broadcast unigram^0.75 CDF —
  no RNG state), computes the SGNS gradients with one fused numpy
  kernel, and emits a SPARSE partial: only the embedding rows the
  block touched, plus its loss. The corpus never shuffles.
- Partials reduce on the driver sorted by block key, so a rerun on the
  same partitioning is bit-identical; across different partitionings
  the result is float-reduction-order equal (allclose ~1e-9 over a few
  epochs) — full-batch GD makes the gradient itself
  partition-invariant up to summation order, unlike hogwild SGD.
- Initialization is a pure hash of (vid, dimension): no RNG, identical
  at any scale/partitioning.

``skipgram_reference`` is the sequential oracle sharing the pair,
negative and gradient kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from graphscope_ray.functions.hashing import hash64_any


#: Max elements per broadcast embedding matrix (V × dim). 5e8 float64
#: = 4 GB per matrix; past this the broadcast-model design must give
#: way to parameter-server sharding (see module docstring).
MODEL_BROADCAST_LIMIT_ELEMS = 500_000_000


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _init_matrix(vids: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic word2vec-style init: uniform(-0.5, 0.5)/dim from a
    pure hash of (vid, j)."""
    W = np.empty((len(vids), dim), np.float64)
    for j in range(dim):
        with np.errstate(over="ignore"):
            h = hash64_any(vids.astype(np.int64) * np.int64(2654435761)
                           + np.int64(j))
        W[:, j] = ((h.astype(np.float64) + 0.5) / 2.0**64 - 0.5) / dim
    return W


def _pairs_from_paths(paths: list[str], window: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (center, context) extraction: every ordered pair at
    distance 1..window inside each walk."""
    toks = [np.fromiter((int(x) for x in p.split(",")), np.int64)
            for p in paths]
    centers, contexts = [], []
    for t in toks:
        n = len(t)
        for off in range(1, min(window, n - 1) + 1):
            centers.append(t[:-off])
            contexts.append(t[off:])
            centers.append(t[off:])
            contexts.append(t[:-off])
    if not centers:
        z = np.array([], np.int64)
        return z, z
    return np.concatenate(centers), np.concatenate(contexts)


def _negatives(center_idx: np.ndarray, context_idx: np.ndarray,
               k: int, cdf: np.ndarray, seed: int) -> np.ndarray:
    """(n, k) deterministic negative row-indices ∝ unigram^0.75:
    u = hash(center, context, j, seed) → searchsorted(cdf)."""
    n = len(center_idx)
    out = np.empty((n, k), np.int64)
    with np.errstate(over="ignore"):
        base = (hash64_any(center_idx.astype(np.int64)
                           * np.int64(1000003)
                           + context_idx.astype(np.int64))
                ^ np.uint64(np.int64(seed) & 0x7FFFFFFFFFFFFFFF))
        for j in range(k):
            h = hash64_any((base.view(np.int64)
                            + np.int64(j + 1) * np.int64(99991)))
            u = (h.astype(np.float64) + 0.5) / 2.0**64
            out[:, j] = np.searchsorted(cdf, u, side="right")
    return out


def _sgns_grads(ci: np.ndarray, xi: np.ndarray, neg: np.ndarray,
                Win: np.ndarray, Wout: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray, float]:
    """Full-batch SGNS gradients for pair rows (ci → xi) with negative
    rows ``neg``; returns (dWin, dWout, loss) dense matrices (callers
    sparsify). Loss = -Σ log σ(u·v⁺) − ΣΣ log σ(−u·v⁻)."""
    U = Win[ci]                                   # (n, d)
    Vp = Wout[xi]                                 # (n, d)
    Vn = Wout[neg]                                # (n, k, d)
    sp = 1.0 / (1.0 + np.exp(-(U * Vp).sum(1)))   # σ(u·v⁺)
    sn = 1.0 / (1.0 + np.exp(-np.einsum("nd,nkd->nk", U, Vn)))
    loss = float(-(np.log(np.maximum(sp, 1e-12)).sum()
                   + np.log(np.maximum(1.0 - sn, 1e-12)).sum()))
    gp = sp - 1.0                                 # (n,)
    dU = gp[:, None] * Vp + np.einsum("nk,nkd->nd", sn, Vn)
    dWin = np.zeros_like(Win)
    np.add.at(dWin, ci, dU)
    dWout = np.zeros_like(Wout)
    np.add.at(dWout, xi, gp[:, None] * U)
    np.add.at(dWout, neg.ravel(),
              (sn[:, :, None] * U[:, None, :]).reshape(-1, U.shape[1]))
    return dWin, dWout, loss


def train_skipgram(
    walks: ray.data.Dataset,
    dim: int = 32,
    window: int = 2,
    epochs: int = 5,
    lr: float = 0.5,
    negatives: int = 5,
    seed: int = 42,
    path_col: str = "path",
) -> tuple[pd.DataFrame, list[float]]:
    """Train vertex embeddings on a walk corpus (the output of
    :func:`pipelines.walks.random_walks`, or any Dataset with a
    ","-joined int token column). Returns ``(embeddings, losses)`` —
    a (vid, embedding) DataFrame sorted by vid and the per-epoch loss
    trace (which must decrease; pinned in tests)."""
    walks = walks.materialize()

    # ---- vocabulary + unigram counts (one streaming pass, V rows to
    # the driver — the same O(V) contract as the vertex map)
    def counts(b: pd.DataFrame) -> pd.DataFrame:
        toks = np.concatenate([
            np.fromiter((int(x) for x in p.split(",")), np.int64)
            for p in b[path_col]]) if len(b) else np.array([], np.int64)
        v, c = np.unique(toks, return_counts=True)
        return pd.DataFrame({"vid": v, "cnt": c})

    vc = (walks.map_batches(counts, batch_format="pandas")
          .to_pandas().groupby("vid", sort=True)["cnt"].sum())
    vids = vc.index.to_numpy(np.int64)
    freq = vc.to_numpy(np.float64)
    V = len(vids)
    if V == 0:
        return pd.DataFrame({"vid": [], "embedding": []}), []
    if V * dim > MODEL_BROADCAST_LIMIT_ELEMS:
        raise ValueError(
            f"SGNS model is {V}×{dim} = {V * dim:.3g} elements per "
            f"matrix, past MODEL_BROADCAST_LIMIT_ELEMS "
            f"({MODEL_BROADCAST_LIMIT_ELEMS:.3g}); the broadcast-model "
            "design tops out here — shard the model across "
            "parameter-server actors (or reduce dim / prune the "
            "vocabulary) beyond this scale")
    p75 = freq ** 0.75
    cdf = np.cumsum(p75 / p75.sum())
    cdf[-1] = 1.0
    # vocab lookup = searchsorted on the broadcast SORTED vid array
    # (np.unique order) — O(V·8B) once, no V-entry Python dict
    vids_ref = ray.put(vids)
    cdf_ref = ray.put(cdf)

    Win = _init_matrix(vids, dim)
    Wout = np.zeros((V, dim), np.float64)
    losses: list[float] = []

    for _ in range(max(0, epochs)):
        wref = ray.put((Win, Wout))

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            Wi, Wo = _resolve(wref)
            vkeys = _resolve(vids_ref)
            c_raw, x_raw = _pairs_from_paths(list(b[path_col]), window)
            if not len(c_raw):
                return pd.DataFrame({
                    "bkey": pd.Series([], dtype=np.int64),
                    "kind": pd.Series([], dtype=np.int8),
                    "row": pd.Series([], dtype=np.int64),
                    "grad": pd.Series([], dtype=object),
                    "loss": pd.Series([], dtype=np.float64)})
            # every token is in the vocab by construction (vocab was
            # built from this same corpus), so direct searchsorted is
            # exact and fully vectorized
            ci = np.searchsorted(vkeys, c_raw)
            xi = np.searchsorted(vkeys, x_raw)
            neg = _negatives(ci, xi, negatives, _resolve(cdf_ref), seed)
            dWin, dWout, loss = _sgns_grads(ci, xi, neg, Wi, Wo)
            rows_in = np.unique(ci)
            rows_out = np.unique(np.concatenate([xi, neg.ravel()]))
            bkey = np.int64(min(c_raw.min(), x_raw.min()))
            return pd.DataFrame({
                "bkey": np.full(len(rows_in) + len(rows_out) + 1, bkey),
                "kind": np.concatenate([
                    np.zeros(len(rows_in), np.int8),
                    np.ones(len(rows_out), np.int8),
                    np.full(1, 2, np.int8)]),
                "row": np.concatenate([rows_in, rows_out,
                                       np.array([len(ci)], np.int64)]),
                "grad": ([g for g in dWin[rows_in]]
                         + [g for g in dWout[rows_out]]
                         + [np.zeros(Wi.shape[1], np.float64)]),
                "loss": np.concatenate([
                    np.zeros(len(rows_in) + len(rows_out)),
                    np.array([loss])]),
            })

        parts = (walks.map_batches(partial, batch_format="pandas")
                 .to_pandas()
                 .sort_values(["bkey", "kind", "row"], kind="mergesort"))
        gin = np.zeros_like(Win)
        gout = np.zeros_like(Wout)
        pin = parts[parts["kind"] == 0]
        if len(pin):
            np.add.at(gin, pin["row"].to_numpy(np.int64),
                      np.stack(pin["grad"].to_numpy()))
        pout = parts[parts["kind"] == 1]
        if len(pout):
            np.add.at(gout, pout["row"].to_numpy(np.int64),
                      np.stack(pout["grad"].to_numpy()))
        tail = parts[parts["kind"] == 2]
        npairs = max(1, int(tail["row"].sum()))
        # mean gradient (per pair), like train_logreg — full-batch GD
        # over the raw sum diverges as the corpus grows
        losses.append(float(tail["loss"].sum()) / npairs)
        Win = Win - lr * (gin / npairs)
        Wout = Wout - lr * (gout / npairs)

    return (pd.DataFrame({"vid": vids, "embedding": list(Win)}),
            losses)


def skipgram_reference(paths: list[str], dim=32, window=2, epochs=5,
                       lr=0.5, negatives=5, seed=42
                       ) -> tuple[pd.DataFrame, list[float]]:
    """Sequential oracle: the same kernels over the whole corpus as one
    block. Equal to the distributed result up to float summation order
    (exactly equal when the corpus is one block)."""
    toks = np.concatenate([
        np.fromiter((int(x) for x in p.split(",")), np.int64)
        for p in paths])
    vids, freq = np.unique(toks, return_counts=True)
    p75 = freq.astype(np.float64) ** 0.75
    cdf = np.cumsum(p75 / p75.sum())
    cdf[-1] = 1.0
    Win = _init_matrix(vids, dim)
    Wout = np.zeros((len(vids), dim), np.float64)
    c_raw, x_raw = _pairs_from_paths(paths, window)
    ci = np.searchsorted(vids, c_raw)
    xi = np.searchsorted(vids, x_raw)
    neg = _negatives(ci, xi, negatives, cdf, seed)
    losses = []
    n = max(1, len(ci))
    for _ in range(max(0, epochs)):
        dWin, dWout, loss = _sgns_grads(ci, xi, neg, Win, Wout)
        losses.append(loss / n)
        Win = Win - lr * (dWin / n)
        Wout = Wout - lr * (dWout / n)
    return pd.DataFrame({"vid": vids, "embedding": list(Win)}), losses
