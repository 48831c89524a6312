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
#: = 4 GB per matrix; past this :func:`train_skipgram` automatically
#: switches to the range-sharded parameter-holder engine
#: (:func:`train_skipgram_sharded`) — no whole-model ``ray.put``,
#: bit-exact same result (pinned in tests/test_skipgram.py).
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
        # past the broadcast cap: range-sharded parameter holders —
        # same kernels, same deterministic reduce, bit-exact result
        shards = int(-(-(V * dim) // MODEL_BROADCAST_LIMIT_ELEMS)) + 1
        return train_skipgram_sharded(
            walks, dim=dim, window=window, epochs=epochs, lr=lr,
            negatives=negatives, seed=seed, path_col=path_col,
            num_shards=shards, _vocab=(vids, freq))
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


@ray.remote
class _SgnsParamShard:
    """One row-range shard of the (Win, Wout) model — the
    parameter-holder pattern from pipelines/gnn_train.py applied to
    SGNS. Holds rows [lo, hi) of both matrices, accepts sparse grad
    partials from corpus blocks, reduces them in the SAME
    (bkey, kind, row) sort order the broadcast path uses, and applies
    the full-batch update locally — so the sharded run is bit-exact
    equal to the broadcast run at any block partitioning."""

    def __init__(self, vids_slice: np.ndarray, dim: int):
        self.vids = np.asarray(vids_slice, np.int64)
        self.Win = _init_matrix(self.vids, dim)
        self.Wout = np.zeros((len(self.vids), dim), np.float64)
        self._pending: list = []

    def get_rows(self, kind: int, local_rows: np.ndarray) -> np.ndarray:
        W = self.Win if kind == 0 else self.Wout
        return W[np.asarray(local_rows, np.int64)]

    def ingest(self, table) -> int:
        self._pending.append(table)
        return table.num_rows

    def apply(self, lr: float, npairs: int) -> int:
        import pyarrow as _pa

        if self._pending:
            t = _pa.concat_tables(self._pending)
            self._pending = []
            df = t.to_pandas()
            df = df.sort_values(["bkey", "kind", "row"],
                                kind="mergesort")
            gin = np.zeros_like(self.Win)
            gout = np.zeros_like(self.Wout)
            for kind, g in ((0, gin), (1, gout)):
                part = df[df["kind"] == kind]
                if len(part):
                    np.add.at(g, part["row"].to_numpy(np.int64),
                              np.stack(part["grad"].to_numpy()))
        else:
            gin = np.zeros_like(self.Win)
            gout = np.zeros_like(self.Wout)
        self.Win = self.Win - lr * (gin / npairs)
        self.Wout = self.Wout - lr * (gout / npairs)
        return len(self.vids)

    def embeddings(self) -> pd.DataFrame:
        return pd.DataFrame({"vid": self.vids,
                             "embedding": list(self.Win)})


def train_skipgram_sharded(
    walks: ray.data.Dataset,
    dim: int = 32,
    window: int = 2,
    epochs: int = 5,
    lr: float = 0.5,
    negatives: int = 5,
    seed: int = 42,
    path_col: str = "path",
    num_shards: int = 2,
    _vocab: "tuple | None" = None,
) -> tuple[pd.DataFrame, list[float]]:
    """SGNS with the model RANGE-SHARDED over ``num_shards``
    parameter-holder actors — the past-the-cap engine
    :func:`train_skipgram` dispatches to. Per epoch, each corpus block
    pulls ONLY the model rows its pairs touch (O(touched·d) bytes, not
    V·d), computes the same fused gradients, and its sparse partials
    route to the owning holders, which reduce in the broadcast path's
    exact sort order. No whole-model ``ray.put`` anywhere; driver
    state is the O(V) vocab array only. Bit-exact equal to
    :func:`train_skipgram` (pinned at P∈{1,3} in tests).

    Determinism contract (same caveat class as the broadcast engine's
    bkey ordering): reductions are keyed by (bkey, kind, row), so runs
    are bit-identical provided no THREE blocks share both min-vid and
    pair count (two same-key blocks commute exactly; float addition is
    commutative, only ≥3-way associativity is order-sensitive)."""
    import pyarrow as _pa

    walks = walks.materialize()
    if _vocab is None:
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
    else:
        vids, freq = _vocab
    V = len(vids)
    if V == 0:
        return pd.DataFrame({"vid": [], "embedding": []}), []
    p75 = freq ** 0.75
    cdf = np.cumsum(p75 / p75.sum())
    cdf[-1] = 1.0
    vids_ref = ray.put(vids)
    cdf_ref = ray.put(cdf)

    S = max(1, min(int(num_shards), V))
    bounds = np.linspace(0, V, S + 1).astype(np.int64)
    holders = [_SgnsParamShard.remote(vids[bounds[s]:bounds[s + 1]], dim)
               for s in range(S)]
    bref = ray.put(bounds)

    def pull(kind: int, rows: np.ndarray) -> np.ndarray:
        """Gather model rows (global indices, SORTED) from their
        owners; concat in holder order preserves the sort."""
        b = _resolve(bref)
        cuts = np.searchsorted(rows, b[1:-1])
        pieces = np.split(rows, cuts)
        futs = [holders[s].get_rows.remote(kind, pieces[s] - b[s])
                for s in range(S) if len(pieces[s])]
        if not futs:
            return np.empty((0, dim), np.float64)
        return np.concatenate(ray.get(futs), axis=0)

    losses: list[float] = []
    for _ in range(max(0, epochs)):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            vkeys = _resolve(vids_ref)
            c_raw, x_raw = _pairs_from_paths(list(b[path_col]), window)
            if not len(c_raw):
                return pd.DataFrame({
                    "bkey": pd.Series([], dtype=np.int64),
                    "kind": pd.Series([], dtype=np.int8),
                    "row": pd.Series([], dtype=np.int64),
                    "grad": pd.Series([], dtype=object),
                    "loss": pd.Series([], dtype=np.float64)})
            ci = np.searchsorted(vkeys, c_raw)
            xi = np.searchsorted(vkeys, x_raw)
            neg = _negatives(ci, xi, negatives, _resolve(cdf_ref), seed)
            rows_in = np.unique(ci)
            rows_out = np.unique(np.concatenate([xi, neg.ravel()]))
            # pull ONLY the touched rows, then run the same gradient
            # kernel in the compact index space
            Wi_c = pull(0, rows_in)
            Wo_c = pull(1, rows_out)
            cci = np.searchsorted(rows_in, ci)
            cxi = np.searchsorted(rows_out, xi)
            cneg = np.searchsorted(rows_out, neg.ravel()
                                   ).reshape(neg.shape)
            dWin_c, dWout_c, loss = _sgns_grads(cci, cxi, cneg,
                                                Wi_c, Wo_c)
            bkey = np.int64(min(c_raw.min(), x_raw.min()))
            return pd.DataFrame({
                "bkey": np.full(len(rows_in) + len(rows_out) + 1, bkey),
                "kind": np.concatenate([
                    np.zeros(len(rows_in), np.int8),
                    np.ones(len(rows_out), np.int8),
                    np.full(1, 2, np.int8)]),
                "row": np.concatenate([rows_in, rows_out,
                                       np.array([len(ci)], np.int64)]),
                "grad": (list(dWin_c) + list(dWout_c)
                         + [np.zeros(dim, np.float64)]),
                "loss": np.concatenate([
                    np.zeros(len(rows_in) + len(rows_out)),
                    np.array([loss])]),
            })

        parts = walks.map_batches(
            partial, batch_format="pandas").materialize()

        # loss / pair-count scalars (tiny, driver-side, bkey-sorted —
        # the broadcast path's float summation order)
        def tails(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["kind"] == 2][["bkey", "row", "loss"]]

        tail = (parts.map_batches(tails, batch_format="pandas")
                .to_pandas()
                # (bkey, row) mirrors the broadcast path's
                # (bkey, kind, row) sort restricted to kind-2 rows, so
                # the loss float-sums in the identical order
                .sort_values(["bkey", "row"], kind="mergesort"))
        npairs = max(1, int(tail["row"].sum()))
        losses.append(float(tail["loss"].sum()) / npairs)

        # route grad rows to their owning holder (one RPC per holder
        # per group, the build path's grouped-delivery shape)
        def add_fid(b: pd.DataFrame) -> pd.DataFrame:
            bnds = _resolve(bref)
            b = b[b["kind"] != 2].copy()
            b["_fid"] = (np.searchsorted(
                bnds, b["row"].to_numpy(np.int64), side="right") - 1
            ).astype(np.int32)
            b["row"] = b["row"].to_numpy(np.int64) - bnds[
                b["_fid"].to_numpy()]
            return b

        def deliver(g: pd.DataFrame) -> pd.DataFrame:
            f = int(g["_fid"].iloc[0])
            t = _pa.Table.from_pandas(g.drop(columns=["_fid"]),
                                      preserve_index=False)
            n = ray.get(holders[f].ingest.remote(t))
            return pd.DataFrame({"n": [n]})

        (parts.map_batches(add_fid, batch_format="pandas")
         .groupby("_fid").map_groups(deliver, batch_format="pandas")
         .materialize())
        ray.get([h.apply.remote(lr, npairs) for h in holders])

    emb = pd.concat(ray.get([h.embeddings.remote() for h in holders]),
                    ignore_index=True)
    return emb, losses


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
