"""Distributed quality classification: logistic regression trained and
scored over Dataset feature columns.

Plays the role of the fastText/logreg quality filters in public
training-data pipelines (score docs against a small labeled seed set;
keep the high-probability tail). The reference stops at graph
analytics; this extends the same engine surface the way
``stages/textprep.py``'s bigram LM does — a model small enough to
broadcast, trained by streaming passes that never land the corpus on
the driver.

Training is deterministic full-batch gradient descent: each iteration
broadcasts the weight vector (``ray.put``), one ``map_batches`` pass
emits a per-block partial gradient (a single (d+2)-float row), and the
driver reduces the partials in sorted block-key order — the same
bkey-sorted reduce as ``similarity.kmeans``, so two runs produce
bit-identical weights and the result is independent of block arrival
order. Feature standardization (one prior partial-moments pass) is
folded into the returned weights so scoring needs no extra state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _features(b: pd.DataFrame, cols: list[str]) -> np.ndarray:
    return np.column_stack(
        [b[c].to_numpy(np.float64) for c in cols])


def _moments(ds: ray.data.Dataset, cols: list[str], id_col: str):
    """Per-column mean/std via one pass of per-block partial sums."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = _features(b, cols)
        return pd.DataFrame({
            "bkey": [np.int64(b[id_col].to_numpy(np.int64).min())],
            "n": [np.int64(len(b))],
            "s": [X.sum(axis=0)],
            "s2": [(X * X).sum(axis=0)],
        })

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas().sort_values("bkey", kind="mergesort"))
    n = float(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0)
    mean = s / n
    var = np.maximum(s2 / n - mean * mean, 0.0)
    std = np.where(var > 0, np.sqrt(var), 1.0)
    return mean, std, n


def train_logreg(
    ds: ray.data.Dataset,
    feature_cols: list[str],
    label_col: str,
    id_col: str = "doc_id",
    iters: int = 100,
    lr: float = 1.0,
    l2: float = 0.0,
) -> dict:
    """Train binary logistic regression (labels 0/1) by full-batch
    gradient descent over standardized features. Returns a plain-dict
    model ``{"cols", "w", "b"}`` with the standardization folded into
    ``w``/``b`` (score = sigmoid(X·w + b) on RAW features), suitable
    for ``ray.put`` broadcast into :func:`score_logreg`.

    One streaming pass per iteration; per-block partial = one
    (d+1)-float gradient row, reduced bkey-sorted (deterministic).
    ``l2`` regularizes the standardized weights (not the bias)."""
    # iterative consumer: pin input blocks in the (spillable) object
    # store once rather than re-running the read plan per GD pass
    ds = ds.materialize()
    cols = list(feature_cols)
    mean, std, n = _moments(ds, cols, id_col)
    mref = ray.put((mean, std))
    d = len(cols)
    w = np.zeros(d, np.float64)
    b0 = 0.0

    for _ in range(max(0, iters)):
        wref = ray.put((w, b0))

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            mw, sw = _resolve(mref)
            ww, bb = _resolve(wref)
            X = (_features(batch, cols) - mw) / sw
            y = batch[label_col].to_numpy(np.float64)
            z = X @ ww + bb
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            return pd.DataFrame({
                "bkey": [np.int64(batch[id_col].to_numpy(np.int64).min())],
                "gw": [X.T @ r],
                "gb": [np.float64(r.sum())],
            })

        parts = (ds.map_batches(partial, batch_format="pandas")
                 .to_pandas().sort_values("bkey", kind="mergesort"))
        gw = np.sum(np.stack(parts["gw"].to_numpy()), axis=0) / n + l2 * w
        gb = float(parts["gb"].sum()) / n
        w = w - lr * gw
        b0 = b0 - lr * gb

    # fold standardization: sigmoid(((x-m)/s)·w + b) = sigmoid(x·(w/s) + b - Σ m·w/s)
    w_raw = w / std
    b_raw = b0 - float(mean @ w_raw)
    return {"cols": cols, "w": w_raw, "b": b_raw}


def score_logreg(
    ds: ray.data.Dataset,
    model: "dict | ray.ObjectRef",
    out_col: str = "quality_prob",
) -> ray.data.Dataset:
    """Append ``out_col`` = sigmoid(X·w + b) per row — one zero-state
    vectorized batch pass; the model ships once per actor."""
    ref = model if isinstance(model, ray.ObjectRef) else ray.put(model)

    class Scorer:
        def __init__(self):
            m = ray.get(ref)
            self.cols, self.w, self.b = m["cols"], m["w"], m["b"]

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            z = _features(b, self.cols) @ self.w + self.b
            b = b.copy()
            b[out_col] = 1.0 / (1.0 + np.exp(-z))
            return b

    return ds.map_batches(Scorer, batch_format="pandas",
                          concurrency=(1, 8))
