"""Data selection via importance resampling (DSIR — Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
public algorithm): score every raw document by how target-like its
hashed n-gram distribution is, then resample toward the target.

Scale shape — three streaming passes, nothing corpus-sized ever lands
on the driver:
1. fit: each block emits ONE ``n_buckets`` int64 count vector of its
   hashed (uni+bi)gram features (``np.bincount``); integer sums are
   order-independent, so the fitted distribution is partition- and
   arrival-order-invariant. Driver holds 2 × n_buckets floats.
2. weights: per batch, one bincount + one dot against the broadcast
   log-ratio vector → ``dsir_logw`` per row.
3. select: Gumbel-top-k over ``logw + g(doc)`` with the Gumbel noise
   derived from a seeded splitmix hash of the key (deterministic,
   partition-invariant — the standard trick making weighted sampling
   WITHOUT replacement a distributed top-k); per-block partial top-k,
   ≤ k·blocks rows shuffle (same shape as sampling.hash_order_sample).

Feature kernel: the dedup family's token/shingle hashes
(``_flat_token_hashes`` / ``_batch_shingles``) bucketed mod
``n_buckets`` — a training doc and a target doc sharing text hit the
same buckets by construction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _bucket_counts(texts: pd.Series, n_buckets: int) -> np.ndarray:
    """Summed hashed uni+bigram bucket counts for a batch (one vector)."""
    from graphscope_ray.stages.dedup import _batch_shingles, _flat_token_hashes

    uni, _ = _flat_token_hashes(texts)
    bi, _ = _batch_shingles(texts, 2)
    h = np.concatenate([uni, bi]) % np.uint64(n_buckets)
    return np.bincount(h.astype(np.int64), minlength=n_buckets)


def _doc_bucket_matrix(texts: pd.Series, n_buckets: int):
    """(flat bucket ids, per-doc start offsets) — per-row features
    without materializing a dense doc × buckets matrix."""
    from graphscope_ray.stages.dedup import _batch_shingles, _flat_token_hashes

    uni, us = _flat_token_hashes(texts)
    bi, bs = _batch_shingles(texts, 2)
    return (uni % np.uint64(n_buckets), us), (bi % np.uint64(n_buckets), bs)


def _doc_bucket_matrix_md5(texts: pd.Series, n_buckets: int):
    """md5-interchange feature kernel: uni = md5_lower64(token) mod B,
    bi = md5_lower64('t1 t2') mod B over full doc-local 2-windows —
    every bucket id reproducible in DuckDB (``md5_number_lower`` on
    the same lower-\\w+ token stream), which gives DSIR an exact SQL
    twin. Same return shape as :func:`_doc_bucket_matrix`."""
    from graphscope_ray.functions.text import TOKEN_RE, _md5_lower64

    toks = texts.str.lower().str.findall(TOKEN_RE)
    lengths = toks.str.len().to_numpy(np.int64)
    flat = pd.Series(toks.explode().dropna().to_numpy(object))
    n = len(flat)
    B = np.uint64(n_buckets)
    us = np.concatenate(([0], np.cumsum(lengths)))
    if n:
        uh = _md5_lower64(flat.to_numpy(object))
        ends = np.repeat(np.cumsum(lengths), lengths)
        parts = flat.str.cat(flat.shift(-1), sep=" ")
        full = np.arange(n, dtype=np.int64) + 2 <= ends
        bh = _md5_lower64(parts.to_numpy(object)[full])
    else:
        uh = np.empty(0, np.uint64)
        bh = np.empty(0, np.uint64)
    blens = np.maximum(lengths - 1, 0)
    bs = np.concatenate(([0], np.cumsum(blens)))
    return (uh % B, us), (bh % B, bs)


def _bucket_counts_md5(texts: pd.Series, n_buckets: int) -> np.ndarray:
    (ub, _), (bb, _) = _doc_bucket_matrix_md5(texts, n_buckets)
    h = np.concatenate([ub, bb]).astype(np.int64)
    return np.bincount(h, minlength=n_buckets)


def fit_hashed_ngram_dist(
    ds: ray.data.Dataset,
    text_col: str = "text",
    n_buckets: int = 65536,
    hash_fn: str = "sip",
) -> np.ndarray:
    """Smoothed bucket probability vector of a corpus (add-one).
    ``hash_fn="md5"`` uses the DuckDB-reproducible feature kernel."""
    counts = (_bucket_counts_md5 if hash_fn == "md5"
              else _bucket_counts)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c": [counts(b[text_col], n_buckets)]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    tot = np.zeros(n_buckets, np.int64)
    for c in parts.get("c", []):
        tot += c
    p = (tot + 1.0) / float(tot.sum() + n_buckets)
    return p


def dsir_log_weights(
    ds: ray.data.Dataset,
    p_target: "np.ndarray | ray.ObjectRef",
    p_raw: "np.ndarray | ray.ObjectRef",
    text_col: str = "text",
    out_col: str = "dsir_logw",
    hash_fn: str = "sip",
) -> ray.data.Dataset:
    """Append ``out_col`` = Σ_features (log p_target − log p_raw) over
    the doc's hashed n-gram features — the DSIR importance log-weight.
    The log-ratio vector broadcasts once per actor. ``hash_fn`` must
    match the one the distributions were fitted with."""
    tref = p_target if isinstance(p_target, ray.ObjectRef) \
        else ray.put(np.asarray(p_target, np.float64))
    rref = p_raw if isinstance(p_raw, ray.ObjectRef) \
        else ray.put(np.asarray(p_raw, np.float64))
    feats = (_doc_bucket_matrix_md5 if hash_fn == "md5"
             else _doc_bucket_matrix)

    class Scorer:
        def __init__(self):
            self.ratio = np.log(ray.get(tref)) - np.log(ray.get(rref))
            self.n_buckets = len(self.ratio)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            (ub, us), (bb, bs) = feats(b[text_col], self.n_buckets)
            lw = np.zeros(len(b), np.float64)
            for ids, starts in ((ub, us), (bb, bs)):
                vals = self.ratio[ids.astype(np.int64)]
                csum = np.concatenate(([0.0], np.cumsum(vals)))
                lw += csum[starts[1:]] - csum[starts[:-1]]
            b = b.copy()
            b[out_col] = lw
            return b

    return ds.map_batches(Scorer, batch_format="pandas",
                          concurrency=(1, 8))


def dsir_select(
    ds: ray.data.Dataset,
    k: int,
    logw_col: str = "dsir_logw",
    key_col: str = "doc_id",
    seed: int = 42,
) -> ray.data.Dataset:
    """Gumbel-top-k: keep the k rows maximizing ``logw + Gumbel(key)``
    — equivalent to sampling k docs without replacement with
    probability ∝ exp(logw) (Gumbel-max trick), but deterministic
    because the noise comes from splitmix64(key, seed). Distributed as
    per-block partial top-k then one ≤ k·blocks final sort."""
    from graphscope_ray.functions.hashing import splitmix64, stable_u64_of_str

    salt = np.uint64(stable_u64_of_str(f"dsir:{seed}"))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        h = splitmix64(b[key_col].to_numpy(np.int64).astype(np.uint64)
                       ^ salt)
        u = (h.astype(np.float64) + 1.0) / (2.0 ** 64 + 2.0)
        g = -np.log(-np.log(u))
        b = b.copy()
        b["_gumbel_key"] = b[logw_col].to_numpy(np.float64) + g
        return b.nlargest(min(k, len(b)), "_gumbel_key")

    pre = ds.map_batches(score, batch_format="pandas")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return b.nlargest(min(k, len(b)), "_gumbel_key") \
                .drop(columns=["_gumbel_key"])

    return pre.repartition(1).map_batches(finish, batch_format="pandas")
