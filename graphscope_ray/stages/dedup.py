"""Deduplication family over document Datasets (training-data ops).

Five tiers, each a composition of vectorized ``map_batches`` + one
keyed shuffle (the reference's loader dedups vertices the same
hash-partition-then-first way, ``global_vertex_map.h:45-52``):

- exact       : sha256(text) → groupby(hash).first (deterministic keeper)
- minhash LSH : shingle → k minhashes → b bands → groupby(band, sig)
                → candidate pairs → exact-Jaccard verify
- simhash     : 64-bit simhash; candidates = equal simhash (or banded
                4×16-bit chunks for hamming≤3 style recall)
- ngram-jaccard: direct pairwise verify of candidate pairs
- embedding   : cosine near-dup over a vector column (LSH-bucketed by
                random hyperplanes, then in-bucket exact cosine)

Scale notes: the keyed shuffles are all on compact hash/band columns
(never raw text); candidate verification rereads only candidate texts;
caps are logged, never silent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.hashing import hash64_ints, hash64_strings, sha256_hex
from graphscope_ray.functions.text import TOKEN_RE
from graphscope_ray.stages.relational import dedup_first

# ---------------------------------------------------------------- exact


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep exactly one row per distinct text (min id wins — the
    deterministic-keeper contract)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = sha256_hex(batch.column(text_col).to_pylist())
        return batch.append_column("_sha", pa.array(h, pa.string()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return dedup_first(hashed, ["_sha"], order_by=[id_col]).drop_columns(["_sha"])


# ------------------------------------------------------------- shingles


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(hash64_strings(np.asarray(grams, dtype=object)))


def _minhash_sig(sh: np.ndarray, num_perm: int, seeds: np.ndarray) -> np.ndarray:
    # one-permutation-per-seed minhash: min over splitmix64(shingle ^ seed)
    with np.errstate(over="ignore"):
        m = hash64_ints((sh[None, :] ^ seeds[:, None]).view(np.int64).reshape(-1))
    return m.reshape(num_perm, -1).min(axis=1)


class MinHasher:
    """Actor-pool stage: seeds prepared once per actor (__init__), per
    batch emits (id, band, band_sig) rows — b rows per doc."""

    def __init__(self, text_col: str, id_col: str, k: int, num_perm: int, bands: int):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.k, self.num_perm, self.bands = k, num_perm, bands
        self.rows = num_perm // bands
        self.seeds = hash64_ints(np.arange(num_perm, dtype=np.int64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, sigs = [], [], []
        for i, t in zip(batch[self.id_col], batch[self.text_col]):
            sig = _minhash_sig(_shingle_hashes(t, self.k), self.num_perm, self.seeds)
            band_sig = hash64_ints(
                sig.reshape(self.bands, self.rows).sum(axis=1).view(np.int64)
            ).view(np.int64)
            ids.extend([i] * self.bands)
            bands.extend(range(self.bands))
            sigs.extend(band_sig.tolist())
        return pd.DataFrame({"doc_id": ids, "band": bands, "sig": sigs})


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs (a, b) with a < b via MinHash+LSH.

    Buckets larger than ``max_bucket`` (degenerate shingles — boilerplate)
    are truncated deterministically and logged, not silently dropped."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, id_col, shingle_k, num_perm, bands),
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "LSH bucket band=%s truncated: %d docs > cap %d",
                g["band"].iloc[0], len(ids), max_bucket,
            )
            ids = ids[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=ids.dtype),
                                 "b": pd.Series([], dtype=ids.dtype)})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j]})

    cand = sigs.groupby(["band", "sig"]).map_groups(pairs, batch_format="pandas")
    # a pair can surface from several bands -> dedup
    return dedup_first(cand, ["a", "b"])


def verify_jaccard(
    pairs_df: pd.DataFrame,
    docs_df: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> pd.DataFrame:
    """Exact n-gram Jaccard over candidate pairs (driver-side verify for
    candidate sets that fit; the contract mirrors LSH-then-verify)."""
    texts = dict(zip(docs_df[id_col], docs_df[text_col]))
    sh = {i: _shingle_hashes(t, shingle_k) for i, t in texts.items()}
    out = []
    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        sa, sb = sh[a], sh[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["a", "b", "jaccard"])


# -------------------------------------------------------------- simhash


class SimHasher:
    """64-bit simhash per doc (token-hash bit voting), actor-pool stage."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.uint64)
        for n, t in enumerate(batch[self.text_col]):
            toks = TOKEN_RE.findall(t.lower())
            if not toks:
                out[n] = 0
                continue
            hs = hash64_strings(np.asarray(toks, dtype=object))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes = bits.sum(axis=0) * 2 > len(hs)
            out[n] = np.bitwise_or.reduce(
                votes.astype(np.uint64) << np.arange(64, dtype=np.uint64)
            )
        return pd.DataFrame(
            {self.id_col: batch[self.id_col], "simhash": out.view(np.int64)}
        )


def simhash_table(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
    concurrency: int = 4,
) -> ray.data.Dataset:
    return ds.map_batches(
        SimHasher, fn_constructor_args=(text_col, id_col),
        batch_format="pandas", batch_size=2048, concurrency=concurrency,
    )


# -------------------------------------------- embedding cosine near-dup


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    threshold: float = 0.95,
    max_bucket: int = 500,
) -> ray.data.Dataset:
    """Near-duplicate vector pairs by random-hyperplane LSH buckets +
    in-bucket exact cosine. Deterministic planes (seeded)."""
    rng = np.random.default_rng(42)
    planes = None  # lazily sized to the vector dim inside the first batch

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        nonlocal planes
        V = np.stack(batch[vec_col].to_numpy())
        if planes is None:
            planes = np.random.default_rng(42).standard_normal((V.shape[1], num_planes))
        bits = (V @ planes) > 0
        code = (bits @ (1 << np.arange(num_planes))).astype(np.int64)
        return pd.DataFrame({id_col: batch[id_col], "bucket": code,
                             "_vec": list(V)})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "neardup bucket %s truncated: %d > %d",
                g["bucket"].iloc[0], len(g), max_bucket)
            g = g.sort_values(id_col).head(max_bucket)
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        V = np.stack(g["_vec"].to_numpy())
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = V @ V.T
        i, j = np.triu_indices(len(g), k=1)
        keep = S[i, j] >= threshold
        ids = g[id_col].to_numpy()
        return pd.DataFrame({"a": ids[i[keep]], "b": ids[j[keep]],
                             "cosine": S[i, j][keep]})

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
