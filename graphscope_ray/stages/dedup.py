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

from graphscope_ray.context import pool

from graphscope_ray.functions.hashing import (
    hash64_ints,
    hash64_strings,
    sha256_hex,
    splitmix64,
)
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


def _flat_token_hashes(texts: pd.Series):
    """Tokenize a whole batch and hash every token in ONE vectorized
    hash call. Returns (flat uint64 hashes, per-doc start offsets)."""
    toks = texts.str.lower().str.findall(TOKEN_RE)
    lengths = toks.str.len().to_numpy(np.int64)
    flat = toks.explode().dropna()
    h = (hash64_strings(flat.to_numpy(object)) if len(flat)
         else np.empty(0, np.uint64))
    starts = np.concatenate(([0], np.cumsum(lengths)))
    return h, starts


def _batch_shingles(texts: pd.Series, k: int):
    """Rolling k-token shingle hashes for a whole batch: combine k
    consecutive token hashes arithmetically (no string joins, no
    per-doc loop). Docs are separated by k-1 zero-padding slots so a
    rolling window never crosses a document boundary (doc-local and
    batch-composition-independent). Returns (flat shingle hashes,
    per-doc shingle start offsets)."""
    h, starts = _flat_token_hashes(texts)
    lengths = np.diff(starts)
    n_docs = len(lengths)
    pad = k - 1
    padded = np.zeros(len(h) + pad * n_docs + pad, dtype=np.uint64)
    pad_starts = starts[:-1] + pad * np.arange(n_docs)
    if len(h):
        scatter = np.concatenate(
            [np.arange(s, s + m) for s, m in zip(pad_starts, lengths)]
        ).astype(np.int64)
        padded[scatter] = h
    B = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        sh = padded.copy()
        for j in range(1, k):
            sh[: len(padded) - j] = sh[: len(padded) - j] * B ^ padded[j:]
    out_lens = np.where(lengths == 0, 0, np.maximum(lengths - k + 1, 1))
    out_starts = np.concatenate(([0], np.cumsum(out_lens)))
    idx = (
        np.concatenate(
            [np.arange(s, s + m) for s, m in zip(pad_starts, out_lens)]
        ).astype(np.int64)
        if out_lens.sum()
        else np.empty(0, np.int64)
    )
    return sh[idx], out_starts


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct shingle hashes of one doc (same kernel as the batch
    path, so verify-Jaccard sees the identical shingle space)."""
    sh, _ = _batch_shingles(pd.Series([text]), k)
    return np.unique(sh)


class MinHasher:
    """Actor-pool stage: seeds prepared once per actor (__init__); the
    whole batch is shingled and min-hashed with segment reduces — no
    per-document Python loop."""

    def __init__(self, text_col: str, id_col: str, k: int, num_perm: int, bands: int):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.k, self.num_perm, self.bands = k, num_perm, bands
        self.rows = num_perm // bands
        self.seeds = hash64_ints(np.arange(num_perm, dtype=np.int64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh, starts = _batch_shingles(batch[self.text_col], self.k)
        n_docs = len(batch)
        doc_lens = np.diff(starts)
        nonempty = doc_lens > 0
        seg_starts = starts[:-1][nonempty]
        sigs = np.full((self.num_perm, n_docs), np.uint64(0xFFFFFFFFFFFFFFFF))
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                hp = splitmix64(sh ^ self.seeds[p])
                if len(seg_starts):
                    sigs[p][nonempty] = np.minimum.reduceat(hp, seg_starts)
        # fold each band's rows into one signature
        band_sum = sigs.reshape(self.bands, self.rows, n_docs).sum(axis=1)
        band_sig = hash64_ints(band_sum.view(np.int64).reshape(-1)).view(
            np.int64).reshape(self.bands, n_docs)
        ids = np.tile(batch[self.id_col].to_numpy(), self.bands)
        bands = np.repeat(np.arange(self.bands, dtype=np.int64), n_docs)
        return pd.DataFrame({"doc_id": ids, "band": bands,
                             "sig": band_sig.reshape(-1)})


class MinHasherMD5:
    """Interchange twin of :class:`MinHasher`: k-token STRING shingles
    (space-joined, per-doc distinct) hashed with md5-lower-64 and
    permuted by linear transforms ``h·(2p+1) + p·0x9E3779B9 mod 2^64``
    — every step reproducible in DuckDB (``md5_number_lower`` +
    HUGEINT arithmetic), which gives ``doc_minhash_pairs`` an exact
    SQL oracle. The band signature is the plain mod-2^64 sum of the
    band's min-hashes (bucketing only needs equality, so no extra
    mixing). Empty docs emit no rows. Slower than the sip-hash kernel
    (one md5 per distinct shingle); the default path stays MinHasher."""

    def __init__(self, text_col: str, id_col: str, k: int, num_perm: int,
                 bands: int):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.k, self.num_perm, self.bands = k, num_perm, bands
        self.rows = num_perm // bands
        p = np.arange(num_perm, dtype=np.uint64)
        self.mul = np.uint64(2) * p + np.uint64(1)
        self.add = p * np.uint64(2654435769)  # 0x9E3779B9

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from graphscope_ray.functions.text import _md5_lower64

        toks = batch[self.text_col].str.lower().str.findall(TOKEN_RE)
        lengths = toks.str.len().to_numpy(np.int64)
        flat = pd.Series(toks.explode().dropna().to_numpy(object))
        n = len(flat)
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        ends = np.repeat(np.cumsum(lengths), lengths)
        if n:
            # full k-gram windows via shifted vectorized concat; rows
            # whose window would cross a doc boundary are masked off
            parts = flat
            for j in range(1, self.k):
                parts = parts.str.cat(flat.shift(-j), sep=" ")
            full = np.arange(n, dtype=np.int64) + self.k <= ends
            sh_doc, sh = doc_of[full], parts.to_numpy(object)[full]
        else:
            sh_doc, sh = np.empty(0, np.int64), np.empty(0, object)
        # docs with 1..k-1 tokens contribute one all-tokens shingle
        short = (lengths > 0) & (lengths < self.k)
        if short.any():
            sj = toks[short].str.join(" ")
            sh_doc = np.concatenate([sh_doc, np.flatnonzero(short)])
            sh = np.concatenate([sh, sj.to_numpy(object)])
        df = pd.DataFrame({"d": sh_doc, "s": sh}).drop_duplicates()
        df = df.sort_values("d", kind="mergesort")
        d = df["d"].to_numpy(np.int64)
        if not len(d):
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "band": np.empty(0, np.int64),
                                 "sig": np.empty(0, np.int64)})
        h = _md5_lower64(df["s"].to_numpy(object))
        seg = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        docs_present = d[seg]
        with np.errstate(over="ignore"):
            hp = h[None, :] * self.mul[:, None] + self.add[:, None]
        mins = np.minimum.reduceat(hp, seg, axis=1)
        band_sig = mins.reshape(self.bands, self.rows, -1).sum(
            axis=1, dtype=np.uint64).view(np.int64)
        ids = batch[self.id_col].to_numpy()[docs_present]
        return pd.DataFrame({
            "doc_id": np.tile(ids, self.bands),
            "band": np.repeat(np.arange(self.bands, dtype=np.int64),
                              len(ids)),
            "sig": band_sig.reshape(-1),
        })


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
    concurrency: int = 4,
    hash_fn: str = "sip",
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs (a, b) with a < b via MinHash+LSH.

    Buckets larger than ``max_bucket`` (degenerate shingles — boilerplate)
    are truncated deterministically and logged, not silently dropped.
    ``hash_fn="md5"`` swaps the sip-hash kernel for the DuckDB-
    reproducible :class:`MinHasherMD5` (the doc_minhash_pairs oracle)."""
    sigs = ds.map_batches(
        MinHasherMD5 if hash_fn == "md5" else MinHasher,
        fn_constructor_args=(text_col, id_col, shingle_k, num_perm, bands),
        batch_format="pandas",
        batch_size=1024,
        concurrency=pool(concurrency),
    )

    from graphscope_ray.stages.relational import bucketed_group_apply

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # whole (band, sig) LSH buckets per call: truncate degenerate
        # buckets (boilerplate shingles) deterministically + log, then
        # one vectorized self-merge emits the candidate pairs
        g = g.drop_duplicates(["band", "sig", "doc_id"]).sort_values(
            ["band", "sig", "doc_id"], kind="mergesort"
        )
        rank = g.groupby(["band", "sig"], sort=False).cumcount()
        over = rank >= max_bucket
        if over.any():
            import logging

            logging.getLogger(__name__).warning(
                "LSH cap %d: %d rows dropped across %d hot buckets",
                max_bucket, int(over.sum()),
                g.loc[over, ["band", "sig"]].drop_duplicates().shape[0],
            )
            g = g[~over]
        m = g.merge(g, on=["band", "sig"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame({"a": m["doc_id_x"].to_numpy(),
                             "b": m["doc_id_y"].to_numpy()})

    cand = bucketed_group_apply(sigs, ["band", "sig"], pairs, num_buckets=64)
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


def verify_jaccard_pairs(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed exact-Jaccard verification of an (a, b) candidate
    Dataset against the documents Dataset — the scale path of
    :func:`verify_jaccard` (which holds all candidate texts on the
    driver). Two bucketed co-groups:

    1. bucket by doc id: pair-sides meet their document, shingle hashes
       computed once per doc per bucket (vectorized `_batch_shingles`);
    2. bucket by pair: the two shingle arrays meet, exact Jaccard per
       pair (per-pair numpy set-intersection — inherently pairwise).

    No driver-side text dict; shuffle payloads are uint64 hash lists,
    never raw text (beyond stage 1's doc-keyed delivery)."""
    import pyarrow as pa
    import ray.data

    from graphscope_ray.stages.relational import bucketed_group_apply

    def tag_pairs(t: pa.Table) -> pa.Table:
        a = t.column("a").cast(pa.int64()).combine_chunks()
        b = t.column("b").cast(pa.int64()).combine_chunks()
        return pa.table({
            "doc": pa.concat_arrays([a, b]),
            "a": pa.concat_arrays([a, a]),
            "b": pa.concat_arrays([b, b]),
            "text": pa.nulls(2 * t.num_rows, pa.string()),
            "side": pa.array(np.zeros(2 * t.num_rows, np.int8)),
        })

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc": t.column(id_col).cast(pa.int64()),
            "a": pa.nulls(t.num_rows, pa.int64()),
            "b": pa.nulls(t.num_rows, pa.int64()),
            "text": t.column(text_col).cast(pa.string()),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
        })

    both = (pairs.map_batches(tag_pairs, batch_format="pyarrow")
            .union(docs.map_batches(tag_docs, batch_format="pyarrow")))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == 0][["doc", "a", "b"]]
        d = g[g["side"] == 1][["doc", "text"]]
        d = d[d["doc"].isin(p["doc"])]
        if not len(d) or not len(p):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "doc": pd.Series([], dtype=np.int64),
                                 "sh": pd.Series([], dtype=object)})
        flat, bounds = _batch_shingles(d["text"], shingle_k)
        # bounds has n_docs+1 cumulative offsets into flat
        sh = {int(doc): np.unique(flat[bounds[i]: bounds[i + 1]])
              for i, doc in enumerate(d["doc"])}
        m = p[p["doc"].isin(sh)]
        return pd.DataFrame({
            "a": m["a"].to_numpy(np.int64),
            "b": m["b"].to_numpy(np.int64),
            "doc": m["doc"].to_numpy(np.int64),
            "sh": [sh[int(x)] for x in m["doc"]],
        })

    sides = bucketed_group_apply(both, ["doc"], attach, num_buckets)

    def judge(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (a, b), grp in g.groupby(["a", "b"], sort=True):
            if len(grp) != 2:
                continue  # one side's doc was missing
            sa, sb = grp["sh"].iloc[0], grp["sh"].iloc[1]
            sa = np.asarray(sa, dtype=np.uint64)
            sb = np.asarray(sb, dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out.append((a, b, j))
        return pd.DataFrame(out, columns=["a", "b", "jaccard"]).astype(
            {"a": np.int64, "b": np.int64, "jaccard": np.float64})

    return bucketed_group_apply(sides, ["a", "b"], judge, num_buckets)


# -------------------------------------------------------------- simhash


class SimHasher:
    """64-bit simhash per doc (token-hash bit voting), actor-pool stage.

    ``hash_fn="sip"`` (default) hashes tokens with the engine-wide
    vectorized 64-bit hash; ``"md5"`` uses the md5-lower-8-bytes hash
    shared with ``fingerprint64`` — slower, but reproducible in DuckDB
    via ``md5_number_lower`` (the doc_simhash oracle twin)."""

    def __init__(self, text_col: str, id_col: str, hash_fn: str = "sip"):
        self.text_col, self.id_col, self.hash_fn = text_col, id_col, hash_fn

    def _hashes(self, texts: pd.Series):
        if self.hash_fn == "md5":
            from graphscope_ray.functions.text import (
                _flat_tokens,
                _md5_lower64,
            )

            flat, starts = _flat_tokens(texts)
            return _md5_lower64(flat), starts
        return _flat_token_hashes(texts)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        h, starts = self._hashes(batch[self.text_col])
        lengths = np.diff(starts)
        nonempty = lengths > 0
        out = np.zeros(len(batch), dtype=np.uint64)
        if len(h):
            # bit matrix of every token hash in the batch, vote per doc
            # via one segment-reduce per 64 bits folded into a matmul
            bits = (
                (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int64)
            votes = np.add.reduceat(bits, starts[:-1][nonempty], axis=0)
            maj = votes * 2 > lengths[nonempty][:, None]
            out[nonempty] = (
                maj.astype(np.uint64) << np.arange(64, dtype=np.uint64)
            ).sum(axis=1, dtype=np.uint64)
        return pd.DataFrame(
            {self.id_col: batch[self.id_col], "simhash": out.view(np.int64)}
        )


def simhash_table(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
    concurrency: int = 4, hash_fn: str = "sip",
) -> ray.data.Dataset:
    return ds.map_batches(
        SimHasher, fn_constructor_args=(text_col, id_col, hash_fn),
        batch_format="pandas", batch_size=2048, concurrency=pool(concurrency),
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
    from graphscope_ray.stages.relational import bucketed_group_apply

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

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # bucketed_group_apply hands a coarse hash-bucket holding many
        # whole LSH buckets — one vectorized call per coarse bucket
        # instead of one Python call per (tiny) LSH bucket
        out = [pairs(sub) for _, sub in g.groupby("bucket", sort=False)]
        return (pd.concat(out, ignore_index=True) if out
                else pd.DataFrame({"a": [], "b": [], "cosine": []}))

    return bucketed_group_apply(
        ds.map_batches(bucketize, batch_format="pandas"),
        ["bucket"], pairs_per_bucket, num_buckets=32,
    )


# ------------------------------------------- near-dup cluster resolution


def neardup_clusters(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    num_partitions: int = 4,
    num_buckets: int = 32,
    hash_fn: str = "sip",
) -> ray.data.Dataset:
    """End-to-end near-duplicate resolution — the canonical training-
    data dedup pipeline: MinHash+LSH candidates → distributed exact-
    Jaccard verify → weakly-connected components over the verified
    duplicate-pair graph (hash-min label exchange on the shard pool,
    the same kernel as :func:`~graphscope_ray.pipelines.algorithms.wcc`)
    → per-document ``(doc_id, cluster_id, keep)`` where ``cluster_id``
    is the minimum doc id in the near-dup component and ``keep`` is
    true for exactly that one document per cluster (the deterministic
    keeper, mirroring the loader's min-oid vertex dedup contract,
    ``global_vertex_map.h:45-52``).

    Scale shape: the pair graph holds only verified duplicates (a tiny
    fraction of the corpus); all corpus-scale steps are the already-
    bucketed LSH/verify shuffles plus one final bucketed co-group that
    assigns singleton clusters to never-matched docs — no driver-side
    id sets at any point.
    """
    from graphscope_ray.stages.relational import bucketed_group_apply

    cand = minhash_lsh_pairs(
        docs, text_col, id_col, shingle_k, num_perm, bands,
        hash_fn=hash_fn)
    dup = verify_jaccard_pairs(
        cand, docs, text_col, id_col, shingle_k, threshold, num_buckets
    ).materialize()  # small: verified duplicate pairs only

    ids = docs.select_columns([id_col])
    if dup.count() == 0:
        def singleton(t: pa.Table) -> pa.Table:
            v = t.column(id_col).cast(pa.int64())
            return pa.table({"doc_id": v, "cluster_id": v,
                             "keep": pa.array(np.ones(t.num_rows, bool))})

        return ids.map_batches(singleton, batch_format="pyarrow")

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("a").cast(pa.int64()),
                         "dst": t.column("b").cast(pa.int64())})

    from graphscope_ray.pipelines.algorithms import wcc
    from graphscope_ray.state.graph import build_graph

    graph = build_graph(dup.map_batches(as_edges, batch_format="pyarrow"),
                        num_partitions=num_partitions, directed=False)
    comp, _ = wcc(graph)  # (vid, component); component = min member id

    def tag_ids(t: pa.Table) -> pa.Table:
        v = t.column(id_col).cast(pa.int64())
        return pa.table({"doc": v, "comp": pa.nulls(t.num_rows, pa.int64()),
                         "side": pa.array(np.zeros(t.num_rows, np.int8))})

    def tag_comp(t: pa.Table) -> pa.Table:
        return pa.table({"doc": t.column("vid").cast(pa.int64()),
                         "comp": t.column("component").cast(pa.int64()),
                         "side": pa.array(np.ones(t.num_rows, np.int8))})

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == 0][["doc"]]
        c = g[g["side"] == 1][["doc", "comp"]]
        m = d.merge(c, on="doc", how="left")
        cluster = m["comp"].fillna(m["doc"]).astype(np.int64)
        return pd.DataFrame({
            "doc_id": m["doc"].to_numpy(np.int64),
            "cluster_id": cluster.to_numpy(np.int64),
            "keep": (m["doc"].to_numpy(np.int64)
                     == cluster.to_numpy(np.int64)),
        })

    both = (ids.map_batches(tag_ids, batch_format="pyarrow")
            .union(comp.map_batches(tag_comp, batch_format="pyarrow")))
    return bucketed_group_apply(both, ["doc"], resolve, num_buckets)


def paragraph_dedup(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Span-level (paragraph/line) exact dedup in the C4 style: every
    repeated span keeps only its first occurrence corpus-wide (order =
    lexicographic (``id_col``, position)); later occurrences are cut
    out of their documents. Unlike :func:`exact_dedup` (whole-doc) this
    removes boilerplate that recurs INSIDE otherwise-unique documents —
    the dominant duplication mode in web corpora (navigation chrome,
    license headers, cookie banners).

    Three streaming stages, none of which ships span text twice:
    1. explode — one flat pass emits ``(h, doc, pos)`` int64 rows per
       span (hash only; the text stays in the source rows);
    2. removals — :func:`bucketed_group_apply` on ``h`` keeps the min
       (doc, pos) of each hash group and emits the REST as removal
       rows (size-1 groups emit nothing, so the removal table is
       O(duplicate spans), typically ≪ corpus);
    3. rebuild — one bucketed co-group on the doc id re-splits each
       document and drops its removed positions, fully vectorized
       (explode + anti-merge + groupby-join, no per-row loop).

    Empty spans (blank lines / double separators) are never treated as
    duplicates — removing them would rewrite formatting, not content.
    Output: ``(id_col, text_col, removed_spans)``; a document whose
    every span was removed keeps an empty string."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        spans = b[text_col].str.split(sep)
        lens = spans.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"h": pd.Series([], dtype=np.int64),
                                 "doc": pd.Series([], dtype=np.int64),
                                 "pos": pd.Series([], dtype=np.int64)})
        flat = pd.Series(np.concatenate([s for s in spans if len(s)]))
        h = hash64_strings(flat.to_numpy(object)).view(np.int64)
        doc = np.repeat(b[id_col].to_numpy(np.int64), lens)
        pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lens])
        keep = flat.str.len().to_numpy(np.int64) > 0
        return pd.DataFrame({"h": h[keep], "doc": doc[keep],
                             "pos": pos[keep]})

    spans = docs.map_batches(explode, batch_format="pandas")

    def removals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc", "pos"], kind="mergesort")
        first = ~g.duplicated("h", keep="first")
        dup_any = g.duplicated("h", keep=False)
        out = g.loc[dup_any & ~first]
        return pd.DataFrame({"doc": out["doc"].to_numpy(np.int64),
                             "pos": out["pos"].to_numpy(np.int64)})

    rem = bucketed_group_apply(spans, ["h"], removals, num_buckets)

    # common co-group schema: (doc, pos, text, _side) — body rows carry
    # the text at pos=-1; removal rows carry empty text
    body = docs.map_batches(
        lambda b: pd.DataFrame({
            "doc": b[id_col].to_numpy(np.int64),
            "pos": np.full(len(b), -1, np.int64),
            text_col: b[text_col].astype(str),
            "_side": np.zeros(len(b), np.int8),
        }), batch_format="pandas")
    cuts = rem.map_batches(
        lambda b: pd.DataFrame({
            "doc": b["doc"].to_numpy(np.int64),
            "pos": b["pos"].to_numpy(np.int64),
            text_col: np.full(len(b), "", object),
            "_side": np.ones(len(b), np.int8),
        }), batch_format="pandas")

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["_side"] == 0]
        cut = g.loc[g["_side"] == 1, ["doc", "pos"]]
        spans = b[text_col].str.split(sep)
        lens = spans.str.len().fillna(0).to_numpy(np.int64)
        docv = b["doc"].to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({
                id_col: docv, text_col: b[text_col].to_numpy(object),
                "removed_spans": np.zeros(len(b), np.int64)})
        flat = pd.DataFrame({
            "doc": np.repeat(docv, lens),
            "pos": np.concatenate(
                [np.arange(n, dtype=np.int64) for n in lens]),
            "s": np.concatenate([s for s in spans if len(s)]),
        })
        merged = flat.merge(cut, on=["doc", "pos"], how="left",
                            indicator=True)
        kept = merged[merged["_merge"] == "left_only"]
        joined = kept.groupby("doc", sort=False)["s"].agg(sep.join)
        out = pd.DataFrame({"doc": docv}).join(joined, on="doc")
        n_kept = kept.groupby("doc", sort=False).size()
        out = out.join(n_kept.rename("nk"), on="doc")
        return pd.DataFrame({
            id_col: docv,
            text_col: out["s"].fillna("").to_numpy(object),
            "removed_spans": lens - out["nk"].fillna(0).to_numpy(np.int64),
        })

    return bucketed_group_apply(body.union(cuts), ["doc"], rebuild,
                                num_buckets)


# -------------------------------------------- exact substring dedup
_POLY_A = np.uint64(0x9E3779B97F4A7C15)          # odd → invertible mod 2^64
_POLY_A_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def _window_hash_rows(texts: pd.Series, doc_ids: np.ndarray, k: int):
    """Whitespace-tokenize a batch and emit one row per k-token window:
    ``(h, doc, start)`` — h a rolling polynomial hash of the window's
    token-hash sequence, O(total tokens) work independent of k.

    The polynomial prefix P is computed once over the batch's
    CONCATENATED token stream: ``w[s] = P[s+k] − P[s]·A^k`` depends
    only on tokens ``s..s+k-1``, so doc boundaries need no per-doc
    recompute — invalid (boundary-crossing) starts are simply never
    emitted. uint64 arithmetic wraps ≡ mod 2^64; A odd keeps the map
    injective per position."""
    toks = texts.str.split()
    lens = toks.str.len().fillna(0).to_numpy(np.int64)
    total = int(lens.sum())
    counts = np.maximum(lens - k + 1, 0)
    empty = pd.DataFrame({"h": pd.Series([], dtype=np.int64),
                          "doc": pd.Series([], dtype=np.int64),
                          "start": pd.Series([], dtype=np.int64)})
    if counts.sum() == 0:
        return empty
    flat = np.concatenate([t for t in toks if len(t)])
    t = hash64_strings(flat)                      # uint64, length N
    n = total
    apow = np.empty(n + 1, np.uint64)
    apow[0] = np.uint64(1)
    np.multiply.accumulate(np.full(n, _POLY_A, np.uint64), out=apow[1:])
    ainv = np.empty(n, np.uint64)
    ainv[0] = np.uint64(1)
    if n > 1:
        np.multiply.accumulate(
            np.full(n - 1, _POLY_A_INV, np.uint64), out=ainv[1:])
    c = np.cumsum(t * ainv)                       # Σ t_j·A^-j (mod 2^64)
    prefix = np.empty(n + 1, np.uint64)
    prefix[0] = np.uint64(0)
    prefix[1:] = apow[:n] * c                     # P[i] = A^{i-1}·c[i-1]
    off = np.concatenate(([0], np.cumsum(lens)))[:-1]
    doc = np.repeat(doc_ids, counts)
    local = (np.arange(int(counts.sum()), dtype=np.int64)
             - np.repeat(np.concatenate(([0], np.cumsum(counts)))[:-1],
                         counts))
    s = np.repeat(off, counts) + local
    w = prefix[s + k] - prefix[s] * apow[k]
    h = splitmix64(w).view(np.int64)
    return pd.DataFrame({"h": h, "doc": doc, "start": local})


def substring_dedup(
    docs: ray.data.Dataset,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact substring deduplication over k-token windows (the
    distributed counterpart of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": any substring of ≥ k
    whitespace tokens that occurs twice anywhere in the corpus is a
    duplicated window chain). Rule: every k-token window value keeps
    only its FIRST occurrence corpus-wide (lexicographic (doc, start));
    every token covered by a later occurrence of a duplicated window
    is removed. Sliding windows make this self-extending — a repeated
    run of m ≥ k tokens yields m−k+1 duplicated windows whose union
    covers the whole run.

    Same three-stage shape as :func:`paragraph_dedup` (hash-only
    explode → O(duplicate windows) removal rows → vectorized co-group
    rebuild); the window hash is a rolling polynomial over per-token
    hashes, so the explode is O(total tokens), not O(tokens · k), and
    no window text ever shuffles.

    Output ``(id_col, text_col, removed_tokens)``; text is
    whitespace-canonicalized (single-space joined) — documents shorter
    than k tokens pass through canonicalized, never cut.

    Scale note: the window-hash shuffle moves one 24-byte row per
    corpus TOKEN (≈5× the text bytes) — the price of EXACT substring
    dedup without a distributed suffix array; the text itself moves
    only once (the rebuild co-group), and the removal table between
    the two stages is O(duplicate windows). Budget this op like a
    full-corpus groupby; for cheap approximate passes run
    :func:`paragraph_dedup` (span-level) or MinHash first and reserve
    this for the survivor set."""
    from graphscope_ray.stages.relational import bucketed_group_apply

    if k < 2:
        raise ValueError("substring_dedup: k must be ≥ 2")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        return _window_hash_rows(
            b[text_col].astype(str), b[id_col].to_numpy(np.int64), k)

    wins = docs.map_batches(explode, batch_format="pandas")

    def removals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc", "start"], kind="mergesort")
        first = ~g.duplicated("h", keep="first")
        dup_any = g.duplicated("h", keep=False)
        out = g.loc[dup_any & ~first]
        return pd.DataFrame({"doc": out["doc"].to_numpy(np.int64),
                             "start": out["start"].to_numpy(np.int64)})

    rem = bucketed_group_apply(wins, ["h"], removals, num_buckets)

    body = docs.map_batches(
        lambda b: pd.DataFrame({
            "doc": b[id_col].to_numpy(np.int64),
            "start": np.full(len(b), -1, np.int64),
            text_col: b[text_col].astype(str),
            "_side": np.zeros(len(b), np.int8),
        }), batch_format="pandas")
    cuts = rem.map_batches(
        lambda b: pd.DataFrame({
            "doc": b["doc"].to_numpy(np.int64),
            "start": b["start"].to_numpy(np.int64),
            text_col: np.full(len(b), "", object),
            "_side": np.ones(len(b), np.int8),
        }), batch_format="pandas")

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["_side"] == 0].sort_values("doc", kind="mergesort")
        cut = g.loc[g["_side"] == 1, ["doc", "start"]]
        toks = b[text_col].str.split()
        lens = toks.str.len().fillna(0).to_numpy(np.int64)
        docv = b["doc"].to_numpy(np.int64)
        total = int(lens.sum())
        if total == 0:
            return pd.DataFrame({
                id_col: docv,
                text_col: np.full(len(b), "", object),
                "removed_tokens": np.zeros(len(b), np.int64)})
        flat = np.concatenate([t for t in toks if len(t)])
        off = np.concatenate(([0], np.cumsum(lens)))
        # removal window [start, start+k) → flat index range via the
        # owning doc's offset (docv is sorted; starts are in-range by
        # construction)
        diff = np.zeros(total + 1, np.int64)
        if len(cut):
            row = np.searchsorted(docv, cut["doc"].to_numpy(np.int64))
            s = off[row] + cut["start"].to_numpy(np.int64)
            np.add.at(diff, s, 1)
            np.add.at(diff, s + k, -1)
        covered = np.cumsum(diff[:total]) > 0
        keep = ~covered
        doc_rep = np.repeat(docv, lens)
        kept = pd.DataFrame({"doc": doc_rep[keep], "s": flat[keep]})
        joined = kept.groupby("doc", sort=False)["s"].agg(" ".join)
        n_kept = kept.groupby("doc", sort=False).size()
        out = pd.DataFrame({"doc": docv}).join(joined, on="doc")
        out = out.join(n_kept.rename("nk"), on="doc")
        return pd.DataFrame({
            id_col: docv,
            text_col: out["s"].fillna("").to_numpy(object),
            "removed_tokens":
                lens - out["nk"].fillna(0).to_numpy(np.int64),
        })

    return bucketed_group_apply(body.union(cuts), ["doc"], rebuild,
                                num_buckets)
