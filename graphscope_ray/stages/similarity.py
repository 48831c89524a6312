"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does one numpy matmul against it; partial
top-k per batch, exact merge at the end (tiny: k × #queries rows).

Scale path: IVF-style bucketing — vectors are assigned to their nearest
of C seeded centroids (one shuffle on the small centroid-id key);
queries probe the ``nprobe`` nearest centroids only. Recall/probe
trade-off is explicit, never silent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _normalize(V: np.ndarray) -> np.ndarray:
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k for each query row → DataFrame
    (query_idx, vec_id, cosine), ranked. Deterministic ties: lower
    vec_id first."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(Q)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        Qm = _resolve(qref)
        V = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        S = Qm @ V.T  # (nq, nb)
        ids = batch[id_col].to_numpy()
        out = []
        kk = min(k, S.shape[1])
        for qi in range(S.shape[0]):
            # stable partial top-k: sort by (-cos, id)
            idx = np.lexsort((ids, -S[qi]))[:kk]
            out.append(pd.DataFrame(
                {"query_idx": qi, id_col: ids[idx], "cosine": S[qi, idx]}))
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    parts = parts.sort_values(
        ["query_idx", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort",
    )
    return parts.groupby("query_idx", sort=True).head(k).reset_index(drop=True)


def exact_cosine_pairs(
    ds: ray.data.Dataset,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_rows: int = 4096,
) -> ray.data.Dataset:
    """EXACT near-duplicate pairs (a < b, cosine ≥ threshold) by a
    blocked all-pairs sweep: the table is normalized into ≤``block_rows``
    blocks held in the object store, and one Ray task per block pair
    (i ≤ j) does a single matmul and emits only the surviving pairs.

    This is the exact counterpart of the LSH path
    (``stages.dedup.embedding_neardup_pairs``): O(n²/block²) tasks —
    the right tool when exactness is required or the threshold is too
    low for hyperplane-LSH recall (recall decays fast below ~0.8
    cosine). Blocks stream through the object store; the driver only
    holds block refs. Work grows quadratically with n — that is
    inherent to exact all-pairs, not a harness artifact."""

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "_v": list(V)})

    blocks = (
        ds.map_batches(norm, batch_format="pandas", batch_size=block_rows)
        .materialize().to_arrow_refs()
    )

    @ray.remote
    def pair_block(ta, tb, same: bool):
        import pyarrow as pa

        ia = ta.column(id_col).to_numpy(zero_copy_only=False)
        ib = tb.column(id_col).to_numpy(zero_copy_only=False)
        Va = np.stack(ta.column("_v").to_numpy(zero_copy_only=False))
        Vb = np.stack(tb.column("_v").to_numpy(zero_copy_only=False))
        S = Va @ Vb.T
        i, j = np.where(S >= threshold)
        a, b, c = ia[i], ib[j], S[i, j]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = a != b if same else np.ones(len(a), dtype=bool)
        return pa.table({
            "a": pa.array(lo[keep], pa.int64()),
            "b": pa.array(hi[keep], pa.int64()),
            "cosine": pa.array(c[keep], pa.float64()),
        })

    refs = []
    for i in range(len(blocks)):
        for j in range(i, len(blocks)):
            refs.append(pair_block.remote(blocks[i], blocks[j], i == j))
    out = ray.data.from_arrow_refs(refs)
    # same-block pairs surface once as (lo, hi); cross-block pairs can
    # not repeat (disjoint id sets) — but dedup keeps the contract
    # explicit and cheap (pair-scale, not n²-scale)
    from graphscope_ray.stages.relational import dedup_first

    return dedup_first(out, ["a", "b"])


def _hash_sample(ds: ray.data.Dataset, id_col: str, keep_1_in: int,
                 seed: int) -> ray.data.Dataset:
    """Deterministic streaming sample: keep rows whose mixed id hashes
    into the first 1/keep_1_in slice — unbiased w.r.t. block order
    (``Dataset.limit`` would sample only the first blocks)."""
    from graphscope_ray.functions.hashing import hash64_ints

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        h = hash64_ints(batch[id_col].to_numpy(np.int64)
                        + np.int64(seed))
        return batch[h % np.uint64(keep_1_in) == 0]

    return ds.map_batches(f, batch_format="pandas")


def ivf_build(
    ds: ray.data.Dataset,
    num_centroids: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    seed: int = 42,
):
    """One-pass IVF 'training': sample vectors, pick C seeded sample
    rows as centroids (k-means init without iterations — adequate for
    bucketing), assign every vector to its nearest centroid.

    Returns (assigned Dataset with a ``centroid`` column, centroids)."""
    n = ds.count()
    rate = max(1, n // max(1, sample_size))
    sample = _hash_sample(ds, id_col, rate, seed).to_pandas()
    if len(sample) == 0:  # tiny table edge case
        sample = ds.limit(sample_size).to_pandas()
    # canonical order: sample rows arrive in block order, which depends
    # on the input's partitioning — sort by id so the seeded pick (and
    # therefore the whole index) is partition-invariant
    sample = sample.sort_values(id_col, kind="mergesort")
    V = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    C = V[rng.choice(len(V), size=min(num_centroids, len(V)), replace=False)]
    cref = ray.put(C)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        Cm = _resolve(cref)
        Vb = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        batch = batch.copy()
        batch["centroid"] = (Vb @ Cm.T).argmax(axis=1).astype(np.int64)
        return batch

    return ds.map_batches(assign, batch_format="pandas"), C


def ivf_topk(
    assigned: ray.data.Dataset,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Approximate top-k: per query probe the ``nprobe`` nearest
    centroid buckets (a broadcast semi-filter, no shuffle), then exact
    cosine within the probed subset."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = np.unique(probe)
    sub = _filter_centroids(assigned, wanted)
    return brute_force_topk(sub, Q, k=k, vec_col=vec_col, id_col=id_col)


def _filter_centroids(assigned: ray.data.Dataset, wanted: np.ndarray
                      ) -> ray.data.Dataset:
    wref = ray.put(np.asarray(wanted, dtype=np.int64))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        w = _resolve(wref)
        return batch[np.isin(batch["centroid"].to_numpy(), w)]

    return assigned.map_batches(f, batch_format="pandas")


def kmeans(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    seed: int = 42,
    init: np.ndarray | None = None,
):
    """Distributed spherical k-means (Lloyd) over an embedding column —
    the domain-discovery / corpus-clustering companion to the IVF
    index (whose one-shot centroid pick this supersedes when real
    clusters are wanted). Cosine geometry: vectors and centroids live
    on the unit sphere, assignment = max dot product, the update is the
    renormalized mean (classic spherical k-means; the natural metric
    for embedding columns and the same one `brute_force_topk`/IVF use).

    Scale shape: per iteration one streaming ``map_batches`` pass emits
    a k × (d+1) partial (per-centroid vector sum + count) per block —
    the corpus never shuffles and never lands on the driver; the driver
    reduces O(blocks · k · d) floats. Determinism: partials are summed
    in sorted order of each block's min id (block arrival order doesn't
    change the float sum), and ties in assignment break to the lowest
    centroid index (argmax semantics) — two runs give bit-identical
    centroids. Empty clusters keep their previous centroid
    (documented, matches the replica oracle in tests).

    Returns ``(assigned, centroids, inertia)``: the input Dataset with
    a ``centroid`` int64 column, the (k, d) float64 centroid matrix,
    and Σ(1 - cos(v, c(v))) from the final assignment pass."""
    # iterative consumer: pin the input blocks in the (spillable)
    # object store once instead of re-executing the upstream read
    # plan on every Lloyd pass
    ds = ds.materialize()
    if init is not None:
        C = _normalize(np.asarray(init, dtype=np.float64))
    else:
        n = ds.count()
        rate = max(1, n // max(1, sample_size))
        sample = _hash_sample(ds, id_col, rate, seed).to_pandas()
        if len(sample) == 0:
            sample = ds.limit(sample_size).to_pandas()
        # sort the sample by id: block order depends on partitioning,
        # and the seeded init pick must not (same fix as ivf_build)
        sample = sample.sort_values(id_col, kind="mergesort")
        V = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(seed)
        C = V[rng.choice(len(V), size=min(k, len(V)), replace=False)]
    k = len(C)

    for _ in range(max(0, iters)):
        cref = ray.put(C)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            Cm = _resolve(cref)
            Vb = _normalize(np.stack(b[vec_col].to_numpy()).astype(np.float64))
            a = (Vb @ Cm.T).argmax(axis=1)
            sums = np.zeros((len(Cm), Vb.shape[1]), np.float64)
            np.add.at(sums, a, Vb)
            cnt = np.bincount(a, minlength=len(Cm)).astype(np.int64)
            return pd.DataFrame({
                "bkey": np.full(len(Cm), b[id_col].to_numpy(np.int64).min()),
                "centroid": np.arange(len(Cm), dtype=np.int64),
                "cnt": cnt,
                "vecsum": list(sums),
            })

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        parts = parts.sort_values(["bkey", "centroid"], kind="mergesort")
        sums = np.zeros((k, C.shape[1]), np.float64)
        cnts = np.zeros(k, np.int64)
        for c_idx, grp in parts.groupby("centroid", sort=True):
            sums[c_idx] = np.sum(np.stack(grp["vecsum"].to_numpy()), axis=0)
            cnts[c_idx] = grp["cnt"].sum()
        newC = C.copy()
        nonempty = cnts > 0
        newC[nonempty] = _normalize(sums[nonempty])
        C = newC

    cref = ray.put(C)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        Cm = _resolve(cref)
        Vb = _normalize(np.stack(b[vec_col].to_numpy()).astype(np.float64))
        dots = Vb @ Cm.T
        b = b.copy()
        b["centroid"] = dots.argmax(axis=1).astype(np.int64)
        b["_cos"] = dots.max(axis=1)
        return b

    assigned = ds.map_batches(assign, batch_format="pandas").materialize()
    inertia = float(assigned.map_batches(
        lambda b: pd.DataFrame({"s": [np.sum(1.0 - b["_cos"].to_numpy())]}),
        batch_format="pandas").to_pandas()["s"].sum())
    return assigned.drop_columns(["_cos"]), C, inertia


def pca_fit(
    ds: ray.data.Dataset,
    n_components: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Fit PCA over an embedding column in ONE streaming pass: each
    block emits a (n, Σx, XᵀX) partial — d+1 rows of d floats, never
    the vectors — reduced on the driver in sorted order of each
    block's min id (block arrival order cannot change the float sums,
    so two runs give bit-identical components). The d×d covariance
    eigendecomposition happens once on the driver (d is the embedding
    width — tiny by contract; the corpus side stays distributed).

    Sign convention: each component is flipped so its
    largest-|coefficient| entry is positive — eigh's sign freedom
    removed, components canonical. Returns ``{"mean", "components"
    (n_components × d, eigenvalue-descending), "explained_variance"}``
    suitable for ``ray.put`` into :func:`pca_transform`."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "bkey": [np.int64(b[id_col].to_numpy(np.int64).min())],
            "n": [np.int64(len(X))],
            "s": [X.sum(axis=0)],
            "ss": [X.T @ X],
        })

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas().sort_values("bkey", kind="mergesort"))
    n = float(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return {"mean": mean, "components": comps,
            "explained_variance": np.maximum(evals[order], 0.0)}


def pca_transform(
    ds: ray.data.Dataset,
    model: "dict | ray.ObjectRef",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> ray.data.Dataset:
    """Project the embedding column onto the fitted components —
    ``out_col`` = (x − mean) · componentsᵀ per row, one stateless
    vectorized batch matmul; the model ships once via the object
    store."""
    ref = model if isinstance(model, ray.ObjectRef) else ray.put(model)

    def f(b: pd.DataFrame) -> pd.DataFrame:
        m = _resolve(ref)
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        P = (X - m["mean"]) @ m["components"].T
        b = b.copy()
        b[out_col] = list(P)
        return b

    return ds.map_batches(f, batch_format="pandas")


def _chunked_earlier_dup(V: np.ndarray, ncheck: int, tau: float,
                         block: int | None = None) -> np.ndarray:
    """dup[i] = any j < i with V[i]·V[j] ≥ tau, for i < ncheck, via
    row-block chunks: peak memory is O(block × ncheck) floats (~128 MB
    at the default block), never the dense ncheck² matrix (80 GB at
    the 100k cluster cap)."""
    dup = np.zeros(ncheck, bool)
    blk = block or max(1, (1 << 24) // max(1, ncheck))
    for b0 in range(1, ncheck, blk):
        b1 = min(b0 + blk, ncheck)
        S = V[b0:b1] @ V[:b1].T
        lower = (np.arange(b1)[None, :]
                 < np.arange(b0, b1)[:, None])
        dup[b0:b1] = ((S >= tau) & lower).any(axis=1)
    return dup


def semdedup(
    ds: ray.data.Dataset,
    k: int = 8,
    eps: float = 0.07,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    init: np.ndarray | None = None,
    max_cluster_rows: int = 100_000,
    num_buckets: int = 32,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = spherical k-means clustering + within-cluster
    cosine-duplicate removal. Pairwise similarity is only ever computed
    INSIDE a cluster, so the quadratic term is O(Σ m_c²), not O(n²),
    and each cluster is handled by one vectorized worker call via the
    bucketed co-group (clusters never land on the driver).

    Keep rule (the paper's, made deterministic): within a cluster,
    order rows by (cos-to-centroid ascending, id ascending) — farthest
    from the centroid first; a row is removed iff it has cosine
    ≥ 1 − eps with ANY earlier row in that order. So of each duplicate
    group the representative kept is the one least typical of the
    cluster, matching the paper's "keep low similarity to centroid".

    Clusters larger than ``max_cluster_rows`` have only their first
    ``max_cluster_rows`` rows (in keep order) pair-checked; the rest
    are kept and the truncation is logged — deterministic, no silent
    cap. Size k so clusters stay far below this at corpus scale.

    Returns the input Dataset + ``centroid`` (int64) and ``keep``
    (bool) columns. Deterministic end-to-end: kmeans is bit-identical
    across runs/partitionings and the keep rule is a pure function of
    (similarities, ids).
    """
    from graphscope_ray.stages.relational import bucketed_group_apply

    assigned, C, _ = kmeans(ds, k=k, iters=iters, vec_col=vec_col,
                            id_col=id_col, seed=seed, init=init)
    tau = 1.0 - eps
    cref = ray.put(C)

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        import logging
        Cm = _resolve(cref)
        out = []
        for cid, grp in g.groupby("centroid", sort=True):
            V = _normalize(np.stack(grp[vec_col].to_numpy())
                           .astype(np.float64))
            cos_c = V @ Cm[int(cid)]
            order = np.lexsort((grp[id_col].to_numpy(np.int64), cos_c))
            grp = grp.iloc[order]
            V = V[order]
            m = len(grp)
            keep = np.ones(m, bool)
            ncheck = min(m, max_cluster_rows)
            if m > max_cluster_rows:
                logging.getLogger(__name__).warning(
                    "semdedup: cluster %d has %d rows; only the first "
                    "%d (farthest-from-centroid) pair-checked",
                    int(cid), m, max_cluster_rows)
            if ncheck > 1:
                keep[:ncheck] = ~_chunked_earlier_dup(V, ncheck, tau)
            grp = grp.copy()
            grp["keep"] = keep
            out.append(grp)
        return (pd.concat(out, ignore_index=True) if out
                else g.assign(keep=pd.Series([], dtype=bool)))

    return bucketed_group_apply(assigned, ["centroid"], dedup_cluster,
                                num_buckets=num_buckets)


def semdedup_reference(ids, vectors, centroids, assignments,
                       eps: float = 0.07) -> dict[int, bool]:
    """Sequential oracle for the keep rule given a fixed clustering —
    the distributed result must match exactly at any partitioning."""
    ids = np.asarray(ids, np.int64)
    V = _normalize(np.asarray(vectors, np.float64))
    C = _normalize(np.asarray(centroids, np.float64))
    a = np.asarray(assignments, np.int64)
    tau = 1.0 - eps
    keep = {}
    for cid in np.unique(a):
        idx = np.where(a == cid)[0]
        cos_c = V[idx] @ C[int(cid)]
        order = idx[np.lexsort((ids[idx], cos_c))]
        # paper rule: compare vs ALL earlier rows in order, kept or not
        for pos, i in enumerate(order):
            dup = any(float(V[i] @ V[j]) >= tau for j in order[:pos])
            keep[int(ids[i])] = not dup
    return keep


# ------------------------------------------------ product quantization
def pq_train(
    ds: ray.data.Dataset,
    m: int = 4,
    nbits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011 — the
    compression layer under billion-scale ANN; composes with
    :func:`ivf_build` as IVF-PQ): the vector space splits into ``m``
    subspaces and each learns a 2^``nbits``-entry codebook by Lloyd
    k-means over a deterministic hash sample (the :func:`ivf_build`
    sampling contract: sample-sized driver work, partition-invariant
    by sorting on ``id_col``; the full table never leaves the
    cluster). Returns ``(m, 2^nbits, d/m)`` float64 codebooks —
    ``m·2^nbits·(d/m) = 2^nbits·d`` floats, a broadcast-sized object
    at any corpus size."""
    if not 1 <= nbits <= 8:
        raise ValueError("pq_train: nbits must be in [1, 8] — codes "
                         "are uint8")
    K = 1 << nbits
    n = ds.count()
    rate = max(1, n // max(1, sample_size))
    sample = _hash_sample(ds, id_col, rate, seed).to_pandas()
    if len(sample) == 0:
        sample = ds.limit(sample_size).to_pandas()
    sample = sample.sort_values(id_col, kind="mergesort")
    V = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    d = V.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, min(K, len(V)), dsub), np.float64)
    for j in range(m):
        X = V[:, j * dsub:(j + 1) * dsub]
        C = X[rng.choice(len(X), size=books.shape[1], replace=False)]
        for _ in range(iters):
            # L2 assignment: argmin ||x - c||² = argmax (x·c − ||c||²/2)
            a = (X @ C.T - 0.5 * (C * C).sum(axis=1)).argmax(axis=1)
            for c in range(len(C)):   # K is small (≤256); X is a sample
                mask = a == c
                if mask.any():
                    C[c] = X[mask].mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    ds: ray.data.Dataset,
    codebooks: "np.ndarray | ray.ObjectRef",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pq_code",
    keep_cols: "list[str] | None" = None,
) -> ray.data.Dataset:
    """Quantize every vector to ``m`` uint8 code indices (nearest
    subspace codeword by L2) — one broadcast of the codebooks, one
    streaming pass; output ``(id_col, out_col list<uint8>)`` shrinks
    a d-float vector to m bytes (d/m · 32× compression)."""
    cref = (codebooks if isinstance(codebooks, ray.ObjectRef)
            else ray.put(np.asarray(codebooks, np.float64)))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        B = _resolve(cref)
        m, K, dsub = B.shape
        V = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        codes = np.empty((len(V), m), np.uint8)
        for j in range(m):
            X = V[:, j * dsub:(j + 1) * dsub]
            codes[:, j] = (X @ B[j].T
                           - 0.5 * (B[j] * B[j]).sum(axis=1)
                           ).argmax(axis=1).astype(np.uint8)
        out = {id_col: batch[id_col].to_numpy(),
               out_col: list(codes)}
        for c in keep_cols or []:
            out[c] = batch[c].to_numpy()
        return pd.DataFrame(out)

    return ds.map_batches(f, batch_format="pandas")


def pq_topk(
    encoded: ray.data.Dataset,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    probe: "np.ndarray | None" = None,
    centroid_col: str = "centroid",
) -> pd.DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query precomputes
    an (m, K) inner-product lookup table against the codebooks, a
    batch's score is the LUT gather-sum over its codes (no float
    vectors move — the scan reads m bytes/row), per-block partial
    top-k then one tiny driver merge (the :func:`brute_force_topk`
    shape). Scores equal ``cosine(query, decode(code))`` exactly (same
    sum, different association order). Deterministic ties: lower id.

    ``probe`` (nq, nprobe), when given, restricts EACH query's
    candidates to the rows whose ``centroid_col`` value is in that
    query's own probed-bucket set (FAISS IVFPQ per-query nprobe
    semantics) — rows outside it are masked out of that query's
    top-k, so results never depend on which other queries were
    co-batched."""
    B = np.asarray(codebooks, np.float64)
    m, K, dsub = B.shape
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    # LUT[qi, j, c] = Q_sub(qi, j) · B[j, c]
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), B)
    allowed = None
    if probe is not None:
        p = np.asarray(probe, dtype=np.int64)
        allowed = np.zeros((len(Q), int(p.max()) + 1), dtype=bool)
        allowed[np.repeat(np.arange(len(Q)), p.shape[1]), p.ravel()] = True
    lref = ray.put((lut, allowed))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        L, allow = _resolve(lref)
        codes = np.stack(batch[code_col].to_numpy()).astype(np.int64)
        ids = batch[id_col].to_numpy()
        # S[qi, row] = Σ_j L[qi, j, codes[row, j]]
        S = L[:, np.arange(m), codes].sum(axis=2)
        if allow is not None:
            cents = batch[centroid_col].to_numpy().astype(np.int64)
            in_range = cents < allow.shape[1]
            ok = np.zeros((allow.shape[0], len(cents)), dtype=bool)
            ok[:, in_range] = allow[:, cents[in_range]]
            S = np.where(ok, S, -np.inf)
        out = []
        kk = min(k, S.shape[1])
        for qi in range(S.shape[0]):
            idx = np.lexsort((ids, -S[qi]))[:kk]
            idx = idx[np.isfinite(S[qi, idx])]
            out.append(pd.DataFrame(
                {"query_idx": qi, id_col: ids[idx],
                 "score": S[qi, idx]}))
        return pd.concat(out, ignore_index=True)

    parts = encoded.map_batches(partial, batch_format="pandas").to_pandas()
    parts = parts.sort_values(
        ["query_idx", "score", id_col], ascending=[True, False, True],
        kind="mergesort")
    return parts.groupby("query_idx", sort=True).head(k).reset_index(drop=True)


def ivf_pq_build(
    ds: ray.data.Dataset,
    num_centroids: int = 64,
    m: int = 4,
    nbits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 42,
):
    """IVF-PQ index build (Jégou et al. 2011; FAISS ``IVFPQ`` with
    ``by_residual=False`` — codes quantize the normalized vectors
    directly, not centroid residuals, keeping ADC scores exactly the
    cosine of the decoded vector): coarse centroids bucket the corpus
    (``ivf_build``), PQ codebooks compress every vector to ``m`` bytes
    (``pq_train``/``pq_encode``). The float vectors are gone after the
    one encode pass — the resident index is ``(id, centroid, m-byte
    code)``, i.e. d/m·32× smaller than the corpus.

    Returns (encoded Dataset (id, centroid, code) — materialized, it
    IS the index; centroids; codebooks)."""
    assigned, centroids = ivf_build(
        ds, num_centroids=num_centroids, vec_col=vec_col, id_col=id_col,
        sample_size=sample_size, seed=seed)
    codebooks = pq_train(
        ds, m=m, nbits=nbits, vec_col=vec_col, id_col=id_col,
        sample_size=sample_size, iters=iters, seed=seed)
    encoded = pq_encode(assigned, codebooks, vec_col=vec_col,
                        id_col=id_col, keep_cols=["centroid"]
                        ).materialize()
    return encoded, centroids, codebooks


def ivf_pq_topk(
    encoded: ray.data.Dataset,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> pd.DataFrame:
    """IVF-PQ query: probe the ``nprobe`` nearest coarse buckets per
    query, then the ADC LUT gather-sum scan of :func:`pq_topk` over
    the surviving m-byte codes. The scan streams once over the UNION
    of all queries' probed buckets (one broadcast semi-filter), but
    each query's candidates are masked to its OWN probe set inside
    the scan — FAISS IVFPQ per-query nprobe semantics, so a query's
    result never depends on which other queries were co-batched. No
    float vector is read at query time."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(probe)
    sub = _filter_centroids(encoded, wanted)
    return pq_topk(sub, codebooks, queries, k=k, id_col=id_col,
                   code_col=code_col, probe=probe)
