"""Oracles for the round-3 session-5 additions: benchmark
decontamination (n-gram blocklist overlap) and distributed spherical
k-means — both pinned against pure numpy/python replicas built on the
same kernels, plus determinism / streaming-shape checks."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from graphscope_ray.stages.dedup import _shingle_hashes
from graphscope_ray.stages.similarity import _normalize, kmeans
from graphscope_ray.stages.textprep import (
    build_ngram_blocklist,
    contamination_features,
    decontaminate,
)

# ------------------------------------------------------------------
# decontamination
# ------------------------------------------------------------------

BENCH_DOCS = [
    "the quick brown fox jumps over the lazy dog every single day",
    "to be or not to be that is the question worth asking twice",
]

CLEAN = "completely unrelated prose about distributed dataflow engines"


def _corpus():
    # doc 0: verbatim benchmark quote embedded mid-document
    # doc 1: clean
    # doc 2: short partial overlap (below any verbatim n-gram at n=8)
    # doc 3: entire benchmark doc
    return [
        "intro words here " + BENCH_DOCS[0] + " closing remarks",
        CLEAN + " with more words to give it enough tokens overall",
        "the quick brown fox appears briefly in this otherwise new text",
        BENCH_DOCS[1],
    ]


def _replica_counts(text: str, block: set, n: int):
    """Per-doc (hits, total) using the SAME shingle kernel, per-doc."""
    import graphscope_ray.stages.dedup as dd

    sh, starts = dd._batch_shingles(pd.Series([text]), n)
    total = len(sh)
    hits = sum(1 for h in sh if int(h) in block)
    return hits, total


def test_contamination_features_exact():
    bench = ray.data.from_pandas(pd.DataFrame({"text": BENCH_DOCS}))
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(4), "text": _corpus()}))
    ref = build_ngram_blocklist(bench, n=8)
    block = set(int(x) for x in ray.get(ref))
    got = (contamination_features(docs, ref, n=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, text in enumerate(_corpus()):
        hits, total = _replica_counts(text, block, 8)
        assert got.loc[i, "contaminated_ngrams"] == hits, i
        assert got.loc[i, "total_ngrams"] == total, i
        assert got.loc[i, "contamination_frac"] == pytest.approx(
            hits / total if total else 0.0)
    # semantic expectations: quote + full doc contaminated, others not
    assert got.loc[0, "contaminated_ngrams"] > 0
    assert got.loc[1, "contaminated_ngrams"] == 0
    assert got.loc[2, "contaminated_ngrams"] == 0  # 4-token overlap < n=8
    assert got.loc[3, "contamination_frac"] == 1.0


def test_decontaminate_drops_hits_only():
    bench = ray.data.from_pandas(pd.DataFrame({"text": BENCH_DOCS}))
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(4), "text": _corpus()}))
    kept = decontaminate(docs, bench, n=8, max_frac=0.0).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 2]
    # audit columns survive on kept rows
    assert {"contaminated_ngrams", "total_ngrams",
            "contamination_frac"} <= set(kept.columns)


def test_decontaminate_partition_invariant():
    bench = ray.data.from_pandas(pd.DataFrame({"text": BENCH_DOCS}))
    base = pd.DataFrame({"doc_id": np.arange(4), "text": _corpus()})
    one = decontaminate(
        ray.data.from_pandas(base), bench, n=8).to_pandas()
    many = decontaminate(
        ray.data.from_pandas(base).repartition(5), bench, n=8).to_pandas()
    assert sorted(one["doc_id"]) == sorted(many["doc_id"])


def test_blocklist_threshold_policy():
    bench = ray.data.from_pandas(pd.DataFrame({"text": BENCH_DOCS}))
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(4), "text": _corpus()}))
    # max_frac=1.0 keeps everything (even the verbatim benchmark doc)
    kept = decontaminate(docs, bench, n=8, max_frac=1.0).to_pandas()
    assert len(kept) == 4


def test_empty_benchmark_blocks_nothing():
    bench = ray.data.from_pandas(pd.DataFrame({"text": [""]}))
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(4), "text": _corpus()}))
    kept = decontaminate(docs, bench, n=8).to_pandas()
    assert len(kept) == 4


def test_shingle_kernel_identity():
    """The blocklist and the doc scan must hash through the identical
    shingle space — a verbatim quote therefore hits with frac ~ the
    quote's share of the doc."""
    h_doc = set(_shingle_hashes(BENCH_DOCS[0], 8).tolist())
    bench = ray.data.from_pandas(pd.DataFrame({"text": [BENCH_DOCS[0]]}))
    block = set(int(x) for x in ray.get(build_ngram_blocklist(bench, n=8)))
    assert h_doc == block


# ------------------------------------------------------------------
# spherical k-means
# ------------------------------------------------------------------

def _vectors(n=240, d=16, k=4, seed=7):
    """k well-separated unit clusters + noise."""
    rng = np.random.default_rng(seed)
    centers = _normalize(rng.normal(size=(k, d)))
    V = centers[np.arange(n) % k] + 0.05 * rng.normal(size=(n, d))
    return _normalize(V)


def _replica_kmeans(V, C0, iters):
    C = C0.copy()
    for _ in range(iters):
        a = (V @ C.T).argmax(axis=1)
        newC = C.copy()
        for j in range(len(C)):
            m = a == j
            if m.any():
                newC[j] = V[m].sum(axis=0)
                newC[j] /= np.linalg.norm(newC[j])
        C = newC
    a = (V @ C.T).argmax(axis=1)
    inertia = float(np.sum(1.0 - (V @ C.T).max(axis=1)))
    return a, C, inertia


def test_kmeans_matches_replica():
    V = _vectors()
    C0 = V[[0, 1, 2, 3]]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(len(V)), "embedding": list(V)})).repartition(6)
    assigned, C, inertia = kmeans(ds, iters=5, init=C0)
    ra, rC, rin = _replica_kmeans(V, C0, 5)
    assert np.allclose(C, rC, atol=1e-9)
    got = assigned.to_pandas().sort_values("vec_id")
    assert np.array_equal(got["centroid"].to_numpy(), ra)
    assert inertia == pytest.approx(rin, abs=1e-9)


def test_kmeans_deterministic_across_runs():
    V = _vectors(seed=11)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(len(V)), "embedding": list(V)})).repartition(4)
    _, C1, i1 = kmeans(ds, k=4, iters=4, seed=3)
    _, C2, i2 = kmeans(ds, k=4, iters=4, seed=3)
    assert np.array_equal(C1, C2)
    assert i1 == i2


def test_kmeans_separates_planted_clusters():
    V = _vectors(n=400, k=4, seed=5)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(len(V)), "embedding": list(V)}))
    assigned, C, _ = kmeans(ds, k=4, iters=8, seed=5)
    df = assigned.to_pandas().sort_values("vec_id")
    truth = np.arange(len(V)) % 4
    # cluster labels are arbitrary — check the partition matches: every
    # found cluster maps to exactly one planted cluster
    tab = pd.crosstab(df["centroid"], truth).to_numpy()
    assert (tab > 0).sum() == 4
    assert tab.max(axis=1).sum() == len(V)


def test_kmeans_empty_cluster_keeps_centroid():
    V = _normalize(np.array([[1.0, 0.0], [0.99, 0.14], [0.98, 0.2]]))
    # centroid 1 is antipodal — never nearest; must survive unchanged
    C0 = np.array([[1.0, 0.0], [-1.0, 0.0]])
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(3), "embedding": list(V)}))
    _, C, _ = kmeans(ds, iters=3, init=C0)
    assert np.allclose(C[1], [-1.0, 0.0])


# ------------------------------------------------------------------
# PCA (streaming covariance partials -> driver eigh)
# ------------------------------------------------------------------

def _pca_data(seed=11, n=400, d=12):
    """Anisotropic gaussian: variance concentrated in a few planted
    directions so component ordering is unambiguous."""
    rng = np.random.default_rng(seed)
    scales = np.array([8, 5, 3] + [0.5] * (d - 3))
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    X = (rng.normal(size=(n, d)) * scales) @ basis.T + rng.normal(size=d)
    return pd.DataFrame({"vec_id": np.arange(n),
                         "embedding": list(X.astype(np.float64))})


def test_pca_matches_numpy():
    from graphscope_ray.stages.similarity import pca_fit, pca_transform

    df = _pca_data()
    X = np.stack(df["embedding"].to_numpy())
    ds = ray.data.from_pandas(df).repartition(5)
    m = pca_fit(ds, n_components=4)

    cov = np.cov(X, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    want = evecs[:, order].T
    want *= np.sign(want[np.arange(4), np.abs(want).argmax(axis=1)])[:, None]
    assert np.allclose(m["components"], want, atol=1e-9)
    assert np.allclose(m["explained_variance"], evals[order], atol=1e-9)
    # variance ordering is descending
    assert (np.diff(m["explained_variance"]) <= 1e-12).all()

    out = pca_transform(ds, m).to_pandas().sort_values("vec_id")
    P = np.stack(out["pca"].to_numpy())
    wantP = (X - X.mean(axis=0)) @ want.T
    assert np.allclose(P, wantP, atol=1e-9)
    # projection decorrelates: off-diagonal covariance ~ 0
    pc = np.cov(P, rowvar=False, bias=True)
    assert np.allclose(pc - np.diag(np.diag(pc)), 0, atol=1e-6)


def test_pca_deterministic_and_partition_stable():
    from graphscope_ray.stages.similarity import pca_fit

    df = _pca_data(seed=5)
    ds3 = ray.data.from_pandas(df).repartition(3)
    m1 = pca_fit(ds3, n_components=3)
    m2 = pca_fit(ds3, n_components=3)
    # same blocks -> bit-identical (bkey-sorted reduce)
    assert (m1["components"] == m2["components"]).all()
    assert (m1["mean"] == m2["mean"]).all()
    # different partitioning -> same subspace to float tolerance
    m7 = pca_fit(ray.data.from_pandas(df).repartition(7), n_components=3)
    assert np.allclose(m1["components"], m7["components"], atol=1e-9)


def test_pca_reconstruction_improves_with_k():
    from graphscope_ray.stages.similarity import pca_fit, pca_transform

    df = _pca_data(seed=8)
    X = np.stack(df["embedding"].to_numpy())
    ds = ray.data.from_pandas(df).repartition(4)
    errs = []
    for k in (1, 3, 6):
        m = pca_fit(ds, n_components=k)
        out = pca_transform(ds, m).to_pandas().sort_values("vec_id")
        P = np.stack(out["pca"].to_numpy())
        recon = P @ m["components"] + m["mean"]
        errs.append(float(((X - recon) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
