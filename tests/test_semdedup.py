"""SemDeDup (k-means + within-cluster cosine dedup): replica-exact keep
rule, partition invariance, farthest-from-centroid representative,
eps monotonicity."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.stages.similarity import semdedup, semdedup_reference

D = 8


def _corpus(n_per=20, dup_frac=0.3, seed=0):
    """Two planted clusters on distinct axes + exact-ish duplicates.
    Returns (ids, vectors, planted duplicate id-pairs)."""
    rng = np.random.default_rng(seed)
    rows, pairs = [], []
    vid = 0
    for axis in (0, 1):
        base = np.zeros(D)
        base[axis] = 1.0
        for i in range(n_per):
            v = base + rng.normal(0, 0.05, D)
            rows.append((vid, v))
            vid += 1
            if i < int(n_per * dup_frac):
                rows.append((vid, v + rng.normal(0, 1e-4, D)))
                pairs.append((vid - 1, vid))
                vid += 1
    ids = np.array([r[0] for r in rows], np.int64)
    V = np.stack([r[1] for r in rows])
    return ids, V, pairs


def _ds(ids, V, nparts=1):
    df = pd.DataFrame({"vec_id": ids, "embedding": list(V)})
    ds = ray.data.from_pandas(df)
    return ds.repartition(nparts) if nparts > 1 else ds


INIT = np.eye(2, D)  # fixed centroids: the two planted axes


@pytest.mark.parametrize("nparts", [1, 3])
def test_semdedup_replica_exact(nparts):
    ids, V, pairs = _corpus()
    out = semdedup(_ds(ids, V, nparts), eps=0.01, iters=3,
                   init=INIT).to_pandas().sort_values("vec_id")
    # oracle takes the SAME clustering (centroids re-derived by the
    # deterministic kmeans; assignments read from the output)
    from graphscope_ray.stages.similarity import kmeans
    _, C, _ = kmeans(_ds(ids, V, nparts), iters=3, init=INIT)
    want = semdedup_reference(
        out["vec_id"].to_numpy(), np.stack(out["embedding"].to_numpy()),
        C, out["centroid"].to_numpy(), eps=0.01)
    got = dict(zip(out["vec_id"], out["keep"]))
    assert got == want
    # every planted near-identical pair lost (at least) one copy;
    # something was kept in both clusters
    for a, b in pairs:
        assert not (got[a] and got[b])
    assert out.groupby("centroid")["keep"].any().all()


def test_semdedup_partition_invariant():
    ids, V, _ = _corpus(seed=3)
    a = semdedup(_ds(ids, V, 1), eps=0.05, iters=2,
                 init=INIT).to_pandas().sort_values("vec_id")
    b = semdedup(_ds(ids, V, 4), eps=0.05, iters=2,
                 init=INIT).to_pandas().sort_values("vec_id")
    assert list(a["keep"]) == list(b["keep"])
    assert list(a["centroid"]) == list(b["centroid"])


def test_semdedup_keeps_farthest_from_centroid():
    # one cluster; a duplicate pair where one copy is pulled toward
    # the centroid: the farther copy must be the keeper
    base = np.zeros(D)
    base[0] = 1.0
    off = base.copy()
    off[1] = 0.4                       # far from centroid
    near = base.copy()
    near[1] = 0.38                     # its near-duplicate, more typical
    ids = np.array([0, 1, 2], np.int64)
    V = np.stack([base, off, near])
    out = semdedup(_ds(ids, V), eps=0.01, iters=0,
                   init=base[None, :]).to_pandas().set_index("vec_id")
    assert bool(out.loc[1, "keep"])            # farther copy kept
    assert not bool(out.loc[2, "keep"])        # nearer copy removed
    assert bool(out.loc[0, "keep"])


def test_semdedup_eps_monotone():
    ids, V, _ = _corpus(seed=7)
    kept = []
    for eps in (0.001, 0.05, 0.3):
        out = semdedup(_ds(ids, V), eps=eps, iters=2, init=INIT)
        kept.append(int(out.to_pandas()["keep"].sum()))
    assert kept[0] >= kept[1] >= kept[2]


def test_chunked_pair_check_matches_dense():
    # the chunked earlier-dup kernel must equal the dense triu rule at
    # every block size, including blocks smaller than the row count
    import numpy as np
    from graphscope_ray.stages.similarity import (
        _chunked_earlier_dup,
        _normalize,
    )
    rng = np.random.default_rng(7)
    V = _normalize(rng.normal(size=(97, 5)))
    tau = 0.8
    S = V @ V.T
    dense = np.triu(S >= tau, k=1).any(axis=0)
    for blk in (1, 3, 32, 96, 97, 1000, None):
        got = _chunked_earlier_dup(V, len(V), tau, block=blk)
        assert (got == dense).all(), blk
    # truncated ncheck: only the first ncheck rows are checked
    got = _chunked_earlier_dup(V, 40, tau, block=7)
    assert (got == dense[:40]).all()
