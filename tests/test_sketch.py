"""HyperLogLog count-distinct: register determinism across arbitrary
partitionings (the sketch is exact even when the estimate is not) and
estimate accuracy within the published error bound."""

import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.stages.sketch import (
    approx_count_distinct,
    hll_estimate,
    hll_registers,
)


def test_registers_are_set_functions():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10**12, 20000)
    a = hll_registers(vals)
    b = hll_registers(rng.permutation(vals))
    c = np.maximum(hll_registers(vals[:7000]), hll_registers(vals[7000:]))
    assert (a == b).all() and (a == c).all()


def test_estimate_accuracy():
    rng = np.random.default_rng(9)
    for n in (100, 5000, 200_000):
        vals = rng.integers(0, 10**15, n)
        true = len(np.unique(vals))
        est = hll_estimate(hll_registers(vals))
        assert abs(est - true) / true < 0.05, (n, est, true)


def test_approx_count_distinct_grouped():
    rng = np.random.default_rng(21)
    ks = rng.integers(0, 5, 60000)
    vs = rng.integers(0, 2000, 60000) + ks * 10_000  # per-key value space
    df = pd.DataFrame({"k": ks, "v": vs})
    got = approx_count_distinct(
        ray.data.from_pandas(df), ["k"], "v").to_pandas()
    got = dict(zip(got["k"], got["approx_distinct"]))
    want = df.groupby("k")["v"].nunique().to_dict()
    assert got.keys() == want.keys()
    for k, t in want.items():
        assert abs(got[k] - t) / t < 0.05, (k, got[k], t)


def test_partition_invariance_of_grouped_sketch():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 3, 30000),
                       "v": rng.integers(0, 50_000, 30000)})
    one = approx_count_distinct(
        ray.data.from_pandas(df), ["k"], "v").to_pandas()
    many = approx_count_distinct(
        ray.data.from_pandas(df).repartition(13), ["k"], "v").to_pandas()
    a = dict(zip(one["k"], one["approx_distinct"]))
    b = dict(zip(many["k"], many["approx_distinct"]))
    assert a == b  # identical registers -> identical estimates


def test_approx_top_k_heavy_hitters():
    """Zipf-ish stream: exact when capacity covers the vocabulary;
    under tight capacity every true heavy hitter survives and the
    estimates stay within the n/capacity MG bound."""
    rng = np.random.default_rng(17)
    vals = rng.zipf(1.3, 80_000) % 997  # skewed, bounded vocab
    df = pd.DataFrame({"v": vals})
    true = df["v"].value_counts()

    from graphscope_ray.stages.sketch import approx_top_k

    exact = approx_top_k(ray.data.from_pandas(df).repartition(9),
                         "v", k=10, capacity=2000).to_pandas()
    want = true.iloc[:10]
    assert list(exact["v"]) and len(exact) == 10
    assert dict(zip(exact["v"], exact["estimate"])) \
        == {int(i): int(c) for i, c in want.items()}

    tight = approx_top_k(ray.data.from_pandas(df).repartition(9),
                         "v", k=10, capacity=64).to_pandas()
    est = dict(zip(tight["v"], tight["estimate"]))
    bound = len(df) / 64
    for v, e in est.items():
        assert true[v] - bound <= e <= true[v], v
    # the undisputed heavy hitters (freq >> n/capacity) must be present
    for v, c in true.items():
        if c > 2 * bound:
            assert v in est, (v, c)


def test_frequent_ngrams_exact_when_capacity_large():
    from graphscope_ray.stages.sketch import frequent_ngrams

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "all rights reserved all rights reserved",
            "some prose then all rights reserved",
            "all rights reserved",
            "completely different words here",
        ],
    })
    # k >= distinct trigram count: the k-boundary tie-break is by
    # hash (deterministic, documented), so exactness is asserted on
    # the complete set where ordering is (estimate desc, ngram asc)
    got = frequent_ngrams(
        ray.data.from_pandas(docs).repartition(3), n=3, k=100,
        capacity=10_000).to_pandas()
    # replica: count doc-local word trigrams
    from collections import Counter
    c = Counter()
    for t in docs["text"]:
        w = t.lower().split()
        for i in range(len(w) - 2):
            c[" ".join(w[i:i + 3])] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(got["ngram"], got["estimate"])) == want
    assert got.iloc[0]["ngram"] == "all rights reserved"
    assert got.iloc[0]["estimate"] == 4


def test_frequent_ngrams_never_crosses_docs():
    from graphscope_ray.stages.sketch import frequent_ngrams

    docs = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["alpha beta", "gamma delta"],
    })
    got = frequent_ngrams(ray.data.from_pandas(docs), n=2, k=10,
                          capacity=100).to_pandas()
    assert "beta gamma" not in set(got["ngram"])
    assert set(got["ngram"]) == {"alpha beta", "gamma delta"}


class TestApproxQuantiles:
    def test_accuracy_and_determinism(self):
        from graphscope_ray.stages.sketch import approx_quantiles
        n = 50_000
        rng = np.random.default_rng(3)
        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                           "x": rng.normal(100.0, 15.0, n)})
        qs = [0.1, 0.5, 0.9]
        a = approx_quantiles(ray.data.from_pandas(df), "x", qs)
        b = approx_quantiles(ray.data.from_pandas(df).repartition(7),
                             "x", qs)
        assert a == b                       # partition-invariant
        exact = np.quantile(df["x"], qs)
        ranks = np.searchsorted(np.sort(df["x"].to_numpy()),
                                [a[q] for q in qs]) / n
        # DKW at k=4096: ±2.1% rank error at 95%; allow 4%
        assert np.all(np.abs(ranks - np.asarray(qs)) < 0.04), (ranks, exact)

    def test_small_input_is_exact_sample(self):
        from graphscope_ray.stages.sketch import approx_quantiles
        df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                           "x": np.arange(10, dtype=np.float64)})
        got = approx_quantiles(ray.data.from_pandas(df), "x",
                               [0.0, 0.5, 1.0])
        assert got[0.0] == 0.0 and got[1.0] == 9.0
        assert got[0.5] == 5.0              # lower interpolation


class TestBloom:
    def _keys(self, n, seed):
        rng = np.random.default_rng(seed)
        return np.array([f"doc-{i}-{rng.integers(1 << 30)}"
                         for i in range(n)], dtype=object)

    def test_no_false_negatives(self):
        from graphscope_ray.stages.sketch import bloom_build
        keys = self._keys(5000, 1)
        ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(5)
        bf = bloom_build(ds, "k", m_bits=1 << 18, k=4)
        assert bf.contains(keys).all()

    def test_fp_rate_bounded(self):
        from graphscope_ray.stages.sketch import bloom_build
        keys = self._keys(5000, 2)
        fresh = self._keys(5000, 3)
        ds = ray.data.from_pandas(pd.DataFrame({"k": keys}))
        bf = bloom_build(ds, "k", m_bits=1 << 20, k=4)
        fp = bf.contains(fresh).mean()
        # n/m = 5e3/1e6 -> theoretical fp ~ (1-e^(-4*5000/2^20))^4 ~ 1e-7
        assert fp < 0.01

    def test_partition_invariance(self):
        from graphscope_ray.stages.sketch import bloom_build
        keys = self._keys(2000, 4)
        words = []
        for p in (1, 7):
            ds = ray.data.from_pandas(
                pd.DataFrame({"k": keys})).repartition(p)
            words.append(bloom_build(ds, "k", m_bits=1 << 16, k=3).words)
        assert np.array_equal(words[0], words[1])

    def test_bloom_new_rows_incremental_dedup(self):
        from graphscope_ray.stages.sketch import bloom_build, bloom_new_rows
        seen = self._keys(3000, 5)
        new = self._keys(3000, 6)
        bf = bloom_build(
            ray.data.from_pandas(pd.DataFrame({"k": seen})), "k",
            m_bits=1 << 20, k=4)
        mixed = pd.DataFrame({
            "k": np.concatenate([seen[:500], new]),
            "row": np.arange(3500, dtype=np.int64)})
        out = bloom_new_rows(
            ray.data.from_pandas(mixed).repartition(4), bf, "k"
        ).to_pandas()
        # every genuinely-seen row dropped (no false negatives)...
        assert not np.isin(out["k"].to_numpy(object), seen).any()
        # ...and nearly all new rows survive (fp rate tiny at this m)
        assert len(out) >= 2970
