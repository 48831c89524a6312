"""Property-based checks (hypothesis) for the pure kernels, plus a
finite-difference gradient check of the minibatch-SAGE step — no Ray
needed anywhere here."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=st.sampled_from(list("abc the of# .\n-*…") + ["…"]),
    min_size=0, max_size=120)


class TestGopherProperties:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(TEXT, min_size=1, max_size=8))
    def test_keep_is_conjunction_and_counts_consistent(self, texts):
        import re

        from graphscope_ray.functions.text import gopher_rules
        s = pd.Series(texts)
        g = gopher_rules(s, min_words=1)
        rules = [c for c in g.columns if c.startswith("r_")]
        assert (g["keep"] == g[rules].all(axis=1)).all()
        want_tokens = [len(re.findall(r"\w+", t)) for t in texts]
        assert g["n_tokens"].tolist() == want_tokens

    @settings(max_examples=30, deadline=None)
    @given(TEXT)
    def test_adding_stopwords_never_lowers_stop_rule(self, t):
        from graphscope_ray.functions.text import gopher_rules
        base = gopher_rules(pd.Series([t]), min_words=0,
                            min_distinct_stopwords=2)
        more = gopher_rules(pd.Series([t + " the be of and"]),
                            min_words=0, min_distinct_stopwords=2)
        assert more.loc[0, "r_stop"] >= base.loc[0, "r_stop"]


class TestBloomProperties:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                    min_size=1, max_size=200),
           st.integers(min_value=1, max_value=6))
    def test_no_false_negatives_kernel(self, keys, k):
        from graphscope_ray.stages.sketch import BloomFilter
        m_bits = 1 << 14
        keys = np.array(keys, dtype=np.int64)
        bf = BloomFilter(np.zeros((m_bits + 63) // 64, np.uint64),
                         m_bits, k, seed=5)
        pos = bf.positions(keys).ravel()
        words = bf.words.copy()
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        full = BloomFilter(words, m_bits, k, seed=5)
        assert full.contains(keys).all()


class TestSageGradientCheck:
    def test_finite_difference_gradients(self):
        """Analytic grads of sage_minibatch_step match central finite
        differences of the (mean CE + L2) objective to 1e-6 relative —
        the strongest possible pin on the backward pass."""
        from graphscope_ray.functions.gnn import (
            ce_loss_rows,
            init_params,
            relu,
            sage_minibatch_step,
            softmax_rows,
        )

        rng = np.random.default_rng(5)
        f, h, c = 3, 4, 2
        vb = np.array([0, 1, 2], np.int64)
        v1 = np.array([0, 1, 2, 3, 4], np.int64)
        v2 = np.array([0, 1, 2, 3, 4, 5, 6], np.int64)
        arcs1 = np.array([[0, 3], [0, 4], [1, 2], [2, 0]], np.int64)
        arcs2 = np.array([[0, 5], [1, 6], [3, 1], [4, 0], [4, 6]],
                         np.int64)
        X2 = rng.standard_normal((len(v2), f))
        yb = np.array([0, 1, 0], np.int64)
        wd = 1e-3
        params = init_params(7, [2 * f, h])
        p2 = init_params(8, [2 * h, c])
        params["W2"], params["b2"] = p2["W1"], p2["b1"]

        def objective(p):
            # forward-only replica of the kernel (mean CE + L2 on Ws)
            n1, nb = len(v1), len(vb)
            M1 = np.zeros((n1, f))
            s2i = np.searchsorted(v1, arcs2[:, 0])
            d2i = np.searchsorted(v2, arcs2[:, 1])
            np.add.at(M1, s2i, X2[d2i])
            c1 = np.maximum(np.bincount(s2i, minlength=n1), 1.0)
            M1 /= c1[:, None]
            C1 = np.concatenate([X2[np.searchsorted(v2, v1)], M1], axis=1)
            H1 = relu(C1 @ p["W1"] + p["b1"])
            M0 = np.zeros((nb, h))
            s1i = np.searchsorted(vb, arcs1[:, 0])
            d1i = np.searchsorted(v1, arcs1[:, 1])
            np.add.at(M0, s1i, H1[d1i])
            c0 = np.maximum(np.bincount(s1i, minlength=nb), 1.0)
            M0 /= c0[:, None]
            C2 = np.concatenate([H1[np.searchsorted(v1, vb)], M0], axis=1)
            P = softmax_rows(C2 @ p["W2"] + p["b2"])
            ce = ce_loss_rows(P, yb).sum() / nb
            # the kernel folds wd·W into the grad (not the loss); the
            # equivalent objective term is wd/1 · ½·2 = wd·½·…  — use
            # 0.5·wd·ΣW² whose gradient is wd·W
            l2 = 0.5 * wd * ((p["W1"] ** 2).sum() + (p["W2"] ** 2).sum())
            return ce + l2

        grads, _, _ = sage_minibatch_step(
            params, X2, vb, v1, v2, arcs1, arcs2, yb, wd)
        eps = 1e-6
        for key in ("W1", "b1", "W2", "b2"):
            G = np.atleast_2d(grads[key])
            P0 = params[key]
            flatP = np.atleast_2d(P0)
            idxs = [(i, j) for i in range(flatP.shape[0])
                    for j in range(flatP.shape[1])]
            rng.shuffle(idxs)
            for (i, j) in idxs[:6]:      # spot-check 6 coords per tensor
                pp = {k: v.copy() for k, v in params.items()}
                pm = {k: v.copy() for k, v in params.items()}
                if pp[key].ndim == 1:
                    pp[key][j] += eps
                    pm[key][j] -= eps
                    g = G[0, j]
                else:
                    pp[key][i, j] += eps
                    pm[key][i, j] -= eps
                    g = G[i, j]
                fd = (objective(pp) - objective(pm)) / (2 * eps)
                assert abs(fd - g) <= 1e-6 * max(1.0, abs(g)), (
                    key, i, j, fd, g)
