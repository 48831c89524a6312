"""BM25 / TF-IDF / document-frequency ranking ops vs brute pandas."""

import math
import re

import numpy as np
import pandas as pd
import ray.data


def _corpus(n=60, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["join", "window", "stream", "batch", "merge", "sort",
             "data", "the", "filter", "key"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _brute_bm25(df, terms, k1=1.2, b=0.75):
    terms = sorted({t.lower() for t in terms})
    toks = [re.findall(r"\w+", t.lower()) for t in df["text"]]
    dl = np.array([len(t) for t in toks], dtype=float)
    n = len(df)
    avgdl = dl.sum() / n
    scores = np.zeros(n)
    for t in terms:
        tf = np.array([doc.count(t) for doc in toks], dtype=float)
        dfreq = (tf > 0).sum()
        idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        scores += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))
    return pd.DataFrame({"doc_id": df["doc_id"], "dl": dl.astype(np.int64),
                         "score": scores})


class TestBM25:
    def test_scores_match_brute(self):
        from graphscope_ray.stages.ranking import bm25_scores
        df = _corpus()
        terms = ["join", "stream", "window"]
        got = (bm25_scores(ray.data.from_pandas(df).repartition(5), terms)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = _brute_bm25(df, terms)
        want = want[want["score"] > 0].reset_index(drop=True)
        assert len(got) == len(want)
        assert np.array_equal(got["doc_id"].to_numpy(),
                              want["doc_id"].to_numpy())
        assert np.allclose(got["score"], want["score"], atol=1e-12)

    def test_partition_invariance(self):
        from graphscope_ray.stages.ranking import bm25_scores
        df = _corpus(40, seed=11)
        outs = []
        for p in (1, 7):
            ds = ray.data.from_pandas(df).repartition(p)
            outs.append(bm25_scores(ds, ["merge", "sort"])
                        .to_pandas().sort_values("doc_id")
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_topk_order_and_tiebreak(self):
        from graphscope_ray.stages.ranking import bm25_topk
        df = _corpus(50, seed=3)
        got = bm25_topk(ray.data.from_pandas(df).repartition(4),
                        ["join"], k=5).to_pandas()
        want = _brute_bm25(df, ["join"])
        want = (want[want["score"] > 0]
                .sort_values(["score", "doc_id"], ascending=[False, True])
                .head(5).reset_index(drop=True))
        assert np.array_equal(got["doc_id"].to_numpy(),
                              want["doc_id"].to_numpy())
        assert np.allclose(got["score"], want["score"], atol=1e-12)

    def test_query_terms_dedup_and_case(self):
        from graphscope_ray.stages.ranking import bm25_scores
        df = _corpus(20, seed=5)
        a = bm25_scores(ray.data.from_pandas(df), ["Join", "join"]) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = bm25_scores(ray.data.from_pandas(df), ["join"]) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestTfidf:
    def test_matches_brute(self):
        from graphscope_ray.stages.ranking import tfidf_scores
        df = _corpus(30, seed=9)
        terms = sorted(["batch", "key"])
        got = (tfidf_scores(ray.data.from_pandas(df).repartition(3), terms)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        toks = [re.findall(r"\w+", t.lower()) for t in df["text"]]
        n = len(df)
        s = np.zeros(n)
        hit = np.zeros(n, dtype=bool)
        for t in terms:
            tf = np.array([d.count(t) for d in toks], dtype=float)
            dfreq = (tf > 0).sum()
            s += tf * (math.log((1.0 + n) / (1.0 + dfreq)) + 1.0)
            hit |= tf > 0
        want = pd.DataFrame({"doc_id": df["doc_id"], "score": s})[hit] \
            .reset_index(drop=True)
        assert len(got) == len(want)
        assert np.allclose(got["score"], want["score"], atol=1e-12)


class TestDocumentFrequency:
    def test_matches_pandas(self):
        from graphscope_ray.stages.ranking import document_frequency
        df = _corpus(25, seed=13)
        got = (document_frequency(ray.data.from_pandas(df).repartition(4))
               .to_pandas().sort_values("token").reset_index(drop=True))
        want = (df["text"].str.lower().str.findall(r"\w+").apply(set)
                .explode().value_counts().rename_axis("token")
                .reset_index(name="df").sort_values("token")
                .reset_index(drop=True))
        assert np.array_equal(got["token"].to_numpy(object),
                              want["token"].to_numpy(object))
        assert np.array_equal(got["df"].to_numpy(np.int64),
                              want["df"].to_numpy(np.int64))


class TestEdgeCases:
    def test_empty_and_all_empty_corpus(self):
        from graphscope_ray.stages.ranking import bm25_scores
        empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                              "text": np.empty(0, object)})
        out = bm25_scores(ray.data.from_pandas(empty), ["x"]).to_pandas()
        assert len(out) == 0
        blank = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                              "text": ["", "", ""]})
        out2 = bm25_scores(ray.data.from_pandas(blank), ["x"]).to_pandas()
        assert len(out2) == 0

    def test_term_absent_from_corpus(self):
        from graphscope_ray.stages.ranking import bm25_scores
        df = _corpus(10, seed=2)
        out = (bm25_scores(ray.data.from_pandas(df),
                           ["zzznotaword", "join"])
               .to_pandas())
        want = _brute_bm25(df, ["join", "zzznotaword"])
        want = want[want["score"] > 0]
        assert len(out) == len(want)
        assert np.allclose(np.sort(out["score"]), np.sort(want["score"]),
                           atol=1e-12)
