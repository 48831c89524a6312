"""Oracles for paragraph-level exact dedup (C4-style span removal) and
the distributed logistic-regression quality classifier."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from graphscope_ray.functions.classifier import score_logreg, train_logreg
from graphscope_ray.stages.dedup import paragraph_dedup

# ------------------------------------------------------------------
# paragraph dedup
# ------------------------------------------------------------------

BANNER = "accept all cookies to continue"
LICENSE = "licensed under the apache license version two"


def _docs():
    return pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            BANNER + "\nunique alpha body\n" + LICENSE,
            BANNER + "\nunique beta body",
            "unique gamma body\n" + LICENSE + "\n" + BANNER,
            "wholly original document with no shared lines",
            "a\n\nb",  # empty middle span must survive
        ],
    })


def _replica(df: pd.DataFrame, sep="\n"):
    """First-occurrence-wins span dedup, pure python."""
    seen = {}
    out = []
    for _, row in df.sort_values("doc_id").iterrows():
        parts = row["text"].split(sep)
        kept = []
        removed = 0
        for i, p in enumerate(parts):
            if p == "":
                kept.append(p)
                continue
            if p in seen and seen[p] != (row["doc_id"], i):
                removed += 1
            else:
                seen.setdefault(p, (row["doc_id"], i))
                kept.append(p)
        out.append((row["doc_id"], sep.join(kept), removed))
    return pd.DataFrame(out, columns=["doc_id", "text", "removed_spans"])


def test_paragraph_dedup_matches_replica():
    df = _docs()
    got = (paragraph_dedup(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _replica(df).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "text", "removed_spans"]].astype(
            {"removed_spans": np.int64}),
        want.astype({"removed_spans": np.int64}))


def test_paragraph_dedup_partition_invariant():
    df = _docs()
    one = (paragraph_dedup(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    many = (paragraph_dedup(ray.data.from_pandas(df).repartition(4))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)


def test_paragraph_dedup_keeps_first_occurrence_only():
    df = _docs()
    got = (paragraph_dedup(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # banner survives only in doc 0; license only in doc 0
    assert BANNER in got.loc[0, "text"]
    assert LICENSE in got.loc[0, "text"]
    assert BANNER not in got.loc[1, "text"]
    assert LICENSE not in got.loc[2, "text"]
    assert BANNER not in got.loc[2, "text"]
    assert got.loc[3, "removed_spans"] == 0
    # empty span preserved verbatim
    assert got.loc[4, "text"] == "a\n\nb"


def test_paragraph_dedup_all_removed_doc():
    df = pd.DataFrame({
        "doc_id": np.array([1, 2], np.int64),
        "text": ["same line", "same line"],
    })
    got = (paragraph_dedup(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "text"] == "same line"
    assert got.loc[1, "text"] == ""
    assert got.loc[1, "removed_spans"] == 1


# ------------------------------------------------------------------
# exact substring (k-token window) dedup
# ------------------------------------------------------------------

PHRASE = "the quick brown fox jumps over the lazy dog again and again"


def _substr_replica(docs: dict, k: int) -> dict:
    """Sequential reference: first occurrence of each k-token window
    (lexicographic (doc, start)) kept; tokens covered by any later
    occurrence removed."""
    toks = {d: t.split() for d, t in docs.items()}
    occ: dict = {}
    for d in sorted(toks):
        ts = toks[d]
        for s in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[s:s + k]), []).append((d, s))
    cut = {d: set() for d in toks}
    for places in occ.values():
        if len(places) > 1:
            for d, s in sorted(places)[1:]:
                cut[d].update(range(s, s + k))
    return {d: (" ".join(t for i, t in enumerate(ts)
                         if i not in cut[d]),
                sum(1 for i in range(len(ts)) if i in cut[d]))
            for d, ts in toks.items()}


def _substr_docs() -> dict:
    return {
        1: "alpha beta " + PHRASE + " gamma delta epsilon zeta",
        2: "unrelated words entirely here nothing repeats in this one",
        3: "prefix words " + PHRASE + " suffix tail words here",
        4: "short doc",
        5: "x y z " + PHRASE + " q r s",
        6: "",
        7: "aa bb cc dd aa bb cc dd aa bb cc dd ee",  # self-repeat
    }


@pytest.mark.parametrize("P", [1, 3])
def test_substring_dedup_matches_replica(P):
    from graphscope_ray.stages.dedup import substring_dedup

    docs, k = _substr_docs(), 8
    want = _substr_replica(docs, k)
    df = pd.DataFrame({
        "doc_id": np.array(sorted(docs), np.int64),
        "text": [docs[d] for d in sorted(docs)]})
    got = (substring_dedup(ray.data.from_pandas(df).repartition(P), k=k)
           .to_pandas().set_index("doc_id").sort_index())
    for d in sorted(docs):
        assert (got.loc[d, "text"],
                int(got.loc[d, "removed_tokens"])) == want[d]


def test_substring_dedup_self_repeat_and_short_docs():
    from graphscope_ray.stages.dedup import substring_dedup

    df = pd.DataFrame({
        "doc_id": np.array([1, 2], np.int64),
        "text": ["p q r s p q r s p q r s",   # period-4 run, 12 toks
                 "tiny"],
    })
    got = (substring_dedup(ray.data.from_pandas(df), k=4)
           .to_pandas().set_index("doc_id").sort_index())
    # windows (p q r s)… first at 0 kept; occurrences at 4 and 8 cut
    # tokens 4..11 → first 4 tokens survive
    assert got.loc[1, "text"] == "p q r s"
    assert got.loc[1, "removed_tokens"] == 8
    assert got.loc[2, "text"] == "tiny"
    assert got.loc[2, "removed_tokens"] == 0


def test_substring_dedup_whole_doc_duplicate():
    from graphscope_ray.stages.dedup import substring_dedup

    text = "one two three four five six seven eight"
    df = pd.DataFrame({"doc_id": np.array([3, 9], np.int64),
                       "text": [text, text]})
    got = (substring_dedup(ray.data.from_pandas(df), k=8)
           .to_pandas().set_index("doc_id").sort_index())
    assert got.loc[3, "text"] == text
    assert got.loc[9, "text"] == "" and got.loc[9, "removed_tokens"] == 8


# ------------------------------------------------------------------
# logistic regression
# ------------------------------------------------------------------

def _labeled(n=400, d=3, seed=13):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)) * np.array([1.0, 5.0, 0.2])
    w_true = np.array([2.0, -0.5, 4.0])
    p = 1.0 / (1.0 + np.exp(-(X @ w_true + 0.3)))
    y = (rng.random(n) < p).astype(np.int64)
    df = pd.DataFrame(X, columns=["f0", "f1", "f2"])
    df["doc_id"] = np.arange(n, dtype=np.int64)
    df["label"] = y
    return df


def _replica_train(df, cols, iters, lr, l2=0.0):
    X = df[cols].to_numpy(np.float64)
    y = df["label"].to_numpy(np.float64)
    mean, std = X.mean(axis=0), X.std(axis=0)
    std = np.where(std > 0, std, 1.0)
    Xs = (X - mean) / std
    w = np.zeros(len(cols))
    b = 0.0
    n = len(df)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        r = p - y
        w = w - lr * (Xs.T @ r / n + l2 * w)
        b = b - lr * r.sum() / n
    w_raw = w / std
    return w_raw, b - float(mean @ w_raw)


def test_logreg_matches_replica():
    df = _labeled()
    cols = ["f0", "f1", "f2"]
    ds = ray.data.from_pandas(df).repartition(5)
    m = train_logreg(ds, cols, "label", iters=60, lr=1.0)
    rw, rb = _replica_train(df, cols, 60, 1.0)
    assert np.allclose(m["w"], rw, atol=1e-9)
    assert m["b"] == pytest.approx(rb, abs=1e-9)


def test_logreg_deterministic_and_learns():
    df = _labeled(seed=29)
    cols = ["f0", "f1", "f2"]
    ds = ray.data.from_pandas(df).repartition(3)
    m1 = train_logreg(ds, cols, "label", iters=80)
    m2 = train_logreg(ds, cols, "label", iters=80)
    assert np.array_equal(m1["w"], m2["w"]) and m1["b"] == m2["b"]
    scored = score_logreg(ds, m1).to_pandas()
    acc = ((scored["quality_prob"] > 0.5).astype(int)
           == scored["label"]).mean()
    assert acc > 0.8  # labels are Bernoulli draws — Bayes error > 0


def test_logreg_scores_are_sigmoid_of_raw_features():
    df = _labeled(n=50, seed=3)
    cols = ["f0", "f1", "f2"]
    ds = ray.data.from_pandas(df)
    m = train_logreg(ds, cols, "label", iters=20)
    got = score_logreg(ds, m).to_pandas().sort_values("doc_id")
    z = df[cols].to_numpy() @ m["w"] + m["b"]
    assert np.allclose(got["quality_prob"].to_numpy(),
                       1.0 / (1.0 + np.exp(-z)), atol=1e-12)


def test_logreg_l2_shrinks_weights():
    df = _labeled(seed=41)
    cols = ["f0", "f1", "f2"]
    ds = ray.data.from_pandas(df)
    m0 = train_logreg(ds, cols, "label", iters=50, l2=0.0)
    m1 = train_logreg(ds, cols, "label", iters=50, l2=1.0)
    assert np.linalg.norm(m1["w"]) < np.linalg.norm(m0["w"])
