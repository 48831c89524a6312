"""DSIR importance resampling: fit/weight replicas on the shared hash
kernels, partition invariance, planted-topic selection behavior."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.stages.dsir import (
    _bucket_counts,
    dsir_log_weights,
    dsir_select,
    fit_hashed_ngram_dist,
)

B = 4096


def _corpus(seed=0, n=120):
    rng = np.random.default_rng(seed)
    va = np.array(["alpha", "beta", "gamma", "delta", "epsilon"])
    vb = np.array(["zork", "quux", "fnord", "blorp", "wibble"])
    rows = []
    for i in range(n):
        vocab = va if i % 2 == 0 else vb
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, 25))})
    return pd.DataFrame(rows)


def test_fit_partition_invariant_and_replica_exact():
    df = _corpus()
    p3 = fit_hashed_ngram_dist(
        ray.data.from_pandas(df).repartition(3), n_buckets=B)
    p7 = fit_hashed_ngram_dist(
        ray.data.from_pandas(df).repartition(7), n_buckets=B)
    assert (p3 == p7).all()
    # sequential replica on the same kernel
    tot = _bucket_counts(df["text"], B)
    want = (tot + 1.0) / float(tot.sum() + B)
    assert (p3 == want).all()
    assert abs(p3.sum() - 1.0) < 1e-12


def test_weights_replica_exact_per_doc():
    df = _corpus(seed=1, n=40)
    target = df[df["doc_id"] % 2 == 0]
    pt = fit_hashed_ngram_dist(ray.data.from_pandas(target), n_buckets=B)
    pr = fit_hashed_ngram_dist(ray.data.from_pandas(df), n_buckets=B)
    got = dsir_log_weights(
        ray.data.from_pandas(df).repartition(4), pt, pr
    ).to_pandas().set_index("doc_id")["dsir_logw"]
    ratio = np.log(pt) - np.log(pr)
    for i in (0, 1, 7, 20):
        row = df[df["doc_id"] == i]["text"]
        c = _bucket_counts(row, B)
        want = float((c * ratio).sum())
        assert got[i] == pytest.approx(want, abs=1e-9)


def test_dsir_selects_target_topic():
    df = _corpus(seed=2, n=200)
    docs = ray.data.from_pandas(df).repartition(5)
    target = ray.data.from_pandas(df[df["doc_id"] % 2 == 0])
    pt = fit_hashed_ngram_dist(target, n_buckets=B)
    pr = fit_hashed_ngram_dist(docs, n_buckets=B)
    w = dsir_log_weights(docs, pt, pr)
    wdf = w.to_pandas()
    a = wdf[wdf["doc_id"] % 2 == 0]["dsir_logw"]
    b = wdf[wdf["doc_id"] % 2 == 1]["dsir_logw"]
    assert a.min() > b.max(), "target-topic docs must outscore the rest"
    picked = dsir_select(w, 40).to_pandas()
    assert len(picked) == 40
    frac_target = (picked["doc_id"] % 2 == 0).mean()
    assert frac_target > 0.9
    # deterministic: same seed -> same pick, regardless of partitioning
    w2 = dsir_log_weights(docs.repartition(9), pt, pr)
    picked2 = dsir_select(w2, 40).to_pandas()
    assert sorted(picked["doc_id"]) == sorted(picked2["doc_id"])
