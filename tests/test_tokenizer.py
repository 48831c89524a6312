"""Distributed BPE trainer vs the classic sequential reference
algorithm (Sennrich et al. 2016 pseudocode) — exact merge-sequence and
vocabulary parity, partition invariance, encode/training consistency."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.functions.tokenizer import (
    END,
    bpe_encode,
    train_bpe,
    word_frequencies,
)

CORPUS = [
    "low lower lowest low low newer newest new wider wide wide",
    "the newest gadget is the widest gadget the newest one",
    "low wide new lower the the the newer newest wide low",
    "huggable hugging hugged hug hug hugs lowest widest",
]


def _replica(word_counts: dict, num_merges: int, min_freq: int):
    vocab = {tuple(list(w) + [END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_freq:
            break
        merges.append(best)
        new = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    toks = Counter()
    for sym, c in vocab.items():
        for s in sym:
            toks[s] += c
    return merges, dict(toks)


def _want(num_merges=30, min_freq=2):
    wc = Counter()
    for t in CORPUS:
        wc.update(t.lower().split())
    return _replica(dict(wc), num_merges, min_freq)


@pytest.mark.parametrize("P", [1, 3])
def test_train_bpe_matches_reference(P):
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    ).repartition(P)
    got = train_bpe(docs, num_merges=30)
    want_merges, want_vocab = _want(30)
    assert got["merges"] == want_merges
    assert got["vocab"] == want_vocab


def test_train_bpe_min_frequency_stops():
    docs = ray.data.from_items([{"doc_id": 0, "text": "ab ab xy"}])
    got = train_bpe(docs, num_merges=10, min_frequency=2)
    # only (a,b)->ab and (ab,</w>) reach count 2; xy pairs are singletons
    assert all(m in [("a", "b"), ("ab", END)] for m in got["merges"])
    assert len(got["merges"]) == 2


def test_encode_consistent_with_training():
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)])
    model = train_bpe(docs, num_merges=25)
    out = bpe_encode(docs, model).to_pandas()
    # sum over docs == sum over the trained vocabulary's token counts
    assert int(out["bpe_tokens"].sum()) == sum(model["vocab"].values())


def test_encode_monotone_in_merges():
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)])
    counts = []
    for k in (0, 10, 30):
        model = train_bpe(docs, num_merges=k)
        out = bpe_encode(docs, model).to_pandas()
        counts.append(int(out["bpe_tokens"].sum()))
    assert counts[0] > counts[1] > counts[2]


def test_word_frequencies_exact():
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    ).repartition(2)
    got = word_frequencies(docs).to_pandas()
    wc = Counter()
    for t in CORPUS:
        wc.update(t.lower().split())
    assert dict(zip(got["word"], got["count"].astype(int))) == dict(wc)
