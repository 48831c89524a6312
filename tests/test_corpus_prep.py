"""The composed corpus-preparation pipeline (pipelines/corpus_prep):
stage interplay contracts on a corpus with real duplication,
boilerplate, PII, short docs and a benchmark quote. The sf-data twin
parity lives in test_entry_contract.test_corpus_prep_gate_twins_small;
here the DEFAULT newline-span path (which the gate can't exercise —
its corpus has no newlines) is pinned."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines.corpus_prep import prepare_corpus

BOILER = "subscribe to our newsletter today"
PII_LINE = "mail bob@corp.example or visit https://x.y"


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    vocab = np.array([f"w{k}" for k in range(200)])
    rows = []
    for i in range(200):
        body = " ".join(rng.choice(vocab, 30))
        para2 = BOILER if i % 3 == 0 else " ".join(rng.choice(vocab, 8))
        text = body + "\n" + para2 + "\n" + PII_LINE
        if i % 17 == 3:
            text = "tiny doc"              # < 20 tokens -> filtered
        if i % 23 == 0 and i > 1:
            text = rows[1]["text"]         # full copy of doc 1
        rows.append({"doc_id": i, "text": text})
    return rows


def test_prepare_corpus_stage_interplay(corpus):
    docs = ray.data.from_pandas(pd.DataFrame(corpus))
    bench = ray.data.from_items(
        [{"doc_id": 10_000,
          "text": "\n".join(corpus[5]["text"].split("\n")[:2])}])
    out = prepare_corpus(docs, benchmark=bench, min_tokens=20).to_pandas()
    ids = set(out["doc_id"])

    # decontamination: the benchmark-quoted doc is gone
    assert 5 not in ids
    # token filter: every short doc is gone
    assert all(i not in ids for i in range(3, 200, 17))
    # full duplicates deflate to '' via span dedup (every span's first
    # occurrence is elsewhere); exact dedup keeps ONE empty survivor
    dups = [i for i in range(23, 200, 23)]
    keepers = [i for i in dups if i in ids]
    assert keepers == [min(dups)]
    krow = out[out["doc_id"] == min(dups)].iloc[0]
    assert krow["text"] == "" and krow["n_tokens"] == 0 \
        and krow["removed_spans"] == 3
    assert 1 in ids
    # PII scrubbed everywhere; the shared scrubbed PII line survives
    # span dedup exactly once (first occurrence)
    assert not out["text"].str.contains("bob@corp", regex=False).any()
    assert (out["text"].str.contains("<EMAIL>", regex=False)).sum() == 1
    # boilerplate paragraph survives exactly once
    assert (out["text"].str.contains(BOILER, regex=False)).sum() == 1
    assert (out["removed_spans"] > 0).sum() > 100
    assert set(out["split"]) <= {"train", "val", "test"}

    # bit-identical re-run: the lazy chain is deterministic
    out2 = prepare_corpus(docs, benchmark=bench, min_tokens=20).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_normalize_keep_newlines():
    from graphscope_ray.stages.textprep import normalize_text

    docs = ray.data.from_items([
        {"doc_id": 0, "text": "a  b\t c \n\n  d e \n f́  "},
        {"doc_id": 1, "text": "  \n x \x01y \n "},
    ])
    got = dict(zip(*(lambda d: (d["doc_id"], d["text"]))(
        normalize_text(docs, keep_newlines=True).to_pandas())))
    # horizontal runs -> one space, newline-containing runs -> one \n,
    # control chars stripped, edges trimmed (f+combining acute has no
    # precomposed form, so NFC keeps the two codepoints)
    assert got[0] == "a b c\nd e\nf́"
    assert got[1] == "x y"
