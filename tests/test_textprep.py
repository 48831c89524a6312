"""Text-prep stages (scrub/normalize/chunk/pack/bigram-LM) vs DuckDB
regexp twins and pure-python oracles."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.stages.textprep import (
    PII_RULES,
    chunk_documents,
    normalize_text,
    pack_sequences,
    score_bigram_lm,
    scrub_pii,
    train_bigram_lm,
)


def _ds(df):
    return ray.data.from_pandas(df).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")


PII_DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3],
    "text": [
        "mail me at alice.smith+x@example.co.uk or bob@test.org today",
        "see https://example.com/a?b=c#d and http://x.io, server 10.0.255.3",
        "call +1 (415) 555-0199 now; backup 020-7946-0958.",
        "nothing sensitive here at all",
    ],
})


def test_scrub_pii_matches_duckdb_regexp_chain():
    out = scrub_pii(_ds(PII_DOCS)).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("docs", PII_DOCS)
    expr = "text"
    for _, pat, rep in PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    want = con.execute(
        f"SELECT doc_id, {expr} AS text FROM docs ORDER BY doc_id"
    ).df()
    assert list(out["text"]) == list(want["text"])
    assert out["pii_email"].tolist() == [2, 0, 0, 0]
    assert out["pii_url"].tolist() == [0, 2, 0, 0]
    assert out["pii_ipv4"].tolist() == [0, 1, 0, 0]
    assert out.loc[out["doc_id"] == 2, "pii_phone"].iloc[0] >= 2
    # no raw PII survives
    joined = " ".join(out["text"])
    assert "@" not in joined and "http" not in joined


def test_normalize_text_nfc_whitespace():
    df = pd.DataFrame({"doc_id": [0, 1], "text": [
        "a\u0301bc   d\te\n\nf\x07g",  # combining acute -> NFC \u00e1
        "  already clean ",
    ]})
    out = normalize_text(_ds(df)).to_pandas().sort_values("doc_id")
    # NFC composition + collapsed whitespace + control strip + trim
    assert out["text"].iloc[0] == "\u00e1bc d e fg"
    assert out["text"].iloc[1] == "already clean"


def _chunk_oracle(text, max_tokens, overlap):
    toks = text.split()
    stride = max_tokens - overlap
    out = []
    for c, s in enumerate(range(0, len(toks), stride)):
        w = toks[s: s + max_tokens]
        if c > 0 and s >= len(toks):
            break
        out.append((c, " ".join(w), len(w)))
    return out


@pytest.mark.parametrize("overlap", [0, 2])
def test_chunk_documents(overlap):
    texts = ["w%d" % i for i in range(23)]
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [" ".join(texts), " ".join(texts[:3]), ""],
    })
    out = chunk_documents(_ds(df), max_tokens=8, overlap=overlap).to_pandas()
    for did, text in zip(df["doc_id"], df["text"]):
        want = _chunk_oracle(text, 8, overlap) if text else []
        got = (out[out["doc_id"] == did]
               .sort_values("chunk_id")[["chunk_id", "text", "n_tokens"]]
               .to_records(index=False).tolist())
        assert got == want, (did, got, want)


def test_pack_sequences_greedy_bins():
    df = pd.DataFrame({"doc_id": np.arange(6),
                       "n_tokens": [900, 700, 600, 400, 300, 5000]})
    out = pack_sequences(_ds(df), seq_len=1024).to_pandas()
    by_pack = out.groupby("pack_id")
    sizes = {frozenset(g["doc_id"]): g["n_tokens"].sum()
             for _, g in by_pack}
    # no pack over seq_len except the oversized doc alone
    for docs, tot in sizes.items():
        if 5 in docs:
            assert docs == frozenset({5})
        else:
            assert tot <= 1024
    # first-fit-decreasing on these sizes: {900}, {700,300}, {600,400}
    assert frozenset({1, 4}) in {frozenset(d) for d in
                                 (g["doc_id"].tolist() for _, g in by_pack)}
    # offsets are disjoint within packs
    for _, g in by_pack:
        g = g.sort_values("pack_offset")
        ends = (g["pack_offset"] + g["n_tokens"]).to_numpy()
        assert (g["pack_offset"].to_numpy()[1:] >= ends[:-1]).all()
    # determinism
    out2 = pack_sequences(_ds(df), seq_len=1024).to_pandas()
    assert out.sort_values("doc_id")["pack_id"].tolist() == \
        out2.sort_values("doc_id")["pack_id"].tolist()


def _concat_chunk_oracle(docs: dict, L: int, eos=None) -> dict:
    stream, dstream = [], []
    for d in sorted(docs):
        ts = docs[d].split()
        if eos is not None:
            ts = ts + [eos]
        stream += ts
        dstream += [d] * len(ts)
    return {s // L: (" ".join(stream[s:s + L]),
                     len(stream[s:s + L]),
                     len(set(dstream[s:s + L])))
            for s in range(0, len(stream), L)}


@pytest.mark.parametrize("L,eos,P", [(16, None, 1), (16, "</s>", 4),
                                     (7, None, 3)])
def test_concat_and_chunk_matches_replica(L, eos, P):
    from graphscope_ray.stages.textprep import concat_and_chunk

    rng = np.random.default_rng(7)
    docs = {int(i): " ".join(f"w{rng.integers(0, 50)}"
                             for _ in range(int(rng.integers(0, 40))))
            for i in range(60)}
    df = pd.DataFrame({"doc_id": np.array(sorted(docs), np.int64),
                       "text": [docs[d] for d in sorted(docs)]})
    want = _concat_chunk_oracle(docs, L, eos)
    got = (concat_and_chunk(_ds(df).repartition(P), seq_len=L, eos=eos)
           .to_pandas().set_index("seq_id").sort_index())
    assert len(got) == len(want)
    for s, w in want.items():
        row = got.loc[s]
        assert (row["text"], int(row["n_tokens"]),
                int(row["n_docs"])) == w


def test_concat_and_chunk_doc_crossing_and_tail():
    from graphscope_ray.stages.textprep import concat_and_chunk

    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], np.int64),
        "text": ["a b c d e", "f g h", "i"],   # 9 tokens, L=4
    })
    got = (concat_and_chunk(_ds(df), seq_len=4)
           .to_pandas().set_index("seq_id").sort_index())
    assert got.loc[0, "text"] == "a b c d" and got.loc[0, "n_docs"] == 1
    # doc 1 crosses into seq 1 alongside doc 2
    assert got.loc[1, "text"] == "e f g h" and got.loc[1, "n_docs"] == 2
    # kept partial tail
    assert (got.loc[2, "text"], int(got.loc[2, "n_tokens"])) == ("i", 1)


def test_bigram_lm_train_score_vs_pure_python():
    docs = pd.DataFrame({"doc_id": [0, 1, 2], "text": [
        "the cat sat on the mat",
        "the cat ate the fish",
        "zz qq zz",
    ]})
    model = train_bigram_lm(_ds(docs))
    # oracle counts
    uni, bi = {}, {}
    for t in docs["text"]:
        ws = t.lower().split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    assert model["unigram"] == uni
    assert model["bigram"] == {f"{a} {b}": n for (a, b), n in bi.items()}
    scored = score_bigram_lm(_ds(docs), model).to_pandas().sort_values("doc_id")
    V = len(uni)

    def bits(text):
        ws = text.lower().split()
        vals = [-math.log2((bi.get((a, b), 0) + 1) / (uni.get(a, 0) + V))
                for a, b in zip(ws, ws[1:])]
        return sum(vals) / len(vals)

    for did, t in zip(docs["doc_id"], docs["text"]):
        got = scored.loc[scored["doc_id"] == did, "lm_bits_per_token"].iloc[0]
        assert got == pytest.approx(bits(t), rel=1e-12)
    # the in-distribution docs score lower than the outlier
    assert scored["lm_bits_per_token"].iloc[0] < scored["lm_bits_per_token"].iloc[2]


class TestNtileAndPerplexityBuckets:
    def test_ntile_matches_duckdb_window(self):
        import duckdb

        from graphscope_ray.stages.relational import global_ntile
        n = 103                                  # uneven: n % B != 0
        df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                           "score": np.arange(n)[::-1].astype(np.float64)})
        for nparts in (1, 5):
            ds = ray.data.from_pandas(df)
            if nparts > 1:
                ds = ds.repartition(nparts)
            got = (global_ntile(ds, ["score", "id"], 4).to_pandas()
                   .sort_values("id").reset_index(drop=True))
            want = duckdb.sql(
                "SELECT id, ntile(4) OVER (ORDER BY score, id)::BIGINT "
                "AS bucket FROM df").df().sort_values("id"
                                                      ).reset_index(drop=True)
            assert list(got["bucket"]) == list(want["bucket"])

    def test_ntile_fewer_rows_than_buckets(self):
        from graphscope_ray.stages.relational import global_ntile
        df = pd.DataFrame({"id": np.array([5, 3], np.int64)})
        got = (global_ntile(ray.data.from_pandas(df), ["id"], 4)
               .to_pandas().sort_values("id"))
        assert list(got["bucket"]) == [1, 2]     # ntile: one row each

    def test_perplexity_buckets_head_is_fluent(self):
        from graphscope_ray.stages.textprep import (
            perplexity_buckets,
            train_bigram_lm,
        )
        fluent = ["the cat sat on the mat"] * 8
        weird = ["zq xv qq kj zz pw"] * 4
        df = pd.DataFrame({
            "doc_id": np.arange(12, dtype=np.int64),
            "text": fluent + weird})
        ds = ray.data.from_pandas(df).repartition(3)
        model = train_bigram_lm(ds)
        out = perplexity_buckets(ds, model, n_buckets=3).to_pandas()
        by_id = out.set_index("doc_id")
        # the repeated in-distribution sentence fills the head buckets;
        # the gibberish docs land strictly in the worst bucket
        assert set(by_id.loc[8:, "ppl_bucket"]) == {3}
        assert (by_id.loc[:7, "ppl_bucket"] < 3).all()
        # equal-population contract
        assert out["ppl_bucket"].value_counts().max() == 4


class TestGopherRules:
    """Gopher quality-rule filter (Rae et al. 2021 §A1.1) kernel."""

    def test_rule_booleans(self):
        from graphscope_ray.functions.text import gopher_rules
        s = pd.Series([
            "the data of be to and that have with join " * 6,  # clean
            "x",                                    # too short, no stops
            "",                                     # empty
            "- the be\n- of and\n- that have",      # all bullet lines
            "the be aaa bbb " * 20,                 # repeated bigrams
            "the be of ... and that ...\nhave with ...",  # ellipsis
        ])
        g = gopher_rules(s, min_words=5)
        assert bool(g.loc[0, "keep"])
        assert not bool(g.loc[1, "r_words"]) and not bool(g.loc[1, "keep"])
        assert not bool(g.loc[2, "r_alpha"]) and g.loc[2, "n_tokens"] == 0
        assert not bool(g.loc[3, "r_bullet"])
        assert not bool(g.loc[4, "r_top_bigram"])
        assert not bool(g.loc[5, "r_ellipsis"])

    def test_symbol_and_stopword_rules(self):
        from graphscope_ray.functions.text import gopher_rules
        hashy = "the be " + "# " * 20
        nostop = "alpha beta gamma delta epsilon " * 4
        g = gopher_rules(pd.Series([hashy, nostop]), min_words=2)
        assert not bool(g.loc[0, "r_symbol"])
        assert bool(g.loc[0, "r_stop"])      # 'the','be' distinct >= 2
        assert not bool(g.loc[1, "r_stop"])

    def test_mean_word_length_bounds(self):
        from graphscope_ray.functions.text import gopher_rules
        longwords = "the be " + "supercalifragilistic " * 30
        shortwords = "the be " + "a b c d e f g h " * 10
        g = gopher_rules(pd.Series([longwords, shortwords]), min_words=2)
        assert not bool(g.loc[0, "r_mean_len"])
        assert not bool(g.loc[1, "r_mean_len"])
