"""Stage-level tests: dedup family, similarity, text kernels, relational
operators, multimodal plumbing — vs numpy/pandas/duckdb oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from graphscope_ray.functions.text import lang_id, quality_features, token_counts
from graphscope_ray.stages.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_table,
    verify_jaccard,
)
from graphscope_ray.stages.multimodal import attach_media_meta, decode_images
from graphscope_ray.stages.relational import (
    broadcast_lookup_join,
    broadcast_semi_join,
    dedup_first,
    topk,
    unfold,
)
from graphscope_ray.stages.similarity import brute_force_topk, ivf_build, ivf_topk


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(40):
        words = list(rng.choice(vocab, size=60))
        rows.append((i, " ".join(words)))
    # planted exact dup of doc 0 and near-dup of doc 1 (2 words changed)
    rows.append((100, rows[0][1]))
    near = rows[1][1].split()
    near[5], near[25] = "changed", "words"
    rows.append((101, " ".join(near)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_dedup(docs_df):
    out = exact_dedup(ray.data.from_pandas(docs_df)).to_pandas()
    assert len(out) == len(docs_df) - 1          # one exact dup removed
    assert 0 in set(out["doc_id"]) and 100 not in set(out["doc_id"])  # min id kept


def test_minhash_near_dup(docs_df):
    pairs = minhash_lsh_pairs(
        ray.data.from_pandas(docs_df), num_perm=64, bands=32
    ).to_pandas()
    cand = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 100) in cand       # exact dup always a candidate
    assert (1, 101) in cand       # near dup caught at b=32 (r=2) sensitivity
    verified = verify_jaccard(pairs, docs_df, threshold=0.7)
    vset = set(map(tuple, verified[["a", "b"]].to_numpy()))
    assert (0, 100) in vset and (1, 101) in vset
    assert all(j >= 0.7 for j in verified["jaccard"])


def test_minhash_md5_variant(docs_df):
    """The md5-interchange MinHash kernel (doc_minhash_pairs gate path)
    catches the planted exact + near dup like the sip kernel, is
    deterministic, and short docs (< k tokens) still bucket."""
    short = pd.concat([docs_df, pd.DataFrame(
        {"doc_id": [200, 201, 202], "text": ["one two", "one two", ""]})],
        ignore_index=True)
    runs = [minhash_lsh_pairs(ray.data.from_pandas(short), num_perm=64,
                              bands=32, hash_fn="md5").to_pandas()
            for _ in range(2)]
    cand = set(map(tuple, runs[0][["a", "b"]].to_numpy()))
    assert (0, 100) in cand
    assert (1, 101) in cand
    assert (200, 201) in cand          # 2-token docs share their shingle
    assert not any(202 in p for p in cand)   # empty doc emits nothing
    assert cand == set(map(tuple, runs[1][["a", "b"]].to_numpy()))


def test_neardup_clusters_end_to_end():
    """Full dedup resolution: LSH -> verify -> WCC over dup pairs ->
    (doc_id, cluster_id, keep). Disjoint per-doc vocabularies make the
    true pair set exactly the planted one (cross-doc Jaccard 0), and
    the planted chain 1~101~102 checks the transitive-closure step that
    pairwise verification alone cannot produce."""
    from graphscope_ray.stages.dedup import neardup_clusters

    rows = []
    for i in range(12):
        words = [f"d{i}w{j}" for j in range(40)]
        rows.append((i, " ".join(words)))
    chain1 = rows[1][1].split()
    chain1[5] = "x5"
    rows.append((101, " ".join(chain1)))          # near-dup of 1
    chain2 = list(chain1)
    chain2[20] = "x20"
    rows.append((102, " ".join(chain2)))          # near-dup of 101
    rows.append((201, rows[2][1]))                # exact dup of 2
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])

    out = (neardup_clusters(ray.data.from_pandas(docs), threshold=0.7,
                            bands=32, num_partitions=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])  # every doc once
    by = out.set_index("doc_id")
    # transitive chain collapses to min id 1; only 1 is kept
    assert by.loc[1, "cluster_id"] == 1 and by.loc[101, "cluster_id"] == 1 \
        and by.loc[102, "cluster_id"] == 1
    assert bool(by.loc[1, "keep"]) and not bool(by.loc[101, "keep"]) \
        and not bool(by.loc[102, "keep"])
    assert by.loc[201, "cluster_id"] == 2 and not bool(by.loc[201, "keep"])
    # untouched docs are singleton keepers
    for i in [0, 3, 4, 5, 6, 7, 8, 9, 10, 11]:
        assert by.loc[i, "cluster_id"] == i and bool(by.loc[i, "keep"])
    # exactly one keeper per cluster
    assert out.groupby("cluster_id")["keep"].sum().eq(1).all()


def test_neardup_clusters_no_dups():
    """Empty verified-pair set: every doc is its own singleton cluster."""
    from graphscope_ray.stages.dedup import neardup_clusters

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [" ".join(f"u{i}w{j}" for j in range(30)) for i in range(6)],
    })
    out = neardup_clusters(ray.data.from_pandas(docs)).to_pandas()
    assert (out["cluster_id"].to_numpy(np.int64)
            == out["doc_id"].to_numpy(np.int64)).all()
    assert out["keep"].all() and len(out) == 6


def test_simhash(docs_df):
    sh = simhash_table(ray.data.from_pandas(docs_df)).to_pandas()
    m = dict(zip(sh["doc_id"], sh["simhash"]))
    assert m[0] == m[100]                        # identical docs -> equal simhash
    ham = bin(np.uint64(m[1]) ^ np.uint64(m[101])).count("1")
    assert ham <= 8                              # near dup -> close simhash


def test_simhash_md5_duckdb_twin(docs_df):
    """The md5-hash SimHasher variant (gate path) is interchange-exact
    with the doc_simhash DuckDB oracle on arbitrary text."""
    from graphscope_ray.stages.dedup import SimHasher

    import __ray_entry__ as entrymod

    got = (SimHasher("text", "doc_id", "md5")(docs_df)
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs_df)
    want = con.sql(entrymod.oracle_sql()["doc_simhash"]).df() \
              .sort_values("doc_id").reset_index(drop=True)
    assert (got["simhash"].to_numpy() == want["simhash"].to_numpy()).all()
    # empty doc -> 0 on both sides
    empty = pd.DataFrame({"doc_id": [7], "text": [""]})
    assert SimHasher("text", "doc_id", "md5")(empty)["simhash"].iloc[0] == 0


def test_embedding_neardup():
    rng = np.random.default_rng(5)
    V = rng.standard_normal((50, 16))
    V[40] = V[0] + rng.standard_normal(16) * 0.01      # planted near-dup
    ds = ray.data.from_pandas(pd.DataFrame({"vec_id": range(50),
                                            "embedding": list(V)}))
    pairs = embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
    assert (0, 40) in set(map(tuple, pairs[["a", "b"]].to_numpy()))


def test_brute_force_topk_matches_numpy():
    rng = np.random.default_rng(7)
    V = rng.standard_normal((300, 32))
    Q = rng.standard_normal((3, 32))
    ds = ray.data.from_pandas(pd.DataFrame({"vec_id": range(300),
                                            "embedding": list(V)}))
    got = brute_force_topk(ds, Q, k=5)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ Vn.T
    for qi in range(3):
        want = np.lexsort((np.arange(300), -S[qi]))[:5]
        rows = got[got["query_idx"] == qi]["vec_id"].to_numpy()
        assert (rows == want).all()


def test_ivf_topk_recall():
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 4
    V = np.concatenate([c + rng.standard_normal((40, 32)) for c in centers])
    ds = ray.data.from_pandas(pd.DataFrame({"vec_id": range(len(V)),
                                            "embedding": list(V)}))
    assigned, C = ivf_build(ds, num_centroids=16)
    assigned = assigned.materialize()
    Q = centers[:3] + 0.1
    approx = ivf_topk(assigned, C, Q, k=10, nprobe=4)
    exact = brute_force_topk(ds, Q, k=10)
    for qi in range(3):
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        assert len(a & e) / len(e) >= 0.6        # recall with nprobe=4/16


def test_pq_adc_equals_decoded_dot_and_recall():
    from graphscope_ray.stages.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((6, 32)) * 4
    V = np.concatenate([c + rng.standard_normal((60, 32))
                        for c in centers])
    ds = ray.data.from_pandas(pd.DataFrame({"vec_id": range(len(V)),
                                            "embedding": list(V)}))
    books = pq_train(ds, m=4, nbits=6, sample_size=1024, seed=9)
    assert books.shape == (4, 64, 8)
    enc = pq_encode(ds, books).materialize()
    Q = centers[:3] + 0.05
    got = pq_topk(enc, books, Q, k=8)
    # ADC parity: score == cosine(query, decoded(code)) to float assoc
    enc_df = enc.to_pandas().set_index("vec_id")
    codes = np.stack(enc_df["pq_code"].to_numpy()).astype(np.int64)
    dec = np.concatenate(
        [books[j][codes[:, j]] for j in range(4)], axis=1)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ dec.T
    ids = enc_df.index.to_numpy()
    for qi in range(3):
        want_idx = np.lexsort((ids, -S[qi]))[:8]
        rows = got[got["query_idx"] == qi]
        assert (rows["vec_id"].to_numpy() == ids[want_idx]).all()
        assert np.allclose(rows["score"].to_numpy(),
                           S[qi, want_idx], atol=1e-12)
    # coarse-structure preservation: every ADC top-8 hit lies in the
    # query's true cluster (within-cluster ORDER is quantization noise
    # at this scale for any PQ — the ADC-parity assertions above are
    # the exactness oracle; this one checks the index is useful)
    for qi in range(3):
        hits = got[got["query_idx"] == qi]["vec_id"].to_numpy()
        assert (hits // 60 == qi).all(), (qi, hits)


def test_pq_deterministic_and_partition_invariant():
    from graphscope_ray.stages.similarity import pq_encode, pq_train

    rng = np.random.default_rng(31)
    V = rng.standard_normal((200, 16))
    df = pd.DataFrame({"vec_id": range(200), "embedding": list(V)})
    outs = []
    for P in (1, 4):
        ds = ray.data.from_pandas(df).repartition(P)
        books = pq_train(ds, m=2, nbits=4, sample_size=128, seed=5)
        enc = (pq_encode(ds, books).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        outs.append((books, np.stack(enc["pq_code"].to_numpy())))
    assert np.array_equal(outs[0][0], outs[1][0])      # same codebooks
    assert np.array_equal(outs[0][1], outs[1][1])      # same codes


def test_text_kernels_vs_duckdb(docs_df):
    got = token_counts(docs_df["text"]).to_numpy()
    want = duckdb.sql(
        r"SELECT len(regexp_extract_all(text, '\w+')) AS n FROM docs_df"
    ).df()["n"].to_numpy()
    assert (got == want).all()
    q = quality_features(docs_df["text"])
    assert ((q["quality_score"] >= 0) & (q["quality_score"] <= 1)).all()
    langs = lang_id(pd.Series([
        "the cat sat on the mat and it is warm",
        "der Hund ist nicht mit der Katze",
        "le chat est dans la maison pour toujours",
        "xyzzy plugh",
    ]))
    assert list(langs) == ["en", "de", "fr", "und"]


def test_relational_ops():
    df = pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": [10.0, 20, 20, 5, 1],
                       "tag": ["a", "b", "a", "c", "a"]})
    ds = ray.data.from_pandas(df)
    semi = broadcast_semi_join(ds, [1, 3], on="k").to_pandas()
    assert sorted(semi["k"]) == [1, 3]
    anti = broadcast_semi_join(ds, [1, 3], on="k", anti=True).to_pandas()
    assert sorted(anti["k"]) == [2, 4, 5]
    dim = pd.DataFrame({"tag": ["a", "b", "c"], "name": ["A", "B", "C"]})
    j = broadcast_lookup_join(ds, dim, on="tag").to_pandas()
    assert len(j) == 5 and set(j["name"]) == {"A", "B", "C"}
    dd = dedup_first(ds, ["tag"], order_by=["k"]).to_pandas()
    assert sorted(dd["k"]) == [1, 2, 4]          # first k per tag
    t = topk(ds, "v", 2).to_pandas()
    assert list(t["v"]) == [20.0, 20.0]
    lds = ray.data.from_pandas(pd.DataFrame({"id": [1, 2], "xs": [[1, 2], [3]]}))
    u = unfold(lds, "xs").to_pandas()
    assert sorted(u["xs"]) == [1, 2, 3]


def test_multimodal_plumbing():
    payloads = [bytes(range(i, i + 100)) for i in range(0, 40, 10)]
    ds = ray.data.from_arrow(
        __import__("pyarrow").table({"media_id": list(range(4)),
                                     "payload": payloads})
    )
    meta = attach_media_meta(ds).to_pandas()
    assert (meta["payload_bytes"] == 100).all()
    dec = decode_images(ds).to_pandas().sort_values("media_id")
    assert "pixel_mean" in dec and len(dec) == 4
    # deterministic fake decode
    dec2 = decode_images(ds).to_pandas().sort_values("media_id")
    assert (dec["pixel_mean"].to_numpy() == dec2["pixel_mean"].to_numpy()).all()


def test_verify_jaccard_pairs_matches_driver(docs_df):
    from graphscope_ray.stages.dedup import verify_jaccard_pairs

    pairs = minhash_lsh_pairs(
        ray.data.from_pandas(docs_df), num_perm=64, bands=32
    )
    want = verify_jaccard(pairs.to_pandas(), docs_df, threshold=0.5)
    got = verify_jaccard_pairs(
        pairs, ray.data.from_pandas(docs_df), threshold=0.5
    ).to_pandas()
    ws = want.sort_values(["a", "b"]).reset_index(drop=True)
    gs = got.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(ws) == len(gs) and len(gs) > 0
    assert (ws["a"] == gs["a"]).all() and (ws["b"] == gs["b"]).all()
    assert np.allclose(ws["jaccard"], gs["jaccard"], atol=1e-12)


def test_multimodal_resize_frames_audio():
    from graphscope_ray.stages.multimodal import (
        decode_images,
        extract_audio_features,
        resize_images,
        sample_frames,
    )

    import pyarrow as pa

    payloads = [bytes(range(i, i + 96)) for i in range(5)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    }))
    dec = decode_images(ds, concurrency=1)
    rs = resize_images(dec, concurrency=1).to_pandas()
    assert len(rs) == 5 and all(len(t) == 16 for t in rs["thumb_small"])
    # deterministic: nearest-neighbor picks the gathered source pixels
    t0 = np.asarray(list(rs.sort_values("doc_id")["thumb"].iloc[0]))
    s0 = np.asarray(list(rs.sort_values("doc_id")["thumb_small"].iloc[0]))
    gather = (np.arange(4) * 2)[:, None] * 8 + (np.arange(4) * 2)[None, :]
    assert (s0 == t0[gather.reshape(-1)]).all()

    fr = sample_frames(ds, n_frames=3, concurrency=1).to_pandas()
    assert len(fr) == 15
    assert sorted(fr["frame"].unique()) == [0, 1, 2]
    fr2 = sample_frames(ds, n_frames=3, concurrency=1).to_pandas()
    assert fr.sort_values(["doc_id", "frame"])["frame_digest"].tolist() == \
        fr2.sort_values(["doc_id", "frame"])["frame_digest"].tolist()

    au = extract_audio_features(ds, n_windows=4, concurrency=1).to_pandas()
    assert len(au) == 5 and all(len(r) == 4 for r in au["rms"])
    assert (au["zero_crossings"] >= 0).all()


def test_repetition_features_duckdb_twin(docs_df):
    """Gopher-style repetition signals are interchange-exact with the
    doc_repetition DuckDB oracle, including edge cases."""
    import __ray_entry__ as entrymod
    from graphscope_ray.functions.text import repetition_features

    df = pd.concat([docs_df[["doc_id", "text"]], pd.DataFrame({
        "doc_id": [9001, 9002, 9003],
        "text": ["", "dup\ndup\nother", "a b a b a b"],
    })], ignore_index=True)
    r = repetition_features(df["text"])
    got = pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_lines": r["n_lines"],
        "dup_line_frac": r["dup_line_frac"].map(lambda v: f"{v:.6f}"),
        "top_bigram_frac": r["top_bigram_frac"].map(lambda v: f"{v:.6f}"),
    }).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(entrymod.oracle_sql()["doc_repetition"]).df() \
              .sort_values("doc_id").reset_index(drop=True)
    for c in ("n_lines", "dup_line_frac", "top_bigram_frac"):
        assert (got[c].astype(str).to_numpy()
                == want[c].astype(str).to_numpy()).all(), c
    byid = got.set_index("doc_id")
    assert byid.loc[9002, "dup_line_frac"] == "0.333333"
    assert byid.loc[9003, "top_bigram_frac"] == "0.600000"


def test_ivf_pq_composition():
    """IVF-PQ = coarse-bucket pruning + ADC scan: the composed query
    equals pq_topk restricted to the probed buckets exactly, recalls
    the planted clusters, and keeps (id, centroid, code) only."""
    from graphscope_ray.stages.similarity import (
        ivf_pq_build,
        ivf_pq_topk,
        pq_topk,
    )

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((6, 32)) * 4
    V = np.concatenate([c + rng.standard_normal((60, 32))
                        for c in centers])
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": range(len(V)), "embedding": list(V)})).repartition(4)
    enc, C, books = ivf_pq_build(ds, num_centroids=12, m=4, nbits=6,
                                 sample_size=1024, seed=9)
    assert set(enc.schema().names) == {"vec_id", "centroid", "pq_code"}
    Q = centers[:3] + 0.05
    got = ivf_pq_topk(enc, C, books, Q, k=8, nprobe=4)
    # exact-composition oracle: same ADC scan over the probed subset
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :4]
    wanted = set(np.unique(probe).tolist())
    sub_df = enc.to_pandas()
    sub = ray.data.from_pandas(
        sub_df[sub_df["centroid"].isin(wanted)].reset_index(drop=True))
    want = pq_topk(sub, books, Q, k=8)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    # planted-cluster recall: hits come from the query's own cluster
    for qi in range(3):
        hits = got[got["query_idx"] == qi]["vec_id"].to_numpy()
        assert (hits // 60 == qi).mean() >= 0.9
