"""Training-data text preparation stages: PII scrubbing, unicode
normalization, token-window chunking, sequence packing, and a
corpus-trained bigram-LM quality scorer.

These extend the reference's data-pipeline surface (GraphScope itself
stops at graph ingestion — loader.py / arrow_fragment_loader.h) with
the operations a 100 TB LLM corpus pipeline needs in front of the
graph/dedup stages. Everything is expressed over ``ray.data.Dataset``
with Arrow/pandas kernels: scrub/normalize are pure per-batch
``pyarrow.compute`` regex chains (RE2 — the same engine DuckDB uses,
so the pytest twins compare byte-exactly); chunking is an explode +
segment-arithmetic flat_map; packing is per-block greedy (documented
contract: pack quality is local to a block, which is what keeps the
operator streaming at corpus scale); the bigram LM is a two-pass
train/score — pre-aggregated counts into one small ``grouped_agg``,
model broadcast once via ``ray.put``, vectorized scoring per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# Order matters: URLs are scrubbed before emails (URLs may embed '@'),
# IPs before phone-ish digit runs. RE2 syntax (no backrefs/lookahead)
# so Arrow and DuckDB twins agree byte-for-byte.
PII_RULES: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().\-\s]{7,}\d", "<PHONE>"),
]


def scrub_pii(
    ds: ray.data.Dataset,
    text_col: str = "text",
    rules: list[tuple[str, str, str]] | None = None,
) -> ray.data.Dataset:
    """Replace PII-shaped spans with placeholder tokens and count the
    replacements per category — one zero-copy Arrow batch pass, RE2
    kernels only (``replace_substring_regex`` / ``count_substring_regex``).
    Appends ``pii_<name>`` int64 count columns and rewrites ``text_col``."""
    rules = PII_RULES if rules is None else rules

    def f(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        counts = {}
        for name, pat, rep in rules:
            counts[f"pii_{name}"] = pc.count_substring_regex(col, pat)
            col = pc.replace_substring_regex(col, pat, rep)
        out = t.set_column(t.column_names.index(text_col), text_col, col)
        for k, v in counts.items():
            out = out.append_column(k, v.cast(pa.int64()))
        return out

    return ds.map_batches(f, batch_format="pyarrow")


def normalize_text(
    ds: ray.data.Dataset,
    text_col: str = "text",
    form: str = "NFC",
    keep_newlines: bool = False,
) -> ray.data.Dataset:
    """Unicode-normalize (NFC by default), strip control characters,
    collapse whitespace runs to single spaces, and trim — the standard
    pre-dedup canonicalization pass. Strip/collapse/trim are Arrow
    kernels; the normalize step falls back to ``unicodedata`` applied
    ONLY to non-ASCII strings (``pc.string_is_ascii`` gate — for code /
    English corpora the slow path touches a few percent of rows)
    because this pyarrow build's ``utf8_normalize`` decomposes but
    never re-composes (NFC(a+U+0301) stays two codepoints).

    ``keep_newlines=True`` preserves line structure: a whitespace run
    CONTAINING a newline collapses to one ``\\n``, a purely horizontal
    run to one space — required when a downstream stage keys on line
    boundaries (``paragraph_dedup`` with the default ``sep="\\n"``
    would otherwise see every normalized document as a single span)."""
    import unicodedata

    def f(t: pa.Table) -> pa.Table:
        col = t.column(text_col).combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = pa.concat_arrays(col.chunks) if col.num_chunks else \
                pa.array([], col.type)
        ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
        if not ascii_mask.all():
            vals = col.to_pandas()
            idx = np.flatnonzero(~ascii_mask)
            for i in idx:
                s = vals.iloc[i]
                if s is not None:
                    vals.iloc[i] = unicodedata.normalize(form, s)
            col = pa.array(vals, type=col.type)
        col = pc.replace_substring_regex(col, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
        if keep_newlines:
            col = pc.replace_substring_regex(col, r"\s*\n\s*", "\n")
            col = pc.replace_substring_regex(col, r"[^\S\n]+", " ")
        else:
            col = pc.replace_substring_regex(col, r"\s+", " ")
        col = pc.utf8_trim_whitespace(col)
        return t.set_column(t.column_names.index(text_col), text_col, col)

    return ds.map_batches(f, batch_format="pyarrow")


def chunk_documents(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 0,
) -> ray.data.Dataset:
    """Split each document into whitespace-token windows of
    ``max_tokens`` tokens with ``overlap`` tokens repeated between
    consecutive windows (stride = max_tokens − overlap) — the training
    chunker. flat_map shape: rows multiply, no shuffle. Output:
    (id_col, chunk_id, text, n_tokens).

    Vectorized explode: tokens for the whole batch land in ONE flat
    array with per-doc segment starts; window membership is segment
    arithmetic (a token joins window p//stride and, inside the overlap
    prefix, the previous window too); chunk text re-joins via a single
    grouped ``str.join``. No per-token Python loop."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def f(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.split()
        lens = toks.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({id_col: np.array([], b[id_col].dtype),
                                 "chunk_id": np.array([], np.int64),
                                 "text": np.array([], object),
                                 "n_tokens": np.array([], np.int64)})
        flat = np.concatenate([t for t in toks if t])
        doc_idx = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        starts = np.concatenate(([0], np.cumsum(lens)))
        pos = np.arange(len(flat), dtype=np.int64) - starts[doc_idx]
        main = pos // stride
        ids = b[id_col].to_numpy()
        rows_doc = [ids[doc_idx]]
        rows_chunk = [main]
        rows_tok = [flat]
        if overlap:
            # the first `overlap` tokens of window c also close window
            # c-1 (positions p with p % stride < overlap, p >= stride)
            m = (pos % stride < overlap) & (main > 0)
            rows_doc.append(ids[doc_idx[m]])
            rows_chunk.append(main[m] - 1)
            rows_tok.append(flat[m])
        df = pd.DataFrame({
            id_col: np.concatenate(rows_doc),
            "chunk_id": np.concatenate(rows_chunk),
            "_tok": np.concatenate(rows_tok),
            # in-doc token order key so the overlap duplicates sort
            # back into position within their window
            "_pos": np.concatenate([pos] + ([pos[m]] if overlap else [])),
        })
        df = df.sort_values([id_col, "chunk_id", "_pos"], kind="stable")
        g = df.groupby([id_col, "chunk_id"], sort=False)
        out = g["_tok"].agg(" ".join).reset_index()
        out["n_tokens"] = g.size().to_numpy(np.int64)
        return out.rename(columns={"_tok": "text"})

    return ds.map_batches(f, batch_format="pandas")


def pack_sequences(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seq_len: int = 2048,
) -> ray.data.Dataset:
    """Greedy whole-document sequence packing: assign each row to a
    pack so that a pack's token total never exceeds ``seq_len``
    (documents longer than seq_len get a pack of their own, flagged).
    Output: input columns + (pack_id, pack_tokens 0-based offset).

    Contract at scale: packing is PER BLOCK — deterministic given the
    block's rows (first-fit over rows sorted by (tokens desc, id)),
    and pack ids are deterministic 64-bit hashes of (block content
    fingerprint, bin index) — unique within a block by construction,
    collision-free across blocks to 64-bit odds (NOT keyed on doc id:
    after chunking one doc spans many packs, so any doc-keyed id
    collides). Global packing would serialize the corpus through one
    node for a ~1-2 % waste win; per-block keeps the operator
    streaming. Use ``.repartition`` upstream to trade block size
    against packing quality."""
    from graphscope_ray.functions.hashing import splitmix64

    def f(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            b["pack_id"] = np.array([], np.int64)
            b["pack_offset"] = np.array([], np.int64)
            return b
        toks = b[tokens_col].to_numpy(np.int64)
        ids = b[id_col].to_numpy()
        order = np.lexsort((ids, -toks))  # tokens desc, id asc
        # first-fit over the sorted rows: bins keyed by remaining room
        bin_of = np.empty(n, np.int64)
        offset = np.empty(n, np.int64)
        rooms: list[int] = []
        for i in order:
            t = int(toks[i])
            placed = False
            if t <= seq_len:
                for j in range(len(rooms)):
                    if rooms[j] >= t:
                        bin_of[i] = j
                        offset[i] = seq_len - rooms[j]
                        rooms[j] -= t
                        placed = True
                        break
            if not placed:
                bin_of[i] = len(rooms)
                offset[i] = 0
                rooms.append(max(seq_len - t, 0))
        # deterministic pack ids: 64-bit block-content fingerprint
        # (sum/count of ids+tokens, order-invariant) mixed with the
        # bin index — stable across runs, unique per bin
        ids64 = np.asarray(ids, np.uint64)
        fp = splitmix64(np.array(
            [ids64.sum() ^ (np.uint64(n) << np.uint64(32))
             ^ np.uint64(toks.sum())], np.uint64))[0]
        pid_of_bin = splitmix64(
            np.uint64(fp) + np.arange(1, len(rooms) + 1, dtype=np.uint64)
        ).astype(np.int64)
        b = b.copy()
        b["pack_id"] = pid_of_bin[bin_of]
        b["pack_offset"] = offset
        return b

    return ds.map_batches(f, batch_format="pandas")


def concat_and_chunk(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    eos: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """GPT-style contiguous sequence packing: concatenate every
    document's whitespace tokens in ``id_col`` order (appending
    ``eos`` after each document if given) and split the stream into
    fixed ``seq_len``-token sequences — documents CROSS sequence
    boundaries (the pretraining-standard layout;
    :func:`pack_sequences` is the whole-document bin-packing
    alternative). Output: ``(seq_id, text, n_tokens, n_docs)`` —
    ``n_docs`` counts documents contributing ≥1 token; the final
    partial sequence is kept with ``n_tokens < seq_len``.

    Globally deterministic at any partitioning: one range sort on
    ``id_col``, then each sorted block learns its global TOKEN offset
    from per-block token counts (driver holds O(#blocks) ints, the
    ``global_ntile`` recipe) and emits per-(block, sequence) fragment
    partials — O(corpus) text moves once through the final fragment
    co-group, nothing ever lands on the driver."""
    from graphscope_ray.stages.relational import (
        bucketed_group_apply,
        coalesce_blocks,
    )

    if seq_len < 1:
        raise ValueError("concat_and_chunk: seq_len must be >= 1")
    sorted_ds = (coalesce_blocks(ds.select_columns([id_col, text_col]))
                 .sort([id_col]).materialize())
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _ntokens(t: pa.Table) -> int:
        s = t.column(text_col).to_pandas().astype(str).str.split()
        n = int(s.str.len().fillna(0).sum())
        if eos is not None:
            n += t.num_rows
        return n

    counts = ray.get([_ntokens.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)

    @ray.remote
    def _fragments(t: pa.Table, off: int) -> pa.Table:
        toks = t.column(text_col).to_pandas().astype(str).str.split()
        if eos is not None:
            toks = toks.apply(lambda ts: ts + [eos])
        lens = toks.str.len().fillna(0).to_numpy(np.int64)
        total = int(lens.sum())
        if total == 0:
            return pa.table({
                "seq_id": pa.array([], pa.int64()),
                "_start": pa.array([], pa.int64()),
                "_text": pa.array([], pa.string()),
                "_ntok": pa.array([], pa.int64()),
                "_ndoc": pa.array([], pa.int64()),
            })
        flat = np.concatenate([x for x in toks if x])
        starts = np.concatenate(([0], np.cumsum(lens)))
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        g = off + np.arange(total, dtype=np.int64)
        seq = g // seq_len
        df = pd.DataFrame({"seq": seq, "g": g, "tok": flat,
                           "doc": doc_idx})
        grp = df.groupby("seq", sort=True)
        text = grp["tok"].agg(" ".join)
        gmin = grp["g"].min()
        ntok = grp.size()
        ndoc = grp["doc"].nunique()
        return pa.table({
            "seq_id": pa.array(text.index.to_numpy(np.int64)),
            "_start": pa.array(gmin.to_numpy(np.int64)),
            "_text": pa.array(text.to_numpy(object), pa.string()),
            "_ntok": pa.array(ntok.to_numpy(np.int64)),
            "_ndoc": pa.array(ndoc.to_numpy(np.int64)),
        })

    frags = ray.data.from_arrow_refs(
        [_fragments.remote(t, int(offsets[i]))
         for i, t in enumerate(refs)])

    def finish(gd: pd.DataFrame) -> pd.DataFrame:
        gd = gd.sort_values(["seq_id", "_start"], kind="mergesort")
        grp = gd.groupby("seq_id", sort=False)
        return pd.DataFrame({
            "seq_id": grp.size().index.to_numpy(np.int64),
            "text": grp["_text"].agg(" ".join).to_numpy(object),
            "n_tokens": grp["_ntok"].sum().to_numpy(np.int64),
            "n_docs": grp["_ndoc"].sum().to_numpy(np.int64),
        })

    return bucketed_group_apply(frags, ["seq_id"], finish, num_buckets)


# ------------------------------------------------------------------
# Bigram language-model quality scoring (perplexity proxy)
# ------------------------------------------------------------------

def _batch_ngram_counts(b: pd.DataFrame, text_col: str) -> pd.DataFrame:
    toks = b[text_col].str.lower().str.split()
    lens = toks.str.len().fillna(0).to_numpy(np.int64)
    if lens.sum() == 0:
        return pd.DataFrame({"gram": [], "n": [], "uni": []})
    flat = np.concatenate([t for t in toks if t])
    starts = np.concatenate(([0], np.cumsum(lens)))
    # bigrams never cross documents: drop each segment's first token
    # from the "second word" role
    second = np.ones(len(flat), bool)
    second[starts[:-1][lens > 0]] = False
    prev = np.roll(flat, 1)
    uni = pd.Series(flat).value_counts()
    bi = pd.Series(
        np.char.add(np.char.add(prev[second].astype(str), " "),
                    flat[second].astype(str))).value_counts()
    return pd.concat([
        pd.DataFrame({"gram": bi.index, "n": bi.to_numpy(np.int64),
                      "uni": np.zeros(len(bi), np.int64)}),
        pd.DataFrame({"gram": uni.index, "n": uni.to_numpy(np.int64),
                      "uni": np.ones(len(uni), np.int64)}),
    ])


def train_bigram_lm(
    ds: ray.data.Dataset,
    text_col: str = "text",
    max_vocab: int = 65536,
) -> dict:
    """Pass 1: corpus bigram/unigram counts → a small add-one-smoothed
    conditional log-prob model. Counts pre-aggregate inside every batch
    (one value_counts per block — shuffle rows are (gram, n) partials,
    not tokens), reduce through one grouped sum, and the top
    ``max_vocab`` rows per order come back to the driver (bounded;
    truncation is the standard LM vocab cap). Returns a plain dict
    {``bigram``: {..: count}, ``unigram``: {..}, ``total``: N} suitable
    for ``ray.put`` broadcast."""
    from graphscope_ray.stages.relational import grouped_agg, topk

    counts = ds.map_batches(
        lambda b: _batch_ngram_counts(b, text_col), batch_format="pandas")
    agg = grouped_agg(counts, ["gram", "uni"], {"n": ("n", "sum")})
    uni = topk(agg.filter(lambda r: r["uni"] == 1), "n", max_vocab).to_pandas()
    bi = topk(agg.filter(lambda r: r["uni"] == 0), "n", max_vocab).to_pandas()
    return {
        "bigram": dict(zip(bi["gram"], bi["n"].astype(np.int64))),
        "unigram": dict(zip(uni["gram"], uni["n"].astype(np.int64))),
        "total": int(uni["n"].sum()),
    }


def score_bigram_lm(
    ds: ray.data.Dataset,
    model: dict | "ray.ObjectRef",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Pass 2: per-document mean negative log2 P(w_i | w_{i-1}) under
    the trained model with add-one smoothing — low = fluent-under-corpus,
    high = outlier (the classic quality/perplexity filter signal).
    The model ships once per actor (``ray.put`` ref resolved in
    ``__init__``), never per batch. Appends ``lm_bits_per_token``
    (0.0 for docs with < 2 tokens)."""
    ref = model if isinstance(model, ray.ObjectRef) else ray.put(model)

    class Scorer:
        def __init__(self):
            m = ray.get(ref)
            self.bi = m["bigram"]
            self.uni = m["unigram"]
            self.V = max(len(m["unigram"]), 1)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            toks = b[text_col].str.lower().str.split()
            lens = toks.str.len().fillna(0).to_numpy(np.int64)
            if lens.sum() == 0:
                b = b.copy()
                b["lm_bits_per_token"] = np.zeros(len(b))
                return b
            flat = np.concatenate([t for t in toks if t])
            starts = np.concatenate(([0], np.cumsum(lens)))
            second = np.ones(len(flat), bool)
            second[starts[:-1][lens > 0]] = False
            prev = np.roll(flat, 1)
            grams = pd.Series(np.char.add(np.char.add(
                prev.astype(str), " "), flat.astype(str)))
            cb = grams.map(self.bi).fillna(0.0).to_numpy(np.float64)
            cu = pd.Series(prev).map(self.uni).fillna(0.0).to_numpy(np.float64)
            bits = -np.log2((cb + 1.0) / (cu + self.V))
            bits[~second] = 0.0
            doc_idx = np.repeat(np.arange(len(b)), lens)
            tot = np.bincount(doc_idx, weights=bits, minlength=len(b))
            n2 = np.bincount(doc_idx, weights=second.astype(np.float64),
                             minlength=len(b))
            b = b.copy()
            b["lm_bits_per_token"] = np.where(n2 > 0, tot / np.maximum(n2, 1), 0.0)
            return b

    return ds.map_batches(Scorer, batch_format="pandas",
                          concurrency=(1, 8))


# ------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against an eval set)
# ------------------------------------------------------------------

def build_ngram_blocklist(
    benchmark: ray.data.Dataset,
    text_col: str = "text",
    n: int = 8,
) -> "ray.ObjectRef":
    """Distinct n-gram hashes of a benchmark/eval corpus, as one sorted
    uint64 array behind a ``ray.put`` ref (broadcast small side — the
    standard shape for decontamination: eval suites are thousands of
    documents, i.e. megabytes of n-gram hashes, while the corpus being
    scanned is the 100 TB side that must stream).

    Shingling reuses the dedup kernel (``dedup._batch_shingles`` —
    lowercase ``TOKEN_RE`` tokens, doc-local rolling FNV combine), so a
    training doc quoting a benchmark doc verbatim hits the exact same
    hash values. Per-batch partial = distinct hashes (already a
    projection); the driver unions the partials — O(benchmark n-grams)
    driver heap, documented as the small side by contract."""
    from graphscope_ray.stages.dedup import _batch_shingles

    def distinct(b: pd.DataFrame) -> pd.DataFrame:
        sh, _ = _batch_shingles(b[text_col], n)
        return pd.DataFrame({"h": np.unique(sh).view(np.int64)})

    parts = benchmark.map_batches(distinct, batch_format="pandas").to_pandas()
    if "h" not in parts.columns:  # all-empty benchmark: schema-less frame
        return ray.put(np.empty(0, np.uint64))
    block = np.unique(parts["h"].to_numpy(np.int64).view(np.uint64))
    return ray.put(block)


def contamination_features(
    docs: ray.data.Dataset,
    blocklist: "ray.ObjectRef | np.ndarray",
    text_col: str = "text",
    n: int = 8,
) -> ray.data.Dataset:
    """Per-document benchmark-overlap counters: appends
    ``contaminated_ngrams`` (n-gram occurrences found in the blocklist,
    multiplicity included), ``total_ngrams`` and ``contamination_frac``.
    One streaming pass: shingle the batch (vectorized), membership =
    ``searchsorted`` against the sorted broadcast array (no shuffle,
    no per-row loop), per-doc sums via boundary-cumsum (zero-length
    safe). The blocklist ref resolves once per actor in ``__init__``."""
    from graphscope_ray.stages.dedup import _batch_shingles

    ref = blocklist if isinstance(blocklist, ray.ObjectRef) \
        else ray.put(np.asarray(blocklist, dtype=np.uint64))

    class Marker:
        def __init__(self):
            self.block = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            sh, starts = _batch_shingles(b[text_col], n)
            if len(self.block) and len(sh):
                pos = np.searchsorted(self.block, sh)
                pos[pos == len(self.block)] = 0
                hit = (self.block[pos] == sh).astype(np.int64)
            else:
                hit = np.zeros(len(sh), np.int64)
            csum = np.concatenate(([0], np.cumsum(hit)))
            per_doc = csum[starts[1:]] - csum[starts[:-1]]
            total = np.diff(starts)
            b = b.copy()
            b["contaminated_ngrams"] = per_doc
            b["total_ngrams"] = total
            b["contamination_frac"] = np.where(
                total > 0, per_doc / np.maximum(total, 1), 0.0)
            return b

    return docs.map_batches(Marker, batch_format="pandas",
                            concurrency=(1, 8))


def decontaminate(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_col: str = "text",
    n: int = 8,
    max_frac: float = 0.0,
) -> ray.data.Dataset:
    """Drop documents whose benchmark n-gram overlap fraction exceeds
    ``max_frac`` (the conventional policy is any-hit → drop, i.e. the
    default 0.0). Composition of :func:`build_ngram_blocklist` (one
    bounded pass over the small side) + :func:`contamination_features`
    (one streaming pass over the corpus) + a vectorized filter; the
    overlap counter columns stay on the surviving rows for audit."""
    ref = build_ngram_blocklist(benchmark, text_col=text_col, n=n)
    feat = contamination_features(docs, ref, text_col=text_col, n=n)
    return feat.map_batches(
        lambda b: b[b["contamination_frac"].to_numpy() <= max_frac],
        batch_format="pandas")


def perplexity_buckets(
    ds: ray.data.Dataset,
    model: "dict | ray.ObjectRef",
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under the trained bigram LM, then split the corpus
    into ``n_buckets`` equal-population fluency tiers (bucket 1 = most
    fluent "head", last = "tail") with exact SQL-NTILE semantics via
    :func:`relational.global_ntile` — ties pinned by ``id_col`` so the
    assignment is deterministic at any partitioning."""
    from graphscope_ray.stages.relational import global_ntile

    scored = score_bigram_lm(ds, model, text_col=text_col)
    return global_ntile(scored, ["lm_bits_per_token", id_col],
                        n_buckets, out_col="ppl_bucket")
