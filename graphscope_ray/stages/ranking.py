"""Lexical ranking over the document corpus: document frequency,
TF-IDF and Okapi BM25 scoring / top-k keyword search.

The reference's GIE surface exposes ordering/top-k over computed
columns (algebra.proto OrderBy/Limit); a training-data pipeline
additionally needs lexical retrieval for corpus curation (query-biased
subset selection, contamination probes). This module supplies it
Ray-Data-first:

- the corpus text NEVER shuffles: one ``map_batches`` pass computes a
  narrow numeric ``(doc_id, dl, tf_0..tf_q)`` table for the q query
  terms (q is small by contract — a keyword query, not a vocabulary);
- global stats (N, avgdl, per-term df) reduce through per-block
  partial rows — O(#blocks) rows to the driver, never the corpus;
- scoring broadcasts q idf doubles in a closure and streams;
- top-k uses the relational ``topk`` (per-block partial cut before the
  small sort shuffle).

Scale contract: O(corpus) work is two streamed passes over a
materialized numeric tf table of ``rows × (q + 2)`` int64s; driver
state is O(q + #blocks).

BM25 formula (Robertson/Okapi, +1 idf so scores are non-negative):
``idf_t = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)``;
``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.
The ``doc_bm25`` DuckDB twin mirrors every floating operation in the
same order, so 6dp-fixed scores hash-match cross-engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.functions.text import _flat_tokens, _segment_sums


def _term_list(query_terms) -> list[str]:
    """Deduplicated, lowercased, sorted query vocabulary (sorted so the
    tf column layout — and the twin's CTE order — is deterministic)."""
    return sorted({str(t).lower() for t in query_terms})


def term_frequency_table(
    docs: ray.data.Dataset,
    query_terms,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[ray.data.Dataset, list[str]]:
    """One streamed pass over the corpus → the narrow numeric
    ``(id, dl, tf_0..tf_{q-1})`` table (materialized: it is consumed
    twice — stats then scoring — and is ints-only, far smaller than
    the text it summarizes)."""
    terms = _term_list(query_terms)

    def tf_stage(batch: pd.DataFrame) -> pd.DataFrame:
        flat, starts = _flat_tokens(batch[text_col])
        out = {
            id_col: batch[id_col].to_numpy(),
            "dl": np.diff(starts).astype(np.int64),
        }
        for j, t in enumerate(terms):
            hit = flat == t if len(flat) else np.empty(0, bool)
            out[f"tf_{j}"] = _segment_sums(hit, starts).astype(np.int64)
        return pd.DataFrame(out)

    return (docs.map_batches(tf_stage, batch_format="pandas").materialize(),
            terms)


def corpus_stats(
    tf: ray.data.Dataset, n_terms: int
) -> tuple[int, float, np.ndarray]:
    """(N, avgdl, df[q]) from per-block partial sums — O(#blocks) rows
    reach the driver. avgdl is ``exact_int_sum / N`` in one double
    division (the twin computes the identical expression)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n": [np.int64(len(batch))],
               "sum_dl": [np.int64(batch["dl"].sum())]}
        for j in range(n_terms):
            row[f"df_{j}"] = [np.int64((batch[f"tf_{j}"] > 0).sum())]
        return pd.DataFrame(row)

    parts = tf.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0 or "n" not in parts.columns:  # empty corpus
        return 0, 0.0, np.zeros(n_terms, np.float64)
    n = int(parts["n"].sum())
    avgdl = float(int(parts["sum_dl"].sum())) / n if n else 0.0
    df = np.array([int(parts[f"df_{j}"].sum()) for j in range(n_terms)],
                  dtype=np.float64)
    return n, avgdl, df


def bm25_scores(
    docs: ray.data.Dataset,
    query_terms,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    matching_only: bool = True,
) -> ray.data.Dataset:
    """(id, dl, score) BM25 scores against a small keyword query.
    ``matching_only`` keeps docs with score > 0 (i.e. at least one
    query term present); score accumulation order is the sorted term
    order on both engines."""
    tf, terms = term_frequency_table(docs, query_terms,
                                     text_col=text_col, id_col=id_col)
    n, avgdl, df = corpus_stats(tf, len(terms))
    if n == 0 or avgdl == 0.0:
        # empty corpus / all-empty docs: nothing can match
        return tf.map_batches(
            lambda b: pd.DataFrame({id_col: b[id_col].iloc[:0],
                                    "dl": b["dl"].iloc[:0],
                                    "score": np.empty(0, np.float64)}),
            batch_format="pandas")
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        dl = batch["dl"].to_numpy(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(batch), dtype=np.float64)
        for j in range(len(terms)):
            tfj = batch[f"tf_{j}"].to_numpy(np.float64)
            s += idf[j] * (tfj * (k1 + 1.0)) / (tfj + norm)
        out = pd.DataFrame({id_col: batch[id_col],
                            "dl": batch["dl"], "score": s})
        return out[out["score"] > 0.0] if matching_only else out

    return tf.map_batches(score, batch_format="pandas")


def bm25_topk(
    docs: ray.data.Dataset,
    query_terms,
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Keyword-search top-k: highest-BM25 docs, deterministic id
    tiebreak. The per-block partial cut bounds the sort shuffle to
    ≤ k rows per block."""
    from graphscope_ray.stages.relational import topk

    scored = bm25_scores(docs, query_terms, k1=k1, b=b,
                         text_col=text_col, id_col=id_col)
    return topk(scored, key="score", k=k, descending=True,
                tiebreak=[id_col])


def tfidf_scores(
    docs: ray.data.Dataset,
    query_terms,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    matching_only: bool = True,
) -> ray.data.Dataset:
    """(id, score) smooth-idf TF-IDF against a small query:
    ``Σ_t tf · (ln((1+N)/(1+df_t)) + 1)`` with raw term counts —
    same two-pass / broadcast-constants dataflow as BM25."""
    tf, terms = term_frequency_table(docs, query_terms,
                                     text_col=text_col, id_col=id_col)
    n, _avgdl, df = corpus_stats(tf, len(terms))
    idf = np.log((1.0 + n) / (1.0 + df)) + 1.0

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        s = np.zeros(len(batch), dtype=np.float64)
        any_hit = np.zeros(len(batch), dtype=bool)
        for j in range(len(terms)):
            tfj = batch[f"tf_{j}"].to_numpy(np.float64)
            s += tfj * idf[j]
            any_hit |= tfj > 0
        out = pd.DataFrame({id_col: batch[id_col], "score": s})
        return out[any_hit] if matching_only else out

    return tf.map_batches(score, batch_format="pandas")


def document_frequency(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_df: int = 1,
) -> ray.data.Dataset:
    """Full-vocabulary document frequency: (token, df) for every
    distinct lowercased ``\\w+`` token. Per-batch doc-distinct explode
    (rows bounded by Σ distinct-tokens-per-doc), then one bucketed
    count — the standard partial-before-shuffle shape."""
    from graphscope_ray.stages.relational import grouped_agg

    def distinct_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        flat, starts = _flat_tokens(batch[text_col])
        doc_of = np.repeat(np.arange(len(batch)), np.diff(starts))
        pairs = pd.DataFrame({"d": doc_of, "token": flat})
        pairs = pairs.drop_duplicates()
        return pd.DataFrame({"token": pairs["token"].to_numpy(object),
                             "one": np.ones(len(pairs), dtype=np.int64)})

    pairs = docs.map_batches(distinct_pairs, batch_format="pandas")
    dfreq = grouped_agg(pairs, keys=["token"], spec={"df": ("one", "sum")})
    if min_df > 1:
        dfreq = dfreq.filter(
            lambda r: r["df"] >= min_df)  # pragma: no cover - convenience
    return dfreq
