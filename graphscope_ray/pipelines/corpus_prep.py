"""End-to-end training-corpus preparation: the composition a real
LLM-data user runs — canonicalize → scrub → quality-filter →
boilerplate (span) dedup → exact dedup → benchmark decontamination →
deterministic split — each stage one of this repo's streaming
operators, chained lazily so the whole pipeline executes as ONE
backpressured Ray Data stream (nothing materializes between stages;
the only driver-side state is the broadcast decontamination blocklist,
small by contract).

The reference has no single equivalent app — this is the
prompt-mandated training-data surface (SURVEY §2 extension), assembled
from the individually-gated stages so the composed DuckDB twin
(`__ray_entry__.oracle_sql()["doc_pipeline"]`) is the stage twins
nested in order."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def prepare_corpus(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    span_sep: str = "\n",
    decontam_n: int = 3,
    max_contamination: float = 0.0,
    splits: dict[str, float] | None = None,
) -> ray.data.Dataset:
    """Prepare a raw document corpus for training. Stages, in order:

    1. ``normalize_text`` — NFC + control-strip + whitespace collapse;
    2. ``scrub_pii`` — URL/email/IP/phone placeholders (count columns
       dropped; keep them by scrubbing separately if needed);
    3. quality filter — drop docs with fewer than ``min_tokens``
       ``\\w+`` tokens (post-scrub text);
    4. ``paragraph_dedup`` — corpus-wide first-occurrence span dedup
       on ``span_sep`` (C4-style boilerplate removal);
    5. ``exact_dedup`` — whole-doc dedup of the now-span-deduped text
       (min id kept);
    6. optional decontamination — drop docs whose ``decontam_n``-gram
       overlap fraction with ``benchmark`` (pushed through the same
       normalize+scrub stages) exceeds ``max_contamination``;
    7. ``hash_split`` — deterministic train/val/test assignment.

    Returns a lazy Dataset ``(id_col, text_col, removed_spans, split,
    n_tokens)`` where ``n_tokens`` counts the FINAL text's tokens.
    Every stage is partition-invariant and deterministic, so the whole
    pipeline is reproducible bit-for-bit."""
    from graphscope_ray.functions.text import token_counts
    from graphscope_ray.stages.dedup import exact_dedup, paragraph_dedup
    from graphscope_ray.stages.sampling import hash_split
    from graphscope_ray.stages.textprep import (
        PII_RULES,
        build_ngram_blocklist,
        contamination_features,
        normalize_text,
        scrub_pii,
    )

    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    pii_cols = [f"pii_{name}" for name, _, _ in PII_RULES]

    def prep(d: ray.data.Dataset) -> ray.data.Dataset:
        # preserve line boundaries when span dedup keys on newlines —
        # otherwise the whitespace collapse fuses every doc into one
        # span and stage 4 degenerates to whole-doc dedup
        d = normalize_text(d.select_columns([id_col, text_col]), text_col,
                           keep_newlines=(span_sep == "\n"))
        return scrub_pii(d, text_col).drop_columns(pii_cols)

    ds = prep(docs)

    def qfilter(b: pd.DataFrame) -> pd.DataFrame:
        n = token_counts(b[text_col]).to_numpy(np.int64)
        return b[n >= min_tokens]

    ds = ds.map_batches(qfilter, batch_format="pandas")
    ds = paragraph_dedup(ds, text_col=text_col, id_col=id_col, sep=span_sep)
    ds = exact_dedup(ds, text_col=text_col, id_col=id_col)

    if benchmark is not None:
        ref = build_ngram_blocklist(prep(benchmark), text_col=text_col,
                                    n=decontam_n)
        ds = contamination_features(ds, ref, text_col=text_col, n=decontam_n)

        def dfilter(b: pd.DataFrame) -> pd.DataFrame:
            keep = b["contamination_frac"].to_numpy() <= max_contamination
            return b[keep].drop(columns=["contaminated_ngrams",
                                         "total_ngrams",
                                         "contamination_frac"])

        ds = ds.map_batches(dfilter, batch_format="pandas")

    ds = hash_split(ds, splits, key_col=id_col)

    def final_tokens(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_tokens"] = token_counts(b[text_col]).to_numpy(np.int64)
        return b

    return ds.map_batches(final_tokens, batch_format="pandas")
