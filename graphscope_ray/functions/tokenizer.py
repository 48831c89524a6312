"""Distributed BPE tokenizer training + encoding.

The classic byte-pair-encoding trainer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" —
public algorithm): learn the ``num_merges`` most frequent adjacent
symbol pairs over a corpus, operating on the DISTINCT-WORD frequency
table (the standard compression — BPE statistics only depend on each
word's count, so the 100 TB corpus reduces to one distributed word
count before the merge loop ever runs).

Scale shape:
- word counts: one pre-combined ``grouped_agg`` shuffle (the only pass
  over the raw corpus);
- each merge iteration streams the word table once — per-block partial
  pair counts (a block contributes ≤ its distinct-pair count, not its
  row count) reduced to one small driver frame (pair vocabulary ≤
  symbol-vocab², bounded by construction); integer sums are
  order-independent, argmax tie-breaks (count desc, pair lexicographic
  asc) so the merge sequence is deterministic and partition-invariant;
- the merge applies as a vectorized regex over the symbol strings and
  the table re-materializes per iteration (iterative consumer: the
  object store pins blocks, nothing re-reads the corpus).

The reference's GAE/GIE has no tokenizer; this belongs to the
prompt-mandated training-data surface (token counting's BPE-ish regex
is `functions/text.bpe_piece_counts`; this is the real trainer).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

END = "</w>"


def word_frequencies(
    docs: ray.data.Dataset,
    text_col: str = "text",
    lowercase: bool = True,
) -> ray.data.Dataset:
    """(word, count) over ``\\w+`` tokens — one combined shuffle."""
    from graphscope_ray.functions.text import TOKEN_RE
    from graphscope_ray.stages.relational import grouped_agg

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].str.lower() if lowercase else b[text_col]
        toks = t.str.findall(TOKEN_RE).explode().dropna()
        return pd.DataFrame({"word": toks.to_numpy(object)})

    words = docs.map_batches(explode, batch_format="pandas")
    return grouped_agg(words, ["word"], {"count": (None, "size")},
                       combine=True)


def _pair_counts(sym: pd.Series, cnt: np.ndarray) -> pd.DataFrame:
    """Weighted adjacent-pair counts of space-separated symbol strings
    for one batch — fully vectorized (one flat explode + shift)."""
    parts = sym.str.split(" ")
    lens = parts.str.len().to_numpy(np.int64)
    if (lens > 1).sum() == 0:
        return pd.DataFrame({"a": [], "b": [], "c": []})
    flat = np.concatenate([p for p in parts.to_numpy(object)])
    w = np.repeat(cnt, lens)
    starts = np.concatenate(([0], np.cumsum(lens)))
    last = np.zeros(len(flat), dtype=bool)
    last[starts[1:] - 1] = True
    a = flat[:-1][~last[:-1]]
    b = flat[1:][~last[:-1]]
    c = w[:-1][~last[:-1]]
    df = pd.DataFrame({"a": a, "b": b, "c": c})
    return df.groupby(["a", "b"], sort=False, as_index=False)["c"].sum()


def _merge_regex(a: str, b: str) -> re.Pattern:
    """Left-to-right non-overlapping merge of the symbol pair ``a b``
    inside a space-separated symbol string (lookarounds leave the
    boundary spaces unconsumed, so ``b b b`` under merge (b,b) gives
    ``bb b`` exactly like the sequential reference scan)."""
    return re.compile(r"(?<!\S)" + re.escape(a) + " " + re.escape(b)
                      + r"(?!\S)")


def train_bpe(
    docs_or_words: ray.data.Dataset,
    num_merges: int = 50,
    text_col: str = "text",
    min_frequency: int = 2,
    from_words: bool = False,
) -> dict:
    """Learn BPE merges. Pass a raw document Dataset, or a pre-counted
    (word, count) Dataset with ``from_words=True``. Returns
    ``{"merges": [(a, b), ...], "vocab": {token: count}}``; merges are
    in learned order (their index is the encode priority)."""
    words = docs_or_words if from_words else \
        word_frequencies(docs_or_words, text_col)

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        sym = b["word"].map(lambda w: " ".join(list(w) + [END]))
        return pd.DataFrame({"sym": sym.to_numpy(object),
                             "count": b["count"].to_numpy(np.int64)})

    table = words.map_batches(to_sym, batch_format="pandas").materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        parts = table.map_batches(
            lambda b: _pair_counts(b["sym"], b["count"].to_numpy(np.int64)),
            batch_format="pandas").to_pandas()
        if len(parts) == 0:
            break
        tot = parts.groupby(["a", "b"], as_index=False)["c"].sum()
        tot = tot.sort_values(["c", "a", "b"],
                              ascending=[False, True, True],
                              kind="mergesort")
        best = tot.iloc[0]
        if int(best["c"]) < min_frequency:
            break
        a, b = str(best["a"]), str(best["b"])
        merges.append((a, b))
        pat = _merge_regex(a, b)
        joined = a + b

        def apply(batch: pd.DataFrame, pat=pat, joined=joined
                  ) -> pd.DataFrame:
            batch = batch.copy()
            batch["sym"] = batch["sym"].str.replace(pat, joined, regex=True)
            return batch

        table = table.map_batches(apply, batch_format="pandas").materialize()

    vb = table.map_batches(
        lambda b: _token_counts_frame(b), batch_format="pandas").to_pandas()
    vocab = dict(vb.groupby("tok")["c"].sum().astype(int)) if len(vb) else {}
    return {"merges": merges, "vocab": vocab}


def _token_counts_frame(b: pd.DataFrame) -> pd.DataFrame:
    parts = b["sym"].str.split(" ")
    lens = parts.str.len().to_numpy(np.int64)
    if lens.sum() == 0:
        return pd.DataFrame({"tok": [], "c": []})
    flat = np.concatenate([p for p in parts.to_numpy(object)])
    w = np.repeat(b["count"].to_numpy(np.int64), lens)
    df = pd.DataFrame({"tok": flat, "c": w})
    return df.groupby("tok", sort=False, as_index=False)["c"].sum()


def bpe_encode(
    docs: ray.data.Dataset,
    model: "dict | ray.ObjectRef",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> ray.data.Dataset:
    """Append ``out_col`` = per-document BPE token count under the
    trained merges — the number a sequence-packing stage budgets with.
    Actor-pool stage: the merge ranks resolve once per actor; encoding
    memoizes per DISTINCT word within each batch (web text repeats
    words heavily), merging best-rank pairs exactly like training."""
    import ray

    from graphscope_ray.functions.text import TOKEN_RE

    ref = model if isinstance(model, ray.ObjectRef) else ray.put(model)

    class Encoder:
        def __init__(self):
            m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.rank = {p: i for i, p in enumerate(m["merges"])}
            self.cache: dict[str, int] = {}

        def _n_tokens(self, w: str) -> int:
            got = self.cache.get(w)
            if got is not None:
                return got
            sym = list(w) + [END]
            while len(sym) > 1:
                pairs = [(self.rank.get((sym[i], sym[i + 1]), -1), i)
                         for i in range(len(sym) - 1)]
                best = min((r, i) for r, i in pairs if r >= 0) \
                    if any(r >= 0 for r, _ in pairs) else None
                if best is None:
                    break
                _, i = best
                sym[i: i + 2] = [sym[i] + sym[i + 1]]
            n = len(sym)
            self.cache[w] = n
            return n

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            t = b[text_col].str.lower() if lowercase else b[text_col]
            toks = t.str.findall(TOKEN_RE)
            b = b.copy()
            b[out_col] = [sum(self._n_tokens(w) for w in ws)
                          for ws in toks]
            return b

    return docs.map_batches(Encoder, batch_format="pandas",
                            concurrency=(1, 8))
