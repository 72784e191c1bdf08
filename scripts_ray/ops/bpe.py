"""BPE tokenizer training and encoding over the corpus.

The scale shape is the one real BPE trainers use (SentencePiece /
HuggingFace tokenizers): the CORPUS-sized work is a distributed word-count
(one vocabulary-bounded hash exchange — the same shape as word_freq), and
the merge-learning loop then runs over that word-frequency table, a
model-sized artifact independent of corpus row count. Encoding is a
broadcast-model actor stage whose per-batch Python is bounded by the
batch's DISTINCT tokens (dictionary-encode + per-actor memo), mirroring
the engine's unigram-scorer discipline.

Training is iterative-stateful, hence pytest-verified against a local
single-process reference (like kmeans_train) rather than SQL — the merge
ordering rule is deterministic (max pair count, lexicographic tie-break),
so two implementations must agree exactly.

Reference analog: the word-frequency dictionary build
(/root/reference/src/mk-wf-dict.py:38-44) — same distributed count, here
feeding subword learning instead of a lookup table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# Pinned merge table for the SQL-value-checked twin (`bpe_budgets_fixed`,
# the ann_ivf_fixed trick): a fixed 4-entry rank-ordered table that
# exercises a chained merge ((at,a) consumes the (a,t) result) on the
# fixture vocabulary. The DuckDB oracle restates encoding EXACTLY as a
# rank-ordered replace() chain over '<sym>'-wrapped characters — sound
# because a merge of rank r can only create pairs of rank > r (any pair
# containing `ab` must have been learned after (a,b)), so global
# rank-order application == the iterative lowest-rank encoder, and the
# '>' boundary marker prevents cross-symbol prefix matches.
BPE_PINNED_MERGES: list[tuple[str, str]] = [
    ("a", "t"),
    ("e", "r"),
    ("at", "a"),
    ("s", "t"),
]


def word_counts_ds(docs_ds) -> pd.DataFrame:
    """Distributed word-frequency table: per-batch value_counts partials →
    one token-key hash exchange → pandas frame (vocabulary-bounded)."""
    from .hashagg import hash_aggregate

    def partial(batch: pa.Table) -> pd.DataFrame:
        from ..tokens import explode

        _, toks = explode(batch["text"].combine_chunks())
        if len(toks) == 0:
            return pd.DataFrame({"tok": pd.Series([], dtype=object)})
        return pd.DataFrame({"tok": pd.Series(toks, dtype=object)})

    agg = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        "tok",
        {"c": ("tok", "count")},
    )
    return agg.to_pandas()


def bpe_train_from_counts(
    counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning on a word-frequency table: words start
    as character sequences; each step merges the (a, b) symbol pair with
    the highest corpus count (ties broken by lexicographic (a, b) so the
    result is deterministic and reference-comparable)."""
    words = {w: (list(w), c) for w, c in counts.items() if len(w) > 0}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographically SMALLEST pair
        top = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        for w, (syms, c) in words.items():
            if a not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, c)
    return merges


def bpe_train(docs_ds, n_merges: int = 64) -> list[tuple[str, str]]:
    """Distributed word counting → merge learning on the bounded table."""
    wc = word_counts_ds(docs_ds)
    return bpe_train_from_counts(
        dict(zip(wc["tok"].tolist(), wc["c"].astype(int).tolist())), n_merges
    )


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: repeatedly merge the lowest-rank adjacent pair."""
    syms = list(word)
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool encoding stage: merge ranks built once per actor from
    ONE broadcast ref; per batch, tokens are dictionary-encoded and only
    the batch's DISTINCT tokens hit the per-actor memoized encoder —
    emits per-row BPE token counts (the budget signal a packing stage
    consumes)."""

    def __init__(self, merges_ref):
        import ray

        merges = (
            merges_ref if isinstance(merges_ref, list) else ray.get(merges_ref)
        )
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self._memo: dict[str, int] = {}

    def _n_pieces(self, tok: str) -> int:
        n = self._memo.get(tok)
        if n is None:
            n = len(bpe_encode_word(tok, self.ranks))
            self._memo[tok] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..tokens import tokenize

        lists = tokenize(batch["text"].combine_chunks())
        rows = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        denc = pc.dictionary_encode(lists.flatten())
        inv = denc.indices.to_numpy(zero_copy_only=False)
        vocab = denc.dictionary.to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if len(rows) == 0:
            counts = np.zeros(n, dtype=np.int64)
        else:
            per_unique = np.fromiter(
                (self._n_pieces(t) if t else 0 for t in vocab),
                dtype=np.int64,
                count=len(vocab),
            )
            counts = np.bincount(rows, weights=per_unique[inv], minlength=n)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )
