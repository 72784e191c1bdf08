"""Token-level signal extraction over Arrow string arrays.

One explode pass produces every token-derived signal (counts, distinct
counts, stopword hits, unigram log-prob sums), all as integers so the Ray
pipeline / plain oracle / DuckDB oracle agree exactly.

Tokenization = lowercase then split on runs of non-Latin-letters; identical
to ``list_filter(string_split_regex(lower(s), sep), x -> x <> '')`` in the
oracle SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .rules import EN_STOPWORDS, RE_SYMBOL, RE_TOKEN_SEP, SV_STOPWORDS


def tokenize(arr: pa.Array) -> pa.ListArray:
    """List-of-tokens per row (may contain empty strings at boundaries —
    callers must ignore those, as the SQL side filters them)."""
    return pc.split_pattern_regex(pc.utf8_lower(arr), pattern=RE_TOKEN_SEP)


def explode(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, token) pairs for all non-empty tokens, as numpy arrays."""
    lists = tokenize(arr)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    nonempty = flat != ""
    return parents[nonempty], flat[nonempty]


_SV_ARR = np.array(SV_STOPWORDS, dtype=object)
_EN_ARR = np.array(EN_STOPWORDS, dtype=object)


def token_signals(arr: pa.Array, score_of: "UnigramScores | None" = None) -> dict:
    """All token-derived per-row signals for a batch of scrubbed texts.

    Returns int64 numpy arrays: n_chars, n_symbols, n_tokens, n_distinct,
    n_sv, n_en, and (if `score_of`) tok_score_sum.

    Hot path never materializes tokens as Python objects: the flattened
    token array is dictionary-encoded in C (`pc.dictionary_encode`), so
    per-token work shrinks to the batch vocabulary (stopword membership,
    model score per unique token) scattered back through int32 indices.
    """
    n = len(arr)
    n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    n_symbols = (
        pc.count_substring_regex(arr, pattern=RE_SYMBOL)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )

    lists = tokenize(arr)
    rows_all = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    denc = pc.dictionary_encode(lists.flatten())
    inv_all = denc.indices.to_numpy(zero_copy_only=False)
    vocab = denc.dictionary.to_numpy(zero_copy_only=False)  # small object array

    # drop empty boundary tokens by vocabulary id
    empty_id = np.nonzero(vocab == "")[0]
    if len(empty_id):
        keep = inv_all != empty_id[0]
        rows, inv = rows_all[keep], inv_all[keep]
    else:
        rows, inv = rows_all, inv_all

    n_tokens = np.bincount(rows, minlength=n).astype(np.int64)

    if len(rows):
        V = len(vocab)
        # distinct tokens per row: unique (row, vocab-id) pairs
        pair = rows.astype(np.int64) * V + inv
        upair = np.unique(pair)
        n_distinct = np.bincount(upair // V, minlength=n).astype(np.int64)
        sv_vocab = np.isin(vocab, _SV_ARR)
        en_vocab = np.isin(vocab, _EN_ARR)
        n_sv = np.bincount(rows, weights=sv_vocab[inv], minlength=n).astype(np.int64)
        n_en = np.bincount(rows, weights=en_vocab[inv], minlength=n).astype(np.int64)
    else:
        n_distinct = np.zeros(n, dtype=np.int64)
        n_sv = np.zeros(n, dtype=np.int64)
        n_en = np.zeros(n, dtype=np.int64)

    out = {
        "n_chars": n_chars,
        "n_symbols": n_symbols,
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        "n_sv": n_sv,
        "n_en": n_en,
    }
    if score_of is not None:
        if len(rows):
            score_vocab = score_of.scores_for(vocab)
            out["tok_score_sum"] = np.bincount(
                rows, weights=score_vocab[inv], minlength=n
            ).astype(np.int64)
        else:
            out["tok_score_sum"] = np.zeros(n, dtype=np.int64)
    return out


def count_tokens_in(arr: pa.Array, words: np.ndarray) -> np.ndarray:
    """Per-row count of tokens that appear in `words` (object ndarray).
    Same dictionary-encoded hot path as token_signals."""
    n = len(arr)
    lists = tokenize(arr)
    rows = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    denc = pc.dictionary_encode(lists.flatten())
    inv = denc.indices.to_numpy(zero_copy_only=False)
    vocab = denc.dictionary.to_numpy(zero_copy_only=False)
    if len(rows) == 0:
        return np.zeros(n, dtype=np.int64)
    hit_vocab = np.isin(vocab, words)
    return np.bincount(rows, weights=hit_vocab[inv], minlength=n).astype(np.int64)


class UnigramScores:
    """Integer (floored milli-nat) unigram log-probs with an OOV fallback.

    The keep/drop scoring core — analog of the reference's word-probability
    classifier: per-word class log-odds summed over the paragraph plus a
    log prior (/root/reference/src/cur-prot/reclassify.py:23-57,
    /root/reference/src/build_classifier.py:100-111). The per-word memo
    cache there (`prob_dict`) corresponds to `self._memo`, which only
    affects speed, never values.
    """

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        self.N = int(sum(counts.values()))
        self.V = int(len(counts))
        denom = self.N + self.V
        self._score = {
            w: int(np.floor(1000.0 * np.log((c + 1) / denom)))
            for w, c in counts.items()
        }
        self.oov_score = int(np.floor(1000.0 * np.log(1.0 / denom)))
        self.drop_score = int(np.floor(1000.0 * np.log(1.0 / self.V)))
        self._memo = self._score  # per-word memo (reference's prob_dict analog)

    @classmethod
    def from_texts(cls, texts: pa.Array) -> "UnigramScores":
        rows, toks = explode(texts)
        vals, cnts = np.unique(toks, return_counts=True)
        return cls(dict(zip(vals.tolist(), cnts.tolist())))

    def scores_for(self, toks: np.ndarray) -> np.ndarray:
        s = pd.Series(toks).map(self._memo)
        return s.fillna(self.oov_score).to_numpy(dtype=np.float64)


# --------------------------------------------------------------------------
# Bigram Stupid-Backoff scorer (KenLM-style LM signal, one order up from
# UnigramScores). Brants et al. 2007 ("Large Language Models in Machine
# Translation"): score(w2|w1) = c(w1 w2)/c(w1) if the bigram was seen,
# else alpha * p_unigram(w2) with alpha = 0.4 — no normalization, which is
# exactly what makes the model trainable as one distributed count
# aggregation and servable as a broadcast lookup table. All scores are
# floored integer milli-nats so the DuckDB oracle agrees bit-for-bit.
# --------------------------------------------------------------------------

BIGRAM_PRUNE = 2  # keep bigrams with count >= this (the model-size bound)
BACKOFF_MILLINATS = int(np.floor(1000.0 * np.log(0.4)))  # -917


def bigram_pairs(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_index, w1, w2) for all ADJACENT non-empty token pairs within a
    row — empties are dropped first, so adjacency is over the filtered
    token sequence, matching the SQL's list_filter-then-list_zip."""
    rows, toks = explode(arr)
    if len(rows) < 2:
        e = np.empty(0, dtype=np.int64)
        return e, e.astype(object), e.astype(object)
    same = rows[1:] == rows[:-1]
    return rows[1:][same], toks[:-1][same], toks[1:][same]


class BigramScores:
    """Broadcast-side bigram model: pruned bigram counts folded with the
    unigram table into one integer-millinat score map at __init__ (once
    per actor). Seen pair -> floor(1000*ln(c12/c1)); unseen ->
    BACKOFF_MILLINATS + smoothed unigram score of w2 (same (c+1)/(N+V)
    table as UnigramScores)."""

    def __init__(self, uni_counts: dict[str, int], bigram_counts: dict[str, int]):
        self.uni = UnigramScores(uni_counts)
        self.pair_score = {
            pair: int(np.floor(1000.0 * np.log(c12 / float(uni_counts[pair.split(" ", 1)[0]]))))
            for pair, c12 in bigram_counts.items()
        }

    def transition_scores(self, w1: np.ndarray, w2: np.ndarray) -> np.ndarray:
        """Per-pair milli-nat scores, vectorized: Python work is bounded by
        the DISTINCT pairs in the batch (factorize + unique pair codes),
        never the pair count."""
        c1, vocab1 = pd.factorize(w1)
        c2, vocab2 = pd.factorize(w2)
        code = c1.astype(np.int64) * max(1, len(vocab2)) + c2
        ucode, inv = np.unique(code, return_inverse=True)
        i1, i2 = ucode // max(1, len(vocab2)), ucode % max(1, len(vocab2))
        uw2 = vocab2.to_numpy() if hasattr(vocab2, "to_numpy") else np.asarray(vocab2)
        uw1 = vocab1.to_numpy() if hasattr(vocab1, "to_numpy") else np.asarray(vocab1)
        seen = np.fromiter(
            (self.pair_score.get(uw1[a] + " " + uw2[b], np.nan) for a, b in zip(i1, i2)),
            dtype=np.float64,
            count=len(ucode),
        )
        backoff = BACKOFF_MILLINATS + self.uni.scores_for(uw2[i2])
        per_unique = np.where(np.isnan(seen), backoff, seen)
        return per_unique[inv]


def bigram_turn_scores(arr: pa.Array, model: BigramScores) -> np.ndarray:
    """Per-row sum of transition scores (int64); rows with <2 tokens = 0."""
    n = len(arr)
    rows, w1, w2 = bigram_pairs(arr)
    if len(rows) == 0:
        return np.zeros(n, dtype=np.int64)
    s = model.transition_scores(w1, w2)
    return np.bincount(rows, weights=s, minlength=n).astype(np.int64)


def train_bigram_counts(sf_dir: str, prune: int = BIGRAM_PRUNE) -> dict[str, int]:
    """DISTRIBUTED bigram count training over the `documents` corpus: a
    per-batch value_counts partial, one hash_aggregate exchange on the
    pair key, pruned at `prune` BEFORE the driver collects — the collected
    table is the model artifact (the KenLM-file analog), bounded by the
    prune threshold, not the corpus. Unlike build_model_counts' direct
    dimension-table read, the training input here scales WITH the corpus,
    so counting runs on the cluster."""
    import ray.data as rd

    from .ops.hashagg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        _, w1, w2 = bigram_pairs(batch["text"].combine_chunks())
        if len(w1) == 0:
            return pd.DataFrame({"pair": pd.Series([], dtype=object)})
        return pd.DataFrame({"pair": pd.Series(w1, dtype=object) + " " + pd.Series(w2, dtype=object)})

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "pair",
        {"c": ("pair", "count")},
    ).filter(expr=f"c >= {prune}")
    df = agg.to_pandas()
    return dict(zip(df["pair"].tolist(), df["c"].astype(int).tolist()))
